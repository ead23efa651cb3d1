"""HBM footprint model for the sparse-UNet forward pass.

Round 2 shipped an inference path that OOMed a 16 GB v5e at 262,144-voxel
capacity because nothing sized the per-level buffers to the chip
(VERDICT r2 #2/#4). This module is the missing policy: a small analytic
model of the forward pass's dominant HBM consumers, used by
ModelInference/BlockTiler to pick a batch capacity that FITS, with the
existing per-level overflow counters as the safety net.

The dominant terms (see core/sparse_ops.py / core/rulebook.py):

  per level l, capacity cap_l = cap * factor^l, channels C_l:
    - subm z-window conv gather: g [cap_l, 9, 3, Cin] plus the routing
      einsum's g27 [cap_l, 27, Cin] — 2 * 27 * Cin floats each, where the
      decoder tail ResBlock doubles Cin to 2*C_l (skip concat);
    - rulebook build: query keys + lookups, ~2 * 27 * cap_l int32 for the
      strided/inverse tables;
    - persistent plan tables: subm pos/qkey [cap_l, 9] + down/up [·, 27].

The conv gathers of different levels are not live simultaneously (XLA frees
between ops), so the peak is max-over-levels of the transient terms plus the
sum of persistent tables and feature buffers.
"""

from __future__ import annotations

from typing import Sequence, Tuple


def level_capacities(
    capacity: int, num_levels: int, factor: float, min_capacity: int = 256
) -> Tuple[int, ...]:
    """Mirror of core/plan.py build_plan's capacity schedule."""
    caps = [capacity]
    for _ in range(num_levels - 1):
        caps.append(max(int(caps[-1] * factor), min_capacity))
    return tuple(caps)


def estimate_forward_hbm(
    capacity: int,
    planes: Sequence[int],
    factor: float = 0.5,
    itemsize: int = 4,
    in_flight: int = 1,
) -> dict:
    """Estimated peak HBM bytes of one compiled forward at `capacity`.

    Returns {"peak": int, "transient": int, "persistent": int,
             "per_level_transient": [..]}. Deliberately conservative
    (fp32 itemsize even in bf16 mode — XLA keeps fp32 copies around
    matmul boundaries; a 1.5x headroom is applied on top).
    """
    from .sparse_ops import _ROW_CHUNK

    caps = level_capacities(capacity, len(planes), factor)
    per_level = []
    persistent = 0
    for lvl, (cap_l, c_l) in enumerate(zip(caps, planes)):
        # widest conv at this level: decoder tail's first conv (2C -> C)
        # except at the bottleneck, where it is C -> C
        cin = 2 * c_l if lvl < len(planes) - 1 else c_l
        # gather+GEMM transients are row-chunked (sparse_ops._map_row_chunks)
        # so only one chunk's g + g27 buffers are live at a time; the
        # z-window w3/k3w tables span the full level
        rows = min(cap_l, _ROW_CHUNK)
        gather = 2 * rows * 27 * cin * itemsize        # g + g27 (one chunk)
        zwin = cap_l * (3 * cin) * itemsize + cap_l * 3 * 4  # w3 + k3w
        rulebook = 2 * cap_l * 27 * 4                  # query keys + lookup
        per_level.append(gather + zwin + rulebook)
        tables = cap_l * (9 + 9) * 4                   # subm pos + qkey
        if lvl < len(planes) - 1:
            tables += caps[lvl + 1] * 27 * 4 + cap_l * 27 * 4  # down + up
        feats = cap_l * (3 * c_l) * itemsize           # skip + live features
        persistent += tables + feats
    transient = max(per_level)
    peak = int(1.5 * (transient + persistent * max(1, in_flight)))
    return {
        "peak": peak,
        "transient": transient,
        "persistent": persistent,
        "per_level_transient": per_level,
        "level_capacities": caps,
    }


def max_capacity_for_budget(
    budget_bytes: int,
    planes: Sequence[int],
    factor: float = 0.5,
    itemsize: int = 4,
    in_flight: int = 1,
    floor: int = 1024,
    ceiling: int = 1 << 24,
) -> int:
    """Largest pow2 batch capacity whose estimated peak fits budget_bytes."""
    cap = floor
    best = floor
    while cap <= ceiling:
        est = estimate_forward_hbm(cap, planes, factor, itemsize, in_flight)
        if est["peak"] > budget_bytes:
            break
        best = cap
        cap *= 2
    return best
