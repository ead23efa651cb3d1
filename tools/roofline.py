"""Analytic roofline for the sparse-UNet forward (VERDICT r2 #3/#5).

Walks the exact conv inventory of SmartTree (nn/model.py, nn/blocks.py) at a
given batch capacity and per-level capacity schedule, and reports, per level
and in total:

  - gather indices issued (the measured cost driver: TPU gathers pay a
    per-INDEX latency of ~3-7 ns regardless of slice width — docs/PERF.md
    round-3 campaign),
  - HBM bytes moved by the gather+GEMM path (read feats per index, write the
    gathered matrix, read it back into the GEMM, write the output),
  - MXU FLOPs of the GEMMs.

Combined with a measured per-forward time (e.g. bench.py's chained,
fetch-forced numbers), this prints achieved GB/s and FLOP/s against the v5e
peaks, plus the latency-model prediction — making "the forward is
per-index-latency-bound, not bandwidth- or compute-bound" checkable
arithmetic rather than prose.

Usage:
    python tools/roofline.py --capacity 131072 --measured-ms 159
(no device needed — the model is static; pass measured times from bench.py)

Reference for the conv inventory being modeled: the reference UNet
(smart_tree/model/model_blocks.py:107-243) — per non-bottleneck level, a
Head ResBlock (2 subm convs), Encode (strided), Decode (inverse), and a
Tail ResBlock (2 subm convs on concat); bottleneck has Head only.
"""

from __future__ import annotations

import argparse

# v5e single-chip peaks (public spec)
HBM_PEAK_GBS = 819.0
BF16_PEAK_TFLOPS = 197.0
# measured per-index gather cost on this chip (docs/PERF.md round 3:
# 3.5M-index conv gather = 11 ms -> ~3.1 ns/index; searchsorted bisection
# agreed at 3-7 ns)
NS_PER_INDEX = 3.1


def level_convs(planes, lvl):
    """[(rows_key, k, cin, cout)] for UNet level lvl; rows_key 'n' = this
    level's capacity, 'n+1' = next level's (the Encode output rows)."""
    c = planes[lvl]
    convs = [("n", 27, c, c), ("n", 27, c, c)]  # Head ResBlock
    if lvl < len(planes) - 1:
        cn = planes[lvl + 1]
        convs += [
            ("n+1", 27, c, cn),        # Encode (strided; rulebook over out rows)
            ("n", 27, cn, c),          # Decode (inverse)
            ("n", 1, 2 * c, c),        # Tail identity projection (1^3)
            ("n", 27, 2 * c, c),       # Tail conv 1 (on skip concat)
            ("n", 27, c, c),           # Tail conv 2
        ]
    return convs


def analyze(capacity, planes=(8, 16, 32, 64), factor=0.5, itemsize=4,
            input_channels=3, heads=((8, 8, 4, 1), (8, 8, 4, 3), (8, 8, 4, 2))):
    caps = [capacity]
    for _ in planes[1:]:
        caps.append(max(int(caps[-1] * factor), 256))
    rows = {"n": None, "n+1": None}
    total = dict(indices=0, bytes=0, flops=0)
    per_level = []
    for lvl in range(len(planes)):
        n = caps[lvl]
        n_next = caps[lvl + 1] if lvl + 1 < len(caps) else 0
        lv = dict(level=lvl, cap=n, indices=0, bytes=0, flops=0)
        convs = list(level_convs(planes, lvl))
        if lvl == 0:
            convs.insert(0, ("n", 1, input_channels, planes[0]))  # input conv
            for hp in heads:  # SparseFC stacks: 1^3 convs
                for cin, cout in zip(hp[:-1], hp[1:]):
                    convs.append(("n", 1, cin, cout))
        for rk, k, cin, cout in convs:
            m = n if rk == "n" else n_next
            idx = m * k if k > 1 else 0  # 1^3 convs index identity rows (free)
            # gather: read cin*itemsize per index; write [m, k*cin]; GEMM
            # reads it back and writes [m, cout]
            byt = idx * cin * itemsize + 2 * m * k * cin * itemsize \
                + m * cout * itemsize
            fl = 2 * m * k * cin * cout
            lv["indices"] += idx
            lv["bytes"] += byt
            lv["flops"] += fl
        per_level.append(lv)
        for f in ("indices", "bytes", "flops"):
            total[f] += lv[f]
    return caps, per_level, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--factor", type=float, default=0.5)
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured per-forward device ms at this capacity "
                         "(bench.py chained, fetch-forced)")
    args = ap.parse_args()

    caps, per_level, total = analyze(args.capacity, factor=args.factor)
    print(f"capacity {args.capacity} (levels {caps})")
    print(f"{'lvl':>3} {'cap':>8} {'gather idx':>12} {'MB moved':>10} {'MFLOP':>8}")
    for lv in per_level:
        print(f"{lv['level']:>3} {lv['cap']:>8} {lv['indices']:>12,} "
              f"{lv['bytes'] / 1e6:>10.1f} {lv['flops'] / 1e6:>8.1f}")
    print(f"{'sum':>12} {total['indices']:>12,} {total['bytes'] / 1e6:>10.1f} "
          f"{total['flops'] / 1e6:>8.1f}")
    lat_ms = total["indices"] * NS_PER_INDEX / 1e6
    sol_ms = total["bytes"] / (HBM_PEAK_GBS * 1e6)
    print(f"\nlatency model ({NS_PER_INDEX} ns/index):  {lat_ms:8.1f} ms")
    print(f"HBM speed-of-light (same traffic): {sol_ms:8.1f} ms")
    if args.measured_ms:
        t = args.measured_ms
        print(f"measured:                          {t:8.1f} ms")
        print(f"  -> achieved {total['bytes'] / t / 1e6:6.1f} GB/s "
              f"({100 * total['bytes'] / t / 1e6 / HBM_PEAK_GBS:.1f}% of "
              f"{HBM_PEAK_GBS:.0f} GB/s peak)")
        gflops = total["flops"] / t / 1e6  # MFLOP per ms == GFLOP/s
        print(f"  -> achieved {gflops:6.1f} GFLOP/s "
              f"({100 * gflops / (BF16_PEAK_TFLOPS * 1e3):.3f}% MFU)")
        print(f"  -> latency model explains {100 * lat_ms / t:.0f}% of measured")


if __name__ == "__main__":
    main()
