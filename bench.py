"""Benchmark harness — run on real TPU hardware by the driver.

Measures points/sec of the full sparse-UNet inference path (voxel-tensor
build + rulebooks + forward) on a synthetic tree, the workload defined by
the reference inference config (voxel 0.01 m, block 4 m, buffer 0.4 m,
batch 4 — /root/reference/smart_tree/conf/pipeline.yaml:13-18).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the CPU reference-semantics throughput recorded
in BASELINE.md (the reference publishes no numbers; BASELINE.json directs us
to establish a CPU baseline empirically — see `--record-cpu-baseline`).

Failure containment (VERDICT r4 #1 — rounds 2 and 4 both recorded rc=1 and
NO perf number): main() is a SUPERVISOR that runs the measurement in a child
process and always emits a JSON line, no matter what:
  - TPU env guards: the r4 crash tail shows libtpu degrading when
    `TPU_ACCELERATOR_TYPE` / `TPU_WORKER_HOSTNAMES` are unset; both are
    defaulted before the child imports jax.
  - escalating retries: attempt 1 = shipped config; attempt 2 = Pallas slab
    kernel off (`SMART_TREE_TPU_SLAB=0`); attempt 3 = slab off + reduced
    capacities. A non-default attempt is labeled in the JSON ("fallback").
  - partial metrics: the child checkpoints progress to a file; if every
    attempt dies, the error JSON still carries whatever was measured.
tests/test_bench_contained.py runs `python bench.py` as a subprocess with
injected faults and asserts a JSON line always comes out;
tests/test_bench_smoke.py executes the happy-path measurement (run_bench)
exactly as shipped.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# measured once with --record-cpu-baseline on this machine's CPU backend
# (reference-semantics workload, identical code path); see BASELINE.md
CPU_BASELINE_POINTS_PER_SEC = 8_873.0

DEFAULT_WEIGHTS = str(REPO / "smart_tree_tpu/weights/noble-elevator-58.npz")


def _guard_tpu_env(env: dict) -> None:
    """Default the TPU topology env vars libtpu needs. The round-4/5 crash
    tails show they are not merely UNSET in the driver's shell — the
    tooling populates them with literal warning text ("WARNING: could not
    determine TPU worker hostnames or IP addresses"), which libtpu then
    rejects ("unexpected worker hostname ... from env var
    TPU_WORKER_HOSTNAMES"). So overwrite any value that cannot be a
    hostname/accelerator type (spaces), not just fill absent ones."""
    defaults = {
        "TPU_ACCELERATOR_TYPE": "v5litepod-4",
        "TPU_WORKER_HOSTNAMES": "localhost",
    }
    for key, val in defaults.items():
        cur = env.get(key)
        if not cur or " " in cur or "WARNING" in cur.upper():
            env[key] = val


def _write_partial(path: str | None, data: dict) -> None:
    if not path:
        return
    try:
        Path(path).write_text(json.dumps(data))
    except OSError:
        pass


def run_bench(
    points_per_m2: float = 12000.0,
    foliage_points: int = 20000,
    height: float = 12.0,
    reps: int = 3,
    dev_reps: int = 5,
    profile: bool = False,
    weights: str = DEFAULT_WEIGHTS,
    reduced: bool = False,
    partial_path: str | None = None,
) -> dict:
    fault = os.environ.get("SMART_TREE_BENCH_FAULT", "")
    if fault == "raise":
        raise RuntimeError("injected fault: raise")
    if fault == "slab" and os.environ.get("SMART_TREE_TPU_SLAB", "1") == "1":
        raise RuntimeError("injected fault: slab kernel enabled")

    import jax

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
    partial = {"n_points": n_points, "stage": "setup"}
    _write_partial(partial_path, partial)

    mi = ModelInference(
        weights,
        voxel_size=0.01,
        block_size=4.0,
        buffer_size=0.4,
        batch_size=4,
        precision="bfloat16",
        # reduced attempt: quarter-size per-level buffers + a 65k batch
        # ceiling — the smallest configuration that still covers the bench
        # cloud, for escaping HBM/compile-size failures in the default one
        level_capacity_factor=0.25 if reduced else 0.5,
        # shipped-pipeline download cull (conf/pipeline.yaml medial_classes):
        # radius/direction only for interior branch-class voxels, class only
        # for interior voxels — foliage and halo rows never cross the link
        medial_classes=(0,),
    )
    # batch ceiling 262k: the HBM-aware sizing allows 524k-cap batches, but
    # the overflow-retry recompile of a 524k program (custom level caps)
    # SIGKILLs this environment's memory-capped local compile helper —
    # observed twice on 2026-08-20. 262k is the size class every round-4
    # program (including retry variants) compiled reliably, and two 262k
    # batches pipeline anyway.
    mi.max_batch_capacity = min(mi.max_batch_capacity, 262144)
    if reduced:
        mi.max_batch_capacity = min(mi.max_batch_capacity, 65536)

    def note(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)

    # warmup (compile)
    note(f"warmup forward ({n_points} points)...")
    mi.forward(cloud)
    note("warmup done; timing end-to-end forwards")
    partial["stage"] = "warmed"
    _write_partial(partial_path, partial)
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

    pps = n_points / dt
    partial.update(
        stage="end_to_end_done",
        value=round(pps, 1),
        vs_baseline=round(pps / CPU_BASELINE_POINTS_PER_SEC, 2),
        end_to_end_s=round(dt, 3),
    )
    _write_partial(partial_path, partial)

    # clouds/min END-TO-END — the second half of the north-star metric
    # (BASELINE.json: "points/sec sparse-UNet inference; clouds/min
    # end-to-end skeletonization"): one full cloud -> skeleton pass
    # (inference + class filter + Skeletonizer.forward), timed warm.
    # Contained: a skeleton-stage failure degrades to an error note, not a
    # dead bench.
    skel_fields: dict = {}
    try:
        from smart_tree_tpu.skeleton.skeletonize import Skeletonizer

        sk = Skeletonizer()
        note("skeleton stage: warmup (compiles the graph program)...")
        lc = mi.forward(cloud)
        branch = lc.filter_by_class([0])
        sk.forward(branch)  # warm/compile
        note("skeleton stage warmed; timing full cloud->skeleton pass")
        t0 = time.perf_counter()
        lc = mi.forward(cloud)
        branch = lc.filter_by_class([0])
        skel = sk.forward(branch)
        pipeline_s = time.perf_counter() - t0
        skel_fields = {
            "n_branch_points": len(branch),
            "n_skeletons": len(skel.skeletons),
            "pipeline_s": round(pipeline_s, 2),
            "clouds_per_min_e2e": round(60.0 / pipeline_s, 2),
        }
        note(f"cloud->skeleton {pipeline_s:.1f}s "
             f"({skel_fields['clouds_per_min_e2e']} clouds/min)")
    except Exception as e:  # noqa: BLE001 — containment by design
        skel_fields = {"skeleton_error": f"{type(e).__name__}: {e}"}
    partial.update(stage="skeleton_done", **skel_fields)
    _write_partial(partial_path, partial)

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
        partial.update(
            stage=f"device_batch_{bi}",
            device_step_s=round(dev_total_s, 4),
            device_points_per_sec=round(n_points / dev_total_s, 1),
        )
        _write_partial(partial_path, partial)
    device_pps = n_points / dev_total_s

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
        **skel_fields,
    }


def _child_main(argv: list[str]) -> int:
    """One measurement attempt in a fresh process (spawned by the
    supervisor). Env was prepared by the parent; prints the result JSON."""
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
    kwargs: dict = {}
    if "--tiny" in argv:
        kwargs = dict(points_per_m2=120.0, foliage_points=200, height=6.0,
                      reps=1, dev_reps=1)
    if "--weights" in argv:
        kwargs["weights"] = argv[argv.index("--weights") + 1]
    out = run_bench(
        profile="--profile" in argv,
        reduced="--reduced" in argv,
        partial_path=os.environ.get("SMART_TREE_BENCH_PARTIAL"),
        **kwargs,
    )
    print(json.dumps(out), flush=True)
    return 0


def _supervise(argv: list[str]) -> int:
    """Run attempts in child processes; ALWAYS print one JSON line."""
    passthrough = [a for a in argv if a in ("--tiny", "--profile", "--cpu")
                   or a == "--weights"]
    if "--weights" in argv:
        passthrough.append(argv[argv.index("--weights") + 1])

    attempt_timeout = float(os.environ.get("SMART_TREE_BENCH_ATTEMPT_TIMEOUT",
                                           "2700"))
    attempts = [
        ("default", {}, []),
        # same config again: an attempt that died on the ATTEMPT TIMEOUT
        # spent its budget on cold compiles through the remote-compile
        # tunnel (20-90 s per bucket, worse under load) — those compiles
        # are in the persistent /tmp/jax_cache now, so the warm retry runs
        # the measurement in a fraction of the time. Switching straight to
        # slab-off would instead recompile EVERY bucket cold again.
        ("default-warm-retry", {}, []),
        ("slab-off", {"SMART_TREE_TPU_SLAB": "0"}, []),
        ("slab-off+reduced-capacity", {"SMART_TREE_TPU_SLAB": "0"},
         ["--reduced"]),
    ]
    errors: list[dict] = []
    partial_file = f"/tmp/smart_tree_bench_partial_{os.getpid()}.json"

    for name, env_over, extra in attempts:
        env = dict(os.environ)
        _guard_tpu_env(env)
        env.update(env_over)
        env["SMART_TREE_BENCH_PARTIAL"] = partial_file
        cmd = [sys.executable, str(REPO / "bench.py"), "--child",
               *passthrough, *extra]
        print(f"# bench attempt '{name}': {' '.join(cmd[2:])}",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                cmd, env=env, stdout=subprocess.PIPE, stderr=None,
                timeout=attempt_timeout, text=True,
            )
        except subprocess.TimeoutExpired:
            errors.append({"attempt": name,
                           "error": f"timeout after {attempt_timeout:.0f}s"})
            continue
        out = None
        for line in (proc.stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    pass
            elif line:
                print(f"# child: {line}", file=sys.stderr)
        if proc.returncode == 0 and out is not None:
            if name != "default":
                out["fallback"] = name
                out["attempt_errors"] = errors
            print(json.dumps(out), flush=True)
            return 0
        errors.append({
            "attempt": name,
            "error": f"rc={proc.returncode} in {time.perf_counter() - t0:.0f}s"
                     " (stderr above)",
        })

    # every attempt failed — emit the error JSON, carrying partial metrics
    partial: dict = {}
    try:
        partial = json.loads(Path(partial_file).read_text())
    except (OSError, json.JSONDecodeError):
        pass
    out = {
        "metric": "sparse-unet inference points/sec",
        "value": partial.get("value", 0.0),
        "unit": "points/sec",
        "vs_baseline": partial.get("vs_baseline", 0.0),
        "error": "; ".join(f"{e['attempt']}: {e['error']}" for e in errors),
        "partial": partial,
    }
    print(json.dumps(out), flush=True)
    return 0  # the JSON line IS the record; don't let rc mask it


def main() -> int:
    if "--child" in sys.argv:
        return _child_main(sys.argv)
    if "--record-cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
        out = run_bench(profile=False)
        print(json.dumps(out))
        return 0
    return _supervise(sys.argv)


if __name__ == "__main__":
    raise SystemExit(main())
