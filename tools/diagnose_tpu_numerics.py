"""Bisect the TPU-vs-CPU prediction-quality gap by staged output dumps.

BASELINE.md round 3: the same checkpoint + eval code reads direction cos
0.758 on CPU fp32 but 0.442 on the TPU lane (seed 100). This tool runs the
EXACT inference body (compressed upload -> features -> sort -> plan ->
UNet -> heads) on whatever backend the process has, dumps every stage to
an npz, and diffs two such dumps — pinpointing the first diverging stage.

Usage (run once per backend, then diff):
    python tools/diagnose_tpu_numerics.py dump /tmp/stages_tpu.npz
    python tools/diagnose_tpu_numerics.py dump /tmp/stages_cpu.npz --cpu
    python tools/diagnose_tpu_numerics.py diff /tmp/stages_tpu.npz /tmp/stages_cpu.npz

(--cpu uses jax.config, not JAX_PLATFORMS: this environment's sitecustomize
pins the axon backend over the env var.)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def dump(out_path: str, seed: int = 100) -> None:
    import jax
    import jax.numpy as jnp

    from smart_tree_tpu.core.plan import build_plan
    from smart_tree_tpu.core.sparse_tensor import SparseVoxelTensor
    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.dataset import BlockTiler
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import ModelInference
    from smart_tree_tpu.parallel.dp import make_features

    cloud, _ = generate_tree(seed=seed, height=8.0, trunk_radius=0.15,
                             points_per_m2=3000.0, foliage_points=4000)
    cloud = CentreCloud()(cloud)
    mi = ModelInference(
        str(Path(__file__).resolve().parent.parent
            / "smart_tree_tpu/weights/synthetic-r2.npz"))
    tiler = BlockTiler(cloud.host(), mi.voxel_size, mi.block_size, mi.buffer_size)
    vb = max(tiler.batches(mi.batch_size), key=lambda b: len(b.coords))
    c16, res, orig = vb.compressed_xyz_upload()
    spatial, batch = vb.spatial_shape, vb.batch_size
    levels = len(mi.model.unet_planes)
    feature_mode = "local" if mi.model.input_channels == 4 else "xyz"

    @jax.jit
    def stages(variables, coords16, res16, origins, valid):
        out = {}
        with jax.default_matmul_precision(mi.precision):
            coords, fv = make_features(coords16, res16, origins,
                                       mi.voxel_size, feature_mode)
            from smart_tree_tpu.core.coords import pack_coords
            keys = pack_coords(coords, spatial, batch, valid=valid)
            order = jnp.argsort(keys, stable=True)
            skeys = keys[order]
            active = skeys != jnp.uint32(0xFFFFFFFF)
            feats = jnp.where(active[:, None], fv[order], 0)
            out["feats"] = feats
            out["skeys"] = skeys
            x = SparseVoxelTensor(keys=skeys, feats=feats, active=active,
                                  spatial_shape=spatial, batch_size=batch)
            plan = build_plan(x, levels,
                              level_capacity_factor=mi.level_capacity_factor)
            for i, lv in enumerate(plan.levels):
                out[f"rb{i}"] = lv.subm_rb
                out[f"keys{i}"] = lv.keys
            preds = mi.model.apply(variables, plan, x.feats, train=False)
            out.update(preds)
        return out

    res_d = stages(mi.variables, jnp.asarray(c16), jnp.asarray(res),
                   jnp.asarray(orig), jnp.asarray(vb.valid))
    np.savez_compressed(
        out_path,
        backend=str(next(iter(jax.devices())).platform),
        **{k: np.asarray(v) for k, v in res_d.items()},
    )
    print(f"wrote {out_path} [{np.load(out_path)['backend']}]")


def diff(a_path: str, b_path: str) -> None:
    a, b = np.load(a_path), np.load(b_path)
    print(f"{a['backend']} vs {b['backend']}")
    for k in a.files:
        if k == "backend":
            continue
        va, vb = a[k], b[k]
        if va.dtype.kind in "ui":
            n = int((va != vb).sum())
            print(f"  {k:12s} int: {n}/{va.size} mismatched")
        else:
            va, vb = va.astype(np.float64), vb.astype(np.float64)
            d = np.abs(va - vb)
            rel = d / np.maximum(np.abs(vb), 1e-12)
            print(f"  {k:12s} max|d|={d.max():.3e}  "
                  f"mean|d|={d.mean():.3e}  max rel={rel.max():.3e}")


if __name__ == "__main__":
    argv = [a for a in sys.argv if a != "--cpu"]
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cmd = argv[1]
    if cmd == "dump":
        dump(argv[2], seed=int(argv[3]) if len(argv) > 3 else 100)
    elif cmd == "diff":
        diff(argv[2], argv[3])
    else:
        raise SystemExit(f"unknown command {cmd}")
