"""Stage-level in-jit profile of the inference forward (chained timing).

bench.py round 3 measured ~2.6 s per forward batch IN-JIT (chained), yet
every component benched individually (conv, rulebook build, sort) is at
the microsecond floor. This tool times progressively larger prefixes of
the real forward body, chained with a data dependency, to locate the cost:

  stage 1: make_features + pack + argsort + tensor assembly
  stage 2: + build_plan (all rulebooks + downsamples)
  stage 3: + model.apply (UNet + heads)
  stage 4: + compress_preds (full body)

Per-stage cost = difference of consecutive chained step times.
Run on the real chip, exclusive: python tools/bench_forward_stages.py
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from smart_tree_tpu.core.coords import pack_coords
from smart_tree_tpu.core.plan import build_plan
from smart_tree_tpu.core.sparse_tensor import SparseVoxelTensor
from smart_tree_tpu.data.augmentations import CentreCloud
from smart_tree_tpu.data.dataset import BlockTiler
from smart_tree_tpu.data.synthetic import generate_tree
from smart_tree_tpu.infer.inference import ModelInference, compress_preds
from smart_tree_tpu.parallel.dp import make_features


def main():
    factor = float(sys.argv[sys.argv.index("--factor") + 1]) if "--factor" in sys.argv else 0.5
    cloud, _ = generate_tree(seed=0, height=12.0, trunk_radius=0.25,
                             points_per_m2=12000.0, foliage_points=20000)
    cloud = CentreCloud()(cloud)
    mi = ModelInference(
        str(Path(__file__).resolve().parent.parent
            / "smart_tree_tpu/weights/noble-elevator-58.npz"),
        precision="bfloat16",
    )
    tiler = BlockTiler(cloud.host(), 0.01, 4.0, 0.4)
    vb = max(tiler.batches(4), key=lambda b: len(b.coords))  # largest batch
    cap, spatial, batch = len(vb.coords), vb.spatial_shape, vb.batch_size
    print(f"# batch: cap={cap} spatial={spatial} batch={batch}", file=sys.stderr)
    model = mi.model
    levels = len(model.unet_planes)
    voxel = mi.voxel_size
    feature_mode = "local" if model.input_channels == 4 else "xyz"

    def stage_body(stage, variables, coords16, res16, origins, valid):
        with jax.default_matmul_precision("bfloat16"):
            coords, fv = make_features(coords16, res16, origins, voxel, feature_mode)
            keys = pack_coords(coords, spatial, batch, valid=valid)
            order = jnp.argsort(keys, stable=True)
            skeys = keys[order]
            active = skeys != jnp.uint32(0xFFFFFFFF)
            feats = jnp.where(active[:, None], fv[order], 0)
            if stage == 1:
                return jnp.sum(feats).astype(jnp.float32)
            x = SparseVoxelTensor(keys=skeys, feats=feats, active=active,
                                  spatial_shape=spatial, batch_size=batch)
            plan = build_plan(x, levels, level_capacity_factor=factor)
            if stage == 2:
                def rb_sum(rb):
                    # "full" mode: plain [N,27] array; "z9": SubmRB9 pytree
                    leaves = jax.tree_util.tree_leaves(rb)
                    return sum(jnp.sum(l) for l in leaves)
                s = sum(rb_sum(lv.subm_rb) for lv in plan.levels)
                return (s + jnp.sum(plan.levels[0].down_rb)).astype(jnp.float32)
            preds = model.apply(variables, plan, x.feats, train=False)
            if stage == 3:
                return jnp.sum(preds["radius"]).astype(jnp.float32)
            cp = compress_preds(preds)
            # sum over EVERY output: a sliceable dep (e.g. radius[0,0])
            # lets XLA cut the network to one voxel's cone
            return (jnp.sum(cp["radius"].astype(jnp.float32))
                    + jnp.sum(cp["direction"].astype(jnp.float32))
                    + jnp.sum(cp["class_l"].astype(jnp.float32)))

    c16, res, orig = vb.compressed_xyz_upload()
    args = (mi.variables, jnp.asarray(c16), jnp.asarray(res),
            jnp.asarray(orig), jnp.asarray(vb.valid))

    @partial(jax.jit, static_argnames=("stage",))
    def run_n(variables, coords16, res16, origins, valid, stage, n):
        # n traced -> one compile per stage serves every chain length
        def it(i, carry):
            res_c, acc = carry
            out = stage_body(stage, variables, coords16, res_c, origins, valid)
            eps = (out * jnp.float32(1e-30)).astype(res_c.dtype)
            return res_c + eps, acc + out
        _, acc = jax.lax.fori_loop(0, n, it, (res16, jnp.float32(0)))
        return acc

    def timed(stage, n, reps=2):
        # fetch (float), don't block_until_ready: the relay can ack before
        # execution completes — this tool read 0.0 ms for every stage when
        # it blocked instead of fetching (docs/PERF.md methodology note 2)
        float(run_n(*args, stage=stage, n=jnp.int32(n)))
        t0 = time.perf_counter()
        for _ in range(reps):
            float(run_n(*args, stage=stage, n=jnp.int32(n)))
        return (time.perf_counter() - t0) / reps

    res_out = {"cap": cap, "factor": factor}
    prev = 0.0
    for stage, name in [(1, "sort_assemble"), (2, "plan_rulebooks"),
                        (3, "unet_heads"), (4, "full_body")]:
        t1 = timed(stage, 1)
        # keep one device program under the relay RPC deadline (~60 s)
        chain = max(2, min(6, int(30.0 / max(t1, 0.1))))
        tn = timed(stage, 1 + chain)
        per = max((tn - t1) / chain, 0.0)
        res_out[f"stage_{name}_ms"] = round(per * 1e3, 2)
        res_out[f"delta_{name}_ms"] = round((per - prev) * 1e3, 2)
        prev = per
        print(json.dumps(res_out), file=sys.stderr, flush=True)
    print(json.dumps(res_out))


if __name__ == "__main__":
    main()
