"""Device-side download cull (infer/inference.py medial_classes).

The cull must be a pure transfer-layer change: with medial_classes=(0,),
ModelInference.forward must return the SAME rows in the SAME order as the
unculled compact path, with identical class labels everywhere, identical
medial vectors on branch-class rows, and exactly-zero medial vectors on
the rows whose heads were never downloaded. Reference boundary being
beaten: smart_tree/model/model_inference.py:73-78 downloads every head for
every voxel and pipeline.py:68 filters to branch class on host.

The forward comparison runs in a SUBPROCESS pinned to one device: this
suite's conftest forces an 8-virtual-device CPU mesh, and on a multi-device
backend forward() takes the block-sharded path, which deliberately keeps
the full download (per-device interior/medial counts differ under one
stacked program) — the cull is a single-device (production single-chip)
optimization.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json
import numpy as np
from smart_tree_tpu.data.augmentations import CentreCloud
from smart_tree_tpu.data.synthetic import generate_tree
from smart_tree_tpu.infer.inference import ModelInference

# the evaluate.py seed-100 workload with the synthetic-r3 weights: the one
# (cloud, model) pair measured to predict BOTH classes (foliage IoU 0.94,
# BASELINE.md) — an all-branch prediction would vacuously pass the
# zero-medial check on undownloaded rows (synthetic-v3 and the shipped
# reference checkpoints call every voxel of this procedural cloud branch)
cloud, _ = generate_tree(seed=100, height=8.0, trunk_radius=0.15,
                         points_per_m2=3000.0, foliage_points=4000)
cloud = CentreCloud()(cloud)
w = "smart_tree_tpu/weights/synthetic-r3.npz"
a = ModelInference(w, batch_size=2, medial_classes=(0,)).forward(cloud)
b = ModelInference(w, batch_size=2).forward(cloud)

np.testing.assert_array_equal(np.asarray(a.xyz), np.asarray(b.xyz))
np.testing.assert_array_equal(np.asarray(a.class_l), np.asarray(b.class_l))
cls = np.asarray(b.class_l).reshape(-1)
branch = cls == 0
# downloaded (branch) rows: bit-identical medial vectors
np.testing.assert_array_equal(
    np.asarray(a.medial_vector)[branch], np.asarray(b.medial_vector)[branch]
)
# undownloaded rows are exactly zero
np.testing.assert_array_equal(np.asarray(a.medial_vector)[~branch], 0.0)
# the pipeline's actual consumer sees identical input either way
fa, fb = a.filter_by_class([0]), b.filter_by_class([0])
np.testing.assert_array_equal(np.asarray(fa.medial_pts), np.asarray(fb.medial_pts))
print(json.dumps({"n_branch": int(branch.sum()), "n_foliage": int((~branch).sum())}))
"""


@pytest.mark.slow  # two single-device ModelInference compiles (~4 min, 1-core host)
def test_culled_forward_equals_compact_on_branch_rows():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # drop the conftest's 8-virtual-device forcing
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(proc.stdout.splitlines()[-1])
    # both populations must exist or the zero-medial check proved nothing
    assert out["n_branch"] > 0 and out["n_foliage"] > 0, out


@pytest.mark.slow  # two sharded-forward compiles (~3 min on this 1-core host)
def test_culled_multichip_equals_unculled_multichip():
    """The per-shard cull (parallel/block_infer.py) over the conftest's
    8-virtual-device mesh: same rows, same classes, near-identical branch
    medial vectors (different sharded programs may fuse differently — the
    int8 direction quantization can flip one 1/127 step), exact zeros on
    undownloaded rows."""
    import jax

    from smart_tree_tpu.data.augmentations import CentreCloud
    from smart_tree_tpu.data.synthetic import generate_tree
    from smart_tree_tpu.infer.inference import ModelInference

    assert len(jax.devices()) == 8  # conftest CPU mesh
    cloud, _ = generate_tree(seed=100, height=8.0, trunk_radius=0.15,
                             points_per_m2=3000.0, foliage_points=4000)
    cloud = CentreCloud()(cloud)
    w = "smart_tree_tpu/weights/synthetic-r3.npz"
    a = ModelInference(w, batch_size=2, medial_classes=(0,)).forward(cloud)
    b = ModelInference(w, batch_size=2).forward(cloud)

    np.testing.assert_array_equal(np.asarray(a.xyz), np.asarray(b.xyz))
    np.testing.assert_array_equal(np.asarray(a.class_l), np.asarray(b.class_l))
    cls = np.asarray(b.class_l).reshape(-1)
    branch = cls == 0
    assert branch.sum() > 0 and (~branch).sum() > 0
    np.testing.assert_allclose(
        np.asarray(a.medial_vector)[branch],
        np.asarray(b.medial_vector)[branch],
        rtol=2e-2, atol=2e-4,
    )
    np.testing.assert_array_equal(np.asarray(a.medial_vector)[~branch], 0.0)


def test_sorted_upload_with_mask_bits_roundtrip():
    """compact_upload_sorted(with_mask=True) bits decode back to the mask of
    the staged sorted rows."""
    from smart_tree_tpu.core.coords import pack_coords_np
    from smart_tree_tpu.data.dataset import collate

    rng = np.random.default_rng(3)
    voxel = 0.01
    coords = np.unique(rng.integers(0, 50, size=(900, 3)).astype(np.int32), axis=0)
    origin = np.zeros(3, np.float32)
    xyz = (origin + (coords + 0.5) * voxel).astype(np.float32)
    vb = collate([(coords, xyz, None, "t", origin)], 1, capacity=2048,
                 voxel_size=voxel)
    # punch an arbitrary pattern into the mask (collate sets all-True)
    vb.mask[rng.random(len(vb.mask)) < 0.4] = False
    skeys, res, orig, n_act, bits = vb.compact_upload_sorted(
        granularity=256, res_dtype=np.int8, with_mask=True
    )
    stage = len(skeys)
    keys = pack_coords_np(vb.coords, vb.spatial_shape, vb.batch_size,
                          valid=vb.valid)
    order = np.argsort(keys, kind="stable")
    expect = vb.mask[order[:stage]]
    got = np.unpackbits(bits, count=stage).astype(bool)
    np.testing.assert_array_equal(got, expect)
