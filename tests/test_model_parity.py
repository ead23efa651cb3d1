"""Checkpoint parity: JAX sparse model vs a dense torch oracle built from
the shipped reference state_dict (SURVEY.md §4 level-3 test).

The oracle implements the reference architecture densely with torch ops and
the converted weights: submanifold conv == dense conv masked to active
sites; strided conv == dense stride-2 conv masked to the sparse output
support; inverse conv == explicit pair-replay accumulation. Matching here
pins every wiring choice (BN placement, concat order, head layout, kernel
orientation) against real trained weights.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

WEIGHTS = Path("/root/reference/smart_tree/model/weights/noble-elevator-58_model_weights.pt")
pytestmark = pytest.mark.skipif(not WEIGHTS.exists(), reason="reference weights absent")


@pytest.fixture(scope="module")
def sd():
    return torch.load(WEIGHTS, map_location="cpu", weights_only=True)


@pytest.fixture(scope="module")
def sparse_input():
    rng = np.random.default_rng(0)
    shape, batch = (20, 20, 20), 1
    # clustered voxels so strided levels stay non-trivial
    centers = rng.integers(3, 17, size=(6, 3))
    pts = np.concatenate(
        [c + rng.integers(-3, 4, size=(40, 3)) for c in centers], axis=0
    )
    pts = np.clip(pts, 0, 19)
    coords = np.unique(
        np.concatenate([np.zeros((len(pts), 1), int), pts], axis=1), axis=0
    ).astype(np.int32)
    feats = rng.normal(scale=5.0, size=(len(coords), 3)).astype(np.float32)
    return coords, feats, shape, batch


def torch_bn(x, sd, prefix):
    return F.batch_norm(
        x,
        sd[f"{prefix}.running_mean"],
        sd[f"{prefix}.running_var"],
        sd[f"{prefix}.weight"],
        sd[f"{prefix}.bias"],
        training=False,
        eps=1e-5,
    )


def dense_oracle(sd, coords, feats, shape):
    """Run the full reference model densely; returns per-voxel outputs for
    the input coords plus selected intermediates."""
    X, Y, Z = shape
    act0 = torch.zeros(1, 1, X, Y, Z)
    dense = torch.zeros(1, 3, X, Y, Z)
    for (b, x, y, z), f in zip(coords, feats):
        dense[0, :, x, y, z] = torch.tensor(f)
        act0[0, 0, x, y, z] = 1.0

    def conv(x, key, stride=1, pad=1):
        w = sd[key].permute(0, 4, 1, 2, 3)  # (Cout,kx,ky,kz,Cin)->(Cout,Cin,k,k,k)
        return F.conv3d(x, w, stride=stride, padding=pad)

    def cbr(x, act, prefix, pad=1):
        k = sd[f"{prefix}.0.weight"].shape[1]
        y = conv(x, f"{prefix}.0.weight", pad=(k - 1) // 2)
        y = torch_bn(y, sd, f"{prefix}.1")
        return F.relu(y) * act

    def resblock(x, act, prefix):
        cin = sd[f"{prefix}.sequence.0.weight"].shape[-1]
        cout = sd[f"{prefix}.sequence.0.weight"].shape[0]
        if f"{prefix}.identity.0.weight" in sd:
            ident = conv(x, f"{prefix}.identity.0.weight", pad=0)
        else:
            ident = x
        y = conv(x, f"{prefix}.sequence.0.weight", pad=1)
        y = F.relu(torch_bn(y, sd, f"{prefix}.sequence.1")) * act
        y = conv(y, f"{prefix}.sequence.3.weight", pad=1)
        y = torch_bn(y, sd, f"{prefix}.sequence.4")
        return F.relu(y + ident) * act

    def down_support(act):
        # output site active iff any input in its 3^3 stride-2 field
        pooled = F.conv3d(act, torch.ones(1, 1, 3, 3, 3), stride=2, padding=1)
        return (pooled > 0).float()

    def encode(x, act, prefix):
        y = conv(x, f"{prefix}.sequence.0.weight", stride=2, pad=1)
        a = down_support(act)
        y = F.relu(torch_bn(y, sd, f"{prefix}.sequence.1")) * a
        return y, a

    def decode(x_coarse, act_fine, prefix):
        # pair replay: fine[f] += W[k] @ coarse[(f+1-k)/2] (exact division)
        w = sd[f"{prefix}.sequence.0.weight"]  # (Cf, kx,ky,kz, Cc)
        cf = w.shape[0]
        _, cc, xs, ys, zs = x_coarse.shape
        Xf, Yf, Zf = act_fine.shape[-3:]
        out = torch.zeros(1, cf, Xf, Yf, Zf)
        for kx in range(3):
            for ky in range(3):
                for kz in range(3):
                    wk = w[:, kx, ky, kz, :]  # (Cf, Cc)
                    for ox in range(xs):
                        fx = 2 * ox - 1 + kx
                        if not (0 <= fx < Xf):
                            continue
                        for oy in range(ys):
                            fy = 2 * oy - 1 + ky
                            if not (0 <= fy < Yf):
                                continue
                            for oz in range(zs):
                                fz = 2 * oz - 1 + kz
                                if not (0 <= fz < Zf):
                                    continue
                                out[0, :, fx, fy, fz] += wk @ x_coarse[0, :, ox, oy, oz]
        out = F.relu(torch_bn(out, sd, f"{prefix}.sequence.1")) * act_fine
        return out

    def ublock(x, act, prefix, depth):
        out = resblock(x, act, f"{prefix}.Head")
        if f"{prefix}.Encode.sequence.0.weight" not in sd:
            return out
        ident = out
        down, act_down = encode(out, act, f"{prefix}.Encode")
        deep = ublock(down, act_down, f"{prefix}.U", depth + 1)
        up = decode(deep, act, f"{prefix}.Decode")
        cat = torch.cat([ident, up], dim=1)
        return resblock(cat, act, f"{prefix}.Tail")

    x = cbr(dense, act0, "input_conv.sequence", pad=0)
    intermediates = {"input_conv": x.clone()}
    u = ublock(x, act0, "UNet", 0)
    intermediates["unet"] = u.clone()

    def head(x, prefix):
        y = conv(x, f"{prefix}.sequence.0.weight", pad=0)
        y = F.relu(torch_bn(y, sd, f"{prefix}.sequence.1")) * act0
        y = conv(y, f"{prefix}.sequence.3.weight", pad=0)
        y = F.relu(torch_bn(y, sd, f"{prefix}.sequence.4")) * act0
        return conv(y, f"{prefix}.sequence.6.weight", pad=0)

    radius = head(u, "radius_head")
    direction = head(u, "direction_head")
    direction = direction / direction.norm(dim=1, keepdim=True).clamp(min=1e-12)
    class_l = head(u, "class_head")

    def at_coords(x):
        return np.stack([x[0, :, c[1], c[2], c[3]].numpy() for c in coords])

    return {
        "input_conv": at_coords(intermediates["input_conv"]),
        "unet": at_coords(intermediates["unet"]),
        "radius": at_coords(radius),
        "direction": at_coords(direction),
        "class_l": at_coords(class_l),
    }


def jax_forward(coords, feats, shape, batch):
    from smart_tree_tpu.core.plan import build_plan
    from smart_tree_tpu.core.sparse_tensor import SparseVoxelTensor
    from smart_tree_tpu.infer.inference import load_variables, model_from_variables

    variables = load_variables("smart_tree_tpu/weights/noble-elevator-58.npz")
    model = model_from_variables(variables)
    cap = len(coords) + 13
    cpad = np.concatenate([coords, np.full((cap - len(coords), 4), -1, np.int32)])
    fpad = np.concatenate([feats, np.zeros((cap - len(coords), 3), np.float32)])
    x = SparseVoxelTensor.from_coords(jnp.asarray(cpad), jnp.asarray(fpad), shape, batch)
    # NB: stride-2 sparse levels can hold MORE voxels than their input level;
    # capacities must never truncate (level-1 here: 253 voxels from 222)
    plan = build_plan(x, len(model.unet_planes), min_capacity=2048)
    for lv in plan.levels:
        assert int(lv.count) <= lv.keys.shape[0]
    preds = model.apply(variables, plan, x.feats, train=False)
    # map rows back to the original coord order
    sorted_coords = np.asarray(x.coords())
    active = np.asarray(x.active)
    index = {tuple(c): i for i, c in enumerate(sorted_coords[: len(active)]) if active[i]}
    rows = np.asarray([index[tuple(c)] for c in coords])
    return {k: np.asarray(v)[rows] for k, v in preds.items()}


@pytest.mark.slow  # ~90 s on this 1-core host
def test_full_model_parity(sd, sparse_input):
    coords, feats, shape, batch = sparse_input
    ref = dense_oracle(sd, coords, feats, shape)
    got = jax_forward(coords, feats, shape, batch)
    np.testing.assert_allclose(
        got["radius"], ref["radius"], rtol=1e-3, atol=1e-4,
        err_msg="radius head diverges from dense oracle",
    )
    np.testing.assert_allclose(
        got["direction"], ref["direction"], rtol=1e-3, atol=1e-4,
        err_msg="direction head diverges",
    )
    np.testing.assert_allclose(
        got["class_l"], ref["class_l"], rtol=1e-3, atol=1e-4,
        err_msg="class head diverges",
    )
