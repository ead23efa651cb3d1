import jax
import jax.numpy as jnp
import numpy as np

from smart_tree_tpu.train.losses import (
    compute_loss,
    cosine_similarity_loss,
    focal_loss,
    l1_loss,
)


def test_losses_match_torch_semantics():
    torch = __import__("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    n = 64
    pred_r = rng.normal(size=(n, 1)).astype(np.float32)
    tgt_r = rng.uniform(0.01, 0.2, size=(n, 1)).astype(np.float32)
    pred_d = rng.normal(size=(n, 3)).astype(np.float32)
    tgt_d = rng.normal(size=(n, 3)).astype(np.float32)
    logits = rng.normal(size=(n, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=(n,)).astype(np.float32)
    mask = np.ones(n, bool)

    # L1 on log radius
    got = float(l1_loss(jnp.asarray(pred_r), jnp.log(jnp.asarray(tgt_r)), jnp.asarray(mask)))
    ref = float(torch.nn.L1Loss()(torch.tensor(pred_r).view(-1), torch.tensor(np.log(tgt_r)).view(-1)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    # cosine
    got = float(cosine_similarity_loss(jnp.asarray(pred_d), jnp.asarray(tgt_d), jnp.asarray(mask)))
    ref = float(torch.mean(1 - torch.nn.CosineSimilarity()(torch.tensor(pred_d), torch.tensor(tgt_d))))
    np.testing.assert_allclose(got, ref, rtol=1e-4)

    # focal (gamma=2, mean reduction — reference loss.py:79-96)
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)))
    lt = torch.tensor(logits)
    tt = torch.tensor(labels).long().view(-1, 1)
    logpt = F.log_softmax(lt, dim=1).gather(1, tt).view(-1)
    pt = logpt.exp()
    ref = float((-1 * (1 - pt) ** 2 * logpt).mean())
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_compute_loss_vector_class_mask():
    n = 10
    preds = {
        "radius": jnp.ones((n, 1)),
        "direction": jnp.ones((n, 3)),
        "class_l": jnp.zeros((n, 2)),
    }
    targets = jnp.concatenate(
        [
            jnp.full((n, 1), 0.5),
            jnp.ones((n, 3)),
            jnp.concatenate([jnp.zeros((5, 1)), jnp.ones((5, 1))], axis=0),
        ],
        axis=1,
    )
    mask = jnp.ones(n, bool)
    losses = compute_loss(preds, targets, mask, vector_class=0)
    # radius/direction supervised only on class-0 rows
    assert np.isfinite(float(losses["radius"]))
    np.testing.assert_allclose(float(losses["direction"]), 0.0, atol=1e-6)


def test_direction_min_radius_drops_subvoxel_supervision():
    """direction_min_radius drops (or down-weights) direction loss on
    sub-threshold-radius points; radius/class losses are untouched."""
    n = 8
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    preds = {
        "radius": jnp.zeros((n, 1)),
        # perfect on thick rows, opposite on thin rows
        "direction": jnp.asarray(np.where(np.arange(n)[:, None] < 4, dirs, -dirs)),
        "class_l": jnp.zeros((n, 2)),
    }
    radius = jnp.where(jnp.arange(n) < 4, 0.05, 0.004)[:, None]  # thick/thin
    targets = jnp.concatenate(
        [radius, jnp.asarray(dirs), jnp.zeros((n, 1))], axis=1
    )
    mask = jnp.ones(n, bool)

    base = compute_loss(preds, targets, mask)
    gated = compute_loss(preds, targets, mask, direction_min_radius=0.01)
    half = compute_loss(preds, targets, mask, direction_min_radius=0.01,
                        direction_subvoxel_weight=0.5)
    # ungated: half the rows at cos=-1 -> mean(1-cos) = 1.0
    np.testing.assert_allclose(float(base["direction"]), 1.0, atol=1e-5)
    # gated: only the perfect thick rows are supervised
    np.testing.assert_allclose(float(gated["direction"]), 0.0, atol=1e-5)
    # half-weight: (4*0 + 0.5*4*2) / (4 + 0.5*4) = 2/3
    np.testing.assert_allclose(float(half["direction"]), 2.0 / 3.0, atol=1e-5)
    # radius/class losses identical in every variant
    for k in ("radius", "class_l"):
        assert float(base[k]) == float(gated[k]) == float(half[k])
    # gradients stay finite through the float-weight path
    g = jax.grad(
        lambda d: compute_loss(
            {**preds, "direction": d}, targets, mask, direction_min_radius=0.01
        )["direction"]
    )(preds["direction"])
    assert np.isfinite(np.asarray(g)).all()


def test_loss_gradients_finite_with_padding():
    """Padded rows (all-zero preds/targets, mask False) must not poison
    gradients — the NaN mode that broke the first training run."""

    def loss_fn(p):
        preds = {
            "radius": p["r"],
            "direction": p["d"] * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(p["d"] ** 2, 1, keepdims=True), 1e-24)
            ),
            "class_l": p["c"],
        }
        targets = jnp.zeros((6, 5))
        targets = targets.at[:3, 0].set(0.1)
        targets = targets.at[:3, 1].set(1.0)
        mask = jnp.asarray([True] * 3 + [False] * 3)
        return sum(compute_loss(preds, targets, mask).values())

    params = {
        "r": jnp.asarray([[0.1]] * 3 + [[0.0]] * 3),
        "d": jnp.asarray([[1.0, 0, 0]] * 3 + [[0.0, 0, 0]] * 3),
        "c": jnp.zeros((6, 2)),
    }
    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), f"NaN grad in {k}"


def test_to_labelled_clouds_split():
    import numpy as np

    from smart_tree_tpu.train.helper import to_labelled_clouds

    n = 8
    coords = np.zeros((n, 4), np.int32)
    coords[4:, 0] = 1
    valid = np.ones(n, bool)
    valid[-1] = False
    feats = np.random.rand(n, 6).astype(np.float32)
    preds = {
        "radius": np.zeros((n, 1), np.float32),
        "direction": np.tile([1.0, 0, 0], (n, 1)).astype(np.float32),
        "class_l": np.random.rand(n, 2).astype(np.float32),
    }
    clouds = to_labelled_clouds(preds, feats, coords, valid, 2, ("a", "b"))
    assert len(clouds) == 2
    assert len(clouds[0]) == 4 and len(clouds[1]) == 3
    # exp(0) * [1,0,0] = unit x medial vectors
    np.testing.assert_allclose(np.asarray(clouds[0].medial_vector)[:, 0], 1.0)
    assert clouds[1].filename == "b"


def test_reduce_lr_on_plateau_semantics():
    from smart_tree_tpu.train.schedule import ReduceLROnPlateau

    s = ReduceLROnPlateau(lr=0.1, patience=2, factor=0.1)
    assert s.step(1.0) == 0.1     # first value = best
    assert s.step(0.5) == 0.1     # improvement
    assert s.step(0.6) == 0.1     # bad 1
    assert s.step(0.6) == 0.1     # bad 2
    assert abs(s.step(0.6) - 0.01) < 1e-12  # bad 3 > patience -> decay
    st = s.state_dict()
    s2 = ReduceLROnPlateau(lr=0.1, patience=2)
    s2.load_state_dict(st)
    assert s2.lr == s.lr and s2.best == s.best


def test_tracker_means():
    from smart_tree_tpu.train.tracker import Tracker

    t = Tracker()
    t.update({"a": 1.0, "b": 2.0})
    t.update({"a": 3.0, "b": 4.0})
    assert t.means == {"a": 2.0, "b": 3.0}
    assert t.total_loss == 5.0
