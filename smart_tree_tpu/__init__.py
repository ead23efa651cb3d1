"""smart-tree-tpu: TPU-native neural point-cloud tree skeletonization.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of uc-vision/smart-tree
(see /root/reference): a sparse submanifold 3D-conv UNet predicts per-point
medial vectors (direction + log-radius) and branch/foliage labels; a graph
stage (fixed-radius KNN -> connected components -> SSSP -> greedy branch
tracing -> prune/repair/smooth) turns predictions into tube skeletons.

Everything hot runs on TPU under jit over padded, static-shape buffers:
  core/       sorted-key voxel tables, rulebooks, gather-GEMM sparse conv
  nn/         flax UNet + heads, torch-checkpoint converter
  neighbors/  masked fixed-radius KNN (MXU distance tiles)
  graph/      connected components + Bellman-Ford SSSP as lax loops
  skeleton/   skeletonizer (outlier filter, nn graph, branch tracer, post)
  data/       Cloud pytree, npz/ply IO, augmentations, tiling, synthesis
  train/      losses, optax loop, plateau scheduler, trackers
  infer/      block-tiled bucketed inference, Pipeline orchestration
  parallel/   device-mesh sharding helpers (DP training, block-parallel infer)
  viz/        host-side tube meshes / ply export (open3d optional)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: TPU (re)compiles dominate cold-start latency
# (remote-compile tunnels especially); cache XLA executables across runs.
try:  # pragma: no cover - best effort
    _cache_dir = _os.environ.get("SMART_TREE_TPU_JAX_CACHE", "/tmp/jax_cache")
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # CPU processes: the persistent cache is OFF — (de)serializing
        # certain sharded CPU executables segfaults on this host, first in
        # the cache write and, once a poisoned entry exists, in every read
        # (jax compilation_cache.{put,get}_executable_and_time, observed
        # 2026-08-21). CPU compiles are seconds; the cache pays off for
        # remote-compiled TPU programs only. tests/conftest.py applies the
        # same policy for the in-process backend switch.
        _jax.config.update("jax_enable_compilation_cache", False)
    else:
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
