"""Pipeline orchestrator: cloud in -> skeleton out.

Rebuild of reference smart_tree/pipeline.py:13-106 with identical config
surface (conf/pipeline.yaml keys) and processing order: preprocess ->
NN inference -> class filter -> skeletonize -> prune/repair/smooth ->
save/view. Visualization is host-side (viz/), saving uses our own PLY
writers; the broken `from_cfg` of the reference (SURVEY.md quirks) has no
equivalent here — Hydra-style instantiate covers it.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

from ..data.cloud import Cloud
from ..data.file import load_cloud, save_ply_cloud, save_ply_lineset, save_ply_mesh
from ..data.tree import DisjointTreeSkeleton
from ..skeleton.skeletonize import Skeletonizer
from .inference import ModelInference

log = logging.getLogger(__name__)


class Pipeline:
    def __init__(
        self,
        preprocessing,
        model_inference: ModelInference,
        skeletonizer: Skeletonizer,
        repair_skeletons: bool = False,
        smooth_skeletons: bool = False,
        smooth_kernel_size: int = 0,
        prune_skeletons: bool = False,
        min_skeleton_radius: float = 0.0,
        min_skeleton_length: float = 1000.0,
        view_model_output: bool = False,
        view_skeletons: bool = False,
        save_outputs: bool = False,
        save_path: str = "/",
        branch_classes=(0,),
        cmap=((1, 0, 0), (0, 1, 0)),
    ):
        self.preprocessing = preprocessing
        self.model_inference = model_inference
        self.skeletonizer = skeletonizer
        self.repair_skeletons = repair_skeletons
        self.smooth_skeletons = smooth_skeletons
        self.smooth_kernel_size = smooth_kernel_size
        self.prune_skeletons = prune_skeletons
        self.min_skeleton_radius = min_skeleton_radius
        self.min_skeleton_length = min_skeleton_length
        self.view_model_output = view_model_output
        self.view_skeletons = view_skeletons
        self.save_outputs = save_outputs
        self.save_path = save_path
        self.branch_classes = list(branch_classes)
        self.cmap = np.asarray(cmap, np.float32)

    def process_cloud(
        self, path: Optional[Path] = None, cloud: Optional[Cloud] = None
    ) -> DisjointTreeSkeleton:
        cloud = load_cloud(path) if path is not None else cloud
        log.info("pipeline: %d points in", len(cloud))
        if self.preprocessing is not None:
            cloud = self.preprocessing(cloud)

        labelled = self.model_inference.forward(cloud)
        log.info("pipeline: inference done (%d labelled points)", len(labelled))
        if self.view_model_output:
            self._view_cloud(labelled)

        branch_cloud = labelled.filter_by_class(self.branch_classes)
        log.info("pipeline: %d branch-class points", len(branch_cloud))
        skeleton = self.skeletonizer.forward(branch_cloud)
        log.info("pipeline: %d skeletons", len(skeleton.skeletons))
        self.post_process(skeleton)

        if self.view_skeletons:
            self._view_skeleton(skeleton, cloud)

        if self.save_outputs:
            self.save(skeleton, labelled)
        return skeleton

    def post_process(self, skeleton: DisjointTreeSkeleton) -> None:
        # same order as reference pipeline.py:95-106: prune -> repair -> smooth
        if self.prune_skeletons:
            skeleton.prune(
                min_length=self.min_skeleton_length,
                min_radius=self.min_skeleton_radius,
            )
        if self.repair_skeletons:
            skeleton.repair()
        if self.smooth_skeletons:
            skeleton.smooth(self.smooth_kernel_size)

    def save(self, skeleton: DisjointTreeSkeleton, labelled: Cloud) -> None:
        from ..viz.mesh import skeleton_lineset, skeleton_tube_mesh

        sp = Path(self.save_path)
        sp.mkdir(parents=True, exist_ok=True)
        verts, edges = skeleton_lineset(skeleton)
        save_ply_lineset(sp / "skeleton.ply", verts, edges)
        mv, mt, mc = skeleton_tube_mesh(skeleton)
        save_ply_mesh(sp / "mesh.ply", mv, mt, mc)
        save_ply_cloud(sp / "cloud.ply", np.asarray(labelled.xyz), np.asarray(labelled.rgb))
        seg_rgb = self.cmap[np.asarray(labelled.class_l).reshape(-1).astype(int)]
        save_ply_cloud(sp / "seg_cld.ply", np.asarray(labelled.xyz), seg_rgb)

    def _view_cloud(self, cloud: Cloud) -> None:
        from ..viz.viewer import view_cloud

        view_cloud(cloud, self.cmap)

    def _view_skeleton(self, skeleton, cloud) -> None:
        from ..viz.viewer import view_skeleton

        view_skeleton(skeleton, cloud)
