from .branch import BranchSkeleton
from .cloud import Cloud
from .file import load_cloud, load_data_npz, save_data_npz
from .tree import DisjointTreeSkeleton, TreeSkeleton
from .tube import CollatedTube, Tube, collate_tubes
