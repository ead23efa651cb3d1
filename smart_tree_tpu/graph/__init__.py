from .components import component_sizes, connected_components
from .sssp import sssp, sssp_multi, tree_distances
