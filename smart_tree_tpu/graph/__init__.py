from .components import component_sizes, connected_components
from .sssp import sssp, tree_distances
