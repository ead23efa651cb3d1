from .mesh import skeleton_lineset, skeleton_tube_mesh
