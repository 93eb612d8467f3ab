from .mesh import data_parallel_mesh, make_mesh

__all__ = ["make_mesh", "data_parallel_mesh"]
