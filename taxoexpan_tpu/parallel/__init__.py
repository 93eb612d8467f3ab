from .distributed import (is_multiprocess, maybe_initialize, put_global,
                          put_global_tree)
from .mesh import data_parallel_mesh, make_mesh

__all__ = ["make_mesh", "data_parallel_mesh", "maybe_initialize",
           "is_multiprocess", "put_global", "put_global_tree"]
