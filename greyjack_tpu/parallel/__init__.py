from greyjack_tpu.parallel.islands import IslandRunner
from greyjack_tpu.parallel.mesh import make_island_mesh, init_distributed

__all__ = ["IslandRunner", "make_island_mesh", "init_distributed"]
