from greyjack_tpu.solver.solver import Solver
from greyjack_tpu.solver.solver_logging_levels import SolverLoggingLevels
from greyjack_tpu.solver.observer import Observer
from greyjack_tpu.solver.initial_solution import InitialSolution
from greyjack_tpu.solver.checkpoint import save_checkpoint, load_checkpoint
from greyjack_tpu.solver.metrics import SolverMetrics

__all__ = ["Solver", "SolverLoggingLevels", "Observer", "InitialSolution",
           "save_checkpoint", "load_checkpoint", "SolverMetrics"]
