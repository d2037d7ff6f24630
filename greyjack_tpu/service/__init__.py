from greyjack_tpu.service.solver_service import SolverService, SolutionObserver
from greyjack_tpu.service.brokers import InProcessBroker, HttpBroker

__all__ = ["SolverService", "SolutionObserver", "InProcessBroker", "HttpBroker"]
