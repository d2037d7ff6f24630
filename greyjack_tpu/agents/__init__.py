from greyjack_tpu.agents.tabu_search import TabuSearch
from greyjack_tpu.agents.genetic_algorithm import GeneticAlgorithm
from greyjack_tpu.agents.late_acceptance import LateAcceptance
from greyjack_tpu.agents.simulated_annealing import SimulatedAnnealing
from greyjack_tpu.agents.lshade import LSHADE
from greyjack_tpu.agents.base_individual import Individual
from greyjack_tpu.agents import termination_strategies

__all__ = [
    "TabuSearch",
    "GeneticAlgorithm",
    "LateAcceptance",
    "SimulatedAnnealing",
    "LSHADE",
    "Individual",
    "termination_strategies",
]
