from greyjack_tpu.variables.planning_variables import GJFloat, GJInteger

__all__ = ["GJFloat", "GJInteger"]
