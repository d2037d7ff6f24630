from greyjack_tpu.ops import lexico, segments, routes, distance, moves, selection

__all__ = ["lexico", "segments", "routes", "distance", "moves", "selection"]
