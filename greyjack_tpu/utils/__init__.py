from greyjack_tpu.utils import math_utils

__all__ = ["math_utils"]
