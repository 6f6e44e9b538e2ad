from .conversions import CONVERSION_REGISTRY, convert_variable  # noqa: F401
from .met import CALC_REGISTRY, get_function  # noqa: F401
