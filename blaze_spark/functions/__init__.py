"""Scalar function library: math free functions + .str/.dt accessors.

All lowered to JVM-side ``pyspark.sql.functions`` (whole-stage codegen) —
never row-at-a-time Python (SURVEY.md §2.7).
"""

from .math import (  # noqa: F401
    abs_, sqrt, sin, sinh, cos, cosh, tan, tanh, exp, expm1, log, log10,
    log1p, acos, acosh, asin, asinh, atan, atanh, radians, degrees, ceil,
    floor, trunc, atan2, copysign, fmod, hypot, ldexp, greatest, least,
    isnan, notnull, truncate,
)
from .strings import StrAccessor  # noqa: F401
from .datetime import DtAccessor  # noqa: F401
