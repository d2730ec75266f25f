"""Math functions (reference: blaze/expr/math.py, 143 LoC).

Unary: abs sqrt sin sinh cos cosh tan tanh exp expm1 log log10 log1p acos
acosh asin asinh atan atanh radians degrees (math.py:35-61); int-valued
ceil/floor/trunc (92-99); binary atan2 copysign fmod hypot ldexp (64-73);
greatest/least (76-89); isnan (102); notnull (106-120);
truncate(precision) = x//p*p (123-135).

All map to pyspark.sql.functions builtins except:
copysign -> signum*abs compose, ldexp -> x*pow(2,y), fmod -> SQL mod.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import ColExpr, _as_col


def _unary(fn, name):
    def op(x: ColExpr) -> ColExpr:
        return x._make(fn(x.col), name, None)
    op.__name__ = name
    return op


abs_ = _unary(F.abs, "abs")
sqrt = _unary(F.sqrt, "sqrt")
sin = _unary(F.sin, "sin")
sinh = _unary(F.sinh, "sinh")
cos = _unary(F.cos, "cos")
cosh = _unary(F.cosh, "cosh")
tan = _unary(F.tan, "tan")
tanh = _unary(F.tanh, "tanh")
exp = _unary(F.exp, "exp")
expm1 = _unary(F.expm1, "expm1")
log = _unary(F.log, "log")
log10 = _unary(F.log10, "log10")
log1p = _unary(F.log1p, "log1p")
acos = _unary(F.acos, "acos")
acosh = _unary(F.acosh, "acosh")
asin = _unary(F.asin, "asin")
asinh = _unary(F.asinh, "asinh")
atan = _unary(F.atan, "atan")
atanh = _unary(F.atanh, "atanh")
radians = _unary(F.radians, "radians")
degrees = _unary(F.degrees, "degrees")


def ceil(x: ColExpr) -> ColExpr:
    return x._make(F.ceil(x.col), "ceil", T.LongType())


def floor(x: ColExpr) -> ColExpr:
    return x._make(F.floor(x.col), "floor", T.LongType())


def trunc(x: ColExpr) -> ColExpr:
    # truncate toward zero (blaze/expr/math.py:92-99)
    return x._make(x.col.cast(T.LongType()), "trunc", T.LongType())


def atan2(y: ColExpr, x) -> ColExpr:
    return y._make(F.atan2(y.col, _as_col(x)), "atan2", T.DoubleType())


def copysign(x: ColExpr, y) -> ColExpr:
    # no Spark builtin: |x| * sign(y), sign(0)=+1 per C copysign
    yc = _as_col(y)
    sign = F.when(yc < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return x._make(F.abs(x.col) * sign, "copysign", T.DoubleType())


def fmod(x: ColExpr, y) -> ColExpr:
    # C fmod: result has sign of x — Spark's % has the same semantics
    return x._make(x.col % _as_col(y), "fmod", None)


def hypot(x: ColExpr, y) -> ColExpr:
    return x._make(F.hypot(x.col, _as_col(y)), "hypot", T.DoubleType())


def ldexp(x: ColExpr, y) -> ColExpr:
    # x * 2**y (no builtin)
    return x._make(x.col * F.pow(F.lit(2.0), _as_col(y)), "ldexp", T.DoubleType())


def greatest(*xs) -> ColExpr:
    first = next(x for x in xs if isinstance(x, ColExpr))
    return first._make(F.greatest(*[_as_col(x) for x in xs]), "greatest", None)


def least(*xs) -> ColExpr:
    first = next(x for x in xs if isinstance(x, ColExpr))
    return first._make(F.least(*[_as_col(x) for x in xs]), "least", None)


def isnan(x: ColExpr) -> ColExpr:
    return x.isnan()


def notnull(x: ColExpr) -> ColExpr:
    return x.notnull()


def truncate(x: ColExpr, precision) -> ColExpr:
    """Numeric truncate to multiple of precision: x // p * p
    (blaze/expr/math.py:123-135)."""
    p = _as_col(precision)
    return x._make(F.floor(x.col / p) * p, "truncate", None)


def _wrap_tree(name, fn):
    """Record the tree-dialect call node ``math.<name>`` on results whose
    first argument is a serializable expression (reference parity: every
    math Expr serializes via to_tree — blaze/server/server.py:411-477)."""
    import functools

    from ..core import _record_call_tree

    @functools.wraps(fn)
    def op(*args, **kwargs):
        out = fn(*args, **kwargs)
        if args and isinstance(args[0], ColExpr):
            _record_call_tree(out, "math", name, args[0],
                              args[1:], kwargs)
        return out
    return op


#: replay table for interop.from_tree — the serializable math surface.
MATH_FNS = {}
for _n, _f in [
    ("abs", abs_), ("sqrt", sqrt), ("sin", sin), ("sinh", sinh),
    ("cos", cos), ("cosh", cosh), ("tan", tan), ("tanh", tanh),
    ("exp", exp), ("expm1", expm1), ("log", log), ("log10", log10),
    ("log1p", log1p), ("acos", acos), ("acosh", acosh), ("asin", asin),
    ("asinh", asinh), ("atan", atan), ("atanh", atanh),
    ("radians", radians), ("degrees", degrees), ("ceil", ceil),
    ("floor", floor), ("trunc", trunc), ("atan2", atan2),
    ("copysign", copysign), ("fmod", fmod), ("hypot", hypot),
    ("ldexp", ldexp), ("greatest", greatest), ("least", least),
    ("isnan", isnan), ("notnull", notnull), ("truncate", truncate),
]:
    MATH_FNS[_n] = _wrap_tree(_n, _f)

# rebind the module-level names so direct calls record too
(abs_, sqrt, sin, sinh, cos, cosh, tan, tanh, exp, expm1, log, log10,
 log1p, acos, acosh, asin, asinh, atan, atanh, radians, degrees, ceil,
 floor, trunc, atan2, copysign, fmod, hypot, ldexp, greatest, least,
 isnan, notnull, truncate) = (
    MATH_FNS["abs"], MATH_FNS["sqrt"], MATH_FNS["sin"], MATH_FNS["sinh"],
    MATH_FNS["cos"], MATH_FNS["cosh"], MATH_FNS["tan"], MATH_FNS["tanh"],
    MATH_FNS["exp"], MATH_FNS["expm1"], MATH_FNS["log"], MATH_FNS["log10"],
    MATH_FNS["log1p"], MATH_FNS["acos"], MATH_FNS["acosh"],
    MATH_FNS["asin"], MATH_FNS["asinh"], MATH_FNS["atan"],
    MATH_FNS["atanh"], MATH_FNS["radians"], MATH_FNS["degrees"],
    MATH_FNS["ceil"], MATH_FNS["floor"], MATH_FNS["trunc"],
    MATH_FNS["atan2"], MATH_FNS["copysign"], MATH_FNS["fmod"],
    MATH_FNS["hypot"], MATH_FNS["ldexp"], MATH_FNS["greatest"],
    MATH_FNS["least"], MATH_FNS["isnan"], MATH_FNS["notnull"],
    MATH_FNS["truncate"])
