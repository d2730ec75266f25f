"""String functions — the ``.str`` accessor (reference: blaze/expr/strings.py,
362 LoC; accessor registration at strings.py:300-335).

Every method is a JVM-side Column expression (whole-stage codegen); the
is* predicates that Spark lacks as builtins are regexes via rlike — still
JVM-side, no Python UDF (SURVEY.md §2.7 table).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

_BOOL = T.BooleanType()
_STR = T.StringType()


def _jquote(s: str) -> str:
    """Quote a literal for use inside a Java regex (\\Q...\\E, with the
    embedded-\\E escape dance)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


from ..core import record_accessor_trees


@record_accessor_trees("str")
class StrAccessor:
    """Methods available on string-typed expressions, gated on dtype as the
    reference gates method dispatch on dshape
    (blaze/expr/expressions.py:936-941 schema_method_list)."""

    def __init__(self, expr):
        from ..core import ColExpr
        from .. import schema as _s
        if not _s.is_string(expr.dtype):
            raise TypeError(f".str accessor requires string dtype, got {expr.dtype}")
        self._e: ColExpr = expr

    def _m(self, col, name, dtype=None):
        return self._e._make(col, name, dtype)

    @property
    def _c(self):
        return self._e.col

    # blaze/expr/strings.py:93-94
    def len(self):
        return self._m(F.length(self._c), "len", T.IntegerType())

    # strings.py:97-108,171-175
    def upper(self):
        return self._m(F.upper(self._c), "upper", _STR)

    def lower(self):
        return self._m(F.lower(self._c), "lower", _STR)

    def capitalize(self):
        # python str.capitalize: first char upper, REST lower
        return self._m(
            F.concat(F.upper(F.substring(self._c, 1, 1)),
                     F.lower(F.substring(self._c, 2, 2147483646))),
            "capitalize", _STR)

    # strings.py:177-193
    def strip(self):
        return self._m(F.trim(self._c), "strip", _STR)

    def lstrip(self):
        return self._m(F.ltrim(self._c), "lstrip", _STR)

    def rstrip(self):
        return self._m(F.rtrim(self._c), "rstrip", _STR)

    # strings.py:111-126 — python str.is* predicates as regexes (no Spark
    # builtins; rlike stays in codegen)
    def isalnum(self):
        return self._m(self._c.rlike("^[0-9A-Za-z]+$"), "isalnum", _BOOL)

    def isalpha(self):
        return self._m(self._c.rlike("^[A-Za-z]+$"), "isalpha", _BOOL)

    def isdecimal(self):
        return self._m(self._c.rlike("^[0-9]+$"), "isdecimal", _BOOL)

    def isdigit(self):
        return self._m(self._c.rlike("^[0-9]+$"), "isdigit", _BOOL)

    def isnumeric(self):
        return self._m(self._c.rlike("^[0-9]+$"), "isnumeric", _BOOL)

    def islower(self):
        return self._m(self._c.rlike("^[^A-Z]*[a-z][^A-Z]*$"), "islower", _BOOL)

    def isupper(self):
        return self._m(self._c.rlike("^[^a-z]*[A-Z][^a-z]*$"), "isupper", _BOOL)

    def isspace(self):
        return self._m(self._c.rlike("^\\s+$"), "isspace", _BOOL)

    def istitle(self):
        return self._m(
            self._c.rlike("^([A-Z][a-z]*)(\\s+[A-Z][a-z]*)*$"), "istitle", _BOOL)

    # StrFind: 0-based index, -1 when absent (strings.py:128-142; SQL
    # lowering strpos-1 at blaze/compute/sql.py:1324-1327)
    def find(self, sub: str):
        return self._m(F.instr(self._c, sub) - 1, "find", T.IntegerType())

    # Replace(old, new, max) (strings.py:144-155).  ``max`` limits the
    # replacement to the first N occurrences — python str.replace(count)
    # semantics, still JVM-side: split on the literal pattern with
    # limit=max+1 (the last piece keeps its remainder unsplit), rejoin
    # with the replacement as separator.  No regex backtracking, no UDF.
    def replace(self, old: str, new: str, max: int | None = None):
        if old == "":
            raise ValueError("replace 'old' must be non-empty")
        if max is None or max < 0:      # python: negative count == all
            return self._m(F.replace(self._c, F.lit(old), F.lit(new)),
                           "replace", _STR)
        if max == 0:
            return self._m(self._c, "replace", _STR)
        parts = F.split(self._c, _jquote(old), max + 1)
        return self._m(F.array_join(parts, new), "replace", _STR)

    # Pad (strings.py:157-169)
    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        if side == "left":
            return self._m(F.lpad(self._c, width, fillchar), "pad", _STR)
        if side == "right":
            return self._m(F.rpad(self._c, width, fillchar), "pad", _STR)
        raise ValueError("side must be left or right")

    def _slice_idx(self, bound: int | None, default_col, length):
        """Resolve one python slice bound to a 0-based clamp [0, len]."""
        if bound is None:
            return default_col
        if bound >= 0:
            return F.least(F.lit(bound), length)
        return F.greatest(length + bound, F.lit(0))

    # StrSlice (strings.py:195-220) — full python slice semantics, 0-based,
    # NEGATIVE bounds included (relative to the string length, clamped)
    def slice(self, start: int | None = 0, stop: int | None = None,
              step: int | None = None):
        if step not in (None, 1):
            raise ValueError("string slice step must be 1")
        start = start or 0
        if start >= 0 and (stop is None or stop >= 0):
            # fast path: no length() needed
            length = (stop - start) if stop is not None else 2147483647
            return self._m(F.substring(self._c, start + 1, max(length, 0)),
                           "slice", _STR)
        ln = F.length(self._c)
        lo = self._slice_idx(start, F.lit(0), ln)
        hi = self._slice_idx(stop, ln, ln)
        return self._m(
            F.substring(self._c, lo + 1, F.greatest(hi - lo, F.lit(0))),
            "slice", _STR)

    def __getitem__(self, s: slice):
        return self.slice(s.start, s.stop, s.step)

    # slice_replace (strings.py:202-208): replace [start, stop) with repl;
    # python/pandas semantics incl. negative/None bounds
    def slice_replace(self, start: int | None = None,
                      stop: int | None = None, repl: str = ""):
        ln = F.length(self._c)
        lo = self._slice_idx(start or 0, F.lit(0), ln)
        hi = self._slice_idx(stop, ln, ln)
        hi = F.greatest(hi, lo)  # empty slice inserts at lo
        return self._m(
            F.concat(F.substring(self._c, 1, lo), F.lit(repl),
                     F.substring(self._c, hi + 1, 2147483646)),
            "slice_replace", _STR)

    # StrCat — NULL-PROPAGATING concat (strings.py:222-288).  concat_ws
    # skips nulls; the reference propagates -> use F.concat which propagates.
    def cat(self, other, sep: str | None = None):
        from ..core import ColExpr
        oc = other.col if isinstance(other, ColExpr) else F.lit(other)
        if sep is None:
            return self._m(F.concat(self._c, oc), "cat", _STR)
        return self._m(F.concat(self._c, F.lit(sep), oc), "cat", _STR)

    # like via the parent expression (glob * ? -> SQL % _)
    def like(self, pattern: str):
        return self._e.like(pattern)

    def contains(self, sub: str):
        return self._m(self._c.contains(sub), "contains", _BOOL)

    def startswith(self, sub: str):
        return self._m(self._c.startswith(sub), "startswith", _BOOL)

    def endswith(self, sub: str):
        return self._m(self._c.endswith(sub), "endswith", _BOOL)

    # extensions beyond reference surface (SURVEY.md §2 notes): useful for
    # the text-pipeline operators
    def split(self, pattern: str):
        return self._m(F.split(self._c, pattern), "split",
                       T.ArrayType(T.StringType()))

    def regexp_extract(self, pattern: str, group: int = 1):
        return self._m(F.regexp_extract(self._c, pattern, group),
                       "regexp_extract", _STR)

    def repeat(self, n: int):
        return self._m(F.repeat(self._c, n), "repeat", _STR)
