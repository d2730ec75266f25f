"""N-D array operations on ArrayType columns — the ``.arr`` accessor.

The reference's array family (blaze/expr/arrays.py:13-129 Transpose /
TensorDot / dot; axis-aware reductions blaze/expr/reductions.py:49-64;
N-D Slice blaze/expr/expressions.py:488-515) operates on whole numpy
arrays.  The Spark-native re-expression is TABULAR: each row carries an
array (``array<double>`` = 1-D vector) or an array of arrays
(``array<array<double>>`` = 2-D matrix), and every operation below is a
per-row JVM expression — array higher-order functions inside whole-stage
codegen, no Python, no shuffle.  A 10^9-row table of 1k-dim vectors
therefore scales exactly like any other projection.

Semantics:

- elementwise arithmetic (`+ - * /`) with another array column (zip_with)
  or a scalar (broadcast transform), always in double precision;
- python-style 0-based ``[i]`` / ``[a:b]`` indexing (negative indices
  relative to the end, slices clamped);
- ``sum``/``mean`` with numpy's ``axis``: None = grand total, 0 = down
  the rows (2-D: column sums), 1 = across each row;
- ``dot``: 1-D·1-D -> scalar (left-to-right aggregate — bit-identical to
  DuckDB ``list_dot_product``; SURVEY.md oracle conventions), 2-D·1-D ->
  vector, 2-D·2-D -> matrix (TensorDot's default last-vs-first axes);
- ``transpose`` for 2-D (reference Transpose with axes=(1,0) — higher
  N-D axes permutations have no tabular analogue and raise).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_D = T.DoubleType()


def _is_array(dt: T.DataType) -> bool:
    return isinstance(dt, T.ArrayType)


def _ndim(dt: T.DataType) -> int:
    n = 0
    while isinstance(dt, T.ArrayType):
        n += 1
        dt = dt.elementType
    return n


def _dbl(c: Column) -> Column:
    return c.cast("double")


class ArrayAccessor:
    """Array methods on ArrayType expressions, dtype-gated like ``.str`` /
    ``.dt`` (reference dshape_method_list registration,
    blaze/expr/arrays.py:130-137)."""

    def __init__(self, expr):
        if not _is_array(expr.dtype):
            raise TypeError(
                f".arr accessor requires array dtype, got {expr.dtype}")
        self._e = expr
        self.ndim = _ndim(expr.dtype)

    # -- helpers ------------------------------------------------------------
    def _m(self, col, name, dtype=None):
        return self._e._make(col, f"{self._e.name}_{name}", dtype)

    @property
    def _c(self) -> Column:
        return self._e.col

    @staticmethod
    def _vec_sum(arr: Column) -> Column:
        # left-to-right double accumulation (matches DuckDB list_sum order)
        return F.aggregate(arr, F.lit(0.0), lambda a, v: a + _dbl(v))

    @staticmethod
    def _vec_dot(a: Column, b: Column) -> Column:
        return F.aggregate(F.zip_with(a, b, lambda x, y: _dbl(x) * _dbl(y)),
                           F.lit(0.0), lambda acc, v: acc + v)

    def _lift(self, other: Any) -> tuple[Column | None, Column | None]:
        """(array_col, scalar_col) — exactly one is non-None."""
        from ..core import ColExpr
        if isinstance(other, ColExpr):
            if _is_array(other.dtype):
                return other.col, None
            return None, other.col
        if isinstance(other, (int, float)):
            return None, F.lit(float(other))
        raise TypeError(f"cannot combine array with {type(other)}")

    # -- metadata / indexing -------------------------------------------------
    def size(self):
        """Outer length (reference shape[0])."""
        return self._m(F.size(self._c), "size", T.IntegerType())

    def __getitem__(self, idx):
        """Python indexing: ``[i]`` (0-based, negatives from the end) or
        ``[a:b]`` (N-D Slice, blaze/expr/expressions.py:488-515)."""
        inner = self._e.dtype.elementType
        if isinstance(idx, int):
            # element_at is 1-based; negatives index from the end already
            pos = idx + 1 if idx >= 0 else idx
            return self._e._make(F.element_at(self._c, pos),
                                 f"{self._e.name}_at", inner)
        if isinstance(idx, slice):
            if idx.step not in (None, 1):
                raise ValueError("array slice step must be 1")
            start, stop = idx.start or 0, idx.stop
            if start >= 0 and (stop is None or stop >= 0):
                n = (stop - start) if stop is not None else 2147483647
                col = F.slice(self._c, start + 1, max(n, 0))
            else:
                ln = F.size(self._c)
                lo = (F.least(F.lit(start), ln) if start >= 0
                      else F.greatest(ln + start, F.lit(0)))
                hi = (ln if stop is None else
                      (F.least(F.lit(stop), ln) if stop >= 0
                       else F.greatest(ln + stop, F.lit(0))))
                col = F.slice(self._c, lo + 1, F.greatest(hi - lo, F.lit(0)))
            return self._e._make(col, f"{self._e.name}_slice", self._e.dtype)
        raise TypeError(f"bad array index: {idx!r}")

    # -- elementwise arithmetic ----------------------------------------------
    def _ewise(self, other, fn, name):
        arr, scalar = self._lift(other)
        out_t = T.ArrayType(_D) if self.ndim == 1 \
            else T.ArrayType(T.ArrayType(_D))
        if self.ndim == 1:
            if arr is not None:
                col = F.zip_with(self._c, arr, lambda x, y: fn(_dbl(x), _dbl(y)))
            else:
                col = F.transform(self._c, lambda x: fn(_dbl(x), scalar))
        elif self.ndim == 2:
            if arr is not None:
                col = F.zip_with(
                    self._c, arr,
                    lambda r1, r2: F.zip_with(
                        r1, r2, lambda x, y: fn(_dbl(x), _dbl(y))))
            else:
                col = F.transform(
                    self._c,
                    lambda r: F.transform(r, lambda x: fn(_dbl(x), scalar)))
        else:
            raise ValueError("elementwise ops support 1-D and 2-D arrays")
        return self._m(col, name, out_t)

    def add(self, other):
        return self._ewise(other, lambda a, b: a + b, "add")

    def sub(self, other):
        return self._ewise(other, lambda a, b: a - b, "sub")

    def mul(self, other):
        return self._ewise(other, lambda a, b: a * b, "mul")

    def div(self, other):
        return self._ewise(other, lambda a, b: a / b, "div")

    __add__ = add
    __sub__ = sub
    __mul__ = mul
    __truediv__ = div

    # -- axis-aware reductions (blaze/expr/reductions.py:49-64) --------------
    def sum(self, axis: int | None = None):
        if self.ndim == 1:
            if axis not in (None, 0):
                raise ValueError("1-D array has only axis 0")
            return self._m(self._vec_sum(self._c), "sum", _D)
        if self.ndim != 2:
            raise ValueError("sum supports 1-D and 2-D arrays")
        if axis is None:
            total = F.aggregate(self._c, F.lit(0.0),
                                lambda acc, row: acc + self._vec_sum(row))
            return self._m(total, "sum", _D)
        if axis == 1:
            return self._m(F.transform(self._c, self._vec_sum),
                           "sum", T.ArrayType(_D))
        if axis == 0:
            # fold rows into a running elementwise sum, seeded with zeros
            ncol = F.size(F.element_at(self._c, 1))
            zeros = F.transform(F.sequence(F.lit(1), ncol), lambda _: F.lit(0.0))
            col = F.aggregate(
                self._c, zeros,
                lambda acc, row: F.zip_with(acc, row,
                                            lambda a, x: a + _dbl(x)))
            return self._m(col, "sum", T.ArrayType(_D))
        raise ValueError("axis must be None, 0 or 1")

    def mean(self, axis: int | None = None):
        if self.ndim == 1:
            return self._m(self._vec_sum(self._c) / F.size(self._c), "mean", _D)
        if axis is None:
            nrow, ncol = F.size(self._c), F.size(F.element_at(self._c, 1))
            return self._m(self.sum(None).col / (nrow * ncol), "mean", _D)
        if axis == 1:
            return self._m(
                F.transform(self._c, lambda r: self._vec_sum(r) / F.size(r)),
                "mean", T.ArrayType(_D))
        if axis == 0:
            nrow = F.size(self._c)
            return self._m(
                F.transform(self.sum(0).col, lambda s: s / nrow),
                "mean", T.ArrayType(_D))
        raise ValueError("axis must be None, 0 or 1")

    # -- linear algebra ------------------------------------------------------
    def transpose(self):
        """2-D transpose (reference Transpose, axes=(1,0) — the only
        permutation with a tabular analogue)."""
        if self.ndim != 2:
            raise ValueError("transpose requires a 2-D array column")
        ncol = F.size(F.element_at(self._c, 1))
        col = F.transform(
            F.sequence(F.lit(0), ncol - 1),
            lambda j: F.transform(self._c,
                                  lambda row: F.element_at(row, j + 1)))
        return self._m(col, "T", T.ArrayType(T.ArrayType(_D)))

    @property
    def T(self):  # noqa: N802 — numpy naming
        return self.transpose()

    def dot(self, other):
        """TensorDot with the default axes (last of lhs vs first of rhs,
        blaze/expr/arrays.py:104-116): 1-D·1-D -> scalar, 2-D·1-D ->
        vector, 2-D·2-D -> matrix."""
        from ..core import ColExpr
        if not isinstance(other, ColExpr) or not _is_array(other.dtype):
            raise TypeError("dot requires an array expression")
        ondim = _ndim(other.dtype)
        oc = other.col
        if self.ndim == 1 and ondim == 1:
            return self._m(self._vec_dot(self._c, oc), "dot", _D)
        if self.ndim == 2 and ondim == 1:
            return self._m(
                F.transform(self._c, lambda row: self._vec_dot(row, oc)),
                "dot", T.ArrayType(_D))
        if self.ndim == 2 and ondim == 2:
            # rows of lhs x columns of rhs (transpose rhs once, in-expr)
            ncol = F.size(F.element_at(oc, 1))
            rhs_t = F.transform(
                F.sequence(F.lit(0), ncol - 1),
                lambda j: F.transform(oc, lambda r: F.element_at(r, j + 1)))
            col = F.transform(
                self._c,
                lambda row: F.transform(rhs_t,
                                        lambda c_: self._vec_dot(row, c_)))
            return self._m(col, "dot", T.ArrayType(T.ArrayType(_D)))
        raise ValueError("dot supports 1-D·1-D, 2-D·1-D, 2-D·2-D")

    def norm(self):
        """L2 norm (vnorm over the array axis)."""
        if self.ndim != 1:
            raise ValueError("norm requires a 1-D array column")
        return self._m(F.sqrt(self._vec_dot(self._c, self._c)), "norm", _D)

    def outer(self, other):
        """Outer product (TensorDot with axes=0, blaze/expr/arrays.py:104):
        1-D(m) ⊗ 1-D(n) -> 2-D(m×n)."""
        from ..core import ColExpr
        if not isinstance(other, ColExpr) or _ndim(other.dtype) != 1 \
                or self.ndim != 1:
            raise TypeError("outer requires two 1-D array expressions")
        oc = other.col
        col = F.transform(
            self._c, lambda x: F.transform(oc, lambda y: _dbl(x) * _dbl(y)))
        return self._m(col, "outer", T.ArrayType(T.ArrayType(_D)))

    def tensordot(self, other, axes: int = 1):
        """numpy-semantics ``tensordot`` (blaze/expr/arrays.py:104-129):
        ``axes=0`` outer product, ``axes=1`` last-vs-first contraction
        (= ``dot``), ``axes=2`` double contraction of two 2-D matrices to
        a scalar (sum_ij a[i][j]*b[i][j] — e.g. ‖A‖²_F as
        ``a.tensordot(a, 2)``).  Accumulation order is row-major
        left-to-right, matching the DuckDB-oracle convention used by
        ``dot``/``sum``."""
        from ..core import ColExpr
        if not isinstance(other, ColExpr) or not _is_array(other.dtype):
            raise TypeError("tensordot requires an array expression")
        if axes == 0:
            return self.outer(other)
        if axes == 1:
            return self.dot(other)
        if axes == 2:
            if self.ndim != 2 or _ndim(other.dtype) != 2:
                raise ValueError("axes=2 requires two 2-D array columns")
            oc = other.col
            col = F.aggregate(
                F.zip_with(self._c, oc,
                           lambda r1, r2: self._vec_dot(r1, r2)),
                F.lit(0.0), lambda acc, v: acc + v)
            return self._m(col, "tensordot", _D)
        raise ValueError("axes must be 0, 1 or 2 for tabular arrays")
