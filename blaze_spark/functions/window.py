"""Window-function helpers — engine-level conveniences over
``pyspark.sql.Window`` (the reference's only windowed op is Shift,
blaze/expr/collections.py:914-950; these are extensions following the same
explicit-ordering rule: Spark has no row order, so ``order_by`` is always
required)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import ColExpr, _cols


def _window(order_by, partition_by):
    w = Window.orderBy(*_cols(order_by))
    if partition_by is not None:
        w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    return w


def cumsum(col: ColExpr, order_by, partition_by=None) -> ColExpr:
    w = _window(order_by, partition_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return col._make(F.sum(col.col).over(w), f"{col.name}_cumsum", None)


def cummax(col: ColExpr, order_by, partition_by=None) -> ColExpr:
    w = _window(order_by, partition_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return col._make(F.max(col.col).over(w), f"{col.name}_cummax", col.dtype)


def cummin(col: ColExpr, order_by, partition_by=None) -> ColExpr:
    w = _window(order_by, partition_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return col._make(F.min(col.col).over(w), f"{col.name}_cummin", col.dtype)


def row_number(table, order_by, partition_by=None) -> ColExpr:
    w = _window(order_by, partition_by)
    return ColExpr(table, F.row_number().over(w), "row_number",
                   T.IntegerType())


def rank(table, order_by, partition_by=None) -> ColExpr:
    w = _window(order_by, partition_by)
    return ColExpr(table, F.rank().over(w), "rank", T.IntegerType())


def dense_rank(table, order_by, partition_by=None) -> ColExpr:
    w = _window(order_by, partition_by)
    return ColExpr(table, F.dense_rank().over(w), "dense_rank",
                   T.IntegerType())


def rolling_mean(col: ColExpr, order_by, window_rows: int,
                 partition_by=None) -> ColExpr:
    """Trailing window of ``window_rows`` rows (inclusive)."""
    w = _window(order_by, partition_by).rowsBetween(
        -(window_rows - 1), Window.currentRow)
    return col._make(F.avg(col.col).over(w), f"{col.name}_rolling_mean",
                     T.DoubleType())


def rolling_range(col: ColExpr, agg: str, order_by, lower, upper=0,
                  partition_by=None) -> ColExpr:
    """VALUE-based frame (``RANGE BETWEEN lower PRECEDING AND upper
    FOLLOWING`` on the order column) — e.g. "avg over the last 600 seconds"
    rather than the last N rows.  ``order_by`` must be a single numeric/
    temporal-epoch column; ``lower``/``upper`` are offsets in its units
    (negative = preceding).  ``agg`` is any SQL aggregate name.

    Scale: same single hash-partition + sort as any window; the range frame
    is evaluated with a sliding pointer over the sorted run, not a rescan
    per row."""
    w = _window(order_by, partition_by).rangeBetween(lower, upper)
    fn = getattr(F, agg)
    return col._make(fn(col.col).over(w), f"{col.name}_rolling_{agg}", None)


def first_value(col: ColExpr, order_by, partition_by=None,
                ignore_nulls: bool = False) -> ColExpr:
    """First value in the partition under ``order_by`` (whole-partition
    frame, deterministic given a total order)."""
    w = _window(order_by, partition_by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return col._make(F.first(col.col, ignorenulls=ignore_nulls).over(w),
                     f"{col.name}_first", col.dtype)


def last_value(col: ColExpr, order_by, partition_by=None,
               ignore_nulls: bool = False) -> ColExpr:
    """Last value in the partition under ``order_by``."""
    w = _window(order_by, partition_by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return col._make(F.last(col.col, ignorenulls=ignore_nulls).over(w),
                     f"{col.name}_last", col.dtype)


def nth_value(col: ColExpr, n: int, order_by, partition_by=None) -> ColExpr:
    """n-th value (1-based) in the partition under ``order_by``; null for
    partitions with fewer rows."""
    w = _window(order_by, partition_by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return col._make(F.nth_value(col.col, n).over(w),
                     f"{col.name}_nth{n}", col.dtype)


#: aggregates rolling_range may name when a tree replays server-side —
#: the getattr(F, agg) dispatch is bounded to plain SQL aggregates.
ROLLING_AGGS = {"sum", "avg", "mean", "min", "max", "count", "stddev",
                "stddev_pop", "stddev_samp", "var_pop", "var_samp",
                "first", "last"}


def _wrap_win(name, fn, table_first):
    """Record ``win.<name>`` call nodes (r8 dialect: grouped windows
    travel the wire like .str/.dt/math calls).  Table-first helpers
    (row_number/rank/dense_rank) record a ``None`` child — replay binds
    them to the table under evaluation, same as a field node."""
    import functools

    from ..core import _record_call_tree, _tree_arg

    @functools.wraps(fn)
    def op(first, *args, **kwargs):
        out = fn(first, *args, **kwargs)
        if table_first:
            pos, kw, ok = [], {}, True
            for a in args:
                k, e = _tree_arg(a)
                ok &= k
                pos.append(e)
            for key, a in kwargs.items():
                k, e = _tree_arg(a)
                ok &= k
                kw[key] = e
            if ok:
                out._tree = {"op": f"win.{name}", "args": [None, pos, kw]}
            return out
        return _record_call_tree(out, "win", name, first, args, kwargs)
    return op


#: replay table for interop (name -> wrapped fn); _TABLE_FIRST marks the
#: helpers whose first argument is the Table, not a column expression.
_TABLE_FIRST = {"row_number", "rank", "dense_rank"}
WIN_FNS = {}
for _n, _f in [("cumsum", cumsum), ("cummax", cummax), ("cummin", cummin),
               ("row_number", row_number), ("rank", rank),
               ("dense_rank", dense_rank), ("rolling_mean", rolling_mean),
               ("rolling_range", rolling_range),
               ("first_value", first_value), ("last_value", last_value),
               ("nth_value", nth_value)]:
    WIN_FNS[_n] = _wrap_win(_n, _f, _n in _TABLE_FIRST)

(cumsum, cummax, cummin, row_number, rank, dense_rank, rolling_mean,
 rolling_range, first_value, last_value, nth_value) = (
    WIN_FNS["cumsum"], WIN_FNS["cummax"], WIN_FNS["cummin"],
    WIN_FNS["row_number"], WIN_FNS["rank"], WIN_FNS["dense_rank"],
    WIN_FNS["rolling_mean"], WIN_FNS["rolling_range"],
    WIN_FNS["first_value"], WIN_FNS["last_value"], WIN_FNS["nth_value"])
