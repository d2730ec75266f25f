"""Batch sessionization — split each key's ordered row stream into
sessions wherever the gap between consecutive rows exceeds a threshold.

EXTENSION: the reference has no session concept (its "streaming" is lazy
Python iterators, SURVEY.md §1.1); the streaming-side equivalent is
``blaze_spark.streaming`` session windows.  This is the batch form used by
training-data pipelines (e.g. grouping user events into interaction
sessions before per-session feature extraction).

Plan shape: ONE shuffle.  Both window passes (lag for the gap, running sum
for the session id) share the same ``partitionBy(key).orderBy(order)``
spec, so Catalyst plans a single Exchange + Sort and evaluates both Window
operators over it.  At 100 TB the cost is the one hash-partition on the
session key — the same lower bound any per-key operator has.  Skew note:
one hot key (a bot user) serializes into one task; pre-filter or cap such
keys upstream.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from blaze_spark.core import ColExpr, Table


def _name(c):
    return c.name if isinstance(c, ColExpr) else c


def sessionize(t: Table, key, order_by, gap, gap_col=None,
               session_col: str = "session_id") -> Table:
    """Assign ``session_col`` per row: 0-based session index within ``key``.

    A new session starts when ``gap_col`` (default: ``order_by``) increases
    by MORE than ``gap`` relative to the previous row in ``order_by`` order.
    ``order_by`` must be a deterministic total order within each key (an id
    or exact timestamp) — same requirement the reference's Shift places on
    row order (blaze/expr/collections.py:914-950).
    """
    k, o = _name(key), _name(order_by)
    g = F.col(_name(gap_col)) if gap_col is not None else F.col(o)
    w = Window.partitionBy(k).orderBy(o)
    new_session = F.when(
        g - F.lag(g).over(w) > F.lit(gap), F.lit(1)).otherwise(F.lit(0))
    run = Window.partitionBy(k).orderBy(o).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return Table(
        t.df.withColumn("__new_s", new_session)
        .withColumn(session_col, F.sum("__new_s").over(run))
        .drop("__new_s"))


# Wire dialect (late r12): sessionize is a literal-kwargs lazy window
# plan — a unary node.  Column args must be plain NAMES and the gap a
# JSON scalar for the wire form; expression args keep it local-only.
import functools  # noqa: E402

from ..pipeline.selection import (_client_of, _require_tree,  # noqa: E402
                                  _wire_result)

_local_sessionize = sessionize


@functools.wraps(_local_sessionize)
def sessionize(t: Table, key, order_by, gap, gap_col=None,
               session_col: str = "session_id") -> Table:
    if _client_of(t) is None:
        return _local_sessionize(t, key, order_by, gap, gap_col,
                                 session_col)
    for nm, v in (("key", key), ("order_by", order_by),
                  ("gap_col", gap_col)):
        if v is not None and not isinstance(v, str):
            raise TypeError(
                f"sessionize over blaze://: {nm} must be a column NAME "
                "(expression arguments keep the operator local-only) — "
                "compute() the remote expression first")
    if not isinstance(gap, (int, float)) or isinstance(gap, bool):
        raise TypeError(
            "sessionize over blaze://: gap must be a JSON-scalar "
            "number for the wire form")
    local = _local_sessionize(t, key, order_by, gap, gap_col,
                              session_col)
    node = {"op": "sessionize",
            "args": [_require_tree(t, "sessionize"),
                     {"key": key, "order_by": order_by, "gap": gap,
                      "gap_col": gap_col, "session_col": session_col}]}
    return _wire_result(t, local.df, node)
