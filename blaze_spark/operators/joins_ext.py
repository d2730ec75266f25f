"""Join extensions beyond the reference's equi-join: as-of joins and
skew-salted joins (SURVEY.md §2.3 lists these as engine extensions — the
reference supports only inner/left/right/outer equi-joins).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import Table

__all__ = ["asof_join", "salted_join"]


def asof_join(left: Table, right: Table, on: str, by: str,
              right_cols: list[str] | None = None,
              suffix: str = "_right") -> Table:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` key (DuckDB/ kdb-style
    ASOF JOIN).

    Implementation is the scalable union-window form: tag both inputs,
    union, and carry the last-seen right values forward with
    ``last(..., ignorenulls=True)`` over (by, on) — ONE shuffle on the
    ``by`` key and a sort within partitions, instead of a per-row range
    probe.  At equal timestamps the right row sorts first, so ties match
    (<= semantics).
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    lf = left.df.withColumn("__is_left", F.lit(1))
    rf = right.df.select(
        F.col(by), F.col(on),
        *[F.col(c).alias(c + suffix) for c in rcols]
    ).withColumn("__is_left", F.lit(0))

    unioned = lf.unionByName(rf, allowMissingColumns=True)
    w = (Window.partitionBy(by)
         .orderBy(F.col(on).asc(), F.col("__is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.withColumns({
        c + suffix: F.last(F.col(c + suffix), ignorenulls=True).over(w)
        for c in rcols
    })
    out = filled.filter(F.col("__is_left") == 1).drop("__is_left")
    return Table(out, "asof_join")


def salted_join(big: Table, small: Table, on_left: str, on_right: str,
                salt: int = 8, how: str = "inner") -> Table:
    """Equi-join resilient to hot keys: the big side gets a random salt in
    [0, salt), the small side is replicated ``salt`` times, and the join key
    becomes (key, salt) — a hot key's rows spread over ``salt`` reducers
    instead of one straggler partition.

    Results are identical to a plain join; use when AQE's skew handling
    isn't available or the skew is extreme.  (AQE skew-join is the
    first-choice knob: spark.sql.adaptive.skewJoin.enabled.)
    """
    bd = big.df.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    sd = small.df.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    joined = bd.join(
        sd,
        (bd[on_left] == sd[on_right]) & (bd["__salt"] == sd["__salt"]),
        how,
    ).drop("__salt")
    if on_left != on_right:
        joined = joined.drop(sd[on_right])
    return Table(joined, "salted_join")


# r8 silent-empty audit: no wire-dialect form -> remote inputs raise
# at entry instead of computing over the empty schema-only frame
# Wire dialect (late r12): both extension joins are literal-kwargs
# lazy plans, so they serialize as binary nodes — both sides ride as
# same-server subtrees (the canonical_docs pattern), and the recorded
# schema is the lazy local plan over the empty frames.  salted_join's
# results equal a plain join regardless of the rand() salt (the salt
# only moves rows between reducers), so serializing it is safe.
import functools  # noqa: E402

from ..pipeline.selection import (_require_tree, _same_server,  # noqa: E402
                                  _wire_result)

_local_asof_join = asof_join
_local_salted_join = salted_join


def _remote(x):
    return isinstance(x, Table) and getattr(x, "_client", None) is not None


def _binary_wire(op, left, right, local, kw):
    node = {"op": op,
            "args": [_require_tree(left, op),
                     _require_tree(right, f"{op} right side"), kw]}
    return _wire_result(left, local.df, node)


def _check_sides(op, left, right):
    if not (_remote(left) and _remote(right)) \
            or not _same_server(left, right):
        raise TypeError(
            f"{op} over blaze://: both sides must live on the SAME "
            "server (register them there); mixing a local side with a "
            "remote one would join against the empty schema-only frame")


@functools.wraps(_local_asof_join)
def asof_join(left: Table, right: Table, on: str, by: str,
              right_cols: list[str] | None = None,
              suffix: str = "_right") -> Table:
    if not _remote(left) and not _remote(right):
        return _local_asof_join(left, right, on, by, right_cols, suffix)
    _check_sides("asof_join", left, right)
    local = _local_asof_join(left, right, on, by, right_cols, suffix)
    return _binary_wire(
        "asof_join", left, right, local,
        {"on": on, "by": by,
         "right_cols": (None if right_cols is None
                        else [str(c) for c in right_cols]),
         "suffix": suffix})


@functools.wraps(_local_salted_join)
def salted_join(big: Table, small: Table, on_left: str, on_right: str,
                salt: int = 8, how: str = "inner") -> Table:
    if not _remote(big) and not _remote(small):
        return _local_salted_join(big, small, on_left, on_right, salt,
                                  how)
    _check_sides("salted_join", big, small)
    local = _local_salted_join(big, small, on_left, on_right, salt, how)
    return _binary_wire(
        "salted_join", big, small, local,
        {"on_left": on_left, "on_right": on_right, "salt": int(salt),
         "how": how})
