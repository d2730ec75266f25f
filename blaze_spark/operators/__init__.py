"""Relational operators (SURVEY.md §2.2-2.6).

The operator implementations live on :class:`blaze_spark.core.Table` /
:class:`blaze_spark.core.ColExpr` and the free constructors in
``blaze_spark.core`` — they are thin, declarative compositions of Spark
DataFrame transformations, so Catalyst sees one contiguous logical plan
(pushdown/pruning/fusion work across operator boundaries).  This module
re-exports them under the operator names of the reference inventory.

Reference-op -> implementation map:

==================  =========================================================
Field/Projection    ``Table.__getattr__`` / ``Table[[...]]``
Selection           ``Table[bool_expr]`` (predicate dtype checked eagerly)
Slice               ``Table[a:b]``  (offset+limit; order caveat as reference)
Label/ReLabel       ``ColExpr.label`` / ``Table.relabel``
Map / Apply         ``ColExpr.map`` (pandas UDF) / ``Table.apply`` (mapInPandas)
Coerce/Cast         ``ColExpr.coerce``
Coalesce            ``blaze_spark.coalesce``
Merge/transform     ``blaze_spark.merge`` / ``Table.transform``
Shift               ``ColExpr.shift`` (explicit order required)
Join/IsIn           ``blaze_spark.join`` / ``ColExpr.isin``
Reductions          ``ColExpr.sum/min/max/mean/var/std/count/nunique/...``
Summary/By          ``blaze_spark.summary`` / ``blaze_spark.by``
Sort/Head/Tail      ``Table.sort/head/tail``
Sample/Distinct     ``Table.sample`` / ``Table.distinct``
Concat              ``blaze_spark.concat``
==================  =========================================================
"""

from ..core import (  # noqa: F401
    by,
    coalesce,
    concat,
    count_values,
    join,
    merge,
    shift,
    summary,
    transform,
)
