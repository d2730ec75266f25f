"""blaze_spark — a PySpark-native analytics engine with the query surface of
blaze/blaze (NumPy/Pandas-flavored lazy expressions), rebuilt Spark-first.

The reference (read-only at /root/reference) is a lazy symbolic expression
system compiling to many backends; here there is exactly one backend —
the Spark DataFrame plan — and Catalyst/Tungsten replace the reference's
optimizer and execution machinery (SURVEY.md §3-4).

Public surface::

    from blaze_spark import data, by, merge, join, concat, summary
    t = data("/root/testdata/sf0.01/lineitem.parquet", spark=spark)
    by(t.l_returnflag, total=t.l_quantity.sum()).compute()
"""

from .core import (  # noqa: F401
    ColExpr,
    Reduction,
    Table,
    by,
    coalesce,
    concat,
    count_values,
    cube,
    grouping_sets,
    hypertable_rollup,
    join,
    merge,
    rollup,
    set_interactive_repr,
    shift,
    summary,
    transform,
)
from .cached import CachedTable, ExprCache, cached  # noqa: F401
from .client import Client, RemoteTable  # noqa: F401
from .functions.math import greatest, least, truncate  # noqa: F401
from .sources import data, load_star  # noqa: F401
from . import functions  # noqa: F401

__version__ = "0.1.0"
