"""Sources & sinks: ``data()`` — the reference's resource/URI entry point
(blaze/expr/literal.py:125-243; odo URI dispatch).

URI-style strings resolve by extension/scheme; schema discovery is Spark's
reader inference (the reference delegates to ``odo.discover``,
blaze/expr/literal.py:166-198) with optional explicit ``schema=`` override.

Scale notes: parquet/orc readers give Catalyst column pruning + predicate
pushdown + partition pruning for free; CSV/JSON get projection pushdown.
``spark.read.jdbc`` covers the reference's SQLAlchemy sources
(blaze/compute/sql.py); HDF5/bcolz/PyTables chunked stores map to
parquet/ORC (SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..core import Table

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".avro": "avro",
    ".txt": "text",
}


def _infer_format(uri: str) -> str:
    low = uri.lower().rstrip("/")
    for ext, fmt in _EXT_FORMAT.items():
        if low.endswith(ext):
            return fmt
    return "parquet"


def data(source: Any, *, spark: SparkSession | None = None,
         schema=None, fmt: str | None = None, name: str | None = None,
         **options) -> Table:
    """Bind a resource to a leaf (reference ``data()``/``literal``:
    blaze/expr/literal.py:125-243).

    Accepts:
      - a path/URI string (format inferred from extension; override ``fmt``)
      - ``jdbc:...`` URIs with ``dbtable=`` option (SQL sources)
      - a ``pyspark.sql.DataFrame``
      - a list of rows / pandas DataFrame (``spark.createDataFrame``)
    """
    if isinstance(source, Table):
        return source
    if isinstance(source, DataFrame):
        return Table(_normalize_ntz(source), name)

    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession; pass spark=")

    if isinstance(source, str):
        if source.startswith("jdbc:"):
            reader = spark.read.format("jdbc").option("url", source)
            for k, v in options.items():
                reader = reader.option(k, v)
            return Table(_normalize_ntz(reader.load()), name)
        if source.startswith(("mongodb://", "mongodb+srv://")):
            return _mongo_table(spark, source, schema=schema, name=name,
                                **options)
        if source.startswith("blaze://"):
            # remote dataset leaf (reference blaze/server/client.py:
            # 249-268).  'blaze://host:port::name' -> that RemoteTable;
            # bare 'blaze://host:port' -> the Client namespace (the
            # reference 0.8.1+ form: data(uri)['name']).
            from ..client import Client

            url, dataset = source, None
            if "::" in source:
                head, tail = source.rsplit("::", 1)
                # dataset names are identifiers; ':'/']'/'/' in the tail
                # means the '::' belonged to an IPv6 host ([::1]:6363)
                if tail and not any(c in tail for c in ":]/"):
                    url, dataset = head, tail
            ckw = {k: options.pop(k) for k in
                   ("auth_token", "serial", "timeout",
                    "compute_timeout") if k in options}
            if options:
                raise TypeError(
                    f"unsupported blaze:// options: {sorted(options)}")
            client = Client(url, spark=spark, **ckw)
            return client[dataset] if dataset is not None else client
        f = fmt or _infer_format(source)
        if f == "parquet":
            ns_cols = _nanos_timestamp_cols(source)
            if ns_cols:
                # Spark cannot scan some TIMESTAMP(NANOS) parquet; read the
                # raw int64 nanos (legacy conf) and convert to microsecond
                # timestamps scan-side.  Metadata-only footer sniff, no data
                # read; conversion is a codegen'd projection.  Spark-4-written
                # ns files load natively as TimestampType even under the
                # conf, so convert ONLY the columns that actually came back
                # as longs — dtype-gated, not sniff-trusted.
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                from pyspark.sql import functions as F
                from pyspark.sql import types as T

                df = spark.read.format("parquet").load(source)
                conv = {
                    c: F.timestamp_micros((df[c] / 1000).cast("long"))
                    for c in ns_cols
                    if isinstance(df.schema[c].dataType, T.LongType)
                }
                if conv:
                    df = df.withColumns(conv)
                t = Table(_normalize_ntz(df), name or _basename(source))
                t._tree = {"op": "data", "args": [source]}
                return t
        reader = spark.read.format(f)
        if f == "csv":
            options.setdefault("header", "true")
            if schema is None:
                options.setdefault("inferSchema", "true")
            if source.lower().endswith(".tsv"):
                options.setdefault("sep", "\t")
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in options.items():
            reader = reader.option(k, str(v))
        t = Table(_normalize_ntz(reader.load(source)),
                  name or _basename(source))
        t._tree = {"op": "data", "args": [source]}
        return t

    # in-memory rows / pandas
    return Table(_normalize_ntz(spark.createDataFrame(source, schema=schema)),
                 name)


def _parse_mongo_uri(uri: str) -> tuple[str, str | None, str | None]:
    """Split the reference's mongo URI dialect
    ``mongodb://host:port/db::collection``
    (blaze/compute/tests/test_mongo_compute.py:384-405; odo resource
    dispatch) into (connection_uri, database, collection).  The
    ``::collection`` suffix is a blaze-ism — it is stripped before the
    URI reaches any driver."""
    coll = None
    base = uri
    rest = uri.split("://", 1)[1]
    # only a '::' in the PATH segment (after the last '/') is the
    # collection separator — '::' in an IPv6 host ([::1]) or in
    # credentials must not be split
    path_start = rest.find("/")
    if path_start != -1 and "::" in rest[path_start:]:
        base, post = uri.rsplit("::", 1)
        # a query string may trail the collection ('db::coll?x=y'): it
        # belongs on the connection URI, not in the collection name
        # (ADVICE r6); '?opts::coll' stays supported — there the options
        # are already on ``base``
        coll, _, q = post.partition("?")
        if q:
            base += ("&" if "?" in base else "?") + q
    db = None
    if path_start != -1:
        tail = rest[path_start + 1:]
        if coll is not None:
            tail = tail.rsplit("::", 1)[0]
        db = tail.split("?", 1)[0] or None
    return base, db, coll


def _mongo_table(spark: SparkSession, uri: str, *, schema=None,
                 name: str | None = None, **options) -> Table:
    """MongoDB source (reference blaze/compute/mongo.py:106-497 — but
    Spark-first: the official mongo-spark connector partitions the
    collection server-side and pushes projections/filters down, so a
    sharded 10 TB collection scans in parallel like any other source).

    Resolution order, each step honestly gated:

    1. the ``mongodb`` Spark connector (if its jar is on the classpath) —
       the ONLY scale path;
    2. a pymongo driver-side ingest (small collections only: the driver
       materializes the documents, then parallelizes) — gated behind
       ``allow_driver_ingest=True`` so nobody falls onto it silently;
    3. a clear ImportError telling the user which of the two to install.
    """
    base, db, coll = _parse_mongo_uri(uri)
    if coll is None:
        coll = options.pop("collection", None)
    if coll is None:
        raise ValueError(
            "mongodb URI needs a collection: use the reference dialect "
            "'mongodb://host:port/db::collection' or pass collection=")
    allow_ingest = bool(options.pop("allow_driver_ingest", False))
    try:
        reader = (spark.read.format("mongodb")
                  .option("connection.uri", base)
                  .option("collection", coll))
        if db is not None:
            reader = reader.option("database", db)
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in options.items():
            reader = reader.option(k, str(v))
        t = Table(_normalize_ntz(reader.load()), name or coll)
        t._tree = {"op": "data", "args": [uri]}
        return t
    except Exception as exc:  # connector jar absent -> AnalysisException
        if "Failed to find" not in str(exc) and "ClassNotFound" not in str(exc):
            raise
        connector_err = exc
    try:
        import pymongo  # noqa: F401
    except ImportError:
        raise ImportError(
            "mongodb source needs either the mongo-spark connector on the "
            "Spark classpath (org.mongodb.spark:mongo-spark-connector — "
            "the scale path; server-side partitioning + pushdown) or "
            "pymongo for a driver-side ingest of SMALL collections "
            f"(opt in with allow_driver_ingest=True). Connector probe: "
            f"{connector_err}") from connector_err
    if not allow_ingest:
        raise RuntimeError(
            "mongo-spark connector not on the classpath and driver-side "
            "pymongo ingest is opt-in (it materializes the collection on "
            "the driver — small collections only): pass "
            "allow_driver_ingest=True or install the connector")
    if db is None:
        raise ValueError(
            "mongodb URI needs a database for the driver ingest: "
            "'mongodb://host:port/db::collection'")
    client = pymongo.MongoClient(base)
    docs = list(client[db][coll].find(projection={"_id": False}))
    t = Table(_normalize_ntz(
        spark.createDataFrame(docs, schema=schema)), name or coll)
    t._tree = {"op": "data", "args": [uri]}
    return t


def _rewrite_ntz_type(dt):
    """Recursively rewrite TIMESTAMP_NTZ to TimestampType inside any
    struct/array/map nesting.  Returns (new_type, changed)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.TimestampNTZType):
        return T.TimestampType(), True
    if isinstance(dt, T.StructType):
        fields, changed = [], False
        for f in dt.fields:
            new, ch = _rewrite_ntz_type(f.dataType)
            changed |= ch
            fields.append(T.StructField(f.name, new, f.nullable, f.metadata))
        return (T.StructType(fields), True) if changed else (dt, False)
    if isinstance(dt, T.ArrayType):
        new, ch = _rewrite_ntz_type(dt.elementType)
        return (T.ArrayType(new, dt.containsNull), True) if ch else (dt, False)
    if isinstance(dt, T.MapType):
        nk, ck = _rewrite_ntz_type(dt.keyType)
        nv, cv = _rewrite_ntz_type(dt.valueType)
        if ck or cv:
            return T.MapType(nk, nv, dt.valueContainsNull), True
        return dt, False
    return dt, False


def _rewrite_ntz_schema(schema):
    """Schema-level NTZ -> TimestampType rewrite (for streaming sources,
    whose schema must be declared before load)."""
    new, _ = _rewrite_ntz_type(schema)
    return new


def _warn_if_non_utc(df: DataFrame) -> None:
    """NTZ -> TimestampType is value-preserving only under a UTC session
    zone; warn (don't fail) when a user session is zoned elsewhere."""
    try:
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    except Exception:
        return
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00"):
        import warnings

        warnings.warn(
            f"casting TIMESTAMP_NTZ under session timeZone={tz!r}; naive "
            "timestamps are interpreted in that zone — set "
            "spark.sql.session.timeZone=UTC for value-preserving reads",
            stacklevel=3)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns (including NTZ nested in struct/array/
    map) to session-zone TimestampType at the source boundary.  Parquet
    written with isAdjustedToUTC=false (naive timestamps — pandas/DuckDB
    default) reads as TIMESTAMP_NTZ under Spark >= 3.4's
    inferTimestampNTZ; the engine's dtype surface (.dt accessors, interval
    arithmetic, oracle comparisons) is defined over TimestampType with the
    session zone pinned to UTC, where the cast is value-preserving.
    Metadata-only when no NTZ column exists."""
    from pyspark.sql import functions as F

    conv = {}
    for f in df.schema.fields:
        new, changed = _rewrite_ntz_type(f.dataType)
        if changed:
            conv[f.name] = F.col(f.name).cast(new)
    if not conv:
        return df
    _warn_if_non_utc(df)
    return df.withColumns(conv)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — footer sniff only."""
    try:
        import glob
        import os

        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            files = glob.glob(os.path.join(path, "*.parquet"))
            if not files:
                return []
            target = files[0]
        schema = pq.read_schema(target)
        import pyarrow as pa

        return [n for n, typ in zip(schema.names, schema.types)
                if pa.types.is_timestamp(typ) and typ.unit == "ns"]
    except Exception:
        return []


def _basename(path: str) -> str:
    base = path.rstrip("/").rsplit("/", 1)[-1]
    return base.split(".", 1)[0]


def load_star(spark: SparkSession, sf_dir: str,
              tables=("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents",
                      "embeddings")) -> dict[str, Table]:
    """Load the driver's TPC-H-ish star schema (TESTDATA.md) as Tables."""
    return {t: data(f"{sf_dir}/{t}.parquet", spark=spark, name=t)
            for t in tables}
