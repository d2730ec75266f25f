"""Sources & sinks: URI resolution, format inference, schema override,
round-trips (reference: blaze/expr/literal.py data(), odo sinks)."""

from __future__ import annotations

import pytest


def test_csv_roundtrip(spark, t, tmp_path):
    from blaze_spark import data

    path = str(tmp_path / "t.csv")
    t.into(path, fmt="csv", header="true")
    back = data(path, spark=spark)
    assert back.nrows() == 3
    assert set(back.columns) == {"name", "amount", "id"}
    # inferSchema brings ints back as ints
    assert dict(back.df.dtypes)["amount"] == "int"


def test_csv_schema_override(spark, t, tmp_path):
    from blaze_spark import data

    path = str(tmp_path / "t2.csv")
    t.into(path, fmt="csv", header="true")
    back = data(path, spark=spark, schema="name string, amount double, id long")
    assert dict(back.df.dtypes)["amount"] == "double"


def test_json_roundtrip(spark, t, tmp_path):
    from blaze_spark import data

    path = str(tmp_path / "t.json")
    t.into(path, fmt="json")
    back = data(path, spark=spark, fmt="json")
    assert back.nrows() == 3


def test_parquet_sink_and_format_inference(spark, t, tmp_path):
    from blaze_spark import data

    path = str(tmp_path / "t_out.parquet")
    t.into(path)
    back = data(path, spark=spark)
    assert back.nrows() == 3
    assert back.schema == t.schema


def test_in_memory_rows(spark):
    from blaze_spark import data

    t = data([(1, "a")], spark=spark, schema="x int, s string")
    assert t.nrows() == 1


def test_dataframe_passthrough(spark):
    from blaze_spark import data

    df = spark.range(5)
    t = data(df)
    assert t.nrows() == 5


def test_nanos_parquet_handled(spark, sf_dir):
    from blaze_spark import data

    e = data(f"{sf_dir}/events.parquet", spark=spark)
    assert dict(e.df.dtypes)["ts"] == "timestamp"
    # microsecond content survives
    row = e.sort(e.event_id).head(1).df.collect()[0]
    assert row.ts.microsecond > 0


def test_ntz_normalized_to_session_timestamp(spark, tmp_path):
    """Naive (isAdjustedToUTC=false) parquet timestamps read as
    TIMESTAMP_NTZ under Spark's inferTimestampNTZ; data() casts them to
    session-zone TimestampType so the whole dtype surface (.dt, intervals,
    oracle comparison) sees one timestamp type.  Session tz is UTC in
    conftest, so values are preserved exactly."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blaze_spark import data

    path = str(tmp_path / "ntz.parquet")
    ts = datetime.datetime(2024, 5, 1, 12, 30, 45, 123456)
    pq.write_table(
        pa.table({"id": [1], "ts": pa.array([ts], pa.timestamp("us"))}),
        path)
    t = data(path, spark=spark)
    assert dict(t.df.dtypes)["ts"] == "timestamp"
    assert t.df.collect()[0].ts == ts


def test_true_nanos_parquet_converted(spark, tmp_path):
    """TIMESTAMP(NANOS) parquet (unreadable by some Spark scans) loads via
    the nanosAsLong shim and comes back as microsecond TimestampType."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blaze_spark import data

    path = str(tmp_path / "ns.parquet")
    ts = datetime.datetime(2024, 5, 1, 12, 30, 45, 123456)
    pq.write_table(
        pa.table({"id": [1], "ts": pa.array([ts], pa.timestamp("ns"))}),
        path, store_schema=False)
    t = data(path, spark=spark)
    assert dict(t.df.dtypes)["ts"] == "timestamp"
    assert t.df.collect()[0].ts == ts


def test_partitioned_write_prunes(spark, star, tmp_path):
    from blaze_spark import data
    from blaze_spark.plans import physical_plan

    path = str(tmp_path / "orders_parted")
    star["orders"].transform().into(path, partition_by="o_orderstatus")
    back = data(path, spark=spark)
    q = back[back.o_orderstatus == "F"]
    # partition pruning: only the F partition is read
    plan = physical_plan(q)
    assert "PartitionFilters" in plan
    assert q.nrows() == star["orders"][
        star["orders"].o_orderstatus == "F"].nrows()


def test_bucketed_join_avoids_shuffle(spark, star, tmp_path):
    from blaze_spark import Table, join
    from blaze_spark.plans import physical_plan

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        star["orders"].into_table("orders_b", bucket_by="o_orderkey")
        star["lineitem"].into_table("lineitem_b", bucket_by="l_orderkey")
        ob = Table(spark.table("orders_b"))
        lb = Table(spark.table("lineitem_b"))
        j = join(lb, ob, "l_orderkey", "o_orderkey")
        plan = physical_plan(j)
        # both sides pre-bucketed on the key: no Exchange before the join
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_orc_roundtrip(spark, t, tmp_path):
    """ORC is a first-class columnar source (SURVEY §2.1 maps HDF5/bcolz
    chunked stores to parquet/ORC): pruning + pushdown apply as parquet."""
    from blaze_spark import data

    path = str(tmp_path / "t.orc")
    t.into(path, fmt="orc")
    back = data(path, spark=spark)
    assert back.nrows() == 3
    assert back.schema == t.schema


def test_orc_filter_pushdown(spark, t, tmp_path):
    from blaze_spark import data
    from blaze_spark.plans import pushed_filters

    path = str(tmp_path / "t2.orc")
    t.into(path, fmt="orc")
    back = data(path, spark=spark)
    q = back[back.amount > 100][["name"]]
    assert "amount" in pushed_filters(q)


def test_avro_gated(spark, t, tmp_path):
    """Avro needs the spark-avro package; without it the engine surfaces
    Spark's own failure at write/read — the format mapping itself works."""
    import pytest

    path = str(tmp_path / "t.avro")
    try:
        t.into(path, fmt="avro")
    except Exception:
        pytest.skip("spark-avro package not on the classpath (expected)")
    from blaze_spark import data
    back = data(path, spark=spark)
    assert back.nrows() == 3


def test_jdbc_roundtrip_derby(spark, t, tmp_path):
    """data("jdbc:...") source path (reference SQLAlchemy sources,
    blaze/compute/sql.py) against embedded Derby — the one JDBC engine on
    Spark's default classpath (no external DB in this container).  Skips
    with a named-jar message if Derby is ever absent."""
    from blaze_spark import data

    url = f"jdbc:derby:{tmp_path}/jdb;create=true"
    try:
        t.df.write.format("jdbc").option("url", url) \
            .option("dbtable", "accounts").mode("overwrite").save()
    except Exception as e:  # pragma: no cover - classpath-dependent
        pytest.skip(f"Derby JDBC driver unavailable (need derby*.jar): {e}")
    back = data(url, spark=spark, dbtable="accounts")
    assert back.nrows() == 3
    assert sorted(back.columns) == ["AMOUNT", "ID", "NAME"] or \
        sorted(c.lower() for c in back.columns) == ["amount", "id", "name"]
    # predicate pushdown reaches the JDBC scan (filters become WHERE)
    assert back[back.AMOUNT > 100].nrows() == 1 if "AMOUNT" in back.columns \
        else back[back.amount > 100].nrows() == 1


def test_spark_written_nanos_parquet_loads_natively(spark, tmp_path):
    """Spark 4 writes TimestampType as parquet timestamp[ns] and reads it
    back natively even under the nanosAsLong conf — the ns footer-sniff
    must convert ONLY columns that actually load as long (a sniff-trusted
    /1000 on a TimestampType column was an AnalysisException; caught by
    the sf1 bench)."""
    import datetime

    from blaze_spark import data

    path = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2, 3, 4, 5, 678901))],
        "id long, ts timestamp").write.parquet(path)
    import pyarrow.parquet as pq
    import glob
    unit = {str(t) for t in
            pq.read_schema(glob.glob(path + "/*.parquet")[0]).types
            if "timestamp" in str(t)}
    t = data(path, spark=spark)
    assert dict(t.df.dtypes)["ts"] == "timestamp"
    row = t.df.first()
    assert row.ts == datetime.datetime(2024, 1, 2, 3, 4, 5, 678901), \
        f"file unit={unit}: value must survive the load untouched"


@pytest.mark.parametrize("unit,utc", [
    ("us", False),   # naive micros -> TIMESTAMP_NTZ -> normalized
    ("us", True),    # UTC-adjusted micros -> TimestampType natively
    ("ms", False),   # naive millis -> NTZ -> normalized
    ("ns", False),   # naive nanos -> nanosAsLong shim path
    ("ns", True),    # UTC nanos -> shim path, instant semantics
])
def test_source_tz_matrix(spark, tmp_path, unit, utc):
    """Environment-drift seam: every (storage unit, tz-adjustment) parquet
    variant must enter the engine as TimestampType with the value intact
    under the UTC session zone (VERDICT r4 #4: the NTZ drift silently
    broke streaming; this pins the seam)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blaze_spark import data

    path = str(tmp_path / f"tz_{unit}_{utc}.parquet")
    ts = datetime.datetime(2024, 5, 1, 12, 30, 45, 123000)
    arr = pa.array([ts], pa.timestamp(unit, tz="UTC" if utc else None))
    pq.write_table(pa.table({"id": [1], "ts": arr}), path,
                   store_schema=False)
    t = data(path, spark=spark)
    assert dict(t.df.dtypes)["ts"] == "timestamp", (unit, utc)
    assert t.df.first().ts == ts, (unit, utc)


def test_ntz_nested_in_struct_normalized(spark, tmp_path):
    """NTZ nested inside struct/array must also be rewritten (ADVICE r4:
    top-level-only left the dtype surface mixed for nested schemas)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blaze_spark import data

    path = str(tmp_path / "nested_ntz.parquet")
    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    tbl = pa.table({
        "id": [1],
        "meta": pa.array([{"created": ts}],
                         pa.struct([("created", pa.timestamp("us"))])),
        "times": pa.array([[ts]], pa.list_(pa.timestamp("us"))),
    })
    pq.write_table(tbl, path)
    t = data(path, spark=spark)
    assert "timestamp_ntz" not in t.df.schema.simpleString()
    row = t.df.first()
    assert row.meta.created == ts
    assert row.times[0] == ts


def test_ntz_normalized_on_passthrough_paths(spark):
    """DataFrame pass-through and in-memory createDataFrame paths apply
    the same NTZ normalization as the file readers (ADVICE r4: same data,
    same dtype regardless of entry path)."""
    import datetime

    from blaze_spark import data

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    df = spark.createDataFrame([(1, ts)], "id long, ts timestamp_ntz")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    t = data(df)
    assert dict(t.df.dtypes)["ts"] == "timestamp"
    assert t.df.first().ts == ts


def test_ntz_cast_warns_on_non_utc_session(spark, tmp_path):
    """The NTZ cast is value-preserving only under UTC; a zoned session
    gets a warning at the data() boundary rather than a silent shift."""
    import datetime
    import warnings

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blaze_spark import data

    path = str(tmp_path / "warn_ntz.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([datetime.datetime(2024, 5, 1)],
                                 pa.timestamp("us"))}), path)
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            data(path, spark=spark)
        assert any("timeZone" in str(x.message) for x in w)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_mongo_uri_dialect_parsed():
    """Reference URI dialect mongodb://host:port/db::collection
    (blaze/compute/tests/test_mongo_compute.py:384-405)."""
    from blaze_spark.sources import _parse_mongo_uri

    base, db, coll = _parse_mongo_uri("mongodb://h:27017/test_db::bank")
    assert (base, db, coll) == ("mongodb://h:27017/test_db", "test_db", "bank")
    base, db, coll = _parse_mongo_uri("mongodb://h:27017/test_db")
    assert (base, db, coll) == ("mongodb://h:27017/test_db", "test_db", None)
    base, db, coll = _parse_mongo_uri("mongodb+srv://u@h/d?retryWrites=true::c")
    assert db == "d" and coll == "c"


def test_mongo_source_gated_without_connector(spark):
    """No connector jar and no pymongo in this environment: the source
    must refuse with actionable guidance, not a bare ClassNotFound."""
    from blaze_spark import data

    with pytest.raises((ImportError, RuntimeError)) as ei:
        data("mongodb://localhost:27017/test_db::bank", spark=spark)
    assert "connector" in str(ei.value)


def test_mongo_source_requires_collection(spark):
    from blaze_spark import data

    with pytest.raises(ValueError, match="collection"):
        data("mongodb://localhost:27017/test_db", spark=spark)


def test_mongo_uri_ipv6_and_no_collection_suffix():
    from blaze_spark.sources import _parse_mongo_uri

    base, db, coll = _parse_mongo_uri("mongodb://[::1]:27017/db")
    assert (base, db, coll) == ("mongodb://[::1]:27017/db", "db", None)
    base, db, coll = _parse_mongo_uri("mongodb://[::1]:27017/db::bank")
    assert (base, db, coll) == ("mongodb://[::1]:27017/db", "db", "bank")
    base, db, coll = _parse_mongo_uri("mongodb://user:p::w@host/db::c")
    assert db == "db" and coll == "c"


def test_mongo_uri_query_string_not_absorbed():
    """ADVICE r6: a query string after the collection suffix must neither
    leak into the collection name nor be stripped from the driver URI."""
    from blaze_spark.sources import _parse_mongo_uri

    base, db, coll = _parse_mongo_uri(
        "mongodb://h:27017/db::coll?readPreference=secondary&x=y")
    assert coll == "coll"
    assert db == "db"
    assert base == "mongodb://h:27017/db?readPreference=secondary&x=y"
    # options without a collection suffix keep working too
    base, db, coll = _parse_mongo_uri("mongodb://h/db?x=y")
    assert (base, db, coll) == ("mongodb://h/db?x=y", "db", None)
