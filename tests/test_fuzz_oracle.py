"""Fuzz differential: hypothesis-generated filter/group/agg queries over
the real star schema, Spark engine vs in-process DuckDB (the strongest form
of the reference's cross-backend scheme — random queries, two engines)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# soak: FUZZ_EXAMPLES=200 python -m pytest tests/test_fuzz_oracle.py
SETTINGS = settings(max_examples=int(__import__("os").environ.get("FUZZ_EXAMPLES", "8")), deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])

NUM_COLS = ["o_totalprice", "o_orderkey", "o_custkey"]
GRP_COLS = ["o_orderstatus", "o_orderpriority"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    return con


@given(
    num_col=st.sampled_from(NUM_COLS),
    grp_col=st.sampled_from(GRP_COLS),
    frac=st.floats(min_value=0.05, max_value=0.95),
    cmp_gt=st.booleans(),
)
@SETTINGS
def test_fuzz_filter_group_agg(spark, sf_dir, duck, num_col, grp_col, frac,
                               cmp_gt):
    from blaze_spark import by, data

    # derive a data-dependent threshold so filters hit varied selectivities
    lo, hi = duck.execute(
        f"SELECT min({num_col}), max({num_col}) FROM orders").fetchone()
    thr = lo + (hi - lo) * frac

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    col = o[num_col]
    pred = (col > thr) if cmp_gt else (col <= thr)
    f = o[pred]
    got = {r[0]: (r[1], r[2]) for r in by(
        [f[grp_col]],
        n=f[num_col].nelements(),
        mx=f[num_col].max(),
    ).df.collect()}

    op = ">" if cmp_gt else "<="
    exp = {r[0]: (r[1], r[2]) for r in duck.execute(
        f"SELECT {grp_col}, count(*), max({num_col}) FROM orders "
        f"WHERE {num_col} {op} {thr!r} GROUP BY {grp_col}").fetchall()}
    assert got == exp


@given(k=st.integers(min_value=1, max_value=50),
       asc=st.booleans())
@SETTINGS
def test_fuzz_topk(spark, sf_dir, duck, k, asc):
    from blaze_spark import data
    from pyspark.sql import functions as F

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    key = F.col("o_totalprice").asc() if asc else F.col("o_totalprice").desc()
    got = [r.o_orderkey for r in
           o.sort(key, F.col("o_orderkey")).head(k)[["o_orderkey"]].df.collect()]
    direction = "ASC" if asc else "DESC"
    exp = [r[0] for r in duck.execute(
        f"SELECT o_orderkey FROM orders ORDER BY o_totalprice {direction}, "
        f"o_orderkey LIMIT {k}").fetchall()]
    assert sorted(got) == sorted(exp)


@given(
    first_set=st.lists(st.sampled_from(GRP_COLS), min_size=1, max_size=2,
                       unique=True),
    with_total=st.booleans(),
)
@SETTINGS
def test_fuzz_grouping_sets(spark, sf_dir, duck, first_set, with_total):
    from blaze_spark import data, grouping_sets

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    sets = [[o[c] for c in first_set], [o[first_set[0]]]]
    if with_total:
        sets.append([])
    out = grouping_sets(sets, n=o.o_orderkey.nelements(),
                        mx=o.o_totalprice.max())
    all_cols = list(dict.fromkeys(first_set))
    got = {tuple(r[c] for c in all_cols): (r.n, r.mx)
           for r in out.df.collect()}

    sql_sets = ", ".join(
        ["(" + ", ".join(first_set) + ")", f"({first_set[0]})"]
        + (["()"] if with_total else []))
    exp = {tuple(r[:len(all_cols)]): (r[-2], r[-1]) for r in duck.execute(
        f"SELECT {', '.join(all_cols)}, count(*), max(o_totalprice) "
        f"FROM orders GROUP BY GROUPING SETS ({sql_sets})").fetchall()}
    assert got == exp


# -- curation regex parity fuzz ---------------------------------------------
# The curation family's correctness risk is regex-dialect drift between
# Spark (java.util.regex) and the oracle (DuckDB/RE2).  Fuzz random texts
# through BOTH engines' full formula chain and require byte-identical
# results.  Alphabet includes the separators, PII-ish fragments and
# unicode the operators special-case.

_TOKENS = ["the", "and", "batch", "x", "y", "a.b@ex.org", "10.0.0.1",
           "555-123-4567", "123-45-6789", "über", "naïve", "中文",
           "A", "", " ", "\t", "..", "a-b", "%20", "+1"]


@given(words=st.lists(st.sampled_from(_TOKENS), min_size=1, max_size=24),
       joiner=st.sampled_from([" ", "  ", "\n", " \n "]))
@SETTINGS
def test_fuzz_curation_regex_parity(spark, duck, words, joiner):
    from blaze_spark import data
    from blaze_spark.pipeline import pii_scrub, repetition_features

    text = joiner.join(words).strip()
    if not text:
        return
    t = data([(1, text)], spark=spark,
             schema="doc_id bigint, text string", name="fuzzdoc")
    rep = repetition_features(t).df.select(
        "n_tokens", "dup_token_frac", "dup_line_frac").first()
    pii = pii_scrub(t).df.select(
        "n_email", "n_ip", "n_phone", "n_ssn", "clean_text").first()

    esc = text.replace("'", "''")
    exp = duck.execute(rf"""
        SELECT len(regexp_split_to_array(trim(lower(t)), '\s+')),
               round(1.0 - len(list_distinct(regexp_split_to_array(
                   trim(lower(t)), '\s+')))
                   / len(regexp_split_to_array(trim(lower(t)), '\s+')), 4),
               round(CASE WHEN len(l) > 0
                     THEN 1.0 - len(list_distinct(l)) / len(l)
                     ELSE 0.0 END, 4),
               len(regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')),
               len(regexp_extract_all(t, '\b(\d{{1,3}}\.){{3}}\d{{1,3}}\b')),
               len(regexp_extract_all(t, '\b\d{{3}}[-.]\d{{3}}[-.]\d{{4}}\b')),
               len(regexp_extract_all(t, '\b\d{{3}}-\d{{2}}-\d{{4}}\b')),
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}',
                   '<EMAIL>', 'g'),
                   '\b(\d{{1,3}}\.){{3}}\d{{1,3}}\b', '<IP>', 'g'),
                   '\b\d{{3}}[-.]\d{{3}}[-.]\d{{4}}\b', '<PHONE>', 'g'),
                   '\b\d{{3}}-\d{{2}}-\d{{4}}\b', '<SSN>', 'g')
        FROM (SELECT '{esc}' AS t,
              list_filter(string_split('{esc}', chr(10)),
                          x -> trim(x) != '') AS l)
    """).fetchone()
    assert rep.n_tokens == exp[0], text
    assert rep.dup_token_frac == pytest.approx(exp[1]), text
    assert rep.dup_line_frac == pytest.approx(exp[2]), text
    assert (pii.n_email, pii.n_ip, pii.n_phone, pii.n_ssn) == exp[3:7], text
    assert pii.clean_text == exp[7], text


@given(
    how=st.sampled_from(["inner", "left", "right", "outer"]),
    frac=st.floats(min_value=0.1, max_value=0.9),
    agg_side=st.booleans(),
)
@SETTINGS
def test_fuzz_join_vs_duckdb(spark, sf_dir, duck, how, frac, agg_side):
    """Join fuzz: random join type over a random key-range split of
    orders x customer, aggregated counts vs DuckDB.  Joins carry the
    riskiest semantics (null rows from outer sides, key promotion), so
    they get their own differential corpus."""
    from blaze_spark import data, join

    duck.execute(
        f"CREATE VIEW IF NOT EXISTS customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')")
    lo, hi = duck.execute(
        "SELECT min(o_custkey), max(o_custkey) FROM orders").fetchone()
    thr = int(lo + (hi - lo) * frac)

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    c = data(f"{sf_dir}/customer.parquet", spark=spark, name="customer")
    left = o[o.o_custkey <= thr]
    j = join(left, c, "o_custkey", "c_custkey", how=how)
    got = j.df.groupBy().agg(
        *[__import__("pyspark.sql.functions", fromlist=["x"]).count(col).alias(col)
          for col in ["o_orderkey", "c_name"]]).first()

    sql_how = {"inner": "JOIN", "left": "LEFT JOIN",
               "right": "RIGHT JOIN", "outer": "FULL OUTER JOIN"}[how]
    exp = duck.execute(
        f"SELECT count(o_orderkey), count(c_name) FROM "
        f"(SELECT * FROM orders WHERE o_custkey <= {thr}) o "
        f"{sql_how} customer ON o.o_custkey = customer.c_custkey").fetchone()
    assert (got[0], got[1]) == exp, (how, thr)


@given(f1=st.floats(min_value=0.05, max_value=0.5),
       f2=st.floats(min_value=0.5, max_value=0.95))
@SETTINGS
def test_fuzz_hash_sample_nesting(spark, sf_dir, f1, f2):
    """hash_sample thresholds NEST: sample(f1) is a subset of sample(f2)
    for f1 <= f2 — the property that makes progressive sampling cheap
    (grow a sample without resampling)."""
    from blaze_spark import data

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    small = o.hash_sample(f1, on="o_orderkey").df.select("o_orderkey")
    big = o.hash_sample(f2, on="o_orderkey").df.select("o_orderkey")
    # subset check without collect: anti-join must be empty
    assert small.join(big, "o_orderkey", "left_anti").count() == 0


@given(
    num_col=st.sampled_from(NUM_COLS),
    grp_col=st.sampled_from(GRP_COLS),
    frac=st.floats(min_value=0.05, max_value=0.95),
    n_head=st.integers(min_value=1, max_value=50),
    ascending=st.booleans(),
    use_transform=st.booleans(),
)
@SETTINGS
def test_fuzz_tree_dialect_roundtrip(spark, sf_dir, num_col, grp_col, frac,
                                     n_head, ascending, use_transform):
    """Reference to_tree/from_tree identity (blaze/server/tests): a
    random selection/transform/sort/head chain serialized to the wire
    dialect and rebuilt must compute EXACTLY what the direct expression
    computes."""
    from pyspark.sql import functions as F

    from blaze_spark import data
    from blaze_spark.interop import from_tree, to_tree

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    lo = o.df.agg(F.min(num_col)).collect()[0][0]
    hi = o.df.agg(F.max(num_col)).collect()[0][0]
    thr = lo + (hi - lo) * frac

    expr = o[o[num_col] > thr]
    if use_transform:
        expr = expr.transform(doubled=expr[num_col] * 2)
    cols = [grp_col, num_col] + (["doubled"] if use_transform else [])
    if "o_orderkey" not in cols:
        cols.append("o_orderkey")  # tie-breaker: the sort must be total
    expr = expr[cols]
    expr = expr.sort([num_col, "o_orderkey"], ascending=ascending) \
        .head(n_head)

    tree = to_tree(expr)
    rebuilt = from_tree(tree, spark=spark,
                        datasets={"orders": o}, allow_data_uris=True)
    a = expr.compute().reset_index(drop=True)
    b = rebuilt.compute().reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert a.equals(b), (a.head(), b.head())


@given(
    budget=st.integers(min_value=5, max_value=200),
    lens=st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                  max_size=60),
    parts=st.integers(min_value=1, max_value=6),
)
@SETTINGS
def test_fuzz_pack_sequences_invariants(spark, budget, lens, parts):
    """Property: pack_sequences' contiguous fill means (a) tok_start is
    the exclusive prefix sum in key order, (b) every shard except
    possibly the last crosses its budget boundary (a doc straddling the
    boundary belongs to the shard it STARTED in), (c) shard ids are a
    gapless run from 0 — for ANY document lengths, budget, and partition
    count."""
    from blaze_spark import data
    from blaze_spark.pipeline import pack_sequences

    rows = [(i, "w " * n) for i, n in enumerate(lens)]
    t = data(rows, spark=spark, schema="doc_id long, text string",
             name="fz")
    out = (pack_sequences(t, budget=budget, partitions=parts).df
           .orderBy("doc_id").collect())
    acc = 0
    for r in out:
        assert r.tok_start == acc
        assert r.shard == acc // budget
        acc += r.n_tokens
    shards = [r.shard for r in out]
    assert shards[0] == 0
    assert all(b >= a for a, b in zip(shards, shards[1:]))
    # gapless only when no document exceeds the budget (an over-budget
    # doc legitimately consumes several shards' offset space — hypothesis
    # found exactly that case: budget=5, lens=[10, 0])
    if all(n < budget for n in lens):
        assert all(b - a in (0, 1) for a, b in zip(shards, shards[1:]))
    # each shard's token total stays under budget + max_doc_tokens
    from collections import defaultdict
    per = defaultdict(int)
    for r in out:
        per[r.shard] += r.n_tokens
    mx = max((r.n_tokens for r in out), default=0)
    assert all(v < budget + mx for v in per.values() if mx)


# -- join fuzz (r14): random join type x key x agg, two engines ------------

JOIN_HOWS = ["inner", "left", "right", "outer"]


@given(
    how=st.sampled_from(JOIN_HOWS),
    frac=st.floats(min_value=0.1, max_value=0.9),
    agg_price=st.booleans(),
)
@SETTINGS
def test_fuzz_join_agg(spark, sf_dir, duck, how, frac, agg_price):
    """Random equi-join differential over the real star schema:
    orders ⋈ customer under every join type, with a data-dependent
    filter on ONE side (so outer joins produce genuine unmatched
    rows on both sides), then a per-nation aggregate — Spark engine
    vs DuckDB, exact."""
    from blaze_spark import by, data, join

    duck.execute(
        f"CREATE VIEW IF NOT EXISTS customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')")
    lo, hi = duck.execute(
        "SELECT min(o_totalprice), max(o_totalprice) FROM orders"
    ).fetchone()
    thr = lo + (hi - lo) * frac

    o = data(f"{sf_dir}/orders.parquet", spark=spark, name="orders")
    c = data(f"{sf_dir}/customer.parquet", spark=spark,
             name="customer")
    j = join(o[o.o_totalprice > thr], c, "o_custkey", "c_custkey",
             how=how)
    val = j.o_totalprice.sum() if agg_price else \
        j.o_orderkey.nelements()
    out = by([j.c_nationkey], v=val)
    got = {r[0]: (round(r[1], 2) if agg_price and r[1] is not None
                  else r[1]) for r in out.df.collect()}

    duck_how = {"inner": "JOIN", "left": "LEFT JOIN",
                "right": "RIGHT JOIN", "outer": "FULL JOIN"}[how]
    # nelements counts ALL rows (NULLs included — the package's
    # nelements-vs-count distinction), so the DuckDB twin is count(*)
    agg_sql = "sum(o_totalprice)" if agg_price else "count(*)"
    exp = {r[0]: (round(r[1], 2) if agg_price and r[1] is not None
                  else r[1]) for r in duck.execute(
        f"SELECT c_nationkey, {agg_sql} FROM "
        f"(SELECT * FROM orders WHERE o_totalprice > {thr!r}) o "
        f"{duck_how} customer ON o_custkey = c_custkey "
        f"GROUP BY c_nationkey").fetchall()}
    assert got == exp
