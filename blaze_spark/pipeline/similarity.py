"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — brute-force baseline: queries × corpus with the dot
  product as a JVM-side ``aggregate(zip_with(...))`` (no Python in the inner
  loop).  The query side is broadcast — at 100 TB the corpus streams
  partition-local against an in-memory query block, and the global top-k is
  a TakeOrdered-style window per query, never a full sort.
- :func:`lsh_cosine_topk` / :func:`embedding_neardup_pairs` — the scale
  path: MULTI-TABLE random-hyperplane LSH (OR-amplification), candidates
  only within (table, signature) buckets; signatures are one Arrow-batched
  numpy matmul per batch, deterministic from a seeded RNG.  Near-dup pair
  generation reuses the no-self-join bucket topology of pipeline.dedup.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..core import Table


def _dot(a, b) -> Column:
    # elementwise in double precision, left-to-right accumulation
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def _signature_udf(planes: np.ndarray):
    """Arrow-batched numpy signature: one (batch x dim) @ (dim x planes)
    matmul per batch — the vectorized-pandas-UDF fast path for embedding
    math (per-element JVM lambdas are ~10x slower here)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _sig(s):
        m = np.stack(s.to_numpy())            # (batch, dim)
        bits = (m.astype(np.float64) @ planes.T) > 0   # (batch, n_planes)
        weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
        return pd.Series(bits @ weights)

    _sig.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "long")


def _pair_cosine_udf():
    """Arrow-batched cosine for joined vector pairs — used on approximate
    (rows-only) paths.  The oracle-checked exact paths keep the JVM
    left-to-right ``aggregate`` so sums are bit-identical to DuckDB's."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    _cos.__annotations__ = {"a": pd.Series, "b": pd.Series,
                            "return": pd.Series}
    return pandas_udf(_cos, "double")


def cosine_topk(corpus: Table, queries: Table, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int | None = 4,
                max_queries: int = 10_000) -> Table:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine) — self-matches excluded, ties
    broken by neighbor id (deterministic).

    GUARD: this is the brute-force cartesian baseline — cost is
    corpus x queries.  It is linear in the corpus only while the query side
    broadcasts, so a query side larger than ``max_queries`` raises instead
    of silently launching an all-pairs job; use :func:`lsh_cosine_topk` or
    :func:`ivf.ivf_topk` for large query sets (approximate, bucketed).
    Pass ``max_queries=None`` to skip the check (the count costs one cheap
    ``limit(n+1)`` job).
    """
    if max_queries is not None:
        probe = queries.df.select(id_col).limit(max_queries + 1).count()
        if probe > max_queries:
            raise ValueError(
                f"cosine_topk query side exceeds max_queries={max_queries}: "
                "brute-force scoring is corpus x queries. Use "
                "lsh_cosine_topk/ivf_topk for large query sets, or pass "
                "max_queries=None to force.")
    q = queries.df.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("qv"),
                          _norm(F.col(vec_col)).alias("qn"))
    c = corpus.df.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("cv"),
                         _norm(F.col(vec_col)).alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv"))
                    / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("cosine", round_to).alias("cosine")
                if round_to is not None else F.col("cosine"))
    )
    return Table(out, "cosine_topk")


def _multi_signature_udf(planes: np.ndarray, n_tables: int, n_planes: int):
    """Array of ``n_tables`` hyperplane signatures per vector — one
    (batch x dim) @ (dim x n_tables*n_planes) matmul per Arrow batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def _sig(s):
        m = np.stack(s.to_numpy()).astype(np.float64)
        bits = (m @ planes.T) > 0                       # (batch, T*planes)
        sigs = bits.reshape(len(m), n_tables, n_planes) @ weights
        return pd.Series(list(sigs))

    _sig.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "array<long>")


def embedding_neardup_pairs(corpus: Table, threshold: float = 0.9,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            n_planes: int = 6, n_tables: int = 8,
                            dim: int = 64, seed: int = 42,
                            exact: bool = False, max_bucket: int = 2000,
                            round_to: int | None = 4) -> Table:
    """Embedding-cosine near-duplicate pairs: (a < b, cosine >= threshold).

    Default path is MULTI-TABLE hyperplane LSH (OR-amplification): each of
    ``n_tables`` independent plane sets buckets the corpus by its
    ``n_planes``-bit sign signature; a pair is a candidate if it collides
    in ANY table.  Recall for a pair at cosine c is
    ``1-(1-p^n_planes)^n_tables`` with ``p = 1 - arccos(c)/pi`` — at the
    defaults, ~0.98 for c=0.9.  Candidate generation is the no-self-join
    topology (see dedup.lsh_band_pairs): one groupBy per (table, sig)
    bucket, i<j pairs + the exact cosine generated in-array JVM-side,
    duplicates across tables collapsed by a final pair-keyed groupBy.
    ``max_bucket`` blacklists degenerate buckets via broadcast anti join.
    ``exact=True`` does the brute-force quadratic scoring — the oracle
    path for small corpora."""
    c = corpus.df.select(F.col(id_col).alias("vid"),
                         F.col(vec_col).alias("v"),
                         _norm(F.col(vec_col)).alias("n"))
    if exact:
        l, r = c.alias("l"), c.alias("r")
        cos = (_dot(F.col("l.v"), F.col("r.v"))
               / (F.col("l.n") * F.col("r.n")))
        scored = l.join(r, F.col("l.vid") < F.col("r.vid")).select(
            F.col("l.vid").alias("vec_a"), F.col("r.vid").alias("vec_b"),
            cos.alias("cosine"))
    else:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables * n_planes, dim))
        sig_udf = _multi_signature_udf(planes, n_tables, n_planes)
        entries = (c.withColumn("sigs", sig_udf(F.col("v")))
                   .select("vid", "v", "n",
                           F.posexplode("sigs").alias("tbl", "sig")))
        hot = (entries.groupBy("tbl", "sig")
               .agg(F.count(F.lit(1)).alias("cnt"))
               .filter(F.col("cnt") > max_bucket).select("tbl", "sig"))
        cold = entries.join(F.broadcast(hot), ["tbl", "sig"], "left_anti")
        grouped = (cold.groupBy("tbl", "sig")
                   .agg(F.array_sort(F.collect_list(
                       F.struct("vid", "v", "n"))).alias("docs"))
                   .filter(F.size("docs") >= 2))

        def _pair(x, y):
            cos = _dot(x["v"], y["v"]) / (x["n"] * y["n"])
            return F.struct(x["vid"].alias("vec_a"),
                            y["vid"].alias("vec_b"), cos.alias("cosine"))

        pair_arr = F.flatten(F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda y: _pair(x, y))))
        scored = (grouped.select(F.explode(pair_arr).alias("pr"))
                  .select("pr.vec_a", "pr.vec_b", "pr.cosine")
                  .groupBy("vec_a", "vec_b")
                  .agg(F.first("cosine").alias("cosine")))
    out = scored.filter(F.col("cosine") >= threshold)
    if round_to is not None:
        out = out.withColumn("cosine", F.round("cosine", round_to))
    return Table(out, "embedding_neardup_pairs")


def lsh_cosine_topk(corpus: Table, queries: Table, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 8, n_tables: int = 8, dim: int = 64,
                    seed: int = 42, round_to: int | None = 4) -> Table:
    """Approximate top-k: multi-table random-hyperplane LSH — each of
    ``n_tables`` plane sets buckets both sides; a corpus row is scored for
    a query if they collide in ANY table (OR-amplified recall, as in
    ``embedding_neardup_pairs``).  At scale this replaces the crossJoin
    with an equi-join keyed by (table, signature) — uniform,
    shuffle-friendly — with the (small) query side broadcast.

    Per-pair recall at cosine c is ``1-(1-p^n_planes)^n_tables`` with
    ``p = 1 - arccos(c)/pi``: high for genuine near-duplicates (c>=0.9),
    intentionally low for weak neighbors (random-vector top-k at c~0.35
    is the adversarial case — use ``ivf_topk`` there: a trained coarse
    quantizer prunes by actual data geometry, not random planes)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim))
    sig_udf = _multi_signature_udf(planes, n_tables, n_planes)

    # Candidate generation carries IDS ONLY — vectors never ride the
    # banding explode or the candidate-dedup shuffle (at dim=1024 a
    # vector-carrying groupBy would shuffle O(pairs*dim) bytes; this
    # topology shuffles O(pairs) ids and re-joins the vectors once,
    # keyed by id).
    q_sig = queries.df.select(F.col(id_col).alias("query_id"),
                              sig_udf(F.col(vec_col)).alias("sigs")) \
        .select("query_id", F.posexplode("sigs").alias("tbl", "sig"))
    c_sig = corpus.df.select(F.col(id_col).alias("neighbor_id"),
                             sig_udf(F.col(vec_col)).alias("sigs")) \
        .select("neighbor_id", F.posexplode("sigs").alias("tbl", "sig"))
    pairs = (
        c_sig.join(F.broadcast(q_sig), ["tbl", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()                       # shuffle carries two ids per pair
    )
    cvec = corpus.df.select(F.col(id_col).alias("neighbor_id"),
                            F.col(vec_col).alias("cv"))
    qvec = queries.df.select(F.col(id_col).alias("query_id"),
                             F.col(vec_col).alias("qv"))
    scored = (
        pairs.join(cvec, "neighbor_id")   # one id-keyed shuffle, O(pairs+corpus)
        .join(F.broadcast(qvec), "query_id")
        .withColumn("cosine", _pair_cosine_udf()(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("cosine", round_to).alias("cosine")
                if round_to is not None else F.col("cosine"))
    )
    return Table(out, "lsh_cosine_topk")
