"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path for similarity search (complements the hyperplane-LSH variant in
similarity.py).

Structure:
- :func:`kmeans_fit` — Lloyd's iterations on the corpus.  Assignments are
  an Arrow-batched numpy matmul (vectorized pandas UDF); centroid updates
  are per-cluster mean vectors via ``applyInPandas`` (k groups).  Only the
  k x dim centroid matrix ever reaches the driver — the corpus itself
  never collects.
- :func:`ivf_assign` — one pass tagging each corpus row with its nearest
  centroid id (this is the "inverted file": at scale you'd partition/
  cluster the stored table by this id).
- :func:`ivf_topk` — each query probes its ``nprobe`` nearest centroids
  and scores only rows in those cells: an equi-join on cell id instead of
  a cross join — the IVF pruning that makes ANN sublinear.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import Table

__all__ = ["kmeans_fit", "ivf_assign", "ivf_topk"]


def _assign_udf(centroids: np.ndarray):
    from pyspark.sql.functions import pandas_udf

    def _assign(s):
        m = np.stack(s.to_numpy()).astype(np.float64)       # (batch, dim)
        # squared L2 to each centroid: |x|^2 - 2 x.c + |c|^2
        d = (-2.0 * m @ centroids.T
             + (centroids ** 2).sum(axis=1)[None, :])
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    _assign.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_assign, "int")


def kmeans_fit(corpus: Table, k: int = 16, iters: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id",
               seed: int = 42) -> np.ndarray:
    """Lloyd's k-means over the embedding column; returns (k, dim) centroid
    matrix.  Deterministic init: the k rows with smallest ids.

    The vector column is persisted ONCE before the loop (VERDICT r5 #6):
    each Lloyd iteration re-reads it for the assign UDF, so without the
    persist a 5-iteration fit is 5 full corpus scans — at 100 TB that is
    the difference between one materialization and five.  Released in a
    ``finally`` so a failed iteration never leaks executor memory."""
    init = (corpus.df.orderBy(id_col).limit(k)
            .select(vec_col).toPandas()[vec_col])
    centroids = np.stack(init.to_numpy()).astype(np.float64)

    vecs = corpus.df.select(F.col(vec_col).alias("v")).persist()
    try:
        for _ in range(iters):
            assigned = vecs.select(
                "v", _assign_udf(centroids)(F.col("v")).alias("cell"))

            def _mean(pdf: pd.DataFrame) -> pd.DataFrame:
                m = np.stack(pdf.v.to_numpy()).astype(np.float64)
                return pd.DataFrame({"cell": [int(pdf.cell.iloc[0])],
                                     "centroid": [m.mean(axis=0).tolist()]})

            means = (assigned.groupBy("cell")
                     .applyInPandas(_mean, "cell int, centroid array<double>")
                     .toPandas())
            new = centroids.copy()
            for _, row in means.iterrows():
                new[int(row.cell)] = np.array(row.centroid)
            if np.allclose(new, centroids, atol=1e-9):
                break
            centroids = new
    finally:
        vecs.unpersist()
    return centroids


def ivf_assign(corpus: Table, centroids: np.ndarray,
               vec_col: str = "embedding") -> Table:
    """Tag rows with their IVF cell id (partition/cluster by this at rest)."""
    return Table(
        corpus.df.withColumn("cell",
                             _assign_udf(centroids)(F.col(vec_col))),
        "ivf_assign")


def ivf_topk(corpus: Table, queries: Table, centroids: np.ndarray, k: int = 5,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", round_to: int | None = 4) -> Table:
    """Approximate top-k cosine: probe the nprobe nearest cells per query."""
    from .similarity import _pair_cosine_udf

    tagged = ivf_assign(corpus, centroids, vec_col).df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        "cell")

    def _probe(s):
        m = np.stack(s.to_numpy()).astype(np.float64)
        d = (-2.0 * m @ centroids.T
             + (centroids ** 2).sum(axis=1)[None, :])
        cells = np.argsort(d, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(cells))

    _probe.__annotations__ = {"s": pd.Series, "return": pd.Series}
    from pyspark.sql.functions import pandas_udf

    probe_udf = pandas_udf(_probe, "array<int>")
    q = queries.df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(probe_udf(F.col(vec_col))).alias("cell"))

    scored = (tagged.join(F.broadcast(q), "cell")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cosine",
                          _pair_cosine_udf()(F.col("qv"), F.col("cv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "neighbor_id",
                   F.round("cosine", round_to).alias("cosine")
                   if round_to is not None else F.col("cosine")))
    return Table(out, "ivf_topk")


def save_centroids(centroids: np.ndarray, path: str,
                   spark=None) -> None:
    """Persist the coarse quantizer as parquet (cell_id, centroid array) —
    the index artifact an ingest pipeline fits once and reuses across
    sessions/queries (refitting k-means per query would rescan the corpus).
    """
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    df = spark.createDataFrame(rows, "cell_id int, centroid array<double>")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_centroids(path: str, spark=None) -> np.ndarray:
    """Reload a saved quantizer; rows ordered by cell_id so the matrix row
    index IS the cell id (what ``ivf_assign``/``ivf_topk`` expect)."""
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    rows = spark.read.parquet(path).orderBy("cell_id").collect()
    return np.array([r.centroid for r in rows], dtype=np.float64)
