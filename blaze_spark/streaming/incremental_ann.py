"""Incremental PQ embedding index over a growing corpus.

The batch ANN path encodes the whole corpus at once
(``pipeline.pq.pq_encode`` → ``write_pq_codes``); a training-data
ingest pipeline instead sees embeddings arrive continuously and must
grow the searchable index per micro-batch without an O(corpus) re-encode
— the ANN sibling of :mod:`incremental_dedup`'s signature store.

Design (same store discipline as the signature store):

- A persistent **code store** (parquet) holds one row per
  (vec_id, cell?, pq_code).  Layout ``store/ingest=<batch>/
  [cell=<c>/]part-*.parquet`` — ``ingest`` keys each batch's
  contribution to its own subdirectory written with mode=overwrite, so
  a ``foreachBatch`` RETRY of the same batch id replaces its
  subdirectory instead of appending duplicates (exactly-once, matching
  the checkpoint contract).  When coarse centroids are provided the
  batch is cell-assigned and partitioned by ``cell`` inside the
  subdirectory — ``ivf_pq_topk``'s probed-cell filter then prunes
  partitions across ALL ingests.
- **Index identity is the trained artifacts**: codes from different
  codebooks (or cells from different centroids) NEVER match, so the
  store is stamped with a ``_PQ_FORMAT`` marker derived from the
  codebook (and centroid) bytes; probing or appending with different
  artifacts fails loudly (the exact failure mode the signature store's
  ``_SIG_FORMAT`` guards — silent wrong-answer, not a crash).
- Per micro-batch the work is ONE encode pass over the batch — never
  the corpus.  Reads see only complete (``_SUCCESS``-marked) ingests,
  so a crashed half-written attempt is never scanned.

Encoding is deterministic given the codebooks, so the pytest contract
is EXACT: an N-batch ingest produces the bit-identical code set (and
identical ``pq_topk``/``ivf_pq_topk`` answers) as one batch encode of
the concatenation.

No reference equivalent (its "streaming" is lazy iterators —
SURVEY.md §1.1); green-field extension like :mod:`incremental_dedup`.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import Table
from ..pipeline.ivf import ivf_assign
from ..pipeline.pq import pq_encode
from .incremental_dedup import (_check_sig_format, _compact_store_impl,
                                _ingest_ids, resolve_store_root)

__all__ = ["pq_index_format", "ingest_pq_batch", "incremental_pq_index",
           "read_pq_index", "compact_pq_store"]


def pq_index_format(codebooks: np.ndarray,
                    centroids: np.ndarray | None = None) -> str:
    """The store-identity string: a digest of the trained artifacts'
    exact bytes (shape + float64 payload).  Two fits that differ in ANY
    codeword produce different formats — their codes must never be
    searched together."""
    h = hashlib.md5()
    h.update(np.ascontiguousarray(codebooks, dtype=np.float64).tobytes())
    h.update(repr(codebooks.shape).encode())
    tag = f"pq1:{h.hexdigest()[:16]}"
    if centroids is not None:
        h2 = hashlib.md5()
        h2.update(np.ascontiguousarray(centroids,
                                       dtype=np.float64).tobytes())
        h2.update(repr(centroids.shape).encode())
        tag += f":ivf:{h2.hexdigest()[:16]}"
    return tag


def _check_pq_format(spark, store_path: str, has_existing: bool,
                     expected: str) -> None:
    _check_sig_format(spark, store_path, has_existing, expected,
                      marker_name="_PQ_FORMAT", what="PQ index store",
                      fmt_label="index format")


def ingest_pq_batch(batch: Table, store_path: str,
                    codebooks: np.ndarray,
                    centroids: np.ndarray | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    batch_id: int | None = None) -> None:
    """Encode ONE batch of embeddings and add it to the code store.

    ``batch_id`` defaults to (max existing ingest id) + 1; pass the
    ``foreachBatch`` batch id from streaming so a checkpoint replay
    overwrites its own subdirectory (exactly-once)."""
    spark = batch.df.sparkSession
    root = resolve_store_root(spark, store_path)
    existing = _ingest_ids(spark, root)
    _check_pq_format(spark, root, bool(existing),
                     pq_index_format(codebooks, centroids))
    if batch_id is None:
        batch_id = (max(existing) + 1) if existing else 0

    coded = batch
    if centroids is not None:
        coded = ivf_assign(coded, centroids, vec_col=vec_col)
    coded = pq_encode(coded, codebooks, vec_col=vec_col)
    keep = [id_col, "pq_code"] + (["cell"] if centroids is not None
                                  else [])
    w = (coded.df.select(*keep).write.mode("overwrite"))
    if centroids is not None:
        w = w.partitionBy("cell")
    w.parquet(f"{root}/ingest={batch_id}")


def incremental_pq_index(stream, store_path: str, checkpoint: str,
                         codebooks: np.ndarray,
                         centroids: np.ndarray | None = None,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding"):
    """Streaming wrapper: each micro-batch of embeddings is encoded with
    the FIXED trained codebooks and appended to the store keyed by the
    checkpoint's batch id.  Codebooks deliberately do not update online
    — retrain + re-encode is a new store (new ``_PQ_FORMAT``), exactly
    like the FAISS recipe of training once on a sample."""
    def _on_batch(bdf: DataFrame, batch_id: int):
        if not bdf.head(1):
            return
        ingest_pq_batch(Table(bdf), store_path, codebooks, centroids,
                        id_col, vec_col, batch_id=batch_id)

    return (stream.df.writeStream.foreachBatch(_on_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append").start())


def read_pq_index(spark, store_path: str, codebooks: np.ndarray,
                  centroids: np.ndarray | None = None) -> Table:
    """Open the code store for querying (``pq_topk`` / ``ivf_pq_topk``).

    Validates the store was built with THESE artifacts, and reads only
    complete ingests (``_SUCCESS``-marked) so a crashed half-written
    batch directory is never searched."""
    root = resolve_store_root(spark, store_path)
    complete = _ingest_ids(spark, root, complete_only=True)
    if not complete:
        raise ValueError(
            f"PQ index store at {store_path!r} has no complete ingests "
            "— nothing to search yet (the path may not exist, the "
            "stream may not have committed its first batch, or every "
            "ingest directory is missing its _SUCCESS marker)")
    _check_pq_format(spark, root, True,
                     pq_index_format(codebooks, centroids))
    # explicit complete-dir read (VERDICT r10 #2, same as
    # read_bucket_counts): a root-wide read's schema inference may
    # touch a crashed ingest's half-written footer and fail the whole
    # read; listing the _SUCCESS-complete directories cannot
    df = (spark.read.option("basePath", root)
          .parquet(*[f"{root}/ingest={i}" for i in complete])
          .drop("ingest"))
    return Table(df, "pq_index")


def compact_pq_store(spark, store_path: str, files_per_cell: int = 1,
                     strategy: str | None = None) -> None:
    """Rewrite the PQ code store with ``files_per_cell`` files per cell
    (one file total for a cell-less store), collapsing the COMPLETE
    ingest subdirectories into the highest complete ingest id — the PQ
    sibling of :func:`incremental_dedup.compact_store` (VERDICT r9 #4):
    long-running streams accumulate one parquet directory per batch, and
    probed-cell scan cost grows with file COUNT (listing + footer opens)
    across every ingest.  Same engine, same guarantees: complete-only
    input (a crashed batch's replay must not overwrite the compacted
    store), ``_PQ_FORMAT`` carried across, atomic-rename swap on
    rename-capable filesystems and the copy-then-repoint ``_CURRENT``
    manifest flip on object stores.  ``read_pq_index`` answers
    identically before and after (the digest check still validates the
    artifacts)."""
    _compact_store_impl(spark, store_path, files_per_cell, "cell",
                        ["_PQ_FORMAT"], strategy, "compact_pq_store")


# silent-empty audit: eager store write — remote inputs raise at entry
from ..core import _localize_guard as _lg  # noqa: E402

ingest_pq_batch = _lg(ingest_pq_batch)
