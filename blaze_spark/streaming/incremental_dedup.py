"""Incremental near-duplicate detection over a growing document corpus.

The batch LSH path (``pipeline.dedup.minhash_candidates``) re-reads the
whole corpus; a training-data ingest pipeline instead sees documents
arrive continuously and must answer "is this NEW doc a near-dup of
ANYTHING seen so far" without an O(corpus) rescan per batch.

Design (Spark-first):

- A persistent **signature store** (parquet) holds one row per
  (doc_id, band, bhash, signature) — the LSH index.  It is written
  partitioned by ``band`` so a batch probe prunes to the bands it needs.
- Per micro-batch: signatures for the batch docs are computed exactly as
  in the batch path, then the batch's band entries probe the store with a
  **broadcast hash join** (the batch side is small by construction; the
  store side is scanned with partition pruning on ``band`` + the dynamic
  bhash filter the broadcast join provides).  In-batch duplicates are
  found with the same in-bucket pairing as the batch path.
- The batch's entries are APPENDED to the store afterwards, so the store
  is an append-only log — no read-modify-write, safe under the
  exactly-once semantics of ``foreachBatch`` (re-run batches overwrite by
  ``batch_id`` subdirectory).

At 100 TB the store is the corpus-scale object; everything per-batch is
proportional to batch size x matching buckets, never to the corpus.

No reference equivalent (its "streaming" is lazy iterators —
SURVEY.md §1.1); green-field extension per the build plan (§7 M5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import Table
from ..pipeline.dedup import minhash_signatures


def _band_entries(sigs: DataFrame, num_perm: int, bands: int) -> DataFrame:
    r = num_perm // bands
    return sigs.select(
        "doc_id", "signature",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bi: F.struct(
                bi.alias("band"),
                F.xxhash64(F.concat_ws(
                    ",", F.transform(F.slice("signature", bi * r + 1, r),
                                     lambda x: x.cast("string"))
                )).alias("bhash"),
            ),
        )).alias("bk"),
    ).select("doc_id", "signature", F.col("bk.band").alias("band"),
             F.col("bk.bhash").alias("bhash"))


def _est_jaccard(num_perm: int):
    def est(sig_a, sig_b):
        return (F.size(F.filter(
            F.zip_with(sig_a, sig_b, lambda p, q: (p == q).cast("int")),
            lambda eq: eq == 1)) / F.lit(float(num_perm)))
    return est


def process_batch(batch: Table, store_path: str, text_col: str = "text",
                  id_col: str = "doc_id", num_perm: int = 32,
                  bands: int = 8, shingle_k: int = 5,
                  seed: int = 42) -> DataFrame:
    """One increment: probe the store with a batch of new docs, return
    near-dup candidate pairs (new_doc, matched_doc, est_jaccard;
    matched_doc may be a stored doc OR an earlier doc of the same batch),
    then append the batch's band entries to the store.

    Returns the MATERIALIZED pairs as a DataFrame (collected into a local
    relation before the store is appended, so the result does not change
    when the store does).
    """
    spark = batch.df.sparkSession
    sigs = minhash_signatures(batch, text_col, id_col, num_perm,
                              shingle_k, seed).df.persist()
    entries = _band_entries(sigs, num_perm, bands).persist()
    est = _est_jaccard(num_perm)

    # probe the persistent index: store-side scan prunes on band (partition
    # column) and the broadcast join dynamically filters bhash
    pairs = []
    if any(not f.startswith(".") and f != "_SUCCESS"
           for f in (os.listdir(store_path)
                     if os.path.isdir(store_path) else [])):
        store = spark.read.parquet(store_path)
        vs_store = (
            store.join(
                F.broadcast(entries.withColumnsRenamed(
                    {"doc_id": "new_doc", "signature": "new_sig"})),
                ["band", "bhash"])
            .filter(F.col("doc_id") != F.col("new_doc"))
            .select(F.col("new_doc"), F.col("doc_id").alias("matched_doc"),
                    est(F.col("new_sig"), F.col("signature"))
                    .alias("est_jaccard"))
        )
        pairs.append(vs_store)

    # in-batch pairs: same bucket-local pairing as the batch path
    grouped = (entries.groupBy("band", "bhash")
               .agg(F.array_sort(F.collect_list(
                   F.struct("doc_id", "signature"))).alias("docs"))
               .filter(F.size("docs") >= 2))
    pair_arr = F.flatten(F.transform(
        F.col("docs"),
        lambda x, i: F.transform(
            F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
            lambda y: F.struct(
                y["doc_id"].alias("new_doc"),
                x["doc_id"].alias("matched_doc"),
                est(x["signature"], y["signature"]).alias("est_jaccard")))))
    in_batch = (grouped.select(F.explode(pair_arr).alias("pr"))
                .select("pr.new_doc", "pr.matched_doc", "pr.est_jaccard"))
    pairs.append(in_batch)

    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionByName(p)
    out = (out.groupBy("new_doc", "matched_doc")
           .agg(F.max("est_jaccard").alias("est_jaccard")))
    # materialize BEFORE mutating the store (a lazy plan could re-list the
    # store directory after the append below and double-count).  Pair volume
    # is near-dup hits per batch — small by nature; for batches where it
    # isn't, write-to-sink-first instead.
    result = spark.createDataFrame(out.collect(), out.schema)

    (entries.select("doc_id", "band", "bhash", "signature")
     .write.mode("append").partitionBy("band").parquet(store_path))
    sigs.unpersist()
    entries.unpersist()
    return result


def incremental_minhash_dedup(stream, store_path: str, checkpoint: str,
                              pairs_path: str, text_col: str = "text",
                              id_col: str = "doc_id", num_perm: int = 32,
                              bands: int = 8, shingle_k: int = 5,
                              seed: int = 42):
    """Streaming wrapper: for each micro-batch of documents, emit near-dup
    pairs against everything seen so far to ``pairs_path`` (parquet) and
    grow the signature store.  Uses ``foreachBatch`` — the probe/append
    cycle above runs once per batch with exactly-once checkpointing."""
    def _on_batch(bdf: DataFrame, batch_id: int):
        if not bdf.head(1):
            return
        found = process_batch(Table(bdf), store_path, text_col, id_col,
                              num_perm, bands, shingle_k, seed)
        (found.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(pairs_path))

    return (stream.df.writeStream.foreachBatch(_on_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append").start())


def compact_store(spark, store_path: str, files_per_band: int = 1) -> None:
    """Rewrite the append-only signature store with ``files_per_band``
    files per band partition.  Long-running streams append one small file
    per band per batch; probe-side scan cost grows with file COUNT (footer
    opens + listing), not data size — periodic compaction restores it.
    Run from a maintenance job, not the hot path; the rewrite is atomic
    per the parquet committer (temp dir + rename).
    """
    import shutil
    import tempfile

    df = spark.read.parquet(store_path)
    tmp = tempfile.mkdtemp(prefix="sigstore_compact_",
                           dir=os.path.dirname(store_path.rstrip("/")))
    (df.repartition(files_per_band, "band")
     .write.mode("overwrite").partitionBy("band").parquet(tmp))
    # swap: the store is an index rebuildable from the corpus, so the
    # non-transactional window here loses at most availability, not data
    old = store_path.rstrip("/") + ".old"
    shutil.move(store_path.rstrip("/"), old)
    shutil.move(tmp, store_path.rstrip("/"))
    shutil.rmtree(old)
