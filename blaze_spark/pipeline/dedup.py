"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of these at 100 TB):

- **Exact / normalized**: hash-groupBy on an md5 fingerprint — one shuffle
  keyed by a uniformly distributed 128-bit hash (no skew), map-side partial
  aggregation free from Catalyst.
- **MinHash+LSH**: signatures are computed scan-side with array
  higher-order functions (transform/aggregate — pure JVM codegen, no
  Python, no explode of the shingle set).  Only the (band, band-hash) keys
  are exploded — `bands × rows`, tiny — and the candidate generation is an
  equi-self-join on the band hash, which Catalyst executes as a shuffled
  hash join keyed by uniform hashes.  Degenerate buckets (boilerplate
  shingles shared by millions of docs) are capped with a count filter
  before the join so one hot bucket can't quadratic-blow a partition.
- **SimHash**: one explode over tokens then a 64-column conditional-sum
  hash aggregation (partial agg; shuffle carries 64 ints per doc), pairs
  via pigeonhole banding on 16-bit chunks.
- **n-gram Jaccard**: exact verification on candidate pairs only — never
  all-pairs.

All-pairs anything is absent by construction.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import Table

# Mersenne prime 2^31-1: (a*h+b) stays under 2^62 — no 64-bit overflow,
# safe under ANSI arithmetic.
_P = 2_147_483_647


def _shingles(text: Column, k: int) -> Column:
    """Word k-shingles as an array (JVM-side; no explode)."""
    tokens = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(tokens) - F.lit(k - 1)
    return F.when(
        n > 0,
        F.transform(F.sequence(F.lit(0), n - 1),
                    lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", tokens)))


def exact_dedup(t: Table, text_col: str = "text", id_col: str = "doc_id") -> Table:
    """Exact dedup: hash-groupBy on md5(text); keeper = min id per group."""
    return Table(
        t.df.groupBy(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("fingerprint"))
        .agg(F.min(id_col).alias("keeper_id"),
             F.count(F.lit(1)).alias("n_copies")),
        t._name,
    )


def normalized_dedup(t: Table, text_col: str = "text", id_col: str = "doc_id") -> Table:
    """Exact dedup after canonicalization (lowercase, collapse whitespace)."""
    canon = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return Table(
        t.df.groupBy(F.md5(F.encode(canon, "UTF-8")).alias("fingerprint"))
        .agg(F.min(id_col).alias("keeper_id"),
             F.count(F.lit(1)).alias("n_copies")),
        t._name,
    )


def minhash_signatures(t: Table, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 32, shingle_k: int = 5,
                       seed: int = 42) -> Table:
    """MinHash signature per document: shingle → xxhash64 → k universal-hash
    permutations → per-permutation min.  Entirely array HOFs — the shingle
    set never leaves the row."""
    rng = random.Random(seed)
    a = [rng.randrange(1, _P) for _ in range(num_perm)]
    b = [rng.randrange(0, _P) for _ in range(num_perm)]

    # explode distinct shingle hashes, then one hash-aggregate computing all
    # num_perm mins — fully whole-stage-codegen'd (array higher-order
    # functions are interpreted per element and were ~10x slower here).
    # Scale: rows of one doc are colocated in the scan partition, so
    # Catalyst's map-side partial aggregation collapses the explosion back
    # to one row per doc before the shuffle; the shuffle carries
    # num_perm longs per doc.
    hashes = F.array_distinct(
        F.transform(_shingles(F.col(text_col), shingle_k),
                    lambda s: F.pmod(F.xxhash64(s), F.lit(_P))))
    # spread the per-row-heavy shingling across all cores: a small file
    # scans as one partition, and at scale this also levels doc-size skew
    src = t.df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    npart = t.df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < npart:
        src = src.repartition(npart, "doc_id")
    ex = src.select("doc_id", F.explode(hashes).alias("h"))
    mins = [F.min((F.col("h") * F.lit(a[j]) + F.lit(b[j])) % F.lit(_P))
            .alias(f"m{j}") for j in range(num_perm)]
    agg = ex.groupBy("doc_id").agg(*mins)
    return Table(
        agg.select("doc_id",
                   F.array(*[F.col(f"m{j}") for j in range(num_perm)])
                   .alias("signature")),
        t._name,
    )


def minhash_candidates(t: Table, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 32, bands: int = 8, shingle_k: int = 5,
                       seed: int = 42, max_bucket: int = 1000) -> Table:
    """LSH banding: split the signature into ``bands`` rows of
    ``num_perm//bands``, bucket-join on (band, hash(rows)).  Returns
    candidate pairs (doc_a < doc_b) with the fraction of matching signature
    components as ``est_jaccard``.

    ``max_bucket`` drops degenerate buckets before the self-join — the
    skew guard that keeps a hot bucket from going quadratic at scale.
    """
    r = num_perm // bands
    # persist: the signature scan feeds the bucket-size stats, both sides of
    # the self-join, and the est_jaccard comparison — without this the whole
    # shingle+hash pipeline re-executes once per consumer (at 100 TB this is
    # the difference between one corpus pass and five)
    sigs = minhash_signatures(t, text_col, id_col, num_perm, shingle_k,
                              seed).df.persist()

    band_entries = sigs.select(
        "doc_id", "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(F.concat_ws(
                        ",", F.transform(F.slice("signature", bi * r + 1, r),
                                         lambda x: x.cast("string"))
                    )).alias("bhash"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "signature", F.col("bk.band").alias("band"),
             F.col("bk.bhash").alias("bhash"))

    band_entries = band_entries.persist()
    # skew guard: cap bucket size
    bucket_sizes = band_entries.groupBy("band", "bhash").count()
    small = band_entries.join(
        bucket_sizes.filter((F.col("count") > 1) & (F.col("count") <= max_bucket)),
        ["band", "bhash"],
    ).select("band", "bhash", "doc_id", "signature").persist()

    l, rgt = small.alias("l"), small.alias("r")
    pairs = (
        l.join(rgt, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.bhash") == F.col("r.bhash"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            (
                F.size(F.filter(
                    F.zip_with("l.signature", "r.signature",
                               lambda x, y: (x == y).cast("int")),
                    lambda eq: eq == 1))
                / F.lit(float(num_perm))
            ).alias("est_jaccard"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.first("est_jaccard").alias("est_jaccard"))
    )
    return Table(pairs, "minhash_candidates")


def ngram_jaccard_pairs(t: Table, candidates: Table, text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 5) -> Table:
    """Exact shingle-set Jaccard for candidate pairs only (verification
    stage after LSH) — array_intersect/array_union on distinct shingle
    hashes, joined twice against the docs table."""
    src = t.df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    npart = t.df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < npart:
        src = src.repartition(npart, "doc_id")
    docs = src.select(
        "doc_id",
        F.array_distinct(
            F.transform(_shingles(F.col(text_col), shingle_k),
                        lambda s: F.xxhash64(s))
        ).alias("sh"),
    )
    c = candidates.df
    out = (
        c.join(docs.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(docs.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")), 4
            ).alias("jaccard"),
        )
    )
    return Table(out, "ngram_jaccard_pairs")


def simhash(t: Table, text_col: str = "text", id_col: str = "doc_id") -> Table:
    """64-bit SimHash as two 32-bit halves (hi, lo) — bit-voting over token
    xxhash64 values.  Explode tokens once, then 64 conditional sums in a
    single hash aggregation (partial agg map-side; the shuffle carries 64
    ints per doc)."""
    src = t.df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    npart = t.df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < npart:
        src = src.repartition(npart, "doc_id")
    toks = src.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))

    votes = [
        F.sum(
            F.when(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)) == 1,
                   1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)

    lo = None
    hi = None
    for b in range(32):
        bit = (F.col(f"b{b}") > 0).cast("long") * F.lit(1 << b)
        lo = bit if lo is None else lo + bit
    for b in range(32, 64):
        bit = (F.col(f"b{b}") > 0).cast("long") * F.lit(1 << (b - 32))
        hi = bit if hi is None else hi + bit
    return Table(
        agg.select("doc_id", lo.alias("sim_lo"), hi.alias("sim_hi")),
        "simhash",
    )


def simhash_candidates(t: Table, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3) -> Table:
    """Near-dup pairs with Hamming distance <= max_hamming.  Pigeonhole:
    split 64 bits into 4 16-bit chunks; distance<=3 pairs share at least
    one exact chunk -> equi-join per chunk, verify with bit_count(xor)."""
    # persist: both sides of the chunk self-join read the signatures —
    # without this the token-explode + 64-vote aggregation runs twice
    sh = simhash(t, text_col, id_col).df.persist()
    chunks = sh.select(
        "doc_id", "sim_lo", "sim_hi",
        F.explode(F.array(
            F.struct(F.lit(0).alias("ci"), (F.col("sim_lo") % 65536).alias("chunk")),
            F.struct(F.lit(1).alias("ci"), (F.floor(F.col("sim_lo") / 65536)).alias("chunk")),
            F.struct(F.lit(2).alias("ci"), (F.col("sim_hi") % 65536).alias("chunk")),
            F.struct(F.lit(3).alias("ci"), (F.floor(F.col("sim_hi") / 65536)).alias("chunk")),
        )).alias("c"),
    ).select("doc_id", "sim_lo", "sim_hi",
             F.col("c.ci").alias("ci"), F.col("c.chunk").alias("chunk"))

    l, r = chunks.alias("l"), chunks.alias("r")
    ham = (
        F.bit_count(F.col("l.sim_lo").bitwiseXOR(F.col("r.sim_lo")))
        + F.bit_count(F.col("l.sim_hi").bitwiseXOR(F.col("r.sim_hi")))
    )
    pairs = (
        l.join(r, (F.col("l.ci") == F.col("r.ci"))
               & (F.col("l.chunk") == F.col("r.chunk"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return Table(pairs, "simhash_candidates")
