#!/usr/bin/env python3
"""Generate a scaled-up benchmark dataset from /root/testdata/sf0.1.

The driver ships sf{0.001,0.01,0.1} only; sf0.1 timings are fixed-overhead
dominated, so the repo needs a larger point to measure a scaling SLOPE
(VERDICT r2 #3).  This replicates sf0.1 SCALE times with join-consistent
key offsets — the same approach dbgen uses (independent key ranges per
segment):

- fact/dim keys get +i*OFFSET per copy i, so FK joins keep exactly the
  sf0.1 match cardinality per copy (orders x10 join customer x10 = x10
  matched rows, never x100);
- region/nation stay fixed (TPC-H dims are scale-invariant);
- document text is DECORRELATED per copy (every token suffixed "_i"):
  copies share no shingles, so dedup workloads scale like a real corpus
  (10x docs, same dup-rate) instead of exploding into 45 all-pairs per
  bucket of identical clones;
- embeddings are rotated i positions per copy: random vectors rotated are
  near-orthogonal, so ANN/near-dup candidate counts scale linearly too.

Writes multi-file parquet (scan parallelism at the source, the way a real
100 TB table arrives) under benchdata/sf<x> — gitignored, regenerate with:

    python tools/gen_bench_sf.py [--scale 10] [--out benchdata/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")

OFFSET = 100_000_000  # far above any sf0.1 key

# table -> columns shifted by i*OFFSET per copy
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# output files per table (source-level scan parallelism)
N_FILES = {"lineitem": 32, "orders": 16, "events": 16, "customer": 8,
           "part": 8, "documents": 8, "embeddings": 4, "supplier": 2}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--out", default="benchdata/sf1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from blaze_spark import load_star

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("gen_bench_sf")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    star = load_star(spark, SRC)
    out_root = Path(args.out)
    out_root.mkdir(parents=True, exist_ok=True)

    emb_dim = None  # probed once (a head() job), reused across copies
    for name, t in star.items():
        t0 = time.time()
        df = t.df
        dest = str(out_root / f"{name}.parquet")
        if name in ("region", "nation"):
            df.coalesce(1).write.mode("overwrite").parquet(dest)
            print(f"{name}: copied [{time.time()-t0:.1f}s]")
            continue
        copies = []
        for i in range(args.scale):
            c = df
            for k in KEY_COLS.get(name, []):
                c = c.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            if name == "documents" and i > 0:
                # decorrelate: suffix every token, rebuild n_chars
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(F.split(F.col("text"), r"\s+"),
                                    lambda x: F.concat(x, F.lit(f"_{i}"))),
                        " "),
                ).withColumn("n_chars", F.length("text"))
            if name == "embeddings" and i > 0:
                # rotate the vector i%dim slots AND apply a per-copy
                # deterministic sign-flip pattern: plain rotation wraps at
                # dim (copies i and i+dim were IDENTICAL — the r6 sf10
                # probe found ~36 exact copies per base vector at
                # scale=100, BASELINE.md), while sign-flips give 2^dim
                # decorrelated variants so near-dup workloads stay
                # realistic at any scale
                import numpy as _np

                if emb_dim is None:
                    emb_dim = len(
                        star[name].df.select("embedding").head()[0])
                dim = emb_dim
                r = (i % dim) or 1
                rot = F.concat(F.slice(F.col("embedding"), r + 1, 10_000),
                               F.slice(F.col("embedding"), 1, r))
                flips = _np.random.default_rng(1000 + i).choice(
                    [-1.0, 1.0], size=dim).tolist()
                flip_arr = F.array(*[F.lit(float(x)) for x in flips])
                c = c.withColumn(
                    "embedding",
                    F.zip_with(rot, flip_arr,
                               lambda a, b: (a * b).cast("float")))
            copies.append(c)
        allc = copies[0]
        for c in copies[1:]:
            allc = allc.unionByName(c)
        nf = N_FILES.get(name, 8)
        allc.repartition(nf).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{name}: {n} rows, {nf} files [{time.time()-t0:.1f}s]")

    spark.stop()


if __name__ == "__main__":
    main()
