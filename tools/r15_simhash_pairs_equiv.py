"""Equivalence + A/B timing for the r15 simhash_neardup_pairs SQL-string
probe-key rewrite: compare the NEW (SQL-parsed) construction against an
inline replica of the OLD per-Column construction, exceptAll both ways,
over sf0.1 documents at both call geometries (bits=64 default and the
bits=63/ahash-shaped call)."""
import os
import sys
import time
from itertools import combinations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from workshoop2_etl_spark.operators.dedup import simhash, simhash_neardup_pairs


def old_pairs(fingerprints, id_col, *, fp_col="simhash", max_hamming=3,
              n_blocks=None, bits=64, max_bucket_size=2000):
    """Inline replica of the pre-r15 per-Column construction."""
    m = n_blocks if n_blocks is not None else max_hamming + 3
    width = -(-bits // m)
    mask = (1 << width) - 1
    fp = F.col(fp_col)
    block_vals = [
        F.shiftrightunsigned(fp, i * width).bitwiseAND(F.lit(mask).cast("long"))
        for i in range(m)
    ]
    subsets = list(combinations(range(m), m - max_hamming))
    probe_structs = []
    for sid, subset in enumerate(subsets):
        packed = F.lit(0).cast("long")
        for j, i in enumerate(subset):
            packed = packed + F.shiftleft(block_vals[i], j * width)
        probe_structs.append(F.struct(F.lit(sid).alias("blk"), packed.alias("val")))
    b = fingerprints.select(
        F.col(id_col), fp.alias("__fp"), F.explode(F.array(*probe_structs)).alias("__b")
    ).select(id_col, "__fp", F.col("__b.blk").alias("blk"), F.col("__b.val").alias("val"))
    if max_bucket_size is not None:
        w = Window.partitionBy("blk", "val")
        b = (
            b.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    left = b.select(F.col(id_col).alias("__ida"), F.col("__fp").alias("__fa"), "blk", "val")
    right = b.select(F.col(id_col).alias("__idb"), F.col("__fp").alias("__fb"), "blk", "val")
    return (
        left.join(right, ["blk", "val"])
        .filter(F.col("__ida") < F.col("__idb"))
        .dropDuplicates(["__ida", "__idb"])
        .withColumn("hamming", F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("__ida").alias(f"{id_col}_a"),
            F.col("__idb").alias(f"{id_col}_b"),
            "hamming",
        )
    )


sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
fps = simhash(docs, "doc_id", "text").cache()
fps.count()

for label, kw in [
    ("default bits=64", {}),
    ("bits=63 ahash-shape", {"bits": 63}),
]:
    new_df = simhash_neardup_pairs(fps, "doc_id", max_hamming=3, **kw)
    old_df = old_pairs(fps, "doc_id", max_hamming=3, **kw)
    assert new_df.schema == old_df.schema, (label, new_df.schema, old_df.schema)
    a = new_df.exceptAll(old_df).count()
    b = old_df.exceptAll(new_df).count()
    n = new_df.count()
    print(f"EQUIV {label}: new_minus_old={a} old_minus_new={b} n_pairs={n}")
    assert a == 0 and b == 0

# Driver-side build-time A/B (the thing the rewrite targets)
for label, fn in [("old", old_pairs), ("new", simhash_neardup_pairs)]:
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(fps, "doc_id", max_hamming=3)
        t.append(time.perf_counter() - t0)
    print(f"BUILD {label}: min={min(t):.3f}s runs={[round(x,3) for x in t]}")

fps.unpersist()
spark.stop()
print("OK")
