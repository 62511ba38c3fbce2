"""Measured Bloom false-positive rate vs the (1 - e^{-kn/m})^k
prediction across sizings, on the sf1.0 documents fixture: corpus =
docs with doc_id % 10 != 0 (~45k distinct texts), probes = the held-out
10% (guaranteed absent... unless their text collides exactly, so probe
keys are salted to be definitely absent)."""
import math
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import dedup
from semantic_cpp_spark.session import get_spark, load_table

spark = get_spark(
    "bloom_fp",
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, "/root/repo/.localdata/sf1.0", "documents")
corpus = docs.select(F.col("text").alias("key")).distinct().persist()
n_keys = corpus.count()
# definitely-absent probes: salt the text so no probe key is in the corpus
probes = docs.limit(5000).select(
    F.col("doc_id").alias("id"), F.concat(F.lit("ABSENT::"), "text").alias("key")
)
print(f"corpus distinct keys: {n_keys}")
print("| n_bits | k | predicted FP | measured FP |")
print("|---|---|---|---|")
for bits_pow in (18, 20, 22):
    m = 1 << bits_pow
    k = 5
    pred = (1.0 - math.exp(-k * n_keys / m)) ** k
    bloom = dedup.bloom_build(corpus, F.col("key"), n_bits=m, k_hashes=k)
    got = dedup.bloom_probe(
        bloom, probes, F.col("key"), F.col("id"), n_bits=m, k_hashes=k
    )
    fp = got.agg(F.avg(F.col("maybe_member").cast("double"))).collect()[0][0]
    print(f"| 2^{bits_pow} | {k} | {pred:.4f} | {fp:.4f} |")
corpus.unpersist()
