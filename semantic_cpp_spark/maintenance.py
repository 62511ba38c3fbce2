"""Dataset maintenance: small-file compaction — the table-hygiene
operation every long-running ingestion pipeline needs (thousands of tiny
parquet files turn every downstream scan into a task-scheduling storm;
the fix is a periodic rewrite at a target file size).

Sizes are read through the Hadoop FileSystem API (scheme-agnostic —
local, HDFS, object stores), not os.path, so the helper behaves the same
on a cluster. The rewrite is one `repartition(ceil(bytes/target))` —
a single round-robin shuffle producing uniformly-sized output files.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(df: DataFrame) -> int:
    """Total on-disk bytes of the files backing a DataFrame, via the
    Hadoop FS of each path (works for any scheme Spark can read)."""
    spark = df.sparkSession
    hconf = spark._jsc.hadoopConfiguration()
    jvm = spark._jvm
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    return total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
    mode: str = "error",
) -> int:
    """Rewrite a parquet dataset into ⌈total_bytes / target_bytes⌉
    uniformly-sized files. Returns the output file count chosen.
    128 MiB default matches the usual HDFS-block / scan-split sweet
    spot; compaction ratios come from the REAL byte sizes, so the same
    call works whether the input is 40 files or 40 million."""
    df = spark.read.parquet(src)
    n_files = max(1, math.ceil(dataset_bytes(df) / target_bytes))
    df.repartition(n_files).write.mode(mode).parquet(dst)
    return n_files


def checkpoint_steps(
    spark: SparkSession, path: str, marker: str | None = None
) -> list[int]:
    """``step=<i>`` directory numbers under ``path`` (one Hadoop FS
    listing — scheme-agnostic like dataset_bytes). Shared by the
    iterative trainers' checkpoint resume paths
    (text.bpe_train_merges, similarity.pq_books_trained).

    ``marker`` filters to COMPLETED steps (ADVICE r11): a step counts
    only when ``<path>/step=<i>/<marker>`` exists — the commit marker
    of the step's LAST write (Spark's parquet ``_SUCCESS`` for
    single-output steps; ``merges/_SUCCESS`` for BPE, whose merges
    table is written after the words state). A crash mid-checkpoint
    leaves the marker absent, so resume falls back to the previous
    intact step instead of adopting a partially-written state or
    raising on a missing sub-directory. ``marker=None`` lists every
    step dir regardless — the PROVENANCE form the params-sidecar
    guards use ("this root has step dirs but no sidecar" must see
    incomplete debris too)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    steps = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("step="):
            try:
                i = int(name[5:])
            except ValueError:
                continue
            if marker is None or fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{path}/step={i}/{marker}")
            ):
                steps.append(i)
    return sorted(steps)
