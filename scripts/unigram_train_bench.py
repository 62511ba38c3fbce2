"""Measure unigram.train_pieces at realistic word-table sizes
(VERDICT r12 "What's missing #2"): the trainer collects up to
UNIGRAM_TRAIN_MAX_WORDS distinct words and runs pure-Python seeding +
per-round Viterbi over every distinct word — O(rounds · Σ|word| ·
max_piece_len).  The gate corpora are tiny (31-word salad vocabulary),
so before anyone points a real corpus at the cap this script times
seed + 4 EM rounds at 10⁵ and 10⁶ distinct words and records wall and
peak RSS; SCALING.md holds the measured bound next to the cap.

Words are deterministic synthetic (seeded Zipf-ish lengths/alphabet —
no fixture dependency, reproducible anywhere):
    python scripts/unigram_train_bench.py [n_words ...]
"""

from __future__ import annotations

import random
import resource
import sys
import time

sys.path.insert(0, "/root/repo")


def make_words(n: int, seed: int = 13) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    out = set()
    while len(out) < n:
        ln = rng.randint(3, 12)
        out.add("".join(rng.choice(alpha) for _ in range(ln)))
    words = sorted(out)
    # Zipf-ish frequencies: rank r gets ~ n/r (integer, >= 1)
    return [(w, max(1, n // (i + 1))) for i, w in enumerate(words)]


def main() -> None:
    from pyspark.sql import SparkSession

    from semantic_cpp_spark.pipeline import unigram

    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("unigram_train_bench")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        rows = make_words(n)
        wdf = spark.createDataFrame(rows, "word string, freq long")
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        t0 = time.time()
        model = unigram.train_pieces(
            wdf, vocab_size=8_000, rounds=4, max_words=max(n, 5_000_000)
        )
        n_pieces = model.pieces.count()
        wall = time.time() - t0
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        print(
            f"n_words={n} wall={wall:.1f}s pieces={n_pieces} "
            f"driver_rss_delta={(rss1 - rss0) / 1024:.0f}MB "
            f"history={model.history}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
