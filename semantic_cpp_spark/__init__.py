"""semantic_cpp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of eloyhere/semantic-cpp.

The reference (/root/reference, read-only) is a header-only C++17
stream-processing library: push-based lazy generators over ``(element,
logical-index)`` pairs, chainable intermediate operators, materialisation
into indexed buffers, and a five-stage collector framework for terminal
aggregation (reference README.md:3-16).

This package re-expresses those semantics Spark-first:

- A stream is a DataFrame with a managed dense ordinal column ``__idx``
  (LongType) — the reference's ``Timestamp`` logical index
  (reference function.h:11).
- Intermediate operators are Catalyst expressions / DataFrame
  transformations (lazy, fused by whole-stage codegen).
- Collectors map onto Spark's partial+final aggregation
  (reference collector.h:51-153 is exactly HashAggregateExec's shape).
- The thread-pool layer (reference pool.h) is subsumed by Spark's
  scheduler; ``parallel(n)`` becomes a repartition hint.

Modules
-------
- ``session``    : SparkSession factory tuned for the engine.
- ``indexing``   : scalable dense-ordinal assignment (the ``__idx`` column).
- ``frame``      : ``SemanticFrame`` fluent API (map/filter/sort/... ).
- ``functions``  : expression builders (stats with reference formulas,
                   literal string ops, vector math).
- ``operators``  : windows, grouping, collectors.
- ``pipeline``   : LLM-data-pipeline operators (dedup, similarity,
                   text analysis, multimodal).
- ``streaming``  : Structured Streaming surface (event-time windows,
                   watermarks, stateful operators).
- ``relational`` : TPC-H-style relational queries over the fixtures.
"""

from semantic_cpp_spark.session import get_spark
from semantic_cpp_spark.indexing import IDX, with_ordinal, rebase_index
from semantic_cpp_spark.frame import SemanticFrame

__all__ = ["get_spark", "IDX", "with_ordinal", "rebase_index", "SemanticFrame"]

__version__ = "0.1.0"
