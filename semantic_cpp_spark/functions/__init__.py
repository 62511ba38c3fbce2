from semantic_cpp_spark.functions import stats, strings, vectors

__all__ = ["stats", "strings", "vectors"]
