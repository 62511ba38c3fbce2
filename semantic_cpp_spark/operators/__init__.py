from semantic_cpp_spark.operators import collectors, windows

__all__ = ["collectors", "windows"]
