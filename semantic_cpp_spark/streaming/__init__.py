from semantic_cpp_spark.streaming import ops

__all__ = ["ops"]
