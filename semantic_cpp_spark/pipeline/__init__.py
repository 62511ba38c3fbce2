from semantic_cpp_spark.pipeline import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
