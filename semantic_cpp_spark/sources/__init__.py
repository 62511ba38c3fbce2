from semantic_cpp_spark.sources.factories import (
    from_container,
    from_dataframe,
    from_parquet_column,
    from_range,
    from_range_closed,
    from_repeat,
    from_text_lines,
    iterate,
    use_empty,
    use_generate,
    use_random,
)

__all__ = [
    "from_container",
    "from_dataframe",
    "from_parquet_column",
    "from_range",
    "from_range_closed",
    "from_repeat",
    "from_text_lines",
    "iterate",
    "use_empty",
    "use_generate",
    "use_random",
]
