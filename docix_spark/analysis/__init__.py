from docix_spark.analysis.tokenizer import (  # noqa: F401
    TOKEN_PATTERN,
    spark_tokens,
    tokenize,
    tokenize_series,
)
