"""Tokenizer parity: pure-Python == pandas-vectorized == Spark JVM == DuckDB.

The analyzer contract is the ES `standard` analyzer the reference selects
(ElasticsearchDocumentSearchAdapter.java:253-258): lowercase + word
segmentation, no stemming/stopwords. All four implementations must agree —
they feed the engine, the oracle, and the DuckDB correctness gate.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from docix_spark.analysis.tokenizer import TOKEN_PATTERN, spark_tokens, tokenize, tokenize_series

SAMPLES = [
    "Hello, World! foo_bar baz123",
    "  multiple   spaces\tand\nnewlines ",
    "CamelCaseStaysOneToken snake_case_too",
    "digits 007 mix3d UPPER lower_",
    "",
    "punct!@#$%^&*()only",
    "unicode café naïve 北京 stays-ascii-split",
]


def test_pure_python_basics():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("foo_bar-baz") == ["foo_bar", "baz"]
    assert tokenize("") == []
    assert tokenize(None) == []
    # ASCII \w: accented chars split (parity with Java/RE2 ASCII classes)
    assert tokenize("café") == ["caf"]


def test_pandas_matches_python():
    got = tokenize_series(pd.Series(SAMPLES)).tolist()
    assert got == [tokenize(s) for s in SAMPLES]


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
    got = [r.toks for r in df.select(spark_tokens("text").alias("toks")).collect()]
    assert got == [tokenize(s) for s in SAMPLES]


def test_duckdb_matches_python():
    con = duckdb.connect()
    for s in SAMPLES:
        got = con.execute(
            "SELECT regexp_extract_all(lower(?), ?)", [s, TOKEN_PATTERN]
        ).fetchone()[0]
        assert got == tokenize(s), s
