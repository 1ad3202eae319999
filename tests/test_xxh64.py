"""Pure-Python XXH64 must equal Spark's xxhash64 (and the derived bucket
ids must equal the build-time term_bucket column) — the invariant that
makes driver-side bucket pruning sound."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from docix_spark.index.build import term_bucket
from docix_spark.index.xxh64 import spark_xxhash64_string, term_bucket_py


def _cases():
    rng = random.Random(7)
    cases = [
        "", "a", "ab", "abc", "abcd", "spark", "hash_join",
        "x" * 7, "x" * 8, "x" * 9, "x" * 31, "x" * 32, "x" * 33, "x" * 100,
        "naïve", "中文字符串", "emoji 🎉 mix", "tab\tnl\n",
    ]
    for _ in range(40):
        n = rng.randint(0, 120)
        cases.append("".join(rng.choice(string.printable) for _ in range(n)))
    return cases


def test_matches_spark_xxhash64(spark):
    cases = _cases()
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64_string(r.s) == r.h, repr(r.s)


def test_bucket_matches_build_column(spark):
    cases = [c for c in _cases() if c]
    df = spark.createDataFrame([(c,) for c in cases], "term string")
    rows = df.select("term", term_bucket(F.col("term"), 64).alias("b")).collect()
    for r in rows:
        assert term_bucket_py(r.term, 64) == r.b, repr(r.term)
