from docix_spark.index.build import (  # noqa: F401
    Index,
    build_index,
    build_postings,
    term_bucket,
)
