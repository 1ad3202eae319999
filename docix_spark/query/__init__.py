from docix_spark.query.plan import AnalyzedQuery, analyze_query, auto_max_edits, validate_search  # noqa: F401
from docix_spark.query.bm25 import search_topk  # noqa: F401
