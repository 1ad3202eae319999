from docix_spark.query.plan import AnalyzedQuery, analyze_query, auto_max_edits, validate_search  # noqa: F401
from docix_spark.query.bm25 import search_topk  # noqa: F401
from docix_spark.query.serve import (  # noqa: F401
    CompositeSearcher,
    LocalSearcher,
    fleet_search_composite,
    fleet_topk,
)
from docix_spark.query.service import SearchPage, Tombstones, autocomplete, compact, search  # noqa: F401
from docix_spark.query.wand import wand_topk  # noqa: F401
