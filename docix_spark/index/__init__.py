from docix_spark.index.build import (  # noqa: F401
    Index,
    build_index,
    build_postings,
    term_bucket,
)
from docix_spark.index.reindex import reindex_missing, reindex_paths  # noqa: F401
from docix_spark.index.segments import (  # noqa: F401
    SegmentIndex,
    build_segments,
    extend_segments,
    merge_segments,
)
