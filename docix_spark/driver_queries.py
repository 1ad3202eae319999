"""Driver contract registry — facade over the linearized operator modules.

The 769 registered operators live in ``docix_spark/ops/q00.py`` ..
``q16.py`` (split at top-level statement boundaries from the original
single module, same statement order — see ``docix_spark/ops/__init__``
and ``ops/_chain.py``). This module re-exports the final namespace, so
``from docix_spark.driver_queries import REGISTRY, <helper>, <constant>``
keeps working for every consumer (tests, bench, __spark_entry__).
"""

from docix_spark.ops._chain import inherit as _inherit

_inherit(globals(), "docix_spark.ops.q16")

del _inherit
