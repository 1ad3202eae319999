"""Linearized driver-query operator modules (round 5, VERDICT r4 ask #3).

The 769-entry driver contract grew as one 57k-line driver_queries.py; its
single namespace produced two silent-collision classes (decorator binding
to a following def, module-constant rebinds desynchronizing earlier ops'
call-time Columns from their decoration-time oracle SQL). The module is
now split at top-level statement boundaries into q00..q16 — SAME
statements, SAME order, byte-identical op bodies — chained by
``_chain.inherit`` so every op resolves call-time globals in its own
bounded module. ``docix_spark.driver_queries`` remains the public facade
re-exporting the full namespace (REGISTRY, helpers, constants).
"""
