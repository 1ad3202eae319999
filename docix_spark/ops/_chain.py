"""Namespace chaining for the linearized driver-query modules.

driver_queries was one 57k-line module; ops/q00..q16 are its statements in
the ORIGINAL order, each module inheriting the previous module's namespace
at import time. Call-time global lookups resolve inside each op's OWN
module, so a later module rebinding a constant name can no longer
silently desynchronize an earlier op's Column expressions from its
decoration-time oracle SQL (the round-4 _Q3_CUT/_ADH_TARGET incident) —
the two collision classes the single namespace produced are now
structurally impossible across modules, and @register still raises on
duplicate op names globally (shared REGISTRY object).
"""

from __future__ import annotations

import importlib


def inherit(ns: dict, prev_module: str) -> None:
    """Copy every non-dunder binding of ``prev_module`` into ``ns``.

    Objects are shared (REGISTRY, memo caches mutate through), bindings
    are per-module (rebinds stay local to later modules)."""
    prev = importlib.import_module(prev_module)
    ns.update(
        {
            k: v
            for k, v in vars(prev).items()
            if not (k.startswith("__") and k.endswith("__"))
        }
    )
