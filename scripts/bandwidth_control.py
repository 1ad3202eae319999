#!/usr/bin/env python
"""No-Spark parallel-bandwidth control for the scaling gate.

Runs the engine's ACTUAL vectorized posting-construction kernel
(`index.build._postings_for_batch` over `corpus.synth_corpus_pdf` batches)
under plain ``multiprocessing`` at several process counts and prints one
JSON line per level. No Spark, no JVM, no shuffle — whatever efficiency
THIS loses from 1 -> 4 procs is the box's shared memory-bandwidth /
tenancy ceiling, not the engine's.

Use it to calibrate scaling_run.py results: the same-day control bounds
the best any code could measure (BENCH.md "why 1->4 is the honest pair").
Run uncontended.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _work(args) -> int:
    seed, n_docs, len_scale = args
    import hashlib

    from docix_spark.corpus import synth_corpus_pdf
    from docix_spark.index.build import _postings_for_batch

    pdf = synth_corpus_pdf(n_docs, seed=seed, len_scale=len_scale)
    # same sha256(content) doc_id the Spark path assigns (corpus.with_doc_ids)
    pdf["doc_id"] = [
        hashlib.sha256(c.encode()).hexdigest() for c in pdf["content"]
    ]
    pdf["file_name"] = pdf["path"].str.rsplit("/", n=1).str[-1]
    pdf["original_file_name"] = pdf["file_name"]
    out = _postings_for_batch(
        pdf, ["content", "file_name", "original_file_name"], "content"
    )
    return len(out)


def measure(procs: int, n_docs: int, len_scale: float, batches_per_proc: int) -> dict:
    jobs = [
        (1000 + i, n_docs, len_scale) for i in range(procs * batches_per_proc)
    ]
    t0 = time.perf_counter()
    if procs == 1:
        rows = sum(_work(j) for j in jobs)
    else:
        with mp.Pool(procs) as pool:
            rows = sum(pool.map(_work, jobs, chunksize=1))
    dt = time.perf_counter() - t0
    docs = len(jobs) * n_docs
    return {
        "procs": procs,
        "docs": docs,
        "posting_rows": rows,
        "seconds": round(dt, 3),
        "docs_per_sec": round(docs / dt, 1),
        "per_proc": round(docs / dt / procs, 1),
    }


def main() -> None:
    levels = [int(x) for x in (sys.argv[1:] or ["1", "4"])]
    n_docs, len_scale, batches = 500, 8.0, 4
    # warm imports/caches once so level 1 isn't paying first-touch costs
    _work((7, 50, len_scale))
    out = [measure(p, n_docs, len_scale, batches) for p in levels]
    base = out[0]
    for lv in out:
        factor = lv["procs"] / base["procs"]
        speed = lv["docs_per_sec"] / base["docs_per_sec"]
        lv["efficiency_vs_first"] = round(speed / factor, 3)
    print(json.dumps({"metric": "bandwidth_control", "levels": out}))


if __name__ == "__main__":
    main()
