"""Measured evidence for the vectorized trigram kernel (VERDICT r3 stretch
#9): the r2→r3 rewrite replaced a per-row Python itertuples+set kernel with
the pure-numpy sliding-window extraction (index/ngram.py:_trigram_frame).
The structural claim was verified in r3; this bench quantifies it on a
compute-heavy corpus (len_scale-boosted, the regime where the old kernel
was Python-bound) — run single-process, no Spark, so the number isolates
the kernel itself.

Usage: python scripts/trigram_kernel_bench.py [--docs 2000] [--len-scale 8]
Prints one JSON line with both kernels' throughput and the speedup.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docix_spark.corpus import FIELDS, synth_corpus_pdf
from docix_spark.index.ngram import _trigram_frame, trigrams


def _python_reference(pdf: pd.DataFrame, fields) -> pd.DataFrame:
    """The r2 per-row kernel shape: itertuples + Python set per value."""
    rows = []
    for t in pdf.itertuples(index=False):
        d = getattr(t, "doc_id")
        for f in fields:
            for tg in trigrams(getattr(t, f)):
                rows.append((f, tg, d))
    return pd.DataFrame(rows, columns=["field", "tg", "doc_id"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--len-scale", type=int, default=8)
    args = ap.parse_args()

    pdf = synth_corpus_pdf(args.docs, seed=13, len_scale=args.len_scale)
    # pandas twin of corpus.with_doc_ids (doc_id + the two filename fields)
    pdf = pdf.assign(
        doc_id=[f"d{i}" for i in range(len(pdf))],
        file_name=pdf["path"],
        original_file_name=pdf["path"].str.rsplit("/", n=1).str[-1],
    )
    chars = int(sum(len(v or "") for f in FIELDS for v in pdf[f]))

    t0 = time.perf_counter()
    out_np = _trigram_frame(pdf, FIELDS)
    t_np = time.perf_counter() - t0

    t0 = time.perf_counter()
    out_py = _python_reference(pdf, FIELDS)
    t_py = time.perf_counter() - t0

    got = set(zip(out_np["field"], out_np["tg"], out_np["doc_id"]))
    want = set(zip(out_py["field"], out_py["tg"], out_py["doc_id"]))
    assert got == want, "kernels disagree"

    print(
        json.dumps(
            {
                "metric": "trigram_kernel_bench",
                "docs": args.docs,
                "len_scale": args.len_scale,
                "input_mchars": round(chars / 1e6, 2),
                "numpy_sec": round(t_np, 3),
                "python_sec": round(t_py, 3),
                "numpy_mchars_per_sec": round(chars / 1e6 / t_np, 2),
                "python_mchars_per_sec": round(chars / 1e6 / t_py, 2),
                "speedup": round(t_py / t_np, 2),
                "rows": int(len(out_np)),
            }
        )
    )


if __name__ == "__main__":
    main()
