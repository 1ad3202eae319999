#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8 from N
to 4N executors).

No real cluster exists in this sandbox, so per driver instruction the same
job runs at two parallelism levels — local[8] (N) and local[32] (4N) — over
the SAME pre-generated input, and we report throughput at both plus
scaling efficiency:

    speedup    = t_N / t_4N
    efficiency = speedup / 4

Each level runs in its own subprocess (its own JVM/SparkSession) via
``docix_spark.cli bench-build``, which warms workers and times only the
index-build job (session startup excluded — on a real cluster that cost is
amortized over the whole run). The input corpus has the input_hint shape
(repo, path, commit, lang, content) and is generated deterministically and
parallelism-independently (docix_spark.corpus.synth_corpus).

Prints ONE JSON line; optionally appends a markdown row to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def run_level(cores: int, input_path: str, partitions: int, trials: int = 2) -> dict:
    """Best-of-N trials (min seconds) — classic defense against background
    interference on a shared box; each trial is a fresh JVM."""
    best = None
    for _ in range(trials):
        out = tempfile.mkdtemp(prefix=f"docix_scale_{cores}_")
        try:
            cmd = [
                sys.executable, "-m", "docix_spark.cli", "--cores", str(cores),
                "--shuffle-partitions", str(max(cores * 2, 16)),
                "bench-build", "--input", input_path, "--out", out,
                "--partitions", str(partitions),
            ]
            res = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            if res.returncode != 0:
                raise RuntimeError(f"bench-build@{cores} failed: {res.stderr[-2000:]}")
            line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            if best is None or r["seconds"] < best["seconds"]:
                best = r
        finally:
            shutil.rmtree(out, ignore_errors=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=int(os.environ.get("DOCIX_SCALING_DOCS", "30000")))
    ap.add_argument("--len-scale", type=float, default=float(os.environ.get("DOCIX_SCALING_LEN", "8")), dest="len_scale")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--n-cores", type=int, default=8)
    ap.add_argument("--xn-cores", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--input", default=None, help="pre-generated corpus parquet (default: synth)")
    ap.add_argument("--bench-md", default=None, help="append a row to this markdown file")
    args = ap.parse_args()

    tmp_in = None
    input_path = args.input
    if input_path is None:
        tmp_in = tempfile.mkdtemp(prefix="docix_scale_corpus_")
        input_path = os.path.join(tmp_in, "corpus")
        gen = subprocess.run(
            [sys.executable, "-m", "docix_spark.cli", "--cores", "32", "gen",
             "--docs", str(args.docs), "--partitions", str(args.partitions),
             "--len-scale", str(args.len_scale), "--out", input_path],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if gen.returncode != 0:
            raise RuntimeError(f"corpus gen failed: {gen.stderr[-2000:]}")

    try:
        lo = run_level(args.n_cores, input_path, args.partitions, trials=args.trials)
        hi = run_level(args.xn_cores, input_path, args.partitions, trials=args.trials)
    finally:
        if tmp_in:
            shutil.rmtree(tmp_in, ignore_errors=True)

    factor = args.xn_cores / args.n_cores
    speedup = lo["seconds"] / hi["seconds"]
    efficiency = speedup / factor
    out = {
        "metric": "index_build_scaling",
        "docs": lo["docs"],
        "n_cores": args.n_cores,
        "xn_cores": args.xn_cores,
        f"docs_per_sec_local{args.n_cores}": lo["docs_per_sec"],
        f"docs_per_sec_local{args.xn_cores}": hi["docs_per_sec"],
        f"seconds_local{args.n_cores}": lo["seconds"],
        f"seconds_local{args.xn_cores}": hi["seconds"],
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "meets_0.8": efficiency >= 0.8,
    }
    print(json.dumps(out))

    if args.bench_md:
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        row = (
            f"| {stamp} | {lo['docs']} | local[{args.n_cores}]: {lo['docs_per_sec']} docs/s "
            f"({lo['seconds']}s) | local[{args.xn_cores}]: {hi['docs_per_sec']} docs/s "
            f"({hi['seconds']}s) | {out['speedup']}× | **{out['efficiency']}** |\n"
        )
        with open(args.bench_md, "a") as fh:
            fh.write(row)


if __name__ == "__main__":
    main()
