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


def run_once(cores: int, input_path: str, partitions: int, pin: bool = False,
             pin_base: int = 8) -> dict:
    """One timed bench-build trial in a fresh JVM.

    ``pin=True`` caps the whole process tree (JVM + Python workers) to
    exactly ``cores`` physical cores via ``taskset`` — the cgroup cpu limit
    a cluster manager (YARN container / K8s pod) enforces per executor.
    Plain ``local[N]`` bounds only TASK slots: GC, parquet/shuffle IO
    threads and the pipelined Python worker still run on extra cores, a
    constant-size helper pool that inflates the small-N leg
    disproportionately (measured: local[1] unpinned = 92-100 docs/s vs 79.7
    pinned to one core — ~1.25 cores of real hardware). Pinned legs are the
    faithful N-executor stand-in. ``pin_base`` skips cpu0-7 (IRQ-heavy)."""
    out = tempfile.mkdtemp(prefix=f"docix_scale_{cores}_")
    try:
        cmd = []
        if pin:
            cmd = ["taskset", "-c", f"{pin_base}-{pin_base + cores - 1}"
                   if cores > 1 else str(pin_base)]
        cmd += [
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
        return json.loads(line)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def run_levels(n_cores: int, xn_cores: int, input_path: str, partitions: int,
               trials: int = 2, pin: bool = False) -> tuple[dict, dict]:
    """Best-of-N per level with trials INTERLEAVED across levels
    (lo, hi, lo, hi, ...): the sandbox VM's multi-core/IO ceiling drifts on
    an hour scale (measured 4-core 396 -> 220 -> 276 docs/s for identical
    code), so consecutive same-level trials would let one level sample a
    different box than the other. Interleaving keeps each comparison pair
    minutes apart; best-of-N then rejects background interference."""
    best = {n_cores: None, xn_cores: None}
    pairs = []
    for _ in range(trials):
        pair = {}
        for cores in (n_cores, xn_cores):
            r = run_once(cores, input_path, partitions, pin=pin)
            pair[cores] = r
            if best[cores] is None or r["seconds"] < best[cores]["seconds"]:
                best[cores] = r
            print(json.dumps({"trial": True, "cores": cores, **{k: r[k] for k in ("seconds", "docs_per_sec")}}), file=sys.stderr)
        pairs.append(pair)
    return best[n_cores], best[xn_cores], pairs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=int(os.environ.get("DOCIX_SCALING_DOCS", "30000")))
    ap.add_argument("--len-scale", type=float, default=float(os.environ.get("DOCIX_SCALING_LEN", "8")), dest="len_scale")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--n-cores", type=int, default=8)
    ap.add_argument("--xn-cores", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--input", default=None, help="pre-generated corpus parquet (default: synth)")
    ap.add_argument("--pin", action="store_true",
                    help="cap each level at exactly N physical cores via taskset "
                         "(the cluster manager's per-executor cpu limit; see run_once)")
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
        lo, hi, pairs = run_levels(
            args.n_cores, args.xn_cores, input_path, args.partitions,
            trials=args.trials, pin=args.pin,
        )
    finally:
        if tmp_in:
            shutil.rmtree(tmp_in, ignore_errors=True)

    factor = args.xn_cores / args.n_cores
    speedup = lo["seconds"] / hi["seconds"]
    efficiency = speedup / factor
    # Per-pair efficiencies + median: each interleaved pair samples the same
    # box-minutes, so the median of pairs is robust to hour-scale drift.
    # Best-of-leg is biased DOWN under drift (it pairs the fastest small-N
    # trial — the gate's denominator — with a fastest large-N trial from a
    # possibly different box state); both views are reported.
    pair_eff = sorted(
        round(p[args.n_cores]["seconds"] / p[args.xn_cores]["seconds"] / factor, 3)
        for p in pairs
    )
    median_eff = pair_eff[len(pair_eff) // 2] if len(pair_eff) % 2 else round(
        (pair_eff[len(pair_eff) // 2 - 1] + pair_eff[len(pair_eff) // 2]) / 2, 3
    )
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
        "pair_efficiencies": pair_eff,
        "median_pair_efficiency": median_eff,
        # gate on ONE pre-declared statistic — best-of-N per level, the
        # definition rounds 1-2 used (ADVICE r3 #3: max() over two summary
        # statistics let whichever was favorable decide); the median pair
        # efficiency stays reported above as context, never as the gate
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
