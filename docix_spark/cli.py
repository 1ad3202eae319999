"""spark-submit entry points — M6 packaging (SURVEY.md §7.1).

Every subcommand is a self-contained job runnable either directly
(``python -m docix_spark.cli <cmd> ...``) or via spark-submit::

    zip -r /tmp/docix_spark.zip docix_spark
    spark-submit --py-files /tmp/docix_spark.zip \
        --master local[32] docix_spark/cli.py build \
        --input /root/testdata/sf0.1 --out /tmp/idx

Subcommands:

- ``gen``      — deterministic synthetic corpus (input_hint shape:
                 repo, path, commit, lang, content) → parquet.
- ``build``    — checkpointed, resumable index build (manifest + fragments
                 + finalized tables) over a corpus parquet dir or a driver
                 documents.parquet dir.
- ``resume``   — re-run only non-INDEXED partitions of a prior build.
- ``segments`` — compress postings into varint/block-max segments.
- ``trigrams`` — build the character-trigram wildcard index.
- ``search``   — composite BM25 query (best_fields/fuzzy/msm/wildcard).
- ``wand``     — segment-serving-path top-k for a bag of terms.
- ``autocomplete`` — bigram suggestions.
- ``metrics``  — per-partition build metrics (docs/sec, postings/sec,
                 bytes, lineage sha) + rollup status.
- ``bench-build`` — timed build for the two-cluster-size scaling evidence
                 (prints one JSON line; used by scripts/scaling_run.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _spark(args):
    from docix_spark.session import get_spark

    return get_spark("docix-cli", cores=args.cores,
                     shuffle_partitions=args.shuffle_partitions)


def _open_index(args):
    """Open the index with its persisted bucket count; an explicit
    --buckets overrides (a mismatched count silently prunes the wrong
    buckets and returns nothing)."""
    from docix_spark.index.build import Index

    if getattr(args, "buckets", None) is not None:
        return Index(root=args.out, n_buckets=args.buckets)
    return Index.open(args.out)


def _load_corpus(spark, path: str):
    """Accept either a corpus parquet dir (repo,path,commit,lang,content),
    a driver sf dir containing documents.parquet, or that file itself."""
    from docix_spark.corpus import CORPUS_COLUMNS, from_driver_documents

    if os.path.isdir(path) and os.path.exists(os.path.join(path, "documents.parquet")):
        return from_driver_documents(spark, path)
    df = spark.read.parquet(path)
    if set(CORPUS_COLUMNS) <= set(df.columns):
        return df.select(*CORPUS_COLUMNS)
    raise SystemExit(f"unrecognized corpus schema at {path}: {df.columns}")


def cmd_gen(args):
    from docix_spark.corpus import synth_corpus

    spark = _spark(args)
    df = synth_corpus(spark, args.docs, seed=args.seed, partitions=args.partitions,
                      len_scale=args.len_scale)
    df.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"cmd": "gen", "docs": args.docs, "out": args.out}))


def cmd_build(args):
    from pyspark.sql import functions as F

    from docix_spark.config import parse_size
    from docix_spark.index import checkpoint as cp

    spark = _spark(args)
    corpus = _load_corpus(spark, args.input)
    # size-based admission (F10; the reference's parseMaxFileSize gate,
    # BulkUploadService.java:222-244, applied before upload)
    max_bytes = parse_size(getattr(args, "max_doc_size", None))
    admitted = corpus.where(F.octet_length("content") <= max_bytes)
    n_rejected = corpus.count() - admitted.count()
    corpus = admitted
    t0 = time.perf_counter()
    build = cp.start_build(spark, corpus, args.out, n_parts=args.parts,
                           n_buckets=args.buckets)
    index = cp.finalize_index(spark, args.out)
    dt = time.perf_counter() - t0
    n = index.docs(spark).count()
    print(json.dumps({
        "cmd": "build", "build_id": build.build_id, "out": args.out,
        "status": cp.overall_status(spark, args.out), "docs": n,
        "rejected_oversize": n_rejected,
        "seconds": round(dt, 3), "docs_per_sec": round(n / dt, 2),
    }))


def cmd_resume(args):
    from docix_spark.index import checkpoint as cp

    spark = _spark(args)
    redone = cp.resume_build(spark, args.out)
    cp.finalize_index(spark, args.out)
    print(json.dumps({
        "cmd": "resume", "out": args.out, "partitions_reprocessed": redone,
        "status": cp.overall_status(spark, args.out),
    }))


def cmd_segments(args):
    from docix_spark.index.segments import build_segments

    spark = _spark(args)
    index = _open_index(args)
    t0 = time.perf_counter()
    seg = build_segments(spark, index, docs_per_shard=args.docs_per_shard)
    stats = seg.segments(spark).selectExpr(
        "count(*) AS n_segments", "sum(count) AS postings",
        "sum(length(doc_bytes) + length(tf_bytes) + length(dl_bytes)) AS bytes"
    ).collect()[0]
    print(json.dumps({
        "cmd": "segments", "out": args.out, "seconds": round(time.perf_counter() - t0, 3),
        "n_segments": stats.n_segments, "postings": int(stats.postings),
        "compressed_bytes": int(stats.bytes),
        "bytes_per_posting": round(stats.bytes / max(stats.postings, 1), 3),
    }))


def cmd_trigrams(args):
    from docix_spark.index.ngram import build_trigram_index

    spark = _spark(args)
    index = _open_index(args)
    t0 = time.perf_counter()
    build_trigram_index(spark, index)
    n = spark.read.parquet(index.path("trigram_postings")).count()
    print(json.dumps({
        "cmd": "trigrams", "out": args.out,
        "seconds": round(time.perf_counter() - t0, 3), "rows": n,
    }))


def cmd_search(args):
    from docix_spark.query.bm25 import search_topk

    spark = _spark(args)
    index = _open_index(args)
    t0 = time.perf_counter()
    rows = search_topk(spark, index, args.query, page=args.page, size=args.size).collect()
    dt = time.perf_counter() - t0
    out = [
        {"rank": r.rank, "doc_id": r.doc_id, "score": round(r.score, 6),
         "path": getattr(r, "path", None)}
        for r in rows
    ]
    print(json.dumps({"cmd": "search", "query": args.query,
                      "latency_sec": round(dt, 4), "results": out}))


def cmd_wand(args):
    from docix_spark.index.segments import SegmentIndex
    from docix_spark.query.wand import wand_topk

    spark = _spark(args)
    index = _open_index(args)
    seg = SegmentIndex.load(args.out)
    t0 = time.perf_counter()
    rows = wand_topk(spark, index, seg, args.terms, k=args.size).collect()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "cmd": "wand", "terms": args.terms, "latency_sec": round(dt, 4),
        "results": [{"doc_id": r.doc_id, "score": round(r.score, 6)} for r in rows],
    }))


def cmd_autocomplete(args):
    from docix_spark.query.service import autocomplete

    spark = _spark(args)
    index = _open_index(args)
    print(json.dumps({
        "cmd": "autocomplete", "query": args.query,
        "suggestions": autocomplete(spark, index, args.query, args.size),
    }))


def cmd_metrics(args):
    from docix_spark.index import checkpoint as cp

    spark = _spark(args)
    rows = cp.build_metrics(spark, args.out).orderBy("partition_id").collect()
    print(json.dumps({
        "cmd": "metrics", "status": cp.overall_status(spark, args.out),
        "progress": cp.indexing_progress(spark, args.out),
        "partitions": [r.asDict() for r in rows],
    }))


def cmd_pipeline(args):
    """Run any driver-registry operator (dedup, similarity, quality,
    decontamination, events, ...) against an sf-style data dir from the
    command line — the spark-submit entry for the training-data-pipeline
    surface (every op also has a DuckDB oracle in driver_queries.py)."""
    from docix_spark.driver_queries import REGISTRY

    if args.op == "list":
        print(json.dumps({"ops": sorted(REGISTRY)}))
        return
    if args.op not in REGISTRY:
        raise SystemExit(f"unknown op {args.op!r}; try 'pipeline list'")
    spark = _spark(args)
    t0 = time.perf_counter()
    df = REGISTRY[args.op].fn(spark, args.sf_dir)
    rows = df.limit(args.limit).collect()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "cmd": "pipeline", "op": args.op, "latency_sec": round(dt, 4),
        "columns": df.columns,
        "rows": [[str(v) for v in r] for r in rows],
    }))


def cmd_bench_build(args):
    """Timed fragment+finalize build over pre-generated input — the unit the
    two-cluster-size scaling rule measures. Session startup is excluded."""
    from docix_spark.index.build import build_index

    spark = _spark(args)
    corpus = _load_corpus(spark, args.input)
    corpus = corpus.repartition(args.partitions)
    n = corpus.count()
    # Real-path warmup over a tiny slice: parquet count() is metadata-only,
    # so without this the timed region absorbs one-time session costs —
    # Python worker forks (+ numpy/pandas imports), JVM JIT of the parquet
    # decode + Arrow channels, codegen. On a real cluster a 100 TB build
    # amortizes these to zero; at a 2-5-minute bench leg they are a visible
    # constant that distorts the N vs 4N comparison.
    from docix_spark.corpus import with_doc_ids
    from docix_spark.index.build import build_postings

    (
        build_postings(with_doc_ids(corpus.limit(256)))
        .write.format("noop").mode("overwrite").save()
    )
    t0 = time.perf_counter()
    build_index(spark, corpus, args.out, n_buckets=args.buckets)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "cmd": "bench-build", "cores": args.cores, "docs": n,
        "seconds": round(dt, 3), "docs_per_sec": round(n / dt, 2),
    }))


def main(argv=None):
    p = argparse.ArgumentParser(prog="docix_spark")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None, dest="shuffle_partitions")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("gen")
    sp.add_argument("--docs", type=int, default=10000)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--partitions", type=int, default=64)
    sp.add_argument("--len-scale", type=float, default=1.0, dest="len_scale")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_gen)

    for name, fn in [("build", cmd_build), ("resume", cmd_resume)]:
        sp = sub.add_parser(name)
        if name == "build":
            sp.add_argument("--input", required=True)
            sp.add_argument("--parts", type=int, default=32)
            sp.add_argument("--max-doc-size", default=None, dest="max_doc_size",
                            help="admission cap, e.g. 50MB/128KB/2GB (reference default 50MB)")
        sp.add_argument("--out", required=True)
        sp.add_argument("--buckets", type=int, default=64)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("segments")
    sp.add_argument("--out", required=True)
    sp.add_argument("--buckets", type=int, default=None,
                    help="override; default = the index's persisted count")
    sp.add_argument("--docs-per-shard", type=int, default=1 << 16, dest="docs_per_shard")
    sp.set_defaults(fn=cmd_segments)

    sp = sub.add_parser("trigrams")
    sp.add_argument("--out", required=True)
    sp.add_argument("--buckets", type=int, default=None)
    sp.set_defaults(fn=cmd_trigrams)

    sp = sub.add_parser("search")
    sp.add_argument("--out", required=True)
    sp.add_argument("--buckets", type=int, default=None,
                    help="override; default = the index's persisted count")
    sp.add_argument("--query", required=True)
    sp.add_argument("--page", type=int, default=0)
    sp.add_argument("--size", type=int, default=10)
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser("wand")
    sp.add_argument("--out", required=True)
    sp.add_argument("--buckets", type=int, default=None,
                    help="override; default = the index's persisted count")
    sp.add_argument("--terms", nargs="+", required=True)
    sp.add_argument("--size", type=int, default=10)
    sp.set_defaults(fn=cmd_wand)

    sp = sub.add_parser("autocomplete")
    sp.add_argument("--out", required=True)
    sp.add_argument("--buckets", type=int, default=None,
                    help="override; default = the index's persisted count")
    sp.add_argument("--query", required=True)
    sp.add_argument("--size", type=int, default=5)
    sp.set_defaults(fn=cmd_autocomplete)

    sp = sub.add_parser("metrics")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_metrics)

    sp = sub.add_parser("pipeline")
    sp.add_argument("op", help="registry op name, or 'list' to enumerate")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_pipeline)

    sp = sub.add_parser("bench-build")
    sp.add_argument("--input", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--partitions", type=int, default=64)
    sp.set_defaults(fn=cmd_bench_build)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
