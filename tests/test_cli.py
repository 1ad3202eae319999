"""CLI surface end-to-end: gen → build (with size admission) → segments →
search → wand → autocomplete → metrics, each emitting its JSON line —
the spark-submit entry points a reference user would drive."""

from __future__ import annotations

import json

import pytest

from docix_spark import cli


def _run(capsys, argv: list[str]) -> dict:
    cli.main(argv)
    out = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    return json.loads(out[-1])


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_root):
    from docix_spark.corpus import synth_corpus_pdf

    p = f"{tmp_root}/cli_corpus"
    spark.createDataFrame(synth_corpus_pdf(80, seed=33)).coalesce(2).write.mode(
        "overwrite"
    ).parquet(p)
    return p


def test_cli_pipeline(spark, capsys, corpus_dir, tmp_root):
    out_dir = f"{tmp_root}/cli_idx"

    r = _run(capsys, ["--cores", "4", "build", "--input", corpus_dir,
                      "--out", out_dir, "--parts", "8", "--buckets", "8"])
    assert r["status"] == "FULLY_INDEXED" and r["docs"] > 0
    assert r["rejected_oversize"] == 0

    r = _run(capsys, ["--cores", "4", "segments", "--out", out_dir, "--buckets", "8"])
    assert r["n_segments"] > 0 and r["bytes_per_posting"] < 8

    r = _run(capsys, ["--cores", "4", "search", "--out", out_dir,
                      "--query", "permission software", "--size", "5"])
    assert len(r["results"]) == 5
    assert r["results"][0]["rank"] == 1

    r = _run(capsys, ["--cores", "4", "wand", "--out", out_dir,
                      "--terms", "permission", "software"])
    assert len(r["results"]) > 0

    r = _run(capsys, ["--cores", "4", "autocomplete", "--out", out_dir,
                      "--query", "permission"])
    assert isinstance(r["suggestions"], list) and r["suggestions"]

    r = _run(capsys, ["--cores", "4", "metrics", "--out", out_dir])
    assert r["status"] == "FULLY_INDEXED" and len(r["partitions"]) == 8

    r = _run(capsys, ["pipeline", "list"])
    assert "dedup_connected_components" in r["ops"]
    assert "decontamination_ngram_overlap" in r["ops"]

    r = _run(capsys, ["--cores", "4", "pipeline", "dedup_exact",
                      "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"])
    assert r["op"] == "dedup_exact" and r["columns"]


def test_cli_build_size_admission(spark, capsys, corpus_dir, tmp_root):
    r = _run(capsys, ["--cores", "4", "build", "--input", corpus_dir,
                      "--out", f"{tmp_root}/cli_idx_gate", "--parts", "4",
                      "--buckets", "8", "--max-doc-size", "1KB"])
    assert r["rejected_oversize"] > 0
    assert r["docs"] + r["rejected_oversize"] == 80


def test_cli_trigrams(spark, capsys, corpus_dir, tmp_root):
    out_dir = f"{tmp_root}/cli_idx"  # built by test_cli_pipeline
    r = _run(capsys, ["--cores", "4", "trigrams", "--out", out_dir])
    assert r["rows"] > 0
