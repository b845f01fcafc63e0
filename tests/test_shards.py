"""Shard-export sink semantics: deterministic geometry, one file per
shard, exact resume across both crash windows (mid-data and
after-data-before-manifest), and checksum-backed verification."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.sources import shards as sh


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path / "shards")


def _docs(spark, n=103):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 17 + 1).cast("long").alias("n_tokens"),
    )


def test_plan_geometry_and_determinism(spark):
    df = _docs(spark, 103)
    p = sh.plan_shards(df, "doc_id", "doc_id", rows_per_shard=25)
    sizes = {r["shard_id"]: r["n"] for r in p.groupBy("shard_id").count().withColumnRenamed("count", "n").collect()}
    assert sizes == {0: 25, 1: 25, 2: 25, 3: 25, 4: 3}
    # shard_pos is a 0..size-1 sequence inside each shard
    chk = p.groupBy("shard_id").agg(
        F.min("shard_pos").alias("lo"), F.max("shard_pos").alias("hi"), F.count("*").alias("n")
    )
    for r in chk.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
    # determinism: a second plan assigns identical shards
    p2 = sh.plan_shards(df, "doc_id", "doc_id", rows_per_shard=25)
    assert p.select("doc_id", "shard_id", "shard_pos").exceptAll(
        p2.select("doc_id", "shard_id", "shard_pos")
    ).isEmpty()


def test_export_one_file_per_shard_and_roundtrip(spark, tmp_root):
    df = _docs(spark, 103)
    summary = sh.export_shards(
        df, tmp_root, "doc_id", "doc_id", rows_per_shard=25, token_col="n_tokens"
    )
    assert summary["shards_written"] == 5 and summary["total_shards"] == 5
    assert summary["total_rows"] == 103
    assert summary["total_tokens"] == df.agg(F.sum("n_tokens")).first()[0]

    for d in glob.glob(os.path.join(tmp_root, "data", "shard_id=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d  # the loader contract: one file per shard

    back = sh.read_shards(spark, tmp_root)
    assert back.count() == 103
    assert back.select("doc_id").exceptAll(df.select("doc_id")).isEmpty()
    ok = sh.verify_shards(spark, tmp_root, token_col="n_tokens")
    assert ok.filter(~F.col("ok")).isEmpty()


def test_rerun_is_noop(spark, tmp_root):
    df = _docs(spark, 50)
    sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    before = sorted(glob.glob(os.path.join(tmp_root, "data", "*", "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in before}
    s2 = sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    assert s2["shards_written"] == 0 and s2["shards_committed"] == 0
    after = sorted(glob.glob(os.path.join(tmp_root, "data", "*", "*.parquet")))
    assert before == after
    assert all(os.path.getmtime(f) == mtimes[f] for f in after)  # untouched


def test_resume_after_partial_data_crash(spark, tmp_root):
    """Crash window 1: some shards' data committed, manifest missing
    entirely. Re-run must commit the written shards WITHOUT rewriting
    them and write only the missing ones."""
    df = _docs(spark, 60)
    sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    # simulate the crash: remove one shard's data AND the whole manifest
    shutil.rmtree(os.path.join(tmp_root, "data", "shard_id=2"))
    shutil.rmtree(os.path.join(tmp_root, "_shard_manifest"))
    survivors = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(tmp_root, "data", "*", "*.parquet"))
    }

    s = sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    # only the missing shard is rewritten; the two on disk are complete
    # (job-commit atomicity) and recommitted from their existing files
    assert s["shards_written"] == 1 and s["shards_reused"] == 2
    assert s["shards_committed"] == 3
    assert s["total_shards"] == 3 and s["total_rows"] == 60
    ok = sh.verify_shards(spark, tmp_root)
    assert ok.count() == 3 and ok.filter(~F.col("ok")).isEmpty()
    assert sh.read_shards(spark, tmp_root).count() == 60
    # survivors were never rewritten
    assert all(os.path.getmtime(f) == m for f, m in survivors.items())


def test_resume_after_manifest_gap(spark, tmp_root):
    """Crash window 2: all data on disk, manifest missing some shards.
    Re-run commits the gap from the written files without any rewrite."""
    df = _docs(spark, 60)
    sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    # simulate: drop one manifest row by rewriting the manifest without it
    man = spark.read.parquet(os.path.join(tmp_root, "_shard_manifest"))
    kept = man.filter(F.col("shard_id") != 1).collect()
    shutil.rmtree(os.path.join(tmp_root, "_shard_manifest"))
    spark.createDataFrame(kept, man.schema).write.parquet(
        os.path.join(tmp_root, "_shard_manifest")
    )
    data_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(tmp_root, "data", "*", "*.parquet"))
    }

    s = sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    # shard 1's data is already on disk: NO rewrite at all, only the
    # manifest gap is committed from the existing file
    assert s["shards_written"] == 0 and s["shards_reused"] == 1
    assert s["shards_committed"] == 1
    assert s["total_shards"] == 3
    ok = sh.verify_shards(spark, tmp_root)
    assert ok.count() == 3 and ok.filter(~F.col("ok")).isEmpty()
    # NOTHING was rewritten, shard 1 included
    assert all(os.path.getmtime(f) == data_files[f] for f in data_files)


def test_verify_catches_corruption(spark, tmp_root):
    df = _docs(spark, 40)
    sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    # corrupt shard 1: replace its file with a different rowset
    target_dir = os.path.join(tmp_root, "data", "shard_id=1")
    for f in os.listdir(target_dir):
        os.remove(os.path.join(target_dir, f))
    spark.createDataFrame(
        [(999, "tampered", 1, 0)], "doc_id long, text string, n_tokens long, shard_pos int"
    ).write.mode("append").parquet(target_dir)

    ok = sh.verify_shards(spark, tmp_root)
    bad = {r["shard_id"] for r in ok.filter(~F.col("ok")).collect()}
    assert bad == {1}


def test_empty_input(spark, tmp_root):
    empty = _docs(spark, 5).filter(F.col("doc_id") < 0)
    s = sh.export_shards(empty, tmp_root, "doc_id", "doc_id", rows_per_shard=10)
    assert s["total_shards"] == 0 and not os.path.isdir(os.path.join(tmp_root, "data"))


def test_geometry_mismatch_refused(spark, tmp_root):
    df = _docs(spark, 40)
    sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    with pytest.raises(ValueError, match="geometry mismatch"):
        sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=10)
    with pytest.raises(ValueError, match="geometry mismatch"):
        sh.export_shards(df, tmp_root, "n_tokens", "doc_id", rows_per_shard=20)


def test_corrupt_manifest_raises_not_recommits(spark, tmp_root):
    df = _docs(spark, 40)
    sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    # corrupt one manifest part file: the export must FAIL, not treat the
    # manifest as absent and append duplicate rows
    part = glob.glob(os.path.join(tmp_root, "_shard_manifest", "*.parquet"))[0]
    with open(part, "wb") as fh:
        fh.write(b"not parquet at all")
    with pytest.raises(Exception):
        sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)


def test_empty_rerun_against_manifestless_data(spark, tmp_root):
    """Degenerate resume: data on disk, no manifest, and an EMPTY input —
    nothing to plan, nothing to commit, and no crash."""
    df = _docs(spark, 20)
    sh.export_shards(df, tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    shutil.rmtree(os.path.join(tmp_root, "_shard_manifest"))
    s = sh.export_shards(
        df.filter(F.col("doc_id") < 0), tmp_root, "doc_id", "doc_id", rows_per_shard=20
    )
    assert s["shards_written"] == 0 and s["total_shards"] == 0


def test_grown_input_refused_not_dropped(spark, tmp_root):
    """A re-run with MORE rows must fail loudly: new rows whose rank maps
    into an already-committed shard (here the partial last shard) can
    never be appended — committed shards are immutable."""
    sh.export_shards(_docs(spark, 50), tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    with pytest.raises(ValueError, match="changed row set"):
        sh.export_shards(_docs(spark, 60), tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    # and nothing was lost or half-written by the refused run
    ok = sh.verify_shards(spark, tmp_root)
    assert ok.filter(~F.col("ok")).isEmpty()
    assert sh.read_shards(spark, tmp_root).count() == 50


def test_shrunk_input_refused(spark, tmp_root):
    sh.export_shards(_docs(spark, 50), tmp_root, "doc_id", "doc_id", rows_per_shard=20)
    with pytest.raises(ValueError, match="changed row set"):
        sh.export_shards(_docs(spark, 30), tmp_root, "doc_id", "doc_id", rows_per_shard=20)
