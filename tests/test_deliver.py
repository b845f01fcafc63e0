"""deliver_training_data: docs → shards end to end — pack tiling, token
conservation, shard verification, and crash-resume byte identity."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from pdf_parser_spark.plans.deliver import deliver_training_data
from pdf_parser_spark.sources import shards as sh


def _corpus(spark, n=60):
    rows = [
        (
            i,
            "en",
            " ".join(f"the w{i}a{j} and w{i}b{j} of w{i}c{j}" for j in range(12)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _run(spark, tmp_path, sub="s"):
    return deliver_training_data(
        _corpus(spark),
        str(tmp_path / sub),
        seq_len=64,
        rows_per_shard=8,
        min_quality=0.0,
        allowed_langs=("en",),
        neardup_threshold=0.6,
        dup_frac_max=0.95,
        ppl_keep_buckets=(1, 2, 3),
        seed=3,
    )


def test_end_to_end_packs_and_shards(spark, tmp_path):
    out = _run(spark, tmp_path)
    packs = out["packs"]
    n_packs = packs.count()
    assert n_packs > 1

    # every pack except the last is exactly seq_len tokens, and the
    # reassembled text token count matches the recorded n_tokens
    rows = packs.withColumn(
        "n_text", F.size(F.split("pack_text", " "))
    ).collect()
    by_id = sorted(rows, key=lambda r: r["pack_id"])
    for r in by_id[:-1]:
        assert r["n_tokens"] == 64, r["pack_id"]
        assert r["n_text"] == 64
    assert by_id[-1]["n_tokens"] <= 64

    # shards on disk verify, and totals match the pack table
    summary = out["shards"]
    assert summary["total_rows"] == n_packs
    root = str(tmp_path / "s")
    ok = sh.verify_shards(spark, root, token_col="n_tokens")
    assert ok.filter(~F.col("ok")).isEmpty()

    # token conservation: shard tokens == sum of pack tokens
    total_tokens = packs.agg(F.sum("n_tokens")).first()[0]
    assert summary["total_tokens"] == total_tokens


def test_rerun_resume_is_byte_identical(spark, tmp_path):
    out1 = _run(spark, tmp_path, "r")
    root = str(tmp_path / "r")
    import hashlib

    def digest():
        # content identity via the manifest checksums (raw parquet bytes
        # embed writer metadata and are not byte-stable across jobs)
        h = hashlib.sha256()
        man = spark.read.parquet(os.path.join(root, "_shard_manifest"))
        for r in sorted(man.collect(), key=lambda r: r["shard_id"]):
            h.update(str((r["shard_id"], r["n_rows"], str(r["checksum"]))).encode())
        return h.hexdigest()

    d1 = digest()
    # crash: lose one shard + manifest, re-deliver
    victim = sorted(glob.glob(os.path.join(root, "data", "shard_id=*")))[0]
    import shutil

    shutil.rmtree(victim)
    shutil.rmtree(os.path.join(root, "_shard_manifest"))
    out2 = _run(spark, tmp_path, "r")
    assert digest() == d1  # deterministic pipeline → identical commit
    ok = sh.verify_shards(spark, root, token_col="n_tokens")
    assert ok.filter(~F.col("ok")).isEmpty()
    del out1, out2
