"""Monthly-crawl increment plan (plans/crawl_increment): cross-month
dedup, per-batch shard delivery, rollup stats, and replay convergence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.plans.crawl_increment import MonthlyCrawl

KW = dict(
    min_quality=0.0,
    allowed_langs=("en", "de", "es", "fr"),
    neardup_threshold=0.6,
    dup_frac_max=0.95,
    ppl_keep_buckets=(1, 2, 3),
    seq_len=32,
    rows_per_shard=8,
    seed=3,
)


def _month(spark, base_id, n=14, dup_of=None):
    """n distinct docs; optionally append near-copies of earlier texts."""
    rows = []
    for i in range(n):
        t = " ".join(
            f"the m{base_id}w{i}a{j} and m{base_id}w{i}b{j} of it" for j in range(12)
        )
        rows.append((base_id + i, t))
    for k, (did, text) in enumerate(dup_of or []):
        rows.append((base_id + n + k, "zz " + text))  # near-dup of `text`
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def state(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl"))
    mc = MonthlyCrawl(spark, root, threshold=0.6)
    m1 = _month(spark, 0)
    r1 = mc.ingest_month(m1, batch_id=1, **KW)
    m1_rows = [(r["doc_id"], r["text"]) for r in m1.collect()]
    # month 2: fresh docs + near-copies of two month-1 docs + an
    # internal near-pair (both copies of one fresh text)
    m2 = _month(spark, 1000, dup_of=[m1_rows[0], m1_rows[1]])
    r2 = mc.ingest_month(m2, batch_id=2, **KW)
    return {"mc": mc, "m1": m1, "m2": m2, "r1": r1, "r2": r2, "root": root}


def test_cross_month_dedup(state):
    # month 1: nothing to collide with
    assert state["r1"]["survivors"] == 14
    # month 2: the two near-copies of month-1 docs are gone, cross-month
    assert state["r2"]["survivors"] == 14


def test_shards_written_per_batch(state, spark):
    from pdf_parser_spark.sources.shards import verify_shards

    for batch in (1, 2):
        root = state["mc"]._shard_root(batch)
        v = verify_shards(spark, root, token_col="n_tokens")
        assert v.filter(~F.col("ok")).count() == 0
    assert state["r1"]["shards"]["total_rows"] > 0
    assert state["r2"]["shards"]["shards_written"] > 0


def test_rollup_accumulates(state):
    rep = state["mc"].report().collect()
    assert len(rep) == 1 and rep[0]["lang_pred"] == "en"
    assert rep[0]["n_batches"] == 2
    assert rep[0]["n_docs"] == 28  # kept docs of both months


def test_full_replay_is_a_noop(state):
    """Re-ingesting a committed month redoes no work and changes nothing."""
    before = state["mc"].report().collect()
    r = state["mc"].ingest_month(state["m1"], batch_id=1, **KW)
    assert r["survivors"] == 14                 # same decisions (CDC recovery)
    assert r["shards"]["shards_written"] == 0   # no shard rewritten
    assert r["shards"]["shards_committed"] == 0
    assert state["mc"].report().collect() == before  # rollup unchanged


def test_crash_between_index_and_delivery_converges(spark, tmp_path):
    """Kill after the index commit, before shards/rollup: the replay
    recovers the ORIGINAL survivor decisions from the index commit (not
    a re-dedup against the updated index, which would flag everything)."""
    mc = MonthlyCrawl(spark, str(tmp_path / "c2"), threshold=0.6)
    m1 = _month(spark, 0, n=6)
    # simulate the crash window: only the index leg ran
    decisions = mc.index.dedup_batch(m1, 1)
    n_surv = decisions.filter(~F.col("is_dup")).count()
    assert n_surv == 6
    # replay the full ingest — index leg no-ops, survivors recovered
    r = mc.ingest_month(m1, batch_id=1, **KW)
    assert r["survivors"] == n_surv
    assert r["shards"]["total_rows"] > 0
    assert {x["stage"]: x["n"] for x in r["funnel"].collect()}["input"] == 6
