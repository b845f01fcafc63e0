"""Mergeable-sketch semantics: accuracy vs exact, EXACT mergeability
(sketch(A) ⊕ sketch(B) == sketch(A ∪ B), the property that makes them
usable as persisted rollup columns), one-sided CMS error, and the
pre-shuffle prune in the KMV plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import sketches as sk


def _ints(spark, lo, hi, group="g"):
    """Deterministic distinct-int column tagged with one group."""
    return spark.range(lo, hi).select(
        F.lit(group).alias("g"), F.col("id").alias("v")
    )


# --------------------------------------------------------------------- HLL

def test_hll_accuracy_and_exact_merge(spark):
    # two overlapping halves: A = [0, 30k), B = [20k, 50k) → union 50k
    a = _ints(spark, 0, 30_000)
    b = _ints(spark, 20_000, 50_000)
    full = a.unionAll(b)

    p = 12
    sk_full = sk.hll_build(full, ["g"], "v", p=p)
    est = sk_full.select(sk.hll_estimate_expr(F.col("hll"), p).alias("e")).first()["e"]
    assert abs(est - 50_000) / 50_000 < 0.05  # p=12 → ~1.6% stderr

    # mergeability is EXACT: per-register max is associative, so the
    # merged register map equals the union's register map key for key
    sk_a = sk.hll_build(a, ["g"], "v", p=p)
    sk_b = sk.hll_build(b, ["g"], "v", p=p)
    merged_rows = sk.hll_merge(sk_a.unionAll(sk_b), ["g"])
    m_full = dict(sk_full.first()["hll"])
    m_merged = dict(merged_rows.first()["hll"])
    assert m_full == m_merged

    # pairwise expression merge agrees with the row merge
    pair = (
        sk_a.select(F.col("hll").alias("ha"))
        .crossJoin(sk_b.select(F.col("hll").alias("hb")))
        .select(sk.hll_merge_expr(F.col("ha"), F.col("hb")).alias("hll"))
    )
    assert dict(pair.first()["hll"]) == m_full


def test_hll_small_range_linear_counting(spark):
    # 40 distinct values in a 4096-register sketch → linear-counting
    # regime; the estimate should be near-exact there
    df = _ints(spark, 0, 40)
    s = sk.hll_build(df, ["g"], "v", p=12)
    est = s.select(sk.hll_estimate_expr(F.col("hll"), 12).alias("e")).first()["e"]
    assert abs(est - 40) <= 2


def test_hll_p_validation(spark):
    with pytest.raises(ValueError):
        sk.hll_build(_ints(spark, 0, 10), ["g"], "v", p=8)


# --------------------------------------------------------------------- KMV

def test_kmv_exact_merge_and_estimates(spark):
    a = _ints(spark, 0, 6_000)
    b = _ints(spark, 4_000, 10_000)  # |A∪B| = 10k, |A∩B| = 2k, J = 0.2
    k = 256

    kv_a = sk.kmv_build(a, ["g"], "v", k=k).select(F.col("kmv").alias("ka"))
    kv_b = sk.kmv_build(b, ["g"], "v", k=k).select(F.col("kmv").alias("kb"))
    kv_full = sk.kmv_build(a.unionAll(b), ["g"], "v", k=k)

    pair = kv_a.crossJoin(kv_b)
    merged = pair.select(sk.kmv_merge_expr(F.col("ka"), F.col("kb"), k).alias("kmv"))
    # merge == build-over-union, element for element
    assert merged.first()["kmv"] == kv_full.first()["kmv"]

    row = pair.select(
        sk.kmv_distinct_expr(sk.kmv_merge_expr(F.col("ka"), F.col("kb"), k), k).alias("u"),
        sk.kmv_jaccard_expr(F.col("ka"), F.col("kb"), k).alias("j"),
        sk.kmv_intersect_expr(F.col("ka"), F.col("kb"), k).alias("i"),
    ).first()
    assert abs(row["u"] - 10_000) / 10_000 < 0.20   # ~1/sqrt(k) ≈ 6% stderr
    assert abs(row["j"] - 0.2) < 0.10
    assert abs(row["i"] - 2_000) / 2_000 < 0.45


def test_kmv_exact_below_k(spark):
    # fewer distinct values than k: the sketch IS the distinct set
    df = _ints(spark, 0, 37)
    s = sk.kmv_build(df.unionAll(df), ["g"], "v", k=256)  # dups collapse
    row = s.select(
        F.size("kmv").alias("n"),
        sk.kmv_distinct_expr(F.col("kmv"), 256).alias("e"),
    ).first()
    assert row["n"] == 37 and row["e"] == 37.0


def test_kmv_plan_has_pre_shuffle_prune(spark):
    # the group column must be non-constant or Catalyst folds the window's
    # partition key away entirely (degenerating to a global top-k)
    df = spark.range(0, 1_000).select(
        (F.col("id") % 7).cast("string").alias("g"), F.col("id").alias("v")
    )
    plan = sk.kmv_build(df, ["g"], "v", k=16)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# --------------------------------------------------------------------- CMS

def _tokens(spark):
    # zipf-ish: token t_i occurs (50 - i) times, i in [0, 50)
    rows = [(f"t{i:02d}",) for i in range(50) for _ in range(50 - i)]
    return spark.createDataFrame(rows, "tok string").withColumn("g", F.lit("g"))


def test_cms_one_sided_error_and_merge(spark):
    width, depth = 512, 4
    df = _tokens(spark)
    exact = {r["tok"]: r["n"] for r in df.groupBy("tok").agg(F.count("*").alias("n")).collect()}
    n_total = sum(exact.values())

    cms = sk.cms_build(df, ["g"], "tok", width=width, depth=depth)
    probes = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {
        r["tok"]: r["e"]
        for r in probes.crossJoin(cms).select(
            "tok", sk.cms_count_expr(F.col("cms"), F.col("tok"), width, depth).alias("e")
        ).collect()
    }
    for t, n in exact.items():
        assert est[t] >= n, f"CMS undercounted {t}"          # never undercounts
        assert est[t] <= n + (2.0 * n_total) / width + 1     # CM bound

    # merge exactness: counts add, so halves ⊕ == full
    h1 = df.filter(F.xxhash64("tok", F.lit(99)) % 2 == 0)
    h2 = df.filter(F.xxhash64("tok", F.lit(99)) % 2 != 0)
    c1 = sk.cms_build(h1, ["g"], "tok", width=width, depth=depth)
    c2 = sk.cms_build(h2, ["g"], "tok", width=width, depth=depth)
    merged = sk.cms_merge(c1.unionAll(c2), ["g"])
    assert dict(merged.first()["cms"]) == dict(cms.first()["cms"])

    # pairwise expression merge agrees
    pair = (
        c1.select(F.col("cms").alias("ca"))
        .crossJoin(c2.select(F.col("cms").alias("cb")))
        .select(sk.cms_merge_expr(F.col("ca"), F.col("cb")).alias("cms"))
    )
    assert dict(pair.first()["cms"]) == dict(cms.first()["cms"])


def test_cms_probe_is_projection_not_shuffle(spark):
    # probing tokens against a built sketch must not add an exchange
    # beyond the broadcast of the one-row sketch
    # localCheckpoint severs the BUILD's exchanges from the probe plan —
    # the assertion is about the probe, which must stay a projection
    cms = sk.cms_build(_tokens(spark), ["g"], "tok", width=64, depth=2).localCheckpoint()
    probes = spark.range(5).select(F.concat(F.lit("t0"), F.col("id")).alias("tok"))
    out = probes.crossJoin(F.broadcast(cms.drop("g"))).select(
        "tok", sk.cms_count_expr(F.col("cms"), F.col("tok"), 64, 2).alias("e")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


# -------------------------------------------------------- DDSketch histogram

def test_hist_quantiles_relative_error(spark):
    # heavy-tailed deterministic values: v = (i % 997 + 1)^2, n = 20k
    df = spark.range(20_000).select(
        F.lit("g").alias("g"),
        ((F.col("id") % 997 + 1) * (F.col("id") % 997 + 1)).cast("double").alias("v"),
    )
    alpha = 0.01
    s = sk.hist_build(df, ["g"], "v", alpha=alpha)
    exact = df.stat.approxQuantile("v", [0.1, 0.5, 0.9, 0.99], 0.0)  # 0.0 = exact
    row = s.select(
        *[
            sk.hist_quantile_expr(F.col("hist"), q, alpha).alias(f"q{int(q*100)}")
            for q in (0.1, 0.5, 0.9, 0.99)
        ],
        sk.hist_count_expr(F.col("hist")).alias("n"),
    ).first()
    assert row["n"] == 20_000
    for got, want in zip((row["q10"], row["q50"], row["q90"], row["q99"]), exact):
        assert abs(got - want) / want <= alpha * 1.5, (got, want)


def test_hist_merge_exact_and_zero_bin(spark):
    a = spark.range(0, 500).select(F.lit("g").alias("g"), (F.col("id") % 50).cast("double").alias("v"))
    b = spark.range(500, 1_000).select(F.lit("g").alias("g"), (F.col("id") % 50).cast("double").alias("v"))
    full = sk.hist_build(a.unionAll(b), ["g"], "v")
    halves = sk.hist_merge(
        sk.hist_build(a, ["g"], "v").unionAll(sk.hist_build(b, ["g"], "v")), ["g"]
    )
    assert dict(full.first()["hist"]) == dict(halves.first()["hist"])

    # zeros (v = id % 50 == 0 rows) live in the reserved bin; q near the
    # zero mass returns exactly 0.0
    z = full.select(sk.hist_quantile_expr(F.col("hist"), 0.01).alias("q")).first()["q"]
    assert z == 0.0


def test_hist_rejects_negatives(spark):
    df = spark.range(3).select(F.lit("g").alias("g"), (F.col("id") - 1).cast("double").alias("v"))
    with pytest.raises(Exception, match="negative"):
        sk.hist_build(df, ["g"], "v").collect()


# ------------------------------------------------------------- group fanout

def test_sketches_per_group(spark):
    # three groups with known distinct counts; one build, three sketches
    df = (
        spark.range(0, 9_000)
        .select(
            F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("g"),
            (F.col("id") / 3).cast("long").alias("v"),  # 3k distinct per group
        )
    )
    s = sk.hll_build(df, ["g"], "v", p=12)
    rows = {
        r["g"]: r["e"]
        for r in s.select("g", sk.hll_estimate_expr(F.col("hll"), 12).alias("e")).collect()
    }
    assert set(rows) == {"g0", "g1", "g2"}
    for g, e in rows.items():
        assert abs(e - 3_000) / 3_000 < 0.06, (g, e)


def test_null_values_skipped_everywhere(spark):
    """Nulls follow COUNT(DISTINCT)/count(col) semantics: skipped, never
    a phantom distinct value or a null map key."""
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", None), ("g", None)],
        "g string, v double",
    )
    h = sk.hll_build(df, ["g"], "v", p=12)
    est = h.select(sk.hll_estimate_expr(F.col("hll"), 12).alias("e")).first()["e"]
    assert round(est) == 2

    kv = sk.kmv_build(df, ["g"], "v", k=8).first()["kmv"]
    assert len(kv) == 2

    cms = sk.cms_build(df, ["g"], "v", width=64, depth=2)
    total = cms.select(
        F.aggregate(F.map_values("cms"), F.lit(0).cast("long"), lambda a, x: a + x).alias("t")
    ).first()["t"]
    assert total == 2 * 2  # 2 non-null rows x depth

    hist = sk.hist_build(df, ["g"], "v")
    assert hist.select(sk.hist_count_expr(F.col("hist")).alias("n")).first()["n"] == 2
