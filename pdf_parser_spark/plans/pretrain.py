"""End-to-end pretraining-data pipeline: crawl documents → training chunks.

Extends plans/curation.py's filter/dedup chain with the remaining stages a
100 TB web corpus goes through before it feeds a trainer — each one is an
operator this package ships and tests individually:

    documents → host-boilerplate strip [opt]            (boilerplate, r42)
              → Gopher shape rules [opt]                (textstats, r36)
              → quality gate + language filter          (curation)
              → exact dedup → MinHash near-dup removal  (curation)
              → trained-classifier quality gate [opt]   (quality_train, r22)
              → duplicate-passage gate                  (dedupe, q49 shape)
              → benchmark decontamination               (decontam, q46 shape)
              → perplexity bucketing, keep head+middle  (lm_quality, CCNet)
              → DSIR importance selection [opt]         (quality_train, r23)
              → domain mixing weights                   (sampling, q48 shape)
              → deterministic shuffle + contiguous ids  (indexing, q52 shape)
              → sliding-window token chunks             (chunking, q44 shape)

Scale shape: the chain inherits each operator's audited plan — narrow
projections, broadcast joins for every small side (eval grams, LM vocab,
percentile cutoffs, bucket offsets), equi-join-shaped shuffles for the two
unavoidable corpus exchanges (gram self-aggregation in the passage gate,
doc_id aggregations), and no single-partition window anywhere. Persist
barriers sit where an output is re-referenced (same rationale as
plans/curation.curate; in the resumable production job these are bucketed
table commits, plans/checkpoint.py).

Perplexity bucketing runs in the APPROXIMATE percentile-cutoff mode — the
10^12-row shape (CCNet itself derives cutoffs from a sample); the exact
ntile mode stays available through lm_quality.ppl_buckets for bounded
corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators import chunking as chunking_op
from pdf_parser_spark.operators import decontam as decontam_op
from pdf_parser_spark.operators import dedupe as dedupe_op
from pdf_parser_spark.operators import indexing as indexing_op
from pdf_parser_spark.operators import lm_quality as lm_quality_op
from pdf_parser_spark.operators import sampling as sampling_op
from pdf_parser_spark.plans import curation


def pretrain_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    min_quality: float = 0.5,
    strip_boilerplate: bool = False,
    host_col: str = "host",
    gopher_gate: bool = False,
    allowed_langs: tuple[str, ...] = ("en",),
    neardup_threshold: float = 0.85,
    dup_frac_max: float = 0.5,
    passage_rewrite: bool = False,
    k_gram: int = 8,
    contamination_threshold: float = 0.2,
    ppl_keep_buckets: tuple[int, ...] = (1, 2),
    quality_weights: DataFrame | None = None,
    classifier_min_prob: float = 0.5,
    classifier_n_features: int | None = None,
    classifier_binary: bool = True,
    dsir_target: DataFrame | None = None,
    dsir_keep: int | None = None,
    mixing_alpha: float = 0.5,
    chunk_tokens: int = 50,
    overlap: int = 10,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Run the full chain; returns the named intermediate/output tables.

    Keys: ``curated`` (post filter+dedup, with stat columns), ``kept``
    (post passage gate, decontamination, and perplexity filter),
    ``mixing`` (per-predicted-language weights), ``ordered`` (kept docs
    with the deterministic ``shuffle_idx``), ``chunks`` (training
    sequences, ordered by (shuffle_idx, chunk_idx)), and ``funnel``
    (stage → surviving doc count, the pipeline's audit trail).

    Every stage is a pure function of (input rows, parameters, seed):
    reruns and repartitionings produce identical tables.
    """
    # Barriers are localCheckpoint (eager): unlike bare persist it TRUNCATES
    # the logical plan, so the many small downstream jobs (shuffle
    # quantiles/offsets, chunk explode) plan against a short lineage
    # instead of re-optimizing the whole chain each time — at sf0.01 that
    # planning overhead dominated wall time 2:1. The production analog is
    # the bucketed table commit (plans/checkpoint.py), which truncates
    # lineage the durable way.
    #
    # The funnel is LAZY: each stage contributes a count-aggregate over its
    # (checkpointed) frame, and the returned funnel DataFrame unions them.
    # Callers that read the audit trail pay its ~one job per stage when they
    # evaluate it; callers that don't (the monthly-crawl loop, the fused
    # bench chain) no longer pay 5-6 eager driver-serial count jobs per run.
    # Determinism is unaffected — every stage is a pure function of its
    # checkpointed input, so a deferred count equals the eager one.
    funnel: list[tuple[str, DataFrame]] = [("input", docs)]

    # optional cross-document host-boilerplate strip (operators/boilerplate)
    # FIRST: chrome lines would distort every downstream text signal — the
    # Gopher shape rules, quality scores, MinHash shingles, passage grams —
    # so the rewrite happens before anything reads the text. Docs rewritten
    # to empty (pure-chrome pages) are dropped, same convention as
    # passage_rewrite, so the funnel keeps its survivors-only meaning.
    if strip_boilerplate:
        from pdf_parser_spark.operators import boilerplate as boiler_op

        if host_col not in docs.columns:
            raise ValueError(
                f"strip_boilerplate=True needs a {host_col!r} column on docs"
            )
        docs = (
            boiler_op.strip_host_boilerplate(
                docs, host_col=host_col, text_col=text_col
            )
            .drop(text_col, "n_stripped_lines")
            .withColumnRenamed("clean_text", text_col)
            .filter(F.length(F.col(text_col)) > 0)
            .localCheckpoint()
        )
        funnel.append(("boiler_stripped", docs))

    # optional Gopher document-shape gate (Rae et al. 2021 §A1.1) ahead
    # of the rest of the chain: zero-exchange row-local rules, so gating
    # here shrinks every downstream shuffle for free
    if gopher_gate:
        from pdf_parser_spark.operators import textstats as textstats_op

        passed = textstats_op.gopher_rules(
            docs, text_col=text_col, id_col=id_col
        ).filter(F.col("gopher_pass"))
        docs = docs.join(
            passed.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
        )
        funnel.append(("gopher_kept", docs))

    curated = curation.curate(
        docs, min_quality, allowed_langs, neardup_threshold, id_col, text_col
    ).localCheckpoint()
    funnel.append(("curated", curated))

    # optional trained-classifier gate (the C4/GPT-3-style quality filter):
    # callers pass PRETRAINED weights (quality_train.train_quality_classifier
    # output — training is its own offline step, as in production pipelines);
    # scoring is a broadcast join + doc-keyed sum over hashed features.
    # the featurization MUST match training's (same n_features, same
    # binary flag) — hashed feature ids are a function of n_features, so a
    # mismatch scores against a scrambled feature space.
    if quality_weights is not None:
        from pdf_parser_spark.operators import quality_train as qt_op

        feats = qt_op.hashed_features(
            curated, text_col=text_col, id_col=id_col,
            n_features=classifier_n_features or qt_op.DEFAULT_FEATURES,
            binary=classifier_binary,
        )
        good = qt_op.score_documents(feats, quality_weights).filter(
            F.col("prob") >= classifier_min_prob
        )
        curated = curated.join(
            good.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
        ).localCheckpoint()
        funnel.append(("classifier_kept", curated))

    # duplicate-passage gate: drop docs dominated by cross-doc boilerplate
    passage = dedupe_op.duplicate_passage_stats(
        curated, k=k_gram, id_col=id_col, text_col=text_col
    ).filter(F.col("dup_frac") <= dup_frac_max)
    d = curated.join(
        passage.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )

    # optional C4-style passage REWRITE: beyond gating dominated docs,
    # strip every cross-corpus duplicate passage from the survivors
    # (first occurrence wins) and rebuild their text; token counts are
    # recomputed so mixing weights see the post-rewrite corpus. Docs
    # rewritten to empty are dropped (their content lives elsewhere).
    if passage_rewrite:
        from pdf_parser_spark.operators import textstats as textstats_op

        rewritten = dedupe_op.passage_dedup(
            d, k=k_gram, id_col=id_col, text_col=text_col
        )
        d = (
            d.drop(text_col)
            .join(
                rewritten.select(
                    F.col("doc_id").alias(id_col),
                    F.col("dedup_text").alias(text_col),
                ),
                id_col,
            )
            .filter(F.length(F.col(text_col)) > 0)
            .withColumn(
                "n_tokens", textstats_op.token_count_col(F.col(text_col))
            )
        )

    # benchmark decontamination (skipped when no eval side is supplied)
    if eval_docs is not None:
        clean = decontam_op.contamination(
            d, eval_docs, k=5, threshold=contamination_threshold,
            text_col=text_col, id_col=id_col,
        ).filter(~F.col("is_contaminated"))
        d = d.join(clean.select(F.col("doc_id").alias(id_col)), id_col, "left_semi")

    d = d.localCheckpoint()
    funnel.append(("passage_decontam", d))

    # CCNet perplexity gate — approximate cutoffs (the at-scale mode),
    # grouped by the PREDICTED language the curation stage attached
    buckets = lm_quality_op.ppl_buckets(
        d, n_buckets=3, by=("lang_pred",), text_col=text_col, id_col=id_col,
        approximate=True,
    ).filter(F.col("bucket_id").isin(list(ppl_keep_buckets)))
    kept = d.join(
        buckets.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    ).localCheckpoint()
    funnel.append(("ppl_kept", kept))

    # optional DSIR importance selection toward a target corpus (r23):
    # hashed-unigram likelihood-ratio weights + deterministic priority
    # resample down to dsir_keep docs.
    if dsir_target is not None and dsir_keep is not None:
        from pdf_parser_spark.operators import quality_train as qt_op

        chosen = qt_op.dsir_resample(
            kept, dsir_target, k=dsir_keep, text_col=text_col,
            id_col=id_col, seed=seed,
        )
        kept = kept.join(
            chosen.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
        ).localCheckpoint()
        funnel.append(("dsir_kept", kept))

    mixing = sampling_op.domain_mixing_weights(
        kept, ["lang_pred"], F.col("n_tokens"), alpha=mixing_alpha
    )

    # referenced twice below (chunk explode + shuffle_idx join): checkpoint
    # so the ranking window runs once
    ordered = indexing_op.deterministic_shuffle(
        kept, id_col=id_col, seed=seed, num_buckets=16
    ).localCheckpoint()
    chunks = chunking_op.chunk_documents(
        ordered, chunk_tokens=chunk_tokens, overlap=overlap,
        text_col=text_col, id_col=id_col,
    ).join(
        ordered.select(F.col(id_col).alias("doc_id"), "shuffle_idx"), "doc_id"
    )
    funnel.append(("chunks", chunks))

    from functools import reduce

    funnel_df = reduce(
        DataFrame.unionByName,
        [
            frame.agg(
                F.lit(i).alias("_ord"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n"),
            )
            for i, (stage, frame) in enumerate(funnel)
        ],
    ).orderBy("_ord").drop("_ord")
    return {
        "curated": curated,
        "kept": kept,
        "mixing": mixing,
        "ordered": ordered,
        "chunks": chunks,
        "funnel": funnel_df,
    }
