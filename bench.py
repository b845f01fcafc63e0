"""Benchmark harness — headline queries + flagship extraction throughput.

Runs every driver-contract query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and times the
flagship extraction pipeline (the north-star docs/sec metric) over the
deterministic synthetic pages corpus, sized to the scale factor.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "extraction": {"n_docs": N, "docs_per_sec": D, "n_txns": T}}

Execution is forced with a noop-format write (full materialization, no
driver-side collect cost) so the timings measure the distributed plan,
not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pdf_parser_spark.session import get_spark


def _force(df) -> int:
    """Materialize every row of df without collecting it to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def run_extraction_bench(spark, sf: float) -> dict:
    """Flagship metric: pages → transactions docs/sec (SURVEY.md §3.1)."""
    from pdf_parser_spark.fixtures import pages_spark
    from pdf_parser_spark.plans import pipeline

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = max(500, int(sf * 300_000))  # sf0.1 → 30,000 docs
    partitions = cpus * 2
    pages = pages_spark(spark, n_docs=n_docs, partitions=partitions)
    # Corpus synthesis cost must not be billed to extraction: materialize
    # the input first (at cluster scale the table already exists on disk).
    pages = pages.persist()
    pages.count()
    t0 = time.perf_counter()
    txns = pipeline.transactions_pipeline(pages)
    n_txns = txns.count()
    wall = time.perf_counter() - t0
    pages.unpersist()
    return {
        "n_docs": n_docs,
        "n_txns": n_txns,
        "sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_from_dir(sf_dir)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    # warmup: absorb one-time session costs (JIT, parquet footer reads,
    # python-worker spawn) so per-query timings measure the queries, not the
    # first query's cold start
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
    from pdf_parser_spark.fixtures import pages_spark
    from pdf_parser_spark.plans import pipeline as _pl

    _pl.transactions_pipeline(pages_spark(spark, 256, cpus)).write.format("noop").mode(
        "overwrite"
    ).save()

    from pdf_parser_spark.plans import pipeline as _pipeline

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        # Isolate queries from each other: several entries build the
        # transactions pipeline, whose barrier persists a serialized copy
        # of the transactions table per call. Without a release, ~95
        # queries accumulate dozens of pinned caches and late entries
        # fight a polluted block manager (measured: q53 37.6s in-suite
        # vs 7.6s standalone in the same session). Untimed, between
        # queries — each timing measures the query, not its predecessors'
        # leftovers.
        _pipeline.release_pipeline_caches()
        spark.catalog.clearCache()

    extraction = run_extraction_bench(spark, sf)
    total += extraction["sec"]

    print(
        json.dumps(
            {
                "metric": f"headline suite wall time ({len(timings)} queries + extraction pipeline)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extraction": extraction,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
