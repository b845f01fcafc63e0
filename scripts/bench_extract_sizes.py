"""Extraction scaling vs corpus size: separates fixed per-job overhead from W.

Motivation: at a fixed sandbox corpus (600k docs) the 4->16-core extraction
efficiency is depressed by a CONSTANT per-job cost S (AQE stage finalization,
scheduling, Python-worker pool spin-up) that a 10^12-row cluster job pays once
against hours of parallel work W. Efficiency = (S + W/4) / (4S + W/4) -> 1 as
W grows, so the honest way to evidence the north rule's at-scale behavior on
one machine is to show efficiency RISING with corpus size and the two-point
Amdahl fit agreeing on a size-independent S with W proportional to docs.

Runs extraction-only children (fresh JVM each) at a grid of
(cores, n_docs) points, interleaved, median of 3 timed runs per child,
per-run /proc/stat steal recorded. Appends every child to
BENCH_scaling_sizes.jsonl and prints the efficiency table + Amdahl fit.

Usage: python scripts/bench_extract_sizes.py [small_docs] [big_docs]
       (defaults 600000 and 1200000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_scaling_sizes.jsonl")

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pdf_parser_spark.session import get_spark
from pdf_parser_spark.fixtures import pages_spark
from pdf_parser_spark.operators import extract as extract_op

cpus = int(os.environ["SPARK_GRAFT_CPUS"])
n_docs = int(os.environ["BENCH_N_DOCS"])
parts = int(os.environ.get("BENCH_PARTS", "128"))
spark = get_spark(app_name=f"xs-{cpus}", master=f"local[{cpus}]")
pages = pages_spark(spark, n_docs=n_docs, partitions=parts).persist()
pages.count()
warm = pages_spark(spark, n_docs=256, partitions=cpus)
extract_op.extract_documents(warm).write.format("noop").mode("overwrite").save()

def _steal():
    f = open("/proc/stat").readline().split()
    return int(f[8]), sum(int(x) for x in f[1:])

secs, steals = [], []
for _ in range(3):
    s0, j0 = _steal(); t0 = time.perf_counter()
    extract_op.extract_documents(pages).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0; s1, j1 = _steal()
    secs.append(round(dt, 3))
    steals.append(round(100.0 * (s1 - s0) / max(1, j1 - j0), 1))
med = sorted(secs)[1]
print("CHILD_RESULT " + json.dumps({
    "cpus": cpus, "n_docs": n_docs, "parts": parts, "med": med,
    "docs_per_sec": round(n_docs / med, 1), "runs": secs, "steal": steals}))
spark.stop()
"""


def run(cpus: int, n_docs: int, parts: int = 128) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               BENCH_N_DOCS=str(n_docs), BENCH_PARTS=str(parts))
    out = subprocess.run([sys.executable, "-c", CHILD % {"repo": REPO}],
                         env=env, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            r = json.loads(line[13:])
            print(json.dumps(r), flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps(r) + "\n")
            return r
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def amdahl_fit(t_lo: float, t_hi: float, c_lo: int, c_hi: int) -> tuple[float, float]:
    """Solve T = S + W/c at two core counts -> (S, W)."""
    w = (t_lo - t_hi) / (1.0 / c_lo - 1.0 / c_hi)
    return t_lo - w / c_lo, w


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 600000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 1200000
    # interleaved grid: the small-corpus 3-point curve, then the big pair
    a4 = run(4, small)
    a8 = run(8, small)
    a16 = run(16, small)
    b4 = run(4, big)
    b16 = run(16, big)

    def eff(lo, hi):
        return round(hi["docs_per_sec"] / lo["docs_per_sec"] / (hi["cpus"] / lo["cpus"]), 3)

    s_small, w_small = amdahl_fit(a4["med"], a16["med"], 4, 16)
    s_big, w_big = amdahl_fit(b4["med"], b16["med"], 4, 16)
    summary = {
        "eff_small_4_to_8": eff(a4, a8),
        "eff_small_4_to_16": eff(a4, a16),
        "eff_big_4_to_16": eff(b4, b16),
        "amdahl_s_small_sec": round(s_small, 2),
        "amdahl_w_small_sec": round(w_small, 1),
        "amdahl_s_big_sec": round(s_big, 2),
        "amdahl_w_big_sec": round(w_big, 1),
        "w_ratio_vs_docs_ratio": [round(w_big / w_small, 3), round(big / small, 3)],
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
