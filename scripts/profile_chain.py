"""One-off full-chain profiler: event-log stage/job timeline decomposition.

Runs the transactions pipeline once (protocol-identical: cold caches, eager
barrier) at a given parallelism and corpus size with Spark event logging on,
then parses the event log into:
  - per-job wall intervals and the gaps between them (driver-serial time),
  - per-stage wall, task-time sum, and effective parallelism
    (task_time / stage_wall),
  - a busy-timeline union: fraction of the timed window covered by at least
    one running stage.

Usage: python scripts/profile_chain.py <cpus> <n_docs> [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 600000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    shuffle_parts = int(sys.argv[4]) if len(sys.argv) > 4 else None
    driver_mem = sys.argv[5] if len(sys.argv) > 5 else None
    if driver_mem:
        os.environ["SPARK_DRIVER_MEM"] = driver_mem

    evdir = tempfile.mkdtemp(prefix="spark-ev-")
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    from pdf_parser_spark.session import get_spark
    from pdf_parser_spark.fixtures import pages_spark
    from pdf_parser_spark.plans import pipeline

    spark = get_spark(
        app_name=f"profile-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_parts,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file://" + evdir,
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    pages = pages_spark(spark, n_docs=n_docs, partitions=128).persist()
    pages.count()
    warm = pages_spark(spark, n_docs=256, partitions=cpus)
    pipeline.transactions_pipeline(warm).write.format("noop").mode("overwrite").save()
    pipeline.release_pipeline_caches()

    windows = []
    for _ in range(repeats):
        spark.catalog.clearCache()
        pages.persist()
        pages.count()
        time.sleep(1.0)  # separate the timed window in the event log
        t0 = time.time()
        n = pipeline.transactions_pipeline(pages).count()
        t1 = time.time()
        windows.append((t0, t1))
        pipeline.release_pipeline_caches()
    spark.stop()

    # parse the event log (v1: single file; v2: rolling dir of events_* files)
    entry = [os.path.join(evdir, f) for f in os.listdir(evdir)][0]
    if os.path.isdir(entry):
        logfs = sorted(
            os.path.join(entry, f)
            for f in os.listdir(entry)
            if f.startswith("events_")
        )
    else:
        logfs = [entry]

    def _lines():
        for lf in logfs:
            with open(lf) as fh:
                yield from fh

    jobs, stages = {}, {}
    if True:
        for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {"t0": ev["Submission Time"] / 1000.0}
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["t1"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if "Submission Time" not in si:
                    continue
                stages[(si["Stage ID"], si.get("Stage Attempt ID", si.get("Attempt ID", 0)))] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "t0": si["Submission Time"] / 1000.0,
                    "t1": si["Completion Time"] / 1000.0,
                    "n_tasks": si["Number of Tasks"],
                }
            elif e == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(key, {})
                st["task_ms"] = st.get("task_ms", 0) + m.get("Executor Run Time", 0)
                st["cpu_ns"] = st.get("cpu_ns", 0) + m.get("Executor CPU Time", 0)
                st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)

    for w0, w1 in windows:
        wall = w1 - w0
        in_win = {
            k: s
            for k, s in stages.items()
            if "t0" in s and s["t0"] >= w0 - 0.5 and s["t1"] <= w1 + 2.0
        }
        # busy timeline union
        ivs = sorted((s["t0"], s["t1"]) for s in in_win.values())
        busy, cur = 0.0, None
        for a, b in ivs:
            if cur is None or a > cur[1]:
                if cur:
                    busy += cur[1] - cur[0]
                cur = [a, b]
            else:
                cur[1] = max(cur[1], b)
        if cur:
            busy += cur[1] - cur[0]
        print(f"\n=== window wall={wall:.1f}s  stage-covered={busy:.1f}s "
              f"uncovered(driver-serial)={wall - busy:.1f}s  cpus={cpus} ===")
        total_task = sum(s.get("task_ms", 0) for s in in_win.values()) / 1000.0
        total_cpu = sum(s.get("cpu_ns", 0) for s in in_win.values()) / 1e9
        total_gc = sum(s.get("gc_ms", 0) for s in in_win.values()) / 1000.0
        print(f"sum task-time={total_task:.1f}s  task-cpu={total_cpu:.1f}s  "
              f"gc={total_gc:.1f}s  avg-parallelism={total_task / wall:.1f}/{cpus}")
        for k in sorted(in_win, key=lambda k: in_win[k]["t0"]):
            s = in_win[k]
            sw = s["t1"] - s["t0"]
            tt = s.get("task_ms", 0) / 1000.0
            print(
                f"  stage {k[0]:>4} {sw:7.2f}s wall {tt:8.1f}s tasks "
                f"({s.get('n_tasks', 0):>4}t, par={tt / max(sw, 1e-9):5.1f}) "
                f"gc={s.get('gc_ms', 0) / 1000.0:5.1f}s  {s.get('name', '')}"
            )

    print("\nevent log:", logfs)


if __name__ == "__main__":
    main()
