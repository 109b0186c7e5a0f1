"""One interleaved-A/B sample that prices WALL *and* TOTAL EXECUTOR
TASK TIME per query (VERDICT r11 item 3: wall-clock alone cannot price
duplicate corpus passes on an idle 32-core box — the duplicates run on
idle cores for free locally but cost real cluster resources at scale).

Usage: python tools/ab_tasktime.py <repo_root> <sf_dir> <q1,q2,...>

Same regime as tools/ab_one.py (fresh session, warmup pass, forced-GC
min-of-2 construct+count), plus Spark event logging: after the session
closes, the event log's SparkListenerTaskEnd records are bucketed into
each timed rep's [t0, t1] wall window and their "Executor Run Time" +
"Executor Deserialize Time" summed — total task milliseconds the rep
scheduled across the cluster. Printed as one JSON line:
{name: {"wall": best_sec, "task_sec": task_time_of_best_rep}}.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time


def main() -> None:
    root, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sys.path.insert(0, root)
    evdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true --conf spark.eventLog.dir={evdir} "
        "pyspark-shell"
    )
    from stream_spark.queries import QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("ab_tasktime")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:  # session warmup pass (untimed)
        QUERIES[name](spark, sf_dir).count()
    windows: dict[str, list[tuple[float, float, float]]] = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()
        reps = []
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn(spark, sf_dir).count()
            t1 = time.time()
            reps.append((t0, t1, t1 - t0))
        windows[name] = reps
    spark.stop()

    # parse the completed event log: sum task run+deserialize ms per
    # rep window (task finish time inside [t0, t1])
    logs = [p for p in glob.glob(f"{evdir}/*") if not p.endswith(".tmp")]
    events = []
    for p in logs:
        with open(p) as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                ti = ev.get("Task Info") or {}
                tm = ev.get("Task Metrics") or {}
                events.append(
                    (
                        ti.get("Finish Time", 0) / 1000.0,
                        (tm.get("Executor Run Time", 0) or 0)
                        + (tm.get("Executor Deserialize Time", 0) or 0),
                    )
                )
    out = {}
    for name, reps in windows.items():
        best = min(reps, key=lambda r: r[2])
        task_ms = sum(ms for ft, ms in events if best[0] <= ft <= best[1])
        out[name] = {"wall": round(best[2], 3), "task_sec": round(task_ms / 1000.0, 3)}
    shutil.rmtree(evdir, ignore_errors=True)
    print(json.dumps({"root": os.path.basename(root.rstrip("/")) or root, **out}))


if __name__ == "__main__":
    main()
