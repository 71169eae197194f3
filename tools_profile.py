"""Per-query profiling harness (guide §1): run one registry query in an
isolated session with the bench's exact methodology (noop-equivalent count
of a full projection), reporting wall seconds, Spark job count, task count
and stage count from the status tracker, plus an optional plan dump.

Usage::

    python tools_profile.py QUERY [QUERY...] [--sf DIR] [--reps N]
                            [--plan OUT.txt] [--cpus N]

Every run is a fresh session per query (cold plans, like the driver), and
min-of-reps is reported alongside each sample.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]

    def opt(name, default=None):
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    reps = int(opt("--reps", "1"))
    plan_out = opt("--plan")
    cpus = opt("--cpus")
    if cpus:
        os.environ["SPARK_GRAFT_CPUS"] = cpus
    names = argv
    if not names:
        print("usage: tools_profile.py QUERY [...]", file=sys.stderr)
        return 2

    from ohlc_spark_streaming_spark import build_session
    from ohlc_spark_streaming_spark.registry import QUERIES

    results = {}
    for name in names:
        fn = QUERIES[name]
        spark = build_session(app_name=f"profile-{name}")
        sc = spark.sparkContext
        tracker = sc.statusTracker()
        # warm run (bench parity: warm_dir defaults to sf_dir)
        try:
            fn(spark, sf_dir).count()
        except Exception:
            pass
        samples = []
        for rep in range(reps):
            spark.catalog.clearCache()
            jobs_before = tracker.getJobIdsForGroup() or []
            t0 = time.time()
            sc.setJobDescription(f"profile:{name}#{rep}")
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            sc.setJobDescription(None)
            samples.append(round(dt, 3))
            if rep == 0:
                # job/stage/task census from the status tracker
                jids = [j for j in (tracker.getJobIdsForGroup() or [])]
                all_jids = sorted(set(jids) - set(jobs_before))
                n_stages = 0
                n_tasks = 0
                for j in all_jids:
                    ji = tracker.getJobInfo(j)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si is not None and si.numTasks > 0:
                            n_stages += 1
                            n_tasks += si.numTasks
                results[name] = {
                    "rows": n,
                    "jobs": len(all_jids),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
                if plan_out:
                    import contextlib
                    import io

                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    with open(plan_out, "w") as f:
                        f.write(buf.getvalue())
        results[name]["samples"] = samples
        results[name]["min"] = min(samples)
        spark.stop()
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
