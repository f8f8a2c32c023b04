"""Per-query profiling for the optimization rounds (guide §1).

For each named headline query (default: all), after one untimed warm
pass (model caches hot, JVM warm), measures:

  - build_s:  time for fn(spark, sf_dir) to RETURN the DataFrame —
              driver-side construction, including any model collects
  - exec_s:   time for the bench action (count / recall reduction)
  - jobs:     Spark jobs launched during the whole invocation
  - stages:   stages launched

Prints one JSON line per query to stdout.  Run:
    python tools/profile_queries.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from vector_search_go_spark import registry
    from vector_search_go_spark.session import get_spark

    import bench

    spark = get_spark("profile", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = sys.argv[1:] or bench.HEADLINE

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        is_gate = name.startswith("lsh_recall") or name.endswith("_recall_vs_exact")

        def run_once():
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            if is_gate:
                from vector_search_go_spark.operators.recall import (
                    mean_precision_recall,
                )

                mean_precision_recall(df)
            else:
                df.count()
            t2 = time.time()
            return t1 - t0, t2 - t1

        spark.sparkContext.setJobDescription(f"warm:{name}")
        run_once()  # warm pass: models cached, code paths JITed
        jobs0 = tracker.getJobIdsForGroup(None)
        spark.sparkContext.setJobDescription(f"profile:{name}")
        build_s, exec_s = run_once()
        jobs1 = tracker.getJobIdsForGroup(None)
        new_jobs = sorted(set(jobs1) - set(jobs0))
        n_stages = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)
        print(
            json.dumps(
                {
                    "query": name,
                    "build_s": round(build_s, 3),
                    "exec_s": round(exec_s, 3),
                    "total_s": round(build_s + exec_s, 3),
                    "jobs": len(new_jobs),
                    "stages": n_stages,
                }
            ),
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
