"""Round-10 optimization profiler: time declared queries in isolation and
capture their formatted plans.

Usage:
    python tests/perf_profile.py q1 q2 ...            # time + plan capture
    SPARK_GRAFT_PROFILE_REPS=3                        # reps (min wins)
    SPARK_GRAFT_PROFILE_SINK=count|noop               # timed action
    SPARK_GRAFT_PROFILE_PLANDIR=plans/r10             # where plans land
    SPARK_GRAFT_PROFILE_TAG=before|after              # plan filename suffix

Methodology (spark_optimization_guide.md section 1): each query is labelled
via setJobDescription, timed with the noop sink by default so the
computation is measured rather than the collect path, and its
.explain("formatted") output is written to <plandir>/<name>_<tag>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_spark.session import get_spark


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))
    sink = os.environ.get("SPARK_GRAFT_PROFILE_SINK", "noop")
    plandir = os.environ.get("SPARK_GRAFT_PROFILE_PLANDIR", "")
    tag = os.environ.get("SPARK_GRAFT_PROFILE_TAG", "before")

    import __spark_entry__ as em

    qs = em.queries()
    spark = get_spark("perf_profile", cpus=cpus)
    for t in ("orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        samples = []
        rows = None
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            if plandir:
                df = fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                os.makedirs(plandir, exist_ok=True)
                with open(os.path.join(plandir, f"{name}_{tag}.txt"), "w") as f:
                    f.write(plan)
            for _ in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                if sink == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    rows = df.count()
                samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        except Exception as e:  # keep profiling the rest
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            spark.catalog.clearCache()
            continue
        out[name] = {"best": min(samples), "samples": samples}
        if rows is not None:
            out[name]["rows"] = rows
        print(f"{name}: {min(samples):.3f}s  {samples}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
