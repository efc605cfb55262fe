"""Per-query isolation harness for the optimization rounds (guide §1).

Times each named query through the noop sink (min of N interleaved
passes, same methodology as bench.py) in ONE warm session, optionally
dumping ``.explain("formatted")`` to ``plans/<tag>/<name>_<suffix>.txt``.

Usage:
    python scripts/profile_queries.py [--explain TAG SUFFIX] [--passes N]
        [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.session import get_spark, sf_dir, warm_python_workers


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default=None)
    ap.add_argument(
        "--explain",
        nargs=2,
        metavar=("TAG", "SUFFIX"),
        help="dump explain('formatted') to plans/TAG/<name>_SUFFIX.txt",
    )
    args = ap.parse_args()
    target = args.sf or sf_dir()

    spark = get_spark("kgs-profile")
    warm_python_workers(spark)
    spark.read.parquet(f"{target}/region.parquet").count()

    if args.explain:
        tag, suffix = args.explain
        outdir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            tag,
        )
        os.makedirs(outdir, exist_ok=True)
        for name in args.names:
            df = QUERIES[name](spark, target)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"explain -> {name}_{suffix}.txt", flush=True)

    timings: dict[str, float] = {n: float("inf") for n in args.names}
    for p in range(args.passes):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, target).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            timings[name] = min(timings[name], dt)
            print(f"pass{p} {name:45s} {dt:7.3f}s", flush=True)
    print("\n== min of passes ==")
    for name, t in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{t:7.3f}  {name}")
    print(f"total {sum(timings.values()):.3f}")


if __name__ == "__main__":
    main()
