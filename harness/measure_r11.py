"""Round-11 per-query measurement: time a query via the noop sink
(guide §1.4 — computes every column, discards output) and dump its
``explain("formatted")`` plan for before/after evidence.

Usage:
    python harness/measure_r11.py [--sf DIR] [--plans OUT_DIR] [--tag before]
                                  [--reps 3] name [name ...]

Prints per-query: cold (first noop write incl. codegen) + min-warm
seconds, plus plan-shape counters (Exchanges, Sorts, Windows,
BatchEvalPython/ArrowEvalPython, join strategies, scan count).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def plan_shape(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "Reused": len(re.findall(r"ReusedExchange", plan)),
        "Sort": len(re.findall(r"\bSort\b", plan)),
        "Window": len(re.findall(r"\bWindow\b", plan)),
        "SMJ": len(re.findall(r"SortMergeJoin", plan)),
        "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
        "SHJ": len(re.findall(r"ShuffledHashJoin", plan)),
        "BNLJ": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "Cart": len(re.findall(r"CartesianProduct", plan)),
        "PyEval": len(re.findall(r"(?:Batch|Arrow)EvalPython|MapInPandas|MapInArrow", plan)),
        "Scan": len(re.findall(r"Scan parquet|BatchScan", plan)),
        "Agg": len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)),
    }
    return " ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="dir to write <name>_<tag>.txt plans")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from nimble_spark import get_spark
    from nimble_spark.registry import QUERIES, _load_all

    _load_all()
    spark = get_spark("measure_r11")
    # Same warmups the bench does so cold numbers measure the query.
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    def _noop(batches):
        import numpy as np
        import pandas as pd  # noqa: F401 — first-touch the numeric stack (r12)

        np.zeros((64, 64)).sum()
        yield from batches

    # one task per core so the whole Python-worker pool is spawned
    # and imported before any cold timing (same warmup as bench.py)
    (
        spark.range(256)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_noop, schema="id long")
        .count()
    )

    for name in args.names:
        entry = QUERIES.get(name)
        if entry is None:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(name)
        try:
            df = entry.fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            # fall back to capturing stdout of .explain
            import contextlib
            import io

            df = entry.fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        reps = []
        for _ in range(max(1, args.reps - 1)):
            df2 = entry.fn(spark, args.sf)
            t1 = time.time()
            df2.write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t1)
        warm = min(reps) if reps else cold
        print(f"{name}: cold={cold:.3f}s warm={warm:.3f}s | {plan_shape(plan)}")
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
