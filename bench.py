"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The 15 queries the round-1 bench measured (total 18.923 s at sf0.1).
# Their subtotal is reported separately so round-over-round comparison
# stays apples-to-apples as the headline set grows.
R1_SET = {
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_window_rank",
    "q_sessionize",
    "q_asof_join",
    "q_tumbling_window",
    "q_dedup_exact",
    "q_minhash_lsh_pairs",
    "q_cosine_topk",
    "q_ann_ivf_topk",
    "q_token_stats",
    "q_topk",
    "q18_large_orders",
    "q_pandas_udf_normalize",
}

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_window_rank",
    "q_sessionize",
    "q_asof_join",
    "q_tumbling_window",
    "q_dedup_exact",
    "q_minhash_lsh_pairs",
    "q_ngram_jaccard_pairs",
    "q_simhash_near_pairs",
    "q_corpus_pipeline",
    "q_embedding_neardup_lsh",
    "q_cosine_topk",
    "q_ann_ivf_topk",
    "q_token_stats",
    "q_topk",
    "q18_large_orders",
    "q_pandas_udf_normalize",
    "q_semantic_dedup",
    "q_sequence_pack",
    "q_rollup_cascade",
    "q_embedding_covariance",
    # round-4 flagships
    "q_incremental_dedup",
    "q_kmv_ndv_sketch",
    "q_interval_overlap_join",
    "q_image_neardup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from nimble_spark import get_spark
    from nimble_spark.registry import QUERIES, _load_all

    _load_all()
    spark = get_spark("bench")

    # Warm the JVM + parquet footers once so timings measure the
    # queries, not session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # Warm the Arrow/Python-worker bridge the same way (first
    # mapInPandas in a session pays ~2.5 s of worker + import setup
    # that a long-running cluster pays once, not per query).
    def _noop(batches):
        yield from batches

    spark.range(64).mapInPandas(_noop, schema="id long").count()

    # Two passes per query. Pass 1 (cold) includes one-time plan/codegen
    # compilation — comparable to the round-1 numbers. Pass 2 (warm) is
    # steady-state execution, the per-stage cost a long-running cluster
    # pays; it is also far less sensitive to host CPU-steal noise
    # (observed cold-pass swings of 2-4x between otherwise-identical
    # runs on this VM).
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        entry = QUERIES.get(name)
        if entry is None:
            continue
        # One broken query must never take down the whole bench — record
        # the error, keep timing the rest, always emit the JSON line.
        try:
            t0 = time.time()
            df = entry.fn(spark, sf_dir)
            n = df.count()  # force full execution
            timings[name] = round(time.time() - t0, 3)
            t1 = time.time()
            entry.fn(spark, sf_dir).count()
            warm[name] = round(time.time() - t1, 3)
            print(
                f"# {name}: {timings[name]}s cold / {warm[name]}s warm ({n} rows)",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "warm_total_sec": round(sum(warm.values()), 3),
        # Subtotal over the exact round-1 query set (18.923 s floor):
        # the like-for-like signal once extra headliners were added.
        "r1_comparable_total_sec": round(
            sum(v for k, v in timings.items() if k in R1_SET), 3
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
