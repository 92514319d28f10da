"""Query registry — the single source of truth wiring operator
implementations to the driver contract (``__spark_entry__.queries`` /
``oracle_sql``) and to the test/bench harnesses.

Every operator claimed as implemented registers here with a Spark
callable ``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a
DuckDB oracle SQL string computing the same result over the same
parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings).

Contract notes (driver compares sorted-by-name columns + value hash):
- alias every computed column identically on both sides;
- never return raw timestamps (engine-dependent precision) — cast to
  DATE-strings;
- round floating aggregates on BOTH sides to a fixed scale;
- never leave a bare integer SUM(...) in an oracle — DuckDB types it
  HUGEINT, which the driver's pandas normalization turns into float64
  and the value hash goes red against Spark's int (the r7 incident);
  wrap in CAST(... AS BIGINT). tests/test_oracle_dtypes.py lints every
  oracle's output types against the portable set.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryEntry:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None → driver does rows-only check
    category: str = ""  # SURVEY §2 category, for coverage reporting
    doc: str = ""


QUERIES: dict[str, QueryEntry] = {}


def register(name: str, oracle: str | None = None, category: str = "", doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QueryEntry(name=name, fn=fn, oracle=oracle, category=category, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    _load_all()
    return {name: e.fn for name, e in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    _load_all()
    return {name: e.oracle for name, e in QUERIES.items() if e.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import nimble_spark.operators.relational  # noqa: F401
    import nimble_spark.operators.windowed  # noqa: F401
    import nimble_spark.operators.joins_ext  # noqa: F401
    import nimble_spark.operators.dedup  # noqa: F401
    import nimble_spark.operators.similarity  # noqa: F401
    import nimble_spark.operators.text  # noqa: F401
    import nimble_spark.operators.format_surface  # noqa: F401
    import nimble_spark.operators.events_ts  # noqa: F401
    import nimble_spark.operators.capability_ext  # noqa: F401
    import nimble_spark.operators.relational_ext  # noqa: F401
    import nimble_spark.operators.tpch_rest  # noqa: F401
    import nimble_spark.operators.pipeline  # noqa: F401
    import nimble_spark.operators.udf_surface  # noqa: F401
    import nimble_spark.operators.corpus_ext  # noqa: F401
    import nimble_spark.operators.corpus_pack  # noqa: F401
    import nimble_spark.operators.train_prep  # noqa: F401
    import nimble_spark.operators.graph  # noqa: F401
    import nimble_spark.operators.lifecycle  # noqa: F401
    import nimble_spark.operators.sketches  # noqa: F401

    _reorder()
    _LOADED = True


# The driver's correctness gate iterates ``queries()`` in insertion
# order and truncates at a budget (r01 recorded rows for exactly the
# first 50 registered queries). Order therefore decides WHICH
# operators get a hard correctness signal each round. Put the queries
# without a green driver row yet first — connector/format surface,
# TPC-H conformance, text, ANN, the corpus pipeline — and the ones
# already proven green in r01 last, so a truncated run still proves
# the unproven surface.
_PRIORITY_MODULES = [
    # re-prove the two r01 hash-mismatch fixes first
    "__fixes__",
    # Round-6 capabilities (clone/alter/maintenance/sketches) lead the
    # never-checked tier: they have no independent verification yet,
    # while the r5 backlog names were judge-verified 33/33 — when the
    # driver's 50-row budget can't cover every unchecked name, spend
    # it on the surface nobody has checked.
    "lifecycle",
    "sketches",
    "format_surface",
    "tpch_rest",
    "text",
    "train_prep",
    "corpus_ext",
    "corpus_pack",
    "__north_star__",
    "capability_ext",
    "udf_surface",
    "relational_ext",
    "similarity",
    "events_ts",
    "pipeline",
    "__rows_only__",
    "dedup",
    "relational",
    "windowed",
    "joins_ext",
]
_PRIORITY_NAMES = {
    "__fixes__": ["q_case_agg", "q_sessionize"],
    "__north_star__": ["q_ann_lsh_topk", "q_ann_ivf_topk", "q_corpus_pipeline"],
    # Historical tier: these three were rows-only until round 3, when
    # they gained batch-equivalence oracles; the tier label stays so
    # their position in the static tiebreak is stable round-to-round.
    "__rows_only__": ["q_stream_tumbling", "q_stream_session", "q_stream_stateful"],
}


def _driver_history() -> dict[str, bool]:
    """Per-query verdict from every ``CORRECTNESS_r*.json`` the driver
    has written so far: name → True once any round proved it green
    (rows+schema+hash), False if it has only failing rows. Absent →
    never checked. Resilient to missing/corrupt files (fresh clone)."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    status: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            green = bool(r.get("rows_match")) and bool(r.get("schema_match", True)) and bool(r.get("hash_match", True))
            status[name] = status.get(name, False) or green
    return status


def _last_sampled() -> dict[str, int]:
    """name → the LAST driver round that sampled the query (round
    number parsed from ``CORRECTNESS_r{N}.json``). Absent → never
    sampled. Drives the least-recently-sampled rotation inside the
    green tier, so a budget-truncated gate re-proves every green query
    on a bounded cycle instead of whenever the draw happens to reach
    it (VERDICT r8 #7)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if isinstance(r, dict):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _reorder() -> None:
    """Rebuild QUERIES in driver-priority order.

    The driver's gate iterates in insertion order and truncates at a
    budget (r01 stopped at exactly 50 rows), so order decides which
    operators earn a hard correctness signal each round. Tiers, from
    the actual driver history (``CORRECTNESS_r*.json``):

      0. previously FAILED and never since green — re-prove fixes first
      1. never checked by any round — the unproven surface
      2. already green in some round — keep last; a truncated run
         spends its budget proving new ground, a full run re-proves
         everything. WITHIN this tier, LEAST-RECENTLY-SAMPLED first
         (VERDICT r8 #7): with a ~50-query driver budget over ~300
         green queries, ordering by the last round that sampled each
         query re-proves the whole green set on a bounded ~6-round
         cycle instead of letting early-registered queries go stale.

    Remaining ties break on the static module priority below, so the
    flagship format/TPC-H/text/pipeline surface still leads.
    """
    history = _driver_history()
    last = _last_sampled()
    mod_tier = {}
    for i, m in enumerate(_PRIORITY_MODULES):
        for n in _PRIORITY_NAMES.get(m, ()):  # explicit names
            mod_tier[n] = i
    for name, e in QUERIES.items():
        if name not in mod_tier:
            mod = e.fn.__module__.rsplit(".", 1)[-1]
            mod_tier[name] = _PRIORITY_MODULES.index(mod) if mod in _PRIORITY_MODULES else len(_PRIORITY_MODULES)

    def hist_tier(name: str) -> int:
        if name not in history:
            return 1
        return 2 if history[name] else 0

    def freshness(name: str) -> int:
        # least-recently-sampled rotation applies only to the green
        # tier; failed/unchecked tiers keep their static priority
        return last.get(name, 0) if hist_tier(name) == 2 else 0

    ordered = sorted(QUERIES, key=lambda n: (hist_tier(n), freshness(n), mod_tier[n]))
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
