"""Reader runtime stats (SURVEY §2.5; VeloxReadParams' stripeCount /
blockedOnIo / decodingTime callbacks, dwio/nimble/velox/VeloxReader.h:57-65).

The reference reports, per read: stripes touched, IO-blocked wall
time, decode time. Spark's execution engine already accounts the same
quantities as SQLMetrics on every FileSourceScan node — files read
(stripe count analogue), metadataTime (footer/listing IO), scanTime
(IO + decode wall), filesSize (bytes), numOutputRows. This module
walks the *executed* (AQE-final) physical plan over py4j and surfaces
those metrics as plain Python — the `SHOW SCAN METRICS` tool and the
pruning-proof queries are built on it.

Scale posture: metrics are aggregated JVM-side by Spark's metric
system (driver receives per-task updates regardless); reading them
here is O(plan nodes), no data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _walk(node, out: list) -> None:
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out)
        return
    if node.nodeName().endswith("QueryStage"):
        # AQE stage wrappers hold their subtree outside children()
        _walk(node.plan(), out)
        return
    if cls in ("FileSourceScanExec", "BatchScanExec") or "Scan" in node.nodeName():
        metrics: dict[str, int] = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = kv._2().value()
        out.append({"node": node.nodeName().strip(), "metrics": metrics})
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), out)


def scan_metrics(df: DataFrame, execute: bool = True) -> list[dict]:
    """Per-scan-node runtime metrics of `df`'s (executed) plan.

    Returns one dict per scan node: ``{"node": ..., "metrics":
    {"numFiles": ..., "scanTime": ..., "metadataTime": ...,
    "filesSize": ..., "numOutputRows": ..., ...}}``. With
    ``execute=True`` the query runs first so the metrics reflect a
    real read (and AQE's final plan), not zeros.
    """
    if execute:
        df.collect()
    out: list[dict] = []
    _walk(df._jdf.queryExecution().executedPlan(), out)
    return out


def totals(df: DataFrame, execute: bool = True) -> dict[str, int]:
    """Summed scan metrics across every scan node in the plan — the
    one-line reader-stats report (files/bytes/rows read, scan +
    metadata wall ms)."""
    agg: dict[str, int] = {}
    for node in scan_metrics(df, execute=execute):
        for k, v in node["metrics"].items():
            if isinstance(v, int):
                agg[k] = agg.get(k, 0) + v
    agg["n_scan_nodes"] = len(scan_metrics(df, execute=False))
    return agg
