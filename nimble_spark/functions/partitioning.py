"""Scale-adaptive partition pinning for exploding operators.

AQE's partition coalescing decides partition counts from the MAP
OUTPUT BYTES of a shuffle. That is the right signal for ordinary
operators, but it serializes two shapes this engine uses heavily
(measured r11, guide §2.5 "exploding joins"):

- a self-join whose *input* is a few hundred KB of banded keys but
  whose *output* is the quadratic candidate-pair set: AQE folds the
  tiny input shuffle to one partition and the entire pair generation
  runs single-threaded (q_embedding_neardup_lsh at sf0.1: 1.36M pairs
  generated and verified on one core, 12-44 s; 2 s once pinned);
- a compute-heavy verify (dot products, array intersections) running
  on the coalesced partitioning of an upstream tiny shuffle.

``repartition(n, keys)`` / ``repartition(n)`` with an EXPLICIT n is
exempt from AQE coalescing, so these helpers pin parallelism at the
session's ``defaultParallelism`` — the executor-core count locally
and the cluster-wide core count on a real deployment, so the pin
scales with the hardware instead of hard-coding either.  At sizes
where AQE would not have coalesced anyway the pin is a no-op in
practice: the exchange it introduces is the same exchange the
downstream join/window required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Size cap for the broadcast branch of verify-attach joins (below).
# Conf-parameterized so a deployment can align it with executor
# memory; the 256 MB local default is far above every bench corpus
# (sf0.1 estimates are <1 MB) and far below where a broadcast build
# starts threatening the driver (guide §3.1: "multiple GB is asking
# for driver OOMs", hard cap 8 GB).
VERIFY_ATTACH_CONF = "spark.nimble.verifyAttach.maxBroadcastBytes"
VERIFY_ATTACH_DEFAULT_BYTES = 256 * 1024 * 1024


def attach_small(df: DataFrame) -> DataFrame:
    """Size-aware attach side for verify joins (guide §3.1).

    The dedup/near-dup verifies join a (capped-)quadratic candidate
    pair set back to the per-doc payload table (hashed shingle sets,
    embedding vectors). Broadcasting the payload side keeps the pair
    set map-local — no exchange ever carries arrays — but the payload
    side is O(corpus): at 100 TB it is terabytes and an unconditional
    broadcast OOMs the driver. So the branch is decided from the
    optimizer's size estimate of the payload subtree (parquet-scan
    stats, so it scales with the input; preserved through lazy
    localCheckpoint):

    - below ``spark.nimble.verifyAttach.maxBroadcastBytes`` (default
      256 MB): ``F.broadcast`` — the fast map-side attach;
    - above it (or unestimable): shuffle-hash attach — both sides
      exchange on the id key, the scale-safe pre-broadcast shape that
      degrades to a bigger shuffle instead of failing.

    The two branches compute identical results (plain inner equi-join
    either way); only the physical strategy differs.
    """
    spark = df.sparkSession
    try:
        thr = int(spark.conf.get(VERIFY_ATTACH_CONF, str(VERIFY_ATTACH_DEFAULT_BYTES)))
    except ValueError:
        thr = VERIFY_ATTACH_DEFAULT_BYTES
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — unestimable ⇒ assume large
        est = None
    if est is not None and 0 <= est <= thr:
        return F.broadcast(df)
    return df.hint("shuffle_hash")


def pinned_repartition(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition on ``cols`` (or round-robin with no cols) into
    ``defaultParallelism`` partitions, pinned against AQE coalescing.

    Use keyed form directly below a join/window that needs that key
    partitioning (the exchange is then the one the operator required,
    just with a pinned width); use the keyless form to spread an
    already-generated candidate set before an embarrassingly parallel
    verify."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if cols:
        return df.repartition(n, *cols)
    return df.repartition(n)
