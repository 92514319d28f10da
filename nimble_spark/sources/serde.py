"""Engine-to-engine batch serialization — the Serializer/Deserializer
surface (dwio/nimble/serializer/Serializer.h:33-56: serialize Velox
vectors to a transport format and back).

Spark's internal shuffle serde is built-in; the *external* transport
capability maps to Arrow IPC: DataFrame → Arrow stream bytes →
DataFrame, zero-copy columnar, readable by any Arrow-speaking engine
(DuckDB, pandas, Rust, browsers). Used for index-projection transport
(NimbleIndexProjector analogue) and cross-process handoff.
"""

from __future__ import annotations

import io

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession


def serialize(df: DataFrame) -> bytes:
    """DataFrame → Arrow IPC stream bytes (collects to the driver —
    transport serde for batches/slices, not bulk data movement; bulk
    stays in parquet)."""
    table = df.toArrow()
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue()


def deserialize(spark: SparkSession, payload: bytes) -> DataFrame:
    """Arrow IPC stream bytes → DataFrame."""
    with pa.ipc.open_stream(io.BytesIO(payload)) as reader:
        table = reader.read_all()
    return spark.createDataFrame(table.to_pandas())


def serialize_partitioned(df: DataFrame) -> DataFrame:
    """Distributed serde: each partition serializes itself to one Arrow
    IPC payload row (id, n_rows, payload) — the per-stripe slice
    transport the reference's index projector performs, without any
    driver collect."""
    import pandas as pd

    def per_batch(batches):
        for pdf in batches:
            table = pa.Table.from_pandas(pdf, preserve_index=False)
            sink = io.BytesIO()
            with pa.ipc.new_stream(sink, table.schema) as w:
                w.write_table(table)
            yield pd.DataFrame(
                {"n_rows": [len(pdf)], "payload": [sink.getvalue()]}
            )

    return df.mapInPandas(per_batch, "n_rows long, payload binary")


def deserialize_partitioned(payloads: DataFrame, schema) -> DataFrame:
    """Inverse of serialize_partitioned: each Arrow IPC payload row
    expands back into its record batch, partition-locally — the
    default serde path (no driver collect; the driver-side
    ``serialize``/``deserialize`` pair remains for small slices like
    DSL peeks and test fixtures).

    ``schema`` is the DDL string / StructType of the encoded rows
    (Arrow IPC embeds the schema per payload; Spark needs it
    statically for the mapInPandas plan)."""
    import pandas as pd

    def per_batch(batches):
        for pdf in batches:
            for buf in pdf["payload"]:
                with pa.ipc.open_stream(io.BytesIO(bytes(buf))) as reader:
                    yield reader.read_all().to_pandas()
            if len(pdf) == 0:
                yield pd.DataFrame()

    return payloads.mapInPandas(per_batch, schema)


# Serving request batches are metadata-sized by contract (the
# reference's NimbleIndexProjector also takes an in-memory request
# batch, velox/index/NimbleIndexProjector.h:35-43). The cap ENFORCES
# the contract: the key probe collects at most cap+1 distinct keys, so
# a caller passing a 100M-row request frame gets a clear error instead
# of a silent driver OOM. 100k keys ≈ a few MB — far below any
# realistic driver heap, far above any realistic serving batch.
SERVE_MAX_BATCH_KEYS = 100_000


def serve_lookups(
    spark: SparkSession,
    path: str,
    requests: DataFrame,
    key: str,
    columns: list[str],
    max_batch_keys: int = SERVE_MAX_BATCH_KEYS,
) -> DataFrame:
    """Batched index-lookup serving — the full NimbleIndexProjector
    loop (velox/index/NimbleIndexProjector.h:35-43: a BATCH of point
    lookup requests + column projections → index-located rows,
    serialized for transport).

    ``requests`` is a DataFrame ``(request_id, <key value>)`` (second
    column named ``key``). The distinct probe keys (bounded by
    ``max_batch_keys`` — the collect is a ``limit(cap+1)`` probe, so
    driver memory is capped no matter how large the request frame is)
    prune the scan through whatever index the table has — hash
    buckets, sorted index, bloom sidecar, or cluster ranges — then
    each request's projected rows serialize to ONE Arrow IPC payload
    row ``(request_id, n_rows, payload)``, grouped and encoded
    executor-side (applyInPandas; no driver collect of data rows).
    Requests matching nothing yield n_rows=0 with an empty-schema
    payload, so the response always covers the batch.

    Raises ``ValueError`` when the batch exceeds ``max_batch_keys``
    distinct keys: that is no longer a serving workload — run a
    distributed semi-join (``read_table(...).join(requests, key,
    'left_semi')``) instead."""
    import pandas as pd

    from pyspark.sql import functions as F

    from nimble_spark.sources.table import read_table

    probe = requests.select(key).distinct().limit(max_batch_keys + 1).collect()
    if len(probe) > max_batch_keys:
        raise ValueError(
            f"serve_lookups request batch exceeds {max_batch_keys} distinct "
            f"keys — this is a bulk-join workload, not a serving batch; use "
            f"read_table(...).join(requests, {key!r}, 'left_semi') or raise "
            f"max_batch_keys explicitly"
        )
    keys = [r[0] for r in probe]
    proj = list(dict.fromkeys([key, *columns]))
    hits = read_table(spark, path, columns=proj, point_lookup=(key, keys))
    # explicit hit marker: a left-join miss and a matched row that
    # happens to contain NULLs in projected columns must be
    # distinguishable (dropna over data columns would conflate them)
    joined = requests.join(hits.withColumn("__hit", F.lit(1)), key, "left")

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        rid = pdf["request_id"].iloc[0]
        rows = pdf[pdf["__hit"].notna()]
        tbl = pa.Table.from_pandas(rows[proj], preserve_index=False)
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        return pd.DataFrame(
            {"request_id": [rid], "n_rows": [len(rows)], "payload": [sink.getvalue()]}
        )

    # groupBy alone enforces the request_id clustering (AQE sizes the
    # exchange); the explicit projection keeps request-frame extras
    # out of the shuffle — only (request_id, proj, __hit) cross. An
    # r11 A/B also tried repartition+sortWithinPartitions+mapInPandas
    # batch-coalesced encoding here: measured 1.5-1.9 s vs 1.0 s for
    # this shape on a 1k-request batch at every partition count (2-32)
    # — the forced exchange + per-task overhead cost more than the
    # per-group applyInPandas invocations it saved, so the grouped
    # encode stays.
    return (
        joined.select("request_id", *proj, "__hit")
        .groupBy("request_id")
        .applyInPandas(encode, "request_id long, n_rows long, payload binary")
    )
