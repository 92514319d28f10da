"""Pluggable encoding-selection policy — the writer-side decision
surface of the reference (SURVEY §2.8; dwio/nimble/encodings/selection/
EncodingSelectionPolicy.h:105-157 ``EncodingSelectionPolicyFactory``,
ManualEncodingSelectionPolicyFactory in
tools/EncodingSelectionPolicies.h): callers inject a policy object
that, given per-stream statistics, chooses each column's encoding.

Spark mapping: Parquet performs the low-level encoding, but the
*choice* surface remains — per-column dictionary on/off, per-column
bloom filters, and the table codec are writer knobs
(``WriteOptions``). A policy here is a plain callable

    policy(profiles: dict[str, ColumnProfile]) -> PolicyDecision

fed by ONE distributed statistics pass over the input (the analogue of
the reference computing stream statistics before selection). The
decision is merged into ``WriteOptions`` and recorded verbatim in the
manifest's ``user_metadata["encoding_policy"]`` so readers can audit
what the policy chose against what Parquet actually did
(``encoding_report`` shows predicted-vs-actual side by side).

At 100 TB the profiling pass uses ``approx_count_distinct`` (±2% NDV
error is irrelevant to a dictionary on/off decision) and is one
partial-aggregated scan — no shuffle of row data, only the per-column
aggregate state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nimble_spark.sources.table import WriteOptions, write_table

_WIDTHS = {
    T.LongType: 8, T.DoubleType: 8, T.TimestampType: 8,
    T.IntegerType: 4, T.FloatType: 4, T.DateType: 4,
    T.ShortType: 2, T.ByteType: 1, T.BooleanType: 1,
}


@dataclass
class ColumnProfile:
    """Per-column statistics handed to the policy — the stream-stats
    input of the reference's selection (EncodingSelection stats)."""

    name: str
    dtype: str
    n: int
    ndv: int
    null_count: int
    data_bytes: int  # string payload bytes; n*width for fixed types

    @property
    def ndv_ratio(self) -> float:
        return self.ndv / self.n if self.n else 0.0


@dataclass
class PolicyDecision:
    """What a policy may decide — the WriteOptions subset that maps to
    the reference's per-column encoding choice."""

    no_dictionary_cols: list[str] = field(default_factory=list)
    bloom_cols: list[str] = field(default_factory=list)
    compression: Optional[str] = None  # None → keep caller's codec

    def as_metadata(self) -> dict[str, str]:
        return {
            "no_dictionary_cols": ",".join(sorted(self.no_dictionary_cols)),
            "bloom_cols": ",".join(sorted(self.bloom_cols)),
            "compression": self.compression or "",
        }


EncodingPolicy = Callable[[dict[str, ColumnProfile]], PolicyDecision]


def profile_columns(df: DataFrame, approx: bool = True) -> dict[str, ColumnProfile]:
    """One aggregation pass computing every column's profile. ``approx``
    uses HLL NDV (the 100 TB default); exact NDV for small inputs or
    tests."""
    ndv_fn = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    cols: list[tuple[str, T.DataType]] = []
    for f in df.schema.fields:
        if type(f.dataType) not in _WIDTHS and not isinstance(f.dataType, T.StringType):
            continue
        cols.append((f.name, f.dataType))
        aggs.append(ndv_fn(f.name).alias(f"{f.name}::ndv"))
        aggs.append(F.count(f.name).alias(f"{f.name}::nn"))
        if isinstance(f.dataType, T.StringType):
            aggs.append(F.coalesce(F.sum(F.length(f.name)), F.lit(0)).alias(f"{f.name}::bytes"))
    row = df.agg(*aggs).first().asDict()
    n = row["__n"]
    out: dict[str, ColumnProfile] = {}
    for name, dtype in cols:
        if isinstance(dtype, T.StringType):
            data_bytes = int(row[f"{name}::bytes"])
        else:
            data_bytes = n * _WIDTHS[type(dtype)]
        out[name] = ColumnProfile(
            name=name,
            dtype=dtype.simpleString(),
            n=n,
            ndv=int(row[f"{name}::ndv"]),
            null_count=n - int(row[f"{name}::nn"]),
            data_bytes=data_bytes,
        )
    return out


def min_size_policy(
    dict_ndv_ratio: float = 0.5,
    bloom_max_ndv_ratio: float = 0.05,
    bloom_min_ndv: int = 2,
) -> EncodingPolicy:
    """The default factory — the ManualEncodingSelectionPolicyFactory
    analogue. Rules:

    - dictionary stays ON only while it can pay for itself: estimated
      dictionary size (distinct payload + index stream) below plain
      size, approximated as ndv/n < ``dict_ndv_ratio``. High-NDV
      columns (ids, free text) go to ``no_dictionary_cols`` — the
      reference's trivial/plain fallback when dictionary loses the
      size contest (EncodingSelectionPolicy.cpp cost compare).
    - bloom filters on *selective* columns: few distinct values per
      row overall but enough to matter (``bloom_min_ndv`` ≤ ndv,
      ndv/n ≤ ``bloom_max_ndv_ratio``) — the point-lookup columns
      where a bloom prunes row groups.
    """

    def policy(profiles: dict[str, ColumnProfile]) -> PolicyDecision:
        d = PolicyDecision()
        for p in profiles.values():
            if p.n == 0:
                continue
            if p.ndv_ratio >= dict_ndv_ratio:
                d.no_dictionary_cols.append(p.name)
            elif p.ndv >= bloom_min_ndv and p.ndv_ratio <= bloom_max_ndv_ratio:
                d.bloom_cols.append(p.name)
        return d

    return policy


def captured_layout(path: str) -> PolicyDecision:
    """Read the decision a previous policy-driven write recorded in the
    table manifest back into a PolicyDecision — the capture half of
    the reference's encoding-layout replay (EncodingLayoutTree
    captured from a written file, writer/EncodingLayoutTree.cpp)."""
    from nimble_spark.sources.table import read_manifest

    md = read_manifest(path).get("user_metadata", {})

    def _split(key: str) -> list[str]:
        return [c for c in md.get(f"encoding_policy.{key}", "").split(",") if c]

    return PolicyDecision(
        no_dictionary_cols=_split("no_dictionary_cols"),
        bloom_cols=_split("bloom_cols"),
        compression=md.get("encoding_policy.compression") or None,
    )


def replay_policy(decision: PolicyDecision) -> EncodingPolicy:
    """ReplayedEncodingSelectionPolicy analogue
    (dwio/nimble/encodings/selection/EncodingSelectionPolicy.h:470):
    ignore fresh statistics entirely and re-apply a captured layout
    verbatim — the production fast path that skips per-write selection
    once a table's layout has been tuned."""

    def policy(_profiles: dict[str, ColumnProfile]) -> PolicyDecision:
        return PolicyDecision(
            no_dictionary_cols=list(decision.no_dictionary_cols),
            bloom_cols=list(decision.bloom_cols),
            compression=decision.compression,
        )

    return policy


def write_table_with_replay(
    df: DataFrame,
    path: str,
    captured_from: str,
    opts: WriteOptions | None = None,
    report_drift: bool = True,
    approx: bool = True,
) -> tuple[dict, PolicyDecision, list[str]]:
    """Write `df` re-applying the layout captured at `captured_from`,
    optionally reporting DRIFT — the columns where a fresh profile
    would now decide differently (data distribution moved since the
    layout was captured). The replayed decision is applied regardless
    (replay means replay); drift lands in manifest
    ``user_metadata["encoding_policy.drift"]`` so operators can see
    when a captured layout has gone stale and re-tune. With
    ``report_drift=False`` the write skips the profiling pass entirely
    — the reference's motivation for replay (selection cost paid
    once, not per write)."""
    captured = captured_layout(captured_from)
    drift: list[str] = []
    if report_drift:
        fresh = min_size_policy()(profile_columns(df, approx=approx))
        drift = sorted(
            (set(captured.no_dictionary_cols) ^ set(fresh.no_dictionary_cols))
            | (set(captured.bloom_cols) ^ set(fresh.bloom_cols))
        )
    opts = opts or WriteOptions()
    opts.user_metadata = {
        **opts.user_metadata,
        "encoding_policy.replayed_from": captured_from,
        "encoding_policy.drift": ",".join(drift),
    }
    manifest, decision = write_table_with_policy(
        df, path, opts, policy=replay_policy(captured), approx=approx, profiles={}
    )
    return manifest, decision, drift


def write_table_with_policy(
    df: DataFrame,
    path: str,
    opts: WriteOptions | None = None,
    policy: EncodingPolicy | None = None,
    approx: bool = True,
    profiles: dict[str, ColumnProfile] | None = None,
) -> tuple[dict, PolicyDecision]:
    """Profile → policy → write. Policy output is merged into (not
    replacing) the caller's explicit WriteOptions choices, and the
    decision is recorded in manifest user_metadata for audit.
    ``profiles`` short-circuits the statistics pass (pass ``{}`` for
    profile-independent policies like replay)."""
    opts = opts or WriteOptions()
    policy = policy or min_size_policy()
    if profiles is None:
        profiles = profile_columns(df, approx=approx)
    decision = policy(profiles)

    merged_no_dict = sorted(set(opts.no_dictionary_cols or []) | set(decision.no_dictionary_cols))
    merged_bloom = sorted(set(opts.bloom_cols or []) | set(decision.bloom_cols))
    opts.no_dictionary_cols = merged_no_dict
    opts.bloom_cols = merged_bloom
    if decision.compression:
        opts.compression = decision.compression
    opts.user_metadata = {**opts.user_metadata, **{
        f"encoding_policy.{k}": v for k, v in decision.as_metadata().items()
    }}
    manifest = write_table(df, path, opts)
    return manifest, decision
