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

    md = read_manifest(path, materialize=False).get("user_metadata", {})

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


# ---------------------------------------------------------------------------
# Learned encoding selection — LearnedEncodingSelectionPolicy analogue
# (dwio/nimble/encodings/selection/EncodingSelectionPolicy.h:339-365:
# an offline-trained linear model over stream statistics predicts
# per-encoding cost; parameters are baked constants "trained offline",
# robust across data). The Spark decision surface is the per-column
# dictionary on/off choice, so the analogue is a logistic model over
# the same profile features the rule policy sees, TRAINED ON MEASURED
# OUTCOMES: measure_dictionary_outcomes writes each column both ways
# and labels which was smaller; fit_encoding_model fits the weights;
# DEFAULT_ENCODING_MODEL carries the offline-trained constants (like
# the reference's 1.52 / 1.13 / 2.589).
# ---------------------------------------------------------------------------


@dataclass
class EncodingPredictionModel:
    """score(profile) > 0 ⇔ dictionary encoding predicted to SHRINK
    the column. Features deliberately mirror ColumnProfile (what the
    selection pass already computes — no extra scan): ndv/n ratio,
    log10(n), null ratio, log10(avg bytes/value). The arithmetic is
    fixed-order so an external engine (the DuckDB oracle) reproduces
    the exact same doubles."""

    w_ndv_ratio: float
    w_log_n: float
    w_null_ratio: float
    w_log_avg_bytes: float
    bias: float

    def features(self, p: ColumnProfile) -> list[float]:
        import math

        avg_bytes = (p.data_bytes / p.n) if p.n else 1.0
        return [
            p.ndv_ratio,
            math.log10(p.n) if p.n else 0.0,
            (p.null_count / p.n) if p.n else 0.0,
            math.log10(max(avg_bytes, 1e-9)),
        ]

    def score(self, p: ColumnProfile) -> float:
        x = self.features(p)
        return (
            self.w_ndv_ratio * x[0]
            + self.w_log_n * x[1]
            + self.w_null_ratio * x[2]
            + self.w_log_avg_bytes * x[3]
            + self.bias
        )

    def predict_dictionary(self, p: ColumnProfile) -> bool:
        return self.score(p) > 0.0


# Offline-trained constants — fit by harness/train_encoding_model.py
# over measure_dictionary_outcomes of the 7 synthetic encoding
# patterns at two sizes + orders/lineitem/customer columns at sf0.01
# (34 measured examples, 31/34 agreement; the 3 misses are
# byte-borderline cases where dict-on and dict-off sizes differ <2%).
# tests/test_learned_encoding.py re-measures a held-out column set and
# asserts agreement. Dominated by the NDV ratio — dictionary stops
# paying as values approach unique — with a bonus for wide values
# (wide strings amortize the index stream; ~1-3-byte values often
# don't, which the rule policy's plain NDV threshold gets wrong).
DEFAULT_ENCODING_MODEL = EncodingPredictionModel(
    w_ndv_ratio=-6.4924,
    w_log_n=-0.329,
    w_null_ratio=0.0,
    w_log_avg_bytes=1.2271,
    bias=2.6116,
)


def measure_dictionary_outcomes(
    df: DataFrame, columns: Optional[list[str]] = None
) -> list[tuple[ColumnProfile, bool]]:
    """Ground-truth generator for training: write each column BOTH
    ways (dictionary on / off) and label whether dictionary was
    smaller on disk. This is the offline-training half of the
    reference's learned policy — expensive by design, run once per
    corpus, never on the write path."""
    import shutil
    import tempfile

    profiles = profile_columns(df, approx=False)
    out: list[tuple[ColumnProfile, bool]] = []
    for name, prof in profiles.items():
        if columns is not None and name not in columns:
            continue
        one = df.select(name).coalesce(1)
        sizes: dict[bool, int] = {}
        for dict_on in (True, False):
            tmp = tempfile.mkdtemp(prefix="nimble_enc_train_") + "/t"
            try:
                write_table(
                    one,
                    tmp,
                    WriteOptions(
                        no_dictionary_cols=[] if dict_on else [name]
                    ),
                )
                from nimble_spark.sources.table import read_manifest

                sizes[dict_on] = sum(
                    f["bytes"] for f in read_manifest(tmp)["files"]
                )
            finally:
                shutil.rmtree(tmp.rsplit("/", 1)[0], ignore_errors=True)
        out.append((prof, sizes[True] < sizes[False]))
    return out


def fit_encoding_model(
    examples: list[tuple[ColumnProfile, bool]],
    epochs: int = 4000,
    lr: float = 0.1,
) -> EncodingPredictionModel:
    """Plain logistic regression (numpy batch gradient descent) over
    the measured outcomes — the smallest model that closes the
    reference's learned-selection row; deterministic (no random
    init)."""
    import numpy as np

    probe = EncodingPredictionModel(0, 0, 0, 0, 0)
    X = np.array([probe.features(p) for p, _ in examples], dtype=float)
    y = np.array([1.0 if label else 0.0 for _, label in examples])
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(epochs):
        z = X @ w + b
        pred = 1.0 / (1.0 + np.exp(-z))
        grad = pred - y
        w -= lr * (X.T @ grad) / len(y)
        b -= lr * float(grad.mean())
    return EncodingPredictionModel(
        w_ndv_ratio=float(w[0]),
        w_log_n=float(w[1]),
        w_null_ratio=float(w[2]),
        w_log_avg_bytes=float(w[3]),
        bias=float(b),
    )


def learned_policy(
    model: Optional[EncodingPredictionModel] = None,
    bloom_max_ndv_ratio: float = 0.05,
    bloom_min_ndv: int = 2,
) -> EncodingPolicy:
    """LearnedEncodingSelectionPolicy analogue: the dictionary on/off
    choice comes from the trained model's prediction instead of the
    rule threshold; the bloom choice (a pruning-index decision the
    reference's model does not cover) keeps the rule."""
    m = model or DEFAULT_ENCODING_MODEL

    def policy(profiles: dict[str, ColumnProfile]) -> PolicyDecision:
        d = PolicyDecision()
        for p in profiles.values():
            if p.n == 0:
                continue
            if not m.predict_dictionary(p):
                d.no_dictionary_cols.append(p.name)
            elif p.ndv >= bloom_min_ndv and p.ndv_ratio <= bloom_max_ndv_ratio:
                d.bloom_cols.append(p.name)
        return d

    return policy


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
