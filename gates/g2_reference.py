"""Reference-surface gates (SURVEY.md S/M/P/W/A/O families) (split from ``__spark_entry__.py``)."""

from __future__ import annotations

from gates.g1_common import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Reference-surface queries
# ---------------------------------------------------------------------------

def q_blob_enrich(spark, sf_dir):
    return _lineitem_enriched(spark, sf_dir)


def q_mssql_changes(spark, sf_dir):
    return _mssql_changes(spark, sf_dir)


def q_w1_dedup_latest(spark, sf_dir):
    return latest_version_per_key(
        _mssql_changes(spark, sf_dir), "SYS_CHANGE_VERSION"
    )


def q_w2_backfill_dedup(spark, sf_dir):
    return backfill_commit_dedup(
        _synapse_changes(spark, sf_dir), "versionnumber", drop_synapse_deletes=True
    )


def _mssql_target(spark, sf_dir, thr):
    """Per-user latest state at version ≤ thr (simulated bootstrapped target)."""
    ch = _mssql_changes(spark, sf_dir, upper=thr)
    w = Window.partitionBy("ARCANE_MERGE_KEY").orderBy(F.desc("SYS_CHANGE_VERSION"))
    return (
        ch.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__rn", "SYS_CHANGE_OPERATION")
    )


_MSSQL_TARGET_SQL = f"""
SELECT "ARCANE_MERGE_KEY", "SYS_CHANGE_VERSION", user_id, event_type, value
FROM (SELECT *, row_number() OVER (PARTITION BY "ARCANE_MERGE_KEY"
                                   ORDER BY "SYS_CHANGE_VERSION" DESC) AS rn
      FROM ({_mssql_changes_sql("event_id <= thr.v")}))
WHERE rn = 1
"""


def q_m1_merge_sqlserver(spark, sf_dir):
    thr = _events_threshold(spark, sf_dir)
    target = _mssql_target(spark, sf_dir, thr)
    source = _mssql_changes(spark, sf_dir, lower=thr)
    return merge_apply(target, source, SQL_SERVER_CHANGE_TRACKING)


_M1_SQL = f"""
WITH tgt AS ({_MSSQL_TARGET_SQL}),
src0 AS ({_mssql_changes_sql("event_id > thr.v")}),
src AS (
  SELECT * FROM (SELECT *, rank() OVER (PARTITION BY "ARCANE_MERGE_KEY"
                                        ORDER BY "SYS_CHANGE_VERSION" DESC) AS rk
                 FROM src0) WHERE rk = 1
),
j AS (
  SELECT t."ARCANE_MERGE_KEY" AS tk, s."ARCANE_MERGE_KEY" AS sk,
         t."SYS_CHANGE_VERSION" AS tv, t.user_id AS tu, t.event_type AS tt,
         t.value AS tval,
         s."SYS_CHANGE_VERSION" AS sv, s."SYS_CHANGE_OPERATION" AS sop,
         s.user_id AS su, s.event_type AS st, s.value AS sval
  FROM tgt t FULL JOIN src s ON t."ARCANE_MERGE_KEY" = s."ARCANE_MERGE_KEY"
)
SELECT
  CASE WHEN use_source THEN sk ELSE tk END AS "ARCANE_MERGE_KEY",
  CASE WHEN use_source THEN sv ELSE tv END AS "SYS_CHANGE_VERSION",
  CASE WHEN use_source THEN su ELSE tu END AS user_id,
  CASE WHEN use_source THEN st ELSE tt END AS event_type,
  CASE WHEN use_source THEN sval ELSE tval END AS value
FROM (
  SELECT *,
    (tk IS NOT NULL AND sk IS NOT NULL AND sop != 'D' AND sv > tv)
      OR (tk IS NULL) AS use_source
  FROM j
)
WHERE (sk IS NULL)
   OR (tk IS NOT NULL AND sk IS NOT NULL AND NOT (sop = 'D'))
   OR (tk IS NULL AND sop != 'D')
"""


def _synapse_split(spark, sf_dir, thr):
    ch = _synapse_changes(spark, sf_dir)
    w = Window.partitionBy("ARCANE_MERGE_KEY").orderBy(F.desc("versionnumber"))
    target = (
        ch.filter(F.col("versionnumber") <= thr)
        .withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__rn", "IsDelete")
    )
    source = ch.filter(F.col("versionnumber") > thr)
    return target, source


def q_m2_merge_synapse(spark, sf_dir):
    thr = _events_threshold(spark, sf_dir)
    target, source = _synapse_split(spark, sf_dir, thr)
    return merge_apply(target, source, SYNAPSE_LINK)


_M2_SQL = f"""
WITH ch AS ({_SYNAPSE_CHANGES_SQL}),
thr AS ({_THR_SQL}),
tgt AS (
  SELECT "ARCANE_MERGE_KEY", "Id", versionnumber, event_type, value
  FROM (SELECT ch.*, row_number() OVER (PARTITION BY "ARCANE_MERGE_KEY"
                                        ORDER BY versionnumber DESC) AS rn
        FROM ch, thr WHERE versionnumber <= thr.v)
  WHERE rn = 1
),
src0 AS (SELECT ch.* FROM ch, thr WHERE versionnumber > thr.v),
src AS (
  SELECT * FROM (SELECT *, rank() OVER (PARTITION BY "ARCANE_MERGE_KEY"
                                        ORDER BY versionnumber DESC) AS rk
                 FROM src0) WHERE rk = 1
),
j AS (
  SELECT t."ARCANE_MERGE_KEY" AS tk, t."Id" AS tid, t.versionnumber AS tv,
         t.event_type AS tt, t.value AS tval,
         s."ARCANE_MERGE_KEY" AS sk, s."Id" AS sid, s.versionnumber AS sv,
         s."IsDelete" AS sdel, s.event_type AS st, s.value AS sval
  FROM tgt t FULL JOIN src s ON t."ARCANE_MERGE_KEY" = s."ARCANE_MERGE_KEY"
)
SELECT
  CASE WHEN use_source THEN sk ELSE tk END AS "ARCANE_MERGE_KEY",
  CASE WHEN use_source THEN sid ELSE tid END AS "Id",
  CASE WHEN use_source THEN sv ELSE tv END AS versionnumber,
  CASE WHEN use_source THEN st ELSE tt END AS event_type,
  CASE WHEN use_source THEN sval ELSE tval END AS value
FROM (
  SELECT *,
    (tk IS NOT NULL AND sk IS NOT NULL
     AND coalesce(sdel, false) = false AND sv > tv)
      OR (tk IS NULL) AS use_source
  FROM j
)
WHERE (sk IS NULL)
   OR (tk IS NOT NULL AND sk IS NOT NULL AND NOT coalesce(sdel, false))
   OR (tk IS NULL AND coalesce(sdel, false) = false)
"""


def _li_thresholds(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    mx = li.agg(F.max("l_orderkey")).first()[0]
    return (mx * 4) // 10, (mx * 2) // 10


def q_m3_merge_upsert(spark, sf_dir):
    """Flagship: blob-parquet CDC upsert (S8 → P4 → W1 → M3 vertical).

    Plan shape (the r2 version scanned + SHA-256-hashed lineitem twice and
    shuffled the target side twice): both merge branches now hang off ONE
    ``repartition(ARCANE_MERGE_KEY)`` whose subtree is identical, so Spark's
    ReuseExchange writes the shuffle once and reads it twice — one scan, one
    SHA-256 pass, one exchange. The target dedup groups by the merge key
    alone (key = SHA-256(l_orderkey, l_linenumber), so the groups are the
    same as (key, ok, ln)); that agg, the W1 collapse window, and the
    full-outer merge join all reuse the same hash partitioning — zero
    additional exchanges after the shared one.
    """
    t4, t2 = _li_thresholds(spark, sf_dir)
    enriched = _lineitem_enriched(spark, sf_dir)
    common = enriched.repartition("ARCANE_MERGE_KEY")
    # bootstrapped target: one row per key (min-aggregate the duplicates)
    target = (
        common.filter(F.col("l_orderkey") <= t4)
        .groupBy("ARCANE_MERGE_KEY")
        .agg(
            F.min("createdon").alias("createdon"),
            F.min("l_orderkey").alias("l_orderkey"),
            F.min("l_linenumber").alias("l_linenumber"),
            F.min("l_quantity").alias("l_quantity"),
            F.min("l_extendedprice").alias("l_extendedprice"),
            F.min("l_returnflag").alias("l_returnflag"),
        )
        .select(
            "ARCANE_MERGE_KEY", "createdon", "l_orderkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_returnflag",
        )
    )
    batch = (
        common.filter(F.col("l_orderkey") > t2)
        .withColumn("createdon", F.lit(200).cast("long"))
        .withColumn("l_quantity", F.col("l_quantity") + 1000)
    )
    return merge_apply(target, batch, UPSERT_BLOB)


_M3_SQL = f"""
WITH enr AS ({_LINEITEM_ENRICHED_SQL}),
mx AS (SELECT (max(l_orderkey) * 4) // 10 AS t4,
              (max(l_orderkey) * 2) // 10 AS t2 FROM lineitem),
tgt AS (
  SELECT "ARCANE_MERGE_KEY", min(createdon) AS createdon, l_orderkey,
         l_linenumber, min(l_quantity) AS l_quantity,
         min(l_extendedprice) AS l_extendedprice,
         min(l_returnflag) AS l_returnflag
  FROM enr, mx WHERE l_orderkey <= mx.t4
  GROUP BY "ARCANE_MERGE_KEY", l_orderkey, l_linenumber
),
src0 AS (
  SELECT "ARCANE_MERGE_KEY", CAST(200 AS BIGINT) AS createdon, l_orderkey,
         l_linenumber, l_quantity + 1000 AS l_quantity, l_extendedprice,
         l_returnflag
  FROM enr, mx WHERE l_orderkey > mx.t2
),
src1 AS (
  SELECT * FROM (SELECT *, rank() OVER (PARTITION BY "ARCANE_MERGE_KEY"
                                        ORDER BY createdon DESC) AS rk
                 FROM src0) WHERE rk = 1
),
-- tie collapse: no delete in this dialect; deterministic single row per key
src AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "ARCANE_MERGE_KEY"
                     ORDER BY createdon DESC, l_orderkey, l_linenumber,
                              l_quantity, l_extendedprice, l_returnflag) AS rn
                 FROM src1) WHERE rn = 1
),
j AS (
  SELECT t."ARCANE_MERGE_KEY" AS tk, t.createdon AS tc, t.l_orderkey AS tok,
         t.l_linenumber AS tln, t.l_quantity AS tq, t.l_extendedprice AS tep,
         t.l_returnflag AS trf,
         s."ARCANE_MERGE_KEY" AS sk, s.createdon AS sc, s.l_orderkey AS sok,
         s.l_linenumber AS sln, s.l_quantity AS sq, s.l_extendedprice AS sep,
         s.l_returnflag AS srf
  FROM tgt t FULL JOIN src s ON t."ARCANE_MERGE_KEY" = s."ARCANE_MERGE_KEY"
)
SELECT
  CASE WHEN use_source THEN sk ELSE tk END AS "ARCANE_MERGE_KEY",
  CASE WHEN use_source THEN sc ELSE tc END AS createdon,
  CASE WHEN use_source THEN sok ELSE tok END AS l_orderkey,
  CASE WHEN use_source THEN sln ELSE tln END AS l_linenumber,
  CASE WHEN use_source THEN sq ELSE tq END AS l_quantity,
  CASE WHEN use_source THEN sep ELSE tep END AS l_extendedprice,
  CASE WHEN use_source THEN srf ELSE trf END AS l_returnflag
FROM (
  SELECT *, (tk IS NOT NULL AND sk IS NOT NULL AND sc > tc) OR (tk IS NULL)
            AS use_source
  FROM j
)
"""


def q_m4_overwrite_backfill(spark, sf_dir):
    """Backfill-overwrite source (W2): dedup + tombstone drop over full feed."""
    return backfill_commit_dedup(
        _synapse_changes(spark, sf_dir), "versionnumber", drop_synapse_deletes=True
    ).select("ARCANE_MERGE_KEY", "Id", "versionnumber", "event_type", "value")


_M4_SQL = f"""
WITH ch AS ({_SYNAPSE_CHANGES_SQL})
SELECT "ARCANE_MERGE_KEY", "Id", versionnumber, event_type, value
FROM (SELECT *, rank() OVER (PARTITION BY "ARCANE_MERGE_KEY"
                             ORDER BY versionnumber DESC) AS rk FROM ch)
WHERE rk = 1 AND coalesce("IsDelete", false) = false
"""

_W2_SQL = f"""
WITH ch AS ({_SYNAPSE_CHANGES_SQL})
SELECT "ARCANE_MERGE_KEY", "Id", versionnumber, "IsDelete", event_type, value
FROM (SELECT *, rank() OVER (PARTITION BY "ARCANE_MERGE_KEY"
                             ORDER BY versionnumber DESC) AS rk FROM ch)
WHERE rk = 1 AND coalesce("IsDelete", false) = false
"""


def q_field_filter(spark, sf_dir):
    enriched = _lineitem_enriched(spark, sf_dir)
    rule = FieldSelectionRule("include", frozenset({"l_quantity"}))
    return apply_field_selection(enriched, rule)


_FIELD_FILTER_SQL = f"""
SELECT "ARCANE_MERGE_KEY", createdon, l_quantity FROM ({_LINEITEM_ENRICHED_SQL})
"""


def q_name_normalize(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    weird = li.select(
        F.col("l_orderkey").alias("o key/1"), F.col("l_quantity").alias("qty%")
    )
    return normalize_columns(weird)


_NAME_NORMALIZE_SQL = "SELECT l_orderkey AS okey1, l_quantity AS qty FROM lineitem"


def q_agg_version_stats(spark, sf_dir):
    """A2/A3-style scalar aggregations per group (max version, sizes)."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("event_id").alias("max_version"),
        F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("value_milli_sum"),
    )


_AGG_VERSION_SQL = """
SELECT event_type, count(*) AS n, max(event_id) AS max_version,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli_sum
FROM events GROUP BY event_type
"""


def q_s2_backfill_scan(spark, sf_dir):
    """S2: full backfill scan with synthetic version 0 / operation 'I' and
    the computed merge key (``get_select_all_query.sql:1-8``,
    ``QueryProvider.scala:76-93``)."""
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        mssql_merge_key("user_id").alias("ARCANE_MERGE_KEY"),
        F.lit(0).cast("long").alias("SYS_CHANGE_VERSION"),
        F.lit("I").alias("SYS_CHANGE_OPERATION"),
        "event_id",
        "user_id",
        "event_type",
        "value",
    )


_S2_SQL = f"""
SELECT {mssql_merge_key_sql('user_id')} AS "ARCANE_MERGE_KEY",
       CAST(0 AS BIGINT) AS "SYS_CHANGE_VERSION",
       'I' AS "SYS_CHANGE_OPERATION",
       event_id, user_id, event_type, value
FROM events
"""


#: S5/M5 shard function — Knuth multiplicative hash of the PK, computable
#: identically in Spark and DuckDB (stands in for SQL Server's
#: ``ABS(CHECKSUM(pk)) % N``, ``QueryProvider.scala:146-150``).
_N_SHARDS = 8
_SHARD_EXPR = f"(l_orderkey * 2654435761) % 2147483647 % {_N_SHARDS}"


def q_m5_shard_combine(spark, sf_dir):
    """S5+M5: read the table as N disjoint shard predicates, combine with
    UNION ALL (the ``INSERT INTO combined SELECT * FROM shard`` step,
    ``DefaultShardCommitQuery.scala:7-8``), and prove the shards are
    disjoint and covering via per-shard stats that must sum to the whole
    table. At scale each filter is a separate JDBC partition predicate
    (``spark.read.jdbc(predicates=...)``); on parquet Spark collapses the
    union of disjoint filters into parallel scans of the same files."""
    li = _read(spark, sf_dir, "lineitem")
    from functools import reduce

    shards = [
        li.filter(F.expr(_SHARD_EXPR) == i).withColumn(
            "shard", F.lit(i).cast("long")
        )
        for i in range(_N_SHARDS)
    ]
    combined = reduce(DataFrame.unionAll, shards)
    return combined.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("l_quantity") * 1000).cast("long")).alias(
            "qty_milli_sum"
        ),
    )


_M5_SQL = f"""
SELECT {_SHARD_EXPR} AS shard, count(*) AS n_rows,
       CAST(sum(CAST(floor(l_quantity * 1000) AS BIGINT)) AS BIGINT) AS qty_milli_sum
FROM lineitem GROUP BY 1
"""


def q_t9_replay_idempotent(spark, sf_dir):
    """T9: applying the same change batch twice equals applying it once —
    the version guards in the MERGE conditions (M1) make replays no-ops
    (``SqlServerChangeTracking.scala:17-58``; exactly-once story §4). The
    oracle is the *single*-merge SQL: parity passing IS the idempotency
    proof."""
    thr = _events_threshold(spark, sf_dir)
    target = _mssql_target(spark, sf_dir, thr)
    source = _mssql_changes(spark, sf_dir, lower=thr)
    once = merge_apply(target, source, SQL_SERVER_CHANGE_TRACKING)
    return merge_apply(once, source, SQL_SERVER_CHANGE_TRACKING)


def q_s9_json_explode(spark, sf_dir):
    """S9: JSON root-pointer relocation + array explode with field renaming
    (``JsonScanner.scala:20-163`` ``jsonRootPointer``/``jsonArrayPointers``).
    Synthesizes a nested doc ``{"payload":{"items":[{v},{v+1}]}}`` from the
    events props, then runs the same select-root → explode → prefix-rename
    chain ``BlobJsonSource._read`` applies to JSONL files."""
    ev = _read(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    doc = F.concat(
        F.lit('{"payload":{"items":[{"v":'),
        k.cast("string"),
        F.lit('},{"v":'),
        (k + 1).cast("string"),
        F.lit("}]}}"),
    )
    parsed = ev.select(
        "event_id",
        F.from_json(
            doc, "struct<payload:struct<items:array<struct<v:bigint>>>>"
        ).alias("j"),
    )
    root = parsed.select("event_id", F.col("j.payload.*"))
    exploded = root.select("event_id", F.explode("items").alias("__x"))
    return exploded.select("event_id", F.col("__x.v").alias("item_v"))


_S9_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_v
FROM events
UNION ALL
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) + 1
FROM events
"""


def q_s7_cdm_csv_parse(spark, sf_dir):
    """S7: quote-aware CSV round-trip (``CdmParser.scala:9-117``). Each doc
    row is serialized to a CSV line whose quoted middle field contains a
    comma (and doubled quotes would be escaped), then parsed back with the
    CDM reader options (``quote='"', escape='"'``). The oracle selects the
    original columns — parity passing proves the parse inverts the
    serialization exactly."""
    docs = _read(spark, sf_dir, "documents")
    snippet = F.concat(F.substring("text", 1, 20), F.lit(", "), F.col("lang"))
    line = F.concat(
        F.col("doc_id").cast("string"),
        F.lit(',"'),
        F.regexp_replace(snippet, '"', '""'),
        F.lit('",'),
        F.col("source"),
    )
    parsed = docs.select(
        F.from_csv(
            line,
            "doc_id bigint, snippet string, source string",
            {"quote": '"', "escape": '"'},
        ).alias("r")
    )
    return parsed.select("r.doc_id", "r.snippet", "r.source")


_S7_SQL = """
SELECT doc_id, substring(text, 1, 20) || ', ' || lang AS snippet, source
FROM documents
"""


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary (sums as milli-unit bigints)."""
    li = _read(spark, sf_dir, "lineitem")
    milli = lambda c: F.floor(c * 1000).cast("long")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(milli(F.col("l_quantity"))).alias("sum_qty_milli"),
            F.sum(milli(F.col("l_extendedprice"))).alias("sum_base_price_milli"),
            F.sum(
                milli(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_price_milli"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 1000) AS BIGINT)) AS BIGINT) AS sum_qty_milli,
       CAST(sum(CAST(floor(l_extendedprice * 1000) AS BIGINT)) AS BIGINT)
           AS sum_base_price_milli,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT))
            AS BIGINT) AS sum_disc_price_milli,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6-shaped forecasting-revenue scalar: the pure
    predicate-pushdown showcase — every filter (date range, discount
    band, quantity cap) must reach the parquet scan, and the plan is a
    single codegen scan→partial-agg→one-row exchange. Milli-unit bigint
    sum, exact on both engines."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_discount") * 1000)
                .cast("long")
            ).alias("revenue_milli"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_TPCH_Q6_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 1000) AS BIGINT))
            AS BIGINT) AS revenue_milli,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.04 AND l_discount <= 0.07 AND l_quantity < 25
"""


def q_tpch_q18ish(spark, sf_dir):
    """TPC-H Q18-shaped large-volume-customer query: per-order quantity
    rollup → filter to the heavy tail → join back to orders and
    customers. The first agg and the join share the l_orderkey/o_orderkey
    partitioning; the customer side broadcasts. Top-100 by (totalprice,
    orderkey) — fully deterministic tiebreak."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor(F.col("l_quantity") * 1000).cast("long")).alias("qty_milli"))
        .filter(F.col("qty_milli") > 150_000)
    )
    joined = (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_orderkey",
            F.floor(F.col("o_totalprice") * 1000).cast("long").alias(
                "totalprice_milli"
            ),
            "qty_milli",
        )
    )
    # orderBy+limit compiles to TakeOrderedAndProject: each partition
    # keeps its local top-100 and the driver merges — never the
    # single-partition global window (the classic top-k scale trap)
    return joined.orderBy(
        F.desc("totalprice_milli"), F.asc("o_orderkey")
    ).limit(100)


_TPCH_Q18_SQL = """
WITH heavy AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor(l_quantity * 1000) AS BIGINT)) AS BIGINT)
             AS qty_milli
  FROM lineitem GROUP BY l_orderkey
  HAVING qty_milli > 150000
)
SELECT c_name, o_orderkey,
       CAST(floor(o_totalprice * 1000) AS BIGINT) AS totalprice_milli,
       qty_milli
FROM orders JOIN heavy ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice_milli DESC, o_orderkey
LIMIT 100
"""


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3-shaped join: broadcast dims, top-10 revenue orders."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    revenue = F.sum(
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000).cast("long")
    ).alias("revenue_milli")
    joined = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(revenue)
        .orderBy(F.desc("revenue_milli"), F.asc("o_orderkey"))
        .limit(10)
    )
    return joined


_TPCH_Q3_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT))
            AS BIGINT) AS revenue_milli
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'O'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue_milli DESC, o_orderkey
LIMIT 10
"""


def q_json_extract(spark, sf_dir):
    """S9-adjacent: JSON property extraction + typed aggregation."""
    ev = _read(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
        F.count(F.when(k > 50, 1)).alias("k_over_50"),
    )


_JSON_EXTRACT_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS k_sum,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                  THEN 1 END) AS k_over_50
FROM events GROUP BY event_type
"""


def q_s9_avro_json(spark, sf_dir):
    """S9 with the reference's schema contract: an Avro record string
    (null-first unions, the ``JsonScanner.scala:20-163`` shape) drives
    the JSON decode via ``avro_schema_to_struct`` → ``from_json`` —
    a user can feed reference-style Avro schemas verbatim."""
    import json as _json

    from arcane_framework_scala_spark.schema.avro_interop import (
        avro_schema_to_struct,
    )

    avro = _json.dumps(
        {
            "type": "record",
            "name": "Props",
            "fields": [
                {"name": "k", "type": ["null", "long"], "default": None}
            ],
        }
    )
    schema = avro_schema_to_struct(avro, require_null_first_unions=True)
    ev = _read(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json(F.col("props"), schema).alias("p")
    )
    return parsed.select("event_id", F.col("p.k").alias("k")).filter(
        F.col("k") > 50
    )


_S9_AVRO_JSON_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
"""


def q_tpch_q5ish(spark, sf_dir):
    """Q5-shaped join tree: region→nation→customer→orders→lineitem revenue
    per nation. Dims broadcast explicitly; the lineitem↔orders join is the
    only real shuffle."""
    region = _read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _read(spark, sf_dir, "nation")
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000
                ).cast("long")
            ).alias("revenue_milli"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_TPCH_Q5ISH_SQL = """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000) AS BIGINT))
            AS BIGINT) AS revenue_milli,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""



#: chained-star-import contract: export EVERYTHING (incl. _helpers)
__all__ = [n for n in list(globals()) if not n.startswith("__")]
