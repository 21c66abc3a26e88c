"""Data-governance queries: single-pass profiling, constraint suites,
SCD2 history, and the skew-salted join — with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.profile import (
    check_constraints,
    profile_columns,
    profile_drift_psi,
)
from kafka_streams_common_spark.operators.skewjoin import salted_join
from kafka_streams_common_spark.queries.registry import query, table

# One UNION ALL branch per profiled column — the oracle replays the
# operator's single-pass metrics column by column. DECIMAL-exact mean
# (round 6dp -> DECIMAL(28,12) sum, order-free) matches the operator.
_PROFILE_BRANCH = """
SELECT '{col}' AS "column",
       count(*) AS n_rows,
       count(*) - count({col}) AS n_nulls,
       count({col}) / CAST(count(*) AS DOUBLE) AS completeness,
       count(DISTINCT {col}) AS n_distinct,
       CAST(min({col}) AS VARCHAR) AS min_value,
       CAST(max({col}) AS VARCHAR) AS max_value,
       {mean} AS mean_value
FROM ev
"""

_MEAN = (
    "CAST(sum(CAST(round(CAST({col} AS DOUBLE), 6) AS DECIMAL(28,12)))"
    " AS DOUBLE) / count({col})"
)

_PROFILE_ORACLE = (
    "WITH ev AS (SELECT event_id, user_id, event_type,"
    " CAST(value AS DECIMAL(18,6)) AS value_d, props FROM events)\n"
    + "\nUNION ALL\n".join(
        _PROFILE_BRANCH.format(
            col=c,
            mean=(
                _MEAN.format(col=c)
                if c in ("event_id", "user_id", "value_d")
                else "CAST(NULL AS DOUBLE)"
            ),
        )
        for c in ("event_id", "user_id", "event_type", "value_d", "props")
    )
)


@query("dq_profile_events", oracle=_PROFILE_ORACLE)
def dq_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style single-pass column profiling of the event stream —
    completeness / distinct / min / max / decimal-exact mean for every
    column in ONE table scan. ``value`` is pre-cast to DECIMAL(18,6) so
    its min/max render identically as strings on any engine (raw double
    formatting is engine-specific); at 100 TB the same query runs with
    ``approx=True`` (HLL distinct counts, constant-size partials)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("value_d"),
        "props",
    )
    return profile_columns(
        ev, ["event_id", "user_id", "event_type", "value_d", "props"]
    )


# Approx-mode profile gate: the HLL sketch has no cross-engine oracle,
# so — like agg_hll_mergeable_rollup — the hash-gated row carries the
# EXACT metrics plus a sketch-within-10% invariant boolean (rsd=0.02 ⇒
# 10% ≈ 5σ; HLL is deterministic for fixed data, so the row is stable).
_PROFILE_APPROX_BRANCH = """
SELECT '{col}' AS "column",
       count(*) AS n_rows,
       count(*) - count({col}) AS n_nulls,
       count({col}) / CAST(count(*) AS DOUBLE) AS completeness,
       CAST(min({col}) AS VARCHAR) AS min_value,
       CAST(max({col}) AS VARCHAR) AS max_value,
       {mean} AS mean_value,
       TRUE AS nd_within_10pct
FROM ev
"""

_PROFILE_APPROX_ORACLE = (
    "WITH ev AS (SELECT event_id, user_id, event_type,"
    " CAST(value AS DECIMAL(18,6)) AS value_d, props FROM events)\n"
    + "\nUNION ALL\n".join(
        _PROFILE_APPROX_BRANCH.format(
            col=c,
            mean=(
                _MEAN.format(col=c)
                if c in ("event_id", "user_id", "value_d")
                else "CAST(NULL AS DOUBLE)"
            ),
        )
        for c in ("event_id", "user_id", "event_type", "value_d", "props")
    )
)

_PROFILE_COLS = ["event_id", "user_id", "event_type", "value_d", "props"]


@query("dq_profile_events_approx", oracle=_PROFILE_APPROX_ORACLE)
def dq_profile_events_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB default mode of the profiler: ``approx=True`` swaps the
    exact COUNT(DISTINCT) Expand (rows × |columns| in one pass) for
    per-column HyperLogLog sketches — constant-size mergeable partials,
    so the whole profile is a single map-side-combinable aggregation at
    any scale. The sketch estimate has no bit-exact cross-engine oracle,
    so the gated row replaces ``n_distinct`` with a within-10%-of-exact
    invariant boolean (the exact counts come from a second,
    test-gate-only aggregation; production runs only the sketch pass)."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("value_d"),
        "props",
    )
    prof = profile_columns(ev, _PROFILE_COLS, approx=True, rsd=0.02)
    exact = ev.agg(
        *[F.countDistinct(c).cast("double").alias(c) for c in _PROFILE_COLS]
    )
    ex_long = exact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).alias("exact_nd"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("e")
    ).select("e.*")
    return prof.join(F.broadcast(ex_long), "column").select(
        "column",
        "n_rows",
        "n_nulls",
        "completeness",
        "min_value",
        "max_value",
        "mean_value",
        (
            F.abs(F.col("n_distinct") - F.col("exact_nd"))
            <= 0.1 * F.col("exact_nd")
        ).alias("nd_within_10pct"),
    )


_CONSTRAINT_ORACLE = """
WITH a AS (
  SELECT count(*) AS n,
         count(DISTINCT o_orderkey) AS ndk,
         min(o_totalprice) AS minp,
         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
           AS bad_status,
         sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                    OR o_orderdate >= TIMESTAMP '2031-01-01'
                  THEN 1 ELSE 0 END) AS bad_date,
         count(o_custkey) AS nck
  FROM orders
)
SELECT 'orderkey_unique' AS constraint_name,
       CAST(ndk AS DOUBLE) AS observed, ndk = n AS passed FROM a
UNION ALL
SELECT 'totalprice_non_negative', CAST(minp AS DOUBLE), minp >= 0 FROM a
UNION ALL
SELECT 'orderstatus_in_domain', CAST(bad_status AS DOUBLE),
       bad_status = 0 FROM a
UNION ALL
SELECT 'orderdate_in_bounds', CAST(bad_date AS DOUBLE), bad_date = 0 FROM a
UNION ALL
SELECT 'custkey_complete', CAST(nck AS DOUBLE), nck = n FROM a
"""


@query("dq_constraints_orders", oracle=_CONSTRAINT_ORACLE)
def dq_constraints_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite over ``orders`` — uniqueness, domain,
    bounds, completeness — verified in ONE aggregation pass (the whole
    suite costs a single scan however many checks it holds)."""
    orders = table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    bad_status = F.sum(
        (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
    )
    bad_date = F.sum(
        (
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2031-01-01").cast("timestamp"))
        ).cast("long")
    )
    return check_constraints(
        orders,
        [
            (
                "orderkey_unique",
                F.countDistinct("o_orderkey"),
                F.countDistinct("o_orderkey") == n,
            ),
            (
                "totalprice_non_negative",
                F.min("o_totalprice"),
                F.min("o_totalprice") >= 0,
            ),
            ("orderstatus_in_domain", bad_status, bad_status == 0),
            ("orderdate_in_bounds", bad_date, bad_date == 0),
            ("custkey_complete", F.count("o_custkey"), F.count("o_custkey") == n),
        ],
    )


@query(
    "scd2_user_event_history",
    oracle="""
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build from a changelog: each user's event
    stream becomes validity intervals ``[valid_from, valid_to)`` per
    state with an ``is_current`` flag — the dimension-history
    materialization a warehouse derives from exactly the kind of
    changelog the reference's KTables carry (``KTableRegistry.java:41-57``
    keeps only the latest row; SCD2 keeps the full interval history).

    Scale shape: one window partitioned by the entity key — the same
    single hash exchange a latest-per-key compaction needs; no
    self-join (the naive interval build joins the changelog to itself).
    Tie-break on ``event_id`` makes the interval chain deterministic
    under equal timestamps."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "join_salted_skew_events",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def join_salted_skew_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact/dimension join: events (power-law per-user
    volume) joined to customers through ``salted_join`` — the dimension
    side replicated ``B=8``× so each hot user key spreads over 8
    reducers. The salt is derived from ``hash(event_id)`` (deterministic,
    reproducible), and the result is EXACTLY the unsalted join — the
    oracle is the plain equi-join. At this fixture scale Spark would
    broadcast the dimension anyway; the query pins the semantics so the
    non-broadcastable case (TB-scale dimension + known-hot keys, where
    AQE's skew split can't help a downstream keyed agg) is covered."""
    events = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return salted_join(
        events, customer, on="user_id", salt_source="event_id", salt_buckets=8
    ).select("event_id", "user_id", "c_mktsegment", "value")


@query(
    "scd2_temporal_lookup",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER w AS valid_to
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    live AS (
      SELECT * FROM iv WHERE valid_to IS NULL OR valid_to > valid_from
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, live.state
    FROM orders o
    LEFT JOIN live
      ON o.o_custkey = live.user_id
     AND o.o_orderdate >= live.valid_from
     AND (live.valid_to IS NULL OR o.o_orderdate < live.valid_to)
    """,
)
def scd2_temporal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 history: for each
    order, the customer's state (their latest event type) AS OF the
    order date — the temporal join every warehouse runs against a
    slowly-changing dimension. The naive plan is the BETWEEN join the
    oracle spells (an interval cross-product per user); the scalable
    plan used here exploits that SCD2 intervals PARTITION the timeline,
    so "interval containing t" ≡ "greatest valid_from ≤ t" — a backward
    as-of join (one union, one keyed sort, one carry window).
    Zero-length intervals (equal-timestamp changelog ties) are filtered
    on both sides so the two spellings agree exactly."""
    from pyspark.sql import Window, functions as F

    from kafka_streams_common_spark.operators.asof import asof_join

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .filter(
            F.col("valid_to").isNull()
            | (F.col("valid_to") > F.col("valid_from"))
        )
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    )
    out = asof_join(
        orders,
        iv.withColumnRenamed("user_id", "o_custkey"),
        on="o_custkey",
        left_time="o_orderdate",
        right_time="valid_from",
        right_cols=["state"],
        dedup_right=False,  # valid_from unique per key after the filter
    )
    return out.select("o_orderkey", "o_custkey", "o_orderdate", "state")


@query(
    "dq_drift_psi_totalprice",
    oracle="""
    WITH a AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
               WHERE o_orderkey % 2 = 0),
    b AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
          WHERE o_orderkey % 2 = 1),
    s AS (SELECT min(x) AS mn, max(x) AS mx
          FROM (SELECT x FROM a UNION ALL SELECT x FROM b)),
    ca AS (
      SELECT least(CAST(floor((x - s.mn) / (s.mx - s.mn) * 10) AS BIGINT), 9)
               AS bucket, count(*) AS n_a
      FROM a, s GROUP BY 1
    ),
    cb AS (
      SELECT least(CAST(floor((x - s.mn) / (s.mx - s.mn) * 10) AS BIGINT), 9)
               AS bucket, count(*) AS n_b
      FROM b, s GROUP BY 1
    ),
    g AS (
      SELECT r.bucket,
             coalesce(ca.n_a, 0) AS n_a,
             coalesce(cb.n_b, 0) AS n_b
      FROM range(10) r(bucket)
      LEFT JOIN ca ON r.bucket = ca.bucket
      LEFT JOIN cb ON r.bucket = cb.bucket
    ),
    t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM g)
    SELECT g.bucket, g.n_a, g.n_b,
           CAST(g.n_a + 1 AS DOUBLE) / CAST(t.ta + 10 AS DOUBLE) AS p_a,
           CAST(g.n_b + 1 AS DOUBLE) / CAST(t.tb + 10 AS DOUBLE) AS p_b,
           round(
             (CAST(g.n_a + 1 AS DOUBLE) / CAST(t.ta + 10 AS DOUBLE)
              - CAST(g.n_b + 1 AS DOUBLE) / CAST(t.tb + 10 AS DOUBLE))
             * ln((CAST(g.n_a + 1 AS DOUBLE) / CAST(t.ta + 10 AS DOUBLE))
                  / (CAST(g.n_b + 1 AS DOUBLE) / CAST(t.tb + 10 AS DOUBLE))),
             8) AS psi_term
    FROM g, t
    """,
)
def dq_drift_psi_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (``operators/profile.py:
    profile_drift_psi``): Population Stability Index between two
    simulated ingest batches of order totals, decomposed per bucket so
    an alert names WHERE the distribution moved. Completes the
    governance ladder profile → constraints → drift. The oracle
    replays the identical bucket/smoothing/log arithmetic."""
    orders = table(spark, sf_dir, "orders")
    return profile_drift_psi(
        orders.filter(F.col("o_orderkey") % 2 == 0),
        orders.filter(F.col("o_orderkey") % 2 == 1),
        "o_totalprice",
        n_buckets=10,
    )


@query(
    "cdc_snapshot_diff_orders",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 10 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 1
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus <> n.o_orderstatus
       OR o.o_totalprice <> n.o_totalprice
    """,
)
def cdc_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed from two snapshots (``operators/rollup.py:
    snapshot_diff``): the reverse of the CDC-apply rows — keys dropped
    since the old snapshot register as deletes, newly present keys as
    inserts, value changes (here a simulated status rewrite on every
    7th order) as updates; unchanged keys never leave their partitions.
    One key-partitioned full outer join + map-side row digests; output
    is change-volume-sized. The oracle diffs the same two snapshots
    column-by-column (the fixture has no NULLs in the diffed columns,
    so digest and column comparison agree; the operator's digest is the
    NULL-safe general form)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 10 != 0)
    new = orders.filter(F.col("o_orderkey") % 10 != 1).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    from kafka_streams_common_spark.operators.rollup import snapshot_diff

    return snapshot_diff(old, new, ["o_orderkey"])


@query(
    "dq_quarantine_bad_records",
    oracle="""
    WITH flagged AS (
      SELECT
        CASE WHEN NOT regexp_matches(props, '^\\{"k": -?[0-9]+\\}$')
             THEN 1 ELSE 0 END AS bad_props,
        CASE WHEN regexp_matches(props, '^\\{"k": -?[0-9]+\\}$')
              AND (CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT)
                     >= 95
                   OR CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1)
                           AS BIGINT) < 0)
             THEN 1 ELSE 0 END AS k_out_of_range,
        CASE WHEN value > 300.0 THEN 1 ELSE 0 END AS value_extreme
      FROM events
    ),
    c AS (
      SELECT count(*) AS n_total,
             sum(bad_props) AS n_bad_props,
             sum(k_out_of_range) AS n_k_oor,
             sum(value_extreme) AS n_val,
             sum(CASE WHEN bad_props = 0 AND k_out_of_range = 0
                       AND value_extreme = 0 THEN 1 ELSE 0 END) AS n_pass
      FROM flagged
    )
    SELECT reason, n_records,
           CAST(n_records AS DOUBLE) / CAST(n_total AS DOUBLE) AS fraction
    FROM (
      SELECT 'bad_props' AS reason, CAST(n_bad_props AS BIGINT)
               AS n_records, n_total FROM c
      UNION ALL
      SELECT 'k_out_of_range', CAST(n_k_oor AS BIGINT), n_total FROM c
      UNION ALL
      SELECT 'value_extreme', CAST(n_val AS BIGINT), n_total FROM c
      UNION ALL
      SELECT 'passed', CAST(n_pass AS BIGINT), n_total FROM c
    )
    """,
)
def dq_quarantine_bad_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-record quarantine routing — the dead-letter pattern every
    ingest pipeline needs: each record is checked against an ordered
    rule list (malformed ``props`` payload; parsed ``k`` outside
    [0, 95); ``value`` beyond the 300 operational ceiling) and the
    output is the routing census (records per quarantine reason +
    records passed), the report a data-platform SLO dashboard reads.
    A record failing several rules counts once per reason — quarantine
    topics are per-reason in practice. Scale shape: validity is a
    scan-level expression (regex parse, no JSON UDF, no shuffle), the
    census is ONE scalar aggregate over the scan, and the four report
    rows are an unpivot of that single row — the event log is read
    once and never shuffled. The same predicates applied as a filter
    ARE the quarantine/pass routing split (streaming twin:
    ``foreachBatch`` writing per-reason sinks)."""
    ev = table(spark, sf_dir, "events")
    valid_props = F.col("props").rlike('^\\{"k": -?[0-9]+\\}$')
    k_val = F.regexp_extract("props", '"k": (-?[0-9]+)', 1).cast("bigint")
    bad_props = F.when(~valid_props, 1).otherwise(0)
    k_oor = F.when(
        valid_props & ((k_val >= 95) | (k_val < 0)), 1
    ).otherwise(0)
    val_ext = F.when(F.col("value") > 300.0, 1).otherwise(0)
    c = ev.select(
        bad_props.alias("bad_props"),
        k_oor.alias("k_out_of_range"),
        val_ext.alias("value_extreme"),
    ).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("bad_props").alias("n_bad_props"),
        F.sum("k_out_of_range").alias("n_k_oor"),
        F.sum("value_extreme").alias("n_val"),
        F.sum(
            F.when(
                (F.col("bad_props") == 0)
                & (F.col("k_out_of_range") == 0)
                & (F.col("value_extreme") == 0),
                1,
            ).otherwise(0)
        ).alias("n_pass"),
    )
    report = c.select(
        F.expr(
            "stack(4, 'bad_props', n_bad_props, 'k_out_of_range', n_k_oor,"
            " 'value_extreme', n_val, 'passed', n_pass)"
        ).alias("reason", "n_records"),
        "n_total",
    )
    return report.select(
        "reason",
        F.col("n_records").cast("bigint").alias("n_records"),
        (
            F.col("n_records").cast("double") / F.col("n_total").cast("double")
        ).alias("fraction"),
    )


@query(
    "dq_drift_ks_totalprice",
    oracle="""
    WITH v AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS in_a,
             CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END AS in_b
      FROM orders
    ),
    h AS (
      SELECT x, sum(in_a) AS n_a_v, sum(in_b) AS n_b_v
      FROM v GROUP BY x
    ),
    t AS (SELECT sum(n_a_v) AS na, sum(n_b_v) AS nb FROM h),
    c AS (
      SELECT
        sum(n_a_v) OVER (ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        sum(n_b_v) OVER (ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM h
    )
    SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
           max(abs(CAST(c.ca AS DOUBLE) / CAST(t.na AS DOUBLE)
                   - CAST(c.cb AS DOUBLE) / CAST(t.nb AS DOUBLE)))
             AS d_stat,
           max(abs(CAST(c.ca AS DOUBLE) / CAST(t.na AS DOUBLE)
                   - CAST(c.cb AS DOUBLE) / CAST(t.nb AS DOUBLE)))
             * sqrt(CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)
                    / CAST(t.na + t.nb AS DOUBLE)) AS ks_scaled
    FROM c CROSS JOIN t
    GROUP BY t.na, t.nb
    """,
)
def dq_drift_ks_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the same two
    simulated ingest batches the PSI monitor compares — the BIN-FREE
    companion: PSI can miss drift that stays inside its 10 buckets,
    while KS takes the sup over every observed value (D = max |ECDF_a −
    ECDF_b|, plus the √(n_a·n_b/(n_a+n_b))-scaled statistic fed to the
    asymptotic p-value). Counts per distinct value and both cumulative
    sums are exact BIGINTs; each ECDF point is one double division, so
    the max picks identical doubles on both engines. Values are
    near-distinct, so the histogram is effectively |orders|-sized — the
    cumulative pass therefore runs through ``operators/prefix.py``:
    bounded quantile boundaries bucket the value axis, per-bucket sums
    broadcast back as offsets, within-bucket running sums stay parallel
    — the EXACT sup statistic (the oracle replays the plain
    running-sum form bit-for-bit) with no single-partition sort."""
    from kafka_streams_common_spark.operators.prefix import global_prefix

    orders = table(spark, sf_dir, "orders")

    v = orders.select(
        F.col("o_totalprice").alias("x"),
        (F.col("o_orderkey") % 2 == 0).cast("bigint").alias("in_a"),
        (F.col("o_orderkey") % 2 == 1).cast("bigint").alias("in_b"),
    )
    h = v.groupBy("x").agg(
        F.sum("in_a").alias("n_a_v"), F.sum("in_b").alias("n_b_v")
    )
    t = h.agg(F.sum("n_a_v").alias("na"), F.sum("n_b_v").alias("nb"))
    c = global_prefix(h, ["x"], sum_cols=["n_a_v", "n_b_v"]).select(
        F.col("run_n_a_v").alias("ca"),
        F.col("run_n_b_v").alias("cb"),
    )
    diff = F.abs(
        F.col("ca").cast("double") / F.col("na").cast("double")
        - F.col("cb").cast("double") / F.col("nb").cast("double")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("na", "nb")
        .agg(F.max(diff).alias("d_stat"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            "d_stat",
            (
                F.col("d_stat")
                * F.sqrt(
                    F.col("na").cast("double")
                    * F.col("nb").cast("double")
                    / (F.col("na") + F.col("nb")).cast("double")
                )
            ).alias("ks_scaled"),
        )
    )
