"""Standard OLAP operator categories — SURVEY.md §2.7 dispositions.

The reference implements none of these (no filter/window/set-op/sort appears
anywhere in its source); they are first-class built-ins in this engine and
each gets a named query + DuckDB oracle so coverage is verifiable, not
claimed. Filters/projections are written so Catalyst pushes them into the
parquet scan (asserted in tests via the physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_common_spark.operators.asof import asof_join
from kafka_streams_common_spark.operators.rangejoin import interval_self_pairs
from kafka_streams_common_spark.queries.registry import query, table
from kafka_streams_common_spark.queries._shared_oracles import OHLC_DAILY_ORACLE


# ---------------------------------------------------------------------------
# filters / predicate + projection pushdown
# ---------------------------------------------------------------------------

@query(
    "filter_pushdown_scan",
    oracle="""
    SELECT l_orderkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity < 10.0
    """,
)
def filter_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + column pruning reaching the parquet scan (PushedFilters)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1995-01-01") & (F.col("l_quantity") < 10.0))
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# semi / anti joins
# ---------------------------------------------------------------------------

@query(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# window functions: ranking / analytic / frames
# ---------------------------------------------------------------------------

@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the canonical ranking-window pattern. Total ordering
    (price desc, key asc) keeps results deterministic under parallelism."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "window_running_sum_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window with an explicit ROWS frame (running total)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@query(
    "window_lag_gap_sessionize",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events
    )
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative sum over gap>threshold — the batch
    twin of streaming session windows (SURVEY §2.7 streaming-window row)."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = table(spark, sf_dir, "events")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(order)
    return (
        ev.withColumn(
            "new_session",
            F.when(gap <= 30 * 60, F.lit(0)).otherwise(F.lit(1)),
        )
        .select(
            "user_id",
            "event_id",
            F.sum("new_session").over(cum).cast("bigint").alias("session_id"),
        )
    )


# ---------------------------------------------------------------------------
# sorts / limits / top-k
# ---------------------------------------------------------------------------

@query(
    "global_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: orderBy+limit compiles to TakeOrderedAndProject — a
    per-partition heap + driver merge, no full sort at 100 TB."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_except",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.distinct().subtract(s)  # EXCEPT (distinct) semantics


@query(
    "set_intersect",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube
# ---------------------------------------------------------------------------

@query(
    "rollup_orders_by_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@query(
    "cube_orders_by_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# scalar function library (string / date / math / conditional)
# ---------------------------------------------------------------------------

@query(
    "scalar_function_showcase",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderstatus)                          AS status_upper,
           substr(o_orderpriority, 1, 1)                 AS priority_code,
           concat(o_orderstatus, '-', o_orderpriority)   AS status_priority,
           length(o_orderpriority)                       AS priority_len,
           year(o_orderdate)                             AS order_year,
           month(o_orderdate)                            AS order_month,
           round(o_totalprice, 0)                        AS price_rounded,
           abs(o_totalprice - 100000.0)                  AS price_dist,
           CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS size_class
    FROM orders
    """,
)
def scalar_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.length("o_orderpriority").alias("priority_len"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.round("o_totalprice", 0).alias("price_rounded"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dist"),
        F.when(F.col("o_totalprice") > 200000.0, "big").otherwise("small").alias("size_class"),
    )


# ---------------------------------------------------------------------------
# skew-salted aggregation — same answer as the plain GROUP BY oracle,
# computed via the two-stage hot-key-spreading plan
# ---------------------------------------------------------------------------

@query(
    "salted_agg_orders_by_status",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def salted_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o_orderstatus has 3 values over 150k rows at sf0.1 — a genuinely
    skewed key. The salted two-stage plan answers identically to the naive
    GROUP BY while spreading each hot key over 16 reducers."""
    from kafka_streams_common_spark.functions.skew import salted_aggregate

    out = salted_aggregate(
        table(spark, sf_dir, "orders"),
        key="o_orderstatus",
        aggs={
            "n_orders": ("count", "*"),
            "total_price": ("sum", "CAST(o_totalprice AS DECIMAL(18,2))"),
        },
        n_salt=16,
    )
    return out.withColumn("total_price", F.col("total_price").cast("double"))


# ---------------------------------------------------------------------------
# unpivot / melt + explicit GROUPING SETS
# ---------------------------------------------------------------------------

@query(
    "unpivot_customer_measures",
    oracle="""
    SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS measure, CAST(c_nationkey AS DOUBLE) AS value
    FROM customer
    """,
)
def unpivot_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").withColumn(
        "c_nationkey", F.col("c_nationkey").cast("double")
    )
    return cust.unpivot(
        ids=["c_custkey"],
        values=["c_acctbal", "c_nationkey"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn(
        "measure", F.regexp_replace("measure", "^c_", "")
    )


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# native session windows (batch form of session_window streaming op)
# ---------------------------------------------------------------------------

@query(
    "session_window_per_user",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
      FROM events
    ),
    i AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM i GROUP BY user_id, sid
    """,
)
def session_window_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-minute gap) — the oracle rebuilds the same
    islands via lag + cumulative-sum (session end = last event + gap)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# array aggregation (collect_list) — order pinned by sorting for determinism
# ---------------------------------------------------------------------------

@query(
    "array_agg_order_keys_per_customer",
    oracle="""
    SELECT o_custkey AS key,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
    FROM orders GROUP BY o_custkey
    """,
)
def array_agg_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-family collect_list (AggregationSpec supports it); collection
    order is nondeterministic under parallelism, so both sides sort.

    The array is emitted as a comma-joined string: the driver's pandas
    canonicalization sorts rows and cannot hash list-typed cells
    (``TypeError: unhashable type: 'list'``), so both engines render the
    sorted array deterministically as text.  The array-agg semantics stay
    under test (sort_array ∘ collect_list on the Spark side)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("o_orderkey"))
            ).alias("order_keys")
        )
    )


# ---------------------------------------------------------------------------
# sliding (hopping) time windows — batch form of the streaming window op
# ---------------------------------------------------------------------------

@query(
    "window_sliding_counts",
    oracle="""
    SELECT ws AS window_start, event_type, count(*) AS n_events FROM (
      SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS ws,
             ts, event_type
      FROM events, (SELECT unnest(generate_series(0, 3)) AS k)
    )
    WHERE ts >= ws AND ts < ws + INTERVAL 1 HOUR
    GROUP BY 1, 2
    """,
)
def window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows hopping every 15 minutes (each event lands in 4
    windows). Spark's epoch-aligned window() reproduced in SQL via
    time_bucket minus k slides."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
    )


# ---------------------------------------------------------------------------
# as-of join (point-in-time enrichment) — absent in Spark and the reference
# ---------------------------------------------------------------------------

@query(
    "asof_join_last_order_before_event",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (
                 PARTITION BY o_custkey, o_orderdate
                 ORDER BY o_orderkey DESC, o_totalprice DESC
               ) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           r.o_orderkey, r.o_totalprice
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
)
def asof_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks the user's most recent order at
    or before the event time (union+window construction, operators.asof)."""
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderkey",
        "o_totalprice",
    )
    return asof_join(
        events,
        orders.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )


# ---------------------------------------------------------------------------
# range / interval join (bucketed equi-join construction)
# ---------------------------------------------------------------------------

@query(
    "range_join_events_within_30min",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
           abs(epoch_ms(a.ts) - epoch_ms(b.ts)) AS gap_ms
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 1800000
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within 30 minutes — bucketed interval join
    (operators.rangejoin), exact per the brute-force inequality oracle."""
    return interval_self_pairs(
        table(spark, sf_dir, "events"),
        key="user_id",
        time_col="ts",
        id_col="event_id",
        max_gap_seconds=1800,
    )


# ---------------------------------------------------------------------------
# exact percentiles / distribution analytics
# ---------------------------------------------------------------------------

@query(
    "percentiles_value_by_event_type",
    oracle="""
    SELECT event_type AS key,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def percentiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont` — both linear interpolation)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("key")).agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# pivot (portable CASE form so the oracle is plain ANSI SQL)
# ---------------------------------------------------------------------------

@query(
    "pivot_event_value_by_type",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click_value,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value,
           CAST(sum(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view_value
    FROM events GROUP BY user_id
    """,
)
def pivot_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum(dec).cast("double"))
        .withColumnsRenamed(
            {"click": "click_value", "purchase": "purchase_value", "view": "view_value"}
        )
    )


# ---------------------------------------------------------------------------
# date / interval arithmetic
# ---------------------------------------------------------------------------

@query(
    "date_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d')      AS due_date,
           strftime(o_orderdate, '%Y-%m-%d')                        AS order_day,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                                                                    AS days_since_95,
           dayofweek(o_orderdate)                                   AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')   AS order_month,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def date_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval scalar coverage; date results rendered as ISO strings
    on both sides (date vs datetime64 pandas representations otherwise
    stringify differently). DuckDB dayofweek is 0-based Sunday; Spark is
    1-based — normalized via -1."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    iso = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return o.select(
        "o_orderkey",
        iso(F.date_add(d, 90)).alias("due_date"),
        iso(d).alias("order_day"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        iso(F.date_trunc("month", "o_orderdate")).alias("order_month"),
        iso(F.last_day(d)).alias("month_end"),
    )


# ---------------------------------------------------------------------------
# multi-join analytical queries (TPC-H-shaped) — the bench workhorses
# ---------------------------------------------------------------------------

@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-aggregate, decimal-exact sums."""
    li = table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive predicate + single decimal
    aggregate — the canonical predicate-pushdown query (every filter should
    reach the parquet scan; zero joins, zero shuffles beyond the final
    1-row combine)."""
    li = table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT round(100.0
                 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                            THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                 * CAST(1 - l.l_discount AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                        AS DOUBLE), 6) AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact-dimension join + conditional decimal
    aggregate. The part table is a dimension — AQE broadcasts it, the
    lineitem side never shuffles (same posture as the J5 enrichment
    chain); sums are DECIMAL-exact so the division is order-free."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = table(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc_price = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(18,2)"
    )
    promo = F.when(
        F.col("p_type").like("PROMO%"), disc_price
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with a region filter that prunes the
    dimension chain before it touches the fact tables. All dims broadcast;
    the only shuffles are fact-fact (lineitem ⋈ orders) and the final agg."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c, orders o, lineitem l
    WHERE c.c_mktsegment = 'BUILDING'
      AND c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → group. The
    customer side is broadcast (small after the segment filter)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "agg_approx_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS approx_within_10pct
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts per event type — the
    cardinality-sketch pass a pipeline runs when exact COUNT(DISTINCT) is
    too expensive (HLL is a fixed-size mergeable sketch: one partial
    aggregate per partition, one tiny merge shuffle — vs exact distinct's
    full shuffle of every (type, user) pair at 100 TB).

    The HLL ESTIMATE itself has no cross-engine oracle (DuckDB's
    approx_count_distinct is a different implementation), so — like
    llm_pack_sequences — the query emits the hash-gateable INVARIANT
    instead: exact counts plus a boolean asserting the sketch landed
    within 10% of exact. The margin is deliberately ~5σ of the configured
    2% rsd: a 5% gate is only ~2.5σ, which on unseen driver data (HLL in
    dense mode at larger cardinalities) a group can legitimately miss
    (~1% per group) — a spurious gate failure, not a broken sketch. A
    genuinely broken sketch still flips the boolean; the estimate's
    tighter 2%-rsd accuracy is pinned in tests/test_operators.py where a
    flake re-runs rather than failing a round gate.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct(F.col("user_id")).cast("bigint").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                <= 0.10 * F.col("exact_users")
            ).alias("approx_within_10pct"),
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated semi-join + priority rollup.

    Adapted predicate: the fixture lineitem has no
    l_commitdate/l_receiptdate, so the "late line" witness is
    l_shipdate > o_orderdate + 60 days — same correlated-EXISTS plan
    shape (LeftSemi join on the order key, never a row multiplier, so
    the count stays per-order no matter how many lines match). The date
    filter prunes orders BEFORE the join; at 100 TB AQE picks
    broadcast vs shuffle for the semi join from the filtered size.
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    witness = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return witness.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top returned-item revenue customers in a quarter.

    Plan shape: both filters (order date window, returnflag) push into
    their scans before any join; nation is broadcast (25 rows at any SF);
    customer joins after the fact-side aggregate keys are known via AQE.
    The final top-20 is TakeOrderedAndProject (per-partition partial
    top-N, driver merges 20 rows) — never a global sort. Tie-break on
    c_custkey makes the LIMIT set deterministic.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume-order customers (HAVING over a fact
    aggregate, then enrichment joins).

    Plan shape: the lineitem aggregate reduces the fact table to one row
    per qualifying order BEFORE any join — map-side partial sums combine
    per partition, and the post-HAVING survivor set is tiny, so both the
    orders and customer joins run broadcast-or-small under AQE. Quantity
    sums are DECIMAL so the HAVING cut is order-free (a double sum could
    straddle the threshold differently per engine). Final top-100 is
    TakeOrderedAndProject with o_orderkey as the tie-break.
    """
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey", F.col("__q").cast("double").alias("sum_qty"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "agg_approx_quantiles_value",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS p50_rank_ok,
           TRUE AS p90_rank_ok,
           TRUE AS p99_rank_ok
    FROM events GROUP BY event_type
    """,
)
def agg_approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile sketch per event type — the quantile sibling
    of the HLL row (`agg_approx_distinct_users`): at 100 TB an exact
    percentile needs the full value multiset per group on one reducer,
    while `approx_percentile` (Greenwald-Khanna sketch) is a fixed-size
    MERGEABLE summary — one partial sketch per partition, one tiny merge.

    Like the HLL row, the sketch VALUE has no cross-engine oracle, so the
    hash-gated row carries the invariant instead: for each q, the
    returned quantile's rank bracket must sit within the sketch's rank
    error — ``count(v < x) ≤ q·n + εn + 1`` and ``count(v ≤ x) ≥ q·n −
    εn − 1`` (the two-sided form is tie-proof: duplicated values inflate
    only the ≤ count, never the < count). ε = 1/accuracy per Spark's
    contract; the +1 absorbs rank discreteness. A broken sketch lands
    outside the bracket and flips the boolean. Second pass is one
    broadcast join of the per-group sketch outputs (|groups| rows) back
    onto the fact scan — no extra fact shuffle beyond the group agg.
    """
    acc = 10_000
    eps = 1.0 / acc
    ev = table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], acc).alias("ap")
    )
    # null-SAFE sketch join: a plain equi-join would drop rows with NULL
    # event_type while the oracle's GROUP BY emits a NULL group — a
    # latent hash mismatch if the fixture ever gains NULL event types
    j = ev.join(
        F.broadcast(sk.withColumnRenamed("event_type", "__et")),
        F.col("event_type").eqNullSafe(F.col("__et")),
    ).drop("__et")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for i, q in enumerate((0.5, 0.9, 0.99)):
        lt = F.sum(
            F.when(F.col("value") < F.element_at("ap", i + 1), 1).otherwise(0)
        )
        le = F.sum(
            F.when(F.col("value") <= F.element_at("ap", i + 1), 1).otherwise(0)
        )
        aggs.append(lt.alias(f"__lt{i}"))
        aggs.append(le.alias(f"__le{i}"))
    g = j.groupBy("event_type").agg(*aggs)
    out = [F.col("event_type"), F.col("n_events").cast("bigint").alias("n_events")]
    for i, (q, name) in enumerate(
        ((0.5, "p50_rank_ok"), (0.9, "p90_rank_ok"), (0.99, "p99_rank_ok"))
    ):
        bound = F.lit(q) * F.col("n_events") + F.lit(eps) * F.col("n_events") + 1
        lower = F.lit(q) * F.col("n_events") - F.lit(eps) * F.col("n_events") - 1
        out.append(
            ((F.col(f"__lt{i}") <= bound) & (F.col(f"__le{i}") >= lower)).alias(name)
        )
    return g.select(*out)


@query(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year —
    the deepest join chain in the headline analytics set (lineitem →
    supplier → nation, and through orders → customer → nation on the
    other leg).

    Plan shape: supplier/customer/nation are dimensions — all four
    broadcast, so the only exchange the FACT side can ever pay is the
    lineitem↔orders key join (two fact tables: a genuine shuffle at
    100 TB, AQE-broadcast on small inputs) plus the final
    (nation, nation, year) aggregate, whose keys have trivial
    cardinality. The date filter pushes into the lineitem scan, and at
    scale the right order-side plan is the TPC-H classic: filter orders
    by the already-joined supplier-nation leg's keys (runtime filter /
    DPP) before the shuffle. DECIMAL revenue, year() as bigint on both
    engines.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           c.user_id IS NOT NULL AS reached_click,
           p.user_id IS NOT NULL AS reached_purchase,
           CAST(1 + CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS funnel_stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase) per user — the
    product-analytics staple: each stage's timestamp must STRICTLY follow
    the previous stage's earliest qualifying timestamp (the
    strict-sequential-min definition, which is pure relational algebra —
    no session windows, no UDF — so both engines replay it exactly).

    Scale shape: every aggregate and join keys on user_id, so AQE plans
    one partitioning reused across the chain; each stage's input is
    pre-filtered to ONE event type before any join (the scan predicate
    prunes the other types), and stage outputs are |users|-sized — the
    funnel narrows monotonically, so downstream joins see shrinking
    sides and broadcast when small. Implemented by the reusable k-step
    operator :func:`operators.funnel.funnel_conversion` — a user brings
    their own ordered (stage, predicate) list.
    """
    from kafka_streams_common_spark.operators.funnel import funnel_conversion

    return funnel_conversion(
        table(spark, sf_dir, "events"),
        [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s, lineitem l1, orders o, nation n
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
      AND s.s_nationkey = n.n_nationkey
      AND n.n_name = 'NATION_1'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS / NOT EXISTS double correlation — the
    classic anti-join stress, and the last standard join family with no
    registered exemplar (suppliers who were the SOLE failing supplier on
    a multi-supplier finished order).

    Adapted witness: the fixture lineitem has no commit/receipt dates
    (same adaptation as Q4, TPC-H 21.2.17.2), so "failed the order" is
    l_returnflag = 'R'. Both correlated subqueries decorrelate to joins
    on the ORDER KEY with a suppkey inequality as residual:
    EXISTS → LeftSemi, NOT EXISTS → LeftAnti — never a row multiplier,
    never a cartesian (plan-pinned in tests/test_plans.py).

    Scale shape: l1 is pre-filtered to 'R' lines of 'F' orders before
    any join; the semi join, anti join and orders join ALL key on
    l_orderkey, so AQE plans one hash partitioning of lineitem reused
    across the three joins (the one legitimate fact shuffle);
    supplier and the single-nation filter broadcast. At 100 TB the
    orders-status filter prunes the orders scan and the final rollup
    keys on |suppliers-in-one-nation| — trivial cardinality.
    """
    li = table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        l1.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
    FROM part p, lineitem l, supplier s, nation n, region r
    WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA' AND p.p_size = 25
      AND l.l_extendedprice / l.l_quantity = (
          SELECT min(l2.l_extendedprice / l2.l_quantity)
          FROM lineitem l2, supplier s2, nation n2, region r2
          WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery — which supplier
    in a region offers each part at the minimum unit price.

    Adapted: the fixture has no partsupp table, so the part↔supplier
    cost relation is lineitem with unit price l_extendedprice /
    l_quantity (pure double division — bit-identical on both engines,
    so the min-equality probe is exact and the result hash-gates).

    The correlated subquery decorrelates the way Catalyst itself would:
    one per-part MIN aggregate over the region-filtered lines, joined
    back on (partkey, unit_price = min). Both the aggregate and the
    probe join key on l_partkey — one fact partitioning, reused. All
    four dimensions (part pre-filtered by size, supplier, nation,
    region) broadcast; the p_size filter prunes the part scan
    (PushedFilters, plan-pinned). DISTINCT collapses equal-price line
    repeats of the same (part, supplier).
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 25)
        .select("p_partkey", "p_name")
    )
    # region-filtered part↔supplier offers, pre-pruned to the parts that
    # can reach the output (the correlation key makes this equivalent)
    offers = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    min_price = offers.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_price").alias("min_price")
    )
    return (
        offers.join(
            min_price,
            (F.col("l_partkey") == F.col("mk"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .distinct()
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — the scalar
    MAX-over-aggregated-view subquery family (keeps ties, unlike a
    LIMIT 1).

    Plan shape: ONE fact aggregation builds the revenue view (the date
    filter pushes into the scan, map-side partial sums); the scalar max
    reduces that |suppliers|-sized view to one broadcast row, and the
    equality probe + supplier join both run against the view, never the
    fact table again. DECIMAL sums make the max-equality exact on both
    engines (a double sum would be partial-aggregation-order-dependent
    and could miss the max row by an ulp).
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                                     AS DOUBLE) / count(*)
                         FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery + NOT EXISTS anti-join —
    "dormant high-balance customers" per nation (the global-sales-
    opportunity query).

    Adapted witness: the fixture's every customer has SOME order, so
    the classic "no orders at all" predicate is vacuous; dormancy is
    instead "no order since 2000-01-01" — same decorrelated plan: the
    date filter prunes the orders scan BEFORE the anti-join (pushed to
    parquet), the positive-balance average reduces to one broadcast
    row probed as a filter, and the anti-join keys on the customer id.
    At 100 TB: customer shuffles once on c_custkey for the anti-join
    against date-pruned orders; the average is a single mergeable
    aggregate (no second customer scan — Spark reuses the cached scan
    relation). The average follows the repo's DECIMAL convention
    (exact order-free sum, cast to double, then one division): a plain
    double avg differs between engines in partial-sum order, so a
    balance within an ulp of the mean could flip inclusion and break
    the hash gate even though it feeds a filter, not an output column.
    """
    cust = table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg")
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("__avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH contrib AS (
      SELECT l.l_partkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS v
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
    FROM contrib
    WHERE CAST(v AS DOUBLE) > 0.002 * (SELECT CAST(sum(v) AS DOUBLE)
                                       FROM contrib)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a GLOBAL scalar aggregate — parts
    whose trade value through one nation's suppliers exceeds a fraction
    of that nation's total (the "important stock" share query).

    Adapted: no partsupp table, so per-part value comes from lineitem
    revenue through the nation's suppliers. The classic plan pitfall is
    scanning the fact table twice (once per side of the comparison);
    here BOTH sides derive from ONE fact aggregation: the global total
    re-aggregates the |parts|-sized contrib view (DECIMAL addition is
    associative and exact, so contrib-sum ≡ direct fact-sum
    bit-for-bit), broadcast back as a one-row threshold. Supplier and
    nation broadcast; the only fact exchange is the per-part aggregate.
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    contrib = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            ).alias("v")
        )
    )
    total = contrib.agg(F.sum("v").cast("double").alias("__tot"))
    return (
        contrib.join(
            F.broadcast(total),
            F.col("v").cast("double") > F.lit(0.002) * F.col("__tot"),
        )
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )


@query(
    "events_funnel_stage_counts",
    oracle="""
    WITH ev AS (
      SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-05'
    ),
    v AS (
      SELECT user_id, min(ts) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    ),
    f AS (
      SELECT v.user_id,
             CAST(1 + CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END
                  AS BIGINT) AS funnel_stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
    ),
    x AS (SELECT funnel_stage, count(*) AS n_exact FROM f GROUP BY 1)
    SELECT funnel_stage,
           CAST(sum(n_exact) OVER (ORDER BY funnel_stage DESC) AS BIGINT)
             AS n_reached,
           CAST(sum(n_exact) OVER (ORDER BY funnel_stage DESC) AS DOUBLE)
             / (SELECT count(*) FROM f) AS conversion
    FROM x
    """,
)
def events_funnel_stage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel ROLLUP readout — per stage, how many users reached at
    least that stage and the conversion rate vs funnel entry (the chart
    every product dashboard draws), over the first campaign window
    (events before 2024-01-05 — the cutoff makes all three stages
    populated on the fixture; the unwindowed funnel converges to
    everyone-purchases). Built on the same
    operators.funnel.funnel_conversion output as the per-user query; the
    cumulative at-least count is a 3-row window (|stages| rows — the
    single-partition sort is over stage COUNTS, never user rows), and
    conversion is one exact bigint→double division on both engines.
    """
    from kafka_streams_common_spark.operators.funnel import funnel_conversion

    f = funnel_conversion(
        table(spark, sf_dir, "events").filter(F.col("ts") < "2024-01-05"),
        [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
    )
    counts = f.groupBy("funnel_stage").agg(F.count(F.lit(1)).alias("n_exact"))
    total = f.agg(F.count(F.lit(1)).alias("__total"))
    w = Window.orderBy(F.desc("funnel_stage")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        counts.withColumn("n_reached", F.sum("n_exact").over(w).cast("bigint"))
        .crossJoin(F.broadcast(total))
        .select(
            "funnel_stage",
            "n_reached",
            (F.col("n_reached").cast("double") / F.col("__total")).alias(
                "conversion"
            ),
        )
    )


@query(
    "events_funnel_time_to_convert",
    oracle="""
    WITH ev AS (
      SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-05'
    ),
    v AS (
      SELECT user_id, min(ts) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    ),
    gaps AS (
      SELECT 'click' AS stage,
             epoch_us(c.t2) - epoch_us(v.t1) AS gap_us
      FROM c JOIN v ON c.user_id = v.user_id
      UNION ALL
      SELECT 'purchase' AS stage,
             epoch_us(p.t3) - epoch_us(c.t2) AS gap_us
      FROM p JOIN c ON p.user_id = c.user_id
    )
    SELECT stage,
           CAST(count(*) AS BIGINT) AS n_converted,
           quantile_cont(gap_us, 0.5) / 1000000.0 AS median_ttc_sec,
           quantile_cont(gap_us, 0.9) / 1000000.0 AS p90_ttc_sec
    FROM gaps GROUP BY stage
    """,
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel time-to-convert readout — per transition, how many users
    converted and the median/p90 latency between the previous stage's
    earliest qualifying event and this one's (the attribution chart next
    to every conversion funnel). Built on ``funnel_conversion(...,
    keep_timestamps=True)``: stage gaps come straight off the funnel
    output (no event replay), as exact bigint microseconds
    (``unix_micros`` ≡ DuckDB ``epoch_us`` — no float drift before the
    final seconds division).

    Plan shape: the per-transition unpivot is a map-side explode of a
    k-1 element struct array over the |users|-sized funnel output; the
    only new shuffle is the groupBy on the k-1 stage keys. Exact
    interpolated ``percentile`` (== DuckDB ``quantile_cont``) keeps the
    cross-engine hash gate deterministic; at 100 TB swap it for
    ``approx_percentile`` — the Greenwald-Khanna sketch is mergeable and
    never materializes a group's full gap multiset on one reducer (the
    same exact→sketch substitution documented on
    ``agg_approx_quantiles_value``).
    """
    from kafka_streams_common_spark.operators.funnel import funnel_conversion

    f = funnel_conversion(
        table(spark, sf_dir, "events").filter(F.col("ts") < "2024-01-05"),
        [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        keep_timestamps=True,
    )
    transitions = [("click", "ts_view", "ts_click"),
                   ("purchase", "ts_click", "ts_purchase")]
    gaps = (
        f.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("stage"),
                            (
                                F.unix_micros(F.col(b)) - F.unix_micros(F.col(a))
                            ).alias("gap_us"),
                        )
                        for s, a, b in transitions
                    ]
                )
            ).alias("g")
        )
        .select("g.*")
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        (F.percentile("gap_us", 0.5) / F.lit(1000000.0)).alias("median_ttc_sec"),
        (F.percentile("gap_us", 0.9) / F.lit(1000000.0)).alias("p90_ttc_sec"),
    )


@query(
    "tpch_q12_late_shipment_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment priority counts — conditional
    aggregation over a fact-fact join with a cross-table date-arithmetic
    predicate.

    Adapted witness: the fixture has no l_shipmode/l_commitdate/
    l_receiptdate, so "late" is shipped ≥ 90 days after the order date
    and the grouping key is l_linestatus (same CASE-sum two-bucket
    readout per group). Plan shape: the shipdate year-window pushes into
    the lineitem scan (partition-prunable at scale); the orders join is
    the one genuine fact-fact shuffle, keyed on order key; the
    date-arithmetic lateness predicate evaluates post-join (it references
    both sides — no engine can push it), and the final aggregate has
    |linestatus| groups with map-side partial CASE-sums.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate",
                                              "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint")
            .alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — the double
    aggregation over a LEFT join whose exclusion predicate lives in the
    JOIN condition (customers with zero qualifying orders must still
    appear, in the c_count=0 bucket).

    Adapted witness: no o_comment in the fixture, so the classic
    "not like %special%requests%" exclusion becomes an order-priority
    exclusion — same plan: the filter applies to the orders side BEFORE
    the join (pushed into the scan), never as a WHERE (which would turn
    the left join inner and drop the zero bucket). At 100 TB the first
    aggregate keys on c_custkey — the same key the join just shuffled
    on, so AQE reuses the partitioning; the second aggregate's domain is
    |distinct order counts| (tiny).
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy(F.col("c_count").cast("bigint").alias("c_count"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey,
             0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*)) AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < a.threshold
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue — the per-group AVG
    correlated subquery family (each lineitem compares against ITS
    part's average quantity).

    Adapted witness: no p_container, so the part filter is brand-only.
    Decorrelated plan: one per-part average aggregate over lineitem
    (the fact scans once for the averages, once for the probe — the
    classic Q17 shape; at 100 TB both passes shuffle on l_partkey and
    AQE shares the partitioning), the brand filter broadcasts the tiny
    part dimension (~1/25 of parts) and — through the join — prunes the
    probe side before the threshold comparison. The average follows the
    repo's DECIMAL convention (exact order-free sum → double → one
    division) so the strict < threshold comparison is bit-identical on
    both engines; the final scalar is a single partial-summed DECIMAL
    total divided by the Q17-constant 7.0.
    """
    li = table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("threshold")
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    GROUP BY ()
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive cross-table predicates — three OR'd
    (brand, size-range, quantity-range) branches over a part⋈lineitem
    join, the classic test that an optimizer extracts the common
    single-table conjuncts out of an OR.

    Adapted witness: no l_shipmode/l_shipinstruct conjuncts (columns
    absent). Plan shape: the part-side disjunction (brand ∈ {1,2,3} ∧
    size bounds) is derivable per branch, so part prunes to ~3 brands
    and broadcasts; the quantity bounds (1..30 overall) reach the
    lineitem scan as an OR-of-ranges pushed filter; the residual
    cross-table OR evaluates post-join. One scalar DECIMAL revenue sum.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q8_national_market_share",
    oracle="""
    WITH vol AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           COALESCE(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                  THEN volume END) AS DOUBLE), 0.0)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — one nation's supplier share of
    a region's order volume per year (conditional-sum over
    conditional-sum, the share-of-total family with SEVEN relations).

    Plan shape: of the seven relations only lineitem↔orders is
    fact-fact (one genuine key shuffle at 100 TB); customer, supplier,
    both nation roles, and region all broadcast, and the region filter
    prunes the customer leg through two broadcast hops before the fact
    join. Numerator and denominator come from the SAME aggregation pass
    (a CASE inside sum — never two fact scans); DECIMAL sums make both
    exact, and the final share is one double division. Years with zero
    numerator coalesce to 0.0 rather than null.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    return (
        joined.groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol))
                .cast("double"),
                F.lit(0.0),
            ).alias("__num"),
            F.sum(vol).cast("double").alias("__den"),
        )
        .select(
            "o_year", (F.col("__num") / F.col("__den")).alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
           - CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / 2.0
             AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-type profit by supplier nation and year.

    Adapted witness: no partsupp table, so the cost leg
    (ps_supplycost × qty) becomes retail-price-at-half
    (p_retailprice/2 × qty) — same arithmetic shape: revenue minus a
    part-attributed cost, both legs aggregated in ONE pass over the
    join. Plan shape: the p_name LIKE filter prunes part (~13%) before
    its broadcast, which through the join prunes the fact side;
    supplier/nation broadcast; lineitem↔orders is the one fact-fact
    shuffle. Each leg is an exact DECIMAL sum cast to double only at
    the end — the subtraction of two per-group doubles (and the /2.0)
    is order-free, unlike summing a signed double amount per row.
    """
    li = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (
                F.sum(revenue).cast("double")
                - F.sum(cost).cast("double") / F.lit(2.0)
            ).alias("sum_profit")
        )
    )


@query(
    "tpch_q16_supplier_relationship",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: supplier-relationship count — distinct suppliers able
    to supply each qualifying (brand, type, size), excluding
    black-listed suppliers via NOT IN.

    Adapted witness: no partsupp, so the part↔supplier relation is the
    DISTINCT (l_partkey, l_suppkey) projection of lineitem (exactly the
    pairs that ever traded); no s_comment, so the "customer complaints"
    exclusion becomes negative account balance. Plan shape: the distinct
    pair projection is the only fact shuffle (two columns, map-side
    combine); the negated part predicates cannot prune much, but part
    still broadcasts; NOT IN compiles to a broadcast LeftAnti against
    the ~|bad suppliers| row set (safe here: s_suppkey is non-null by
    construction, and the anti-join — unlike a raw NOT IN — has no
    three-valued-logic trap). count(DISTINCT) re-shuffles |qualifying
    pairs| keyed on the tiny group tuple.
    """
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.count_distinct(F.col("l_suppkey"))
            .cast("bigint")
            .alias("supplier_cnt")
        )
    )


@query(
    "tpch_q20_part_promotion_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 50
    )
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: part-promotion suppliers — the nested IN-subquery
    family (suppliers who moved a significant volume of a named part
    class in one year).

    Adapted witness: no partsupp/ps_availqty, so "stock exceeding half
    of shipped quantity" becomes a per-(supplier, part) shipped-volume
    threshold over the same year window — the decorrelated plan is
    identical: the inner query joins the date-pruned lineitem scan to
    the name-filtered broadcast part, aggregates on the composite
    (suppkey, partkey), applies HAVING, and the surviving supplier ids
    feed a LeftSemi against the supplier dimension (never a full join —
    duplicates in the inner result must not duplicate suppliers).
    DECIMAL quantity sum keeps the strict > threshold exact on both
    engines; nation broadcasts for the output label.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    movers = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__qty"))
        .filter(F.col("__qty") > 50)
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(
            movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


@query(
    "window_rank_functions_showcase",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(rank() OVER w_tie AS BIGINT)        AS price_rank,
           CAST(dense_rank() OVER w_tie AS BIGINT)  AS price_dense_rank,
           percent_rank() OVER w_tie                AS price_percent_rank,
           cume_dist() OVER w_tie                   AS price_cume_dist,
           CAST(row_number() OVER w_total AS BIGINT) AS price_row_number,
           CAST(ntile(4) OVER w_total AS BIGINT)     AS price_quartile,
           first_value(o_orderkey) OVER w_total      AS biggest_order
    FROM orders
    WINDOW
      w_tie AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
      w_total AS (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function family in one pass — rank / dense_rank /
    percent_rank / cume_dist / row_number / ntile / first_value over each
    customer's orders by price. Determinism discipline: the tie-SAFE
    functions (rank, dense_rank, percent_rank, cume_dist — equal keys get
    equal results) run on the price-only ordering, while the
    tie-SENSITIVE ones (row_number, ntile, first_value) require the total
    order (price, orderkey) — mixing them onto the ambiguous ordering is
    the classic nondeterminism bug this exemplar pins against. One
    shuffle on o_custkey serves every function (same partitioning, two
    sort keys sharing a prefix).
    """
    w_tie = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    w_total = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w_tie).cast("bigint").alias("price_rank"),
        F.dense_rank().over(w_tie).cast("bigint").alias("price_dense_rank"),
        F.percent_rank().over(w_tie).alias("price_percent_rank"),
        F.cume_dist().over(w_tie).alias("price_cume_dist"),
        F.row_number().over(w_total).cast("bigint").alias("price_row_number"),
        F.ntile(4).over(w_total).cast("bigint").alias("price_quartile"),
        F.first("o_orderkey").over(w_total).alias("biggest_order"),
    )


@query(
    "array_function_showcase",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
                i -> CAST(embedding[i] AS DOUBLE)
                     * CAST(embedding[i] AS DOUBLE)))) AS l2_norm,
           list_max(list_transform(generate_series(1, len(embedding)),
                i -> CAST(embedding[i] AS DOUBLE))) AS max_dim,
           list_sum(list_transform(generate_series(1, 3),
                i -> CAST(embedding[i] AS DOUBLE))) AS head3_sum,
           CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) < 0))
                AS BIGINT) AS n_negative
    FROM embeddings
    """,
)
def array_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array / higher-order-function surface in one map-only pass over
    the embedding column: size, an L2 norm via a SEQUENTIAL aggregate
    fold (the float-determinism idiom the cosine operators established —
    Spark's aggregate() and DuckDB's list_sum are both left folds, so the
    double sums match bit-for-bit), array_max over a cast transform, a
    slice-sum, and a filtered count. Zero shuffles, whole-stage codegen
    end to end — the shape every vector feature-engineering step should
    compile to.
    """
    e = table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = e.select("vec_id", v.alias("__v"))
    v = F.col("__v")
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return e.select(
        "vec_id",
        F.size(v).cast("bigint").alias("n_dims"),
        F.sqrt(fold(F.transform(v, lambda x: x * x))).alias("l2_norm"),
        F.array_max(v).alias("max_dim"),
        fold(F.slice(v, 1, 3)).alias("head3_sum"),
        F.size(F.filter(v, lambda x: x < 0)).cast("bigint").alias("n_negative"),
    )


@query(
    "window_range_moving_avg",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             -- floor, not CAST (DuckDB CAST rounds; Spark's
             -- timestamp->long truncates, == floor for positive epochs)
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(round(value, 6) AS DECIMAL(18,6)) AS v
      FROM events
    )
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(sum(v) OVER w AS DOUBLE) AS sum_1h,
           CAST(sum(v) OVER w AS DOUBLE) / count(*) OVER w AS avg_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series RANGE-frame moving aggregate: each event's trailing
    1-hour per-user count/sum/mean — the rolling-feature shape (fraud
    velocity, rate limiting, session intensity) that ROWS frames cannot
    express because event spacing is irregular. The frame is keyed on
    epoch SECONDS on both engines (a timestamp-typed RANGE frame would
    tie the result to each engine's interval arithmetic); sums are
    DECIMAL-exact so the hash matches at any partitioning.

    Scale shape: one window partitioned by user — a single hash
    exchange; the RANGE frame is evaluated by Spark's sliding window
    accumulator over each sorted partition, O(events per user), never a
    self-join (the naive trailing-window query is an interval
    self-join, quadratic on hot users)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("sec"))
        .rangeBetween(-3600, 0)
    )
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("sec"),
        F.round("value", 6).cast("decimal(18,6)").alias("v"),
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        F.sum("v").over(w).cast("double").alias("sum_1h"),
        (
            F.sum("v").over(w).cast("double") / F.count(F.lit(1)).over(w)
        ).alias("avg_1h"),
    )


@query(
    "events_zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS s,
             CAST(sum(CAST(round(value * value, 6) AS DECIMAL(28,12)))
                  AS DOUBLE) AS sq
      FROM events GROUP BY event_type
    ),
    m AS (
      SELECT event_type, s / n AS mean,
             sqrt(greatest(sq / n - (s / n) * (s / n), 0.0)) AS std
      FROM stats
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - m.mean) / m.std AS z
    FROM events e JOIN m USING (event_type)
    WHERE m.std > 0 AND abs((e.value - m.mean) / m.std) > 2.5
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly detection: events whose value sits more
    than 2.5 standard deviations from their type's mean. Mean and
    variance derive from DECIMAL-exact sum and sum-of-squares (one
    aggregation pass — Welford/stddev_samp would be float-order-
    dependent across partitions), then the tiny per-type stats table
    broadcasts back onto the fact scan: at 100 TB the facts are scanned
    twice but never shuffled (both the stats aggregation's partial
    combine and the broadcast join keep fact rows on their input
    partitions)."""
    events = table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("value", 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("s"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,12)"))
        .cast("double")
        .alias("sq"),
    )
    m = stats.select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                F.col("sq") / F.col("n")
                - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("std"),
    ).filter(F.col("std") > 0)
    # std > 0 filtered IDENTICALLY on both sides: Spark's non-ANSI
    # division by zero yields NULL (row silently dropped by the z
    # filter) while DuckDB's IEEE float division yields Inf/NaN (row
    # KEPT by abs(z) > 2.5) — a latent parity break on zero-variance
    # groups unless both engines exclude them explicitly.
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        events.join(F.broadcast(m), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
    )


@query(
    "agg_histogram_totalprice",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           25000.0 * CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket_lo,
           count(*) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def agg_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (25k buckets) — the
    profiling/monitoring staple (DuckDB 1.0 has no width_bucket, so the
    binning is explicit floor-division arithmetic that both engines
    evaluate identically on doubles). One hash aggregation keyed on the
    bucket id — map-side combine leaves |buckets| rows per partition,
    so the exchange is histogram-sized, not data-sized, at any corpus
    scale."""
    orders = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000.0).cast("bigint")
    return (
        orders.groupBy(
            bucket.alias("bucket"),
            (F.lit(25000.0) * bucket).alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "stat_corr_price_linecount",
    oracle="""
    WITH lc AS (
      SELECT l_orderkey, count(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT CAST(round(o.o_totalprice, 6) AS DECIMAL(18,6)) AS x,
             CAST(lc.n_lines AS DECIMAL(18,6)) AS y,
             CAST(round(o.o_totalprice * lc.n_lines, 6) AS DECIMAL(28,12)) AS xy,
             CAST(round(o.o_totalprice * o.o_totalprice, 6) AS DECIMAL(28,12)) AS xx,
             CAST(lc.n_lines * lc.n_lines AS DECIMAL(28,12)) AS yy
      FROM orders o JOIN lc ON o.o_orderkey = lc.l_orderkey
    ),
    s AS (
      SELECT count(*) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(xy) AS DOUBLE) AS sxy,
             CAST(sum(xx) AS DOUBLE) AS sxx, CAST(sum(yy) AS DOUBLE) AS syy
      FROM j
    )
    SELECT n AS n_orders,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_r
    FROM s
    """,
)
def stat_corr_price_linecount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between an order's total price and its line
    count, computed from DECIMAL-exact moment sums (built-in ``corr``
    accumulates doubles in partition order — not reproducible across
    partitionings or engines; the moment-sum form is, with the only
    float ops applied once to exact totals). Scale shape: one keyed
    aggregation for line counts (the join key is the aggregation key,
    so AQE reuses the partitioning), then a single constant-size moment
    aggregate — facts are never shuffled twice."""
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    lc = lineitem.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    j = orders.join(lc, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.round("o_totalprice", 6).cast("decimal(18,6)").alias("x"),
        F.col("n_lines").cast("decimal(18,6)").alias("y"),
        F.round(F.col("o_totalprice") * F.col("n_lines"), 6)
        .cast("decimal(28,12)")
        .alias("xy"),
        F.round(F.col("o_totalprice") * F.col("o_totalprice"), 6)
        .cast("decimal(28,12)")
        .alias("xx"),
        (F.col("n_lines") * F.col("n_lines")).cast("decimal(28,12)").alias("yy"),
    )
    s = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("yy").cast("double").alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(F.col("n").alias("n_orders"), corr.alias("corr_r"))


@query(
    "stat_regression_tokens_by_source",
    oracle="""
    WITH m AS (
      SELECT source,
             CAST(length(text) AS DOUBLE) AS x,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS y
      FROM documents
    ),
    s AS (
      SELECT source, count(*) AS n,
             CAST(sum(CAST(round(x, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(round(y, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(round(x * y, 6) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(round(x * x, 6) AS DECIMAL(28,12))) AS DOUBLE) AS sxx
      FROM m GROUP BY source
    )
    SELECT source, n AS n_docs,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept
    FROM s
    WHERE n * sxx - sx * sx <> 0
    """,
)
def stat_regression_tokens_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS: per-source least-squares fit of token count on
    character count, closed-form from DECIMAL-exact moment sums (the
    grouped-model-fit shape — trend per segment, calibration per source —
    without MLlib and without a second pass; ``ml.regression`` would
    shuffle features into an iterative solver for what one exact
    aggregation answers). One hash aggregation keyed on the group; the
    slope/intercept arithmetic runs on the |groups|-sized result."""
    docs = table(spark, sf_dir, "documents")
    m = docs.select(
        "source",
        F.length("text").cast("double").alias("x"),
        F.size(F.split("text", " ")).cast("double").alias("y"),
    )
    s = m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("x", 6).cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(F.round("y", 6).cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(28,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(28,12)"))
        .cast("double")
        .alias("sxx"),
    )
    # Degenerate (zero-x-variance) groups are excluded IDENTICALLY on
    # both sides — Spark's non-ANSI 0/0 yields NULL while DuckDB yields
    # NaN/Inf, a latent hash-parity break if such a group ever appears.
    s = s.filter(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "source",
        F.col("n").alias("n_docs"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


@query(
    "agg_hll_mergeable_rollup",
    oracle="""
    SELECT event_type AS grp,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_10pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__total__',
           CAST(count(DISTINCT user_id) AS BIGINT), TRUE
    FROM events
    """,
)
def agg_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the pre-aggregated sketch-table pattern:
    per-group HLL sketches (``hll_sketch_agg``) roll up to the GLOBAL
    distinct count by merging the |groups|-sized sketch table
    (``hll_union_agg``), never rescanning the facts. At 100 TB this is
    how distinct-count dashboards work: the corpus-sized pass happens
    once to build sketch partials; every coarser rollup (day → month →
    total, type → all-types) is sketch merges over tiny tables. Like the
    other sketch rows, the estimate has no cross-engine oracle, so the
    hash-gated row carries exact counts plus a within-10% invariant
    boolean (HLL lgConfigK=12 ⇒ ~1.6% rsd; 10% ≈ 6σ)."""
    events = table(spark, sf_dir, "events")
    per = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("__sk"),
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct"),
    )
    per_rows = per.select(
        F.col("event_type").alias("grp"),
        "exact_distinct",
        (
            F.abs(
                F.hll_sketch_estimate("__sk") - F.col("exact_distinct")
            )
            <= 0.1 * F.col("exact_distinct")
        ).alias("within_10pct"),
    )
    total_exact = events.agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct")
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est")
    )
    total_row = total_exact.crossJoin(F.broadcast(merged)).select(
        F.lit("__total__").alias("grp"),
        "exact_distinct",
        (
            F.abs(F.col("__est") - F.col("exact_distinct"))
            <= 0.1 * F.col("exact_distinct")
        ).alias("within_10pct"),
    )
    return per_rows.unionByName(total_row)


@query(
    "window_trending_topk",
    oracle="""
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS window_hour, event_type,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY window_hour ORDER BY n_events DESC, event_type
      ) AS rank
      FROM counts
    )
    SELECT window_hour, event_type, n_events, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def window_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items: top-3 event types per tumbling hour — the
    time-bucketed group-count + per-window ranking shape behind every
    trending dashboard. One aggregation keyed on (hour, type) with
    map-side combine, then a window over the |hours × types|-sized
    count table — ranking never touches raw events."""
    events = table(spark, sf_dir, "events")
    counts = events.groupBy(
        F.date_trunc("hour", "ts").alias("window_hour"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("window_hour").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("window_hour", "event_type", "n_events", "rank")
    )


@query(
    "asof_join_next_order_after_event",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (
                 PARTITION BY o_custkey, o_orderdate
                 ORDER BY o_orderkey DESC, o_totalprice DESC
               ) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN r.o_orderdate IS NOT NULL
                 AND r.o_orderdate - e.ts <= INTERVAL 7 DAY
                THEN r.o_orderkey END AS next_orderkey,
           CASE WHEN r.o_orderdate IS NOT NULL
                 AND r.o_orderdate - e.ts <= INTERVAL 7 DAY
                THEN r.o_totalprice END AS next_totalprice
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate
    """,
)
def asof_next_order_after_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: each event attaches the user's
    NEXT order at or after the event time, but only if it lands within 7
    days — the "did this touchpoint convert" attribution readout (the
    forward twin of asof_join_last_order_before_event). Same union+window
    construction sorted descending; the tolerance is a post-carry
    predicate, never a range join."""
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderkey",
        "o_totalprice",
    )
    out = asof_join(
        events,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        direction="forward",
        tolerance=F.expr("INTERVAL 7 DAYS"),
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )


@query(
    "udtf_explode_props_kv",
    oracle="""
    SELECT e.event_id, k.k AS k,
           json_extract_string(e.props, '$.' || k.k) AS v
    FROM events e, unnest(json_keys(e.props)) AS k(k)
    """,
)
def udtf_explode_props_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined TABLE function in LATERAL position — the third leg
    of the BYO-function surface (the reference sketches classpath hooks
    for custom row logic, ``AggregationDefinition.java:24,81-82``; here a
    registered Python UDTF explodes each event's ``props`` JSON into
    one (key, value) row per pair inside plain SQL). Arrow-batched
    (``useArrow``) where the runtime supports it; this row exists to
    drive the UDTF registration + LATERAL plumbing through the external
    gate — a production pipeline would express THIS particular parse as
    ``explode(from_json(...))`` and keep UDTFs for logic built-ins can't
    express."""
    from pyspark.sql.functions import udtf

    class ParsePropsKV:
        def eval(self, s: str):
            if not s:
                return
            body = s.strip().strip("{}")
            for part in body.split(","):
                if ":" in part:
                    k, v = part.split(":", 1)
                    yield k.strip().strip('"'), v.strip()

    try:
        parse_kv = udtf(ParsePropsKV, returnType="k string, v string", useArrow=True)
    except TypeError:  # runtime without the useArrow kwarg
        parse_kv = udtf(ParsePropsKV, returnType="k string, v string")
    spark.udtf.register("parse_props_kv", parse_kv)
    table(spark, sf_dir, "events").select(
        "event_id", "props"
    ).createOrReplaceTempView("__udtf_props_events")
    return spark.sql(
        """
        SELECT e.event_id, p.k, p.v
        FROM __udtf_props_events e, LATERAL parse_props_kv(e.props) p
        """
    )


# ---------------------------------------------------------------------------
# fixed-iteration PageRank — iterative relational algebra, decimal-exact
# ---------------------------------------------------------------------------

@query(
    "graph_pagerank_customer_supplier",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (
      SELECT deg.src AS node,
             CAST(round(1.0 / nn.n, 12) AS DECIMAL(28,12)) AS rank,
             nn.n AS n
      FROM deg, nn
    ),
    c1 AS (
      SELECT e.dst AS node,
             sum(CAST(round(CAST(r0.rank AS DOUBLE) / deg.d, 12)
                      AS DECIMAL(28,12))) AS s
      FROM e JOIN deg ON e.src = deg.src
             JOIN r0 ON e.src = r0.node
      GROUP BY e.dst
    ),
    r1 AS (
      SELECT r0.node,
             CAST(round(0.15 / r0.n, 12) AS DECIMAL(28,12))
             + CAST(0.85 AS DECIMAL(4,3))
               * CAST(coalesce(c1.s, 0) AS DECIMAL(20,12)) AS rank,
             r0.n AS n
      FROM r0 LEFT JOIN c1 ON r0.node = c1.node
    ),
    c2 AS (
      SELECT e.dst AS node,
             sum(CAST(round(CAST(r1.rank AS DOUBLE) / deg.d, 12)
                      AS DECIMAL(28,12))) AS s
      FROM e JOIN deg ON e.src = deg.src
             JOIN r1 ON e.src = r1.node
      GROUP BY e.dst
    ),
    r2 AS (
      SELECT r0.node,
             CAST(round(0.15 / r0.n, 12) AS DECIMAL(28,12))
             + CAST(0.85 AS DECIMAL(4,3))
               * CAST(coalesce(c2.s, 0) AS DECIMAL(20,12)) AS rank,
             r0.n AS n
      FROM r0 LEFT JOIN c2 ON r0.node = c2.node
    ),
    c3 AS (
      SELECT e.dst AS node,
             sum(CAST(round(CAST(r2.rank AS DOUBLE) / deg.d, 12)
                      AS DECIMAL(28,12))) AS s
      FROM e JOIN deg ON e.src = deg.src
             JOIN r2 ON e.src = r2.node
      GROUP BY e.dst
    ),
    r3 AS (
      SELECT r0.node,
             CAST(round(0.15 / r0.n, 12) AS DECIMAL(28,12))
             + CAST(0.85 AS DECIMAL(4,3))
               * CAST(coalesce(c3.s, 0) AS DECIMAL(20,12)) AS rank,
             r0.n AS n
      FROM r0 LEFT JOIN c3 ON r0.node = c3.node
    )
    SELECT node, CAST(floor(rank * 100000000) AS BIGINT) AS pr_e8
    FROM r3
""",
)
def graph_pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) over the undirected
    customer–supplier interaction graph (an edge per distinct
    customer/supplier pair that shares an order) — the iterative
    importance-propagation algorithm beyond connected components,
    entirely in DataFrame algebra (``operators/cluster.py: pagerank``).
    Contributions are rounded-to-12dp DECIMALs so every per-node sum is
    order-free exact; the oracle unrolls the identical three iterations
    in SQL and both engines emit bit-equal floor(rank·1e8) integers.
    Undirected construction ⇒ no dangling nodes ⇒ no dangling-mass
    term. Ranks output for every node in the graph."""
    from kafka_streams_common_spark.operators.cluster import pagerank

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    e0 = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    # r17 (guide §2.4 — remove shuffles outright): no query-level
    # .distinct() after the union. It was provably redundant — e0 is
    # already distinct, src/dst live in disjoint 'c*'/'s*' namespaces so
    # the reversed union cannot re-create a row, and the pagerank
    # operator's own edge .distinct() re-dedups anyway — one full
    # edge-list Exchange+HashAggregate pair existed only to dedup an
    # already-distinct set. Results identical (operator dedups; oracle
    # re-proven at sf0.01 and sf0.1).
    e = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank(e, n_iterations=3, damping=0.85)
    return pr.select(
        "node",
        F.floor(F.col("rank") * 100000000).cast("bigint").alias("pr_e8"),
    )


# ---------------------------------------------------------------------------
# Z-order layout key — data-skipping / OPTIMIZE ZORDER primitive
# ---------------------------------------------------------------------------

@query(
    "zorder_key_orders",
    oracle="""
    WITH s AS (
      SELECT min(CAST(o_custkey AS DOUBLE)) AS mn_c,
             max(CAST(o_custkey AS DOUBLE)) AS mx_c,
             min(o_totalprice) AS mn_p,
             max(o_totalprice) AS mx_p
      FROM orders
    ),
    cells AS (
      SELECT o_orderkey,
             least(CAST(floor((CAST(o_custkey AS DOUBLE) - s.mn_c)
                              / (s.mx_c - s.mn_c) * 65535) AS BIGINT),
                   65535) AS ca,
             least(CAST(floor((o_totalprice - s.mn_p)
                              / (s.mx_p - s.mn_p) * 65535) AS BIGINT),
                   65535) AS cb
      FROM orders, s
    )
    SELECT o_orderkey,
           list_sum(list_transform(generate_series(0, 15),
             i -> (((ca >> i) & 1) << (2 * i))
                + (((cb >> i) & 1) << (2 * i + 1))))::BIGINT AS zkey
    FROM cells
    """,
)
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order layout key over (customer, price) —
    ``operators/zorder.py``: min/max-scale both columns to a 16-bit
    grid in ONE scalar aggregation broadcast back onto the scan, then
    bit-interleave the cells in a codegen fold. Sorting or
    range-partitioning a 100 TB table by this key before writing gives
    every file a tight min/max box on BOTH dimensions, so zone maps
    prune scans filtered on either — the OPTIMIZE ZORDER BY primitive
    Delta/Iceberg run, here as a plain column expression. The oracle
    replays the identical quantization and interleave bit arithmetic."""
    from kafka_streams_common_spark.operators.zorder import zorder_key

    orders = table(spark, sf_dir, "orders")
    return zorder_key(orders, ["o_custkey", "o_totalprice"], bits=16).select(
        "o_orderkey", "zkey"
    )


# ---------------------------------------------------------------------------
# incremental aggregate maintenance — mergeable partial states
# ---------------------------------------------------------------------------

@query(
    "incremental_agg_orders_by_status",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,12)))
                AS DOUBLE) AS sum_totalprice,
           min(o_totalprice) AS min_totalprice,
           max(o_totalprice) AS max_totalprice
    FROM orders GROUP BY o_orderstatus
    """,
)
def incremental_agg_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (``operators/rollup.py``): the orders table arrives as three
    simulated ingest batches; each reduces to a per-status
    partial-state table (count / DECIMAL-exact sum / min / max), and
    the published rollup is a MERGE of states — |groups|-sized inputs,
    no fact rescan. The oracle is the DIRECT aggregate over all facts:
    the gate proves merge-of-partials ≡ full rebuild bit-for-bit, which
    is the algebraic property that lets a 100 TB warehouse restate one
    late day and re-merge instead of rescanning history."""
    from kafka_streams_common_spark.operators.rollup import (
        merge_agg_states,
        partial_agg_state,
    )

    orders = table(spark, sf_dir, "orders")
    batches = [
        orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    states = [
        partial_agg_state(b, ["o_orderstatus"], "o_totalprice")
        for b in batches
    ]
    merged = merge_agg_states(states, ["o_orderstatus"])
    return merged.select(
        "o_orderstatus",
        "n_rows",
        F.col("sum_m").cast("double").alias("sum_totalprice"),
        F.col("min_m").alias("min_totalprice"),
        F.col("max_m").alias("max_totalprice"),
    )


# ---------------------------------------------------------------------------
# record linkage: blocked fuzzy match to a reference dictionary
# ---------------------------------------------------------------------------

@query(
    "er_fuzzy_match_part_names",
    oracle="""
    WITH ref AS (SELECT DISTINCT p_name AS ref_name FROM part),
    dirty AS (
      SELECT p_partkey,
             CASE WHEN substr(p_name, dp, 1) = ' '
                  THEN concat(substr(p_name, 1, dp), substr(p_name, dp + 2))
                  ELSE concat(substr(p_name, 1, dp - 1), substr(p_name, dp + 1))
             END AS dirty_name
      FROM (
        SELECT p_partkey, p_name,
               1 + (('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 15))::BIGINT
                    % length(p_name)) AS dp
        FROM part
      )
    ),
    d_tok AS (
      SELECT p_partkey, dirty_name, unnest(string_split(dirty_name, ' ')) AS tok
      FROM dirty
    ),
    r_tok AS (
      SELECT DISTINCT ref_name, unnest(string_split(ref_name, ' ')) AS tok
      FROM ref
    ),
    cand AS (
      SELECT DISTINCT d.p_partkey, d.dirty_name, r.ref_name
      FROM (SELECT * FROM d_tok WHERE tok <> '') d
      JOIN (SELECT * FROM r_tok WHERE tok <> '') r USING (tok)
    ),
    scored AS (
      SELECT p_partkey, dirty_name, ref_name,
             levenshtein(dirty_name, ref_name) AS dist
      FROM cand
    ),
    best AS (
      SELECT p_partkey, ref_name, dist FROM (
        SELECT p_partkey, ref_name, dist,
               row_number() OVER (
                 PARTITION BY p_partkey ORDER BY dist, ref_name
               ) AS rn
        FROM scored WHERE dist <= 2
      ) WHERE rn = 1
    )
    SELECT d.p_partkey, d.dirty_name,
           b.ref_name AS matched_name,
           CAST(b.dist AS BIGINT) AS distance
    FROM dirty d LEFT JOIN best b USING (p_partkey)
    """,
)
def er_fuzzy_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (``operators/linkage.py``): part names corrupted by
    a deterministic one-character drop (md5-chosen position, shifted off
    spaces) resolved back to the clean name dictionary — token-blocked
    candidates (inverted-index equi-join, never all-pairs), levenshtein
    verification, deterministic (distance, name)-argmin resolution,
    unmatched rows retained as NULLs. The oracle replays the
    perturbation, blocking, and edit-distance bit-for-bit (levenshtein
    is the classic DP in both engines)."""
    from kafka_streams_common_spark.operators.linkage import (
        fuzzy_match_to_reference,
    )
    from kafka_streams_common_spark.functions.hashing import md5_int64

    part = table(spark, sf_dir, "part")
    dp = (md5_int64("p_partkey") % F.length("p_name") + 1).alias("dp")
    base = part.select("p_partkey", "p_name", dp)
    dirty = base.select(
        "p_partkey",
        F.when(
            F.expr("substr(p_name, dp, 1)") == " ",
            F.concat(
                F.expr("substr(p_name, 1, dp)"), F.expr("substr(p_name, dp + 2)")
            ),
        )
        .otherwise(
            F.concat(
                F.expr("substr(p_name, 1, dp - 1)"),
                F.expr("substr(p_name, dp + 1)"),
            )
        )
        .alias("dirty_name"),
    )
    ref = part.select(F.col("p_name").alias("ref_name"))
    return fuzzy_match_to_reference(
        dirty, ref, "dirty_name", "ref_name", "p_partkey", max_distance=2
    )


@query(
    "er_fuzzy_match_brand_ngram",
    oracle="""
    WITH ref AS (SELECT DISTINCT p_brand AS ref_name FROM part),
    dirty AS (
      SELECT p_partkey,
             concat(substr(p_brand, 1, dp - 1), substr(p_brand, dp + 1))
               AS dirty_name
      FROM (
        SELECT p_partkey, p_brand,
               1 + (('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || '|b'),
                     1, 15))::BIGINT % length(p_brand)) AS dp
        FROM part
      )
    ),
    d_tok AS (
      SELECT DISTINCT p_partkey, dirty_name,
             unnest(list_transform(
               range(1, greatest(length(dirty_name) - 2, 1) + 1),
               i -> substr(dirty_name, CAST(i AS INT), 3))) AS tok
      FROM dirty
    ),
    r_tok AS (
      SELECT DISTINCT ref_name,
             unnest(list_transform(
               range(1, greatest(length(ref_name) - 2, 1) + 1),
               i -> substr(ref_name, CAST(i AS INT), 3))) AS tok
      FROM ref
    ),
    cand AS (
      SELECT DISTINCT d.p_partkey, d.dirty_name, r.ref_name
      FROM (SELECT * FROM d_tok WHERE tok <> '') d
      JOIN (SELECT * FROM r_tok WHERE tok <> '') r USING (tok)
    ),
    scored AS (
      SELECT p_partkey, dirty_name, ref_name,
             levenshtein(dirty_name, ref_name) AS dist
      FROM cand
    ),
    best AS (
      SELECT p_partkey, ref_name, dist FROM (
        SELECT p_partkey, ref_name, dist,
               row_number() OVER (
                 PARTITION BY p_partkey ORDER BY dist, ref_name
               ) AS rn
        FROM scored WHERE dist <= 2
      ) WHERE rn = 1
    )
    SELECT d.p_partkey, d.dirty_name,
           b.ref_name AS matched_name,
           CAST(b.dist AS BIGINT) AS distance
    FROM dirty d LEFT JOIN best b USING (p_partkey)
    """,
)
def er_fuzzy_match_brand_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage, n-gram blocking mode (``operators/linkage.py``
    ``blocking="ngram"``) — the SINGLE-token-name witness the token
    mode's own docstring concedes it cannot handle: ``p_brand`` is one
    token ("Brand#NM"), so a one-character drop (md5-chosen position)
    breaks the only whitespace blocking key and token blocking yields
    ZERO candidates. Character-3-gram keys survive any single edit
    (at most 3 of the name's 6 grams die), so every corrupted brand
    still blocks with its entity; levenshtein verifies and the
    (distance, name)-argmin resolves — same inverted-index shape,
    finer keys, reference side still a broadcast. The oracle replays
    perturbation, 3-gram blocking, and scoring bit-for-bit."""
    from kafka_streams_common_spark.operators.linkage import (
        fuzzy_match_to_reference,
    )
    from kafka_streams_common_spark.functions.hashing import md5_int64

    part = table(spark, sf_dir, "part")
    dp = (
        md5_int64(F.concat(F.col("p_partkey").cast("string"), F.lit("|b")))
        % F.length("p_brand")
        + 1
    ).alias("dp")
    dirty = part.select("p_partkey", "p_brand", dp).select(
        "p_partkey",
        F.concat(
            F.expr("substr(p_brand, 1, dp - 1)"),
            F.expr("substr(p_brand, dp + 1)"),
        ).alias("dirty_name"),
    )
    ref = part.select(F.col("p_brand").alias("ref_name"))
    return fuzzy_match_to_reference(
        dirty,
        ref,
        "dirty_name",
        "ref_name",
        "p_partkey",
        max_distance=2,
        blocking="ngram",
        ngram_size=3,
    )


# ---------------------------------------------------------------------------
# marketing attribution + cohort retention (event analytics tier)
# ---------------------------------------------------------------------------

@query(
    "attribution_linear_credit",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT event_id AS touch_id, user_id, ts AS t_ts
      FROM events WHERE event_type = 'click'
    ),
    pairs AS (
      SELECT p.purchase_id, p.user_id, t.touch_id
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.t_ts <= p.p_ts
       AND t.t_ts > p.p_ts - INTERVAL 7 DAY
    )
    SELECT purchase_id, user_id, touch_id,
           CAST(round(1.0 / count(*) OVER (PARTITION BY purchase_id), 8)
                AS DOUBLE) AS credit
    FROM pairs
    """,
)
def attribution_linear_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: every click in a purchase's 7-day
    lookback shares equal credit (1/n per touch) — the one attribution
    shape the backward as-of row (last-touch) cannot express, because
    it needs ALL qualifying touches, not the latest. One user-keyed
    range join (purchases × their own recent clicks — lookback-bounded,
    never all-pairs) plus a purchase-keyed count window over the
    matched touches only. Credit is rounded to 8 dp so the division is
    engine-identical."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
    )
    pairs = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    w = Window.partitionBy("purchase_id")
    return pairs.select(
        "purchase_id",
        "user_id",
        "touch_id",
        F.round(F.lit(1.0) / F.count(F.lit(1)).over(w), 8).alias("credit"),
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH wk AS (
      SELECT user_id,
             to_timestamp((CAST(epoch(ts) AS BIGINT) // 604800) * 604800)
               AS w
      FROM events
    ),
    firsts AS (
      SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT wk.user_id, f.cohort_week,
             (CAST(epoch(wk.w) AS BIGINT)
              - CAST(epoch(f.cohort_week) AS BIGINT)) // 604800
               AS week_offset
      FROM wk JOIN firsts f USING (user_id)
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    cohorted by first-seen week, counted as active per
    weeks-since-cohort. Two hash aggregations (first-seen per user,
    then distinct (user, cohort, offset) → counts) and one user-keyed
    join of the |users|-sized cohort table back onto the events — at
    100 TB the cohort table broadcasts or co-partitions on the user
    key; nothing is ever all-pairs. Week buckets are epoch-aligned
    (`time_bucket`/`timestampadd` arithmetic identical on both
    engines)."""
    ev = table(spark, sf_dir, "events")
    week = F.timestamp_seconds(
        (F.unix_timestamp("ts") / (7 * 86400)).cast("bigint") * (7 * 86400)
    )
    wk = ev.select("user_id", week.alias("w"))
    firsts = wk.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    activity = (
        wk
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                (F.unix_timestamp("w") - F.unix_timestamp("cohort_week"))
                / (7 * 86400)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_users")
    )


@query(
    "graph_triangle_count_copurchase",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.b = e2.a
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph (parts sharing an
    order) via degree-oriented wedge closing
    (``operators/cluster.py: triangle_count`` — Suri & Vassilvitskii's
    'curse of the last reducer' fix: orienting edges toward the
    (degree, id)-larger endpoint caps every node's out-degree at
    O(√|E|), so hub wedge explosion is structurally bounded). The
    oracle is the naive triple self-join — ground truth the oriented
    plan must reproduce exactly."""
    from kafka_streams_common_spark.operators.cluster import triangle_count

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2")
    )
    # no .distinct() here (r16): triangle_count canonicalizes and
    # deduplicates its edge input itself — the query-level distinct was a
    # second full exchange+aggregate over the same 1.2M rows for nothing
    edges = (
        li.join(l2, (li.l_orderkey == l2.o2) & (li.l_partkey < l2.p2))
        .select(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
    )
    return triangle_count(edges)


@query(
    "events_top_paths",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM ordered GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path LIMIT 25
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path analysis: each user's full event-type sequence
    (deterministically ordered by (ts, event_id)) collapsed to a path
    string, top-25 most common journeys — the product-analytics view
    funnels are a special case of. One user-keyed aggregation (the
    in-aggregate sort touches each user's own events only — no global
    window) + a path-keyed count + TakeOrderedAndProject for the
    top-k. Long-tail journeys never reach the driver."""
    ev = table(spark, sf_dir, "events")
    paths = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s.getField("event_type"),
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(25)
    )


@query(
    "events_activity_gaps",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           CAST(sum(CASE WHEN gap_us > 259200000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gaps_over_3d
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence detection — the gaps half of the gaps-and-islands pattern
    (sessions/SCD2 are the islands half): per user, the longest silence
    between consecutive events and how many silences exceeded 3 days —
    the churn-risk / outage readout. One user-partitioned lag window
    (the same single hash exchange every per-entity sequence op here
    pays) + a user-keyed aggregation; deterministic under equal
    timestamps via the event_id tiebreak."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact: the fixture's timestamps carry sub-second
    # precision, and second-truncation vs rounding differs per engine
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.sum((F.col("gap_us") > 259_200_000_000).cast("long"))
        .cast("bigint")
        .alias("n_gaps_over_3d"),
    )


@query(
    "events_concurrency_sweep",
    oracle="""
    WITH iv AS (
      SELECT ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
    ),
    seg AS (
      -- clip each interval at midnight so every segment lives in one day
      SELECT CAST(s AS DATE) AS day, s AS seg_s,
             least(e, CAST(CAST(s AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY) AS seg_e
      FROM iv
      UNION ALL
      SELECT CAST(e AS DATE) AS day,
             CAST(CAST(e AS DATE) AS TIMESTAMP) AS seg_s, e AS seg_e
      FROM iv
      WHERE CAST(e AS DATE) > CAST(s AS DATE)
        AND e > CAST(CAST(e AS DATE) AS TIMESTAMP)
    ),
    edges AS (
      SELECT day, seg_s AS t, 1 AS delta FROM seg
      UNION ALL
      SELECT day, seg_e AS t, -1 AS delta FROM seg
    ),
    run AS (
      SELECT day,
             sum(delta) OVER (
               PARTITION BY day ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS open_now
      FROM edges
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(max(open_now) AS BIGINT) AS max_concurrent
    FROM run GROUP BY day
    """,
)
def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day via the sweep-line rewrite: each event
    opens a 30-minute activity interval; instead of the quadratic
    interval self-join ("how many intervals overlap mine"), intervals
    become +1/-1 edge events and concurrency is a running sum. Clipping
    intervals at midnight makes the running-sum window PARTITIONED by
    day — each day's prefix sums are exact locally, so the plan is one
    day-partitioned sort + window + keyed max, parallel across days,
    with no global single-partition window (the standard scale trap for
    sweep lines). End-exclusive semantics: at equal t the -1 sorts
    before the +1 (ORDER BY t, delta), and the max prefix is invariant
    to permutations of identical edges, so the result is deterministic
    across partitionings and engines."""
    from kafka_streams_common_spark.operators.rollup import (
        peak_concurrency_by_day,
    )

    ev = table(spark, sf_dir, "events")
    return peak_concurrency_by_day(ev, "ts", "INTERVAL 30 MINUTES").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "max_concurrent"
    )


@query(
    "events_cumulative_distinct_users",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ),
    first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    news AS (
      SELECT first_day AS day, count(*) AS new_users
      FROM first_seen GROUP BY first_day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (
             ORDER BY d.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM days d LEFT JOIN news n ON d.day = n.day
    """,
)
def events_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day via the first-touch rewrite:
    the naive form — COUNT(DISTINCT user) over an expanding window —
    re-scans every prior day's users per day (quadratic state, and a
    distinct inside a running frame that neither engine executes
    incrementally). Instead each user contributes exactly once at
    min(day): one user-keyed aggregation over the facts, then a
    day-keyed count, then a running sum over the |days|-sized
    aggregate. The only unpartitioned window runs over days, not
    events — constant-bounded at any corpus size (a year is 365
    rows), the same aggregate-level-window posture as the other
    calendar rollups here."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    news = first_seen.groupBy(F.col("first_day").alias("nday")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    joined = days.join(news, days.day == news.nday, "left").select(
        "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    counts AS (
      SELECT event_type AS from_type, next_type AS to_type,
             count(*) AS n_transitions
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT from_type, to_type,
           CAST(n_transitions AS BIGINT) AS n_transitions,
           CAST(n_transitions AS DOUBLE)
             / CAST(sum(n_transitions) OVER (PARTITION BY from_type)
                    AS DOUBLE) AS p_transition
    FROM counts
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    ordered pair of event types, how often one follows the other in a
    user's (ts, event_id)-ordered stream and the row-normalized
    transition probability. One user-partitioned lead window (the
    shared per-entity sequence exchange), a keyed count, then
    normalization via a window over the |types|²-sized count table —
    aggregate-level, never over facts. The probability is a single
    division of two exact BIGINT counts evaluated in DOUBLE, the same
    expression on both engines — no accumulation-order float risk."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    wtot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wtot).cast("double")
        ).alias("p_transition"),
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH anchor AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS anchor_day FROM orders
    ),
    per AS (
      SELECT o_custkey,
             max(CAST(o_orderdate AS DATE)) AS last_day,
             count(*) AS freq,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mon
      FROM orders GROUP BY o_custkey
    ),
    rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', p.last_day, a.anchor_day) AS BIGINT) AS r_days,
             CAST(p.freq AS BIGINT) AS freq, p.mon
      FROM per p CROSS JOIN anchor a
    ),
    b AS (
      SELECT quantile_cont(CAST(r_days AS DOUBLE), 0.25) AS r1,
             quantile_cont(CAST(r_days AS DOUBLE), 0.50) AS r2,
             quantile_cont(CAST(r_days AS DOUBLE), 0.75) AS r3,
             quantile_cont(CAST(freq AS DOUBLE), 0.25) AS f1,
             quantile_cont(CAST(freq AS DOUBLE), 0.50) AS f2,
             quantile_cont(CAST(freq AS DOUBLE), 0.75) AS f3,
             quantile_cont(mon, 0.25) AS m1,
             quantile_cont(mon, 0.50) AS m2,
             quantile_cont(mon, 0.75) AS m3
      FROM rfm
    )
    SELECT o_custkey, r_days, freq, mon,
           CAST(4 - ((CAST(r_days AS DOUBLE) > b.r1)::INT
                     + (CAST(r_days AS DOUBLE) > b.r2)::INT
                     + (CAST(r_days AS DOUBLE) > b.r3)::INT) AS BIGINT) AS r_score,
           CAST(1 + ((CAST(freq AS DOUBLE) > b.f1)::INT
                     + (CAST(freq AS DOUBLE) > b.f2)::INT
                     + (CAST(freq AS DOUBLE) > b.f3)::INT) AS BIGINT) AS f_score,
           CAST(1 + ((mon > b.m1)::INT + (mon > b.m2)::INT
                     + (mon > b.m3)::INT) AS BIGINT) AS m_score,
           CAST(4 - ((CAST(r_days AS DOUBLE) > b.r1)::INT
                     + (CAST(r_days AS DOUBLE) > b.r2)::INT
                     + (CAST(r_days AS DOUBLE) > b.r3)::INT) AS VARCHAR)
             || CAST(1 + ((CAST(freq AS DOUBLE) > b.f1)::INT
                          + (CAST(freq AS DOUBLE) > b.f2)::INT
                          + (CAST(freq AS DOUBLE) > b.f3)::INT) AS VARCHAR)
             || CAST(1 + ((mon > b.m1)::INT + (mon > b.m2)::INT
                          + (mon > b.m3)::INT) AS VARCHAR) AS segment
    FROM rfm CROSS JOIN b
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation scored
    against broadcast quartile cutpoints — NOT a global ntile: ntile is
    a single-partition total sort over every customer, the classic
    segmentation scale trap. Here one customer-keyed aggregation builds
    the |customers|-sized RFM table, a constant-size (9-value) quantile
    aggregate is broadcast back, and every score is a map-side
    comparison — no global window anywhere, fully parallel at any
    customer count. Quantiles are the SQL-standard interpolated
    definition evaluated in DOUBLE on identical inputs on both engines;
    monetary sums are DECIMAL-exact before the single cast."""
    orders = table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("mon"),
    )
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("anchor_day"))
    rfm = per.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("anchor_day", "last_day").cast("bigint").alias("r_days"),
        "freq",
        "mon",
    )
    b = rfm.agg(
        *[
            F.expr(f"percentile(CAST({c} AS DOUBLE), {p})").alias(f"{c[0]}{i}")
            for c in ("r_days", "freq", "mon")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    scored = rfm.crossJoin(F.broadcast(b))
    rd = F.col("r_days").cast("double")
    fq = F.col("freq").cast("double")
    r_score = (
        F.lit(4)
        - (rd > F.col("r1")).cast("int")
        - (rd > F.col("r2")).cast("int")
        - (rd > F.col("r3")).cast("int")
    ).cast("bigint")
    f_score = (
        F.lit(1)
        + (fq > F.col("f1")).cast("int")
        + (fq > F.col("f2")).cast("int")
        + (fq > F.col("f3")).cast("int")
    ).cast("bigint")
    m_score = (
        F.lit(1)
        + (F.col("mon") > F.col("m1")).cast("int")
        + (F.col("mon") > F.col("m2")).cast("int")
        + (F.col("mon") > F.col("m3")).cast("int")
    ).cast("bigint")
    return scored.select(
        "o_custkey",
        "r_days",
        "freq",
        "mon",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        F.concat(
            r_score.cast("string"), f_score.cast("string"), m_score.cast("string")
        ).alias("segment"),
    )


@query(
    "basket_part_pair_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    tot AS (
      SELECT count(DISTINCT l_orderkey) AS n_baskets FROM baskets
    ),
    pc AS (
      SELECT l_partkey, count(*) AS n_part FROM baskets GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    top AS (
      SELECT part_a, part_b, n_pair FROM pairs
      ORDER BY n_pair DESC, part_a, part_b LIMIT 20
    )
    SELECT t.part_a, t.part_b, CAST(t.n_pair AS BIGINT) AS n_pair,
           CAST(t.n_pair AS DOUBLE) / CAST(tot.n_baskets AS DOUBLE) AS support,
           CAST(t.n_pair * tot.n_baskets AS DOUBLE)
             / CAST(pa.n_part * pb.n_part AS DOUBLE) AS lift
    FROM top t
    JOIN pc pa ON pa.l_partkey = t.part_a
    JOIN pc pb ON pb.l_partkey = t.part_b
    CROSS JOIN tot
    """,
)
def basket_part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: top-20 co-purchased part pairs with
    support and lift. The pair explosion is per-basket quadratic but
    structurally bounded by basket size (TPC-H orders have ≤7 lines;
    real pipelines cap or sample mega-baskets before this step — the
    same max_df posture as the shingle index in dedup). Plan: one
    distinct projection of (basket, item), an orderkey-equi self-join
    (co-partitioned, never cartesian), a pair-keyed count, then
    TakeOrderedAndProject for the top-k; per-part counts and the basket
    total join back against the CONSTANT-size top-20 table, so the
    lift arithmetic — exact BIGINT products evaluated in one DOUBLE
    division — touches 20 rows."""
    li = table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    tot = baskets.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_baskets")
    )
    pc = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_part")
    )
    b2 = baskets.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        baskets.join(
            b2,
            (baskets.l_orderkey == b2.o2) & (baskets.l_partkey < b2.p2),
        )
        .groupBy(
            F.col("l_partkey").alias("part_a"), F.col("p2").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    top = pairs.orderBy(F.desc("n_pair"), "part_a", "part_b").limit(20)
    pa = pc.select(F.col("l_partkey").alias("ka"), F.col("n_part").alias("n_a"))
    pb = pc.select(F.col("l_partkey").alias("kb"), F.col("n_part").alias("n_b"))
    return (
        top.join(pa, top.part_a == pa.ka)
        .join(pb, top.part_b == pb.kb)
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            (F.col("n_pair").cast("double") / F.col("n_baskets").cast("double"))
            .alias("support"),
            (
                (F.col("n_pair") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


@query(
    "timeseries_gapfill_events",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT min(day) AS mn, max(day) AS mx FROM daily
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    filled AS (
      SELECT s.day, coalesce(d.n_events, 0) AS n_events
      FROM spine s LEFT JOIN daily d ON s.day = d.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n_events AS BIGINT) AS n_events,
           strftime(max(CASE WHEN n_events > 0 THEN day END) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), '%Y-%m-%d') AS last_active_day
    FROM filled
    """,
)
def timeseries_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap fill: a generated date spine (sequence + explode
    between the observed min/max day) left-joined to daily counts so
    silent days appear as explicit zeros, plus a forward-filled
    last-active-day column — the resample/ffill primitive time-series
    stores ship natively. The facts collapse to one day-keyed count
    FIRST; the spine join and the forward-fill window run over the
    |days|-sized aggregate (a decade is ~3,650 rows), so the only
    unpartitioned window is constant-bounded — the same
    aggregate-level-window posture as the calendar rollups above."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day")
    )
    filled = (
        spine.join(daily.withColumnRenamed("day", "dday"),
                   spine.day == F.col("dday"), "left")
        .select("day", F.coalesce("n_events", F.lit(0)).alias("n_events"))
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return filled.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.date_format(
            F.max(F.when(F.col("n_events") > 0, F.col("day"))).over(w),
            "yyyy-MM-dd",
        ).alias("last_active_day"),
    )


@query(
    "stat_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
           any_value(d.med) AS med, any_value(m.mad) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0
    GROUP BY d.event_type
    """,
)
def stat_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    resistant twin of events_zscore_outliers (mean/std break down when
    the outliers themselves inflate the std; median/MAD have a 50%
    breakdown point). Two grouped interpolated medians (per-type keyed
    aggregations) with the |types|-sized med/mad tables broadcast back
    for the map-side deviation tests. The mad > 0 guard is applied
    identically on both engines — the zero-variance divide-by-zero
    parity trap the z-score family documents, avoided by construction
    here since MAD gates a comparison, not a division."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.sum((F.col("adev") > 3 * F.col("mad")).cast("long"))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "dq_benford_first_digit",
    oracle="""
    WITH digits AS (
      SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                    1, 1) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
      SELECT digit, count(*) AS n FROM digits GROUP BY digit
    ),
    tot AS (SELECT sum(n) AS total FROM counts)
    SELECT c.digit, CAST(c.n AS BIGINT) AS n,
           CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS obs_share,
           log10(1.0 + 1.0 / CAST(c.digit AS DOUBLE)) AS expected_share,
           CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)
             - log10(1.0 + 1.0 / CAST(c.digit AS DOUBLE)) AS deviation
    FROM counts c CROSS JOIN tot t
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals — the classic
    fabricated-data / unit-mixing detector for financial columns. The
    first significant digit is taken from the INTEGER-string rendering
    (floor → BIGINT → VARCHAR) rather than floating log10 bucketing,
    which misassigns exact powers of ten when log10 lands at
    2.9999999999999996 — integer formatting is engine-stable. One
    map-side digit projection, a 9-row count, shares as single
    divisions of exact BIGINTs, and the Benford expectation
    log10(1 + 1/d) evaluated by the same expression on both engines."""
    orders = table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.col("total").cast("double")).alias(
            "obs_share"
        ),
        expected.alias("expected_share"),
        (
            F.col("n").cast("double") / F.col("total").cast("double") - expected
        ).alias("deviation"),
    )


@query(
    "events_ohlc_daily",
    oracle=OHLC_DAILY_ORACLE,
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling — the time-series bar primitive (open/high/low/
    close per day per series): first/last are defined by the total
    (ts, event_id) order, not arg_min/arg_max whose tie behavior is
    engine-unspecified — two row_number windows over the SAME
    (day, type) partitioning (one sort, both directions derived), then
    a keyed aggregate with conditional first/last extraction. The
    window is partitioned by the bar key, so bars parallelize across
    days×series at any scale; no global sort anywhere."""
    ev = table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    wa = Window.partitionBy(F.to_date("ts"), "event_type").orderBy(
        "ts", "event_id"
    )
    wd = Window.partitionBy(F.to_date("ts"), "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = ev.select(
        day,
        "event_type",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("day", "event_type").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "open",
        "high",
        "low",
        "close",
        "n_events",
    )


@query(
    "graph_link_prediction_jaccard",
    oracle="""
    WITH p AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    e0 AS (
      SELECT p1.l_partkey AS a, p2.l_partkey AS b
      FROM p p1 JOIN p p2
        ON p1.l_orderkey = p2.l_orderkey AND p1.l_partkey < p2.l_partkey
      GROUP BY p1.l_partkey, p2.l_partkey
      HAVING count(*) >= 2
    ),
    bi AS (
      SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
    ),
    deg AS (
      SELECT a AS node, count(*) AS degree FROM bi GROUP BY a
    ),
    bic AS (
      SELECT bi.a, bi.b FROM bi
      JOIN deg da ON da.node = bi.a AND da.degree <= 50
      JOIN deg db ON db.node = bi.b AND db.degree <= 50
    ),
    wedge AS (
      SELECT w1.a AS u, w2.a AS v, count(*) AS inter
      FROM bic w1 JOIN bic w2
        ON w1.b = w2.b AND w1.a < w2.a
      GROUP BY w1.a, w2.a
    ),
    cand AS (
      SELECT w.u, w.v, w.inter,
             du.degree + dv.degree - w.inter AS uni
      FROM wedge w
      JOIN deg du ON du.node = w.u
      JOIN deg dv ON dv.node = w.v
      WHERE NOT EXISTS (
        SELECT 1 FROM e0 WHERE e0.a = w.u AND e0.b = w.v
      )
    )
    SELECT u AS part_a, v AS part_b, CAST(inter AS BIGINT) AS n_common,
           CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
    FROM cand
    ORDER BY jaccard DESC, part_a, part_b LIMIT 20
    """,
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph (edges = part pairs
    co-ordered in ≥2 distinct orders — the support threshold every
    association miner applies first, which keeps the graph sparse and
    the signal real): for part pairs NOT already linked, neighborhood
    Jaccard = |N(a)∩N(b)| / |N(a)∪N(b)| — the "customers who bought X
    also bought Y" recommender signal.
    The wedge join (common-neighbor count through the shared endpoint)
    is the quadratic hazard: a hub of degree d spawns d² wedges, so
    hub nodes above a degree cap (50) are excluded from WEDGE
    GENERATION — the same structural bound triangle counting uses —
    while true degrees still feed the union term. Anti-join removes
    existing edges; top-20 via TakeOrderedAndProject. Intersection and
    union are exact BIGINTs; Jaccard is one DOUBLE division."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2")
    )
    e0 = (
        li.join(l2, (li.l_orderkey == l2.o2) & (li.l_partkey < l2.p2))
        .groupBy(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
        .agg(F.count(F.lit(1)).alias("__w"))
        .filter(F.col("__w") >= 2)
        .select("a", "b")
    )
    bi = e0.unionAll(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = bi.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    capped = (
        bi.join(deg.withColumnRenamed("node", "na"), F.col("a") == F.col("na"))
        .filter(F.col("degree") <= 50)
        .select("a", "b")
        .join(
            deg.select(
                F.col("node").alias("nb"), F.col("degree").alias("db_")
            ),
            F.col("b") == F.col("nb"),
        )
        .filter(F.col("db_") <= 50)
        .select("a", "b")
    )
    w2 = capped.select(F.col("a").alias("v"), F.col("b").alias("bb"))
    wedge = (
        capped.join(w2, (F.col("b") == F.col("bb")) & (F.col("a") < F.col("v")))
        .groupBy(F.col("a").alias("u"), "v")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    cand = (
        wedge.join(
            e0.select(F.col("a").alias("u"), F.col("b").alias("v")),
            ["u", "v"],
            "left_anti",
        )
        .join(
            deg.select(F.col("node").alias("u"), F.col("degree").alias("du")),
            "u",
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("degree").alias("dv")),
            "v",
        )
        .select(
            "u",
            "v",
            "inter",
            (F.col("du") + F.col("dv") - F.col("inter")).alias("uni"),
        )
    )
    return (
        cand.select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.col("inter").cast("bigint").alias("n_common"),
            (F.col("inter").cast("double") / F.col("uni").cast("double")).alias(
                "jaccard"
            ),
        )
        .orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "events_type_overlap_matrix",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    tc AS (
      SELECT event_type, count(*) AS n_type FROM ut GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM ut a JOIN ut b ON a.user_id = b.user_id
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
           CAST(p.n_both AS DOUBLE) / CAST(ta.n_type AS DOUBLE)
             AS p_b_given_a
    FROM pairs p
    JOIN tc ta ON ta.event_type = p.type_a
    """,
)
def events_type_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every ordered pair of event types,
    how many users did BOTH and P(B|A) — the segment-overlap readout
    behind "users who viewed also purchased". The |users|×|types|
    distinct projection is the only fact-sized shuffle; the self-join is
    user-keyed (co-partitioned, per-user row count bounded by |types|,
    so the blowup is |types|² per user, a constant), and the output is
    |types|² rows. Conditional probability is one DOUBLE division of
    exact BIGINTs against the broadcast per-type census."""
    ev = table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    b = ut.select(F.col("user_id").alias("u2"), F.col("event_type").alias("type_b"))
    pairs = (
        ut.join(b, ut.user_id == b.u2)
        .groupBy(F.col("event_type").alias("type_a"), "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return pairs.join(
        F.broadcast(tc.withColumnRenamed("event_type", "type_a")), "type_a"
    ).select(
        "type_a",
        "type_b",
        "n_both",
        (F.col("n_both").cast("double") / F.col("n_type").cast("double")).alias(
            "p_b_given_a"
        ),
    )


@query(
    "window_percent_change_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_events - lag(n_events) OVER (ORDER BY day) AS BIGINT)
             AS delta,
           CAST(n_events - lag(n_events) OVER (ORDER BY day) AS DOUBLE)
             / CAST(lag(n_events) OVER (ORDER BY day) AS DOUBLE)
             AS pct_change
    FROM daily
    """,
)
def window_percent_change_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day traffic change — the dashboard delta/percent tile:
    facts collapse to a day-keyed count FIRST, then one lag window over
    the |days|-sized aggregate (constant-bounded, the shared
    calendar-rollup posture). First day's delta/pct are NULL on both
    engines; the percent is one DOUBLE division of exact BIGINTs."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.orderBy("day")
    prev = F.lag("n_events").over(w)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("n_events") - prev).cast("bigint").alias("delta"),
        (
            (F.col("n_events") - prev).cast("double") / prev.cast("double")
        ).alias("pct_change"),
    )


@query(
    "timeseries_cusum_change",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    m AS (
      SELECT CAST(sum(n_events) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_n
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(sum(n_events) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE)
             - CAST(row_number() OVER (ORDER BY day) AS DOUBLE) * m.mean_n
             AS cusum
    FROM daily CROSS JOIN m
    """,
)
def timeseries_cusum_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point signal over daily volume: cumulative sum of
    deviations from the global mean — the sustained-shift detector a
    point-wise z-score misses (ten days of a small uniform drop never
    trip a per-day threshold but accumulate linearly in CUSUM). The
    deviation sum is restated as exact-BIGINT running counts minus
    rank×mean — ONE float multiply per day instead of a float
    accumulation, so the value is bit-stable on both engines at any
    partitioning. Facts collapse to the |days| census first; the
    running window is constant-bounded."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    m = daily.agg(
        (
            F.sum("n_events").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_n")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wr = Window.orderBy("day")
    return daily.crossJoin(F.broadcast(m)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_events").cast("bigint").alias("n_events"),
        (
            F.sum("n_events").over(w).cast("double")
            - F.row_number().over(wr).cast("double") * F.col("mean_n")
        ).alias("cusum"),
    )


@query(
    "timeseries_dow_seasonality",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    dow AS (
      SELECT dayofweek(day) AS dow,
             count(*) AS n_days,
             sum(n_events) AS n_total
      FROM daily GROUP BY dayofweek(day)
    ),
    tot AS (SELECT sum(n_total) AS grand, sum(n_days) AS all_days FROM dow)
    SELECT CAST(d.dow AS BIGINT) AS dow,
           CAST(d.n_days AS BIGINT) AS n_days,
           CAST(d.n_total AS BIGINT) AS n_total,
           CAST(d.n_total AS DOUBLE) / CAST(d.n_days AS DOUBLE)
             AS avg_per_day,
           (CAST(d.n_total AS DOUBLE) / CAST(d.n_days AS DOUBLE))
             / (CAST(t.grand AS DOUBLE) / CAST(t.all_days AS DOUBLE))
             AS seasonal_index
    FROM dow d CROSS JOIN tot t
    """,
)
def timeseries_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile: average daily volume per weekday
    vs the overall daily average (seasonal index > 1 = busier than
    typical) — the additive-decomposition readout behind staffing and
    anomaly baselines. Two tiny keyed aggregates over the |days| census;
    every ratio is a DOUBLE division of exact BIGINTs evaluated by the
    same expression on both engines. DuckDB's dayofweek (0=Sunday) is
    matched by Spark's ``dayofweek()-1``."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    dow = daily.groupBy(
        (F.dayofweek("day") - F.lit(1)).cast("bigint").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n_events").cast("bigint").alias("n_total"),
    )
    tot = dow.agg(
        F.sum("n_total").alias("grand"), F.sum("n_days").alias("all_days")
    )
    avg = F.col("n_total").cast("double") / F.col("n_days").cast("double")
    overall = F.col("grand").cast("double") / F.col("all_days").cast("double")
    return dow.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_days",
        "n_total",
        avg.alias("avg_per_day"),
        (avg / overall).alias("seasonal_index"),
    )


@query(
    "customer_revenue_concentration",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY o_custkey
    ),
    b AS (
      SELECT quantile_cont(rev, 0.1) AS q1, quantile_cont(rev, 0.2) AS q2,
             quantile_cont(rev, 0.3) AS q3, quantile_cont(rev, 0.4) AS q4,
             quantile_cont(rev, 0.5) AS q5, quantile_cont(rev, 0.6) AS q6,
             quantile_cont(rev, 0.7) AS q7, quantile_cont(rev, 0.8) AS q8,
             quantile_cont(rev, 0.9) AS q9
      FROM per
    ),
    bucketed AS (
      SELECT CAST(1 + (rev > b.q1)::INT + (rev > b.q2)::INT
                    + (rev > b.q3)::INT + (rev > b.q4)::INT
                    + (rev > b.q5)::INT + (rev > b.q6)::INT
                    + (rev > b.q7)::INT + (rev > b.q8)::INT
                    + (rev > b.q9)::INT AS BIGINT) AS decile,
             rev
      FROM per CROSS JOIN b
    ),
    agg AS (
      SELECT decile, count(*) AS n_customers,
             CAST(sum(CAST(round(rev, 2) AS DECIMAL(18,2))) AS DOUBLE)
               AS decile_rev
      FROM bucketed GROUP BY decile
    ),
    tot AS (SELECT sum(CAST(round(rev, 2) AS DECIMAL(18,2))) AS grand FROM per)
    SELECT a.decile, CAST(a.n_customers AS BIGINT) AS n_customers,
           a.decile_rev,
           a.decile_rev / CAST(t.grand AS DOUBLE) AS revenue_share
    FROM agg a CROSS JOIN tot t
    """,
)
def customer_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by customer decile — the Pareto/80-20
    readout: customers bucketed into revenue deciles by BROADCAST
    quantile cutpoints (the RFM trick again — a global ntile would
    single-partition-sort every customer), then per-decile revenue and
    share of total. DECIMAL-exact revenue sums on both engines; shares
    are single divisions of exact totals. The whole curve is ten rows
    computed from one customer-keyed aggregation plus two broadcast
    scalars."""
    orders = table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    b = per.agg(
        *[
            F.expr(f"percentile(rev, {q / 10})").alias(f"q{q}")
            for q in range(1, 10)
        ]
    )
    decile = F.lit(1)
    for q in range(1, 10):
        decile = decile + (F.col("rev") > F.col(f"q{q}")).cast("int")
    bucketed = per.crossJoin(F.broadcast(b)).select(
        decile.cast("bigint").alias("decile"), "rev"
    )
    agg = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.round("rev", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("decile_rev"),
    )
    tot = per.agg(
        F.sum(F.round("rev", 2).cast("decimal(18,2)")).alias("grand")
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_customers",
        "decile_rev",
        (F.col("decile_rev") / F.col("grand").cast("double")).alias(
            "revenue_share"
        ),
    )


@query(
    "agg_countmin_heavy_hitters",
    oracle="""
    WITH hashes AS (SELECT unnest(generate_series(0, 3)) AS i),
    sk AS (
      SELECT h.i,
             ('0x' || substr(md5('cm' || CAST(h.i AS VARCHAR) || ':'
                                 || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT
               % 256 AS bucket,
             count(*) AS c
      FROM events e CROSS JOIN hashes h
      GROUP BY 1, 2
    ),
    ub AS (
      SELECT DISTINCT e.user_id, h.i,
             ('0x' || substr(md5('cm' || CAST(h.i AS VARCHAR) || ':'
                                 || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT
               % 256 AS bucket
      FROM events e CROSS JOIN hashes h
    ),
    est AS (
      SELECT u.user_id, min(s.c) AS cm_estimate
      FROM ub u JOIN sk s ON u.i = s.i AND u.bucket = s.bucket
      GROUP BY u.user_id
    ),
    t AS (SELECT user_id, count(*) AS n_true FROM events GROUP BY user_id)
    SELECT t.user_id, CAST(t.n_true AS BIGINT) AS n_true,
           CAST(e.cm_estimate AS BIGINT) AS cm_estimate
    FROM t JOIN est e ON t.user_id = e.user_id
    ORDER BY t.n_true DESC, t.user_id LIMIT 20
    """,
)
def agg_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters — the MERGEABLE fixed-memory
    frequency sketch (4 md5-derived hash rows × 256 buckets = 1,024
    counters at ANY key cardinality; per-partition sketches add
    cell-wise, the same mergeability contract as the HLL rollup).
    Estimates only ever OVER-count (collision mass adds), so the sketch
    answers "is this key over threshold" with one-sided error — the
    streaming-friendly hot-key detector behind the rate limiter's
    offline twin. Unlike probabilistic sketch libraries, the md5 bucket
    derivation is engine-replayable, so the oracle reproduces the
    ESTIMATES bit-for-bit, not just an ε-band: top-20 true hitters with
    true and estimated counts. The true-count join exists for the gate;
    the production readout is the 1,024-row sketch alone."""
    ev = table(spark, sf_dir, "events")
    from kafka_streams_common_spark.functions.hashing import md5_int64

    def bucket() -> F.Column:
        return md5_int64(
            F.concat(
                F.lit("cm"),
                F.col("i").cast("string"),
                F.lit(":"),
                F.col("user_id").cast("string"),
            )
        ) % 256

    fanned = ev.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    )
    sk = fanned.select("i", bucket().alias("bucket")).groupBy(
        "i", "bucket"
    ).agg(F.count(F.lit(1)).alias("c"))
    ub = (
        ev.select("user_id").distinct()
        .select("user_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"))
        .select("user_id", "i", bucket().alias("bucket"))
    )
    est = (
        ub.join(F.broadcast(sk), ["i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cm_estimate"))
    )
    t = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_true"))
    return (
        t.join(est, "user_id")
        .select(
            "user_id",
            F.col("n_true").cast("bigint").alias("n_true"),
            F.col("cm_estimate").cast("bigint").alias("cm_estimate"),
        )
        .orderBy(F.desc("n_true"), "user_id")
        .limit(20)
    )


@query(
    "stat_chi2_event_type_dow",
    oracle="""
    WITH cells AS (
      SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
             count(*) AS observed
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, sum(observed) AS row_total FROM cells GROUP BY 1),
    ct AS (SELECT dow, sum(observed) AS col_total FROM cells GROUP BY 1),
    g AS (SELECT sum(observed) AS grand FROM cells),
    scored AS (
      SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow,
             CAST(c.observed AS BIGINT) AS observed,
             CAST(rt.row_total * ct.col_total AS DOUBLE)
               / CAST(g.grand AS DOUBLE) AS expected,
             (CAST(c.observed AS DOUBLE)
                - CAST(rt.row_total * ct.col_total AS DOUBLE)
                  / CAST(g.grand AS DOUBLE))
             * (CAST(c.observed AS DOUBLE)
                - CAST(rt.row_total * ct.col_total AS DOUBLE)
                  / CAST(g.grand AS DOUBLE))
             / (CAST(rt.row_total * ct.col_total AS DOUBLE)
                / CAST(g.grand AS DOUBLE)) AS contrib
      FROM cells c
      JOIN rt ON rt.event_type = c.event_type
      JOIN ct ON ct.dow = c.dow
      CROSS JOIN g
    )
    SELECT event_type, dow, observed, expected, contrib,
           CAST(sum(CAST(round(contrib, 12) AS DECIMAL(28,12))) OVER ()
                AS DOUBLE) AS chi2
    FROM scored
    """,
)
def stat_chi2_event_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test: is event-type mix independent of
    weekday? (the segmentation-drift check behind "do weekend users
    behave differently"). Expected counts come from exact BIGINT
    marginals in one DOUBLE expression; the χ² statistic sums per-cell
    contributions ROUNDED to 12 dp into a DECIMAL — a raw double sum
    over cells is accumulation-order-dependent and breaks cross-engine
    hashing (the same order-free trick as the moment-sum stats). All
    windows run over the |types|×7 cell aggregate. Spark's dayofweek is
    1-based Sunday; DuckDB's 0-based — aligned by subtracting 1."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        (F.dayofweek(F.to_date("ts")) - F.lit(1)).cast("bigint").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("observed"))
    rt = cells.groupBy("event_type").agg(F.sum("observed").alias("row_total"))
    ct = cells.groupBy("dow").agg(F.sum("observed").alias("col_total"))
    g = cells.agg(F.sum("observed").alias("grand"))
    expected = (F.col("row_total") * F.col("col_total")).cast("double") / F.col(
        "grand"
    ).cast("double")
    dev = F.col("observed").cast("double") - expected
    scored = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "dow",
            F.col("observed").cast("bigint").alias("observed"),
            expected.alias("expected"),
            (dev * dev / expected).alias("contrib"),
        )
    )
    w = Window.partitionBy()
    return scored.select(
        "event_type",
        "dow",
        "observed",
        "expected",
        "contrib",
        F.sum(F.round("contrib", 12).cast("decimal(28,12)"))
        .over(w)
        .cast("double")
        .alias("chi2"),
    )


# ---------------------------------------------------------------------------
# experimentation / sequential time-series / graph reachability (session 4)
# ---------------------------------------------------------------------------

@query(
    "ab_test_proportion_ztest",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 2 AS variant,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_purch
      FROM events GROUP BY 1, 2
    ),
    c AS (
      SELECT
        sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
        sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
        sum(CASE WHEN variant = 0 AND n_purch >= 14 THEN 1 ELSE 0 END) AS ca,
        sum(CASE WHEN variant = 1 AND n_purch >= 14 THEN 1 ELSE 0 END) AS cb
      FROM pu
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(ca AS BIGINT) AS conv_a, CAST(cb AS BIGINT) AS conv_b,
           CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS rate_a,
           CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS rate_b,
           CASE WHEN ca + cb > 0 AND ca + cb < na + nb THEN
             (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
             / sqrt((CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                    * (1.0 - CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                    * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))
           ELSE NULL END AS z_score
    FROM c
    """,
)
def ab_test_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment readout: users are
    deterministically bucketed into variants by ``md5(user_id) % 2``
    (the hash-based assignment every experimentation platform uses —
    reproducible on any engine, unlike ``rand()``), conversion = "user
    made ≥ 14 purchases" (the fixture's median split), and the z-score
    is the pooled-proportion test statistic analysts feed to a normal
    CDF. Counts are exact BIGINTs from one user-grained aggregation;
    the z formula is a single fixed DOUBLE expression, so the statistic
    is bit-identical across engines. Scale shape: one shuffle on
    user_id (the per-user fold), then a scalar aggregate — the event
    log itself is never re-shuffled, and the variant hash is computed
    scan-side."""
    from kafka_streams_common_spark.functions.hashing import md5_int64

    ev = table(spark, sf_dir, "events")
    pu = ev.groupBy(
        "user_id", (md5_int64(F.col("user_id")) % 2).alias("variant")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purch"
        )
    )
    c = pu.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("n_purch") >= 14), 1)
            .otherwise(0)
        ).alias("ca"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("n_purch") >= 14), 1)
            .otherwise(0)
        ).alias("cb"),
    )
    ra = F.col("ca").cast("double") / F.col("na").cast("double")
    rb = F.col("cb").cast("double") / F.col("nb").cast("double")
    pooled = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    ).cast("double")
    return c.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("ca").cast("bigint").alias("conv_a"),
        F.col("cb").cast("bigint").alias("conv_b"),
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        # guard the degenerate pooled rates (0 or 1): non-ANSI Spark
        # division yields NULL where DuckDB yields inf/NaN — emit an
        # explicit NULL on both sides instead (same fix as the z-score
        # outlier guard)
        F.when(
            (F.col("ca") + F.col("cb") > 0)
            & (F.col("ca") + F.col("cb") < F.col("na") + F.col("nb")),
            (ra - rb)
            / F.sqrt(
                pooled
                * (F.lit(1.0) - pooled)
                * (
                    F.lit(1.0) / F.col("na").cast("double")
                    + F.lit(1.0) / F.col("nb").cast("double")
                )
            ),
        ).alias("z_score"),
    )


@query(
    "timeseries_ewma_daily_by_type",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    numbered AS (
      SELECT event_type, day, n_events,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ),
    r AS (
      SELECT event_type, day, n_events, rn, CAST(n_events AS DOUBLE) AS ewma
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT x.event_type, x.day, x.n_events, x.rn,
             0.25 * CAST(x.n_events AS DOUBLE) + 0.75 * r.ewma
      FROM numbered x JOIN r
        ON x.event_type = r.event_type AND x.rn = r.rn + 1
    )
    SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events, ewma
    FROM r
    """,
)
def timeseries_ewma_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of daily volume per event type (α = 0.25, seeded
    by the first observation) — the recurrence behind anomaly baselines
    and monitoring dashboards that a frame-bounded moving average can't
    express (every past point contributes, geometrically decayed). The
    recurrence is inherently sequential per series, so it runs as a
    grouped Arrow kernel (``operators/timeseries.py: ewma``): one
    shuffle keys the |types|×|days| census by series, then a map-side
    NumPy scan per key — parallel across series, one scalar of state
    each, never the raw event log. α = 0.25 is exactly representable,
    and the kernel evaluates the same ``a·x + (1−a)·prev`` expression
    shape as the oracle's recursive CTE, so the doubles are
    bit-identical across engines. The oracle IS the sequential
    definition — recursion the distributed plan replaces."""
    from kafka_streams_common_spark.operators.timeseries import ewma

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return ewma(daily, ["event_type"], "day", "n_events", alpha=0.25)


@query(
    "timeseries_holt_trend_daily",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    numbered AS (
      SELECT event_type, day, n_events,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ),
    r AS (
      SELECT event_type, day, n_events, rn,
             CAST(n_events AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT x.event_type, x.day, x.n_events, x.rn,
             0.5 * CAST(x.n_events AS DOUBLE) + 0.5 * (r.l + r.b),
             0.25 * ((0.5 * CAST(x.n_events AS DOUBLE)
                      + 0.5 * (r.l + r.b)) - r.l)
               + 0.75 * r.b
      FROM numbered x JOIN r
        ON x.event_type = r.event_type AND x.rn = r.rn + 1
    )
    SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
           l AS level, b AS trend, l + b AS forecast
    FROM r
    """,
)
def timeseries_holt_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing of daily volume per event type
    (α = 0.5, β = 0.25, level seeded by the first observation, trend by
    zero) — the level+trend recurrence behind short-horizon load
    forecasting that EWMA (level only) and frame-bounded moving
    averages cannot express; ``forecast = level + trend`` is the
    one-step-ahead prediction monitoring alerts threshold against.
    Runs as the same grouped Arrow kernel as the EWMA row
    (``operators/timeseries.py: holt_linear``): one shuffle keys the
    |types|×|days| census by series, a NumPy scan per key (state = two
    scalars), parallel across series. α/β are exactly representable and
    the kernel's update expressions are shape-identical to the oracle's
    recursive CTE (which re-derives the new level inside the trend
    update — the same correctly-rounded doubles), so results are
    bit-identical across engines. The oracle IS the sequential
    definition the distributed plan replaces."""
    from kafka_streams_common_spark.operators.timeseries import holt_linear

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return holt_linear(
        daily, ["event_type"], "day", "n_events", alpha=0.5, beta=0.25
    )


@query(
    "timeseries_twap_value_daily",
    oracle="""
    WITH seg AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             epoch_us(ts) AS t0,
             lead(epoch_us(ts)) OVER (
               PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id
             ) AS t1,
             epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)
                      + INTERVAL 1 DAY) AS day_end
      FROM events
    ),
    w AS (
      SELECT day, cents, coalesce(t1, day_end) - t0 AS dur_us FROM seg
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(dur_us) AS BIGINT) AS total_us,
           CAST(sum(CAST(cents AS DECIMAL(18,0))
                    * CAST(dur_us AS DECIMAL(18,0))) AS DOUBLE)
             / CAST(sum(dur_us) AS DOUBLE) / 100.0 AS twap
    FROM w GROUP BY day
    """,
)
def timeseries_twap_value_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per day (TWAP): each observation
    holds until the next one (last one until midnight), and the day's
    average weights each value by its holding duration in microseconds —
    the market-data convention that makes irregular sampling honest
    (a value that held for six hours counts 6×10⁹ times more than one
    replaced in a millisecond). Weights are exact BIGINT microsecond
    gaps from a per-day ``lead``; values become exact integer cents via
    DECIMAL(18,2); the value×duration dot product accumulates in
    DECIMAL (order-free, overflow-proof at ~4×10¹⁵ per term) and
    converts to DOUBLE once per day. Scale shape: one shuffle on day
    (window + aggregate share the partitioning — Catalyst plans a
    single exchange), state one row per event in the window sort."""
    ev = table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    w = Window.partitionBy("day").orderBy("ts", "event_id")
    seg = ev.select(
        day,
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.unix_micros("ts").alias("t0"),
        F.unix_micros(F.date_add(F.to_date("ts"), 1).cast("timestamp")).alias(
            "day_end"
        ),
    ).withColumn("t1", F.lead("t0").over(w))
    wtd = seg.select(
        "day",
        "cents",
        (F.coalesce("t1", "day_end") - F.col("t0")).alias("dur_us"),
    )
    return wtd.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("dur_us").cast("bigint").alias("total_us"),
        (
            F.sum(
                F.col("cents").cast("decimal(18,0)")
                * F.col("dur_us").cast("decimal(18,0)")
            ).cast("double")
            / F.sum("dur_us").cast("double")
            / F.lit(100.0)
        ).alias("twap"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "total_us",
        "twap",
    )


@query(
    "graph_bfs_hops_copurchase",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    e0 AS (
      SELECT p1.l_partkey AS a, p2.l_partkey AS b
      FROM p p1 JOIN p p2
        ON p1.l_orderkey = p2.l_orderkey AND p1.l_partkey < p2.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    bi AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
    seed AS (SELECT min(a) AS node FROM bi),
    walk AS (
      SELECT node, 0 AS hop FROM seed
      UNION
      SELECT bi.b AS node, w.hop + 1 AS hop
      FROM walk w JOIN bi ON bi.a = w.node
      WHERE w.hop < 3
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(min(hop) AS BIGINT) AS hops
    FROM walk GROUP BY node
    """,
)
def graph_bfs_hops_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first search (≤ 3 hops) from the smallest node of
    the support-≥2 co-purchase graph — "parts reachable within k
    recommendation steps", the reachability primitive under related-item
    expansion and blast-radius queries. The distributed shape is
    iterative frontier expansion: hop h's nodes join the edge list
    (shuffle on the node key, id-only rows), union into the
    distance table, and a min-hop aggregate dedups — k bounded
    iterations, each linear in frontier×degree, the textbook Pregel/BFS
    pattern (vs the oracle's recursive CTE, which IS the sequential
    definition). Edges are materialized once via localCheckpoint and
    reused by all three iterations; bodies/attributes never enter the
    loop. The support threshold (co-ordered in ≥ 2 orders, same edge
    set as link prediction) keeps the graph sparse so hop counts carry
    signal."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2")
    )
    e0 = (
        li.join(l2, (li.l_orderkey == l2.o2) & (li.l_partkey < l2.p2))
        .groupBy(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
        .agg(F.count(F.lit(1)).alias("__w"))
        .filter(F.col("__w") >= 2)
        .select("a", "b")
    )
    bi = e0.unionAll(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    from kafka_streams_common_spark.operators.cluster import bfs_hops

    seeds = bi.agg(F.min("a").alias("node"))
    dist = bfs_hops(bi, seeds, max_hops=3)
    return dist.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("hops").cast("bigint").alias("hops"),
    )


@query(
    "timeseries_autocorr_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1
    ),
    numbered AS (
      SELECT n, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    pairs AS (
      SELECT l.lag_k, a.n AS y, b.n AS x
      FROM range(1, 8) l(lag_k)
      JOIN numbered a ON TRUE
      JOIN numbered b ON b.rn = a.rn - l.lag_k
    ),
    m AS (
      SELECT lag_k, count(*) AS np_exact,
             CAST(count(*) AS DOUBLE) AS np,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM pairs GROUP BY lag_k
    )
    SELECT CAST(lag_k AS BIGINT) AS lag_k,
           CAST(np_exact AS BIGINT) AS n_pairs,
           CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0 THEN
             (np * sxy - sx * sy)
             / (sqrt(np * sxx - sx * sx) * sqrt(np * syy - sy * sy))
           ELSE NULL END AS autocorr_r
    FROM m
    """,
)
def timeseries_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily volume at lags 1–7 — the
    periodicity detector behind the seasonality profile (a weekly cycle
    shows as a lag-7 peak; a trend as slow decay): Pearson r between
    the day series and its k-shifted self, per lag. Facts collapse to
    the |days| census FIRST; the 7 lag pairings are an equi-join of the
    tiny numbered census against a generated lag spine, and every
    moment (Σx, Σx², Σxy…) accumulates in DECIMAL (order-free, exact
    past int64 — day counts in the billions square beyond BIGINT) —
    the r formula is one fixed DOUBLE expression over their sums with the zero-variance guard applied
    identically on both engines (the z-score family lesson). Nothing
    larger than |days|×7 is ever shuffled."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    numbered = daily.select(
        "n", F.row_number().over(Window.orderBy("day")).alias("rn")
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag_k"))
    a = numbered.select(F.col("n").alias("y"), F.col("rn").alias("ra"))
    b = numbered.select(F.col("n").alias("x"), F.col("rn").alias("rb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("rb") == F.col("ra") - F.col("lag_k"))
    )
    # moments in DECIMAL then DOUBLE: x*x on billions-per-day counts
    # overflows BIGINT near int64 max — the Spearman lesson applied here
    d = lambda c: c.cast("decimal(18,0)")  # noqa: E731
    m = pairs.groupBy("lag_k").agg(
        F.count(F.lit(1)).alias("np_exact"),
        F.count(F.lit(1)).cast("double").alias("np"),
        F.sum(d(F.col("x"))).cast("double").alias("sx"),
        F.sum(d(F.col("y"))).cast("double").alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).cast("double").alias("sxx"),
        F.sum(d(F.col("y")) * d(F.col("y"))).cast("double").alias("syy"),
        F.sum(d(F.col("x")) * d(F.col("y"))).cast("double").alias("sxy"),
    )
    vx = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("lag_k").cast("bigint").alias("lag_k"),
        F.col("np_exact").cast("bigint").alias("n_pairs"),
        F.when(
            (vx > 0) & (vy > 0),
            (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(vx) * F.sqrt(vy)),
        ).alias("autocorr_r"),
    )


@query(
    "geo_radius_join_customers",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             47.0 + CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                           || '|lat'), 1, 15))::BIGINT % 1000000 AS DOUBLE)
                    / 1000000.0 AS lat,
             8.0 + CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                          || '|lon'), 1, 15))::BIGINT % 1000000 AS DOUBLE)
                   / 1000000.0 * 1.5 AS lon
      FROM customer
    ),
    cells AS (
      SELECT c_custkey, lat, lon,
             CAST(floor((lat - 47.0) / 0.05) AS BIGINT) AS cl,
             CAST(floor((lon - 8.0) / 0.075) AS BIGINT) AS cn
      FROM pts
    ),
    cand AS (
      SELECT a.c_custkey AS a_custkey, b.c_custkey AS b_custkey,
             a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2
      FROM cells a
      JOIN range(-1, 2) dl(dl) ON TRUE
      JOIN range(-1, 2) dn(dn) ON TRUE
      JOIN cells b
        ON b.cl = a.cl + dl.dl AND b.cn = a.cn + dn.dn
       AND a.c_custkey < b.c_custkey
    )
    SELECT a_custkey, b_custkey,
           floor(2.0 * 6371.0 * asin(sqrt(
             sin((radians(lat2) - radians(lat1)) / 2)
               * sin((radians(lat2) - radians(lat1)) / 2)
             + cos(radians(lat1)) * cos(radians(lat2))
               * sin((radians(lon2) - radians(lon1)) / 2)
               * sin((radians(lon2) - radians(lon1)) / 2)
           )) * 1000000.0 + 0.5) / 1000000.0 AS dist_km
    FROM cand
    WHERE floor(2.0 * 6371.0 * asin(sqrt(
            sin((radians(lat2) - radians(lat1)) / 2)
              * sin((radians(lat2) - radians(lat1)) / 2)
            + cos(radians(lat1)) * cos(radians(lat2))
              * sin((radians(lon2) - radians(lon1)) / 2)
              * sin((radians(lon2) - radians(lon1)) / 2)
          )) * 1000000.0 + 0.5) / 1000000.0 <= 5.0
    """,
)
def geo_radius_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join — "customer pairs within 5 km" — the
    geo primitive under store-catchment, fraud-ring, and delivery
    analytics, built the scalable way: GRID-CELL BANDING (the geohash
    pattern). Deterministic md5-derived coordinates in a ~111×167 km
    box stand in for real lat/lon (the fixture has none; the operator
    shape is what's pinned). Each point lands in a 0.05°×0.075° cell
    (≥ the 5 km radius), candidates come from an EQUI-join against the
    3×3 neighbor cells (map-side explode of 9 offsets — never an
    all-pairs theta join), and exact haversine verifies. Work is
    Σ(points-per-cell²) over 9 neighbor cells — density-bounded, the
    same skew posture as LSH buckets (cap mega-cells on real data).
    The haversine expression is shape-identical on both engines, and
    BOTH the reported distance AND the ≤ 5 km gate evaluate on the
    same 1e-6-grid quantizer ``floor(hav·1e6 + 0.5)/1e6`` — pure IEEE
    double arithmetic spelled identically in Spark and the SQL oracle,
    so a sub-ulp libm difference in trig can flip neither a cell value
    nor row MEMBERSHIP at the radius boundary. (r11: this replaced
    ``round(hav, 6)`` in the gate — Spark's ROUND allocates a
    BigDecimal per evaluation, and paying that on every CANDIDATE pair
    rather than only on survivors was the root cause of the r9/r10
    3.2-3.9 s tracking drift; the arithmetic quantizer gates the same
    row set at ~1.15 s idle, under the original r8 reading.)"""
    from kafka_streams_common_spark.functions.hashing import md5_int64

    cust = table(spark, sf_dir, "customer").select("c_custkey")
    lat = (
        47.0
        + (
            md5_int64(F.concat(F.col("c_custkey").cast("string"), F.lit("|lat")))
            % 1000000
        ).cast("double")
        / 1000000.0
    )
    lon = (
        8.0
        + (
            md5_int64(F.concat(F.col("c_custkey").cast("string"), F.lit("|lon")))
            % 1000000
        ).cast("double")
        / 1000000.0
        * 1.5
    )
    cells = cust.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor((lat - 47.0) / 0.05).cast("bigint").alias("cl"),
        F.floor((lon - 8.0) / 0.075).cast("bigint").alias("cn"),
    )
    # 3x3 neighborhood as a literal-array explode: pure map-side row
    # multiplication, no join node (a broadcast cross would plan as a
    # BroadcastNestedLoopJoin and muddy the no-theta-join plan assert)
    offsets = F.array(
        *[
            F.struct(
                F.lit(dl).cast("bigint").alias("dl"),
                F.lit(dn).cast("bigint").alias("dn"),
            )
            for dl in (-1, 0, 1)
            for dn in (-1, 0, 1)
        ]
    )
    a = cells.select(
        F.col("c_custkey").alias("a_custkey"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
        "cl",
        "cn",
        F.explode(offsets).alias("o"),
    ).select(
        "a_custkey", "lat1", "lon1", "cl", "cn",
        F.col("o.dl").alias("dl"), F.col("o.dn").alias("dn"),
    )
    b = cells.select(
        F.col("c_custkey").alias("b_custkey"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        F.col("cl").alias("bcl"),
        F.col("cn").alias("bcn"),
    )
    cand = a.join(
        b,
        (F.col("bcl") == F.col("cl") + F.col("dl"))
        & (F.col("bcn") == F.col("cn") + F.col("dn"))
        & (F.col("a_custkey") < F.col("b_custkey")),
    )
    dlat = (F.radians("lat2") - F.radians("lat1")) / 2
    dlon = (F.radians("lon2") - F.radians("lon1")) / 2
    hav = 2.0 * 6371.0 * F.asin(
        F.sqrt(
            F.sin(dlat) * F.sin(dlat)
            + F.cos(F.radians("lat1"))
            * F.cos(F.radians("lat2"))
            * F.sin(dlon)
            * F.sin(dlon)
        )
    )
    quant = F.floor(hav * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    return cand.filter(quant <= 5.0).select(
        "a_custkey", "b_custkey", quant.alias("dist_km")
    )


@query(
    "events_pattern_match_sequence",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             count(*) AS n_events,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(s, 'v[^p]*c[^p]*p')) AS BIGINT)
             AS n_matches,
           len(regexp_extract_all(s, 'v[^p]*c[^p]*p')) > 0 AS matched
    FROM seq
    """,
)
def events_pattern_match_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence pattern matching over per-user event streams — the
    MATCH_RECOGNIZE shape Spark lacks natively: encode each user's
    event-type history (total (ts, id) order) as a compact symbol
    string, then run a REGEX over it ('view, then click, then purchase,
    with no purchase in between' = ``v[^p]*c[^p]*p``) — funnel logic
    with arbitrary regular-language structure (negation, alternation,
    greedy gaps) that windowed joins can't express. Non-overlapping
    match COUNT and a matched flag per user. Scale shape: one shuffle
    on user_id, per-user sort inside the aggregate, string length
    bounded by per-user activity (cap/slice hyperactive users upstream
    — the hot-key posture of every per-entity fold); the regex runs
    map-side on the |users| aggregate. Symbol alphabet = first letter
    of event_type (distinct across the fixture's five types)."""
    ev = table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("c"),
                        )
                    )
                ),
                lambda x: x.getField("c"),
            ),
            "",
        ).alias("s"),
    )
    n_matches = F.size(
        F.regexp_extract_all("s", F.lit("v[^p]*c[^p]*p"), 0)
    )
    return seq.select(
        "user_id",
        "n_events",
        n_matches.cast("bigint").alias("n_matches"),
        (n_matches > 0).alias("matched"),
    )


# ---------------------------------------------------------------------------
# bucketed layout: pay the big-x-big join shuffle once at write time
# (operators/bucketing.py)
# ---------------------------------------------------------------------------

def _bucketed_orders_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by the query and the plan test: write orders and lineitem
    bucketed by orderkey (8 buckets), SortMergeJoin them exchange-free."""
    import atexit
    import shutil
    import tempfile

    from kafka_streams_common_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    d = tempfile.mkdtemp(prefix="kscs_bucketed_")
    atexit.register(shutil.rmtree, d, True)
    write_bucketed(orders, "kscs_b_orders", "o_orderkey", 8, f"{d}/orders")
    write_bucketed(li, "kscs_b_lineitem", "l_orderkey", 8, f"{d}/lineitem")
    return bucketed_join(
        spark,
        "kscs_b_orders",
        "kscs_b_lineitem",
        on=lambda o, l: o.o_orderkey == l.l_orderkey,
    )


@query(
    "bucketed_join_orders_lineitem",
    oracle="""
    SELECT o.o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def bucketed_join_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-layout answer to the repo's biggest recurring join
    (orders x lineitem on orderkey, TPC-H Q3/Q4/Q12's spine): both
    tables written ``bucketBy(8, orderkey).sortBy(orderkey)``, then
    joined as a SortMergeJoin whose distribution is satisfied by the
    bucketed scans — ZERO Exchange in the join subtree (asserted in
    tests/test_plans.py). The write pays one hash repartition per
    table; every subsequent join on the key is shuffle-free, which at
    100 TB converts the per-query O(data) shuffle into a one-time
    ingest cost. The oracle replays the plain join on the raw parquet
    — the layout must be invisible to results.
    """
    j = _bucketed_orders_lineitem_join(spark, sf_dir)
    return (
        j.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# approximate percentiles with an exactness invariant gate (the
# agg_approx_distinct_users convention for sketch outputs)
# ---------------------------------------------------------------------------

@query(
    "agg_approx_percentile_value",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.5), 6) AS exact_p50,
           round(quantile_cont(value, 0.9), 6) AS exact_p90,
           TRUE AS p50_in_rank_band,
           TRUE AS p90_in_rank_band
    FROM events GROUP BY event_type
    """,
)
def agg_approx_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` (Greenwald-Khanna sketch) per event type —
    the fixed-size mergeable quantile pass a 100 TB pipeline runs where
    exact ``percentile`` would shuffle every value to one reducer per
    group. Like the HLL row, the sketch value itself has no cross-engine
    oracle (DuckDB's approx_quantile is t-digest), so the gated outputs
    are the EXACT interpolated percentiles plus booleans asserting the
    sketch landed inside the +/-5%-rank band around its target: GK with
    accuracy=10000 guarantees rank error <= n/10000, ~50x tighter than
    the band, so the gate only flips on a genuinely broken sketch while
    staying deterministic on unseen driver data. Exact percentiles are
    rounded to 6 dp (Spark interpolates in DOUBLE, DuckDB's
    quantile_cont likewise — sub-ulp differences must not flip the
    hash)."""
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.percentile("value", 0.5).alias("__e50"),
        F.percentile("value", 0.9).alias("__e90"),
        F.percentile("value", 0.45).alias("__lo50"),
        F.percentile("value", 0.55).alias("__hi50"),
        F.percentile("value", 0.85).alias("__lo90"),
        F.percentile("value", 0.95).alias("__hi90"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("__a50"),
        F.expr("approx_percentile(value, 0.9, 10000)").alias("__a90"),
    )
    return g.select(
        "event_type",
        "n",
        F.round("__e50", 6).alias("exact_p50"),
        F.round("__e90", 6).alias("exact_p90"),
        F.col("__a50").between(F.col("__lo50"), F.col("__hi50")).alias(
            "p50_in_rank_band"
        ),
        F.col("__a90").between(F.col("__lo90"), F.col("__hi90")).alias(
            "p90_in_rank_band"
        ),
    )
