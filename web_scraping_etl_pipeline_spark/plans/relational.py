"""Relational core suite: aggregations, joins, windows, set ops.

The reference's data model implies these but never writes them
(SURVEY.md sections 2.4/2.5/2.7: a single-table pipeline whose only
join-shaped construct is a correlated UPDATE keyed on job_link). The
engine exposes the full relational vocabulary on the star schema, with
the physical strategy chosen for 100 TB: dimension joins broadcast
(region/nation/customer stay small relative to facts), fact-fact joins
shuffle on their keys with AQE skew handling, top-k compiles to
TakeOrderedAndProject, aggregations are partial+final hash.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import EPOCH_DAY_SQL, EVENTS_EPOCH_US, t
from .registry import query

# ---------------------------------------------------------------------------
# group-by aggregation (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@query(
    "q14_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 1) AS sum_qty,
           ROUND(SUM(l_extendedprice), 0) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q14_pricing_summary(spark, sf_dir):
    """Pricing-summary aggregate: partial+final hash agg, 8 expressions
    in one WholeStageCodegen pass; the shipdate filter pushes into the
    parquet scan. Money sums round to whole units (cross-engine float
    accumulation tolerance - see plans/registry.py)."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 1).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 0).alias("sum_base_price"),
            F.round(F.sum(disc_price), 0).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 0).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# broadcast dimension joins
# ---------------------------------------------------------------------------


@query(
    "q15_customers_by_region",
    oracle="""
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(c_acctbal), 2) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q15_customers_by_region(spark, sf_dir):
    """Star enrichment: customer joins two broadcast dims - zero
    shuffle on the fact side until the final small aggregation."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


@query(
    "q16_segment_revenue",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 0) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q16_segment_revenue(spark, sf_dir):
    """Fact-dim equi-join + agg. No broadcast hint on customer - it
    scales with the facts, so the auto-broadcast threshold / AQE decides
    (broadcasts at bench scale, shuffle-joins at 100 TB where both
    sides would bucket on custkey)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 0).alias("revenue"),
        )
    )


@query(
    "q17_nation_revenue",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q17_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: one shuffled fact-fact join (lineitem x orders on
    orderkey) then broadcast dims; region filter prunes before the big
    join (Catalyst pushes it through the join graph). customer carries
    no hint - it scales with the fact tables, so broadcastability is a
    runtime property: the auto-broadcast threshold / AQE decides (it
    still broadcasts at bench scale, and degrades to shuffle join at
    100 TB instead of OOMing the executors)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# semi / anti joins (the 'new jobs not yet in jobs_table' dedup shape)
# ---------------------------------------------------------------------------


@query(
    "q18_big_spenders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
)
def q18_big_spenders(spark, sf_dir):
    """Left-semi join: customers with at least one 400k+ order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q19_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q19_customers_without_orders(spark, sf_dir):
    """Left-anti join - exactly the effectively-once dedup the silver
    write uses on job_link (pipeline.py), recast on custkey."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


@query(
    "q20_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_order_date,
           o_totalprice
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
      ) AS rn FROM orders
    ) WHERE rn = 1
    """,
)
def q20_latest_order_per_customer(spark, sf_dir):
    """'Latest posting per company' (SURVEY.md section 2.7) recast: ranking
    window, deterministic o_orderkey tie-break."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("last_order_date"),
            "o_totalprice",
        )
    )


@query(
    "q21_running_user_value",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS running_value
    FROM events
    """,
)
def q21_running_user_value(spark, sf_dir):
    """Running sum per user ordered by event time - the cumulative
    flavor of the watermark A2 max."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


@query(
    "q22_set_union",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def q22_set_union(spark, sf_dir):
    """UNION (distinct) - the staging->jobs daily-increment shape."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@query(
    "q23_set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def q23_set_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "q24_set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def q24_set_except(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)  # EXCEPT (distinct) semantics


@query(
    "q25_distinct_pairs",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q25_distinct_pairs(spark, sf_dir):
    return t(spark, sf_dir, "events").select("user_id", "event_type").distinct()


# ---------------------------------------------------------------------------
# rollup / conditional pivot
# ---------------------------------------------------------------------------


@query(
    "q26_region_nation_rollup",
    oracle="""
    SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    HAVING COUNT(*) > 0
    """,
)
def q26_region_nation_rollup(spark, sf_dir):
    """Hierarchical ROLLUP (region -> nation -> grand total).

    The oracle's HAVING COUNT(*) > 0 is a no-op on any non-empty
    input (every rollup row aggregates >= 1 source row); it exists
    because on an EMPTY input DuckDB emits the standard's ()
    grouping-set grand-total row while Spark emits no rows (r11
    empty-corpus census) - the guard pins both engines to the
    empty-in/empty-out behavior Spark implements."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "q27_user_event_pivot",
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click_cnt,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view_cnt,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase_cnt,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup_cnt,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error_cnt,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def q27_user_event_pivot(spark, sf_dir):
    """Conditional-aggregation pivot: one shuffle, five counters - the
    scalable form of PIVOT (no second pass to discover keys)."""
    ev = t(spark, sf_dir, "events")

    def cnt(kind):
        return F.count(F.when(F.col("event_type") == kind, 1)).alias(
            f"{kind}_cnt"
        )

    return ev.groupBy("user_id").agg(
        cnt("click"),
        cnt("view"),
        cnt("purchase"),
        cnt("signup"),
        cnt("error"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# sessionization + event-time windowing (streaming semantics, batch form)
# ---------------------------------------------------------------------------


@query(
    "q28_user_sessions",
    oracle="""
    WITH x AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_us
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM x GROUP BY user_id
    """,
)
def q28_user_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag window + sum;
    the batch-equivalent plan of a streaming session window. The live
    streaming queries are streaming/events_stream.py (q34/q35) and the
    jobs drain in streaming/jobs_stream.py."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.select(
        "user_id",
        "ts_us",
        F.lag("ts_us").over(w).alias("prev_us"),
    )
    is_new = F.when(
        F.col("prev_us").isNull()
        | (F.col("ts_us") - F.col("prev_us") > 1_800_000_000),
        1,
    ).otherwise(0)
    return flagged.groupBy("user_id").agg(
        F.sum(is_new).cast("long").alias("n_sessions")
    )


@query(
    "q29_daily_type_counts",
    oracle=f"""
    SELECT {EPOCH_DAY_SQL} AS day_idx,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY day_idx, event_type
    """,
)
def q29_daily_type_counts(spark, sf_dir):
    """Tumbling event-time window aggregation (1-day), batch form of the
    readStream windowed count; day index is integer arithmetic on epoch
    micros so it is tz-free in both engines."""
    ev = t(spark, sf_dir, "events")
    day_idx = F.floor(
        (F.col("ts_us") - F.lit(EVENTS_EPOCH_US)) / F.lit(86_400_000_000)
    ).alias("day_idx")
    return ev.groupBy(day_idx, "event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "q97_nation_pair_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS volume,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def q97_nation_pair_volume(spark, sf_dir):
    """TPC-H Q7 shape: cross-border trade volume per (supplier nation,
    customer nation, ship year). Two fact-fact joins (lineitem x
    supplier on suppkey, x orders on orderkey) plus customer, then the
    nation dim joined TWICE under different aliases - the classic
    role-playing-dimension pattern.

    Scale: supplier/customer ride the auto-broadcast/AQE decision like
    q17; the two nation joins are explicit broadcasts (25 rows). The
    inequality filter runs on the two broadcast-joined nation keys
    before aggregation, and the group keyspace is bounded by
    |nations|^2 x |years|, so the final agg is map-side combined into
    almost nothing."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ).alias("volume"),
            F.count("*").alias("n_lineitems"),
        )
    )


@query(
    "q107_relational_division",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS npri
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT COUNT(DISTINCT o_orderpriority) AS n FROM orders)
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM per_cust, tot WHERE npri = n
    )
    """,
)
def q107_relational_division(spark, sf_dir):
    """Relational division ("for all"): customers who have placed at
    least one order in EVERY order priority - the classic operator SQL
    lacks a keyword for. Division reduces to counting: per-customer
    distinct-priority count == global distinct-priority count.

    Scale: both sides are aggregates (map-side combinable, one shuffle
    each); the divisor cardinality is a 1-row aggregate joined by
    broadcast, and the final membership is a left-semi join - no
    NOT EXISTS double negation, no per-divisor-row probing."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    per_cust = o.groupBy("o_custkey").agg(
        F.count_distinct("o_orderpriority").alias("npri")
    )
    tot = o.agg(F.count_distinct("o_orderpriority").alias("n"))
    full = per_cust.join(
        F.broadcast(tot), per_cust.npri == tot.n
    ).select("o_custkey")
    return c.join(
        full, c.c_custkey == full.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q112_ordered_string_agg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q112_ordered_string_agg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG): nation names per region as
    one comma-joined, alphabetically-ordered string. Spark's
    ``collect_list`` is order-nondeterministic under parallelism, so
    the deterministic form is collect -> ``array_sort`` ->
    ``array_join`` - the idiom that makes list aggregation safe to
    hash-compare across engines (and across reruns).

    Scale: per-group state is the value list, so this is for
    dimension-sized groups (here: 5 nations per region); unbounded
    groups want the q77-style top-k cut before aggregation."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count("*").alias("n_nations"),
        )
    )


@query(
    "q114_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 101 = 0 THEN 1 ELSE 0 END AS cents
      FROM orders
    )
    SELECT 'only_a' AS side, * FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'only_b' AS side, * FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a)
    """,
)
def q114_snapshot_diff(spark, sf_dir):
    """Snapshot data-diff audit: symmetric EXCEPT ALL between two
    versions of a table, each surviving row tagged with the side it is
    unique to - the reconciliation primitive behind "what changed
    between yesterday's and today's load". The second snapshot here is
    a deterministic mutation of the first (status flip on keys % 97,
    one-cent drift on keys % 101) so the diff is reproducible.

    Scale: EXCEPT ALL plans as a hash aggregate over all columns with
    count bookkeeping - one shuffle per side on the row hash; at
    100 TB you diff per partition-key range so each reconciliation
    shuffle is bounded (and unchanged partitions skip via metadata
    short-circuit)."""
    o = t(spark, sf_dir, "orders")
    a = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    b = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        (
            F.round(F.col("o_totalprice") * 100).cast("long")
            + F.when(F.col("o_orderkey") % 101 == 0, 1).otherwise(0)
        ).alias("cents"),
    )
    only_a = a.exceptAll(b).select(F.lit("only_a").alias("side"), "*")
    only_b = b.exceptAll(a).select(F.lit("only_b").alias("side"), "*")
    return only_a.unionByName(only_b)


@query(
    "q129_null_safe_join",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS k FROM orders
    ),
    b AS (
      SELECT NULLIF(o_orderstatus, 'O') AS k,
             CAST(COUNT(*) AS BIGINT) AS n_side
      FROM orders GROUP BY 1
    )
    SELECT COALESCE(a.k, '<null>') AS join_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MAX(b.n_side) AS n_side
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    """,
)
def q129_null_safe_join(spark, sf_dir):
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing - the semantics dimension
    every join suite needs pinned, exercised on a key where the most
    common status is nulled out. A plain equi-join here would silently
    drop the entire NULL partition; the null-safe form keeps it.

    Scale: Spark plans ``eqNullSafe`` as an ordinary hash join (the
    null bucket hashes like any value - watch it for skew exactly like
    a hot key, cf. q67/q68 salting)."""
    o = t(spark, sf_dir, "orders")
    a = o.select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("k")
    )
    b = (
        o.select(F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_side"))
    )
    return (
        a.join(F.broadcast(b), a["k"].eqNullSafe(b["k"]))
        .groupBy(a["k"])
        .agg(
            F.count("*").alias("n_rows"),
            F.max("n_side").alias("n_side"),
        )
        .select(
            F.coalesce(a["k"], F.lit("<null>")).alias("join_key"),
            "n_rows",
            "n_side",
        )
    )


@query(
    "q130_late_shipments",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(COUNT(*) FILTER (
             WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY) AS BIGINT)
             AS n_late,
           ROUND(COUNT(*) FILTER (
             WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
             / CAST(COUNT(*) AS DOUBLE), 4) AS late_rate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q130_late_shipments(spark, sf_dir):
    """Cross-table interval predicate (TPC-H Q12 flavor): lineitems
    shipped more than 90 days after their order date, as a monthly
    late-shipment rate - date arithmetic ACROSS the joined pair, so
    the predicate can only evaluate post-join.

    Scale: the one shuffled join is on orderkey; the interval
    comparison and conditional counts ride the join's output in
    codegen. Neither side's filter can prune pre-join (the predicate
    spans both), which is exactly why it is the canonical example for
    join-then-filter costing."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("order_month")
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            F.count(F.when(late, 1)).alias("n_late"),
            F.round(
                F.count(F.when(late, 1)) / F.count("*").cast("double"), 4
            ).alias("late_rate"),
        )
    )


@query(
    "q141_bloom_semi_join",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
)
def q141_bloom_semi_join(spark, sf_dir):
    """Semi join with a hand-rolled runtime bloom filter: revenue of
    lineitems belonging to URGENT orders, where the fact scan is
    pre-pruned by an 8 KB bloom sketch of the filtered dim keys before
    the exact semi join (the verify step keeps the result exact, so the
    sketch's false positives never surface).

    This is the runtime-filter pattern Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` applies to shuffle
    joins, made explicit: (1) one pass over the *filtered* dim ORs two
    xxhash64 probe bits per key into 1024 64-bit words; (2) the 8 KB
    word table - constant-size metadata, independent of data scale, the
    one legitimate driver fetch in this file - is embedded as an array
    literal in the fact scan's filter, so ~99% of non-matching fact
    rows die inside whole-stage codegen *before* the join shuffle;
    (3) an UNHINTED left-semi join (AQE broadcasts it while small)
    removes the ~0.8% false positives.
    At 100 TB the shuffle carries only surviving rows - the bloom turns
    a full-fact shuffle into a matching-slice shuffle."""
    M_BITS = 1 << 16  # 65536 bits = 1024 longs = 8 KB; k=2 probes
    N_WORDS = M_BITS // 64

    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )

    def positions(key_col):
        return [
            F.pmod(F.xxhash64(key_col), F.lit(M_BITS)),
            F.pmod(F.xxhash64(key_col, F.lit(7)), F.lit(M_BITS)),
        ]

    word_rows = (
        urgent.select(
            F.explode(F.array(*positions(F.col("o_orderkey")))).alias("p")
        )
        .select(
            F.expr("CAST(p DIV 64 AS INT)").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * N_WORDS
    for r in word_rows:
        words[r["w"]] = r["bits"]
    bloom = F.lit(words)  # 8 KB array<bigint> literal, codegen-resident

    li = t(spark, sf_dir, "lineitem")
    p1, p2 = positions(F.col("l_orderkey"))
    probe_hit = F.expr(
        "(element_at(__bloom, CAST(__p1 DIV 64 AS INT) + 1) & "
        " shiftleft(CAST(1 AS BIGINT), CAST(__p1 % 64 AS INT))) != 0 AND "
        "(element_at(__bloom, CAST(__p2 DIV 64 AS INT) + 1) & "
        " shiftleft(CAST(1 AS BIGINT), CAST(__p2 % 64 AS INT))) != 0"
    )

    return (
        li.withColumns({"__bloom": bloom, "__p1": p1, "__p2": p2})
        .filter(probe_hit)
        .drop("__bloom", "__p1", "__p2")
        .join(
            urgent,
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ).alias("revenue"),
        )
    )


@query(
    "q146_market_share",
    oracle="""
    WITH flat AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      WHERE p_type = 'PROMO' AND r_name = 'ASIA'
    )
    SELECT CAST(yr AS BIGINT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_2'
                          THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM flat GROUP BY yr
    """,
)
def q146_market_share(spark, sf_dir):
    """TPC-H Q8 market share: of all PROMO-part volume sold to ASIA
    customers, the fraction supplied from NATION_2, by order year -
    the deepest join tree in the suite (lineitem x 7 dimensions).

    Scale shape: nation/region are broadcast (the only FIXED-size
    dims); part/supplier/customer are left UNHINTED - at sf0.1 AQE
    broadcasts them, at 100 TB they are data-proportional and AQE
    keeps the shuffle (hard-coding the hint was flagged on q17 and is
    wrong at scale); lineitem->orders is the ONE big shuffle, on the
    join key both sides already produce. The part filter runs before the first join, so the fact
    rows that survive to the shuffle are only PROMO items."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    flat = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("yr"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "supp_nation",
        )
    )
    return flat.groupBy("yr").agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
                .otherwise(F.lit(0.0))
            )
            / F.sum("volume"),
            6,
        ).alias("mkt_share"),
    )


@query(
    "q150_decimal_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(3,2))
                            - CAST(l_discount AS DECIMAL(4,2))))
                     AS DECIMAL(18,4)) AS VARCHAR) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q150_decimal_revenue(spark, sf_dir):
    """Exact-money revenue in DECIMAL arithmetic: cast price and
    discount to fixed-point BEFORE multiplying, so every product and
    the whole sum are exact - the books-must-balance path where the
    double-based q14/q17 aggregates (rounded to absorb float
    accumulation noise) are not acceptable.

    This is the one aggregate family where the oracle comparison needs
    NO rounding: decimal arithmetic is order-independent and
    bit-identical across engines. The final value is rendered as a
    STRING on both sides because the comparison harness materializes
    results through pandas, where DuckDB widens DECIMAL to float64
    while Spark keeps Python Decimal - the scale-preserving varchar
    rendering ("123.4500") is identical across engines and keeps the
    check exact. Cost at scale: Spark's decimal sum
    runs on unscaled longs while precision fits 18 digits (same
    codegen shape as bigint sums), widening to 128-bit only past
    that - marginally slower than double, and the price of exactness a
    finance pipeline pays on purpose."""
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return li.groupBy("l_returnflag").agg(
        F.sum(price * disc)
        .cast("decimal(18,4)")
        .cast("string")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q162_integrity_audit",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(COUNT(*) FILTER (l_linestatus = 'O') AS BIGINT) AS n_open
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT
      CAST(COUNT(*) FILTER (li.l_orderkey IS NULL) AS BIGINT)
        AS orders_without_items,
      CAST(COUNT(*) FILTER (o.o_orderstatus = 'F' AND li.n_open > 0)
           AS BIGINT) AS finished_with_open_items,
      CAST(COUNT(*) FILTER (o.o_orderstatus = 'O' AND li.n_open = 0
                            AND li.n_items > 0)
           AS BIGINT) AS open_without_open_items,
      CAST(COUNT(*) AS BIGINT) AS orders_checked
    FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    """,
)
def q162_integrity_audit(spark, sf_dir):
    """Cross-table referential/state integrity audit: orders without
    lineitems, 'F'(inished) orders still carrying open lineitems, and
    'O'(pen) orders whose items are all closed - the consistency
    checks a warehouse runs after every load, as ONE scan-and-join
    pass emitting a single audit row.

    The lineitem side collapses to per-order counts first (map-side
    combinable, shuffle carries two ints per order), then a left join
    on the natural key feeds conditional COUNT(FILTER) aggregates. At
    100 TB both sides hash on orderkey - the join AQE-plans against
    the already-aggregated (order-sized, not lineitem-sized) right
    side."""
    o = t(spark, sf_dir, "orders")
    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("n_open"),
        )
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left")
    return j.agg(
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias(
            "orders_without_items"
        ),
        F.count(
            F.when(
                (F.col("o_orderstatus") == "F") & (F.col("n_open") > 0), 1
            )
        ).alias("finished_with_open_items"),
        F.count(
            F.when(
                (F.col("o_orderstatus") == "O")
                & (F.col("n_open") == 0)
                & (F.col("n_items") > 0),
                1,
            )
        ).alias("open_without_open_items"),
        F.count("*").alias("orders_checked"),
    )


@query(
    "q163_percent_of_parent",
    oracle="""
    WITH rev AS (
      SELECT r.r_name, n.n_name,
             SUM(o.o_totalprice) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT r_name, n_name,
           CAST(FLOOR(rev) AS BIGINT) AS revenue,
           -- NULLIF: a region (or the grand total) whose revenue
           -- NETS TO ZERO has undefined shares (r14 sign-cancellation
           -- census), NULL on both engines; no-op in contract
           ROUND(rev / NULLIF(SUM(rev) OVER (PARTITION BY r_name), 0), 6)
             AS share_of_region,
           ROUND(SUM(rev) OVER (PARTITION BY r_name)
                 / NULLIF(SUM(rev) OVER (), 0), 6) AS region_share_of_total
    FROM rev
    """,
)
def q163_percent_of_parent(spark, sf_dir):
    """Percent-of-parent OLAP shares: each nation's revenue as a share
    of its region, and each region's share of the grand total - the
    two-level drill-down ratio every BI tool labels '% of parent
    row'.

    One fact aggregate down to (region, nation) granularity (tiny),
    then two windows over that result: a region-partitioned sum and
    the empty-frame grand total. The expensive work happens once at
    the lowest granularity; parents are derived, never re-scanned -
    the scale rule for hierarchy ratios. Ratios round at 6dp (shares
    of sums are division-stable; cf. q92)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wreg = Window.partitionBy("r_name")
    wall = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        F.floor("rev").alias("revenue"),
        # NULLIF parity with the oracle (sign-cancellation census):
        # zero-net region / grand totals yield NULL shares
        F.round(
            F.col("rev") / F.nullif(F.sum("rev").over(wreg), F.lit(0.0)),
            6,
        ).alias("share_of_region"),
        F.round(
            F.sum("rev").over(wreg)
            / F.nullif(F.sum("rev").over(wall), F.lit(0.0)),
            6,
        ).alias("region_share_of_total"),
    )


# ---------------------------------------------------------------------------
# q164-q167: the remaining classic TPC-H query *shapes* (Q2/Q11/Q13/Q15),
# adapted to the driver star schema (no partsupp table: supply facts are
# derived from lineitem). What matters is the plan form each exercises -
# correlated aggregate subqueries and their scale-safe decorrelations.
# ---------------------------------------------------------------------------


@query(
    "q164_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / NULLIF(l_quantity, 0)) AS price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), elig AS (
      SELECT o.l_partkey, o.l_suppkey, o.price
      FROM offers o
      JOIN part p ON p.p_partkey = o.l_partkey AND p.p_size <= 10
      JOIN supplier s ON s.s_suppkey = o.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
                   AND r.r_name = 'EUROPE'
    )
    SELECT e.l_partkey AS p_partkey, e.l_suppkey AS s_suppkey,
           FLOOR(e.price * 10000 + 0.5) / 10000.0 AS best_price
    FROM elig e
    WHERE e.price = (SELECT MIN(e2.price) FROM elig e2
                     WHERE e2.l_partkey = e.l_partkey)
    """,
)
def q164_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for every small part, the EUROPE supplier whose
    observed unit price (min extendedprice/quantity over its lineitems)
    is the part-wide minimum - the correlated-MIN-subquery pattern.

    Scale: the correlated subquery is decorrelated to one window MIN
    over the per-(part,supplier) aggregate - a single shuffle on
    l_partkey shared by the aggregate and the window, instead of the
    naive re-aggregation per outer row. Part/supplier/nation/region
    prune before the window so the windowed set is already minimal.
    The equality filter keeps ties (all suppliers at the minimum), and
    is exact: MIN selects an existing IEEE value, so both engines
    compare identical doubles.

    Exactness: the displayed price is FLOOR(price*1e4 + 0.5)/1e4, not
    ROUND(price, 4) - the round-11 tri-SF sweep caught a genuine tie
    at sf0.1 (10500.67875: Spark HALF_UP .6788 vs DuckDB .6787, the
    q174 ROUND-tie class). price is the same IEEE double on both
    engines (MIN of identical divisions), so multiply-add-floor-divide
    is four correctly-rounded ops on identical inputs - bit-identical
    by construction, no tie semantics involved."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        "p_partkey"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    # NULLIF parity with the oracle (r13 extreme census): a zero
    # quantity is an ANSI DIVIDE_BY_ZERO error on Spark but IEEE inf
    # on DuckDB; NULL on both engines keeps the MIN semantics and is
    # a no-op in contract (quantity >= 1).
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice") / F.expr("NULLIF(l_quantity, 0)")
        ).alias("price")
    )
    elig = offers.join(
        p, offers.l_partkey == p.p_partkey
    ).join(euro_supp, offers.l_suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("l_partkey")
    return (
        elig.withColumn("best", F.min("price").over(w))
        .filter(F.col("price") == F.col("best"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            (F.floor(F.col("price") * 10000 + 0.5) / 10000.0).alias(
                "best_price"
            ),
        )
    )


@query(
    "q165_important_parts",
    oracle="""
    WITH pr AS (
      SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, ROUND(rev, 0) AS revenue
    FROM pr WHERE rev > (SELECT SUM(rev) * 0.0007 FROM pr)
    """,
)
def q165_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose revenue exceeds a fraction of the
    GLOBAL total - a HAVING clause against a scalar aggregate subquery.

    Scale: the per-part aggregate is computed once; the global total is
    a second aggregation OF THE AGGREGATE (2000 rows at sf0.01, #parts
    rows generally - never a second scan of the fact), broadcast back
    as a one-row literal join. Threshold comparisons sit on sums that
    differ across engines by ~1e-15 relative, so a borderline part
    could in principle flip - with a 0.1% threshold the margin is ~12
    orders of magnitude wider than the noise."""
    li = t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev"
        )
    )
    total = pr.agg((F.sum("rev") * F.lit(0.0007)).alias("threshold"))
    return (
        pr.join(F.broadcast(total))
        .filter(F.col("rev") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("rev", 0).alias("revenue"),
        )
    )


@query(
    "q166_order_count_distribution",
    oracle="""
    WITH counts AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM counts GROUP BY c_count
    """,
)
def q166_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    INCLUDING zero-order customers - a left join whose filter lives in
    the ON clause (moving it to WHERE would silently drop the
    customers the query exists to count), followed by an aggregation
    of an aggregation.

    Scale: orders shuffles on o_custkey once; the second group-by runs
    on #customers rows, and the distribution itself is #distinct
    counts (tiny). The c_count histogram is all-integer, so the oracle
    comparison is exact."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "F"
    ).select("o_custkey", "o_orderkey")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


@query(
    "q167_top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT l_suppkey AS s_suppkey, ROUND(total_rev, 0) AS total_rev
    FROM rev WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q167_top_revenue_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue - revenue view + equality against its own MAX, keeping
    ties (which a LIMIT 1 would silently break).

    Scale: the shipdate band pushes into the parquet scan; the view is
    one shuffle on l_suppkey; the MAX-of-the-view is a scalar over
    #suppliers rows broadcast back. Each engine compares its own sums
    to its own max, so the selected supplier set only diverges if two
    suppliers sit within float-accumulation distance (~1e-9 relative)
    of each other."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            F.round("total_rev", 0).alias("total_rev"),
        )
    )


@query(
    "q168_supplier_part_counts",
    oracle="""
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM supply
    JOIN part ON p_partkey = l_partkey
             AND p_size IN (1, 5, 9, 13) AND p_brand <> 'Brand#1'
    WHERE l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p_brand, p_size
    """,
)
def q168_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers can source each
    (brand, size) bucket, excluding a blacklist via NOT IN - the
    anti-join-inside-an-aggregate pattern (the supply relation is
    derived from lineitem; the reference schema has no partsupp).

    Scale: the DISTINCT (part, supplier) projection collapses the fact
    before anything else touches it (the only full-width shuffle);
    part filters prune via an UNHINTED join (AQE broadcasts while
    small), the blacklist is an unhinted anti
    join (NULL-safe NOT IN semantics don't bite here - s_suppkey is a
    key, never NULL - but anti join is the correct translation when
    the subquery is null-free). COUNT(DISTINCT) over the pruned set is
    one Expand of a small input."""
    li = t(spark, sf_dir, "lineitem")
    supply = li.select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 5, 9, 13) & (F.col("p_brand") != "Brand#1")
    ).select("p_partkey", "p_brand", "p_size")
    bad = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        supply.join(p, supply.l_partkey == p.p_partkey)
        .join(
            bad,
            supply.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q169_excess_volume_suppliers",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ), tot AS (
      SELECT l_partkey, SUM(qty) AS total, COUNT(*) AS n_supp
      FROM pq GROUP BY l_partkey
    )
    SELECT pq.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
           ROUND(pq.qty / tot.total, 4) AS share
    FROM pq
    JOIN tot USING (l_partkey)
    JOIN supplier s ON s.s_suppkey = pq.l_suppkey
    WHERE tot.n_supp > 1 AND pq.qty > 0.6 * tot.total
    """,
)
def q169_excess_volume_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: (part, supplier) pairs where one supplier
    dominated a contested part's yearly volume (>60% of total shipped
    quantity among 2+ suppliers) - the nested
    IN-subquery-over-aggregates chain, decorrelated to windows.

    Scale: one shuffle on l_partkey serves the (part, supplier)
    aggregate and BOTH per-part windows (total and supplier count -
    no second scan, no re-aggregation); the dominant-pair list then
    joins the supplier dim (unhinted - SF-proportional, AQE decides)
    for names. Quantities are
    integral doubles, so sums and the 60% threshold compare exactly
    across engines. (Pairs, not just supplier ids: the dim has 100
    rows, so a supplier-level projection saturates and verifies
    nothing.)"""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        pq.withColumn("total", F.sum("qty").over(w))
        .withColumn("n_supp", F.count("*").over(w))
        .filter(
            (F.col("n_supp") > 1) & (F.col("qty") > 0.6 * F.col("total"))
        )
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        dominant.join(
            s, dominant.l_suppkey == s.s_suppkey
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            F.round(F.col("qty") / F.col("total"), 4).alias("share"),
        )
    )


@query(
    "q170_blamed_suppliers",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey, l_suppkey
    ), agg AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
             MAX(CASE WHEN late = 1 THEN l_suppkey END) AS blamed
      FROM li GROUP BY l_orderkey
    )
    SELECT blamed AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_blamed_orders
    FROM agg WHERE n_supp > 1 AND n_late = 1
    GROUP BY blamed
    """,
)
def q170_blamed_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: the supplier solely responsible for a
    multi-supplier order shipping late - EXISTS (another supplier in
    the order) AND NOT EXISTS (another LATE supplier), decorrelated to
    conditional aggregates per order instead of two correlated
    self-joins of the fact.

    Scale: the naive translation self-joins lineitem twice (EXISTS +
    NOT EXISTS); this form pays one orderkey shuffle, reduces each
    order to (n_supp, n_late, blamed) in a partial-agg-friendly pass,
    and filters on the tiny per-order summary. 'Late' is shipdate
    more than 90 days after the order date (the schema carries no
    commit/receipt dates)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "blamed"
        ),
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .groupBy(F.col("blamed").alias("s_suppkey"))
        .agg(F.count("*").alias("n_blamed_orders"))
    )


@query(
    "q171_idle_rich_customers",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
           ROUND(SUM(c_acctbal), 0) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
          )
      AND c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
          )
    GROUP BY n_name
    """,
)
def q171_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    order (lapsed accounts), rolled up by nation (standing in for the
    phone-prefix grouping) - scalar AVG subquery + NOT-IN anti join in
    one query. (The recency cutoff replaces Q22's never-ordered test:
    this dataset gives every customer at least one lifetime order, so
    the literal translation returns an empty - unverifiable - set.)

    Scale: the AVG threshold is a one-row broadcast; the lapsed test
    is an anti join against the date-pruned orders key projection
    (the cutoff pushes into the scan; only custkeys shuffle); nation
    is a broadcast dim. The threshold compare sits ~12 orders of
    magnitude above cross-engine float noise."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        >= F.lit("2000-06-01 00:00:00").cast("timestamp_ntz")
    ).select("o_custkey")
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("thr")
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 0).alias("total_bal"),
        )
    )


@query(
    "q182_yoy_reconciliation",
    oracle="""
    WITH y97 AS (
      SELECT o_custkey, SUM(o_totalprice) AS spend
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey
    ), y98 AS (
      SELECT o_custkey, SUM(o_totalprice) AS spend
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY o_custkey
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS c_custkey,
           CASE WHEN a.o_custkey IS NULL THEN 'only_1998'
                WHEN b.o_custkey IS NULL THEN 'only_1997'
                ELSE 'both' END AS presence,
           ROUND(COALESCE(a.spend, 0), 0) AS spend_1997,
           ROUND(COALESCE(b.spend, 0), 0) AS spend_1998,
           ROUND(COALESCE(b.spend, 0) - COALESCE(a.spend, 0), 0)
             AS yoy_delta
    FROM y97 a FULL OUTER JOIN y98 b ON a.o_custkey = b.o_custkey
    """,
)
def q182_yoy_reconciliation(spark, sf_dir):
    """Two-ledger reconciliation via FULL OUTER join - the one outer
    flavor the suite's inner/left/semi/anti vocabulary was missing.
    Per-customer 1997 vs 1998 spend: customers present in only one
    year surface as only_* rows (the rows an inner join silently
    discards and a left join only half-reports), matched customers get
    a delta.

    Scale: both yearly aggregates push their date band into the scan
    and shuffle once on custkey; the full outer join reuses that same
    key partitioning (co-partitioned, no extra shuffle in the SMJ
    plan). COALESCE handles the one-sided rows; the presence CASE
    comes from the join-key nullness, the standard reconciliation
    idiom."""
    o = t(spark, sf_dir, "orders")

    def spend(year: int):
        return (
            o.filter(
                (
                    F.col("o_orderdate")
                    >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp_ntz")
                )
                & (
                    F.col("o_orderdate")
                    < F.lit(f"{year + 1}-01-01 00:00:00").cast(
                        "timestamp_ntz"
                    )
                )
            )
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("spend"))
        )

    a = spend(1997).select(
        F.col("o_custkey").alias("ck97"), F.col("spend").alias("s97")
    )
    b = spend(1998).select(
        F.col("o_custkey").alias("ck98"), F.col("spend").alias("s98")
    )
    j = a.join(b, a.ck97 == b.ck98, "full_outer")
    return j.select(
        F.coalesce("ck97", "ck98").alias("c_custkey"),
        F.when(F.col("ck97").isNull(), "only_1998")
        .when(F.col("ck98").isNull(), "only_1997")
        .otherwise("both")
        .alias("presence"),
        F.round(F.coalesce("s97", F.lit(0.0)), 0).alias("spend_1997"),
        F.round(F.coalesce("s98", F.lit(0.0)), 0).alias("spend_1998"),
        F.round(
            F.coalesce("s98", F.lit(0.0)) - F.coalesce("s97", F.lit(0.0)),
            0,
        ).alias("yoy_delta"),
    )


# ---------------------------------------------------------------------------
# q188-q196: the rest of the 22 classic TPC-H query shapes (Q3, Q4, Q6,
# Q9, Q10, Q14, Q17, Q18, Q19), completing the full set alongside
# q14/q17/q97/q130/q146/q164-q171. Adapted where the slim schema lacks
# partsupp / commit dates; the plan SHAPE is the point.
# ---------------------------------------------------------------------------


@query(
    "q188_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 0) AS revenue,
           CAST(epoch_us(o.o_orderdate) AS BIGINT) AS orderdate_us,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q188_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: top unshipped-revenue orders for one market
    segment - two fact joins under anti-correlated date predicates,
    aggregate per order, global top-k.

    Scale: both date filters and the segment filter push into their
    scans before any join; the top-k compiles to
    TakeOrderedAndProject over the aggregate (k rows per partition to
    the driver, never a full sort). Tie-break on orderkey keeps the
    selected set deterministic."""
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                0,
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros(
                F.col("o_orderdate").cast("timestamp")
            ).alias("orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q189_priority_check",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q189_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: order counts per priority where EXISTS a
    slow-shipping lineitem - the correlated EXISTS as a left-semi
    join (the 'late' test is shipdate vs orderdate + 60 days; the
    slim schema has no commit/receipt dates).

    Scale: the quarter filter prunes orders before the semi join; the
    semi join shuffles only orderkeys + the date pair and
    short-circuits per key (no pair multiplication, no dedup step -
    semantics an inner-join-then-distinct would need)."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (
            li.l_shipdate
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@query(
    "q190_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q190_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the pure scan-predicate aggregate - no join at
    all; the entire query is predicate pushdown + one map-side
    combinable sum. The benchmark's measure of raw scan/filter
    throughput: at 100 TB this runs at storage bandwidth, with all
    four predicates evaluated against parquet row-group statistics
    before any row is materialized."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 0
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q191_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.5 * p.p_retailprice * l.l_quantity), 0) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%ring%'
    GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
    """,
)
def q191_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: product-line profit by supplier nation and
    year - the 5-way join tree with a LIKE filter on the part dim and
    an arithmetic measure mixing columns from three tables (supply
    cost proxied by half the part's retail price; the slim schema has
    no partsupp).

    Scale: the LIKE prunes part BEFORE the join, shrinking the build
    side AQE sees; part/supplier joins are UNHINTED (data-proportional
    dims - broadcast-when-small is AQE's call); nation broadcasts
    (fixed 25 rows); the only
    fact-fact shuffle is lineitem x orders on orderkey. Group
    keyspace is |nations| x |years| - the final agg is almost free."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%ring%")
    ).select("p_partkey", "p_retailprice")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 0).alias("profit"))
    )


@query(
    "q192_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 0) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q192_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top customers by returned-merchandise revenue
    in a quarter - fact-fact join under a returnflag filter, customer
    enrichment, top-20.

    Scale: the returnflag filter (a low-cardinality dictionary
    column) and the quarter band both push to the scans; the top-k is
    TakeOrderedAndProject over the per-customer aggregate with an
    orderkey-free deterministic tie-break on custkey."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                0,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q193_promo_share",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN l.l_extendedprice * (1 - l.l_discount)
                     ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS promo_revenue_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q193_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue as a share of total for one
    month - conditional aggregation over a dim join, both sums in the
    SAME pass (never two scans + a divide of scalars).

    Scale: the part join is unhinted (AQE broadcasts while small;
    part is data-proportional); the month band prunes lineitem at the
    scan; the whole measure is one partial+final agg producing a
    single row."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias(
                "promo_revenue_pct"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q194_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 230
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(epoch_us(o.o_orderdate) AS BIGINT) AS orderdate_us,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(b.total_qty, 1) AS total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q194_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: customers with very-large-volume orders - the
    HAVING-over-an-aggregate feeding a join back to the facts (the
    classic 'IN (GROUP BY ... HAVING)' decorrelated to a join).

    Scale: the quantity rollup is one orderkey shuffle with map-side
    combine; the HAVING prunes to a tiny key set that then
    JOINS (semi-shaped) against orders - at 100 TB the pruned key
    list is broadcastable and the expensive side is never rescanned.
    Threshold 230 sits at this data's p98 of per-order quantity
    (TPC-H's 300 assumes 7 lines x quantity<=50), keeping the result
    selective."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 230)
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros(
                F.col("o_orderdate").cast("timestamp")
            ).alias("orderdate_us"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 1).alias("total_qty"),
        )
    )


@query(
    "q195_disjunctive_predicate",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 0)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q195_disjunctive_predicate(spark, sf_dir):
    """TPC-H Q19 shape: the disjunctive (OR-of-conjunctions) join
    predicate - three brand/size/quantity bands OR'd together across
    the join, the canonical test of a planner's ability to keep an
    OR-DNF predicate as a post-join filter on a plain equi-join
    instead of degrading to a nested loop.

    Scale: the join stays a partkey equi-join (the OR only gates
    rows, not keys); Catalyst additionally derives the
    brand-IN-(...) prune on the part side from the disjunction, so
    the build side AQE sees carries three brands, not the whole
    dim."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(band).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q196_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 0) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.half_avg
    """,
)
def q196_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue locked in small-quantity orders - the
    correlated per-part AVG subquery, decorrelated to one aggregate
    joined back to the fact (never a re-aggregation per outer row).

    Scale: the per-part average is one partkey shuffle of (sum,
    count) partials; the join-back reuses the same key. The AVG
    threshold comparison is double-vs-double computed identically in
    both engines from integral quantities, and the final sum rounds
    to whole units per the money policy."""
    li = t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(avg_qty, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q234: right-to-erasure cascade audit (GDPR delete propagation)
# ---------------------------------------------------------------------------

#: the deletion cohort: customers whose key hashes into the erasure
#: list (a deterministic stand-in for "users who filed a request").
_ERASE_MOD = 97


@query(
    "q234_erasure_cascade_audit",
    oracle=f"""
    WITH del_cust AS (
      SELECT c_custkey FROM customer WHERE c_custkey % {_ERASE_MOD} = 0
    ),
    del_orders AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
    )
    SELECT 'customer' AS table_name,
           CAST((SELECT COUNT(*) FROM del_cust) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'orders', CAST((SELECT COUNT(*) FROM del_orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))
                AS BIGINT)
    """,
)
def q234_erasure_cascade_audit(spark, sf_dir):
    """Right-to-erasure CASCADE audit: given a deletion cohort
    (customers with c_custkey % 97 == 0 standing in for
    filed GDPR requests), count every row that must disappear along
    the foreign-key chain customer -> orders -> lineitem - the
    pre-delete impact report a compliance pipeline signs off on before
    the actual anti-join rewrite (which is this exact plan with
    ``left_anti`` in place of ``left_semi``).

    Scale: each hop is a LEFT SEMI join on the parent's key set - the
    cohort is broadcast-sized, the orders key set flows into a
    shuffle-or-broadcast semi join under AQE, and only keys travel.
    The three counts collapse to 1-row aggregates unioned into the
    audit frame - no fact columns are ever materialized."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    del_cust = cust.filter(F.col("c_custkey") % _ERASE_MOD == 0).select(
        "c_custkey"
    )
    del_orders = orders.join(
        del_cust,
        orders["o_custkey"] == del_cust["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    del_li = li.join(
        del_orders,
        li["l_orderkey"] == del_orders["o_orderkey"],
        "left_semi",
    )
    spark_ = cust.sparkSession
    rows = [
        del_cust.agg(F.count("*").cast("long").alias("n_rows")).select(
            F.lit("customer").alias("table_name"), "n_rows"
        ),
        del_orders.agg(F.count("*").cast("long").alias("n_rows")).select(
            F.lit("orders").alias("table_name"), "n_rows"
        ),
        del_li.agg(F.count("*").cast("long").alias("n_rows")).select(
            F.lit("lineitem").alias("table_name"), "n_rows"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# q370: join-cardinality estimator audit (CBO diagnostics)
# ---------------------------------------------------------------------------

#: the audited equi-joins: (fact, dim, key) triples spanning the
#: star schema's four arms.
_CARD_JOINS = (
    ("orders", "lineitem", "o_orderkey", "l_orderkey"),
    ("customer", "orders", "c_custkey", "o_custkey"),
    ("part", "lineitem", "p_partkey", "l_partkey"),
    ("supplier", "lineitem", "s_suppkey", "l_suppkey"),
)


def _card_oracle() -> str:
    rows = []
    for t1, t2, k1, k2 in _CARD_JOINS:
        rows.append(f"""
    SELECT '{t1}*{t2}' AS join_pair,
           s1.n AS n_left, s2.n AS n_right,
           s1.ndv AS ndv_left, s2.ndv AS ndv_right,
           CASE WHEN GREATEST(s1.ndv, s2.ndv) > 0
                THEN (s1.n * s2.n) // GREATEST(s1.ndv, s2.ndv)
                END AS est_rows,
           a.actual AS actual_rows,
           CASE WHEN GREATEST(s1.ndv, s2.ndv) > 0
                 AND (s1.n * s2.n) // GREATEST(s1.ndv, s2.ndv) > 0
                 AND a.actual > 0
                THEN ROUND(GREATEST(
             CAST((s1.n * s2.n) // GREATEST(s1.ndv, s2.ndv) AS DOUBLE)
               / a.actual,
             CAST(a.actual AS DOUBLE)
               / ((s1.n * s2.n) // GREATEST(s1.ndv, s2.ndv))), 4)
                END AS q_error
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT {k1}) AS BIGINT) AS ndv
          FROM {t1}) s1,
         (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT {k2}) AS BIGINT) AS ndv
          FROM {t2}) s2,
         (SELECT CAST(COUNT(*) AS BIGINT) AS actual
          FROM {t1} JOIN {t2} ON {t1}.{k1} = {t2}.{k2}) a""")
    return "\n    UNION ALL ".join(rows)


@query("q370_join_cardinality_audit", oracle=_card_oracle())
def q370_join_cardinality_audit(spark, sf_dir):
    """JOIN-CARDINALITY ESTIMATOR AUDIT: for each star-schema arm,
    the textbook uniformity estimate |R|*|S| / max(ndv_R, ndv_S)
    against the TRUE join cardinality, with the q-error
    (max(est/act, act/est) - Moerkotte et al. 2009) a cost-based
    optimizer's planning risk is measured in. A q-error near 1 means
    NDV statistics alone plan this join well; a large one flags
    skew/correlation where a histogram or runtime re-plan (AQE) is
    load-bearing. This is the engine auditing ITS OWN planning
    statistics - the observability layer a 100 TB deployment runs
    after every stats refresh.

    Exactness: row counts and EXACT NDVs are bigints; the estimate
    uses the shared truncating division; q-error is one double
    division of exact integers, rounded at 4dp.

    Scale: per arm, two single-pass aggregates (count + distinct) and
    one equi-join count - each the natural shuffle shape. At
    deployment scale the NDVs would come from the catalog's stats
    (this query IS the stats-validation job), and the actual-count
    probe runs on a sampled partition instead of the full fact."""
    out = None
    for t1n, t2n, k1, k2 in _CARD_JOINS:
        d1 = t(spark, sf_dir, t1n)
        d2 = t(spark, sf_dir, t2n)
        s1 = d1.agg(
            F.count("*").cast("long").alias("n_left"),
            F.countDistinct(k1).cast("long").alias("ndv_left"),
        )
        s2 = d2.agg(
            F.count("*").cast("long").alias("n_right"),
            F.countDistinct(k2).cast("long").alias("ndv_right"),
        )
        a = (
            d1.select(k1)
            .join(d2.select(k2), d1[k1] == d2[k2])
            .agg(F.count("*").cast("long").alias("actual_rows"))
        )
        # guards literal-identical to the oracle CASEs (q421 parity;
        # r11 empty-corpus census: DIV 0 / ANSI division errored on
        # empty tables where both engines should NULL)
        est = F.expr(
            "CASE WHEN GREATEST(ndv_left, ndv_right) > 0"
            " THEN (n_left * n_right) DIV GREATEST(ndv_left, ndv_right)"
            " END"
        )
        row = (
            s1.crossJoin(F.broadcast(s2))
            .crossJoin(F.broadcast(a))
            .select(
                F.lit(f"{t1n}*{t2n}").alias("join_pair"),
                "n_left",
                "n_right",
                "ndv_left",
                "ndv_right",
                est.cast("long").alias("est_rows"),
                "actual_rows",
                F.when(
                    (est > 0) & (F.col("actual_rows") > 0),
                    F.round(
                        F.greatest(
                            est.cast("double") / F.col("actual_rows"),
                            F.col("actual_rows").cast("double") / est,
                        ),
                        4,
                    ),
                ).alias("q_error"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
