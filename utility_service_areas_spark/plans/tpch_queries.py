"""Classic decision-support query shapes on the substrate (engine
breadth beyond the reference's own surface): multi-way join volume
reports, correlated-aggregate subqueries — the query classes a user
of a general OLAP engine runs daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from utility_service_areas_spark.plans.registry import query
from utility_service_areas_spark.sources.tables import load_table


@query(
    "regional_order_volume",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           count(*) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 5-way join (two broadcast dims), pushed date "
    "filter, revenue per nation.",
    tags=("tpch", "bench"),
)
def regional_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from utility_service_areas_spark.operators.spread import cpu_spread

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # Relational-budget spread of a too-narrow local lineitem scan;
    # wide cluster scans pass through untouched. Here lineitem is the
    # LARGEST join input, so when it is under the broadcast threshold
    # the engine builds the broadcast from it and the spread Exchange
    # fed a BroadcastExchange — pure overhead (r17 driver −22%);
    # skip_if_broadcastable suppresses the spread in exactly that
    # regime and keeps it for at-scale scans.
    li = cpu_spread(
        load_table(spark, sf_dir, "lineitem"),
        F.col("l_orderkey"),
        bytes_per_task=3 << 19,
        skip_if_broadcastable=True,
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "max_size_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, CAST(p_size AS BIGINT) AS p_size
    FROM part p
    WHERE p_size = (SELECT max(p2.p_size) FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
    doc="Correlated-subquery shape (max within group) — planned as a "
    "window max + filter (one shuffle, no rescan of the table).",
    tags=("tpch",),
)
def max_size_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("__mx", F.max("p_size").over(w))
        .filter(F.col("p_size") == F.col("__mx"))
        .select("p_brand", "p_partkey", "p_name", F.col("p_size").cast("long"))
    )


@query(
    "nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_cents) AS BIGINT) AS revenue_cents
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             -- per-row cents, summed as integers: order-independent
             -- (a double sum of ~300 values/group lands on rounding
             -- boundaries often enough to flip a hash)
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                 AS volume_cents
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_nationkey <> n2.n_nationkey)
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between nations — "
    "6-way join with the nation dim broadcast twice under different "
    "aliases.",
    tags=("tpch",),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(F.col("n1_key") != F.col("n2_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("revenue_cents")
        )
    )


@query(
    "supplier_count_by_part_type",
    oracle="""
    SELECT p.p_type, count(DISTINCT l.l_suppkey) AS n_suppliers,
           count(*) AS n_lineitems
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
    GROUP BY p.p_type
    """,
    doc="TPC-H Q16 shape: distinct-supplier counts per part type with "
    "a brand exclusion; distinct-agg expands to a two-phase plan.",
    tags=("tpch",),
)
def supplier_count_by_part_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .groupBy("p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "events_value_quartiles",
    oracle="""
    WITH cut AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.50) AS q2,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           CAST(CASE WHEN e.value <= c.q1 THEN 1
                     WHEN e.value <= c.q2 THEN 2
                     WHEN e.value <= c.q3 THEN 3
                     ELSE 4 END AS BIGINT) AS quartile
    FROM events e JOIN cut c USING (event_type)
    """,
    doc="Per-type value quartile assignment via broadcast percentile "
    "cutoffs + CASE. Scale posture: the naive ntile() window would "
    "sort each event_type's ENTIRE row set in one reducer; here the "
    "heavy agg emits 3 numbers per type (partial-agged), the cutoffs "
    "broadcast, and rows never shuffle. Spark's exact percentile() "
    "interpolates identically to DuckDB quantile_cont. At 100 TB, "
    "swap percentile→approx_percentile (same plan shape; the agg "
    "state becomes a constant-size sketch).",
    tags=("analytics",),
)
def events_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    cut = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.50)").alias("q2"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    quartile = (
        F.when(F.col("value") <= F.col("q1"), 1)
        .when(F.col("value") <= F.col("q2"), 2)
        .when(F.col("value") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return ev.join(F.broadcast(cut), "event_type").select(
        "event_id", "event_type", quartile.cast("long").alias("quartile")
    )


@query(
    "customers_above_avg_spend",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey, total_cents FROM spend
    WHERE total_cents > (SELECT avg(total_cents) FROM spend)
    """,
    doc="Scalar-aggregate subquery shape: customers spending above the "
    "mean; the scalar is a broadcast, not a rescan.",
    tags=("tpch",),
)
def customers_above_avg_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents")
    )
    avg_val = spend.agg(F.avg("total_cents").alias("a"))
    return (
        spend.join(F.broadcast(avg_val))
        .filter(F.col("total_cents") > F.col("a"))
        .select("o_custkey", "total_cents")
    )


@query(
    "orders_with_late_items",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (EXISTS decorrelated to a LEFT SEMI join): "
    "orders with a lineitem shipped >60 days after order date, counted "
    "per priority. One shuffle join on orderkey, then a tiny partial "
    "agg — the semi join never duplicates order rows however many "
    "lineitems match.",
    tags=("tpch",),
)
def orders_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, count(*) AS n_customers
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: order-count-per-customer distribution via a "
    "filtered LEFT OUTER join (customers with zero matches must "
    "survive with count 0) + two-level aggregation. Both aggs are "
    "partial; the second one's key space is tiny (distinct counts).",
    tags=("tpch",),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "dormant_high_balance_customers",
    oracle="""
    WITH bal AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer)
    SELECT c_mktsegment, count(*) AS n_customers,
           CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
    FROM bal b
    WHERE bal_cents > (SELECT avg(bal_cents) FROM bal WHERE bal_cents > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = b.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no "
    "RECENT orders (scalar-agg subquery + NOT EXISTS anti join), "
    "counted per segment. The threshold is averaged over exact "
    "cents-bigints so Spark and DuckDB agree bitwise; the date filter "
    "is pushed to the orders scan before the anti join shuffles.",
    tags=("tpch",),
)
def dormant_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("bal_cents") > 0).agg(F.avg("bal_cents").alias("a"))
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("bal_cents") > F.col("a"))
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("bal_cents").alias("total_bal_cents"),
    )


@query(
    "order_status_priority_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping-set aggregation (all 4 rollup combinations in "
    "one pass) with GROUPING flags distinguishing 'ALL' from a real "
    "value. Single expand+partial-agg plan — no rescan per grouping "
    "set.",
    tags=("tpch",),
)
def order_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_cents",
        )
    )


@query(
    "supplier_ship_gap_stats",
    oracle="""
    WITH d AS (SELECT DISTINCT l_suppkey, l_shipdate FROM lineitem),
    g AS (
      SELECT l_suppkey,
             date_diff('day',
                       lag(l_shipdate) OVER (PARTITION BY l_suppkey
                                             ORDER BY l_shipdate),
                       l_shipdate) AS gap
      FROM d)
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(max(gap) AS BIGINT) AS max_gap_days,
           CAST(sum(gap) AS BIGINT) AS span_days
    FROM g WHERE gap IS NOT NULL
    GROUP BY l_suppkey
    """,
    doc="LAG window shape: per-supplier gaps between consecutive "
    "distinct ship dates. The DISTINCT collapse runs before the window "
    "(deterministic total order per partition: dates are unique after "
    "it), so the sort handles one row per (supplier, day) — bounded by "
    "the calendar, not the fact table, at 100 TB.",
    tags=("tpch",),
)
def supplier_ship_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_suppkey", "l_shipdate").distinct()
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate")
    g = d.withColumn(
        "gap", F.datediff(F.col("l_shipdate"), F.lag("l_shipdate").over(w))
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap").cast("long").alias("max_gap_days"),
        F.sum("gap").cast("long").alias("span_days"),
    )


@query(
    "customer_retention_setops",
    oracle="""
    SELECT 'retained' AS segment, o_custkey FROM
      (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
       INTERSECT
       SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    UNION ALL
    SELECT 'churned' AS segment, o_custkey FROM
      (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
       EXCEPT
       SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    """,
    doc="Set-operator breadth (INTERSECT / EXCEPT, both DISTINCT "
    "semantics): 1995 customers split into retained-in-1997 vs "
    "churned. Spark plans both as aggregated joins on the dedup key — "
    "partial-agg shuffles, no row explosion.",
    tags=("tpch",),
)
def customer_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    retained = y95.intersect(y97).select(
        F.lit("retained").alias("segment"), "o_custkey"
    )
    churned = y95.subtract(y97).select(F.lit("churned").alias("segment"), "o_custkey")
    return retained.unionByName(churned)


@query(
    "small_lot_revenue_by_brand",
    oracle="""
    SELECT p.p_brand,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS small_lot_cents,
           count(*) AS n_lineitems
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
    """,
    doc="TPC-H Q17 shape (correlated scalar subquery): lineitems below "
    "20% of their part's average quantity. Planned as a window avg "
    "over l_partkey + filter — ONE pass over lineitem instead of the "
    "correlated rescan. The quantities are integer-valued doubles, so "
    "the window average is exact and order-independent on both "
    "engines.",
    tags=("tpch",),
)
def small_lot_revenue_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    w = Window.partitionBy("l_partkey")
    small = li.withColumn("avg_q", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_q")
    )
    return (
        small.join(p, small.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "small_lot_cents"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    SELECT o.o_orderkey, o.o_custkey, big.total_qty,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey
    """,
    doc="TPC-H Q18 shape (HAVING-filtered agg subquery join): orders "
    "whose total lineitem quantity exceeds a threshold. The agg runs "
    "partial → HAVING prunes BEFORE the join (tiny build side, AQE "
    "can broadcast it); quantities sum exactly as integer-valued "
    "doubles.",
    tags=("tpch",),
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey", F.col("q").cast("long").alias("total_qty"))
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        "total_qty",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )


@query(
    "promo_revenue_share_by_month",
    oracle="""
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS y,
           CAST(month(l.l_shipdate) AS BIGINT) AS m,
           CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                         * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY y, m
    """,
    doc="TPC-H Q14 shape: promo revenue share per month — conditional "
    "aggregation inside one partial-agged pass. The share is emitted "
    "as exact integer numerator/denominator (divide downstream); no "
    "float ratio ever enters the result.",
    tags=("tpch",),
)
def promo_revenue_share_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("long").alias("y"),
            F.month("l_shipdate").cast("long").alias("m"),
        )
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(0)).alias(
                "promo_cents"
            ),
            F.sum(cents).alias("total_cents"),
        )
    )


@query(
    "nation_market_share_inputs",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS y,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
                         THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                         * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS region_cents
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN nation n1   ON n1.n_nationkey = c.c_nationkey
    JOIN region r    ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation n2   ON n2.n_nationkey = s.s_nationkey
    GROUP BY y
    """,
    doc="TPC-H Q8 shape: a supplier nation's market share inside one "
    "region per year — 7-way join, three broadcast dims (nation "
    "twice), share emitted as exact integer numerator/denominator. "
    "The region filter rides the broadcast build side, pruning the "
    "probe early.",
    tags=("tpch",),
)
def nation_market_share_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("n1_region"))
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n2), F.col("n2_key") == s.s_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("y"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_7", cents).otherwise(0)
            ).alias("nation_cents"),
            F.sum(cents).alias("region_cents"),
        )
    )


@query(
    "disjunctive_bracket_revenue",
    oracle="""
    SELECT count(*) AS n_lineitems,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 25 AND 50
           AND l.l_quantity BETWEEN 25 AND 50)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-bracket predicate across "
    "both join sides. Catalyst extracts the common single-side "
    "conjuncts (brand/size brackets prune the part scan; quantity "
    "bounds prune lineitem) before the join evaluates the full OR.",
    tags=("tpch",),
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(10, 30) & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#5") & sz.between(25, 50) & q.between(25, 50))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("revenue_cents"),
        )
    )


@query(
    "order_fulfillment_latency",
    oracle="""
    WITH first_ship AS (
      SELECT l_orderkey, min(l_shipdate) AS first_ship
      FROM lineitem GROUP BY l_orderkey)
    SELECT o.o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(f.first_ship AS DATE))) AS BIGINT)
               AS total_latency_days,
           CAST(max(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(f.first_ship AS DATE))) AS BIGINT)
               AS max_latency_days
    FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Fulfillment latency per priority: per-order min ship date "
    "(partial-agged) joined back to orders, day-difference aggregated "
    "as exact integers (divide sum/count downstream for the average). "
    "Two shuffles total; the per-order agg output is orders-sized, "
    "joined on the same key it was grouped by — AQE reuses the "
    "partitioning.",
    tags=("tpch",),
)
def order_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    lat = F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate"))
    return (
        o.join(first_ship, o.o_orderkey == first_ship.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(lat).cast("long").alias("total_latency_days"),
            F.max(lat).cast("long").alias("max_latency_days"),
        )
    )


@query(
    "simple_revenue_delta",
    oracle="""
    SELECT count(*) AS n_lineitems,
           CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
                AS BIGINT) AS delta_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure predicate aggregate — the whole WHERE "
    "clause (date range, discount band, quantity cap) is pushed to the "
    "parquet scan, the agg is one map-side partial + a single-row "
    "reduce. No join, no wide shuffle; the cheapest possible full-scan "
    "query at 100 TB.",
    tags=("tpch",),
)
def simple_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")
            ).alias("delta_cents"),
        )
    )


@query(
    "returned_item_report",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS lost_revenue_cents
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue_cents DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by revenue lost to returns "
    "in a year. Nation dim broadcast; the final ranking plans as "
    "TakeOrderedAndProject (per-partition top-20 heap + driver merge), "
    "never a full sort. Tie-break on c_custkey keeps the LIMIT "
    "boundary deterministic across engines.",
    tags=("tpch",),
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("lost_revenue_cents")
        )
        .orderBy(F.col("lost_revenue_cents").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "profit_by_nation_year",
    oracle="""
    SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)
                    - CAST(round(p.p_retailprice) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT)) AS BIGINT)
               AS profit_proxy_cents
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE contains(p.p_name, 'red')
    GROUP BY n.n_name, o_year
    """,
    doc="TPC-H Q9 shape (profit by supplier nation and year, part name "
    "filtered by color). The substrate has no partsupp, so unit cost "
    "is proxied by round(p_retailprice) cents/unit — the point is the "
    "plan shape: the p_name filter prunes the broadcast part dim "
    "BEFORE the fact join, nation rides broadcast, and the per-row "
    "amount is exact integer cents (quantity is an integer-valued "
    "double).",
    tags=("tpch",),
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
        - F.round(F.col("p_retailprice")).cast("long") * F.col("l_quantity").cast("long")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(amount).cast("long").alias("profit_proxy_cents"))
    )


@query(
    "part_revenue_concentration",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS part_cents
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, part_cents
    FROM per_part
    WHERE part_cents * (SELECT count(*) FROM per_part) * 4
          > 5 * (SELECT sum(part_cents) FROM per_part)
    """,
    doc="TPC-H Q11 shape (group share above a global-total fraction): "
    "parts whose revenue exceeds 1.25× the mean part share — a "
    "scale-invariant cut (Q11's literal fraction degenerates as the "
    "part count grows). The global total+count is a one-row broadcast "
    "joined against the per-part agg — no second scan of lineitem, no "
    "window over a single partition. The share test is pure integer "
    "arithmetic (cents*n_parts*4 > 5*total), so no float ratio can "
    "flip "
    "the boundary between engines.",
    tags=("tpch",),
)
def part_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        ).alias("part_cents")
    )
    total = per_part.agg(
        F.sum("part_cents").alias("__total"), F.count(F.lit(1)).alias("__n")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_cents") * F.col("__n") * 4 > 5 * F.col("__total"))
        .select("l_partkey", "part_cents")
    )


@query(
    "top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
    """,
    doc="TPC-H Q15 shape (view + scalar max): the supplier(s) with the "
    "highest revenue in 1996Q1. The quarterly agg is computed once and "
    "reused for both the scalar max (one-row broadcast) and the "
    "equality filter — no rescan, no single-partition window. Ties "
    "all surface (same semantics as Q15's spec).",
    tags=("tpch",),
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("total_cents")
        )
    )
    mx = rev.agg(F.max("total_cents").alias("__mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("__mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_cents")
    )


@query(
    "excess_quantity_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(count(*) AS BIGINT) AS n_excess_parts
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN (
      SELECT l_suppkey, l_partkey
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE contains(p_name, 'red'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 50
    ) ex ON ex.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name, n.n_name
    """,
    doc="TPC-H Q20 shape (nested IN + agg-HAVING subquery): suppliers "
    "who moved more than 50 units of any single red part in 1996. The "
    "part-name filter is a broadcast LEFT SEMI against lineitem, the "
    "(supplier, part) agg prunes with HAVING before touching the "
    "supplier dim, and nation rides broadcast. The inner agg's output "
    "is bounded by (suppliers × red parts), far below the fact table.",
    tags=("tpch",),
)
def excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    ex = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 50)
        .select("l_suppkey")
    )
    return (
        ex.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_excess_parts"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", F.col("n_excess_parts").cast("long"))
    )


@query(
    "supplier_order_exclusivity",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supps
      FROM lineitem GROUP BY l_orderkey)
    SELECT l.l_suppkey,
           CAST(sum(CASE WHEN p.n_supps = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_solo_orders,
           CAST(sum(CASE WHEN p.n_supps > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_orders
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) l
    JOIN per_order p ON p.l_orderkey = l.l_orderkey
    GROUP BY l.l_suppkey
    """,
    doc="TPC-H Q21 shape (correlated EXISTS on the fact table itself): "
    "per supplier, how many orders they served alone vs alongside "
    "other suppliers. The EXISTS(other supplier in same order) / NOT "
    "EXISTS pair decorrelates into ONE per-order distinct-supplier "
    "count joined back on the same key — two shuffles on l_orderkey "
    "(AQE reuses the partitioning), never a per-row rescan.",
    tags=("tpch",),
)
def supplier_order_exclusivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps")
    )
    return (
        pairs.join(per_order, "l_orderkey")
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(F.col("n_supps") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_solo_orders"),
            F.sum(F.when(F.col("n_supps") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_orders"),
        )
    )


@query(
    "min_cost_supplier_per_part",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    best AS (
      SELECT l_partkey, l_suppkey, cost,
             min(cost) OVER (PARTITION BY l_partkey) AS best_cost
      FROM costs)
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
           CAST(round(b.cost * 100) AS BIGINT) AS cost_cents
    FROM best b
    JOIN part p     ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE b.cost = b.best_cost
      AND p.p_size <= 10 AND p.p_type = 'PROMO'
      AND r.r_name = 'EUROPE'
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part, correlated min "
    "subquery over a join): the correlated `cost = (SELECT min ...)` "
    "decorrelates into one groupBy + one window-min over the same "
    "partitioning (back-to-back, no extra shuffle), then broadcast "
    "joins against the filtered part/supplier/nation/region dims. The "
    "fact table is scanned once; min() is order-insensitive so the "
    "cents value is hash-stable.",
    tags=("tpch",),
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("best_cost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("best_cost")
    )
    dims = (
        F.broadcast(s)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            n.n_regionkey == r.r_regionkey,
        )
    )
    return (
        best.join(
            F.broadcast(p.filter((F.col("p_size") <= 10) & (F.col("p_type") == "PROMO"))),
            best.l_partkey == p.p_partkey,
        )
        .join(dims, best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round(F.col("cost") * 100).cast("long").alias("cost_cents"),
        )
    )


@query(
    "unshipped_order_revenue",
    oracle="""
    SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1997-06-01'
      AND l.l_shipdate  > TIMESTAMP '1997-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_cents DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping-priority top-N): orders placed "
    "before the cutoff with lineitems still unshipped after it, "
    "ranked by outstanding revenue. Both date predicates push to the "
    "scans; the final ORDER BY ... LIMIT plans as "
    "TakeOrderedAndProject (per-partition top-10 heaps merged on the "
    "driver — no cluster-wide sort). l_orderkey tiebreak keeps the "
    "LIMIT boundary deterministic for the oracle hash.",
    tags=("tpch", "bench"),
)
def unshipped_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-06-01").cast("timestamp")
    return (
        o.filter(F.col("o_orderdate") < cutoff)
        .join(li.filter(F.col("l_shipdate") > cutoff), o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "priority_counts_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape (conditional two-bucket counts per group): "
    "urgent-vs-other order counts per return flag for a one-year ship "
    "window. The CASE buckets fold into one partial agg (map-side "
    "combine on ~3 keys); the ship-date range pushes to the lineitem "
    "scan so the join only sees the window.",
    tags=("tpch",),
)
def priority_counts_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "market_basket_pairs",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
    tot AS (SELECT l_partkey, count(*) AS n_ord FROM li GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_co
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, CAST(n_co AS BIGINT) AS n_co,
           CAST(ta.n_ord AS BIGINT) AS n_a,
           CAST(tb.n_ord AS BIGINT) AS n_b,
           CAST(floor(n_co * 1.0 * n_orders * 1000000
                      / (ta.n_ord * tb.n_ord) + 0.5) AS BIGINT)
             AS lift_micros
    FROM pairs
    JOIN tot ta ON part_a = ta.l_partkey
    JOIN tot tb ON part_b = tb.l_partkey
    CROSS JOIN n
    WHERE n_co >= 2
    """,
    doc="Market-basket affinity: part pairs co-ordered in >= 2 orders "
    "with lift = P(a,b)/(P(a)P(b)) as micros (integer-ratio double, "
    "operand-order mirrored — no log). Pair generation is bucketed "
    "BY ORDER via in-row array combinations (an order has <= ~17 "
    "items, so the expansion is bounded per row and the corpus never "
    "self-joins at scale); totals and the order count attach as "
    "dimension-sized joins + a 1-row broadcast.",
    tags=("tpch", "analytics"),
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.select(F.countDistinct("l_orderkey").alias("n_orders"))
    tot = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_ord"))
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    pair_expr = (
        "flatten(transform(items, (a, i) -> "
        "transform(slice(items, i + 2, size(items) - i - 1), "
        "b -> struct(a AS part_a, b AS part_b))))"
    )
    pairs = (
        baskets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
    )
    ta = tot.select(F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("n_a"))
    tb = tot.select(F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("n_b"))
    lift = F.floor(
        F.col("n_co") * 1.0 * F.col("n_orders") * 1_000_000
        / (F.col("n_a") * F.col("n_b"))
        + 0.5
    )
    return (
        pairs.join(ta, "part_a")
        .join(tb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("n_co").cast("long").alias("n_co"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            lift.cast("long").alias("lift_micros"),
        )
    )


@query(
    "customers_all_quarters_1996",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders_1996
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY o_custkey
    HAVING count(DISTINCT date_trunc('quarter', o_orderdate)) = 4
    """,
    doc="Relational DIVISION (the 'for all' quantifier — Codd's ÷): "
    "customers who ordered in EVERY quarter of 1996. Division over an "
    "enumerable divisor compiles to count(DISTINCT bucket) == |divisor| "
    "— one grouped aggregate with a distinct-count, no divisor "
    "cross-join, no NOT EXISTS double negation (which would cost two "
    "correlated anti-joins). Scale shape: the year filter is pushed "
    "to the parquet scan; ONE partial-agged shuffle on o_custkey; the "
    "HAVING is evaluated post-agg on customer-count rows.",
    tags=("tpch",),
)
def customers_all_quarters_1996(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders_1996"),
            F.countDistinct(F.date_trunc("quarter", "o_orderdate")).alias("nq"),
        )
        .filter(F.col("nq") == 4)
        .select("o_custkey", "n_orders_1996")
    )


@query(
    "customer_order_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
    isl AS (
      SELECT o_custkey, d,
             d - CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY d)
                      AS INTEGER) AS grp
      FROM days)
    SELECT o_custkey, CAST(count(DISTINCT grp) AS BIGINT) AS n_islands,
           CAST(max(cnt) AS BIGINT) AS longest_streak_days
    FROM (SELECT o_custkey, grp, count(*) AS cnt FROM isl GROUP BY 1, 2) t
    GROUP BY o_custkey
    """,
    doc="Gaps-and-islands: consecutive-day order streaks per customer "
    "via the classic date-minus-row_number trick (consecutive days "
    "share the same difference, so islands fall out of one grouped "
    "count — no self-join, no recursive CTE). Output: island count "
    "and longest streak per customer — the engagement-continuity "
    "metric. Scale shape: distinct (customer, day) in one "
    "partial-agged shuffle; the row_number window partitions per "
    "customer over activity DAYS (calendar-bounded), then two "
    "small grouped aggs on the same key.",
    tags=("tpch",),
)
def customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    days = od.select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("d")
    isl = days.select(
        "o_custkey",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("grp"),
    )
    per_island = isl.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_island.groupBy("o_custkey").agg(
        F.countDistinct("grp").cast("long").alias("n_islands"),
        F.max("cnt").cast("long").alias("longest_streak_days"),
    )
