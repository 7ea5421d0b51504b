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
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100) AS BIGINT)
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
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
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
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
            .cast("long")
            .alias("revenue_cents"),
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
    "customers_above_avg_spend",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS total_cents
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
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("total_cents")
    )
    avg_val = spend.agg(F.avg("total_cents").alias("a"))
    return (
        spend.join(F.broadcast(avg_val))
        .filter(F.col("total_cents") > F.col("a"))
        .select("o_custkey", "total_cents")
    )
