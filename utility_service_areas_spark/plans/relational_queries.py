"""SURVEY.md §2.1 — relational/ETL queries with reference parity.

The TPC-H-ish substrate stands in for the reference's domain:
customers ↔ certificates/utilities, orders ↔ chronology entries,
nation/region ↔ enrichment dims (see SURVEY.md §1 for the stage map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from utility_service_areas_spark.operators.relational import (
    dedup_first_per_key,
    filter_active_utilities,
    latest_per_group,
    patch_override,
    sync_status_expr,
    tag_entities,
    with_two_digit_year_fix,
)
from utility_service_areas_spark.plans.registry import query
from utility_service_areas_spark.sources.tables import load_table
from utility_service_areas_spark.operators.localrel import local_df

# Curated key lists, mirroring the reference's explicit operator_ids /
# inactive_ids (_targets.R:65-156). Keys < 150 exist at every SF.
OPERATOR_KEYS = (3, 14, 27, 50, 77, 92, 101, 128)
INACTIVE_KEYS = (9, 33, 66, 120)
# Latest-order year at/after which a "certificate" counts as current
# (stand-in for kml_has_newest_service_area_updates; orders span
# 1995-2001 in the substrate).
CURRENT_YEAR = 1999

_OP_KEYS_SQL = ", ".join(str(k) for k in OPERATOR_KEYS)
_INACT_KEYS_SQL = ", ".join(str(k) for k in INACTIVE_KEYS)


def _tagged_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    tagged = tag_entities(cust, "c_custkey", OPERATOR_KEYS)
    return filter_active_utilities(
        tagged, "c_custkey", INACTIVE_KEYS, F.col("c_acctbal") > 0
    )


_TAGGED_ACTIVE_SQL = f"""
    SELECT * FROM (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             CASE WHEN c_custkey IN ({_OP_KEYS_SQL}) THEN 'operator'
                  ELSE 'utility' END AS entity_type
      FROM customer)
    WHERE entity_type = 'utility'
      AND c_acctbal > 0
      AND c_custkey NOT IN ({_INACT_KEYS_SQL})
"""

_LATEST_ORDER_SQL = """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
    WHERE rn = 1
"""


def _latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from utility_service_areas_spark.operators.spread import cpu_spread

    # Spreading a too-narrow local scan ON THE WINDOW KEY replaces the
    # window's own ENSURE_REQUIREMENTS exchange (hash partitioning on
    # o_custkey satisfies it at any width), so the partial
    # WindowGroupLimit sort runs wide instead of on the single scan
    # task (r17 A/B: 0.40-0.45 s vs 0.53-0.72 s at sf0.1); cluster
    # scans pass through untouched.
    orders = cpu_spread(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"
        ),
        F.col("o_custkey"),
        bytes_per_task=1 << 19,
    )
    return latest_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )


@query(
    "flagship_service_area_report",
    oracle=f"""
    WITH active AS ({_TAGGED_ACTIVE_SQL}),
         latest AS ({_LATEST_ORDER_SQL})
    SELECT r.r_name,
           CASE WHEN l.o_orderkey IS NULL THEN 'unknown'
                WHEN year(l.o_orderdate) >= {CURRENT_YEAR} THEN 'up_to_date'
                ELSE 'outdated' END AS sync_status,
           count(*) AS n_utilities,
           CAST(sum(CAST(round(a.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_acctbal_cents
    FROM active a
    LEFT JOIN latest l ON a.c_custkey = l.o_custkey
    JOIN nation n ON a.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, sync_status
    """,
    doc="Full pipeline shape (filter→enrich→latest-per-group→status→agg); "
    "parity: _targets.R end-to-end, R/functions.R:420-562.",
    tags=("relational", "flagship"),
)
def flagship_service_area_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    active = _tagged_active_customers(spark, sf_dir)
    latest = _latest_order(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    status = sync_status_expr(
        F.when(
            F.col("o_orderkey").isNull(), F.lit(None).cast("boolean")
        ).otherwise(F.year("o_orderdate") >= CURRENT_YEAR)
    )
    return (
        active.join(latest, active.c_custkey == latest.o_custkey, "left")
        .join(F.broadcast(nation), active.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .withColumn("sync_status", status)
        .groupBy("r_name", "sync_status")
        .agg(
            F.count(F.lit(1)).alias("n_utilities"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("total_acctbal_cents"),
        )
    )


@query(
    "filter_tag_entities",
    oracle=f"SELECT c_custkey, c_name, c_acctbal, entity_type FROM ({_TAGGED_ACTIVE_SQL})",
    doc="Curated-list tagging + multi-predicate cleanup filter; parity: "
    "filter_certificates_csv R/functions.R:194-228.",
    tags=("relational",),
)
def filter_tag_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tagged_active_customers(spark, sf_dir).select(
        "c_custkey", "c_name", "c_acctbal", "entity_type"
    )


@query(
    "latest_update_per_entity",
    oracle=f"""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           o_orderdate AS latest_orderdate, o_orderstatus AS latest_status
    FROM ({_LATEST_ORDER_SQL})
    """,
    doc="Latest row per group with deterministic tiebreak; parity: "
    "get_latest_chronology_for_cert R/functions.R:308-312.",
    tags=("relational",),
)
def latest_update_per_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _latest_order(spark, sf_dir).select(
        F.col("o_custkey"),
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").alias("latest_orderdate"),
        F.col("o_orderstatus").alias("latest_status"),
    )


@query(
    "earliest_year_per_entity",
    oracle="""
    SELECT o_custkey, CAST(year(min(o_orderdate)) AS BIGINT) AS granted_year
    FROM orders GROUP BY o_custkey
    """,
    doc="Earliest-event year per group; parity: get_formed_year_for_cert "
    "R/functions.R:314-319. Partial agg (min) → map-side combine.",
    tags=("relational",),
)
def earliest_year_per_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).cast("long").alias("granted_year")
    )


@query(
    "dedup_first_per_key",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
      FROM lineitem)
    WHERE rn = 1
    """,
    doc="distinct(key, .keep_all=TRUE) with deterministic winner; parity: "
    "R/functions.R:57.",
    tags=("relational",),
)
def dedup_first_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    # (l_orderkey, l_linenumber) is not unique in the substrate, so the
    # tiebreak must extend to every selected column to be deterministic.
    return dedup_first_per_key(
        li,
        ["l_orderkey"],
        [F.col("l_linenumber"), F.col("l_partkey"), F.col("l_quantity")],
    )


@query(
    "regex_extract_fields",
    oracle="""
    SELECT doc_id,
           CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) AS source_id,
           regexp_extract(text, '^([a-z]+)', 1) AS first_word,
           length(text) AS text_len
    FROM documents
    """,
    doc="Multi-field regex extraction; parity: separate_wider_regex KML "
    "description parse R/functions.R:337-349 and cert-number extraction "
    "R/functions.R:180,464. Pure codegen regexp_extract, no UDF.",
    tags=("relational", "text"),
)
def regex_extract_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)", 1).cast("long").alias("source_id"),
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.length("text").cast("long").alias("text_len"),
    )


@query(
    "two_digit_year_fix",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) % 100 AS BIGINT) AS yy,
           CAST(CASE WHEN year(o_orderdate) % 100 > 63
                     THEN year(o_orderdate) % 100 + 1900
                     ELSE year(o_orderdate) % 100 + 2000 END AS BIGINT) AS fixed_year
    FROM orders
    """,
    doc="Two-digit-year century fix around pivot 1963; parity: "
    "convert_two_digit_years R/functions.R:279-285.",
    tags=("relational",),
)
def two_digit_year_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    yy = F.year("o_orderdate")
    out = with_two_digit_year_fix(orders, yy, "fixed_year")
    return out.select(
        "o_orderkey", (yy % 100).cast("long").alias("yy"), "fixed_year"
    )


@query(
    "enrich_join_dims",
    oracle="""
    SELECT c_custkey, c_name, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="Dim-enrichment joins; parity: URL/metadata joins "
    "R/functions.R:58-61,186,473. Both dims broadcast — zero fact shuffle.",
    tags=("relational",),
)
def enrich_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@query(
    "anti_join_missing",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Missing-data detection via anti join; parity: missing-KML "
    "placeholder handling R/functions.R:102-108,174-176.",
    tags=("relational",),
)
def anti_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# Curated patch table, mirroring merge_patches/_targets.R:193-210:
# (key, replacement label). Guard: patch applies only when the current
# row matches the expected version (here: p_size ≥ 25 stands in for the
# expected_kml_most_recent_update_date equality check).
PART_PATCHES = [(5, "PATCHED-ALPHA"), (10, "PATCHED-BETA"), (15, "PATCHED-GAMMA"), (20, "PATCHED-DELTA")]
_PATCH_VALUES_SQL = ", ".join(f"({k}, '{v}')" for k, v in PART_PATCHES)


@query(
    "patch_override_join",
    oracle=f"""
    SELECT p.p_partkey,
           CASE WHEN pt.patch_name IS NOT NULL AND p.p_size >= 25
                THEN pt.patch_name ELSE p.p_name END AS final_name,
           p.p_size
    FROM part p
    LEFT JOIN (VALUES {_PATCH_VALUES_SQL}) AS pt(p_partkey, patch_name)
      ON p.p_partkey = pt.p_partkey
    """,
    doc="Version-guarded patch override via broadcast left join; parity: "
    "get_merge_geom + patch_effective_versions R/functions.R:421-444.",
    tags=("relational",),
)
def patch_override_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_size")
    patches = local_df(spark, PART_PATCHES, ["p_partkey", "patch_name"])
    out = patch_override(
        part,
        patches,
        key_col="p_partkey",
        value_col="p_name",
        patch_value_col="patch_name",
        guard=F.col("p_size") >= 25,
        out_col="final_name",
    )
    return out.select("p_partkey", "final_name", "p_size")


@query(
    "sync_status_case",
    oracle=f"""
    WITH latest AS ({_LATEST_ORDER_SQL})
    SELECT c.c_custkey,
           CASE WHEN l.o_orderkey IS NULL THEN 'unknown'
                WHEN year(l.o_orderdate) >= {CURRENT_YEAR} THEN 'up_to_date'
                ELSE 'outdated' END AS sync_status
    FROM customer c LEFT JOIN latest l ON c.c_custkey = l.o_custkey
    """,
    doc="Null-aware 3-state status; parity: set_sync_string "
    "R/functions.R:490-498.",
    tags=("relational",),
)
def sync_status_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    latest = _latest_order(spark, sf_dir)
    is_current = F.when(
        F.col("o_orderkey").isNull(), F.lit(None).cast("boolean")
    ).otherwise(F.year("o_orderdate") >= CURRENT_YEAR)
    return (
        cust.join(latest, cust.c_custkey == latest.o_custkey, "left")
        .select("c_custkey", sync_status_expr(is_current).alias("sync_status"))
    )


@query(
    "group_combine_collect",
    oracle="""
    SELECT l_orderkey,
           string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS combined_lines,
           count(*) AS n_parts
    FROM lineitem GROUP BY l_orderkey
    """,
    doc="Group-collapse of members into one combined value; parity: "
    "st_combine group_by summarise R/functions.R:183-184,470-471. "
    "Single shuffle on the group key; collect_list is the Spark-native "
    "combine, rendered as a canonical sorted string for oracle parity.",
    tags=("relational",),
)
def group_combine_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    combined = F.array_join(
        F.transform(
            F.sort_array(F.collect_list("l_linenumber")), lambda x: x.cast("string")
        ),
        ",",
    )
    return li.groupBy("l_orderkey").agg(
        combined.alias("combined_lines"),
        F.count(F.lit(1)).alias("n_parts"),
    )


@query(
    "concat_order_text",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus <> ''
                THEN concat(o_orderpriority, '(', o_orderstatus, ')')
                ELSE o_orderpriority END AS order_text
    FROM orders
    """,
    doc="Null-tolerant formatted label; parity: build_order_text glue "
    "R/functions.R:321-331.",
    tags=("relational",),
)
def concat_order_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    text = F.when(
        F.col("o_orderstatus").isNotNull() & (F.col("o_orderstatus") != ""),
        F.concat(F.col("o_orderpriority"), F.lit("("), F.col("o_orderstatus"), F.lit(")")),
    ).otherwise(F.col("o_orderpriority"))
    return orders.select("o_orderkey", text.alias("order_text"))


@query(
    "agg_stats_by_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS sum_disc_price_cents,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Pricing-summary aggregate (TPC-H Q1 shape); parity: summary "
    "stats over the merged layer. Map-side partial agg; filter pushed "
    "to scan.",
    tags=("relational", "bench"),
)
def agg_stats_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_cents"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_price_cents"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("sum_disc_price_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "top_revenue_orders",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue_cents DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="Ranked top-N (README Q2 'largest/smallest' shape); TopK sort "
    "via ORDER BY+LIMIT (TakeOrderedAndProject — no full sort). "
    "Deterministic: ordered on the rounded value + key tiebreak.",
    tags=("relational", "bench"),
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from utility_service_areas_spark.operators.spread import cpu_spread

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # A single-file local lineitem arrives 1 partition wide and runs
    # the whole probe+agg serially; spread it by input size at the
    # relational budget (~1.5 MiB/task — r17 A/B: 8-way 0.8 s vs
    # 1-way 1.5 s vs 32-way 1.0 s at sf0.1). Wide cluster scans pass
    # through untouched.
    li = cpu_spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        F.col("l_orderkey"),
        bytes_per_task=3 << 19,
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "sentinel_date_imputation",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'N' THEN TIMESTAMP '1900-01-01'
                ELSE l_shipdate END AS imputed_shipdate
    FROM lineitem
    """,
    doc="Sentinel-date imputation for unparseable dates; parity: "
    "'' → 1/1/1900 R/functions.R:265.",
    tags=("relational",),
)
def sentinel_date_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    imputed = F.when(
        F.col("l_returnflag") == "N", F.lit("1900-01-01").cast("timestamp")
    ).otherwise(F.col("l_shipdate"))
    return li.select("l_orderkey", "l_linenumber", imputed.alias("imputed_shipdate"))


@query(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(rn AS BIGINT) AS recency_rank
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    doc="Top-N per group (N=3 most recent orders per customer) — the "
    "general window-filter form of latest-per-group; one shuffle.",
    tags=("relational",),
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("recency_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("recency_rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_orderdate", "recency_rank")
    )


@query(
    "kml_description_parse",
    oracle="""
    SELECT c_custkey,
           regexp_extract(desc_field,
             'Granted to: ([-A-Za-z0-9#., ]+)<br><br>CHRONOLOGY: (.*)', 1)
               AS granted_name,
           regexp_extract(desc_field,
             'Granted to: ([-A-Za-z0-9#., ]+)<br><br>CHRONOLOGY: (.*)', 2)
               AS chronology_text,
           CASE WHEN lower(regexp_extract(desc_field,
                  'Granted to: ([-A-Za-z0-9#., ]+)<br><br>CHRONOLOGY: (.*)', 1))
                  = lower(c_name) THEN NULL
                ELSE regexp_extract(desc_field,
                  'Granted to: ([-A-Za-z0-9#., ]+)<br><br>CHRONOLOGY: (.*)', 1)
           END AS alt_name
    FROM (
      SELECT c_custkey, c_name,
             concat('Granted to: ', upper(c_name),
                    '<br><br>CHRONOLOGY: Updated ', c_mktsegment) AS desc_field
      FROM customer)
    """,
    doc="KML <description> field splitting (parity: separate_wider_regex "
    "R/functions.R:337-349 and alt_name logic R/functions.R:350-352): "
    "multi-group regex over a synthesized 'Granted to: X<br><br>"
    "CHRONOLOGY: Y' field, with the case-insensitive name-match → "
    "alt_name NULL-out. Pure codegen.",
    tags=("relational",),
)
def kml_description_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    desc = F.concat(
        F.lit("Granted to: "),
        F.upper(F.col("c_name")),
        F.lit("<br><br>CHRONOLOGY: Updated "),
        F.col("c_mktsegment"),
    )
    pat = r"Granted to: ([-A-Za-z0-9#., ]+)<br><br>CHRONOLOGY: (.*)"
    df = cust.select("c_custkey", "c_name", desc.alias("desc_field"))
    granted = F.regexp_extract("desc_field", pat, 1)
    chron = F.regexp_extract("desc_field", pat, 2)
    alt = F.when(F.lower(granted) == F.lower(F.col("c_name")), None).otherwise(granted)
    return df.select(
        "c_custkey",
        granted.alias("granted_name"),
        chron.alias("chronology_text"),
        alt.alias("alt_name"),
    )


@query(
    "geometry_currency_check",
    oracle=f"""
    WITH latest_change AS (
      SELECT o_custkey, CAST(max(o_orderdate) AS DATE) AS last_change
      FROM orders
      WHERE o_orderstatus <> 'P'   -- 'P' ~ non-service-area order types
      GROUP BY o_custkey),
    kml AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE DATE '1998-01-01' + CAST(c_custkey % 1000 AS INT)
             END AS kml_date
      FROM customer)
    SELECT k.c_custkey,
           CASE WHEN k.kml_date IS NULL THEN 'unknown'
                WHEN l.last_change IS NULL THEN 'up_to_date'
                WHEN k.kml_date >= l.last_change THEN 'up_to_date'
                ELSE 'outdated' END AS geometry_cert_sync_status
    FROM kml k LEFT JOIN latest_change l ON k.c_custkey = l.o_custkey
    """,
    doc="KML-currency check (parity: kml_has_newest_service_area_updates "
    "R/functions.R:287-304): is the geometry's update date at/after the "
    "newest service-area-affecting chronology entry, with excluded "
    "order types and the missing-date → 'unknown' path.",
    tags=("relational",),
)
def geometry_currency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    latest_change = (
        orders.filter(F.col("o_orderstatus") != "P")
        .groupBy("o_custkey")
        .agg(F.max("o_orderdate").cast("date").alias("last_change"))
    )
    kml_date = F.when(F.col("c_custkey") % 7 == 0, None).otherwise(
        F.date_add(F.lit("1998-01-01").cast("date"), (F.col("c_custkey") % 1000).cast("int"))
    )
    kml = cust.select("c_custkey", kml_date.alias("kml_date"))
    joined = kml.join(latest_change, kml.c_custkey == latest_change.o_custkey, "left")
    status = (
        F.when(F.col("kml_date").isNull(), "unknown")
        .when(F.col("last_change").isNull(), "up_to_date")
        .when(F.col("kml_date") >= F.col("last_change"), "up_to_date")
        .otherwise("outdated")
    )
    return joined.select("c_custkey", status.alias("geometry_cert_sync_status"))


@query(
    "chronology_enriched",
    oracle="""
    SELECT o_custkey AS certificate, o_orderkey AS docket,
           o_orderdate AS order_date, o_orderstatus AS order_type,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT)
               AS event_seq
    FROM orders
    """,
    doc="Chronology parse/sort/enrich with event sequence; parity: "
    "process_chronology R/functions.R:270-277.",
    tags=("relational",),
)
def chronology_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("certificate"),
        F.col("o_orderkey").alias("docket"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderstatus").alias("order_type"),
        F.row_number().over(w).cast("long").alias("event_seq"),
    )
