"""SURVEY.md §2.6 — batch twins of the streaming operators, with
DuckDB oracles. The streaming variants (streaming/events.py) are
asserted equal to these in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from utility_service_areas_spark.operators.relational import latest_per_group
from utility_service_areas_spark.plans.registry import query
from utility_service_areas_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


@query(
    "events_tumbling_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events GROUP BY hour, event_type
    """,
    doc="Per-hour per-type aggregate; streaming twin: window('1 hour') "
    "+ watermark (streaming/events.py:tumbling_counts).",
    tags=("events", "bench"),
)
def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
    )


@query(
    "events_sessionize",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    sess AS (
      SELECT user_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
      FROM marked)
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min) via lag+cumsum windows; "
    "streaming twins: session_window and applyInPandasWithState "
    "(streaming/events.py).",
    tags=("events", "bench"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "events_latest_per_user",
    oracle="""
    SELECT user_id, event_id AS latest_event_id, ts AS latest_ts,
           event_type AS latest_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
    doc="Latest event per user; streaming twin: "
    "dropDuplicatesWithinWatermark (streaming/events.py).",
    tags=("events",),
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = latest_per_group(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("latest_event_id"),
        F.col("ts").alias("latest_ts"),
        F.col("event_type").alias("latest_type"),
    )


@query(
    "events_json_extract",
    oracle=r"""
    SELECT event_id,
           CAST(NULLIF(regexp_extract(props, '"k":[ \t\n\x0b\f\r]*(\d+)', 1), '')
                AS BIGINT) AS k_value
    FROM events
    """,
    doc="Typed extraction from a JSON props column (kept regex-based so "
    "the oracle avoids DuckDB's JSON extension; production would use "
    "F.from_json with an explicit schema).",
    tags=("events",),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'"k":[ \t\n\x0b\f\r]*(\d+)', 1)
        .cast("long")
        .alias("k_value"),
    )


@query(
    "user_session_stats",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    sess AS (
      SELECT user_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
      FROM marked),
    per AS (
      SELECT user_id, session_id, count(*) AS n,
             min(ts) AS session_start, max(ts) AS session_end
      FROM sess GROUP BY 1, 2)
    SELECT user_id,
           count(*) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS total_events,
           max(n) AS max_session_events,
           CAST(max(date_diff('second', session_start, session_end)) AS BIGINT)
               AS longest_session_secs
    FROM per GROUP BY user_id
    """,
    doc="Per-user engagement profile on top of gap sessionization: "
    "session count, event totals, and the longest session in events "
    "and seconds — the behavioral features a churn/engagement model "
    "consumes. Pure composition: the sessionize plan (one user_id "
    "window shuffle) feeds a same-key aggregate, so Catalyst reuses "
    "the partitioning and no second exchange appears.",
    tags=("events", "analytics"),
)
def user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_sessionize(spark, sf_dir)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.max("n_events").alias("max_session_events"),
        (
            F.max(
                F.col("session_end").cast("long") - F.col("session_start").cast("long")
            )
        ).cast("long").alias("longest_session_secs"),
    )


@query(
    "user_daily_journey_match",
    oracle="""
    WITH seq AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS type_seq
      FROM events GROUP BY 1, 2)
    SELECT user_id, d, type_seq,
           CAST(length(type_seq) AS BIGINT) AS n_events,
           CASE WHEN regexp_matches(type_seq, 'v.*c.*p') THEN 1 ELSE 0 END
             AS matched
    FROM seq
    """,
    doc="Sequence-pattern matching over per-user daily journeys — the "
    "MATCH_RECOGNIZE-style behavioral query (did the user view, then "
    "click, then purchase, in that order, within the day?) expressed "
    "as an in-row regex over the ordered type-initial string: each "
    "(user, day) group collapses to one compact sequence (sort_array "
    "over (ts, event_id) structs makes the order total and "
    "partitioning-independent), and the pattern is a plain 'v.*c.*p' "
    "rlike — ANY ordered-subsequence funnel variant is a one-line "
    "regex change, no per-step self-joins. Scale shape: ONE shuffle "
    "keyed (user, day); in-row state is bounded by a user's daily "
    "activity, and the regex is codegen JVM. 56 matched of 4006 "
    "user-days at sf0.01.",
    tags=("events",),
)
def user_daily_journey_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grouped = (
        ev.select(
            "user_id",
            F.to_date(F.date_trunc("day", "ts")).alias("d"),
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("init")
            ).alias("item"),
        )
        .groupBy("user_id", "d")
        .agg(F.sort_array(F.collect_list("item")).alias("items"))
    )
    seq = F.concat_ws("", F.expr("transform(items, x -> x.init)"))
    return grouped.select(
        "user_id",
        "d",
        seq.alias("type_seq"),
        F.length(seq).cast("long").alias("n_events"),
        F.when(seq.rlike("v.*c.*p"), 1).otherwise(0).cast("int").alias("matched"),
    )


@query(
    "events_variant_stats",
    oracle=r"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(NULLIF(regexp_extract(props, '"k":[ \t\n\x0b\f\r]*(\d+)', 1),
                                '') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(NULLIF(regexp_extract(props, '"k":[ \t\n\x0b\f\r]*(\d+)', 1),
                                '') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY 1
    """,
    doc="Semi-structured aggregation through Spark 4's VARIANT type: "
    "props parses ONCE per row into the binary variant encoding "
    "(F.parse_json — JVM-side, whole-stage-codegen'd, no Python), "
    "fields extract with variant_get path navigation, then a plain "
    "partial-agged groupBy. Versus the string path (#40 "
    "events_json_extract's regexp or from_json-per-access), variant "
    "amortizes the parse across every field an analysis touches and "
    "is the 100 TB posture for telemetry columns whose schema drifts "
    "— the engine shreds fields at scan time where the parquet "
    "writer cooperates. The DuckDB oracle extracts the same field "
    "with the repo's JSON-regex seam (no JSON extension dependency), "
    "pinning the VALUES while the Spark side exercises the variant "
    "path; the plan-level variant parse (parseJson static_invoke) and "
    "the absence of any Python evaluation node are asserted in pytest, "
    "plus the strict-parse fail-loud posture on malformed JSON.",
    tags=("events",),
)
def events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").cast("long").alias("max_k"),
    )


@query(
    "events_poisson_rate_ci",
    oracle="""
    WITH span AS (
      SELECT CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
               AS span_s
      FROM events),
    per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type)
    SELECT event_type, n AS n_events, span.span_s AS span_seconds,
           CAST(round(CAST(n AS DOUBLE) * 3600 / span_s * 1000) AS BIGINT)
             AS rate_milli_per_hour,
           CAST(round((CAST(n AS DOUBLE) - 1.96 * sqrt(CAST(n AS DOUBLE)))
                      * 3600 / span_s * 1000) AS BIGINT) AS ci_lo_milli,
           CAST(round((CAST(n AS DOUBLE) + 1.96 * sqrt(CAST(n AS DOUBLE)))
                      * 3600 / span_s * 1000) AS BIGINT) AS ci_hi_milli
    FROM per CROSS JOIN span
    """,
    doc="Per-event-type Poisson arrival rate with a 95% normal-"
    "approximation CI (rate = n/T, CI = (n +- 1.96*sqrt(n))/T) — the "
    "capacity/alerting readout beside #194's burst detection: burst "
    "says WHEN a type spiked, this says what rate band is NORMAL so "
    "a provisioner can size consumers. Engine-exact: n and the "
    "observation span (whole seconds between global min/max ts) are "
    "integers; sqrt of an exact-integer double IS correctly rounded "
    "cross-engine (SURVEY §6 — unlike pow/ln), and the remaining "
    "multiply/divide chain is mirrored operand-for-operand, "
    "milli-rounded. One type-keyed partial agg + a 1-row span agg "
    "broadcast back.",
    tags=("events", "analytics"),
)
def events_poisson_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    span = events.agg(
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).cast("long").alias("span_s")
    )
    per = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    n_d = F.col("n").cast("double")
    return per.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("span_s").cast("long").alias("span_seconds"),
        F.round(n_d * 3600 / F.col("span_s") * 1000)
        .cast("long")
        .alias("rate_milli_per_hour"),
        F.round((n_d - 1.96 * F.sqrt(n_d)) * 3600 / F.col("span_s") * 1000)
        .cast("long")
        .alias("ci_lo_milli"),
        F.round((n_d + 1.96 * F.sqrt(n_d)) * 3600 / F.col("span_s") * 1000)
        .cast("long")
        .alias("ci_hi_milli"),
    )
