package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{CleanFns, TimeFns}
import graft.lakehouse.Silver
import graft.operators.{Profile, Quality}

/** Silver-layer query family (SURVEY.md §2 A6, B1-B8): cleaning, time
  * enrichment, conformed dims, fact build, data-quality audit, and
  * column profiling — each hash-gated against a DuckDB oracle.
  */
object SilverQueries {

  val queries: Map[String, Q] = Map(

    // B1 + A6 — robust casts, string cleaning, JSON property
    // extraction over the raw events payload.
    "silver_clean_events" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type").isNotNull &&
          CleanFns.cleanKey(col("event_type")) =!= "NA")
        .select(
          col("event_id"),
          col("user_id"),
          CleanFns.canonLabel(col("event_type")).as("event_type_clean"),
          get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
          CleanFns.tryCastDouble(get_json_object(col("props"), "$.k"))
            .as("prop_k_dbl"),
          when(col("value") >= 0, col("value")).as("value_clean"),
          col("event_type").rlike("^[a-z]+$").as("is_canonical_type"))
    },

    // B2 — yyyyMMdd roundtrip, period reconstruction, calendar
    // extracts (isodow, dayname, weekend).
    "silver_time_enrich" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
        .withColumn("yyyymmdd", date_format(col("ts"), "yyyyMMdd"))
        .select(
          col("event_id"),
          col("event_date"),
          col("yyyymmdd"),
          TimeFns.periodTimestamp(
            TimeFns.parseYyyymmdd(col("yyyymmdd")), hour(col("ts")))
            .as("period"),
          hour(col("ts")).as("hour"),
          TimeFns.isodow(col("event_date")).as("isodow"),
          TimeFns.dayName(col("event_date")).as("day_name"),
          TimeFns.isWeekend(col("event_date")).as("is_weekend"))
    },

    // B3 — canonical many→one mapping dim (user → first event type).
    "silver_dedup_mapping" -> { (s, dir) =>
      Silver.dedupMapping(Tables.events(s, dir), "user_id", "event_type")
    },

    // B4 — surrogate-key customer dim with TRY_CAST/split_part
    // name parsing.
    "silver_dim_customer" -> { (s, dir) =>
      val cleaned = Tables.customer(s, dir)
        .filter(col("c_name").isNotNull)
        .select(
          col("c_custkey"),
          CleanFns.cleanKey(col("c_name")).as("customer_name"),
          CleanFns.tryCastLong(
            CleanFns.splitPart(CleanFns.cleanKey(col("c_name")), "#", 2))
            .as("name_seq"),
          CleanFns.canonLabel(col("c_mktsegment")).as("segment"),
          col("c_nationkey"))
      // customer scales with the data → dense keys via the two-phase
      // builder, not the single-partition global window
      Silver.dimWithDenseKey(cleaned, "c_custkey", "customer_sk")
    },

    // B5 — cross-join dim: every zone (nation) × every holiday
    // (Sundays present in the events range).
    "silver_crossjoin_holidays" -> { (s, dir) =>
      val zones = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("zone_id"))
      val holidays = Tables.events(s, dir)
        .select(to_date(col("ts")).as("holiday_date"))
        .filter(TimeFns.isodow(col("holiday_date")) === 7)
        .distinct()
      Silver.crossJoinDim(zones, holidays)
    },

    // B6 — fact build: period reconstruction + conformed zone keys
    // through INNER dim joins + partition column.
    "silver_fact_events" -> { (s, dir) =>
      Silver.buildFactEvents(Tables.events(s, dir),
        Tables.customer(s, dir), Tables.nation(s, dir))
    },

    // B7 — long-format data-quality audit metrics.
    "dq_audit_metrics" -> { (s, dir) =>
      Quality.auditMetrics(Tables.events(s, dir), Tables.customer(s, dir))
    },

    // B8 — SUMMARIZE-style column profile of orders.
    "dq_profile_orders" -> { (s, dir) =>
      Profile.summarize(Tables.orders(s, dir))
    }
  )

  private val ordersProfileCols = Seq(
    "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
    "o_orderstatus" -> "varchar", "o_totalprice" -> "double",
    "o_orderdate" -> "timestamp", "o_orderpriority" -> "varchar")

  val oracles: Map[String, String] = Map(
    "silver_clean_events" ->
      """SELECT event_id, user_id,
        |  upper(trim(event_type)) AS event_type_clean,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
        |  TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS prop_k_dbl,
        |  CASE WHEN value >= 0 THEN value END AS value_clean,
        |  regexp_matches(event_type, '^[a-z]+$') AS is_canonical_type
        |FROM events
        |WHERE event_type IS NOT NULL AND trim(event_type) <> 'NA'""".stripMargin,
    "silver_time_enrich" ->
      """SELECT event_id,
        |  CAST(ts AS DATE) AS event_date,
        |  strftime(ts, '%Y%m%d') AS yyyymmdd,
        |  strptime(strftime(ts, '%Y%m%d'), '%Y%m%d')
        |    + hour(ts) * INTERVAL 1 HOUR AS period,
        |  hour(ts) AS hour,
        |  CAST(isodow(CAST(ts AS DATE)) AS INT) AS isodow,
        |  dayname(CAST(ts AS DATE)) AS day_name,
        |  isodow(CAST(ts AS DATE)) >= 6 AS is_weekend
        |FROM events""".stripMargin,
    "silver_dedup_mapping" ->
      """SELECT user_id AS src_key, min(trim(event_type)) AS canonical,
        |  count(*) AS n_src_rows
        |FROM events
        |WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY user_id""".stripMargin,
    "silver_dim_customer" ->
      """SELECT c_custkey, trim(c_name) AS customer_name,
        |  TRY_CAST(split_part(trim(c_name), '#', 2) AS BIGINT) AS name_seq,
        |  upper(trim(c_mktsegment)) AS segment,
        |  c_nationkey,
        |  row_number() OVER (ORDER BY c_custkey) AS customer_sk
        |FROM customer WHERE c_name IS NOT NULL""".stripMargin,
    "silver_crossjoin_holidays" ->
      """SELECT CAST(n.n_nationkey AS BIGINT) AS zone_id, h.holiday_date
        |FROM nation n
        |CROSS JOIN (SELECT DISTINCT CAST(ts AS DATE) AS holiday_date
        |            FROM events WHERE isodow(CAST(ts AS DATE)) = 7) h""".stripMargin,
    "silver_fact_events" ->
      """SELECT e.event_id,
        |  CAST(CAST(ts AS DATE) AS TIMESTAMP)
        |    + hour(ts) * INTERVAL 1 HOUR AS period,
        |  CAST(c.c_nationkey AS BIGINT) AS origin_zone_id,
        |  CAST(CAST(json_extract_string(e.props, '$.k') AS INT) % 25 AS BIGINT)
        |    AS destination_zone_id,
        |  e.value AS trips,
        |  CAST(ts AS DATE) AS partition_date
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n
        |  ON CAST(json_extract_string(e.props, '$.k') AS INT) % 25 = n.n_nationkey
        |WHERE e.value IS NOT NULL""".stripMargin,
    "dq_audit_metrics" -> Quality.auditMetricsOracle,
    "dq_profile_orders" -> Profile.summarizeOracle("orders", ordersProfileCols)
  )
}
