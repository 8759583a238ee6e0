package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.lakehouse.{Gold, Silver}
import graft.operators.Gravity

/** Gold-layer analytics query family (SURVEY.md §2 C1-C7): demand
  * profiles, tier summaries, OD matrices, gravity gaps, pivoted and
  * normalized daily profiles — each hash-gated against DuckDB.
  *
  * Every query consumes the silver fact built by
  * [[graft.lakehouse.Silver.buildFactEvents]]; the oracle SQL reuses
  * the one `fact` CTE below so Spark and DuckDB always see the same
  * silver semantics.
  */
object GoldQueries {

  private def fact(s: org.apache.spark.sql.SparkSession, dir: String) =
    Silver.factEventsCached(s, dir)

  /** Consultation date window — the reference's consultations take
    * start/end parameters and filter `partition_date BETWEEN start AND
    * end` (mobility_consultations.py:52,65). On the partitioned lake
    * this predicate prunes partitions at the scan; here it filters the
    * memoized fact.
    */
  val consultStart = "2024-01-03"
  val consultEnd = "2024-01-28"

  /** The silver fact as a DuckDB CTE — single source for all gold
    * oracles (mirrors SilverQueries.silver_fact_events).
    */
  private val factCte: String =
    """fact AS (
      |  SELECT e.event_id,
      |    CAST(CAST(ts AS DATE) AS TIMESTAMP)
      |      + hour(ts) * INTERVAL 1 HOUR AS period,
      |    CAST(c.c_nationkey AS BIGINT) AS origin_zone_id,
      |    CAST(CAST(json_extract_string(e.props, '$.k') AS INT) % 25 AS BIGINT)
      |      AS destination_zone_id,
      |    e.value AS trips,
      |    CAST(ts AS DATE) AS partition_date
      |  FROM events e
      |  JOIN customer c ON e.user_id = c.c_custkey
      |  JOIN nation n
      |    ON CAST(json_extract_string(e.props, '$.k') AS INT) % 25 = n.n_nationkey
      |  WHERE e.value IS NOT NULL)""".stripMargin

  val queries: Map[String, Q] = Map(

    // C12 — multi-grain CUBE aggregation: every (date, zone) grain in
    // one pass (total / per-date / per-zone / per-cell). The expand +
    // partial-agg plan computes all four grains map-side before one
    // shuffle; rolled-up grains project to 'ALL' sentinels (the fact
    // has no null dims, so the sentinel is unambiguous and keeps the
    // grading harness' pandas compare away from mixed-null sorting).
    "gold_cube_demand" -> { (s, dir) =>
      graft.lakehouse.Silver.factEventsCached(s, dir)
        .cube(col("partition_date"), col("origin_zone_id"))
        .agg(exactSum(col("trips")).as("trips"),
          count(lit(1)).as("n_rows"))
        .select(
          coalesce(col("partition_date").cast("string"), lit("ALL"))
            .as("date"),
          coalesce(col("origin_zone_id").cast("string"), lit("ALL"))
            .as("zone"),
          col("trips"), col("n_rows"))
    },

    // C1 — hourly demand profile.
    "gold_hourly_profile" -> { (s, dir) =>
      Gold.hourlyProfile(fact(s, dir))
    },

    // C2 — weekday/weekend typical day (2-level exact avg-of-sums).
    "gold_weekday_weekend" -> { (s, dir) =>
      Gold.weekdayWeekendProfile(fact(s, dir))
    },

    // C3 — NTILE(4) rent tiers with generated/attracted totals.
    "gold_tier_summary" -> { (s, dir) =>
      val rentMetric = Gravity.zoneRent(Tables.customer(s, dir))
        .withColumnRenamed("rent", "metric")
      Gold.tierSummary(fact(s, dir), rentMetric)
    },

    // C4 — OD-pair matrix.
    "gold_od_matrix" -> { (s, dir) =>
      Gold.odMatrix(fact(s, dir))
    },

    // C5 — gravity model with GREATEST floor and NULLIF guard.
    "gold_gravity_gaps" -> { (s, dir) =>
      val cust = Tables.customer(s, dir)
      Gravity.infrastructureGaps(fact(s, dir),
        Gravity.zonePopulation(cust), Gravity.zoneRent(cust))
    },

    // C6 — top-N worst mismatches (deterministic tiebreak).
    "gold_top_gaps" -> { (s, dir) =>
      val cust = Tables.customer(s, dir)
      Gravity.infrastructureGaps(fact(s, dir),
        Gravity.zonePopulation(cust), Gravity.zoneRent(cust))
        .orderBy(col("mismatch_ratio").asc_nulls_last,
          col("origin_zone_id"), col("destination_zone_id"))
        .limit(10)
    },

    // C7 — pivot long→wide (24 hour share columns) + row normalize.
    "gold_pivot_profile" -> { (s, dir) =>
      Gold.pivotHourlyProfile(fact(s, dir))
    },

    // C6 presentation form — the reference consultation's exact output
    // shape (mobility_consultations.py:141-157): integer potential,
    // 4-dp mismatch, 2-dp distance. floor/round on bit-identical
    // doubles stay bit-identical. A fixed instantiation of the
    // parameterized Consultations API.
    "consult_top_gaps" -> { (s, dir) =>
      graft.lakehouse.Consultations.topInfrastructureGaps(s, dir,
        consultStart, consultEnd, topN = 10)
    }
  )

  private def gravitySqlWhere(factWhere: String): String =
    s"""WITH $factCte,
       |od AS (
       |  SELECT origin_zone_id, destination_zone_id,
       |    CAST(sum(CAST(trips AS DECIMAL(18,4))) AS DOUBLE) AS total_actual_trips
       |  FROM fact $factWhere GROUP BY 1, 2),
       |pop AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS zone_id,
       |    CAST(count(*) AS DOUBLE) AS population
       |  FROM customer GROUP BY 1),
       |rent AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS zone_id,
       |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
       |      / count(c_acctbal) AS rent
       |  FROM customer GROUP BY 1),
       |model AS (
       |  SELECT od.origin_zone_id, od.destination_zone_id,
       |    od.total_actual_trips,
       |    greatest(0.5, sqrt(
       |      ((CAST(od.origin_zone_id % 5 AS DOUBLE) * 100.0
       |        - CAST(od.destination_zone_id % 5 AS DOUBLE) * 100.0)
       |       * (CAST(od.origin_zone_id % 5 AS DOUBLE) * 100.0
       |        - CAST(od.destination_zone_id % 5 AS DOUBLE) * 100.0))
       |      + ((floor(od.origin_zone_id / 5.0) * 100.0
       |        - floor(od.destination_zone_id / 5.0) * 100.0)
       |       * (floor(od.origin_zone_id / 5.0) * 100.0
       |        - floor(od.destination_zone_id / 5.0) * 100.0)))) AS dist_km,
       |    p.population, r.rent
       |  FROM od
       |  JOIN pop p ON od.origin_zone_id = p.zone_id
       |  JOIN rent r ON od.destination_zone_id = r.zone_id)
       |SELECT origin_zone_id, destination_zone_id, total_actual_trips,
       |  dist_km,
       |  population * rent / (dist_km * dist_km) AS potential,
       |  total_actual_trips
       |    / nullif(population * rent / (dist_km * dist_km), 0.0)
       |    AS mismatch_ratio
       |FROM model""".stripMargin

  private val gravitySql: String = gravitySqlWhere("")

  /** Windowed variant for the consultation oracle — same model, fact
    * restricted to [consultStart, consultEnd].
    */
  private val gravityConsultSql: String = gravitySqlWhere(
    s"WHERE partition_date BETWEEN DATE '$consultStart' AND DATE '$consultEnd'")

  val oracles: Map[String, String] = Map(
    "gold_cube_demand" ->
      """WITH fact AS (
        |  SELECT CAST(ts AS DATE) AS partition_date,
        |    CAST(c.c_nationkey AS BIGINT) AS origin_zone_id,
        |    e.value AS trips
        |  FROM events e
        |  JOIN customer c ON e.user_id = c.c_custkey
        |  JOIN nation n
        |    ON CAST(json_extract_string(e.props, '$.k') AS INT) % 25
        |       = n.n_nationkey
        |  WHERE e.value IS NOT NULL)
        |SELECT COALESCE(CAST(partition_date AS VARCHAR), 'ALL') AS date,
        |  COALESCE(CAST(origin_zone_id AS VARCHAR), 'ALL') AS zone,
        |  CAST(sum(CAST(trips AS DECIMAL(18,4))) AS DOUBLE) AS trips,
        |  count(*) AS n_rows
        |FROM fact
        |GROUP BY CUBE(partition_date, origin_zone_id)""".stripMargin,
    "gold_hourly_profile" ->
      s"""WITH $factCte
         |SELECT partition_date AS date, hour(period) AS hour,
         |  CAST(sum(CAST(trips AS DECIMAL(18,4))) AS DOUBLE) AS total_trips,
         |  count(*) AS n_trips_rows
         |FROM fact GROUP BY 1, 2""".stripMargin,
    "gold_weekday_weekend" ->
      s"""WITH $factCte,
         |daily AS (
         |  SELECT partition_date, hour(period) AS hour,
         |    sum(CAST(trips AS DECIMAL(18,4))) AS day_hour_trips
         |  FROM fact GROUP BY 1, 2)
         |SELECT CASE WHEN isodow(partition_date) >= 6
         |            THEN 'weekend' ELSE 'weekday' END AS day_type,
         |  hour,
         |  CAST(sum(day_hour_trips) AS DOUBLE) / count(*) AS avg_trips,
         |  count(*) AS n_days
         |FROM daily GROUP BY 1, 2""".stripMargin,
    "gold_tier_summary" ->
      s"""WITH $factCte,
         |zone_metric AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS zone_id,
         |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
         |      / count(c_acctbal) AS metric
         |  FROM customer GROUP BY 1),
         |tiers AS (
         |  SELECT zone_id,
         |    CAST(ntile(4) OVER (ORDER BY metric, zone_id) AS INT) AS tier
         |  FROM zone_metric),
         |flows AS (
         |  SELECT origin_zone_id AS zone_id, trips AS generated,
         |    CAST(NULL AS DOUBLE) AS attracted FROM fact
         |  UNION ALL
         |  SELECT destination_zone_id, CAST(NULL AS DOUBLE), trips FROM fact),
         |zone_flow AS (
         |  SELECT zone_id, sum(CAST(generated AS DECIMAL(18,4))) AS g,
         |    sum(CAST(attracted AS DECIMAL(18,4))) AS a
         |  FROM flows GROUP BY 1)
         |SELECT t.tier,
         |  CASE t.tier WHEN 1 THEN 'Low' WHEN 2 THEN 'Mid-Low'
         |       WHEN 3 THEN 'Mid-High' ELSE 'High' END AS tier_label,
         |  count(*) AS n_zones,
         |  CAST(coalesce(sum(f.g), 0) AS DOUBLE) AS trips_generated,
         |  CAST(coalesce(sum(f.a), 0) AS DOUBLE) AS trips_attracted
         |FROM tiers t LEFT JOIN zone_flow f ON t.zone_id = f.zone_id
         |GROUP BY 1, 2""".stripMargin,
    "gold_od_matrix" ->
      s"""WITH $factCte
         |SELECT origin_zone_id, destination_zone_id,
         |  CAST(sum(CAST(trips AS DECIMAL(18,4))) AS DOUBLE) AS total_trips,
         |  count(*) AS n_trips_rows,
         |  CAST(sum(CAST(trips AS DECIMAL(18,4))) AS DOUBLE) / count(*)
         |    AS avg_trips
         |FROM fact GROUP BY 1, 2""".stripMargin,
    "gold_gravity_gaps" -> gravitySql,
    "consult_top_gaps" ->
      s"""SELECT origin_zone_id, destination_zone_id,
         |  total_actual_trips AS actual_trips,
         |  CAST(floor(potential) AS BIGINT) AS potential,
         |  round(mismatch_ratio, 4) AS mismatch_ratio,
         |  round(dist_km, 2) AS dist_km
         |FROM ($gravityConsultSql) g
         |ORDER BY mismatch_ratio ASC NULLS LAST,
         |  origin_zone_id, destination_zone_id
         |LIMIT 10""".stripMargin,
    "gold_top_gaps" ->
      s"""$gravitySql
         |ORDER BY mismatch_ratio ASC NULLS LAST,
         |  origin_zone_id, destination_zone_id
         |LIMIT 10""".stripMargin,
    "gold_pivot_profile" -> {
      val hourSums = (0 to 23).map(h =>
        s"sum(CASE WHEN hour(period) = $h THEN CAST(trips AS DECIMAL(18,4)) END)")
      val filled = (0 to 23).map(h =>
        s"coalesce(${hourSums(h)}, 0)")
      val total = filled.mkString(" + ")
      val shares = (0 to 23).map(h =>
        s"""CASE WHEN ($total) = 0 THEN 0.0
           |ELSE CAST(${filled(h)} AS DOUBLE) / CAST(($total) AS DOUBLE)
           |END AS h$h""".stripMargin.replace("\n", " "))
      s"""WITH $factCte
         |SELECT partition_date AS date,
         |  CAST(($total) AS DOUBLE) AS total_trips,
         |  ${shares.mkString(",\n  ")}
         |FROM fact GROUP BY 1""".stripMargin
    }
  )
}
