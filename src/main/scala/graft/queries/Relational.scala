package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.Sessionize

/** Core relational query family (SURVEY.md §2 F1-F5).
  *
  * TPC-H-shaped plans proving the engine runs reference-grade SQL:
  * multi-agg scans, selective joins with broadcast dims, top-N, window
  * functions, sessionization. All aggregates over 2-decimal double
  * columns go through decimal (see [[graft.queries.exactSum]]) so the
  * results are engine-portable bit-for-bit.
  */
object Relational {

  /** Single source of truth for sess_gap_sessions + its oracle. */
  val gapCfg: Sessionize.GapConfig = Sessionize.GapConfig()

  val queries: Map[String, Q] = Map(
    // F1 — pricing summary: one scan, map-side partial aggregation.
    "q1_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base_price"),
          exactTermSum(revenueTerm(col("l_extendedprice"),
            col("l_discount"))).as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          exactAvg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // F2 — shipping-priority shape: the selective dim filter (customer,
    // 1-in-5 mktsegment) is broadcast; lineitem⋈orders stays a shuffle
    // join on the order key — the orders side keeps ~95% of its rows
    // after the date filter, so it is fact-scale and must never be
    // force-broadcast. AQE demotes the shuffle to broadcast at runtime
    // if the filtered side actually fits.
    "q3_topn" -> { (s, dir) =>
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord.join(broadcast(cust),
          col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(exactTermSum(revenueTerm(col("l_extendedprice"),
          col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // F3 — star join: only the genuinely bounded dims (nation: 25 rows,
    // region: 5 rows) carry explicit broadcast hints. customer and
    // supplier scale linearly with the data (tens of GB at the 100-TB
    // target), so they join by shuffle on their keys; AQE converts
    // those to broadcast at runtime when the filtered side fits.
    "q5_join" -> { (s, dir) =>
      val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, dir)
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(exactTermSum(revenueTerm(col("l_extendedprice"),
          col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // F1-adjacent — forecasting-revenue shape (TPC-H q6): every
    // predicate reaches the parquet scan as a pushed filter, the
    // aggregation is a single map-side-combined scalar — the plan that
    // proves filter pushdown end-to-end.
    "q6_filter_sum" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
          col("l_quantity") < 24)
        .agg(exactTermSum(revenueProduct(col("l_extendedprice"),
          col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // F4/C11 — per-customer running order total + rank. The running sum
    // accumulates in a total order (date, orderkey) so the double
    // addition sequence is identical in any engine.
    "win_running_total" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("order_seq", row_number().over(w))
        // decimal inside the window sum: engines disagree on windowed
        // double-summation order (segment trees vs running), decimal is
        // associative so the result is portable.
        .withColumn("running_spend",
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
    },

    // F4 — gap-based sessionization (30-minute inactivity gap). The
    // same GapConfig instance drives the oracle below.
    "sess_gap_sessions" -> { (s, dir) =>
      Sessionize.batchGapSessions(Tables.events(s, dir), gapCfg)
    },

    // F5 — tumbling-window aggregation, the batch twin of the
    // Structured Streaming query in graft.streaming.EventsStream.
    "stream_tumbling_hour" -> { (s, dir) =>
      Sessionize.tumblingHour(Tables.events(s, dir))
    },

    // F13 — TPC-H q4 shape: EXISTS-correlated semi join (orders in a
    // quarter having at least one returned line). The left-semi join
    // is the plan shape: the fact side never duplicates, the probe
    // side deduplicates inside the join — no distinct pass.
    "q4_semi" -> { (s, dir) =>
      val orders = Tables.orders(s, dir)
        .filter(col("o_orderdate") >=
          lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val returned = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      orders.join(returned,
          orders("o_orderkey") === returned("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // F14 — TPC-H q18 shape (large-volume customers): a HAVING
    // aggregate feeds a semi join back onto the fact, then the
    // 3-way join re-aggregates. Integer-valued quantities sum
    // exactly in any order, so the whole chain hash-gates.
    "q18_having" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250)
      val orders = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      orders.join(big, orders("o_orderkey") === big("l_orderkey"))
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          col("o_totalprice"), col("total_qty"))
    },

    // F12 — bucketed range join: orders against OVERLAPPING price
    // bands (each price falls in ~2 bands), as an equi-join on the
    // band bucket instead of the BroadcastNestedLoopJoin Spark plans
    // for a bare range predicate (RangeJoinSpec proves the plan
    // shape). The oracle replays the same range join declaratively.
    "range_join_bands" -> { (s, dir) =>
      val bands = s.range(0, 300).select(
        col("id").cast("int").as("band_id"),
        (col("id") * 2000.0).as("lo"),
        (col("id") * 2000.0 + 4000.0).as("hi"))
      val priced = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
      graft.operators.RangeJoin
        .bucketed(priced, "o_totalprice", bands, "lo", "hi",
          bucketWidth = 2000.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          exactSum(col("o_totalprice")).as("sum_price"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_disc_price,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topn" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_filter_sum" ->
      """SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.05
        |  AND l_quantity < 24""".stripMargin,
    "win_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(row_number() OVER w AS INT) AS order_seq,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "sess_gap_sessions" -> Sessionize.gapSessionsOracle(gapCfg),
    "stream_tumbling_hour" -> Sessionize.tumblingHourOracle,
    "q4_semi" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,
    "q18_having" ->
      """SELECT c_custkey, o_orderkey, o_totalprice,
        |  total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 250) b
        |  ON o_orderkey = b.l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "range_join_bands" ->
      """WITH bands AS (
        |  SELECT CAST(g AS INTEGER) AS band_id,
        |    g * 2000.0 AS lo, g * 2000.0 + 4000.0 AS hi
        |  FROM generate_series(0, 299) t(g))
        |SELECT band_id, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN bands
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band_id""".stripMargin
  )
}
