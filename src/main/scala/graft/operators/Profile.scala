package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling (SURVEY.md §2 B8/A5) — the Spark form of DuckDB's
  * SUMMARIZE / DESCRIBE used throughout the reference's notebooks
  * (/root/reference/notebooks/1_sprint3_pipeline_prototyping.ipynb
  * cells 13-21): one output row per column with null count, distinct
  * count, and canonical min/max strings.
  *
  * The profile is ONE aggregation over the table (all per-column
  * aggregates in a single pass, then `stack` to long format). The
  * count-distincts make Catalyst expand the input once per profiled
  * column — inherent to exact distinct counts; at 100 TB swap
  * `exact = false` in to use HyperLogLog sketches instead.
  */
object Profile {

  /** Canonical string rendering for min/max: doubles go through
    * DECIMAL(18,4) so the text is engine-portable ("12.3400"), all
    * other types use their natural cast.
    */
  private def fmt(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType =>
      c.cast(DecimalType(18, 4)).cast("string")
    case _ => c.cast("string")
  }

  /** SUMMARIZE: (column_name, n_rows, n_nulls, n_distinct, min_str,
    * max_str) per profiled column.
    *
    * COST MODEL (r14, per ADVICE r13): this runs N+1 separate
    * aggregation passes over the input (one per column plus the base
    * null/min/max agg). For a plain parquet scan each pass is a
    * column-pruned one-column read — the cheap, intended case. For a
    * DERIVED input the upstream plan would recompute once per
    * profiled column, so anything that is not a raw scan (modulo
    * project/filter) is localCheckpointed once up front and the N+1
    * passes read the materialized partitions instead.
    */
  def summarize(df0: DataFrame, exact: Boolean = true): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LeafNode, LogicalPlan, Project => LProject, SubqueryAlias}
    def rawScan(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case pr: LProject => rawScan(pr.child)
      case f: LFilter => rawScan(f.child)
      case a: SubqueryAlias => rawScan(a.child)
      case _ => false
    }
    val df = if (rawScan(df0.queryExecution.analyzed)) df0
             else df0.localCheckpoint()
    val cols = df.schema.fields
    // min/max aggregate on the NATIVE type (string min of a formatted
    // double would order lexically), formatting happens on the 1-row
    // aggregate result below.
    //
    // The exact distinct counts run as ONE two-phase aggregation PER
    // COLUMN (each a column-pruned scan), joined back as broadcast
    // 1-row frames — NOT as N countDistinct()s inside one agg. The
    // single-agg form plans an Expand (row count × N+1) whose
    // grouping key is the UNION of all N distinct columns, which
    // falls out of whole-stage codegen into SortAggregate and sorts
    // the expanded set twice (measured r13 at sf1: 35 s for 1.5M×6
    // orders vs ~3 s for this shape). Per-column two-phase distinct
    // is the textbook scale form: partial distinct map-side, count
    // of a key-partitioned exchange — linear, codegen'd, and each
    // scan reads exactly one column.
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        min(c).as(s"${f.name}__min"),
        max(c).as(s"${f.name}__max"))
    }.toSeq :+ count(lit(1)).as("__rows")
    val base = df.agg(aggs.head, aggs.tail: _*)
    val one = cols.foldLeft(base) { (acc, f) =>
      acc.crossJoin(broadcast(df.agg(
        (if (exact) countDistinct(col(f.name))
         else approx_count_distinct(col(f.name)))
          .as(s"${f.name}__distinct"))))
    }
    val stacked = cols.map { f =>
      struct(lit(f.name).as("column_name"), col("__rows").as("n_rows"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__distinct").as("n_distinct"),
        fmt(col(s"${f.name}__min"), f.dataType).as("min_str"),
        fmt(col(s"${f.name}__max"), f.dataType).as("max_str"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  /** DESCRIBE: (column_name, data_type, nullable) straight from the
    * resolved schema — no job runs.
    */
  def describe(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("column_name", "data_type", "nullable")
  }

  /** DuckDB oracle for [[summarize]] over a named table, generated
    * from the same (name, type) list so query and oracle cannot
    * drift.
    */
  def summarizeOracle(table: String, cols: Seq[(String, String)]): String =
    cols.map { case (name, typ) =>
      val (minE, maxE) = typ match {
        case "double" =>
          (s"CAST(CAST(min($name) AS DECIMAL(18,4)) AS VARCHAR)",
           s"CAST(CAST(max($name) AS DECIMAL(18,4)) AS VARCHAR)")
        case _ =>
          (s"CAST(min($name) AS VARCHAR)", s"CAST(max($name) AS VARCHAR)")
      }
      s"""SELECT '$name' AS column_name, count(*) AS n_rows,
         |  count(*) FILTER (WHERE $name IS NULL) AS n_nulls,
         |  count(DISTINCT $name) AS n_distinct,
         |  $minE AS min_str, $maxE AS max_str FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
}
