package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus ingest with malformed-line quarantine — the inverse of
  * [[graft.operators.Export.writeJsonlShards]] and the front door of
  * an LLM data pipeline (web-scale corpora interchange as gzip'd
  * JSONL shards).
  *
  * Shape: ONE line-level scan (`spark.read.text`, gzip handled per
  * file), `from_json` parses each line map-side under PERMISSIVE mode
  * with a corrupt-record capture field, and a single pinned frame
  * splits into clean rows vs quarantine — the same
  * nothing-refused/nothing-silently-dropped posture as the
  * expectation-split ingest (AtomicLake.appendExpect): a torn line, a
  * schema-violating record, or a null required key degrades to a
  * quarantine row carrying the raw line and its file, never a lost
  * row and never a failed job.
  *
  * Why not `spark.read.json` + a filter on `_corrupt_record`: Spark
  * refuses raw-column filters on the json source's corrupt column
  * (it requires caching the whole scan); `from_json` over `text`
  * rows has no such restriction, keeps the plan one scan, and leaves
  * the raw line available for the quarantine payload for free.
  */
object JsonlIngest {

  val CorruptCol = "_corrupt_record"

  /** Result of a quarantining ingest: `clean` rows match `schema`
    * exactly; `quarantine` carries (raw line, source file, reason).
    */
  final case class Split(clean: DataFrame, quarantine: DataFrame)

  /** Parse `path` (file, dir, or glob; .gz transparent) as JSONL with
    * `schema`. Lines that fail to parse — or parse but null out any
    * of `requiredCols` — land in quarantine instead of the table.
    * `recursiveFileLookup` ignores partition dirs (e.g. the
    * `shard=N/` layout [[graft.operators.Export.writeJsonlShards]]
    * writes), so ingest sees lines, not inferred partition columns.
    */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType, requiredCols: Seq[String] = Nil): Split = {
    val withCorrupt = schema.add(CorruptCol, StringType)
    val parsed = spark.read
      .option("recursiveFileLookup", "true")
      .textFile(path)
      .select(col("value"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("src_file"),
        from_json(col("value"), withCorrupt, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("j"))
    val missing: Column = requiredCols
      .map(c => col(s"j.$c").isNull)
      .foldLeft(lit(false))(_ || _)
    val badReason =
      when(col("j").isNull || col(s"j.$CorruptCol").isNotNull,
        lit("malformed_json"))
        .when(missing, lit("null_required_field"))
    val clean = parsed.filter(badReason.isNull)
      .select(schema.fieldNames.map(f => col(s"j.$f")): _*)
    val quarantine = parsed.filter(badReason.isNotNull)
      .select(col("value").as("raw_line"), col("src_file"),
        badReason.as("reason"))
    Split(clean, quarantine)
  }
}
