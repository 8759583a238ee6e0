package graft.lakehouse

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{AtomicLake, CommitStore, HardlinkCommitStore}

/** Date-range backfill driver (SURVEY.md §2 A4 operationalized) — the
  * Spark form of the reference DAG's dynamically-mapped per-date
  * replay with failure isolation and a batch audit
  * (/root/reference/airflow/dags/pipeline.py:404-533, 585-634): each
  * date is one idempotent [[AtomicLake.upsertPartitions]] commit, a
  * failing date captures its error and DOES NOT stop the range (the
  * reference maps one task per date precisely so one poisoned day
  * can't sink the batch), and the whole run lands one audit summary.
  *
  * Scale notes: the driver loop is per-DATE (bounded by the calendar,
  * not the data) — each date's work is a full distributed upsert job;
  * nothing data-sized ever sits on the driver. Re-running a backfill
  * is safe by construction: upserts replace exactly the partitions in
  * the batch, so a date that already landed just lands again
  * byte-equivalent, and a previously-failed date fills its hole.
  */
object Backfill {

  /** One date's outcome: the committed lake version and row count on
    * success, the error message on failure, and how many attempts it
    * took (1 = first try; > 1 only when a retry budget is set).
    */
  final case class DateOutcome(date: LocalDate, ok: Boolean,
      version: Option[Long], rows: Long, error: Option[String],
      attempts: Int = 1)

  /** A whole backfill run: per-date outcomes + identity. */
  final case class Report(runId: String, outcomes: Seq[DateOutcome]) {
    def succeeded: Seq[DateOutcome] = outcomes.filter(_.ok)
    def failed: Seq[DateOutcome] = outcomes.filterNot(_.ok)
  }

  /** Inclusive date range, oldest first. */
  def dateRange(from: LocalDate, to: LocalDate): Seq[LocalDate] = {
    require(!to.isBefore(from), s"backwards range $from..$to")
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to)).toSeq
  }

  /** Replay `dates` into the lake at `root`: for each date,
    * `batchFor(date)` builds that date's batch (the extract/transform
    * for one partition) and it lands as one atomic partition upsert.
    * A date that throws — in `batchFor` OR in the write — is captured
    * in the report and the remaining dates still run.
    *
    * When `auditRoot` is set, the run appends one audit row per date
    * (status, rows, version, error) plus one batch summary row to an
    * append-only [[AtomicLake]] audit table — the reference's
    * `data_quality_log` batch bookkeeping (pipeline.py:585-634), with
    * the same atomicity guarantees as the data itself.
    */
  def run(spark: SparkSession, root: String, dates: Seq[LocalDate],
      partitionCols: Seq[String], batchFor: LocalDate => DataFrame,
      auditRoot: Option[String] = None,
      runId: String = java.util.UUID.randomUUID().toString,
      store: CommitStore = HardlinkCommitStore,
      retries: Int = 0, retryDelayMs: Long = 1000L): Report = {
    val outcomes = dates.map { d =>
      // per-date retry with backoff (the reference tasks declare
      // retries=3/retry_delay, pipeline.py:84) — safe because the
      // date's landing is an IDEMPOTENT partition upsert: a retry
      // after a half-failed attempt replaces the same partitions
      var attempt = 0
      var delay = retryDelayMs
      var out: Option[DateOutcome] = None
      while (out.isEmpty) {
        try {
          val batch = batchFor(d)
          // one bounded count per date: the audit's row evidence (the
          // reference logs per-day row counts); a date's batch is one
          // partition's data, so the extra pass is partition-, not
          // corpus-, sized
          val rows = batch.count()
          val v = AtomicLake.upsertPartitions(batch, root, partitionCols,
            store = store)
          out = Some(DateOutcome(d, ok = true, Some(v), rows, None,
            attempts = attempt + 1))
        } catch {
          case scala.util.control.NonFatal(t) =>
            attempt += 1
            if (attempt > retries)
              out = Some(DateOutcome(d, ok = false, None, 0L,
                Some(Option(t.getMessage).getOrElse(t.getClass.getName)
                  .take(300)), attempts = attempt))
            else {
              Thread.sleep(delay)
              delay *= 2
            }
        }
      }
      out.get
    }
    val report = Report(runId, outcomes)
    auditRoot.foreach { ar =>
      import spark.implicits._
      val perDate = outcomes.map(o => (runId, o.date.toString,
        if (o.ok) "ok" else "failed", o.rows,
        o.version.map(_.toString).getOrElse(""), o.error.getOrElse("")))
        .toDF("run_id", "date", "status", "rows", "version", "error")
      val summary = Seq((runId, "BATCH",
        if (report.failed.isEmpty) "ok" else "partial",
        report.succeeded.map(_.rows).sum,
        "", s"${report.succeeded.size} ok / ${report.failed.size} failed"))
        .toDF("run_id", "date", "status", "rows", "version", "error")
      AtomicLake.append(
        perDate.unionByName(summary).withColumn("run_ts", current_timestamp()),
        ar, store = store)
    }
    report
  }
}
