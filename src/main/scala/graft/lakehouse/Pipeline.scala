package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{AtomicLake, CommitStore, HardlinkCommitStore}

/** Code-first task orchestration — the engine-side parity for the
  * reference's Airflow DAGs (mobility_ingestion_pipeline.py wires
  * ingest → silver → gold tasks with `retries=3`, `retry_delay`, and
  * `max_active_tis_per_dag=1`; mobility_consultations.py is a second
  * DAG over the same lake). A [[Pipeline]] is a DAG of named tasks
  * over a SparkSession; [[Pipeline.run]] executes in deterministic
  * topological order and returns one [[TaskResult]] per task.
  *
  * Semantics (Airflow-default parity):
  *  - tasks run SERIALLY in a topological order that respects
  *    declaration order among ready tasks (`max_active_tis_per_dag=1`
  *    — the reference serializes its partition upserts precisely
  *    because concurrent DELETE+INSERT on one table self-corrupts;
  *    graft's AtomicLake makes that safe, but deterministic serial
  *    order keeps runs reproducible and is what the reference runs);
  *  - a failing task is retried with bounded linear-backoff sleeps
  *    (`retries`/`retryDelayMs`, pipeline.py:84 parity) before it is
  *    marked `failed`;
  *  - every task downstream of a failure is `skipped` (Airflow's
  *    `all_success` trigger rule); independent branches run on —
  *    failure isolation without manual bookkeeping;
  *  - the graph is validated up front: duplicate ids, unknown
  *    dependencies, and cycles are refused loudly BEFORE any task
  *    runs (a DAG that cannot finish must not half-run).
  *
  * Audit parity (the reference appends `etl_batch_audit` /
  * `data_quality_log` rows per run): [[Pipeline.runLogged]] appends
  * one row per task attempt-outcome to an ACID audit lake through the
  * atomic commit protocol — crash-safe, queryable, and partitioned by
  * run date like the reference's log tables.
  *
  * Scheduling itself (cron) stays OUT of scope by design: at 100 TB
  * the scheduler is whatever the platform provides; what the engine
  * must own is the dependency/retry/skip/audit contract above, which
  * is exactly what this class pins.
  */
final case class TaskResult(task: String, status: String,
    attempts: Int, error: Option[String], elapsedMs: Long)

class Pipeline(val name: String) {

  private final case class TaskDef(id: String, deps: Seq[String],
      retries: Int, retryDelayMs: Long, fn: SparkSession => Unit)

  private val tasks = scala.collection.mutable.LinkedHashMap
    .empty[String, TaskDef]

  /** Register a task. `deps` must all be registered by run time;
    * `retries` extra attempts on exception with linear backoff.
    */
  def task(id: String, deps: Seq[String] = Nil, retries: Int = 0,
      retryDelayMs: Long = 0L)(fn: SparkSession => Unit): this.type = {
    require(!tasks.contains(id), s"pipeline $name: duplicate task '$id'")
    tasks += id -> TaskDef(id, deps, retries, retryDelayMs, fn)
    this
  }

  /** Deterministic topological order: Kahn's algorithm where ready
    * tasks dequeue in DECLARATION order. Refuses unknown deps and
    * cycles before anything runs.
    */
  private def topoOrder(): Seq[TaskDef] = {
    val ids = tasks.keySet
    for (t <- tasks.values; d <- t.deps)
      require(ids.contains(d),
        s"pipeline $name: task '${t.id}' depends on unknown '$d'")
    val order = scala.collection.mutable.ArrayBuffer.empty[TaskDef]
    val done = scala.collection.mutable.Set.empty[String]
    var progressed = true
    while (done.size < tasks.size && progressed) {
      progressed = false
      for (t <- tasks.values
           if !done.contains(t.id) && t.deps.forall(done.contains)) {
        order += t
        done += t.id
        progressed = true
      }
    }
    require(done.size == tasks.size,
      s"pipeline $name: dependency cycle among " +
        (tasks.keySet -- done).toSeq.sorted.mkString("{", ", ", "}"))
    order.toSeq
  }

  /** Execute the DAG; never throws for TASK failures (they land in
    * the results as `failed`/`skipped`) — only graph validation does.
    */
  def run(spark: SparkSession): Seq[TaskResult] =
    runResuming(spark, Set.empty)

  /** [[run]] + one audit row per task appended to the ACID lake at
    * `auditRoot` (created on first run), partitioned by run date —
    * the reference's `etl_batch_audit` posture: append-only, every
    * run queryable, a crashed run leaves either a full audit commit
    * or none (the atomic protocol's guarantee).
    */
  def runLogged(spark: SparkSession, auditRoot: String,
      store: CommitStore = HardlinkCommitStore): Seq[TaskResult] = {
    val runId = java.util.UUID.randomUUID().toString
    val runTs = System.currentTimeMillis()
    val results = run(spark)
    AtomicLake.append(resultsDf(spark, results, runId, runTs), auditRoot,
      partitionCols = Seq("run_date"), store = store)
    results
  }

  /** [[runLogged]] with Airflow's clear-and-rerun semantics: tasks
    * that SUCCEEDED in the most recent audited run are skipped as
    * `cached` (their side effects stand — graft tasks are idempotent
    * lake commits, so re-running them would also be safe, just
    * wasted); failed and skipped tasks re-execute. A `cached`
    * dependency counts as satisfied. The resumed run appends its own
    * audit rows (fresh run_id), so the log tells the whole story.
    * With no prior runs this IS [[runLogged]].
    */
  def resumeLogged(spark: SparkSession, auditRoot: String,
      store: CommitStore = HardlinkCommitStore): Seq[TaskResult] = {
    import org.apache.spark.sql.functions.{col, max}
    val prevOk: Set[String] =
      if (AtomicLake.currentVersion(auditRoot, store).isEmpty) Set.empty
      else {
        val log = AtomicLake.read(spark, auditRoot, store)
          .filter(col("pipeline") === name)
        val lastRun = log.agg(max(col("run_ts"))).head()
        if (lastRun.isNullAt(0)) Set.empty
        else log.filter(col("run_ts") === lastRun.getTimestamp(0))
          // a cached row IS a success whose effects stand from an
          // earlier run — it keeps counting across repeated resumes
          .filter(col("status").isin("success", "cached"))
          .select("task").collect().map(_.getString(0)).toSet
      }
    val runId = java.util.UUID.randomUUID().toString
    val runTs = System.currentTimeMillis()
    val results = runResuming(spark, prevOk)
    AtomicLake.append(resultsDf(spark, results, runId, runTs), auditRoot,
      partitionCols = Seq("run_date"), store = store)
    results
  }

  /** [[run]] where tasks in `alreadyDone` report `cached` without
    * executing, and count as satisfied dependencies.
    */
  private def runResuming(spark: SparkSession,
      alreadyDone: Set[String]): Seq[TaskResult] = {
    val order = topoOrder()
    val status = scala.collection.mutable.Map.empty[String, String]
    order.map { t =>
      val t0 = System.nanoTime()
      if (alreadyDone.contains(t.id)) {
        status(t.id) = "success"
        TaskResult(t.id, "cached", 0, None, 0L)
      } else if (!t.deps.forall(d => status(d) == "success")) {
        status(t.id) = "skipped"
        TaskResult(t.id, "skipped", 0, None, 0L)
      } else {
        var attempts = 0
        var lastErr: Option[String] = None
        var ok = false
        while (!ok && attempts <= t.retries) {
          attempts += 1
          try { t.fn(spark); ok = true }
          catch {
            case e: Exception =>
              lastErr = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
              if (attempts <= t.retries && t.retryDelayMs > 0)
                Thread.sleep(t.retryDelayMs * attempts)
          }
        }
        status(t.id) = if (ok) "success" else "failed"
        TaskResult(t.id, status(t.id), attempts,
          if (ok) None else lastErr,
          (System.nanoTime() - t0) / 1000000L)
      }
    }
  }

  /** The audit frame for a run's results. */
  def resultsDf(spark: SparkSession, results: Seq[TaskResult],
      runId: String, runTs: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    results.map(r => (name, runId, r.task, r.status, r.attempts,
      r.error.orNull, r.elapsedMs)).toDF("pipeline", "run_id", "task",
      "status", "attempts", "error", "elapsed_ms")
      .withColumn("run_ts",
        (lit(runTs) / 1000.0).cast("timestamp"))
      .withColumn("run_date", to_date(col("run_ts")))
  }
}
