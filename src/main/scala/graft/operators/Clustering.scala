package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.functions.TimeFns
import graft.lakehouse.Gold

/** K-Means daily-pattern clustering (SURVEY.md §2 C8-C10) — the Spark
  * form of the reference's gold clustering task
  * (/root/reference/airflow/dags/mobility_ingestion_pipeline.py:645-742):
  * pivot each day's demand into a normalized 24-hour profile, K-Means
  * (k=3, fixed seed) over the profiles, then join assignments back to
  * the fact for per-cluster typical days and interpret clusters by
  * day count + modal day name.
  *
  * Scale notes: the feature matrix is one row per DATE (bounded:
  * years × 365), so KMeans training data is tiny no matter how large
  * the fact is — the heavy lifting is the pivot aggregation, which is
  * a single shuffle on partition_date. Assignments (dates × cluster)
  * broadcast back into the fact join. Only the k×24 centroid matrix
  * ever reaches the driver.
  */
object Clustering {

  /** Memo for [[assignmentsCached]]: assignments are deterministic
    * (fixed seed) and tiny (one row per date), so recomputing the
    * KMeans fit for every consumer query in one session is pure waste.
    * Keyed by session so a stopped session's plans are never reused.
    */
  private val memo =
    new graft.sources.SessionMemo[(String, Int, Long), DataFrame](
      maxPerSession = 4, onEvict = _.unpersist(blocking = false))

  /** [[assignments]] with per-session memoization, for callers that
    * identify the fact by its scale-factor dir (the SparkEntry query
    * family — gold_cluster_* and the polygon consultation all share
    * one training run per session).
    */
  def assignmentsCached(fact: DataFrame, dir: String, k: Int = 3,
      seed: Long = 42L): DataFrame =
    memo.getOrElseUpdate(fact.sparkSession, (dir, k, seed)) {
      // cache(), NOT localCheckpoint: eviction unpersists the memoized
      // value, and a checkpoint-backed frame has no lineage to
      // recompute from — a consumer still holding an evicted frame
      // would crash on 'checkpoint block not found'. A cached frame
      // just recomputes (the KMeans fit already ran at build time; the
      // transform plan only carries the k×24 centroid matrix).
      val df = assignments(fact, k, seed).cache()
      df.count() // eager materialization, same contract as before
      df
    }

  /** (date, cluster_id) assignments from KMeans over normalized
    * daily profiles (reference's fit_predict, pipeline.py:687-698).
    *
    * Restart parity: the reference fits sklearn
    * `KMeans(n_clusters=3, random_state=42, n_init=10)`
    * (mobility_ingestion_pipeline.py:692) — TEN independent inits,
    * best inertia wins. A single MLlib fit can land on a worse local
    * optimum and silently ship different cluster assignments through
    * C9/C10 and the polygon consultation. [[bestOfFits]] mirrors the
    * restart discipline with deterministic derived seeds
    * (seed, seed+1, …): every fit is reproducible, and the winner is
    * the minimum `summary.trainingCost` (= sklearn's inertia_: sum of
    * squared distances to the assigned centroid). Cost: the feature
    * matrix is one row per DATE (bounded, cached), so 10 fits on it
    * are driver-trivial next to the fact-table pivot that feeds them.
    */
  def assignments(fact: DataFrame, k: Int = 3, seed: Long = 42L,
      nInit: Int = 10): DataFrame = {
    val profiles = Gold.pivotHourlyProfile(fact)
    val features = array((0 to 23).map(h => col(s"h$h")): _*)
    // Canonical row order BEFORE the fit: k-means|| init samples by
    // row position, and shuffle FETCH order is not deterministic run
    // to run — without this, the same seed on the same data can pick
    // different init candidates and converge to a different local
    // optimum (observed: same-session refits disagreed on cluster
    // contents, not just labels). One sorted partition pins it; the
    // profile table is bounded at one row per DATE, so a single
    // partition holds years of profiles without breaking a sweat.
    val feat = profiles.select(col("date"),
        array_to_vector(features).as("features"))
      .repartition(1).sortWithinPartitions("date")
    feat.persist() // 10 fits must not re-run the fact pivot
    try {
      val best = bestOfFits(feat, k, seed, nInit)
      best.transform(feat)
        .select(col("date"),
          col("cluster_id").cast("long").as("cluster_id"))
    } finally feat.unpersist(blocking = false)
  }

  /** The lowest-inertia model among `nInit` deterministic seeded fits
    * (ties broken by the earliest seed, like sklearn's first-best).
    */
  private[graft] def bestOfFits(feat: DataFrame, k: Int, seed: Long,
      nInit: Int): org.apache.spark.ml.clustering.KMeansModel =
    (0 until nInit).map { i =>
      val m = new KMeans().setK(k).setSeed(seed + i)
        .setFeaturesCol("features").setPredictionCol("cluster_id")
        .fit(feat)
      (m.summary.trainingCost, i, m)
    }.minBy(t => (t._1, t._2))._3

  /** Per-cluster typical day: AVG + SUM of trips per (cluster, hour)
    * (reference's typical_day_by_cluster, pipeline.py:708-727).
    */
  def typicalDayByCluster(fact: DataFrame, assign: DataFrame): DataFrame =
    fact.join(broadcast(assign),
        fact("partition_date") === assign("date"))
      .groupBy(col("cluster_id"), hour(col("period")).as("hour"))
      .agg(
        round(graft.queries.exactAvg(col("trips")), 2).as("avg_trips"),
        graft.queries.exactSum(col("trips")).as("total_trips_sample"))

  /** Cluster interpretation: days per cluster + modal day name
    * (reference's MODE(dayname(date)), pipeline.py:734-742).
    */
  def interpret(assign: DataFrame): DataFrame =
    assign
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("days_in_cluster"),
        mode(TimeFns.dayName(col("date"))).as("typical_day"))
}
