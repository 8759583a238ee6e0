package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** EXACT top-k-by-frequency without shuffling the full key space —
  * the heavy-hitters path for corpus-scale token/domain/n-gram
  * statistics (SURVEY §2 H15). A full `groupBy(item).count` over a
  * 100-TB corpus shuffles every DISTINCT key (for n-grams, billions);
  * this operator shuffles almost nothing:
  *
  *  1. One scan runs a Misra-Gries summary (s counters) PER PARTITION
  *     — O(s) memory, no shuffle. The classical guarantee composes
  *     across partitions: any item with global count > n/(s+1) must
  *     exceed its local bound n_p/(s+1) in at least one partition
  *     (else summing the per-partition bounds contradicts the global
  *     count), so the UNION of partition survivors (<= s x partitions
  *     rows — counter rows, not data rows) is a provable candidate
  *     superset of every such item.
  *  2. A second scan counts ONLY the candidates exactly (map-side
  *     partial aggregation bounds the exchange by the candidate set).
  *  3. The top k of those exact counts is returned IF the kth count
  *     exceeds the n/(s+1) bound — then step 1's guarantee proves no
  *     non-candidate could outrank it, so the answer is exact. Below
  *     the bound (a near-uniform distribution, where no sketch can
  *     help) it falls back to the full aggregation rather than return
  *     a silently-approximate answer.
  *
  * Output: (item, cnt) ordered by (cnt DESC, item ASC), exactly k
  * rows (fewer if the corpus has fewer distinct items) — identical to
  * the naive `GROUP BY / ORDER BY / LIMIT`, which is what the oracle
  * runs.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries survivors of a string column: each
    * output row is (item) — membership only; counts are re-derived
    * exactly in the verify pass. `s` counters per partition.
    */
  private[graft] def candidates(df: DataFrame, itemCol: String,
      s: Int): DataFrame = {
    val items = df.select(col(itemCol).cast("string")).na.drop()
      .as(Encoders.STRING)
    items.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long](s * 2)
      it.foreach { item =>
        // containsKey, NOT get()==null: the map is HashMap[String,
        // Long] and Scala unboxes a missing key's null to 0L, so a
        // null check can never fire (it silently disabled the
        // decrement branch until round 10 — candidates stayed a
        // correct superset, but the s-counter memory bound did not
        // hold)
        if (counters.containsKey(item) || counters.size < s)
          counters.merge(item, 1L, (a, b) => a + b)
        else {
          // decrement-all: drop every counter by 1, evict zeros
          val iter = counters.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().iterator().asScala
    }(Encoders.STRING).toDF("item").distinct()
  }

  /** Exact top-k by frequency of `itemCol` (nulls excluded), ordered
    * (cnt DESC, item ASC). `s` = Misra-Gries counters per partition;
    * larger s widens the skew range the fast path covers (memory
    * O(s) per task, candidate rows <= s x partitions).
    */
  def exactTopK(df: DataFrame, itemCol: String, k: Int,
      s: Int = 4096): DataFrame = {
    require(k >= 1, s"exactTopK: k must be >= 1, got $k")
    val items = df.select(col(itemCol).cast("string").as("item"))
      .na.drop()
    // pin: the scan feeds the sketch pass, the verify pass, and the
    // total count — evaluate the upstream frame once
    val pinned = items.localCheckpoint()
    val n = pinned.count()
    if (n == 0L) return pinned.withColumn("cnt", lit(0L)).limit(0)
    val cand = candidates(pinned, "item", s)
    val exact = pinned.join(cand, Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(k)
    val top = exact.collect()
    val bound = n.toDouble / (s + 1).toDouble
    val proven = top.length == k && top.last.getLong(1) > bound
    if (proven) {
      import scala.jdk.CollectionConverters._
      df.sparkSession.createDataFrame(top.toSeq.asJava, exact.schema)
    } else
      // near-uniform tail: the sketch cannot prove the cut — fall
      // back to the exact full aggregation, never approximate
      pinned.groupBy("item").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("item").asc)
        .limit(k)
  }
}
