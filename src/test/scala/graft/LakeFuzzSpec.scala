package graft

import org.apache.spark.sql.functions._
import graft.sources.AtomicLake

/** Model-based randomized exercise of the ACID lake core: a seeded
  * random sequence of table operations (append / keyed merge /
  * predicate delete / deletion-vector delete / row update / purge /
  * compact / restore) runs against BOTH the real
  * lake and a trivial in-memory model, and after every step the
  * lake's full contents must equal the model's. Targeted specs prove
  * each operator alone; this proves the COMPOSITIONS — e.g. restore
  * after delete after merge — agree with the obviously-correct
  * semantics, across many interleavings no hand-written case would
  * enumerate. Seeded (deterministic) so a failure reproduces.
  */
class LakeFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def readState(root: String): Map[Long, Double] =
    AtomicLake.read(spark, root).select("id", "v")
      .as[(Long, Double)].collect().toMap

  it("random op sequences match the in-memory model at every step") {
    val seeds = Seq(7L, 41L, 20260813L)
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val root = s"/root/repo/target/test-scratch/lake_fuzz_$seed"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)

      var model = Map.empty[Long, Double]
      var nextId = 0L
      // version → model snapshot, for restore
      var history = Vector.empty[(Long, Map[Long, Double])]

      def df(rows: Seq[(Long, Double)]) = rows.toDF("id", "v")

      // seed commit so every op has a table
      val v0 = AtomicLake.append(df(Seq((nextId, 1.0))), root)
      model = Map(nextId -> 1.0); nextId += 1
      history :+= (v0, model)

      for (step <- 1 to 14) {
        val op = rnd.nextInt(8)
        val clue = s"seed=$seed step=$step op=$op"
        op match {
          case 0 => // append fresh ids
            val rows = (0 until 1 + rnd.nextInt(4))
              .map { _ => val r = (nextId, rnd.nextInt(100).toDouble)
                nextId += 1; r }
            val v = AtomicLake.append(df(rows), root)
            model ++= rows
            history :+= (v, model)
          case 1 => // keyed merge: mix of updates to existing + inserts
            val updates = model.keys.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).take(3)
              .map(k => (k, 1000.0 + rnd.nextInt(100)))
            val inserts = (0 until rnd.nextInt(3))
              .map { _ => val r = (nextId, rnd.nextInt(100).toDouble)
                nextId += 1; r }
            val rows = updates ++ inserts
            if (rows.nonEmpty) {
              val res = AtomicLake.merge(spark, root, df(rows), Seq("id"))
              model ++= rows
              history :+= (res.version, model)
            }
          case 2 => // predicate delete
            val (m, r) = (2 + rnd.nextInt(3), rnd.nextInt(2))
            val res = AtomicLake.deleteWhere(spark, root)(
              pmod(col("id"), lit(m.toLong)) === r.toLong)
            model = model.filter { case (k, _) => k % m != r }
            history :+= (res.version, model)
          case 3 => // compact: contents must not change
            val v = AtomicLake.compact(spark, root, minFiles = 2)
            history :+= (v, model)
          case 4 => // restore to a random earlier version
            val (tv, tm) = history(rnd.nextInt(history.size))
            val v = AtomicLake.restore(root, tv)
            model = tm
            history :+= (v, model)
          case 5 => // deletion-vector delete (merge-on-read)
            val (m, r) = (2 + rnd.nextInt(3), rnd.nextInt(2))
            val res = AtomicLake.deleteWhereDV(spark, root)(
              pmod(col("id"), lit(m.toLong)) === r.toLong)
            model = model.filter { case (k, _) => k % m != r }
            history :+= (res.version, model)
          case 6 => // row-level update
            val (m, r) = (2 + rnd.nextInt(3), rnd.nextInt(2))
            val delta = rnd.nextInt(9).toDouble
            val res = AtomicLake.updateWhere(spark, root,
              Seq("v" -> (col("v") + delta)))(
              pmod(col("id"), lit(m.toLong)) === r.toLong)
            model = model.map { case (k, v) =>
              k -> (if (k % m == r) v + delta else v) }
            history :+= (res.version, model)
          case 7 => // purge vectors: contents must not change
            val res = AtomicLake.purgeDeletes(spark, root)
            history :+= (res.version, model)
        }
        withClue(clue) { readState(root) shouldBe model }
      }
      // time travel still resolves every recorded version exactly
      val probes = rnd.shuffle(history).take(3)
      probes.foreach { case (v, m) =>
        withClue(s"seed=$seed versionAt=$v") {
          AtomicLake.readVersion(spark, root, v).select("id", "v")
            .as[(Long, Double)].collect().toMap shouldBe m
        }
      }
    }
  }
}
