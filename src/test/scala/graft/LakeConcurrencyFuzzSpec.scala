package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.sources.AtomicLake

/** Randomized CONCURRENT exercise of the ACID lake: writer, deleter,
  * maintenance, and reader threads race against one root with no
  * external coordination, then the whole run is adjudicated post hoc
  * from the commit log:
  *
  *  1. serializability — versions are contiguous; replaying the
  *     threads' own op log version by version reproduces every
  *     snapshot's exact content (append adds exactly its batch,
  *     delete removes exactly its predicate's matches against a
  *     witnessed derivation snapshot — WriteSerializable, see the
  *     Deleted case — and manifest-marked compact commits change
  *     nothing);
  *  2. snapshot isolation — every mid-chaos read equals some
  *     committed version's contents, never a torn mix;
  *  3. liveness — no thread error escapes (internal CAS retries are
  *     the protocol's job; a maintenance abort under conflict is
  *     allowed and recorded as a no-op).
  *
  * The single-writer LakeFuzzSpec proves op COMPOSITIONS against an
  * in-memory model; this spec proves the same semantics hold when the
  * ops INTERLEAVE — the multi-writer reality of a shared 100-TB lake,
  * where ingest, GDPR deletes, and the compactor all run as separate
  * jobs. Seeded, so a failure reproduces.
  */
class LakeConcurrencyFuzzSpec extends SparkSpec {
  import spark.implicits._

  private sealed trait Op
  private case class Appended(ids: Set[Long]) extends Op
  private case class Deleted(m: Long, r: Long) extends Op

  private def idsAt(root: String, version: Long): Set[Long] =
    AtomicLake.readVersion(spark, root, version)
      .select(col("id")).as[Long].collect().toSet

  it("concurrent writers/deleter/compactor: every read is a committed " +
      "snapshot and the commit log replays to every version's contents") {
    var totalCrashes = 0 // non-vacuity witness for the r14 injection
    for (seed <- Seq(13L, 20260815L)) {
      val root = s"/root/repo/target/test-scratch/lake_cfuzz_$seed"
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)

      def batchDf(ids: Seq[Long]) =
        ids.toDF("id").withColumn("v", col("id") * 2.0)

      // v1: a seeded base population so early deletes have matches
      AtomicLake.append(batchDf(0L until 400L), root)

      val opLog =
        new java.util.concurrent.ConcurrentHashMap[Long, Op]()
      val reads = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)

      def guard(name: String)(body: => Unit): Thread =
        new Thread(() =>
          try body
          catch { case t: Throwable => errs.add(t) }, name)

      // 3 writers x 4 appends, globally unique id ranges. r14
      // crash-point injection (VERDICT r13 item 7): with p=1/4 a
      // writer "dies" between staging its data files and claiming a
      // version — exactly the state stageFiles-without-commit leaves
      // (AtomicLakeSpec's crash case, here randomized against live
      // concurrency). The crashed batch's ids must NEVER surface in
      // any snapshot, and the commit-log replay below must stay
      // exact with the orphans sitting in the data plane.
      val crashedIds =
        new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
      val crashedFiles =
        new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val writers = (0 until 3).map { w =>
        guard(s"writer-$w") {
          val rnd = new scala.util.Random(seed * 31 + w)
          for (b <- 0 until 4) {
            val base = 1000L * (1 + w) + 100L * b
            val ids = (base until base + 40L + rnd.nextInt(40))
            if (rnd.nextInt(4) == 0) {
              val st = AtomicLake.stageFiles(batchDf(ids), root, Nil,
                filesPerPartition = 1)
              crashedFiles.addAll(
                st.files.values.flatten.toSeq.asJava)
              crashedIds.add(ids.toSet)
            } else {
              val v = AtomicLake.append(batchDf(ids), root)
              opLog.put(v, Appended(ids.toSet))
            }
            Thread.sleep(rnd.nextInt(30).toLong)
          }
        }
      }
      // 1 deleter: alternating COW and DV deletes on residue classes
      val deleter = guard("deleter") {
        val rnd = new scala.util.Random(seed * 131)
        for (i <- 0 until 4) {
          val m = 7L + rnd.nextInt(4)
          val r = rnd.nextInt(m.toInt).toLong
          val res =
            if (i % 2 == 0)
              AtomicLake.deleteWhereDV(spark, root)(
                pmod(col("id"), lit(m)) === r)
            else
              AtomicLake.deleteWhere(spark, root)(
                pmod(col("id"), lit(m)) === r)
          // a no-match delete commits nothing and consumes no version
          if (res.rowsChanged > 0) opLog.put(res.version, Deleted(m, r))
          Thread.sleep(rnd.nextInt(40).toLong)
        }
      }
      // 1 maintenance loop: content-neutral ops; abort-on-conflict is
      // legal behavior (the spec "compact aborts instead of
      // resurrecting"), so conflicts are swallowed, not failures.
      // Maintenance commits are NOT recorded thread-side: a no-op
      // call returns the CURRENT version (someone else's commit), so
      // self-reporting races — the adjudication below instead trusts
      // the manifest's own kind=compact marker, which only a
      // maintenance rewrite writes.
      val maint = guard("maint") {
        val rnd = new scala.util.Random(seed * 733)
        var i = 0
        while (!done.get() && i < 12) {
          try {
            rnd.nextInt(3) match {
              case 0 => AtomicLake.compactSmall(spark, root)
              case 1 => AtomicLake.purgeDeletes(spark, root)
              case 2 => AtomicLake.cluster(spark, root, Seq("id"),
                filesPerPartition = 2)
            }
          } catch { case _: java.util.ConcurrentModificationException
                       | _: IllegalStateException => () }
          Thread.sleep(20L + rnd.nextInt(30).toLong)
          i += 1
        }
      }
      // 2 readers: raw mid-chaos snapshots, adjudicated post hoc
      val readers = (0 until 2).map { r =>
        guard(s"reader-$r") {
          while (!done.get()) {
            reads.add(AtomicLake.read(spark, root)
              .select(col("id")).as[Long].collect().toSet)
            Thread.sleep(15L)
          }
        }
      }

      val mutators = writers :+ deleter
      (mutators :+ maint).foreach(_.start())
      readers.foreach(_.start())
      mutators.foreach(_.join(120000))
      done.set(true)
      (readers :+ maint).foreach(_.join(120000))
      withClue(s"seed=$seed thread errors: ${errs.size}") {
        errs.iterator().asScala.toList.map(_.toString) shouldBe empty
      }

      // ---- post-hoc adjudication from the commit log ----
      val hist = AtomicLake.history(root)
      val versions = hist.map(_._1).sorted
      val kinds = hist.map(h => h._1 -> h._2).toMap
      withClue(s"seed=$seed versions=$versions") {
        versions shouldBe (versions.min to versions.max)
      }
      // replay: every version after the base is either an op the
      // writer/deleter threads recorded (replayed exactly) or a
      // manifest-marked kind=compact maintenance rewrite (content
      // must be untouched) — an unattributed data-changing commit
      // fails loudly
      var prev = idsAt(root, versions.min)
      val contents = scala.collection.mutable.Map(versions.min -> prev)
      for (v <- versions.drop(1)) {
        val now = idsAt(root, v)
        withClue(s"seed=$seed version=$v kind=${kinds(v)} " +
            s"op=${opLog.get(v)}") {
          opLog.get(v) match {
            case Appended(ids) => now shouldBe (prev ++ ids)
            case Deleted(m, r) =>
              // WriteSerializable delete semantics (Delta's default
              // isolation, and this lake's: the commit verifies only
              // its TOUCHED files): the predicate applies to the
              // snapshot the delete derived its matches from, which
              // may TRAIL the commit by concurrent appends — rows
              // appended in between legitimately survive. So: nothing
              // added, everything removed matched the predicate, and
              // the removed set is exactly the predicate's matches in
              // SOME earlier version intersected with the current
              // rows (the derivation-snapshot witness).
              val removed = prev -- now
              now.subsetOf(prev) shouldBe true
              removed.filterNot(_ % m == r) shouldBe empty
              contents.exists { case (b, cb) =>
                b < v && (cb.filter(_ % m == r) & prev) == removed
              } shouldBe true
            case null =>
              kinds(v) shouldBe "compact"
              now shouldBe prev
          }
        }
        contents(v) = now
        prev = now
      }
      withClue(s"seed=$seed: every thread-recorded commit must be a " +
          "real version") {
        (opLog.keySet().iterator().asScala.toSet -- versions.toSet) shouldBe
          empty
      }
      // ---- crash-point adjudication (r14) ----
      // The invariants must hold FROM THE COMMIT LOG ALONE with dead
      // writers' leftovers sitting in the data plane: no crashed
      // batch's rows in any version (content witness), and no
      // manifest of any version referencing a crashed writer's
      // staged files (reference witness). Orphan EXISTENCE on disk
      // is deliberately not asserted — maintenance may legally
      // vacuum dead staging leftovers past the grace window.
      val crashed = crashedIds.iterator().asScala.flatten.toSet
      withClue(s"seed=$seed: ${crashedIds.size} writers crashed " +
          "between stage and commit; their rows leaked into a snapshot: ") {
        (contents.values.flatten.toSet & crashed) shouldBe empty
      }
      val orphanFiles = crashedFiles.iterator().asScala.toSet
      for (v <- versions) {
        val referenced =
          AtomicLake.snapshotAt(root, v).files.values.flatten.toSet
        withClue(s"seed=$seed version=$v references a dead writer's " +
            "staged file: ") {
          (referenced & orphanFiles) shouldBe empty
        }
      }
      // snapshot isolation: every concurrent read is SOME version
      val all = contents.values.toSet
      for (snap <- reads.iterator().asScala.toList) {
        withClue(s"seed=$seed torn read of ${snap.size} ids") {
          all should contain(snap)
        }
      }
      // final state = last version's replay (already forced above);
      // row multiset agrees with the manifest's own row stats
      val statRows = AtomicLake.history(root).head._4
      statRows.foreach(_ shouldBe prev.size.toLong)
      // the lake stays fully writable after the crashes: one healthy
      // append on top of the chaos commits and reads back exactly
      val post = AtomicLake.append(batchDf(90000L until 90010L), root)
      idsAt(root, post) shouldBe (prev ++ (90000L until 90010L))
      totalCrashes += crashedIds.size
    }
    // the injection must actually fire (seeds are fixed, so this is
    // deterministic, not a flake source): p=1/4 over 24 writer
    // batches across the two seeds
    withClue("crash-point injection never fired — the crash " +
        "invariants above were vacuous: ") {
      totalCrashes should be > 0
    }
  }

}
