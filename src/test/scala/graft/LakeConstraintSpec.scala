package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.sources.AtomicLake

/** CHECK constraints on the lake (Delta's ADD CONSTRAINT … CHECK):
  * metadata commits carry them, every write commit enforces them, SQL
  * null semantics apply, and a violating batch leaves the table
  * byte-identical.
  */
class LakeConstraintSpec extends SparkSpec {
  import spark.implicits._

  private val scratch = "/root/repo/target/test-scratch/lake_constraint"

  private def freshRoot(name: String): String = {
    val p = Paths.get(scratch, name)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    p.toString
  }

  describe("CHECK constraints") {
    it("a violating batch is refused before anything commits") {
      val root = freshRoot("refuse")
      AtomicLake.append(Seq((1, 10.0)).toDF("id", "v"), root)
      val vc = AtomicLake.addConstraint(spark, root, "v_pos", "v > 0")
      val ex = the[IllegalStateException] thrownBy
        AtomicLake.append(Seq((2, -5.0)).toDF("id", "v"), root)
      ex.getMessage should include("v_pos")
      // table unchanged: same version, same rows
      AtomicLake.currentVersion(root).get shouldBe vc
      AtomicLake.read(spark, root).count() shouldBe 1
      // a clean batch still lands
      AtomicLake.append(Seq((3, 3.0)).toDF("id", "v"), root)
      AtomicLake.read(spark, root).count() shouldBe 2
    }
    it("null predicate values PASS (SQL CHECK semantics)") {
      val root = freshRoot("null_pass")
      AtomicLake.append(Seq((1, Some(1.0))).toDF("id", "v"), root)
      AtomicLake.addConstraint(spark, root, "v_pos", "v > 0")
      AtomicLake.append(
        Seq((2, None: Option[Double])).toDF("id", "v"), root)
      AtomicLake.read(spark, root).count() shouldBe 2
    }
    it("adding a constraint existing data violates is refused") {
      val root = freshRoot("add_refuse")
      AtomicLake.append(Seq((1, -1.0)).toDF("id", "v"), root)
      val v0 = AtomicLake.currentVersion(root).get
      an[IllegalStateException] should be thrownBy
        AtomicLake.addConstraint(spark, root, "v_pos", "v > 0")
      AtomicLake.currentVersion(root).get shouldBe v0
    }
    it("constraints survive unrelated commits and drop cleanly") {
      val root = freshRoot("carry")
      AtomicLake.upsertPartitions(
        Seq((1, 1.0, "a")).toDF("id", "v", "part"), root, Seq("part"))
      AtomicLake.addConstraint(spark, root, "v_pos", "v > 0")
      AtomicLake.upsertPartitions(
        Seq((2, 2.0, "b")).toDF("id", "v", "part"), root, Seq("part"))
      AtomicLake.currentSnapshot(root).get
        .constraints shouldBe Map("v_pos" -> "v > 0")
      an[IllegalStateException] should be thrownBy
        AtomicLake.upsertPartitions(
          Seq((3, -3.0, "c")).toDF("id", "v", "part"), root, Seq("part"))
      AtomicLake.dropConstraint(root, "v_pos")
      AtomicLake.upsertPartitions(
        Seq((3, -3.0, "c")).toDF("id", "v", "part"), root, Seq("part"))
      AtomicLake.read(spark, root).count() shouldBe 3
      // dropping an unknown name is refused, not silently ignored
      an[IllegalArgumentException] should be thrownBy
        AtomicLake.dropConstraint(root, "nope")
    }
    it("merge validates its source rows") {
      val root = freshRoot("merge_check")
      AtomicLake.append(Seq((1, 1.0)).toDF("k", "v"), root)
      AtomicLake.addConstraint(spark, root, "v_pos", "v > 0")
      an[IllegalStateException] should be thrownBy
        AtomicLake.merge(spark, root,
          Seq((1, -9.0)).toDF("k", "v"), Seq("k"))
      AtomicLake.read(spark, root).select("v").as[Double]
        .head() shouldBe 1.0
      AtomicLake.merge(spark, root,
        Seq((1, 9.0)).toDF("k", "v"), Seq("k"))
      AtomicLake.read(spark, root).select("v").as[Double]
        .head() shouldBe 9.0
    }
    it("multiple constraints check in one pass; each reports by name") {
      val root = freshRoot("multi")
      AtomicLake.append(Seq((1, 1.0, "x")).toDF("id", "v", "t"), root)
      AtomicLake.addConstraint(spark, root, "v_pos", "v > 0")
      AtomicLake.addConstraint(spark, root, "t_nonempty",
        "length(t) > 0")
      val ex = the[IllegalStateException] thrownBy
        AtomicLake.append(
          Seq((2, 2.0, "")).toDF("id", "v", "t"), root)
      ex.getMessage should include("t_nonempty")
      AtomicLake.currentSnapshot(root).get.constraints.keySet shouldBe
        Set("v_pos", "t_nonempty")
    }
  }
}
