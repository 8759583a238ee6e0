package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Shared lazy session for all specs — one JVM (Test/fork), one
  * SparkSession, sf0.001 data.
  */
object SparkSpec {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSpec with Matchers {
  // stable identifier so `import spark.implicits._` works in suites
  lazy val spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.sf
}
