package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `SparkEntry.oracleSql` as deterministic `name\tSQL` lines
  * WITHOUT starting Spark — the byte-identity witness for refactors
  * that move oracle text around (e.g. the r14 pin-VALUES → classpath
  * resource migration). One JVM per SF: the pin set is selected during
  * query-object static init from `graft.pin.sf` (see graft.queries.Pins).
  *
  * Usage: runMain graft.tools.DumpOracles <sfDir> <outFile>
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.pin.sf", args(0))
    val sb = new StringBuilder
    graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(k).append('\t')
        .append(v.replace("\\", "\\\\").replace("\n", "\\n")).append('\n')
    }
    Files.writeString(Paths.get(args(1)), sb.toString)
  }
}
