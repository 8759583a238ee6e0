package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.sources.{AtomicLake, HardlinkCommitStore}

/** Table-as-stream: follow an [[AtomicLake]]'s committed versions as
  * a Structured Streaming source —
  * `spark.readStream.format("graft-lake").option("path", root).load()`.
  *
  * Offsets ARE lake versions: the first micro-batch is the full
  * snapshot at the then-current version, every later batch exactly
  * the rows the commits since the previous offset ADDED, resolved
  * from the manifest diff — only new files are ever opened, and the
  * commit protocol guarantees a version's files are complete and
  * immutable the instant it becomes visible (no partially-written
  * file can enter a batch, unlike directory-listing file streams).
  * Restart replays from the checkpointed version with identical
  * batch contents.
  *
  * Append-only semantics: a commit that REMOVES files (partition
  * upsert/overwrite/compaction) cannot flow into an append sink, so
  * the source fails loudly on it by default;
  * `.option("ignoreDeletes", "true")` skips removed files and
  * streams the added side only (Delta's streaming-source contract).
  *
  * Schema is fixed at stream start (the usual streaming-source rule);
  * evolution lands on restart.
  */
class LakeStreamProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.RelationProvider
    with org.apache.spark.sql.sources.CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def rootOf(parameters: Map[String, String]): String = {
    val raw = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-lake source requires .option(\"path\", <lake root>)"))
    // the session catalog canonicalizes a CREATE TABLE ... USING
    // location to a file: URI; the lake's path layer wants the plain
    // filesystem path
    if (raw.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(raw)).toString
    else raw
  }

  /** Batch read: `spark.read.format("graft-lake").load(root)` (or a
    * SQL view `USING graft-lake`), with WHERE-clause pushdown pruning
    * files through the manifest zone-maps — see
    * [[graft.sources.LakeRelation]]. `option("versionAsOf", n)` time
    * travels.
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String])
      : org.apache.spark.sql.sources.BaseRelation = {
    val root = rootOf(parameters)
    // CDC surface (Delta's readChangeFeed): rows changed between two
    // versions instead of the snapshot
    if (parameters.get("readChangeFeed").exists(_.toBoolean)) {
      val from = parameters.getOrElse("startingVersion",
        throw new IllegalArgumentException(
          "readChangeFeed requires .option(\"startingVersion\", v)"))
        .toLong
      return new graft.sources.LakeChangesRelation(sqlContext, root,
        from, parameters.get("endingVersion").map(_.toLong))
    }
    // versionAsOf wins when both are passed (it is the exact form);
    // timestampAsOf (epoch millis) resolves via the manifest ts=
    // headers — Delta's TIMESTAMP AS OF
    val version = parameters.get("versionAsOf").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map(t =>
        AtomicLake.versionAt(root, t.toLong)))
    new graft.sources.LakeRelation(sqlContext, root, version)
  }

  /** Batch write: `df.write.format("graft-lake").mode(...)` —
    * Append is an [[AtomicLake.append]] commit, Overwrite an
    * [[AtomicLake.overwrite]]; `option("partitionCols", "a,b")`
    * partitions a first commit (later commits must match the table's
    * partitioning, enforced by the commit layer).
    */
  override def createRelation(sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode, parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val root = rootOf(parameters)
    val parts = parameters.get("partitionCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(AtomicLake.currentSnapshot(root).map(_.partitionCols))
      .getOrElse(Nil)
    val exists = AtomicLake.currentVersion(root).isDefined
    mode match {
      case SaveMode.Append => AtomicLake.append(data, root, parts)
      case SaveMode.Overwrite => AtomicLake.overwrite(data, root, parts)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft-lake table at $root already exists (ErrorIfExists)")
      case SaveMode.Ignore if exists => () // contract: leave as-is
      case _ => AtomicLake.append(data, root, parts)
    }
    new graft.sources.LakeRelation(sqlContext, root, None)
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val root = rootOf(parameters)
    val snap = AtomicLake.currentSnapshot(root).getOrElse(
      throw new IllegalStateException(
        s"no commits to stream from at $root"))
    val s = schema.orElse(snap.schema).getOrElse(
      AtomicLake.read(sqlContext.sparkSession, root).schema)
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new LakeStreamSource(sqlContext,
      rootOf(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      parameters.get("ignoreDeletes").exists(_.toBoolean),
      parameters.get("maxVersionsPerTrigger").map { v =>
        val n = v.toInt
        require(n >= 1,
          s"maxVersionsPerTrigger must be >= 1, got $n (0 would stall " +
            "the stream forever; negative would regress offsets)")
        n
      },
      metadataPath)
}

/** The `format("graft-lake")` path rides the default
  * [[HardlinkCommitStore]] (DataSource options are strings — a live
  * store instance cannot travel through them); object-store
  * deployments construct the source directly with their
  * [[graft.sources.CommitStore]] and hand it to `DataStreamReader`
  * via this class, or poll [[AtomicLake.readChanges]] in batch.
  */
class LakeStreamSource(sqlContext: SQLContext, root: String,
    override val schema: StructType, ignoreDeletes: Boolean,
    maxVersionsPerTrigger: Option[Int] = None,
    metadataPath: String = "",
    store: graft.sources.CommitStore = HardlinkCommitStore)
    extends Source {

  private def spark = sqlContext.sparkSession

  // Highest version already handed out via getOffset — the admission
  // base for maxVersionsPerTrigger. Persisted under the source's own
  // checkpoint metadata dir (the V1 metadata-log role) so a RESTART
  // resumes pacing from where it left off instead of gulping the
  // whole backlog in one batch. An unreadable file costs one unpaced
  // batch; getBatch ratchets the base to the engine's checkpointed
  // offset, so a stale file can never regress offsets below what was
  // delivered (and writes fail LOUD rather than go stale silently).
  @volatile private var lastSeen: Option[Long] = None

  // persisted whether or not THIS incarnation paces, so turning
  // pacing on at a restart still knows where the stream stood
  private def positionFile: Option[org.apache.hadoop.fs.Path] =
    if (metadataPath.isEmpty) None
    else Some(new org.apache.hadoop.fs.Path(metadataPath,
      "graft-lake-position"))

  private def loadPosition(): Option[Long] = positionFile.flatMap { p =>
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      }
    } catch { case _: Exception => None }
  }

  // LOUD on failure: a position file that silently lags the engine's
  // committed offset would make a later getOffset return an offset
  // BELOW the checkpoint, and the engine would then re-emit already-
  // delivered versions. Failing the trigger is recoverable; duplicate
  // data downstream is not.
  private def savePosition(v: Long): Unit = positionFile.foreach { p =>
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** `maxVersionsPerTrigger` caps how many commits one micro-batch
    * admits (Delta's maxFilesPerTrigger role, at commit granularity):
    * catching up a long backlog replays in bounded batches instead of
    * one giant gulp. A brand-new stream's FIRST batch is the full
    * snapshot by definition; pacing governs everything after it,
    * across restarts.
    */
  override def getOffset: Option[Offset] = {
    if (lastSeen.isEmpty) lastSeen = loadPosition()
    val current = AtomicLake.currentVersion(root, store)
    val capped = (current, maxVersionsPerTrigger, lastSeen) match {
      case (Some(c), Some(m), Some(prev)) => Some(math.min(c, prev + m))
      case _ => current
    }
    capped.foreach { v =>
      if (!lastSeen.contains(v)) { lastSeen = Some(v); savePosition(v) }
    }
    capped.map(LongOffset.apply)
  }

  private def versionOf(o: Offset): Long = o match {
    case lo: LongOffset => lo.offset
    case so: SerializedOffset => LongOffset(so).offset
    case other => throw new IllegalStateException(
      s"unexpected offset type $other")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    // ratchet the pacing base: the engine's checkpointed offsets are
    // authoritative, so a stale position file can never drag the
    // admission base (and thus future offsets) below what was already
    // delivered
    if (lastSeen.forall(_ < endV)) { lastSeen = Some(endV); savePosition(endV) }
    val batch = start match {
      case None => // initial load: the whole snapshot as of endV
        AtomicLake.readVersion(spark, root, endV, store)
      case Some(s) =>
        // walk the commits one by one: a `compact` commit rewrites
        // files with NO logical change (Delta's dataChange=false), so
        // its adds must NOT re-emit and its removes must NOT trip the
        // delete check — only write commits count either way. One
        // manifest read per version: each iteration diffs against the
        // previous iteration's snapshot instead of calling fileDiff
        // (which would re-read both endpoints).
        val startV = versionOf(s)
        val added = Vector.newBuilder[String]
        var prev =
          try AtomicLake.snapshotAt(root, startV, store)
          catch { case e: Exception =>
            throw new IllegalStateException(
              s"lake stream at $root: manifest v$startV is gone — the " +
                "stream's checkpoint predates vacuum's retention window " +
                "(keepVersions). Raise retention above the longest " +
                "expected stream downtime, or discard the checkpoint " +
                "and restart from the current snapshot.", e)
          }
        for (v <- startV + 1 to endV) {
          val snap = AtomicLake.snapshotAt(root, v, store)
          if (snap.kind != "compact") {
            val prevFiles = prev.files.values.flatten.toSet
            val curFiles = snap.files.values.flatten.toSet
            val removed = prevFiles -- curFiles
            if (removed.nonEmpty && !ignoreDeletes)
              throw new IllegalStateException(
                s"lake stream at $root: commit v$v removed " +
                  s"${removed.size} file(s) (partition upsert/" +
                  "overwrite). An append stream cannot represent " +
                  "deletes; set .option(\"ignoreDeletes\", \"true\") " +
                  "to stream the added side only, or consume " +
                  "AtomicLake.readChanges in batch.")
            // a deletion-vector commit (kind=dv, or a restore rolling
            // vectors around) deletes ROWS without removing files —
            // equally unrepresentable in an append stream
            if (snap.dvs != prev.dvs && !ignoreDeletes)
              throw new IllegalStateException(
                s"lake stream at $root: commit v$v changed deletion " +
                  "vectors (row-level deletes). An append stream " +
                  "cannot represent deletes; set " +
                  ".option(\"ignoreDeletes\", \"true\") to stream " +
                  "added files only, or consume " +
                  "AtomicLake.readChanges in batch.")
            added ++= (curFiles -- prevFiles).toSeq.sorted
          }
          prev = snap
        }
        val files = added.result()
        if (files.isEmpty) // compaction/deletes-only range
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else
          // the STREAM's fixed schema drives the read: files from
          // commits predating a column yield nulls for it, later
          // extra columns are pruned
          AtomicLake.readFileSubset(spark, root, files,
            prev.copy(schema = Some(schema)))
    }
    Bridge.asStreamingBatch(batch.selectExpr(schema.fieldNames.map(
      n => s"`$n`"): _*))
  }

  override def stop(): Unit = ()

  override def toString: String = s"LakeStreamSource[$root]"
}
