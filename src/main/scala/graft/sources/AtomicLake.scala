package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Atomic, versioned parquet lake with snapshot isolation — the
  * transactional layer the reference adopted DuckLake for ("ACID-
  * compliant transactions, metadata management",
  * /root/reference/docs/sprint_logs/Sprint-2.md:13), re-expressed as a
  * catalog-free manifest protocol over plain parquet:
  *
  *  - Data files are written under `data/` with commit-unique names;
  *    readers NEVER list `data/` — they read exactly the files named
  *    by a manifest, so un-committed files are invisible.
  *  - A commit is one atomically-created manifest `_manifests/vN` (an
  *    exclusive hardlink to a fully-written temp file, so a manifest
  *    can never be observed half-written and two writers can never
  *    both claim version N — the loser re-reads and retries on N+1).
  *  - A reader resolves max(vN) once and reads that snapshot: a
  *    concurrent upsert is invisible until its single commit point,
  *    after which new readers see all of it (old-or-new, never torn).
  *  - A killed writer leaves orphan staging/data files and no
  *    manifest: invisible, re-ingest just works (and its own commit
  *    supersedes the orphans).
  *  - Every manifest is retained → time travel ([[readVersion]]) and
  *    audit for free, exactly the DuckLake snapshot feature set the
  *    reference's sprint demos (Sprint-2.md "time travel").
  *
  * Scale notes: the manifest holds file PATHS (one line per file), not
  * data — a 100-TB table with 100k files is a few MB of manifest; the
  * data plane is untouched parquet, so every scan optimization
  * (pushdown, partition pruning via the returned partition column,
  * footer skipping) still applies. The commit point is one atomic
  * claim regardless of table size, and WHERE that claim lives is the
  * pluggable [[CommitStore]]: the default [[HardlinkCommitStore]]
  * needs local/NFS/HDFS link semantics; on an object store (no atomic
  * create-exclusive) pass a [[CatalogCommitStore]], which moves the
  * claim into a transactional catalog — precisely the role DuckLake
  * gives its catalog database.
  *
  * Schema evolution: every manifest records the table schema as of
  * its commit; a commit's schema is the previous snapshot's schema
  * merged with the batch's (new columns append, absent columns stay —
  * nullable either way; a TYPE change is refused loudly). Readers
  * apply the SNAPSHOT's schema, so files written before a column
  * existed read as nulls for it, and time travel to v1 still sees
  * exactly v1's columns.
  */
object AtomicLake {

  final case class Snapshot(version: Long,
      partitionCols: Seq[String],
      // partition relative dir (e.g. "day=2024-01-01", "" when
      // unpartitioned) -> file paths relative to the lake root
      files: Map[String, Seq[String]],
      // table schema as of this commit; None on pre-evolution
      // manifests (readers fall back to parquet schema merge)
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      // what produced this commit: "write" (upsert/append/overwrite)
      // or "compact" (files rewritten, NO logical data change) —
      // incremental consumers skip compact commits to avoid
      // re-emitting rewritten rows (Delta's dataChange=false role)
      kind: String = "write",
      // per-file zone maps (file relative path -> column min/max/
      // nulls), harvested from parquet footers at commit time; absent
      // entries (pre-stats manifests, unreadable footers) are simply
      // never pruned — see [[LakeStats]] and [[scan]]
      stats: Map[String, LakeStats.FileStats] = Map.empty,
      // CHECK constraints (name -> SQL predicate): every write commit
      // validates its batch against them (SQL semantics: a row
      // violates only when the predicate is FALSE — null passes);
      // carried manifest-to-manifest like the schema
      constraints: Map[String, String] = Map.empty,
      // commit wall-clock (epoch millis); None on manifests written
      // before the header existed. Informational + timestampAsOf
      // resolution — never part of correctness
      ts: Option[Long] = None,
      // deletion vectors (merge-on-read DELETE): file -> its chain of
      // position-sidecar paths + total deleted-row count. A file with
      // an entry here still holds its original bytes; readers drop
      // the listed row positions ([[readFileSubset]]). Absent for
      // files with no row-level deletes; cleared when the file is
      // rewritten (COW delete/merge/compaction/[[purgeDeletes]])
      dvs: Map[String, DvRef] = Map.empty,
      // per-file bloom indexes (file -> column -> sidecar ref): point
      // lookups on high-cardinality columns prune files a bloom
      // proves the key absent from — see [[BloomIndex]]; entries shed
      // with their file (rewrites), roll back with restore, and
      // absolutize on clone like dvs
      blooms: Map[String, Map[String, BloomIndex.Ref]] = Map.empty,
      // column mapping (Delta's columnMapping.mode=name): LOGICAL
      // name -> PHYSICAL parquet column, present only for renamed
      // columns ([[renameColumn]] — a metadata-only commit; files
      // keep their bytes). Readers read physical and alias to
      // logical; writers stage logical batches under physical names
      colMap: Map[String, String] = Map.empty,
      // physical names of DROPPED columns ([[dropColumn]]): the data
      // still sits in old files, so re-adding the name is REFUSED
      // (resurrection would silently read the old bytes back)
      dropped: Set[String] = Set.empty,
      // generated columns (Delta's GENERATED ALWAYS AS): column ->
      // single-line SQL generation expression. Writers materialize an
      // absent generated column from the expression BEFORE staging
      // (so a generated PARTITION column costs the writer nothing),
      // and a batch that DOES provide it is validated cell-by-cell
      // against the expression in the same one-pass aggregation as
      // the CHECK constraints
      generated: Map[String, String] = Map.empty,
      // writer-transaction watermarks (Delta's txn action): appId ->
      // highest transaction version committed by that writer. The
      // streaming-sink replay contract: foreachBatch writers tag each
      // commit with (appId, batchId) and skip batches at or below
      // [[lastTxn]], turning at-least-once micro-batch redelivery
      // into exactly-once lake appends. Carried manifest-to-manifest
      // like the schema; absent on older manifests
      txns: Map[String, Long] = Map.empty)

  /** `logical` column's physical parquet name under this snapshot. */
  private def physicalOf(snap: Snapshot, logical: String): String =
    snap.colMap.getOrElse(logical, logical)

  /** Current column mapping for writers staging against `root` (empty
    * before any rename — the overwhelmingly common case pays one
    * manifest read it was already paying for constraints/schema).
    */
  private def currentColMap(root: String,
      store: CommitStore): Map[String, String] =
    currentSnapshot(root, store).map(_.colMap).getOrElse(Map.empty)

  /** A file's deletion-vector reference: `paths` are position
    * sidecars (parquet dirs of (file, pos) rows, lake-root-relative —
    * absolute only when a shallow clone references the source's), the
    * file's deleted positions being the union across the chain
    * (append-only — each [[deleteWhereDV]] adds one link; rewrites
    * clear the whole chain); `n` is the total deleted-row count
    * (drives [[rowCount]] without opening a sidecar).
    */
  final case class DvRef(paths: Seq[String], n: Long)

  private def dataDir(root: String): Path = Paths.get(root, "data")

  /** Staged-file count above which the zone-map footer harvest runs
    * as a distributed Spark job instead of a driver thread pool.
    */
  private val DistributedHarvestThreshold = 64

  /** Newest committed snapshot, if any commit exists. */
  def currentSnapshot(root: String,
      store: CommitStore = HardlinkCommitStore): Option[Snapshot] = {
    val versions = store.listVersions(root)
    if (versions.isEmpty) None
    else Some(readManifest(root, versions.max, store))
  }

  def currentVersion(root: String,
      store: CommitStore = HardlinkCommitStore): Option[Long] =
    currentSnapshot(root, store).map(_.version)

  private def readManifest(root: String, v: Long,
      store: CommitStore): Snapshot = {
    val lines = store.readBody(root, v).linesIterator.toSeq
    val partitionCols = lines.head.split("=", 2)(1) match {
      case "" => Nil
      case s => s.split(",").toSeq
    }
    // optional headers (absent on older manifests): schema=, kind=
    var rest = lines.tail
    var schema: Option[org.apache.spark.sql.types.StructType] = None
    var kind = "write"
    var constraints = Map.empty[String, String]
    var ts: Option[Long] = None
    var blooms = Map.empty[String, Map[String, BloomIndex.Ref]]
    var colMap = Map.empty[String, String]
    var dropped = Set.empty[String]
    var generated = Map.empty[String, String]
    var txns = Map.empty[String, Long]
    var headers = true
    while (headers) rest match {
      case h +: tl if h.startsWith("schema=") =>
        schema = Some(org.apache.spark.sql.types.DataType
          .fromJson(h.drop("schema=".length))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        rest = tl
      case h +: tl if h.startsWith("kind=") =>
        kind = h.drop("kind=".length); rest = tl
      case h +: tl if h.startsWith("constraint=") =>
        val body = h.drop("constraint=".length)
        val i = body.indexOf(':')
        constraints += body.take(i) -> body.drop(i + 1)
        rest = tl
      case h +: tl if h.startsWith("ts=") =>
        ts = h.drop("ts=".length).toLongOption; rest = tl
      case h +: tl if h.startsWith("bloom=") =>
        // bloom=<col>\t<sidecar path>\t<file>
        h.drop("bloom=".length).split("\t", 3) match {
          case Array(c, p, f) =>
            blooms += f -> (blooms.getOrElse(f, Map.empty) +
              (c -> BloomIndex.Ref(p)))
          case _ => ()
        }
        rest = tl
      case h +: tl if h.startsWith("colmap=") =>
        // colmap=<logical>\t<physical>
        h.drop("colmap=".length).split("\t", 2) match {
          case Array(l, p) => colMap += l -> p
          case _ => ()
        }
        rest = tl
      case h +: tl if h.startsWith("dropped=") =>
        dropped += h.drop("dropped=".length)
        rest = tl
      case h +: tl if h.startsWith("generated=") =>
        // generated=<col>\t<expr>
        h.drop("generated=".length).split("\t", 2) match {
          case Array(c, e) => generated += c -> e
          case _ => ()
        }
        rest = tl
      case h +: tl if h.startsWith("txn=") =>
        // txn=<appId>\t<version>
        h.drop("txn=".length).split("\t", 2) match {
          case Array(a, v) => v.toLongOption.foreach(txns += a -> _)
          case _ => ()
        }
        rest = tl
      case _ => headers = false
    }
    val fileLines = rest
    // part \t file [\t statsJson [\t dvField]] — fields 3/4 optional
    // (pre-stats and pre-DV manifests parse unchanged); a file with a
    // deletion vector but no stats writes an EMPTY third field so the
    // dv field keeps its position. dvField = "dv:<n>:<p1>[,<p2>...]"
    val parsed = fileLines.filter(_.nonEmpty).map { l =>
      l.split("\t", 4) match {
        case Array(part, file) =>
          (part, file, None, None)
        case Array(part, file, json) =>
          (part, file, LakeStats.fromJson(json), None)
        case Array(part, file, json, dvField) =>
          val dv = dvField.split(":", 3) match {
            case Array("dv", n, paths) =>
              Some(DvRef(paths.split(",").toSeq, n.toLong))
            case _ => None
          }
          (part, file,
            if (json.isEmpty) None else LakeStats.fromJson(json), dv)
      }
    }
    val files = parsed.groupBy(_._1)
      .map { case (p, fs) => p -> fs.map(_._2) }
    val stats = parsed.iterator
      .flatMap { case (_, f, st, _) => st.map(f -> _) }.toMap
    val dvs = parsed.iterator
      .flatMap { case (_, f, _, dv) => dv.map(f -> _) }.toMap
    Snapshot(v, partitionCols, files, schema, kind, stats, constraints,
      ts, dvs, blooms, colMap, dropped, generated, txns)
  }

  /** Lossless widenings the parquet read path upcasts natively
    * (Spark 4.x vectorized reader: int32 pages read as long, float as
    * double — Delta's "type widening" table feature): the merged
    * column takes the WIDER side, old files keep their narrow pages,
    * and every read sees the wide type. Anything else is a rewrite,
    * not an evolution. Returns the widened type when (a, b) are
    * compatible.
    */
  private[graft] def widenType(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    val intRank: Map[DataType, Int] =
      Map(ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
    if (a == b) Some(a)
    else if (intRank.contains(a) && intRank.contains(b))
      Some(if (intRank(a) >= intRank(b)) a else b)
    else if ((a == FloatType && b == DoubleType) ||
        (a == DoubleType && b == FloatType)) Some(DoubleType)
    else (a, b) match {
      // containers: recurse on elements, union nullability (a frame
      // whose array<float> came from an Encoder and one read from
      // parquet differ only in containsNull — the same column)
      case (ArrayType(e1, n1), ArrayType(e2, n2)) =>
        widenType(e1, e2).map(ArrayType(_, n1 || n2))
      case (MapType(k1, v1, n1), MapType(k2, v2, n2)) =>
        for { k <- widenType(k1, k2); v <- widenType(v1, v2) }
          yield MapType(k, v, n1 || n2)
      case (StructType(f1), StructType(f2))
          if f1.map(_.name).sameElements(f2.map(_.name)) =>
        val widened = f1.zip(f2).map { case (x, y) =>
          widenType(x.dataType, y.dataType).map(t =>
            x.copy(dataType = t,
              nullable = x.nullable || y.nullable))
        }
        if (widened.forall(_.isDefined))
          Some(StructType(widened.map(_.get)))
        else None
      case _ => None
    }
  }

  /** The committed schema after applying `batch` on top of `base`:
    * common columns must keep their type or WIDEN losslessly
    * ([[widenType]] — any other change is a table REWRITE, refused
    * loudly), columns on one side only become nullable (some
    * committed files lack them), new columns append in batch order.
    */
  private[graft] def mergeSchemas(
      base: org.apache.spark.sql.types.StructType,
      add: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    // Spark resolves column names case-insensitively by default
    // (spark.sql.caseSensitive=false), so the committed schema must
    // match the same way: a batch's 'ID' against a committed 'id' is
    // the SAME column, not a new one — matching case-sensitively here
    // would append a duplicate and the snapshot would read ambiguous.
    // A case-ONLY rename is refused loudly, like a type change.
    def norm(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    val baseNames = base.fieldNames.map(norm).toSet
    val merged = base.fields.map { f =>
      add.fields.find(g => norm(g.name) == norm(f.name)) match {
        case Some(g) =>
          require(g.name == f.name,
            s"schema evolution cannot rename column '${f.name}' to " +
              s"'${g.name}': case-insensitive resolution makes them one " +
              "column; rewrite the table to change the case")
          val widened = widenType(f.dataType, g.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"schema evolution cannot change column '${f.name}' from " +
                s"${f.dataType.simpleString} to " +
                s"${g.dataType.simpleString}; only lossless widening " +
                "(byte/short/int/long chain, float->double) evolves — " +
                "rewrite the table instead"))
          f.copy(dataType = widened,
            nullable = f.nullable || g.nullable)
        case None => f.copy(nullable = true)
      }
    } ++ add.fields.filterNot(f => baseNames(norm(f.name)))
      .map(_.copy(nullable = true))
    org.apache.spark.sql.types.StructType(merged)
  }

  /** [[stageFiles]] output: partition-relative-dir -> new file
    * relative paths, plus each file's footer-harvested zone map.
    */
  private[graft] final case class Staged(
      files: Map[String, Seq[String]],
      stats: Map[String, LakeStats.FileStats]) {
    def keySet: Set[String] = files.keySet
  }

  /** Stage `batch` and move its files into the data plane with
    * commit-unique names — VISIBLE TO NO READER yet (readers only
    * follow manifests). Returns partition-relative-dir -> new file
    * relative paths plus per-file stats ([[LakeStats.collect]] over
    * the just-written footers — metadata-only, no data re-read).
    * Exposed package-private so the crash-recovery spec can create
    * exactly the state a killed writer leaves.
    */
  /** Parquet-bytes target for AUTO file sizing (`filesPerPartition
    * = 0`) and the in-memory→parquet compression guess the estimate
    * divides by (plan statistics report uncompressed widths).
    */
  private[graft] val AutoTargetFileBytes: Long = 128L << 20
  private val AutoCompressionGuess = 3L
  private val AutoMaxFiles = 256

  private[graft] def stageFiles(batch: DataFrame, root: String,
      partitionCols: Seq[String], filesPerPartition: Int,
      // false = the caller already distributed/sorted the frame for
      // file layout (clustered compaction's range partitioning) and
      // the default partition-count shuffle must not destroy it
      distribute: Boolean = true,
      // column mapping of the snapshot being written against: staged
      // parquet carries PHYSICAL column names, so files written after
      // a rename stay byte-compatible with the ones written before it
      colMap: Map[String, String] = Map.empty): Staged = {
    val commitId = UUID.randomUUID().toString.take(12)
    val staging = Paths.get(root, "_staging", commitId)
    val physical = colMap.foldLeft(batch) { case (d, (l, p)) =>
      if (l != p && d.columns.contains(l)) {
        // the physical slot belongs to the renamed column — a batch
        // carrying BOTH would silently interleave two columns' bytes
        require(!d.columns.contains(p),
          s"cannot stage column '$p': it is the physical storage of " +
            s"renamed column '$l'; rewrite the table to reuse the name")
        d.withColumnRenamed(l, p)
      } else d
    }
    // AUTO file sizing (Delta's optimized-write role, the planner's
    // half): filesPerPartition = 0 sizes the file count from the
    // optimizer's byte estimate so a 10 GB batch lands as ~128 MB
    // files and a 10 KB batch as ONE — the write-side hygiene that
    // keeps compactSmall a backlog sweep instead of a treadmill.
    // The estimate is the logical plan's sizeInBytes (uncompressed
    // widths — divided by a 3x parquet compression guess); it is a
    // SIZING heuristic, never a correctness input. Unpartitioned
    // writes only: a per-partition-dir auto count would need
    // per-partition sizes the plan cannot see — callers of
    // partitioned tables keep the explicit knob.
    val effectiveFiles =
      if (filesPerPartition > 0) filesPerPartition
      else {
        require(partitionCols.isEmpty,
          "AUTO file sizing (filesPerPartition = 0) sizes whole-batch " +
            "writes; partitioned tables take an explicit count")
        val est =
          physical.queryExecution.optimizedPlan.stats.sizeInBytes /
            AutoCompressionGuess
        val n = (est + AutoTargetFileBytes - 1) / AutoTargetFileBytes
        n.max(1).min(AutoMaxFiles).toInt
      }
    val distributed =
      if (!distribute) physical
      else if (partitionCols.nonEmpty)
        PartitionedLake.distributeForWrite(physical, partitionCols,
          effectiveFiles)
      else physical.repartition(effectiveFiles)
    // The staging write runs with AQE off: its exchange is an EXPLICIT
    // repartition chosen for file-count control, so AQE has nothing to
    // improve — it only splits shuffle and write into two sequential
    // jobs (doubling the per-commit scheduling cost that dominates
    // small incremental upserts) and its partition coalescing could
    // silently defeat filesPerPartition. The toggle is REFCOUNTED per
    // session ([[AqeScope]]): concurrent writers nest instead of the
    // second restoring the first's temporary 'false' and leaving AQE
    // off for the session's lifetime. A concurrent query during the
    // window loses AQE for that window (harmless — plans stay
    // correct).
    val spark = batch.sparkSession
    AqeScope.enter(spark)
    try {
      val writer = distributed.write.mode("overwrite")
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
       else writer).parquet(staging.toString)
    } finally AqeScope.exit(spark)
    // move staged parquet into data/<partition>/<commit>-<file>
    val staged = {
      val w = Files.walk(staging)
      try w.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toSeq
      finally w.close()
    }
    val out = staged.map { p =>
      val rel = staging.relativize(p) // day=.../part-00000-....parquet
      val partRel = Option(rel.getParent).map(_.toString).getOrElse("")
      val destRel = Paths.get(partRel, s"$commitId-${rel.getFileName}")
      val dest = dataDir(root).resolve(destRel)
      Files.createDirectories(dest.getParent)
      Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
      (partRel, Paths.get("data").resolve(destRel).toString, dest)
    }
    deleteRecursively(staging)
    // Zone-map harvest: one footer read per staged file. Small
    // commits (the incremental-upsert steady state) use a bounded
    // driver pool — no job scheduling overhead on the hot path; a
    // LARGE commit (backfill/compaction staging thousands of files)
    // distributes the footer reads as one Spark job instead — 100k
    // driver-serial metadata round-trips would add minutes to the
    // commit, where the cluster absorbs them in one short stage. Data
    // columns only — partition values live in the dir name and prune
    // via [[LakeStats.PartVal]].
    val statsSchema = org.apache.spark.sql.types.StructType(
      batch.schema.filterNot(f => partitionCols.contains(f.name)))
    val hconf = spark.sparkContext.hadoopConfiguration
    val stats: Map[String, LakeStats.FileStats] =
      if (out.size > DistributedHarvestThreshold) {
        val ser =
          new org.apache.spark.util.SerializableConfiguration(hconf)
        val pairs = out.map { case (_, relPath, dest) =>
          (relPath, dest.toString)
        }
        val slices = math.min(pairs.size,
          math.max(1, spark.sparkContext.defaultParallelism * 2))
        spark.sparkContext.parallelize(pairs, slices)
          .flatMap { case (rel, abs) =>
            LakeStats.collect(ser.value,
              new org.apache.hadoop.fs.Path(abs), statsSchema)
              .map(rel -> _)
          }.collect().toMap
      } else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, math.max(1, out.size)))
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        try {
          val fs = out.map { case (_, relPath, dest) =>
            Future(LakeStats.collect(hconf,
              new org.apache.hadoop.fs.Path(dest.toString), statsSchema)
              .map(relPath -> _))
          }
          Await.result(Future.sequence(fs), Duration.Inf).flatten.toMap
        } finally pool.shutdown()
      }
    Staged(
      out.groupBy(_._1).map { case (p, fs) => p -> fs.map(_._2) },
      stats)
  }

  /** Publish a new manifest = previous snapshot with `touched`
    * partitions replaced by `newFiles`. The commit point is ONE
    * atomic claim through the [[CommitStore]]; on a version race the
    * loser recomputes against the winner's snapshot and retries.
    * Exposed package-private for the spec's interleaving tests.
    */
  private[graft] def commitReplacing(root: String, touched: Set[String],
      newFiles: Map[String, Seq[String]], partitionCols: Seq[String],
      expectedBase: Option[Snapshot] = None,
      batchSchema: Option[org.apache.spark.sql.types.StructType] = None,
      store: CommitStore = HardlinkCommitStore,
      kind: String = "write",
      newStats: Map[String, LakeStats.FileStats] = Map.empty,
      // replace EVERY partition of whatever snapshot this commit
      // lands on — recomputed inside the retry loop, so an overwrite
      // that races a concurrent upsert still clears the partition the
      // racer added (a pre-computed `touched` set would let it
      // survive a "whole table" overwrite)
      replaceAll: Boolean = false,
      // FILE-level removals (copy-on-write row rewrites: deleteWhere/
      // merge): exactly these root-relative files drop out of their
      // partitions' lists while the partitions otherwise survive.
      // Every removed file must still be referenced by the snapshot
      // the commit lands on — a concurrent compaction or rewrite that
      // already replaced one would make this commit resurrect its old
      // rows (the rewritten survivors duplicate what the winner kept)
      // — else ConcurrentModificationException, and the caller
      // re-derives against the new snapshot
      removeFiles: Set[String] = Set.empty,
      // None = inherit the previous snapshot's CHECK constraints;
      // Some = this commit SETS the table's constraint map (the
      // add/dropConstraint metadata commits)
      newConstraints: Option[Map[String, String]] = None,
      // true = batchSchema is committed AS-IS instead of merged with
      // the previous snapshot's (restore: rolling back must shed a
      // column added after the target version, where the evolution
      // merge would keep it)
      schemaOverride: Boolean = false,
      // deletion-vector updates: file -> new DvRef to SET on that
      // file's line (deleteWhereDV). Keys must still be present in
      // the snapshot the commit lands on, with the SAME DvRef the
      // caller derived from (expectedBase) — a concurrent rewrite or
      // dv commit on one of them means the caller's position set was
      // computed against stale data
      newDvs: Map[String, DvRef] = Map.empty,
      // Some = this commit SETS the table's whole dv map (restore
      // rolls dv state back with the file list; clone absolutizes);
      // None = carry the previous snapshot's entries for surviving
      // files, overlaid with newDvs
      dvOverride: Option[Map[String, DvRef]] = None,
      // bloom-index refs: same carry/overlay/override contract as
      // dvs — entries for files absent from the committed file list
      // are shed by construction (a rewritten file's bloom no longer
      // bounds its replacement's keys)
      newBlooms: Map[String, Map[String, BloomIndex.Ref]] = Map.empty,
      bloomOverride: Option[Map[String, Map[String, BloomIndex.Ref]]] =
        None,
      // column mapping: Some = this commit SETS the logical->physical
      // map (rename/drop/restore/clone); None = inherit
      newColMap: Option[Map[String, String]] = None,
      // dropped-column tombstones (physical names): same contract
      newDropped: Option[Set[String]] = None,
      // generated-column expressions: same Some-sets/None-inherits
      newGenerated: Option[Map[String, String]] = None,
      // writer-transaction watermarks to RECORD with this commit
      // (appId -> version); merged over the previous snapshot's map —
      // a txn entry never disappears, only advances
      newTxns: Map[String, Long] = Map.empty): Long = {
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val prev = currentSnapshot(root, store)
      prev.foreach { s =>
        require(s.partitionCols == partitionCols,
          s"partitioning mismatch: table has ${s.partitionCols}, " +
            s"upsert uses $partitionCols")
      }
      // optimistic concurrency for read-modify-write commits
      // (compaction): the result was DERIVED from expectedBase, so if
      // any partition we are about to replace changed since, merging
      // would resurrect stale data — abort instead. Blind upserts
      // (last-writer-wins by design) pass None and never conflict.
      for (base <- expectedBase; cur <- prev; p <- touched)
        if (cur.files.getOrElse(p, Nil) != base.files.getOrElse(p, Nil))
          throw new java.util.ConcurrentModificationException(
            s"partition $p changed (v${base.version} -> v${cur.version}) " +
              "since this rewrite read it; re-run against the new snapshot")
      // deletion-vector conflicts: a rewrite/dv commit derived its row
      // set from expectedBase's dv state — if a concurrent dv commit
      // changed any file it read (rewrites: removeFiles + touched
      // partitions; dv commits: newDvs keys), committing would
      // resurrect the concurrently-deleted rows (or drop the
      // concurrent writer's positions)
      for (base <- expectedBase; cur <- prev) {
        val watched = newDvs.keySet ++ removeFiles ++
          touched.flatMap(p => base.files.getOrElse(p, Nil))
        for (f <- watched if cur.dvs.get(f) != base.dvs.get(f))
          throw new java.util.ConcurrentModificationException(
            s"deletion vector of $f changed (v${base.version} -> " +
              s"v${cur.version}) since this rewrite read it; re-run " +
              "against the new snapshot")
      }
      if (newDvs.nonEmpty) {
        val present =
          prev.map(_.files.values.flatten.toSet).getOrElse(Set.empty)
        val gone = newDvs.keySet -- present
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"${gone.size} file(s) this dv commit read were replaced " +
              s"since (e.g. ${gone.head}); re-run against the new snapshot")
      }
      val version = prev.map(_.version + 1).getOrElse(1L)
      val effectiveTouched =
        if (replaceAll) prev.map(_.files.keySet).getOrElse(Set.empty) ++
          newFiles.keySet
        else touched
      // this commit's schema: previous schema evolved by the batch's
      // (see [[mergeSchemas]]); recomputed INSIDE the retry loop so a
      // lost race against a schema-changing winner still merges right
      val schema =
        if (schemaOverride) batchSchema
        else (prev.flatMap(_.schema), batchSchema) match {
          case (Some(p), Some(b)) => Some(mergeSchemas(p, b))
          case (p, b) => b.orElse(p)
        }
      val colMap = newColMap.getOrElse(
        prev.map(_.colMap).getOrElse(Map.empty))
      val droppedSet = newDropped.getOrElse(
        prev.map(_.dropped).getOrElse(Set.empty))
      // column-mapping guards on columns NEW in this commit: their
      // physical name (their own name) must not resurrect a dropped
      // column's bytes, nor collide with an existing column's mapped
      // physical slot (e.g. re-adding 'a' after RENAME a TO b — the
      // old files' physical 'a' is b's storage)
      if (newColMap.isEmpty)
        for (prevSch <- prev.flatMap(_.schema); sch <- schema) {
          def nrm(s: String) = s.toLowerCase(java.util.Locale.ROOT)
          val prevNames = prevSch.fieldNames.map(nrm).toSet
          val physInUse = prevSch.fieldNames
            .map(n => nrm(colMap.getOrElse(n, n))).toSet
          for (n <- sch.fieldNames if !prevNames(nrm(n))) {
            if (droppedSet.exists(d => nrm(d) == nrm(n)))
              throw new IllegalArgumentException(
                s"cannot add column '$n': a dropped column's data " +
                  "still lives under that physical name in committed " +
                  "files and would silently resurrect; rewrite the " +
                  "table to reuse the name")
            if (physInUse(nrm(n)))
              throw new IllegalArgumentException(
                s"cannot add column '$n': the physical slot '$n' is " +
                  "the storage of a renamed column; rewrite the table " +
                  "to reuse the name")
          }
        }
      if (removeFiles.nonEmpty) {
        val present =
          prev.map(_.files.values.flatten.toSet).getOrElse(Set.empty)
        val gone = removeFiles -- present
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"${gone.size} file(s) this rewrite read were replaced " +
              s"since (e.g. ${gone.head}); re-run against the new snapshot")
      }
      // drop the replaced partitions, then UNION per-partition file
      // lists — so touched = ∅ is an append commit (new files join
      // the survivors instead of clobbering their partition entry)
      val base0 = prev.map(_.files).getOrElse(Map.empty) -- effectiveTouched
      val base =
        if (removeFiles.isEmpty) base0
        else base0.map { case (p, fs) =>
          p -> fs.filterNot(removeFiles)
        }.filter(_._2.nonEmpty)
      val merged = (base.keySet ++ newFiles.keySet).iterator.map { k =>
        k -> (base.getOrElse(k, Nil) ++ newFiles.getOrElse(k, Nil))
      }.toMap
      val body = new StringBuilder(s"partition_cols=${partitionCols.mkString(",")}\n")
      schema.foreach(s => body.append("schema=").append(s.json).append('\n'))
      if (kind != "write") body.append("kind=").append(kind).append('\n')
      val constraints = newConstraints.getOrElse(
        prev.map(_.constraints).getOrElse(Map.empty))
      for ((n, e) <- constraints.toSeq.sortBy(_._1))
        body.append("constraint=").append(n).append(':')
          .append(e).append('\n')
      body.append("ts=").append(System.currentTimeMillis()).append('\n')
      // bloom-index headers: only for files this commit still lists —
      // an entry whose file was rewritten/removed must not survive
      // (its bits say nothing about the replacement file's keys)
      val mergedFiles = merged.values.flatten.toSet
      val bloomByFile = bloomOverride.getOrElse(
        prev.map(_.blooms).getOrElse(Map.empty) ++ newBlooms)
      for ((f, cs) <- bloomByFile.toSeq.sortBy(_._1) if mergedFiles(f);
           (c, ref) <- cs.toSeq.sortBy(_._1))
        body.append("bloom=").append(c).append('\t')
          .append(ref.path).append('\t').append(f).append('\n')
      for ((l, p) <- colMap.toSeq.sortBy(_._1))
        body.append("colmap=").append(l).append('\t').append(p)
          .append('\n')
      for (d <- droppedSet.toSeq.sorted)
        body.append("dropped=").append(d).append('\n')
      val generatedMap = newGenerated.getOrElse(
        prev.map(_.generated).getOrElse(Map.empty))
      for ((c, e) <- generatedMap.toSeq.sortBy(_._1))
        body.append("generated=").append(c).append('\t').append(e)
          .append('\n')
      val txnMap = prev.map(_.txns).getOrElse(Map.empty) ++ newTxns
      for ((a, v) <- txnMap.toSeq.sortBy(_._1))
        body.append("txn=").append(a).append('\t').append(v)
          .append('\n')
      // surviving files keep the stats their own commit harvested;
      // new files bring theirs — a file's zone map never changes
      // after the immutable file is written
      val statsByFile = prev.map(_.stats).getOrElse(Map.empty) ++ newStats
      // dv refs ride the file line: surviving files keep theirs,
      // newDvs overlays (a dv commit extends a file's chain), and a
      // file absent from `merged` (rewritten/removed) sheds its entry
      // by construction
      val dvByFile = dvOverride.getOrElse(
        prev.map(_.dvs).getOrElse(Map.empty) ++ newDvs)
      for ((p, fs) <- merged.toSeq.sortBy(_._1); f <- fs.sorted) {
        body.append(p).append('\t').append(f)
        val st = statsByFile.get(f)
        st.foreach(s => body.append('\t').append(LakeStats.toJson(s)))
        dvByFile.get(f).foreach { dv =>
          if (st.isEmpty) body.append('\t') // keep the dv field fourth
          body.append('\t').append("dv:").append(dv.n).append(':')
            .append(dv.paths.mkString(","))
        }
        body.append('\n')
      }
      if (store.tryCommit(root, version, body.toString))
        return version
      // else: lost the race — merge against the winner and retry
    }
    throw new IllegalStateException(
      s"commit contention: gave up after $attempts attempts")
  }

  /** Refuse `batch` if it violates any of the table's CHECK
    * constraints, BEFORE anything is staged. SQL CHECK semantics: a
    * row violates only when the predicate evaluates FALSE — null
    * passes. All constraints are checked in ONE aggregation job; a
    * table without constraints pays nothing (no job at all).
    */
  /** Materialize ABSENT generated columns on a write batch (the
    * provided ones are validated instead — see [[prepareBatch]]).
    */
  private def applyGenerated(batch: DataFrame,
      gen: Map[String, String]): DataFrame =
    gen.toSeq.sortBy(_._1).foldLeft(batch) { case (d, (g, e)) =>
      if (d.columns.exists(_.equalsIgnoreCase(g))) d
      else d.withColumn(g, org.apache.spark.sql.functions.expr(e))
    }

  /** (message, per-row violation condition) for each generated column
    * the batch PROVIDES: the value must null-safe-equal its
    * expression (Delta's GENERATED ALWAYS AS write contract).
    */
  private def generatedViolations(batch: DataFrame,
      gen: Map[String, String])
      : Seq[(String, org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.functions.{col, expr, not}
    gen.toSeq.sortBy(_._1).collect {
      case (g, e) if batch.columns.exists(_.equalsIgnoreCase(g)) =>
        (s"generated column '$g' does not match its expression ($e)",
          not(col(g) <=> expr(e)))
    }
  }

  /** Pre-write batch preparation, ONE snapshot read + at most ONE
    * aggregation job: absent generated columns materialize from their
    * expressions (so a generated partition column costs writers
    * nothing), then CHECK constraints and provided-generated-column
    * equality validate together over the completed frame. Returns the
    * frame to stage; tables with neither feature pay nothing.
    */
  private def prepareBatch(batch: DataFrame, root: String,
      store: CommitStore): DataFrame = {
    val snap = currentSnapshot(root, store)
    val gen = snap.map(_.generated).getOrElse(Map.empty)
    val cons = snap.map(_.constraints).getOrElse(Map.empty)
    val genViol = generatedViolations(batch, gen)
    val out = applyGenerated(batch, gen)
    if (cons.isEmpty && genViol.isEmpty) return out
    import org.apache.spark.sql.functions.{coalesce, expr, lit, sum, when}
    val checks: Seq[(String, org.apache.spark.sql.Column)] =
      cons.toSeq.sortBy(_._1).map { case (n, e) =>
        (s"CHECK constraint '$n' ($e)",
          coalesce(expr(e), lit(true)) === lit(false))
      } ++ genViol
    val aggs = checks.zipWithIndex.map { case ((_, cond), i) =>
      sum(when(cond, 1L).otherwise(0L)).as(s"c$i")
    }
    val row = out.agg(aggs.head, aggs.tail: _*).head()
    checks.zipWithIndex.foreach { case ((msg, _), i) =>
      val bad = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (bad > 0)
        throw new IllegalStateException(
          s"$msg violated by $bad row(s) of " +
            "this batch; nothing was committed")
    }
    out
  }

  /** ADD CONSTRAINT (Delta's ALTER TABLE … ADD CONSTRAINT … CHECK):
    * existing table data must already satisfy the predicate (refused
    * loudly otherwise — a constraint that the table violates is a
    * lie); the constraint then rides every manifest and every future
    * write commit validates its batch against it. Metadata-only
    * commit: no data moves. Returns the committed version.
    */
  def addConstraint(spark: SparkSession, root: String, name: String,
      predicate: String,
      store: CommitStore = HardlinkCommitStore): Long = {
    require(name.nonEmpty && !name.contains(':') && !name.contains('\n'),
      s"constraint name must be non-empty without ':' or newline: $name")
    require(!predicate.contains('\n'),
      "constraint predicate must be single-line SQL")
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    val bad = readSnapshot(spark, root, snap)
      .filter(coalesce(expr(predicate), lit(true)) === lit(false))
      .count()
    if (bad > 0)
      throw new IllegalStateException(
        s"cannot add CHECK constraint '$name' ($predicate): $bad " +
          "existing row(s) violate it")
    commitReplacing(root, Set.empty, Map.empty, snap.partitionCols,
      store = store, kind = "constraint",
      newConstraints = Some(snap.constraints + (name -> predicate)))
  }

  /** DROP CONSTRAINT — metadata-only commit removing the named CHECK
    * constraint. Unknown names are refused (a typo silently "passing"
    * would leave the real constraint enforced when the caller
    * believes it gone).
    */
  def dropConstraint(root: String, name: String,
      store: CommitStore = HardlinkCommitStore): Long = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    require(snap.constraints.contains(name),
      s"no CHECK constraint named '$name' " +
        s"(table has: ${snap.constraints.keys.toSeq.sorted.mkString(", ")})")
    commitReplacing(root, Set.empty, Map.empty, snap.partitionCols,
      store = store, kind = "constraint",
      newConstraints = Some(snap.constraints - name))
  }

  /** Does SQL text `e` reference column `name`? Conservative
    * word-boundary match — used to refuse renaming/dropping a column
    * a CHECK constraint still reads (Delta rewrites the expressions;
    * refusing loudly is the honest smaller contract).
    */
  private def mentionsColumn(e: String, name: String): Boolean =
    ("(?i)(?<![A-Za-z0-9_])" +
      java.util.regex.Pattern.quote(name) +
      "(?![A-Za-z0-9_])").r.findFirstIn(e).isDefined

  /** Declare `name` GENERATED ALWAYS AS `exprSql` (Delta's generated
    * columns — pipeline.py-style month/year partition derivations
    * belong to the TABLE, not to every writer): future batches that
    * omit the column get it computed before staging (including a
    * generated PARTITION column — the classic use), batches that
    * provide it are validated cell-by-cell in the same one-pass
    * aggregation as the CHECK constraints, and merge/expectation
    * ingest honor the same contract. If the column already exists,
    * current data must already satisfy the expression (refused loudly
    * otherwise). Metadata-only commit (`kind=schema`).
    */
  def setGeneratedColumn(spark: SparkSession, root: String,
      name: String, exprSql: String,
      store: CommitStore = HardlinkCommitStore): Long = {
    require(!exprSql.contains('\n') && !exprSql.contains('\t'),
      "generation expression must be single-line SQL without tabs")
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    // parse errors surface here, not at some future write
    org.apache.spark.sql.functions.expr(exprSql)
    val schema = snap.schema.getOrElse(throw new IllegalStateException(
      s"setGeneratedColumn: $root has no committed schema"))
    if (schema.fieldNames.exists(_.equalsIgnoreCase(name))) {
      import org.apache.spark.sql.functions.{col, expr, not}
      val bad = readSnapshot(spark, root, snap)
        .filter(not(col(name) <=> expr(exprSql))).count()
      if (bad > 0)
        throw new IllegalStateException(
          s"cannot declare '$name' generated as ($exprSql): $bad " +
            "existing row(s) contradict the expression")
    }
    commitReplacing(root, Set.empty, Map.empty, snap.partitionCols,
      store = store, kind = "schema",
      newGenerated = Some(snap.generated + (name -> exprSql)))
  }

  /** Remove a generation declaration — the column stays, now plain. */
  def dropGeneratedColumn(root: String, name: String,
      store: CommitStore = HardlinkCommitStore): Long = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    require(snap.generated.contains(name),
      s"no generated column '$name' " +
        s"(table has: ${snap.generated.keys.toSeq.sorted.mkString(", ")})")
    commitReplacing(root, Set.empty, Map.empty, snap.partitionCols,
      store = store, kind = "schema",
      newGenerated = Some(snap.generated - name))
  }

  /** RENAME COLUMN without rewriting a byte (Delta's column mapping,
    * mode=name): a metadata-only `kind=schema` commit renames the
    * LOGICAL column and records logical->physical in the manifest —
    * files keep their physical pages, readers alias physical->logical
    * in the one read ([[readSubset]]), writers stage logical batches
    * under physical names ([[stageFiles]]), and zone-map pruning
    * translates predicates ([[LakeStats.survivors]]). Time travel to
    * a pre-rename version sees the old name (each snapshot carries
    * its own mapping); restore rolls the mapping back with the files.
    * Refused for: partition columns (their physical form is the
    * directory layout), columns a CHECK constraint references, and
    * columns with a bloom index (drop + rebuild under the new name).
    */
  def renameColumn(root: String, from: String, to: String,
      store: CommitStore = HardlinkCommitStore): Long = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val schema = snap.schema.getOrElse(throw new IllegalStateException(
      s"renameColumn: $root has no committed schema"))
    def nrm(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    require(schema.fieldNames.contains(from),
      s"renameColumn: no column '$from' " +
        s"(table has: ${schema.fieldNames.mkString(", ")})")
    require(!schema.fieldNames.exists(n => nrm(n) == nrm(to)),
      s"renameColumn: column '$to' already exists")
    require(!snap.partitionCols.contains(from),
      s"renameColumn: '$from' is a partition column — its physical " +
        "form is the directory layout; rewrite the table instead")
    for ((n, e) <- snap.constraints if mentionsColumn(e, from))
      throw new IllegalArgumentException(
        s"renameColumn: CHECK constraint '$n' references '$from'; " +
          "drop the constraint first")
    require(!snap.blooms.values.exists(_.contains(from)),
      s"renameColumn: a bloom index exists on '$from'; the sidecars " +
        "key it by name — drop the index (rewrite files or vacuum) " +
        "and re-create it under the new name")
    require(!snap.generated.contains(from),
      s"renameColumn: '$from' is a generated column; drop the " +
        "generation declaration first")
    for ((g, e) <- snap.generated if mentionsColumn(e, from))
      throw new IllegalArgumentException(
        s"renameColumn: generated column '$g' derives from '$from'; " +
          "drop the generation declaration first")
    // the physical slot does not move; also refuse if `to`'s physical
    // (= itself, were it added later) is tombstoned — harmless here,
    // but keeps the physical namespace unambiguous
    require(!snap.dropped.exists(d => nrm(d) == nrm(to)),
      s"renameColumn: '$to' is a dropped column's physical name")
    val phys = physicalOf(snap, from)
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.fields.map(f =>
        if (f.name == from) f.copy(name = to) else f))
    // renaming BACK to the physical name is the identity — drop the
    // entry instead of recording `v -> v` (which would trip the
    // stage-time physical-slot guard and clutter every manifest)
    val newMap =
      if (to == phys) snap.colMap - from
      else snap.colMap - from + (to -> phys)
    commitReplacing(root, Set.empty, Map.empty, snap.partitionCols,
      batchSchema = Some(newSchema), schemaOverride = true,
      store = store, kind = "schema",
      newColMap = Some(newMap))
  }

  /** DROP COLUMN without rewriting a byte: metadata-only — the column
    * leaves the schema and mapping, its physical name is TOMBSTONED
    * (re-adding the name is refused: committed files still hold the
    * old bytes, and a re-add would silently resurrect them — rewrite
    * the table to truly reclaim the name), and any bloom entries on
    * it are shed. Time travel before the drop still reads it.
    */
  def dropColumn(root: String, name: String,
      store: CommitStore = HardlinkCommitStore): Long = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val schema = snap.schema.getOrElse(throw new IllegalStateException(
      s"dropColumn: $root has no committed schema"))
    require(schema.fieldNames.contains(name),
      s"dropColumn: no column '$name' " +
        s"(table has: ${schema.fieldNames.mkString(", ")})")
    require(!snap.partitionCols.contains(name),
      s"dropColumn: '$name' is a partition column")
    require(schema.fields.length > snap.partitionCols.length + 1,
      s"dropColumn: '$name' is the table's last data column")
    for ((n, e) <- snap.constraints if mentionsColumn(e, name))
      throw new IllegalArgumentException(
        s"dropColumn: CHECK constraint '$n' references '$name'; " +
          "drop the constraint first")
    for ((g, e) <- snap.generated
         if g != name && mentionsColumn(e, name))
      throw new IllegalArgumentException(
        s"dropColumn: generated column '$g' derives from '$name'; " +
          "drop the generation declaration first")
    val phys = physicalOf(snap, name)
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == name))
    val bloomsAfter = snap.blooms
      .map { case (f, cs) => f -> (cs - name) }
      .filter(_._2.nonEmpty)
    commitReplacing(root, Set.empty, Map.empty, snap.partitionCols,
      batchSchema = Some(newSchema), schemaOverride = true,
      store = store, kind = "schema",
      newColMap = Some(snap.colMap - name),
      newDropped = Some(snap.dropped + phys),
      bloomOverride = Some(bloomsAfter),
      newGenerated = Some(snap.generated - name))
  }

  /** Expectation-split ingest (the Delta-Live-Tables
    * `expect_or_drop` + quarantine pattern, against this table's
    * CHECK constraints): rows satisfying every constraint append to
    * the table; violating rows append to a QUARANTINE lake with a
    * `_violated` column naming the failed constraints — nothing is
    * refused, nothing is silently dropped, and the violation
    * evidence is queryable (triage, reprocess, alert thresholds).
    * [[append]]'s hard-refusal contract stays for tables where a bad
    * row must stop the pipeline; this is the keep-flowing form for
    * bulk ingest where a poisoned minority must not block the batch.
    *
    * One evaluation of the batch feeds both sides (pinned), each
    * side committing through the normal atomic path; with no
    * constraints the whole batch appends and the quarantine is
    * untouched. Returns (table version, good rows, quarantined
    * rows); the table version is the PRE-call version when every row
    * quarantined (no empty commits).
    */
  def appendExpect(batch: DataFrame, root: String,
      quarantineRoot: String, partitionCols: Seq[String] = Nil,
      filesPerPartition: Int = 1,
      store: CommitStore = HardlinkCommitStore): (Long, Long, Long) = {
    import org.apache.spark.sql.functions._
    val snapOpt = currentSnapshot(root, store)
    val cons = snapOpt.map(_.constraints).getOrElse(Map.empty)
    val gen = snapOpt.map(_.generated).getOrElse(Map.empty)
    val genViol = generatedViolations(batch, gen)
    if (cons.isEmpty && genViol.isEmpty) {
      // append() materializes absent generated columns itself
      val v = append(batch, root, partitionCols, filesPerPartition,
        store)
      return (v, -1L, 0L) // -1: not counted — no extra job was run
    }
    val ordered = cons.toSeq.sortBy(_._1)
    // one pinned evaluation serves both sides; each row's violation
    // list is computed once (SQL CHECK: only FALSE violates). A
    // PROVIDED generated column that contradicts its expression
    // quarantines the row like any other expectation failure.
    val tagged = applyGenerated(batch, gen).withColumn("_violated",
      array_compact(array(ordered.map { case (n, e) =>
        when(coalesce(expr(e), lit(true)) === lit(false), lit(n))
      } ++ gen.toSeq.sortBy(_._1).collect {
        case (g, e) if batch.columns.exists(_.equalsIgnoreCase(g)) =>
          when(not(col(g) <=> expr(e)), lit(s"generated:$g"))
      }: _*))).localCheckpoint()
    val good = tagged.filter(size(col("_violated")) === 0)
      .drop("_violated")
    val bad = tagged.filter(size(col("_violated")) > 0)
    val nBad = bad.count()
    if (nBad > 0)
      append(bad, quarantineRoot, Nil, filesPerPartition, store)
    val nGood = tagged.count() - nBad
    val v =
      if (nGood > 0)
        // the good side provably satisfies the constraints — the
        // normal append's enforcement pass re-proves it cheaply on
        // the pinned frame
        append(good, root, partitionCols, filesPerPartition, store)
      else currentVersion(root, store).getOrElse(
        throw new IllegalStateException(s"no commits at $root"))
    (v, nGood, nBad)
  }

  /** Idempotent partition upsert with a single atomic commit point:
    * exactly the partitions present in `batch` are replaced. Returns
    * the committed version.
    */
  def upsertPartitions(batch: DataFrame, root: String,
      partitionCols: Seq[String], filesPerPartition: Int = 1,
      store: CommitStore = HardlinkCommitStore): Long = {
    val prepared = prepareBatch(batch, root, store)
    val staged = stageFiles(prepared, root, partitionCols,
      filesPerPartition, colMap = currentColMap(root, store))
    commitReplacing(root, staged.keySet, staged.files, partitionCols,
      batchSchema = Some(prepared.schema), store = store,
      newStats = staged.stats)
  }

  /** Append-only commit: new files JOIN the existing partitions (no
    * partition is replaced) — the shape for immutable event/audit
    * logs where every run adds rows and history must survive.
    */
  def append(batch: DataFrame, root: String,
      partitionCols: Seq[String] = Nil, filesPerPartition: Int = 1,
      store: CommitStore = HardlinkCommitStore,
      // exactly-once replay for streaming writers: record
      // (appId -> version) with the commit; pair with [[lastTxn]] to
      // skip an already-committed micro-batch on redelivery
      txn: Option[(String, Long)] = None): Long = {
    val prepared = prepareBatch(batch, root, store)
    val staged = stageFiles(prepared, root, partitionCols,
      filesPerPartition, colMap = currentColMap(root, store))
    commitReplacing(root, Set.empty, staged.files, partitionCols,
      batchSchema = Some(prepared.schema), store = store,
      newStats = staged.stats,
      newTxns = txn.map(t => Map(t._1 -> t._2)).getOrElse(Map.empty))
  }

  /** Highest transaction version writer `appId` has committed at
    * `root` (None before its first tagged commit, or before the table
    * exists). The read half of the exactly-once streaming contract:
    * a foreachBatch writer skips `batchId <= lastTxn(...)`.
    */
  def lastTxn(root: String, appId: String,
      store: CommitStore = HardlinkCommitStore): Option[Long] =
    currentSnapshot(root, store).flatMap(_.txns.get(appId))

  /** Replace the WHOLE table contents in one commit — including any
    * partition a concurrent writer commits while this overwrite is
    * staging (the replaced set is resolved inside the commit retry
    * loop, not from a pre-staging snapshot).
    */
  def overwrite(batch: DataFrame, root: String,
      partitionCols: Seq[String] = Nil, filesPerPartition: Int = 1,
      store: CommitStore = HardlinkCommitStore): Long = {
    val prepared = prepareBatch(batch, root, store)
    val staged = stageFiles(prepared, root, partitionCols,
      filesPerPartition, colMap = currentColMap(root, store))
    commitReplacing(root, Set.empty, staged.files, partitionCols,
      batchSchema = Some(prepared.schema), store = store,
      newStats = staged.stats, replaceAll = true)
  }

  /** Read the newest committed snapshot. */
  def read(spark: SparkSession, root: String,
      store: CommitStore = HardlinkCommitStore): DataFrame =
    readSnapshot(spark, root, currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root")))

  /** Stats-pruned read: files whose manifest zone maps PROVE no row
    * can satisfy `filters` are dropped on the driver — no task, no
    * footer read, no object-store GET — and the conjunction of
    * `filters` is re-applied on the survivors, so the result is
    * always exactly `read(...).filter(filters)` regardless of how
    * much (or little) the stats could prune. Partition-directory
    * values prune the same way (equality AND ranges, typed through
    * the literal's domain). This is the manifest-level data skipping
    * a 100-TB table needs: Spark's parquet row-group pruning only
    * kicks in after opening every file's footer; here a one-month
    * predicate over years of commits plans only that month's files.
    * See [[LakeStats]] for the conservative evaluator's contract.
    */
  def scan(spark: SparkSession, root: String,
      store: CommitStore = HardlinkCommitStore)(
      filters: org.apache.spark.sql.Column*): DataFrame = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    if (filters.isEmpty) return readSnapshot(spark, root, snap)
    val exprs = filters.map(
      org.apache.spark.sql.classic.GraftExprBridge.expression)
    val zoneSurvivors = LakeStats.survivors(snap, exprs)
    // bloom-index pruning on top of the zone maps: equality/IN
    // conjuncts on indexed high-cardinality columns drop the files a
    // bloom proves the key absent from (a sidecar-sized job; only
    // file names return — see [[BloomIndex.prunable]])
    val surviving =
      if (snap.blooms.isEmpty || zoneSurvivors.isEmpty) zoneSurvivors
      else {
        val pruned =
          BloomIndex.prunable(spark, root, snap, exprs, zoneSurvivors)
        zoneSurvivors.filterNot(pruned)
      }
    val base =
      if (surviving.isEmpty)
        // every file pruned: schema-correct empty frame (partition
        // columns included) without planning a single data file
        readSnapshot(spark, root, snap).limit(0)
      else readFileSubset(spark, root, surviving, snap)
    filters.foldLeft(base)(_.filter(_))
  }

  /** A copy-on-write rewrite's outcome: the committed version (the
    * pre-rewrite version when nothing matched — no empty commit is
    * ever written), how many target rows were removed (deleted, or
    * replaced by their merge source row), and how many files were
    * rewritten to do it.
    */
  final case class Rewrite(version: Long, rowsChanged: Long,
      filesRewritten: Int)

  /** Resolve Spark's `_metadata.file_path` URIs back to the
    * snapshot's root-relative manifest paths. A collected path that
    * maps to no candidate is a protocol bug — fail loudly rather than
    * silently rewriting the wrong file set.
    */
  private def toRelative(abs: Seq[String], candidates: Seq[String],
      root: String): Seq[String] = {
    val byUri = candidates.map(f =>
      Paths.get(root).resolve(f).normalize().toUri.toString -> f).toMap
    abs.map { a =>
      // second lookup canonicalizes through Path (percent-encoding
      // differences); guarded — a non-file scheme must fall through
      // to the loud error, not an opaque FileSystemNotFound
      def canonical: Option[String] =
        scala.util.Try(
          Paths.get(new java.net.URI(a)).toUri.toString).toOption
      byUri.getOrElse(a,
        canonical.flatMap(byUri.get).getOrElse(
          throw new IllegalStateException(
            s"file $a is not among this snapshot's candidate files")))
    }
  }

  /** Re-derive-and-retry for copy-on-write rewrites: a rewrite that
    * loses to a concurrent compaction/rewrite of one of its dirty
    * files aborts with ConcurrentModificationException — correct, but
    * the caller's remedy is always "re-run against the new snapshot",
    * so deleteWhere/merge do it themselves (Delta's internal OCC
    * retry). Each attempt re-reads the snapshot and re-derives the
    * dirty set from scratch; the loser's staged files become orphans
    * (vacuum reclaims). Bounded attempts: livelock under sustained
    * compaction churn surfaces the real conflict instead of spinning.
    */
  private def retryRewrite(op: () => Rewrite): Rewrite = {
    var attempts = 0
    while (true) {
      attempts += 1
      try return op()
      catch {
        case _: java.util.ConcurrentModificationException
            if attempts < 8 =>
          // linear backoff de-synchronizes racing writers before the
          // re-derivation (each attempt re-reads the snapshot and
          // re-derives the dirty set from scratch)
          Thread.sleep(25L * attempts)
      }
    }
    sys.error("unreachable")
  }

  /** Row-level DELETE with copy-on-write file rewrites — the half of
    * the Delta/Iceberg `DELETE FROM` contract this lake's partition
    * model couldn't express. Three bounded steps:
    *
    *  1. Manifest zone-maps scope the work: only files whose stats
    *     say they MAY hold a matching row are read at all
    *     ([[LakeStats.survivors]]) — a predicate on one month of a
    *     100-TB table plans that month's files, driver-side.
    *  2. One pass over the candidates (with `_metadata.file_path`)
    *     finds the files that ACTUALLY contain matching rows and the
    *     matched-row count; clean candidates keep their manifest
    *     lines untouched — write amplification is bounded by dirty
    *     files, not candidate files. The per-file tally is
    *     file-count-sized driver data, never row data.
    *  3. Dirty files alone are re-read, their surviving rows (NOT
    *     matching, including predicate-null rows — SQL DELETE
    *     semantics) rewritten, and ONE commit atomically swaps
    *     removed-for-rewritten. A concurrent compaction or rewrite
    *     that already replaced a dirty file aborts the commit
    *     (ConcurrentModificationException) instead of resurrecting
    *     its rows; time travel and CDC see the swap as a normal
    *     write commit (old images delete, survivors insert).
    *
    * No matching rows → NO commit (returns the current version with
    * rowsChanged = 0), so retries and scheduled sweeps are free.
    */
  def deleteWhere(spark: SparkSession, root: String,
      filesPerPartition: Int = 1,
      store: CommitStore = HardlinkCommitStore)(
      predicate: Column): Rewrite =
    retryRewrite(() =>
      deleteWhereOnce(spark, root, filesPerPartition, store)(predicate))

  /** Row-level DELETE as a deletion-vector (merge-on-read) commit —
    * the Delta/Iceberg "deletion vectors" mode: instead of rewriting
    * every file holding a matching row ([[deleteWhere]]'s
    * copy-on-write), ONE position sidecar records the matched
    * (file, row-position) pairs and the commit attaches it to the
    * touched files' manifest lines. No data file is rewritten — a
    * delete of 100 rows spread over 100 large files costs one small
    * sidecar write instead of 100 file rewrites — and every read path
    * (read/scan/time travel/SQL relation/CDC sides) drops the listed
    * positions via [[readFileSubset]].
    *
    * The matched positions are computed through the DV-AWARE read, so
    * already-deleted rows never re-match: each commit's sidecar holds
    * only NEWLY deleted positions and a file's chain of sidecars is
    * disjoint by construction (`DvRef.n` is exact). Repeated deletes
    * extend the chain; read cost grows with total deleted positions,
    * so the steady state wants [[purgeDeletes]] (materialize + drop)
    * once vectors accumulate — write amplification moves to the
    * MAINTENANCE job, exactly Delta's DV contract.
    *
    * Concurrency: the commit verifies (against the snapshot the
    * positions were derived from) that no touched file was replaced
    * AND no touched file's dv changed — either aborts with
    * ConcurrentModificationException and the bounded retry re-derives.
    * No matching rows → NO commit.
    */
  def deleteWhereDV(spark: SparkSession, root: String,
      store: CommitStore = HardlinkCommitStore)(
      predicate: Column): Rewrite =
    retryRewrite(() => deleteWhereDVOnce(spark, root, store)(predicate))

  private def deleteWhereDVOnce(spark: SparkSession, root: String,
      store: CommitStore)(predicate: Column): Rewrite = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val candidates = LakeStats.survivors(snap,
      Seq(org.apache.spark.sql.classic.GraftExprBridge
        .expression(predicate)))
    if (candidates.isEmpty) return Rewrite(snap.version, 0L, 0)
    // uri -> manifest path, so the sidecar stores the key every
    // future reader translates back ([[dropDeleted]])
    val uriToRel = candidates.map(f => metaUri(root, f) -> f).toMap
    import spark.implicits._
    val uriDf = uriToRel.toSeq.toDF("_uri", "file")
    // ONE scan of the candidate files (pinned): matched positions are
    // deleted-row-count-sized — the checkpoint feeds the tally and
    // the sidecar write without re-scanning the data
    val matched = readFileSubsetPos(spark, root, candidates, snap)
      .filter(predicate)
      .select(metaUriNorm(col("_graft_file")).as("_uri"),
        col("_graft_pos").as("pos"))
      .join(org.apache.spark.sql.functions.broadcast(uriDf), Seq("_uri"))
      .select(col("file"), col("pos"))
      .localCheckpoint()
    val tally = matched.groupBy(col("file"))
      .agg(count(lit(1)).as("n")).collect()
    if (tally.isEmpty) return Rewrite(snap.version, 0L, 0)
    val dvRel = s"dv/dv-${java.util.UUID.randomUUID().toString}"
    matched.write.parquet(Paths.get(root).resolve(dvRel).toString)
    val newDvs = tally.map { r =>
      val f = r.getString(0)
      val n = r.getLong(1)
      f -> (snap.dvs.get(f) match {
        case Some(old) => DvRef(old.paths :+ dvRel, old.n + n)
        case None => DvRef(Seq(dvRel), n)
      })
    }.toMap
    val v = commitReplacing(root, Set.empty, Map.empty,
      snap.partitionCols, expectedBase = Some(snap), store = store,
      kind = "dv", newDvs = newDvs)
    Rewrite(v, tally.map(_.getLong(1)).sum, 0)
  }

  /** Materialize every deletion vector: files carrying a dv are
    * rewritten WITHOUT their deleted rows (one dv-aware read of
    * exactly those files) and swapped in one atomic `kind=compact`
    * commit — no logical change, so streams and CDC consumers skip it
    * — shedding the whole dv chain. The maintenance half of the DV
    * contract: deletes are O(positions) at write time, this is where
    * the rewrite cost is actually paid, batched and backlog-
    * proportional (only dv'd files rewrite). Orphaned sidecars age
    * out through [[vacuum]]. No deletion vectors → no commit.
    */
  def purgeDeletes(spark: SparkSession, root: String,
      filesPerPartition: Int = 1,
      store: CommitStore = HardlinkCommitStore): Rewrite =
    retryRewrite(() =>
      purgeDeletesOnce(spark, root, filesPerPartition, store))

  private def purgeDeletesOnce(spark: SparkSession, root: String,
      filesPerPartition: Int, store: CommitStore): Rewrite = {
      val snap = currentSnapshot(root, store).getOrElse(
        throw new IllegalStateException(s"no commits at $root"))
      val dvd = snap.dvs.keys.toSeq.sorted
      if (dvd.isEmpty) return Rewrite(snap.version, 0L, 0)
      val survivors = readFileSubset(spark, root, dvd, snap)
      val staged = stageFiles(survivors, root, snap.partitionCols,
        filesPerPartition, colMap = snap.colMap)
      // a fully-deleted rewrite leaves Spark's zero-row placeholder —
      // drop it like deleteWhere does
      val empties = staged.stats.collect {
        case (f, st) if st.rows == 0L => f
      }.toSet
      val kept = staged.files.map { case (p, fs) =>
        p -> fs.filterNot(empties)
      }.filter(_._2.nonEmpty)
      empties.foreach(f =>
        Files.deleteIfExists(Paths.get(root).resolve(f)))
      val v = commitReplacing(root, Set.empty, kept, snap.partitionCols,
        expectedBase = Some(snap), store = store, kind = "compact",
        newStats = staged.stats -- empties, removeFiles = dvd.toSet)
      Rewrite(v, snap.dvs.values.map(_.n).sum, dvd.size)
    }

  /** Row-level UPDATE (Delta's `UPDATE … SET … WHERE`) as a
    * copy-on-write rewrite with [[deleteWhere]]'s exact work scoping:
    * zone maps cut candidate files, one tagged pass finds the files
    * actually holding matches, ONLY those rewrite — each matched row
    * replaced by its assigned image (every expression cast to the
    * column's existing type: UPDATE never evolves the schema),
    * unmatched and predicate-null rows byte-identical in content —
    * and one atomic file-level swap commits. Updating a PARTITION
    * column moves rows between partitions (the rewrite stages under
    * the new value's directory). DV interaction: the rewrite reads
    * DV-aware, so deleted rows neither match nor resurrect, and the
    * rewritten files shed their vectors with their old lines.
    */
  def updateWhere(spark: SparkSession, root: String,
      assignments: Seq[(String, Column)], filesPerPartition: Int = 1,
      store: CommitStore = HardlinkCommitStore)(
      predicate: Column): Rewrite =
    retryRewrite(() =>
      updateWhereOnce(spark, root, assignments, filesPerPartition,
        store)(predicate))

  private def updateWhereOnce(spark: SparkSession, root: String,
      assignments: Seq[(String, Column)], filesPerPartition: Int,
      store: CommitStore)(predicate: Column): Rewrite = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, when}
    require(assignments.nonEmpty, "updateWhere: no SET assignments")
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val byName = assignments.toMap
    require(byName.size == assignments.size,
      "updateWhere: duplicate SET column")
    snap.schema.foreach { sch =>
      val unknown = byName.keySet -- sch.fieldNames.toSet
      require(unknown.isEmpty,
        s"updateWhere: SET of unknown column(s) ${unknown.mkString(", ")}")
    }
    val candidates = LakeStats.survivors(snap,
      Seq(org.apache.spark.sql.classic.GraftExprBridge
        .expression(predicate)))
    if (candidates.isEmpty) return Rewrite(snap.version, 0L, 0)
    val perFile = readFileSubsetTagged(spark, root, candidates, snap)
      .filter(predicate)
      .groupBy(col("_graft_file"))
      .agg(count(lit(1)).as("n"))
      .collect()
    if (perFile.isEmpty) return Rewrite(snap.version, 0L, 0)
    val matched = perFile.map(_.getLong(1)).sum
    val dirty = toRelative(perFile.map(_.getString(0)).toSeq,
      candidates, root)
    val base = readFileSubset(spark, root, dirty, snap)
    val rewritten = base.select(base.schema.fields.map { f =>
      byName.get(f.name) match {
        case Some(e) =>
          when(coalesce(predicate, lit(false)),
            e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
        case None => col(f.name)
      }
    }.toSeq: _*)
    val staged = stageFiles(rewritten, root, snap.partitionCols,
      filesPerPartition, colMap = snap.colMap)
    val v = commitReplacing(root, Set.empty, staged.files,
      snap.partitionCols, expectedBase = Some(snap), store = store,
      newStats = staged.stats, removeFiles = dirty.toSet)
    Rewrite(v, matched, dirty.size)
  }

  private def deleteWhereOnce(spark: SparkSession, root: String,
      filesPerPartition: Int,
      store: CommitStore)(
      predicate: Column): Rewrite = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit}
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val candidates = LakeStats.survivors(snap,
      Seq(org.apache.spark.sql.classic.GraftExprBridge
        .expression(predicate)))
    if (candidates.isEmpty) return Rewrite(snap.version, 0L, 0)
    val perFile = readFileSubsetTagged(spark, root, candidates, snap)
      .filter(predicate)
      .groupBy(col("_graft_file"))
      .agg(count(lit(1)).as("n"))
      .collect()
    if (perFile.isEmpty) return Rewrite(snap.version, 0L, 0)
    val matched = perFile.map(_.getLong(1)).sum
    val dirty = toRelative(perFile.map(_.getString(0)).toSeq,
      candidates, root)
    val survivors = readFileSubset(spark, root, dirty, snap)
      .filter(!coalesce(predicate, lit(false)))
    val staged = stageFiles(survivors, root, snap.partitionCols,
      filesPerPartition, colMap = snap.colMap)
    // a delete that empties every row of the rewrite leaves Spark's
    // single zero-row placeholder file: committing it would keep a
    // dead manifest line (and a dead footer read) per such delete —
    // drop it before the commit and reclaim the bytes now
    val empties = staged.stats.collect {
      case (f, st) if st.rows == 0L => f
    }.toSet
    val kept = staged.files.map { case (p, fs) =>
      p -> fs.filterNot(empties)
    }.filter(_._2.nonEmpty)
    empties.foreach(f =>
      Files.deleteIfExists(Paths.get(root).resolve(f)))
    val v = commitReplacing(root, Set.empty, kept,
      snap.partitionCols, expectedBase = Some(snap), store = store,
      newStats = staged.stats -- empties, removeFiles = dirty.toSet)
    Rewrite(v, matched, dirty.size)
  }

  /** Keyed MERGE (upsert): WHEN MATCHED UPDATE SET * / WHEN NOT
    * MATCHED INSERT * — the Delta `MERGE INTO` core, as copy-on-write
    * delete-then-insert. The target rows whose key appears in
    * `source` are replaced by their source row; source rows with new
    * keys are inserted; every other target row — and every file
    * without a matched key — is untouched.
    *
    * Work scoping mirrors [[deleteWhere]], with the candidate set cut
    * TWICE before any rewrite: zone-maps prune files whose key range
    * cannot overlap the source's [min, max] key bounds (one small agg
    * on the source computes bounds, the duplicate-key check, and the
    * row count together), then a key semi-join over the surviving
    * candidates finds the files actually holding a matched key. A
    * month-keyed merge into a 100-TB table reads that month's files
    * and rewrites only those containing matches. The source is
    * pinned once and feeds bounds, semi-join, and insert (one
    * evaluation of an arbitrarily expensive upstream frame).
    *
    * Contract: source keys must be unique (refused loudly otherwise —
    * delete-then-insert would silently insert both copies where
    * Delta errors at match time); null source keys never match
    * (SQL join semantics) and insert as new rows. Source rows must
    * carry the table's partition columns. Schema evolution applies:
    * a source with a new column evolves the table exactly like an
    * upsert; rewritten survivor rows read as null for it.
    */
  def merge(spark: SparkSession, root: String, source: DataFrame,
      keyCols: Seq[String], filesPerPartition: Int = 1,
      store: CommitStore = HardlinkCommitStore): Rewrite =
    retryRewrite(() =>
      mergeOnce(spark, root, source, keyCols, filesPerPartition, store))

  private def mergeOnce(spark: SparkSession, root: String,
      source: DataFrame, keyCols: Seq[String], filesPerPartition: Int,
      store: CommitStore): Rewrite = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val missing = snap.partitionCols.filterNot(p =>
      source.columns.exists(_.equalsIgnoreCase(p)))
    require(missing.isEmpty,
      s"merge source must carry the partition columns; missing: $missing")
    // LAZY checkpoint: the bounds job below is the first action, so
    // ONE job materializes the pinned source AND computes the
    // bounds/dup/constraint aggregates (an eager checkpoint paid a
    // separate materialization job first — pure scheduling floor).
    // Generated columns materialize first (the source is the only NEW
    // rows a merge introduces); provided ones validate in the same
    // bounds aggregation below.
    val genViol = generatedViolations(source, snap.generated)
    val src = applyGenerated(source, snap.generated)
      .localCheckpoint(eager = false)
    // one job: row count, duplicate-key check, per-key bounds, AND
    // the CHECK-constraint validation (the source rows are the only
    // NEW rows a merge introduces; dirty-file survivors were already
    // in the table). The dup check covers only fully-keyed rows: a
    // row with ANY null key field can never match a target row (SQL
    // join semantics), so two of them are two legitimate inserts,
    // not a duplicate key.
    val fullyKeyed = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val cons = snap.constraints.toSeq.sortBy(_._1)
    val boundsAggs = count(lit(1)).as("n") +:
      count(when(fullyKeyed, lit(1))).as("n_keyed") +:
      count_distinct(when(fullyKeyed, struct(keyCols.map(col): _*)))
        .as("nk") +:
      (keyCols.flatMap(k =>
        Seq(min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k"))) ++
        cons.map { case (n, e) =>
          sum(when(coalesce(expr(e), lit(true)) === lit(false), 1L)
            .otherwise(0L)).as(s"__viol_$n")
        } ++
        genViol.zipWithIndex.map { case ((_, cond), i) =>
          sum(when(cond, 1L).otherwise(0L)).as(s"__genviol_$i")
        })
    val b = src.agg(boundsAggs.head, boundsAggs.tail: _*).head()
    val srcRows = b.getLong(0)
    if (srcRows == 0L) return Rewrite(snap.version, 0L, 0)
    cons.foreach { case (n, e) =>
      val i = b.fieldIndex(s"__viol_$n")
      val bad = if (b.isNullAt(i)) 0L else b.getLong(i)
      if (bad > 0)
        throw new IllegalStateException(
          s"CHECK constraint '$n' ($e) violated by $bad row(s) of " +
            "this batch; nothing was committed")
    }
    genViol.zipWithIndex.foreach { case ((msg, _), gi) =>
      val i = b.fieldIndex(s"__genviol_$gi")
      val bad = if (b.isNullAt(i)) 0L else b.getLong(i)
      if (bad > 0)
        throw new IllegalStateException(
          s"$msg violated by $bad row(s) of this batch; " +
            "nothing was committed")
    }
    require(b.getLong(2) == b.getLong(1),
      s"merge source has duplicate keys (${b.getLong(1) - b.getLong(2)} " +
        "extra rows): delete-then-insert would insert both copies — " +
        "dedup the source first")
    // zone-map candidate cut: key ∈ [source min, source max] per key
    // column; a bound Spark can't express as a literal (null — an
    // all-null key column — or an exotic type) contributes no filter,
    // which is merely conservative
    val bounds = keyCols.flatMap { k =>
      val (lo, hi) = (b.getAs[Any](s"min_$k"), b.getAs[Any](s"max_$k"))
      if (lo == null || hi == null) None
      else scala.util.Try(
        col(k) >= lit(lo) && col(k) <= lit(hi)).toOption
    }
    val candidates = LakeStats.survivors(snap, bounds.map(
      org.apache.spark.sql.classic.GraftExprBridge.expression))
    // no distinct: the dup check above PROVED fully-keyed source keys
    // unique, and null-keyed rows match nothing in either join — the
    // distinct was a pure extra aggregation in both the tally semi
    // join and the survivor anti join
    val srcKeys = src.select(keyCols.map(col): _*)
    val perFile =
      if (candidates.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else readFileSubsetTagged(spark, root, candidates, snap)
        .join(srcKeys, keyCols, "left_semi")
        .groupBy(col("_graft_file"))
        .agg(count(lit(1)).as("n"))
        .collect()
    val matched = perFile.map(_.getLong(1)).sum
    val dirty = toRelative(perFile.map(_.getString(0)).toSeq,
      candidates, root)
    // survivors of dirty files (unmatched keys) + every source row,
    // staged together so the swap is ONE atomic commit
    val survivors =
      if (dirty.isEmpty) src
      else readFileSubset(spark, root, dirty, snap)
        .join(srcKeys, keyCols, "left_anti")
        .unionByName(src, allowMissingColumns = true)
    val staged = stageFiles(survivors, root, snap.partitionCols,
      filesPerPartition, colMap = snap.colMap)
    val v = commitReplacing(root, Set.empty, staged.files,
      snap.partitionCols, expectedBase = Some(snap),
      batchSchema = Some(src.schema), store = store,
      newStats = staged.stats, removeFiles = dirty.toSet)
    Rewrite(v, matched, dirty.size)
  }

  /** Time travel: read the table exactly as of `version` — including
    * its schema: a version committed before a column existed reads
    * WITHOUT that column.
    */
  def readVersion(spark: SparkSession, root: String, version: Long,
      store: CommitStore = HardlinkCommitStore): DataFrame =
    readSnapshot(spark, root, readManifest(root, version, store))

  /** The newest version committed AT OR BEFORE `timestamp` (epoch
    * millis) — Delta's TIMESTAMP AS OF resolution against the
    * manifest `ts=` headers. Versions predating the header count as
    * "unknown time" and are only chosen when no stamped version
    * qualifies but an unstamped one exists below a stamped
    * disqualified one — i.e. they are treated as older than every
    * stamped commit (true by construction: the header shipped after
    * them). Errors if the earliest commit is younger than
    * `timestamp`.
    */
  def versionAt(root: String, timestamp: Long,
      store: CommitStore = HardlinkCommitStore): Long = {
    val versions = store.listVersions(root).sorted
    if (versions.isEmpty)
      throw new IllegalStateException(s"no commits at $root")
    val qualifying = versions.takeWhile { v =>
      readManifest(root, v, store).ts.forall(_ <= timestamp)
    }
    if (qualifying.isEmpty)
      throw new IllegalArgumentException(
        s"no commit at $root is as old as $timestamp " +
          "(earliest is younger)")
    qualifying.max
  }

  /** DESCRIBE HISTORY: every committed version with its kind, file
    * count, and total rows-from-stats (None when any file predates
    * zone-map harvesting) — manifest-only, newest first, no Spark
    * job. The audit surface time travel, restore, and vacuum
    * retention decisions read.
    */
  def history(root: String,
      store: CommitStore = HardlinkCommitStore)
      : Seq[(Long, String, Int, Option[Long])] =
    store.listVersions(root).sorted.reverse.map { v =>
      val s = readManifest(root, v, store)
      val files = s.files.values.flatten.toSeq
      val rows =
        if (files.forall(s.stats.contains))
          Some(files.map(s.stats(_).rows).sum)
        else None
      (v, s.kind, files.size, rows)
    }

  /** SHOW PARTITIONS, manifest-only: per-partition file count, rows
    * and bytes from the stats (0 where any file predates harvesting),
    * sorted by partition dir.
    */
  def partitions(root: String,
      store: CommitStore = HardlinkCommitStore)
      : Seq[(String, Int, Long, Long)] = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    snap.files.toSeq.sortBy(_._1).map { case (part, fs) =>
      val sts = fs.flatMap(snap.stats.get)
      (part, fs.size,
        if (sts.size == fs.size) sts.map(_.rows).sum else 0L,
        if (sts.size == fs.size) sts.map(_.bytes).sum else 0L)
    }
  }

  /** DESCRIBE DETAIL, manifest-only: (version, file count, total
    * bytes from stats, partition columns, constraint names).
    */
  def detail(root: String,
      store: CommitStore = HardlinkCommitStore)
      : (Long, Int, Long, Seq[String], Seq[String]) = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val files = snap.files.values.flatten.toSeq
    (snap.version, files.size,
      files.flatMap(snap.stats.get).map(_.bytes).sum,
      snap.partitionCols, snap.constraints.keys.toSeq.sorted)
  }

  /** Data-skipping observability: how many of the snapshot's files a
    * [[scan]] under `filters` would plan, out of the total —
    * manifest-only, nothing is read. The ops-side answer to "is my
    * layout making the stats selective?" (see [[cluster]]).
    */
  def scanInfo(root: String,
      store: CommitStore = HardlinkCommitStore)(
      filters: Column*): (Int, Int) = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val total = snap.files.values.flatten.size
    val planned = LakeStats.survivors(snap, filters.map(
      org.apache.spark.sql.classic.GraftExprBridge.expression)).size
    (planned, total)
  }

  /** [[scanInfo]] including bloom-index pruning — needs a session for
    * the sidecar probe job, so it is a separate overload: the
    * zone-map-only form stays O(manifest) with zero jobs.
    */
  def scanInfo(spark: SparkSession, root: String,
      store: CommitStore)(filters: Column*): (Int, Int) = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val total = snap.files.values.flatten.size
    val exprs = filters.map(
      org.apache.spark.sql.classic.GraftExprBridge.expression)
    val zone = LakeStats.survivors(snap, exprs)
    val planned =
      if (snap.blooms.isEmpty || zone.isEmpty) zone.size
      else zone.size -
        BloomIndex.prunable(spark, root, snap, exprs, zone).size
    (planned, total)
  }

  /** O(manifest) row count from the zone-map stats — the instant
    * `SELECT count(*)` a 100-TB table answers without a single task,
    * when every current file carries stats (None otherwise: the
    * caller falls back to a real count).
    */
  def rowCount(root: String,
      store: CommitStore = HardlinkCommitStore): Option[Long] = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val files = snap.files.values.flatten.toSeq
    if (files.forall(snap.stats.contains))
      // deletion vectors subtract exactly (DvRef.n counts distinct
      // positions — the dv-aware match can never double-delete)
      Some(files.map(snap.stats(_).rows).sum -
        snap.dvs.values.map(_.n).sum)
    else None
  }

  /** RESTORE: roll the table back to exactly `toVersion`'s state as a
    * NEW commit (Delta's RESTORE TABLE ... VERSION AS OF) — metadata
    * only: the new manifest references the old version's files and
    * stats verbatim, no data moves. History is preserved (the undone
    * versions stay time-travelable until vacuum), CDC sees the
    * restore as a normal diff (files the rollback removes/re-adds),
    * and concurrent writers are handled by the usual commit retry.
    * The target version's SCHEMA is restored as-is (a column added
    * after it is shed, not merged back in); CHECK constraints are the
    * one piece of CURRENT state that is kept — they are guards on
    * future writes, and the restored rows are not re-validated
    * against them (the same posture as Delta). Returns the committed
    * version.
    */
  def restore(root: String, toVersion: Long,
      store: CommitStore = HardlinkCommitStore): Long = {
    val target = readManifest(root, toVersion, store)
    commitReplacing(root, Set.empty, target.files, target.partitionCols,
      batchSchema = target.schema, store = store, kind = "restore",
      newStats = target.stats, replaceAll = true,
      schemaOverride = true,
      // deletion-vector state rolls back WITH the file list: a file
      // dv'd after toVersion reads whole again (CDC reports the
      // resurrected rows), one purged after it gets its vector back
      dvOverride = Some(target.dvs),
      // bloom-index state likewise: an index built AFTER toVersion
      // must not claim to bound rows a rollback resurrects (a dv the
      // build excluded may return) — the target version's refs are
      // exactly the ones whose superset contract still holds
      bloomOverride = Some(target.blooms),
      // column mapping + tombstones roll back with the schema: a
      // restore past a rename reads the old logical names again
      newColMap = Some(target.colMap),
      newDropped = Some(target.dropped),
      newGenerated = Some(target.generated))
  }

  /** SHALLOW CLONE (Delta's CLONE ... SHALLOW): commit a manifest at
    * `dstRoot` that references `srcRoot`'s current files by ABSOLUTE
    * path — zero data copied, O(manifest) time regardless of table
    * size. The clone is immediately a first-class lake: reads resolve
    * the referenced files (per-data-plane basePath groups), zone-map
    * stats carry over so pruned scans prune identically, and every
    * mutation — upsert, append, deleteWhere, merge, compact — is
    * copy-on-write INTO THE CLONE's own data dir: the source is never
    * touched, which is exactly the dev/test-sandbox workflow (mutate
    * a 100-TB table's clone without copying 100 TB; compaction
    * incidentally materializes the partitions it rewrites).
    *
    * The one caveat is Delta's own: `vacuum` on the SOURCE doesn't
    * know about clones — if it expires a version whose files a clone
    * still references, the clone's reads break. Vacuum on the CLONE
    * is always safe (it only deletes under the clone's own data dir).
    * Source and destination ride the same store type; `dstRoot` must
    * have no commits yet.
    */
  def clone(srcRoot: String, dstRoot: String,
      store: CommitStore = HardlinkCommitStore): Long = {
    val snap = currentSnapshot(srcRoot, store).getOrElse(
      throw new IllegalStateException(s"no commits at $srcRoot"))
    require(currentVersion(dstRoot, store).isEmpty,
      s"clone destination $dstRoot already has commits")
    val absFiles = snap.files.map { case (part, fs) =>
      part -> fs.map(f =>
        Paths.get(srcRoot).resolve(f).normalize().toString)
    }
    val absStats = snap.stats.map { case (f, st) =>
      Paths.get(srcRoot).resolve(f).normalize().toString -> st
    }
    // deletion vectors carry over with both sides absolutized: the
    // file KEY matches the clone's manifest line; the sidecar PATHS
    // resolve into the source lake (zero-copy, like the data files).
    // dropDeleted's translation still matches source-written sidecar
    // content (stored source-relative) via the derived-relative form.
    val absDvs = snap.dvs.map { case (f, dv) =>
      Paths.get(srcRoot).resolve(f).normalize().toString ->
        DvRef(dv.paths.map(pp =>
          Paths.get(srcRoot).resolve(pp).normalize().toString), dv.n)
    }
    // bloom refs carry over like dvs: file keys absolutize to match
    // the clone's manifest lines; sidecar paths absolutize into the
    // source lake (zero-copy). The pruning job re-derives the
    // sidecar-relative file keys from the sidecar's own location.
    val absBlooms = snap.blooms.map { case (f, cs) =>
      Paths.get(srcRoot).resolve(f).normalize().toString ->
        cs.map { case (c, r) => c -> BloomIndex.Ref(
          Paths.get(srcRoot).resolve(r.path).normalize().toString) }
    }
    commitReplacing(dstRoot, Set.empty, absFiles, snap.partitionCols,
      batchSchema = snap.schema, store = store, kind = "clone",
      newStats = absStats, dvOverride = Some(absDvs),
      bloomOverride = Some(absBlooms),
      // column mapping is name-to-name (no paths): carried verbatim
      newColMap = Some(snap.colMap),
      newDropped = Some(snap.dropped),
      newGenerated = Some(snap.generated),
      // the clone IS the table, contract included: writes against it
      // must satisfy the same CHECK constraints (Delta CLONE copies
      // table properties the same way)
      newConstraints = Some(snap.constraints))
  }

  /** File-level diff between two committed versions: (added files,
    * removed files, from-snapshot, to-snapshot) with paths relative
    * to the lake root. Manifest-only — no Spark job — which makes it
    * the cheap pre-flight for CDC consumers (e.g. the streaming
    * source checks `removed.isEmpty` before planning a batch).
    */
  def fileDiff(root: String, fromVersion: Long, toVersion: Long,
      store: CommitStore = HardlinkCommitStore)
      : (Seq[String], Seq[String], Snapshot, Snapshot) = {
    require(fromVersion <= toVersion,
      s"fileDiff: fromVersion $fromVersion > toVersion $toVersion")
    val from = readManifest(root, fromVersion, store)
    val to = readManifest(root, toVersion, store)
    val ff = from.files.values.flatten.toSet
    val tf = to.files.values.flatten.toSet
    ((tf -- ff).toSeq.sorted, (ff -- tf).toSeq.sorted, from, to)
  }

  /** The data-plane base a manifest file entry reads under: local
    * (relative) entries live under THIS root's `data/`; absolute
    * entries — shallow-clone references into another lake — under
    * THAT lake's `data/`. Spark's partition-dir column recovery needs
    * the matching basePath per group.
    */
  /** The canonical single-slash URI form for joining against
    * `_metadata.file_path` (which Hadoop reports as "file:/x/y" where
    * `Path.toUri` says "file:///x/y"). Data-side values normalize to
    * this form with [[metaUriNorm]].
    */
  private def metaUri(root: String, f: String): String =
    "file:" + Paths.get(root).resolve(f).normalize().toString

  /** Normalize a `_metadata.file_path` column to [[metaUri]]'s form
    * (idempotent: single-slash values pass through).
    */
  private def metaUriNorm(c: Column): Column =
    org.apache.spark.sql.functions.regexp_replace(c,
      "^file:///", "file:/")

  private def baseOf(root: String, f: String): String =
    if (!Paths.get(f).isAbsolute) dataDir(root).toString
    else {
      val i = f.lastIndexOf("/data/")
      require(i >= 0, s"external lake file without a data dir: $f")
      f.substring(0, i + "/data".length)
    }

  /** Read a subset of a snapshot's files under that snapshot's
    * schema (partition dirs stay real columns). Files are read in
    * per-data-plane groups (a shallow clone mixes its own files with
    * absolute references into its source) so each group gets the
    * basePath its partition directories resolve against.
    */
  private[graft] def readFileSubset(spark: SparkSession, root: String,
      files: Seq[String], snap: Snapshot): DataFrame =
    readSubset(spark, root, files, snap, keep = Nil)

  /** [[readFileSubset]] with each row tagged by its file's path in a
    * `_graft_file` column.
    */
  private def readFileSubsetTagged(spark: SparkSession, root: String,
      files: Seq[String], snap: Snapshot): DataFrame =
    readSubset(spark, root, files, snap, keep = Seq("_graft_file"))

  /** [[readFileSubsetTagged]] plus each row's in-file position as
    * `_graft_pos` (deletion-vector writes address rows by it).
    */
  private def readFileSubsetPos(spark: SparkSession, root: String,
      files: Seq[String], snap: Snapshot): DataFrame =
    readSubset(spark, root, files, snap,
      keep = Seq("_graft_file", "_graft_pos"))

  /** The one physical read: per-data-plane parquet groups under the
    * snapshot's schema, deletion vectors applied (files with a dv
    * entry lose their deleted positions via a position anti-join —
    * the dv side is deleted-row-count-sized and broadcasts), then the
    * helper columns not in `keep` dropped. The metadata column must
    * be materialized PER GROUP: `_metadata` does not resolve above
    * the union a mixed-data-plane (shallow-clone) read produces.
    */
  private def readSubset(spark: SparkSession, root: String,
      files: Seq[String], snap: Snapshot, keep: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (dvd, plain) = files.sorted.partition(snap.dvs.contains)
    def grouped(fs: Seq[String], meta: Boolean): DataFrame = {
      val groups = fs.groupBy(baseOf(root, _))
      // column mapping: files store PHYSICAL names — read under the
      // physical form of the snapshot schema, then alias back to
      // logical so every consumer sees the logical table
      val physSchema = snap.schema.map(s =>
        org.apache.spark.sql.types.StructType(s.fields.map(f =>
          f.copy(name = physicalOf(snap, f.name)))))
      groups.toSeq.sortBy(_._1).map { case (base, gfs) =>
        val paths = gfs.map(f => Paths.get(root).resolve(f).toString)
        val reader = spark.read.option("basePath", base)
        val df0 = physSchema.fold(reader)(reader.schema(_))
          .parquet(paths: _*)
        val df = snap.colMap.foldLeft(df0) { case (d, (l, p)) =>
          if (d.columns.contains(p)) d.withColumnRenamed(p, l) else d
        }
        if (meta)
          df.withColumn("_graft_file", col("_metadata.file_path"))
            .withColumn("_graft_pos", col("_metadata.row_index"))
        else df
      }.reduce(_.unionByName(_))
    }
    def trim(df: DataFrame): DataFrame =
      Seq("_graft_file", "_graft_pos").diff(keep).foldLeft(df)(_.drop(_))
    val needMeta = keep.nonEmpty
    val plainDf =
      if (plain.isEmpty) None
      else Some(if (needMeta) trim(grouped(plain, meta = true))
        else grouped(plain, meta = false))
    val dvDf =
      if (dvd.isEmpty) None
      else Some(trim(dropDeleted(spark, root,
        grouped(dvd, meta = true), dvd, snap)))
    (plainDf, dvDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => throw new IllegalArgumentException(
        "readFileSubset: empty file list")
    }
  }

  /** Anti-join away the positions listed in `dvd`'s deletion vectors.
    * `df` must carry `_graft_file` (absolute file URI) and
    * `_graft_pos`. Sidecars store the WRITING lake's manifest path
    * per file, so the driver-built translation maps both this
    * snapshot's manifest key and its source-relative form (a clone
    * reads source-written sidecars whose keys are source-relative) to
    * the URI the metadata column reports. The translation is
    * dv'd-file-count-sized; the joined dv side is deleted-position-
    * sized — both broadcast. When deletion vectors outgrow broadcast
    * (a mass delete), [[purgeDeletes]] is the remedy: materialize and
    * drop them.
    */
  private def dropDeleted(spark: SparkSession, root: String,
      df: DataFrame, dvd: Seq[String], snap: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val dv = dvPositions(spark, root, dvd, snap)
    df.join(broadcast(dv),
      metaUriNorm(df("_graft_file")) === dv("_dv_uri") &&
        df("_graft_pos") === dv("_dv_pos"), "left_anti")
  }

  /** The deleted (file-URI, position) pairs `snap`'s deletion vectors
    * record for `files` — an empty 2-column frame when none has one.
    * Sidecars store the WRITING lake's manifest path per file, so the
    * driver-built translation maps both this snapshot's manifest key
    * and its source-relative form (a clone reads source-written
    * sidecars whose keys are source-relative) to the URI the metadata
    * column reports; the translation is file-count-sized and
    * broadcasts.
    */
  private def dvPositions(spark: SparkSession, root: String,
      files: Seq[String], snap: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._
    val dvd = files.filter(snap.dvs.contains)
    if (dvd.isEmpty)
      return Seq.empty[(String, Long)].toDF("_dv_uri", "_dv_pos")
    val sidecars = dvd.flatMap(f => snap.dvs(f).paths).distinct
      .map(p => Paths.get(root).resolve(p).toString)
    val trans: Seq[(String, String)] = dvd.flatMap { f =>
      val uri = metaUri(root, f)
      val alts =
        if (!Paths.get(f).isAbsolute) Seq(f)
        else {
          val i = f.lastIndexOf("/data/")
          Seq(f) ++ (if (i >= 0) Seq(f.substring(i + 1)) else Nil)
        }
      alts.map(_ -> uri)
    }
    val transDf = trans.toDF("_dv_key", "_dv_uri")
    spark.read.parquet(sidecars: _*)
      .join(broadcast(transDf), col("file") === col("_dv_key"))
      .select(col("_dv_uri"), col("pos").as("_dv_pos"))
  }

  /** The committed snapshot's metadata at a version (files, schema,
    * kind) — manifest-only, no Spark job.
    */
  def snapshotAt(root: String, version: Long,
      store: CommitStore = HardlinkCommitStore): Snapshot =
    readManifest(root, version, store)

  /** Incremental (CDC) read: the rows that changed between two
    * committed versions, as a snapshot diff of the manifests' file
    * lists ([[fileDiff]]) — `_change_type` is `insert` for rows in
    * files present in `toVersion` but not `fromVersion`, `delete` for
    * rows in files only `fromVersion` references. An append commit
    * therefore reads as pure inserts; a partition upsert as the old
    * image deleted + the new image inserted — exactly what a
    * downstream incremental materialization consumes
    * ([[graft.operators.Incremental]] merges the insert side; deletes
    * signal a partition recompute).
    *
    * Scale: only the CHANGED files are ever opened — consuming one
    * day's upsert on a 100-TB table scans that day's files, not the
    * table. Deletes are file-level (this lake replaces whole
    * partitions, never individual rows), so the diff is exact. A
    * compaction commit rewrites partitions without logical change;
    * a RANGE-level snapshot diff reports it as delete+insert of the
    * same rows (net-zero for additive consumers like
    * [[graft.operators.Incremental.applyChanges]], just wasted IO).
    * Consumers that must skip it walk per-commit and test
    * `snapshotAt(v).kind == "compact"` — exactly what the
    * graft-lake streaming source does.
    *
    * Each side reads with ITS OWN snapshot's schema (evolution-safe);
    * the union aligns by name with missing columns as nulls.
    */
  def readChanges(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long,
      store: CommitStore = HardlinkCommitStore): DataFrame = {
    val (addedFiles, removedFiles, from, to) =
      fileDiff(root, fromVersion, toVersion, store)
    def side(files: Seq[String], snap: Snapshot, tag: String)
        : Option[DataFrame] =
      if (files.isEmpty) None
      else Some(readFileSubset(spark, root, files, snap)
        .withColumn("_change_type",
          org.apache.spark.sql.functions.lit(tag)))
    val inserted = side(addedFiles, to, "insert")
    val deleted = side(removedFiles, from, "delete")
    // deletion-vector diff: files PRESENT IN BOTH manifests whose dv
    // state changed carry row-level changes the file diff can't see.
    // Positions in to-but-not-from are delete images (a deleteWhereDV
    // between the versions); from-but-not-to are re-inserts (a
    // restore that rolled a vector back). Only the changed files are
    // opened, and each side reads under ITS snapshot's dv state so
    // the images are exactly the rows that appeared/vanished.
    val commonChanged = {
      val ff = from.files.values.flatten.toSet
      to.files.values.flatten.filter(f =>
        ff(f) && from.dvs.get(f) != to.dvs.get(f)).toSeq.sorted
    }
    def dvSide(minus: (DataFrame, DataFrame) => DataFrame,
        readSnap: Snapshot, tag: String): Option[DataFrame] =
      if (commonChanged.isEmpty) None
      else {
        import org.apache.spark.sql.functions.{col, lit}
        val fromPos = dvPositions(spark, root, commonChanged, from)
        val toPos = dvPositions(spark, root, commonChanged, to)
        val pos = minus(toPos, fromPos)
        val rows = readFileSubsetPos(spark, root, commonChanged, readSnap)
          .join(pos, metaUriNorm(col("_graft_file")) === col("_dv_uri") &&
            col("_graft_pos") === col("_dv_pos"), "left_semi")
          .drop("_graft_file", "_graft_pos")
          .withColumn("_change_type", lit(tag))
        Some(rows)
      }
    val dvDeleted = dvSide((t, f) => t.except(f), from, "delete")
    val dvReinserted = dvSide((t, f) => f.except(t), to, "insert")
    val parts = Seq(inserted, deleted, dvDeleted, dvReinserted).flatten
    if (parts.isEmpty) // no file or dv changed between the versions
      readSnapshot(spark, root, to).limit(0)
        .withColumn("_change_type",
          org.apache.spark.sql.functions.lit(""))
    else parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private def readSnapshot(spark: SparkSession, root: String,
      snap: Snapshot): DataFrame = {
    val files = snap.files.values.flatten.toSeq
    if (files.isEmpty)
      // a legitimate state since row-level deletes: a deleteWhere
      // that removed every row commits a zero-file manifest — read
      // it as the schema-correct empty table (only pre-evolution
      // manifests, which can't record a schema, must refuse)
      return snap.schema.fold[DataFrame](
        throw new IllegalStateException(
          s"snapshot v${snap.version} at $root is empty and records " +
            "no schema"))(sch =>
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), sch))
    // basePath (per data-plane group — see readFileSubset) keeps the
    // k=v partition directories as real columns; the SNAPSHOT's
    // schema (when recorded) makes reads deterministic across
    // evolution: files missing a column yield nulls for it, instead
    // of depending on which files parquet merge sampled
    readFileSubset(spark, root, files, snap)
  }

  /** Compact fragmented partitions: rewrite every partition holding at
    * least `minFiles` files into `filesPerPartition`, in ONE atomic
    * commit — the maintenance job the streaming sink makes necessary
    * (each micro-batch commit adds a file per touched partition; at
    * 100 TB unbounded file counts kill scan planning and footer reads
    * long before data size does). Read-modify-write safety: the
    * commit carries the snapshot it compacted, and aborts with
    * ConcurrentModificationException if a concurrent upsert touched
    * one of the same partitions in between — stale data is never
    * resurrected, and the caller just re-runs. Returns the committed
    * version (or the current one when nothing is fragmented).
    */
  def compact(spark: SparkSession, root: String,
      filesPerPartition: Int = 1, minFiles: Int = 2,
      store: CommitStore = HardlinkCommitStore): Long = {
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val targets = snap.files.filter(_._2.size >= minFiles).keys.toSet
    if (targets.isEmpty) return snap.version
    val files = snap.files.view.filterKeys(targets).values.flatten
      .toSeq.sorted
    // DV-aware + clone-safe read: deleted positions stay deleted in
    // the rewrite (dv refs die with the replaced lines), external
    // (cloned) files group under their own basePath
    val batch = readFileSubset(spark, root, files, snap)
    val staged = stageFiles(batch, root, snap.partitionCols,
      filesPerPartition, colMap = snap.colMap)
    commitReplacing(root, targets ++ staged.keySet, staged.files,
      snap.partitionCols, expectedBase = Some(snap),
      batchSchema = Some(batch.schema), store = store, kind = "compact",
      newStats = staged.stats)
  }

  /** Size-targeted compaction (Delta's OPTIMIZE bin-packing): rewrite
    * ONLY the files smaller than `smallBytes` — per partition, their
    * rows re-pack into ceil(totalBytes / targetBytes) files — and
    * leave every well-sized file's manifest line (and bytes)
    * untouched, via the same file-level commit the row rewrites use.
    * This is the steady-state maintenance for a streaming-ingested
    * 100-TB table: each micro-batch adds a small file per touched
    * partition, and periodic bin-packing folds ONLY that backlog —
    * where [[compact]]'s partition-level rewrite would re-copy the
    * accumulated large files every run, write amplification
    * proportional to table size instead of backlog size.
    *
    * Files with unknown size (pre-bytes manifests) are left alone
    * (conservative: never rewrite what we can't reason about — run
    * [[compact]] once to re-stat them). Packed files are NOT
    * re-clustered (their rows interleave the folded smalls — the
    * same posture as Delta's plain OPTIMIZE); run [[cluster]] when
    * the packed region must also prune tightly. Commits as `kind=compact`
    * (no logical change); a concurrent rewrite of a chosen file
    * aborts the commit. Returns the committed version (the current
    * one when nothing qualifies: no empty commits).
    */
  def compactSmall(spark: SparkSession, root: String,
      smallBytes: Long = 32L << 20, targetBytes: Long = 128L << 20,
      store: CommitStore = HardlinkCommitStore,
      // Delta's `OPTIMIZE … WHERE`: restrict the sweep to the
      // partitions whose DIRECTORY VALUES may satisfy the predicate
      // (driver-side, manifest-only — the same conservative
      // evaluator as the scan's partition pruning). A 100-TB table's
      // maintenance job touches yesterday's partition, not the world.
      where: Option[Column] = None): Long = {
    require(smallBytes > 0 && targetBytes >= smallBytes,
      s"need 0 < smallBytes <= targetBytes, got $smallBytes/$targetBytes")
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val scoped = where match {
      case None => snap.files
      case Some(pred) =>
        val exprs = Seq(
          org.apache.spark.sql.classic.GraftExprBridge.expression(pred))
        snap.files.filter { case (dir, _) =>
          LakeStats.partitionMayMatch(dir, exprs)
        }
    }
    def sizeOf(f: String): Long = snap.stats.get(f).map(_.bytes)
      .getOrElse(0L)
    // per partition: the small files (≥2 — repacking ONE file buys
    // nothing) and their packed output count
    val perPart = scoped.toSeq.flatMap { case (part, fs) =>
      val small = fs.filter(f => sizeOf(f) > 0L && sizeOf(f) < smallBytes)
      if (small.size < 2) None
      else {
        val total = small.map(sizeOf).sum
        val outFiles = math.max(1L, (total + targetBytes - 1) / targetBytes)
        Some((part, small, outFiles.toInt))
      }
    }
    if (perPart.isEmpty) return snap.version
    // rewrite each partition's backlog at its own output count — the
    // union concatenates the repartitioned frames' tasks, so each
    // writer task holds one partition's rows and the per-dir file
    // count is that dir's packed count; one commit for the sweep
    // (stageFiles scopes AQE off around the write itself). Conflict
    // safety rides the removeFiles presence check: a chosen file
    // replaced since this snapshot aborts the commit.
    val rewritten = perPart.map { case (_, small, outFiles) =>
      readFileSubset(spark, root, small, snap).repartition(outFiles)
    }.reduce(_.unionByName(_))
    val staged = stageFiles(rewritten, root, snap.partitionCols,
      filesPerPartition = 1, distribute = false, colMap = snap.colMap)
    commitReplacing(root, Set.empty, staged.files, snap.partitionCols,
      expectedBase = Some(snap), store = store, kind = "compact",
      newStats = staged.stats,
      removeFiles = perPart.flatMap(_._2).toSet)
  }

  /** Clustered compaction — `OPTIMIZE ... ZORDER BY` for this lake:
    * rewrite the table with rows range-partitioned and sorted on
    * `clusterCols`, so each rewritten file covers a TIGHT, nearly
    * disjoint slice of the cluster key and the manifest zone-maps
    * ([[LakeStats]]) become maximally selective: a key-range query
    * over a clustered 100-TB table prunes to the handful of files
    * whose slice overlaps, where the same query over ingest-ordered
    * files (every file spanning the full key range) prunes nothing.
    * Data layout is THE lever that turns stats into skipped IO — the
    * stats only record what the layout provides.
    *
    * `zorder = true` interleaves the bits of exactly TWO numeric
    * columns (Morton order, [[PartitionedLake.writeZOrdered]]'s
    * contract: non-negative, < 2^21 after long cast) so BOTH columns
    * get tight per-file ranges — the 2-D box-query layout; the
    * default lexicographic order serves one leading column best.
    *
    * Like [[compact]], the rewrite commits as `kind=compact` (no
    * logical change: streams skip it, CDC consumers ignore it) with
    * read-modify-write safety — a concurrent upsert to any partition
    * aborts the commit instead of resurrecting replaced data.
    * Returns the committed version.
    */
  def cluster(spark: SparkSession, root: String,
      clusterCols: Seq[String], filesPerPartition: Int = 1,
      zorder: Boolean = false,
      store: CommitStore = HardlinkCommitStore,
      // Hilbert-curve layout for exactly two numeric columns: the
      // same one-sort-key trick as zorder with strictly better
      // locality (consecutive curve indexes are Manhattan-adjacent —
      // Morton jumps at quadrant seams), so 2-D box queries pack into
      // as-few-or-fewer files (LakeClusterSpec measures both)
      hilbert: Boolean = false): Long = {
    import org.apache.spark.sql.functions.col
    require(clusterCols.nonEmpty, "cluster needs at least one column")
    require(!(zorder && hilbert), "pick ONE curve: zorder or hilbert")
    require(!(zorder || hilbert) || clusterCols.size == 2,
      s"curve layouts interleave exactly 2 columns, got ${clusterCols.size}")
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val batch = readSnapshot(spark, root, snap)
    val nParts = math.max(snap.files.size, 1) * filesPerPartition
    val sortCols = snap.partitionCols.map(col) ++ (
      if (zorder)
        Seq(graft.expressions.NativeKernels.mortonValueCol(
          col(clusterCols.head).cast("long"),
          col(clusterCols(1)).cast("long")))
      else if (hilbert)
        Seq(graft.expressions.NativeKernels.hilbertValueCol(
          col(clusterCols.head).cast("long"),
          col(clusterCols(1)).cast("long")))
      else clusterCols.map(col))
    // one range exchange orders the whole table; the writer then
    // splits each range task by partition dir, so within every dir
    // each file holds a contiguous cluster-key slice
    val laid = batch
      .repartitionByRange(nParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val staged = stageFiles(laid, root, snap.partitionCols,
      filesPerPartition, distribute = false, colMap = snap.colMap)
    commitReplacing(root,
      snap.files.keySet ++ staged.keySet, staged.files,
      snap.partitionCols, expectedBase = Some(snap),
      batchSchema = Some(batch.schema), store = store, kind = "compact",
      newStats = staged.stats)
  }

  /** Garbage-collect the data plane: delete files referenced by NO
    * retained manifest, and manifests older than the newest
    * `keepVersions`. Orphans from killed writers and files only
    * reachable through expired snapshots are reclaimed; every
    * retained version stays fully readable (time travel unaffected
    * within the retention window). Safe against in-flight writers:
    * only files older than `minAgeMs` are touched, so a staged-but-
    * not-yet-committed upsert younger than the grace window is never
    * swept. Returns the number of files deleted.
    */
  /** Build per-file bloom indexes over `cols` (Delta's
    * BLOOMFILTER INDEX role — see [[BloomIndex]] for the full scale
    * contract): ONE dv-aware pass over the files that lack an entry
    * for some requested column (incremental by construction — files
    * indexed by a prior build are skipped, so the steady-state cost
    * after ingest is proportional to the NEW files), partial bitsets
    * reduce by (file, column), the sidecar lands under `root/index/`,
    * and a metadata-only `kind=index` commit references it. Files
    * without zone-map stats are skipped (sizing needs the row count);
    * they simply stay unpruned. Returns the committed version (the
    * current one when nothing needed indexing).
    */
  def indexBloom(spark: SparkSession, root: String, cols: Seq[String],
      fpp: Double = 0.01,
      store: CommitStore = HardlinkCommitStore): Long = {
    require(cols.nonEmpty, "indexBloom: no columns given")
    require(fpp > 0 && fpp < 0.5, s"indexBloom: fpp out of range: $fpp")
    val snap = currentSnapshot(root, store).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val schema = snap.schema.getOrElse(throw new IllegalStateException(
      s"indexBloom: $root has no committed schema"))
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val typed = cols.map { c =>
      val dt = byName.getOrElse(c, throw new IllegalArgumentException(
        s"indexBloom: no column $c in " +
          schema.fieldNames.mkString(", ")))
      require(BloomIndex.indexableKey(dt),
        s"indexBloom: $c: $dt is not an indexable key domain " +
          "(integral or string)")
      (c, dt)
    }
    val all = snap.files.values.flatten.toSeq
    val targets = all.filter(f => snap.stats.contains(f) &&
      cols.exists(c => !snap.blooms.getOrElse(f, Map.empty).contains(c)))
    if (targets.isEmpty) return snap.version
    val uriToFile = targets.map(f =>
      Paths.get(root).resolve(f).normalize().toUri.toString -> f).toMap
    val rowsOf = targets.map(f => f -> snap.stats(f).rows).toMap
    val sidecarRel =
      s"index/${java.util.UUID.randomUUID().toString.take(12)}"
    val sidecarAbs = Paths.get(root).resolve(sidecarRel).toString
    val tagged = readFileSubsetTagged(spark, root, targets, snap)
    BloomIndex.buildSidecar(spark, tagged, typed, uriToFile, rowsOf,
      fpp, sidecarAbs)
    val ref = BloomIndex.Ref(sidecarRel)
    val newBlooms = targets.map { f =>
      val have = snap.blooms.getOrElse(f, Map.empty)
      f -> (have ++ cols.filterNot(have.contains).map(_ -> ref))
    }.toMap
    commitReplacing(root, Set.empty, Map.empty, snap.partitionCols,
      store = store, kind = "index", newBlooms = newBlooms)
  }

  def vacuum(root: String, keepVersions: Int = 10,
      minAgeMs: Long = 3600000L,
      store: CommitStore = HardlinkCommitStore,
      // Delta's VACUUM DRY RUN: report what WOULD be reclaimed —
      // manifests, data files, dv/index sidecars — without touching
      // anything (the pre-flight every retention runbook wants)
      dryRun: Boolean = false): Int = {
    val versions = store.listVersions(root).sorted
    if (versions.isEmpty) return 0
    val keep = versions.takeRight(math.max(keepVersions, 1))
    val referenced: Set[Path] = keep.flatMap { v =>
      readManifest(root, v, store).files.values.flatten
        .map(f => Paths.get(root).resolve(f).normalize())
    }.toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    var deleted = 0
    // expired manifests first, so a concurrent reader can no longer
    // resolve a snapshot whose files are about to disappear
    var wouldDelete = 0
    for (v <- versions if !keep.contains(v)) {
      if (dryRun) wouldDelete += 1
      else store.delete(root, v)
    }
    val dd = dataDir(root)
    if (Files.isDirectory(dd)) {
      val candidates = {
        val w = Files.walk(dd)
        try w.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
        finally w.close()
      }
      for (f <- candidates
           if !referenced.contains(f.normalize())
           if Files.getLastModifiedTime(f).toMillis < cutoff) {
        if (!dryRun) Files.deleteIfExists(f)
        deleted += 1
      }
    }
    // deletion-vector sidecars: keep every dv dir a retained manifest
    // references (relative refs only — absolute refs point into a
    // SOURCE lake this clone must never touch); the rest are orphans
    // of purged/rewritten files and expired versions
    val referencedDvs: Set[Path] = keep.flatMap { v =>
      readManifest(root, v, store).dvs.values.flatMap(_.paths)
        .filterNot(p => Paths.get(p).isAbsolute)
        .map(p => Paths.get(root).resolve(p).normalize())
    }.toSet
    val dvDir = Paths.get(root, "dv")
    if (Files.isDirectory(dvDir)) {
      val dirs = {
        val l = Files.list(dvDir)
        try l.iterator().asScala.toSeq finally l.close()
      }
      for (d <- dirs
           if !referencedDvs.contains(d.normalize())
           if Files.getLastModifiedTime(d).toMillis < cutoff) {
        if (!dryRun) deleteRecursively(d)
        deleted += 1
      }
    }
    // bloom-index sidecars: same retention rule as dv sidecars —
    // keep every index dir a retained manifest references (relative
    // refs only; absolute refs point into a source lake)
    val referencedBlooms: Set[Path] = keep.flatMap { v =>
      readManifest(root, v, store).blooms.values
        .flatMap(_.values.map(_.path))
        .filterNot(p => Paths.get(p).isAbsolute)
        .map(p => Paths.get(root).resolve(p).normalize())
    }.toSet
    val bloomDir = Paths.get(root, "index")
    if (Files.isDirectory(bloomDir)) {
      val dirs = {
        val l = Files.list(bloomDir)
        try l.iterator().asScala.toSeq finally l.close()
      }
      for (d <- dirs
           if !referencedBlooms.contains(d.normalize())
           if Files.getLastModifiedTime(d).toMillis < cutoff) {
        if (!dryRun) deleteRecursively(d)
        deleted += 1
      }
    }
    // leftover staging dirs past the grace window are dead writers
    val st = Paths.get(root, "_staging")
    if (Files.isDirectory(st)) {
      val dirs = {
        val l = Files.list(st)
        try l.iterator().asScala.toSeq finally l.close()
      }
      for (d <- dirs if Files.getLastModifiedTime(d).toMillis < cutoff)
        if (!dryRun) deleteRecursively(d)
    }
    // non-dry keeps the historical contract (data files + sidecars);
    // a dry run ALSO tallies the expired manifests it would remove
    if (dryRun) deleted + wouldDelete else deleted
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val w = Files.walk(p)
      val all = try w.iterator().asScala.toSeq finally w.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
}

/** Refcounted per-session conf scope for the lake's staging writes:
  * the FIRST enter records each key's original setting and forces the
  * staging values; the LAST exit restores the originals. Plain
  * save/restore is not reentrant — with two concurrent
  * [[AtomicLake.stageFiles]] writers on one session, the second would
  * capture the first's temporary values as the ones to restore,
  * pinning them for the session's lifetime.
  *
  * Two keys are forced:
  *  - AQE off: the staging exchange is an EXPLICIT repartition for
  *    file-count control — AQE only splits shuffle+write into two
  *    sequential jobs and its coalescing could defeat
  *    filesPerPartition.
  *  - parquet timestamps as INT64 µs (not legacy INT96): value-exact
  *    either way (Spark is µs internally), but INT96 footer
  *    statistics are deprecated/unusable — LAKE files must carry
  *    min/max so [[LakeStats]] zone maps can prune timestamp
  *    predicates. Scoped here, not session-wide, so non-lake outputs
  *    keep whatever encoding the session default gives them.
  */
private[graft] object AqeScope {
  private val Forced: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS")
  private val depth =
    new java.util.IdentityHashMap[SparkSession, (Int, Map[String, String])]()

  def enter(spark: SparkSession): Unit = depth.synchronized {
    depth.get(spark) match {
      case null =>
        val original = Forced.map { case (k, _) =>
          k -> spark.conf.getOption(k).getOrElse("")
        }.toMap
        depth.put(spark, (1, original))
        Forced.foreach { case (k, v) => spark.conf.set(k, v) }
      case (n, original) => depth.put(spark, (n + 1, original))
    }
  }

  def exit(spark: SparkSession): Unit = depth.synchronized {
    depth.get(spark) match {
      case null => // unbalanced exit: nothing sane to restore
      case (1, original) =>
        depth.remove(spark)
        original.foreach { case (k, v) =>
          if (v.isEmpty) spark.conf.unset(k) else spark.conf.set(k, v)
        }
      case (n, original) => depth.put(spark, (n - 1, original))
    }
  }
}
