package graft.sources

import java.nio.file.{Files, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** The ONE primitive [[AtomicLake]] needs from its environment to be
  * transactional: claim "version N of the table at `root`" exactly
  * once, with the winning manifest body readable by every reader that
  * can see the claim. Everything else in the lake — staging writes,
  * data files, snapshot resolution, time travel, vacuum — is ordinary
  * (non-atomic) file IO against the data plane.
  *
  * Two implementations, mirroring how real lakehouse formats deploy:
  *
  *  - [[HardlinkCommitStore]] — filesystems with atomic exclusive
  *    link/create (local, NFS, HDFS): the manifest FILE is the claim.
  *  - [[CatalogCommitStore]] — object stores (S3-style), where PUT is
  *    last-writer-wins and there is no create-exclusive: manifest
  *    bodies are written under writer-unique keys (so no PUT ever
  *    races another), and the version claim moves to a transactional
  *    CATALOG — exactly the role the reference hands to DuckLake's
  *    catalog database (Postgres over S3,
  *    /root/reference/dags/utils_db.py:6-60, Sprint-2.md:13), and the
  *    same split Iceberg (catalog) and Delta (commit service on S3)
  *    make. The in-process [[CommitCatalog]] here has the identical
  *    claim semantics a database unique-key insert provides.
  */
trait CommitStore {

  /** Versions committed at `root`, unordered. */
  def listVersions(root: String): Seq[Long]

  /** Manifest body of a committed version. */
  def readBody(root: String, version: Long): String

  /** Atomically publish `body` as `version` iff `version` is
    * unclaimed; returns true iff THIS call claimed it. The body must
    * be fully readable by any reader that can observe the claim (no
    * torn manifests).
    */
  def tryCommit(root: String, version: Long, body: String): Boolean

  /** Drop a committed version (vacuum of expired snapshots). */
  def delete(root: String, version: Long): Unit
}

/** Manifest-file-as-claim over `_manifests/vN`: write the body to a
  * temp file, then atomically hardlink it to the version name — the
  * link fails iff vN exists, and the linked content is already fully
  * written, so a manifest can never be observed half-written and two
  * writers can never both claim N. Requires local/NFS/HDFS link
  * semantics (NOT an object store — use [[CatalogCommitStore]] there).
  */
object HardlinkCommitStore extends CommitStore {

  private def dir(root: String) = Paths.get(root, "_manifests")

  private[sources] def manifestName(v: Long): String = f"v$v%012d"

  override def listVersions(root: String): Seq[Long] = {
    val md = dir(root)
    if (!Files.isDirectory(md)) return Nil
    // close the stream: a graft-lake stream polls this every trigger,
    // and unclosed DirectoryStreams leak fds until GC
    val l = Files.list(md)
    try l.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d{12}"))
      .map(_.drop(1).toLong)
      .toSeq
    finally l.close()
  }

  override def readBody(root: String, version: Long): String =
    new String(Files.readAllBytes(dir(root).resolve(manifestName(version))),
      "UTF-8")

  override def tryCommit(root: String, version: Long, body: String)
      : Boolean = {
    val md = dir(root)
    Files.createDirectories(md)
    val tmp = md.resolve(s".tmp-${UUID.randomUUID().toString.take(12)}")
    Files.write(tmp, body.getBytes("UTF-8"))
    try {
      Files.createLink(md.resolve(manifestName(version)), tmp)
      Files.delete(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.delete(tmp)
        false
    }
  }

  override def delete(root: String, version: Long): Unit =
    Files.deleteIfExists(dir(root).resolve(manifestName(version)))
}

/** The transactional catalog service: an atomic, exactly-once mapping
  * (table root, version) -> manifest object key. In production this is
  * a database table with a primary key on (table, version) — DuckLake's
  * Postgres catalog (the role the reference fills with
  * /root/reference/dags/utils_db.py:6-60), an Iceberg catalog — where
  * "claim" is one INSERT that succeeds for exactly one writer.
  * Implementations: [[CommitCatalog]] (in-process, for exercising the
  * protocol races without a database) and [[JdbcCommitCatalog]] (any
  * JDBC database — the production binding).
  */
trait Catalog {

  /** One writer wins per (root, version); returns true iff this call
    * recorded the claim.
    */
  def claim(root: String, version: Long, key: String): Boolean

  def versions(root: String): Seq[Long]

  def keyFor(root: String, version: Long): Option[String]

  def drop(root: String, version: Long): Unit
}

/** In-process [[Catalog]]: ConcurrentHashMap.putIfAbsent IS the
  * unique-key insert, so the commit protocol can be exercised, races
  * included, without a database in the sandbox.
  */
final class CommitCatalog extends Catalog {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()

  override def claim(root: String, version: Long, key: String): Boolean =
    entries.putIfAbsent((root, version), key) == null

  override def versions(root: String): Seq[Long] =
    entries.keySet().iterator().asScala
      .collect { case (r, v) if r == root => v }.toSeq

  override def keyFor(root: String, version: Long): Option[String] =
    Option(entries.get((root, version)))

  override def drop(root: String, version: Long): Unit =
    entries.remove((root, version))
}

/** Commit store for object stores: the body is PUT under a
  * writer-unique key (`_manifests/m-<uuid>` — unique keys mean no PUT
  * ever contends with another, which is all an S3-style store
  * guarantees), and the version is then claimed in the [[CommitCatalog]].
  * A writer that dies between PUT and claim leaves an unreferenced
  * body object — invisible to every reader (readers resolve version ->
  * key through the catalog only) and harmless; an object-lifecycle
  * rule on unclaimed `m-*` keys reclaims it. The loser of a claim
  * race deletes its own body and retries against the winner's
  * snapshot.
  *
  * The simulated object store here is the local filesystem WITHOUT
  * using any atomic-create/link/rename primitive on shared names —
  * the protocol must stay correct with plain last-writer-wins PUTs,
  * which is what the race spec proves.
  */
final class CatalogCommitStore(catalog: Catalog) extends CommitStore {

  private def put(root: String, key: String, body: String): Unit = {
    val p = Paths.get(root, "_manifests", key)
    Files.createDirectories(p.getParent)
    // plain write, non-exclusive: an object-store PUT
    Files.write(p, body.getBytes("UTF-8"))
  }

  override def listVersions(root: String): Seq[Long] =
    catalog.versions(root)

  override def readBody(root: String, version: Long): String = {
    val key = catalog.keyFor(root, version).getOrElse(
      throw new java.util.NoSuchElementException(
        s"version $version not in catalog for $root"))
    new String(Files.readAllBytes(Paths.get(root, "_manifests", key)),
      "UTF-8")
  }

  override def tryCommit(root: String, version: Long, body: String)
      : Boolean = {
    val key = s"m-${UUID.randomUUID().toString.take(16)}"
    put(root, key, body) // fully durable BEFORE the claim is visible
    if (catalog.claim(root, version, key)) true
    else {
      // lost the race: this body is unreferenced — clean up eagerly
      // (an S3 deployment could equally leave it to vacuum)
      Files.deleteIfExists(Paths.get(root, "_manifests", key))
      false
    }
  }

  override def delete(root: String, version: Long): Unit = {
    catalog.keyFor(root, version).foreach { key =>
      catalog.drop(root, version)
      Files.deleteIfExists(Paths.get(root, "_manifests", key))
    }
  }

  /** Reclaim body objects no catalog claim references — what a writer
    * that died between PUT and claim leaves behind (invisible to all
    * readers, but bytes nonetheless). `minAgeMs` is the same in-flight
    * grace window vacuum applies to data files: a body PUT by a writer
    * that has not claimed YET must not be swept from under it. On a
    * real object store this is an object-lifecycle rule on unclaimed
    * `m-*` keys; here it completes the vacuum story for the spec.
    */
  def sweepOrphans(root: String, minAgeMs: Long = 3600000L): Int = {
    val md = Paths.get(root, "_manifests")
    if (!Files.isDirectory(md)) return 0
    val claimed = catalog.versions(root)
      .flatMap(v => catalog.keyFor(root, v)).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    var swept = 0
    val l = Files.list(md)
    try l.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("m-"))
      .filterNot(p => claimed(p.getFileName.toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
      .foreach { p => Files.deleteIfExists(p); swept += 1 }
    finally l.close()
    swept
  }
}
