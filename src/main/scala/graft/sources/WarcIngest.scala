package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, DataInputStream, EOFException, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record (or a per-record parse failure — the JSONL
  * quarantine contract: a corrupt record surfaces as a row carrying
  * its reason, it never kills the task or silently vanishes).
  */
final case class WarcRecord(
    file: String, record_index: Int, warc_type: String,
    record_id: String, target_uri: String, warc_date: String,
    content_type: String, http_status: Integer,
    http_content_type: String, body: Array[Byte], error: String)

/** WARC (ISO 28500 / WARC/1.0-1.1) web-archive ingest — the source
  * format web-crawl corpora arrive in (SURVEY.md §2 A9). Records are
  * STREAM-parsed: each task opens its files through the Hadoop
  * filesystem and walks record by record (header block → declared
  * Content-Length payload → record separator), so memory is bounded
  * by one record, never one archive — a multi-GB `.warc.gz` reads in
  * constant space (gzip members stream through the JDK inflater).
  *
  * Distribution contract: gzipped WARCs are not splittable, so the
  * unit of parallelism is the FILE (exactly how crawl dumps ship:
  * many ~1 GB segment files). The path listing is driver-side
  * O(files); each file becomes one task.
  *
  * `response` records additionally parse the stored HTTP message:
  * status code, Content-Type header, and the entity body (what a
  * text pipeline actually wants); other record types (warcinfo /
  * request / metadata) keep their raw payload with null HTTP fields.
  *
  * Reference basis: the public WARC spec and the Common Crawl layout;
  * no reference-repo counterpart (LLM-pipeline scale addition).
  */
object WarcIngest {

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Read every WARC record under `glob` (plain or `.gz` — sniffed by
    * magic bytes, not filename). One row per record; corrupt records
    * or trailing garbage produce an `error` row for the file instead
    * of an exception.
    */
  def records(spark: SparkSession, glob: String): Dataset[WarcRecord] = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(glob)
    val fs = p.getFileSystem(conf.value)
    val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .filter(_.isFile).map(_.getPath.toString).sorted
    implicit val enc = Encoders.product[WarcRecord]
    import spark.implicits._
    spark.createDataset(files)(Encoders.STRING)
      .repartition(math.max(files.size, 1))
      .mapPartitions { paths =>
        paths.flatMap { file =>
          openRecords(file, () => new Path(file)
            .getFileSystem(conf.value).open(new Path(file)))
        }
      }
  }

  /** Open one WARC stream as a record iterator under the quarantine
    * contract: a failure OPENING the stream (unreadable file, corrupt
    * gzip header — GZIPInputStream's constructor reads it) is one
    * error row for the file, never an exception. Mid-stream
    * corruption is handled inside [[RecordIterator]].
    */
  private def openRecords(file: String, mk: () => InputStream)
      : Iterator[WarcRecord] =
    try {
      val buf = new BufferedInputStream(mk(), 1 << 16)
      val in: InputStream =
        if (isGzip(buf)) new GZIPInputStream(buf, 1 << 16) else buf
      new RecordIterator(file, new DataInputStream(
        new BufferedInputStream(in, 1 << 16)))
    } catch {
      // IOException only (ZipException/EOFException are IOExceptions):
      // a genuine code bug (NPE, index error) must FAIL the task, not
      // masquerade as an 'unreadable file' quarantine row
      case e: java.io.IOException =>
        Iterator.single(WarcRecord(file, 0, null, null, null, null,
          null, null, null, Array.emptyByteArray,
          s"unreadable file (${e.getClass.getSimpleName}: " +
            s"${e.getMessage})"))
    }

  /** [[records]] narrowed to HTTP `response` records with a decoded
    * UTF-8 text body — the crawl→documents bridge.
    */
  def responses(spark: SparkSession, glob: String): DataFrame =
    records(spark, glob).toDF()
      .filter(col("error").isNull && col("warc_type") === "response")
      .select(col("file"), col("target_uri"), col("warc_date"),
        col("http_status"), col("http_content_type"),
        col("body").cast("string").as("text"))

  /** Streaming crawl ingest: tail a landing directory of WARC files
    * (the crawl-drop workflow — segments land as whole files) as a
    * record stream; same parse, same quarantine rows as [[records]].
    * The streaming variant rides the binary-file source, so its
    * memory bound is one FILE per row rather than one record — the
    * right trade for how drops actually land (bounded segment files);
    * a tail over multi-GB archives belongs on the batch reader.
    */
  def stream(spark: SparkSession, dir: String): Dataset[WarcRecord] = {
    implicit val enc = Encoders.product[WarcRecord]
    import org.apache.spark.sql.types._
    spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .option("pathGlobFilter", "*.warc*")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])](
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (p, bytes) => parseBytes(p, bytes) }
  }

  /** Per-micro-batch sink for a [[stream]] frame — the JsonlIngest
    * ingestSink posture at the WARC boundary: parsed `response`
    * records append atomically to the lake at `tablePath` as
    * (target_uri, warc_date, http_status, http_content_type, text);
    * error rows land in `quarantinePath` with file + reason. A
    * poisoned segment file slows nothing and loses nothing.
    *
    * Exactly-once: each append is tagged with (appId, batchId)
    * through the manifest's txn watermark, so a micro-batch the
    * checkpoint redelivers (crash between commit and checkpoint
    * advance) is skipped per table instead of appended twice.
    */
  def ingestSink(stream: Dataset[WarcRecord], tablePath: String,
      quarantinePath: String, checkpoint: String,
      store: CommitStore = HardlinkCommitStore)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    val appId = s"warc-ingest:$checkpoint"
    stream.toDF().writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pinned = batch.localCheckpoint()
        try {
          val clean = pinned
            .filter(col("error").isNull && col("warc_type") === "response")
            .select(col("target_uri"), col("warc_date"),
              col("http_status"), col("http_content_type"),
              col("body").cast("string").as("text"))
          val bad = pinned.filter(col("error").isNotNull)
            .select(col("file"), col("error"))
          def fresh(root: String): Boolean =
            !AtomicLake.lastTxn(root, appId, store).exists(_ >= batchId)
          if (fresh(tablePath) && !clean.isEmpty)
            AtomicLake.append(clean, tablePath, store = store,
              txn = Some(appId -> batchId))
          if (fresh(quarantinePath) && !bad.isEmpty)
            AtomicLake.append(bad, quarantinePath, store = store,
              txn = Some(appId -> batchId))
        } finally pinned.unpersist(blocking = false)
        ()
      }
  }

  /** Parse one in-memory WARC payload (plain or gzipped) — the
    * record walk behind [[stream]]; shares every code path with the
    * batch reader.
    */
  private[graft] def parseBytes(file: String, bytes: Array[Byte])
      : Iterator[WarcRecord] =
    openRecords(file, () => new java.io.ByteArrayInputStream(bytes))

  private def isGzip(in: BufferedInputStream): Boolean = {
    in.mark(2)
    val (a, b) = (in.read(), in.read())
    in.reset()
    a == 0x1f && b == 0x8b
  }

  /** Streaming record walker: reads one header block + payload at a
    * time; any structural violation yields a single error row and
    * ends the file (nothing after a corrupt length marker can be
    * trusted — resynchronization would risk fabricating records).
    */
  private final class RecordIterator(file: String, in: DataInputStream)
      extends Iterator[WarcRecord] {
    private var idx = 0
    private var nextRec: WarcRecord = _
    private var done = false

    override def hasNext: Boolean = {
      if (nextRec == null && !done) advance()
      nextRec != null
    }
    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }

    private def fail(msg: String): Unit = {
      nextRec = WarcRecord(file, idx, null, null, null, null, null,
        null, null, Array.emptyByteArray, msg)
      done = true
      try in.close()
      catch { case _: java.io.IOException => () }
    }

    /** Every read in the walk funnels through here so mid-stream
      * decompression failures (ZipException / "Unexpected end of
      * ZLIB input stream" from a truncated or corrupt .warc.gz —
      * both IOExceptions the inflater throws from ANY read call)
      * honor the same error-row contract as structural violations.
      */
    private def advance(): Unit =
      try advanceRecord()
      catch {
        // IOException only: header/length parsing already degrades via
        // Try, so a RuntimeException here is a walker bug that must
        // fail the task, not become a quarantine row
        case e: java.io.IOException =>
          fail(s"record $idx: unreadable stream " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage})")
      }

    private def advanceRecord(): Unit = {
      // skip inter-record blank lines; EOF here is a clean end
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine()
      if (line == null) { done = true; in.close(); return }
      if (!line.startsWith("WARC/"))
        return fail(s"record $idx: expected WARC/ version, got '" +
          line.take(40) + "'")
      val headers = scala.collection.mutable.Map.empty[String, String]
      var h = readLine()
      while (h != null && h.nonEmpty) {
        val colonAt = h.indexOf(':')
        if (colonAt > 0)
          headers(h.substring(0, colonAt).trim.toLowerCase) =
            h.substring(colonAt + 1).trim
        h = readLine()
      }
      if (h == null)
        return fail(s"record $idx: EOF inside header block")
      val len = headers.get("content-length").flatMap(s =>
        scala.util.Try(s.toLong).toOption)
      if (len.isEmpty)
        return fail(s"record $idx: missing/invalid Content-Length")
      if (len.get > (1L << 31) - 16)
        return fail(s"record $idx: payload ${len.get} exceeds the " +
          "2 GiB per-record bound")
      val payload = new Array[Byte](len.get.toInt)
      try in.readFully(payload)
      catch { case _: EOFException =>
        return fail(s"record $idx: truncated payload " +
          s"(declared ${len.get})")
      }
      val wtype = headers.getOrElse("warc-type", "")
      val (status, httpCt, body) =
        if (wtype == "response") parseHttp(payload)
        else (null: Integer, null: String, payload)
      nextRec = WarcRecord(file, idx, wtype,
        headers.getOrElse("warc-record-id", null),
        headers.getOrElse("warc-target-uri", null),
        headers.getOrElse("warc-date", null),
        headers.getOrElse("content-type", null),
        status, httpCt, body, null)
      idx += 1
    }

    /** One CRLF- (or bare-LF-) terminated ASCII/UTF-8 line; null at
      * EOF before any byte.
      */
    private def readLine(): String = {
      val out = new ByteArrayOutputStream(96)
      var c = in.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') {
        if (c != '\r') out.write(c)
        c = in.read()
      }
      out.toString("UTF-8")
    }
  }

  /** Split a stored HTTP response message into (status, Content-Type,
    * entity body). A payload that is not an HTTP message (no status
    * line) comes back whole with null status — degrade, don't drop.
    */
  private[graft] def parseHttp(payload: Array[Byte])
      : (Integer, String, Array[Byte]) = {
    val sep = indexOfDoubleCrlf(payload)
    val head = new String(payload, 0,
      if (sep >= 0) sep else math.min(payload.length, 1 << 16), "UTF-8")
    val lines = head.split("\r\n|\n")
    val statusLine = lines.headOption.getOrElse("")
    if (!statusLine.startsWith("HTTP/"))
      return (null, null, payload)
    val status: Integer = statusLine.split(" ").lift(1)
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .map(Integer.valueOf).orNull
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }.orNull
    val body =
      if (sep >= 0) java.util.Arrays.copyOfRange(payload, sep + 4,
        payload.length)
      else Array.emptyByteArray
    (status, ct, body)
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  // ------------------------------------------------------------------
  // Writer — the export face (and the spec/gate fixture): real WARC
  // bytes through the same framing the reader parses.
  // ------------------------------------------------------------------

  /** Serialize one `response` record (stored HTTP 200 message). */
  def responseRecordBytes(uri: String, date: String, body: Array[Byte],
      httpContentType: String = "text/plain; charset=utf-8",
      recordId: String = null): Array[Byte] = {
    val http = new ByteArrayOutputStream()
    http.write(("HTTP/1.1 200 OK\r\nContent-Type: " + httpContentType +
      s"\r\nContent-Length: ${body.length}\r\n\r\n").getBytes("UTF-8"))
    http.write(body)
    val payload = http.toByteArray
    val id = if (recordId != null) recordId
      else "<urn:graft:" + Integer.toHexString(uri.hashCode) + ">"
    val out = new ByteArrayOutputStream()
    out.write(("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: $id\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8"))
    out.write(payload)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** Write records as one WARC file (gzipped when `path` ends .gz)
    * through the Hadoop FS; returns the path.
    */
  def writeWarcFile(spark: SparkSession, path: String,
      records: Seq[Array[Byte]]): String =
    writeWarcFile(spark.sparkContext.hadoopConfiguration, path, records)

  /** Configuration-based twin of [[writeWarcFile]] for executor-side
    * writers (one file per partition — the export shape).
    */
  def writeWarcFile(conf: org.apache.hadoop.conf.Configuration,
      path: String, records: IterableOnce[Array[Byte]]): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val raw = fs.create(p, true)
    val out = if (path.endsWith(".gz")) new GZIPOutputStream(raw) else raw
    try records.iterator.foreach(out.write)
    finally out.close()
    path
  }
}
