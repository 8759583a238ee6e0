package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque binary payload + typed metadata. */
final case class MediaRow(media_id: Long, kind: String,
    payload: Array[Byte], meta: String)

/** Extracted features for one asset. `width/height/n_frames` come from
  * the (stubbed) decoder; `checksum`/`n_bytes` from the raw payload;
  * `embedding` from the (stubbed) feature kernel.
  */
final case class MediaFeatures(media_id: Long, kind: String,
    n_bytes: Int, checksum: Long, width: Int, height: Int,
    n_frames: Int, embedding: Array[Float])

/** Multimodal column plumbing (SURVEY.md §2 E11): treat image/audio/
  * video as `binary` columns, run decode / resize / frame-sample /
  * feature-extract per partition.
  *
  * The DECODE KERNELS ARE STUBS — this container has no image/audio
  * codecs, so `decodeStub` derives deterministic fake dimensions and
  * `embedStub` a deterministic fake embedding from the payload bytes.
  * The Spark-side plumbing is real: typed Dataset schema, per-partition
  * batched execution via `mapPartitions` (one kernel-context setup per
  * partition, the same shape a JNI/FFI decoder needs), and a narrow
  * no-shuffle plan. Swap the two stub functions for real codecs and
  * nothing else changes.
  *
  * Scale notes: mapPartitions is narrow (no shuffle); payloads never
  * move between executors. Control partition sizes upstream with
  * `spark.sql.files.maxPartitionBytes` so a partition's media fits the
  * kernel's memory.
  */
object Multimodal {

  /** STUB decoder: deterministic pseudo-dimensions from payload bytes.
    * Replace with a real codec (e.g. via FFI) in production.
    */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 64 + math.floorMod(h, 1024)
    val ht = 64 + math.floorMod(h >> 10, 1024)
    val frames = kind match {
      case "video" => 1 + math.floorMod(h >> 20, 240)
      case "audio" => 1 + math.floorMod(h >> 20, 16000)
      case _ => 1
    }
    (w, ht, frames)
  }

  /** STUB feature kernel: deterministic 8-dim embedding from a rolling
    * byte hash. Replace with a real model runtime in production.
    */
  def embedStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      val d = i % dim
      out(d) = out(d) * 31.0f + (payload(i) & 0xff)
      out(d) = out(d) % 1e6f
      i += 1
    }
    out
  }

  /** STUB resize kernel: deterministic byte-decimation to a target
    * "pixel" budget — stands in for a real bilinear/area resampler;
    * the per-partition batching and output shape are the real part.
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      val step = payload.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) {
        out(i) = payload((i * step).toInt)
        i += 1
      }
      out
    }
  }

  /** STUB frame sampler: every k-th frame index for a decoded stream
    * of `nFrames` — the uniform-stride policy real video pipelines
    * start from.
    */
  def frameSampleStub(nFrames: Int, every: Int): Array[Int] =
    (0 until nFrames by math.max(every, 1)).toArray

  private def crc(payload: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(payload)
    c.getValue
  }

  /** Per-partition feature extraction over a typed media Dataset. */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { rows =>
      // one kernel context per partition would be initialized here
      rows.map { r =>
        val (w, h, frames) = decodeStub(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          crc(r.payload), w, h, frames, embedStub(r.payload))
      }
    }
  }

  /** Build a typed media Dataset from any DataFrame with an id and a
    * binary (or castable) payload column — the bronze→media bridge.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        col(payloadCol).cast("binary").as("payload"),
        to_json(struct(col(idCol))).as("meta"))
      .as[MediaRow]
  }
}
