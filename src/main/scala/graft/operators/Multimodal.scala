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

/** Result of a successful media decode: true dimensions, frame count,
  * and a content-derived embedding.
  */
final case class DecodedMedia(width: Int, height: Int, nFrames: Int,
    embedding: Array[Float])

/** Decoded-payload identity for one asset (the E11 hash-gate row):
  * true decode dimensions plus a position-weighted integer checksum
  * over the DECODED payload — pixel RGB grid for images, int16 PCM
  * samples for audio. For audio, `width`/`height` carry
  * sample_rate/channels (the [[MediaFeatures]] convention).
  */
final case class DecodedId(media_id: Long, kind: String, width: Int,
    height: Int, n_frames: Int, decoded_checksum: Long)

/** Pluggable decode kernel — the seam a codec-equipped deployment uses
  * to add audio/video (FFI to ffmpeg, a JNI codec, a model runtime)
  * WITHOUT patching [[Multimodal]]. Instances ship inside the
  * `mapPartitions` closure, so implementations must be Serializable
  * and must do per-partition initialization in [[setup]] (called once
  * per partition on the executor — the slot for codec-context /
  * native-library loading), never in a constructor that runs on the
  * driver.
  *
  * Contract: [[decode]] returns None for any payload it cannot handle
  * (wrong kind, corrupt bytes); the caller routes those to the
  * deterministic stub path so one bad blob degrades instead of
  * killing the job.
  */
trait MediaDecoder extends Serializable {
  /** The `kind` values this decoder claims (e.g. Set("image")). */
  def kinds: Set[String]
  /** Once-per-partition executor-side init; default no-op. */
  def setup(): Unit = ()
  def decode(kind: String, payload: Array[Byte]): Option[DecodedMedia]
}

/** JDK ImageIO decoder for `image` payloads (PNG/BMP/JPEG/GIF —
  * wired into every JRE, no external codec).
  */
object ImageIoDecoder extends MediaDecoder {
  val kinds: Set[String] = Set("image")
  // ImageIO's default disk-backed stream cache costs a temp file per
  // decode — keep it in memory
  override def setup(): Unit = javax.imageio.ImageIO.setUseCache(false)
  def decode(kind: String, payload: Array[Byte]): Option[DecodedMedia] =
    if (kind != "image") None
    else Multimodal.decodeImage(payload).map(img =>
      DecodedMedia(img.getWidth, img.getHeight, 1,
        Multimodal.imageEmbedding(img)))
}

/** JDK `javax.sound.sampled` decoder for `audio` payloads — REAL
  * decode for the PCM container formats every JRE reads (WAV, AIFF,
  * AU): true sample rate / channels / frame count plus an 8-window
  * RMS energy-envelope embedding from the actual samples (the
  * classic tiny audio descriptor — loudness shape over time, so
  * cosine over it is meaningful). Compressed codecs (mp3/aac/ogg)
  * are not in the JDK; those payloads return None and degrade to the
  * stub until a codec-backed [[MediaDecoder]] is injected.
  *
  * Mapping into [[DecodedMedia]]: width = sample rate (Hz),
  * height = channels, nFrames = PCM frame count.
  */
object WavDecoder extends MediaDecoder {
  val kinds: Set[String] = Set("audio")
  def decode(kind: String, payload: Array[Byte]): Option[DecodedMedia] =
    if (kind != "audio") None
    else Multimodal.decodePcmSamples(payload).map { case (fmt, samples) =>
      DecodedMedia(fmt.getSampleRate.toInt, fmt.getChannels,
        samples.length / math.max(fmt.getChannels, 1),
        Multimodal.rmsEnvelope(samples, 8))
    }
}

/** Route each kind to the first claiming decoder — the composition
  * point where a deployment stacks codec-backed decoders beside the
  * JDK defaults.
  */
final case class CompositeDecoder(decoders: Seq[MediaDecoder])
    extends MediaDecoder {
  val kinds: Set[String] = decoders.flatMap(_.kinds).toSet
  override def setup(): Unit = decoders.foreach(_.setup())
  def decode(kind: String, payload: Array[Byte]): Option[DecodedMedia] =
    decoders.iterator.filter(_.kinds(kind))
      .map(_.decode(kind, payload)).collectFirst { case Some(d) => d }
}

/** Frame-pack decoder for `video` payloads in the GVID container
  * (magic + frame count + length-prefixed PNG frames — see
  * [[Multimodal.packVideo]]): REAL per-frame ImageIO decode, but only
  * of the UNIFORM-STRIDE SAMPLE of frames — the policy real video
  * pipelines run, and the property that makes the cost ∝ sampled
  * frames rather than stream length. Dimensions come from the first
  * sampled frame; the embedding is the per-cell MEAN of the sampled
  * frames' grid-luminance embeddings (the standard mean-pooled video
  * descriptor). Compressed codecs (h264/vp9/av1) are not in the JDK;
  * such payloads fail the container parse, return None, and degrade
  * to the stub until a codec-backed [[MediaDecoder]] is injected.
  */
object FramePackDecoder extends MediaDecoder {
  val kinds: Set[String] = Set("video")
  override def setup(): Unit = javax.imageio.ImageIO.setUseCache(false)
  def decode(kind: String, payload: Array[Byte]): Option[DecodedMedia] =
    if (kind != "video") None
    else Multimodal.unpackVideo(payload).flatMap { frames =>
      val idx = Multimodal.frameSampleStub(frames.length,
        every = math.max(frames.length / 4, 1))
      val imgs = idx.flatMap(i => Multimodal.decodeImage(frames(i)))
      if (imgs.isEmpty) None
      else {
        val embs = imgs.map(Multimodal.imageEmbedding(_))
        val mean = Array.tabulate(embs.head.length)(d =>
          (embs.map(_(d).toDouble).sum / embs.length).toFloat)
        Some(DecodedMedia(imgs.head.getWidth, imgs.head.getHeight,
          frames.length, mean))
      }
    }
}

/** The default decoder: every format the bare JDK can decode —
  * ImageIO images + PCM audio + GVID frame-pack video. Compressed
  * video codecs have no JDK decoder; those payloads fall through to
  * the honest stub until a deployment injects one.
  */
object JdkMediaDecoder extends MediaDecoder {
  private val inner =
    CompositeDecoder(Seq(ImageIoDecoder, WavDecoder, FramePackDecoder))
  val kinds: Set[String] = inner.kinds
  override def setup(): Unit = inner.setup()
  def decode(kind: String, payload: Array[Byte]): Option[DecodedMedia] =
    inner.decode(kind, payload)
}

/** Multimodal column plumbing (SURVEY.md §2 E11): treat image/audio/
  * video as `binary` columns, run decode / resize / frame-sample /
  * feature-extract per partition.
  *
  * The IMAGE leg is REAL: `decodeImage` decodes PNG/BMP/JPEG/GIF
  * payloads with the JDK's built-in `javax.imageio` (no external
  * codec needed), yielding true width/height and a pixel-derived
  * grid-luminance embedding, and `resizeImage` is a real
  * area-interpolated resampler. The AUDIO leg is REAL for PCM
  * containers: `decodePcmSamples` reads WAV/AIFF/AU with the JDK's
  * `javax.sound.sampled` (true rate/channels/frames, sample-derived
  * RMS-envelope embedding), `audioHash64`/`nearDuplicateAudio` give
  * volume-invariant perceptual dedup, and `resampleAudio` is a real
  * decimating resampler. COMPRESSED audio (mp3/aac/ogg) and VIDEO
  * have no JDK codec and stay STUBS — `decodeStub` derives
  * deterministic fake dimensions for those (and for payloads that
  * fail to decode, so a corrupt blob degrades instead of killing the
  * job; real pipelines would route those to a quarantine table);
  * inject a codec-backed [[MediaDecoder]] to fill them. The
  * Spark-side plumbing is real for all kinds:
  * typed Dataset schema, per-partition batched execution via
  * `mapPartitions` (one kernel-context setup per partition — the
  * ImageIO cache config today, the same slot a JNI/FFI decoder
  * needs), and a narrow no-shuffle plan.
  *
  * Scale notes: mapPartitions is narrow (no shuffle); payloads never
  * move between executors. Control partition sizes upstream with
  * `spark.sql.files.maxPartitionBytes` so a partition's media fits the
  * kernel's memory.
  */
object Multimodal {

  /** Decode an image payload with the JDK's ImageIO (PNG/BMP/JPEG/GIF
    * wired into every JRE). None for bytes no registered reader
    * accepts — the caller decides whether that's a stub fallback or a
    * quarantine row.
    */
  def decodeImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    scala.util.Try(Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))).toOption.flatten

  /** Pixel-derived embedding: mean luminance (ITU-R BT.601 weights)
    * over a `gx`×`gy` grid of the decoded image — the classic tiny
    * perceptual descriptor (a dHash cousin kept real-valued so cosine
    * similarity over it is meaningful). Deterministic in the pixels.
    */
  def imageEmbedding(img: java.awt.image.BufferedImage,
      gx: Int = 4, gy: Int = 2): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Double](gx * gy)
    val counts = new Array[Long](gx * gy)
    var y = 0
    while (y < h) {
      val cy = math.min(y * gy / h, gy - 1)
      var x = 0
      while (x < w) {
        val cx = math.min(x * gx / w, gx - 1)
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        val c = cy * gx + cx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gx * gy)(i =>
      if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat)
  }

  /** 64-bit average-hash (aHash) of a decoded image: mean luminance
    * over an 8×8 grid ([[imageEmbedding]]'s cells), bit i set when
    * cell i is at or above the grid mean. Small Hamming distance ⟺
    * perceptually similar — robust to re-encoding and mild
    * resize/noise, not to crops/rotations; the standard first-line
    * image-dedup fingerprint.
    */
  def imageHash64(img: java.awt.image.BufferedImage): Long =
    hashFromCells(imageEmbedding(img, gx = 8, gy = 8))

  private def hashFromCells(cells: Array[Float]): Long = {
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += cells(i); i += 1 }
    mean /= 64.0
    var h = 0L
    i = 0
    while (i < 64) {
      if (cells(i) >= mean) h |= 1L << i
      i += 1
    }
    h
  }

  /** True when the image has essentially no luminance structure (all
    * 8×8 cells within `eps` of each other). Flat images are aHash-
    * degenerate: every cell ties with the mean, so ALL of them — a
    * black placeholder and a white banner alike — collapse to the
    * same fingerprint and would pair as "duplicates" at distance 0.
    */
  def isFlatImage(img: java.awt.image.BufferedImage,
      eps: Double = 1.0): Boolean =
    flatFromCells(imageEmbedding(img, gx = 8, gy = 8), eps)

  private def flatFromCells(cells: Array[Float], eps: Double): Boolean =
    cells.max - cells.min < eps

  /** (media_id, fp) perceptual hashes for every DECODABLE,
    * NON-DEGENERATE image row — undecodable payloads are excluded
    * (no perceptual content to hash; route them to the quarantine
    * path), and flat/solid-color images are excluded too (their
    * aHash is meaningless — see [[isFlatImage]]; exact-byte dedup is
    * the right operator for placeholders). One decode per row,
    * map-side only.
    */
  def imageHashes(ds: Dataset[MediaRow]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter((r: MediaRow) => r.kind == "image")
      .flatMap { (r: MediaRow) =>
        decodeImage(r.payload).flatMap { img =>
          // ONE full-pixel pass serves both the flatness gate and the
          // hash (two imageEmbedding calls would double the map CPU)
          val cells = imageEmbedding(img, gx = 8, gy = 8)
          if (flatFromCells(cells, 1.0)) None
          else Some((r.media_id, hashFromCells(cells)))
        }
      }
      .toDF("media_id", "fp")
  }

  /** Perceptual near-duplicate image pairs: aHash fingerprints
    * bucket-joined by the pigeonhole chunks
    * ([[SimHash.pairsFromFingerprints]] — complete for
    * maxDist < chunks), verified by exact Hamming distance. The image
    * twin of text SimHash dedup: decode + hash map-side, shuffle only
    * (chunk, bucket, id) triples — no pixels cross the wire.
    */
  def nearDuplicateImages(ds: Dataset[MediaRow], maxDist: Int = 4,
      chunks: Int = 8): DataFrame =
    SimHash.pairsFromFingerprints(imageHashes(ds), "media_id", "fp",
      bits = 64, maxDist = maxDist, chunks = chunks)

  /** 64-bit perceptual video fingerprint: the aHash of the
    * mean-pooled 8×8 grid-luminance over the UNIFORM-STRIDE frame
    * sample (the same sample [[FramePackDecoder]] decodes) — decode +
    * hash map-side like the image/audio legs; sample-identical videos
    * collide at Hamming 0, flat (single-tone) videos are excluded
    * like flat images. Undecodable containers drop (stub-degrade).
    */
  def videoHashes(ds: Dataset[MediaRow]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter((r: MediaRow) => r.kind == "video")
      .flatMap { (r: MediaRow) =>
        unpackVideo(r.payload).flatMap { frames =>
          val idx = frameSampleStub(frames.length,
            every = math.max(frames.length / 4, 1))
          val imgs = idx.flatMap(i => decodeImage(frames(i)))
          if (imgs.isEmpty) None
          else {
            val cells = imgs.map(imageEmbedding(_, gx = 8, gy = 8))
            val mean = Array.tabulate(64)(c =>
              (cells.map(_(c).toDouble).sum / cells.length).toFloat)
            if (flatFromCells(mean, 1.0)) None
            else Some((r.media_id, hashFromCells(mean)))
          }
        }
      }
      .toDF("media_id", "fp")
  }

  /** Perceptual near-duplicate video pairs — the video leg of
    * [[nearDuplicateImages]]/[[nearDuplicateAudio]]: fingerprints
    * bucket-joined by pigeonhole chunks, verified by exact Hamming
    * distance; only (chunk, bucket, id) triples shuffle, never frames.
    */
  def nearDuplicateVideos(ds: Dataset[MediaRow], maxDist: Int = 4,
      chunks: Int = 8): DataFrame =
    SimHash.pairsFromFingerprints(videoHashes(ds), "media_id", "fp",
      bits = 64, maxDist = maxDist, chunks = chunks)

  /** REAL image resize: area-interpolated resample to fit inside
    * `maxDim`×`maxDim` (aspect preserved, never upscales), re-encoded
    * as PNG. None when the payload isn't a decodable image.
    */
  def resizeImage(payload: Array[Byte], maxDim: Int)
      : Option[Array[Byte]] =
    decodeImage(payload).map { img =>
      val scale = math.min(1.0,
        maxDim.toDouble / math.max(img.getWidth, img.getHeight))
      if (scale >= 1.0) payload
      else {
        val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
          math.max(1, (img.getHeight * scale).toInt))
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }

  /** Deterministic synthetic PNG: a `w`×`h` gradient-plus-hash pattern
    * seeded by `seed`, encoded through the real PNG writer — the test
    * asset generator that lets the decode path run for real in a
    * sandbox with no image files (and a handy fixture for any
    * pipeline's unit tests).
    */
  def syntheticPng(seed: Long, w: Int = 16, h: Int = 12): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = seed * 6364136223846793005L + (y.toLong * w + x) * 1442695040888963407L
        val r = (((m >>> 33) & 0xff) + x * 255 / w) / 2
        val g = (((m >>> 41) & 0xff) + y * 255 / h) / 2
        val b = ((m >>> 49) & 0xff).toInt
        img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** STUB decoder for kinds with no codec in this sandbox (audio,
    * video) and for image payloads no reader accepts: deterministic
    * pseudo-dimensions from payload bytes. Replace with a real codec
    * (e.g. via FFI) in production.
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

  /** Per-partition feature extraction over a typed media Dataset.
    * Decode goes through the injected [[MediaDecoder]] (default:
    * [[JdkMediaDecoder]] — REAL ImageIO image decode + REAL PCM audio
    * decode, true dimensions/rates + content embeddings); kinds the
    * decoder doesn't claim, and payloads it rejects, degrade to the
    * deterministic stub path.
    */
  def extractFeatures(ds: Dataset[MediaRow],
      decoder: MediaDecoder = JdkMediaDecoder): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { rows =>
      decoder.setup() // once per partition, executor-side
      rows.map { r =>
        val decoded =
          if (decoder.kinds(r.kind)) decoder.decode(r.kind, r.payload)
          else None
        decoded match {
          case Some(d) =>
            MediaFeatures(r.media_id, r.kind, r.payload.length,
              crc(r.payload), d.width, d.height, d.nFrames, d.embedding)
          case None =>
            val (w, h, frames) = decodeStub(r.kind, r.payload)
            MediaFeatures(r.media_id, r.kind, r.payload.length,
              crc(r.payload), w, h, frames, embedStub(r.payload))
        }
      }
    }
  }

  /** Decoded-payload identity projection (the E11 hash gate): one
    * map-side pass decoding each asset to its true dimensions plus a
    * position-weighted integer checksum over the DECODED payload —
    * `sum(rgb(x,y) * (y*w + x + 1))` over the pixel grid for images,
    * `sum(s16(i) * (i + 1))` over the PCM samples for 16-bit audio.
    * All integer arithmetic, so a SQL oracle replays it exactly; a
    * transposed, dropped, or corrupted pixel/sample ANYWHERE in the
    * decode changes the weighted sum, which dims or cell means would
    * not necessarily see. Container bytes (PNG/RIFF framing, CRCs,
    * zlib streams) stay spec-only — no SQL engine can re-encode them.
    *
    * Unlike [[extractFeatures]] (the curation operator, which
    * degrades to stubs), this is an IDENTITY gate: an undecodable
    * payload fails loudly rather than silently passing a stub
    * checksum off as decoded content.
    */
  def decodedChecksums(ds: Dataset[MediaRow]): Dataset[DecodedId] = {
    implicit val enc = Encoders.product[DecodedId]
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        r.kind match {
          case "image" =>
            val img = decodeImage(r.payload).getOrElse(
              throw new IllegalArgumentException(
                s"media ${r.media_id}: undecodable image payload"))
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                sum += (img.getRGB(x, y) & 0xffffff).toLong *
                  (y.toLong * w + x + 1)
                x += 1
              }
              y += 1
            }
            DecodedId(r.media_id, r.kind, w, h, 1, sum)
          case "audio" =>
            val (fmt, samples) = decodePcmSamples(r.payload)
              .getOrElse(throw new IllegalArgumentException(
                s"media ${r.media_id}: undecodable audio payload"))
            require(fmt.getSampleSizeInBits == 16,
              s"media ${r.media_id}: decoded-checksum gate covers " +
                s"16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
            // recover the exact int16: s = s16/32768 is exact in
            // float (16-bit mantissa), so the round-trip is lossless
            var sum = 0L
            var i = 0
            while (i < samples.length) {
              sum += math.rint(samples(i).toDouble * 32768.0).toLong *
                (i + 1)
              i += 1
            }
            DecodedId(r.media_id, r.kind, fmt.getSampleRate.toInt,
              fmt.getChannels, samples.length, sum)
          case other => throw new IllegalArgumentException(
            s"media ${r.media_id}: no exact decoder for kind " +
              s"'$other' (image/audio only)")
        }
      }
    }
  }

  // ---- GVID frame-pack container (the video twin of syntheticPng's
  // role: real bytes for a sandbox with no video codec) --------------

  private val VideoMagic = Array[Byte]('G', 'V', 'I', 'D')

  /** Pack PNG frames into a GVID container: magic, int32 frame count,
    * then length-prefixed frame payloads. A deliberately minimal
    * uncompressed container — the point is that frames are REAL
    * encoded images, so the decode path (parse → sample → per-frame
    * ImageIO) exercises everything a production frame extractor does
    * except the inter-frame codec.
    */
  def packVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.write(VideoMagic)
    d.writeInt(frames.size)
    frames.foreach { f => d.writeInt(f.length); d.write(f) }
    d.flush()
    bos.toByteArray
  }

  /** Parse a GVID container back to its frame payloads; None for
    * anything malformed (wrong magic, truncated, absurd counts) — the
    * stub-degrade contract, never an executor exception.
    */
  def unpackVideo(payload: Array[Byte])
      : Option[IndexedSeq[Array[Byte]]] =
    scala.util.Try {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(payload))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, VideoMagic), "not GVID")
      val n = in.readInt()
      require(n >= 0 && n <= (1 << 20), s"frame count $n")
      (0 until n).map { _ =>
        val len = in.readInt()
        require(len >= 0 && len <= payload.length, s"frame len $len")
        val b = new Array[Byte](len)
        in.readFully(b)
        b
      }
    }.toOption

  /** Synthetic video corpus: one GVID container per id with
    * 2 + id%7 real PNG frames (per-frame seed varies, so frames
    * differ within one video), dimensions 16+id%13 × 12+id%9 —
    * formula-derivable like [[syntheticImages]], which is what lets a
    * DuckDB oracle gate the decoded dims end-to-end.
    */
  def syntheticVideos(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    import org.apache.spark.sql.Encoders.scalaLong
    df.select(col(idCol).cast("long")).as[Long](scalaLong)
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val w = 16 + (id % 13).toInt
          val h = 12 + (id % 9).toInt
          val frames = (0 until 2 + (id % 7).toInt)
            .map(f => syntheticPng(id * 131 + f, w, h))
          MediaRow(id, "video", packVideo(frames), s"""{"id":$id}""")
        }
      }
  }

  /** Synthetic image corpus: one REAL PNG per id, dimensions varying
    * with the id — the sandbox's media bronze table. Production
    * pipelines read binary columns straight off parquet; generating
    * the payloads through the real PNG encoder lets the decode path
    * prove itself end-to-end (encode → ImageIO decode → true dims +
    * pixel embedding) without any image files in the container.
    */
  def syntheticImages(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    import org.apache.spark.sql.Encoders.scalaLong
    df.select(col(idCol).cast("long")).as[Long](scalaLong)
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          MediaRow(id, "image",
            syntheticPng(id, w = 16 + (id % 17).toInt,
              h = 12 + (id % 11).toInt),
            s"""{"id":$id}""")
        }
      }
  }

  /** Decode a PCM container payload (WAV/AIFF/AU — the JDK's readers)
    * to its format plus normalized samples in [-1, 1]. None for bytes
    * no reader accepts or an empty stream.
    */
  private[graft] def decodePcmSamples(payload: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Array[Float])] =
    scala.util.Try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        // Integer PCM only: PCM_FLOAT / ULAW / ALAW payloads would
        // decode into garbage under the integer math below — honor
        // the "None for bytes we cannot handle" contract instead.
        val enc = fmt.getEncoding
        val signed =
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed &&
            enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
          throw new javax.sound.sampled
            .UnsupportedAudioFileException(s"non-integer PCM: $enc")
        val bytes = in.readAllBytes()
        val sampleBytes = math.max(fmt.getSampleSizeInBits / 8, 1)
        val big = fmt.isBigEndian
        val n = bytes.length / sampleBytes
        if (n == 0) throw new IllegalArgumentException("empty audio")
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          val off = i * sampleBytes
          out(i) = (sampleBytes match {
            case 1 =>
              if (signed) bytes(off).toDouble / 128.0
              else ((bytes(off) & 0xff) - 128).toDouble / 128.0
            case _ => // use the 16 most significant bits
              val (hi, lo) = if (big) (bytes(off), bytes(off + 1))
                else (bytes(off + sampleBytes - 1),
                  bytes(off + sampleBytes - 2))
              val s16 =
                if (signed) ((hi << 8) | (lo & 0xff)).toShort.toInt
                else (((hi & 0xff) << 8) | (lo & 0xff)) - 32768
              s16.toDouble / 32768.0
          }).toFloat
          i += 1
        }
        (fmt, out)
      } finally in.close()
    }.toOption

  /** Per-window RMS energy of a sample stream — the loudness-shape
    * descriptor behind the audio embedding (8 windows) and the audio
    * fingerprint (64 windows).
    */
  private[graft] def rmsEnvelope(samples: Array[Float],
      windows: Int): Array[Float] = {
    val env = new Array[Double](windows)
    val cnt = new Array[Long](windows)
    val n = samples.length
    var i = 0
    while (i < n) {
      val w = math.min(i.toLong * windows / n, windows - 1L).toInt
      env(w) += samples(i).toDouble * samples(i)
      cnt(w) += 1
      i += 1
    }
    Array.tabulate(windows)(w =>
      if (cnt(w) == 0) 0.0f else math.sqrt(env(w) / cnt(w)).toFloat)
  }

  /** 64-bit audio fingerprint: bit i set when the i-th of 64 RMS
    * energy windows is at or above the envelope mean — the loudness-
    * shape twin of [[imageHash64]]. Mean-relative bits make it
    * VOLUME-INVARIANT (uniform gain scales every window equally);
    * small Hamming distance ⟺ same loudness shape. None for
    * undecodable payloads; silence/constant tones are aHash-
    * degenerate exactly like flat images — exclude via the flatness
    * gate before pairing.
    */
  def audioHash64(payload: Array[Byte]): Option[Long] =
    decodePcmSamples(payload).map { case (_, s) =>
      hashFromCells(rmsEnvelope(s, 64))
    }

  /** (media_id, fp) fingerprints for every decodable, non-degenerate
    * audio row — decode + envelope map-side only, the [[imageHashes]]
    * twin.
    */
  def audioHashes(ds: Dataset[MediaRow], eps: Double = 1e-4)
      : DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter((r: MediaRow) => r.kind == "audio")
      .flatMap { (r: MediaRow) =>
        decodePcmSamples(r.payload).flatMap { case (_, s) =>
          val cells = rmsEnvelope(s, 64)
          if (flatFromCells(cells, eps)) None
          else Some((r.media_id, hashFromCells(cells)))
        }
      }
      .toDF("media_id", "fp")
  }

  /** Perceptual near-duplicate audio pairs: envelope fingerprints
    * bucket-joined by pigeonhole chunks, verified by exact Hamming
    * distance — the audio twin of [[nearDuplicateImages]]: decode +
    * hash map-side, only (chunk, bucket, id) triples shuffle.
    */
  def nearDuplicateAudio(ds: Dataset[MediaRow], maxDist: Int = 4,
      chunks: Int = 8): DataFrame =
    SimHash.pairsFromFingerprints(audioHashes(ds), "media_id", "fp",
      bits = 64, maxDist = maxDist, chunks = chunks)

  /** REAL audio resample: decode PCM, mix down to mono (channel
    * mean), decimate to `targetRate` by mean-pooling sample blocks (a
    * box filter — adequate anti-aliasing for envelope/feature
    * pipelines), re-encode 16-bit PCM mono WAV. Returns the payload
    * unchanged when it already meets the target (never upsamples —
    * the [[resizeImage]] contract), None when the payload isn't
    * decodable PCM.
    */
  def resampleAudio(payload: Array[Byte], targetRate: Int)
      : Option[Array[Byte]] =
    decodePcmSamples(payload).map { case (fmt, interleaved) =>
      val srcRate = fmt.getSampleRate.toInt
      if (targetRate >= srcRate) payload
      else {
        val ch = math.max(fmt.getChannels, 1)
        val nFrames = interleaved.length / ch
        val mono = new Array[Float](nFrames)
        var i = 0
        while (i < nFrames) {
          var s = 0.0f
          var c = 0
          while (c < ch) { s += interleaved(i * ch + c); c += 1 }
          mono(i) = s / ch
          i += 1
        }
        val outN = math.max((nFrames.toLong * targetRate / srcRate).toInt, 1)
        val pcm = new Array[Byte](outN * 2)
        var o = 0
        while (o < outN) {
          val from = (o.toLong * nFrames / outN).toInt
          val until = math.max(((o + 1).toLong * nFrames / outN).toInt,
            from + 1)
          var s = 0.0
          var j = from
          while (j < until) { s += mono(j); j += 1 }
          val v = ((s / (until - from)) * 32767.0).toInt.toShort
          pcm(2 * o) = (v & 0xff).toByte
          pcm(2 * o + 1) = ((v >> 8) & 0xff).toByte
          o += 1
        }
        val outFmt = new javax.sound.sampled.AudioFormat(
          targetRate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), outFmt, outN.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
    }

  /** Deterministic synthetic WAV: `seconds` of a seed-derived chord,
    * amplitude-modulated by a seed-derived 16-segment loudness
    * pattern (each segment loud or quiet by one seed bit), 16-bit PCM
    * mono, written through the real RIFF encoder — the audio twin of
    * [[syntheticPng]]: lets the PCM decode path run for real in a
    * sandbox with no audio files. The SHAPE of the loudness envelope
    * (not just its magnitude) varies with the seed, so envelope
    * fingerprints separate different seeds and pair equal ones.
    */
  def syntheticWav(seed: Long, sampleRate: Int = 8000,
      seconds: Double = 0.25): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val f1 = 180.0 + math.floorMod(seed, 200L)
    val f2 = 500.0 + math.floorMod(seed >> 7, 700L)
    val bits = seed * 6364136223846793005L + 1442695040888963407L
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val t = i.toDouble / sampleRate
      val seg = math.min(i * 16L / n, 15L).toInt
      val amp = if (((bits >>> seg) & 1L) == 1L) 0.95 else 0.25
      val v = amp * (0.6 * math.sin(2 * math.Pi * f1 * t)
        + 0.3 * math.sin(2 * math.Pi * f2 * t))
      val s = (v * 32767.0).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
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
