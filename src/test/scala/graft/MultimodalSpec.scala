package graft

import graft.operators.{FramePackDecoder, MediaRow, Multimodal}
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  describe("Multimodal") {
    it("bridges a DataFrame into a typed media Dataset") {
      val media = Multimodal.asMedia(Tables.documents(spark, sf),
        "doc_id", "text", kind = "image")
      media.count() shouldBe Tables.documents(spark, sf).count()
      val r = media.head()
      r.kind shouldBe "image"
      r.payload.length should be > 0
    }
    it("extracts deterministic features per asset") {
      val media = Multimodal.asMedia(Tables.documents(spark, sf),
        "doc_id", "text", kind = "image")
      val f1 = Multimodal.extractFeatures(media)
        .collect().map(f => f.media_id -> (f.checksum, f.width,
          f.height, f.embedding.toSeq)).toMap
      val f2 = Multimodal.extractFeatures(media)
        .collect().map(f => f.media_id -> (f.checksum, f.width,
          f.height, f.embedding.toSeq)).toMap
      f1 shouldBe f2
      f1.values.map(_._1).toSet.size should be > 1 // checksums vary
    }
    it("decodedChecksums is the exact decoded-payload identity: " +
        "hand-computed pixels, int16 round-trip, loud on undecodable") {
      // image: a 2x1 PNG with known pixels — checksum is the
      // hand-computed position-weighted sum over getRGB & 0xffffff
      val img = new java.awt.image.BufferedImage(2, 1,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x010203)
      img.setRGB(1, 0, 0x0a0b0c)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val rows = Seq(MediaRow(7L, "image", bos.toByteArray, "{}")).toDS()
      val got = Multimodal.decodedChecksums(rows).head()
      got.width shouldBe 2
      got.height shouldBe 1
      got.decoded_checksum shouldBe (0x010203L * 1 + 0x0a0b0cL * 2)
      // a transposed pixel changes the weighted sum (a plain sum
      // would not see it)
      img.setRGB(0, 0, 0x0a0b0c); img.setRGB(1, 0, 0x010203)
      val bos2 = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos2)
      val swapped = Multimodal.decodedChecksums(
        Seq(MediaRow(8L, "image", bos2.toByteArray, "{}")).toDS()).head()
      swapped.decoded_checksum should not be got.decoded_checksum
      // audio: the int16 -> float -> int16 round-trip is lossless, so
      // the checksum equals the sum over the WRITTEN samples
      val wav = Multimodal.syntheticWav(3L, sampleRate = 8000,
        seconds = 0.02)
      val a = Multimodal.decodedChecksums(
        Seq(MediaRow(9L, "audio", wav, "{}")).toDS()).head()
      a.width shouldBe 8000 // sample_rate rides the width slot
      a.height shouldBe 1
      a.n_frames shouldBe 160
      val samples = Multimodal.decodePcmSamples(wav).get._2
      val want = samples.zipWithIndex.map { case (s, i) =>
        math.rint(s.toDouble * 32768.0).toLong * (i + 1) }.sum
      a.decoded_checksum shouldBe want
      // identity gate fails loudly on undecodable payloads — no
      // silent stub checksums
      val bad = Seq(MediaRow(10L, "image", Array[Byte](1, 2, 3),
        "{}")).toDS()
      an[org.apache.spark.SparkException] should be thrownBy
        Multimodal.decodedChecksums(bad).collect()
    }
    it("keeps kind-specific frame semantics") {
      val rows = Seq(
        MediaRow(1L, "image", Array[Byte](1, 2, 3), "{}"),
        MediaRow(2L, "video", Array[Byte](1, 2, 3), "{}"),
        MediaRow(3L, "audio", Array[Byte](1, 2, 3), "{}")).toDS()
      val f = Multimodal.extractFeatures(rows)
        .collect().map(r => r.kind -> r.n_frames).toMap
      f("image") shouldBe 1
      f("video") should be >= 1
      f("audio") should be >= 1
    }
    it("MediaDecoder seam: an injected audio decoder replaces the stub " +
        "without touching Multimodal") {
      // a codec-equipped deployment's decoder, simulated: claims
      // audio, "decodes" to fixed dims + a recognizable embedding
      object FakeAudioDecoder extends graft.operators.MediaDecoder {
        val kinds = Set("audio")
        def decode(kind: String, payload: Array[Byte]) =
          if (kind == "audio" && payload.nonEmpty)
            Some(graft.operators.DecodedMedia(1, payload.length,
              payload.length * 100, Array(42.0f)))
          else None
      }
      val rows = Seq(
        MediaRow(1L, "audio", Array[Byte](1, 2, 3, 4), "{}"),
        MediaRow(2L, "audio", Array[Byte](), "{}"), // rejected → stub
        MediaRow(3L, "image", Array[Byte](1, 2, 3), "{}")).toDS()
      val f = Multimodal.extractFeatures(rows, FakeAudioDecoder)
        .collect().map(r => r.media_id -> r).toMap
      // claimed + decoded: the injected decoder's output verbatim
      f(1L).n_frames shouldBe 400
      f(1L).embedding.toSeq shouldBe Seq(42.0f)
      // claimed but rejected: degrades to the deterministic stub
      f(2L).embedding.toSeq shouldBe
        Multimodal.embedStub(Array[Byte]()).toSeq
      // unclaimed kind (image, and this decoder doesn't claim it):
      // stub path, same as before injection
      f(3L).embedding.toSeq shouldBe
        Multimodal.embedStub(Array[Byte](1, 2, 3)).toSeq
    }
    it("decodes REAL PCM audio: true rate/channels/frames + an energy " +
        "envelope that reflects the samples") {
      val wav = Multimodal.syntheticWav(7L, sampleRate = 8000,
        seconds = 0.25)
      val rows = Seq(
        MediaRow(1L, "audio", wav, "{}"),
        MediaRow(2L, "audio", Array[Byte](9, 9, 9), "{}"), // not audio
        MediaRow(3L, "video", wav, "{}")).toDS() // unclaimed kind
      val f = Multimodal.extractFeatures(rows)
        .collect().map(r => r.media_id -> r).toMap
      // true format facts from the RIFF header
      f(1L).width shouldBe 8000 // sample rate
      f(1L).height shouldBe 1 // mono
      f(1L).n_frames shouldBe 2000 // 0.25s × 8000Hz
      // a hand-built pure amplitude ramp: the REAL energy envelope
      // must be monotone-increasing — the byte-hash stub could never
      // produce this structure
      val n = 2000
      val rampPcm = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val v = ((i.toDouble / n) *
          math.sin(2 * math.Pi * 200.0 * i / 8000.0) * 32767.0)
          .toInt.toShort
        rampPcm(2 * i) = (v & 0xff).toByte
        rampPcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val rampWav = {
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(rampPcm),
          new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false),
          n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      val rampFeat = Multimodal.extractFeatures(
        Seq(MediaRow(9L, "audio", rampWav, "{}")).toDS()).head()
      val env = rampFeat.embedding
      env.length shouldBe 8
      env.toSeq.sliding(2).foreach { case Seq(a, b) => a should be < b }
      f(1L).embedding.length shouldBe 8
      // undecodable audio degrades to the stub
      f(2L).embedding.toSeq shouldBe
        Multimodal.embedStub(Array[Byte](9, 9, 9)).toSeq
      // video is unclaimed by the JDK decoder: stub, even for a
      // payload that happens to BE a wav
      f(3L).embedding.toSeq shouldBe Multimodal.embedStub(wav).toSeq
    }
    it("resampleAudio halves the rate for real and never upsamples") {
      val wav = Multimodal.syntheticWav(5L, sampleRate = 8000,
        seconds = 0.25)
      val down = Multimodal.resampleAudio(wav, 4000).get
      val Some((fmt, s)) = Multimodal.decodePcmSamples(down)
      fmt.getSampleRate.toInt shouldBe 4000
      fmt.getChannels shouldBe 1
      s.length shouldBe 1000 // 0.25s × 4000Hz
      // the loudness SHAPE survives decimation: envelope fingerprints
      // of original and resampled stay within a small Hamming distance
      val a = Multimodal.audioHash64(wav).get
      val b = Multimodal.audioHash64(down).get
      java.lang.Long.bitCount(a ^ b) should be <= 6
      // never upsamples: target >= source returns the payload as-is
      Multimodal.resampleAudio(wav, 16000).get shouldBe wav
      // undecodable → None, not a crash
      Multimodal.resampleAudio(Array[Byte](1, 2, 3), 4000) shouldBe None
    }
    it("audio decode is deterministic and seed-sensitive") {
      val a1 = Multimodal.extractFeatures(
        Seq(MediaRow(1L, "audio", Multimodal.syntheticWav(7L), "{}")).toDS())
        .head().embedding.toSeq
      val a2 = Multimodal.extractFeatures(
        Seq(MediaRow(1L, "audio", Multimodal.syntheticWav(7L), "{}")).toDS())
        .head().embedding.toSeq
      val b = Multimodal.extractFeatures(
        Seq(MediaRow(1L, "audio", Multimodal.syntheticWav(8L), "{}")).toDS())
        .head().embedding.toSeq
      a1 shouldBe a2
      a1 should not be b
    }
    it("decodes REAL PNG payloads: true dimensions + pixel embedding") {
      val media = Multimodal.syntheticImages(
        Tables.documents(spark, sf).limit(40), "doc_id")
      val feats = Multimodal.extractFeatures(media).collect()
      feats.length shouldBe 40
      // true dimensions, exactly as encoded (w = 16 + id%17, h = 12 + id%11)
      feats.foreach { f =>
        f.width shouldBe 16 + (f.media_id % 17).toInt
        f.height shouldBe 12 + (f.media_id % 11).toInt
        f.n_frames shouldBe 1
        f.embedding.length shouldBe 8
        // grid-luminance cells are means of 0..255 pixels
        f.embedding.foreach { v =>
          v should be >= 0.0f
          v should be <= 255.0f
        }
      }
      // content-sensitive: different images → different embeddings
      feats.map(_.embedding.toSeq).toSet.size should be > 1
    }
    it("imageEmbedding reflects pixel content exactly") {
      // a half-black / half-white image: left cells 0, right cells 255
      val img = new java.awt.image.BufferedImage(8, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 4 until 8) img.setRGB(x, y, 0xffffff)
      val e = Multimodal.imageEmbedding(img, gx = 4, gy = 2)
      e.toSeq shouldBe Seq(0f, 0f, 255f, 255f, 0f, 0f, 255f, 255f)
    }
    it("resizeImage downscales for real and never upscales") {
      val png = Multimodal.syntheticPng(7L, w = 64, h = 32)
      val small = Multimodal.resizeImage(png, maxDim = 16).get
      val dec = Multimodal.decodeImage(small).get
      dec.getWidth shouldBe 16
      dec.getHeight shouldBe 8 // aspect preserved
      // already fits → unchanged payload
      Multimodal.resizeImage(small, maxDim = 100).get
        .toSeq shouldBe small.toSeq
      // non-image bytes → None, not a crash
      Multimodal.resizeImage(Array[Byte](1, 2, 3), 16) shouldBe None
    }
    it("undecodable image payloads fall back to the stub, not a crash") {
      val rows = Seq(MediaRow(1L, "image", Array[Byte](9, 9, 9), "{}")).toDS()
      val f = Multimodal.extractFeatures(rows).collect().head
      f.width should be > 0 // stub dims
      f.checksum shouldBe {
        val c = new java.util.zip.CRC32(); c.update(Array[Byte](9, 9, 9)); c.getValue
      }
    }
    it("resize decimates deterministically; frame sampling is uniform") {
      val payload = Array.tabulate(1000)(i => (i % 127).toByte)
      val small = Multimodal.resizeStub(payload, 100)
      small.length shouldBe 100
      small.toSeq shouldBe Multimodal.resizeStub(payload, 100).toSeq
      Multimodal.resizeStub(small, 1000).toSeq shouldBe small.toSeq // no upscale
      Multimodal.frameSampleStub(10, 3).toSeq shouldBe Seq(0, 3, 6, 9)
      Multimodal.frameSampleStub(5, 1).toSeq shouldBe Seq(0, 1, 2, 3, 4)
    }

    it("is a narrow plan - no shuffle in the physical plan") {
      val media = Multimodal.asMedia(Tables.documents(spark, sf),
        "doc_id", "text", kind = "image")
      val plan = Multimodal.extractFeatures(media)
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
    }
  }

  describe("GVID frame-pack video") {
    it("container round-trips frame payloads exactly") {
      val frames = (0 until 5).map(f =>
        Multimodal.syntheticPng(f.toLong, w = 20, h = 14))
      val packed = Multimodal.packVideo(frames)
      val back = Multimodal.unpackVideo(packed).get
      back.size shouldBe 5
      back.zip(frames).foreach { case (a, b) =>
        a.toSeq shouldBe b.toSeq
      }
    }
    it("malformed containers degrade to None, never throw") {
      Multimodal.unpackVideo(Array[Byte]()) shouldBe None
      Multimodal.unpackVideo("not a video".getBytes) shouldBe None
      val truncated = Multimodal.packVideo(
        Seq(Multimodal.syntheticPng(1L))).dropRight(10)
      Multimodal.unpackVideo(truncated) shouldBe None
    }
    it("decodes true dims + header frame count, sampling frames") {
      val frames = (0 until 8).map(f =>
        Multimodal.syntheticPng(100L + f, w = 24, h = 18))
      val d = FramePackDecoder
        .decode("video", Multimodal.packVideo(frames)).get
      d.width shouldBe 24
      d.height shouldBe 18
      d.nFrames shouldBe 8 // from the container header, not the sample
      // embedding is the MEAN of the uniform-stride sample's per-frame
      // embeddings: stride 8/4=2 → frames 0,2,4,6
      val sampled = Seq(0, 2, 4, 6).map(i =>
        Multimodal.imageEmbedding(Multimodal.decodeImage(frames(i)).get))
      val want = Array.tabulate(sampled.head.length)(c =>
        (sampled.map(_(c).toDouble).sum / sampled.size).toFloat)
      d.embedding.toSeq shouldBe want.toSeq
    }
    it("a corrupt frame inside a valid container degrades to the stub") {
      val good = Multimodal.syntheticPng(7L)
      val bad = Array.fill[Byte](64)(0x3f)
      // all sampled frames undecodable → None → stub path downstream
      FramePackDecoder.decode("video",
        Multimodal.packVideo(Seq(bad))) shouldBe None
      // but one good sampled frame is enough to decode for real
      FramePackDecoder.decode("video",
        Multimodal.packVideo(Seq(good, bad))) should not be None
    }
    it("nearDuplicateVideos pairs planted twins and only those") {
      // ids 1/11 share seed (mod 10 here), 2/12 likewise; 3 is alone
      def vid(id: Long, seed: Long) = {
        val (w, h) = (16 + (seed % 13).toInt, 12 + (seed % 9).toInt)
        MediaRow(id, "video", Multimodal.packVideo(
          (0 until 3).map(f => Multimodal.syntheticPng(seed * 131 + f, w, h))),
          "{}")
      }
      val ds = Seq(vid(1, 1), vid(11, 1), vid(2, 2), vid(12, 2),
        vid(3, 3)).toDS()
      val pairs = Multimodal.nearDuplicateVideos(ds, maxDist = 1)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      pairs shouldBe Set((1L, 11L), (2L, 12L))
    }
    it("extractFeatures over a synthetic video corpus is end-to-end") {
      val vids = Multimodal.syntheticVideos(
        Tables.documents(spark, sf).limit(30), "doc_id")
      val f = Multimodal.extractFeatures(vids).collect()
      f.length shouldBe 30
      f.foreach { r =>
        r.width shouldBe 16 + (r.media_id % 13).toInt
        r.height shouldBe 12 + (r.media_id % 9).toInt
        r.n_frames shouldBe 2 + (r.media_id % 7).toInt
        r.embedding.length shouldBe 8
      }
    }
  }

  describe("Multimodal.decodePcmSamples encoding gate") {
    it("returns None for non-integer-PCM payloads (ULAW) instead of garbage") {
      // A ULAW .au stream: the JDK reader accepts it, but its bytes are
      // companded — integer-PCM math on them is silent corruption, so
      // the decoder contract demands None.
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.ULAW,
        8000f, 8, 1, 1, 8000f, false)
      val raw = Array.tabulate[Byte](800)(i => (i % 251).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, raw.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.AU, bos)
      Multimodal.decodePcmSamples(bos.toByteArray) shouldBe None
    }
    it("decodes unsigned 8-bit PCM around the 128 midpoint") {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        8000f, 8, 1, 1, 8000f, false)
      // constant 128 = digital silence in unsigned 8-bit
      val raw = Array.fill[Byte](400)(128.toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, raw.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val Some((_, s)) = Multimodal.decodePcmSamples(bos.toByteArray)
      all(s.map(math.abs(_))) should be < 0.01f
    }
  }

  describe("Multimodal.audioHash64 / nearDuplicateAudio") {
    it("is volume-invariant: uniform gain never changes the fingerprint") {
      val wav = Multimodal.syntheticWav(11L)
      // halve the PCM amplitude by decoding + re-encoding at 0.5 gain
      val Some((fmt, s)) = Multimodal.decodePcmSamples(wav)
      val pcm = new Array[Byte](s.length * 2)
      s.indices.foreach { i =>
        val v = (s(i) * 0.5f * 32767.0f).toInt.toShort
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val quiet = {
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, s.length.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      val (Some(a), Some(b)) =
        (Multimodal.audioHash64(wav), Multimodal.audioHash64(quiet))
      java.lang.Long.bitCount(a ^ b) should be <= 2 // quantization edge
    }
    it("separates different loudness shapes; excludes silence") {
      val a = Multimodal.audioHash64(Multimodal.syntheticWav(1L)).get
      // a different seed changes partials but keeps the same ramp →
      // envelopes stay similar; build a genuinely different SHAPE by
      // reversing the ramp (decode seed 1, reverse samples, re-encode)
      val Some((fmt, s)) = Multimodal.decodePcmSamples(
        Multimodal.syntheticWav(1L))
      val rev = s.reverse
      val pcm = new Array[Byte](rev.length * 2)
      rev.indices.foreach { i =>
        val v = (rev(i) * 32767.0f).toInt.toShort
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val reversed = {
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, rev.length.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      val b = Multimodal.audioHash64(reversed).get
      java.lang.Long.bitCount(a ^ b) should be > 16
      // silence is envelope-flat → excluded from hashing, like flat
      // images
      val silentPcm = new Array[Byte](4000)
      val silence = {
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(silentPcm),
          new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false),
          2000L)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      val rows = Seq(MediaRow(1L, "audio", silence, "{}")).toDS()
      Multimodal.audioHashes(rows).count() shouldBe 0
    }
    it("finds planted twin recordings and only those") {
      val media = (0L until 60L).map { id =>
        MediaRow(id, "audio", Multimodal.syntheticWav(id % 20), "{}")
      }.toDS()
      val pairs = Multimodal.nearDuplicateAudio(media, maxDist = 1)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val expected = (for {
        a <- 0L until 60L; b <- (a + 1) until 60L
        if a % 20 == b % 20
      } yield (a, b)).toSet
      pairs shouldBe expected
    }
  }

  describe("Multimodal.imageHash64 / nearDuplicateImages") {
    def decode(b: Array[Byte]) = Multimodal.decodeImage(b).get
    val base = Multimodal.syntheticPng(7, 32, 24)

    it("is invariant under re-encoding and stable under slight noise") {
      val img = decode(base)
      val h0 = Multimodal.imageHash64(img)
      // re-encode the same pixels through the PNG writer
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.imageHash64(decode(bos.toByteArray)) shouldBe h0
      // nudge one pixel's blue channel: at most a whisker of drift
      val noisy = decode(base)
      noisy.setRGB(3, 3, noisy.getRGB(3, 3) ^ 0x01)
      java.lang.Long.bitCount(
        Multimodal.imageHash64(noisy) ^ h0) should be <= 2
    }
    // structurally distinct fixtures: a vertical split and its
    // inverse have complementary cell patterns (hamming ≈ 64);
    // same-generator synthetic PNGs share their gradient and ARE
    // perceptually similar — which the twin test below exploits
    def splitPng(leftDark: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32)
        img.setRGB(x, y,
          if ((x < 16) == leftDark) 0x101010 else 0xf0f0f0)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    it("separates genuinely different images") {
      val h1 = Multimodal.imageHash64(decode(splitPng(true)))
      val h2 = Multimodal.imageHash64(decode(splitPng(false)))
      java.lang.Long.bitCount(h1 ^ h2) should be > 32
    }
    def solidPng(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    it("excludes flat images instead of pairing black with white") {
      // aHash is degenerate on structure-free images: every cell ties
      // with the mean, so solid black and solid white would both hash
      // to all-ones and pair at distance 0 — they must be excluded
      val rows = Seq(
        MediaRow(1L, "image", solidPng(0x000000), "black"),
        MediaRow(2L, "image", solidPng(0xffffff), "white"),
        MediaRow(3L, "image", base, "textured"))
        .toDS()
      Multimodal.nearDuplicateImages(rows).count() shouldBe 0
      Multimodal.imageHashes(rows).select($"media_id").as[Long]
        .collect().toSet shouldBe Set(3L)
    }

    it("finds planted perceptual duplicates and only those") {
      val rows = Seq(
        MediaRow(1L, "image", base, "p1"),
        MediaRow(2L, "image", base, "p2"), // exact perceptual twin
        MediaRow(3L, "image", splitPng(true), "p3"),
        MediaRow(4L, "image", splitPng(false), "p4"),
        MediaRow(5L, "image", Array[Byte](1, 2, 3), "broken"))
        .toDS()
      val pairs = Multimodal.nearDuplicateImages(rows)
        .select($"id1", $"id2", $"hamming_dist")
        .as[(Long, Long, Int)].collect()
      pairs.map(p => (p._1, p._2)).toSet shouldBe Set((1L, 2L))
      pairs.head._3 shouldBe 0
    }
    it("shuffles fingerprints, never pixels") {
      val rows = Seq(MediaRow(1L, "image", base, "p")).toDS()
      val plan = Multimodal.nearDuplicateImages(rows)
        .queryExecution.executedPlan.toString
      // the payload column must not survive past the map-side hash
      "payload".r.findAllIn(
        plan.linesIterator.filter(_.contains("Exchange")).mkString
      ).length shouldBe 0
    }
  }
}
