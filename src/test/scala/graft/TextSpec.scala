package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Dedup

class TextSpec extends SparkSpec {
  import spark.implicits._

  describe("TextFns") {
    it("identifies marker languages with deterministic tie-break") {
      val df = Seq(
        "the cat and the dog", // en
        "le chat et la mer",   // fr
        "el perro y los gatos", // es
        "xyz qrs")             // none
        .toDF("text").select(TextFns.langId($"text").as("l"))
      df.as[String].collect() shouldBe Array("en", "fr", "es", "und")
    }
    it("counts words ignoring repeated spaces") {
      Seq("a  b   c").toDF("text")
        .select(TextFns.wordCount($"text")).as[Int].head() shouldBe 3
    }
    it("scores punctuation-free prose higher") {
      val Array(clean, noisy) = Seq(
        "the report and the summary of the findings go to the board",
        "!!!,,,...??? ;;; ::: !!!")
        .toDF("text").select(TextFns.qualityScore($"text"))
        .as[Double].collect()
      clean should be > noisy
    }
    it("fingerprints are order-sensitive and stable") {
      val Array(a, b, a2) = Seq("ab", "ba", "ab").toDF("text")
        .select(TextFns.fingerprint($"text")).as[Long].collect()
      a should not be b
      a shouldBe a2
      // h("ab") = ((0*131+97)%p*131+98)%p
      a shouldBe ((97L * 131 + 98) % 1000000007)
    }
  }

  describe("Dedup") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact dup of 1
      (3L, "alpha beta gamma epsilon"), // near dup of 1
      (4L, "completely different text here")
    ).toDF("doc_id", "text")

    it("exact keeps the first copy of duplicate content") {
      val kept = Dedup.exact(docs, "text", "doc_id")
        .select("doc_id").as[Long].collect().sorted
      kept shouldBe Array(1L, 3L, 4L)
    }
    it("exactGroups reports copy counts") {
      Dedup.exactGroups(docs, "text", "doc_id")
        .filter($"n_copies" > 1).select("keep_doc_id", "n_copies")
        .as[(Long, Long)].collect() shouldBe Array((1L, 2L))
    }
    it("ngramJaccard finds planted near-dups and skips unrelated docs") {
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 2, threshold = 0.3)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      pairs should contain((1L, 2L)) // exact dup: jaccard 1.0
      pairs should contain((1L, 3L)) // near dup
      pairs.exists(p => p._1 == 4L || p._2 == 4L) shouldBe false
    }
    it("shingles are distinct n-grams") {
      Seq("a b a b a").toDF("t")
        .select(Dedup.shingles($"t", 2).as("s"))
        .as[Seq[String]].head().sorted shouldBe Seq("a b", "b a")
    }
  }

  describe("TextFns.stripHtml (H20)") {
    def strip(s: String): String =
      Seq(s).toDF("h").select(TextFns.stripHtml($"h").as("t"))
        .as[String].head()

    it("drops script/style WITH content, tags, comments; decodes " +
        "entities; collapses whitespace") {
      strip("<html><script>x<y</script><style>a{b}</style>" +
        "<p class='c'>Hello &amp; <b>world</b></p><!-- hid --></html>"
      ) shouldBe "Hello & world"
      strip("a &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end") shouldBe
        "a <tag> \"q\" 's' end"
    }
    it("malformed markup degrades to keeping text, never dropping it") {
      strip("plain text, no markup") shouldBe "plain text, no markup"
      strip("<p unclosed") shouldBe "<p unclosed"
    }
  }

  describe("TextFns.canonicalUrl (H18)") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(TextFns.canonicalUrl($"u").as("c"))
        .as[String].head()

    it("normalizes case, default ports, slashes, fragments") {
      canon("HTTPS://Example.COM:443/a/b/#frag") shouldBe
        "https://example.com/a/b"
      canon("http://example.com:80") shouldBe "http://example.com/"
      // :443 is NOT default for http — kept
      canon("http://example.com:443/x") shouldBe
        "http://example.com:443/x"
      canon("https://example.com///") shouldBe "https://example.com/"
    }

    it("drops tracking params, sorts the rest") {
      canon("https://e.com/p?utm_source=x&b=2&gclid=1&a=1") shouldBe
        "https://e.com/p?a=1&b=2"
      canon("https://e.com/p?b=2&a=1") shouldBe
        canon("https://e.com/p/?a=1&b=2#x")
    }
  }

  describe("Unicode normalization + mojibake repair (H17)") {
    def nfc(s: String): String =
      Seq(s).toDF("t").select(TextFns.nfcNormalize($"t").as("x"))
        .as[String].head()
    def fix(s: String): String =
      Seq(s).toDF("t").select(TextFns.fixMojibake($"t").as("x"))
        .as[String].head()

    it("composes decomposed sequences to NFC") {
      nfc("café") shouldBe "café"
      nfc("élève") shouldBe "élève"
      // already-NFC text unchanged (fast path)
      nfc("café plain ascii") shouldBe "café plain ascii"
      nfc("") shouldBe ""
    }

    it("repairs classic UTF-8-as-cp1252 mojibake") {
      fix("cafÃ©") shouldBe "café" // Ã© -> é
      // â€™ -> right single quote (needs the cp1252 C1 mapping)
      fix("itâ€™s") shouldBe "it’s"
    }

    it("repairs DOUBLE mojibake in bounded rounds") {
      // encode "é" twice through the mangle: é -> Ã© -> ÃƒÂ©
      val once = new String("é".getBytes("UTF-8"), "windows-1252")
      val twice = new String(once.getBytes("UTF-8"), "windows-1252")
      fix(twice) shouldBe "é"
    }

    it("leaves clean and unrepairable text byte-identical") {
      fix("plain ascii") shouldBe "plain ascii"
      // genuine latin text: é alone does not round-trip as UTF-8
      fix("café") shouldBe "café"
      // MIXED genuine + mojibake: conservative — unchanged, never
      // half-repaired
      fix("café and cafÃ©") shouldBe "café and cafÃ©"
      // chars outside cp1252 entirely
      fix("日本語") shouldBe "日本語"
    }
  }
}
