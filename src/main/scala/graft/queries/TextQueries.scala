package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFns
import graft.operators.Dedup

/** Text-pipeline query family (SURVEY.md §2 E1, E4, E7-E10) over the
  * `documents` table — each hash-gated against a DuckDB oracle.
  */
object TextQueries {

  /** Per-session memo for the trained quality classifier (driver-side
    * weight vector — tiny): see text_quality_model.
    */
  private val qualityModelMemo = new graft.sources
    .SessionMemo[String, graft.operators.QualityModel.Model]()

  private val langIdModelMemo = new graft.sources
    .SessionMemo[String, graft.operators.LangIdModel.Model]()

  val queries: Map[String, Q] = Map(

    // E7 — marker-token language ID with per-language scores.
    "text_langid" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val scored = TextFns.langMarkers.foldLeft(d) { case (df, (l, _)) =>
        df.withColumn(s"score_$l", TextFns.langScore(col("text"), l))
      }
      scored.select(col("doc_id") +:
        TextFns.langMarkers.map { case (l, _) => col(s"score_$l") } :+
        TextFns.langId(col("text")).as("lang_pred"): _*)
    },

    // E8 — quality scoring components + composite.
    "text_quality" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        TextFns.wordCount(col("text")).as("n_words"),
        TextFns.punctRatio(col("text")).as("punct_ratio"),
        TextFns.stopwordRatio(col("text")).as("stopword_ratio"),
        TextFns.qualityScore(col("text")).as("quality_score"))
    },

    // E9 — whitespace + BPE-ish token counting.
    "text_tokens" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFns.wordCount(col("text")).as("ws_tokens"),
        TextFns.bpeishTokenCount(col("text")).as("bpeish_tokens"))
    },

    // E10 — polynomial rolling-hash fingerprint (arith-only).
    "text_fingerprint" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFns.fingerprint(col("text")).as("fingerprint"))
    },

    // H17 — NFC normalization, proven to do real composition work on
    // every row: a decomposed " e<combining acute>" suffix is planted
    // and must come back precomposed. DuckDB's nfc_normalize replays
    // the same Unicode algorithm — any divergence in the kernel's
    // normalization (or the fast path wrongly skipping) mismatches.
    "text_normalize" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFns.nfcNormalize(
          concat(col("text"), lit(" e\u0301"))).as("nfc_text"))
    },

    // H20 — HTML strip: each doc wrapped in planted markup (script +
    // style blocks with droppable content, comments, attributes,
    // entities) must come back as clean text — both engines evaluate
    // the identical regexp chain, so any drift in tag/entity/space
    // handling hash-mismatches.
    "text_strip_html" -> { (s, dir) =>
      val html = concat(
        lit("<html><head><style>p{color:red}</style>" +
          "<script>var a=1;</script></head><body><p class=\"x\">"),
        col("text"),
        lit("</p><!-- note --> &amp; &lt;tail&gt;&nbsp;end" +
          "</body></html>"))
      Tables.documents(s, dir).select(col("doc_id"),
        TextFns.stripHtml(html).as("clean_text"))
    },

    // E1 — exact dedup groups (hash → surviving id + copy count).
    "dedup_exact" -> { (s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir), "text", "doc_id")
    },

    // H19 — trained quality classifier ([R]: L-BFGS over distributed
    // double sums — no engine pins the combine order, so bit-gating
    // is impossible; QualityModelSpec pins separation + the exact
    // scoring form). Weak labels come from the fixed-weight heuristic
    // (E8) — the classifier must re-derive the quality notion from
    // raw features; scoring is a pure codegen column expression.
    "text_quality_model" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // the trained model is a per-session artifact (the clustering-
      // assignments / IVF-index pattern): training runs once, the
      // timed query measures the codegen scoring pass
      val m = qualityModelMemo.getOrElseUpdate(s, dir) {
        val labeled = docs.withColumn("label",
          (TextFns.qualityScore(col("text")) >= 0.55).cast("int"))
        graft.operators.QualityModel.train(
          graft.operators.QualityModel.featurize(labeled, "text"),
          "label")
      }
      graft.operators.QualityModel.score(docs, "text", m)
        .select(col("doc_id"), col("quality_prob"))
    },

    // E7 model tier — TRAINED language ID (the CCNet/fastText shape:
    // hashed byte-n-gram features → multinomial linear classifier;
    // the marker heuristic stays as the cheap gate). Trained once per
    // session on the deterministic planted multilingual corpus (the
    // documents table is monolingual word soup — no label diversity
    // to self-train on), then scores every document through the
    // denseArgmax kernel with the weight matrix as a plan literal.
    // [R] rows-gated (L-BFGS carries last-ulp combine noise — the
    // H19/PCA posture); LangIdSpec pins ≥0.95 held-out separation.
    "text_langid_model" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val m = langIdModelMemo.getOrElseUpdate(s, dir) {
        val corpus = graft.operators.LangIdModel
          .syntheticCorpus(s, perLang = 80, seed = 42L)
        graft.operators.LangIdModel.train(corpus, "text", "lang",
          graft.operators.LangIdModel.vocab.keys.toSeq.sorted)
      }
      graft.operators.LangIdModel.score(docs, "text", m)
        .select(col("doc_id"), col("lang_model"))
    },

    // Composite training-data pipeline — the operators composed the
    // way a corpus-cleaning job actually chains them: quality gate →
    // exact dedup (keep-first) → near-dup removal (drop the higher id
    // of each MinHash-verified pair among survivors) → per-doc stats.
    // Hash-gated end-to-end: every stage's arithmetic is engine-
    // portable and the near-dup pair set equals the exact-Jaccard set
    // (see dedup_minhash).
    "pipe_clean_corpus" -> { (s, dir) =>
      val q = Tables.documents(s, dir)
        .withColumn("quality_score", TextFns.qualityScore(col("text")))
        .filter(col("quality_score") >= 0.55)
      // pin the gated+deduped corpus: nearDuplicates (via its internal
      // shingle-hash frame) and the survivor anti-join both consume
      // `uniq` — without the pin each consumer re-runs the quality
      // gate + dedup agg + semi-join subtree from the parquet scan
      // (round-5's plan read documents.parquet 6×; at 100 TB that is
      // six corpus scans where one does).
      val uniq = Dedup.exact(q, "text", "doc_id").localCheckpoint()
      val losers = graft.operators.MinHashLsh
        .nearDuplicates(uniq, "doc_id", "text", threshold = 0.5)
        .select(col("id2").as("doc_id")).distinct()
      uniq.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          TextFns.wordCount(col("text")).as("ws_tokens"),
          col("quality_score"))
    },

    // Word-repetition quality stats: type-token ratio + top-word
    // ratio per document via the one-pass wordStats kernel — the
    // repetition signals (boilerplate = one token dominating) a
    // corpus quality gate cuts on.
    "text_word_stats" -> { (s, dir) =>
      val base = Tables.documents(s, dir).select(col("doc_id"),
        graft.expressions.NativeKernels.wordStatsCol(col("text")).as("st"))
      val n = element_at(col("st"), 1)
      val d = element_at(col("st"), 2)
      val t = element_at(col("st"), 3)
      base.select(col("doc_id"),
        n.as("n_words"), d.as("n_distinct"), t.as("top_freq"),
        when(n === 0, lit(0.0))
          .otherwise(d.cast("double") / n.cast("double")).as("ttr"),
        when(n === 0, lit(0.0))
          .otherwise(t.cast("double") / n.cast("double")).as("top_ratio"))
    },

    // Benchmark-contamination scoring: fraction of each corpus doc's
    // distinct shingles that appear anywhere in the benchmark set —
    // the n-gram overlap check run before training data ships. The
    // doc_id % 10 == 0 split is a STAND-IN for a real held-out
    // benchmark table, and it is corpus-SCALED (~10% of the corpus's
    // distinct shingles), not bounded the way a real benchmark is —
    // so the broadcast is guarded by a measured row count: under the
    // bound (every real benchmark; this corpus at test SFs) the set
    // broadcasts, past it the join falls back to shuffle instead of
    // OOMing the driver at the 100-TB design point.
    "text_contamination" -> { (s, dir) =>
      val sh = Tables.documents(s, dir)
        .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("shs"))
        .filter(size(col("shs")) > 0)
      // materialized once: sized for the guard, reused by either path
      val bench = sh.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(explode(col("shs")).as("shingle")).distinct()
        .localCheckpoint(eager = true)
      // ~16 B/element → 2M shingles stays well inside a 64 MB
      // broadcast budget (every REAL benchmark set is far smaller;
      // this stand-in split is corpus-scaled, hence the guard)
      if (bench.count() <= 2000000L) {
        // benchmark-sized: ship the distinct shingle set as ONE
        // sorted array and count each doc's hits MAP-SIDE with the
        // two-pointer merge kernel — no corpus explode, no join, no
        // groupBy; the corpus side of the plan is scan → project
        val benchArr = broadcast(bench.agg(
          sort_array(collect_list(col("shingle"))).as("bench_shs")))
        sh.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .crossJoin(benchArr)
          .select(col("doc_id"), size(col("shs")).as("n_sh"),
            graft.expressions.NativeKernels.sortedIntersectCountCol(
              sort_array(col("shs")), col("bench_shs")).as("n_hit"))
          .select(col("doc_id"), col("n_sh"), col("n_hit"),
            (col("n_hit").cast("double") / col("n_sh").cast("double"))
              .as("contamination"))
      } else {
        // corpus-scaled benchmark: shuffle join — never build (or
        // broadcast) a single giant array
        sh.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(col("doc_id"), size(col("shs")).as("n_sh"),
            explode(col("shs")).as("shingle"))
          .join(bench.withColumn("hit", lit(1)), Seq("shingle"), "left")
          .groupBy(col("doc_id"), col("n_sh"))
          .agg(count(col("hit")).cast("int").as("n_hit"))
          .select(col("doc_id"), col("n_sh"), col("n_hit"),
            (col("n_hit").cast("double") / col("n_sh").cast("double"))
              .as("contamination"))
      }
    },

    // Cross-corpus near-dedup: new-batch (doc_id % 10 == 0) vs the
    // existing corpus, LSH-bucketed across the two sides, exact
    // verify — the dedup-before-adding-data sweep. Oracle-gated like
    // dedup_minhash: every qualifying pair on this corpus has
    // jaccard >= 0.95, so the 32x2 banding misses one with
    // probability ~(1-0.95^2)^32 ~ 1e-34 — the exact join IS the
    // oracle.
    "dedup_cross" -> { (s, dir) =>
      // both sides live in the documents table → the split form
      // shingles the corpus ONCE (one scan, one checkpoint)
      graft.operators.MinHashLsh.nearDuplicatesSplit(
          Tables.documents(s, dir), "doc_id", "text",
          probeSide = pmod(col("doc_id"), lit(10)) === 0,
          threshold = 0.5)
        .select(col("id1").as("base_id"), col("id2").as("probe_id"),
          col("jaccard"))
    },

    // The PERSISTENT-index form of dedup_cross, proven end-to-end:
    // build the LSH index lake tables from the corpus side, then dedup
    // the probe batch against the INDEX (the corpus text is never
    // re-read — candidates from the persisted band table, verify from
    // the persisted hash table). Output must equal the in-memory
    // cross sweep, so it shares dedup_cross's exact-Jaccard oracle.
    "dedup_index_cross" -> { (s, dir) =>
      import graft.operators.NearDupIndex
      val scratch = "/root/repo/target/lake_scratch/neardup_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val p = new org.apache.hadoop.fs.Path(scratch)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = Tables.documents(s, dir)
      NearDupIndex.build(docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text", scratch, threshold = 0.5)
      NearDupIndex.pairsAgainstIndex(s,
          docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          "doc_id", "text", scratch, threshold = 0.5)
        .select(col("id1").as("base_id"), col("id2").as("probe_id"),
          col("jaccard"))
    },

    // E4 — n-gram Jaccard similarity join (3-gram shingles, >= 0.5).
    "dedup_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccard(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5)
    },

    // E2 — MinHash+LSH near-dedup ([R]: banding uses xxhash64, not
    // expressible in DuckDB; candidate completeness vs exact Jaccard
    // is asserted in NearDupSpec).
    "dedup_minhash" -> { (s, dir) =>
      graft.operators.MinHashLsh.nearDuplicates(
        Tables.documents(s, dir), "doc_id", "text", threshold = 0.5)
    },

    // E3 — SimHash near-dedup, portable-fingerprint variant so the
    // whole pipeline (token hash → votes → chunk buckets → Hamming
    // verify) is hash-gated against a DuckDB replay; the xx-seeded
    // production variant stays spec-gated for parity in NearDupSpec.
    "dedup_simhash" -> { (s, dir) =>
      graft.operators.SimHash.nearDuplicatesPortable(
        Tables.documents(s, dir), "doc_id", "text", maxDist = 3)
    }
  )

  private val crossOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    w[i.gs] || ' ' || w[i.gs+1] || ' ' || w[i.gs+2] AS shingle
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
      |    greatest(len(w) - 2, 0))) AS gs) i),
      |card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS base_id, b.doc_id AS probe_id, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle
      |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
      |  GROUP BY 1, 2)
      |SELECT base_id, probe_id,
      |  CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
      |FROM pairs
      |JOIN card ca ON base_id = ca.doc_id
      |JOIN card cb ON probe_id = cb.doc_id
      |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5"""
      .stripMargin

  private def tokCount(word: String): String =
    s"len(list_filter(string_split(text, ' '), t -> t = '$word'))"

  private def langScoreSql(lang: String): String =
    TextFns.langMarkers.toMap.apply(lang)
      .map(tokCount).mkString(" + ")

  val oracles: Map[String, String] = Map(
    "text_langid" -> {
      val scores = TextFns.langMarkers.map { case (l, _) =>
        s"(${langScoreSql(l)}) AS score_$l"
      }
      val maxE = TextFns.langMarkers
        .map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
      val caseE = TextFns.langMarkers.reverse
        .foldLeft("'und'") { case (acc, (l, _)) =>
          s"CASE WHEN $maxE > 0 AND score_$l = $maxE THEN '$l' ELSE $acc END"
        }
      s"""WITH scored AS (
         |  SELECT doc_id, ${scores.mkString(",\n    ")}
         |  FROM documents)
         |SELECT doc_id,
         |  ${TextFns.langMarkers.map { case (l, _) => s"CAST(score_$l AS INT) AS score_$l" }.mkString(", ")},
         |  $caseE AS lang_pred
         |FROM scored""".stripMargin
    },
    "text_quality" -> {
      val nWords = "len(list_filter(string_split(text, ' '), t -> len(t) > 0))"
      val stops = TextFns.stopwords.map(tokCount).mkString(" + ")
      val punct =
        "CASE WHEN len(text) = 0 THEN 0.0 ELSE CAST(len(text) - " +
          "len(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) " +
          "/ CAST(len(text) AS DOUBLE) END"
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(len(text) AS INT) AS n_chars,
         |    CAST($nWords AS INT) AS n_words,
         |    $punct AS punct_ratio,
         |    CASE WHEN $nWords = 0 THEN 0.0
         |         ELSE CAST(($stops) AS DOUBLE) / CAST($nWords AS DOUBLE)
         |    END AS stopword_ratio
         |  FROM documents)
         |SELECT doc_id, n_chars, n_words, punct_ratio, stopword_ratio,
         |  (CAST(least(n_words, 100) AS DOUBLE) / 100.0
         |   + least(stopword_ratio * 5.0, 1.0)
         |   + (1.0 - punct_ratio)) / 3.0 AS quality_score
         |FROM base""".stripMargin
    },
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0))
        |    AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]'))
        |    AS INT) AS bpeish_tokens
        |FROM documents""".stripMargin,
    "text_strip_html" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><style>p{color:red}</style>' ||
        |    '<script>var a=1;</script></head><body><p class="x">' ||
        |    text ||
        |    '</p><!-- note --> &amp; &lt;tail&gt;&nbsp;end' ||
        |    '</body></html>' AS s
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    s,
        |    '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g'),
        |    '(?s)<[^>]+>', ' ', 'g') AS t
        |  FROM h),
        |d AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(regexp_replace(
        |    t,
        |    '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
        |    '&lt;', '<', 'g'), '&gt;', '>', 'g'),
        |    '&quot;', '"', 'g'), '&#39;', CHR(39), 'g'),
        |    '&apos;', CHR(39), 'g') AS t
        |  FROM c)
        |SELECT doc_id,
        |  trim(regexp_replace(t, '\s+', ' ', 'g')) AS clean_text
        |FROM d""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  nfc_normalize(text || ' e' || chr(769)) AS nfc_text
        |FROM documents""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        regexp_extract_all(regexp_replace(text, '[^ -~]', '', 'g'), '.'),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |    (h, c) -> (h * 131 + c) % 1000000007) AS fingerprint
        |FROM documents""".stripMargin,
    "dedup_exact" ->
      """SELECT sha256(text) AS text_hash, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "text_word_stats" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS w
        |  FROM documents),
        |freq AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
        |agg AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
        |               max(c) AS top_freq FROM freq GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(a.n_words, 0) AS INT) AS n_words,
        |  CAST(coalesce(a.n_distinct, 0) AS INT) AS n_distinct,
        |  CAST(coalesce(a.top_freq, 0) AS INT) AS top_freq,
        |  CASE WHEN coalesce(a.n_words, 0) = 0 THEN 0.0
        |       ELSE CAST(a.n_distinct AS DOUBLE) / CAST(a.n_words AS DOUBLE)
        |  END AS ttr,
        |  CASE WHEN coalesce(a.n_words, 0) = 0 THEN 0.0
        |       ELSE CAST(a.top_freq AS DOUBLE) / CAST(a.n_words AS DOUBLE)
        |  END AS top_ratio
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,
    // contamination/cross oracles join on shingle STRINGS where the
    // Spark side joins on their xxhash64 values — identical results
    // modulo 64-bit hash collisions (~n_distinct²/2^65, the same
    // contract as dedup_jaccard's hash-gated pair join).
    "text_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i.gs] || ' ' || w[i.gs+1] || ' ' || w[i.gs+2] AS shingle
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(len(w) - 2, 0))) AS gs) i),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0)
        |SELECT s.doc_id, CAST(count(*) AS INT) AS n_sh,
        |  CAST(count(b.shingle) AS INT) AS n_hit,
        |  CAST(count(b.shingle) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS contamination
        |FROM sh s LEFT JOIN bench b ON s.shingle = b.shingle
        |WHERE s.doc_id % 10 <> 0
        |GROUP BY 1""".stripMargin,
    "dedup_cross" -> crossOracleSql,
    // the persistent-index form computes the SAME pair set — one
    // oracle, two execution paths (in-memory sweep vs lake index)
    "dedup_index_cross" -> crossOracleSql,
    "dedup_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i.gs] || ' ' || w[i.gs+1] || ' ' || w[i.gs+2] AS shingle
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(len(w) - 2, 0))) AS gs) i),
        |card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, inter, ca.n_sh AS n1, cb.n_sh AS n2,
        |  CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |FROM pairs
        |JOIN card ca ON id1 = ca.doc_id
        |JOIN card cb ON id2 = cb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5""".stripMargin,
    // dedup_minhash is hash-gated against the EXACT high-Jaccard pair
    // set: the LSH banding is only a candidate generator (engine-
    // specific xxhash buckets), but its output is the exact-verified
    // pairs, and on this corpus every qualifying pair has jaccard >=
    // 0.9 — the probability a 16-band/4-row signature misses such a
    // pair is (1 - 0.9^4)^16 ~ 1e-8, so the exact join IS the oracle.
    // Both engines compute jaccard as one double division of the same
    // exact integers (bit-identical).
    // Composite pipeline oracle: the same four stages chained in SQL.
    // The quality formula and ws_tokens mirror the text_quality /
    // text_tokens oracles (both hash-gated, so the 0.55 gate compares
    // bit-identical doubles); near-dup pairs use the exact-Jaccard
    // join (= the MinHash output, see dedup_minhash).
    "pipe_clean_corpus" -> {
      val nWords = "len(list_filter(string_split(text, ' '), t -> len(t) > 0))"
      val stops = TextFns.stopwords.map(tokCount).mkString(" + ")
      val punct =
        "CASE WHEN len(text) = 0 THEN 0.0 ELSE CAST(len(text) - " +
          "len(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) " +
          "/ CAST(len(text) AS DOUBLE) END"
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    (CAST(least($nWords, 100) AS DOUBLE) / 100.0
         |     + least((CASE WHEN $nWords = 0 THEN 0.0
         |              ELSE CAST(($stops) AS DOUBLE) / CAST($nWords AS DOUBLE)
         |              END) * 5.0, 1.0)
         |     + (1.0 - $punct)) / 3.0 AS quality_score
         |  FROM documents),
         |q AS (SELECT * FROM base WHERE quality_score >= 0.55),
         |uniq AS (
         |  SELECT doc_id, text, quality_score FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY sha256(text) ORDER BY doc_id) AS rn FROM q)
         |  WHERE rn = 1),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM uniq),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    w[i.gs] || ' ' || w[i.gs+1] || ' ' || w[i.gs+2] AS shingle
         |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
         |    greatest(len(w) - 2, 0))) AS gs) i),
         |card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
         |  FROM sh a JOIN sh b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |losers AS (
         |  SELECT DISTINCT id2 FROM pairs
         |  JOIN card ca ON id1 = ca.doc_id
         |  JOIN card cb ON id2 = cb.doc_id
         |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5)
         |SELECT u.doc_id,
         |  CAST($nWords AS INT) AS ws_tokens,
         |  u.quality_score
         |FROM uniq u
         |WHERE u.doc_id NOT IN (SELECT id2 FROM losers)""".stripMargin
    },
    // SimHash oracle: replays the portable 60-bit fingerprint exactly —
    // per token two polynomial rolling hashes over the printable-ASCII
    // projection (the text_fingerprint arithmetic, already hash-gated),
    // combined as h1 * 2^30 + h2, then the +1/-1 bit votes, the 15-bit
    // pigeonhole chunk join, and the exact Hamming verify.
    "dedup_simhash" -> {
      def poly(base: Int, mod: Long): String =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(regexp_extract_all(regexp_replace(t, '[^ -~]', '', 'g'), '.'),
           |        c -> CAST(ascii(c) AS BIGINT))),
           |      (h, c) -> (h * $base + c) % $mod)""".stripMargin
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS w
         |  FROM documents),
         |hs AS (
         |  SELECT doc_id, list_transform(w, t ->
         |    ${poly(131, 1000000007L)} * 1073741824
         |    + ${poly(137, 998244353L)}) AS hh
         |  FROM toks),
         |fp AS (
         |  SELECT doc_id, CAST(COALESCE(list_sum(list_transform(range(60), j ->
         |    CASE WHEN COALESCE(list_sum(list_transform(hh, h ->
         |        CASE WHEN ((h >> CAST(j AS INT)) & 1) = 1 THEN 1 ELSE -1 END)), 0) > 0
         |      THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END)), 0) AS BIGINT) AS fp
         |  FROM hs),
         |ch AS (
         |  SELECT doc_id, fp, i.c AS chunk_idx, (fp >> (i.c * 15)) & 32767 AS chunk_val
         |  FROM fp, LATERAL (SELECT unnest([0, 1, 2, 3]) AS c) i),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.fp AS f1, b.fp AS f2
         |  FROM ch a JOIN ch b
         |    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
         |   AND a.doc_id < b.doc_id)
         |SELECT id1, id2, CAST(bit_count(xor(f1, f2)) AS INT) AS hamming_dist
         |FROM pairs
         |WHERE bit_count(xor(f1, f2)) <= 3""".stripMargin
    },
    "dedup_minhash" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i.gs] || ' ' || w[i.gs+1] || ' ' || w[i.gs+2] AS shingle
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(len(w) - 2, 0))) AS gs) i),
        |card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2,
        |  CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |FROM pairs
        |JOIN card ca ON id1 = ca.doc_id
        |JOIN card cb ON id2 = cb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5""".stripMargin
  )
}
