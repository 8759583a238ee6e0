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

  /** The per-session trained quality model (the clustering-
    * assignments / IVF-index pattern): training runs once per (session,
    * dir), the timed queries measure the codegen scoring pass. The
    * canonical training feed (r11) makes the weights bit-reproducible
    * — one sorted partition ⇒ one L-BFGS partial per pass — which is
    * what lets the consuming queries carry pinned oracles.
    */
  private def qualityModelFor(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.operators.QualityModel.Model =
    qualityModelMemo.getOrElseUpdate(s, dir) {
      val labeled = Tables.documents(s, dir).withColumn("label",
        (TextFns.qualityScore(col("text")) >= 0.55).cast("int"))
      graft.operators.QualityModel.trainCanonical(
        graft.operators.QualityModel.featurize(labeled, "text"),
        "label", "doc_id")
    }

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
      graft.operators.QualityModel
        .score(docs, "text", qualityModelFor(s, dir))
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
        // canonical feed: bit-reproducible weights (see H19's note)
        graft.operators.LangIdModel.trainCanonical(corpus, "text",
          "lang", "doc_id",
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

    // E12c — MODEL-gated curation composition (r11): the TRAINED
    // quality classifier runs IN the pipeline plan (plan-literal
    // sigmoid — no MLlib, no UDF at inference), chained with the
    // heuristic language gate and keep-first exact dedup — the
    // heuristic→classifier upgrade a CCNet-style pipeline makes once
    // a trained model exists, composed the way production runs it
    // (cheap gates first, content dedup last). Hash-gated SF-scoped:
    // the oracle replays the PINNED model probs (the
    // text_quality_model dyadic VALUES), the langid CASE chain, and
    // the sha256 keep-first dedup.
    "pipe_model_curation" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // pin the gated corpus: Dedup.exact consumes its input twice
      // (winner agg + semi-join back) — without the pin the scoring
      // kernels (featurize + langid) run twice per evaluation (the
      // pipe_clean_corpus round-5 lesson; measured 3.0s → pinned
      // ~1.2s at sf0.1)
      val gated = graft.operators.QualityModel
        .score(docs, "text", qualityModelFor(s, dir))
        .select(col("doc_id"), col("text"), col("quality_prob"))
        .filter(col("quality_prob") >= 0.5)
        .withColumn("lang_pred", TextFns.langId(col("text")))
        .filter(col("lang_pred") =!= "und")
        .localCheckpoint()
      Dedup.exact(gated, "text", "doc_id")
        .select(col("doc_id"), col("lang_pred"),
          TextFns.wordCount(col("text")).as("ws_tokens"),
          col("quality_prob"))
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

  /** The pinned (doc_id, quality_prob) rows of the canonical-feed
    * quality model at the driver SF, as exact dyadic arithmetic —
    * shared by the text_quality_model gate and the pipe_model_curation
    * composition replay. Regenerate from a verify dump after a model
    * change (see the text_quality_model comment).
    */
  private val qualityProbDyadic: String =
    """(0,9003139928019914*power(2.0,-53)),
         |   (1,8960309045998384*power(2.0,-53)),
         |   (2,8997557260284441*power(2.0,-53)),
         |   (3,8932172807986076*power(2.0,-53)),
         |   (4,7039886104260074*power(2.0,-53)),
         |   (5,7883236471039619*power(2.0,-54)),
         |   (6,7334397564575152*power(2.0,-78)),
         |   (7,8998561361110165*power(2.0,-53)),
         |   (8,9007191514398676*power(2.0,-53)),
         |   (9,9006521306236721*power(2.0,-53)),
         |   (10,8999130602353427*power(2.0,-53)),
         |   (11,8999161240662078*power(2.0,-53)),
         |   (12,9000732168058132*power(2.0,-53)),
         |   (13,7944878283927690*power(2.0,-53)),
         |   (14,8940869216464380*power(2.0,-53)),
         |   (15,7374249487054580*power(2.0,-57)),
         |   (16,6568236914577817*power(2.0,-75)),
         |   (17,8974012998724331*power(2.0,-53)),
         |   (18,9001627744307120*power(2.0,-53)),
         |   (19,7922194995785076*power(2.0,-64)),
         |   (20,8935858204166546*power(2.0,-53)),
         |   (21,5193305767712844*power(2.0,-58)),
         |   (22,9002098315696647*power(2.0,-53)),
         |   (23,4726191370641976*power(2.0,-53)),
         |   (24,9005558641112489*power(2.0,-53)),
         |   (25,9007191385155414*power(2.0,-53)),
         |   (26,5208028369289553*power(2.0,-79)),
         |   (27,8954877968857546*power(2.0,-53)),
         |   (28,8909896969070117*power(2.0,-53)),
         |   (29,8799341740647971*power(2.0,-53)),
         |   (30,8860329875185485*power(2.0,-53)),
         |   (31,8770647465004180*power(2.0,-53)),
         |   (32,9007171534421530*power(2.0,-53)),
         |   (33,8988321637495618*power(2.0,-53)),
         |   (34,6066854862808709*power(2.0,-66)),
         |   (35,9006484541475518*power(2.0,-53)),
         |   (36,5414190281280854*power(2.0,-71)),
         |   (37,8954233134694137*power(2.0,-53)),
         |   (38,8736105330603763*power(2.0,-53)),
         |   (39,6621827723719963*power(2.0,-54)),
         |   (40,9006041713252926*power(2.0,-53)),
         |   (41,8996722854895308*power(2.0,-53)),
         |   (42,8909578551577716*power(2.0,-53)),
         |   (43,5992475466235571*power(2.0,-59)),
         |   (44,6736685698400169*power(2.0,-54)),
         |   (45,9006396435869450*power(2.0,-53)),
         |   (46,9006994955296753*power(2.0,-53)),
         |   (47,5928631557829227*power(2.0,-53)),
         |   (48,6804056587155181*power(2.0,-66)),
         |   (49,6382173773083037*power(2.0,-53)),
         |   (50,5895886058503750*power(2.0,-53)),
         |   (51,9007183907207389*power(2.0,-53)),
         |   (52,8371627555677007*power(2.0,-53)),
         |   (53,6399110174869586*power(2.0,-58)),
         |   (54,8637255490925634*power(2.0,-53)),
         |   (55,8851946343595392*power(2.0,-53)),
         |   (56,9005388957583737*power(2.0,-53)),
         |   (57,9007052950118430*power(2.0,-53)),
         |   (58,9006414168907809*power(2.0,-53)),
         |   (59,8955602503581350*power(2.0,-53)),
         |   (60,9007172482006589*power(2.0,-53)),
         |   (61,8995789455790455*power(2.0,-53)),
         |   (62,9001499337666153*power(2.0,-53)),
         |   (63,9006753505009490*power(2.0,-53)),
         |   (64,7595011536493989*power(2.0,-61)),
         |   (65,5091973667268575*power(2.0,-53)),
         |   (66,8997967726356417*power(2.0,-53)),
         |   (67,9006010053197417*power(2.0,-53)),
         |   (68,6995838609331490*power(2.0,-54)),
         |   (69,9007117891432637*power(2.0,-53)),
         |   (70,9007197658626119*power(2.0,-53)),
         |   (71,5306442730318848*power(2.0,-53)),
         |   (72,6178528022464017*power(2.0,-56)),
         |   (73,9007162415489180*power(2.0,-53)),
         |   (74,7103906625716197*power(2.0,-84)),
         |   (75,9007197981165438*power(2.0,-53)),
         |   (76,9006283698351018*power(2.0,-53)),
         |   (77,8996519220409221*power(2.0,-53)),
         |   (78,6009149248578787*power(2.0,-53)),
         |   (79,8852862888750136*power(2.0,-53)),
         |   (80,9003271334502375*power(2.0,-53)),
         |   (81,6134204345481197*power(2.0,-53)),
         |   (82,7054912200929973*power(2.0,-53)),
         |   (83,7464457065940722*power(2.0,-64)),
         |   (84,9006139078414329*power(2.0,-53)),
         |   (85,9007159516127736*power(2.0,-53)),
         |   (86,6417709890816954*power(2.0,-71)),
         |   (87,6926799159804492*power(2.0,-61)),
         |   (88,6922653629245318*power(2.0,-53)),
         |   (89,7559639217880980*power(2.0,-54)),
         |   (90,9007008343879245*power(2.0,-53)),
         |   (91,9003023878158338*power(2.0,-53)),
         |   (92,8892552260531634*power(2.0,-53)),
         |   (93,8889608404093084*power(2.0,-53)),
         |   (94,7152010737673105*power(2.0,-62)),
         |   (95,8999212411947815*power(2.0,-53)),
         |   (96,8896242010219665*power(2.0,-53)),
         |   (97,8998376963401814*power(2.0,-53)),
         |   (98,9006998404497269*power(2.0,-53)),
         |   (99,6220640467566702*power(2.0,-53)),
         |   (100,9007033630009378*power(2.0,-53)),
         |   (101,6977526709995961*power(2.0,-61)),
         |   (102,9007198751840780*power(2.0,-53)),
         |   (103,8996623132053478*power(2.0,-53)),
         |   (104,5019069098974610*power(2.0,-56)),
         |   (105,8999998143879478*power(2.0,-53)),
         |   (106,5826716534477720*power(2.0,-78)),
         |   (107,4871271677039566*power(2.0,-56)),
         |   (108,6192473600747324*power(2.0,-64)),
         |   (109,8760395229288189*power(2.0,-53)),
         |   (110,4672152650114993*power(2.0,-80)),
         |   (111,8969797992894132*power(2.0,-53)),
         |   (112,9006322678206835*power(2.0,-53)),
         |   (113,9007171724284805*power(2.0,-53)),
         |   (114,8022285740000902*power(2.0,-54)),
         |   (115,6514448562877545*power(2.0,-69)),
         |   (116,5500903149967474*power(2.0,-85)),
         |   (117,8996693854295078*power(2.0,-53)),
         |   (118,9006208975741725*power(2.0,-53)),
         |   (119,6299970028832654*power(2.0,-64)),
         |   (120,7455111413420312*power(2.0,-54)),
         |   (121,5713911813945237*power(2.0,-59)),
         |   (122,5136946955406435*power(2.0,-53)),
         |   (123,6573607984564067*power(2.0,-54)),
         |   (124,9006368949618900*power(2.0,-53)),
         |   (125,4891508933792689*power(2.0,-53)),
         |   (126,9006460051636800*power(2.0,-53)),
         |   (127,9003754210678995*power(2.0,-53)),
         |   (128,8987743064078074*power(2.0,-53)),
         |   (129,9006512681018594*power(2.0,-53)),
         |   (130,8894512770267535*power(2.0,-53)),
         |   (131,8915362470713368*power(2.0,-53)),
         |   (132,9007090552393202*power(2.0,-53)),
         |   (133,9007199227510224*power(2.0,-53)),
         |   (134,4625533796825302*power(2.0,-60)),
         |   (135,9007199217368298*power(2.0,-53)),
         |   (136,8953561692181592*power(2.0,-53)),
         |   (137,8998320835684950*power(2.0,-53)),
         |   (138,8999024245887128*power(2.0,-53)),
         |   (139,9007198251423998*power(2.0,-53)),
         |   (140,6797300221214091*power(2.0,-60)),
         |   (141,8020081085373564*power(2.0,-53)),
         |   (142,9007199225036998*power(2.0,-53)),
         |   (143,8949435543603569*power(2.0,-53)),
         |   (144,7066519943019320*power(2.0,-63)),
         |   (145,8963008526926361*power(2.0,-53)),
         |   (146,5054774270880295*power(2.0,-62)),
         |   (147,9007003060432762*power(2.0,-53)),
         |   (148,8990942190780285*power(2.0,-53)),
         |   (149,4519116707314105*power(2.0,-60)),
         |   (150,6602744421968780*power(2.0,-53)),
         |   (151,9005247288602623*power(2.0,-53)),
         |   (152,8770213544334440*power(2.0,-53)),
         |   (153,9007016363345118*power(2.0,-53)),
         |   (154,9007176433825852*power(2.0,-53)),
         |   (155,9007066476853784*power(2.0,-53)),
         |   (156,7476589389934776*power(2.0,-71)),
         |   (157,8165963572219047*power(2.0,-63)),
         |   (158,7798007974049324*power(2.0,-75)),
         |   (159,8671811517500169*power(2.0,-53)),
         |   (160,8999127513397847*power(2.0,-53)),
         |   (161,9004476863885139*power(2.0,-53)),
         |   (162,9006551227442729*power(2.0,-53)),
         |   (163,8748180870692573*power(2.0,-56)),
         |   (164,4928436921042173*power(2.0,-62)),
         |   (165,6932129656429038*power(2.0,-62)),
         |   (166,9007066350123281*power(2.0,-53)),
         |   (167,9007191582713487*power(2.0,-53)),
         |   (168,8999663643694359*power(2.0,-53)),
         |   (169,8940792197754143*power(2.0,-53)),
         |   (170,7243220357736211*power(2.0,-63)),
         |   (171,9000750468324344*power(2.0,-53)),
         |   (172,5079856774407776*power(2.0,-53)),
         |   (173,9007034822012905*power(2.0,-53)),
         |   (174,8888228561054283*power(2.0,-53)),
         |   (175,6641227896559150*power(2.0,-55)),
         |   (176,9003889717440632*power(2.0,-53)),
         |   (177,8886103152464687*power(2.0,-53)),
         |   (178,8753280299341103*power(2.0,-53)),
         |   (179,9007044998014064*power(2.0,-53)),
         |   (180,7872280777652287*power(2.0,-54)),
         |   (181,6215813214261165*power(2.0,-54)),
         |   (182,9006312342383493*power(2.0,-53)),
         |   (183,5372686210657747*power(2.0,-53)),
         |   (184,9007028282512696*power(2.0,-53)),
         |   (185,8994998107307405*power(2.0,-53)),
         |   (186,9007198061368286*power(2.0,-53)),
         |   (187,9007197685440725*power(2.0,-53)),
         |   (188,9006549283842585*power(2.0,-53)),
         |   (189,8699898011699348*power(2.0,-58)),
         |   (190,9006509130562323*power(2.0,-53)),
         |   (191,8672889284305712*power(2.0,-71)),
         |   (192,9006653873708312*power(2.0,-53)),
         |   (193,7970010577301127*power(2.0,-59)),
         |   (194,4921501420317335*power(2.0,-53)),
         |   (195,8935157716018947*power(2.0,-53)),
         |   (196,4709595697616409*power(2.0,-53)),
         |   (197,9007172669457768*power(2.0,-53)),
         |   (198,6787416320745658*power(2.0,-53)),
         |   (199,9007168899118191*power(2.0,-53)),
         |   (200,7762212795899156*power(2.0,-53)),
         |   (201,8872709462514005*power(2.0,-53)),
         |   (202,9006663294342396*power(2.0,-53)),
         |   (203,6145191255447126*power(2.0,-61)),
         |   (204,8779609893567131*power(2.0,-71)),
         |   (205,9000504211692696*power(2.0,-53)),
         |   (206,7067920858820486*power(2.0,-54)),
         |   (207,8978963176300266*power(2.0,-53)),
         |   (208,7787209542761706*power(2.0,-62)),
         |   (209,8783538689605147*power(2.0,-53)),
         |   (210,9007169237091750*power(2.0,-53)),
         |   (211,8891865938805537*power(2.0,-53)),
         |   (212,8934941512161937*power(2.0,-54)),
         |   (213,9007197940915180*power(2.0,-53)),
         |   (214,7861251998362911*power(2.0,-64)),
         |   (215,9007199251255568*power(2.0,-53)),
         |   (216,9003450508397696*power(2.0,-53)),
         |   (217,9006378440085811*power(2.0,-53)),
         |   (218,9006291168607437*power(2.0,-53)),
         |   (219,5828024509690338*power(2.0,-67)),
         |   (220,9007088021836513*power(2.0,-53)),
         |   (221,9006864623266198*power(2.0,-53)),
         |   (222,9007198904439790*power(2.0,-53)),
         |   (223,9006539102256894*power(2.0,-53)),
         |   (224,9006050112233564*power(2.0,-53)),
         |   (225,9006330258851531*power(2.0,-53)),
         |   (226,6717988743994189*power(2.0,-54)),
         |   (227,9006171496610177*power(2.0,-53)),
         |   (228,9007076791835280*power(2.0,-53)),
         |   (229,9007036351051634*power(2.0,-53)),
         |   (230,9006292033081935*power(2.0,-53)),
         |   (231,7953043813343138*power(2.0,-54)),
         |   (232,8903099012096953*power(2.0,-53)),
         |   (233,9002984083848737*power(2.0,-53)),
         |   (234,9007184071765437*power(2.0,-53)),
         |   (235,8503328418211936*power(2.0,-54)),
         |   (236,5294931451111960*power(2.0,-79)),
         |   (237,9006538332842068*power(2.0,-53)),
         |   (238,8843574256756731*power(2.0,-53)),
         |   (239,7914975011050364*power(2.0,-54)),
         |   (240,9007021593441848*power(2.0,-53)),
         |   (241,9007166642752867*power(2.0,-53)),
         |   (242,8738309696897474*power(2.0,-53)),
         |   (243,8778012171417632*power(2.0,-53)),
         |   (244,8635770656693888*power(2.0,-53)),
         |   (245,9007191478926809*power(2.0,-53)),
         |   (246,9007196352852573*power(2.0,-53)),
         |   (247,9007043656530050*power(2.0,-53)),
         |   (248,8986987325209770*power(2.0,-53)),
         |   (249,9007199211196088*power(2.0,-53)),
         |   (250,8806443220330240*power(2.0,-53)),
         |   (251,9006752419857825*power(2.0,-53)),
         |   (252,8805359183247770*power(2.0,-53)),
         |   (253,9002715960926934*power(2.0,-53)),
         |   (254,7696317154905081*power(2.0,-74)),
         |   (255,6612363142825950*power(2.0,-54)),
         |   (256,7629164296524274*power(2.0,-83)),
         |   (257,5660852600068173*power(2.0,-62)),
         |   (258,9006382295721523*power(2.0,-53)),
         |   (259,6579893999520653*power(2.0,-56)),
         |   (260,5815159701125346*power(2.0,-54)),
         |   (261,9003903373295555*power(2.0,-53)),
         |   (262,9007161243583095*power(2.0,-53)),
         |   (263,9007070736309510*power(2.0,-53)),
         |   (264,9005928196715788*power(2.0,-53)),
         |   (265,5447875064027665*power(2.0,-53)),
         |   (266,5841712193612601*power(2.0,-53)),
         |   (267,9006306370998394*power(2.0,-53)),
         |   (268,8998597399512158*power(2.0,-53)),
         |   (269,9007192262566986*power(2.0,-53)),
         |   (270,9007197536541562*power(2.0,-53)),
         |   (271,5948749810292188*power(2.0,-54)),
         |   (272,9007169164377289*power(2.0,-53)),
         |   (273,5569869247016895*power(2.0,-67)),
         |   (274,9007171181916965*power(2.0,-53)),
         |   (275,8966880362904637*power(2.0,-53)),
         |   (276,8982680079761898*power(2.0,-53)),
         |   (277,8821462249489473*power(2.0,-53)),
         |   (278,8721345120803151*power(2.0,-53)),
         |   (279,8995218218305792*power(2.0,-53)),
         |   (280,9007194135202542*power(2.0,-53)),
         |   (281,8300383190848374*power(2.0,-66)),
         |   (282,8413058866591528*power(2.0,-54)),
         |   (283,9003913322689387*power(2.0,-53)),
         |   (284,8894600630252204*power(2.0,-53)),
         |   (285,9006789530397604*power(2.0,-53)),
         |   (286,8871293011329583*power(2.0,-53)),
         |   (287,4935639318892163*power(2.0,-53)),
         |   (288,8552285451330503*power(2.0,-54)),
         |   (289,4614302165420884*power(2.0,-58)),
         |   (290,9007008446752563*power(2.0,-53)),
         |   (291,9007045862523975*power(2.0,-53)),
         |   (292,9006514329586423*power(2.0,-53)),
         |   (293,9006376361064513*power(2.0,-53)),
         |   (294,9006340033518356*power(2.0,-53)),
         |   (295,8098163385591295*power(2.0,-65)),
         |   (296,9006108861587109*power(2.0,-53)),
         |   (297,9007098308706411*power(2.0,-53)),
         |   (298,7514494559321081*power(2.0,-65)),
         |   (299,9006819837984853*power(2.0,-53)),
         |   (300,5219707826495912*power(2.0,-53)),
         |   (301,9006764633333127*power(2.0,-53)),
         |   (302,9006571509796352*power(2.0,-53)),
         |   (303,9006629058475302*power(2.0,-53)),
         |   (304,9007183819159440*power(2.0,-53)),
         |   (305,4724389656684274*power(2.0,-81)),
         |   (306,9006225365578681*power(2.0,-53)),
         |   (307,8903397968944333*power(2.0,-53)),
         |   (308,6375981328909293*power(2.0,-74)),
         |   (309,8875716167430495*power(2.0,-53)),
         |   (310,6755460219551663*power(2.0,-54)),
         |   (311,9007198834187250*power(2.0,-53)),
         |   (312,9006256850856493*power(2.0,-53)),
         |   (313,9007194619338586*power(2.0,-53)),
         |   (314,9003308070280705*power(2.0,-53)),
         |   (315,9007055612732375*power(2.0,-53)),
         |   (316,8971676364176352*power(2.0,-53)),
         |   (317,8726084387806183*power(2.0,-53)),
         |   (318,8991856434804170*power(2.0,-53)),
         |   (319,8987469455346279*power(2.0,-53)),
         |   (320,9007176964137016*power(2.0,-53)),
         |   (321,5781150440053441*power(2.0,-55)),
         |   (322,5998384324284571*power(2.0,-53)),
         |   (323,9007066314757648*power(2.0,-53)),
         |   (324,8792369888036637*power(2.0,-53)),
         |   (325,8932144137486525*power(2.0,-53)),
         |   (326,8940017944196206*power(2.0,-54)),
         |   (327,7062984195573540*power(2.0,-64)),
         |   (328,9007071567298776*power(2.0,-53)),
         |   (329,9007182542925955*power(2.0,-53)),
         |   (330,8999011008866608*power(2.0,-53)),
         |   (331,4625045061684783*power(2.0,-54)),
         |   (332,6723365393844334*power(2.0,-54)),
         |   (333,8945738614810413*power(2.0,-59)),
         |   (334,9007199161007475*power(2.0,-53)),
         |   (335,9005876686770243*power(2.0,-53)),
         |   (336,8731442844653599*power(2.0,-53)),
         |   (337,8804086338670078*power(2.0,-53)),
         |   (338,9003527544041709*power(2.0,-53)),
         |   (339,6728499548577891*power(2.0,-59)),
         |   (340,7960912985398523*power(2.0,-56)),
         |   (341,9006620038896474*power(2.0,-53)),
         |   (342,5073165428677213*power(2.0,-71)),
         |   (343,8814720982161543*power(2.0,-53)),
         |   (344,8984446112171599*power(2.0,-53)),
         |   (345,8996306345785822*power(2.0,-53)),
         |   (346,8971204088630639*power(2.0,-53)),
         |   (347,5644721147742338*power(2.0,-55)),
         |   (348,6718937377504998*power(2.0,-69)),
         |   (349,9007198896191772*power(2.0,-53)),
         |   (350,9006277476344685*power(2.0,-53)),
         |   (351,7485427738872675*power(2.0,-53)),
         |   (352,9007191433545165*power(2.0,-53)),
         |   (353,9007098237864140*power(2.0,-53)),
         |   (354,9006280383985053*power(2.0,-53)),
         |   (355,9007011495450074*power(2.0,-53)),
         |   (356,9000261543019625*power(2.0,-53)),
         |   (357,8831426939142022*power(2.0,-53)),
         |   (358,6520194889473971*power(2.0,-81)),
         |   (359,8998439375302735*power(2.0,-53)),
         |   (360,9007035287077729*power(2.0,-53)),
         |   (361,5741632181261650*power(2.0,-53)),
         |   (362,5167166438047072*power(2.0,-63)),
         |   (363,8946421835589611*power(2.0,-53)),
         |   (364,6759053737984137*power(2.0,-53)),
         |   (365,5428239772721092*power(2.0,-78)),
         |   (366,7842846278515596*power(2.0,-53)),
         |   (367,8796711889177339*power(2.0,-53)),
         |   (368,7927547108617294*power(2.0,-80)),
         |   (369,9006331562012939*power(2.0,-53)),
         |   (370,7233579866125967*power(2.0,-62)),
         |   (371,8950024666690963*power(2.0,-53)),
         |   (372,6795350798592992*power(2.0,-60)),
         |   (373,9007033489675211*power(2.0,-53)),
         |   (374,5375018234497284*power(2.0,-65)),
         |   (375,8999650346599559*power(2.0,-53)),
         |   (376,9006256619365829*power(2.0,-53)),
         |   (377,7571664949852254*power(2.0,-56)),
         |   (378,9007187215644638*power(2.0,-53)),
         |   (379,8973690593500742*power(2.0,-53)),
         |   (380,9007046987960185*power(2.0,-53)),
         |   (381,5797516922427451*power(2.0,-55)),
         |   (382,8933718734389154*power(2.0,-53)),
         |   (383,8790755596540792*power(2.0,-53)),
         |   (384,7733262772958320*power(2.0,-74)),
         |   (385,9006896573233788*power(2.0,-53)),
         |   (386,9007198946165801*power(2.0,-53)),
         |   (387,7820243171954945*power(2.0,-57)),
         |   (388,8466921156696962*power(2.0,-53)),
         |   (389,7257788680281734*power(2.0,-54)),
         |   (390,8919745298213706*power(2.0,-53)),
         |   (391,5753358736035806*power(2.0,-53)),
         |   (392,5820015499798853*power(2.0,-70)),
         |   (393,8902597771438681*power(2.0,-53)),
         |   (394,8635457298724468*power(2.0,-53)),
         |   (395,8982534785716579*power(2.0,-53)),
         |   (396,7919550480221278*power(2.0,-56)),
         |   (397,8871170443449940*power(2.0,-53)),
         |   (398,5708427228495596*power(2.0,-62)),
         |   (399,8028563675291334*power(2.0,-53)),
         |   (400,5089832809177138*power(2.0,-61)),
         |   (401,8969953145421701*power(2.0,-53)),
         |   (402,9004329707994893*power(2.0,-53)),
         |   (403,8935351710658338*power(2.0,-53)),
         |   (404,7139755102539138*power(2.0,-53)),
         |   (405,8993476387909184*power(2.0,-53)),
         |   (406,9007168899802145*power(2.0,-53)),
         |   (407,7756413626682430*power(2.0,-62)),
         |   (408,5977340868183170*power(2.0,-63)),
         |   (409,9007118065575936*power(2.0,-53)),
         |   (410,9002192963690550*power(2.0,-53)),
         |   (411,9007179017196154*power(2.0,-53)),
         |   (412,9007198739082194*power(2.0,-53)),
         |   (413,9006355186718236*power(2.0,-53)),
         |   (414,9007199219251960*power(2.0,-53)),
         |   (415,9006266200121720*power(2.0,-53)),
         |   (416,8998627745233887*power(2.0,-53)),
         |   (417,9004751006742346*power(2.0,-53)),
         |   (418,8134867190812153*power(2.0,-53)),
         |   (419,5058955329366603*power(2.0,-71)),
         |   (420,8889493202336972*power(2.0,-53)),
         |   (421,8920844855456837*power(2.0,-53)),
         |   (422,8948860909513912*power(2.0,-53)),
         |   (423,8999712615447976*power(2.0,-53)),
         |   (424,9006319027917467*power(2.0,-53)),
         |   (425,6531458576420445*power(2.0,-54)),
         |   (426,9006593251017423*power(2.0,-53)),
         |   (427,9007169733004104*power(2.0,-53)),
         |   (428,6658505096994945*power(2.0,-59)),
         |   (429,8976189267639523*power(2.0,-53)),
         |   (430,9006203585418663*power(2.0,-53)),
         |   (431,8997157228281297*power(2.0,-53)),
         |   (432,8631870031742016*power(2.0,-53)),
         |   (433,4518956545270142*power(2.0,-59)),
         |   (434,8991105259577845*power(2.0,-53)),
         |   (435,8156636442617775*power(2.0,-59)),
         |   (436,8862287538723484*power(2.0,-53)),
         |   (437,9003801756623386*power(2.0,-53)),
         |   (438,4959714708625934*power(2.0,-65)),
         |   (439,8830792924539163*power(2.0,-53)),
         |   (440,6200344204717111*power(2.0,-53)),
         |   (441,9000664843902946*power(2.0,-53)),
         |   (442,9007197998155989*power(2.0,-53)),
         |   (443,9006054438982336*power(2.0,-53)),
         |   (444,9007164232725658*power(2.0,-53)),
         |   (445,8913983836357320*power(2.0,-53)),
         |   (446,7087052753648052*power(2.0,-54)),
         |   (447,9007197659815318*power(2.0,-53)),
         |   (448,8995407450721296*power(2.0,-53)),
         |   (449,6475886054404610*power(2.0,-54)),
         |   (450,8902556398807376*power(2.0,-53)),
         |   (451,7425377002360794*power(2.0,-63)),
         |   (452,9000020629042879*power(2.0,-53)),
         |   (453,9007178665497514*power(2.0,-53)),
         |   (454,8874005709398393*power(2.0,-53)),
         |   (455,6826104493424920*power(2.0,-81)),
         |   (456,5104885779778246*power(2.0,-53)),
         |   (457,4818544989557657*power(2.0,-53)),
         |   (458,8940472163383536*power(2.0,-53)),
         |   (459,9000601302132858*power(2.0,-53)),
         |   (460,7275125005154951*power(2.0,-53)),
         |   (461,8967663478566617*power(2.0,-53)),
         |   (462,8946672588090980*power(2.0,-53)),
         |   (463,9007170052547129*power(2.0,-53)),
         |   (464,8783134686419687*power(2.0,-53)),
         |   (465,9007102109070518*power(2.0,-53)),
         |   (466,9004569855692694*power(2.0,-53)),
         |   (467,9007017734513323*power(2.0,-53)),
         |   (468,8667335956775208*power(2.0,-54)),
         |   (469,6390334746010592*power(2.0,-83)),
         |   (470,6551521593662156*power(2.0,-53)),
         |   (471,9007088335412959*power(2.0,-53)),
         |   (472,5784733502349161*power(2.0,-57)),
         |   (473,8902435368045145*power(2.0,-53)),
         |   (474,9007061846926682*power(2.0,-53)),
         |   (475,7309900832697633*power(2.0,-62)),
         |   (476,6773244932159942*power(2.0,-64)),
         |   (477,5563135844647977*power(2.0,-54)),
         |   (478,8805256156234110*power(2.0,-53)),
         |   (479,8626923745358525*power(2.0,-53)),
         |   (480,8933682139164901*power(2.0,-53)),
         |   (481,7695870095287205*power(2.0,-76)),
         |   (482,7731244659412814*power(2.0,-54)),
         |   (483,8997067330473633*power(2.0,-53)),
         |   (484,8863496854078642*power(2.0,-53)),
         |   (485,7002105258243147*power(2.0,-61)),
         |   (486,5281270466896225*power(2.0,-58)),
         |   (487,8216017452870263*power(2.0,-53)),
         |   (488,8804422064898992*power(2.0,-53)),
         |   (489,8107404908440215*power(2.0,-53)),
         |   (490,9006356590468322*power(2.0,-53)),
         |   (491,9005884943971409*power(2.0,-53)),
         |   (492,7389285100678948*power(2.0,-79)),
         |   (493,9007197565392625*power(2.0,-53)),
         |   (494,6483690734702398*power(2.0,-62)),
         |   (495,8971537349238635*power(2.0,-53)),
         |   (496,9007011789812837*power(2.0,-53)),
         |   (497,7610831341451245*power(2.0,-73)),
         |   (498,8995041565385829*power(2.0,-53)),
         |   (499,9007198282630267*power(2.0,-53))""".stripMargin

  val oracles: Map[String, String] = Map(
    // H19 pinned scoring artifact (r11): the canonical training feed
    // makes the L-BFGS fit bit-reproducible (one sorted partition ⇒
    // one gradient partial per pass — verified byte-equal across
    // fresh JVMs at 8 and 32 threads), so the 500 (doc_id,
    // quality_prob) rows pin as VALUES. Exact-FP gate: each prob is
    // emitted as exact dyadic arithmetic (mantissa * power(2, e) —
    // both factors and the product are exactly representable), which
    // sidesteps DuckDB 1.0's off-by-one-ulp decimal float parse.
    // QualityModelSpec still gates separation; this pins the
    // artifact. SF-scoped in check.py.
    // E12c composition replay: pinned model probs (the shared dyadic
    // VALUES) + the langid heuristic CASE chain + sha256 keep-first
    // dedup + the ws-token count — every stage engine-portable or
    // pinned, so the composition hash-gates end-to-end. SF-scoped
    // (the pin is the sf0.01 fit's).
    "pipe_model_curation" -> {
      val scores = TextFns.langMarkers.map { case (l, _) =>
        s"(${langScoreSql(l)}) AS score_$l"
      }
      val maxE = TextFns.langMarkers
        .map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
      val caseE = TextFns.langMarkers.reverse
        .foldLeft("'und'") { case (acc, (l, _)) =>
          s"CASE WHEN $maxE > 0 AND score_$l = $maxE THEN '$l' ELSE $acc END"
        }
      s"""WITH qp(id, p) AS (VALUES
         |   $qualityProbDyadic),
         |ls AS (
         |  SELECT doc_id, ${scores.mkString(",\n    ")}
         |  FROM documents),
         |lp AS (SELECT doc_id, $caseE AS lang_pred FROM ls),
         |g AS (
         |  SELECT d.doc_id, d.text, CAST(qp.p AS DOUBLE) AS quality_prob,
         |    lp.lang_pred
         |  FROM documents d
         |  JOIN qp ON qp.id = d.doc_id
         |  JOIN lp ON lp.doc_id = d.doc_id
         |  WHERE CAST(qp.p AS DOUBLE) >= 0.5 AND lp.lang_pred <> 'und'),
         |uniq AS (
         |  SELECT doc_id, text, quality_prob, lang_pred FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY sha256(text) ORDER BY doc_id) AS rn FROM g)
         |  WHERE rn = 1)
         |SELECT doc_id, lang_pred,
         |  CAST(len(list_filter(string_split(text, ' '),
         |    t -> len(t) > 0)) AS INT) AS ws_tokens,
         |  quality_prob
         |FROM uniq""".stripMargin
    },
    "text_quality_model" ->
      s"""SELECT CAST(v.id AS BIGINT) AS doc_id,
         |  CAST(v.p AS DOUBLE) AS quality_prob
         |FROM (VALUES
         |   $qualityProbDyadic) v(id, p)""".stripMargin,
    // E7b pinned scoring artifact: same canonical-feed determinism;
    // the predicted labels over `documents` are out-of-domain for the
    // synthetic multilingual model (mostly arbitrary) — the gate pins
    // REPRODUCIBILITY of the featurize→train→plan-literal-argmax
    // chain, while LangIdSpec gates in-domain accuracy (>=0.95).
    "text_langid_model" ->
      s"""SELECT CAST(v.id AS BIGINT) AS doc_id, v.l AS lang_model
         |FROM (VALUES
         |   (0,'fr'), (1,'fr'), (2,'zh'), (3,'es'), (4,'zh'), (5,'fr'),
         |   (6,'zh'), (7,'fr'), (8,'zh'), (9,'fr'), (10,'zh'), (11,'fr'),
         |   (12,'fr'), (13,'en'), (14,'zh'), (15,'fr'), (16,'fr'),
         |   (17,'fr'), (18,'fr'), (19,'fr'), (20,'zh'), (21,'fr'),
         |   (22,'fr'), (23,'de'), (24,'fr'), (25,'fr'), (26,'fr'),
         |   (27,'fr'), (28,'zh'), (29,'en'), (30,'fr'), (31,'fr'),
         |   (32,'fr'), (33,'es'), (34,'fr'), (35,'fr'), (36,'fr'),
         |   (37,'zh'), (38,'zh'), (39,'fr'), (40,'zh'), (41,'fr'),
         |   (42,'zh'), (43,'fr'), (44,'fr'), (45,'fr'), (46,'fr'),
         |   (47,'fr'), (48,'fr'), (49,'fr'), (50,'zh'), (51,'de'),
         |   (52,'en'), (53,'fr'), (54,'fr'), (55,'fr'), (56,'zh'),
         |   (57,'fr'), (58,'zh'), (59,'es'), (60,'fr'), (61,'fr'),
         |   (62,'fr'), (63,'fr'), (64,'fr'), (65,'fr'), (66,'fr'),
         |   (67,'fr'), (68,'fr'), (69,'fr'), (70,'fr'), (71,'fr'),
         |   (72,'zh'), (73,'es'), (74,'fr'), (75,'fr'), (76,'fr'),
         |   (77,'zh'), (78,'fr'), (79,'en'), (80,'de'), (81,'fr'),
         |   (82,'fr'), (83,'zh'), (84,'es'), (85,'fr'), (86,'fr'),
         |   (87,'zh'), (88,'fr'), (89,'zh'), (90,'zh'), (91,'fr'),
         |   (92,'fr'), (93,'fr'), (94,'es'), (95,'fr'), (96,'fr'),
         |   (97,'fr'), (98,'zh'), (99,'fr'), (100,'fr'), (101,'zh'),
         |   (102,'fr'), (103,'fr'), (104,'fr'), (105,'fr'), (106,'fr'),
         |   (107,'fr'), (108,'fr'), (109,'fr'), (110,'fr'), (111,'fr'),
         |   (112,'fr'), (113,'fr'), (114,'fr'), (115,'fr'), (116,'fr'),
         |   (117,'zh'), (118,'fr'), (119,'en'), (120,'es'), (121,'fr'),
         |   (122,'es'), (123,'zh'), (124,'fr'), (125,'fr'), (126,'fr'),
         |   (127,'fr'), (128,'fr'), (129,'zh'), (130,'fr'), (131,'fr'),
         |   (132,'fr'), (133,'fr'), (134,'zh'), (135,'zh'), (136,'fr'),
         |   (137,'fr'), (138,'fr'), (139,'es'), (140,'fr'), (141,'zh'),
         |   (142,'fr'), (143,'fr'), (144,'fr'), (145,'de'), (146,'fr'),
         |   (147,'en'), (148,'en'), (149,'es'), (150,'fr'), (151,'fr'),
         |   (152,'en'), (153,'es'), (154,'zh'), (155,'fr'), (156,'fr'),
         |   (157,'es'), (158,'zh'), (159,'fr'), (160,'de'), (161,'fr'),
         |   (162,'fr'), (163,'fr'), (164,'fr'), (165,'zh'), (166,'fr'),
         |   (167,'en'), (168,'zh'), (169,'zh'), (170,'zh'), (171,'fr'),
         |   (172,'es'), (173,'fr'), (174,'fr'), (175,'zh'), (176,'es'),
         |   (177,'fr'), (178,'en'), (179,'fr'), (180,'zh'), (181,'zh'),
         |   (182,'fr'), (183,'es'), (184,'fr'), (185,'fr'), (186,'fr'),
         |   (187,'zh'), (188,'fr'), (189,'zh'), (190,'zh'), (191,'es'),
         |   (192,'fr'), (193,'zh'), (194,'fr'), (195,'fr'), (196,'fr'),
         |   (197,'fr'), (198,'es'), (199,'fr'), (200,'fr'), (201,'fr'),
         |   (202,'fr'), (203,'fr'), (204,'fr'), (205,'fr'), (206,'fr'),
         |   (207,'fr'), (208,'fr'), (209,'fr'), (210,'fr'), (211,'zh'),
         |   (212,'fr'), (213,'fr'), (214,'en'), (215,'fr'), (216,'zh'),
         |   (217,'fr'), (218,'fr'), (219,'zh'), (220,'fr'), (221,'fr'),
         |   (222,'en'), (223,'fr'), (224,'zh'), (225,'fr'), (226,'fr'),
         |   (227,'fr'), (228,'fr'), (229,'fr'), (230,'fr'), (231,'fr'),
         |   (232,'fr'), (233,'fr'), (234,'fr'), (235,'de'), (236,'fr'),
         |   (237,'zh'), (238,'fr'), (239,'zh'), (240,'fr'), (241,'fr'),
         |   (242,'fr'), (243,'fr'), (244,'fr'), (245,'zh'), (246,'en'),
         |   (247,'fr'), (248,'fr'), (249,'fr'), (250,'en'), (251,'fr'),
         |   (252,'fr'), (253,'fr'), (254,'fr'), (255,'zh'), (256,'fr'),
         |   (257,'en'), (258,'fr'), (259,'en'), (260,'fr'), (261,'fr'),
         |   (262,'fr'), (263,'zh'), (264,'fr'), (265,'fr'), (266,'fr'),
         |   (267,'fr'), (268,'en'), (269,'fr'), (270,'fr'), (271,'zh'),
         |   (272,'fr'), (273,'fr'), (274,'fr'), (275,'zh'), (276,'fr'),
         |   (277,'fr'), (278,'fr'), (279,'fr'), (280,'fr'), (281,'fr'),
         |   (282,'fr'), (283,'fr'), (284,'es'), (285,'fr'), (286,'fr'),
         |   (287,'en'), (288,'zh'), (289,'fr'), (290,'zh'), (291,'fr'),
         |   (292,'fr'), (293,'zh'), (294,'fr'), (295,'fr'), (296,'fr'),
         |   (297,'zh'), (298,'fr'), (299,'fr'), (300,'fr'), (301,'fr'),
         |   (302,'fr'), (303,'fr'), (304,'fr'), (305,'en'), (306,'en'),
         |   (307,'fr'), (308,'zh'), (309,'zh'), (310,'zh'), (311,'zh'),
         |   (312,'fr'), (313,'es'), (314,'fr'), (315,'fr'), (316,'fr'),
         |   (317,'de'), (318,'fr'), (319,'fr'), (320,'fr'), (321,'fr'),
         |   (322,'zh'), (323,'fr'), (324,'fr'), (325,'fr'), (326,'fr'),
         |   (327,'fr'), (328,'fr'), (329,'fr'), (330,'fr'), (331,'fr'),
         |   (332,'fr'), (333,'fr'), (334,'fr'), (335,'fr'), (336,'fr'),
         |   (337,'fr'), (338,'fr'), (339,'fr'), (340,'zh'), (341,'fr'),
         |   (342,'en'), (343,'es'), (344,'fr'), (345,'fr'), (346,'fr'),
         |   (347,'fr'), (348,'zh'), (349,'es'), (350,'fr'), (351,'fr'),
         |   (352,'fr'), (353,'de'), (354,'fr'), (355,'zh'), (356,'fr'),
         |   (357,'zh'), (358,'es'), (359,'es'), (360,'zh'), (361,'fr'),
         |   (362,'fr'), (363,'fr'), (364,'fr'), (365,'es'), (366,'fr'),
         |   (367,'fr'), (368,'es'), (369,'es'), (370,'es'), (371,'fr'),
         |   (372,'fr'), (373,'fr'), (374,'fr'), (375,'fr'), (376,'fr'),
         |   (377,'zh'), (378,'fr'), (379,'fr'), (380,'fr'), (381,'zh'),
         |   (382,'fr'), (383,'fr'), (384,'de'), (385,'zh'), (386,'fr'),
         |   (387,'fr'), (388,'fr'), (389,'zh'), (390,'fr'), (391,'fr'),
         |   (392,'fr'), (393,'fr'), (394,'zh'), (395,'zh'), (396,'fr'),
         |   (397,'zh'), (398,'fr'), (399,'fr'), (400,'de'), (401,'fr'),
         |   (402,'zh'), (403,'zh'), (404,'fr'), (405,'fr'), (406,'de'),
         |   (407,'fr'), (408,'es'), (409,'fr'), (410,'fr'), (411,'fr'),
         |   (412,'fr'), (413,'fr'), (414,'fr'), (415,'zh'), (416,'fr'),
         |   (417,'fr'), (418,'fr'), (419,'zh'), (420,'fr'), (421,'fr'),
         |   (422,'zh'), (423,'fr'), (424,'fr'), (425,'fr'), (426,'fr'),
         |   (427,'fr'), (428,'fr'), (429,'fr'), (430,'zh'), (431,'fr'),
         |   (432,'zh'), (433,'zh'), (434,'fr'), (435,'fr'), (436,'zh'),
         |   (437,'fr'), (438,'fr'), (439,'es'), (440,'de'), (441,'zh'),
         |   (442,'fr'), (443,'fr'), (444,'fr'), (445,'fr'), (446,'fr'),
         |   (447,'fr'), (448,'fr'), (449,'fr'), (450,'fr'), (451,'fr'),
         |   (452,'fr'), (453,'fr'), (454,'zh'), (455,'fr'), (456,'en'),
         |   (457,'fr'), (458,'zh'), (459,'fr'), (460,'fr'), (461,'fr'),
         |   (462,'zh'), (463,'fr'), (464,'zh'), (465,'zh'), (466,'fr'),
         |   (467,'en'), (468,'fr'), (469,'de'), (470,'fr'), (471,'fr'),
         |   (472,'zh'), (473,'fr'), (474,'fr'), (475,'en'), (476,'fr'),
         |   (477,'fr'), (478,'fr'), (479,'fr'), (480,'fr'), (481,'fr'),
         |   (482,'fr'), (483,'es'), (484,'zh'), (485,'fr'), (486,'fr'),
         |   (487,'fr'), (488,'zh'), (489,'zh'), (490,'fr'), (491,'fr'),
         |   (492,'zh'), (493,'fr'), (494,'fr'), (495,'fr'), (496,'fr'),
         |   (497,'fr'), (498,'fr'), (499,'zh')) v(id, l)""".stripMargin,
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
