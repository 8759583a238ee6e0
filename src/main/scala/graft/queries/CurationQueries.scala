package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{Bloom, Curation, Export, HeavyHitters}
import graft.sources.Tables

/** Corpus-curation & export query family (SURVEY.md §2 H1-H5):
  * segment-level boilerplate removal, TF-IDF salient terms,
  * deterministic shard/packing manifest, bloom-pruned membership,
  * and URL/domain curation stats — each hash-gated against a DuckDB
  * oracle.
  */
object CurationQueries {

  /** Hosts excluded by the curation blocklist (H5). */
  val blockedHosts: Seq[String] =
    Seq("src7.example.com", "src13.example.com")

  val queries: Map[String, Q] = Map(

    // H21 — DSIR importance resampling, exact-integer face: fit the
    // hashed unigram+bigram models (target = doc_id%10==0 slice, raw
    // = rest), then project every raw doc onto the count tables —
    // n_features and the two count sums are integers, so the whole
    // hash→bucket→literal-table→sum pipeline is hash-gated exactly
    // (the log-weighted score is libm-bound → tolerance-gated
    // locally, see curate_dsir_score).
    "curate_dsir_counts" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val target = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val raw = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val m = graft.operators.Dsir.fit(target, raw, "text",
        buckets = 4096)
      graft.operators.Dsir.countSums(raw, "doc_id", "text", m)
    },

    // H21 — the importance score itself (Σ smoothed log-ratio over
    // hashed features). [R] for the driver; the local harness
    // cross-checks vs DuckDB at rtol 1e-9 (TOLERANCE_ORACLES).
    "curate_dsir_score" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val target = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val raw = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val m = graft.operators.Dsir.fit(target, raw, "text",
        buckets = 4096)
      graft.operators.Dsir.score(raw, "doc_id", "text", m)
    },

    // H1 — boilerplate removal: 3-token segments, df >= 3 across the
    // corpus is boilerplate; documents reassembled from kept segments.
    "text_boilerplate" -> { (s, dir) =>
      Curation.removeBoilerplate(Tables.documents(s, dir),
        "doc_id", "text", k = 3, maxDf = 3)
    },

    // H2 — top-3 salient terms per doc by tf-idf (ratio idf: exact
    // arithmetic, hash-gateable — see Curation.tfidfTopK).
    "text_tfidf_topk" -> { (s, dir) =>
      Curation.tfidfTopK(Tables.documents(s, dir), "doc_id", "text",
        topK = 3)
    },

    // H3 — deterministic export manifest: md5-bucket shard, per-shard
    // concat-and-chunk packing at a 256-token budget.
    "export_pack_manifest" -> { (s, dir) =>
      Export.packingManifest(Tables.documents(s, dir), "doc_id",
        TextFns.wordCount(col("text")), nShards = 8, budget = 256)
    },

    // H12 — corpus-trained bigram-LM scoring (the perplexity-filter
    // step; self-trained, zero external models). [R] + local
    // tolerance cross-check (tools/check.py): the per-doc avg of
    // -log2 P sums doubles in engine-specific order, so it can never
    // hash-match but rtol 1e-9 still validates the model arithmetic
    // against DuckDB end to end.
    "text_lm_score" -> { (s, dir) =>
      Curation.lmScore(Tables.documents(s, dir), "doc_id", "text")
    },

    // H11 — seeded deterministic corpus shuffle: the epoch-order
    // layout (id, shard, pos) from the engine-portable md5 shuffle
    // key. Any drift in the key recipe, sharding, or rank order
    // hash-mismatches against DuckDB computing the same permutation.
    "export_shuffle" -> { (s, dir) =>
      Export.shuffledLayout(Tables.documents(s, dir), "doc_id",
        seed = 42L, nShards = 8)
    },

    // H13 — cross-document exact-substring dedup (detection): maximal
    // runs of >= 8 consecutive tokens shared verbatim between two
    // docs, with 0-based token offsets in both. The oracle replays
    // the engine-portable double rolling hash and the same
    // diagonal-streak collapse.
    "dedup_spans" -> { (s, dir) =>
      Curation.sharedSpans(Tables.documents(s, dir), "doc_id", "text",
        k = 8, minLen = 8, maxPostings = 1000)
    },

    // H13b — the trim: every >= 20-token shared run is excised from
    // the higher-id doc (keep-first), untouched docs byte-identical.
    "text_span_trim" -> { (s, dir) =>
      Curation.trimSharedSpans(Tables.documents(s, dir), "doc_id",
        "text", k = 8, minLen = 20, maxPostings = 1000)
    },

    // H14 — duplicate-n-gram repetition fractions (Gopher rules): the
    // char fraction covered by intra-doc 2-gram and 3-gram repeats.
    "text_dup_ngrams" -> { (s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        Curation.dupNgramFraction(col("text"), 2).as("dup2_frac"),
        Curation.dupNgramFraction(col("text"), 3).as("dup3_frac"))
    },

    // H15 — exact corpus top-k tokens via the Misra-Gries
    // candidates + verify path (no full-key-space shuffle; the kth
    // count clears the n/(s+1) bound on this corpus, so the fast
    // path's answer is PROVEN exact — and the oracle is the naive
    // full aggregation it must equal).
    "text_topk_tokens" -> { (s, dir) =>
      val toks = Tables.documents(s, dir).select(
        explode(filter(split(col("text"), " "),
          t => length(t) > 0)).as("tok"))
      HeavyHitters.exactTopK(toks, "tok", k = 20, s = 64)
    },

    // H4 — bloom-pruned membership: which probe keys already exist in
    // the base (orders) table. Keys ≡ 0 (mod 3) are shifted out of
    // the key space, so the batch mixes definite-new keys (the bloom
    // prunes these map-side, no join) with present ones (verified
    // exactly). The output is EXACT membership — the bloom only
    // routes, never decides positives.
    "bloom_new_keys" -> { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val probe = Tables.customer(s, dir).select(col("c_custkey"),
        when(pmod(col("c_custkey"), lit(3)) === 0,
          col("c_custkey") + 1000000)
          .otherwise(col("c_custkey")).cast("long").as("probe_key"))
      val f = Bloom.build(orders, "o_custkey")
      Bloom.flagMembership(probe, "probe_key", orders, "o_custkey", f)
        .select(col("c_custkey"), col("probe_key"), col("is_known"))
    },

    // H6 — intra-document repetition trim: later repeats of a 2-token
    // segment within the same doc are dropped, first occurrence kept.
    "text_intradoc_dedup" -> { (s, dir) =>
      Curation.dedupWithinDoc(Tables.documents(s, dir),
        "doc_id", "text", k = 2)
    },

    // H7 — fixed-budget deterministic sampling: exactly 20 docs per
    // language by md5-hash order (portable, growth-stable).
    "sample_topn_stratified" -> { (s, dir) =>
      graft.operators.Sampling.topNPerStratum(
          Tables.documents(s, dir), "doc_id", "lang", n = 20)
        .select(col("doc_id"), col("lang"), col("rank").cast("int")
          .as("rank"))
    },

    // H5 — URL parse + blocklist + per-domain stats over URLs derived
    // deterministically from the documents table (the corpus has no
    // URL column; the derivation is part of the gated computation).
    "curate_url_stats" -> { (s, dir) =>
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/p/"), col("doc_id").cast("string"),
        lit("?ref="), col("lang"))
      Tables.documents(s, dir)
        .withColumn("host", TextFns.urlHost(url))
        .withColumn("ref", TextFns.urlQueryParam(url, "ref"))
        .filter(!col("host").isin(blockedHosts: _*))
        .groupBy(col("host"))
        .agg(count(lit(1)).cast("int").as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          countDistinct(col("ref")).cast("int").as("n_langs"))
    },

    // H18 — canonical-URL dedup key: URLs derived with planted crawl
    // noise (uppercase scheme/host, default :443 port, trailing
    // slash, utm_/gclid tracking params, unsorted param order,
    // fragments) must canonicalize identically in both engines —
    // every normalization rule is exercised by some doc_id residue
    // class, and the oracle replays the same regexp/list pipeline.
    "curate_url_canon" -> { (s, dir) =>
      val id = col("doc_id")
      val url = concat(
        when(pmod(id, lit(6)) === 0, lit("HTTPS"))
          .otherwise(lit("https")),
        lit("://"),
        when(pmod(id, lit(6)) === 0, upper(col("source")))
          .otherwise(col("source")),
        lit(".example.com"),
        when(pmod(id, lit(3)) === 0, lit(":443")).otherwise(lit("")),
        lit("/p/"), (id.cast("long") / 7).cast("long").cast("string"),
        when(pmod(id, lit(2)) === 0, lit("/")).otherwise(lit("")),
        when(pmod(id, lit(4)) === 0,
          concat(lit("?utm_source=news&ref="), col("lang")))
          .when(pmod(id, lit(4)) === 1,
            concat(lit("?ref="), col("lang"), lit("&b=2&a=1")))
          .when(pmod(id, lit(4)) === 2, lit("?gclid=abc123"))
          .otherwise(lit("")),
        when(pmod(id, lit(5)) === 0, lit("#section-2"))
          .otherwise(lit("")))
      Tables.documents(s, dir)
        .select(col("doc_id"), url.as("url"))
        .withColumn("canon_url", TextFns.canonicalUrl(col("url")))
    },

    // H16∘H3 — the tokenizer-to-training-export composite: token
    // counts come from the CORPUS-TRAINED BPE model (not whitespace),
    // then the deterministic shard/packing manifest lays sequences
    // out at a 512-token budget — the exact chain a pretraining data
    // job ships. [R]: BPE counts are not SQL-replayable; the packing
    // arithmetic itself is the hash-gated H3 path.
    "export_bpe_pack" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val model = graft.operators.Bpe.train(docs, "text",
        numMerges = 200, maxWords = 20000, minCount = 2)
      val counted = graft.operators.Bpe.tokenize(docs, "doc_id",
        "text", model)
      Export.packingManifest(counted, "doc_id", col("n_tokens"),
        nShards = 8, budget = 512)
    },

    // H16 — corpus-trained BPE tokenizer ([R]: the merge-training
    // loop is not SQL-expressible — rows-only + BpeSpec's
    // hand-computed-merges/kernel-parity/determinism gates). Training
    // reads ONE word histogram (the corpus never leaves the cluster);
    // apply is a map-side codegen kernel with the merge table as a
    // plan literal. Output: per-doc subword counts + the compression
    // ratio a tokenizer report cares about, plus the first merges as
    // a fingerprint of the learned vocabulary.
    "bpe_tokenize" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val model = graft.operators.Bpe.train(docs, "text",
        numMerges = 200, maxWords = 20000, minCount = 2)
      graft.operators.Bpe.tokenize(docs, "doc_id", "text", model)
        .withColumn("first_merges",
          lit(model.merges.take(5).map(p => p._1 + p._2).mkString(" ")))
        .select(col("doc_id"), col("n_tokens"), col("first_merges"))
    }
  )

  /** Shared CTE prefix for the H13 oracles: per-token fingerprint
    * hashes, k=8 rolling window hashes (the kernel's exact double
    * fold), posting-cap filter, positional self-join, and the
    * diagonal-streak collapse to maximal runs.
    */
  private val spanRunsCte: String =
    """WITH th AS (
      |  SELECT doc_id, list_transform(
      |    list_filter(string_split(text, ' '), t -> len(t) > 0), t ->
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_extract_all(
      |          regexp_replace(t, '[^ -~]', '', 'g'), '.'),
      |        c -> CAST(ascii(c) AS BIGINT))),
      |      (h, c) -> (h * 131 + c) % 1000000007)) AS hs
      |  FROM documents),
      |wins AS (
      |  SELECT doc_id,
      |    unnest(range(0, greatest(len(hs) - 7, 0))) AS pos,
      |    unnest(list_transform(range(1, greatest(len(hs) - 6, 1)), i ->
      |      list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
      |        (h, t) -> (h * 10007 + t) % 1000000007) * 1000000009
      |      + list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i:i+7]),
      |        (h, t) -> (h * 10009 + t) % 1000000009))) AS wh
      |  FROM th),
      |ok AS (SELECT wh FROM wins GROUP BY wh
      |       HAVING count(*) BETWEEN 2 AND 1000),
      |w2 AS (SELECT w.* FROM wins w SEMI JOIN ok USING (wh)),
      |m AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2,
      |    a.pos AS pos1, b.pos AS pos2
      |  FROM w2 a JOIN w2 b ON a.wh = b.wh AND a.doc_id < b.doc_id),
      |spans AS (
      |  SELECT id1, id2, min(pos1) AS start1, min(pos2) AS start2,
      |    CAST(count(*) + 7 AS BIGINT) AS len_tokens
      |  FROM (
      |    SELECT id1, id2, pos2 - pos1 AS d,
      |      pos1 - row_number() OVER
      |        (PARTITION BY id1, id2, pos2 - pos1 ORDER BY pos1) AS grp,
      |      pos1, pos2
      |    FROM m)
      |  GROUP BY id1, id2, d, grp)""".stripMargin

  /** Per-n CTE block for the H14 oracle: windows of the same 60-bit
    * double-fold hash as the kernel, duplicated values, covered token
    * positions, covered char sum. Names are suffixed by n.
    */
  private def dupFracCtes(n: Int): String =
    s"""wins$n AS (
       |  SELECT doc_id,
       |    unnest(range(0, greatest(len(hs) - ${n - 1}, 0))) AS pos,
       |    unnest(list_transform(range(1, greatest(len(hs) - ${n - 2}, 1)), i ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i:i+${n - 1}]),
       |        (h, t) -> (h * 10007 + t) % 1000000007) * 1000000009
       |      + list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i:i+${n - 1}]),
       |        (h, t) -> (h * 10009 + t) % 1000000009))) AS wh
       |  FROM th),
       |dup$n AS (SELECT doc_id, wh FROM wins$n GROUP BY doc_id, wh
       |          HAVING count(*) >= 2),
       |cov$n AS (
       |  SELECT DISTINCT w.doc_id, w.pos + o.o AS tpos
       |  FROM wins$n w
       |  JOIN dup$n d ON w.doc_id = d.doc_id AND w.wh = d.wh
       |  CROSS JOIN (SELECT unnest(range(0, $n)) AS o) o),
       |c$n AS (
       |  SELECT t.doc_id, sum(t.l) AS cov FROM tlen t
       |  SEMI JOIN cov$n c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
       |  GROUP BY 1)""".stripMargin

  /** DuckDB replay of the DSIR portable gram hash → bucket (the
    * dedup_simhash poly pair, bucketed): list_reduce over the
    * printable-ASCII projection of the gram.
    */
  private def dsirPoly(expr: String, base: Int, mod: Long): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(regexp_extract_all(
       |        regexp_replace($expr, '[^ -~]', '', 'g'), '.'),
       |        c -> CAST(ascii(c) AS BIGINT))),
       |      (h, c) -> (h * $base + c) % $mod)""".stripMargin

  private def dsirBucket(expr: String): String =
    s"(${dsirPoly(expr, 131, 1000000007L)} * 1073741824 + " +
      s"${dsirPoly(expr, 137, 998244353L)}) % 4096"

  /** Shared feature CTE for the DSIR oracles: every unigram and
    * adjacent bigram occurrence of every document, bucketed.
    */
  private val dsirFeats: String =
    s"""toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS w
       |  FROM documents),
       |uni AS (
       |  SELECT doc_id, unnest(list_transform(w, t ->
       |    ${dsirBucket("t")})) AS bucket
       |  FROM toks),
       |bi AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i ->
       |    ${dsirBucket("(w[i] || ' ' || w[i+1])")})) AS bucket
       |  FROM toks),
       |feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
       |tc AS (SELECT bucket, count(*) AS c FROM feats
       |  WHERE doc_id % 10 = 0 GROUP BY 1),
       |rc AS (SELECT bucket, count(*) AS c FROM feats
       |  WHERE doc_id % 10 <> 0 GROUP BY 1)""".stripMargin

  // the log-weighted curate_dsir_score is cross-checked locally at
  // rtol 1e-9 (libm log differs in last ulps between engines):
  // tools/check.py TOLERANCE_ORACLES carries its DuckDB replay, built
  // from the same feature CTE as curate_dsir_counts below

  val oracles: Map[String, String] = Map(
    "curate_dsir_counts" ->
      s"""WITH $dsirFeats,
         |agg AS (
         |  SELECT f.doc_id, count(*) AS nf,
         |    sum(COALESCE(tc.c, 0)) AS st, sum(COALESCE(rc.c, 0)) AS sr
         |  FROM feats f
         |  LEFT JOIN tc ON tc.bucket = f.bucket
         |  LEFT JOIN rc ON rc.bucket = f.bucket
         |  WHERE f.doc_id % 10 <> 0 GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(agg.nf, 0) AS BIGINT)
         |    AS n_features,
         |  CAST(COALESCE(agg.st, 0) AS BIGINT) AS sum_target,
         |  CAST(COALESCE(agg.sr, 0) AS BIGINT) AS sum_raw
         |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
         |WHERE d.doc_id % 10 <> 0""".stripMargin,
    "curate_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 6 = 0 THEN 'HTTPS' ELSE 'https' END)
        |    || '://' ||
        |    (CASE WHEN doc_id % 6 = 0 THEN upper(source) ELSE source END)
        |    || '.example.com' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
        |    || '/p/' || CAST(doc_id // 7 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=news&ref=' || lang
        |          WHEN doc_id % 4 = 1 THEN '?ref=' || lang || '&b=2&a=1'
        |          WHEN doc_id % 4 = 2 THEN '?gclid=abc123'
        |          ELSE '' END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END)
        |      AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, url,
        |    lower(coalesce(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme,
        |    lower(coalesce(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ''))
        |      AS hostport,
        |    coalesce(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')
        |      AS rawpath,
        |    coalesce(regexp_extract(url, '\?([^#]*)', 1), '') AS qs
        |  FROM u),
        |q AS (
        |  SELECT doc_id, url, scheme, hostport, rawpath,
        |    coalesce(array_to_string(list_sort(list_filter(
        |      string_split(qs, '&'),
        |      s -> len(s) > 0 AND NOT starts_with(s, 'utm_')
        |        AND NOT starts_with(s, 'fbclid=')
        |        AND NOT starts_with(s, 'gclid='))), '&'), '') AS qlist
        |  FROM p)
        |SELECT doc_id, url,
        |  scheme || '://' ||
        |  (CASE WHEN scheme = 'http'
        |        THEN regexp_replace(hostport, ':80$', '')
        |        WHEN scheme = 'https'
        |        THEN regexp_replace(hostport, ':443$', '')
        |        ELSE hostport END) ||
        |  (CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
        |        ELSE regexp_replace(rawpath, '/+$', '') END) ||
        |  (CASE WHEN qlist = '' THEN '' ELSE '?' || qlist END)
        |    AS canon_url
        |FROM q""".stripMargin,
    "text_topk_tokens" ->
      """SELECT tok AS item, count(*) AS cnt
        |FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |        t -> len(t) > 0)) AS tok
        |      FROM documents)
        |GROUP BY 1
        |ORDER BY cnt DESC, item ASC
        |LIMIT 20""".stripMargin,
    "text_dup_ngrams" ->
      (s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
         |  FROM documents),
         |th AS (
         |  SELECT doc_id, list_transform(tk, t ->
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(regexp_extract_all(
         |          regexp_replace(t, '[^ -~]', '', 'g'), '.'),
         |        c -> CAST(ascii(c) AS BIGINT))),
         |      (h, c) -> (h * 131 + c) % 1000000007)) AS hs
         |  FROM tk),
         |tlen AS (
         |  SELECT doc_id, unnest(range(0, len(tk))) AS tpos,
         |    unnest(list_transform(tk, t -> CAST(len(t) AS BIGINT))) AS l
         |  FROM tk),
         |tot AS (SELECT doc_id, sum(l) AS total FROM tlen GROUP BY 1),
         |""".stripMargin
        + dupFracCtes(2) + ",\n" + dupFracCtes(3) + "\n"
        + """SELECT d.doc_id,
         |  CASE WHEN coalesce(t.total, 0) = 0 THEN 0.0
         |       ELSE CAST(coalesce(c2.cov, 0) AS DOUBLE)
         |         / CAST(t.total AS DOUBLE) END AS dup2_frac,
         |  CASE WHEN coalesce(t.total, 0) = 0 THEN 0.0
         |       ELSE CAST(coalesce(c3.cov, 0) AS DOUBLE)
         |         / CAST(t.total AS DOUBLE) END AS dup3_frac
         |FROM documents d
         |LEFT JOIN tot t USING (doc_id)
         |LEFT JOIN c2 USING (doc_id)
         |LEFT JOIN c3 USING (doc_id)""".stripMargin),
    "dedup_spans" -> (spanRunsCte +
      "\nSELECT id1, id2, start1, start2, len_tokens FROM spans"),
    "text_span_trim" -> (spanRunsCte + """,
      |iv AS (
      |  SELECT id2 AS doc_id, start2 AS s, start2 + len_tokens - 1 AS e
      |  FROM spans WHERE len_tokens >= 20),
      |isl AS (
      |  SELECT doc_id, s, e,
      |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS ni
      |  FROM iv),
      |merged AS (
      |  SELECT doc_id, min(s) AS s, max(e) AS e FROM (
      |    SELECT doc_id, s, e,
      |      sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e) AS g
      |    FROM isl) GROUP BY doc_id, g),
      |tokpos AS (
      |  SELECT d.doc_id, unnest(range(0, len(tk))) AS pos,
      |    unnest(tk) AS tok
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
      |        FROM documents) d
      |  SEMI JOIN (SELECT DISTINCT doc_id FROM merged) md USING (doc_id)),
      |trimmed AS (
      |  SELECT t.doc_id,
      |    coalesce(string_agg(t.tok, ' ' ORDER BY t.pos)
      |      FILTER (WHERE mg.doc_id IS NULL), '') AS newtext
      |  FROM tokpos t LEFT JOIN merged mg
      |    ON t.doc_id = mg.doc_id AND t.pos BETWEEN mg.s AND mg.e
      |  GROUP BY t.doc_id)
      |SELECT d.doc_id,
      |  CASE WHEN tr.doc_id IS NOT NULL THEN tr.newtext ELSE d.text END
      |    AS text
      |FROM documents d LEFT JOIN trimmed tr USING (doc_id)""".stripMargin),
    // segment matching joins on xxhash64 on the Spark side and on the
    // segment STRING here — identical modulo 64-bit collisions (the
    // dedup_jaccard hash-join contract).
    "text_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '),
        |    t -> len(t) > 0) AS w
        |  FROM documents),
        |seg AS (
        |  SELECT doc_id, i.s AS seg_idx,
        |    array_to_string(w[(i.s*3+1):least((i.s+1)*3, len(w))], ' ')
        |      AS seg
        |  FROM toks, LATERAL (SELECT unnest(range(CAST(ceil(len(w)/3.0)
        |    AS INT))) AS s) i),
        |df AS (SELECT seg, count(DISTINCT doc_id) AS df FROM seg
        |       GROUP BY 1),
        |tagged AS (
        |  SELECT s.doc_id, s.seg_idx, s.seg, d.df >= 3 AS boiler
        |  FROM seg s JOIN df d USING (seg))
        |SELECT doc_id, CAST(count(*) AS INT) AS n_segments,
        |  CAST(count(CASE WHEN boiler THEN 1 END) AS INT) AS n_removed,
        |  COALESCE(array_to_string(
        |    list(seg ORDER BY seg_idx) FILTER (NOT boiler), ' '), '')
        |    AS clean_text
        |FROM tagged GROUP BY 1""".stripMargin,
    "text_intradoc_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '),
        |    t -> len(t) > 0) AS w
        |  FROM documents),
        |seg AS (
        |  SELECT doc_id, i.s AS seg_idx,
        |    array_to_string(w[(i.s*2+1):least((i.s+1)*2, len(w))], ' ')
        |      AS seg
        |  FROM toks, LATERAL (SELECT unnest(range(CAST(ceil(len(w)/2.0)
        |    AS INT))) AS s) i),
        |rk AS (
        |  SELECT doc_id, seg_idx, seg,
        |    row_number() OVER (PARTITION BY doc_id, seg
        |      ORDER BY seg_idx) AS occ
        |  FROM seg)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_segments,
        |  CAST(count(CASE WHEN occ > 1 THEN 1 END) AS INT) AS n_dropped,
        |  COALESCE(array_to_string(
        |    list(seg ORDER BY seg_idx) FILTER (occ = 1), ' '), '')
        |    AS dedup_text
        |FROM rk GROUP BY 1""".stripMargin,
    "sample_topn_stratified" ->
      """WITH rk AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rk AS INT) AS rank
        |FROM rk WHERE rk <= 20""".stripMargin,
    "text_tfidf_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> len(t) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |       GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |ranked AS (
        |  SELECT doc_id, term, tf, df,
        |    CAST(tf AS DOUBLE) * n.n_docs / df AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf AS DOUBLE) / df DESC, term)
        |      AS rk
        |  FROM tf JOIN dfreq USING (term), n)
        |SELECT doc_id, CAST(rk AS INT) AS rank, term,
        |  CAST(tf AS INT) AS tf, CAST(df AS INT) AS df, score
        |FROM ranked WHERE rk <= 3""".stripMargin,
    "export_pack_manifest" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 8 AS shard,
        |    len(list_filter(string_split(text, ' '), t -> len(t) > 0))
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT doc_id, CAST(shard AS INT) AS shard,
        |  CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(cum - n_tokens AS BIGINT) AS start_tok,
        |  CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_first,
        |  CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // 256
        |            ELSE (cum - 1) // 256 END AS BIGINT) AS seq_last
        |FROM c""".stripMargin,
    "export_shuffle" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)),
        |      1, 8)) AS BIGINT) AS skey
        |  FROM documents)
        |SELECT doc_id, CAST(skey % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY skey % 8
        |    ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
        |FROM d""".stripMargin,
    "bloom_new_keys" ->
      """WITH probe AS (
        |  SELECT c_custkey,
        |    CAST(CASE WHEN c_custkey % 3 = 0 THEN c_custkey + 1000000
        |              ELSE c_custkey END AS BIGINT) AS probe_key
        |  FROM customer),
        |base AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT p.c_custkey, p.probe_key, b.k IS NOT NULL AS is_known
        |FROM probe p LEFT JOIN base b ON p.probe_key = b.k""".stripMargin,
    "curate_url_stats" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    'https://' || source || '.example.com/p/'
        |      || CAST(doc_id AS VARCHAR) || '?ref=' || lang AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)
        |      AS host,
        |    regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref
        |  FROM u)
        |SELECT host, CAST(count(*) AS INT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(count(DISTINCT ref) AS INT) AS n_langs
        |FROM p
        |WHERE host NOT IN ('src7.example.com', 'src13.example.com')
        |GROUP BY 1""".stripMargin
  )
}
