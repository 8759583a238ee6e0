package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup, MinHashLsh, Sampling}
import graft.functions.TextFns
import graft.sources.Tables

/** Extended training-data-pipeline and warehouse query family
  * (SURVEY.md §2 G1-G9): as-of join, deterministic stratified
  * sampling, PII scrubbing, corpus n-gram statistics,
  * duplicate-cluster connected components, one-scan DQ constraint
  * suites, SCD2 versioning, blocked fuzzy entity matching, and
  * incremental aggregate maintenance — each hash-gated against a
  * DuckDB oracle.
  */
object PipelineQueries {

  val queries: Map[String, Q] = Map(

    // G1 — as-of join: each order sees the customer's most recent
    // EARLIER order-day spend (strict <; DuckDB's ASOF JOIN is the
    // oracle). One key shuffle, no range explosion.
    // G1b — FORWARD as-of: each order joined to the customer's NEXT
    // spending day strictly after it (the "next reading" lookup).
    // DuckDB's ASOF with `<` replays the nearest-following semantics.
    "asof_next_spend" -> { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val o = orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_date"))
      val daily = orders
        .groupBy(col("o_custkey").as("k"),
          col("o_orderdate").cast("date").as("d"))
        .agg(exactSum(col("o_totalprice")).as("next_spend"))
      AsOfJoin.asOfForward(o, daily, "o_custkey", "k", "o_date", "d",
          payload = Seq("next_spend"), matchedTsName = "next_day",
          inclusive = false)
        .select(col("o_orderkey"), col("o_custkey"), col("o_date"),
          coalesce(col("next_day").cast("string"), lit("none"))
            .as("next_day"),
          coalesce(col("next_spend"), lit(0.0)).as("next_spend"))
    },

    "asof_prev_spend" -> { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val o = orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_date"))
      val daily = orders
        .groupBy(col("o_custkey").as("k"),
          col("o_orderdate").cast("date").as("d"))
        .agg(exactSum(col("o_totalprice")).as("prev_spend"))
      AsOfJoin.asOf(o, daily, "o_custkey", "k", "o_date", "d",
          payload = Seq("prev_spend"), matchedTsName = "prev_day",
          inclusive = false)
        .select(col("o_orderkey"), col("o_custkey"), col("o_date"),
          // null-free projections for the grading harness (pandas
          // can't sort None/NaT columns consistently across engines);
          // the operator API itself keeps proper nulls.
          coalesce(col("prev_day").cast("string"), lit("none"))
            .as("prev_day"),
          coalesce(col("prev_spend"), lit(0.0)).as("prev_spend"))
    },

    // G2 — deterministic stratified sampling by language: md5-bucket
    // per doc_id, per-stratum keep rates. Engine-portable (same rows
    // selected by DuckDB), map-side only.
    "sample_stratified" -> { (s, dir) =>
      Sampling.stratifiedSample(Tables.documents(s, dir),
          keyCol = "doc_id", stratumCol = "lang",
          rates = Map("en" -> 10, "zh" -> 35), defaultPct = 60)
        .select(col("doc_id"), col("lang"),
          Sampling.hashBucket(col("doc_id")).as("bucket"))
    },

    // G3 — PII scrubbing over a corpus with deterministically planted
    // emails/phones (the synthetic docs contain no digits, so the
    // plants are the ONLY matches — both engines must find and redact
    // exactly the same spans).
    "text_pii_scrub" -> { (s, dir) =>
      val planted = concat(col("text"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" contact agent"), col("doc_id").cast("string"),
            lit("@example.com now")))
        .when(pmod(col("doc_id"), lit(11)) === 0,
          concat(lit(" call +34 600 1"),
            lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
            lit(" 22 33 now")))
        .otherwise(lit("")))
      Tables.documents(s, dir)
        .withColumn("aug", planted)
        .select(col("doc_id"),
          TextFns.piiCount(col("aug")).as("n_pii"),
          TextFns.piiScrub(col("aug")).as("scrubbed"))
    },

    // G4 — corpus bigram statistics: top-20 bigrams by document
    // frequency (distinct per doc), deterministic (freq DESC, bigram)
    // tiebreak. Partial-aggregated count + TakeOrdered — no global
    // sort of the full bigram table.
    "text_ngram_topk" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(Dedup.shingles(col("text"), 2)).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("bigram").asc)
        .limit(20)
    },

    // G9 — incremental gold maintenance: the hourly profile built as
    // two INDEPENDENT partial aggregations (split by user parity, so
    // every (date, hour) group draws from both batches) and merged,
    // must equal the full recompute bit-for-bit — decimal partials
    // make the merge exact; the oracle IS the full recompute.
    "gold_incremental_profile" -> { (s, dir) =>
      import graft.operators.Incremental
      val fact = graft.lakehouse.Silver.factEventsCached(s, dir)
        .withColumn("date", col("partition_date"))
        .withColumn("hour", hour(col("period")))
      val keys = Seq("date", "hour")
      val ms = Map("trips" -> col("trips"))
      val partA = Incremental.partialSums(
        fact.filter(pmod(col("user_id"), lit(2)) === 0), keys, ms)
      val partB = Incremental.partialSums(
        fact.filter(pmod(col("user_id"), lit(2)) === 1), keys, ms)
      Incremental.finalize(
          Incremental.merge(Seq(partA, partB), keys, Seq("trips")),
          Seq("trips"))
        .select(col("date"), col("hour"), col("trips"), col("n_rows"))
    },

    // G8 — entity resolution: blocked fuzzy name matching (one-digit
    // "typos" between customer names), summarized per customer as
    // neighbor count + nearest id. Blocking on the 6-digit number
    // prefix caps blocks at ~1000 rows no matter the corpus size, so
    // total cost sum(block^2) stays LINEAR in n (the blocking-key
    // granularity is the recall/cost dial every ER pipeline turns).
    "er_fuzzy_names" -> { (s, dir) =>
      val m = Dedup.fuzzyMatches(Tables.customer(s, dir),
        "c_custkey", "c_name",
        nm => substring(nm, 10, 6), maxDist = 1)
      // symmetrize by EXPLODING both directions of each pair, not by
      // unioning two selects of `m` — Spark has no cross-branch CSE,
      // so the union form ran the whole block join + Levenshtein
      // kernel subtree TWICE (r16; plan audit showed two full
      // Exchange→ObjectHashAggregate→Generate chains under the
      // Union). Same (id, other) multiset, one kernel evaluation.
      m.select(explode(array(
          struct(col("id1").as("id"), col("id2").as("other")),
          struct(col("id2").as("id"), col("id1").as("other"))))
          .as("e"))
        .groupBy(col("e.id").as("c_custkey"))
        .agg(count(lit(1)).as("n_near"),
          min(col("e.other")).as("nearest"))
        .select(col("c_custkey"), col("n_near"), col("nearest"))
    },

    // G6 — declarative DQ constraint suite: every constraint is a
    // conditional count in ONE scan of the table.
    "dq_constraints" -> { (s, dir) =>
      import graft.operators.Quality.Constraint
      graft.operators.Quality.validate(Tables.events(s, dir), "events",
        Seq(
          Constraint("value_not_null", col("value").isNotNull, 0.95),
          Constraint("value_nonnegative", col("value") >= 0, 0.90),
          Constraint("event_type_present",
            col("event_type").isNotNull &&
              length(trim(col("event_type"))) > 0, 1.0),
          Constraint("ts_in_2024",
            col("ts").cast("date").between(
              lit("2024-01-01").cast("date"),
              lit("2024-12-31").cast("date")), 1.0),
          Constraint("user_id_positive", col("user_id") > 0, 1.0)))
    },

    // G7 — SCD type-2 versioned dimension from a change log: each
    // customer's order-status history collapsed to change rows with
    // [valid_from, valid_to) ranges; o_orderkey makes same-day
    // ordering total. Null valid_to projects to a 'current' sentinel
    // for the grading harness.
    "scd2_status" -> { (s, dir) =>
      val src = Tables.orders(s, dir).select(col("o_custkey"),
        col("o_orderdate").cast("date").as("d"),
        col("o_orderkey"), col("o_orderstatus"))
      graft.lakehouse.Silver.scd2FromChangeLog(src,
          keyCol = "o_custkey", tsCol = "d",
          tieCols = Seq("o_orderkey"), attrCols = Seq("o_orderstatus"))
        .select(col("o_custkey"), col("o_orderstatus"),
          col("valid_from").cast("string").as("valid_from"),
          coalesce(col("valid_to").cast("string"), lit("current"))
            .as("valid_to"),
          col("is_current"))
    },

    // G5 — duplicate clusters: connected components over the
    // MinHash-verified near-dup pairs (a~b, b~c collapse to one
    // cluster keyed by its minimum doc id). Oracle walks the same
    // pair set with a recursive CTE.
    "dedup_components" -> { (s, dir) =>
      // consumes the MATERIALIZED pair artifact (memoized like the
      // gold cluster assignments) — clustering never re-runs LSH
      val pairs = MinHashLsh.nearDuplicatesCached(
          Tables.documents(s, dir), "doc_id", "text", corpusTag = dir,
          threshold = 0.5)
        .select(col("id1"), col("id2"))
      Dedup.connectedComponents(pairs, "id1", "id2")
        .select(col("id").as("doc_id"), col("component"))
    },

    // Temperature-flattened domain mixing (α=0.5): per-language keep
    // rate min(1, k/√n) — kept counts grow ∝ √n so big languages
    // stop drowning small ones. k=10: a ≤100-doc language passes
    // whole, a 10k-doc one keeps ~10%. Hash-gated: every arithmetic
    // step is exactly rounded on identical operands in both engines
    // (no cross-domain sum — see Sampling.temperatureSample).
    "sample_temperature" -> { (s, dir) =>
      Sampling.temperatureSample(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          keyCol = "doc_id", domainCol = "lang", k = 10.0)
        .select(col("doc_id"), col("lang"), col("n_domain"))
    },

    // Leakage-safe train/val/test split: split assignment hashes the
    // duplicate-CLUSTER id (components over the verified near-dup
    // pairs; singletons = own cluster), so a near-dup pair can never
    // straddle train and test. Shares dedup_components' pair
    // artifact and its recursive-CTE oracle machinery.
    "split_leakage_safe" -> { (s, dir) =>
      val pairs = MinHashLsh.nearDuplicatesCached(
          Tables.documents(s, dir), "doc_id", "text", corpusTag = dir,
          threshold = 0.5)
        .select(col("id1"), col("id2"))
      Sampling.leakageSafeSplit(
          Tables.documents(s, dir).select(col("doc_id")),
          "doc_id", pairs)
        .select(col("doc_id"), col("component"), col("bucket"),
          col("split"))
    }
  )

  val oracles: Map[String, String] = Map(
    "asof_next_spend" ->
      """WITH daily AS (
        |  SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |      AS next_spend
        |  FROM orders GROUP BY 1, 2)
        |SELECT o.o_orderkey, o.o_custkey,
        |  CAST(o.o_orderdate AS DATE) AS o_date,
        |  COALESCE(CAST(d.d AS VARCHAR), 'none') AS next_day,
        |  COALESCE(d.next_spend, 0.0) AS next_spend
        |FROM orders o
        |ASOF LEFT JOIN daily d
        |  ON o.o_custkey = d.k AND CAST(o.o_orderdate AS DATE) < d.d"""
        .stripMargin,
    "asof_prev_spend" ->
      """WITH daily AS (
        |  SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |      AS prev_spend
        |  FROM orders GROUP BY 1, 2)
        |SELECT o.o_orderkey, o.o_custkey,
        |  CAST(o.o_orderdate AS DATE) AS o_date,
        |  COALESCE(CAST(d.d AS VARCHAR), 'none') AS prev_day,
        |  COALESCE(d.prev_spend, 0.0) AS prev_spend
        |FROM orders o
        |ASOF LEFT JOIN daily d
        |  ON o.o_custkey = d.k AND CAST(o.o_orderdate AS DATE) > d.d"""
        .stripMargin,
    "sample_stratified" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < (CASE WHEN lang = 'zh' THEN 35
        |                     WHEN lang = 'en' THEN 10 ELSE 60 END)"""
        .stripMargin,
    "text_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
      val phone = "\\+?[0-9][0-9 ]{6,}[0-9]"
      s"""WITH aug AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN
         |           ' contact agent' || CAST(doc_id AS VARCHAR)
         |             || '@example.com now'
         |         WHEN doc_id % 11 = 0 THEN
         |           ' call +34 600 1'
         |             || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
         |             || ' 22 33 now'
         |         ELSE '' END AS a
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(a, '$email'))
         |    + len(regexp_extract_all(a, '$phone')) AS INT) AS n_pii,
         |  regexp_replace(regexp_replace(a, '$email', '<EMAIL>', 'g'),
         |    '$phone', '<PHONE>', 'g') AS scrubbed
         |FROM aug""".stripMargin
    },
    "gold_incremental_profile" ->
      """SELECT CAST(ts AS DATE) AS date, hour(ts) AS hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS trips,
        |  count(*) AS n_rows
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n
        |  ON CAST(json_extract_string(e.props, '$.k') AS INT) % 25
        |     = n.n_nationkey
        |WHERE e.value IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "er_fuzzy_names" ->
      """WITH p AS (
        |  SELECT c_custkey AS id, lower(c_name) AS nm,
        |    substr(lower(c_name), 10, 6) AS blk
        |  FROM customer),
        |m AS (
        |  SELECT a.id AS id1, b.id AS id2
        |  FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
        |  WHERE levenshtein(a.nm, b.nm) <= 1),
        |sym AS (SELECT id1 AS id, id2 AS other FROM m
        |        UNION ALL SELECT id2, id1 FROM m)
        |SELECT id AS c_custkey, count(*) AS n_near, min(other) AS nearest
        |FROM sym GROUP BY 1""".stripMargin,
    "dq_constraints" ->
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    count(CASE WHEN value IS NOT NULL THEN 1 END) AS ok0,
        |    count(CASE WHEN value >= 0 THEN 1 END) AS ok1,
        |    count(CASE WHEN event_type IS NOT NULL
        |               AND len(trim(event_type)) > 0 THEN 1 END) AS ok2,
        |    count(CASE WHEN CAST(ts AS DATE)
        |               BETWEEN DATE '2024-01-01' AND DATE '2024-12-31'
        |               THEN 1 END) AS ok3,
        |    count(CASE WHEN user_id > 0 THEN 1 END) AS ok4
        |  FROM events)
        |SELECT 'events' AS table_name, c.constraint_name, a.n AS n_rows,
        |  c.n_ok, CAST(c.n_ok AS DOUBLE) / a.n AS pass_rate,
        |  c.threshold, CAST(c.n_ok AS DOUBLE) / a.n >= c.threshold AS passed
        |FROM a, LATERAL (
        |  SELECT 'value_not_null' AS constraint_name, ok0 AS n_ok,
        |         CAST(0.95 AS DOUBLE) AS threshold
        |  UNION ALL SELECT 'value_nonnegative', ok1, CAST(0.90 AS DOUBLE)
        |  UNION ALL SELECT 'event_type_present', ok2, CAST(1.0 AS DOUBLE)
        |  UNION ALL SELECT 'ts_in_2024', ok3, CAST(1.0 AS DOUBLE)
        |  UNION ALL SELECT 'user_id_positive', ok4, CAST(1.0 AS DOUBLE)) c"""
        .stripMargin,
    "scd2_status" ->
      """WITH src AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    o_orderkey, o_orderstatus
        |  FROM orders),
        |chg AS (
        |  SELECT o_custkey, d, o_orderkey, o_orderstatus FROM (
        |    SELECT *, lag(o_orderstatus) OVER (
        |      PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev
        |    FROM src)
        |  WHERE prev IS NULL OR prev <> o_orderstatus)
        |SELECT o_custkey, o_orderstatus,
        |  CAST(d AS VARCHAR) AS valid_from,
        |  COALESCE(CAST(lead(d) OVER (
        |    PARTITION BY o_custkey ORDER BY d, o_orderkey) AS VARCHAR),
        |    'current') AS valid_to,
        |  lead(d) OVER (
        |    PARTITION BY o_custkey ORDER BY d, o_orderkey) IS NULL
        |    AS is_current
        |FROM chg""".stripMargin,
    "text_ngram_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i.gs] || ' ' || w[i.gs+1] AS bigram
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(len(w) - 1, 0))) AS gs) i)
        |SELECT bigram, count(*) AS doc_freq FROM sh
        |GROUP BY 1 ORDER BY doc_freq DESC, bigram LIMIT 20""".stripMargin,
    "dedup_components" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i.gs] || ' ' || w[i.gs+1] || ' ' || w[i.gs+2] AS shingle
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(len(w) - 2, 0))) AS gs) i),
        |card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jpairs AS (
        |  SELECT id1, id2 FROM cand
        |  JOIN card ca ON id1 = ca.doc_id
        |  JOIN card cb ON id2 = cb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5),
        |ed AS (SELECT id1 AS a, id2 AS b FROM jpairs
        |       UNION SELECT id2, id1 FROM jpairs),
        |walk(id, reach) AS (
        |  SELECT a, a FROM ed
        |  UNION SELECT w.id, ed.b FROM walk w JOIN ed ON w.reach = ed.a)
        |SELECT id AS doc_id, min(reach) AS component
        |FROM walk GROUP BY 1""".stripMargin,
    "sample_temperature" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_domain FROM documents GROUP BY 1),
        |j AS (
        |  SELECT d.doc_id, d.lang, c.n_domain,
        |    CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS b32
        |  FROM documents d JOIN c USING (lang))
        |SELECT doc_id, lang, n_domain FROM j
        |WHERE b32 < CAST(floor(least(1.0,
        |  10.0 / sqrt(CAST(n_domain AS DOUBLE))) * 4294967296.0)
        |  AS BIGINT)""".stripMargin,
    "split_leakage_safe" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i.gs] || ' ' || w[i.gs+1] || ' ' || w[i.gs+2] AS shingle
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(len(w) - 2, 0))) AS gs) i),
        |card AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |cand AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jpairs AS (
        |  SELECT id1, id2 FROM cand
        |  JOIN card ca ON id1 = ca.doc_id
        |  JOIN card cb ON id2 = cb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5),
        |ed AS (SELECT id1 AS a, id2 AS b FROM jpairs
        |       UNION SELECT id2, id1 FROM jpairs),
        |walk(id, reach) AS (
        |  SELECT a, a FROM ed
        |  UNION SELECT w.id, ed.b FROM walk w JOIN ed ON w.reach = ed.a),
        |comp AS (SELECT id AS doc_id, min(reach) AS component
        |         FROM walk GROUP BY 1),
        |assigned AS (
        |  SELECT d.doc_id,
        |    COALESCE(c.component, d.doc_id) AS component
        |  FROM documents d LEFT JOIN comp c USING (doc_id)),
        |b AS (
        |  SELECT doc_id, component,
        |    CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 100 AS bucket
        |  FROM assigned)
        |SELECT doc_id, component, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b""".stripMargin
  )
}
