package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM training-data pipelines
  * (SURVEY.md §2 E7-E10): language ID, quality scoring, token
  * counting, document fingerprinting.
  *
  * Everything is a composition of codegen'd built-in expressions — no
  * UDFs — and every arithmetic step is integer or a single
  * correctly-rounded IEEE op, so all outputs are engine-portable and
  * hash-gated against DuckDB oracles.
  */
object TextFns {

  /** Whitespace tokens with empties dropped (split on single spaces,
    * filter zero-length — deterministic under repeated spaces).
    */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  /** Count of a specific token — exact token equality, no regex
    * engine semantics involved. Marker words route through ONE shared
    * native [[graft.expressions.NativeKernels.tokenCounts]] pass —
    * every call for the same text column produces the identical
    * expression, so subexpression elimination evaluates the kernel
    * once per row no matter how many marker counts a projection needs
    * (langId + qualityScore stack 15+ of them). Non-marker words fall
    * back to the declarative form.
    *
    * CSE caveat (r15, measured): codegen subexpression elimination is
    * per-PROJECT, and CollapseProject deliberately keeps expensive
    * expressions in separate Projects — so a plan whose kernel
    * consumers straddle operator boundaries (the model-score + langid
    * composition) pays the kernel once per Project, not once per row.
    * For those plans, materialize [[markerCounts]] as a column first
    * and consume the `FromCounts` variants.
    */
  def tokenOccurrences(c: Column, word: String): Column = {
    val idx = kernelWords.indexOf(word)
    if (idx >= 0) kernelCounts(c).getItem(idx)
    else tokenOccurrencesReference(c, word)
  }

  /** Declarative reference form of [[tokenOccurrences]] — interpreted
    * HOF per element; parity with the kernel is spec-gated
    * (NativeKernelSpec).
    */
  def tokenOccurrencesReference(c: Column, word: String): Column =
    size(filter(split(c, " "), t => t === lit(word)))

  /** All marker words the text queries count, in one distinct list so
    * every kernel invocation is the same expression (CSE-friendly).
    */
  lazy val kernelWords: IndexedSeq[String] =
    (langMarkers.flatMap(_._2) ++ stopwords).distinct.toIndexedSeq

  private def kernelCounts(c: Column): Column =
    graft.expressions.NativeKernels.tokenCountsCol(c, kernelWords)

  /** Marker languages for [[langId]]: language → marker tokens.
    * Order is the deterministic tie-break priority.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"),
    "de" -> Seq("der", "die", "und"),
    "zh" -> Seq("的", "了", "是"))

  /** The shared marker/stopword counts array (one slot per
    * [[kernelWords]] entry, total word count in the final slot) — the
    * ONE kernel pass every marker-count consumer derives from.
    * Materialize it as a column when consumers span Projects (see the
    * [[tokenOccurrences]] CSE caveat); the `FromCounts` helpers below
    * read slots out of it. Bit-identical to the text-form helpers:
    * those ARE these applied to `markerCounts(c)`.
    */
  def markerCounts(c: Column): Column = kernelCounts(c)

  /** Marker-token score for one language. */
  def langScore(c: Column, lang: String): Column =
    langScoreFromCounts(markerCounts(c), lang)

  /** [[langScore]] over a pre-materialized [[markerCounts]] column. */
  def langScoreFromCounts(counts: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(w => counts.getItem(kernelWords.indexOf(w)))
      .reduce(_ + _)

  /** N-gram-marker language ID: argmax of marker-token counts with a
    * fixed priority tie-break; "und" when no marker appears.
    */
  def langId(c: Column): Column = langIdFromCounts(markerCounts(c))

  /** [[langId]] over a pre-materialized [[markerCounts]] column. */
  def langIdFromCounts(counts: Column): Column = {
    val scores = langMarkers.map { case (l, _) =>
      l -> langScoreFromCounts(counts, l) }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(maxScore > 0 && s === maxScore, lit(l)).otherwise(acc)
    }
  }

  /** Stopwords for the quality heuristic. */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  def wordCount(c: Column): Column =
    wordCountFromCounts(markerCounts(c))

  /** [[wordCount]] over a pre-materialized [[markerCounts]] column. */
  def wordCountFromCounts(counts: Column): Column =
    counts.getItem(kernelWords.length)

  /** Declarative reference form of [[wordCount]] (parity spec-gated). */
  def wordCountReference(c: Column): Column = size(tokens(c))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(
      (length(c) - length(regexp_replace(c, "[.,!?;:]", "")))
        .cast("double") / length(c).cast("double"))

  /** Ratio of stopword tokens to all tokens. */
  def stopwordRatio(c: Column): Column =
    stopwordRatioFromCounts(markerCounts(c))

  /** [[stopwordRatio]] over a pre-materialized [[markerCounts]]
    * column.
    */
  def stopwordRatioFromCounts(counts: Column): Column = {
    val n = wordCountFromCounts(counts)
    val stops = stopwords
      .map(w => counts.getItem(kernelWords.indexOf(w))).reduce(_ + _)
    when(n === 0, 0.0).otherwise(stops.cast("double") / n.cast("double"))
  }

  /** Composite quality score in [0,1]: mean of a length score
    * (saturating at 100 words), a natural-language score (stopwords
    * present), and a low-punctuation score. Pure rational arithmetic —
    * no transcendentals — so it is bit-portable.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(wordCount(c), lit(100)).cast("double") / 100.0
    val stopScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    val punctScore = lit(1.0) - punctRatio(c)
    (lenScore + stopScore + punctScore) / 3.0
  }

  /** BPE-ish token count: runs of letters, single digits, or single
    * non-alphanumeric marks — the classic pre-tokenizer shape.
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"),
      lit(0)))

  /** PII patterns for corpus scrubbing, with replacement tags. Kept
    * RE2-compatible (no lookarounds or backreferences) so the exact
    * same patterns run identically under Java regex, RE2, and DuckDB.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+" -> "<EMAIL>",
    "\\+?[0-9][0-9 ]{6,}[0-9]" -> "<PHONE>")

  /** Redact PII spans, longest-pattern-first chain of
    * `regexp_replace` — fully codegen'd, map-side, no UDF.
    */
  def piiScrub(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (p, tag)) =>
      regexp_replace(acc, p, tag)
    }

  /** Count of PII spans found (all patterns, pre-redaction). */
  def piiCount(c: Column): Column =
    piiPatterns.map { case (p, _) => regexp_count(c, lit(p)) }
      .reduce(_ + _)

  /** Polynomial rolling hash (base 131, mod 1e9+7) over the ASCII
    * projection of the text — a compact, order-sensitive document
    * fingerprint computable identically in any engine with 64-bit
    * integer arithmetic. One native byte-level pass
    * ([[graft.expressions.NativeKernels.fingerprint64]]); the
    * interpreted per-character fold remains as
    * [[fingerprintReference]] with parity spec-gated.
    */
  def fingerprint(c: Column): Column =
    graft.expressions.NativeKernels.fingerprint64Col(c)

  /** Declarative reference form of [[fingerprint]] — a per-character
    * interpreted `aggregate` fold.
    */
  def fingerprintReference(c: Column): Column = {
    val asciiOnly = regexp_replace(c, "[^ -~]", "")
    val codes = transform(
      regexp_extract_all(asciiOnly, lit("."), lit(0)),
      ch => ascii(ch).cast("long"))
    aggregate(codes, lit(0L),
      (h, code) => (h * lit(131L) + code) % lit(1000000007L))
  }

  // ---- URL parsing (web-crawl curation) ----------------------------
  // Plain RE2-safe regexes rather than Spark's parse_url so the exact
  // extraction replays in any engine (the oracle runs the same
  // patterns in DuckDB). Codegen'd, map-side.

  /** Host (authority) of an absolute URL: `scheme://HOST[/…]`. */
  def urlHost(u: Column): Column =
    regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)

  /** Path component (may be empty): everything after the authority
    * up to `?` or `#`.
    */
  def urlPath(u: Column): Column =
    regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Value of a single query parameter (empty when absent). The key
    * is regex-quoted: `q[0]` or `a.b` match literally instead of
    * crashing or over-matching (the oracle side interpolates its
    * plain alphanumeric key, which \Q..\E matches identically).
    */
  def urlQueryParam(u: Column, key: String): Column =
    regexp_extract(u,
      "[?&]" + java.util.regex.Pattern.quote(key) + "=([^&#]*)", 1)

  /** Registered-domain heuristic: the last two dot-labels of the
    * host (`a.b.example.com` → `example.com`). Public-suffix-list
    * accuracy is out of scope; the two-label rule is the standard
    * blocklist granularity for curation.
    */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Strip HTML to text (H20) — the first pass over a web corpus
    * before any quality/dedup signal (tags and entities otherwise
    * poison shingles, token counts and language ID): script/style
    * blocks drop WITH their content, every other tag drops, the
    * common named entities and the whitespace they leave collapse.
    * Deliberately declarative — a regexp_replace chain both engines
    * evaluate identically — so the whole transformation hash-gates
    * (the oracle replays the same chain). Not a browser: malformed
    * markup degrades to leaving text in place, never to dropping it.
    */
  def stripHtml(c: Column): Column = {
    // (?is): case-insensitive, DOTALL — script/style spans lines
    val noScript = regexp_replace(c,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val entities = Seq("&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'")
    // entity strings carry no regex metacharacters — plain patterns
    // keep the oracle replay character-identical
    val decoded = entities.foldLeft(noTags) { case (col0, (e, r)) =>
      regexp_replace(col0, e, r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Canonical URL form (H18) — the normalization a URL-level dedup
    * keys on (the same page arrives as `HTTP://Site.com:80/a/?utm_…#x`
    * and `http://site.com/a` across crawls): scheme+host lowercase,
    * default port stripped (`:80` for http, `:443` for https), empty
    * path → `/` and trailing slashes trimmed, tracking params
    * (`utm_*`, `fbclid`, `gclid`) dropped, remaining query params
    * SORTED (param order is transport noise), fragment dropped.
    * Deliberately declarative — every step is an engine-portable
    * regexp/array op the DuckDB oracle replays, so the whole
    * canonicalization is hash-gated end to end.
    */
  def canonicalUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http",
        regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val qs = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = filter(split(qs, "&"),
      p => length(p) > 0 &&
        !startswith(p, lit("utm_")) &&
        !startswith(p, lit("fbclid=")) &&
        !startswith(p, lit("gclid=")))
    val sortedQ = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQ === "", lit(""))
        .otherwise(concat(lit("?"), sortedQ)))
  }

  /** NFC canonical composition (H17): decomposed sequences (e +
    * combining acute) become their precomposed form, so dedup,
    * fingerprints and equality see one representation. Codegen kernel
    * with an already-normalized fast path.
    */
  def nfcNormalize(c: Column): Column =
    graft.expressions.NativeKernels.nfcNormalizeCol(c)

  /** Windows-1252/UTF-8 mojibake repair (H17, the ftfy core case):
    * "Ã©" → "é" when — and only when — the WHOLE string round-trips
    * strictly through cp1252-encode + UTF-8-decode; anything else
    * returns unchanged (mixed genuine-é + mojibake text stays as-is
    * rather than half-repairing). Up to 3 rounds for double mojibake.
    */
  def fixMojibake(c: Column): Column =
    graft.expressions.NativeKernels.fixMojibakeCol(c)
}
