package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.NativeKernels

/** Corpus-trained byte-pair-encoding tokenizer (SURVEY.md §2 H16) —
  * the tokenizer-training step of an LM data pipeline (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"; the algorithm behind GPT-2/LLaMA-family vocabularies).
  *
  * Scale shape (the same one HuggingFace tokenizers / SentencePiece
  * use): BPE training never iterates the corpus — it iterates the
  * WORD HISTOGRAM. One partial-aggregated `groupBy(word).count()`
  * pass reduces 100 TB of text to a vocabulary-sized frequency table
  * (Heaps' law: ~10^7 distinct words, not 10^13 tokens); a
  * deterministic `(count DESC, word ASC)` top-`maxWords` cut bounds
  * the driver's working set (the tail it drops is exactly the mass
  * `minCount` already excludes from merge statistics in reference
  * trainers). The merge loop then runs driver-side over that bounded
  * table — O(numMerges × Σ|word|) with NO further cluster work.
  *
  * Applying the tokenizer is map-side only: the merge table rides
  * the plan as one string literal into the codegen'd
  * [[NativeKernels.bpeEncode]] kernel (memoized parse + Zipf word
  * cache per executor) — zero shuffle, zero broadcast machinery, and
  * the encode stays inside WholeStageCodegen.
  *
  * Determinism (re-runs and engines agree): the histogram cut is
  * totally ordered; merge selection breaks weight ties by
  * lexicographic (left, right); and the kernel's greedy
  * rank-order-exhaustive apply is the canonical priority-queue
  * formulation (a merge can never create a lower-rank pair — its
  * symbols would have had to exist before that rank during
  * training). Spec-gated in BpeSpec: hand-computed merge sequences,
  * kernel == independent reference implementation, train-twice
  * identity, and exact detokenization round-trip via the `</w>`
  * marker.
  */
object Bpe {

  /** A trained merge table, rank = position. */
  final case class Model(merges: IndexedSeq[(String, String)]) {
    /** Kernel wire form: one `left TAB right` line per merge, rank =
      * line order (parsed once per executor, see NativeKernels).
      */
    lazy val serialized: String =
      merges.map { case (a, b) => a + "\t" + b }.mkString("\n")

    /** Subword units the merges can emit (merge results only — the
      * base alphabet is open: any code point + `</w>`).
      */
    def mergedVocab: Seq[String] = merges.map { case (a, b) => a + b }.distinct
  }

  /** End-of-word marker (re-exported from the kernel). */
  val Eow: String = NativeKernels.BpeEow

  /** Word histogram with the deterministic training cut: non-empty
    * space-split tokens, `count >= minCount`, top `maxWords` by
    * (count DESC, word ASC). The ONLY corpus pass training makes.
    */
  def wordHistogram(df: DataFrame, textCol: String,
      maxWords: Int, minCount: Long): Array[(String, Long)] = {
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    df.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
  }

  /** Train `numMerges` merges from a word histogram (driver-side; the
    * histogram is bounded by construction). Classic BPE: start from
    * code points + `</w>`, repeatedly take the adjacent symbol pair
    * with the highest corpus weight (ties → lexicographically
    * smallest pair) and fuse it everywhere.
    */
  def trainFromHistogram(hist: Array[(String, Long)],
      numMerges: Int): Model = {
    // words as mutable symbol sequences; weights never change
    val words = hist.map { case (w, _) =>
      val syms = new java.util.ArrayList[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        syms.add(w.substring(i, i + n))
        i += n
      }
      syms.add(Eow)
      syms
    }
    val weights = hist.map(_._2)
    val merges = IndexedSeq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      // pair weights over all words — one pass
      val pairW = new java.util.HashMap[String, Long]()
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi)
        val wt = weights(wi)
        var i = 0
        while (i < syms.size() - 1) {
          val k = syms.get(i) + ' ' + syms.get(i + 1)
          // merge, not get()+put: get() on a missing key unboxes null
          // to 0L in Scala, so the null check could never fire (the
          // sum was still right — by the unboxing accident — but the
          // code lied about how)
          pairW.merge(k, wt, (a, b) => a + b)
          i += 1
        }
        wi += 1
      }
      // deterministic argmax: weight DESC, then pair key ASC — a full
      // scan, independent of hash-map iteration order
      var bestKey: String = null
      var bestW = 0L
      val it = pairW.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val w = e.getValue.longValue()
        if (w > bestW || (w == bestW && (bestKey == null ||
            e.getKey.compareTo(bestKey) < 0))) {
          bestW = w; bestKey = e.getKey
        }
      }
      if (bestKey == null) exhausted = true
      else {
        val sp = bestKey.indexOf(' ')
        val a = bestKey.substring(0, sp)
        val b = bestKey.substring(sp + 1)
        val merged = a + b
        merges += ((a, b))
        // fuse left-to-right non-overlapping, same rule as the kernel
        wi = 0
        while (wi < words.length) {
          val syms = words(wi)
          var i = 0
          var out = 0
          while (i < syms.size()) {
            if (i < syms.size() - 1 && syms.get(i) == a &&
                syms.get(i + 1) == b) {
              syms.set(out, merged); i += 2
            } else { syms.set(out, syms.get(i)); i += 1 }
            out += 1
          }
          while (syms.size() > out) syms.remove(syms.size() - 1)
          wi += 1
        }
        step += 1
      }
    }
    Model(merges.result())
  }

  /** End-to-end training: histogram pass + driver merge loop. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000, minCount: Long = 2L): Model =
    trainFromHistogram(wordHistogram(df, textCol, maxWords, minCount),
      numMerges)

  /** Subword token stream of a text column under `model` — map-side
    * codegen kernel, merge table as a plan literal.
    */
  def encode(text: Column, model: Model): Column =
    NativeKernels.bpeEncodeCol(text, model.serialized)

  /** Tokenize a corpus: (id, tokens, n_tokens). */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    df.select(col(idCol), encode(col(textCol), model).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))

  /** Persist a trained model as an immutable versioned artifact
    * through the lake's [[graft.sources.CommitStore]] CAS — the
    * tokenizer IS the contract between a corpus and every model
    * trained on it, so it versions like a table: `save` claims the
    * next version atomically (concurrent saves serialize, never
    * interleave), `load` reads the newest (or a pinned version), and
    * a saved model round-trips byte-identically (the wire form is
    * the kernel's own merge-table serialization).
    */
  def save(root: String, model: Model,
      store: graft.sources.CommitStore =
        graft.sources.HardlinkCommitStore): Long = {
    var v = store.listVersions(root).sorted.lastOption.getOrElse(0L) + 1
    while (!store.tryCommit(root, v, model.serialized)) v += 1
    v
  }

  /** Load the newest (or `version`-pinned) saved model. */
  def load(root: String, version: Long = -1L,
      store: graft.sources.CommitStore =
        graft.sources.HardlinkCommitStore): Model = {
    val vs = store.listVersions(root)
    require(vs.nonEmpty, s"no BPE model saved at $root")
    val v = if (version > 0) version else vs.max
    val merges = store.readBody(root, v).linesIterator
      .filter(_.nonEmpty).map { l =>
        val t = l.indexOf('\t')
        require(t > 0, s"corrupt BPE model line at $root v$v: '$l'")
        (l.substring(0, t), l.substring(t + 1))
      }.toIndexedSeq
    Model(merges)
  }

  /** Exact inverse of [[tokenize]] for spec/round-trip use: fuse the
    * subword stream back into words at `</w>` boundaries.
    */
  def detokenize(tokens: Seq[String]): String = {
    val sb = new StringBuilder
    tokens.foreach { t =>
      if (t.endsWith(Eow)) {
        sb.append(t.dropRight(Eow.length)).append(' ')
      } else sb.append(t)
    }
    if (sb.nonEmpty && sb.last == ' ') sb.deleteCharAt(sb.length - 1)
    sb.toString
  }
}
