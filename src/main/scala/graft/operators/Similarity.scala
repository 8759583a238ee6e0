package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2 E5/E6).
  *
  * Scale notes: `bruteForceTopK` broadcasts the QUERY side (queries
  * are assumed few; the corpus is the 100-TB side) and scans the
  * corpus once — O(|corpus|·|queries|) scoring but no shuffle of the
  * corpus. `ivfTopK` is the scale path: a KMeans coarse quantizer
  * (trained on a sample, centroid count `nlist`) buckets the corpus;
  * each query probes only its `nprobe` nearest cells, cutting scored
  * candidates to ~nprobe/nlist of the corpus. Both rank with a
  * per-query window on the scored candidates only.
  */
object Similarity {

  /** Exact cosine top-k: every query against every corpus vector.
    * Inputs: (idCol, vecCol) on both sides. Returns
    * (query_id, cand_id, cosine, rank<=k).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), VectorFns.norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).as("cv"), VectorFns.norm(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        VectorFns.cosine(VectorFns.dot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: corpus vectors whose
    * cosine similarity ≥ threshold, found WITHOUT an all-pairs join —
    * a KMeans coarse quantizer buckets the corpus and each vector is
    * assigned to its `nprobe` nearest cells; only same-cell pairs are
    * scored. Multi-probe assignment keeps near-dup pairs that straddle
    * a cell boundary (a near-dup's two vectors are nearly coincident,
    * so their top-nprobe cell sets overlap with high probability).
    *
    * Scale notes: the candidate join shuffles (cell, id, vec) rows —
    * nprobe× the corpus, never corpus² — and the per-cell self-join is
    * bounded by cell population; AQE splits hot cells. Returns
    * (id1 < id2, cosine).
    */
  def cosineNearDup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16, nprobe: Int = 2,
      seed: Long = 42L, corpusTag: String = ""): DataFrame = {
    // reuse the memoized quantizer when the corpus is tagged (the
    // near-dup pass and ANN queries share one trained index)
    val idx = ivfIndex(corpus, idCol, vecCol, nlist, seed, corpusTag)
    val celled = corpus
      .select(col(idCol).as("doc_id"), col(vecCol).as("v"),
        VectorFns.norm(col(vecCol)).as("nrm"))
      .withColumn("cell", explode(nearestCells(col("v"),
        idx.centroids, nprobe)))
      .select(col("cell"), col("doc_id"), col("v"), col("nrm"))
    celled.as("a").join(celled.as("b").hint("merge"),
        col("a.cell") === col("b.cell") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        VectorFns.cosine(VectorFns.dot(col("a.v"), col("b.v")),
          col("a.nrm"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  /** An IVF index: the centroid table (nlist rows, a plan literal —
    * the quantizer travels inside the expression, no join needed) and
    * the cell-assigned corpus — in production both are materialized to
    * the lake at build time (an ANN index IS a materialized artifact);
    * [[ivfIndex]] memoizes per (session, inputs) locally.
    */
  final case class IvfIndex(centroids: Seq[Seq[Double]],
      corpusCells: DataFrame)

  /** Map-side top-`nprobe` cell assignment: one native-kernel call per
    * row against the centroid literal — no crossJoin, no window, no
    * Exchange anywhere between the corpus scan and the celled output.
    */
  private def nearestCells(vec: org.apache.spark.sql.Column,
      centroids: Seq[Seq[Double]], nprobe: Int)
      : org.apache.spark.sql.Column = {
    // fail at plan time: nprobe <= 0 would otherwise crash the kernel
    // (negative array size) or silently explode() away every row
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    graft.expressions.NativeKernels.nearestCellsCol(
      vec, typedLit(centroids), lit(nprobe))
  }

  private val ivfMemo =
    new graft.sources.SessionMemo[(String, String, String, Int, Long),
      IvfIndex](maxPerSession = 4,
        onEvict = _.corpusCells.unpersist(blocking = false))

  /** Build (or reuse) the IVF index for a corpus. `corpusTag` keys the
    * memo — pass the data location (e.g. the sf dir) or "" to force a
    * fresh build.
    */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long, corpusTag: String = ""): IvfIndex = {
    def build: IvfIndex = {
      val train = corpus.select(
        array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      // coarse quantizer: cell QUALITY is insensitive to k-means
      // convergence (probing covers boundary error), so cap the
      // iterations — recall is spec-gated either way
      val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
        .setFeaturesCol("features").fit(train)
      // centroids: O(nlist) doubles on the driver — shipped to
      // executors as an expression literal, never a join side
      val centroids: Seq[Seq[Double]] =
        model.clusterCenters.map(_.toArray.toSeq).toSeq
      // corpus → cell assignment: nearest centroid, one map-side
      // projection over a single corpus scan (no Exchange)
      val corpusCells = corpus
        .select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
          VectorFns.norm(col(vecCol)).as("cn"))
        .withColumn("cell",
          nearestCells(col("cv"), centroids, 1).getItem(0))
      IvfIndex(centroids, if (corpusTag.nonEmpty) corpusCells.cache()
        else corpusCells)
    }
    if (corpusTag.isEmpty) build
    else ivfMemo.getOrElseUpdate(corpus.sparkSession,
      (corpusTag, idCol, vecCol, nlist, seed))(build)
  }

  /** IVF-bucketed ANN: KMeans coarse quantizer, probe the `nprobe`
    * nearest cells per query, exact cosine within the probed buckets.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 3, seed: Long = 42L,
      corpusTag: String = ""): DataFrame = {
    val idx = ivfIndex(corpus, idCol, vecCol, nlist, seed, corpusTag)
    val corpusCells = idx.corpusCells

    // query → nprobe nearest cells, map-side (no Exchange)
    val queryCells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        VectorFns.norm(col(vecCol)).as("qn"))
      .withColumn("cell", explode(nearestCells(col("qv"),
        idx.centroids, nprobe)))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))

    // scored candidates: only corpus vectors in probed cells
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        VectorFns.cosine(VectorFns.dot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
