package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.NativeKernels

/** PCA over an embedding column (SURVEY.md §2 E13) — the
  * dimensionality-reduction step an embedding pipeline runs before
  * ANN indexing / clustering (smaller vectors: cheaper IVF cells,
  * cheaper cosine verify, denser caches).
  *
  * Scale shape (the classic RowMatrix/MLlib decomposition of the
  * problem): ONE distributed pass computes n, Σx and the d×d Gram
  * matrix X^T X via `treeAggregate` — per-partition state is a
  * d(d+1)/2 upper triangle (64-dim ⇒ ~16 KB), combined up a tree, so
  * a 100-TB corpus reduces to one driver-sized matrix. The
  * EIGENDECOMPOSITION then runs driver-side on the d×d covariance
  * (cyclic Jacobi — deterministic, no library), exactly where a d×d
  * problem belongs. Projection is map-side only: mean + components
  * ride the plan as literals into a codegen kernel.
  *
  * Determinism: Jacobi sweeps are cyclic, eigenpairs sort by
  * eigenvalue DESC (ties: original index), and each component's sign
  * is canonicalized (largest-|coordinate| entry positive). The ONE
  * non-deterministic input is the tree combine's double-addition
  * order (task arrival), so repeated fits agree to last-ulp
  * accumulation error, not bit-for-bit — the spec pins components to
  * 1e-6 and sign stability, which is the honest contract for any
  * distributed floating-point reduction.
  */
object Pca {

  /** A fitted model: `mean(d)`, `components` = k rows of d (principal
    * axes, orthonormal), `variance(k)` explained per axis.
    */
  final case class Model(mean: Array[Double],
      components: Array[Array[Double]], variance: Array[Double]) {
    def d: Int = mean.length
    def k: Int = components.length
  }

  /** [[fit]] on the canonical bounded feed (the quantizer-training
    * precedent, Similarity.canonicalTrainFeed): the `cap` vectors
    * with the smallest (xxhash64(id), id) delivered in ONE sorted
    * partition. Two jobs this buys: (a) the Gram pass has exactly
    * one partial, so the double-addition order is fixed and the fit
    * is BIT-REPRODUCIBLE run to run and across CPU counts — [[fit]]
    * on an unbounded corpus honestly cannot promise that (tree
    * combine order follows task arrival); (b) the 100-TB shape — a
    * covariance estimate does not need every row, and the bounded
    * deterministic sample reads like the IVF/PQ quantizer feeds.
    * Below the cap the sample IS the corpus, so nothing is traded.
    */
  def fitCanonical(df: DataFrame, idCol: String, vecCol: String,
      k: Int, cap: Int = 65536): Model =
    fit(Similarity.canonicalTrainFeed(df, idCol,
      Seq(col(vecCol).as("__v")), cap), "__v", k)

  /** One pass: (n, Σx, upper-triangle of X^T X) -> covariance ->
    * Jacobi -> top-k axes.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol)).na.drop().as[Seq[Float]]
    val d = vecs.head().length
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val triLen = d * (d + 1) / 2
    // state: [n, sum(d), upperTri(d(d+1)/2)]
    val zero = new Array[Double](1 + d + triLen)
    val agg = vecs.rdd.treeAggregate(zero)(
      seqOp = (s, v) => {
        require(v.length == d,
          s"ragged embedding: expected $d dims, got ${v.length}")
        s(0) += 1.0
        var i = 0
        var t = 1 + d
        while (i < d) {
          val vi = v(i).toDouble
          s(1 + i) += vi
          var j = i
          while (j < d) {
            s(t) += vi * v(j).toDouble
            t += 1
            j += 1
          }
          i += 1
        }
        s
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      },
      depth = 2)
    val n = agg(0)
    require(n > 1, s"PCA needs more than one vector, got ${n.toLong}")
    val mean = Array.tabulate(d)(i => agg(1 + i) / n)
    // covariance = (XtX - n·mean·meanᵀ) / (n - 1), symmetrized
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (agg(t) - n * mean(i) * mean(j)) / (n - 1.0)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // order by eigenvalue DESC (ties: lower original index), take k,
    // canonicalize sign
    val order = values.indices.sortBy(i => (-values(i), i)).take(k)
    val comps = order.map { ei =>
      val v = Array.tabulate(d)(r => vectors(r)(ei))
      var best = 0
      var bm = 0.0
      var r = 0
      while (r < d) {
        val m = math.abs(v(r))
        if (m > bm) { bm = m; best = r }
        r += 1
      }
      if (v(best) < 0) { r = 0; while (r < d) { v(r) = -v(r); r += 1 } }
      v
    }.toArray
    Model(mean, comps, order.map(values(_)).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). O(d³) per sweep,
    * converges quadratically; d is the EMBEDDING dim (64ish), so this
    * is microseconds on the driver.
    */
  private[operators] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val tn = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tn * tn + 1.0)
            val s = tn * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project the embedding column to the model's k axes: map-side
    * codegen kernel, mean + flattened components as plan literals.
    */
  def project(vec: Column, model: Model): Column =
    NativeKernels.pcaProjectCol(vec, model.mean,
      model.components.flatten, model.k)

  /** Corpus projection: (other columns preserved, vecCol replaced by
    * its k-dim projection).
    */
  def transform(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn(vecCol, project(col(vecCol), model))
}
