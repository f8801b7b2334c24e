package graft.sim

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * preprocessing step semantic-dedup pipelines run before clustering
  * (SemDeDup et al. reduce, then cluster). Shape at 100 TB:
  *
  *  - ONE corpus pass accumulates count, Σx and the upper triangle of
  *    Σx·xᵀ through typed `Aggregator`s — map-side partial aggregation,
  *    one dim(dim+1)/2-double row per partition on the shuffle, so the
  *    covariance costs a scan regardless of corpus size.
  *  - The driver only ever holds the dim×dim covariance (64×64 here —
  *    kilobytes) and diagonalizes it with a cyclic Jacobi sweep
  *    (deterministic, no library dependency).
  *  - Projection is scan-side: d dot products against broadcast-literal
  *    eigenvectors per row (the `aggregate(zip_with(...))` idiom, which
  *    `KernelRewriteRules` rewrites to the fused `DotProduct` kernel).
  *
  * Covariance entries are float sums accumulated in partition order, so
  * the model is float-stable but not bit-deterministic across
  * partitionings (unlike the integer PageRank) — the registered query is
  * rows-only and PcaSpec pins the numerics: engine covariance ≡ a
  * driver-side exact reference at 1e-9, eigenpairs satisfy A·v = λ·v,
  * and projected coordinates decorrelate to the eigenvalue diagonal.
  */
object Pca {

  /** Upper-triangle outer-product accumulator: buffer(t(i,j)) = Σ xᵢ·xⱼ
    * for i ≤ j, t the row-major triangle index. */
  class OuterSum(dim: Int) extends Aggregator[Array[Float], Array[Double], Array[Double]] {
    private val len = dim * (dim + 1) / 2
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(b: Array[Double], a: Array[Float]): Array[Double] = {
      var i = 0; var t = 0
      while (i < dim) {
        val ai = a(i).toDouble
        var j = i
        while (j < dim) { b(t) += ai * a(j); j += 1; t += 1 }
        i += 1
      }
      b
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var t = 0
      while (t < len) { x(t) += y(t); t += 1 }
      x
    }
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Integer-quantized outer-product accumulator: the EXACT twin of
    * [[OuterSum]]. Each coordinate quantizes to q = ⌊x · 2^scaleBits⌋
    * (float→double is exact, floor is exact, so q is a pure function of
    * the stored float — engine-independent), and all sums run in Long:
    * associative, commutative, partition-order-invariant, and therefore
    * fully oracle-checkable — the move that green-lit CMS/MG/GK.
    * Buffer layout: [count, Σq_0..Σq_{d−1}, upper-triangle Σq_i·q_j].
    * Overflow headroom: |x| < 1 ⇒ |q| < 2^scaleBits, so each product is
    * < 2^(2·scaleBits) and 2^(63−2·scaleBits) rows fit before overflow
    * (scaleBits = 20 ⇒ ~2^23 ≈ 8M vectors — far past any fixture; ANSI
    * mode throws rather than wraps if ever exceeded).
    */
  class QuantOuterSum(dim: Int, scaleBits: Int)
      extends Aggregator[Array[Float], Array[Long], Array[Long]] {
    private val len = 1 + dim + dim * (dim + 1) / 2
    private val scale = math.pow(2.0, scaleBits)
    override def zero: Array[Long] = new Array[Long](len)
    override def reduce(b: Array[Long], a: Array[Float]): Array[Long] = {
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) { q(i) = math.floor(a(i).toDouble * scale).toLong; i += 1 }
      b(0) += 1L
      i = 0; var t = 1 + dim
      while (i < dim) {
        b(1 + i) += q(i)
        var j = i
        while (j < dim) { b(t) += q(i) * q(j); j += 1; t += 1 }
        i += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var t = 0
      while (t < len) { x(t) += y(t); t += 1 }
      x
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Exact covariance RAW COUNTS over integer-quantized coordinates — the
    * oracle-checkable face of the PCA's first pass. One corpus scan
    * through [[QuantOuterSum]] (map-side partial aggregation; one
    * ~(d²/2)-long row per partition on the shuffle), then the single
    * aggregate row — kilobytes, the same bounded-collect class as
    * [[fit]] — unpacks into one output row per upper-triangle entry:
    * (i, j, n_vecs, sum_i, sum_j, dot). Any engine reproduces these
    * integers exactly from the parquet floats, which is what lets the
    * driver's DuckDB hash-check the covariance pipeline end-to-end while
    * the float eigen query stays rows-only (partition-order ulps).
    */
  def covarianceCounts(corpus: DataFrame, dim: Int, scaleBits: Int = 20,
                       vecCol: String = "embedding"): DataFrame = {
    val quant = udaf(new QuantOuterSum(dim, scaleBits))
    val r = corpus.agg(quant(col(vecCol)).as("b")).head().getSeq[Long](0)
    val n = r(0)
    val rows = new scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long, Long)]
    var i = 0; var t = 1 + dim
    while (i < dim) {
      var j = i
      while (j < dim) {
        rows += ((i, j, n, r(1 + i), r(1 + j), r(t)))
        j += 1; t += 1
      }
      i += 1
    }
    val s = corpus.sparkSession
    import s.implicits._
    rows.toSeq.toDF("i", "j", "n_vecs", "sum_i", "sum_j", "dot")
  }

  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                            components: Array[Array[Double]]) {
    def dim: Int = mean.length
  }

  /** One-pass covariance + driver-side diagonalization. */
  def fit(corpus: DataFrame, dim: Int,
          vecCol: String = "embedding"): PcaModel = {
    val vecSum = udaf(new Ivf.VectorSum(dim))
    val outer = udaf(new OuterSum(dim))
    val row = corpus.agg(count(lit(1)).as("n"),
      vecSum(col(vecCol)).as("s"), outer(col(vecCol)).as("o")).head()
    val n = row.getLong(0).toDouble
    val s = row.getSeq[Double](1).toArray
    val o = row.getSeq[Double](2).toArray
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0; var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = o(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    // sort descending by eigenvalue, ties on index; fix sign (first
    // non-negligible coordinate positive) so the model is reproducible
    val order = vals.indices.sortBy(k => (-vals(k), k))
    val comps = order.map { k =>
      val v = vecs.map(_(k))
      val lead = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
      if (lead < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, order.map(vals).toArray, comps)
  }

  /** Cyclic Jacobi diagonalization of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). Deterministic sweep order;
    * converges quadratically — 30 sweeps is far past double precision for
    * dim ≤ a few hundred. */
  private[sim] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 30 && off > 1e-24) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tt = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var x = 0
      while (x < n - 1) {
        var y = x + 1
        while (y < n) { off += a(x)(y) * a(x)(y); y += 1 }
        x += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(k => a(k)(k)), v)
  }

  /** Scan-side projection onto the top `d` components: centered dot
    * products against broadcast-literal eigenvectors. Emits
    * (idCol, pc array<double> of length d). */
  def project(corpus: DataFrame, model: PcaModel, d: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(d <= model.components.length)
    val xs = col(vecCol).cast("array<double>")
    val pcs = (0 until d).map { k =>
      val evec = model.components(k)
      val muDotV = model.mean.zip(evec).map { case (m, e) => m * e }.sum
      aggregate(zip_with(xs, typedLit(evec.toSeq), (x, y) => x * y),
        lit(0.0), (acc, p) => acc + p) - lit(muDotV)
    }
    corpus.select(col(idCol), array(pcs: _*).as("pc"))
  }
}
