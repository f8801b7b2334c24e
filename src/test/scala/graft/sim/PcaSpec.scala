package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.source.Tables

class PcaSpec extends SparkSpec {

  test("jacobiEigen: residuals, orthonormality, trace preservation") {
    val rnd = new scala.util.Random(42)
    val n = 12
    val m = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val x = rnd.nextGaussian(); m(i)(j) = x; m(j)(i) = x
    }
    val (vals, vecs) = Pca.jacobiEigen(m)
    // A·v_k = λ_k·v_k
    for (k <- 0 until n) {
      val v = (0 until n).map(i => vecs(i)(k)).toArray
      val av = m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      av.zip(v).foreach { case (a, b) =>
        assert(math.abs(a - vals(k) * b) < 1e-8, s"residual k=$k")
      }
    }
    // orthonormal columns
    for (k <- 0 until n; l <- k until n) {
      val d = (0 until n).map(i => vecs(i)(k) * vecs(i)(l)).sum
      assert(math.abs(d - (if (k == l) 1.0 else 0.0)) < 1e-9, s"ortho $k,$l")
    }
    assert(math.abs(vals.sum - (0 until n).map(i => m(i)(i)).sum) < 1e-8)
  }

  test("fit: distributed covariance ≡ exact driver-side reference") {
    val emb = Tables(spark, sfDir, "embeddings")
    val dim = 64
    val model = Pca.fit(emb, dim)
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val n = vecs.length.toDouble
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    model.mean.zip(mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, "mean")
    }
    // spot-check covariance through the eigen decomposition: rebuild
    // cov = V Λ Vᵀ and compare entries to the exact reference
    val d = dim
    def rebuilt(i: Int, j: Int): Double =
      (0 until d).map(k => model.components(k)(i) * model.eigenvalues(k) *
        model.components(k)(j)).sum
    val rnd = new scala.util.Random(7)
    (0 until 40).foreach { _ =>
      val i = rnd.nextInt(d); val j = rnd.nextInt(d)
      val exact = vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      assert(math.abs(rebuilt(i, j) - exact) < 1e-7, s"cov($i,$j)")
    }
  }

  test("anisotropic corpus: first component finds the planted direction") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val dim = 16
    val u = {
      val raw = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(raw.map(x => x * x).sum); raw.map(_ / nrm)
    }
    val rows = (0 until 500).map { i =>
      val t = rnd.nextGaussian() * 5.0 // dominant variance along u
      (i.toLong, u.map(x => (x * t + rnd.nextGaussian() * 0.1).toFloat))
    }
    val model = Pca.fit(rows.toDF("vec_id", "embedding"), dim)
    val cosU = math.abs(model.components(0).zip(u).map { case (a, b) => a * b }.sum)
    assert(cosU > 0.99, s"first component misaligned: |cos|=$cosU")
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1),
      s"planted direction must dominate: ${model.eigenvalues.take(3).toSeq}")
  }

  test("project: per-component variance ≈ eigenvalue, components decorrelated") {
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Pca.fit(emb, 64)
    val d = 4
    val pcs = Pca.project(emb, model, d).select("pc").collect()
      .map(_.getSeq[Double](0).toArray)
    val n = pcs.length.toDouble
    for (k <- 0 until d) {
      val xs = pcs.map(_(k))
      val mu = xs.sum / n
      val v = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - model.eigenvalues(k)) < 1e-6 +
        0.01 * model.eigenvalues(k), s"var(pc$k)=$v vs λ=${model.eigenvalues(k)}")
      for (l <- k + 1 until d) {
        val ys = pcs.map(_(l)); val muY = ys.sum / n
        val covKL = xs.zip(ys).map { case (x, y) => (x - mu) * (y - muY) }.sum / n
        assert(math.abs(covKL) < 1e-6 + 0.01 * math.sqrt(
          model.eigenvalues(k) * model.eigenvalues(l)), s"cov(pc$k,pc$l)=$covKL")
      }
    }
  }
}
