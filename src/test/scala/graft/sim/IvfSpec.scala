package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.source.Tables

class IvfSpec extends SparkSpec {

  test("train: centroids converge toward cluster means, deterministic") {
    val emb = Tables(spark, sfDir, "embeddings")
    val m1 = Ivf.train(emb, nCentroids = 8, dim = 64, iters = 2)
    val m2 = Ivf.train(emb, nCentroids = 8, dim = 64, iters = 2)
    assert(m1.k == 8 && m1.dim == 64)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    // every vector assigns to some centroid; cluster sizes partition corpus
    val flat = m1.flat
    val sizes = emb.select(element_at(
        graft.functions.VectorExpressions.nearestCentroids(
          col("embedding"), flat, 8, 64, 1), 1).as("c"))
      .groupBy("c").count().collect().map(_.getLong(1))
    assert(sizes.sum == emb.count())
  }

  test("search: probing more lists increases recall; full probe is exact") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 15)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = Ivf.train(emb, nCentroids = 8, dim = 64, iters = 2)

    def recall(nProbe: Int): Double = {
      val got = Ivf.search(emb, queries, model, k = 10, nProbe = nProbe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val r2 = recall(2)
    val r8 = recall(8) // all lists probed → candidate set = full corpus
    assert(r8 == 1.0, s"full probe must be exact, got $r8")
    assert(r2 <= r8 && r2 > 0.1, s"r2=$r2 r8=$r8")
  }
}
