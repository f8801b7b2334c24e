package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.source.Tables

class PqSpec extends SparkSpec {

  private def emb = Tables(spark, sfDir, "embeddings")

  test("train is deterministic; encode emits m in-range codes per vector") {
    val m1 = Pq.train(emb, m = 8, ksub = 16, dim = 64, iters = 2)
    val m2 = Pq.train(emb, m = 8, ksub = 16, dim = 64, iters = 2)
    assert(m1.m == 8 && m1.ksub == 16 && m1.subDim == 8)
    assert(m1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      m2.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = Pq.encode(emb, m1).collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
  }

  /** Independent driver-side ADC reference: encode + score one query by
    * hand from the model's codebooks (no Spark expressions involved). */
  private def refScores(model: Pq.PqModel,
                        corpus: Map[Long, Array[Float]],
                        q: Array[Float]): Map[Long, Double] = {
    def subSlice(v: Array[Float], j: Int) =
      v.slice(j * model.subDim, (j + 1) * model.subDim).map(_.toDouble)
    def nearestCode(sub: Array[Double], j: Int): Int =
      model.codebooks(j).zipWithIndex.minBy { case (c, i) =>
        // same argmin as the kernel: ||c||² − 2v·c, ties on index
        (c.map(x => x * x).sum - 2.0 * c.zip(sub).map { case (a, b) => a * b }.sum, i)
      }._2
    val qNorm = math.sqrt(q.map(x => x.toDouble * x).sum)
    corpus.map { case (id, v) =>
      val codes = (0 until model.m).map(j => nearestCode(subSlice(v, j), j))
      val adot = (0 until model.m).map { j =>
        model.codebooks(j)(codes(j)).zip(subSlice(q, j))
          .map { case (a, b) => a * b }.sum
      }.sum
      val rnorm2 = (0 until model.m)
        .map(j => model.codebooks(j)(codes(j)).map(x => x * x).sum).sum
      id -> adot / (qNorm * math.sqrt(rnorm2))
    }
  }

  test("searchIvfPq ADC scores match the driver-side reference at full probe") {
    val model = Pq.train(emb, m = 8, ksub = 16, dim = 64, iters = 2)
    val ivf = Ivf.train(emb, nCentroids = 8, dim = 64, iters = 2)
    val queries = emb.filter(col("vec_id") === 0L)
    val corpus = emb.limit(200).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = corpus(0L)
    val expect = refScores(model, corpus - 0L, q)
    val got = Pq.searchIvfPq(emb.filter(col("vec_id") < 200), queries,
        ivf, model, k = 200, nProbe = 8)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet) // full probe reaches every candidate
    got.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-9, s"id=$id got=$s ref=${expect(id)}")
    }
  }

  test("save→load round-trips bit-exactly; searchIvfPq through it is identical") {
    val trained = Pq.train(emb, m = 4, ksub = 8, dim = 64, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("pq_model_spec").resolve("m").toString
    Pq.save(spark, trained, path)
    val loaded = Pq.load(spark, path)
    assert(loaded.subDim == trained.subDim)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      trained.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val tampered = Pq.PqModel(trained.subDim,
      trained.codebooks.map(_.map(_.map(_ + 1.0))))
    Pq.save(spark, tampered, path)
    val viaStore = Pq.trainOrLoad(emb, m = 4, ksub = 8, dim = 64, iters = 2,
      modelPath = path)
    assert(viaStore.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      tampered.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("recall deepens with probes; exact rerank recovers quantization loss") {
    val queries = emb.filter(col("vec_id") < 15)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.train(emb, nCentroids = 8, dim = 64, iters = 2)
    val pq = Pq.train(emb, m = 8, ksub = 16, dim = 64, iters = 2)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val r1 = recallOf(Pq.searchIvfPq(emb, queries, ivf, pq, k = 10, nProbe = 1))
    val r8 = recallOf(Pq.searchIvfPq(emb, queries, ivf, pq, k = 10, nProbe = 8))
    info(s"fixture (random vectors, the PQ worst case) ADC recall@10: 1probe=$r1 8probe=$r8")
    assert(r8 >= r1, s"recall must not drop with deeper probes: $r1 → $r8")
    val rr = recallOf(Pq.searchIvfPqRerank(emb, queries, ivf, pq,
      k = 10, nProbe = 8, shortlist = 100))
    info(s"rerank(100) recall@10: $rr")
    assert(rr >= r8, s"exact rerank must not lose recall: $r8 → $rr")
    assert(rr >= 0.8, s"full-probe reranked recall@10 too low: $rr")
  }

  test("clustered corpus: ADC shortlist captures the true neighbors") {
    // same construction as IvfSpec's clustered corpus: 16 seeded Gaussian
    // clusters, queries near centers. Within a tight cluster the true
    // top-10 are near-ties separated by LESS than the quantization step,
    // so ADC's own top-10 ordering is weak BY CONSTRUCTION — PQ's job is
    // candidate compression, not final ranking. The load-bearing gate is
    // therefore the two-stage result: the true neighbors must survive
    // into the ADC shortlist (rerank recall ≥ 0.9); ADC top-10 recall
    // only needs to beat chance (random recall here is 10/799 ≈ 0.013).
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val dim = 64
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    def point(c: Array[Double]): Array[Float] = {
      val v = c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rows = (0 until 800).map(i => (i.toLong, point(centers(i % 16))))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.train(corpus, nCentroids = 16, dim = dim, iters = 3)
    val pq = Pq.train(corpus, m = 8, ksub = 16, dim = dim, iters = 3)
    val adc = Pq.searchIvfPq(corpus, queries, ivf, pq, k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcRecall = (adc intersect exact).size.toDouble / exact.size
    val rr = Pq.searchIvfPqRerank(corpus, queries, ivf, pq,
        k = 10, nProbe = 4, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rrRecall = (rr intersect exact).size.toDouble / exact.size
    info(s"clustered ADC recall@10 at nProbe=4/16: $adcRecall; reranked: $rrRecall")
    assert(adcRecall >= 0.15, s"clustered ADC recall@10 below chance-beating floor: $adcRecall")
    assert(rrRecall >= 0.9, s"clustered reranked recall@10 was $rrRecall")
  }
}
