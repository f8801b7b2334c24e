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

  test("assign: every batch vector lands on its true nearest centroid") {
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.train(emb, nCentroids = 8, dim = 64, iters = 1)
    val batch = emb.filter(col("vec_id") % 13 === 5)
    val got = Ivf.assign(batch, model).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    // naive argmin over FULL ||v−c||² (the kernel drops the ||v||² term,
    // constant per row) with ties to the lower index
    val vecs = batch.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    vecs.foreach { case (id, v) =>
      val dists = model.centroids.map { c =>
        var s = 0.0; var j = 0
        while (j < c.length) { val d = v(j) - c(j); s += d * d; j += 1 }
        s
      }
      val want = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      assert(got(id) == want, s"vec $id: got ${got(id)}, want $want")
    }
  }

  test("save→load→search is row-identical to train→search") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 15)
    val trained = Ivf.train(emb, nCentroids = 8, dim = 64, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("ivf_model_spec").resolve("m").toString
    Ivf.save(spark, trained, path)
    val loaded = Ivf.load(spark, path)
    // doubles round-trip parquet bit-exactly: the model is IDENTICAL...
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      trained.centroids.map(_.toSeq).toSeq)
    // ...so search through the loaded model is row-identical
    def key(m: Ivf.IvfModel) =
      Ivf.search(emb, queries, m, k = 10, nProbe = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(key(loaded) == key(trained))
    // trainOrLoad hits the persisted model (no retrain): mutating the
    // stored centroids must be visible through it — proof it LOADED
    val tampered = Ivf.IvfModel(trained.centroids.map(_.map(_ + 1.0)))
    Ivf.save(spark, tampered, path)
    val viaStore = Ivf.trainOrLoad(emb, nCentroids = 8, dim = 64, iters = 2,
      modelPath = path)
    assert(viaStore.centroids.map(_.toSeq).toSeq ==
      tampered.centroids.map(_.toSeq).toSeq)
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

  test("registered recall curve (ann_ivf_recall): monotone, exact at full probe") {
    // the driver-visible recall query — gate the curve shape here so a
    // regression in the IVF path fails the build, not just the eyeball.
    // The fixture embeddings are i.i.d. RANDOM unit vectors (max pairwise
    // cos ≈ 0.48) — the adversarial case for any clustering index, so the
    // partial-probe recall here is a floor, not the headline (measured
    // ≈ 0.19/0.33/0.55 at nProbe 1/2/4); the ≥ 0.9 gate lives on the
    // clustered corpus below, the data shape IVF exists for.
    val q = graft.queries.CorpusQueries.all.find(_.name == "ann_ivf_recall")
      .getOrElse(fail("ann_ivf_recall not registered")).fn
    val rows = q(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    info(s"fixture (random vectors) recall@10 by nProbe: ${rows.toSeq.sortBy(_._1)}")
    assert(rows.keySet == Set(1, 2, 4, 16))
    assert(rows(16) == 1.0, s"full probe must be exact, got ${rows(16)}")
    assert(rows(1) <= rows(2) + 1e-9 && rows(2) <= rows(4) + 1e-9 &&
      rows(4) <= rows(16), s"recall must be monotone in nProbe: $rows")
    assert(rows(4) >= 0.35, s"random-vector recall@10 at nProbe=4 regressed: ${rows(4)}")
  }

  test("clustered corpus: recall@10 ≥ 0.9 at nProbe=4 of 16") {
    // real embedding corpora cluster (that is WHY IVF works); build one:
    // 16 seeded Gaussian clusters, queries drawn near centers — partial
    // probe must find nearly all true neighbors because neighbors share
    // the query's cluster.
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
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = Ivf.train(emb, nCentroids = 16, dim = dim, iters = 3)
    val got = Ivf.search(emb, queries, model, k = 10, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    info(s"clustered recall@10 at nProbe=4/16: $recall")
    assert(recall >= 0.9, s"clustered-corpus recall@10 at nProbe=4 was $recall")
  }

  test("knnGraph: row-identical to search(corpus, corpus); clustered recall ≥ 0.9") {
    // same candidates, same (cos desc, id asc) selection — the Aggregator
    // formulation must change NOTHING about the results, only the shuffle
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val dim = 32
    val emb = (0 until 300)
      .map(i => (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val model = Ivf.train(emb, nCentroids = 8, dim = dim, iters = 2)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    for (p <- Seq(1, 3, 8)) {
      val graph = key(Ivf.knnGraph(emb, model, k = 5, nProbe = p))
      val win = key(Ivf.search(emb, emb, model, k = 5, nProbe = p))
      assert(graph == win, s"nProbe=$p: graph diverged from window search")
      assert(graph.nonEmpty)
    }

    // on a clustered corpus (why IVF works), the partial-probe graph
    // recovers ≥0.9 of the exact top-5 edges
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    def point(c: Array[Double]): Array[Float] = {
      val v = c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val clustered = (0 until 800).map(i => (i.toLong, point(centers(i % 16))))
      .toDF("vec_id", "embedding")
    val m2 = Ivf.train(clustered, nCentroids = 16, dim = 64, iters = 3)
    val exact = Similarity.knnJoinExact(clustered, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Ivf.knnGraph(clustered, m2, k = 5, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    info(s"clustered kNN-graph recall@5 at nProbe=4/16: $recall")
    assert(recall >= 0.9, s"clustered kNN-graph recall@5 was $recall")
  }

  test("searchMulti: row-identical to per-depth search at every probe depth") {
    // the min-probe-rank factoring shares one assignment scan across
    // depths; this pins that it changes NOTHING about the results
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val dim = 32
    val emb = (0 until 300)
      .map(i => (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 12)
    val model = Ivf.train(emb, nCentroids = 8, dim = dim, iters = 2)
    val depths = Seq(1, 3, 8)
    val multi = Ivf.searchMulti(emb, queries, model, k = 5, probes = depths)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(4)))
      .groupBy(_._1)
    depths.foreach { p =>
      val single = Ivf.search(emb, queries, model, k = 5, nProbe = p)
        .collect().map(r => (p, r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(multi.getOrElse(p, Array.empty).toSet == single,
        s"depth $p diverged from single-probe search")
      assert(single.nonEmpty)
    }
  }

  test("semDeDup: ≡ naive within-cell dominance; partition-invariant; tau-monotone") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val dim = 16
    // 120 base vectors + planted near-copies (tiny jitter → cosine ≈ 1)
    val base = (0 until 120)
      .map(i => (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    val copies = (0 until 30).map { j =>
      val (srcId, v) = base(rnd.nextInt(base.size))
      (1000L + j, v.map(x => x + (rnd.nextFloat() - 0.5f) * 1e-3f)) -> srcId
    }
    val emb = (base ++ copies.map(_._1)).toDF("vec_id", "embedding")
    val model = Ivf.train(emb, nCentroids = 6, dim = dim, iters = 2)
    val got = Ivf.semDeDup(emb, model, tau = 0.95)
    val gotRows = got.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sortBy(_._1)

    // naive reference: assignment via the proven kernel, dominance on the
    // driver over exact double cosine
    val asg = Ivf.assign(emb, model).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val want = ids.map { id =>
      val dominated = ids.exists(o => o < id && asg(o) == asg(id) &&
        cos(vecs(o), vecs(id)) >= 0.95)
      (id, asg(id), !dominated)
    }
    assert(gotRows.toSeq == want, "semDeDup diverged from naive dominance")
    // the planted copies actually exercised the rule
    assert(gotRows.count(!_._3) >= 20, "planted near-copies were not dropped")

    // partition invariance
    val reparts = Ivf.semDeDup(emb.repartition(7), model, tau = 0.95).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sortBy(_._1)
    assert(reparts.toSeq == gotRows.toSeq)

    // tau-monotone: a stricter threshold never drops MORE
    val kept95 = gotRows.filter(_._3).map(_._1).toSet
    val kept99 = Ivf.semDeDup(emb, model, tau = 0.999).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept95.subsetOf(kept99), "raising tau removed a survivor")
  }

  test("semDeDupIncremental: ≡ naive standing-priority rule; empty standing ≡ batch pass") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val dim = 16
    val base = (0 until 100)
      .map(i => (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    val copies = (0 until 40).map { j =>
      val (_, v) = base(rnd.nextInt(base.size))
      (500L + j, v.map(x => x + (rnd.nextFloat() - 0.5f) * 1e-3f))
    }
    val all = (base ++ copies).toDF("vec_id", "embedding")
    val model = Ivf.train(all, nCentroids = 5, dim = dim, iters = 2)
    val standing = all.filter(col("vec_id") % 3 =!= 1)
    val batch = all.filter(col("vec_id") % 3 === 1)
    val standingKept = Ivf.semDeDup(standing, model, tau = 0.95)
      .filter(col("kept")).select("vec_id").join(all, "vec_id")
    val got = Ivf.semDeDupIncremental(standingKept, batch, model, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1)

    // naive reference on the driver
    val asg = Ivf.assign(all, model).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = all.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val sIds = vecs.keys.filter(_ % 3 != 1).toSeq.sorted
    val sKeptIds = sIds.filter(id => !sIds.exists(o => o < id &&
      asg(o) == asg(id) && cos(vecs(o), vecs(id)) >= 0.95))
    val bIds = vecs.keys.filter(_ % 3 == 1).toSeq.sorted
    val want = bIds.map { id =>
      val bySt = sKeptIds.exists(o => asg(o) == asg(id) &&
        cos(vecs(o), vecs(id)) >= 0.95)
      val byBatch = bIds.exists(o => o < id && asg(o) == asg(id) &&
        cos(vecs(o), vecs(id)) >= 0.95)
      (id, !(bySt || byBatch))
    }
    assert(got.toSeq == want, "incremental diverged from naive standing-priority rule")
    assert(got.exists(!_._2), "rule never bit — fixture too sparse")

    // bootstrap: empty standing ≡ the batch-only semDeDup pass
    val empty = all.filter(lit(false))
    val boot = Ivf.semDeDupIncremental(empty, batch, model, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1)
    val batchOnly = Ivf.semDeDup(batch, model, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1)
    assert(boot.toSeq == batchOnly.toSeq, "empty-standing bootstrap diverged")
  }

  test("prunedSearch: row-identical to search; scan dynamically pruned to probed cells") {
    // plan-inspecting half runs with AQE off: AdaptiveSparkPlanExec is a
    // leaf to collect* traversals (the DppSpec rationale); DPP itself
    // fires either way
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val emb = Tables(spark, sfDir, "embeddings")
      val model = Ivf.trainOrLoad(emb, nCentroids = 16, dim = 64, iters = 1,
        modelPath = s"${sys.props("java.io.tmpdir")}/graft_ivf_prune_spec_" +
          s"${graft.ops.Materialize.codeFingerprint.take(8)}_" +
          new java.io.File(sfDir).getName)
      val store = spark.read.parquet(
        IvfStore.cellPartitioned(spark, sfDir, model, "spec"))
      val queries = emb.filter(col("vec_id").isin(3L, 77L, 240L))
      val pruned = Ivf.prunedSearch(store, queries, model, k = 10, nProbe = 2)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val got = rows(pruned)
      assert(got == rows(Ivf.search(emb, queries, model, k = 10, nProbe = 2)),
        "pruned store search diverged from the raw-table search")
      assert(got.nonEmpty)
      // the store scan must carry a runtime partition filter fed by the
      // broadcast probe frame, and read ≤ |queries|·nProbe of the 16 cells
      val scans = pruned.queryExecution.executedPlan.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      val factScan = scans.find(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))).getOrElse(
        fail(s"no dynamically pruned scan:\n${pruned.queryExecution.executedPlan}"))
      val read = factScan.metrics.get("numPartitions").map(_.value)
      assert(read.exists(n => n > 0 && n <= 6),
        s"expected ≤ 6 of 16 cell directories read, got $read")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("IvfStore.append: day-2 batch lands in cells; pruned search over the grown store ≡ raw") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val emb = Tables(spark, sfDir, "embeddings")
      val model = Ivf.trainOrLoad(emb, nCentroids = 16, dim = 64, iters = 1,
        modelPath = s"${sys.props("java.io.tmpdir")}/graft_ivf_prune_spec_" +
          s"${graft.ops.Materialize.codeFingerprint.take(8)}_" +
          new java.io.File(sfDir).getName)
      val path = java.nio.file.Files.createTempDirectory("ivf_append")
        .resolve("cells").toString
      // day 1: standing corpus builds the layout; day 2: batch appends
      IvfStore.writeCells(emb.filter(col("vec_id") % 17 =!= 0), model,
        path, "overwrite")
      IvfStore.append(emb.filter(col("vec_id") % 17 === 0), model, path,
        batchId = 1L)
      val store = spark.read.parquet(path)
      assert(store.count() == emb.count(), "append lost or duplicated rows")
      val queries = emb.filter(col("vec_id").isin(3L, 77L, 240L))
      val pruned = Ivf.prunedSearch(store, queries, model, k = 10, nProbe = 2)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(rows(pruned) ==
        rows(Ivf.search(emb, queries, model, k = 10, nProbe = 2)),
        "grown store diverged from the raw-table search")
      // pruning keeps firing over the appended layout
      val scans = pruned.queryExecution.executedPlan.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.exists(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))),
        s"no dynamically pruned scan after append:\n${pruned.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("cellHealth: populations partition the corpus; a centroid-self batch maxes its cell") {
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.IvfModel(
      emb.filter(col("vec_id") < 16).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble)))
    val health = Ivf.cellHealth(emb.filter(col("vec_id") % 17 =!= 0),
        emb.filter(col("vec_id") % 17 === 0), model)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    assert(health.map(h => h._2 + h._3).sum == emb.count(),
      "cell populations do not partition the corpus")
    health.filter(_._3 > 0).foreach { h =>
      assert(h._4 <= h._5 && h._5 <= 1.0 + 1e-12, h.toString)
    }
    // a batch containing centroid 0 ITSELF lands in cell 0 at cosine 1
    val self = Ivf.cellHealth(emb.filter(col("vec_id") >= 16),
        emb.filter(col("vec_id") === 0), model)
      .filter(col("cluster") === 0).collect().head
    assert(self.getLong(2) == 1L && math.abs(self.getDouble(4) - 1.0) < 1e-12,
      self.toString)
  }

  test("servingStream: per-trigger lookups track the live store across an append") {
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.trainOrLoad(emb, nCentroids = 16, dim = 64, iters = 1,
      modelPath = s"${sys.props("java.io.tmpdir")}/graft_ivf_prune_spec_" +
        s"${graft.ops.Materialize.codeFingerprint.take(8)}_" +
        new java.io.File(sfDir).getName)
    val base = java.nio.file.Files.createTempDirectory("ivf_serving")
    val storePath = base.resolve("cells").toString
    val standing = emb.filter(col("vec_id") % 17 =!= 0)
    IvfStore.writeCells(standing, model, storePath, "overwrite")
    def queryRows(ids: Seq[Long]) = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val results = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Double, Int)]]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])](spark)
    val q = Ivf.servingStream(input.toDF().toDF("vec_id", "embedding"),
        storePath, model, s"$base/ckpt", k = 5, nProbe = 2) { (res, id) =>
      results(id) = res.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    }
    def expect(ids: Seq[Long]) = Ivf.prunedSearch(
        spark.read.parquet(storePath),
        emb.filter(col("vec_id").isin(ids: _*)), model, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    try {
      input.addData(queryRows(Seq(3L, 77L))); q.processAllAvailable()
      val want0 = expect(Seq(3L, 77L))
      assert(results(0L) == want0 && want0.nonEmpty)
      // the index grows BETWEEN triggers; the next lookup must see it
      IvfStore.append(emb.filter(col("vec_id") % 17 === 0), model, storePath,
        batchId = 1L)
      input.addData(queryRows(Seq(3L, 240L))); q.processAllAvailable()
      val want1 = expect(Seq(3L, 240L))
      assert(results(1L) == want1, "post-append lookup served the stale index")
      assert(results(1L) != results(0L))
      // and the grown store now answers like the full raw corpus
      assert(want1 == Ivf.search(emb, emb.filter(col("vec_id").isin(3L, 240L)),
        model, k = 5, nProbe = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet)
    } finally q.stop()
  }

  test("IvfStore.append: redelivered batch is idempotent (dynamic overwrite by __batch)") {
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.trainOrLoad(emb, nCentroids = 16, dim = 64, iters = 1,
      modelPath = s"${sys.props("java.io.tmpdir")}/graft_ivf_prune_spec_" +
        s"${graft.ops.Materialize.codeFingerprint.take(8)}_" +
        new java.io.File(sfDir).getName)
    val path = java.nio.file.Files.createTempDirectory("ivf_redeliver")
      .resolve("cells").toString
    IvfStore.writeCells(emb.filter(col("vec_id") % 17 =!= 0), model,
      path, "overwrite")
    val batch = emb.filter(col("vec_id") % 17 === 0)
    IvfStore.append(batch, model, path, batchId = 1L)
    val once = spark.read.parquet(path).select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    // the redelivery: the same batch id re-applied must overwrite its own
    // (cell, batch) partitions, not blind-append duplicate vectors
    IvfStore.append(batch, model, path, batchId = 1L)
    val twice = spark.read.parquet(path).select("vec_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(twice == once, "re-applied batch duplicated vectors")
    assert(once.distinct == once && once.length == emb.count(),
      "append lost rows or duplicated within one application")
  }

  test("IvfStore.splitCell: only the split cell rewritten; membership by pole; all-probe serving stays exact") {
    val emb = Tables(spark, sfDir, "embeddings")
    // the seed-vector model (ann_cell_health / ann_ivf_pruned_topk idiom)
    val model = Ivf.IvfModel(
      emb.filter(col("vec_id") < 16).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble)))
    val path = java.nio.file.Files.createTempDirectory("ivf_split")
      .resolve("cells").toString
    IvfStore.writeCells(emb, model, path, "overwrite")
    // the overfull cell (max population, ties to the lower id) — the
    // health-report trigger
    val cell = spark.read.parquet(path).groupBy("cluster").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy { case (c, n) => (-n, c) }.head._1
    def listFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = listFiles()
    val preMembers = spark.read.parquet(path)
      .filter(col("cluster") === cell).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val grown = IvfStore.splitCell(spark, path, model, cell)
    assert(grown.k == model.k + 1)
    assert(grown.centroids.take(model.k).map(_.toSeq).toSeq ==
      model.centroids.map(_.toSeq).toSeq,
      "split must not move any other centroid")
    // files-touched: every directory except cluster=<cell> (rewritten)
    // and cluster=<k> (created) is byte-identical; root-level VERSION
    // metadata (the layout-width stamp and the staged grown model, both
    // invisible to readers — round-14 seam) is the only other churn
    val after = listFiles()
    val touched = (before.keySet ++ after.keySet).filter { p =>
      before.get(p) != after.get(p)
    }
    def allowed(p: String): Boolean =
      p.contains(s"cluster=$cell/") || p.contains(s"cluster=${model.k}/") ||
        p.contains("_layout_width_") || p.contains(".model_width_")
    assert(touched.forall(allowed),
      s"split touched foreign cells: ${touched.filterNot(allowed)}")
    // membership: the two halves partition the old cell, and each member
    // sits with its nearer pole (ties to the old centroid)
    val store = spark.read.parquet(path)
    val halves = store.filter(col("cluster").isin(cell, model.k))
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(halves.keySet == preMembers, "split lost or imported members")
    assert(halves.values.toSet == Set(cell, model.k),
      "split produced an empty half (degenerate pole)")
    val pole = grown.centroids.last
    val old = model.centroids(cell)
    val vecs = emb.filter(col("vec_id").isin(preMembers.toSeq.map(Long.box): _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    vecs.foreach { case (id, v) =>
      def score(c: Array[Double]): Double = {
        var n2 = 0.0; var dot = 0.0; var j = 0
        while (j < c.length) { n2 += c(j) * c(j); dot += v(j) * c(j); j += 1 }
        n2 - 2.0 * dot
      }
      val want = if (score(old) <= score(pole)) cell else model.k
      assert(halves(id) == want, s"member $id on the wrong side of the split")
    }
    // store count unchanged; serving with every cell probed is still the
    // exact brute-force answer — the split moved bytes, never semantics
    assert(store.count() == emb.count())
    val queries = emb.filter(col("vec_id").isin(3L, 77L, 240L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rows(Ivf.prunedSearch(store, queries, grown, k = 10,
        nProbe = grown.k)) ==
      rows(Similarity.bruteForceTopK(emb, queries, k = 10)),
      "all-probe search over the split store diverged from brute force")
  }

  test("split-publish seam: a reader whose model trails the committed layout loads the staged grown model or refuses — never the silent half") {
    import org.apache.commons.io.FileUtils
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.IvfModel(
      emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble)))
    val path = java.nio.file.Files.createTempDirectory("ivf_seam")
      .resolve("cells").toString
    IvfStore.writeCells(emb, model, path, "overwrite")
    assert(IvfStore.layoutWidth(spark, path).contains(8),
      "writeCells must stamp the layout width")
    // consistent pair: identity, no load
    assert(IvfStore.matchingModel(spark, path, model) eq model)
    val grown = IvfStore.splitCell(spark, path, model, cell = 3)
    assert(IvfStore.layoutWidth(spark, path).contains(9),
      "the committed swap must flip the stamp")
    // THE CRASH: the caller died after the swap committed, before its
    // own Ivf.save republish. A reader still holding the pre-split model
    // recovers the staged grown model from the store itself, bit-exactly
    val recovered = IvfStore.matchingModel(spark, path, model)
    assert(recovered.centroids.map(_.toSeq).toSeq ==
      grown.centroids.map(_.toSeq).toSeq,
      "staged model diverged from the split's returned model")
    // and the recovered pair serves exactly like the grown pair
    val store = spark.read.parquet(path)
    val queries = emb.filter(col("vec_id").isin(3L, 77L, 240L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rows(Ivf.prunedSearch(store, queries, recovered, k = 5, nProbe = 2))
      == rows(Ivf.prunedSearch(store, queries, grown, k = 5, nProbe = 2)))
    // growing the layout under the stale model refuses loudly
    intercept[IllegalArgumentException] {
      IvfStore.append(emb.filter(col("vec_id") === 3L), model, path,
        batchId = 9L)
    }
    intercept[IllegalArgumentException] {
      IvfStore.splitCell(spark, path, model, cell = 0)
    }
    // a matching append keeps the committed stamp
    IvfStore.append(emb.filter(col("vec_id") === 3L), grown, path,
      batchId = 9L)
    assert(IvfStore.layoutWidth(spark, path).contains(9),
      "append must not lose the layout stamp")
    // with the staged copy gone (external cleanup), the reader REFUSES
    // rather than serving the silent (old model, grown layout) half
    FileUtils.deleteDirectory(new java.io.File(path, ".model_width_9"))
    intercept[IllegalArgumentException] {
      IvfStore.matchingModel(spark, path, model)
    }
    // the OTHER mismatch refuses too: a grown model against a store
    // whose committed layout is narrower (the grown model would file
    // probes into a cell the store does not have)
    val pre = java.nio.file.Files.createTempDirectory("ivf_seam_pre")
      .resolve("cells").toString
    IvfStore.writeCells(emb, model, pre, "overwrite")
    intercept[IllegalArgumentException] {
      IvfStore.matchingModel(spark, pre, grown)
    }
  }

  test("servingStream self-heals a split committed between triggers: stale caller model serves the grown pair") {
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.IvfModel(
      emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble)))
    val base = java.nio.file.Files.createTempDirectory("ivf_seam_serve")
    val storePath = base.resolve("cells").toString
    IvfStore.writeCells(emb, model, storePath, "overwrite")
    val cell = spark.read.parquet(storePath).groupBy("cluster").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy { case (c, n) => (-n, c) }.head._1
    def queryRows(ids: Seq[Long]) = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val results = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Double, Int)]]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])](spark)
    // the stream was started with the PRE-SPLIT model copy
    val q = Ivf.servingStream(input.toDF().toDF("vec_id", "embedding"),
        storePath, model, s"$base/ckpt", k = 5, nProbe = 2) { (res, id) =>
      results(id) = res.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    def expect(ids: Seq[Long], m: Ivf.IvfModel) = Ivf.prunedSearch(
        spark.read.parquet(storePath),
        emb.filter(col("vec_id").isin(ids: _*)), m, k = 5, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    try {
      input.addData(queryRows(Seq(3L, 77L))); q.processAllAvailable()
      assert(results(0L) == expect(Seq(3L, 77L), model))
      // maintenance splits the fullest cell BETWEEN triggers; the
      // caller's model copy is now stale — the next trigger must
      // resolve the staged grown model and serve the grown pair
      val grown = IvfStore.splitCell(spark, storePath, model, cell)
      input.addData(queryRows(Seq(3L, 240L))); q.processAllAvailable()
      assert(results(1L) == expect(Seq(3L, 240L), grown),
        "post-split trigger did not serve the (grown model, grown layout) pair")
    } finally q.stop()
  }

  test("splitCell crash window: a kill between the old-cell delete and the renames is recovered from the commit marker") {
    import org.apache.commons.io.FileUtils
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.IvfModel(
      emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble)))
    val base = java.nio.file.Files.createTempDirectory("ivf_crash")
    val livePath = base.resolve("cells").toString
    val clonePath = base.resolve("clone").toString
    IvfStore.writeCells(emb, model, livePath, "overwrite")
    FileUtils.copyDirectory(new java.io.File(livePath),
      new java.io.File(clonePath))
    // the truth: a split that RAN TO COMPLETION on the clone
    IvfStore.splitCell(spark, clonePath, model, cell = 3)
    def rows(p: String) = spark.read.parquet(p)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = rows(clonePath)
    // fabricate the crashed attempt on the live store: staging complete
    // (content = the clone's two post-split halves), commit marker
    // written, old cell dir deleted — and the process dies HERE, before
    // either rename (the exact window ADVICE r12 flagged)
    val staging = new java.io.File(livePath, ".split_3.staging.testcrash")
    FileUtils.copyDirectory(new java.io.File(clonePath, "cluster=3"),
      new java.io.File(staging, "cluster=3"))
    FileUtils.copyDirectory(new java.io.File(clonePath, "cluster=8"),
      new java.io.File(staging, "cluster=8"))
    java.nio.file.Files.write(
      new java.io.File(livePath, ".split_commit_3_8").toPath,
      staging.getName.getBytes("UTF-8"))
    FileUtils.deleteDirectory(new java.io.File(livePath, "cluster=3"))
    // without recovery the reader is missing the cell — the old bug
    assert(rows(livePath) != want, "crash fabrication did not take")
    IvfStore.recoverSplits(spark, livePath)
    assert(rows(livePath) == want,
      "recovery did not restore the committed snapshot")
    assert(!new java.io.File(livePath, ".split_commit_3_8").exists() &&
      !staging.exists(), "recovery left the marker or staging behind")
    // idempotent: a second recovery pass is a no-op
    IvfStore.recoverSplits(spark, livePath)
    assert(rows(livePath) == want)
    // markerless staging debris (crash BEFORE commit) is ignored
    val orphan = new java.io.File(livePath, ".split_5.staging.orphan")
    FileUtils.copyDirectory(new java.io.File(clonePath, "cluster=5"),
      new java.io.File(orphan, "cluster=5"))
    IvfStore.recoverSplits(spark, livePath)
    assert(rows(livePath) == want && orphan.exists(),
      "uncommitted staging must not be swapped in")
  }

  // --- hot-cell guard (round 13): the cell-local kernels must BOUND a
  // pathological cell instead of handing it to one task ---------------

  private def verdictRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet

  test("semDeDup hot-cell guard: planted one-cell corpus engages the grid fallback; verdicts ≡ ungated") {
    val emb = Tables(spark, sfDir, "embeddings")
    // a single-centroid model concentrates the ENTIRE corpus in cell 0 —
    // the pathological shape (stale centroids / skewed corpus)
    val one = Ivf.IvfModel(Array(
      emb.filter(col("vec_id") === 0).select(col("embedding")).collect()
        .head.getSeq[Float](0).toArray.map(_.toDouble)))
    assert(emb.count() > 50, "fixture too small to plant a hot cell")
    val guarded = Ivf.semDeDup(emb, one, tau = 0.95, hotCellCap = 50)
    val ungated = Ivf.semDeDup(emb, one, tau = 0.95, hotCellCap = 0)
    // the guard ENGAGED: the grid kernel is in the executed plan, and
    // the one-task kernel is not
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("cell_dominance_partial"),
      s"guard did not engage on a planted hot cell:\n$plan")
    assert(!plan.contains("cell_dominance("),
      "hot cell still routed through the one-task kernel")
    assert(ungated.queryExecution.executedPlan.toString
      .contains("cell_dominance("), "escape hatch lost the one-task plan")
    // and it is LOSSLESS: verdicts identical
    assert(verdictRows(guarded) == verdictRows(ungated) &&
      verdictRows(guarded).nonEmpty,
      "grid fallback diverged from the one-task kernel")
  }

  test("semDeDup hot-cell guard: mixed hot/cold cells — cold keep the one-task plan, verdicts ≡ ungated") {
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.train(emb, nCentroids = 8, dim = 64, iters = 1)
    // pick a cap between the largest and smallest cell so BOTH paths run
    val sizes = Ivf.assign(emb, model).groupBy(col("cluster")).count()
      .collect().map(_.getLong(1)).sorted
    val cap = sizes(sizes.length / 2).toInt
    assume(sizes.head <= cap && sizes.last > cap, "degenerate cell sizes")
    val guarded = Ivf.semDeDup(emb, model, tau = 0.95, hotCellCap = cap)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("cell_dominance_partial") &&
      plan.contains("cell_dominance("),
      s"expected BOTH kernels in the mixed plan:\n$plan")
    assert(verdictRows(guarded) ==
      verdictRows(Ivf.semDeDup(emb, model, tau = 0.95, hotCellCap = 0)),
      "mixed hot/cold verdicts diverged from ungated")
  }

  test("semDeDupIncremental hot-cell guard: standing-priority verdicts ≡ ungated under the grid") {
    val emb = Tables(spark, sfDir, "embeddings")
    val one = Ivf.IvfModel(Array(
      emb.filter(col("vec_id") === 0).select(col("embedding")).collect()
        .head.getSeq[Float](0).toArray.map(_.toDouble)))
    val standing = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val standingKept = Ivf.semDeDup(standing, one, tau = 0.95)
      .filter(col("kept")).select(col("vec_id"))
      .join(standing, "vec_id").select(col("vec_id"), col("embedding"))
    val guarded = Ivf.semDeDupIncremental(standingKept, batch, one,
      tau = 0.95, hotCellCap = 40)
    assert(guarded.queryExecution.executedPlan.toString
      .contains("cell_dominance_partial"), "guard did not engage")
    assert(verdictRows(guarded) == verdictRows(Ivf.semDeDupIncremental(
      standingKept, batch, one, tau = 0.95, hotCellCap = 0)) &&
      verdictRows(guarded).nonEmpty,
      "incremental grid fallback diverged from the one-task kernel")
  }

  test("hot-cell grid escalation: G = ceil(pop/cap) past the old 64 ceiling, per-task membership bounded, verdicts ≡ ungated") {
    // round-14 verdict ask: with the previous hard G ≤ 64, a cell of
    // pop > 64·cap put pop/64 > cap members back in one slice. Plant
    // exactly that: one cell of 500 at cap 5 ⇒ G = 100 > 64.
    val emb = Tables(spark, sfDir, "embeddings")
    val one = Ivf.IvfModel(Array(
      emb.filter(col("vec_id") === 0).select(col("embedding")).collect()
        .head.getSeq[Float](0).toArray.map(_.toDouble)))
    val pop = emb.count()
    val cap = 5
    assert(pop > 64L * cap, "fixture too small to cross the old ceiling")
    val g = Ivf.gridSlices(pop, cap)
    assert(g == (pop + cap - 1) / cap && g > 64,
      s"escalation arithmetic: got G=$g for pop=$pop cap=$cap")
    // the plan's per-task membership is doms(salt=gd) + cands(salt=gc):
    // the deterministic xxhash64 salt distribution bounds every slice —
    // mean pop/G ≤ cap; 4·cap absorbs the hash-uniformity spread at
    // this bucket size (deterministic, so not flaky)
    val maxSalt = emb.select(
        pmod(xxhash64(col("vec_id").cast("long")), lit(g)).as("s"))
      .groupBy(col("s")).count().agg(max(col("count"))).collect()
      .head.getLong(0)
    assert(maxSalt <= 4L * cap,
      s"per-slice membership $maxSalt exceeds 4*cap on the planted cell")
    val guarded = Ivf.semDeDup(emb, one, tau = 0.95, hotCellCap = cap)
    assert(guarded.queryExecution.executedPlan.toString
      .contains("cell_dominance_partial"), "guard did not engage")
    assert(verdictRows(guarded) ==
      verdictRows(Ivf.semDeDup(emb, one, tau = 0.95, hotCellCap = 0)) &&
      verdictRows(guarded).nonEmpty,
      ">64-slice grid diverged from the one-task kernel")
    // ceiling arithmetic: the flat factor caps at MaxGridSlices
    assert(Ivf.gridSlices(6500000L, 100000) == 65,
      "just past the old ceiling must escalate, not clamp")
    assert(Ivf.gridSlices(1000000000000L, 100000) == Ivf.MaxGridSlices)
    assert(Ivf.gridSlices(100L, 100000) == 1)
  }

  test("census memo: a censusKey reuses the first call's census across calls (trainOrLoad contract)") {
    val emb = Tables(spark, sfDir, "embeddings")
    val one = Ivf.IvfModel(Array(
      emb.filter(col("vec_id") === 0).select(col("embedding")).collect()
        .head.getSeq[Float](0).toArray.map(_.toDouble)))
    val key = s"ivfspec-memo-${System.nanoTime()}"
    // first call under the key: a COLD slice (20 members < cap) — its
    // census says "no hot cells"
    Ivf.semDeDup(emb.filter(col("vec_id") < 20), one, tau = 0.95,
      hotCellCap = 50, censusKey = Some(key))
    // same key, full 500-vector corpus — a deliberate contract
    // violation: the stale memoized census keeps the one-task plan even
    // though the corpus is now hot. That proves the memo is REAL (no
    // second census job re-gated the plan)...
    val stale = Ivf.semDeDup(emb, one, tau = 0.95, hotCellCap = 50,
      censusKey = Some(key))
    assert(!stale.queryExecution.executedPlan.toString
      .contains("cell_dominance_partial"),
      "memoized census was not reused (guard re-gated the plan)")
    // ...and COSTS ONLY PERFORMANCE, never correctness: both plans are
    // verdict-identical (the shared-oracle guarantee)
    assert(verdictRows(stale) ==
      verdictRows(Ivf.semDeDup(emb, one, tau = 0.95, hotCellCap = 0)))
    // a fresh key re-runs the census and the guard engages
    val fresh = Ivf.semDeDup(emb, one, tau = 0.95, hotCellCap = 50,
      censusKey = Some(key + "-fresh"))
    assert(fresh.queryExecution.executedPlan.toString
      .contains("cell_dominance_partial"),
      "fresh key did not re-run the census")
  }

  test("stale memoized census: a cell the census never saw still routes through the cold branch, not dropped (ADVICE r14)") {
    val emb = Tables(spark, sfDir, "embeddings")
    def vec(id: Long) = emb.filter(col("vec_id") === id)
      .select(col("embedding")).collect()
      .head.getSeq[Float](0).toArray.map(_.toDouble)
    val model = Ivf.IvfModel(Array(vec(0), vec(1)))
    // ids per cell under this model; both cells must be populated
    val byCell = Ivf.assign(emb, model).collect()
      .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._2)
    assume(byCell.keySet == Set(0, 1), "fixture degenerated to one cell")
    val cell0 = byCell(0).map(_._1).toSeq
    assume(cell0.length > 5 && byCell(1).nonEmpty)
    val frame1 = emb.filter(col("vec_id").isin(cell0: _*))
    // first call: frame populates ONLY cell 0, and at cap 5 that cell is
    // hot — the memoized census says "one cell, and it is hot"
    val key = s"ivfspec-staledrop-${System.nanoTime()}"
    Ivf.semDeDup(frame1, model, tau = 0.95, hotCellCap = 5,
      censusKey = Some(key))
    // same key, FULL corpus: cell 1 is populated now but absent from the
    // stale census. Pre-fix, the all-hot shortcut skipped the cold
    // branch and cell 1's rows vanished from the output; the fix keeps
    // the cold branch whenever the memo may have answered.
    val stale = Ivf.semDeDup(emb, model, tau = 0.95, hotCellCap = 5,
      censusKey = Some(key))
    assert(stale.count() == emb.count(),
      "stale census dropped rows of a cell it never saw")
    assert(verdictRows(stale) ==
      verdictRows(Ivf.semDeDup(emb, model, tau = 0.95, hotCellCap = 0)),
      "stale-census verdicts diverged from ungated")
    // the same guarantee for knnGraph's guard
    val gkey = s"$key-knng"
    Ivf.knnGraph(frame1, model, k = 3, nProbe = 1, hotCellCap = 5,
      censusKey = Some(gkey))
    val gStale = Ivf.knnGraph(emb, model, k = 3, nProbe = 1,
      hotCellCap = 5, censusKey = Some(gkey))
    def gKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(gKey(gStale) ==
      gKey(Ivf.knnGraph(emb, model, k = 3, nProbe = 1, hotCellCap = 0)),
      "stale-census knnGraph diverged from ungated")
  }

  test("census memo is bounded: epoch keys age out at CensusMemoMax; invalidateCensusMemo empties it") {
    // round-14 verdict ask #3: a serving JVM whose store grows mints a
    // NEW censusKey per epoch (the documented contract), so an unbounded
    // memo leaks for months. LRU-cap it and give maintenance a hook.
    val emb = Tables(spark, sfDir, "embeddings")
    val one = Ivf.IvfModel(Array(
      emb.filter(col("vec_id") === 0).select(col("embedding")).collect()
        .head.getSeq[Float](0).toArray.map(_.toDouble)))
    val tiny = emb.filter(col("vec_id") < 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      tiny.count()
      val nonce = System.nanoTime()
      for (i <- 0 until Ivf.CensusMemoMax + 20)
        Ivf.semDeDup(tiny, one, tau = 0.95, hotCellCap = 50,
          censusKey = Some(s"epoch-$nonce-$i"))
      assert(Ivf.censusMemoSize <= Ivf.CensusMemoMax,
        s"memo grew past the cap: ${Ivf.censusMemoSize}")
      // recency semantics: the newest epoch key still hits (no census
      // re-run — at cap 50 the 3-row frame is cold, so a HIT keeps the
      // one-task plan; so would a fresh census here, but the size
      // assertion above already proves eviction happened at the old end)
      assert(Ivf.censusMemoSize > 0)
      Ivf.invalidateCensusMemo()
      assert(Ivf.censusMemoSize == 0, "invalidation hook left entries")
    } finally tiny.unpersist(blocking = false)
  }

  test("append in a crashed split's commit window: entry recovery completes the swap, so the stale-model append refuses instead of losing the batch (ADVICE r14)") {
    import org.apache.commons.io.FileUtils
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.IvfModel(
      emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble)))
    val base = java.nio.file.Files.createTempDirectory("ivf_crash_append")
    val livePath = base.resolve("cells").toString
    val clonePath = base.resolve("clone").toString
    IvfStore.writeCells(emb, model, livePath, "overwrite")
    FileUtils.copyDirectory(new java.io.File(livePath),
      new java.io.File(clonePath))
    val grown = IvfStore.splitCell(spark, clonePath, model, cell = 3)
    def rows(p: String) = spark.read.parquet(p)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = rows(clonePath)
    // fabricate the crash window on the live store (the recipe of the
    // splitCell crash-window test): staging complete, marker committed,
    // old cell deleted, swap NOT replayed — the stamp still reads 8
    val staging = new java.io.File(livePath, ".split_3.staging.testcrash")
    FileUtils.copyDirectory(new java.io.File(clonePath, "cluster=3"),
      new java.io.File(staging, "cluster=3"))
    FileUtils.copyDirectory(new java.io.File(clonePath, "cluster=8"),
      new java.io.File(staging, "cluster=8"))
    // splitCell stages the grown model BEFORE the marker exists — part
    // of the crash window's committed state
    FileUtils.copyDirectory(new java.io.File(clonePath, ".model_width_9"),
      new java.io.File(livePath, ".model_width_9"))
    java.nio.file.Files.write(
      new java.io.File(livePath, ".split_commit_3_8").toPath,
      staging.getName.getBytes("UTF-8"))
    FileUtils.deleteDirectory(new java.io.File(livePath, "cluster=3"))
    // pre-fix, this append PASSED the width check (stamp still 8),
    // wrote into cluster=3, and the next recovery replay deleted that
    // directory — silent batch loss. Post-fix the entry recovery runs
    // first, the stamp reads 9, and the stale-model append REFUSES.
    val batch = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    intercept[IllegalArgumentException] {
      IvfStore.append(batch, model, livePath, batchId = 7L)
    }
    // the refusal's recovery completed the swap: committed snapshot
    assert(rows(livePath) == want, "entry recovery did not complete the swap")
    // resolving the matching model lets the day-2 append proceed, and
    // the batch SURVIVES any further recovery pass (nothing to replay)
    val m2 = IvfStore.matchingModel(spark, livePath, model)
    assert(m2.k == grown.k)
    IvfStore.append(batch, m2, livePath, batchId = 7L)
    IvfStore.recoverSplits(spark, livePath)
    val after = rows(livePath)
    assert(after.map(_._1).count(_ >= 100000L) == 5,
      "appended batch lost after recovery")
    assert(after.filter(_._1 < 100000L) == want)
  }

  test("knnGraph hot-cell guard: grid partials merge to the identical graph") {
    val emb = Tables(spark, sfDir, "embeddings")
    val model = Ivf.train(emb, nCentroids = 4, dim = 64, iters = 1)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val guarded = Ivf.knnGraph(emb, model, k = 5, nProbe = 2, hotCellCap = 30)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("cell_topk"), s"cell kernel missing:\n$plan")
    assert(plan.contains("gq") && plan.contains("gm"),
      s"guard did not engage (no grid keys in plan):\n$plan")
    val ungated = Ivf.knnGraph(emb, model, k = 5, nProbe = 2, hotCellCap = 0)
    assert(key(guarded) == key(ungated) && key(guarded).nonEmpty,
      "grid-salted knnGraph diverged from the one-task plan")
  }
}
