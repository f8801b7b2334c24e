package graft.text

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch/stream unification for the training-data pipeline itself: the
  * per-document stages (fused text features, quality, fingerprinting,
  * deterministic hash-mod sampling) are stateless narrow transforms, so
  * the SAME code runs over a document stream — this spec feeds the fixture
  * corpus through a MemoryStream and asserts the streamed output equals
  * the batch run row for row.
  */
class CorpusStreamSpec extends SparkSpec {

  test("document-corpus stages produce identical output on a stream") {
    import spark.implicits._

    // THE shared pipeline definition — the same call the backfill
    // entrypoint makes, so this equality really is "same code, both modes"
    def stages(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      Text.curate(df, minQuality = 0.0) // keep all qualities: more rows compared

    val docs = graft.source.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val rows = docs.as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)](spark)
    val q = stages(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("corpus_stream_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(120))
      input.addData(rows.drop(120)) // two micro-batches, not one
      q.processAllAvailable()
    } finally q.stop()

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSet
    val streamed = key(spark.table("corpus_stream_out"))
    val batch = key(stages(docs))
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(2)} extra=${(streamed -- batch).take(2)}")
    assert(streamed.nonEmpty)
  }

  test("mixture sampling streams: per-stratum rates on a document stream") {
    import spark.implicits._
    val docs = graft.source.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang")).limit(200)
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val rates = Map("en" -> 5, "de" -> 3, "es" -> 2, "fr" -> 1, "zh" -> 10)

    val input = MemoryStream[(Long, String, String)](spark)
    val q = Text.mixtureSample(input.toDF().toDF("doc_id", "text", "lang"), rates)
      .select(col("doc_id"), col("lang"))
      .writeStream.format("memory").queryName("mixture_stream_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(100))
      input.addData(rows.drop(100))
      q.processAllAvailable()
    } finally q.stop()

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = key(spark.table("mixture_stream_out"))
    val batch = key(Text.mixtureSample(docs, rates).select(col("doc_id"), col("lang")))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("PII scrub streams: redaction output identical batch vs stream") {
    import spark.implicits._
    // salt a synthetic email+IP per row (the fixture text has no PII),
    // exactly as the registered doc_pii_redacted query does
    def scrub(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id"),
        Text.redactPii(concat(lit("user"), col("doc_id").cast("string"),
          lit("@example.com 10.0."), (col("doc_id") % 250).cast("string"),
          lit(".7 "), col("text"))).as("redacted"))

    val docs = graft.source.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(150)
    val rows = docs.as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)](spark)
    val q = scrub(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii_stream_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(75))
      input.addData(rows.drop(75))
      q.processAllAvailable()
    } finally q.stop()

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = key(spark.table("pii_stream_out"))
    assert(streamed == key(scrub(docs)))
    assert(streamed.nonEmpty &&
      streamed.forall { case (_, t) => t.contains("<EMAIL>") && t.contains("<IP>") })
  }

  test("incremental dedup streams: index drops cross-batch, first-seen wins within stream") {
    import spark.implicits._
    val existing = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    // arrival order: 13 arrives before 11 (same text) → 13 survives
    // (FIRST-SEEN, the documented streaming difference from batch min-id)
    val arrivals = Seq(
      (10L, "alpha beta gamma"),   // dup of index 1 → dropped
      (13L, "eta theta iota"),     // fresh, first arrival → kept
      (11L, "eta theta iota"),     // later same-content arrival → dropped
      (12L, "kappa lambda mu"),    // fresh → kept
      (14L, "delta epsilon zeta")) // dup of index 2 → dropped

    val input = MemoryStream[(Long, String)](spark)
    val q = Dedup.incrementalStream(input.toDF().toDF("doc_id", "text"), existing)
      .writeStream.format("memory").queryName("incr_stream_out")
      .outputMode("append").start()
    try {
      input.addData(arrivals.take(2)) // 13 ("eta theta iota") in batch one
      input.addData(arrivals.drop(2)) // its dup 11 in batch TWO: the drop
                                      // requires dedup state to span batches
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.table("incr_stream_out").collect().map(_.getLong(0)).toSet
    assert(kept == Set(13L, 12L), s"kept=$kept")
  }

  test("generic incremental stream step lifts Jaccard: sequential batches ≡ one-shot") {
    val docs = graft.source.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") < 300).select("doc_id", "lang", "source", "text")
    val standing = java.nio.file.Files
      .createTempDirectory("jc_stream").resolve("store").toString
    def step(lo: Long, hi: Long, id: Long) =
      Dedup.incrementalStreamStep(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi), id, standing)(
          Dedup.prefixJaccardPairsIncremental(_, _, Seq("lang", "source"), 0.8))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = step(0, 100, 0) ++ step(100, 200, 1) ++ step(200, 300, 2)
    val oneShot = Dedup.prefixJaccardPairs(docs, Seq("lang", "source"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oneShot && got.nonEmpty,
      s"missing=${(oneShot -- got).take(3)} extra=${(got -- oneShot).take(3)}")
  }

  test("streaming minhash near-dup: batches ≡ one-shot, redelivery idempotent") {
    import spark.implicits._
    // near-dup groups planted ACROSS arrival batches: every pair must be
    // emitted exactly once, at its LATER member's arrival
    val s1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val s2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val s3 = "one two three four five six seven eight nine ten"
    val rows = Seq(
      1L -> s1, 2L -> s2, 3L -> s3,          // batch 0
      4L -> s1, 5L -> "unique first words never repeated anywhere else at all",
      6L -> s2,                              // batch 1: dups of 1 and 2
      7L -> s1, 8L -> s3)                    // batch 2: dups of 1, 4 and 3
    val base = java.nio.file.Files.createTempDirectory("mh_stream").toString
    val standing = s"$base/standing"
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[(Long, String)](spark)
    val q = Dedup.minhashPairStream(input.toDF().toDF("doc_id", "text"),
        standing, s"$base/ckpt") { (pairs, id) =>
      emitted ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), id))
    }
    try {
      input.addData(rows.take(3)); q.processAllAvailable()
      input.addData(rows.slice(3, 6)); q.processAllAvailable()
      input.addData(rows.drop(6)); q.processAllAvailable()
    } finally q.stop()
    val got = emitted.map { case (a, b, _) => (a, b) }.toSet
    val oneShot = Dedup.minhashPairsMd5(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oneShot, s"missing=${oneShot -- got} extra=${got -- oneShot}")
    // each pair exactly once, at the batch where its later member arrived
    assert(emitted.size == got.size, s"duplicated emissions: $emitted")
    val arrivalBatch = Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1,
      6L -> 1, 7L -> 2, 8L -> 2)
    emitted.foreach { case (a, b, id) =>
      assert(math.max(arrivalBatch(a), arrivalBatch(b)) == id,
        s"pair ($a,$b) emitted at batch $id")
    }
    // redelivery of the LAST batch (the foreachBatch failure-replay case):
    // the store partition overwrites with identical rows and the standing
    // side excludes the batch id → identical pair frame, store unchanged
    val before = spark.read.parquet(standing).count()
    val redelivered = Dedup.minhashStreamStep(
        rows.drop(6).toDF("doc_id", "text"), batchId = 2, standing)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(redelivered ==
      emitted.filter(_._3 == 2).map { case (a, b, _) => (a, b) }.toSet)
    assert(spark.read.parquet(standing).count() == before)
  }

  /** Exactly-once contract for a family's `*PairStream` wrapper: drive
    * `rows` through three micro-batches, assert emissions ≡ the family's
    * one-shot pass over the whole corpus, each pair exactly once, at its
    * later member's arrival batch.
    */
  private def assertExactlyOnce(
      rows: Seq[(Long, String, String)], cols: Seq[String],
      oneShot: org.apache.spark.sql.DataFrame,
      run: (org.apache.spark.sql.DataFrame, String, String,
            (org.apache.spark.sql.DataFrame, Long) => Unit) =>
           org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    import spark.implicits._
    val n = rows.size
    val arrival = rows.zipWithIndex.map { case ((id, _, _), i) =>
      id -> (if (i < n / 3) 0 else if (i < 2 * n / 3) 1 else 2)
    }.toMap
    val base = java.nio.file.Files.createTempDirectory("fam_stream").toString
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[(Long, String, String)](spark)
    val q = run(input.toDF().toDF(cols: _*), s"$base/standing", s"$base/ckpt",
      (pairs, id) => emitted ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), id)))
    try {
      input.addData(rows.take(n / 3)); q.processAllAvailable()
      input.addData(rows.slice(n / 3, 2 * n / 3)); q.processAllAvailable()
      input.addData(rows.drop(2 * n / 3)); q.processAllAvailable()
    } finally q.stop()
    val got = emitted.map { case (a, b, _) => (a, b) }.toSet
    val want = oneShot.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.nonEmpty, "vacuous: the planted corpus produced no pairs")
    assert(emitted.size == got.size, s"duplicated emissions: $emitted")
    emitted.foreach { case (a, b, id) =>
      assert(math.max(arrival(a), arrival(b)) == id,
        s"pair ($a,$b) emitted at batch $id, arrivals $arrival")
    }
  }

  test("streaming jaccard pairs: batches ≡ one-shot, exactly once") {
    import spark.implicits._
    val s1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val s2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val s3 = "one two three four five six seven eight nine ten"
    val rows = Seq((1L, "en", s1), (2L, "en", s2), (3L, "en", s3),
      (4L, "en", s1), (5L, "en", "unique words never repeated anywhere else"),
      (6L, "en", s2), (7L, "en", s1), (8L, "en", s3))
    assertExactlyOnce(rows, Seq("doc_id", "lang", "text"),
      Dedup.prefixJaccardPairs(rows.toDF("doc_id", "lang", "text"), Seq("lang"), 0.8),
      (df, st, ck, sink) =>
        Dedup.jaccardPairStream(df, st, ck, Seq("lang"), 0.8)(sink))
  }

  test("streaming containment pairs: batches ≡ one-shot, exactly once") {
    import spark.implicits._
    val s1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val sub = "alpha beta gamma delta epsilon" // ⊂ s1: containment 1
    val s3 = "one two three four five six seven eight nine ten"
    val rows = Seq((1L, "en", s1), (2L, "en", s3), (3L, "en", sub),
      (4L, "en", s1), (5L, "en", "unique words never repeated anywhere else"),
      (6L, "en", s3), (7L, "en", sub), (8L, "en", s1))
    assertExactlyOnce(rows, Seq("doc_id", "lang", "text"),
      Dedup.containmentPairs(rows.toDF("doc_id", "lang", "text"), Seq("lang"), 0.8),
      (df, st, ck, sink) =>
        Dedup.containmentPairStream(df, st, ck, Seq("lang"), 0.8)(sink))
  }

  test("streaming simhash pairs: batches ≡ one-shot, exactly once") {
    import spark.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val t1b = "the quick brown fox jumps over the lazy cat near the river bank today"
    val t2 = "completely different words about spark catalyst tungsten codegen shuffles"
    val rows = Seq((1L, "en", t1), (2L, "en", t2), (3L, "en", t1b),
      (4L, "en", t1), (5L, "en", "unrelated filler text with nothing shared"),
      (6L, "en", t1b), (7L, "en", t2), (8L, "en", t1))
    assertExactlyOnce(rows, Seq("doc_id", "lang", "text"),
      Dedup.simhashPairsMd5(rows.toDF("doc_id", "lang", "text")),
      (df, st, ck, sink) =>
        Dedup.simhashPairStream(df, st, ck)(sink))
  }

  test("streaming fuzzy pairs: batches ≡ one-shot, exactly once") {
    import spark.implicits._
    val rows = Seq((1L, "ams", "jansen"), (2L, "ams", "johnson"), (3L, "ams", "janssen"),
      (4L, "rtm", "devries"), (5L, "ams", "jansen"), (6L, "rtm", "de vries"),
      (7L, "ams", "johnsen"), (8L, "rtm", "devries"))
    assertExactlyOnce(rows, Seq("id", "city", "name"),
      Entity.editDistancePairs(rows.toDF("id", "city", "name"), 1, "id", "name", Seq("city")),
      (df, st, ck, sink) =>
        Entity.fuzzyPairStream(df, st, ck, 1, "id", "name", Seq("city"))(sink))
  }

  test("standing-store compaction: bounded files, identical pairs, redelivery intact") {
    import spark.implicits._
    val s1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val s2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val s3 = "one two three four five six seven eight nine ten"
    val rows = Seq(1L -> s1, 2L -> s2, 3L -> s3, 4L -> s1,
      5L -> s2, 6L -> s3, 7L -> s1, 8L -> s2)
    val base = java.nio.file.Files.createTempDirectory("mh_compact").toString
    val standing = s"$base/standing"
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[(Long, String)](spark)
    // compact after every 2nd batch: the stream crosses TWO compaction
    // boundaries (after ids 1 and 3) while pairs keep spanning them
    val q = Dedup.minhashPairStream(input.toDF().toDF("doc_id", "text"),
        standing, s"$base/ckpt", compactEvery = 2) { (pairs, id) =>
      emitted ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), id))
    }
    try {
      rows.grouped(2).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()
    // content identity across both boundaries
    val got = emitted.map { case (a, b, _) => (a, b) }.toSet
    val want = Dedup.minhashPairsMd5(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty, s"missing=${want -- got} extra=${got -- want}")
    assert(emitted.size == got.size, s"duplicated emissions: $emitted")
    // layout bounded: ONE base (batches 0-2 folded) + the latest delta —
    // not one directory per micro-batch
    val l = graft.ops.StandingStore.layout(spark, standing)
    assert(l.foldedThrough == 2L, l.toString)
    assert(l.deltas.map(_._2) == Seq(3L), l.toString)
    val baseFiles = new java.io.File(l.base.get._1.toUri)
      .listFiles.filter(_.getName.endsWith(".parquet"))
    assert(baseFiles.length == 1, s"base not bin-packed: ${baseFiles.toSeq}")
    // row content untouched: all 8 docs still standing
    assert(graft.ops.StandingStore
      .read(spark, standing, excludeBatch = -1, Seq("doc_id", "text"))
      .get.count() == 8)
    // redelivery of the LAST batch across the compaction boundary: the
    // standing side (now the folded base + nothing) still excludes batch
    // 3, the partition overwrite rewrites identical rows → identical frame
    val redelivered = Dedup.minhashStreamStep(
        rows.drop(6).toDF("doc_id", "text"), batchId = 3, standing)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(redelivered ==
      emitted.filter(_._3 == 3).map { case (a, b, _) => (a, b) }.toSet)
    val l2 = graft.ops.StandingStore.layout(spark, standing)
    assert(l2.foldedThrough == 2L && l2.deltas.map(_._2) == Seq(3L), l2.toString)
  }

  test("streaming semDeDup: verdicts ≡ batch-by-batch incremental fold, redelivery intact") {
    import spark.implicits._
    val emb = graft.source.Tables(spark, sfDir, "embeddings")
    val model = graft.sim.Ivf.IvfModel(
      emb.filter(col("vec_id") < 16).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble)))
    val rows = emb.filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val base = java.nio.file.Files.createTempDirectory("sem_stream").toString
    val standing = s"$base/standing"
    val got = scala.collection.mutable.Map.empty[Long, (Int, Boolean, Long)]
    val input = MemoryStream[(Long, Seq[Float])](spark)
    // tau = 0.4 (the emb_semdedup rationale): the i.i.d. fixture's max
    // pairwise cosine ≈ 0.49, so the rule bites on real rows
    val q = graft.sim.Ivf.semDeDupStream(input.toDF().toDF("vec_id", "embedding"),
        standing, s"$base/ckpt", model, tau = 0.4) { (verdicts, id) =>
      got ++= verdicts.collect().map(r =>
        r.getLong(0) -> (r.getInt(1), r.getBoolean(2), id))
    }
    try {
      input.addData(rows.take(70)); q.processAllAvailable()
      input.addData(rows.slice(70, 140)); q.processAllAvailable()
      input.addData(rows.drop(140)); q.processAllAvailable()
    } finally q.stop()
    // reference: fold semDeDupIncremental by hand, standing = kept rows
    val want = scala.collection.mutable.Map.empty[Long, Boolean]
    var standingRef = emb.filter(lit(false)).select(col("vec_id"), col("embedding"))
    Seq(rows.take(70), rows.slice(70, 140), rows.drop(140)).foreach { b =>
      val batchDf = b.toDF("vec_id", "embedding")
      val v = graft.sim.Ivf.semDeDupIncremental(standingRef, batchDf,
          model, tau = 0.4)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2))
      want ++= v
      val kept = v.filter(_._2).map(_._1).toSet
      standingRef = standingRef.unionByName(
        batchDf.filter(col("vec_id").isin(kept.toSeq: _*))).localCheckpoint()
    }
    assert(got.view.mapValues(_._2).toMap == want.toMap,
      s"diverged on ${(got.keySet ++ want.keySet).find(k =>
        got.get(k).map(_._2) != want.get(k))}")
    assert(got.valuesIterator.count(!_._2) > 0, "tau never bit — vacuous")
    // every vector judged exactly once, at its arrival batch
    assert(got.size == rows.size)
    // redelivery of the last batch: identical verdicts, store unchanged
    val before = graft.ops.StandingStore
      .read(spark, standing, excludeBatch = -1, Seq("vec_id")).get.count()
    val redelivered = graft.sim.Ivf.semDeDupStreamStep(
        rows.drop(140).toDF("vec_id", "embedding"), batchId = 2, standing,
        model, tau = 0.4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(redelivered == got.collect {
      case (k, (_, kept, 2L)) => k -> kept }.toMap)
    assert(graft.ops.StandingStore
      .read(spark, standing, excludeBatch = -1, Seq("vec_id")).get.count() == before)
  }

  test("streaming curation funnel: summed increments ≡ hand-rolled fold, redelivery intact") {
    import spark.implicits._
    val docs = graft.source.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .filter(col("doc_id") < 300)
    val bench = docs.filter(col("doc_id") < 3)
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val base = java.nio.file.Files.createTempDirectory("funnel_stream").toString
    val standing = s"$base/standing"
    type Key = (String, String)
    val got = scala.collection.mutable.Map.empty[Key, (Long, Long)]
    var lastBatch = Map.empty[Key, (Long, Long)]
    def add(into: scala.collection.mutable.Map[Key, (Long, Long)],
            df: org.apache.spark.sql.DataFrame): Map[Key, (Long, Long)] = {
      val m = df.collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
      m.foreach { case (k, (a, b)) =>
        val (pa, pb) = into.getOrElse(k, (0L, 0L)); into(k) = (pa + a, pb + b)
      }
      m
    }
    val input = MemoryStream[(Long, String, String)](spark)
    val q = Dedup.funnelStream(input.toDF().toDF("doc_id", "source", "text"),
        standing, s"$base/ckpt", bench) { (counts, id) =>
      lastBatch = add(got, counts)
    }
    try {
      input.addData(rows.take(100)); q.processAllAvailable()
      input.addData(rows.slice(100, 200)); q.processAllAvailable()
      input.addData(rows.drop(200)); q.processAllAvailable()
    } finally q.stop()
    // reference: hand-rolled incremental fold with an accumulated fp set
    val want = scala.collection.mutable.Map.empty[Key, (Long, Long)]
    var fps = docs.filter(lit(false)).select(md5(col("text")).as("fp"))
    Seq(rows.take(100), rows.slice(100, 200), rows.drop(200)).foreach { b =>
      val bDf = b.toDF("doc_id", "source", "text")
      add(want, Dedup.curationFunnelIncremental(bDf, fps, bench))
      fps = fps.unionByName(
        bDf.filter(size(split(col("text"), "\\s+")) >= 20)
          .select(md5(col("text")).as("fp"))).localCheckpoint()
    }
    assert(got.toMap == want.toMap,
      s"streamed card diverged: ${(got.toSet -- want.toSet).take(3)} vs ${(want.toSet -- got.toSet).take(3)}")
    assert(got(("1_raw", rows.head._2))._1 > 0)
    // redelivery of the last batch: identical increments, store unchanged
    val before = graft.ops.StandingStore
      .read(spark, standing, excludeBatch = -1, Seq("fp")).get.count()
    val redelivered = Dedup.funnelStreamStep(
      rows.drop(200).toDF("doc_id", "source", "text"), batchId = 2,
      standing, bench)
    val re = redelivered.collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(re == lastBatch, "redelivered increments diverged")
    assert(graft.ops.StandingStore
      .read(spark, standing, excludeBatch = -1, Seq("fp")).get.count() == before)
  }
}
