package graft.queries

import graft.SparkSpec

/** The `doc_e2e_curated` chain reorders stages relative to its oracle
  * (decontaminate first, survivor window later) on the argument that every
  * predicate except the hash sample is fingerprint-uniform. The fixture
  * corpus has no exact duplicates, so the oracle can't exercise the one
  * ordering that matters: a duplicate group whose canonical (min-id)
  * survivor falls in a DROPPED sample bucket while a copy falls in a kept
  * one — a wrong stage order would resurrect the copy. This spec builds
  * that corpus and pins the registered query against an independent
  * sequential reference.
  */
class E2eCurationSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(id: Long): Long =
    java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 10

  test("registered chain equals the sequential reference on cross-bucket duplicate groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    // pure-alpha vocabulary: punct/digit noise is exactly 0, so the
    // quality score reduces to len/diversity terms (the full arithmetic
    // is oracle-verified at sf0.01; this spec targets stage ORDER)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "the", "a", "iota", "kappa", "lambda", "mu")
    def text(): String =
      Vector.fill(8 + rnd.nextInt(70))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 120L).map(i =>
      (i, text(), if (i % 2 == 0) "en" else "de"))
    // duplicates of every base doc in a DROPPED bucket (≥ 8): the copy id
    // is chosen from kept buckets, so min-id survivor ∈ dropped bucket,
    // copy ∈ kept bucket — the adversarial ordering case by construction
    val droppedSources = base.filter(r => bucket(r._1) >= 8)
    assert(droppedSources.size >= 15, s"seed gave only ${droppedSources.size}")
    val copyIds = (200L until 2000L).filter(id => bucket(id) < 8).iterator
    val dups = droppedSources.map(r => (copyIds.next(), r._2, r._3))
    // plus ordinary duplicates of kept-bucket sources
    val more = base.filter(r => bucket(r._1) < 8).take(10)
      .map(r => (copyIds.next(), r._2, r._3))
    val rows = base ++ dups ++ more
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    rows.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry.queries("doc_e2e_curated")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

    // independent sequential reference, in the oracle's stage order
    def grams(t: String): Set[String] =
      t.split("\\s+").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val benchGrams = rows.filter(_._1 < 3).flatMap(r => grams(r._2)).toSet
    def quality(t: String): Double = {
      val toks = t.split("\\s+")
      val lenScore = math.min(toks.length / 64.0, 1.0)
      val divScore = math.min((toks.distinct.length.toDouble / toks.length) * 2.0, 1.0)
      math.max(0.0, math.min(1.0, lenScore * 0.4 + divScore * 0.4 + 1.0 * 0.2))
    }
    val survivors = rows.groupBy(r => md5hex(r._2)).values.map(_.minBy(_._1)).toSeq
    val expect = survivors
      .filter(r => quality(r._2) >= 0.5)
      .filter(r => grams(r._2).intersect(benchGrams).isEmpty)
      .filter(r => bucket(r._1) < 8)
      .map(r => (r._1, r._3, quality(r._2)))
      .sortBy(_._1)

    assert(got == expect,
      s"got ${got.size} rows, expect ${expect.size}; " +
        s"missing=${(expect.toSet -- got.toSet).take(3)} extra=${(got.toSet -- expect.toSet).take(3)}")
    // the adversarial case really occurred: no copy of a dropped-bucket
    // source may appear, even though the copy's own bucket is kept
    val copyIdSet = dups.map(_._1).toSet
    assert(got.forall(r => !copyIdSet.contains(r._1)), "a duplicate copy was resurrected")
    assert(expect.nonEmpty)
  }
}
