package graft.gen

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Dedup

class ZipfCorpusSpec extends SparkSpec {

  test("corpus is deterministic and Zipf-shaped") {
    val a = ZipfCorpus(spark, sfDir).orderBy("doc_id").collect()
    val b = ZipfCorpus(spark, sfDir).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length >= 100)
    val freq = ZipfCorpus(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // dyadic Zipf(1): P(t1) = 1/11, P(t2) = 1/22 — t1 ~2x t2; wide vocab
    assert(freq("t1") > 1.5 * freq("t2"))
    assert(freq.size > 500, s"vocab ${freq.size}")
    // heavy head, long tail: t1 alone is ~9% of all tokens
    val total = freq.values.sum.toDouble
    assert(freq("t1") / total > 0.06 && freq("t1") / total < 0.13)
  }

  test("planted docs repeat their base's stream except the last 3 positions") {
    val texts = ZipfCorpus(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val planted = texts.keys.filter(id => id % 50 == 17 && texts.contains(id - 1))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val (p, base) = (texts(id), texts(id - 1))
      assert(p.length == base.length)
      assert(p.dropRight(3) == base.dropRight(3))
    }
  }

  test("unblocked PPJoin on the Zipf corpus equals the quadratic kernel") {
    val z = ZipfCorpus(spark, sfDir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val fast = Dedup.prefixJaccardPairs(z, Seq.empty, threshold = 0.8)
      .collect().map(key).toSet
    val slow = Dedup.jaccardPairs(z.withColumn("blk", lit(1)), Seq("blk"),
        threshold = 0.8)
      .collect().map(key).toSet
    assert(fast == slow, s"missing=${(slow -- fast).take(3)} extra=${(fast -- slow).take(3)}")
    assert(fast.nonEmpty) // the planted near-dups must actually surface
  }
}
