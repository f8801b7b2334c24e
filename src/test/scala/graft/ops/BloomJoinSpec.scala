package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomExpressions
import graft.source.Tables

class BloomJoinSpec extends SparkSpec {

  private def lineitem = Tables(spark, sfDir, "lineitem")
  private def urgent =
    Tables(spark, sfDir, "orders").filter(col("o_orderpriority") === "1-URGENT")

  test("bloom semi join ≡ plain left-semi join (exactness by construction)") {
    val viaBloom = BloomJoin
      .semiJoin(lineitem, "l_orderkey", urgent, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
    val plain = lineitem
      .join(urgent.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("prefilter keeps every true match and sheds most non-matches") {
    val total = lineitem.count()
    val trueMatches = lineitem
      .join(urgent.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    val pre = BloomJoin.prefilter(lineitem, "l_orderkey", urgent, "o_orderkey",
      fpp = 0.01)
    val preCount = pre.count()
    // no false negatives: the prefiltered set contains all matches
    assert(preCount >= trueMatches)
    // fpp bound with generous slack: survivors ≤ matches + 5% of non-matches
    assert(preCount <= trueMatches + ((total - trueMatches) * 0.05).toLong + 8,
      s"prefilter passed $preCount of $total (true matches $trueMatches)")
  }

  test("probe expression: null key → row filtered, exact keys probe the filter") {
    import spark.implicits._
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val bytes = BloomExpressions.serialize(dim.stat.bloomFilter("k", 64, 0.01))
    val fact = Seq(Some(1L), Some(99L), None).toDF("k")
    val kept = fact
      .where(BloomExpressions.mightContainLong(col("k"), bytes))
      .as[Option[Long]].collect().toSet
    assert(kept.contains(Some(1L)))
    assert(!kept.contains(None), "NULL key must not survive the predicate")
  }

  test("interpreted eval matches codegen path") {
    import spark.implicits._
    val dim = (0L until 500L by 7).toDF("k")
    val bytes = BloomExpressions.serialize(dim.stat.bloomFilter("k", 128, 0.01))
    val probe = BloomExpressions.BloomMightContainLong(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("k")), bytes)
    // direct nullSafeEval vs the dataframe (codegen) route
    val viaDf = (0L until 500L).toDF("k")
      .where(BloomExpressions.mightContainLong(col("k"), bytes))
      .as[Long].collect().toSet
    val viaEval = (0L until 500L).filter(v =>
      probe.probe(v)).toSet
    assert(viaDf == viaEval)
  }
}
