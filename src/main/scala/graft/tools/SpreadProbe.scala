package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.source.Tables
import graft.text.Dedup

/** Measures what the single-row-group documents fixture costs the
  * kernel-heavy pair pipelines: times each pipeline over the raw scan
  * vs. a round-robin-spread copy of the same rows. Decides whether the
  * scan spread (the `lineitem_profile` fix) should extend to the text
  * pipelines despite their file sizes sitting under the 8 MB floor.
  *
  *   sbt "runMain graft.tools.SpreadProbe <sfDir>"
  */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val raw = Tables(spark, sfDir, "documents")
    val spread = raw.repartition(cpus.toInt)

    for ((tag, docs) <- Seq("raw" -> raw, "spread" -> spread)) {
      time(s"containment/$tag") {
        Dedup.containmentPairs(docs, Seq("lang", "source"), 0.8)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"jaccard/$tag") {
        Dedup.prefixJaccardPairs(docs, Seq("lang", "source"), 0.8)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"simhash/$tag") {
        Dedup.simhashPairs(docs).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
