package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.source.Tables

/** Pair-pipeline observability: candidate volume vs surviving results for
  * the prefix-filtered Jaccard join on a given documents table — the
  * number SCALE.md's amplification claims rest on, measurable on any
  * corpus:
  *
  *   sbt "runMain graft.text.PairStats <sfDir> [threshold]"
  *
  * Prints one line: docs, candidates (post length+positional filter,
  * deduplicated), results, candidates-per-result.
  */
object PairStats {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, dir, "documents")
    val blockCols = Seq("lang", "source")
    val d = docs.select(
      (col("doc_id").as("id") +: blockCols.map(col)) :+
        array_sort(array_distinct(split(col("text"), "\\s+"))).as("w"): _*)
      .withColumn("nw", size(col("w")))
    val nDocs = d.count()
    val candidates = Dedup.prefixCandidates(
      d, blockCols, threshold, commonVocab = 10000, hotBucketCap = 100000).count()
    val results = Dedup.prefixJaccardPairs(
      docs, blockCols, threshold).count()
    val amp = if (results > 0) candidates.toDouble / results else Double.NaN
    println(f"[pairstats] docs=$nDocs candidates=$candidates " +
      f"results=$results candidates_per_result=$amp%.1f threshold=$threshold")
    spark.stop()
  }
}
