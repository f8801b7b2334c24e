package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.source.Tables

/** Candidate-pipeline observability for the fuzzy entity join (the
  * PairStats idiom, pointed at [[graft.text.Entity]]): how many variant
  * rows the deletion neighborhood emits, how many candidate pairs the
  * equality join yields pre/post distinct, and how many survive the DP —
  * the candidates-per-result ratio is the number that decides whether a
  * candidate strategy is working.
  *
  *   sbt "runMain graft.tools.EntityStats <sfDir> [maxDist]"
  */
object EntityStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxDist = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cust = Tables(spark, sfDir, "customer")
    val slim = cust.select(col("c_custkey").as("id"), col("c_name").as("s"),
      col("c_nationkey"))
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[entity] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val spread = slim.repartition(spark.sessionState.conf.numShufflePartitions)
    val variants = spread.select(col("id"), col("c_nationkey"),
      explode(graft.functions.TextExpressions
        .deletionNeighborhood(col("s"), maxDist)).as("vh"))
      .localCheckpoint()
    val nVar = timed("variant rows")(variants.count())
    timed("hot variant keys") {
      variants.groupBy(col("c_nationkey"), col("vh"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).limit(10).collect()
        .foreach(r => println(s"[entity]   hot: nation=${r.get(0)} n=${r.getLong(2)}"))
    }
    val va = variants.toDF("a_id", "c_nationkey", "vh")
    val vb = variants.toDF("b_id", "c_nationkey", "vh")
    val joined = va.join(vb, Seq("c_nationkey", "vh"))
      .filter(col("a_id") < col("b_id"))
    val nJoined = timed("joined (pre-distinct)")(joined.count())
    println(joined.queryExecution.executedPlan.toString.linesIterator
      .take(25).map("[entity-plan] " + _).mkString("\n"))
    val cands = joined.select(col("a_id"), col("b_id")).distinct()
      .localCheckpoint()
    val nCand = timed("candidates (distinct)")(cands.count())
    val verified = cands
      .join(slim.select(col("id").as("a_id"), col("s").as("a_s")), "a_id")
      .join(slim.select(col("id").as("b_id"), col("s").as("b_s")), "b_id")
      .withColumn("dist", graft.functions.TextExpressions
        .editDistanceWithin(col("a_s"), col("b_s"), maxDist))
      .filter(col("dist") >= 0)
    val nTrue = timed("verified pairs")(verified.count())
    println(f"[entity] variants/row = ${nVar.toDouble / slim.count()}%.1f, " +
      f"joined = $nJoined%d, candidates = $nCand%d, true = $nTrue%d, " +
      f"cand/true = ${nCand.toDouble / math.max(1, nTrue)}%.2f")
    spark.stop()
  }
}
