package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: does percentile_approx in its exact regime (accuracy ≥ N)
  * follow a SQL-expressible rank rule? Compares against candidate rules
  * over the sorted values per group.
  */
object GkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.source.Tables.events(spark, dir)
      .filter(col("value").isNotNull)
    val ps = Seq(0.5, 0.9, 0.99)
    val approx = ev.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), array(ps.map(lit): _*),
        lit(10000000)).as("qs"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getLong(2))).toMap
    // exact sorted values per group
    val sorted = ev.select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    for ((t, (qs, n)) <- approx.toSeq.sortBy(_._1)) {
      val vals = sorted(t)
      ps.zip(qs).foreach { case (p, got) =>
        // candidate rules (1-based rank into sorted):
        val rCeil = math.max(1, math.ceil(p * n).toInt)
        val rFloor1 = math.min(n.toInt, math.floor(p * n).toInt + 1)
        val rRound = math.max(1, math.round(p * (n - 1)).toInt + 1)
        def v(r: Int) = vals(r - 1)
        println(f"$t%-10s p=$p n=$n got=$got ceil(pn)=${v(rCeil)} floor(pn)+1=${v(rFloor1)} round(p(n-1))+1=${v(rRound)}")
      }
    }
    spark.stop()
  }
}
