package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: every registered query at SPARK_GRAFT_SF_DIR, one
  * JSON line of per-query seconds. Queries are fully materialized through
  * the noop sink (count() could let Catalyst skip work). One warmup query
  * first — the first action pays JIT/codegen costs that would otherwise
  * land on whichever query runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup: one query per table family — lineitem (q1), embeddings +
    // vector kernels (emb_norms), documents + string paths (doc_quality),
    // events incl. the nanos read path (ev_top_types), orders + customer
    // (top_customers) — so the measured loop starts hot everywhere.
    materialize("q1_pricing_summary")
    materialize("emb_norms")
    materialize("doc_quality")
    materialize("ev_top_types")
    materialize("top_customers")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> materialize(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
