package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scan-amplification audit: executes registered queries and reports the
  * ACTUAL records read from source (task input metrics), versus what the
  * formatted plan's scan count suggests. Formatted explains can overstate
  * scans — AQE's stage cache dedupes canonically-identical exchanges at
  * runtime (`doc_bigram_lm` shows 3 scans in the plan but reads the
  * corpus twice: the self-reuse branches share one shuffle stage), and
  * that reuse is invisible at explain time. Usage:
  *
  *   sbt "runMain graft.tools.ReuseCheck <sfDir> <query> [query...]"
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("doc_bigram_lm")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val recordsRead = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        recordsRead.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    })
    names.foreach { n =>
      recordsRead.set(0)
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(1500) // listener events drain asynchronously
      val planScans = "Scan parquet".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
      println(s"[reuse] $n plan_scans=$planScans input_records=${recordsRead.get}")
    }
  }
}
