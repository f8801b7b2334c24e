package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Layout
import graft.source.Tables

/** Physical I/O evidence for the z-order layout: writes the SAME events
  * under (a) the time-major layout and (b) z-order clustering, then runs
  * the same pushed-down predicates against both and reports the records
  * actually read (task input metrics → parquet row-group pruning via
  * min/max statistics, the mechanism file skipping uses at 100 TB).
  *
  * `ev_zorder_pruning` computes the file-count argument in-engine and is
  * oracle-checked; this audit closes the loop by showing the argument
  * holds for REAL parquet reads — records-read under a user-slice
  * predicate should drop by ~the file-pruning factor on the z-ordered
  * copy and not at all on the time-sorted copy.
  *
  * Usage: sbt "runMain graft.tools.ZorderIoAudit <sfDir> [outDir]"
  */
object ZorderIoAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/zorder_io_audit"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // one row group per ~1 MB so the small fixture still has enough
      // granularity for min/max pruning to show up in records-read
      .config("spark.hadoop.parquet.block.size", s"${1024 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val recordsRead = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        recordsRead.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    })

    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
    val b = ev.agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
      min("es").as("tlo"), max("es").as("thi")).collect()(0)
    val (ulo, uhi, tlo, thi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))

    val keyed = ev
      .withColumn("zx", Layout.quantize16(col("user_id"), lit(ulo), lit(uhi)))
      .withColumn("zy", Layout.quantize16(col("es"), lit(tlo), lit(thi)))
      .withColumn("z", Layout.zvalue16(col("zx"), col("zy")))

    // 64 files each (matching ev_zorder_pruning's grid) so each layout's
    // prefix carries 3 bits per clustered dimension
    // time-major layout: range-partitioned + sorted by event time
    keyed.repartitionByRange(64, col("es"), col("event_id"))
      .sortWithinPartitions(col("es"), col("event_id"))
      .drop("zx", "zy", "z")
      .write.mode("overwrite").parquet(s"$outDir/linear")
    // z-order layout: range-partitioned + sorted by the interleaved key
    keyed.repartitionByRange(64, col("z")).sortWithinPartitions(col("z"))
      .drop("zx", "zy", "z")
      .write.mode("overwrite").parquet(s"$outDir/zorder")

    // a user slice (1/8 of the id space) across all time, and a time
    // slice (1/8 of the span) across all users
    val uMid = ulo + (uhi - ulo) / 2
    val uHi8 = ulo + (uhi - ulo) / 8
    val tHi8 = tlo + (thi - tlo) / 8
    val cases = Seq(
      ("user_slice", (d: DataFrame) =>
        d.where(col("user_id") >= ulo && col("user_id") <= uHi8)),
      ("time_slice", (d: DataFrame) =>
        d.where(col("es") >= tlo && col("es") <= tHi8)),
      ("point_user", (d: DataFrame) => d.where(col("user_id") === uMid)))

    val total = spark.read.parquet(s"$outDir/linear").count()
    println(s"[zorder-io] total_rows=$total (layouts hold identical data)")
    for ((label, pred) <- cases; layout <- Seq("linear", "zorder")) {
      val df = pred(spark.read.parquet(s"$outDir/$layout"))
      recordsRead.set(0)
      val matched = df.agg(count(lit(1))).collect()(0).getLong(0)
      Thread.sleep(1200) // listener events drain asynchronously
      println(f"[zorder-io] $label%-10s $layout%-6s records_read=${recordsRead.get}%9d " +
        f"matched=$matched%8d read_amplification=${recordsRead.get.toDouble / math.max(1, matched)}%6.1fx")
    }
    spark.stop()
  }
}
