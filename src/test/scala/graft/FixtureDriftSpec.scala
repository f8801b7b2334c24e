package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.source.{ClickstreamSource, Tables}

/** Fixture-drift canary: open every `/root/testdata/sf*` directory through
  * `Tables` for all 10 tables and force a full-column aggregate on each.
  *
  * The driver regenerates the fixtures between rounds and has changed
  * physical encodings before (events.ts INT64-nanos → TIMESTAMP(MICROS)),
  * which broke the loader while every other spec — driven from synthetic
  * in-memory frames — stayed green. This suite reads the REAL fixtures, so
  * any schema/encoding drift fails here first instead of darkening the
  * driver's correctness run.
  */
class FixtureDriftSpec extends SparkSpec {

  private val sfDirs: Seq[File] = {
    val root = new File("/root/testdata")
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .sortBy(_.getName)
  }

  test("testdata root carries at least the three driver scale factors") {
    val names = sfDirs.map(_.getName).toSet
    assert(Set("sf0.001", "sf0.01", "sf0.1").subsetOf(names), s"found: $names")
  }

  for (dir <- sfDirs; name <- Tables.names) {
    test(s"${dir.getName}/$name loads through Tables and aggregates every column") {
      val df = Tables(spark, dir.getAbsolutePath, name)
      // count(col) per column forces a full-width scan: any column whose
      // physical encoding the loader mishandles throws here.
      val counts = df.select(df.columns.map(c => count(col(c)).as(c)).toSeq: _*)
        .collect().head
      assert(counts.getLong(0) > 0, s"$name is empty in ${dir.getName}")
    }
  }

  for (dir <- sfDirs) {
    test(s"${dir.getName}/events ts surfaces as TIMESTAMP and second-truncates") {
      val ev = Tables.events(spark, dir.getAbsolutePath)
      assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
        s"ts surfaced as ${ev.schema("ts").dataType}")
      // The oracle contract truncates to whole seconds (Registry.scala);
      // prove the truncation expression executes against the real fixture.
      val r = ev.agg(
          min(date_trunc("second", col("ts"))).as("lo"),
          max(date_trunc("second", col("ts"))).as("hi"))
        .collect().head
      assert(r.getTimestamp(0) != null && !r.getTimestamp(0).after(r.getTimestamp(1)))
    }
  }

  test("events file-stream twin decodes the smallest real fixture") {
    val stream = ClickstreamSource.eventsFileStream(spark, sfDir)
    assert(stream.isStreaming)
    val q = stream.groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("drift_canary")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    val rows = spark.sql("SELECT sum(count) AS n FROM drift_canary").collect().head.getLong(0)
    assert(rows > 0, "file stream produced no rows from the real fixture")
  }
}
