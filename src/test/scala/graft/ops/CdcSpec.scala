package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // (seq, key, op, val) — out-of-order arrival, hot key, tombstones
  private def log(parts: Int) = {
    import spark.implicits._
    Seq(
      (5L, 1L, "U", "e"), (1L, 1L, "I", "a"), (3L, 1L, "U", "c"),
      (2L, 1L, "U", "b"), (4L, 1L, "D", "-"),          // key 1: delete then update → survives as "e"
      (2L, 2L, "D", "-"), (1L, 2L, "I", "x"),          // key 2: last is delete → absent
      (1L, 3L, "I", "only"),                           // key 3: single insert
      (7L, 4L, "D", "-"), (6L, 4L, "U", "y"), (5L, 4L, "I", "z")
    ).toDF("seq", "key", "op", "v").repartition(parts)
  }

  test("applyChangelog: last writer wins, tombstones delete, no resurrection") {
    val out = Cdc.applyChangelog(log(4), keys = Seq("key"),
        ordering = Seq("seq"), isDelete = col("op") === "D")
      .select("key", "v").collect().map(r => r.getLong(0) -> r.getString(1))
      .sortBy(_._1)
    assert(out.toSeq == Seq(1L -> "e", 3L -> "only"),
      s"got ${out.toSeq}") // 2 and 4 end on tombstones
  }

  test("applyChangelog: ≡ window formulation, partition-invariant") {
    for (parts <- Seq(1, 3, 8)) {
      val df = log(parts)
      val got = Cdc.applyChangelog(df, Seq("key"), Seq("seq"),
          col("op") === "D")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
      val w = Window.partitionBy(col("key")).orderBy(col("seq").desc)
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D").drop("rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
      assert(got == want, s"diverged from window formulation at $parts partitions")
    }
  }

  test("applyChangelog: composite ordering breaks ts ties deterministically") {
    import spark.implicits._
    val df = Seq(
      (ts(10), 1L, 1L, "first"), (ts(10), 2L, 1L, "second"), // same ts, seq tiebreak
      (ts(9), 9L, 1L, "older-ts-higher-seq")
    ).toDF("t", "seq", "key", "v")
    val out = Cdc.applyChangelog(df, Seq("key"), Seq("t", "seq"),
        lit(false)).select("v").collect().map(_.getString(0))
    assert(out.toSeq == Seq("second"))
  }

  test("mergeCompacted: 3-batch fold ≡ one-shot; tombstones block resurrection") {
    import spark.implicits._
    val full = log(4)
    val batches = Seq(full.filter(col("seq") % 3 === 0),
      full.filter(col("seq") % 3 === 1), full.filter(col("seq") % 3 === 2))
    val folded = batches.tail.foldLeft(
        Cdc.compactedLog(batches.head, Seq("key"), Seq("seq"))) { (state, b) =>
      Cdc.mergeCompacted(state, b, Seq("key"), Seq("seq")).localCheckpoint()
    }
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("op") =!= "D")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(snap(folded) ==
      Cdc.applyChangelog(full, Seq("key"), Seq("seq"), col("op") === "D")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet,
      "incremental fold diverged from one-shot apply")

    // resurrection pin: delete (seq 5) lands first, LATE update (seq 3)
    // arrives in a later batch — the key must stay dead
    val b1 = Seq((5L, 9L, "D", "-")).toDF("seq", "key", "op", "v")
    val b2 = Seq((3L, 9L, "U", "late")).toDF("seq", "key", "op", "v")
    val state = Cdc.mergeCompacted(
      Cdc.compactedLog(b1, Seq("key"), Seq("seq")), b2, Seq("key"), Seq("seq"))
    assert(state.filter(col("op") =!= "D").count() == 0,
      "late older update resurrected a deleted key")
    assert(state.count() == 1, "tombstone must be retained in compacted state")
  }

  test("streaming foreachBatch fold converges to the batch snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, String)]
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.toDF().toDF("seq", "key", "op", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = state match {
          case None    => Cdc.compactedLog(batch, Seq("key"), Seq("seq"))
          case Some(s) => Cdc.mergeCompacted(s, batch, Seq("key"), Seq("seq"))
        }
        state = Some(next.localCheckpoint())
        ()
      }.start()
    try {
      stream.addData((1L, 1L, "I", "a"), (2L, 2L, "D", "-"), (5L, 4L, "I", "z"))
      q.processAllAvailable()
      stream.addData((5L, 1L, "U", "e"), (1L, 2L, "I", "x"), (7L, 4L, "D", "-"))
      q.processAllAvailable()
      stream.addData((4L, 1L, "D", "-"), (1L, 3L, "I", "only"), (6L, 4L, "U", "y"))
      q.processAllAvailable()
      val got = state.get.filter(col("op") =!= "D")
        .collect().map(r => r.getLong(1) -> r.getString(3)).sortBy(_._1)
      assert(got.toSeq == Seq(1L -> "e", 3L -> "only"),
        s"streaming fold diverged: ${got.toSeq}")
    } finally q.stop()
  }

  test("applyChangelog plan: aggregate, not a window sort") {
    val plan = Cdc.applyChangelog(log(4), Seq("key"), Seq("seq"),
      col("op") === "D").queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan, got:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      "changelog apply must not plan a window sort over the full feed")
  }

  test("cdcStream: versioned state folds exactly-once; in-loop vacuum GCs without resurrection") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cdc_stream_state").toString
    val statePath = s"$base/state"
    val batches = Seq(
      // key 9 dies at seq 1 — expired under the bound (seq < 2) → GC'd
      Seq((1L, 1L, "I", "a"), (2L, 2L, "I", "x"), (1L, 9L, "D", "-"), (3L, 2L, "D", "-")),
      Seq((5L, 1L, "U", "e"), (4L, 3L, "I", "z")),
      // late update UNDER key 2's seq-3 tombstone (in retention) → blocked
      Seq((2L, 2L, "U", "ghost")))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    var lastState = Set.empty[(Long, Long, String, String)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, String)](spark)
    val q = Cdc.cdcStream(input.toDF().toDF("seq", "key", "op", "v"),
        statePath, s"$base/ckpt", Seq("key"), Seq("seq"),
        isDelete = col("op") === "D",
        expiredFor = _ => col("seq") < 2L) { (state, _) =>
      lastState = key(state)
    }
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // ≡ one-shot fold + vacuum over the whole feed
    val oneShot = key(Cdc.vacuumTombstones(
      Cdc.compactedLog(batches.flatten.toDF("seq", "key", "op", "v"),
        Seq("key"), Seq("seq")),
      isDelete = col("op") === "D", expired = col("seq") < 2L))
    assert(lastState == oneShot, s"streamed state diverged:\n$lastState\nvs\n$oneShot")
    // semantics: key 9's expired tombstone GC'd; key 2's retained tombstone
    // blocked the late update; keys 1/3 carry their last writes
    assert(lastState == Set((5L, 1L, "U", "e"), (3L, 2L, "D", "-"), (4L, 3L, "I", "z")),
      lastState.toString)
    // version retention: predecessor kept for the redelivery window
    val vs = VersionedState.versions(spark, statePath).map(_._2)
    assert(vs == Seq(1L, 2L), vs.toString)
    // redelivery of the last batch: its own failed-attempt version is
    // invisible, the fold recomputes from v1 → identical state
    val redelivered = key(Cdc.streamFold(
      batches(2).toDF("seq", "key", "op", "v"), batchId = 2, statePath,
      Seq("key"), Seq("seq"), isDelete = col("op") === "D",
      expired = col("seq") < 2L))
    assert(redelivered == lastState, "redelivered fold diverged")
    assert(VersionedState.versions(spark, statePath).map(_._2) == Seq(1L, 2L))
  }

  test("mergeCompactedStationary: ≡ mergeCompacted; bucketed state folds exchange-free") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS cdc_stat_state")
      val standing = Cdc.compactedLog(log(4).filter(col("seq") % 2 === 0),
        Seq("key"), Seq("seq"))
      standing.write.bucketBy(4, "key").sortBy("key")
        .saveAsTable("cdc_stat_state")
      val batch = log(4).filter(col("seq") % 2 =!= 0)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      val got = Cdc.mergeCompactedStationary(spark.table("cdc_stat_state"),
        batch, Seq("key"), Seq("seq"))
      assert(rows(got) == rows(Cdc.mergeCompacted(standing, batch,
        Seq("key"), Seq("seq"))), "stationary fold diverged from union fold")
      // a redelivered IDENTICAL change (tie on the ordering) is a no-op
      val tie = Cdc.mergeCompactedStationary(spark.table("cdc_stat_state"),
        standing, Seq("key"), Seq("seq"))
      assert(rows(tie) == rows(standing), "tie did not keep the standing row")
      // the state side of the executed join must carry no Exchange —
      // its bucketed layout satisfies the join distribution; only the
      // batch side shuffles (its compaction + redistribution)
      val smjs = got.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty, got.queryExecution.executedPlan.toString)
      def exchanges(p: org.apache.spark.sql.execution.SparkPlan): Int = p.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      val sides = Seq(smjs.head.left, smjs.head.right).map(exchanges)
      assert(sides.count(_ == 0) == 1 && sides.count(_ > 0) == 1,
        s"expected exactly one exchange-free (state) side, got $sides:\n" +
          got.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS cdc_stat_state")
    }
  }

  test("vacuumTombstones: expired tombstones drop; retained ones still block resurrection") {
    import spark.implicits._
    // key 1 dies long before the bound (GC-able), key 2 dies inside the
    // retention window (must stay), key 3 never dies
    val log = Seq(
      (5L, 1L, "I", "a"), (10L, 1L, "D", "-"),
      (80L, 2L, "I", "x"), (90L, 2L, "D", "-"),
      (15L, 3L, "I", "keep")).toDF("seq", "key", "op", "v")
    val compacted = Cdc.compactedLog(log, Seq("key"), Seq("seq"))
    // lateness bound: no change with seq < 50 can arrive anymore
    val vac = Cdc.vacuumTombstones(compacted,
      isDelete = col("op") === "D", expired = col("seq") < 50L)
    assert(vac.filter(col("key") === 1L).count() == 0, "expired tombstone kept")
    assert(vac.filter(col("key") === 2L).filter(col("op") === "D").count() == 1,
      "in-retention tombstone vacuumed")
    assert(vac.filter(col("key") === 3L).count() == 1, "live row vacuumed")
    // a LATE update still inside retention (seq 85 < the key-2 tombstone's
    // 90) must keep hitting the retained tombstone — no resurrection
    val late = Seq((85L, 2L, "U", "ghost")).toDF("seq", "key", "op", "v")
    val snap = Cdc.mergeCompacted(vac, late, Seq("key"), Seq("seq"))
      .filter(col("op") =!= "D")
    assert(snap.filter(col("key") === 2L).count() == 0,
      "late update resurrected a deleted key through a retained tombstone")
  }

  test("vacuumTombstones: post-bound folds can't tell vacuumed from unvacuumed state") {
    import spark.implicits._
    // 200-change history over 17 keys, every 5th change a tombstone;
    // keys 0-4 go QUIET after seq 100, so their winners sit below the
    // bound — key 0's winner is the tombstone at seq 85, i.e. the GC
    // really bites (asserted below)
    val history = (1L to 200L)
      .filterNot(i => i % 17 < 5 && i > 100)
      .map(i => (i, i % 17, if (i % 5 == 0) "D" else "U", s"v$i"))
      .toDF("seq", "key", "op", "v")
    val compacted = Cdc.compactedLog(history, Seq("key"), Seq("seq"))
    val bound = 150L
    val vac = Cdc.vacuumTombstones(compacted,
      isDelete = col("op") === "D", expired = col("seq") < bound)
    assert(vac.count() < compacted.count(), "the GC removed nothing")
    // every post-bound batch folds to the IDENTICAL snapshot either way
    val batch = (201L to 260L)
      .map(i => (i, i % 13, if (i % 7 == 0) "D" else "U", s"b$i"))
      .toDF("seq", "key", "op", "v")
    def snap(state: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, String)] =
      Cdc.mergeCompacted(state, batch, Seq("key"), Seq("seq"))
        .filter(col("op") =!= "D")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
    assert(snap(vac) == snap(compacted), "vacuum changed a post-bound fold")
  }
}
