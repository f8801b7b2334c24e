package graft.ops

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The store layers' CRASH-WINDOW contracts, exercised directly: every
  * failure mode the scaladocs claim must degrade to "maintenance didn't
  * happen yet" — never to wrong rows. Leftover staging dirs are invisible
  * to the layout regexes, stale bases/versions lose to the newest
  * complete one, folded deltas at-or-below the marker are ignored, and
  * re-running the maintenance pass finishes the interrupted cleanup.
  */
class StandingStoreSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatches(root: String, n: Int): Unit =
    (0 until n).foreach { id =>
      Seq.tabulate(4)(i => (id * 10L + i, s"doc b$id r$i"))
        .toDF("doc_id", "text")
        .withColumn("__batch", lit(id.toLong))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch").parquet(root)
    }

  private def ids(root: String, exclude: Long = -1): Set[Long] =
    StandingStore.read(spark, root, exclude, Seq("doc_id", "text"))
      .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)

  test("compact folds old deltas into a base; readers see identical rows throughout") {
    val root = Files.createTempDirectory("ss_spec").resolve("store").toString
    writeBatches(root, 4)
    val before = ids(root)
    assert(before.size == 16)
    StandingStore.compact(spark, root, keepLast = 1)
    val l = StandingStore.layout(spark, root)
    assert(l.foldedThrough == 2L && l.deltas.map(_._2) == Seq(3L), l.toString)
    assert(ids(root) == before, "compaction changed row content")
    assert(ids(root, exclude = 3L) == before.filter(_ < 30L),
      "exclude-batch semantics broke across the base boundary")
    // idempotent: nothing left to fold
    StandingStore.compact(spark, root, keepLast = 1)
    assert(ids(root) == before)
  }

  test("crash leftovers are invisible: staging dirs, stale bases, folded deltas") {
    val root = Files.createTempDirectory("ss_spec").resolve("store").toString
    writeBatches(root, 4)
    val before = ids(root)
    StandingStore.compact(spark, root, keepLast = 1) // → __base_v0 (0..2)
    // simulate a crashed SECOND compaction: a staging dir full of junk
    val staging = new File(root, "__base_v1.staging.9999")
    staging.mkdirs()
    Files.write(staging.toPath.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    assert(ids(root) == before, "a staging leftover leaked into reads")
    // simulate a crash AFTER a newer base published but BEFORE cleanup:
    // plant base v1 (folded through 3) while v0 and delta 3 still exist
    writeBatches(s"$root.tmp", 4)
    StandingStore.compact(spark, s"$root.tmp", keepLast = 1)
    val v1 = new File(root, "__base_v1")
    spark.read.parquet(root + "/__batch=3").unionByName(
        spark.read.parquet(new File(root, "__base_v0").toString))
      .write.parquet(v1.toString + ".stage")
    Files.createFile(new File(v1.toString + ".stage", "_folded_through_3").toPath)
    assert(new File(v1.toString + ".stage").renameTo(v1))
    // highest complete base wins; the stale v0 and the ≤-marker delta are ignored
    val l = StandingStore.layout(spark, root)
    assert(l.base.map(_._2).contains(1L) && l.foldedThrough == 3L, l.toString)
    assert(ids(root) == before, "stale base/delta leaked after a newer publish")
    // re-running maintenance finishes the interrupted cleanup
    StandingStore.compact(spark, root, keepLast = 1)
    assert(!new File(root, "__base_v0").exists(), "stale base not cleaned")
    assert(ids(root) == before)
  }

  test("a markerless (partial-copy) base or state version is never served") {
    // an S3A "rename" is copy+delete: a crash mid-move leaves a real dir
    // with real files but NO completeness marker — readers must skip it
    // and the next maintenance/publish pass must clear and retry it
    val root = Files.createTempDirectory("ss_partial").resolve("store").toString
    writeBatches(root, 4)
    val before = ids(root)
    StandingStore.compact(spark, root, keepLast = 1) // → __base_v0 complete
    // plant a PARTIAL __base_v1: wrong rows, no _folded_through marker
    Seq((999L, "partial copy")).toDF("doc_id", "text")
      .write.parquet(new File(root, "__base_v1").toString)
    val l = StandingStore.layout(spark, root)
    assert(l.base.map(_._2).contains(0L),
      s"markerless base v1 was treated as complete: $l")
    assert(ids(root) == before, "partial base leaked into reads")
    // the next compact clears the partial dir (version number reusable)
    StandingStore.compact(spark, root, keepLast = 1)
    assert(!new File(root, "__base_v1").exists(), "partial base not cleared")
    assert(ids(root) == before)

    // VersionedState: same window — a markerless version is invisible,
    // and the redelivered publish clears and republishes it
    val vroot = Files.createTempDirectory("vs_partial").resolve("state").toString
    val s0 = Seq((1L, "a")).toDF("k", "v")
    val s1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    VersionedState.publish(s0, vroot, version = 0)
    Seq((777L, "partial")).toDF("k", "v")
      .write.parquet(new File(vroot, "__state_v1").toString)
    assert(VersionedState.versions(spark, vroot).map(_._2) == Seq(0L),
      "markerless state version listed as complete")
    assert(VersionedState.latestBelow(spark, vroot, below = 2)
      .map(_.collect().map(_.getLong(0)).toSet).contains(Set(1L)),
      "reader served the partial copy")
    VersionedState.publish(s1, vroot, version = 1)
    assert(VersionedState.versions(spark, vroot).map(_._2) == Seq(0L, 1L))
    assert(VersionedState.latestBelow(spark, vroot, below = 2)
      .map(_.collect().map(_.getLong(0)).toSet).contains(Set(1L, 2L)),
      "republish did not replace the partial copy")
  }

  test("VersionedState: publish is idempotent, latestBelow hides own/failed versions") {
    val root = Files.createTempDirectory("vs_spec").resolve("state").toString
    val s0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val s1 = Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("k", "v")
    VersionedState.publish(s0, root, version = 0)
    VersionedState.publish(s1, root, version = 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // batch 1 redelivery must read v0, not its own failed publish
    assert(VersionedState.latestBelow(spark, root, below = 1).map(rows)
      .contains(rows(s0)))
    assert(VersionedState.latestBelow(spark, root, below = 2).map(rows)
      .contains(rows(s1)))
    assert(VersionedState.latestBelow(spark, root, below = 0).isEmpty)
    // republishing an existing version is a no-op (content untouched)
    VersionedState.publish(Seq((9L, "junk")).toDF("k", "v"), root, version = 1)
    assert(VersionedState.latestBelow(spark, root, below = 2).map(rows)
      .contains(rows(s1)), "republish overwrote a committed version")
    // retention: publishing v2 keeps exactly the newest keepVersions
    VersionedState.publish(s1, root, version = 2, keepVersions = 2)
    assert(VersionedState.versions(spark, root).map(_._2) == Seq(1L, 2L))
    // a crashed publish leaves only staging: invisible to versions()
    val staging = new File(root, "__state_v3.staging.9999")
    staging.mkdirs()
    assert(VersionedState.versions(spark, root).map(_._2) == Seq(1L, 2L))
  }
}
