package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot store for streaming STATE (the CDC compacted log):
  * each micro-batch publishes the whole next state under
  * `root/__state_v<batchId>`, readers take the highest version STRICTLY
  * BELOW their batch id, and the previous version is retained for the
  * redelivery window. This is the state-table counterpart of
  * [[StandingStore]]'s append-only layout: appends suit stores that only
  * GROW (pair-family fingerprints), while a compacted log REWRITES per
  * fold — so correctness comes from whole-version atomic publish instead
  * of partition overwrite:
  *
  *  - exactly-once: a redelivered batch reads `latestBelow(batchId)` —
  *    its OWN version (published by the failed attempt) is invisible, so
  *    it recomputes from the same input state; the deterministic fold
  *    republishes identical content, and the existing-version publish is
  *    a no-op.
  *  - crash windows: a crash before rename leaves only a `.staging` dir
  *    (invisible to the version regex); a crash DURING a non-atomic
  *    rename (S3A renames are copy+delete) leaves a partial version dir
  *    with no `_PUBLISHED` marker — the marker is created only AFTER
  *    the move completes, so readers never see the partial copy and the
  *    redelivered batch deletes and republishes it; after the marker
  *    but before cleanup, stale old versions linger and are ignored
  *    (highest-below wins); cleanup keeps the newest `keepVersions` so
  *    the redelivery read always has its predecessor.
  *
  * All FS resolution is Hadoop-scheme-correct (HDFS/S3 at deployment
  * scale), same as [[StandingStore]]. Single writer per root (the
  * streaming-query contract — one foreachBatch owns the state).
  */
object VersionedState {

  private val VerRe = """__state_v(\d+)""".r
  // no "=" in the marker name — see StandingStore.MarkerRe
  private[ops] val Marker = "_PUBLISHED"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (dir, version) pairs of COMPLETE versions under `root` (marker
    * present — partial non-atomic-rename copies are invisible),
    * ascending by version.
    */
  def versions(spark: SparkSession, root: String): Seq[(Path, Long)] = {
    val fs = fsOf(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return Nil
    fs.listStatus(rootPath).filter(_.isDirectory).flatMap { st =>
      st.getPath.getName match {
        case VerRe(v) if fs.exists(new Path(st.getPath, Marker)) =>
          Some((st.getPath, v.toLong))
        case _ => None
      }
    }.sortBy(_._2).toIndexedSeq
  }

  /** The newest state version strictly below `below` — the input state
    * of batch `below`. None ⇔ no predecessor (first batch).
    */
  def latestBelow(spark: SparkSession, root: String,
                  below: Long): Option[DataFrame] =
    versions(spark, root).filter(_._2 < below).lastOption
      .map { case (p, _) => spark.read.parquet(p.toString) }

  /** Atomically publish `df` as version `version`; keep the newest
    * `keepVersions` versions and best-effort delete the rest. Publishing
    * an already-existing version is a no-op (redelivery republish).
    */
  def publish(df: DataFrame, root: String, version: Long,
              keepVersions: Int = 2): Unit = {
    require(keepVersions >= 2,
      "must retain the predecessor version for the redelivery window")
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    val target = new Path(root, s"__state_v$version")
    val marker = new Path(target, Marker)
    if (!fs.exists(marker)) {
      // a markerless target is a partial copy from a crashed non-atomic
      // rename (single-writer contract: no concurrent publisher owns it)
      if (fs.exists(target)) fs.delete(target, true)
      val staging = new Path(root,
        s"__state_v$version.staging.${java.lang.ProcessHandle.current().pid()}")
      df.write.mode("overwrite").parquet(staging.toString)
      if (!fs.rename(staging, target)) {
        fs.delete(staging, true)
        if (!fs.exists(marker))
          throw new java.io.IOException(s"state publish failed: $target")
      }
      // completeness gate: created only after the whole move landed, so
      // versions() can never serve a partially copied state
      else fs.create(marker, true).close()
    }
    versions(spark, root).dropRight(keepVersions)
      .foreach { case (p, _) => fs.delete(p, true) }
  }
}
