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
  *    (invisible to the version regex); after rename but before cleanup,
  *    stale old versions linger and are ignored (highest-below wins);
  *    cleanup keeps the newest `keepVersions` so the redelivery read
  *    always has its predecessor.
  *
  * All FS resolution is Hadoop-scheme-correct (HDFS/S3 at deployment
  * scale), same as [[StandingStore]].
  */
object VersionedState {

  private val VerRe = """__state_v(\d+)""".r

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (dir, version) pairs present under `root`, ascending by version. */
  def versions(spark: SparkSession, root: String): Seq[(Path, Long)] = {
    val fs = fsOf(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return Nil
    fs.listStatus(rootPath).filter(_.isDirectory).flatMap { st =>
      st.getPath.getName match {
        case VerRe(v) => Some((st.getPath, v.toLong))
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
    if (!fs.exists(target)) {
      val staging = new Path(root,
        s"__state_v$version.staging.${java.lang.ProcessHandle.current().pid()}")
      df.write.mode("overwrite").parquet(staging.toString)
      if (!fs.rename(staging, target)) {
        fs.delete(staging, true)
        if (!fs.exists(target))
          throw new java.io.IOException(s"state publish failed: $target")
      }
    }
    versions(spark, root).dropRight(keepVersions)
      .foreach { case (p, _) => fs.delete(p, true) }
  }
}
