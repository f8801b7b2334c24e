package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The batch-partitioned standing store behind the incremental pair
  * streams ([[graft.text.Dedup.incrementalStreamStep]]): each micro-batch
  * appends one `__batch=<id>` partition, and every batch probes the union
  * of all OTHER batches. Two pieces of table maintenance keep that layout
  * viable past toy stream lengths:
  *
  *  - '''FS-agnostic resolution.''' All existence/listing/publish goes
  *    through Hadoop's `FileSystem` API resolved from the path's own
  *    scheme — at 100 TB the store lives on HDFS/S3, and a
  *    `java.io.File` probe (the round-10 shape) silently reports a
  *    remote store as absent, turning every batch into "first batch"
  *    and re-emitting old pairs.
  *  - '''Compaction.''' A long stream accretes one tiny parquet
  *    partition per trigger — the small-files failure [[Compact]]
  *    documents (a scan pays a task + footer read per file). [[compact]]
  *    folds all batches older than the redelivery horizon into a single
  *    bounded-file-count base snapshot, published atomically under a
  *    VERSIONED name so no reader ever sees a half state:
  *
  *    {{{
  *    root/__base_v3/            # highest version wins
  *      _folded_through_41       # marker: batches ≤ 41 live here
  *      part-*.parquet           # ~targetBytes files
  *    root/__batch=42/           # deltas newer than the marker
  *    root/__batch=43/
  *    }}}
  *
  *    Readers take the highest COMPLETE base version (marker present)
  *    and ignore both stale bases and delta partitions at-or-below its
  *    marker, so every crash window degrades to "compaction didn't
  *    happen yet": a crash before the rename leaves only a `.staging`
  *    dir (invisible to the layout regexes); a crash DURING a
  *    non-atomic rename (S3A renames are copy+delete) leaves a partial
  *    base dir with no marker — the marker is created only AFTER the
  *    move completes, so readers skip the partial copy and the next
  *    [[compact]] clears and retries it; a crash after the marker but
  *    before cleanup leaves folded deltas and the previous base on
  *    disk, both excluded by the marker/version rules, and re-running
  *    [[compact]] finishes the cleanup. Exactly-once redelivery survives because
  *    only the LATEST batch is ever redelivered (the foreachBatch
  *    replay contract) and `keepLast ≥ 1` keeps it out of every fold.
  */
object StandingStore {

  private val BaseRe = """__base_v(\d+)""".r
  private val DeltaRe = """__batch=(\d+)""".r
  // no "=" in the marker name: Spark's hidden-file filter skips
  // "_"-prefixed files EXCEPT those containing "=" (the
  // underscore-named-partition-dir exception), so an "="-style marker
  // would be read as a parquet footer by spark.read.parquet(base)
  private val MarkerRe = """_folded_through_(-?\d+)""".r

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Resolved store state: the winning base (dir, version, folded-through
    * batch id) if any, plus the delta partitions NEWER than its marker.
    */
  final case class Layout(base: Option[(Path, Long, Long)],
                          deltas: Seq[(Path, Long)]) {
    def foldedThrough: Long = base.map(_._3).getOrElse(-1L)
  }

  def layout(spark: SparkSession, root: String): Layout = {
    val fs = fsOf(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return Layout(None, Nil)
    val dirs = fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
    // the marker is created only AFTER the staging→target move (see
    // compact), so a base without one is a partial copy from a crashed
    // NON-ATOMIC rename (S3A): skip it — readers fall back to the
    // previous complete base + its deltas, i.e. "compaction didn't
    // happen yet", never a partial base plus already-folded deltas
    val base = dirs.flatMap { p =>
      p.getName match {
        case BaseRe(v) =>
          fs.listStatus(p).map(_.getPath.getName).collectFirst {
            case MarkerRe(id) => (p, v.toLong, id.toLong)
          }
        case _ => None
      }
    }.sortBy(-_._2).headOption
    val ft = base.map(_._3).getOrElse(-1L)
    val deltas = dirs.flatMap { p =>
      p.getName match {
        case DeltaRe(id) if id.toLong > ft => Some((p, id.toLong))
        case _ => None
      }
    }.sortBy(_._2)
    Layout(base, deltas.toIndexedSeq)
  }

  /** All standing rows except batch `excludeBatch`, projected to `cols`
    * (delta partitions store exactly the batch frame's columns; the
    * `__batch` id lives in the directory name, never in the files).
    * None ⇔ the store is empty — first batch of a stream.
    */
  def read(spark: SparkSession, root: String, excludeBatch: Long,
           cols: Seq[String]): Option[DataFrame] = {
    val l = layout(spark, root)
    val proj = cols.map(col)
    val basePart = l.base.map { case (p, _, _) =>
      spark.read.parquet(p.toString).select(proj: _*)
    }
    val deltaDirs = l.deltas.collect { case (p, id) if id != excludeBatch => p.toString }
    val deltaPart =
      if (deltaDirs.isEmpty) None
      else Some(spark.read.parquet(deltaDirs: _*).select(proj: _*))
    (basePart.toSeq ++ deltaPart.toSeq).reduceOption(_ unionByName _)
  }

  /** Fold every delta older than the last `keepLast` batch ids into a new
    * base snapshot of ~`targetBytes` files (see the object scaladoc for
    * the publish protocol). No-op when there is nothing to fold. The
    * rewrite is one round-robin repartition sized from the INPUT bytes —
    * [[Compact]]'s bin-packing arithmetic — and row content is untouched
    * (CorpusStreamSpec proves pair output is identical across the
    * compaction boundary).
    */
  def compact(spark: SparkSession, root: String, keepLast: Int = 1,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    require(keepLast >= 1,
      "the latest batch may be redelivered — it must never fold into the base")
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = fsOf(spark, root)
    val l = layout(spark, root)
    // finish any INTERRUPTED cleanup first: a crash after a base publish
    // leaves the previous base and its folded deltas on disk — invisible
    // to readers (version/marker rules) but dead weight; without this
    // sweep a store whose newest fold left nothing further to fold would
    // carry them forever (the early return below)
    l.base.foreach { case (_, v, ft) =>
      fs.listStatus(new Path(root)).filter(_.isDirectory).map(_.getPath)
        .foreach { p =>
          p.getName match {
            case BaseRe(bv) if bv.toLong < v => fs.delete(p, true)
            // a base at-or-above the winner without a marker is a
            // partial copy from a crashed rename (layout skipped it);
            // remove it so its version number is free for the next
            // publish (single-writer contract: nobody else owns it)
            case BaseRe(bv) if bv.toLong >= v &&
              !fs.listStatus(p).map(_.getPath.getName)
                .exists(MarkerRe.matches) => fs.delete(p, true)
            case DeltaRe(id) if id.toLong <= ft => fs.delete(p, true)
            case _ => ()
          }
        }
    }
    if (l.deltas.isEmpty) return
    val maxId = l.deltas.map(_._2).max
    val fold = l.deltas.filter(_._2 <= maxId - keepLast)
    if (fold.isEmpty) return
    val newFt = fold.map(_._2).max
    val newV = l.base.map(_._2 + 1).getOrElse(0L)
    val sources = l.base.map(_._1).toSeq ++ fold.map(_._1)
    val bytes = sources.map(p => fs.getContentSummary(p).getLength).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val target = new Path(root, s"__base_v$newV")
    // a markerless dir already at this version is a partial copy from a
    // crashed non-atomic rename (single-writer contract: nobody else
    // owns it) — clear it so the version number is reusable
    if (fs.exists(target) &&
        !fs.listStatus(target).map(_.getPath.getName).exists(MarkerRe.matches))
      fs.delete(target, true)
    val staging = new Path(root,
      s"__base_v$newV.staging.${java.lang.ProcessHandle.current().pid()}")
    spark.read.parquet(sources.map(_.toString): _*)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(staging, target)) {
      // single-writer: a failed move means the publish did not happen —
      // surface it rather than silently keeping the small files (the
      // Compact rationale). The folded sources are untouched, so the
      // store still reads correctly and a re-run retries the fold.
      fs.delete(staging, true)
      throw new java.io.IOException(s"standing-store publish failed: $target")
    }
    // completeness gate, created only after the whole move landed: on a
    // copy+delete "rename" (S3A) a crash mid-move leaves a markerless
    // partial dir that layout() skips — readers degrade to the previous
    // base + unfolded deltas, never a partial base
    fs.create(new Path(target, s"_folded_through_$newFt"), true).close()
    // best-effort cleanup; leftovers are invisible to layout() and a
    // re-run finishes the job
    (l.base.map(_._1).toSeq ++ fold.map(_._1)).foreach(fs.delete(_, true))
  }
}
