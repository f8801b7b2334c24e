package graft.sim

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Cell-partitioned inverted-file LAYOUT for a vector store — the physical
  * half of IVF serving that [[Ivf.search]]'s logical bucket join leaves on
  * the table: one directory per centroid cell, so an online query that
  * probes `nProbe` of `k` cells READS `nProbe/k` of the bytes instead of
  * scanning the corpus and filtering. At 100 TB this is the difference
  * between an ANN lookup costing a corpus scan and costing a few inverted
  * lists — the same partition-pruning physics as
  * [[graft.ops.DatePartitioned]] (whose DPP machinery the pruned search
  * reuses: the probe set exists only at runtime, as the output of the
  * query-side assignment, so pruning is injected dynamically from the
  * broadcast probe frame).
  *
  * Like the other derived stores, the partitioned copy is written once per
  * (fixture, model tag, code version) under java.io.tmpdir (fixture dirs
  * are read-only) with an atomic-move publish; at deployment scale this is
  * the standing layout `Ivf.assign` appends into day over day.
  */
object IvfStore {

  private val lock = new Object

  /** Write `df` into the cell layout at `path`: assignment computed
    * scan-side, one file per touched cell directory (repartition by the
    * partition column — the compacted serving layout). `mode` is
    * "overwrite" for an initial build, "append" for day-2 batches.
    */
  def writeCells(df: DataFrame, model: Ivf.IvfModel, path: String,
                 mode: String,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): Unit =
    df.withColumn("cluster",
        element_at(VectorExpressions.nearestCentroids(
          col(vecCol), model.flat, model.k, model.dim, 1), 1))
      .repartition(col("cluster"))
      .write.partitionBy("cluster").mode(mode)
      .parquet(path)

  /** Day-2 index maintenance, the physical half of [[Ivf.assign]]: a
    * batch of new vectors lands IN the standing cell layout — one fused
    * assignment scan, one file per touched cell appended, the standing
    * directories never rewritten. [[Ivf.prunedSearch]] over the grown
    * store stays row-identical to a raw-table search over the grown
    * corpus, and partition pruning keeps working (IvfSpec pins both).
    */
  def append(batch: DataFrame, model: Ivf.IvfModel, path: String,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): Unit =
    writeCells(batch, model, path, "append", idCol, vecCol)

  /** Ensure a cluster-partitioned copy of the embeddings table exists
    * under `model`'s assignment; returns its path. One file per cell
    * directory (repartition by the partition column) — the compacted
    * serving layout.
    */
  def cellPartitioned(spark: SparkSession, dir: String, model: Ivf.IvfModel,
                      tag: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): String = lock.synchronized {
    val src = new File(dir, "embeddings.parquet")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((s"$dir|ivf_cells|$tag|${src.length}|${src.lastModified}")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val path = new File(
      new File(sys.props("java.io.tmpdir"), "graft_partitioned"),
      s"ivf_cells_${key}_${graft.ops.Materialize.codeFingerprint.take(8)}")
    if (!path.exists()) {
      val staging = new File(path.getPath + ".staging." +
        java.lang.ProcessHandle.current().pid())
      writeCells(graft.source.Tables(spark, dir, "embeddings"), model,
        staging.getAbsolutePath, "overwrite", idCol, vecCol)
      try java.nio.file.Files.move(staging.toPath, path.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException |
                   _: java.nio.file.FileSystemException =>
        // lost a cross-process race: discard ours, serve the winner
        org.apache.commons.io.FileUtils.deleteQuietly(staging)
        require(path.exists(), s"cell-store publish failed: $path")
      }
    }
    path.getAbsolutePath
  }
}
