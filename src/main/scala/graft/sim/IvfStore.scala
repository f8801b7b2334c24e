package graft.sim

import java.io.File

import org.apache.hadoop.fs.Path
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
  * Layout: `path/cluster=<cell>/__batch=<id>/part-*.parquet` — the batch
  * sub-partition is the redelivery discipline ([[graft.ops.StandingStore]]'s
  * `__batch` idiom applied to the cell store): [[append]] publishes with
  * DYNAMIC partition overwrite keyed by the batch id, so a redelivered
  * day-2 batch overwrites exactly its own `(cell, batch)` directories
  * instead of blind-appending duplicate vectors (which would surface as
  * duplicate `n_id` rows in every top-k). Readers see `__batch` as one
  * more partition column and ignore it; `cluster` stays the top-level
  * pruning key.
  *
  * Maintenance is SINGLE-WRITER and serving-quiesced: [[append]] and
  * [[splitCell]] assume no concurrent writer and that a trigger of
  * [[Ivf.servingStream]] does not list files mid-publish (the
  * [[Ivf.servingStream]] scaladoc carries the same contract).
  *
  * Like the other derived stores, the partitioned copy is written once per
  * (fixture, model tag, code version) under java.io.tmpdir (fixture dirs
  * are read-only) with an atomic-move publish; at deployment scale this is
  * the standing layout `Ivf.assign` appends into day over day.
  */
object IvfStore {

  private val lock = new Object

  /** Write `df` into the cell layout at `path` as batch `batchId`:
    * assignment computed scan-side, one file per touched
    * `(cell, batch)` directory (repartition by the partition columns —
    * the compacted serving layout). `mode` is "overwrite" for an
    * initial build (static: replaces the whole store), "append" for
    * raw day-2 batches without redelivery discipline — streaming
    * callers use [[append]] instead.
    */
  def writeCells(df: DataFrame, model: Ivf.IvfModel, path: String,
                 mode: String, batchId: Long = 0L,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): Unit =
    df.withColumn("cluster",
        element_at(VectorExpressions.nearestCentroids(
          col(vecCol), model.flat, model.k, model.dim, 1), 1))
      .withColumn("__batch", lit(batchId))
      .repartition(col("cluster"))
      .write.partitionBy("cluster", "__batch").mode(mode)
      .parquet(path)

  /** Day-2 index maintenance, the physical half of [[Ivf.assign]]: a
    * batch of new vectors lands IN the standing cell layout — one fused
    * assignment scan, one file per touched cell appended, the standing
    * directories never rewritten. [[Ivf.prunedSearch]] over the grown
    * store stays row-identical to a raw-table search over the grown
    * corpus, and partition pruning keeps working (IvfSpec pins both).
    *
    * Exactly-once under redelivery: the write is a DYNAMIC partition
    * overwrite keyed by `(cluster, __batch=batchId)` — a re-applied
    * batch replaces its own directories with identical content (the
    * assignment is deterministic), so double application cannot
    * duplicate vectors (IvfSpec pins append-twice ≡ append-once).
    * Callers must pass a stable per-batch id (the foreachBatch batch id)
    * — REQUIRED, no default: a defaulted id would make two successive
    * day-2 appends silently share `__batch`, turning the second's
    * dynamic overwrite into data loss of the first (ADVICE r12).
    */
  def append(batch: DataFrame, model: Ivf.IvfModel, path: String,
             batchId: Long,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): Unit =
    batch.withColumn("cluster",
        element_at(VectorExpressions.nearestCentroids(
          col(vecCol), model.flat, model.k, model.dim, 1), 1))
      .withColumn("__batch", lit(batchId))
      .repartition(col("cluster"))
      .write.partitionBy("cluster", "__batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)

  /** Cell REPAIR — the maintenance operator [[Ivf.cellHealth]]'s report
    * calls for when a cell's min-cosine sags (vectors drifting away
    * from their centroid) or its population outgrows its neighbors:
    * split the cell in two, touching ONLY that cell's directory.
    *
    * The split rule consumes the health signal directly: pole A is the
    * cell's existing centroid, pole B is the member vector with the
    * LOWEST cosine to it (the drifted pole — exactly the vector behind
    * the report's sagging `min_cos`; ties on ascending id). Members
    * re-assign to the nearer pole through the same fused
    * `nearestCentroids` kernel as every other assignment (||c||²−2·v·c,
    * ties to the lower index, i.e. the old centroid), so the split is
    * deterministic and — under a seed-vector model — SQL-replayable
    * (the `ann_cell_split` oracle). Optional `iters` Lloyd rounds
    * within the cell refine the two poles for production use (not
    * SQL-replayable; off by default).
    *
    * Physical contract: stage the two new cell directories, write a
    * COMMIT MARKER (dot-prefixed, invisible to readers), then swap —
    * delete `cluster=<cell>`, move `cluster=<cell>` and `cluster=<k>`
    * (the new cell takes the next free id) into place, delete the
    * marker last. Every other cell directory is untouched (IvfSpec
    * asserts the files-touched set), so a 100 TB store pays |cell|,
    * not |corpus|. The marker is the crash-window discipline of
    * [[graft.ops.VersionedState]] applied to the in-place swap: the
    * staging copy is COMPLETE before the marker exists, and the swap
    * is idempotent per half (staged dir present ⇒ replace target), so
    * a crash anywhere between the marker write and the marker delete
    * is recovered exactly by [[recoverSplits]] — no interleaving loses
    * a cell (previously a crash between the delete and the renames
    * silently dropped the cell from the serving tree, ADVICE r12).
    * [[splitCell]] runs recovery itself on entry, and
    * [[Ivf.servingStream]] runs it per trigger, so both the re-run
    * and the reader always see a committed snapshot. Single-writer,
    * serving quiesced during the swap instant (object scaladoc).
    *
    * The CENTROID TABLE's crash story is separate and already gated:
    * [[Ivf.save]] republishes under a `_SUCCESS` completeness check
    * ([[Ivf.trainOrLoad]] treats a half-written table as absent), and
    * callers publishing a grown model should write it to a FRESH
    * model-tagged path (the `ann_cell_split` chain does) — publish by
    * fresh name is atomic by construction.
    *
    * Returns the grown model: `cell` carries pole A (the old centroid
    * when `iters = 0`; the refined pole nearer it otherwise) and pole B
    * appends as centroid `k` — the poles the members were actually
    * assigned to, so store layout and model always agree. Callers
    * republish it via [[Ivf.save]] so serving probes both halves.
    */
  def splitCell(spark: SparkSession, path: String, model: Ivf.IvfModel,
                cell: Int, iters: Int = 0,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): Ivf.IvfModel = {
    require(cell >= 0 && cell < model.k, s"no such cell: $cell")
    // self-heal before reading: a crashed predecessor's committed swap
    // completes here, so the re-run sees the full store instead of
    // throwing "cell is empty" on a half-swapped tree
    recoverSplits(spark, path)
    val members = spark.read.parquet(path)
      .filter(col("cluster") === cell)
      .select(col(idCol), col(vecCol), col("__batch"))
    val centroid = model.centroids(cell)
    val cLit = {
      val s = spark
      import s.implicits._
      Seq(centroid.toSeq).toDF("__c")
    }
    // the drifted pole: ONE bounded collect (arg-min cosine, ties id
    // asc) — the IVF-centroid class of driver-side state
    val pole = members.crossJoin(broadcast(cLit))
      .select(col(idCol), col(vecCol),
        (Similarity.dot(col(vecCol), col("__c")) /
          (Similarity.l2Norm(col(vecCol)) * Similarity.l2Norm(col("__c"))))
          .as("cos"))
      .orderBy(col("cos"), col(idCol)).limit(1)
      .select(col(vecCol)).collect()
      .headOption.map(_.getSeq[Float](0).toArray.map(_.toDouble))
      .getOrElse(throw new IllegalStateException(s"cell $cell is empty"))
    var poles = Array(centroid, pole)
    if (iters > 0) {
      // in-cell Lloyd refinement: |cell|-sized scans, never the corpus
      val sub = Ivf.train(members.select(col(idCol), col(vecCol)), 2,
        model.dim, iters, idCol, vecCol)
      // Ivf.train makes no guarantee which refined pole lands at index 0,
      // but the RETAINED cell id keeps the old centroid in the published
      // model — so order the poles by distance to the old centroid
      // (nearer first) or the store layout and the model would disagree
      // and partial-probe recall silently degrades (ADVICE r12).
      def d2(a: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - centroid(i); s += d * d; i += 1 }
        s
      }
      poles = sub.centroids.sortBy(d2)
    }
    val reassigned = members.withColumn("cluster",
        when(element_at(VectorExpressions.nearestCentroids(
          col(vecCol), poles.flatten, 2, model.dim, 1), 1) === 0,
          lit(cell)).otherwise(lit(model.k)))
      .repartition(col("cluster"))
    // stage → commit-mark → swap → unmark: the staging write is a
    // complete copy of BOTH halves BEFORE the marker exists, so the
    // marker's presence certifies "the swap may be replayed from
    // staging"; recoverSplits replays it after any crash
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path,
      s".split_$cell.staging.${java.lang.ProcessHandle.current().pid()}")
    reassigned.write.partitionBy("cluster", "__batch")
      .mode("overwrite").parquet(staging.toString)
    val marker = new Path(path, s".split_commit_${cell}_${model.k}")
    val out = fs.create(marker, true)
    out.write(staging.getName.getBytes("UTF-8"))
    out.close()
    completeSwap(fs, root, staging, Seq(cell, model.k))
    fs.delete(marker, false)
    // publish the poles the members were actually assigned to: with
    // iters > 0 the retained cell's list sits around the REFINED pole
    // (poles(0), the one nearer the old centroid), and publishing the
    // stale centroid would degrade partial-probe recall (ADVICE r12);
    // iters = 0 keeps poles(0) == centroid, so the oracle replay of the
    // seed-pole split is bit-identical
    Ivf.IvfModel(model.centroids.updated(cell, poles(0)) :+ poles(1))
  }

  private val SplitMarkerRe = """\.split_commit_(\d+)_(\d+)""".r

  /** Replay one committed swap: for each half whose staged directory
    * still exists, replace the target cell directory with it; then drop
    * the staging root. Idempotent — a half already swapped has no
    * staged dir and is left alone — so any crash point inside the swap
    * replays to the same final tree.
    */
  private def completeSwap(fs: org.apache.hadoop.fs.FileSystem, root: Path,
                           staging: Path, cells: Seq[Int]): Unit = {
    cells.foreach { c =>
      val staged = new Path(staging, s"cluster=$c")
      if (fs.exists(staged)) {
        val target = new Path(root, s"cluster=$c")
        fs.delete(target, true)
        if (!fs.rename(staged, target))
          throw new java.io.IOException(s"cell-split publish failed: $target")
      }
    }
    fs.delete(staging, true)
  }

  /** Crash recovery for [[splitCell]]: complete every swap whose commit
    * marker survives. A marker exists only while its staging copy is
    * complete (written after staging, deleted after the swap), so
    * replaying [[completeSwap]] and dropping the marker restores the
    * committed snapshot from ANY crash point; markerless staging
    * debris (crash before commit) is left in place — dot-prefixed,
    * invisible to readers, and reclaimed by the next split of that
    * cell. One file listing when there is nothing to do. Runs inside
    * [[splitCell]] on entry and per [[Ivf.servingStream]] trigger;
    * standalone writers call it on startup.
    */
  def recoverSplits(spark: SparkSession, path: String): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).filter(e => !e.isDirectory).foreach { e =>
      e.getPath.getName match {
        case SplitMarkerRe(c, n) =>
          val stagingName = {
            val in = fs.open(e.getPath)
            try new String(
              org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
            finally in.close()
          }
          completeSwap(fs, root, new Path(root, stagingName),
            Seq(c.toInt, n.toInt))
          fs.delete(e.getPath, false)
        case _ =>
      }
    }
  }

  /** Ensure a cluster-partitioned copy of the embeddings table exists
    * under `model`'s assignment; returns its path. One file per cell
    * directory (repartition by the partition column) — the compacted
    * serving layout.
    */
  def cellPartitioned(spark: SparkSession, dir: String, model: Ivf.IvfModel,
                      tag: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): String = lock.synchronized {
    val (srcLen, srcMtime) = graft.ops.Materialize.inputStamp(
      spark, s"$dir/embeddings.parquet")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((s"$dir|ivf_cells|$tag|$srcLen|$srcMtime")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val path = new File(
      new File(sys.props("java.io.tmpdir"), "graft_partitioned"),
      s"ivf_cells_${key}_${graft.ops.Materialize.codeFingerprint.take(8)}")
    if (!path.exists()) {
      val staging = new File(path.getPath + ".staging." +
        java.lang.ProcessHandle.current().pid())
      writeCells(graft.source.Tables(spark, dir, "embeddings"), model,
        staging.getAbsolutePath, "overwrite", 0L, idCol, vecCol)
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
