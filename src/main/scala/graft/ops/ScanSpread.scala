package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spread a scan whose ROW-GROUP COUNT caps parallelism: parquet decode
  * parallelism is bounded by row groups, not byte splits — Spark will
  * happily cut a one-row-group file into 3 byte ranges, but only the
  * range holding the row-group midpoint decodes anything, so every
  * operator until the first exchange runs on ONE task. Round-robin
  * repartition of the already-projected columns restores parallelism
  * for one narrow shuffle.
  *
  * Two guards keep this a local-fixture fix rather than a scale hazard:
  * inputs whose row groups already cover ≥ half the session's shuffle
  * partitions are untouched (at warehouse scale scans arrive in
  * thousands of row groups and the spread would be a pointless
  * full-table exchange — the `Entity.editDistancePairs` probePartitions
  * contract), and inputs under `floorBytes` are untouched because only
  * a decode that is expensive enough amortizes the shuffle. The right
  * floor depends on the CONSUMER: cheap scan-aggregates need ~8 MB of
  * decode to win (measured: spreading the 2 MB events table COST 0.5 s;
  * spreading the 10.8 MB lineitem file won 2× on the multi-distinct
  * profile), while kernel-heavy per-row stages (shingling, MinHash,
  * SimHash, sign-bit signatures) pay far more CPU per byte and win from
  * ~1 MB (measured at sf1 on the one-row-group 5.9 MB documents
  * fixture: simhash pairs 13.2 → 2.1 s, containment 37 → 25 s,
  * prefix-Jaccard 12 → 9 s). Non-file inputs (memory frames, already
  * shuffled plans) report no input files and pass through untouched.
  */
object ScanSpread {

  val DefaultFloor: Long = 8L * 1024 * 1024
  /** For kernel-heavy consumers: per-row CPU dominates decode cost. */
  val KernelFloor: Long = 1L * 1024 * 1024
  /** For WINDOW-HASH consumers (an md5 per sliding token position —
    * ~10× the tokenize kernel's CPU per byte): measured round-15 A/B at
    * sf0.1, spreading the 0.58 MB documents fixture wins ~20% for the
    * span family while the same spread REGRESSES the cheaper vector
    * kernels 2× (the 0.8 MB embeddings table stays under KernelFloor on
    * purpose — re-measured, not assumed, after the content-hash spread
    * removed the old sort tax).
    */
  val WindowHashFloor: Long = 256L * 1024

  // Footer row-group counts memoized per (path, size, mtime): every
  // registered kernel query calls spread() on the same fixture files,
  // and a ParquetFileReader.open per call per file is a driver-side
  // footer read that adds up (ADVICE r7). Keyed on size+mtime so a
  // regenerated fixture re-reads its footer. Only LOCAL files are
  // cached (ADVICE r8: for a non-file: scheme java.io.File reports
  // size 0 / mtime 0, which would pin the first footer read forever);
  // remote schemes fall through to Hadoop FileStatus each call. The
  // map is bounded: at MaxCacheEntries new keys are computed but not
  // inserted (ADVICE r9: the previous clear() dropped every live entry
  // at once — a thundering re-read — and raced concurrent readers).
  private val MaxCacheEntries = 1024
  private val rowGroupCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), java.lang.Integer]()

  /** A parquet URI as a local java.io.File, iff it IS local. Resolved
    * through java.net.URI so percent-encoded paths (e.g. %20) decode to
    * the real file (ADVICE r9: the raw-string form made File report
    * size 0 / mtime 0 for such paths, pinning the first footer read
    * forever — the same stale-cache class the r8 fix addressed for
    * remote schemes). Unparseable file: URIs fall back to non-cached.
    */
  private def localFile(uri: String): Option[java.io.File] =
    if (uri.startsWith("file:"))
      try Some(new java.io.File(java.net.URI.create(uri)))
      catch { case _: IllegalArgumentException => None }
    else if (!uri.contains(":")) Some(new java.io.File(uri))
    else None

  def spread(s: SparkSession, df: DataFrame,
             floorBytes: Long = DefaultFloor): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    // non-parquet inputs pass through: the row-group heuristic is
    // parquet-specific and the footer open would throw on other formats
    val files = df.inputFiles.filter(_.endsWith(".parquet"))
    if (files.isEmpty) return df
    def footerRowGroups(f: String): Int = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRowGroups.size finally r.close()
    }
    var bytes = 0L
    val rowGroups = files.map { f =>
      localFile(f) match {
        case Some(local) =>
          bytes += local.length
          val key = (f, local.length, local.lastModified)
          val hit = rowGroupCache.get(key)
          if (hit != null) hit.intValue
          else {
            val v = footerRowGroups(f)
            if (rowGroupCache.size < MaxCacheEntries)
              rowGroupCache.put(key, Int.box(v))
            v
          }
        case None =>
          val st = new org.apache.hadoop.fs.Path(f)
            .getFileSystem(conf).getFileStatus(new org.apache.hadoop.fs.Path(f))
          bytes += st.getLen
          footerRowGroups(f)
      }
    }.sum
    if (rowGroups * 2 < s.sessionState.conf.numShufflePartitions &&
        bytes > floorBytes) {
      val n = s.sessionState.conf.numShufflePartitions
      // Prefer CONTENT-hash partitioning over round-robin: a keyless
      // repartition(n) first sorts its input locally (SPARK-23207's
      // retry-determinism guard) — on the one decoding task this spread
      // exists to relieve, that sort is a serial pre-tax on every row.
      // Hashing the projected columns is deterministic under retry with
      // no sort, and every spread consumer feeds rows with a unique key
      // in them (doc_id / event_id / orderkey+linenumber), so the hash
      // spreads as evenly as round-robin. Frames carrying an unhashable
      // column (MapType) keep the round-robin path.
      def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
        case _: org.apache.spark.sql.types.MapType => false
        case st: org.apache.spark.sql.types.StructType =>
          st.fields.forall(f => hashable(f.dataType))
        case at: org.apache.spark.sql.types.ArrayType => hashable(at.elementType)
        case _ => true
      }
      if (df.schema.fields.forall(f => hashable(f.dataType)))
        df.repartition(n, df.columns.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(n)
    } else df
  }
}
