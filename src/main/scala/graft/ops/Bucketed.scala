package graft.ops

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-hash-partition a table on its join key at
  * WRITE time so every later join on that key runs with ZERO shuffle.
  *
  * This is the storage-side answer to the question the per-query planner
  * can't fix: a 100 TB fact table joined on the same key by every
  * downstream query pays a full-table hash exchange per query — unless the
  * table is stored already clustered by that key. `bucketBy(n, k)` writes
  * each file pre-partitioned by `hash(k) % n` and records the layout in
  * the catalog; a join of two tables bucketed on the join key with the
  * same bucket count satisfies both sides' `HashClusteredDistribution`
  * from the scan itself, so the sort-merge join plans with NO
  * `Exchange` on either side (`BucketingSpec` asserts exactly this),
  * and `sortBy` additionally pre-sorts each bucket file so the per-bucket
  * sort is a cheap merge. One write-time shuffle, amortized over every
  * consumer — the same once-per-pipeline economics as
  * [[Materialize]], applied to the physical layout instead of a derived
  * relation.
  *
  * The registered query `bucketed_orders_revenue` proves the layout is
  * semantics-preserving: the revenue rollup computed entirely through the
  * bucketed copies hash-matches the DuckDB oracle computed on the raw
  * parquet.
  *
  * Bucketed tables live in the session catalog (the bucket spec is
  * catalog metadata, not parquet metadata), with data under an external
  * path in java.io.tmpdir — fixture dirs are read-only. Within one JVM the
  * write happens once per (dir, table); reruns reuse the catalog entry.
  */
object Bucketed {

  private val lock = new Object

  /** Session-unique table name for (sfDir, table) — bench/verify sessions
    * open multiple sf dirs, and test sessions open synthetic ones.
    */
  private def tableName(dir: String, table: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$table".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"graft_bucketed_${table}_$key"
  }

  /** Ensure a bucketed copy of `df` is registered as a catalog table;
    * returns the table name. Bucket count is a WRITE-TIME contract: both
    * sides of a co-located join must use the same `nBuckets` (and at
    * scale it is sized so one bucket of the big table fits an executor —
    * e.g. 4096 buckets for a 100 TB fact table ≈ 25 GB/bucket).
    */
  def ensure(spark: SparkSession, dir: String, table: String,
             bucketCol: String, nBuckets: Int)
            (df: => DataFrame): String = lock.synchronized {
    val name = tableName(dir, table)
    if (!spark.catalog.tableExists(name)) {
      val path = new File(
        new File(sys.props("java.io.tmpdir"), "graft_bucketed"),
        name + "_" + Materialize.codeFingerprint.take(8))
      // A half-written path from a killed run would fail the CREATE;
      // overwrite mode below replaces it atomically enough for a local
      // store (the catalog entry is only published after the write).
      // Pre-partition on the bucket expression (same Murmur3 hash the
      // bucketing layer uses) so each bucket lands in exactly ONE file —
      // the layout under which Spark can also trust per-bucket sort
      // order. Without it every write task emits a file per bucket it
      // sees: nBuckets × tasks small files and no usable sort.
      df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
        .write
        .bucketBy(nBuckets, bucketCol)
        .sortBy(bucketCol)
        .option("path", path.getAbsolutePath)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    }
    name
  }

  /** The co-located join pair for the TPC-H-ish fixtures: orders and
    * lineitem, both bucketed on the order key. Returns the two catalog
    * table names, writing the bucketed copies on first use.
    */
  def ordersLineitem(spark: SparkSession, dir: String,
                     nBuckets: Int = 8): (String, String) = {
    val o = ensure(spark, dir, "orders", "o_orderkey", nBuckets)(
      graft.source.Tables(spark, dir, "orders"))
    val l = ensure(spark, dir, "lineitem", "l_orderkey", nBuckets)(
      graft.source.Tables(spark, dir, "lineitem"))
    (o, l)
  }
}
