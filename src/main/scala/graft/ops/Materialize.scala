package graft.ops

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized-intermediate store: compute an expensive deterministic
  * intermediate ONCE per (inputs, config, code version), persist it as
  * parquet, and let every later consumer read the stored copy.
  *
  * This is the table-valued generalization of the train-once model stores
  * (`Ivf.trainOrLoad`, `Pq.trainOrLoad`): a real 100 TB curation pipeline
  * materializes its near-dup pair graph / dup-group labels once and runs
  * groups, survivor selection, and graph audits off the stored relation —
  * re-deriving an O(n·candidates) pair join per consumer would multiply
  * the most expensive stage of the whole pipeline by the number of
  * downstream queries. Locally the same reuse serves `graft.Bench` and
  * `graft.Verify`, which execute each registered query independently.
  *
  * Correctness contract: the builder must be DETERMINISTIC in its inputs
  * (every registered intermediate here is — the pair pipelines are exact,
  * ordered, and partition-invariant), and `fingerprintFiles` must cover
  * every input file the intermediate depends on. The store key hashes
  * (tag, file lengths, file mtimes, CODE fingerprint): a regenerated
  * fixture rebuilds instead of serving stale rows, a missing input throws
  * instead of silently fingerprinting as absent, and any recompile of the
  * library invalidates the store — so a kernel change can never make
  * `Verify` validate output of the PREVIOUS kernel. Parquet round-trips
  * every type used bit-exactly (the `Ivf.save/load` precedent,
  * spec-pinned there).
  */
object Materialize {

  /** Serializes builders so concurrently-running specs cannot double-build
    * one path; queries in Bench/Verify run sequentially and never wait.
    * Cross-PROCESS races are handled by the atomic publish in [[cached]].
    */
  private val lock = new Object

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Store root under java.io.tmpdir — fixture dirs are read-only. */
  private def storeDir: File =
    new File(sys.props("java.io.tmpdir"), "graft_materialized")

  /** Fingerprint of the library code itself, folded into every store key
    * so a recompiled kernel never reads a stale materialization. Resolved
    * from wherever this class was loaded: a jar → the jar's
    * (path, length, mtime); a classes directory (sbt) → every .class file
    * under it as (relative path, length, mtime). Computed once per JVM —
    * the store is for cross-query/cross-run reuse, and within one JVM the
    * code cannot change.
    */
  lazy val codeFingerprint: String = {
    val res = getClass.getResource(
      "/" + getClass.getName.replace('.', '/') + ".class")
    val fp = res.getProtocol match {
      case "jar" =>
        // jar:file:/path/to/lib.jar!/graft/ops/Materialize.class
        val jarPath = res.getPath.stripPrefix("file:").takeWhile(_ != '!')
        val f = new File(java.net.URLDecoder.decode(jarPath, "UTF-8"))
        s"jar|${f.getPath}|${f.length}|${f.lastModified}"
      case "file" =>
        val classFile = new File(res.toURI)
        val pkgDepth = getClass.getName.count(_ == '.') + 1
        val root = Iterator.iterate(classFile)(_.getParentFile)
          .drop(pkgDepth).next()
        def walk(f: File): Iterator[File] =
          if (f.isDirectory)
            Option(f.listFiles()).iterator.flatten.flatMap(walk)
          else Iterator.single(f)
        walk(root).filter(_.getName.endsWith(".class"))
          .map(f => s"${f.getPath.stripPrefix(root.getPath)}|${f.length}|${f.lastModified}")
          .toSeq.sorted.mkString("\n")
      case other => s"unknown|$other|${res.toString}"
    }
    md5(fp)
  }

  /** (length, mtime) stamp of one input path, resolved through Hadoop's
    * `FileSystem` by the path's own scheme — the shared probe for the
    * sibling stores (IVF cell layout, PQ model memo, Zipf corpus,
    * compaction fixtures) that key on fixture files but keep their own
    * memo layout. Directories stamp their recursive content length.
    * Throws on an absent input (see [[pathFor]]).
    */
  def inputStamp(spark: SparkSession, path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"store fingerprint input does not exist: $path")
    val st = fs.getFileStatus(p)
    val len = if (st.isDirectory) fs.getContentSummary(p).getLength
              else st.getLen
    (len, st.getModificationTime)
  }

  /** The store path for (tag, inputs, code version) — exposed for tests.
    * Throws if any fingerprint input is absent: an absent input silently
    * hashed as missing would alias with a differently-absent input and
    * serve the wrong relation.
    *
    * Inputs resolve through Hadoop's `FileSystem` by each path's OWN
    * scheme (the [[StandingStore]] rationale): at deployment scale the
    * fixture inputs live on HDFS/S3, and a `java.io.File` probe (the
    * round-11 shape) would report them absent — here that means a THROW
    * per query instead of a served store, still the wrong behavior
    * class. A directory input (multi-file parquet) fingerprints its
    * recursive content length, so appending a file invalidates the key
    * even when the directory entry's own mtime lags.
    */
  def pathFor(spark: SparkSession, tag: String,
              fingerprintPaths: Seq[String]): File = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fp = fingerprintPaths.map { s =>
      val p = new org.apache.hadoop.fs.Path(s)
      val fs = p.getFileSystem(conf)
      require(fs.exists(p),
        s"Materialize fingerprint input does not exist: $s (tag=$tag)")
      val st = fs.getFileStatus(p)
      val len = if (st.isDirectory) fs.getContentSummary(p).getLength
                else st.getLen
      s"$s|$len|${st.getModificationTime}"
    }
    new File(storeDir, md5((tag +: codeFingerprint +: fp).mkString("‖")))
  }

  /** Return the materialization of `build`, computing and persisting it on
    * the first call per (tag, input fingerprint, code fingerprint) and
    * reading the stored parquet on every later one. `build` is by-name:
    * cache hits never construct the source plan.
    *
    * Publication is atomic: the build writes to a process-private staging
    * dir, then renames into place (ATOMIC_MOVE — same filesystem by
    * construction). A concurrent process that loses the race discards its
    * staging copy and reads the winner's; readers can never observe a
    * half-written store.
    */
  def cached(spark: SparkSession, tag: String, fingerprintPaths: Seq[String])
            (build: => DataFrame): DataFrame = {
    val path = pathFor(spark, tag, fingerprintPaths)
    def complete = new File(path, "_SUCCESS").exists()
    def rm(f: File): Unit = {
      Option(f.listFiles()).iterator.flatten.foreach(rm); f.delete()
    }
    if (!complete) lock.synchronized {
      if (!complete) {
        // a store dir without _SUCCESS is a half-written remnant (only
        // possible from pre-atomic layouts or partial deletion — the
        // rename below never exposes one): rebuild, never serve it
        if (path.exists()) rm(path)
        val staging = new File(path.getParentFile,
          s"${path.getName}.staging-${ProcessHandle.current().pid()}")
        build.write.mode("overwrite").parquet(staging.getAbsolutePath)
        try
          Files.move(staging.toPath, path.toPath, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.AccessDeniedException |
               _: java.nio.file.DirectoryNotEmptyException =>
            if (complete) rm(staging) // lost the race — serve the winner's
            else { // pathological: racer left an incomplete dir behind
              rm(path)
              Files.move(staging.toPath, path.toPath,
                StandardCopyOption.ATOMIC_MOVE)
            }
        }
      }
    }
    spark.read.parquet(path.getAbsolutePath)
  }
}
