package graft.runtime

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.gen.ClickstreamGen
import graft.sink.{InMemoryKV, JdbcSink}

/** The kill/restart harness the unit-level ExactlyOnceSpec can't cover:
  * a real streaming query through the full StreamRunner path (ledger →
  * retry → sink) appending to a live Derby table, "killed" in the exact
  * window where at-least-once duplicates are born — after the external
  * write succeeded but before Spark's checkpoint commit — then restarted
  * against the same checkpoint.
  *
  * The crash window is reproduced faithfully, not approximated: Spark's
  * micro-batch recovery contract is that on restart, an offsets/N entry
  * with no matching commits/N marker means batch N's sink effects may or
  * may not have happened, so the batch is re-executed with the SAME
  * batchId. Deleting the commits/N file after a completed run puts the
  * checkpoint in precisely that state (a SIGKILL between the foreachBatch
  * return and the commit-log write leaves the identical layout). A file
  * source makes the replay deterministic: the source's own metadata log
  * pins which files batch N read.
  *
  * Run A (ledger on, the Main demo wiring): redelivery is a no-op — row
  * count unchanged. Run B (no ledger, same protocol): the duplicate rows
  * actually appear — proof the harness genuinely redelivers and the
  * ledger is what suppresses the dupes, not the harness failing to replay.
  */
class RestartRecoverySpec extends SparkSpec {

  private def seedEvents(dir: Path): Long = {
    val evs = ClickstreamGen.events(spark, 300, numPartitions = 1)
    evs.write.mode("overwrite").parquet(dir.toString)
    evs.count()
  }

  /** One streaming run over the seeded dir: drain with AvailableNow,
    * append user_id rows to the Derby table through StreamRunner.start
    * (so the configured ledger wraps the sink exactly as in Main).
    */
  private def runOnce(srcDir: Path, checkpoint: String, name: String,
                      table: String, cfg: JdbcSink.JdbcConfig,
                      ledger: Option[graft.sink.KeyValueSink]): Unit = {
    val schema = spark.read.parquet(srcDir.toString).schema
    val src = spark.readStream.schema(schema).parquet(srcDir.toString)
      .select(col("user_id"), col("session_id").cast("varchar(64)").as("session_id"))
    val runner = new StreamRunner(spark,
      StreamConfig(checkpoint, ledger = ledger, availableNow = true))
    val q = runner.start(src, name) { (batch, _) =>
      JdbcSink.saveDataFrame(batch, table, cfg)
    }
    q.awaitTermination()
    runner.stopAll()
  }

  /** Put the checkpoint into the crashed-before-commit state: the last
    * offsets entry survives, its commit marker does not.
    */
  private def dropLastCommit(checkpoint: String, name: String): Unit = {
    val commits = new java.io.File(s"$checkpoint/$name/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
    assert(last.delete(), s"could not delete ${last}")
    // Local ChecksumFs writes a hidden .N.crc sidecar atomically with N;
    // a crash that loses N loses the sidecar too, so drop both.
    val crc = new java.io.File(commits, s".${last.getName}.crc")
    if (crc.exists()) assert(crc.delete(), s"could not delete ${crc}")
  }

  private def rowCount(table: String, cfg: JdbcSink.JdbcConfig): Long =
    JdbcSink.read(spark, table, cfg).count()

  test("forced restart redelivers the batch; the ledger makes it a no-op") {
    val cfg = JdbcSink.JdbcConfig("jdbc:derby:memory:graftRestart;create=true",
      user = "", password = "", driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val srcDir = Files.createTempDirectory("graft-restart-src")
    val n = seedEvents(srcDir)

    // Run A: ledger on (the Main demo wiring). Crash, restart, no dupes.
    val ck = Files.createTempDirectory("graft-restart-ck").toString
    val ledger = new InMemoryKV // stands in for Redis: outlives the "crash"
    runOnce(srcDir, ck, "restart_q", "restart_rows", cfg, Some(ledger))
    assert(rowCount("restart_rows", cfg) == n)
    assert(ledger.get(s"graft:batch:$ck:restart_q:0").contains("done"))

    dropLastCommit(ck, "restart_q")
    runOnce(srcDir, ck, "restart_q", "restart_rows", cfg, Some(ledger))
    assert(rowCount("restart_rows", cfg) == n,
      "redelivered batch must not duplicate rows when the ledger is on")

    // Run B (control): same crash, no ledger — duplicates DO appear,
    // proving the harness really re-executes the batch.
    val ck2 = Files.createTempDirectory("graft-restart-ck2").toString
    runOnce(srcDir, ck2, "restart_q", "restart_rows_bare", cfg, None)
    assert(rowCount("restart_rows_bare", cfg) == n)
    dropLastCommit(ck2, "restart_q")
    runOnce(srcDir, ck2, "restart_q", "restart_rows_bare", cfg, None)
    assert(rowCount("restart_rows_bare", cfg) == 2 * n,
      "without the ledger the redelivered batch appends again (at-least-once)")
  }
}
