package graft.sink

import org.scalatest.funsuite.AnyFunSuite

class JdbcSinkSpec extends AnyFunSuite {

  test("Derby end-to-end: saveDataFrame + read + portable upsert on a real DB") {
    // embedded in-memory Derby (already on the Spark classpath) — the
    // JDBC paths executed against a live database, not just SQL-string
    // assertions: K1 append through Spark's JDBC writer, K9 read through
    // Spark's JDBC source, and the portable update-then-insert upsert.
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val cfg = JdbcSink.JdbcConfig("jdbc:derby:memory:graftTest;create=true",
      user = "", password = "", driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    // pre-create with VARCHAR + PRIMARY KEY (Spark's Derby dialect would
    // map StringType to CLOB, which Derby can't compare or key on)
    val boot = java.sql.DriverManager.getConnection(cfg.url)
    try {
      val st = boot.createStatement()
      try st.execute("DROP TABLE page_counts") catch { case _: java.sql.SQLException => }
      st.execute("CREATE TABLE page_counts (page VARCHAR(64) PRIMARY KEY, n BIGINT)")
    } finally boot.close()

    JdbcSink.saveDataFrame(Seq(("home", 3L), ("cart", 1L)).toDF("page", "n"),
      "page_counts", cfg)
    def readBack(): Set[(String, Long)] =
      JdbcSink.read(spark, "page_counts", cfg)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(readBack() == Set("home" -> 3L, "cart" -> 1L))

    // revise one key, introduce one: update-then-insert against live Derby
    JdbcSink.upsertPortable(Seq(("home", 5L), ("checkout", 2L)).toDF("page", "n"),
      "page_counts", Seq("page"), cfg)
    assert(readBack() == Set("home" -> 5L, "cart" -> 1L, "checkout" -> 2L))

    // idempotent redelivery: same revision again is a no-op on the result
    JdbcSink.upsertPortable(Seq(("home", 5L), ("checkout", 2L)).toDF("page", "n"),
      "page_counts", Seq("page"), cfg)
    assert(readBack() == Set("home" -> 5L, "cart" -> 1L, "checkout" -> 2L))

    // overwrite path: Spark creates the numeric table itself
    JdbcSink.saveDataFrame(Seq((1L, 2.5), (2L, 3.5)).toDF("k", "v"), "metrics",
      cfg, org.apache.spark.sql.SaveMode.Overwrite)
    JdbcSink.saveDataFrame(Seq((3L, 9.9)).toDF("k", "v"), "metrics",
      cfg, org.apache.spark.sql.SaveMode.Overwrite)
    assert(JdbcSink.read(spark, "metrics", cfg).count() == 1)
  }

  test("retry: backs off and rethrows after exhausting attempts") {
    var calls = 0
    val got = JdbcSink.retry(attempts = 3, baseDelayMs = 1) {
      calls += 1
      if (calls < 3) sys.error("transient") else "ok"
    }
    assert(got == "ok" && calls == 3)
    calls = 0
    val e = intercept[RuntimeException] {
      JdbcSink.retry(attempts = 2, baseDelayMs = 1) { calls += 1; sys.error("perm") }
    }
    assert(e.getMessage == "perm" && calls == 2)
  }

  test("upsert SQL: ON CONFLICT updates non-keys, DO NOTHING when all-key") {
    val sql = JdbcSink.upsertSql("t", Seq("k1", "k2", "v1", "v2"), Seq("k1", "k2"))
    assert(sql == "INSERT INTO t (k1, k2, v1, v2) VALUES (?, ?, ?, ?) " +
      "ON CONFLICT (k1, k2) DO UPDATE SET v1 = EXCLUDED.v1, v2 = EXCLUDED.v2")
    val allKey = JdbcSink.upsertSql("t", Seq("k"), Seq("k"))
    assert(allKey == "INSERT INTO t (k) VALUES (?) ON CONFLICT (k) DO NOTHING")
    intercept[IllegalArgumentException] {
      JdbcSink.upsertSql("t", Seq("a"), Seq("missing"))
    }
  }
}
