package graft.sink

import org.scalatest.funsuite.AnyFunSuite

class JdbcSinkSpec extends AnyFunSuite {

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
