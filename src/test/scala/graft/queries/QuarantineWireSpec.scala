package graft.queries

import graft.SparkSpec
import graft.source.Tables

/** Pins the ONLY seam in `ev_ingest_quarantine` between the engine and
  * the DuckDB oracle: the rebuilt JSON wire. Both sides construct the
  * lines independently (Spark `concat`+`substring` vs DuckDB
  * `||`+`substr`); if their renderings ever diverge by a single byte,
  * the driver row goes hash-red with no other signal — which is exactly
  * what happened when a stale artifact shadowed the round-7 fix. This
  * spec re-renders the wire in plain JVM string code (the semantics the
  * oracle's `||` uses: decimal rendering of BIGINTs, raw string
  * passthrough, character-based truncation on ASCII) and asserts the
  * multiset of lines is byte-identical to `Analytics.quarantineWire`.
  */
class QuarantineWireSpec extends SparkSpec {

  test("rebuilt wire is byte-identical to the oracle's || rendering") {
    val sparkLines = Analytics.quarantineWire(spark, sfDir)
      .collect().map(_.getString(0)).sorted

    val events = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val jvmLines = events.map { case (eid, uid, t) =>
      // DuckDB: '{"event_id":' || CAST(event_id AS VARCHAR) || ... ;
      // CAST(BIGINT AS VARCHAR) is plain decimal — same as Long.toString.
      val full = s"""{"event_id":$eid,"user_id":$uid,"t":"$t"}"""
      if (eid % 7 == 0) full.dropRight(5) else full
    }.sorted

    assert(sparkLines.length == jvmLines.length)
    sparkLines.zip(jvmLines).zipWithIndex.foreach { case ((s, j), i) =>
      assert(s == j, s"line $i differs:\n  spark=$s\n  jvm  =$j")
    }
  }

  test("truncation is syntactically fatal for every mod-7 line; others parse") {
    // The construction's correctness depends on the truncated suffix
    // always cutting inside the final quoted string (event_type values
    // are ≥1 char and the tail is `"}` plus ≥3 chars of the type) — a
    // short type value could otherwise leave a parseable line and move
    // a row out of quarantine.
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().collect().map(_.getString(0))
    assert(types.nonEmpty)
    types.foreach(t => assert(t.length >= 3,
      s"event_type '$t' too short: 5-char truncation could stay parseable"))
  }
}
