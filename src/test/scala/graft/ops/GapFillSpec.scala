package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GapFillSpec extends SparkSpec {

  import spark.implicits._

  private def series(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("k", "slot", "v")

  private def filledMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[Long]("slot")) ->
        (r.getAs[Long]("filled"), r.getAs[String]("src"))).toMap

  test("linear interpolation between neighbors, exact integer arithmetic") {
    // k=1: observed at slots 0 (v=100) and 4 (v=300) → interp 150/200/250
    val got = filledMap(GapFill.fill(series((1L, 0L, 100L), (1L, 4L, 300L)),
      "k", "slot", "v"))
    assert(got((1L, 0L)) == ((100L, "observed")))
    assert(got((1L, 1L)) == ((150L, "interp")))
    assert(got((1L, 2L)) == ((200L, "interp")))
    assert(got((1L, 3L)) == ((250L, "interp")))
    assert(got((1L, 4L)) == ((300L, "observed")))
  }

  test("negative slope truncates toward zero (div semantics, both engines)") {
    // from 10 down to 3 over 3 steps: deltas (3-10)*1 div 3 = -2 (trunc),
    // (3-10)*2 div 3 = -4 → filled 8, 6
    val got = filledMap(GapFill.fill(series((1L, 0L, 10L), (1L, 3L, 3L)),
      "k", "slot", "v"))
    assert(got((1L, 1L)) == ((8L, "interp")))
    assert(got((1L, 2L)) == ((6L, "interp")))
  }

  test("edges carry the nearest observation; grid spans global bounds per key") {
    // global bounds come from k=1 (slots 0..4); k=2 observes only slot 2
    val got = filledMap(GapFill.fill(
      series((1L, 0L, 1L), (1L, 4L, 1L), (2L, 2L, 50L)), "k", "slot", "v"))
    assert(got((2L, 0L)) == ((50L, "edge")))
    assert(got((2L, 1L)) == ((50L, "edge")))
    assert(got((2L, 2L)) == ((50L, "observed")))
    assert(got((2L, 4L)) == ((50L, "edge")))
    assert(got.keys.count(_._1 == 2L) == 5, "k=2 must cover the full grid")
  }

  test("the whole fill is one exchange of the observations") {
    // the fan-out repartition (sized from the dense-grid estimate; a
    // 1-partition grid renders as Exchange SinglePartition) must be the
    // ONLY exchange — the window reuses its partitioning, and the old
    // second scan + BroadcastNestedLoopJoin for the bounds must not
    // reappear
    val plan = GapFill.fill(series((1L, 0L, 1L), (1L, 9L, 5L)), "k", "slot", "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges == 1, s"window must reuse the fan-out exchange:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bounds must be literals, not a broadcast:\n$plan")
  }
}
