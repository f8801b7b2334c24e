package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {

  test("report counts planted violations exactly: predicate, unique, ref-integrity") {
    import spark.implicits._
    val t = Seq((1L, Some(10)), (2L, None), (3L, Some(-5)), (3L, Some(7)))
      .toDF("id", "v")
    val parent = Seq(1L, 2L).toDF("pid")
    val got = Quality.report(Seq(
        Quality.Predicate("v_not_null", t, col("v").isNull),
        Quality.Predicate("v_non_negative", t, col("v") < 0),
        Quality.Unique("id_unique", t, Seq("id")),
        Quality.RefIntegrity("id_refs_parent", t, "id", parent, "pid")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got("v_not_null") == ((4L, 1L, 0.75)))
    assert(got("v_non_negative") == ((4L, 1L, 0.75)))   // null v is not < 0
    assert(got("id_unique") == ((4L, 1L, 0.75)))        // id 3 twice → 1 surplus
    assert(got("id_refs_parent") == ((4L, 2L, 0.5)))    // both id-3 rows orphaned
  }

  test("all-clean table reports zero violations, pass_rate exactly 1.0") {
    import spark.implicits._
    val t = Seq((1L, 1), (2L, 2)).toDF("id", "v")
    val rows = Quality.report(Seq(
        Quality.Predicate("p", t, col("v").isNull),
        Quality.Unique("u", t, Seq("id"))))
      .collect()
    assert(rows.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 1.0))
  }
}
