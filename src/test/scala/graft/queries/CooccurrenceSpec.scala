package graft.queries

import graft.SparkEntry
import graft.SparkSpec

class CooccurrenceSpec extends SparkSpec {

  test("ev_item_cooccurrence: support/cosine invariants on the fixture") {
    val rows = SparkEntry.queries("ev_item_cooccurrence")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nAb, cos) =>
      assert(a < b, "each unordered pair must appear exactly once, a < b")
      assert(nAb >= 5, "support floor")
      // cosine of co-occurrence sets is in (0, 1]; 1 ⇔ identical user sets
      assert(cos > 0.0 && cos <= 1.0, s"cosine out of range for ($a,$b): $cos")
    }
    // pairs are keyed uniquely
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }
}
