package graft.gen

import graft.SparkSpec
import graft.model.Schemas
import graft.source.ClickstreamSource

class ClickstreamGenSpec extends SparkSpec {

  test("generator is deterministic for a fixed (n, partitions, seed)") {
    val a = ClickstreamGen.events(spark, 500, numPartitions = 4, seed = 7).collect()
    val b = ClickstreamGen.events(spark, 500, numPartitions = 4, seed = 7).collect()
    assert(a.toSeq == b.toSeq)
    val c = ClickstreamGen.events(spark, 500, numPartitions = 4, seed = 8).collect()
    assert(a.toSeq != c.toSeq)
  }

  test("reference data-model invariants hold") {
    val evs = ClickstreamGen.events(spark, 2000, numPartitions = 4).collect()
    assert(evs.forall(e => e.user_id.exists(u => u >= 1 && u <= 1000)))
    assert(evs.forall(e => Schemas.Vocab.pages.contains(e.page)))
    assert(evs.forall(e => Schemas.Vocab.eventTypes.contains(e.event_type)))
    // conditional payloads: exactly the purchase rows carry order ids
    assert(evs.forall(e => (e.event_type == "purchase") == e.order_id.isDefined))
    assert(evs.forall(e => (e.event_type == "add_to_cart") == e.product_id.isDefined))
    assert(evs.forall(e => (e.event_type == "search") == e.search_query.isDefined))
    // page-conditioned boost: /payment sees far more purchases than base rate
    val payment = evs.filter(_.page == "/payment")
    val purchaseShare = payment.count(_.event_type == "purchase").toDouble / payment.length
    assert(purchaseShare > 0.3, s"got $purchaseShare")
    // event time is monotone-ish in index: range spans n * meanInterval
    val ts = evs.map(_.timestamp.getTime)
    assert(ts.max - ts.min > 2000 * 40L)
  }

  test("wire roundtrip: toWire JSON decodes back through the declared schema") {
    import org.apache.spark.sql.functions._
    val evs = ClickstreamGen.events(spark, 200, numPartitions = 2)
    val decoded = ClickstreamSource.decodeJson(ClickstreamGen.toWire(evs))
    assert(decoded.columns.toSeq == Schemas.event.fieldNames.toSeq)
    assert(decoded.count() == 200)
    // a purchase survives the roundtrip with its amount
    val p = decoded.filter(col("event_type") === "purchase")
    assert(p.filter(col("total_amount").isNull).count() == 0)
    assert(decoded.filter(col("device.type").isNull).count() == 0)
  }
}
