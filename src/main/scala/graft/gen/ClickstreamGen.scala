package graft.gen

import java.sql.Timestamp
import java.util.UUID

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ClickstreamEvent, Device, Schemas}

/** S2/S3: deterministic, distributed clickstream generator.
  *
  * Reproduces the reference generator's data model
  * (`data_generator/clickstream_generator.py:29-87`): uniform user pool,
  * sticky sessions with 10% churn, page-conditioned event-type overrides
  * (30% add_to_cart on product pages, 20% checkout_progress on /cart, 40%
  * purchase on /payment), and event-type-conditional payload fields.
  *
  * Differences from the reference, by design:
  *  - seeded and distributed: each partition derives its RNG from
  *    (seed, partitionId), so output is reproducible for a fixed
  *    (n, numPartitions, seed) — the reference uses wall-clock + global RNG;
  *  - event time is synthetic (base + index·meanInterval + jitter) instead
  *    of `datetime.now()`, so watermark/window tests are deterministic;
  *  - Poisson pacing (`generate_continuous`'s expovariate sleeps) becomes
  *    exponential inter-arrival *jitter* in event time — same distribution,
  *    no wall-clock sleeping.
  */
object ClickstreamGen {

  import Schemas.Vocab._

  val DefaultStart: Long = 1704067200000L // 2024-01-01T00:00:00Z

  def events(spark: SparkSession,
             n: Long,
             numPartitions: Int = 32,
             seed: Long = 42L,
             userPool: Int = 1000,
             startMillis: Long = DefaultStart,
             meanIntervalMs: Long = 50L): Dataset[ClickstreamEvent] = {
    import spark.implicits._
    spark.range(0L, n, 1L, numPartitions).mapPartitions { iter =>
      val idx = iter.buffered
      if (!idx.hasNext) Iterator.empty
      else {
        val first = idx.head
        val pid = (first / math.max(n / numPartitions, 1L)).toInt // stable enough; rng below reseeds per index anyway
        val sessions = scala.collection.mutable.Map.empty[Int, String]
        idx.map { i =>
          // Per-index RNG: identical rows regardless of how ranges split.
          val rnd = new scala.util.Random(seed * 1000003L + i)
          gen(i, rnd, sessions, userPool, startMillis, meanIntervalMs)
        }
      }
    }
  }

  private def gen(i: Long, rnd: scala.util.Random,
                  sessions: scala.collection.mutable.Map[Int, String],
                  userPool: Int, startMillis: Long, meanIntervalMs: Long): ClickstreamEvent = {
    def pick[T](xs: IndexedSeq[T]): T = xs(rnd.nextInt(xs.length))
    def uuid(): String = new UUID(rnd.nextLong(), rnd.nextLong()).toString

    val userId = 1 + rnd.nextInt(userPool)
    if (!sessions.contains(userId) || rnd.nextDouble() < 0.1)
      sessions(userId) = uuid()
    val sessionId = sessions(userId)

    // exponential inter-arrival jitter on top of a linear clock
    val jitter = (-math.log(1.0 - rnd.nextDouble()) * meanIntervalMs).toLong
    val ts = new Timestamp(startMillis + i * meanIntervalMs + jitter)

    val page = pick(pages)
    var eventType = pick(eventTypes)
    if ((page == "/products/item/123" || page == "/products/item/456") && rnd.nextDouble() < 0.3)
      eventType = "add_to_cart"
    else if (page == "/cart" && rnd.nextDouble() < 0.2)
      eventType = "checkout_progress"
    else if (page == "/payment" && rnd.nextDouble() < 0.4)
      eventType = "purchase"

    val os = pick(oses)
    val deviceType = pick(deviceTypes)
    ClickstreamEvent(
      user_id = Some(userId),
      session_id = sessionId,
      timestamp = ts,
      page = page,
      event_type = eventType,
      referrer = pick(referrers),
      device = Device(deviceType, pick(browsers), os),
      ip_address = s"192.168.${1 + rnd.nextInt(255)}.${1 + rnd.nextInt(255)}",
      user_agent = s"Mozilla/5.0 ($os; $deviceType) Browser/${80 + rnd.nextInt(31)}",
      search_query = if (eventType == "search") Some(pick(searchTerms)) else None,
      product_id = if (eventType == "add_to_cart") Some(1 + rnd.nextInt(1000)) else None,
      product_price = if (eventType == "add_to_cart")
        Some(math.rint((9.99 + rnd.nextDouble() * 990.0) * 100) / 100) else None,
      quantity = if (eventType == "add_to_cart") Some(1 + rnd.nextInt(5)) else None,
      order_id = if (eventType == "purchase") Some(uuid()) else None,
      total_amount = if (eventType == "purchase")
        Some(math.rint((19.99 + rnd.nextDouble() * 1980.0) * 100) / 100) else None)
  }

  /** The wire shape (S4): `(key, value)` JSON frames as the Kafka producer
    * would emit — `df.write.format("kafka")` ready, and directly feedable
    * to `ClickstreamSource.decode` in tests.
    */
  def toWire(events: Dataset[ClickstreamEvent]): DataFrame =
    events.toDF().select(
      col("user_id").cast("string").as("key"),
      to_json(struct(Schemas.event.fieldNames.map(col): _*)).as("value"),
      col("timestamp").as("timestamp"))
}
