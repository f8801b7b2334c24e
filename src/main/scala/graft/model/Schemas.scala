package graft.model

import org.apache.spark.sql.types._

/** Device info nested struct.
  *
  * Mirrors the reference's event payload struct
  * (`spark_processor/stream_processor.py:92-96`): three nullable strings
  * `type`, `browser`, `os`. `type` is a Scala keyword, hence the backticks.
  */
final case class Device(`type`: String, browser: String, os: String)

/** One clickstream event — the engine's core record type.
  *
  * Field set, types and nullability mirror the reference's declared schema
  * (`spark_processor/stream_processor.py:83-106`) and what its generator
  * actually emits (`data_generator/clickstream_generator.py:59-85`):
  * the last six fields are event-type-conditional, so they are `Option`s.
  */
final case class ClickstreamEvent(
    user_id: Option[Int],
    session_id: String,
    timestamp: java.sql.Timestamp,
    page: String,
    event_type: String,
    referrer: String,
    device: Device,
    ip_address: String,
    user_agent: String,
    search_query: Option[String],
    product_id: Option[Int],
    product_price: Option[Double],
    quantity: Option[Int],
    order_id: Option[String],
    total_amount: Option[Double])

object Schemas {

  /** The explicit payload schema applied to the JSON `value` coming off the
    * wire — the Scala twin of `define_schema`
    * (`spark_processor/stream_processor.py:83-106`). Declared explicitly
    * (rather than derived from the encoder) so the on-wire contract is
    * independent of Scala field ordering rules.
    */
  val device: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("browser", StringType),
    StructField("os", StringType)))

  val event: StructType = StructType(Seq(
    StructField("user_id", IntegerType),
    StructField("session_id", StringType),
    StructField("timestamp", TimestampType),
    StructField("page", StringType),
    StructField("event_type", StringType),
    StructField("referrer", StringType),
    StructField("device", device),
    StructField("ip_address", StringType),
    StructField("user_agent", StringType),
    StructField("search_query", StringType),
    StructField("product_id", IntegerType),
    StructField("product_price", DoubleType),
    StructField("quantity", IntegerType),
    StructField("order_id", StringType),
    StructField("total_amount", DoubleType)))

  /** Vocabularies of the reference's generator
    * (`data_generator/clickstream_generator.py:14-27`) — the de-facto data
    * model: used by our deterministic generator and by tests.
    */
  object Vocab {
    val pages: IndexedSeq[String] = IndexedSeq(
      "/", "/products", "/products/category/electronics",
      "/products/category/clothing", "/products/category/home",
      "/products/item/123", "/products/item/456", "/cart", "/checkout",
      "/payment", "/confirmation", "/account", "/about", "/contact")
    val eventTypes: IndexedSeq[String] = IndexedSeq(
      "page_view", "button_click", "add_to_cart", "remove_from_cart",
      "checkout_progress", "purchase", "search", "login", "logout", "signup")
    val referrers: IndexedSeq[String] = IndexedSeq(
      "https://google.com", "https://facebook.com", "https://twitter.com",
      "https://instagram.com", "direct", "email_campaign", "affiliate")
    val deviceTypes: IndexedSeq[String] = IndexedSeq("desktop", "mobile", "tablet")
    val browsers: IndexedSeq[String] = IndexedSeq("chrome", "firefox", "safari", "edge")
    val oses: IndexedSeq[String] = IndexedSeq("windows", "macos", "ios", "android", "linux")
    val searchTerms: IndexedSeq[String] = IndexedSeq(
      "laptop", "shoes", "phone", "dress", "headphones")
  }
}
