package graft.sink

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** K5-K8: the KV sink surface the reference *intends* — its processor calls
  * `RedisConnector.get_pipeline()`, `pipeline.increment`,
  * `pipeline.add_time_series(key, ts, count, expiry)`
  * (`spark_processor/stream_processor.py:377-391`) but the connector
  * (`storage/redis_connector.py`) only implements scalar get/set/incr.
  * This trait is those intended capabilities made real: batched (pipelined)
  * mutation with counters, TTLs and a time-series primitive.
  */
trait KeyValuePipeline {
  def set(key: String, value: String): Unit
  /** Atomic set-with-TTL (one command — no window where the key exists
    * without its expiry, unlike set(...) + expire(...)).
    */
  def setEx(key: String, value: String, ttlSec: Long): Unit
  def increment(key: String, by: Long = 1L): Unit
  def incrementByFloat(key: String, by: Double): Unit
  /** Append (epochSec → value) to a series under `key`, refreshing its TTL
    * (reference semantics: 24h retention, `stream_processor.py:388`).
    */
  def addTimeSeries(key: String, epochSec: Long, value: Long, ttlSec: Long): Unit
  def expire(key: String, ttlSec: Long): Unit
  def delete(key: String): Unit
  /** Flush the buffered commands in one round trip. */
  def execute(): Unit
}

trait KeyValueSink extends AutoCloseable {
  def pipeline(): KeyValuePipeline
  def get(key: String): Option[String]
  def getCounter(key: String): Long
  def getTimeSeries(key: String): Seq[(Long, Long)]
}

/** Test/local implementation: thread-safe in-memory maps. */
final class InMemoryKV extends KeyValueSink {
  private val values = mutable.Map.empty[String, String]
  private val counters = mutable.Map.empty[String, Double]
  private val series = mutable.Map.empty[String, mutable.TreeMap[Long, Long]]
  private val ttls = mutable.Map.empty[String, Long]

  override def pipeline(): KeyValuePipeline = new KeyValuePipeline {
    private val ops = mutable.Buffer.empty[() => Unit]
    def set(k: String, v: String): Unit = ops += (() => values(k) = v)
    def setEx(k: String, v: String, ttl: Long): Unit = ops += { () =>
      values(k) = v; ttls(k) = ttl
    }
    def increment(k: String, by: Long): Unit = ops += { () =>
      counters(k) = counters.getOrElse(k, 0.0) + by
    }
    def incrementByFloat(k: String, by: Double): Unit = ops += { () =>
      counters(k) = counters.getOrElse(k, 0.0) + by
    }
    def addTimeSeries(k: String, ts: Long, v: Long, ttl: Long): Unit = ops += { () =>
      series.getOrElseUpdate(k, mutable.TreeMap.empty)(ts) = v
      ttls(k) = ttl
    }
    def expire(k: String, ttl: Long): Unit = ops += (() => ttls(k) = ttl)
    def delete(k: String): Unit = ops += { () =>
      values.remove(k); counters.remove(k); series.remove(k); ttls.remove(k)
    }
    def execute(): Unit = InMemoryKV.this.synchronized {
      ops.foreach(_.apply()); ops.clear()
    }
  }

  def get(key: String): Option[String] = synchronized(values.get(key))
  def getCounter(key: String): Long = synchronized(counters.getOrElse(key, 0.0).toLong)
  def getFloatCounter(key: String): Double = synchronized(counters.getOrElse(key, 0.0))
  def getTimeSeries(key: String): Seq[(Long, Long)] =
    synchronized(series.get(key).map(_.toSeq).getOrElse(Seq.empty))
  def getTtl(key: String): Option[Long] = synchronized(ttls.get(key))
  override def close(): Unit = ()
}

/** An error reply (`-ERR …`) — carried as a value so pipelined replies can
  * all be drained before the first error is raised.
  */
private[sink] final case class RedisError(message: String)

/** Production implementation: RESP (Redis serialization protocol) over a
  * raw socket — no client library required. Pipelines buffer commands and
  * flush in a single write, reading all replies afterwards (the batching
  * the reference's per-key round trips lack). Time series are sorted sets
  * (`ZADD key epochSec "epochSec:value"`) + `EXPIRE`.
  */
final class RedisKV(host: String = "localhost", port: Int = 6379)
    extends KeyValueSink {

  private lazy val socket = new Socket(host, port)
  private lazy val out = new BufferedOutputStream(socket.getOutputStream)
  private lazy val in = new BufferedInputStream(socket.getInputStream)

  private def encode(args: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append('*').append(args.length).append("\r\n")
    args.foreach { a =>
      val bytes = a.getBytes(StandardCharsets.UTF_8)
      sb.append('$').append(bytes.length).append("\r\n").append(a).append("\r\n")
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r' && c != -1) { sb.append(c.toChar); c = in.read() }
    in.read() // \n
    sb.toString
  }

  /** Reads one RESP reply (simple/error/int/bulk/array). */
  private def readReply(): Any = {
    val line = readLine()
    if (line.isEmpty) null
    else line.charAt(0) match {
      case '+' => line.substring(1)
      case '-' => RedisError(line.substring(1)) // surfaced by the caller —
      // throwing here would leave later pipelined replies unread and
      // desynchronize the protocol for every subsequent command
      case ':' => line.substring(1).toLong
      case '$' =>
        val n = line.substring(1).toInt
        if (n < 0) null
        else {
          val buf = new Array[Byte](n)
          var read = 0
          while (read < n) {
            val got = in.read(buf, read, n - read)
            if (got < 0) // EOF mid-reply: fail, don't spin
              throw new java.io.EOFException("redis connection closed mid-reply")
            read += got
          }
          in.read(); in.read() // \r\n
          new String(buf, StandardCharsets.UTF_8)
        }
      case '*' =>
        val n = line.substring(1).toInt
        if (n < 0) null else (0 until n).map(_ => readReply())
      case _ => line
    }
  }

  private def command(args: String*): Any = synchronized {
    out.write(encode(args)); out.flush()
    readReply() match {
      case RedisError(msg) => throw new RuntimeException(s"redis error: $msg")
      case r => r
    }
  }

  override def pipeline(): KeyValuePipeline = new KeyValuePipeline {
    private val cmds = mutable.Buffer.empty[Seq[String]]
    def set(k: String, v: String): Unit = cmds += Seq("SET", k, v)
    def setEx(k: String, v: String, ttl: Long): Unit =
      cmds += Seq("SET", k, v, "EX", ttl.toString)
    def increment(k: String, by: Long): Unit = cmds += Seq("INCRBY", k, by.toString)
    def incrementByFloat(k: String, by: Double): Unit =
      cmds += Seq("INCRBYFLOAT", k, by.toString)
    def addTimeSeries(k: String, ts: Long, v: Long, ttl: Long): Unit = {
      cmds += Seq("ZADD", k, ts.toString, s"$ts:$v")
      cmds += Seq("EXPIRE", k, ttl.toString)
    }
    def expire(k: String, ttl: Long): Unit = cmds += Seq("EXPIRE", k, ttl.toString)
    def delete(k: String): Unit = cmds += Seq("DEL", k)
    def execute(): Unit = RedisKV.this.synchronized {
      if (cmds.nonEmpty) {
        cmds.foreach(c => out.write(encode(c)))
        out.flush()
        // drain EVERY reply before raising — aborting mid-pipeline would
        // leave replies buffered and desynchronize the protocol
        val replies = cmds.indices.map(_ => readReply())
        cmds.clear()
        replies.collectFirst { case RedisError(msg) =>
          throw new RuntimeException(s"redis pipeline error: $msg")
        }
      }
    }
  }

  def get(key: String): Option[String] =
    Option(command("GET", key)).map(_.toString)
  def getCounter(key: String): Long =
    get(key).map(_.toDouble.toLong).getOrElse(0L)
  def getTimeSeries(key: String): Seq[(Long, Long)] =
    command("ZRANGE", key, "0", "-1") match {
      case s: Seq[_] => s.collect { case m: String =>
        val Array(ts, v) = m.split(":", 2); (ts.toLong, v.toLong)
      }
      case _ => Seq.empty
    }
  override def close(): Unit = { out.flush(); socket.close() }
}
