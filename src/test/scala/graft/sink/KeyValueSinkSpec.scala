package graft.sink

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

class KeyValueSinkSpec extends AnyFunSuite {

  test("InMemoryKV: pipelined counters, time series with TTL, delete") {
    val kv = new InMemoryKV
    val p = kv.pipeline()
    p.increment("page_views:/cart", 3)
    p.increment("page_views:/cart", 2)
    p.addTimeSeries("page_views_ts:/cart", 1000L, 3, ttlSec = 86400L)
    p.addTimeSeries("page_views_ts:/cart", 1060L, 2, ttlSec = 86400L)
    p.incrementByFloat("revenue:total", 10.5)
    assert(kv.getCounter("page_views:/cart") == 0L) // nothing before execute
    p.execute()
    assert(kv.getCounter("page_views:/cart") == 5L)
    assert(kv.getTimeSeries("page_views_ts:/cart") == Seq(1000L -> 3L, 1060L -> 2L))
    assert(kv.getTtl("page_views_ts:/cart").contains(86400L))
    assert(kv.getFloatCounter("revenue:total") == 10.5)
    val p2 = kv.pipeline()
    p2.delete("page_views:/cart")
    p2.execute()
    assert(kv.getCounter("page_views:/cart") == 0L)
  }

  /** Minimal RESP server capturing commands and answering like Redis —
    * verifies RedisKV's wire protocol (encoding, pipelining, reply parse)
    * without a real Redis.
    */
  private class FakeRedis extends AutoCloseable {
    val server = new ServerSocket(0)
    val commands = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    @volatile private var running = true
    private val counters = scala.collection.mutable.Map.empty[String, Long]
    val thread = new Thread(() => {
      try {
        val sock = server.accept()
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
        val out: OutputStream = sock.getOutputStream
        var open = true
        while (running && open) {
          val head = in.readLine()
          if (head == null) open = false
          else {
          assert(head.startsWith("*"))
          val n = head.substring(1).toInt
          val args = (0 until n).map { _ =>
            in.readLine() // $len
            in.readLine()
          }
          commands.add(args)
          val reply = args.head.toUpperCase match {
            case "INCRBY" if args(1) == "badkey" =>
              "-ERR value is not an integer or out of range\r\n"
            case "INCRBY" =>
              val v = counters.getOrElse(args(1), 0L) + args(2).toLong
              counters(args(1)) = v
              s":$v\r\n"
            case "GET" =>
              counters.get(args(1))
                .map(v => { val s = v.toString; s"$$${s.length}\r\n$s\r\n" })
                .getOrElse("$-1\r\n")
            case "ZADD" | "EXPIRE" | "DEL" => ":1\r\n"
            case _ => "+OK\r\n"
          }
          out.write(reply.getBytes(StandardCharsets.UTF_8))
          out.flush()
          }
        }
      } catch { case _: Throwable => () }
    })
    thread.setDaemon(true)
    thread.start()
    def close(): Unit = { running = false; server.close() }
  }

  test("RedisKV speaks RESP: pipelined commands, TTL'd time series, reads") {
    val fake = new FakeRedis
    try {
      val kv = new RedisKV("localhost", fake.server.getLocalPort)
      val p = kv.pipeline()
      p.increment("page_views:/", 4)
      p.addTimeSeries("page_views_ts:/", 1700000000L, 4, ttlSec = 86400L)
      p.set("cfg", "v1")
      p.execute()
      assert(kv.getCounter("page_views:/") == 4L)
      kv.close()
      val got = fake.commands.toArray.toSeq.asInstanceOf[Seq[Seq[String]]]
      assert(got.contains(Seq("INCRBY", "page_views:/", "4")))
      assert(got.contains(Seq("ZADD", "page_views_ts:/", "1700000000", "1700000000:4")))
      assert(got.contains(Seq("EXPIRE", "page_views_ts:/", "86400")))
      assert(got.contains(Seq("SET", "cfg", "v1")))
    } finally fake.close()
  }

  test("RedisKV pipeline drains all replies on error (no protocol desync)") {
    val fake = new FakeRedis
    try {
      val kv = new RedisKV("localhost", fake.server.getLocalPort)
      val p = kv.pipeline()
      p.increment("good", 1)
      p.increment("badkey", 1) // server replies -ERR
      p.increment("good", 2)
      val e = intercept[RuntimeException](p.execute())
      assert(e.getMessage.contains("redis pipeline error"))
      // protocol still in sync: a follow-up read returns the right value
      assert(kv.getCounter("good") == 3L)
      kv.close()
    } finally fake.close()
  }
}
