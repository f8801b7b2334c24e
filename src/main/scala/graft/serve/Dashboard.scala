package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sink.{JdbcSink, KeyValueSink}

/** The reference's aspirational dashboard made real as the thin serving
  * façade it implies. `dashboard/app.py` is an EMPTY file (0 bytes) and
  * `dashboard/__init__.py` likewise; `README.md:139-147` nonetheless
  * claims "a web-based dashboard … that visualizes real-time user
  * activity, session metrics, conversion funnels". What that claim
  * actually requires of the ENGINE is a read path over the two sink
  * surfaces the streaming pipelines maintain — the KV store's counters
  * and time series (K5-K7) and the JDBC tables (K1-K4) — exposed over
  * HTTP for whatever front end renders them. This is that read path,
  * on the JDK's built-in `HttpServer` (zero added dependencies, per
  * the build's no-new-libraries contract):
  *
  *   GET /health                      → {"status":"ok"}
  *   GET /kv/counter?key=K            → {"key":K,"value":N}
  *   GET /kv/series?key=K             → {"key":K,"points":[[ts,v],…]}
  *   GET /kv/value?key=K              → {"key":K,"value":S|null}
  *   GET /sql/<table>?limit=N         → {"table":T,"rows":[{col:val,…},…]}
  *
  * Design notes, judged by serving (not engine) standards:
  *  - Reads go straight to the sinks — the KV store answers from memory
  *    /Redis, the JDBC path runs `SELECT * … LIMIT n` over the sink's
  *    own connection factory with a hard cap (default ≤ 1000 rows), so
  *    a dashboard poll can never become a table scan of an unbounded
  *    results table.
  *  - The `/sql` table name is validated against an ALLOWLIST given at
  *    construction (the K1-K4 table names) — no identifier
  *    interpolation from the URL ever reaches SQL.
  *  - JSON is emitted by a ~20-line escaper (strings, longs, doubles,
  *    null) rather than a library; the value domain is the sinks'
  *    (counters, epoch/long series, JDBC scalars).
  *  - The server runs on the driver beside the streaming queries (the
  *    deployment the reference's docker-compose implies); state lives
  *    in the sinks, so any number of read replicas can front the same
  *    Redis/Postgres at scale.
  */
final class Dashboard(kv: KeyValueSink,
                      jdbc: Option[(JdbcSink.JdbcConfig, Set[String])],
                      port: Int = 0,
                      bindAddress: java.net.InetAddress =
                        java.net.InetAddress.getLoopbackAddress)
    extends AutoCloseable {

  // Loopback by default: this façade is unauthenticated, so binding the
  // wildcard address would expose KV and Postgres reads on every
  // interface. Deployments that front it with real auth/a reverse proxy
  // pass an explicit bindAddress.
  private val server =
    HttpServer.create(new InetSocketAddress(bindAddress, port), 0)

  /** Bound port (useful when constructed with port = 0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  /** Full bound address (spec-checked to be loopback by default). */
  def serverAddress: InetSocketAddress = server.getAddress

  private def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append("\\u%04x".format(c.toInt))
      case c => b.append(c)
    }
    b.append('"').toString
  }

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case n: Long => n.toString
    case n: Int => n.toString
    case n: Double => if (n.isNaN || n.isInfinite) "null" else n.toString
    case n: Float => jsonVal(n.toDouble)
    case n: java.math.BigDecimal => n.toPlainString
    case b: Boolean => b.toString
    case t: java.sql.Timestamp => jsonStr(t.toString)
    case d: java.sql.Date => jsonStr(d.toString)
    case other => jsonStr(other.toString)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def param(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&").toSeq)
      .map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == name =>
        java.net.URLDecoder.decode(v, "UTF-8")
      }

  private def handle(path: String)(f: HttpExchange => (Int, String)): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      val (code, body) =
        try f(ex)
        catch { case e: Exception => (500, s"""{"error":${jsonStr(e.toString)}}""") }
      respond(ex, code, body)
    })

  handle("/health") { _ => (200, """{"status":"ok"}""") }

  handle("/kv/counter") { ex =>
    param(ex, "key") match {
      case None => (400, """{"error":"missing key"}""")
      case Some(k) =>
        (200, s"""{"key":${jsonStr(k)},"value":${kv.getCounter(k)}}""")
    }
  }

  handle("/kv/value") { ex =>
    param(ex, "key") match {
      case None => (400, """{"error":"missing key"}""")
      case Some(k) =>
        val v = kv.get(k).map(jsonStr).getOrElse("null")
        (200, s"""{"key":${jsonStr(k)},"value":$v}""")
    }
  }

  handle("/kv/series") { ex =>
    param(ex, "key") match {
      case None => (400, """{"error":"missing key"}""")
      case Some(k) =>
        val pts = kv.getTimeSeries(k)
          .map { case (ts, v) => s"[$ts,$v]" }.mkString(",")
        (200, s"""{"key":${jsonStr(k)},"points":[$pts]}""")
    }
  }

  jdbc.foreach { case (cfg, allowedTables) =>
    handle("/sql") { ex =>
      val table = param(ex, "table")
      // Clamp to [1, 1000]: limit=0 would reach setMaxRows(0), which in
      // JDBC means UNLIMITED (defeating the hard cap), and a negative
      // value would throw and surface as a 500 instead of a clamp.
      val limit = math.max(1, math.min(1000,
        param(ex, "limit").flatMap(s => scala.util.Try(s.toInt).toOption)
          .getOrElse(100)))
      table match {
        case Some(t) if allowedTables(t) =>
          val conn = java.sql.DriverManager.getConnection(
            cfg.url, cfg.properties)
          try {
            val st = conn.createStatement()
            st.setMaxRows(limit)
            val rs = st.executeQuery(s"SELECT * FROM $t")
            val md = rs.getMetaData
            val cols = (1 to md.getColumnCount)
              .map(i => md.getColumnLabel(i).toLowerCase)
            val rows = new StringBuilder
            var first = true
            while (rs.next()) {
              if (!first) rows.append(',')
              first = false
              rows.append(cols.zipWithIndex.map { case (c, i) =>
                s"${jsonStr(c)}:${jsonVal(rs.getObject(i + 1))}"
              }.mkString("{", ",", "}"))
            }
            (200, s"""{"table":${jsonStr(t)},"rows":[$rows]}""")
          } finally conn.close()
        case Some(t) =>
          (404, s"""{"error":"unknown table ${t.replaceAll("[^A-Za-z0-9_]", "")}"}""")
        case None => (400, """{"error":"missing table"}""")
      }
    }
  }

  server.setExecutor(null) // serve on the dispatch thread: reads are cheap
  server.start()

  override def close(): Unit = server.stop(0)
}
