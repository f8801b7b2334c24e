package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{InMemoryKV, JdbcSink}

/** The serving façade driven over REAL HTTP: counters, time series and a
  * live-Derby table read back through `java.net.http.HttpClient` against
  * an ephemeral-port server — request routing, JSON encoding, the
  * allowlist and the row cap all exercised end-to-end.
  */
class DashboardSpec extends AnyFunSuite {

  private def get(port: Int, path: String): (Int, String) = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("KV endpoints serve counters, values and time series as JSON") {
    val kv = new InMemoryKV
    val p = kv.pipeline()
    p.increment("page:/home", 7L)
    p.set("latest_batch", "42")
    p.addTimeSeries("views:/cart", 1000L, 3L, ttlSec = 86400L)
    p.addTimeSeries("views:/cart", 1060L, 5L, ttlSec = 86400L)
    p.execute()
    val dash = new Dashboard(kv, jdbc = None)
    try {
      assert(get(dash.boundPort, "/health") == ((200, """{"status":"ok"}""")))
      assert(get(dash.boundPort, "/kv/counter?key=page:/home") ==
        ((200, """{"key":"page:/home","value":7}""")))
      assert(get(dash.boundPort, "/kv/value?key=latest_batch") ==
        ((200, """{"key":"latest_batch","value":"42"}""")))
      assert(get(dash.boundPort, "/kv/value?key=absent") ==
        ((200, """{"key":"absent","value":null}""")))
      assert(get(dash.boundPort, "/kv/series?key=views:/cart") ==
        ((200, """{"key":"views:/cart","points":[[1000,3],[1060,5]]}""")))
      assert(get(dash.boundPort, "/kv/counter")._1 == 400)
    } finally dash.close()
  }

  test("SQL endpoint reads a live Derby table, enforces allowlist and row cap") {
    val cfg = JdbcSink.JdbcConfig("jdbc:derby:memory:graftDash;create=true",
      user = "", password = "",
      driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val boot = java.sql.DriverManager.getConnection(cfg.url)
    try {
      val st = boot.createStatement()
      try st.execute("DROP TABLE page_views") catch { case _: java.sql.SQLException => }
      st.execute("CREATE TABLE page_views (page VARCHAR(64), n BIGINT)")
      (1 to 5).foreach(i =>
        st.execute(s"INSERT INTO page_views VALUES ('/p$i', ${i * 10})"))
    } finally boot.close()
    val dash = new Dashboard(new InMemoryKV,
      jdbc = Some((cfg, Set("page_views"))))
    try {
      val (code, body) = get(dash.boundPort, "/sql?table=page_views&limit=3")
      assert(code == 200)
      assert(body.startsWith("""{"table":"page_views","rows":["""))
      assert("\\{\"page\":".r.findAllIn(body).size == 3, s"row cap: $body")
      assert(body.contains(""""page":"/p1","n":10"""))
      // allowlist: a table name from the URL never reaches SQL
      assert(get(dash.boundPort, "/sql?table=SYS.SYSTABLES")._1 == 404)
      assert(get(dash.boundPort, "/sql")._1 == 400)
      // limit is clamped to [1, 1000]: 0 must NOT mean JDBC-unlimited,
      // negative/garbage must not 500 — all serve exactly like limit=1
      // (floor) or the default (garbage).
      for (lim <- Seq("0", "-5")) {
        val (c, b) = get(dash.boundPort, s"/sql?table=page_views&limit=$lim")
        assert(c == 200, s"limit=$lim: $b")
        assert("\\{\"page\":".r.findAllIn(b).size == 1, s"limit=$lim: $b")
      }
      val (cg, bg) = get(dash.boundPort, "/sql?table=page_views&limit=banana")
      assert(cg == 200 && "\\{\"page\":".r.findAllIn(bg).size == 5, bg)
    } finally dash.close()
  }

  test("server binds loopback only") {
    val dash = new Dashboard(new InMemoryKV, jdbc = None)
    try
      assert(dash.serverAddress.getAddress.isLoopbackAddress,
        s"bound ${dash.serverAddress}")
    finally dash.close()
  }
}
