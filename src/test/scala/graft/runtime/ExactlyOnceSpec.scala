package graft.runtime

import org.scalatest.funsuite.AnyFunSuite

import graft.sink.InMemoryKV

class ExactlyOnceSpec extends AnyFunSuite {

  test("redelivered batchIds are no-ops; distinct batchIds execute") {
    val ledger = new InMemoryKV
    var applied = List.empty[Long]
    val sink = ExactlyOnce.wrap("q", ledger, "ck") { (_, id) => applied ::= id }
    sink(null, 1L)
    sink(null, 1L) // redelivery after restart
    sink(null, 2L)
    sink(null, 1L)
    assert(applied.reverse == List(1L, 2L))
    assert(ledger.get("graft:batch:ck:q:1").contains("done"))
    assert(ledger.getTtl("graft:batch:ck:q:1").contains(7 * 86400L))
  }

  test("ledger is per (namespace, query name)") {
    val ledger = new InMemoryKV
    var n = 0
    ExactlyOnce.wrap("a", ledger, "ck")  { (_, _) => n += 1 }(null, 5L)
    ExactlyOnce.wrap("b", ledger, "ck")  { (_, _) => n += 1 }(null, 5L)
    // a fresh checkpoint (new namespace) replays batchIds from 0 — the
    // new namespace must not be swallowed by the old ledger entries
    ExactlyOnce.wrap("a", ledger, "ck2") { (_, _) => n += 1 }(null, 5L)
    assert(n == 3)
  }

  test("a failing sink does not mark the batch done") {
    val ledger = new InMemoryKV
    var attempts = 0
    val sink = ExactlyOnce.wrap("q", ledger, "ck") { (_, _) =>
      attempts += 1
      if (attempts == 1) sys.error("transient")
    }
    intercept[RuntimeException](sink(null, 9L))
    sink(null, 9L) // retry executes because the ledger was not written
    assert(attempts == 2)
    assert(ledger.get("graft:batch:ck:q:9").contains("done"))
  }
}
