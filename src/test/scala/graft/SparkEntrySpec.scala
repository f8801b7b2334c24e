package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Analytics, CorpusQueries}

class SparkEntrySpec extends AnyFunSuite {

  test("registered query names are unique — the Map construction loses nothing") {
    val all = Analytics.all ++ CorpusQueries.all
    val dupes = all.groupBy(_.name).filter(_._2.size > 1).keys.toSeq
    assert(dupes.isEmpty, s"duplicate query names silently dropped: $dupes")
    assert(SparkEntry.queries.size == all.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("driver smoke contract: entry() returns rows on the smallest fixture") {
    assert(!SparkEntry.entry(TestSpark.spark).isEmpty)
  }
}
