package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.gen.ClickstreamGen

/** Property-based invariants over randomly generated event streams
  * (SURVEY.md §5.3). ScalaCheck's Gen drives (seed, n) pairs; each
  * property is checked over several distinct generated streams.
  * (scalatestplus bridge isn't on the offline classpath, so the sampling
  * loop is explicit.)
  */
class PipelinePropertiesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val paramGen = for {
    seed <- org.scalacheck.Gen.choose(1L, 10000L)
    n <- org.scalacheck.Gen.choose(50, 400)
  } yield (seed, n)

  private def forAll(f: (Long, Int) => Unit): Unit =
    (0 until 5).foreach { i =>
      val (seed, n) = paramGen(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(1234L + i)).get
      f(seed, n)
    }

  test("sum of per-window page view counts equals total filtered events") {
    forAll { (seed, n) =>
      val evs = ClickstreamGen.events(spark, n, numPartitions = 2, seed = seed)
      val total = evs.filter(col("event_type") === "page_view").count()
      val windowed = Pipelines.pageViews(evs.toDF())
        .agg(sum("view_count")).collect()(0)
      assert((if (windowed.isNullAt(0)) 0L else windowed.getLong(0)) == total)
    }
  }

  test("session invariants: start <= end, counts partition the stream") {
    forAll { (seed, n) =>
      val evs = ClickstreamGen.events(spark, n, numPartitions = 2, seed = seed)
      val sess = Pipelines.sessions(evs.toDF()).collect()
      assert(sess.forall(r => !r.getTimestamp(2).after(r.getTimestamp(3))))
      assert(sess.map(_.getLong(4)).sum == n)
      // journeys have exactly event_count entries
      assert(sess.forall(r => r.getString(6).split(",").length == r.getLong(4)))
    }
  }

  test("windows align to their duration boundary") {
    forAll { (seed, n) =>
      val evs = ClickstreamGen.events(spark, n, numPartitions = 2, seed = seed)
      val starts = Pipelines.pageViews(evs.toDF())
        .select(col("window_start").cast("long"), col("window_end").cast("long"))
        .collect()
      assert(starts.forall(r => r.getLong(0) % 60 == 0 && r.getLong(1) - r.getLong(0) == 60))
    }
  }

  test("HLL distinct estimates stay within tolerance of exact counts") {
    forAll { (seed, _) =>
      val evs = ClickstreamGen.events(spark, 500, numPartitions = 2, seed = seed)
      val r = Pipelines.conversions(evs.toDF()).agg(sum("unique_buyers")).collect()(0)
      val exact = Pipelines.conversions(evs.toDF(), exactDistinct = true)
        .agg(sum("unique_buyers")).collect()(0)
      if (!r.isNullAt(0)) {
        val (est, ex) = (r.getLong(0).toDouble, exact.getLong(0).toDouble)
        assert(math.abs(est - ex) / math.max(ex, 1.0) < 0.15,
          s"HLL $est vs exact $ex")
      }
    }
  }

  test("exact dedup: fingerprint groups partition doc_ids") {
    forAll { (seed, _) =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 50L).map(i => (i, s"text ${rnd.nextInt(10)}")).toDF("doc_id", "text")
      val out = graft.text.Dedup.exact(docs).collect()
      assert(out.map(_.getLong(2)).sum == 50L)
      assert(out.map(_.getLong(1)).distinct.length == out.length)
    }
  }
}
