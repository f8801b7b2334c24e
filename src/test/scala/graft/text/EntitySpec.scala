package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.source.Tables

class EntitySpec extends SparkSpec {

  /** Classic unit-cost Levenshtein, driver-side — the independent
    * reference the distributed plan must reproduce exactly.
    */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val sub = d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), sub)
    }
    d(a.length)(b.length)
  }

  private def quadraticReference(rows: Seq[(Long, String, Int)],
                                 maxDist: Int): Set[(Long, Long, Int)] =
    (for {
      (aId, aS, aB) <- rows; (bId, bS, bB) <- rows
      if aB == bB && aId < bId
      d = lev(aS, bS) if d <= maxDist
    } yield (aId, bId, d)).toSet

  test("editDistancePairs ≡ quadratic per-block reference on the fixture") {
    val cust = Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val rows = cust.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    val want = quadraticReference(rows, maxDist = 2)
    val got = Entity.editDistancePairs(cust, maxDist = 2,
        idCol = "c_custkey", strCol = "c_name",
        blockCols = Seq("c_nationkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(want.nonEmpty, "degenerate fixture: no fuzzy pairs at all")
    assert(got == want, s"sets differ: got ${got.size}, want ${want.size}")
  }

  test("incremental fuzzy join ≡ full pass restricted to batch-touching pairs") {
    val cust = Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val rows = cust.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    val want = quadraticReference(rows, maxDist = 2)
      .filter { case (a, b, _) => a % 9 == 4 || b % 9 == 4 }
    val got = Entity.editDistancePairsIncremental(
        cust.filter(col("c_custkey") % 9 === 4),
        cust.filter(col("c_custkey") % 9 =!= 4),
        maxDist = 2, idCol = "c_custkey", strCol = "c_name",
        blockCols = Seq("c_nationkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(want.nonEmpty, "degenerate split: no batch-touching pairs")
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // bootstrap: empty standing ≡ plain self-join of the batch
    val batchOnly = Entity.editDistancePairsIncremental(
        cust, cust.limit(0), maxDist = 2, idCol = "c_custkey",
        strCol = "c_name", blockCols = Seq("c_nationkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batchOnly == quadraticReference(rows, maxDist = 2))
  }

  test("grid-salted hot blocks ≡ plain join (lossless), multi-column block key") {
    import spark.implicits._
    // one deliberately hot block (120 near-identical names) next to cold
    // ones, keyed by a TWO-column block
    val hot = (0 until 120).map(i =>
      (i.toLong, f"Acme Corp $i%03d", "us", 1))
    val cold = (200 until 230).map(i =>
      (i.toLong, f"Zenith Ltd $i%03d", "de", 2))
    val df = (hot ++ cold).toDF("id", "name", "country", "seg")
    def run(cap: Int) = Entity.editDistancePairs(df, maxDist = 2,
        idCol = "id", strCol = "name", blockCols = Seq("country", "seg"),
        hotBlockCap = cap, strategy = "block")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plain = run(1000000) // nothing hot: plain block join
    val salted = run(10)     // hot path forced for the 120-row block
    assert(plain.nonEmpty)
    assert(salted == plain, "grid salting changed the result set")
    // and both equal the quadratic reference, as does the
    // deletion-neighborhood candidate path (the default at maxDist ≤ 2)
    val rows = (hot ++ cold).map { case (id, n, c, s) => (id, n, c.hashCode * 31 + s) }
    assert(plain == quadraticReference(rows, maxDist = 2))
    val nbhd = Entity.editDistancePairs(df, maxDist = 2,
        idCol = "id", strCol = "name", blockCols = Seq("country", "seg"),
        strategy = "neighborhood")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(nbhd == plain, "neighborhood candidates changed the result set")
  }

  test("neighborhood ≡ block strategy on adversarial short/empty/unicode strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(271828)
    val alphabet = "ab0é" // tiny alphabet: forces ed∈(2,4] near-miss candidates
    def randStr() = (0 until rnd.nextInt(7)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = (0 until 300).map(i => (i.toLong, randStr(), i % 3)) ++
      Seq((400L, "", 0), (401L, "", 0), (402L, "a", 0), (403L, "ab", 0))
    val df = rows.toDF("id", "name", "blk")
    for (d <- Seq(0, 1, 2)) {
      def run(strategy: String) = Entity.editDistancePairs(df, maxDist = d,
          idCol = "id", strCol = "name", blockCols = Seq("blk"),
          strategy = strategy)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val block = run("block")
      assert(run("neighborhood") == block, s"strategies diverge at maxDist=$d")
      assert(block == quadraticReference(rows.map { case (i, s, b) => (i, s, b) }, d))
    }
  }

  test("EditDistanceWithin kernel ≡ Spark's levenshtein(l, r, threshold) on random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(31337)
    val alphabet = "abcd#0é"
    def randStr() = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pairs = (0 until 4000).map { _ =>
      val a = randStr()
      // half the pairs are mutations of a (the near-dup regime), half independent
      val b = if (rnd.nextBoolean()) randStr()
        else a.zipWithIndex.map { case (c, _) =>
          if (rnd.nextDouble() < 0.2) alphabet(rnd.nextInt(alphabet.length)) else c
        }.mkString
      (a, b)
    } :+ (("", "")) :+ (("", "abc")) :+ (("same", "same")) :+ (("Customer#000000001", "Customer#000000010"))
    for (d <- Seq(0, 1, 2, 4)) {
      val diff = pairs.toDF("a", "b")
        .select(col("a"), col("b"),
          graft.functions.TextExpressions.editDistanceWithin(col("a"), col("b"), d).as("k"),
          levenshtein(col("a"), col("b"), d).as("ref"))
        .filter(col("k") =!= col("ref"))
        .collect()
      assert(diff.isEmpty, s"maxDist=$d: kernel diverges on ${diff.take(5).mkString(";")}")
    }
  }

  test("DeletionNeighborhood kernel ≡ brute-force variant enumeration (property)") {
    import spark.implicits._
    // independent JVM-side reference: enumerate ≤d-deletion variants as
    // STRINGS, hash with the kernel's FNV-1a over code points, dedupe
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.codePoints().toArray.foreach(c => h = (h ^ c) * 0x100000001b3L)
      h
    }
    // deletions are CODE-POINT-wise (the kernel never splits a
    // surrogate pair), so the reference enumerates code-point vectors
    def variants(s: String, d: Int): Set[Long] = {
      def del(cur: Vector[Int], left: Int): Set[Vector[Int]] =
        if (left == 0) Set(cur)
        else cur.indices.flatMap(i =>
          del(cur.patch(i, Nil, 1), left - 1)).toSet + cur
      del(s.codePoints().toArray.toVector, d)
        .map(v => fnv(new String(v.toArray, 0, v.length)))
    }
    val rnd = new scala.util.Random(97)
    val alphabet = "abcé𝒳" // includes a surrogate-pair code point
    val strs = (0 until 120).map(_ =>
      (0 until rnd.nextInt(9)).map(_ => alphabet(rnd.nextInt(4)).toString)
        .mkString + (if (rnd.nextBoolean()) "𝒳" else "")) :+ "" :+ "𝒳𝒳"
    for (d <- Seq(0, 1, 2)) {
      val got = strs.toDF("s")
        .select(col("s"), graft.functions.TextExpressions
          .deletionNeighborhood(col("s"), d).as("v"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      strs.distinct.foreach { s =>
        assert(got(s).toSet == variants(s, d), s"d=$d s='$s'")
        assert(got(s).distinct.size == got(s).size, s"dupes emitted for '$s'")
      }
    }
  }

  test("pairs respect block boundaries even for identical strings") {
    import spark.implicits._
    val df = Seq((1L, "same name", 1), (2L, "same name", 2))
      .toDF("id", "name", "blk")
    val got = Entity.editDistancePairs(df, maxDist = 2,
      idCol = "id", strCol = "name", blockCols = Seq("blk")).count()
    assert(got == 0, "identical strings in different blocks must not pair")
  }
}
