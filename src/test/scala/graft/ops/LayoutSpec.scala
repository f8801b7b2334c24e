package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  import spark.implicits._

  /** Bit-by-bit reference interleave. */
  private def mortonRef(x: Int, y: Int): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  test("zvalue16 matches the bit-by-bit reference on boundary + random-ish grid") {
    val pts = Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535),
      (1, 2), (21845, 43690), (12345, 54321), (32768, 32767))
    val df = pts.toDF("x", "y")
      .withColumn("z", Layout.zvalue16(col("x").cast("long"), col("y").cast("long")))
    val got = df.select("x", "y", "z").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"($x,$y)")
    }
  }

  test("quantize16 is exact floor scaling onto [0, 65536)") {
    val df = Seq((0L, 0L, 149L), (149L, 0L, 149L), (75L, 0L, 149L),
      (1704067207L, 1704067200L, 1706659032L))
      .toDF("v", "lo", "hi")
      .withColumn("q", Layout.quantize16(col("v"), col("lo"), col("hi")))
    val got = df.select("v", "lo", "hi", "q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (v, lo, hi, q) =>
      val expect = (v - lo) * 65536L / (hi - lo + 1)
      assert(q == expect && q >= 0 && q < 65536, s"v=$v")
    }
  }

  test("z grid files bound BOTH dimensions; linear files bound only the leading one") {
    // a dense 64×64 grid of (x, y) points scaled onto the 16-bit domain
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x * 1024L, y * 1024L)
    val df = pts.toDF("zx", "zy")
      .withColumn("zfile", Layout.zfile(Layout.zvalue16(col("zx"), col("zy")), 3))
      .withColumn("lfile", Layout.linearFile(col("zy"), 3))
    val spans = df.groupBy("zfile")
      .agg(max("zx") - min("zx"), max("zy") - min("zy"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // each of the 64 z-cells spans at most 1/8 of each dimension
    assert(spans.length == 64)
    spans.foreach { case (sx, sy) =>
      assert(sx <= 8192 && sy <= 8192, s"cell spans ($sx, $sy)")
    }
    val lSpans = df.groupBy("lfile")
      .agg(max("zx") - min("zx"), max("zy") - min("zy"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // linear files are tight in y but span the FULL x domain
    assert(lSpans.forall { case (sx, sy) => sy <= 1024 && sx >= 63 * 1024 })
  }

  test("a non-leading-dimension slice touches 8x fewer z files than linear files") {
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x * 1024L, y * 1024L)
    val df = pts.toDF("zx", "zy")
      .withColumn("zfile", Layout.zfile(Layout.zvalue16(col("zx"), col("zy")), 3))
      .withColumn("lfile", Layout.linearFile(col("zy"), 3))
      .where(col("zx") < 8192)
    val zTouched = df.select("zfile").distinct().count()
    val lTouched = df.select("lfile").distinct().count()
    assert(zTouched == 8 && lTouched == 64, s"z=$zTouched linear=$lTouched")
  }
}
