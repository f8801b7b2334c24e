package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SpatialExpressions.HilbertIndex
import graft.ops.Layout

class SpatialSpec extends SparkSpec {

  import spark.implicits._

  test("xy2d and d2xy are mutual inverses across the grid (incl. boundaries)") {
    val pts = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
      (32768L, 32767L), (12345L, 54321L), (1L, 0L), (0L, 1L))
    pts.foreach { case (x, y) =>
      val d = HilbertIndex.compute(x, y)
      assert(HilbertIndex.inverse(d) == ((x, y)), s"($x,$y) d=$d")
      assert(d >= 0L && d < (1L << 32))
    }
    // corners of the order-16 curve: start at (0,0), end at (65535,0)
    assert(HilbertIndex.compute(0, 0) == 0L)
    assert(HilbertIndex.compute(65535, 0) == (1L << 32) - 1)
  }

  test("unit-step locality: consecutive curve positions are ALWAYS grid neighbors") {
    // the property z-order lacks (its seams jump arbitrarily far)
    val samples = (0 until 4000).map(i => i.toLong * 1073741L) // spread over [0, 2^32)
    samples.foreach { d =>
      val (x1, y1) = HilbertIndex.inverse(d)
      val (x2, y2) = HilbertIndex.inverse(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
  }

  test("codegen path ≡ interpreted compute") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x * 1024L, y * 1024L)
    val viaDf = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.hvalue16(col("x"), col("y")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(viaDf((x, y)) == HilbertIndex.compute(x, y), s"($x,$y)")
    }
  }

  test("hilbert cells bound both dimensions at least as tightly as z cells") {
    val pts = (for (x <- 0 until 128; y <- 0 until 128) yield (x * 512L, y * 512L)).toSeq
    val df = pts.toDF("zx", "zy")
      .withColumn("hf", Layout.hfile(Layout.hvalue16(col("zx"), col("zy")), 3))
      .withColumn("zf", Layout.zfile(Layout.zvalue16(col("zx"), col("zy")), 3))
    def maxSpan(fileCol: String): Long = df.groupBy(fileCol)
      .agg((max("zx") - min("zx") + max("zy") - min("zy")).as("span"))
      .agg(max("span")).collect()(0).getLong(0)
    val (hSpan, zSpan) = (maxSpan("hf"), maxSpan("zf"))
    // 64 files over the 16-bit grid: each z cell spans exactly 8k+8k;
    // hilbert segments are connected, spans stay in the same ballpark
    assert(hSpan <= zSpan + 8192, s"hilbert span $hSpan vs z span $zSpan")
    assert(df.select("hf").distinct().count() == 64)
  }
}
