package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve kernels for multi-dimensional data layout.
  *
  * The Hilbert curve is the locality upgrade over Morton/z-order
  * ([[graft.ops.Layout]]): consecutive curve positions are ALWAYS grid
  * neighbors (no z-curve "seam jumps"), so a contiguous file of curve
  * positions is a connected region — tighter per-file bounding boxes and
  * better min/max pruning on both dimensions. This is the direction
  * production clustering went (e.g. Hilbert-based liquid clustering)
  * precisely because of the seam behavior z-order exhibits at cell
  * boundaries.
  */
object SpatialExpressions {

  /** Position of 16-bit `(x, y)` on the order-16 Hilbert curve — the
    * classic xy2d quadrant-rotation recurrence (public domain), fixed at
    * 16 rounds so the result is a pure integer function both engines can
    * replay (the DuckDB oracle unrolls the identical 16 steps as chained
    * CTEs; see `Layout.hilbertOracleSteps`).
    */
  case class HilbertIndex(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "hilbert_index"

    override def nullSafeEval(l: Any, r: Any): Any =
      HilbertIndex.compute(l.asInstanceOf[Long], r.asInstanceOf[Long])

    // static call on the object's BINARY name keeps the stage in
    // whole-stage codegen (same move as EditDistanceWithin — a
    // CodegenFallback would drop the whole projection to the interpreter)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = ${HilbertIndex.getClass.getName}.MODULE$$.compute($a, $b);")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  object HilbertIndex {
    final val N = 65536 // grid side: order-16 curve

    /** xy2d: 16 rounds of (read quadrant bit, accumulate s²·gray, rotate).
      * Distance fits 32 bits (≤ N²−1), carried as Long.
      */
    def compute(x0: Long, y0: Long): Long = {
      var x = (x0 & 0xFFFFL).toInt
      var y = (y0 & 0xFFFFL).toInt
      var d = 0L
      var s = N / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) { // rotate quadrant
          if (rx == 1) { x = N - 1 - x; y = N - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }

    /** d2xy inverse (spec-side oracle for the roundtrip + adjacency
      * properties; not used in query plans).
      */
    def inverse(d0: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      var t = d0
      var s = 1L
      while (s < N) {
        val rx = (t / 2) & 1
        val ry = (t ^ rx) & 1
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val tmp = x; x = y; y = tmp
        }
        x += s * rx
        y += s * ry
        t /= 4
        s *= 2
      }
      (x, y)
    }
  }

  def hilbertIndex(x: Column, y: Column): Column =
    ColumnBridge.column(
      HilbertIndex(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
