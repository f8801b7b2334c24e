package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional clustering used by
  * large-table formats (Delta OPTIMIZE ZORDER, Hudi/Iceberg clustering) so
  * that file-level min/max statistics prune scans on EVERY clustered
  * dimension, not just the leading sort key.
  *
  * At 100 TB the layout IS the index: a table written in time order
  * answers time-range predicates with a handful of files but must scan
  * everything for a user-slice predicate; interleaving the bits of
  * (user, time) keeps both dimensions' value ranges bounded within each
  * file, so either predicate prunes ~√-proportionally. The registered
  * query `ev_zorder_pruning` measures exactly that trade on real data:
  * files touched per (layout × predicate) in one scan.
  *
  * Everything here is plain integer Column arithmetic — codegen'd for
  * free, shuffle-free (the z-value is a per-row expression; file
  * assignment is a bit prefix), and bit-identical in any engine, which is
  * what makes the DuckDB oracle exact.
  */
object Layout {

  /** Floor division for non-negative longs, exact at any magnitude:
    * `(a - a mod b) / b` keeps the double division exact because the
    * numerator is exactly divisible (the quotient, not the operands, must
    * fit 2^53 — here quotients are ≤ 2^16).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Quantize `v ∈ [lo, hi]` to the 16-bit grid `[0, 65536)` by exact
    * integer range scaling — the rank-free analog of the range-partition
    * ids real z-order writers use.
    */
  def quantize16(v: Column, lo: Column, hi: Column): Column =
    idiv((v - lo) * lit(65536L), hi - lo + lit(1L))

  /** Spread the low 16 bits of `v` to the even bit positions (the
    * standard mask-chain bit spread).
    */
  def spread16(v: Column): Column = {
    val a = v.bitwiseAND(lit(65535L))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(16711935L))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(252645135L))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(858993459L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(1431655765L))
  }

  /** 32-bit Morton interleave of two 16-bit values: x on even bits, y on
    * odd bits.
    */
  def zvalue16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** File id under z-order clustering into `4^g` files: the top `2g` bits
    * of the 32-bit z-value, i.e. a `2^g × 2^g` grid cell. Writing is then
    * `df.repartitionByRange(col("zfile")).sortWithinPartitions("z")`.
    */
  def zfile(z: Column, gridBits: Int): Column =
    shiftright(z, 32 - 2 * gridBits)

  /** File id under the linear (time-major) layout with the same file
    * count — the top bits of the leading sort dimension.
    */
  def linearFile(y16: Column, gridBits: Int): Column =
    shiftright(y16, 16 - 2 * gridBits)

  /** Hilbert-curve position of 16-bit `(x, y)` — the native kernel
    * (`functions.SpatialExpressions.HilbertIndex`, whole-stage codegen);
    * locality upgrade over [[zvalue16]].
    */
  def hvalue16(x: Column, y: Column): Column =
    graft.functions.SpatialExpressions.hilbertIndex(x, y)

  /** File id under Hilbert clustering into `4^g` files — top `2g` bits of
    * the 32-bit curve position; each file is a CONTIGUOUS curve segment,
    * hence a connected region of the grid.
    */
  def hfile(h: Column, gridBits: Int): Column =
    shiftright(h, 32 - 2 * gridBits)

  /** DuckDB replay of [[graft.functions.SpatialExpressions.HilbertIndex]]:
    * the 16 xy2d rounds unrolled as chained CTEs. `from` must provide
    * columns `zx, zy` (16-bit ints) plus any carry columns listed in
    * `carry`; the final CTE `hilbert` exposes `carry..., zx, zy, hd`.
    */
  def hilbertOracleSteps(from: String, carry: Seq[String]): String = {
    val c = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    val n1 = 65535
    val steps = (0 until 16).map { k =>
      val s = 32768 >> k
      val prev = s"h$k"
      // gray increment: rx=0 → ry ; rx=1 → 3−ry
      s"""h${k + 1} AS (SELECT $c zx, zy,
         CASE WHEN (hy & $s) > 0 THEN hx
              ELSE CASE WHEN (hx & $s) > 0 THEN $n1 - hy ELSE hy END END AS hx,
         CASE WHEN (hy & $s) > 0 THEN hy
              ELSE CASE WHEN (hx & $s) > 0 THEN $n1 - hx ELSE hx END END AS hy,
         hd + CAST(${s.toLong * s} AS BIGINT) * (CASE WHEN (hx & $s) > 0
             THEN 3 - (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)
             ELSE (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END) END) AS hd
         FROM $prev)"""
    }.mkString(",\n       ")
    s"""h0 AS (SELECT $c zx, zy, zx AS hx, zy AS hy, CAST(0 AS BIGINT) AS hd FROM $from),
       $steps,
       hilbert AS (SELECT $c zx, zy, hd FROM h16)"""
  }
}
