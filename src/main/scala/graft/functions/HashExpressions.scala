package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing kernels for the dedup pipeline. These are
  * `CodegenFallback` (one interpreted call per ROW), but their `eval` is a
  * single tight loop over the token array — unlike the higher-order-
  * function formulation, which pays an interpreted expression-tree walk
  * per ELEMENT (and per hash permutation). Hashes match the builtin
  * `xxhash64(...)` (same XxHash64Function, seed 42).
  */
object HashExpressions {

  private val XxSeed = 42L

  /** Hashes of the `w`-token shingles of a token array → array<long>
    * (deduplicated). Shingle text is the space-joined token run, matching
    * `xxhash64(concat_ws(" ", slice(tokens, i, w)))`.
    */
  case class ShingleHashes(child: Expression, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(w >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(v: Any): Any = {
      val toks = v.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val count = math.max(n - w + 1, if (n == 0) 0 else 1)
      val seen = new java.util.HashSet[Long]()
      val out = new Array[Long](count)
      var k = 0
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < w && i + j < n) {
          if (j > 0) sb.append(' ')
          val t = toks.getUTF8String(i + j)
          if (t != null) sb.append(t.toString)
          j += 1
        }
        val h = XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, XxSeed)
        if (seen.add(h)) { out(k) = h; k += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash over a token array: per-token xxhash64, each bit votes
    * ±1, fingerprint takes the sign bit.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(v: Any): Any = {
      val toks = v.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val votes = new Array[Int](64)
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i)
        if (t != null) {
          val h = XxHash64Function.hash(t, StringType, XxSeed)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Polynomial rolling hash over a string's bytes, modulo 2^31−1 —
    * order-sensitive content fingerprint. Operating on the UTF8String
    * directly avoids materializing a per-character array (the HOF
    * formulation split the text and walked an interpreted tree per char).
    */
  case class RollingHash(child: Expression, base: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash"
    private val Prime = 2147483647L

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var acc = 0L
      var i = 0
      while (i < bytes.length) {
        acc = (acc * base + (bytes(i) & 0xFF)) % Prime
        i += 1
      }
      acc
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Prefix-filter tokens for an exact Jaccard-threshold join (AllPairs/
    * PPJoin): sorts the document's (distinct) token array by the canonical
    * order (dictionary rank ascending, then token; tokens outside the
    * dictionary share rank 0, so rare tokens fill the prefix) and keeps the
    * first `n − floor(threshold·n) + 1` — any pair at Jaccard ≥ threshold
    * must share one of these. The rank dictionary (the top-K most frequent
    * tokens, most frequent = highest rank = sorted last) is a constructor
    * constant: one bounded map per executor, no token-level shuffle join
    * and no per-document window — the whole prefix computation is narrow.
    */
  case class PrefixTokens(child: Expression, ranks: Map[String, Int], threshold: Double)
      extends UnaryExpression with CodegenFallback {
    require(threshold > 0.0 && threshold <= 1.0)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "prefix_tokens"

    @transient private lazy val rankMap: java.util.HashMap[UTF8String, Integer] = {
      val m = new java.util.HashMap[UTF8String, Integer](ranks.size * 2)
      ranks.foreach { case (k, v) => m.put(UTF8String.fromString(k), Integer.valueOf(v)) }
      m
    }

    override def nullSafeEval(v: Any): Any = {
      val toks = v.asInstanceOf[ArrayData]
      val nIn = toks.numElements()
      // drop null elements (possible from the SQL surface; split() never
      // produces them) — the comparator and output type are null-free
      val arr = new Array[UTF8String](nIn)
      var n = 0
      var i = 0
      while (i < nIn) {
        val t = toks.getUTF8String(i)
        if (t != null) { arr(n) = t; n += 1 }
        i += 1
      }
      // floor (not ceil) keeps the prefix one token longer than the tight
      // bound when threshold·n is integral — immune to FP rounding of the
      // product, still lossless
      val plen = math.min(n, n - math.floor(threshold * n).toInt + 1)
      java.util.Arrays.sort(arr, 0, n, new java.util.Comparator[UTF8String] {
        override def compare(a: UTF8String, b: UTF8String): Int = {
          val ra = rankMap.getOrDefault(a, 0).intValue()
          val rb = rankMap.getOrDefault(b, 0).intValue()
          if (ra != rb) Integer.compare(ra, rb) else a.compareTo(b)
        }
      })
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(arr, plen).asInstanceOf[Array[Any]])
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** |A ∩ B| of two SORTED, DISTINCT string arrays by a single merge walk
    * — O(|A|+|B|) with zero allocation, vs `size(array_intersect(...))`
    * which builds a hash set AND materializes the intersection array per
    * call. This is the exact-verify kernel of the pair pipeline, invoked
    * once per CANDIDATE. Neutral on the ≤30-distinct-token fixture corpus
    * (measured — candidate generation dominates there); it targets real
    * documents with hundreds+ of distinct tokens, where the per-pair
    * hash-set build is the verify cost. Precondition: both inputs
    * ascending by UTF8String binary order with no duplicates — exactly
    * what `array_sort(array_distinct(...))` produces (Spark's string
    * ordering IS the UTF8 binary order).
    */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sorted_intersect_size"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      var i = 0
      var j = 0
      var c = 0
      while (i < na && j < nb) {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
      c
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** A ∩ B of two SORTED, DISTINCT arrays (long or string elements) by
    * a single merge walk — the element-returning sibling of
    * [[SortedIntersectSize]], for consumers that need the common
    * MEMBERS, not just the count (the triangle edge-iterator: the
    * intersection of two out-adjacency lists IS the closing-vertex
    * set; vertex ids are longs on the raw graph, group keys on the
    * contracted one). O(|A|+|B|) comparisons and one exactly-sized
    * output array; `array_intersect` builds a hash set per call.
    * Precondition: both inputs ascending (the `sort_array` order — for
    * strings that is UTF8 binary order, which is also the order
    * Spark's `<` on strings and the merge walk's compareTo use), no
    * duplicates.
    */
  case class SortedIntersectElems(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    @transient private lazy val elemType: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType
    override def dataType: DataType = ArrayType(elemType, containsNull = false)
    override def prettyName: String = "sorted_intersect"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      elemType match {
        case LongType =>
          val out = new Array[Long](math.min(na, nb))
          var i = 0
          var j = 0
          var c = 0
          while (i < na && j < nb) {
            val va = a.getLong(i)
            val vb = b.getLong(j)
            if (va == vb) { out(c) = va; c += 1; i += 1; j += 1 }
            else if (va < vb) i += 1
            else j += 1
          }
          UnsafeArrayData.fromPrimitiveArray(
            if (c == out.length) out else java.util.Arrays.copyOf(out, c))
        case StringType =>
          val out = new Array[AnyRef](math.min(na, nb))
          var i = 0
          var j = 0
          var c = 0
          while (i < na && j < nb) {
            val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
            if (cmp == 0) { out(c) = a.getUTF8String(i); c += 1; i += 1; j += 1 }
            else if (cmp < 0) i += 1
            else j += 1
          }
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            if (c == out.length) out else java.util.Arrays.copyOf(out, c))
        case t => throw new IllegalArgumentException(
          s"sorted_intersect: unsupported element type $t")
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ---- Column API ----

  def shingleHashes(tokens: Column, w: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), w))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def rollingHash(text: Column, base: Long = 1000003L): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(text), base))

  def prefixTokens(tokens: Column, ranks: Map[String, Int], threshold: Double): Column =
    ColumnBridge.column(PrefixTokens(ColumnBridge.expression(tokens), ranks, threshold))

  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectElems(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
