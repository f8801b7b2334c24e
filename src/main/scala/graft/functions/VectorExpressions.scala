package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector kernels on the ANN hot path.
  *
  * Spark's higher-order array functions (`aggregate`, `zip_with`, …) are
  * `CodegenFallback`: every element access walks an interpreted expression
  * tree. For an O(pairs · dim) kernel that overhead dominates, so these
  * expressions implement both `eval` and `doGenCode` as tight loops over
  * the unsafe array data — constant work per element either way.
  */
object VectorExpressions {

  private def elemGetter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _)  => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case other => throw new IllegalArgumentException(s"unsupported array type $other")
  }

  private def javaGetter(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _)  => s"(double)$arr.getFloat($i)"
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(s"unsupported array type $other")
  }

  /** dot(a, b) over float/double arrays, accumulated in double.
    * Length-mismatched inputs and null elements yield NULL (a dot product
    * over them is undefined, and this exactly matches the zip_with +
    * aggregate formulation, which [[KernelRewriteRules]] rewrites into
    * this kernel — the null-element branch is never taken on real
    * embedding data and predicts perfectly).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    // Input typing is enforced by elemGetter (float/double arrays only);
    // ExpectsInputTypes is private[sql] in Spark 4, so no analyzer hook.
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "vec_dot"

    @transient private lazy val getL = elemGetter(left.dataType)
    @transient private lazy val getR = elemGetter(right.dataType)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += getL(x, i) * getR(y, i)
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val bad = ctx.freshName("bad")
        s"""
        int $n = $a.numElements();
        boolean $bad = ($b.numElements() != $n);
        double $s = 0.0;
        for (int $i = 0; !$bad && $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
          $s += ${javaGetter(left.dataType, a, i)} * ${javaGetter(right.dataType, b, i)};
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Random-hyperplane sign signature: bit i of the result Long is
    * sign(dot(vec, planes[i·dim .. i·dim+dim))). The plane matrix is a
    * constructor constant (row-major), not a child — one fused loop nest,
    * no per-plane expression trees.
    */
  case class LshSignBits(child: Expression, planes: Array[Double],
                         nPlanes: Int, dim: Int)
      extends UnaryExpression {
    require(nPlanes <= 63 && planes.length == nPlanes * dim)
    override def dataType: DataType = LongType
    override def prettyName: String = "lsh_sign_bits"

    @transient private lazy val get = elemGetter(child.dataType)

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val d = math.min(dim, x.numElements())
      var sig = 0L
      var i = 0
      while (i < nPlanes) {
        var s = 0.0
        var j = 0
        val base = i * dim
        while (j < d) { s += get(x, j) * planes(base + j); j += 1 }
        if (s > 0) sig |= (1L << i)
        i += 1
      }
      sig
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val d = ctx.freshName("d")
        val sig = ctx.freshName("sig")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        s"""
        int $d = java.lang.Math.min($dim, $v.numElements());
        long $sig = 0L;
        for (int $i = 0; $i < $nPlanes; $i++) {
          double $s = 0.0;
          for (int $j = 0; $j < $d; $j++) {
            $s += ${javaGetter(child.dataType, v, j)} * $planesRef[$i * $dim + $j];
          }
          if ($s > 0) $sig |= (1L << $i);
        }
        ${ev.value} = $sig;
        """
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MinHash signature over pre-hashed shingles: out[i] =
    * min over h of ((h mod p)·a[i] + b[i]) mod p. One fused loop nest.
    */
  case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long], prime: Long)
      extends UnaryExpression {
    require(a.length == b.length)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override def nullSafeEval(v: Any): Any = {
      val hs = v.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val k = a.length
      val out = new Array[Long](k)
      java.util.Arrays.fill(out, prime)
      var j = 0
      while (j < n) {
        val h = ((hs.getLong(j) % prime) + prime) % prime
        var i = 0
        while (i < k) {
          val p = (h * a(i) + b(i)) % prime
          if (p < out(i)) out(i) = p
          i += 1
        }
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n")
        val k = ctx.freshName("k")
        val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val p = ctx.freshName("p")
        s"""
        int $n = $v.numElements();
        int $k = $aRef.length;
        long[] $out = new long[$k];
        java.util.Arrays.fill($out, ${prime}L);
        for (int $j = 0; $j < $n; $j++) {
          long $h = (($v.getLong($j) % ${prime}L) + ${prime}L) % ${prime}L;
          for (int $i = 0; $i < $k; $i++) {
            long $p = ($h * $aRef[$i] + $bRef[$i]) % ${prime}L;
            if ($p < $out[$i]) $out[$i] = $p;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        """
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Indices of the `nProbe` nearest centroids by L2 distance (ascending).
    * Centroid matrix is a constructor constant (row-major). Distances use
    * the ||v−c||² = ||v||² − 2v·c + ||c||² expansion with ||c||²
    * precomputed — one fused pass. CodegenFallback: the eval IS the tight
    * loop; per-row interpreted dispatch is noise next to k·dim work.
    */
  case class NearestCentroids(child: Expression, centroids: Array[Double],
                              nCentroids: Int, dim: Int, nProbe: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    require(centroids.length == nCentroids * dim && nProbe >= 1)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_centroids"

    @transient private lazy val get = elemGetter(child.dataType)
    @transient private lazy val centNorm2: Array[Double] = {
      val out = new Array[Double](nCentroids)
      var i = 0
      while (i < nCentroids) {
        var s = 0.0; var j = 0
        while (j < dim) { val c = centroids(i * dim + j); s += c * c; j += 1 }
        out(i) = s; i += 1
      }
      out
    }

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val d = math.min(dim, x.numElements())
      val score = new Array[Double](nCentroids) // −2v·c + ||c||² (v² constant)
      var i = 0
      while (i < nCentroids) {
        var dot = 0.0; var j = 0
        val base = i * dim
        while (j < d) { dot += get(x, j) * centroids(base + j); j += 1 }
        score(i) = centNorm2(i) - 2.0 * dot
        i += 1
      }
      val p = math.min(nProbe, nCentroids)
      val idx = Array.range(0, nCentroids).sortBy(i => (score(i), i)).take(p)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(idx)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column API ----

  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(expr(a), expr(b)))

  def lshSignBits(vec: Column, planes: Array[Double], nPlanes: Int, dim: Int): Column =
    ColumnBridge.column(LshSignBits(expr(vec), planes, nPlanes, dim))

  def minhashSig(shingleHashes: Column, a: Array[Long], b: Array[Long], prime: Long): Column =
    ColumnBridge.column(MinHashSig(expr(shingleHashes), a, b, prime))

  def nearestCentroids(vec: Column, centroids: Array[Double], nCentroids: Int,
                       dim: Int, nProbe: Int): Column =
    ColumnBridge.column(NearestCentroids(expr(vec), centroids, nCentroids, dim, nProbe))

  /** CELL-LOCAL SemDeDup dominance — the whole within-cell pass as one
    * kernel over a cell's collected members, so the pairwise volume
    * (Σ|cell|² at corpus level) is TASK-LOCAL COMPUTE instead of
    * shuffled candidate rows. The previous join formulation moved every
    * candidate pair across an exchange carrying a vector payload —
    * measured at the sf10 ladder point (200k × 64-dim, √n cells) that
    * shuffle exceeded 76 GB of local spill and could not complete on
    * one box, while the total vector payload is 51 MB; this kernel
    * shuffles each vector exactly once (the cluster groupBy) and does
    * the |cell|²/2 dot products in the cell's own task with early exit
    * at the first dominator.
    *
    * Input: `array<struct<id: bigint, standing: boolean, vec:
    * array<float>>>` in ANY order (collect_list order is
    * partition-dependent; the kernel sorts internally — standing
    * members first, then by ascending id — so output is
    * partition-invariant). A member is DOMINATED when some member
    * earlier in that order clears `cos ≥ tau`: standing members
    * dominate every batch member regardless of id (they are already in
    * the corpus), batch members dominate larger-id batch members, and a
    * dominator need not itself survive — exactly the
    * [[graft.sim.Ivf.semDeDup]] / `semDeDupIncremental` rule. Cosine
    * arithmetic mirrors [[DotProduct]] / `Similarity.cosine` bit-form:
    * double accumulation in index order, `dot / (sqrt(n2a) · sqrt(n2b))`
    * — so oracle replays are unchanged.
    *
    * Output: `array<struct<id: bigint, kept: boolean>>` for the
    * NON-standing members only, ascending id. Per-task state is the
    * cell's vectors as doubles (|cell|·dim·8 B — megabytes under a
    * √n-adaptive nlist); a pathologically hot cell is one task's
    * compute, which is what [[graft.sim.IvfStore.splitCell]] (fed by
    * `cellHealth`) exists to repair.
    */
  case class CellDominance(child: Expression, tau: Double)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("kept", BooleanType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "cell_dominance"

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ids = new Array[Long](n)
      val standing = new Array[Boolean](n)
      val vecs = new Array[Array[Double]](n)
      val norms = new Array[Double](n)
      var i = 0
      while (i < n) {
        val row = arr.getStruct(i, 3)
        ids(i) = row.getLong(0)
        standing(i) = row.getBoolean(1)
        val fa = row.getArray(2)
        val d = fa.numElements()
        val dv = new Array[Double](d)
        var j = 0
        var n2 = 0.0
        while (j < d) {
          val x = fa.getFloat(j).toDouble
          dv(j) = x
          n2 += x * x
          j += 1
        }
        vecs(i) = dv
        norms(i) = math.sqrt(n2)
        i += 1
      }
      // dominance order: standing first, then ascending id — the prefix
      // of each member is exactly its admissible dominator set
      val order = Array.range(0, n).sortBy(k => (!standing(k), ids(k)))
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var p = 0
      while (p < n) {
        val j = order(p)
        if (!standing(j)) {
          var dominated = false
          var q = 0
          while (q < p && !dominated) {
            val k = order(q)
            val a = vecs(k); val b = vecs(j)
            val d = math.min(a.length, b.length)
            var s = 0.0
            var t = 0
            while (t < d) { s += a(t) * b(t); t += 1 }
            if (s / (norms(k) * norms(j)) >= tau) dominated = true
            q += 1
          }
          out += org.apache.spark.sql.catalyst.InternalRow(ids(j), !dominated)
        }
        p += 1
      }
      // batch members were visited in ascending id order already
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def cellDominance(members: Column, tau: Double): Column =
    ColumnBridge.column(CellDominance(ColumnBridge.expression(members), tau))

  /** GRID-CELL partial of [[CellDominance]] — the hot-cell fallback of
    * the cell-local dedup kernels ([[graft.sim.Ivf.semDeDup]]'s census
    * guard): when an IVF cell outgrows the per-task bound, its members
    * are grid-salted (the [[graft.text.Dedup]] hot-bucket idiom — row x
    * with salt g rides the DOMINATOR role to grid rows (g, *) and, if
    * non-standing, the CANDIDATE role to (*, g)), so each ordered pair
    * meets in exactly ONE grid cell and this kernel scores only its
    * |dominators|·|candidates| slice. A candidate j is dominated HERE
    * when some dominator k admissible under the global order (standing,
    * or smaller id — self excluded by strictness) clears `cos ≥ tau`;
    * the global verdict is the OR of j's G partials, which the caller
    * aggregates (`bool_or`) — OR over any partition of the dominator
    * set is exactly the unsalted ∃, so the guard is lossless by
    * construction. Early exit at the first dominator, as the full
    * kernel.
    *
    * Input: `array<struct<id: bigint, standing: boolean, dom: boolean,
    * vec: array<float>>>` in any order. Output: `array<struct<id:
    * bigint, dominated: boolean>>` for the dom = false rows, ascending
    * id. Per-task state is one grid cell's vectors — (|cell|/G)·dim·8 B
    * per role side.
    */
  case class CellDominancePartial(child: Expression, tau: Double)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dominated", BooleanType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "cell_dominance_partial"

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ids = new Array[Long](n)
      val standing = new Array[Boolean](n)
      val isDom = new Array[Boolean](n)
      val vecs = new Array[Array[Double]](n)
      val norms = new Array[Double](n)
      var i = 0
      while (i < n) {
        val row = arr.getStruct(i, 4)
        ids(i) = row.getLong(0)
        standing(i) = row.getBoolean(1)
        isDom(i) = row.getBoolean(2)
        val fa = row.getArray(3)
        val d = fa.numElements()
        val dv = new Array[Double](d)
        var j = 0
        var n2 = 0.0
        while (j < d) {
          val x = fa.getFloat(j).toDouble
          dv(j) = x
          n2 += x * x
          j += 1
        }
        vecs(i) = dv
        norms(i) = math.sqrt(n2)
        i += 1
      }
      val doms = Array.range(0, n).filter(isDom(_))
      val cands = Array.range(0, n).filter(!isDom(_)).sortBy(ids(_))
      val out = new scala.collection.mutable.ArrayBuffer[Any](cands.length)
      cands.foreach { j =>
        var dominated = false
        var q = 0
        while (q < doms.length && !dominated) {
          val k = doms(q)
          // admissible under the global dominance order: standing beats
          // every batch member; batch beats strictly-larger batch ids
          // (id equality = the member's own dominator-role copy: skip)
          if (standing(k) || ids(k) < ids(j)) {
            val a = vecs(k); val b = vecs(j)
            val d = math.min(a.length, b.length)
            var s = 0.0
            var t = 0
            while (t < d) { s += a(t) * b(t); t += 1 }
            if (s / (norms(k) * norms(j)) >= tau) dominated = true
          }
          q += 1
        }
        out += org.apache.spark.sql.catalyst.InternalRow(ids(j), dominated)
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def cellDominancePartial(members: Column, tau: Double): Column =
    ColumnBridge.column(CellDominancePartial(ColumnBridge.expression(members), tau))

  /** CELL-LOCAL partial top-k for the kNN graph — the [[CellDominance]]
    * treatment applied to [[graft.sim.Ivf.knnGraph]]: the cell's task
    * holds its MEMBERS (corpus vectors assigned here, `probe = false`)
    * and its VISITORS (vectors probing this cell, `probe = true`) and
    * emits each visitor's top-`k` members by (cos desc, id asc) —
    * k·|visitors| rows out of |members|·|visitors| local dot products.
    * The global top-k per query is the top-k of its ≤ nProbe·k partials
    * under the SAME total order (any global winner beats every
    * same-cell rival, so it survives its cell's cut), which the
    * downstream `TopKByScore` aggregation computes — so the result is
    * row-identical to the join formulation while NO candidate row ever
    * rides an exchange: the previous shape shuffled the n^1.5-sized
    * candidate id stream twice (the two payload join-backs) — 17 GB at
    * the sf10 ladder point, petabyte-class at 10⁹ vectors — where the
    * union frame here moves n·(1+nProbe) vector rows once.
    *
    * Input: `array<struct<id: bigint, probe: boolean, vec:
    * array<float>>>` in any order (sorted internally — deterministic,
    * partition-invariant). Self-pairs (visitor id = member id) are
    * skipped. Cosine arithmetic mirrors [[DotProduct]] bit-form.
    * Output: `array<struct<q_id: bigint, n_id: bigint, cos: double>>`.
    */
  case class CellTopK(child: Expression, k: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    require(k >= 1)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("q_id", LongType, nullable = false),
      StructField("n_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "cell_topk"

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ids = new Array[Long](n)
      val probe = new Array[Boolean](n)
      val vecs = new Array[Array[Double]](n)
      val norms = new Array[Double](n)
      var i = 0
      while (i < n) {
        val row = arr.getStruct(i, 3)
        ids(i) = row.getLong(0)
        probe(i) = row.getBoolean(1)
        val fa = row.getArray(2)
        val d = fa.numElements()
        val dv = new Array[Double](d)
        var j = 0
        var n2 = 0.0
        while (j < d) {
          val x = fa.getFloat(j).toDouble
          dv(j) = x
          n2 += x * x
          j += 1
        }
        vecs(i) = dv
        norms(i) = math.sqrt(n2)
        i += 1
      }
      val members = Array.range(0, n).filter(!probe(_)).sortBy(ids(_))
      val visitors = Array.range(0, n).filter(probe(_)).sortBy(ids(_))
      val out = new scala.collection.mutable.ArrayBuffer[Any](visitors.length * k)
      // bounded insertion top-k per visitor: (cos desc, id asc)
      val topCos = new Array[Double](k)
      val topId = new Array[Long](k)
      visitors.foreach { q =>
        var size = 0
        members.foreach { m =>
          if (ids(m) != ids(q)) {
            val a = vecs(q); val b = vecs(m)
            val d = math.min(a.length, b.length)
            var s = 0.0
            var t = 0
            while (t < d) { s += a(t) * b(t); t += 1 }
            val cos = s / (norms(q) * norms(m))
            if (size < k || cos > topCos(size - 1) ||
                (cos == topCos(size - 1) && ids(m) < topId(size - 1))) {
              var p = math.min(size, k - 1)
              while (p > 0 && (topCos(p - 1) < cos ||
                     (topCos(p - 1) == cos && topId(p - 1) > ids(m)))) {
                topCos(p) = topCos(p - 1); topId(p) = topId(p - 1); p -= 1
              }
              topCos(p) = cos; topId(p) = ids(m)
              if (size < k) size += 1
            }
          }
        }
        var r = 0
        while (r < size) {
          out += org.apache.spark.sql.catalyst.InternalRow(
            ids(q), topId(r), topCos(r))
          r += 1
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def cellTopK(members: Column, k: Int): Column =
    ColumnBridge.column(CellTopK(ColumnBridge.expression(members), k))
}
