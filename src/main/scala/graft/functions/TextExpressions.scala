package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text analysis: language ID (stopword + character
  * bigram), quality-score components, and BPE-ish token count in a handful
  * of passes over the string — replacing a tree of ~60 interpreted
  * higher-order/`replace` traversals per row (Spark's array HOFs are
  * CodegenFallback, and each `replace`-based substring count allocates a
  * full copy of the text).
  *
  * Semantics are bit-compatible with the composed `graft.text.Text`
  * expressions (TextSpec asserts equality on the fixture corpus):
  * tokenization is `split("\\s+", -1)` exactly, bigram counts equal the
  * non-overlapping `replace` counter (profiles must not contain
  * self-overlapping bigrams — enforced), and the argmax tie-break is the
  * lexicographically largest language, as the sorted-struct formulation
  * produced.
  */
object TextExpressions {

  case class TextFeatures(child: Expression,
                          stopProfiles: Seq[(String, Seq[String])],
                          bigramProfiles: Seq[(String, Seq[String])])
      extends UnaryExpression with CodegenFallback {

    // sliding-window bigram counting equals the replace-based
    // non-overlapping count ONLY for non-self-overlapping needles
    require(bigramProfiles.forall(_._2.forall(bg => bg.length == 2 && bg(0) != bg(1))),
      "bigram profiles must be 2 distinct chars (overlap-free counting)")

    override def dataType: DataType = StructType(Seq(
      StructField("stop_lang", StringType, nullable = false),
      StructField("ngram_lang", StringType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("distinct_tokens", IntegerType, nullable = false),
      StructField("n_chars", IntegerType, nullable = false),
      StructField("punct_chars", IntegerType, nullable = false),
      StructField("digit_chars", IntegerType, nullable = false),
      StructField("bpe_tokens", IntegerType, nullable = false)))
    override def prettyName: String = "text_features"

    @transient private lazy val stopLangs: Array[String] =
      stopProfiles.map(_._1).sorted.toArray
    @transient private lazy val stopSets: Array[java.util.HashSet[String]] =
      stopLangs.map { l =>
        val s = new java.util.HashSet[String]()
        stopProfiles.toMap.apply(l).foreach(s.add)
        s
      }
    @transient private lazy val ngramLangs: Array[String] =
      bigramProfiles.map(_._1).sorted.toArray
    // bigram (as 2-char key packed into an Int) → indices of languages
    // listing it: the counting pass is one map probe per position
    @transient private lazy val bigramIndex: java.util.HashMap[Integer, Array[Int]] = {
      val m = new java.util.HashMap[Integer, Array[Int]]()
      val byLang = bigramProfiles.toMap
      ngramLangs.zipWithIndex.foreach { case (l, i) =>
        byLang(l).foreach { bg =>
          val key = Integer.valueOf((bg(0) << 16) | bg(1))
          val prev = m.get(key)
          m.put(key, if (prev == null) Array(i) else prev :+ i)
        }
      }
      m
    }

    private def isPunct(c: Char): Boolean = // Java regex \p{Punct} (ASCII)
      (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
        (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

    /** Max-hits language, ties to the lexicographically largest (the order
      * `reverse(array_sort(struct(hits, lang)))[1]` produced); "und" when
      * no profile hits.
      */
    private def argmax(hits: Array[Int], langs: Array[String], cjk: Boolean): UTF8String = {
      if (cjk) return UTF8String.fromString("zh")
      var bi = -1
      var bh = 0
      var i = 0
      while (i < hits.length) {
        if (hits(i) > 0 && hits(i) >= bh) { bi = i; bh = hits(i) }
        i += 1
      }
      UTF8String.fromString(if (bi < 0) "und" else langs(bi))
    }

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      // lowercase through UTF8String itself — the exact code path Spark's
      // lower() takes (ASCII fast path, String.toLowerCase slow path) — so
      // the fused/composed equivalence holds by construction on any JVM
      // locale and any input, not just ASCII
      val lowered = v.asInstanceOf[UTF8String].toLowerCase.toString
      // token pass — split semantics identical to Spark's split(text,"\\s+")
      val toks = s.split("\\s+", -1)
      val lowToks = lowered.split("\\s+", -1)
      val distinct = new java.util.HashSet[String]()
      val stopHits = new Array[Int](stopLangs.length)
      var t = 0
      while (t < toks.length) {
        distinct.add(toks(t))
        var l = 0
        while (l < stopLangs.length) {
          if (stopSets(l).contains(lowToks(t))) stopHits(l) += 1
          l += 1
        }
        t += 1
      }
      // character pass — punct/digit/CJK + BPE state machine
      var punct = 0; var digit = 0; var bpe = 0
      var cjk = false
      var inLetterRun = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (isPunct(c)) punct += 1
        if (c >= '0' && c <= '9') digit += 1
        if (c >= '\u4e00' && c <= '\u9fff') cjk = true
        val isLetter = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        if (isLetter) { if (!inLetterRun) bpe += 1; inLetterRun = true }
        else {
          inLetterRun = false
          val isDigit = c >= '0' && c <= '9'
          val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
            c == '\f' || c == '\r'
          // low surrogates are the second half of a code point whose high
          // surrogate already counted — the regex form counts code points
          if ((isDigit || !isWs) && !Character.isLowSurrogate(c)) bpe += 1
        }
        i += 1
      }
      // bigram pass over the lowered text
      val ngramHits = new Array[Int](ngramLangs.length)
      i = 0
      while (i + 1 < lowered.length) {
        val langsAt = bigramIndex.get(Integer.valueOf((lowered.charAt(i) << 16) | lowered.charAt(i + 1)))
        if (langsAt != null) {
          var j = 0
          while (j < langsAt.length) { ngramHits(langsAt(j)) += 1; j += 1 }
        }
        i += 1
      }
      new GenericInternalRow(Array[Any](
        argmax(stopHits, stopLangs, cjk),
        argmax(ngramHits, ngramLangs, cjk),
        toks.length, distinct.size,
        v.asInstanceOf[UTF8String].numChars(), punct, digit, bpe))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def textFeatures(text: Column, stopProfiles: Map[String, Seq[String]],
                   bigramProfiles: Map[String, Seq[String]]): Column =
    ColumnBridge.column(TextFeatures(ColumnBridge.expression(text),
      stopProfiles.toSeq, bigramProfiles.toSeq))

  /** Space-joined word n-gram strings of a token array in ONE tight loop
    * per row. The `transform(sequence(...), …)` formulations walk an
    * interpreted expression tree per ELEMENT (HOFs are CodegenFallback);
    * this kernel is one JVM loop per row. Two short-input conventions,
    * matching the two composed formulations it replaces:
    *  - `emitShort = false` (bigrams/repetition): < w tokens → empty
    *    array (the caller drops gram-less docs);
    *  - `emitShort = true` (decontamination grams): < w tokens → ONE
    *    gram joining all tokens, like `slice(toks, 1, w)` over
    *    `sequence(0, greatest(n - w, 0))`.
    * End-to-end effect is modest where aggregation dominates
    * (`doc_repetition` ~20% at sf1); the point is keeping every per-token
    * path out of the interpreted HOF regime.
    */
  case class WordNgrams(child: Expression, w: Int, emitShort: Boolean)
      extends UnaryExpression with CodegenFallback {
    require(w >= 1)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_ngrams"

    private val space = UTF8String.fromString(" ")

    override def nullSafeEval(v: Any): Any = {
      val toks = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = toks.numElements()
      val count =
        if (n >= w) n - w + 1
        else if (emitShort) 1
        else 0
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        val width = math.min(w, n - i)
        val parts = new Array[UTF8String](width)
        var j = 0
        while (j < width) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def wordBigrams(toks: Column): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(toks), 2, emitShort = false))

  def wordNgrams(toks: Column, w: Int, emitShort: Boolean): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(toks), w, emitShort))

  /** BPE merge APPLICATION per text row — the encode half of the
    * tokenizer whose merge table [[graft.text.Text.bpeMerges]] learns.
    * Split on whitespace (the `Text.tokens` contract, empties dropped),
    * start each word as its code-point symbols, and apply the merge
    * list IN RANK ORDER, each merge replacing its leftmost-
    * non-overlapping occurrences — exactly the training fold's own
    * word-table evolution, so encoding the training corpus reproduces
    * the trainer's final word table symbol-for-symbol (and the DuckDB
    * oracle can replay it as the learned recurrence's last word table).
    * Heap-style min-rank encoders differ only when one symbol string is
    * producible by two distinct merges — a corner the rank-order
    * semantics resolves deterministically either way.
    *
    * One JVM loop per row (CodegenFallback, like every kernel here)
    * with a per-instance distinct-word memo: corpus words repeat
    * heavily, and re-folding M merges over a word seen a million times
    * is pure waste. The memo is CAPPED (cleared at 64k entries), so
    * executor memory stays bounded on an open vocabulary.
    */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    @transient private lazy val memo =
      new java.util.HashMap[String, Array[UTF8String]]()

    private def encodeWord(w: String): Array[UTF8String] = {
      var syms: Array[String] =
        w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      merges.foreach { case (a, b) =>
        if (syms.length >= 2) {
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toArray
        }
      }
      syms.map(UTF8String.fromString)
    }

    override def nullSafeEval(v: Any): Any = {
      val words = v.asInstanceOf[UTF8String].toString.split("\\s+")
      val out = new scala.collection.mutable.ArrayBuffer[Any]()
      var i = 0
      while (i < words.length) {
        val w = words(i)
        if (w.nonEmpty) {
          var enc = memo.get(w)
          if (enc == null) {
            if (memo.size() >= 65536) memo.clear()
            enc = encodeWord(w)
            memo.put(w, enc)
          }
          var j = 0
          while (j < enc.length) { out += enc(j); j += 1 }
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), merges))

  /** Deletion-neighborhood signature (FastSS / Mor–Fraenkel candidate
    * generation for bounded edit distance): the set of 64-bit hashes of
    * every string obtainable by deleting ≤ `d` code points, deduplicated.
    * If ed(a, b) ≤ d then — taking an optimal alignment and deleting from
    * each string its substituted/unaligned positions (≤ d per side) — a
    * and b share a deletion variant, so an equality join on these hashes
    * is a LOSSLESS candidate filter: candidates ⊇ true pairs, and the
    * banded DP verifies (a hash collision or a ed∈(d, 2d] near-miss just
    * adds a candidate, never drops one). This replaces the block² join
    * volume of a fuzzy-match block with |block|·C(len, ≤d) variant rows —
    * the right trade for SHORT match keys (names, titles: C(18,2)=153)
    * at d ≤ 2; long-text near-dup belongs to the shingle/MinHash family.
    * Hashes are FNV-1a over remaining code points — engine-internal only
    * (candidates never surface; output is DP-verified), so no oracle
    * replay obligation. Variants of one string that coincide (deleting
    * either of two equal adjacent chars) dedupe here, before the explode.
    */
  case class DeletionNeighborhood(child: Expression, d: Int)
      extends UnaryExpression with CodegenFallback {
    require(d >= 0 && d <= 3, "neighborhood generation is for small d")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "deletion_neighborhood"

    override def nullSafeEval(v: Any): Any = {
      val cps = v.asInstanceOf[UTF8String].toString.codePoints.toArray
      val n = cps.length
      val out = new java.util.TreeSet[java.lang.Long]()
      val skip = new Array[Int](math.max(d, 1))
      def hashSkipping(nSkip: Int): Long = {
        var h = 0xcbf29ce484222325L
        var i = 0; var k = 0
        while (i < n) {
          if (k < nSkip && skip(k) == i) k += 1
          else h = (h ^ cps(i)) * 0x100000001b3L
          i += 1
        }
        h
      }
      def rec(start: Int, k: Int, target: Int): Unit = {
        if (k == target) { out.add(hashSkipping(target)); return }
        var i = start
        while (i <= n - (target - k)) {
          skip(k) = i; rec(i + 1, k + 1, target); i += 1
        }
      }
      var t = 0
      val tMax = math.min(d, n)
      while (t <= tMax) { rec(0, 0, t); t += 1 }
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def deletionNeighborhood(s: Column, d: Int): Column =
    ColumnBridge.column(DeletionNeighborhood(ColumnBridge.expression(s), d))

  /** Bounded edit distance, `levenshtein(l, r, maxDist)`-compatible
    * (distance if ≤ maxDist, else −1; code-point semantics, matching
    * both Spark and DuckDB), but engineered for the near-duplicate case
    * the entity-resolution join feeds it: common prefix AND suffix strip
    * first — O(overlap) — and the DP that remains runs banded,
    * O(core·(2·maxDist+1)) instead of O(|a|·|b|). Records that collide
    * in a fuzzy-match block are near-identical BY CONSTRUCTION (that is
    * why they block together), so the affix strip usually eats most of
    * both strings and the banded DP sees a few characters — measured 5×
    * over the built-in threshold form on the customer fixture, where
    * every name shares a 12-char prefix.
    */
  case class EditDistanceWithin(left: Expression, right: Expression, maxDist: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    require(maxDist >= 0)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "edit_distance_within"

    override def nullSafeEval(l: Any, r: Any): Any =
      EditDistanceWithin.compute(
        l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], maxDist)

    // a static call keeps the surrounding stage in whole-stage codegen —
    // a CodegenFallback here would drop the entire post-join
    // filter/project stage to the interpreted path (measured 2× on the
    // fuzzy-join verify). The call site must use the object's BINARY name
    // (TextExpressions$EditDistanceWithin$.MODULE$) — the Scala source
    // path is not a Java-resolvable class, and Janino's failure mode is a
    // silent per-task fallback of the whole projection to interpreter
    // mode, not an error.
    override def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = ${EditDistanceWithin.getClass.getName}.MODULE$$" +
          s".compute($a, $b, $maxDist);")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  object EditDistanceWithin {
    /** Per-thread reusable buffers: the DP is a few dozen cells per pair,
      * so per-row allocation would dominate it. Tasks run one-per-thread,
      * so ThreadLocal scratch is race-free even if an expression instance
      * were shared.
      */
    final class Scratch {
      var a = new Array[Int](64)
      var b = new Array[Int](64)
      var prev = new Array[Int](64)
      var cur = new Array[Int](64)
      private def grow(old: Array[Int], n: Int) = new Array[Int](math.max(n, old.length * 2))
      def fitA(n: Int): Array[Int] = { if (a.length < n) a = grow(a, n); a }
      def fitB(n: Int): Array[Int] = { if (b.length < n) b = grow(b, n); b }
      def fitPrev(n: Int): Array[Int] = { if (prev.length < n) prev = grow(prev, n); prev }
      def fitCur(n: Int): Array[Int] = { if (cur.length < n) cur = grow(cur, n); cur }
    }
    private val scratch: ThreadLocal[Scratch] =
      ThreadLocal.withInitial(() => new Scratch)

    /** The kernel proper — called from both `eval` and generated code. */
    def compute(lu: UTF8String, ru: UTF8String, maxDist: Int): Int = {
      val sc = scratch.get()
      val aLen = fill(lu, sc.fitA(lu.numBytes), sc, left = true)
      val a = sc.a
      val bLen = fill(ru, sc.fitB(ru.numBytes), sc, left = false)
      val b = sc.b
      // strip the shared affixes: edit distance is invariant under
      // removing a common prefix/suffix
      var lo = 0
      var aHi = aLen
      var bHi = bLen
      while (lo < aHi && lo < bHi && a(lo) == b(lo)) lo += 1
      while (aHi > lo && bHi > lo && a(aHi - 1) == b(bHi - 1)) { aHi -= 1; bHi -= 1 }
      val aCore = aHi - lo
      val bCore = bHi - lo
      val (s, sLen, t, tLen) = // s is the shorter core
        if (aCore <= bCore) (a, aCore, b, bCore) else (b, bCore, a, aCore)
      if (tLen - sLen > maxDist) return -1
      if (sLen == 0) return tLen // ≤ maxDist by the check above
      // banded Levenshtein over the cores: cells beyond the band are ∞
      val INF = Int.MaxValue / 2
      var prev = sc.fitPrev(tLen + 1)
      var cur = sc.fitCur(tLen + 1)
      var j = 0
      while (j <= tLen) { prev(j) = if (j <= maxDist) j else INF; j += 1 }
      var i = 1
      while (i <= sLen) {
        val jMin = math.max(1, i - maxDist)
        val jMax = math.min(tLen, i + maxDist)
        // fill one cell past the band: the NEXT row's del/sub terms read
        // prev(j) up to its own jMax = this jMax + 1
        java.util.Arrays.fill(cur, jMin - 1, math.min(jMax + 2, tLen + 1), INF)
        if (jMin == 1) cur(0) = if (i <= maxDist) i else INF
        var best = INF
        j = jMin
        while (j <= jMax) {
          val sub = prev(j - 1) + (if (s(lo + i - 1) == t(lo + j - 1)) 0 else 1)
          val del = prev(j) + 1
          val ins = cur(j - 1) + 1
          val v = math.min(sub, math.min(del, ins))
          cur(j) = v
          if (v < best) best = v
          j += 1
        }
        if (best > maxDist) return -1 // whole band exceeded — no path back
        val tmp = prev; prev = cur; cur = tmp
        i += 1
      }
      val d = prev(tLen)
      if (d > maxDist) -1 else d
    }

    /** Decode into the scratch int array: the ASCII fast path reads the
      * UTF-8 bytes directly (no String materialization — the dominant
      * cost of a per-pair DP this cheap); multi-byte input falls back to
      * code-point decoding. Returns the logical length.
      */
    private def fill(u: UTF8String, buf: Array[Int], sc: Scratch,
                     left: Boolean): Int = {
      val n = u.numBytes
      var i = 0
      var ascii = true
      while (i < n && ascii) {
        val byt = u.getByte(i)
        if (byt < 0) ascii = false
        else { buf(i) = byt; i += 1 }
      }
      if (ascii) n
      else {
        val str = u.toString
        var k = 0
        var p = 0
        while (p < str.length) {
          val cp = str.codePointAt(p)
          val out = if (left) sc.fitA(k + 1) else sc.fitB(k + 1)
          out(k) = cp
          k += 1
          p += Character.charCount(cp)
        }
        k
      }
    }
  }

  def editDistanceWithin(l: Column, r: Column, maxDist: Int): Column =
    ColumnBridge.column(EditDistanceWithin(
      ColumnBridge.expression(l), ColumnBridge.expression(r), maxDist))
}
