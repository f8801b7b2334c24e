package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Kernels are higher-order array expressions (codegen'd,
  * no UDFs). Two paths:
  *
  *  - brute force: every (query, candidate) pair — exact, O(|Q|·|N|); right
  *    when |Q| is small (queries broadcast) or as the rerank stage;
  *  - random-hyperplane LSH: sign-bit signatures bucketed by chunk, exact
  *    rerank inside buckets — the scale path: candidate generation is a
  *    bucket join, never a cross product.
  */
object Similarity {

  // SQL-function forms of the bit shifts (the Scala DSL overloads only
  // accept Int bit counts, not Columns).
  private def shr(c: Column, bits: Column): Column = call_function("shiftright", c, bits)
  private def shl(c: Column, bits: Column): Column = call_function("shiftleft", c, bits)

  /** Explode a packed signature into one (chunk, ch) bucket row per
    * `chunkBits`-wide chunk, carrying only `keep` columns — the shared
    * candidate-generation step of every LSH surface here (one definition,
    * so chunking semantics can't silently diverge between them).
    */
  private def chunkBuckets(df: DataFrame, sigCol: String, nChunks: Int,
                           chunkBits: Int, keep: Seq[String]): DataFrame = {
    val mask = (1L << chunkBits) - 1
    df.select(keep.map(col) :+
        explode(transform(sequence(lit(0), lit(nChunks - 1)), c =>
          struct(c.as("chunk"),
            shr(col(sigCol), c * chunkBits).bitwiseAND(mask).as("ch")))).as("ck"): _*)
      .select(keep.map(col) :+ col("ck.chunk") :+ col("ck.ch"): _*)
  }

  /** Round-robin repartition of a frame that is about to STREAM through a
    * per-row-expensive stage (the probe side of a broadcast nested-loop
    * join): without it the stage's parallelism is whatever the upstream
    * scan produced, and a compute-heavy stage over a byte-small input is
    * exactly where scan-proportional splitting is wrong (5 MB of vectors
    * is one 128 MB-target split but minutes of quadratic scoring). Never
    * applied to scan→filter→agg paths, where splitting by bytes is right
    * and an extra shuffle would be pure cost.
    */
  private def spreadForCompute(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** dot(a, b) in double precision (floats promote exactly) — native
    * codegen'd kernel, not a higher-order function (HOFs are interpreted
    * per-element).
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.vecDot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k cosine neighbors for each query vector. `queries` is
    * expected to be small (it is broadcast); ranking is deterministic
    * (score desc, then neighbor id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Norms are computed once per vector (O(n)), never per pair (O(n·q)).
    // The corpus side streams through the broadcast join, so the O(n·q)
    // scoring runs at the SCAN's parallelism — a small/compact file maps
    // to one task and serializes the whole cross score. spreadForCompute
    // makes the per-pair stage's parallelism independent of file layout.
    val c = spreadForCompute(corpus).select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      l2Norm(col(vecCol)).as("n_norm"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm"))).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rnk"))
  }

  /** Bounded top-k accumulator for (score, id) pairs, ordered score
    * desc / id asc — map-side combinable, so a kNN JOIN over n vectors
    * shuffles n·k rows instead of the n² scored pairs a window-rank
    * formulation would move. Exact doubles + deterministic tie-break →
    * identical output under any partitioning.
    */
  final class TopKByScore(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1)
    // distinct first: identical (score, id) observations are idempotent,
    // so callers may feed pre-dedup streams (containmentTopK's
    // exact-mask path emits a pair once per surviving shared token) and
    // duplicates can never occupy two of the k slots
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.distinct.sortBy { case (score, id) => (-score, id) }.take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
      if (b.size == k && {
        val (ls, li) = b.last // k-th best; skip x if strictly worse
        x._1 < ls || (x._1 == ls && x._2 > li)
      }) b else trim(b :+ x)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Exact k-nearest-neighbor JOIN: top-k cosine neighbors for EVERY
    * corpus vector — the kNN-graph construction under semantic dedup,
    * cluster audits and label propagation, distinct from the query-SET
    * search ([[bruteForceTopK]]): here the "query side" is the corpus
    * itself. Quadratic compute by definition (this is the exact
    * baseline; the bucketed scale path is `Ivf.search(corpus, corpus)`),
    * but the DATA MOVEMENT is not quadratic: the inner side broadcasts
    * (id, vec, norm) once per executor, scored pairs are consumed
    * map-side by the bounded [[TopKByScore]] accumulator, and the one
    * shuffle carries n·k (id, score) entries — never the n² pair
    * stream a window-rank over all pairs would move.
    */
  def knnJoinExact(corpus: DataFrame, k: Int = 5,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      l2Norm(col(vecCol)).as("n_norm"))
    // The query side streams through the broadcast nested-loop join, so
    // the O(n²) scoring inherits the SCAN's task count: a corpus that
    // arrives as one compact parquet file (or a handful of coalesced
    // splits) pins the entire quadratic stage to those few cores —
    // measured at sf1 as a 20k-vector join saturating 1 of 32 cores for
    // ~390 s. One round-robin shuffle of n rows is O(n) — noise against
    // the n² it parallelizes — and balances perfectly regardless of
    // input skew or file layout.
    val q = spreadForCompute(corpus).select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"))
    val topk = udaf(new TopKByScore(k))
    q.join(broadcast(n), col("q_id") =!= col("n_id"))
      .select(col("q_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm"))).as("cos"),
        col("n_id"))
      .groupBy(col("q_id"))
      .agg(topk(col("cos"), col("n_id")).as("nn"))
      .select(col("q_id"), posexplode(col("nn")))
      .select(col("q_id"), col("col._2").as("n_id"), col("col._1").as("cos"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-k most COSINE-SIMILAR corpus vectors carrying a
    * DIFFERENT label — the negatives that sit closest to the decision
    * boundary, which is exactly what contrastive / metric-learning
    * losses want (random negatives are trivially separable and
    * contribute no gradient). Same machinery as [[knnJoinExact]]:
    * corpus broadcasts once, scored pairs are consumed map-side by the
    * bounded [[TopKByScore]] accumulator, the one shuffle carries
    * |Q|·k entries; the label-mismatch predicate rides the broadcast
    * join condition, so same-label pairs are never scored.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val n = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      col(labelCol).as("n_label"), l2Norm(col(vecCol)).as("n_norm"))
    val q = spreadForCompute(queries).select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), col(labelCol).as("q_label"),
      l2Norm(col(vecCol)).as("q_norm"))
    val topk = udaf(new TopKByScore(k))
    q.join(broadcast(n),
        col("q_id") =!= col("n_id") && col("q_label") =!= col("n_label"))
      .select(col("q_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm"))).as("cos"),
        col("n_id"))
      .groupBy(col("q_id"))
      .agg(topk(col("cos"), col("n_id")).as("nn"))
      .select(col("q_id"), posexplode(col("nn")))
      .select(col("q_id"), col("col._2").as("n_id"), col("col._1").as("cos"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Embedding-space decontamination — the semantic counterpart of the
    * trigram-overlap benchmark decontamination in [[graft.text.Dedup]]:
    * for every EVAL vector, its maximum cosine against the TRAIN corpus
    * and the train vector achieving it (ties to the lower train id).
    * A max_cos above `tau` means a paraphrase/near-copy of the eval item
    * sits in the training set — the leak n-gram matching misses when the
    * wording changed but the embedding didn't.
    *
    * Scale shape: the eval set (a benchmark — thousands of rows) is the
    * broadcast side; the train corpus SCANS ONCE with the per-pair cosine
    * fused scan-side, and both aggregates (max, max_by) combine map-side,
    * so the one shuffle carries ≤ |eval| rows per map task no matter how
    * large train is. Train-side spread ([[spreadForCompute]]) keeps a
    * few-file corpus from serializing the scan.
    */
  def testContamination(train: DataFrame, test: DataFrame, tau: Double,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val t = spreadForCompute(train).select(col(idCol).as("train_id"),
      col(vecCol).as("t_vec"), l2Norm(col(vecCol)).as("t_norm"))
    val q = test.select(col(idCol).as("test_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"))
    t.join(broadcast(q), col("train_id") =!= col("test_id"))
      .select(col("test_id"), col("train_id"),
        (dot(col("q_vec"), col("t_vec")) / (col("q_norm") * col("t_norm"))).as("cos"))
      .groupBy(col("test_id"))
      .agg(max(col("cos")).as("max_cos"),
        max_by(col("train_id"), struct(col("cos"), -col("train_id")))
          .as("nearest_train_id"))
      .select(col("test_id"), col("nearest_train_id"), col("max_cos"),
        (col("max_cos") >= tau).as("contaminated"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (seeded). */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Deterministic Rademacher (±1) projection matrix, row-major
    * [plane][dim]. Used where the signature must be reproducible OUTSIDE
    * the engine (e.g. a SQL oracle): ±1 entries keep every product an
    * exact double (a sign flip), so any engine that promotes floats to
    * double and sums in index order computes the identical projection.
    */
  def signPlanes(nPlanes: Int, dim: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes * dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Sign-bit LSH signature: bit i = sign(dot(v, plane_i)). Returned as a
    * Long (nPlanes <= 63). One fused native kernel over the constant plane
    * matrix (see graft.functions.VectorExpressions.LshSignBits).
    */
  def lshSignature(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    VectorExpressions.lshSignBits(vec,
      planes(nPlanes, dim, seed).flatten.toArray, nPlanes, dim)

  /** LSH-bucketed ANN: signature chunks → bucket join → exact cosine rerank
    * within buckets → top-k. Recall < 1 by construction; `nChunks` trades
    * recall for candidate volume (a pair is compared if it collides on at
    * least one chunk of `chunkBits` sign bits).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              nPlanes: Int = 32, chunkBits: Int = 8, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding",
              seed: Long = 42L): DataFrame = {
    val nChunks = nPlanes / chunkBits
    // Candidate generation and dedup carry IDs ONLY — shuffling the
    // vectors through the bucket join would multiply payload bytes by the
    // collision count. Vectors are joined back once per surviving pair.
    def chunked(df: DataFrame, role: String): DataFrame =
      chunkBuckets(
        df.select(col(idCol).as(s"${role}_id"),
          lshSignature(col(vecCol), nPlanes, dim, seed).as("sig")),
        "sig", nChunks, chunkBits, Seq(s"${role}_id"))
    val cand = chunked(corpus, "n")
      .join(chunked(queries, "q"), Seq("chunk", "ch"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
    exactRerankTopK(cand, corpus, queries, k, idCol, vecCol)
  }

  /** md5-derived INTEGER plane matrix, row-major [plane][dim] — the
    * oracle-REPLAYABLE projection family (the `minhashPairsMd5`
    * pattern): plane(i,j) = (first-8-hex-of-md5("i,j") mod 17) − 8
    * ∈ [−8, 8], computable by any engine with md5. Integer
    * coefficients keep each product float·int exact in double, and
    * both engines fold the products in index order (the kernel's j
    * loop ≡ the oracle's ordered list_reduce), so the SIGN of every
    * projection — hence the signature, buckets and candidate set — is
    * engine-independent. `signPlanes`' seeded Rademacher family is
    * reproducible only inside the JVM.
    */
  def lshPlanesMd5(nPlanes: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes * dim) { p =>
      val (i, j) = (p / dim, p % dim)
      val hex = md.digest(s"$i,$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      ((java.lang.Long.parseLong(hex, 16) % 17) - 8).toDouble
    }
  }

  /** [[lshTopK]] with the md5-derived plane family — the oracle-checked
    * twin (`ann_lsh_topk_md5`): same fused signature kernel, same chunk
    * bucket join, same IDs-only candidates and exact rerank; only the
    * plane constants change, to ones a SQL oracle can recompute.
    */
  def lshTopKMd5(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                 nPlanes: Int = 16, chunkBits: Int = 8, dim: Int = 64,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nChunks = nPlanes / chunkBits
    val pl = lshPlanesMd5(nPlanes, dim)
    def chunked(df: DataFrame, role: String): DataFrame =
      chunkBuckets(
        df.select(col(idCol).as(s"${role}_id"),
          VectorExpressions.lshSignBits(col(vecCol), pl, nPlanes, dim).as("sig")),
        "sig", nChunks, chunkBits, Seq(s"${role}_id"))
    val cand = chunked(corpus, "n")
      .join(chunked(queries, "q"), Seq("chunk", "ch"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
    exactRerankTopK(cand, corpus, queries, k, idCol, vecCol)
  }

  /** Exact-cosine rerank of an IDs-only (q_id, n_id) candidate set to the
    * per-query top-k — the shared tail of the LSH surfaces. queries is
    * |Q|-bounded (broadcast is right); the CORPUS payload is not —
    * shuffle-join it back by id (see spreadForCompute's sibling concern:
    * byte-small vector files mislead the size estimate).
    */
  private def exactRerankTopK(cand: DataFrame, corpus: DataFrame, queries: DataFrame,
                              k: Int, idCol: String, vecCol: String): DataFrame = {
    def sides(df: DataFrame, role: String): DataFrame =
      df.select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_vec"),
        l2Norm(col(vecCol)).as(s"${role}_norm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    cand
      .join(sides(queries, "q"), "q_id")
      .join(sides(corpus, "n").hint("SHUFFLE_HASH"), "n_id")
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm"))).as("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rnk"))
  }

  /** Multi-probe LSH top-k (Lv et al.'s idea on the sign-bit chunk
    * index): each QUERY chunk probes its own bucket plus the
    * `chunkBits` Hamming-1 neighbor buckets — near misses where one
    * plane voted the other way land one bit away, so probing them buys
    * most of the recall extra hash tables would, at the cost of
    * (chunkBits + 1)× probe rows on the query side ONLY. The corpus
    * index is unchanged (no extra tables, no extra corpus scan), probe
    * rows carry (q_id, chunk, ch) — never vectors — and candidates
    * dedup before the same IDs-only exact rerank as [[lshTopK]].
    * Single-probe candidates are a subset by construction (the 0-flip
    * probe is included), so per-query rank-r cosine dominates
    * single-probe's — spec-pinned along with the recall gain.
    */
  def lshTopKMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                        nPlanes: Int = 32, chunkBits: Int = 8, dim: Int = 64,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        seed: Long = 42L): DataFrame = {
    val nChunks = nPlanes / chunkBits
    def chunked(df: DataFrame, role: String): DataFrame =
      chunkBuckets(
        df.select(col(idCol).as(s"${role}_id"),
          lshSignature(col(vecCol), nPlanes, dim, seed).as("sig")),
        "sig", nChunks, chunkBits, Seq(s"${role}_id"))
    val probeSet = array((Seq(col("ch")) ++
      (0 until chunkBits).map(b => col("ch").bitwiseXOR(lit(1L << b)))): _*)
    val probes = chunked(queries, "q")
      .select(col("q_id"), col("chunk"), explode(probeSet).as("ch"))
    val cand = chunked(corpus, "n")
      .join(probes, Seq("chunk", "ch"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
    exactRerankTopK(cand, corpus, queries, k, idCol, vecCol)
  }

  /** [[lshTopKMultiProbe]] with the md5-derived plane family — the
    * oracle-checked twin of the MULTI-PROBE path (the `lshTopKMd5`
    * move): same fused signature kernel, same chunk index, same
    * query-side Hamming-1 probe expansion, same IDs-only candidates and
    * exact rerank; only the plane constants change to ones a SQL oracle
    * can recompute. The oracle's candidate join admits chunk pairs
    * whose XOR is zero or a power of two — exactly the probe set.
    */
  def lshTopKMultiProbeMd5(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                           nPlanes: Int = 16, chunkBits: Int = 8, dim: Int = 64,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nChunks = nPlanes / chunkBits
    val pl = lshPlanesMd5(nPlanes, dim)
    def chunked(df: DataFrame, role: String): DataFrame =
      chunkBuckets(
        df.select(col(idCol).as(s"${role}_id"),
          VectorExpressions.lshSignBits(col(vecCol), pl, nPlanes, dim).as("sig")),
        "sig", nChunks, chunkBits, Seq(s"${role}_id"))
    val probeSet = array((Seq(col("ch")) ++
      (0 until chunkBits).map(b => col("ch").bitwiseXOR(lit(1L << b)))): _*)
    val probes = chunked(queries, "q")
      .select(col("q_id"), col("chunk"), explode(probeSet).as("ch"))
    val cand = chunked(corpus, "n")
      .join(probes, Seq("chunk", "ch"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
    exactRerankTopK(cand, corpus, queries, k, idCol, vecCol)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-bucketed
    * (the embedding flavor of Dedup: same shape as minhashPairs).
    */
  def cosineDupPairs(corpus: DataFrame, threshold: Double = 0.95,
                     nPlanes: Int = 32, chunkBits: Int = 8, dim: Int = 64,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nChunks = nPlanes / chunkBits
    // IDs-only buckets (see lshTopK): the payload never rides the
    // candidate shuffle; vectors are joined back once per surviving pair.
    val sigs = chunkBuckets(
      corpus.select(col(idCol).as("id"),
        lshSignature(col(vecCol), nPlanes, dim).as("sig")),
      "sig", nChunks, chunkBits, Seq("id"))
    val a = sigs.toDF("a_id", "chunk", "ch")
    val b = sigs.toDF("b_id", "chunk", "ch")
    // corpus-sized vector payload: shuffle-joined back by id, never
    // broadcast (corpus-proportional build ≠ scale-safe)
    def side(role: String): DataFrame =
      corpus.select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_vec"),
        l2Norm(col(vecCol)).as(s"${role}_norm"))
        .hint("SHUFFLE_HASH")
    a.join(b, Seq("chunk", "ch")).filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .join(side("a"), "a_id").join(side("b"), "b_id")
      .select(col("a_id"), col("b_id"),
        (dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** EXACT embedding near-dup pairs by angular SimHash: all pairs whose
    * Rademacher sign signatures differ in ≤ `maxHamming` of `nPlanes` bits,
    * with the exact cosine reported per pair.
    *
    * Unlike [[cosineDupPairs]] (recall < 1 on a raw cosine threshold), the
    * result set here is *deterministically complete* for its definition:
    * signatures are bucketed into `nChunks = nPlanes/chunkBits` chunks, and
    * any pair within Hamming distance `maxHamming < nChunks` must agree on
    * at least one whole chunk (pigeonhole), so the chunk join loses
    * nothing. That makes the query SQL-oracle-checkable end to end — the
    * ±1 planes reproduce bit-identically in any double-arithmetic engine.
    *
    * Scale shape: candidates carry (id, sig) only — 8 bytes of payload
    * through the bucket join; vectors are joined back once per surviving
    * pair for the cosine audit column.
    */
  def simhashDupPairs(corpus: DataFrame, maxHamming: Int = 8,
                      nPlanes: Int = 36, chunkBits: Int = 4, dim: Int = 64,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      seed: Long = 7L): DataFrame = {
    val nChunks = nPlanes / chunkBits
    require(nChunks * chunkBits == nPlanes, "chunkBits must divide nPlanes")
    require(maxHamming < nChunks,
      s"pigeonhole guarantee needs maxHamming < nChunks ($maxHamming >= $nChunks)")
    // the nPlanes×dim sign-bit kernel is CPU-per-row: spread a
    // row-group-starved scan before it (ScanSpread kernel floor)
    val corpusIn = graft.ops.ScanSpread.spread(corpus.sparkSession, corpus,
      graft.ops.ScanSpread.KernelFloor)
    val chunked = chunkBuckets(
      corpusIn.select(col(idCol).as("id"),
        VectorExpressions.lshSignBits(col(vecCol),
          signPlanes(nPlanes, dim, seed), nPlanes, dim).as("sig")),
      "sig", nChunks, chunkBits, Seq("id", "sig"))
    val a = chunked.toDF("a_id", "a_sig", "chunk", "ch")
    val b = chunked.toDF("b_id", "b_sig", "chunk", "ch")
    // corpus-sized vector payload: shuffle-joined back by id, never
    // broadcast (corpus-proportional build ≠ scale-safe)
    def side(role: String): DataFrame =
      corpusIn.select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_vec"),
        l2Norm(col(vecCol)).as(s"${role}_norm"))
        .hint("SHUFFLE_HASH")
    a.join(b, Seq("chunk", "ch")).filter(col("a_id") < col("b_id"))
      // Hamming-filter BEFORE dedup and payload join: it needs only the
      // signatures already riding the candidate rows.
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("a_id", "b_id")
      .join(side("a"), "a_id").join(side("b"), "b_id")
      .select(col("a_id"), col("b_id"), col("hamming"),
        (dot(col("a_vec"), col("b_vec")) / (col("a_norm") * col("b_norm"))).as("cos"))
  }

  /** Int8 affine quantization audit — the storage-compression decision an
    * embedding pipeline makes before writing vectors at corpus scale
    * (4 bytes/dim float → 1 byte/dim + two scalars, 4× on what is often
    * the largest table in the lake). Per vector: the affine map
    * code = ⌊(x − min)/scale + ½⌋ with scale = (max − min)/255, plus the
    * audit numbers a consumer needs to accept the compression — the
    * integer code checksum and the worst-case reconstruction error
    * max|x − (min + code·scale)| (bounded by scale/2 by construction —
    * spec-pinned, and the registered query hash-checks every float
    * against DuckDB replaying the identical IEEE expression tree).
    * Purely narrow per-row HOF work: runs scan-side, no shuffle; floats
    * promote to double exactly, ⌊·+½⌋ avoids the engines' differing
    * round() tie conventions, and max/sum over array order are
    * order-free. Degenerate constant vectors (scale = 0) code to 0 with
    * exact reconstruction.
    */
  def int8QuantStats(embs: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val code = (x: Column) => when(col("scale") === 0.0, 0L)
      .otherwise(least(lit(255L),
        floor((x.cast("double") - col("qmin")) / col("scale") + lit(0.5))))
    val err = (x: Column) => when(col("scale") === 0.0, lit(0.0))
      .otherwise(abs(x.cast("double") -
        (col("qmin") + code(x).cast("double") * col("scale"))))
    embs.select(col(idCol), col(vecCol).as("v"),
        array_min(col(vecCol)).cast("double").as("qmin"),
        array_max(col(vecCol)).cast("double").as("qmax"))
      .withColumn("scale", (col("qmax") - col("qmin")) / lit(255.0))
      .select(col(idCol), col("qmin"), col("qmax"), col("scale"),
        aggregate(transform(col("v"), code), lit(0L), (a, c) => a + c).as("code_sum"),
        array_max(transform(col("v"), err)).as("max_err"))
  }
}
