package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the memory-compression half of the
  * canonical IVF-PQ design for ANN at 100 TB scale. The full-precision
  * corpus (dim·4 bytes/vector) is replaced by `m` sub-space codebook
  * indexes (m bytes at ksub ≤ 256): search never touches raw corpus
  * vectors, only codes plus a per-query lookup table of partial dots.
  *
  *  - train: one deterministic k-means-lite ([[Ivf.train]]) per sub-space
  *    over that sub-slice of the corpus. Codebooks are m·ksub·subDim
  *    doubles — kilobytes on the driver, broadcast to executors.
  *  - encode: one scan; each vector → `m` nearest-sub-centroid indexes
  *    (the fused [[VectorExpressions.nearestCentroids]] kernel per
  *    sub-space, all inside one projection).
  *  - search (ADC, asymmetric distance): candidates come from the IVF
  *    inverted lists (IDs-only bucket join, exactly [[Ivf.search]]'s
  *    shape); each candidate is scored as Σⱼ LUT[q][j][codeⱼ] against a
  *    broadcast |Q|·m·ksub lookup table — the scored rows carry ids +
  *    two doubles, never vectors, and the per-pair partial sums are
  *    map-side combined before the top-k shuffle.
  *
  * Scores are approximate by construction (quantization error), so the
  * registered surface is a recall query against the oracle-exact
  * brute-force result, mirroring `ann_ivf_recall`; PqSpec pins the ADC
  * arithmetic against an independent driver-side reference, and the
  * encode stage is additionally hash-checked end-to-end under
  * seed-vector codebooks (`ann_pq_encode_seeded` — the DuckDB oracle
  * replays the kernel's sub-space argmin bit-for-bit).
  */
object Pq {

  final case class PqModel(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks.headOption.map(_.length).getOrElse(0)
    def dim: Int = m * subDim
  }

  /** One [[Ivf.train]] per sub-space over the sliced corpus. Deterministic
    * (same init-by-hash sampling), so retraining reproduces the model.
    */
  def train(corpus: DataFrame, m: Int, ksub: Int, dim: Int, iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding"): PqModel = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val subDim = dim / m
    val cbs = (0 until m).map { j =>
      val sub = corpus.select(col(idCol),
        slice(col(vecCol), j * subDim + 1, subDim).as(vecCol))
      Ivf.train(sub, ksub, subDim, iters, idCol, vecCol).centroids
    }.toArray
    PqModel(subDim, cbs)
  }

  /** Corpus → (n_id, codes array<int> of length m): the compressed
    * representation. One projection, m fused kernel calls, no shuffle.
    */
  def encode(corpus: DataFrame, model: PqModel,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("n_id"),
      array((0 until model.m).map { j =>
        element_at(VectorExpressions.nearestCentroids(
          slice(col(vecCol), j * model.subDim + 1, model.subDim),
          model.codebooks(j).flatten, model.ksub, model.subDim, 1), 1)
      }: _*).as("codes"))

  /** The model as a (sub, code, centroid, cnorm2) DataFrame — the
    * broadcastable LUT half, and the persistence row format. */
  def codebookDf(spark: SparkSession, model: PqModel): DataFrame = {
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (c, code) =>
        (j, code, c.toSeq, c.map(x => x * x).sum)
      }
    }.toSeq.toDF("sub", "code", "centroid", "cnorm2")
  }

  /** Persist / reload: m·ksub rows of doubles — bit-exact round trip, so
    * load(save(m)) ≡ m (PqSpec). */
  def save(spark: SparkSession, model: PqModel, path: String): Unit =
    codebookDf(spark, model).repartition(1)
      .write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(path)
      .orderBy("sub", "code")
      .select("sub", "code", "centroid").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val cbs = Array.tabulate(m) { j =>
      rows.filter(_.getInt(0) == j).map(_.getSeq[Double](2).toArray)
    }
    PqModel(cbs(0)(0).length, cbs)
  }

  private val memo = scala.collection.concurrent.TrieMap.empty[String, PqModel]

  /** Train-once-reuse-everywhere entry point (same contract as
    * [[Ivf.trainOrLoad]]). */
  def trainOrLoad(corpus: DataFrame, m: Int, ksub: Int, dim: Int, iters: Int,
                  modelPath: String,
                  idCol: String = "vec_id", vecCol: String = "embedding"): PqModel =
    memo.getOrElseUpdate(modelPath, {
      val spark = corpus.sparkSession
      if (new java.io.File(modelPath, "_SUCCESS").exists) load(spark, modelPath)
      else {
        val mm = train(corpus, m, ksub, dim, iters, idCol, vecCol)
        save(spark, mm, modelPath)
        mm
      }
    })

  /** IVF-PQ ANN search: IVF inverted lists bound the candidate set,
    * PQ codes + a broadcast LUT score it. `acos` approximates the cosine
    * of (query, candidate) via the candidate's reconstruction:
    * Σⱼ⟨qⱼ, cb[j][codeⱼ]⟩ / (‖q‖ · √Σⱼ‖cb[j][codeⱼ]‖²).
    */
  def searchIvfPq(corpus: DataFrame, queries: DataFrame,
                  ivf: Ivf.IvfModel, pq: PqModel,
                  k: Int = 10, nProbe: Int = 4,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("acos").desc, col("n_id"))
    adcScores(corpus, queries, ivf, pq, nProbe, idCol, vecCol)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("acos"), col("rnk"))
  }

  /** Two-stage IVF-PQ (the FAISS-style production shape): ADC shortlists
    * `shortlist` candidates per query, then ONLY those pairs are re-ranked
    * with the exact cosine — the raw corpus vectors are joined for
    * |Q|·shortlist rows, never for the whole candidate set. Recovers most
    * of the recall PQ quantization loses, at a bounded exact-compute cost.
    */
  def searchIvfPqRerank(corpus: DataFrame, queries: DataFrame,
                        ivf: Ivf.IvfModel, pq: PqModel,
                        k: Int = 10, nProbe: Int = 4, shortlist: Int = 50,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must cover k=$k")
    val wa = Window.partitionBy(col("q_id")).orderBy(col("acos").desc, col("n_id"))
    val short = adcScores(corpus, queries, ivf, pq, nProbe, idCol, vecCol)
      .withColumn("srnk", row_number().over(wa)).filter(col("srnk") <= shortlist)
      .select(col("q_id"), col("n_id"))
    def side(df: DataFrame, role: String): DataFrame =
      df.select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_vec"),
        Similarity.l2Norm(col(vecCol)).as(s"${role}_norm"))
    val we = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    short
      .join(side(queries, "q"), "q_id").join(side(corpus, "n"), "n_id")
      .select(col("q_id"), col("n_id"),
        (Similarity.dot(col("q_vec"), col("n_vec")) /
          (col("q_norm") * col("n_norm"))).as("cos"))
      .withColumn("rnk", row_number().over(we)).filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rnk"))
  }

  /** Shared ADC scoring stage: (q_id, n_id, acos) for every IVF candidate. */
  private def adcScores(corpus: DataFrame, queries: DataFrame,
                        ivf: Ivf.IvfModel, pq: PqModel, nProbe: Int,
                        idCol: String, vecCol: String): DataFrame = {
    val spark = corpus.sparkSession
    val flat = ivf.flat
    val assignedCorpus = corpus.select(col(idCol).as("n_id"),
      element_at(VectorExpressions.nearestCentroids(
        col(vecCol), flat, ivf.k, ivf.dim, 1), 1).as("cluster"))
    val probes = queries.select(col(idCol).as("q_id"),
      explode(VectorExpressions.nearestCentroids(
        col(vecCol), flat, ivf.k, ivf.dim, nProbe)).as("cluster"))
    // per-query LUT: partial dot of each codeword with the query sub-slice
    val lut = queries
      .select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
      .crossJoin(broadcast(codebookDf(spark, pq)))
      .select(col("q_id"), col("sub"), col("code"), col("cnorm2"),
        aggregate(
          zip_with(
            slice(col("q_vec"), col("sub") * pq.subDim + 1, lit(pq.subDim)),
            col("centroid"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("pdot"))
    val qnorms = queries.select(col(idCol).as("q_id"),
      Similarity.l2Norm(col(vecCol)).as("q_norm"))
    val codes = encode(corpus, pq, idCol, vecCol)
    assignedCorpus.join(probes, "cluster")
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .join(codes, "n_id") // attach m ints per candidate, never vectors
      .select(col("q_id"), col("n_id"), posexplode(col("codes")))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "code")
      .join(broadcast(lut), Seq("q_id", "sub", "code"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("pdot")).as("adot"), sum(col("cnorm2")).as("rnorm2"))
      .join(broadcast(qnorms), "q_id")
      .select(col("q_id"), col("n_id"),
        (col("adot") / (col("q_norm") * sqrt(col("rnorm2")))).as("acos"))
  }
}
