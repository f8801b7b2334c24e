package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class KernelRewriteSpec extends SparkSpec {

  // The rule is installed here via experimental.extraOptimizations because
  // extensions bind at SparkSession construction and the suite shares one
  // session; the production injectOptimizerRule path (GraftExtensions) is
  // exercised by the spark-sql CLI acceptance run with
  // spark.sql.extensions=graft.functions.GraftExtensions (EXPLAIN shows
  // vec_dot) — same rule object either way.
  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ KernelRewriteRules.RewriteHofDotProduct
    try f finally spark.experimental.extraOptimizations = prev
  }

  test("HOF dot-product idiom is rewritten to the native kernel, same values") {
    // parquet-backed input: a local relation would be constant-folded away
    // before the plan can be inspected
    graft.source.Tables(spark, sfDir, "embeddings")
      .createOrReplaceTempView("krw_emb")
    val hofSql =
      """SELECT vec_id,
         aggregate(zip_with(embedding, embedding,
             (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           0D, (acc, v) -> acc + v) AS d
         FROM krw_emb ORDER BY vec_id"""
    val (rewritten, viaRule) = withRule {
      val q = spark.sql(hofSql)
      (q.queryExecution.optimizedPlan.toString,
        q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    }
    assert(rewritten.contains("vec_dot"), rewritten)
    // value-identical to both the direct kernel and the interpreted HOF
    val viaKernel = graft.source.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        VectorExpressions.vecDot(col("embedding"), col("embedding")).as("d"))
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plainQ = spark.sql(hofSql)
    assert(!plainQ.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    val viaHof = plainQ.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaRule == viaKernel && viaRule == viaHof)
  }

  test("squared-norm transform idiom rewrites to vec_dot(a, a)") {
    graft.source.Tables(spark, sfDir, "embeddings")
      .createOrReplaceTempView("krw_emb_n")
    val sql =
      """SELECT vec_id,
         sqrt(aggregate(transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           0D, (acc, v) -> acc + v)) AS norm
         FROM krw_emb_n ORDER BY vec_id"""
    val (plan, viaRule) = withRule {
      val q = spark.sql(sql)
      (q.queryExecution.optimizedPlan.toString,
        q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    }
    assert(plan.contains("vec_dot"), plan)
    val viaKernel = graft.source.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.sim.Similarity.l2Norm(col("embedding")).as("norm"))
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaRule == viaKernel)
  }

  test("float-multiply lambda is NOT rewritten (different rounding)") {
    import spark.implicits._
    Seq((Array(1.5f), Array(0.5f))).toDF("a", "b")
      .createOrReplaceTempView("krw_vecs2")
    withRule {
      val q = spark.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
                            0D, (acc, v) -> acc + v) AS d FROM krw_vecs2""")
      assert(!q.queryExecution.optimizedPlan.toString.contains("vec_dot"),
        q.queryExecution.optimizedPlan.toString)
    }
  }

  test("kernel nulls on length mismatch, matching the zip_with form") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val viaKernel = df.select(VectorExpressions.vecDot(col("a"), col("b")))
      .collect()(0)
    assert(viaKernel.isNullAt(0))
    df.createOrReplaceTempView("krw_vecs3")
    val viaHof = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                          0D, (acc, v) -> acc + v) AS d FROM krw_vecs3""").collect()(0)
    assert(viaHof.isNullAt(0))
  }
}
