package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("kernels are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
                vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
                vec_norm(array(3.0F, 4.0F)) AS n,
                simhash64(split('hello world hello', ' ')) AS sh,
                size(shingle_hashes(split('a b c d', ' '), 2)) AS nsh,
                size(minhash_sig(shingle_hashes(split('a b c d', ' '), 2), 16)) AS k
      """).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.getLong(3) != 0L)
    assert(r.getInt(4) == 3) // "a b","b c","c d"
    assert(r.getInt(5) == 16)
  }

  test("hilbert_index is callable from SQL and matches the kernel") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT hilbert_index(12345L, 54321L) AS h, hilbert_index(0L, 0L) AS z")
      .collect()(0)
    assert(r.getLong(0) == SpatialExpressions.HilbertIndex.compute(12345L, 54321L))
    assert(r.getLong(1) == 0L)
  }

  test("text_features and prefix_tokens are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT f.stop_lang, f.ngram_lang, f.n_tokens, f.bpe_tokens,
                prefix_tokens(split('zz aa mm bb', ' '), 0.8) AS p
         FROM (SELECT text_features('the cat and the hat is in that box') AS f)
      """).collect()(0)
    assert(r.getString(0) == "en" && r.getString(1) == "en")
    assert(r.getInt(2) == 9)
    // dict-free canonical order = token string: prefix keeps the 2 smallest
    assert(r.getSeq[String](4) == Seq("aa", "bb"))
  }

  test("word_bigrams and sorted_intersect_size are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT word_bigrams(split('a b c', ' ')) AS g,
                word_bigrams(array('solo')) AS e,
                sorted_intersect_size(
                  array_sort(array_distinct(split('c a b', ' '))),
                  array_sort(array_distinct(split('b d c b', ' ')))) AS i
      """).collect()(0)
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[String](1).isEmpty)
    assert(r.getInt(2) == 2) // {a,b,c} ∩ {b,c,d} = {b,c}
  }

  test("SQL kernels agree with the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)
    val df = Seq((Array(1.5f, -2.0f, 3.0f), Array(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT vec_dot(a, b) FROM vecs").collect()(0).getDouble(0)
    val viaCol = df.select(VectorExpressions.vecDot(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(viaSql == viaCol)
  }

  test("non-literal width for shingle_hashes is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(split('a b', ' '), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
