package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Sqrt}

/** SQL-surface registration of the native kernels, so the engine's custom
  * functions are first-class in `spark.sql(...)`:
  *
  *   SELECT vec_dot(a, b), vec_cosine(a, b), simhash64(split(text, ' ')),
  *          shingle_hashes(split(text, ' '), 3)
  *
  * Two entry points:
  *  - `GraftFunctions.register(spark)` — imperative, any live session;
  *  - `graft.functions.GraftExtensions` — for
  *    `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "vec_dot" -> (es => VectorExpressions.DotProduct(es(0), es(1))),
    "vec_norm" -> (es => Sqrt(VectorExpressions.DotProduct(es(0), es(0)))),
    "vec_cosine" -> { es =>
      org.apache.spark.sql.catalyst.expressions.Divide(
        VectorExpressions.DotProduct(es(0), es(1)),
        org.apache.spark.sql.catalyst.expressions.Multiply(
          Sqrt(VectorExpressions.DotProduct(es(0), es(0))),
          Sqrt(VectorExpressions.DotProduct(es(1), es(1)))))
    },
    "simhash64" -> (es => HashExpressions.SimHash64(es(0))),
    // hilbert_index(x, y): order-16 Hilbert curve position of two 16-bit
    // grid coordinates (see ops.Layout for the clustering surface)
    "hilbert_index" -> (es => SpatialExpressions.HilbertIndex(es(0), es(1))),
    "rolling_hash" -> { es =>
      val base = if (es.length > 1) longLit(es(1), "base") else 1000003L
      HashExpressions.RollingHash(es(0), base)
    },
    "shingle_hashes" -> { es =>
      val w = if (es.length > 1) intLit(es(1), "shingle width") else 3
      HashExpressions.ShingleHashes(es(0), w)
    },
    // text_features(text): the fused langid/quality struct, with the
    // engine's default language profiles
    "text_features" -> (es => TextExpressions.TextFeatures(es(0),
      graft.text.Text.langProfiles.toSeq, graft.text.Text.bigramProfiles.toSeq)),
    // prefix_tokens(tokens, threshold): Jaccard prefix filter in the plain
    // token-string canonical order — the SQL surface has no ergonomic map
    // literal, so the frequency dictionary stays a Column-API affordance
    "prefix_tokens" -> { es =>
      if (es.length != 2) throw new IllegalArgumentException(
        s"prefix_tokens(tokens, threshold) takes 2 arguments, got ${es.length}")
      val t = es(1) match {
        case Literal(v: Double, _) => v
        case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
        case Literal(v: Int, _) => v.toDouble
        case other => throw new IllegalArgumentException(
          s"threshold must be a numeric literal, got $other")
      }
      HashExpressions.PrefixTokens(es(0), Map.empty, t)
    },
    "word_bigrams" -> { es =>
      if (es.length != 1) throw new IllegalArgumentException(
        s"word_bigrams(tokens) takes 1 argument, got ${es.length}")
      TextExpressions.WordNgrams(es(0), 2, emitShort = false)
    },
    // word_ngrams(tokens, w): decontamination-style grams (short texts
    // yield their single sub-w gram)
    "word_ngrams" -> { es =>
      if (es.length != 2) throw new IllegalArgumentException(
        s"word_ngrams(tokens, w) takes 2 arguments, got ${es.length}")
      TextExpressions.WordNgrams(es(0), intLit(es(1), "gram width"), emitShort = true)
    },
    // sorted_intersect_size(a, b): |A ∩ B| of two sorted distinct string
    // arrays (merge walk) — pair with array_sort(array_distinct(...))
    "sorted_intersect_size" -> { es =>
      if (es.length != 2) throw new IllegalArgumentException(
        s"sorted_intersect_size(a, b) takes 2 arguments, got ${es.length}")
      HashExpressions.SortedIntersectSize(es(0), es(1))
    },
    "minhash_sig" -> { es =>
      // minhash_sig(shingle_hashes, numHashes [, seed])
      val k = if (es.length > 1) intLit(es(1), "numHashes") else 64
      val seed = if (es.length > 2) longLit(es(2), "seed") else 42L
      val rnd = new scala.util.Random(seed)
      val p = 2147483647L
      def draw() = (rnd.nextLong().abs % (p - 1)) + 1
      val a = Array.fill(k)(draw())
      val b = Array.fill(k)(draw())
      VectorExpressions.MinHashSig(es(0), a, b, p)
    })

  /** Register every kernel as a temp function on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}

/** `spark.sql.extensions` hook: SQL-callable kernels + the HOF→kernel
  * optimizer rewrites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        b))
    }
    e.injectOptimizerRule(_ => KernelRewriteRules.RewriteHofDotProduct)
  }
}
