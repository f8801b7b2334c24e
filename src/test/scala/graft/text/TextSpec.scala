package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("token counting: whitespace and BPE-ish") {
    val r = one("Hello world, 42 tests!").select(
      Text.tokenCount(col("text")).as("ws"),
      Text.bpeTokenCount(col("text")).as("bpe")).collect()(0)
    assert(r.getInt(0) == 4)
    // Hello | world | , | 4 | 2 | tests | ! → 7 pieces
    assert(r.getInt(1) == 7)
  }

  test("language ID picks the profile with most stopword hits") {
    val cases = Seq(
      "the cat sat on the mat and it is happy" -> "en",
      "der hund ist nicht in das haus und die katze" -> "de",
      "le chat est dans la maison et les oiseaux" -> "fr",
      "el perro y la casa es una maravilla en madrid" -> "es",
      "你好世界" -> "zh",
      "zzz qqq xxx" -> "und")
    cases.foreach { case (text, expect) =>
      val got = one(text).select(Text.langId(col("text"))).collect()(0).getString(0)
      assert(got == expect, s"'$text' → $got, expected $expect")
    }
  }

  test("n-gram language ID identifies languages by characteristic bigrams") {
    val cases = Seq(
      "the weather then gathered there" -> "en",
      // long English prose must NOT drift to fr/es (frequency scoring,
      // not presence — presence saturates and the tie-break is fixed)
      ("it was about the question of when the weather might then change " +
        "and whether they thought that other things would still stand there") -> "en",
      "schneller geschichten auch einander zeichen" -> "de",
      "la question nécessite quelques nouveaux journaux pour toujours" -> "fr",
      "los resultados estaban claros para la ciudad de madrid" -> "es",
      "你好" -> "zh")
    cases.foreach { case (text, expect) =>
      val got = one(text).select(Text.langIdNgram(col("text"))).collect()(0).getString(0)
      assert(got == expect, s"'$text' → $got, expected $expect")
    }
  }

  test("quality score stays in [0,1] and ranks diverse text above spam") {
    val good = "a reasonably long sentence with many distinct meaningful words in it today"
    val spam = "buy buy buy buy buy buy buy buy buy buy buy buy"
    val q = (t: String) =>
      one(t).select(Text.qualityScore(col("text"))).collect()(0).getDouble(0)
    assert(q(good) > q(spam))
    Seq(good, spam, "x", "").foreach { t =>
      val v = q(t); assert(v >= 0.0 && v <= 1.0, s"'$t' → $v")
    }
  }

  test("fingerprints: rolling hash is order-sensitive, md5 matches reference value") {
    val fp = (t: String) =>
      one(t).select(Text.rollingFingerprint(col("text"))).collect()(0).getLong(0)
    assert(fp("ab") != fp("ba"))
    assert(fp("same text") == fp("same text"))
    val m = one("hello").select(Text.fingerprint(col("text"))).collect()(0).getString(0)
    assert(m == "5d41402abc4b2a76b9719d911017c592")
  }

  test("ratio features computed over tokens") {
    val r = one("the a the xyz").select(
      Text.stopwordRatio(col("text"), Seq("the", "a")).as("stop"),
      Text.distinctRatio(col("text")).as("dist")).collect()(0)
    assert(r.getDouble(0) == 0.75)
    assert(r.getDouble(1) == 0.75)
  }
}
