package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CharNgrams

/** One-pass char n-gram expression: must agree with the O(L²) HOF spelling
  * it replaces (`transform(sequence(1, len-2), i -> substr(s, i, 3))`) on
  * every input, including multi-byte UTF-8, and with a plain JVM
  * sliding-window reference. */
class CharNgramsSpec extends SparkSpec {
  import spark.implicits._

  /** JVM reference: code-point sliding window. */
  private def ref(s: String, n: Int): Seq[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < n) Seq.empty
    else (0 to cps.length - n).map(i => new String(cps, i, n))
  }

  private val samples = Seq(
    "", "a", "ab", "abc", "abcd", "the quick brown fox",
    "한국어 텍스트", "mixedASCII와한글", "aaa", "  pad  ")

  test("interpreted eval matches JVM reference (code-point windows)") {
    samples.foreach { s =>
      val got = CharNgrams.ngrams(UTF8String.fromString(s), 3)
        .array.toSeq.map(_.toString)
      assert(got == ref(s, 3), s"input='$s'")
    }
    // n=1 and n=2 shapes
    assert(CharNgrams.ngrams(UTF8String.fromString("abc"), 1)
      .array.toSeq.map(_.toString) == Seq("a", "b", "c"))
    assert(CharNgrams.ngrams(UTF8String.fromString("한글자"), 2)
      .array.toSeq.map(_.toString) == Seq("한글", "글자"))
  }

  test("codegen path matches the HOF substr spelling on every sample") {
    graft.plans.GraftExtensions.install(spark)
    val df = samples.toDF("s")
    val hof = df
      .filter(length($"s") >= 3)
      .select($"s", explode(transform(sequence(lit(1), length($"s") - 2),
        i => $"s".substr(i, lit(3)))).as("tri"))
    val fast = df
      .select($"s", explode(CharNgrams.char_ngrams($"s", 3)).as("tri"))
    assert(fast.collect().toSeq.sortBy(_.toString) ==
      hof.collect().toSeq.sortBy(_.toString))
  }

  test("SQL registration, literal-n validation, null propagation") {
    graft.plans.GraftExtensions.install(spark)
    val got = spark.sql("SELECT char_ngrams('abcd', 3)")
      .as[Seq[String]].head()
    assert(got == Seq("abc", "bcd"))
    // null string → null array (nullSafeEval contract)
    assert(spark.sql("SELECT char_ngrams(CAST(NULL AS STRING), 3)")
      .head().isNullAt(0))
    // non-foldable n must be rejected at analysis time (length('xx') would
    // constant-fold and pass — use a column reference instead)
    val err = intercept[Exception] {
      spark.sql(
        "SELECT char_ngrams(s, length(s)) FROM (SELECT 'abc' AS s)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("empty-array short form: short docs vanish under explode") {
    graft.plans.GraftExtensions.install(spark)
    val rows = Seq("ab", "", "x").toDF("s")
      .select(explode(CharNgrams.char_ngrams($"s", 3)))
      .count()
    assert(rows == 0L)
  }
}
