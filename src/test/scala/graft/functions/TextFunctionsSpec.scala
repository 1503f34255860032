package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit tests for the text-analysis column functions (tokenization must
  * match Go strings.Fields — trim + split + drop empties — per
  * SURVEY.md §7.5). */
class TextFunctionsSpec extends SparkSpec {

  import TextFunctions._

  private def evalOne(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(c.as("r")).head().get(0)
  }

  test("tokens: trims, splits on runs of whitespace, drops empties") {
    evalOne(tokens(col("t")), "  a \t b\n c  ") shouldBe Seq("a", "b", "c")
    evalOne(tokens(col("t")), "   ") shouldBe Seq.empty
    evalOne(tokens(col("t")), "") shouldBe Seq.empty
  }

  test("fingerprint: whitespace/case-insensitive content identity") {
    val a = evalOne(fingerprint(col("t")), "Hello   World")
    val b = evalOne(fingerprint(col("t")), "  hello world ")
    val c = evalOne(fingerprint(col("t")), "hello worlds")
    a shouldBe b
    a should not be c
  }

  test("shingles: L tokens yield L-n+1 distinct n-grams; short docs empty") {
    evalOne(shingles(col("t"), 3), "a b c d e") shouldBe
      Seq("a b c", "b c d", "c d e")
    evalOne(shingles(col("t"), 3), "a b") shouldBe Seq.empty
    // repeated shingles deduplicated
    evalOne(shingles(col("t"), 2), "x y x y") shouldBe Seq("x y", "y x")
  }

  test("langId: stopword argmax with en>es>de>fr tie order, und on zero") {
    evalOne(langId(col("t")), "the cat of the house is here") shouldBe "en"
    evalOne(langId(col("t")), "el gato de la casa que es") shouldBe "es"
    evalOne(langId(col("t")), "zzz qqq www") shouldBe "und"
  }

  test("quality score is in [0,1]") {
    val s = evalOne(qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog").asInstanceOf[Double]
    assert(s >= 0.0 && s <= 1.0)
  }

  test("rollingHash: deterministic, normalization-invariant") {
    val a = evalOne(rollingHash(col("t")), "Hello   World")
    val b = evalOne(rollingHash(col("t")), "hello world")
    a shouldBe b
  }

  test("scrubPii masks emails, IPs, and SSN-shaped ids; text survives") {
    val dirty = "mail a.b+c@ex-1.org or 192.168.0.1 ssn 123-45-6789 end"
    evalOne(scrubPii(col("t")), dirty) shouldBe
      "mail <EMAIL> or <IP> ssn <ID> end"
    // clean text untouched; version strings (2 octets) and long digit
    // runs are NOT IPs/SSNs
    val clean = "release v1.2 build 1234-56-78900 at example.com"
    evalOne(scrubPii(col("t")), clean) shouldBe clean
  }

  test("matchCount counts occurrences per pattern") {
    val dirty = "a@b.co c@d.org 1.2.3.4 nothing"
    evalOne(matchCount(col("t"), emailPattern), dirty) shouldBe 2
    evalOne(matchCount(col("t"), ipv4Pattern), dirty) shouldBe 1
    evalOne(matchCount(col("t"), ssnPattern), dirty) shouldBe 0
  }
}
