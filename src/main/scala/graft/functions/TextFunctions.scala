package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline: language
  * ID, quality scoring, token counting, fingerprinting, shingling. All are
  * pure `org.apache.spark.sql.functions` compositions (codegen'd, no UDFs)
  * and each has an exactly-equivalent DuckDB SQL form used by the oracle.
  */
object TextFunctions {

  /** Evaluate `c` ONCE and reuse it via a lambda binding. A Column subtree
    * referenced k times is otherwise re-evaluated k times (Catalyst has no
    * cross-reference CSE for interpreted higher-order lambdas) — for an
    * expression like tokens() (a regex split) referenced inside a
    * transform(), that turns O(L) work into O(L^2). `transform` over a
    * 1-element array binds the evaluated value to a cheap lambda variable.
    */
  def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Whitespace tokens, empties dropped (Go strings.Fields semantics). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** Canonical text form: lowercase, whitespace collapsed, trimmed. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Content-defined fingerprint: md5 of the normalized text. md5 is
    * engine-portable (identical hex in Spark and DuckDB), so exact-dedup
    * groups are oracle-checkable — and at scale you group by a 128-bit
    * digest instead of shuffling full document bodies. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Word n-gram shingles (space-joined), the dedup unit for MinHash /
    * Jaccard. Returns distinct shingles in first-occurrence order, via a
    * single-pass expression (HashExprs.NgramShingles) — the built-in
    * formulation (sequence/transform/concat_ws/array_distinct) allocates
    * per element and re-dispatches per lambda call on the hot path. */
  def shingles(text: Column, n: Int): Column =
    HashExprs.ngram_shingles(tokens(text), n)

  def tokenCount(text: Column): Column = size(tokens(text))

  private def alphaRatioOf(toks: Column): Column =
    size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("double") /
      size(toks).cast("double")

  private def typeTokenRatioOf(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  /** Fraction of tokens that are purely alphabetic. */
  def alphaRatio(text: Column): Column =
    bind(tokens(text))(alphaRatioOf)

  /** Type-token ratio (lexical diversity). */
  def typeTokenRatio(text: Column): Column =
    bind(tokens(text))(typeTokenRatioOf)

  /** Language stopword sets (tiny, public-knowledge function-word lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "que", "y", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"),
    "fr" -> Seq("le", "les", "des", "et", "est", "dans", "une"),
  )

  /** Occurrences of any word from `set` among the tokens. */
  def stopwordHits(text: Column, set: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(set)))

  /** N-gram-free language-ID heuristic: argmax of stopword hits, ties
    * resolved en > es > de > fr, all-zero -> "und". Deterministic and
    * SQL-expressible, so the oracle can replay it. Tokens and the four
    * hit counts are each bound once per row — the when-chain references
    * every count ~3 times. */
  def langId(text: Column): Column =
    bind(tokens(text)) { toks =>
      def hits(set: Seq[String]) = size(filter(toks, t => t.isInCollection(set)))
      bind(array(Seq("en", "es", "de", "fr").map(l => hits(stopwords(l))): _*)) { h =>
        val Seq(en, es, de, fr) = (1 to 4).map(i => element_at(h, i))
        when(en === 0 && es === 0 && de === 0 && fr === 0, lit("und"))
          .when(en >= es && en >= de && en >= fr, lit("en"))
          .when(es >= de && es >= fr, lit("es"))
          .when(de >= fr, lit("de"))
          .otherwise(lit("fr"))
      }
    }

  /** Composite quality score in [0,1]:
    * 0.4·alphaRatio + 0.3·typeTokenRatio + 0.3·min(tokens,200)/200,
    * rounded half-up to 4 places — via EXACT integer arithmetic:
    * score·10⁴ = (4000a + 3000d + 15mn) / n with a = alpha tokens,
    * d = distinct tokens, n = tokens, m = min(n, 200). The naive double
    * formulation rounds a value sitting on a .00005 boundary differently
    * per engine (observed at sf0.1: one doc at 0.6033 vs 0.6032); the
    * integer quotient has one correct answer everywhere. */
  def qualityScore(text: Column): Column =
    bind(tokens(text)) { toks =>
      val n = size(toks).cast("long")
      val a = size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("long")
      val d = size(array_distinct(toks)).cast("long")
      val m = least(n, lit(200L))
      val num = lit(4000L) * a + lit(3000L) * d + lit(15L) * m * n
      // half-up rounding of num/n as integers: (2·num + n) div (2·n).
      // The double division is exact here (operands far below 2^53 and
      // the quotient's denominator 2n bounds any non-integer result away
      // from the floor boundary), so floor() cannot be off by one.
      floor((lit(2L) * num + n) / (lit(2L) * n)) / lit(10000.0)
    }

  /** Polynomial rolling hash of the normalized text (base 31, modulo the
    * prime 1e17+3): the classic Rabin-Karp document fingerprint.
    * Engine-internal (no SQL oracle) but deterministic. The modulus is
    * chosen so acc*31 + 255 stays below 2^63 — a Mersenne-2^61 modulus
    * would overflow Long in the multiply and silently compute a different
    * (wrap-around) function than documented. */
  def rollingHash(text: Column): Column = {
    // fold over characters is not expressible with codegen'd built-ins;
    // use aggregate() over the char array (evaluated per-row, no UDF).
    val chars = split(normalize(text), "")
    aggregate(
      filter(chars, c => c =!= lit("")),
      lit(0L),
      (acc, c) => pmod(acc * 31L + ascii(c).cast("long"), lit(100000000000000003L)))
  }

  /** PII patterns for corpus scrubbing. Deliberately restricted to the
    * regex subset Java and RE2 interpret identically (character classes,
    * bounded repetition, ASCII \b) so the DuckDB oracle replays the exact
    * same masking — no lookarounds, no backrefs. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val ssnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Mask emails, IPv4 addresses, and SSN-shaped ids. Email first: its
    * replacement token contains no digits, so the later numeric patterns
    * cannot re-match inside it; IP before SSN (disjoint shapes, order
    * there is cosmetic). Pure codegen'd regexp_replace chain — at 100 TB
    * this is a map-only pass, no shuffle, and the regexes are compiled
    * once per task by codegen's pattern cache. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      ssnPattern, "<ID>")

  /** Count of matches of `pattern` (full-match occurrences). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}
