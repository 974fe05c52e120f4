package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-quality heuristics as pure Catalyst `Column` expressions — the
  * "fast mode" philosophy of the reference (UDF-free SQL generators,
  * `core/generator/provider/FastDataGenerator.scala:21-128`): everything here
  * stays inside WholeStageCodegen and is portable to the DuckDB oracle SQL.
  *
  * Tokenization contract (shared with the pure-Scala oracle
  * [[graft.pipeline.Oracle]]): tokens = split on runs of whitespace, empty
  * strings removed. Symbols = characters outside [A-Za-z0-9] and whitespace.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed (leading-space artifact of
    * Java's split). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Repetition ratio = distinct tokens / tokens ∈ (0,1]; low = spammy
    * repetition. NULL for empty/blank text.
    */
  def distinctTokenRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0, distinctTokenCount(text).cast("double") / n.cast("double"))
  }

  /** Fraction of non-alphanumeric, non-whitespace characters. NULL for empty
    * text. Portable: implemented as length-difference after regexp_replace,
    * identical in Spark (java.util.regex) and DuckDB (RE2) for this class.
    */
  def symbolRatio(text: Column): Column = {
    val n = length(text)
    val symbols = n - length(regexp_replace(text, "[^A-Za-z0-9 \\t\\n\\r]", ""))
    when(n > 0, symbols.cast("double") / n.cast("double"))
  }

  /** Mean token length — short-gibberish / over-long-token detector. */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0), (acc, t) => acc + length(t)).cast("double") / size(ts).cast("double"))
  }

  /** Longest run of a single repeated character (e.g. "aaaaaa") detected via
    * backreference regex — 1 if such a run of >= `n` exists, else 0.
    * `[\s\S]` (not `.`) so line-terminator runs count too, matching the
    * single-scan extractor (CaptionFeatures) and the pure-Scala oracle —
    * the streaming and batch paths must agree on newline-run captions.
    */
  def hasCharRun(text: Column, n: Int): Column =
    text.rlike(s"([\\s\\S])\\1{${n - 1},}")

  /** Stopword hit count for a marker list: number of tokens that are in the
    * list. Basis of the SQL-expressible language heuristic.
    */
  def markerHits(text: Column, markers: Seq[String]): Column = {
    val lowered = lower(text)
    val toks = filter(split(lowered, "\\s+"), t => length(t) > 0)
    size(filter(toks, t => t.isin(markers.map(lit): _*)))
  }

  /** Document fingerprint: 64-bit hex of md5 over whitespace-normalized,
    * lowercased text. md5 is identical across Spark/DuckDB → oracle-portable
    * (unlike xxhash64 which only Spark has).
    */
  def fingerprint(text: Column): Column =
    substring(md5(normalized(text)), 1, 16)

  /** Canonical normalization shared by dedup + fingerprinting: lowercase,
    * collapse whitespace runs to single spaces, trim.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Rabin–Karp-style rolling polynomial hash over the characters of the
    * normalized text: h = fold(0)((a, c) => (a*31 + code(c)) mod (2^31-1)).
    * Pure integer arithmetic → portable to any engine (DuckDB twin uses
    * list_reduce with a prepended 0 sentinel). Base fingerprint for
    * shift-tolerant chunk dedup.
    */
  def rollingHash(text: Column): Column = {
    val f = org.apache.spark.sql.functions.udf((s: String) => rollingHashScala(s))
    f(text)
  }

  /** Pure-Scala twin of the rolling hash: the Column formulation
    * (per-char split → interpreted aggregate fold) paid one interpreted
    * lambda eval per CHARACTER — ~3.4 s per 50k docs in the sf1 noop probe
    * (invisible to the count-based bench, which prunes the column) vs ~0.2 s
    * JIT'd. Semantics identical: normalization = lower, `\s+`-runs → single
    * space, trim; fold is over CODE POINTS (Spark's split("") + ascii()
    * yield code points, not UTF-16 units); empty normalized text folds to
    * 0, null in → null out.
    */
  def rollingHashScala(text: String): java.lang.Long = {
    if (text == null) return null
    val s = text.toLowerCase
    val n = s.length
    @inline def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'
    val P = 2147483647L
    var h = 0L
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) { pendingSpace = started; i += 1 }
      else {
        if (pendingSpace) { h = (h * 31 + ' '.toInt) % P; pendingSpace = false }
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % P
        started = true
        i += Character.charCount(cp)
      }
    }
    h
  }

  /** Portable 63-bit positive hash from md5 (same value in Spark, DuckDB and
    * plain Scala): first 15 hex digits as a base-16 long. Used wherever the
    * oracle must reproduce a hash; xxhash64 stays for Spark-only paths (it is
    * faster and codegen'd).
    */
  def portableHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles of the normalized text, e.g. n=3 →
    * ["a b c", "b c d", ...]; empty array when fewer than n tokens.
    * Built with sequence+transform (no UDF, no explode needed).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(normalized(text))
    val k = size(toks) - (n - 1)
    when(k > 0,
      transform(sequence(lit(1), k), i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }
}
