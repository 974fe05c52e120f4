package graft.generator

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regex-pattern string generation, UDF-free — the reference's most-used
  * string generator (`core/generator/provider/FastDataGenerator.scala:21-128`
  * compiles a regex AST to SQL, `provider/regex/RegexNode.scala:9-197`),
  * recast as Catalyst Columns with the engine's deterministic, row-keyed
  * randomness: every character draw is an independent uniform keyed by
  * (seed, field#node.position, row index), so output is partitioning-
  * invariant and reproducible — the reference's generators use RAND(), which
  * is neither.
  *
  * Supported subset (a parse failure names the offending construct):
  *   - literals, with `\`-escapes for regex metacharacters
  *   - character classes `[A-Za-z0-9_-]` (ranges + singles), `\d`, `\w`
  *   - alternation groups of literals `(foo|bar|baz)`
  *   - quantifiers `{n}`, `{m,n}`, `?` on classes/groups/single chars;
  *     unbounded `+` / `*` are capped at [1,8] / [0,8] (generation needs a
  *     bound; documented deviation, same spirit as the reference's fallback)
  */
object RegexGen {

  sealed trait Part
  /** Fixed literal text. */
  final case class Lit(value: String) extends Part
  /** `min..max` draws from `alphabet` (one uniform per position). */
  final case class Chars(alphabet: String, min: Int, max: Int) extends Part
  /** One of the literal alternatives, uniformly. */
  final case class Alt(options: Seq[String], min: Int = 1, max: Int = 1) extends Part

  /** Compile a parsed pattern to one Column. `u(key)` must return a
    * deterministic per-row uniform in [0,1) for a distinct key — the
    * generator passes `uniform(s"$field#$key", seed, idx)`.
    */
  def toColumn(parts: Seq[Part], u: String => Column): Column = {
    val pieces = parts.zipWithIndex.map {
      case (Lit(v), _) => lit(v)
      case (Chars(ab, min, max), i) =>
        val one = (p: Int) => draw(ab, u(s"$i.$p"))
        varLength(min, max, u(s"len$i"), one)
      case (Alt(opts, min, max), i) =>
        val one = (p: Int) => {
          val k = floor(u(s"$i.$p") * opts.size).cast("int")
          opts.zipWithIndex.tail.foldLeft(lit(opts.head): Column) {
            case (acc, (o, j)) => when(k === j, lit(o)).otherwise(acc)
          }
        }
        varLength(min, max, u(s"len$i"), one)
    }
    if (pieces.size == 1) pieces.head else concat(pieces: _*)
  }

  /** One character from `alphabet` at a u-derived position (1-based
    * substring; floor, not cast — DuckDB's double→int cast rounds).
    */
  private def draw(alphabet: String, u: Column): Column =
    substring(lit(alphabet), (floor(u * alphabet.length).cast("int") + 1).cast("int"), lit(1))

  /** `min..max` repetitions of `one(p)`: length drawn once, positions beyond
    * it contribute "". Bounded unrolling keeps everything in codegen (no
    * explode, no UDF); patterns bound max, so the unroll is small.
    */
  private def varLength(min: Int, max: Int, lenU: Column, one: Int => Column): Column = {
    require(min >= 0 && max >= min, s"bad quantifier {$min,$max}")
    if (max == 0) lit("")
    else if (min == max) {
      val cs = (0 until min).map(one)
      if (cs.size == 1) cs.head else concat(cs: _*)
    } else {
      val len = lit(min) + floor(lenU * (max - min + 1)).cast("int")
      val cs = (0 until max).map(p => when(lit(p) < len, one(p)).otherwise(lit("")))
      if (cs.size == 1) cs.head else concat(cs: _*)
    }
  }

  private val DigitClass = "0123456789"
  private val WordClass = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_"

  /** Parse `pattern` into [[Part]]s; throws IllegalArgumentException naming
    * any unsupported construct.
    */
  def parse(pattern: String): Seq[Part] = {
    val out = scala.collection.mutable.ArrayBuffer[Part]()
    var i = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"unsupported regex construct in '$pattern' at $i: $msg")

    // {n} {m,n} ? + * following a unit; returns (min, max) or (1, 1)
    def quantifier(): (Int, Int) = {
      if (i >= pattern.length) return (1, 1)
      pattern.charAt(i) match {
        case '{' =>
          val close = pattern.indexOf('}', i)
          if (close < 0) fail("unclosed {")
          val body = pattern.substring(i + 1, close)
          i = close + 1
          body.split(",", -1) match {
            case Array(n) => (n.trim.toInt, n.trim.toInt)
            case Array(m, "") => (m.trim.toInt, m.trim.toInt + 7) // {m,} capped
            case Array(m, n) => (m.trim.toInt, n.trim.toInt)
            case _ => fail(s"bad quantifier {$body}"); (1, 1)
          }
        case '?' => i += 1; (0, 1)
        case '+' => i += 1; (1, 8) // unbounded: documented cap
        case '*' => i += 1; (0, 8)
        case _ => (1, 1)
      }
    }

    def charClass(): String = {
      // at pattern(i) == '['
      i += 1
      if (i < pattern.length && pattern.charAt(i) == '^') fail("negated class [^...]")
      val sb = new StringBuilder
      var closed = false
      while (i < pattern.length && !closed) {
        pattern.charAt(i) match {
          case ']' => closed = true; i += 1
          case '\\' if i + 1 < pattern.length =>
            pattern.charAt(i + 1) match {
              case 'd' => sb ++= DigitClass
              case 'w' => sb ++= WordClass
              case c => sb += c
            }
            i += 2
          case lo if i + 2 < pattern.length && pattern.charAt(i + 1) == '-' &&
              pattern.charAt(i + 2) != ']' =>
            val hi = pattern.charAt(i + 2)
            if (hi < lo) fail(s"inverted range $lo-$hi")
            (lo to hi).foreach(sb += _)
            i += 3
          case c => sb += c; i += 1
        }
      }
      if (!closed) fail("unclosed [")
      if (sb.isEmpty) fail("empty class []")
      sb.result()
    }

    def group(): Seq[String] = {
      // at pattern(i) == '(' — alternation of literals only
      i += 1
      if (pattern.startsWith("?:", i)) i += 2 // non-capturing marker ok
      val opts = scala.collection.mutable.ArrayBuffer[String]()
      val sb = new StringBuilder
      var closed = false
      while (i < pattern.length && !closed) {
        pattern.charAt(i) match {
          case ')' => closed = true; i += 1
          case '|' => opts += sb.result(); sb.clear(); i += 1
          case '\\' if i + 1 < pattern.length => sb += pattern.charAt(i + 1); i += 2
          case c if "[](){}?+*." contains c => fail(s"non-literal '$c' inside group")
          case c => sb += c; i += 1
        }
      }
      if (!closed) fail("unclosed (")
      opts += sb.result()
      opts.toSeq
    }

    val literalRun = new StringBuilder
    def flushLit(): Unit =
      if (literalRun.nonEmpty) { out += Lit(literalRun.result()); literalRun.clear() }

    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '[' =>
          flushLit()
          val ab = charClass()
          val (mn, mx) = quantifier()
          out += Chars(ab, mn, mx)
        case '(' =>
          flushLit()
          val opts = group()
          val (mn, mx) = quantifier()
          out += Alt(opts, mn, mx)
        case '\\' if i + 1 < pattern.length =>
          pattern.charAt(i + 1) match {
            case 'd' => flushLit(); i += 2; val (mn, mx) = quantifier(); out += Chars(DigitClass, mn, mx)
            case 'w' => flushLit(); i += 2; val (mn, mx) = quantifier(); out += Chars(WordClass, mn, mx)
            case c => literalRun += c; i += 2
          }
        case c @ ('^' | '$') =>
          // anchors are no-ops for generation
          i += 1; val _ = c
        case '.' => fail("wildcard . (use an explicit class)")
        case '|' => fail("top-level alternation (wrap in a group: (a|b))")
        case ')' => fail("unmatched )")
        case '}' => fail("unmatched }")
        case c if "{?+*".contains(c) =>
          // quantifier on the LAST literal char: pull it out of the run
          if (literalRun.isEmpty) fail(s"dangling '$c'")
          val lastChar = literalRun.charAt(literalRun.length - 1)
          literalRun.setLength(literalRun.length - 1)
          flushLit()
          val (mn, mx) = quantifier()
          out += Chars(lastChar.toString, mn, mx)
        case c => literalRun += c; i += 1
      }
    }
    flushLit()
    if (out.isEmpty) fail("empty pattern")
    out.toSeq
  }
}
