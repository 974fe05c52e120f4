package graft.generator

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative synthetic-data generation — the reference's PRIMARY function
  * (data-caterer generates test data from field specs), recast Spark-first:
  * a [[FieldSpec]] list compiles to ONE projection over `spark.range`
  * (exactly the reference's range→selectExpr architecture,
  * `core/generator/DataGeneratorFactory.scala:25-52`), with all randomness
  * row-identity-keyed via `xxhash64(seed, __index)` so output is independent
  * of partitioning (`provider/DataGenerator.scala:44-52`).
  *
  * Everything is a Catalyst Column — no UDFs — so generation stays inside
  * WholeStageCodegen and scales linearly with cores.
  */
sealed trait FieldSpec {
  def name: String
  /** Compile to a Column given the deterministic per-row uniform [0,1)
    * and the generation seed (for specs that need more entropy than one
    * uniform, e.g. the md5 chain of [[AlphaNumField]]). */
  def toColumn(u: Column, idx: Column, seed: Long): Column
  /** Full hook for specs needing MANY independent uniforms (e.g. one per
    * generated character, [[RegexField]]); default derives the single
    * field-keyed uniform and delegates.
    */
  def toColumnWith(uniform: (String, Long, Column) => Column, seed: Long, idx: Column): Column =
    toColumn(uniform(name, seed, idx), idx, seed)
}

/** String matching a regex pattern (the reference's most-used string
  * generator, FastDataGenerator.scala:71-128) — compiled by [[RegexGen]] to
  * a pure Column expression; every character draw is keyed
  * (seed, "name#node.pos", idx), so generation is deterministic and
  * partitioning-invariant (the reference uses RAND(), which is neither).
  * Unsupported constructs throw at spec-construction time.
  */
final case class RegexField(name: String, pattern: String) extends FieldSpec {
  private val parts = RegexGen.parse(pattern) // fail fast on unsupported regex
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    throw new UnsupportedOperationException("RegexField uses toColumnWith")
  override def toColumnWith(uniform: (String, Long, Column) => Column, seed: Long, idx: Column): Column =
    RegexGen.toColumn(parts, key => uniform(s"$name#$key", seed, idx))
}

/** Deterministic binary payload: 16 bytes = unhex(md5(draw)) — the
  * reference's binary type generates random bytes
  * (`RandomDataGenerator.scala` binary case); here keyed off the row
  * uniform so it is partitioning-invariant like every other field. */
final case class BytesField(name: String) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    unhex(md5(u.cast("string")))
}

/** Uniform long in [lo, hi]. */
final case class IntField(name: String, lo: Long, hi: Long) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    (lit(lo) + (u * (hi - lo + 1)).cast("long")).cast("long")
}

/** Uniform double in [lo, hi). */
final case class DoubleField(name: String, lo: Double, hi: Double) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column = lit(lo) + u * (hi - lo)
}

/** Exponential via inverse-CDF -ln(1-u)/rate (the reference's distribution
  * trick, RandomDataGenerator.scala:642-649). */
final case class ExponentialField(name: String, rate: Double) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column = -log(lit(1.0) - u) / rate
}

/** Weighted categorical (oneOf). */
final case class OneOfField(name: String, values: Seq[(String, Double)]) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column = {
    val total = values.map(_._2).sum
    val cum = values.scanLeft(0.0)(_ + _._2).tail
    val scaled = u * total
    cum.zip(values).foldRight(lit(values.last._1): Column) {
      case ((c, (v, _)), acc) => when(scaled < c, lit(v)).otherwise(acc)
    }
  }
}

/** Sequential values: prefix + zero-padded row index (unique by construction). */
final case class SequentialField(name: String, prefix: String, pad: Int) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    concat(lit(prefix), lpad(idx.cast("string"), pad, "0"))
}

/** Random alphanumeric string of length in [minLen, maxLen] — md5-chain
  * based, no UDF (the reference's fast-mode philosophy,
  * FastDataGenerator.scala:104-110). */
final case class AlphaNumField(name: String, minLen: Int, maxLen: Int) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    throw new UnsupportedOperationException("AlphaNumField uses toColumnWith")
  // content chain built FROM the keyed uniforms (one per md5 block), so the
  // full key path applies: two same-named AlphaNum fields in different
  // structs, or array positions of an AlphaNum element, draw independent
  // strings (the bare (seed, name, idx) chain used before ignored the
  // nesting path and aliased all of those).
  override def toColumnWith(uniform: (String, Long, Column) => Column, seed: Long, idx: Column): Column = {
    val u = uniform(name, seed, idx)
    val len = (lit(minLen) + (u * (maxLen - minLen + 1)).cast("int"))
    val blocks = (maxLen / 32) + 1
    val full = concat((0 until blocks).map(b =>
      md5(concat(uniform(s"$name#chain$b", seed, idx).cast("string"), lit("|"),
        idx.cast("string")))): _*)
    substring(full, 1, maxLen).substr(lit(1), len)
  }
}

/** Faker-expression field ([[Faker]] — the reference's
  * `GENERATE_FAKER_EXPRESSION`, `DataGeneratorFactory.scala:436-437`):
  * `TemplateField("owner", "#{Name.name} from #{Address.city}")`. Each
  * directive occurrence is keyed by its token position
  * (`field#t<i>.<sub>`), so `"#{Name.firstName} #{Name.firstName}"` draws
  * two INDEPENDENT names — datafaker semantics.
  */
final case class TemplateField(name: String, template: String) extends FieldSpec {
  private val tokens = Faker.parse(template) // fail fast on bad templates
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    throw new UnsupportedOperationException("TemplateField uses toColumnWith")
  override def toColumnWith(uniform: (String, Long, Column) => Column, seed: Long, idx: Column): Column = {
    val cols = tokens.zipWithIndex.map {
      case (Faker.Lit(s), _) => lit(s)
      case (Faker.Directive(k), i) =>
        Faker.directiveColumn(k, sub => uniform(s"$name#t$i.$sub", seed, idx))
    }
    if (cols.size == 1) cols.head else concat(cols: _*)
  }
}

/** Date in [start, start+days). */
final case class DateField(name: String, start: String, days: Int) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    date_add(to_date(lit(start)), (u * days).cast("int"))
}

/** Timestamp in [start, start+seconds). */
final case class TimestampField(name: String, start: String, seconds: Long) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    timestamp_seconds(unix_timestamp(to_timestamp(lit(start))) + (u * seconds).cast("long"))
}

/** Decimal in [0, 10^(p-s)) rendered at exactly (precision, scale) — the
  * reference's `decimal(5,2)` field type; headroom keeps scale-rounding
  * from overflowing the precision. */
final case class DecimalField(name: String, precision: Int, scale: Int) extends FieldSpec {
  require(precision > 0 && scale >= 0 && scale <= precision,
    s"decimal $name: bad (precision, scale) = ($precision, $scale)")
  def toColumn(u: Column, idx: Column, seed: Long): Column = {
    val hi = math.pow(10, math.min(precision - scale, 9)) - 2 * math.pow(10, -scale)
    (u * math.max(hi, 0.0)).cast(s"decimal($precision,$scale)")
  }
}

/** Map of `minLen..maxLen` generated entries via `map_from_entries` over
  * the same bounded unrolling as [[ArraySpec]] — keys drawn per position
  * (duplicate keys would make map_from_entries throw; key specs should
  * carry enough entropy or the map stays small). */
final case class MapSpec(name: String, key: FieldSpec, value: FieldSpec,
    minLen: Int, maxLen: Int) extends FieldSpec {
  require(minLen >= 0 && maxLen >= minLen, s"map $name: bad bounds")
  require(!Generator.hasSqlDeep(key) && !Generator.hasSqlDeep(value),
    s"map $name: computed (sql) fields inside map entries are not supported")
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    throw new UnsupportedOperationException("MapSpec uses toColumnWith")
  override def toColumnWith(uniform: (String, Long, Column) => Column, seed: Long, idx: Column): Column = {
    val entries = Generator.boundedArray(uniform, s"$name#len", seed, idx, minLen, maxLen) { j =>
      struct(
        key.toColumnWith((n, s, i) => uniform(s"$name[$j].key.$n", s, i), seed, idx).as("key"),
        value.toColumnWith((n, s, i) => uniform(s"$name[$j].value.$n", s, i), seed, idx).as("value"))
    }
    // low-entropy key types (dates, booleans) WILL draw duplicate keys, and
    // map_from_entries throws on them by default — keep the FIRST entry per
    // key (tiny arrays: the interpreted HOF is negligible)
    map_from_entries(filter(entries, (e, i) =>
      !exists(slice(entries, lit(1), i), p => p("key") === e("key"))))
  }
}

/** Wraps another spec with a cast to an exact DDL type — DDL-declared
  * scalars (`int`, `float`, `boolean`) must come out AS DECLARED, not as
  * the inner generator's natural type (IntField emits bigint). */
final case class CastSpec(inner: FieldSpec, ddlType: String) extends FieldSpec {
  def name: String = inner.name
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    inner.toColumn(u, idx, seed).cast(ddlType)
  override def toColumnWith(uniform: (String, Long, Column) => Column, seed: Long, idx: Column): Column =
    inner.toColumnWith(uniform, seed, idx).cast(ddlType)
}

/** Computed column: arbitrary SQL over previously generated fields (the
  * reference's computed-column stage, GeneratorUtil.scala:93-269). Computed
  * fields may reference each other in ANY listed order — [[Generator]]
  * topologically sorts them by their column references (the reference's
  * dependency leveling) and rejects cycles. */
final case class SqlField(name: String, sql: String) extends FieldSpec {
  def toColumn(u: Column, idx: Column, seed: Long): Column = expr(sql)
}

/** Nested struct: children generate with uniforms keyed by the full dotted
  * path (`parent.child`), so nesting never aliases sibling randomness — the
  * reference builds nested structs in `DataGeneratorFactory.scala:199-336`.
  * [[SqlField]] children ARE allowed (the reference's nested computed
  * fields) — structs containing them are built by [[Generator.generate]]'s
  * second projection stage, where the SQL can reference any top-level
  * generated column; calling `toColumnWith` directly on such a struct
  * throws. */
final case class StructSpec(name: String, children: Seq[FieldSpec]) extends FieldSpec {
  require(children.nonEmpty, s"struct $name: needs children")
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    throw new UnsupportedOperationException("StructSpec uses toColumnWith")
  override def toColumnWith(uniform: (String, Long, Column) => Column, seed: Long, idx: Column): Column = {
    require(!Generator.hasSqlDeep(this),
      s"struct $name: contains computed (sql) children — generate it through " +
        "Generator.generate, which applies those in the second projection stage")
    struct(children.map(c =>
      c.toColumnWith((n, s, i) => uniform(s"$name.$n", s, i), seed, idx).as(c.name)): _*)
  }
}

/** Array of `minLen..maxLen` generated elements. Element draws are keyed by
  * `name[position].element`; the bounded unrolling (maxLen columns, sliced
  * to the drawn length) keeps generation a pure projection — no explode, no
  * UDF (same technique as [[RegexGen.toColumn]]). */
final case class ArraySpec(name: String, element: FieldSpec, minLen: Int, maxLen: Int) extends FieldSpec {
  require(minLen >= 0 && maxLen >= minLen,
    s"array $name: bad bounds [$minLen, $maxLen]")
  // elements MAY contain computed (sql) children — such arrays build in
  // Generator.generate's late stage, where the sql sees the frame's
  // top-level columns (ROW-scoped: the same value in every element;
  // per-element lambda scoping is not supported)
  def toColumn(u: Column, idx: Column, seed: Long): Column =
    throw new UnsupportedOperationException("ArraySpec uses toColumnWith")
  override def toColumnWith(uniform: (String, Long, Column) => Column, seed: Long, idx: Column): Column = {
    require(!Generator.hasSqlDeep(element),
      s"array $name: contains computed (sql) children — generate it through " +
        "Generator.generate, which applies those in the second projection stage")
    Generator.boundedArray(uniform, s"$name#len", seed, idx, minLen, maxLen) { j =>
      element.toColumnWith((n, s, i) => uniform(s"$name[$j].$n", s, i), seed, idx)
    }
  }
}

object Generator {

  /** Per-field deterministic uniform: xxhash64(seed, field name, row index)
    * normalized to [0,1). Row-keyed → parallelism-invariant; field-keyed →
    * fields are independent. The default (fast, codegen'd) source.
    */
  def xxhashUniform(fieldName: String, seed: Long, idx: Column): Column =
    (pmod(xxhash64(lit(seed), lit(fieldName), idx), lit(1L << 40)).cast("double")
      / lit((1L << 40).toDouble))

  /** Engine-portable uniform: 16 bits from the first 4 md5 hex digits,
    * decoded by ascii arithmetic (the same trick as Dedup.simhash16 —
    * works identically in DuckDB, which lacks xxhash64 and hex→int casts).
    * Used by the oracle-checked generator queries; coarser (2^16 grid) but
    * plenty for bucketing/categorical draws.
    */
  def portableUniform(fieldName: String, seed: Long, idx: Column): Column = {
    val h = md5(concat(lit(seed.toString), lit("|"), lit(fieldName), lit("|"), idx.cast("string")))
    val hexv = (c: Column) => when(ascii(c) <= 57, ascii(c) - 48).otherwise(ascii(c) - 87)
    val v = hexv(substring(h, 1, 1)) * 4096 + hexv(substring(h, 2, 1)) * 256 +
      hexv(substring(h, 3, 1)) * 16 + hexv(substring(h, 4, 1))
    v.cast("double") / lit(65536.0)
  }

  /** Generate `n` rows from the specs. Computed (Sql) fields are applied in
    * a second projection so they can reference any generated field.
    * `nullProbability` per-field nulls (reference nullability strategy).
    */
  def generate(
      spark: SparkSession,
      n: Long,
      specs: Seq[FieldSpec],
      seed: Long = 42L,
      partitions: Int = 0,
      nullProb: Map[String, Double] = Map.empty,
      uniform: (String, Long, Column) => Column = xxhashUniform): DataFrame = {
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    val idx = col("id")
    // LATE specs — top-level SqlFields AND structs containing nested sql
    // children (the reference's nested computed fields) — apply in a second
    // projection over the full frame
    val (plain, late) = specs.partition(s => !hasSqlDeep(s))
    val cols = plain.map { s =>
      val c = s.toColumnWith(uniform, seed, idx)
      val withNulls = nullProb.get(s.name) match {
        case Some(p) => when(uniform(s.name + "\u0000null", seed, idx) < p, lit(null)).otherwise(c)
        case None => c
      }
      withNulls.as(s.name)
    }
    val df = base.select((idx.as("__index_inc") +: cols): _*)
    // the late stage runs over the projected frame, where the row index
    // column is named __index_inc (not the range's `id`); nullProb applies
    // to late specs the same way it does to plain ones
    val lateIdx = col("__index_inc")
    val out = topoOrder(late).foldLeft(df) { case (d, s) =>
      // TWO-PASS hybrid structs: sql children may reference PLAIN siblings
      // through the struct's own name (`customer_details.email` inside
      // customer_details — the reference's nested computed fields do this),
      // so stage the plain subset under the final name first, then rebuild
      // wholly with the sql children resolving against the staged column
      val staged = s match {
        case st: StructSpec =>
          // incremental: plain children first, then sql children one at a
          // time in declaration order — CHAINED sibling sql (a computed
          // child referencing an earlier computed sibling) resolves
          // against the previous stage
          stagedSubsets(st).foldLeft(d)((dd, sub) =>
            dd.withColumn(s.name, lateColumn(sub, uniform, seed, lateIdx)))
        case _ => d
      }
      val c = lateColumn(s, uniform, seed, lateIdx)
      val withNulls = nullProb.get(s.name) match {
        case Some(p) => when(uniform(s.name + "\u0000null", seed, lateIdx) < p, lit(null)).otherwise(c)
        case None => c
      }
      staged.withColumn(s.name, withNulls)
    }
    out.drop("__index_inc")
  }

  /** The struct with only its non-computed children (recursively) — the
    * first staging column sibling sql references resolve against; None
    * when every child is computed. */
  private def plainSubset(st: StructSpec): Option[StructSpec] = {
    val kept = st.children.flatMap {
      case _: SqlField => None
      case nested: StructSpec if hasSqlDeep(nested) => plainSubset(nested)
      case ar: ArraySpec if hasSqlDeep(ar) => None
      case c => Some(c)
    }
    if (kept.isEmpty) None else Some(StructSpec(st.name, kept))
  }

  /** Staging sequence for a hybrid struct: the plain subset (with nested
    * hybrid structs reduced to THEIR plain subsets, so deep paths like
    * `body.inner.x` resolve from the first stage), then one more computed
    * child per stage in SIBLING-DEPENDENCY order (a computed child may
    * reference a later-declared computed sibling — topo-sort by bare/
    * self-path references, like top-level computed fields). Field order
    * within a staging column is irrelevant — sibling sql addresses
    * children by name; the FINAL build restores declaration order. */
  private def stagedSubsets(st: StructSpec): Seq[StructSpec] = {
    val (plainKids0, sqlKids0) = st.children.partition(c => !hasSqlDeep(c))
    // nested hybrids contribute their plain parts to every stage
    val nestedPlain = sqlKids0.flatMap {
      case nested: StructSpec => plainSubset(nested)
      case _ => None
    }
    val plainKids = plainKids0 ++ nestedPlain
    val sqlKids = orderBySiblingDeps(st, sqlKids0)
    val stages =
      if (sqlKids.size <= 1) Seq(plainKids)
      else (0 until sqlKids.size).map { k =>
        // children not yet staged keep their plain reduction in place so
        // their names stay resolvable (last-wins by name in a struct is
        // fine — the staged sql version replaces the reduced one)
        val remainingPlain = sqlKids.drop(k).flatMap {
          case nested: StructSpec => plainSubset(nested)
          case _ => None
        }
        plainKids0 ++ remainingPlain ++ sqlKids.take(k)
      }
    // a stage with NO children cannot be built (StructSpec requires some) —
    // skip it; the next stage (or the final build) carries on
    stages.filter(_.nonEmpty).map(kids => StructSpec(st.name, kids))
  }

  /** Order a struct's computed children so every sibling reference (bare
    * name or `<struct>.<name>` self-path) comes after its dependency;
    * cycles fail loudly via the shared Kahn sort. */
  private def orderBySiblingDeps(st: StructSpec, sqlKids: Seq[FieldSpec]): Seq[FieldSpec] = {
    if (sqlKids.size <= 1) return sqlKids
    val byName = sqlKids.map(k => k.name -> k).toMap
    val edges = sqlKids.flatMap { k =>
      sqlTexts(k).flatMap { sql =>
        try org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(sql).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            val parts = a.nameParts
            Seq(parts.head) ++
              (if (parts.head == st.name && parts.size > 1) Seq(parts(1)) else Nil)
        }.flatten
        catch { case _: Exception => Nil }
      }.distinct.filter(r => byName.contains(r) && r != k.name).map(_ -> k.name)
    }
    ForeignKeys.insertOrder(sqlKids.map(_.name), edges.distinct).map(byName)
  }

  /** A late spec's column: a bare SqlField is its expression; a hybrid
    * struct rebuilds the struct with plain children drawn via the SAME
    * dotted-path uniform keys a pure struct would use and sql children as
    * expressions over the frame's top-level columns. */
  private def lateColumn(s: FieldSpec,
      uniform: (String, Long, Column) => Column, seed: Long, idx: Column,
      path: Seq[String] = Nil, inArray: Boolean = false): Column = s match {
    case sf: SqlField => expr(sf.sql)
    case st: StructSpec =>
      val here = path :+ st.name
      val siblings = st.children.map(_.name).toSet
      struct(st.children.map {
        case sf: SqlField =>
          // a nested sql may reference SIBLINGS by bare name (the
          // reference resolves unqualified names relative to the
          // enclosing struct) — qualify them with the struct's full path
          // so they resolve against the staged column. Inside ARRAY
          // elements there is no staged column to resolve against
          // (per-element siblings are unreachable) — leave the sql
          // untouched so top-level references still work and sibling
          // references fail with Spark's own unresolved-column error.
          val sql = if (inArray) sf.sql
            else rewriteSiblingRefs(sf.sql, siblings - sf.name, here)
          expr(sql).as(sf.name)
        case c =>
          lateColumn(c, (nm, s2, i) => uniform(s"${st.name}.$nm", s2, i),
            seed, idx, here, inArray).as(c.name)
      }: _*)
    case ar: ArraySpec if hasSqlDeep(ar) =>
      // sql children are ROW-scoped (same value every element); plain
      // children keep per-position uniform keys like ArraySpec itself
      boundedArray(uniform, s"${ar.name}#len", seed, idx, ar.minLen, ar.maxLen) { j =>
        lateColumn(ar.element, (nm, s2, i) => uniform(s"${ar.name}[$j].$nm", s2, i),
          seed, idx, path, inArray = true)
      }
    case other => other.toColumnWith(uniform, seed, idx)
  }

  /** The bounded unrolling every variable-length collection uses: maxLen
    * element columns sliced to a drawn length — ONE implementation of the
    * len/slice formula. */
  private[generator] def boundedArray(uniform: (String, Long, Column) => Column,
      lenKey: String, seed: Long, idx: Column, minLen: Int, maxLen: Int)
      (elem: Int => Column): Column = {
    val len = lit(minLen) + floor(uniform(lenKey, seed, idx) * (maxLen - minLen + 1)).cast("int")
    slice(array((0 until maxLen).map(elem): _*), lit(1), len)
  }

  /** Qualify bare sibling references in a nested sql with the enclosing
    * struct's full path (`order_details.items` inside `body` becomes
    * `body.order_details.items`) — parse, transform the unresolved
    * attribute tree, and regenerate SQL text. */
  private def rewriteSiblingRefs(sql: String, siblings: Set[String],
      structPath: Seq[String]): String = {
    if (structPath.isEmpty || siblings.isEmpty) return sql
    try {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      val parser = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      val parsed = parser.parseExpression(sql)
      val rewritten = parsed.transform {
        case a: UnresolvedAttribute if siblings.contains(a.nameParts.head) =>
          UnresolvedAttribute(structPath ++ a.nameParts)
      }
      if (rewritten eq parsed) sql
      else {
        // regenerated text must itself re-parse (lambda-bearing expressions
        // don't round-trip through .sql) — fall back to the original
        val text = rewritten.sql
        parser.parseExpression(text)
        text
      }
    } catch { case _: Exception => sql }
  }

  /** All sql texts inside a (possibly hybrid-struct) late spec. */
  private def sqlTexts(s: FieldSpec): Seq[String] = s match {
    case sf: SqlField => Seq(sf.sql)
    case StructSpec(_, cs) => cs.flatMap(sqlTexts)
    case ArraySpec(_, e, _, _) => sqlTexts(e)
    case _ => Nil
  }

  /** Dependency-levels computed specs (the reference's topological ordering
    * of computed columns, `GeneratorUtil.scala:93-269`): a late spec whose
    * SQL references another late spec's name — directly or as the base of a
    * dotted path like `details.updated_by.time` — is applied after it,
    * whatever the listed order; cycles are rejected (Kahn, via
    * [[ForeignKeys.insertOrder]]). References are read off the UNRESOLVED
    * expression tree — no analysis pass needed.
    */
  private def topoOrder(late: Seq[FieldSpec]): Seq[FieldSpec] = {
    if (late.size <= 1) return late
    val byName = late.map(s => s.name -> s).toMap
    val edges = late.flatMap { s =>
      sqlTexts(s).flatMap { sql =>
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(sql).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            Seq(a.name, a.nameParts.head)
        }.flatten
      }.distinct.filter(r => byName.contains(r) && r != s.name).map(_ -> s.name)
    }
    ForeignKeys.insertOrder(late.map(_.name), edges.distinct).map(byName)
  }

  /** Does this spec (recursively) contain a computed [[SqlField]]? */
  private[generator] def hasSqlDeep(s: FieldSpec): Boolean = s match {
    case _: SqlField => true
    case StructSpec(_, cs) => cs.exists(hasSqlDeep)
    case ArraySpec(_, e, _, _) => hasSqlDeep(e)
    case _ => false
  }

  /** Per-parent fan-out (the reference's per-field count,
    * DataGeneratorFactory.scala:75-100): emits between lo and hi child rows
    * per input row, deterministically.
    */
  def fanOut(df: DataFrame, idCol: String, lo: Int, hi: Int, seed: Long = 42L): DataFrame = {
    val u = (pmod(xxhash64(lit(seed), lit("fanout"), col(idCol)), lit(1L << 40)).cast("double")
      / lit((1L << 40).toDouble))
    val cnt = (lit(lo) + (u * (hi - lo + 1)).cast("int"))
    df.withColumn("__fan", explode(sequence(lit(1), cnt)))
      .withColumnRenamed("__fan", "child_idx")
  }
}
