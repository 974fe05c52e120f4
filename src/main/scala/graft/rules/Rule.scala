package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A single declarative data-quality rule: a named Catalyst `Column`
  * predicate (`true` = the row passes).
  *
  * This is the Spark-first recast of the reference's validation vocabulary
  * (data-caterer `api/.../ValidationBuilder.scala:248-985`), where every rule
  * is compiled to a SQL expression string and evaluated as
  * `df.where(s"!($expr)").count()` per rule
  * (`core/validator/ValidationOperations.scala:36-60`). We keep the
  * vocabulary but build typed `Column`s, and evaluate ALL rules in one
  * projection (see [[RuleEngine]]) instead of one Spark job per rule — at
  * 100 TB a per-rule pass over the data is the difference between 1 scan and
  * N scans.
  *
  * Null semantics: a row whose predicate evaluates to NULL *fails* the rule
  * (a null caption fails a length rule). The reference's `where(!expr)`
  * silently treats NULL as pass; for a quality filter that is the wrong
  * default, so we document the deviation here and make it explicit with
  * `coalesce(pred, false)` at evaluation time.
  */
final case class Rule(name: String, predicate: Column,
    /** Per-rule error tolerance (reference `errorThreshold`: <1 = fraction
      * of rows, >=1 = absolute count); None = the engine default. Carried on
      * the rule so mixed-tolerance rule sets still evaluate in ONE pass. */
    threshold: Option[Double] = None) {
  // combined tolerance is only well-defined when both sides agree — carry
  // it then, else fall back to the engine default (never silently drop one
  // side's configured threshold in favor of the other's)
  private def sharedTh(other: Rule): Option[Double] =
    if (threshold == other.threshold) threshold else None
  def &&(other: Rule): Rule =
    Rule(s"$name&${other.name}", predicate && other.predicate, sharedTh(other))
  def ||(other: Rule): Rule =
    Rule(s"$name|${other.name}", predicate || other.predicate, sharedTh(other))
  def negate(newName: String): Rule = Rule(newName, !predicate, threshold)
  def withThreshold(t: Option[Double]): Rule = if (t.isEmpty) this else copy(threshold = t)
  /** Predicate with NULL coerced to fail — what the engine actually runs. */
  def strict: Column = coalesce(predicate, lit(false))
}

/** Factory for the full per-row rule vocabulary of the reference
  * (`ValidationBuilder.scala`, line refs per method). Aggregate/dataset-level
  * validations live in [[GroupRules]].
  */
object Rules {

  private def c(field: String): Column = col(field)

  // --- equality / null (ValidationBuilder.scala:248-286) ---
  def isEqual(field: String, value: Any): Rule =
    Rule(s"${field}_eq", c(field) === lit(value))
  def isNotEqual(field: String, value: Any): Rule =
    Rule(s"${field}_neq", c(field) =!= lit(value))
  def isEqualField(field: String, other: String): Rule =
    Rule(s"${field}_eq_$other", c(field) === c(other))
  def isNull(field: String): Rule = Rule(s"${field}_null", c(field).isNull)
  def isNotNull(field: String): Rule = Rule(s"${field}_notnull", c(field).isNotNull)

  // --- contains / prefix / suffix (:295-302, :468-491) ---
  def containsValue(field: String, v: String): Rule =
    Rule(s"${field}_contains", c(field).contains(v))
  def notContains(field: String, v: String): Rule =
    Rule(s"${field}_notcontains", !c(field).contains(v))
  def startsWith(field: String, v: String): Rule =
    Rule(s"${field}_startswith", c(field).startsWith(v))
  def endsWith(field: String, v: String): Rule =
    Rule(s"${field}_endswith", c(field).endsWith(v))

  // --- ordering / range (:311-400) ---
  def lessThan(field: String, v: Any, strictly: Boolean = true): Rule =
    Rule(s"${field}_lt", if (strictly) c(field) < lit(v) else c(field) <= lit(v))
  def greaterThan(field: String, v: Any, strictly: Boolean = true): Rule =
    Rule(s"${field}_gt", if (strictly) c(field) > lit(v) else c(field) >= lit(v))
  def between(field: String, lo: Any, hi: Any): Rule =
    Rule(s"${field}_between", c(field).between(lit(lo), lit(hi)))
  def notBetween(field: String, lo: Any, hi: Any): Rule =
    Rule(s"${field}_notbetween", !c(field).between(lit(lo), lit(hi)))
  def betweenFields(field: String, lo: String, hi: String): Rule =
    Rule(s"${field}_betweenfields", c(field).between(c(lo), c(hi)))

  // --- membership (:408-422) ---
  def in(field: String, values: Seq[Any]): Rule =
    Rule(s"${field}_in", c(field).isin(values: _*))
  def notIn(field: String, values: Seq[Any]): Rule =
    Rule(s"${field}_notin", !c(field).isin(values: _*))

  // --- regex (:431-459) ---
  def matches(field: String, regex: String): Rule =
    Rule(s"${field}_matches", c(field).rlike(regex))
  def notMatches(field: String, regex: String): Rule =
    Rule(s"${field}_notmatches", !c(field).rlike(regex))
  /** AND (matchAll=true) or OR of several regexes. (:448-459) */
  def matchesList(field: String, regexes: Seq[String], matchAll: Boolean = true): Rule = {
    val preds = regexes.map(c(field).rlike)
    Rule(s"${field}_matcheslist", if (matchAll) preds.reduce(_ && _) else preds.reduce(_ || _))
  }

  // --- collection size (:500-539) ---
  def sizeEqual(field: String, n: Int): Rule = Rule(s"${field}_size", size(c(field)) === n)
  def sizeLessThan(field: String, n: Int, strictly: Boolean = true): Rule =
    Rule(s"${field}_sizelt", if (strictly) size(c(field)) < n else size(c(field)) <= n)
  def sizeGreaterThan(field: String, n: Int, strictly: Boolean = true): Rule =
    Rule(s"${field}_sizegt", if (strictly) size(c(field)) > n else size(c(field)) >= n)

  // --- string length (:787-810) ---
  def lengthBetween(field: String, lo: Int, hi: Int): Rule =
    Rule(s"${field}_lenbetween", length(c(field)).between(lo, hi))
  def lengthEqual(field: String, n: Int): Rule =
    Rule(s"${field}_leneq", length(c(field)) === n)

  // --- domain checks (:547-596, :852-891) ---
  def luhnCheck(field: String): Rule =
    Rule(s"${field}_luhn", expr(s"luhn_check($field)"))
  def hasType(field: String, typeName: String): Rule =
    Rule(s"${field}_hastype", expr(s"typeof($field)") === lit(typeName))
  /** hasTypes plural — TYPEOF IN (…) (ValidationBuilder.scala:572-596). */
  def hasTypes(field: String, typeNames: Seq[String]): Rule =
    Rule(s"${field}_hastypes", expr(s"typeof($field)").isin(typeNames: _*))
  /** matchJsonSchema (ValidationBuilder.scala:868-875); `schema` is a Spark
    * DDL string like "a INT, b STRING". The reference's `FROM_JSON(...) IS
    * NOT NULL` never fires on Spark 3+ (PERMISSIVE mode yields an all-null
    * struct, not NULL) — we use the corrupt-record column instead, which
    * catches both malformed JSON and per-field type mismatches.
    */
  def matchJsonSchema(field: String, schema: String): Rule = {
    val parsed = expr(
      s"from_json($field, '$schema, _corrupt_record STRING', " +
        "map('columnNameOfCorruptRecord', '_corrupt_record'))")
    Rule(s"${field}_jsonschema", c(field).isNotNull && parsed.getField("_corrupt_record").isNull)
  }
  def isJsonParsable(field: String): Rule =
    Rule(s"${field}_json", get_json_object(c(field), "$").isNotNull || expr(s"try_variant_get(try_parse_json($field), '$$')").isNotNull)
  def matchDateTimeFormat(field: String, fmt: String): Rule =
    Rule(s"${field}_dtfmt", expr(s"try_to_timestamp($field, '$fmt')").isNotNull)

  // --- escape hatch: raw SQL boolean (:132-161, 983-985) ---
  def sqlExpr(name: String, sql: String): Rule = Rule(name, expr(sql))
  def fromColumn(name: String, pred: Column): Rule = Rule(name, pred)
}
