package graft.rules

import org.apache.spark.sql.DataFrame

/** Schema-level (field-name) validations — the reference's
  * `FieldNamesValidationOps` (`core/validator/ValidationOperations.scala:
  * 227-260`): count, order, and set checks over `df.columns`. Pure
  * driver-side metadata — no job runs. Results reuse [[RuleResult]] with the
  * offending names as samples, mirroring the reference's error-sample maps.
  */
object SchemaRules {

  /** Exactly `n` columns (VALIDATION_FIELD_NAME_COUNT_EQUAL). */
  def fieldCountEqual(df: DataFrame, n: Int): RuleResult = {
    val ok = df.columns.length == n
    RuleResult("field_count_equal", 1, if (ok) 0 else 1, ok,
      if (ok) Nil else Seq(Map("columnLength" -> df.columns.length)))
  }

  /** Column count within [min, max] (VALIDATION_FIELD_NAME_COUNT_BETWEEN). */
  def fieldCountBetween(df: DataFrame, min: Int, max: Int): RuleResult = {
    val len = df.columns.length
    val ok = len >= min && len <= max
    RuleResult("field_count_between", 1, if (ok) 0 else 1, ok,
      if (ok) Nil else Seq(Map("columnLength" -> len)))
  }

  /** Columns match `names` position by position
    * (VALIDATION_FIELD_NAME_MATCH_ORDER): total = zipped length, errors =
    * misaligned positions, samples name each misalignment.
    */
  def fieldNameMatchOrder(df: DataFrame, names: Seq[String]): RuleResult = {
    val zipped = df.columns.zip(names).zipWithIndex
    val misaligned = zipped.filter { case ((got, exp), _) => got != exp }
    RuleResult("field_name_match_order", zipped.length, misaligned.length,
      misaligned.isEmpty && df.columns.length == names.length,
      misaligned.toSeq.map { case ((got, exp), i) => Map(s"field_index_$i" -> s"$got -> $exp") })
  }

  /** All of `names` present (any order, extras allowed)
    * (VALIDATION_FIELD_NAME_MATCH_SET).
    */
  def fieldNameMatchSet(df: DataFrame, names: Seq[String]): RuleResult = {
    val missing = names.filterNot(df.columns.contains)
    RuleResult("field_name_match_set", names.length, missing.length, missing.isEmpty,
      missing.map(n => Map("missing_field" -> n)))
  }
}
