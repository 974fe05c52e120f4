package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluates a rule set over a DataFrame in a single projection.
  *
  * The reference runs one Spark action per rule
  * (`core/validator/ValidationOperations.scala:36-60`:
  * `errors = df.where(!(expr)).count()`), which means N full scans for N
  * rules. At 100 TB that is untenable. Here all rules become ONE `select`:
  *
  *   drop_reason = coalesce(when(!r1, "r1"), when(!r2, "r2"), ...)
  *   keep        = drop_reason IS NULL
  *
  * so the whole rule set costs one pass, stays inside WholeStageCodegen, and
  * the first-failing-rule name doubles as the drop reason (the reference
  * reports per-rule error counts; we recover those from a groupBy on
  * drop_reason or the observe() metrics, both cheap).
  */
object RuleEngine {

  val DropReasonCol = "drop_reason"
  val KeepCol = "keep"

  /** First-failing-rule name, NULL if all pass. Rules are checked in the
    * given (canonical) order — order is part of the contract because the
    * oracle must agree on which rule "fired first".
    */
  def dropReason(rules: Seq[Rule]): Column = {
    require(rules.nonEmpty, "empty rule set")
    coalesce(rules.map(r => when(!r.strict, lit(r.name))): _*)
  }

  /** Annotates `df` with `drop_reason` (string, null = pass) and `keep`
    * (boolean) columns. Pure projection: no shuffle, no action.
    */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val reason = dropReason(rules)
    df.withColumn(DropReasonCol, reason)
      .withColumn(KeepCol, col(DropReasonCol).isNull)
  }

  /** Reference-style single-rule validation: (errorCount, totalCount,
    * success-under-threshold). `threshold` < 1 is a fraction of rows,
    * >= 1 an absolute count — same contract as the reference
    * (`ValidationOperations.scala:44-51`). One job, map-side aggregated.
    */
  def validate(df: DataFrame, rule: Rule, threshold: Double = 0.0): RuleResult = {
    val row = df
      .agg(
        count(lit(1)).as("total"),
        count_if(!rule.strict).as("errors"))
      .head()
    val total = row.getLong(0)
    val errors = row.getLong(1)
    val ok =
      if (threshold >= 1) errors <= threshold
      else total == 0 || errors.toDouble / total <= threshold
    RuleResult(rule.name, total, errors, ok)
  }

  /** All-rule error counts in ONE pass (vs the reference's N passes):
    * a single aggregate with one count_if per rule.
    */
  def validateAll(df: DataFrame, rules: Seq[Rule], threshold: Double = 0.0): Seq[RuleResult] = {
    require(rules.nonEmpty, "empty rule set")
    val aggs = count(lit(1)).as("total") +:
      rules.map(r => count_if(!r.strict).as(s"err_${r.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getLong(0)
    rules.zipWithIndex.map { case (r, i) =>
      val errors = row.getLong(i + 1)
      val ok =
        if (threshold >= 1) errors <= threshold
        else total == 0 || errors.toDouble / total <= threshold
      RuleResult(r.name, total, errors, ok)
    }
  }
}

final case class RuleResult(rule: String, total: Long, errors: Long, success: Boolean)
