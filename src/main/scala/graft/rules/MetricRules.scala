package graft.rules

import graft.pipeline.RunReport

/** Metric-threshold validations — the reference's `MetricValidator`
  * (`core/validator/metric/MetricValidator.scala:14-70`): a named run metric
  * checked against greater-than / less-than / between / equal / in-set
  * thresholds. Metrics come from the distributed run summary
  * ([[graft.pipeline.RunReport.Summary]]) — already aggregated, so every
  * check is a driver-side comparison.
  */
object MetricRules {

  sealed trait Check
  final case class GreaterThan(value: Double, strictly: Boolean = true) extends Check
  final case class LessThan(value: Double, strictly: Boolean = true) extends Check
  final case class Between(lo: Double, hi: Double) extends Check
  final case class EqualTo(value: Double) extends Check
  final case class InSet(values: Seq[Double]) extends Check

  /** Named metric lookup. Dotted sub-metrics address the report maps:
    * `drop_reason.<rule>` and `scrub.<category>` (absent key → 0, matching
    * "no rows dropped by that rule").
    */
  def metricValue(s: RunReport.Summary, name: String): Option[Double] = name match {
    case "rows_in" => Some(s.rowsIn.toDouble)
    case "rows_out" => Some(s.rowsOut.toDouble)
    case "keep_rate" => Some(s.keepRate)
    case "drop_rate" => Some(1.0 - s.keepRate)
    case "partitions" => Some(s.partitions.toDouble)
    case n if n.startsWith("drop_reason.") =>
      Some(s.dropReasons.getOrElse(n.stripPrefix("drop_reason."), 0L).toDouble)
    case n if n.startsWith("scrub.") =>
      Some(s.scrubCounts.getOrElse(n.stripPrefix("scrub."), 0L).toDouble)
    case _ => None
  }

  private def eval(v: Double, c: Check): Boolean = c match {
    case GreaterThan(t, true) => v > t
    case GreaterThan(t, false) => v >= t
    case LessThan(t, true) => v < t
    case LessThan(t, false) => v <= t
    case Between(lo, hi) => v >= lo && v <= hi
    case EqualTo(t) => v == t
    case InSet(vs) => vs.contains(v)
  }

  /** All checks against one named metric; unknown metric = failure (the
    * reference logs-and-zeroes, which silently passes `<` checks — failing
    * loudly is the safer default for a quality gate).
    */
  def validate(s: RunReport.Summary, metric: String, checks: Seq[Check]): RuleResult =
    metricValue(s, metric) match {
      case None =>
        RuleResult(s"metric_$metric", checks.size, checks.size, success = false,
          Seq(Map("unknown_metric" -> metric)))
      case Some(v) =>
        val failed = checks.filterNot(eval(v, _))
        RuleResult(s"metric_$metric", checks.size, failed.size, failed.isEmpty,
          failed.map(c => Map("metric" -> metric, "value" -> v, "failed_check" -> c.toString)))
    }
}
