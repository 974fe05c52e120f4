package graft.pipeline

import graft.functions.Scrubber
import graft.rules.RuleEngine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-partition lineage + metrics rows (FIXTURES.md F4; north rule "every
  * partition emits a lineage + metrics row"). The analog of the reference's
  * per-run SinkResult/ValidationResult report rows
  * (`api/.../model/ResultModels.scala`), but emitted distributedly as a
  * DataFrame instead of collected on the driver.
  *
  * Two hash-aggregations over the (already computed) annotated frame:
  * groupBy(partition_id, drop_reason) → counts, then re-group to one row per
  * partition with a drop_reasons map. Cardinality is #partitions × #rules —
  * trivial at any scale; map-side partial aggregation makes the shuffle tiny.
  */
object Metrics {

  /** `extraKeys`: additional lineage dimensions (e.g. the bucket id in the
    * single-scan fresh path) carried through both aggregations, so one pass
    * emits per-(bucket, partition) rows instead of one job per bucket.
    */
  def partitionMetrics(annotated: DataFrame, runId: String, extraKeys: Seq[String] = Nil): DataFrame = {
    val withPid = annotated.withColumn("partition_id", spark_partition_id())
    val keys = extraKeys.map(col) :+ col("partition_id")
    val scrubSums = Scrubber.allPatterns.map { case (name, _, _) =>
      sum(coalesce(element_at(col("scrub_counts"), name), lit(0))).cast("long").as(s"sc_$name")
    }
    val perReason = withPid
      .groupBy(keys :+ coalesce(col(RuleEngine.DropReasonCol), lit("__kept__")).as("reason"): _*)
      .agg(count(lit(1)).as("n"), scrubSums: _*)
    perReason
      .groupBy(keys: _*)
      .agg(
        sum(col("n")).as("rows_in"),
        sum(when(col("reason") === "__kept__", col("n")).otherwise(lit(0))).as("rows_out"),
        map_from_entries(
          sort_array(collect_list(
            when(col("reason") =!= "__kept__", struct(col("reason"), col("n")))))
        ).as("drop_reasons"),
        map_from_arrays(
          array(Scrubber.allPatterns.map(p => lit(p._1)): _*),
          array(Scrubber.allPatterns.map(p => sum(col(s"sc_${p._1}"))): _*)
        ).as("scrub_counts"))
      .withColumn("run_id", lit(runId))
      .withColumn("finished_at", current_timestamp())
  }

  /** Whole-run totals from the per-partition rows (driver-readable summary). */
  def summary(metrics: DataFrame): (Long, Long) = {
    val row = metrics.agg(sum("rows_in"), sum("rows_out")).head()
    (row.getLong(0), row.getLong(1))
  }
}
