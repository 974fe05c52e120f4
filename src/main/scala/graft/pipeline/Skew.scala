package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (north rule: "skew from hot languages and
  * duplicate phash clusters is handled with salted repartitioning on
  * phash-range + AQE skew-join hints"; SURVEY §7.4.4).
  *
  * Three skew surfaces, three answers:
  *  - JOIN skew → AQE skew-join splitting, on by default (GraftSession);
  *  - AGGREGATION skew → structurally avoided: every group operator in this
  *    engine is a hash aggregate with map-side partial combine (never a
  *    per-key window/collect over raw rows), so a hot key's rows combine
  *    before the shuffle;
  *  - COLOCATION skew — per-key imperative processing (mapPartitions over a
  *    cluster, per-cluster model passes) would put a hot phash cluster's
  *    whole 20% of the corpus in ONE task. [[saltedRepartition]] spreads
  *    each key over up to `salts` partitions with a row-identity-keyed salt
  *    (deterministic, partitioning-invariant — never derived from
  *    spark_partition_id).
  *
  * [[maxPartitionShare]] is the spread check: the per-partition lineage
  * metrics make the same number observable per run.
  */
object Skew {

  /** Deterministic salt in [0, salts) from row identity. */
  def salt(idCol: Column, salts: Int): Column =
    pmod(xxhash64(idCol), lit(salts)).cast("int")

  /** Repartition by (keys..., salt): a hot key's rows spread over up to
    * `salts` partitions instead of landing in one task. Consumers must
    * merge per-key partials across salts (same contract as any two-stage
    * aggregation). `numPartitions` is explicit — without it AQE would
    * coalesce a small shuffle back together and undo the spread.
    */
  def saltedRepartition(
      df: DataFrame,
      keys: Seq[String],
      idCol: String,
      salts: Int,
      numPartitions: Int = 0): DataFrame = {
    val exprs = keys.map(col) :+ salt(col(idCol), salts)
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism * 2
    df.repartition(n, exprs: _*)
  }

  /** Largest fraction of rows in any single partition — the skew-spread
    * metric of SURVEY §7.4.4 (one tiny aggregate over partition ids).
    */
  def maxPartitionShare(df: DataFrame): Double = {
    val row = df.groupBy(spark_partition_id().as("__p")).count()
      .agg(max(col("count")).cast("double").as("mx"), sum(col("count")).cast("double").as("n"))
      .head()
    if (row.isNullAt(1) || row.getDouble(1) == 0) 0.0 else row.getDouble(0) / row.getDouble(1)
  }
}
