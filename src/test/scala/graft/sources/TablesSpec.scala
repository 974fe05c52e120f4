package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TablesSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("bucketed tables join with ZERO exchanges (pre-shuffled co-location)") {
    val left = spark.range(10000).select(
      col("id").as("image_id"), (col("id") % 97).as("score"))
    val right = spark.range(10000).select(
      col("id").as("image_id"), concat(lit("c"), col("id")).as("caption"))
    Tables.writeBucketed(left, "t_scores", "image_id", 8)
    Tables.writeBucketed(right, "t_captions", "image_id", 8)
    // force a non-broadcast join so co-location is what avoids the shuffle
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = Tables.read(spark, "t_scores")
        .join(Tables.read(spark, "t_captions"), "image_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(joined.count() == 10000)
    }
    // and an aggregation on the bucket key also needs no shuffle
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val agg = Tables.read(spark, "t_scores").groupBy("image_id").agg(sum("score"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    }
  }

  test("partitioned tables prune: a partition filter skips other directories") {
    val df = spark.range(3000).select(
      col("id"),
      element_at(array(lit("png"), lit("jpeg"), lit("bmp")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("fmt"))
    Tables.writePartitioned(df, "t_byfmt", Seq("fmt"))
    val q = Tables.read(spark, "t_byfmt").where(col("fmt") === "png")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("fmt"), plan)
    assert(q.count() == 1000)
    // physical proof: the scan reads exactly the one partition's files
    val scanned = q.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.forall(_ == 1), scanned.toString)
  }
}
