package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private lazy val scored = spark.range(20000).select(
    pmod(col("id"), lit(37)).as("g"),
    col("id").as("cand"),
    // many deliberate score ties (only 101 distinct scores) → tiebreak matters
    (pmod(col("id") * 2654435761L % 1000000007L, lit(101)).cast("double") / 7.0).as("score"))

  test("topKPerGroup equals the window ranker exactly, ties included") {
    val viaAgg = TopK.topKPerGroup(scored, Seq("g"), "score", "cand", k = 5)
      .select("g", "cand", "rnk").as[(Long, Long, Int)].collect().toSet
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("cand"))
    val viaWindow = scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5)
      .select("g", "cand", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 37 * 5)
  }

  test("aggregation is partial (map-side combine before the shuffle)") {
    val plan = TopK.topKPerGroup(scored, Seq("g"), "score", "cand", k = 3)
      .queryExecution.executedPlan.toString
    // typed Aggregators plan as ObjectHashAggregate partial+final: only k
    // rows per (map partition, group) cross the exchange — the point of the
    // operator vs a window (which shuffles and sorts EVERY candidate row)
    assert(plan.contains("partial_maxkagg"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("string ids rank with lexicographic tiebreak (zero-padded ids keep numeric order)") {
    val d = Seq(
      (1L, "IMG000000000002", 5.0), (1L, "IMG000000000010", 5.0),
      (1L, "IMG000000000001", 3.0), (2L, "IMG000000000099", 1.0),
    ).toDF("g", "image_id", "score")
    val out = TopK.topKPerGroup(d, Seq("g"), "score", "image_id", k = 2)
      .select("g", "image_id", "rnk").as[(Long, String, Int)].collect().toSet
    assert(out == Set((1L, "IMG000000000002", 1), (1L, "IMG000000000010", 2),
      (2L, "IMG000000000099", 1)))
  }

  test("NaN scores and null ids never rank (defined edge behavior)") {
    val d = Seq(
      (1L, Some(10L), 5.0), (1L, Some(11L), Double.NaN),
      (1L, None, 9.0), (1L, Some(12L), 1.0),
    ).toDF("g", "cand", "score")
    val out = TopK.topKPerGroup(d, Seq("g"), "score", "cand", k = 10)
      .select("cand", "rnk").as[(Long, Int)].collect().toSet
    assert(out == Set((10L, 1), (12L, 2)))
  }

  test("k larger than group size returns the whole group ranked") {
    val tiny = Seq((1L, 10L, 1.0), (1L, 11L, 3.0), (2L, 20L, 2.0)).toDF("g", "cand", "score")
    val out = TopK.topKPerGroup(tiny, Seq("g"), "score", "cand", k = 10)
      .select("g", "cand", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 11L, 1), (1L, 10L, 2), (2L, 20L, 1)))
  }
}
