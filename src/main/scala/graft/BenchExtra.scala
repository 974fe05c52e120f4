package graft

import org.apache.spark.sql.functions.col

/** Optimization-round side benchmark (guide §1.4): times each driver query
  * through the NOOP SINK (full-column materialization, no count-path column
  * pruning) over several passes, min per query — isolates computation cost
  * without touching the frozen `graft.Bench` contract. Prints one JSON line.
  * Usage: env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as Bench; optional arg =
  * comma-separated query subset.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val subset: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.get("q1_agg").foreach(fn => fn(spark, sfDir).count())
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    (1 to passes).foreach { _ =>
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(q => subset.forall(_.contains(q._1)))
        .foreach { case (name, fn) =>
          spark.sparkContext.setJobDescription(s"benchextra:$name")
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val sec = (System.nanoTime() - t0) / 1e9
          results(name) = math.min(results.getOrElse(name, Double.MaxValue), sec)
          spark.sparkContext.setJobDescription(null)
        }
      spark.catalog.clearCache()
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val line = s"""{"metric":"noop_total","value":${results.values.sum},"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes}"""
    spark.stop()
    println(line)
  }
}
