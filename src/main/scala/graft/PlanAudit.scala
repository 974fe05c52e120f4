package graft

import org.apache.spark.sql.functions.col

/** Plan-audit artifact generator: dumps `explain("formatted")` for every
  * driver query plus the pipeline product job to a file, and prints a
  * summary table (Exchange count, broadcast joins, pushed filters, WSCG
  * subtrees) — the "is this the plan you'd want at 100×" review loop.
  * Usage: runMain graft.PlanAudit [sfDir] [outFile]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "PLAN_AUDIT.txt"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val sb = new StringBuilder
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // ops appear once in the tree and once in the details section of
      // formatted mode — count the numbered details headers only
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
      val bhj = "\\(\\d+\\) BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "\\(\\d+\\) SortMergeJoin".r.findAllIn(plan).size
      val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
      val wscg = "codegen id : \\d+".r.findAllIn(plan).toSet.size
      println(f"$name%-24s exchanges=$exchanges%-3d bhj=$bhj%-2d smj=$smj%-2d pushedFilterScans=$pushed%-2d wscg=$wscg%-3d")
      sb ++= s"==== $name ====\n$plan\n"
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      audit(name, fn(spark, sfDir))
    }
    // the pipeline product job (scan → score → rules → scrub)
    val corpusPath = "/tmp/graft_bench_corpus_5000"
    if (!new java.io.File(corpusPath + "/_SUCCESS").exists())
      corpus.SyntheticImages.generate(spark, 5000L, 42L, 8).write.mode("overwrite").parquet(corpusPath)
    audit("pipeline_product_job",
      pipeline.QualityFilter.runDF(spark, spark.read.parquet(corpusPath)).where(col("keep")))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    spark.stop()
  }
}
