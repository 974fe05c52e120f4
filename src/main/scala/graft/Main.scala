package graft

import graft.pipeline.{FilterConfig, ResumableRunner, RunReport}

/** spark-submit entry point — the deployment surface of the north rule:
  *
  *   spark-submit --class graft.Main \
  *     --conf spark.sql.extensions=graft.plans.GraftExtensions \
  *     graft.jar <inputPath> <outputDir> [numBuckets] [runId]
  *
  * Reads the image+caption table (parquet here; an Iceberg table reference
  * like `iceberg.ns.images` works unchanged where the catalog is configured
  * — `spark.read.table` branch), runs the resumable bucketed quality-filter,
  * writes kept+annotated rows, per-partition metrics, and a JSON run report.
  * Re-running after a crash resumes from the bucket manifest.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Main <inputPath> <outputDir> [numBuckets] [runId]")
    val input = args(0)
    val outDir = args(1)
    val numBuckets = if (args.length > 2) args(2).toInt else 16
    val runId = if (args.length > 3) args(3) else s"run_${System.currentTimeMillis()}"

    // under spark-submit the session comes from the launcher's conf; the
    // builder only fills in what is not already set
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val table =
      if (input.contains(".") && !input.contains("/")) spark.read.table(input)
      else spark.read.parquet(input)
    val ds = table.as[graft.corpus.ImageRow]

    val runner = new ResumableRunner(spark, outDir, numBuckets, FilterConfig())
    val processed = runner.run(ds, runId)
    val summary = RunReport.write(runner.readMetrics(), runId, outDir)
    println(s"[graft] buckets processed this invocation: $processed")
    println(s"[graft] ${RunReport.toJson(summary)}")
    spark.stop()
  }
}
