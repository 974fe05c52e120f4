package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the north rule's two-cluster-size
  * criterion: the identical quality-filter job at N and 4N parallelism
  * (local[8] vs local[32] — no real cluster in this sandbox, per driver
  * instruction), reporting images/sec at both plus efficiency =
  * (throughput@4N / throughput@N) / 4.
  *
  * Run via `tools/scaling_bench.sh`, which pins each configuration to a CPU
  * set with `taskset` (local[8] in an unrestricted JVM is NOT an 8-CPU
  * machine — GC/JIT/shuffle threads spill onto idle cores and flatter the
  * small config) and runs each in a fresh JVM.
  *
  * The measured job is the PRODUCT job: scan a parquet corpus (written once,
  * untimed — generation is test harness, not product) → score → rules →
  * scrub → noop sink (count() would let Catalyst prune the scrub columns;
  * the noop sink materializes every column). Kept-rows come from an
  * Observation on the same pass. Several reps, best-of (this sandbox shows
  * ~2× run-to-run JVM variance; min is the stable statistic).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "16000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "4").toInt
    val corpusPath = s"/tmp/graft_scale_corpus_$rows"

    val spark = GraftSession.builder(s"local[$cores]", cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one-time corpus materialization (untimed; shared by both configs)
    if (!new java.io.File(corpusPath + "/_SUCCESS").exists()) {
      corpus.SyntheticImages.generate(spark, rows, seed = 42L, partitions = 256)
        .write.mode("overwrite").parquet(corpusPath)
    }

    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val input = spark.read.parquet(corpusPath)
      val result = pipeline.QualityFilter.runDF(spark, input)
      val obs = Observation()
      result.observe(obs, count(lit(1)).as("rows"), count_if(col("keep")).as("kept"))
        .write.mode("overwrite").format("noop").save()
      ((System.nanoTime() - t0) / 1e9, obs.get("kept").asInstanceOf[Long])
    }

    once() // warmup: JIT + codegen + page cache
    val runs = (1 to reps).map(_ => once())
    val best = runs.map(_._1).min
    val kept = runs.head._2
    val thr = rows / best
    val allSecs = runs.map(r => f"${r._1}%.2f").mkString("[", ",", "]")
    println(f"""{"metric":"pipeline_throughput","cores":$cores,"rows":$rows,"kept":$kept,"reps":$reps,"sec_best":$best%.2f,"sec_all":$allSecs,"images_per_sec":${thr.toLong}}""")
    spark.stop()
  }
}
