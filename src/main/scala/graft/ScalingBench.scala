package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the north rule's two-cluster-size
  * criterion: the identical pipeline job at N and 4N parallelism
  * (local[8] vs local[32] — no real cluster in this sandbox, per driver
  * instruction), reporting images/sec at both plus efficiency =
  * (throughput@4N / throughput@N) / 4.
  *
  * Run via `tools/scaling_bench.sh`, which pins each configuration to a CPU
  * set with `taskset` (local[8] in an unrestricted JVM is NOT an 8-CPU
  * machine — GC/JIT/shuffle threads spill onto idle cores and flatter the
  * small config; pinning makes N vs 4N honest) and runs each in a fresh JVM.
  *
  * Throughput is measured as a `noop`-format write of the FULL output
  * (count() would let Catalyst prune the scrub columns — the noop sink
  * materializes every column), with kept-rows collected via an Observation
  * on the same single pass.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "2000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt

    val spark = GraftSession.builder(s"local[$cores]", cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(n: Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val corpus = corpus_gen(n)
      val result = pipeline.QualityFilter.run(spark, corpus)
      val obs = Observation()
      result.observe(obs, count(lit(1)).as("rows"), count_if(col("keep")).as("kept"))
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, obs.get("kept").asInstanceOf[Long])
    }
    def corpus_gen(n: Long) =
      corpus.SyntheticImages.generate(spark, n, seed = 42L, partitions = cores * 4)

    once(50000L) // warmup: JIT + codegen
    val runs = (1 to reps).map(_ => once(rows))
    val best = runs.map(_._1).min
    val kept = runs.head._2
    val thr = rows / best
    println(f"""{"metric":"pipeline_throughput","cores":$cores,"rows":$rows,"kept":$kept,"reps":$reps,"sec_best":$best%.2f,"images_per_sec":${thr.toLong}}""")
    spark.stop()
  }
}
