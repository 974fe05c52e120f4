package graft
import org.apache.spark.sql.functions.col

/** Per-round benchmark main. Driver contract: prints ONE metric-JSON line as
  * the genuinely LAST stdout line (build.sbt forwards forked-run stdout
  * verbatim and suppresses sbt's [success] epilogue), and additionally writes
  * the same line to BENCH_LOCAL.json in the working directory. Query failures
  * are NOT swallowed: they go to stderr and into the JSON's "errors" object —
  * a permanently broken query must never masquerade as a fast time.
  */
object Bench {
  /** Pipeline throughput benchmark: full quality-filter over a synthesized
    * corpus of `n` rows; returns (seconds, rows kept). Corpus generation is
    * part of the measured work (it is the "scan" of this workload).
    */
  def pipelineRun(spark: org.apache.spark.sql.SparkSession, n: Long, partitions: Int): (Double, Long) = {
    val t0 = System.nanoTime()
    val corpus = corpus_gen(spark, n, partitions)
    val kept = pipeline.QualityFilter.run(spark, corpus)
      .where(col(rules.RuleEngine.KeepCol)).count()
    ((System.nanoTime() - t0) / 1e9, kept)
  }
  private def corpus_gen(spark: org.apache.spark.sql.SparkSession, n: Long, p: Int) =
    corpus.SyntheticImages.generate(spark, n, seed = 42L, partitions = p)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val pipelineRows = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_ROWS", "500000").toLong
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/shuffle paths, so per-query numbers are marginal cost
    SparkEntry.queries.get("q1_agg").foreach(fn => fn(spark, sfDir).count())
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        System.err.println(s"[bench] $name FAILED: ${errors(name)}")
      }
      results(name) = (System.nanoTime() - t0) / 1e9
    }
    // drop caches left by the dedup queries (persisted minhash signatures)
    // so the pipeline measurement starts from a clean executor heap
    spark.catalog.clearCache()
    val (warm, _) = pipelineRun(spark, pipelineRows, cpus * 4)
    val (again, _) = pipelineRun(spark, pipelineRows, cpus * 4)
    val pipeSec = math.min(warm, again)
    results("pipeline_synth") = pipeSec
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    val imgsPerSec = (pipelineRows / pipeSec).toLong
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_rows":$pipelineRows,"pipeline_images_per_sec":$imgsPerSec,"n_errors":${errors.size},"errors":$errJson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), line + "\n")
    spark.stop()
    // after spark.stop() so no executor/log lines can follow it on stdout
    println(line)
  }
}
