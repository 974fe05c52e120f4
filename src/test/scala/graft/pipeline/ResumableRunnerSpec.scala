package graft.pipeline

import graft.SparkSuite
import graft.corpus.SyntheticImages
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ResumableRunnerSpec extends SparkSuite {

  test("crash between buckets → resume completes without duplicates or loss") {
    val out = Files.createTempDirectory("graft_resume").toString
    val corpus = SyntheticImages.generate(spark, 1500L, seed = 7L, partitions = 6)
    val runner = new ResumableRunner(spark, out, numBuckets = 4)

    // simulated crash after 2 of 4 buckets
    assert(runner.run(corpus, "run1", failAfter = 2) == 2)
    assert(runner.completedBuckets.size == 2)

    // resume with a fresh runner (new process in real life)
    val resumed = new ResumableRunner(spark, out, numBuckets = 4)
    assert(resumed.run(corpus, "run1") == 2)
    assert(resumed.completedBuckets == Set(0, 1, 2, 3))

    val output = resumed.readOutput()
    assert(output.count() == 1500L)
    assert(output.select("image_id").distinct().count() == 1500L)

    // re-run on completed manifest is a no-op (idempotence)
    assert(resumed.run(corpus, "run1") == 0)

    // metrics: one+ row per partition per bucket, totals add up
    val metrics = resumed.readMetrics()
    val (rowsIn, rowsOut) = Metrics.summary(metrics)
    assert(rowsIn == 1500L)
    assert(rowsOut == output.where(col("keep")).count())
    assert(metrics.select("bucket").distinct().count() == 4)
  }

  test("fresh run is a single scan (bounded job count), equivalent to per-bucket output") {
    val corpus = SyntheticImages.generate(spark, 1500L, seed = 7L, partitions = 6)
    val buckets = 8 // per-bucket path would launch >= 2 jobs per bucket (16+)

    val freshOut = Files.createTempDirectory("graft_fresh").toString
    spark.sparkContext.setJobGroup("graft_fresh_run", "fresh path")
    val runner = new ResumableRunner(spark, freshOut, numBuckets = buckets)
    assert(runner.run(corpus, "runF") == buckets)
    spark.sparkContext.clearJobGroup()
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("graft_fresh_run")
    info(s"fresh-path jobs: ${jobs.length}")
    assert(jobs.length <= 6, s"fresh path ran ${jobs.length} jobs — not single-scan")
    assert(runner.completedBuckets == (0 until buckets).toSet)
    assert(runner.run(corpus, "runF") == 0) // idempotent no-op

    // equivalence with the per-bucket (resume) path on the same input
    val bucketOut = Files.createTempDirectory("graft_bucketed").toString
    val r2 = new ResumableRunner(spark, bucketOut, numBuckets = buckets)
    r2.run(corpus, "runB", failAfter = buckets - 1) // force per-bucket path
    r2.run(corpus, "runB")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("image_id", "bucket", "keep", "drop_reason", "scrubbed_caption")
      .collect().map(_.toString).sorted
    assert(key(runner.readOutput()).sameElements(key(r2.readOutput())))
    val (in1, out1) = Metrics.summary(runner.readMetrics())
    val (in2, out2) = Metrics.summary(r2.readMetrics())
    assert(in1 == 1500L && in1 == in2 && out1 == out2)
  }

  test("resume path partition-prunes: each bucket reads only its own staged files") {
    val out = Files.createTempDirectory("graft_prune").toString
    val corpus = SyntheticImages.generate(spark, 800L, seed = 3L, partitions = 4)
    val runner = new ResumableRunner(spark, out, numBuckets = 4)
    // crash after 1 bucket: staging is laid out partitionBy(bucket)
    assert(runner.run(corpus, "runP", failAfter = 1) == 1)
    val staging = s"$out/_resume_staging"
    // physical proof the per-bucket read is pruned: exactly ONE of the four
    // bucket directories survives planning (the raw-input shape re-scanned
    // everything per bucket — O(remaining × full input) after a crash)
    val scanned = runner.bucketSlice(staging, 2).toDF()
      .queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.nonEmpty && scanned.forall(_ == 1), scanned.toString)
    // resume completes from the staged layout, and cleans it up
    assert(new ResumableRunner(spark, out, numBuckets = 4).run(corpus, "runP") == 3)
    assert(spark.read.parquet(s"$out/data").select("image_id").distinct().count() == 800L)
    assert(!Files.exists(java.nio.file.Paths.get(staging)))
  }

  test("bucketSlice survives a row-empty staging dir (explicit schema, no inference)") {
    // when every remaining bucket holds zero rows (small inputs), staging
    // is just _SUCCESS — schema INFERENCE threw UNABLE_TO_INFER_SCHEMA on
    // every resume, an unrecoverable loop; the explicit-schema read must
    // return an empty slice instead
    val out = Files.createTempDirectory("graft_empty_stage").toString
    val runner = new ResumableRunner(spark, out, numBuckets = 4)
    val staging = java.nio.file.Paths.get(out, "_resume_staging")
    Files.createDirectories(staging)
    Files.createFile(staging.resolve("_SUCCESS"))
    assert(runner.bucketSlice(staging.toString, 2).isEmpty)
  }

  test("partition metrics agree with direct counts") {
    val corpus = SyntheticImages.generate(spark, 2000L, seed = 11L, partitions = 5)
    val annotated = QualityFilter.run(spark, corpus).cache()
    val m = Metrics.partitionMetrics(annotated, "test_run")
    val (rowsIn, rowsOut) = Metrics.summary(m)
    assert(rowsIn == 2000L)
    assert(rowsOut == annotated.where(col("keep")).count())
    // drop_reasons maps sum to total drops
    val dropTotal = m.select(explode(col("drop_reasons")))
      .agg(sum("value")).head().getLong(0)
    assert(dropTotal == 2000L - rowsOut)
    annotated.unpersist()
  }
}
