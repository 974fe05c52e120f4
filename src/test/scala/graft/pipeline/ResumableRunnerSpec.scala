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
