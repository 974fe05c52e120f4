package graft.pipeline

import graft.corpus.ImageRow
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Resumable, bucketed execution of the quality-filter stage (north rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * The work unit is a BUCKET = `pmod(xxhash64(image_id), numBuckets)` — row-
  * identity-keyed, so bucket membership is independent of input partitioning
  * (the reference's determinism trick, `provider/DataGenerator.scala:44-52`).
  * Per bucket: filter → pipeline → write data dir → write metrics → append
  * the bucket to the manifest, in that order (write-audit-publish: a crash
  * between data write and manifest append re-runs the bucket into the same
  * overwritten directory — idempotent, no duplicates; SURVEY §7.4.5). On an
  * Iceberg deployment each append is one snapshot commit and the manifest is
  * the snapshot summary property; here (no Iceberg jars in the sandbox) the
  * same protocol runs over parquet dirs + a manifest file, behind this one
  * class so the swap is local.
  *
  * At 100 TB the bucket predicate would be pushed into the table scan
  * (Iceberg partition pruning on a bucket-partitioned table); the mechanism —
  * idempotent per-bucket commit + manifest skip — is identical.
  */
final class ResumableRunner(
    spark: SparkSession,
    outDir: String,
    numBuckets: Int,
    cfg: FilterConfig = FilterConfig()) {

  private val manifestPath = Paths.get(outDir, "_manifest")

  def completedBuckets: Set[Int] =
    if (!Files.exists(manifestPath)) Set.empty
    else Files.readAllLines(manifestPath).asScala.filter(_.nonEmpty).map(_.toInt).toSet

  private def markDone(bucket: Int): Unit = {
    Files.createDirectories(manifestPath.getParent)
    Files.write(manifestPath, s"$bucket\n".getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Runs all not-yet-completed buckets; returns the number processed this
    * invocation. `failAfter` aborts after that many buckets (test hook for
    * crash-resume semantics; forcing it below numBuckets also forces the
    * per-bucket path, since the fresh path commits all-or-nothing).
    *
    * Fresh run (empty manifest) = ONE scan: pipeline once, write
    * `partitionBy(bucket)`, commit every bucket. Round 1 filtered the input
    * per bucket, and since `pmod(xxhash64(image_id), n)` cannot be pushed
    * into a parquet scan, 16 buckets meant 16 full scans of the input —
    * O(numBuckets × 100 TB). Per-bucket scan+filter is now the RESUME path
    * only, where it re-reads the input once per *remaining* bucket (on an
    * Iceberg bucket-partitioned table the predicate prunes to the bucket's
    * files and even that cost disappears).
    */
  def run(input: Dataset[ImageRow], runId: String, failAfter: Int = Int.MaxValue): Int = {
    val done = completedBuckets
    if (done.isEmpty && failAfter >= numBuckets) return runFresh(input, runId)
    val todo = (0 until numBuckets).filterNot(done)
    // STAGE the remaining input once, laid out by bucket: `pmod(xxhash64)`
    // can't push into a parquet scan, so reading per-bucket from the raw
    // input costs one FULL scan per remaining bucket — O(todo × 100 TB)
    // after a crash at bucket 3/16. One scan-and-repartitionByDir here turns
    // every per-bucket read below into a PARTITION-PRUNED scan of exactly
    // that bucket's files (spec-asserted: selectedPartitions == 1). This is
    // precisely what an Iceberg bucket-partitioned table gives for free; the
    // staging dir is the sandbox stand-in and is removed on completion.
    val staging = stageRemaining(input, todo)
    var processed = 0
    todo.foreach { bucket =>
      if (processed >= failAfter) return processed
      val bucketed = bucketSlice(staging, bucket)
      val result = QualityFilter.run(spark, bucketed, cfg)
      // cache: the annotated frame feeds both the data write and the
      // metrics aggregation (reference's caching discipline, SURVEY §4)
      result.persist()
      try {
        result.write.mode(SaveMode.Overwrite).parquet(s"$outDir/data/bucket=$bucket")
        Metrics.partitionMetrics(result, runId)
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/metrics/bucket=$bucket")
      } finally result.unpersist()
      markDone(bucket)
      processed += 1
    }
    // all remaining buckets committed — the staging copy has served its
    // purpose (a later resume would re-stage whatever is still missing)
    graft.util.Fs.deleteRecursively(Paths.get(staging))
    processed
  }

  /** One scan of `input` filtered to the still-missing buckets, written
    * `partitionBy(bucket)` so each bucket's rows land in their own
    * directory. Overwrite mode makes a crash mid-staging self-healing: the
    * next resume re-stages from scratch.
    */
  private def stageRemaining(input: Dataset[ImageRow], todo: Seq[Int]): String = {
    val staging = s"$outDir/_resume_staging"
    input.toDF()
      .withColumn("bucket", pmod(xxhash64(col("image_id")), lit(numBuckets)).cast("int"))
      .where(col("bucket").isin(todo: _*))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(staging)
    staging
  }

  /** Pruned read of one staged bucket, restored to the input row type.
    * `bucket` is a PARTITION column of the staging layout, so the equality
    * filter skips every other bucket's files at planning time.
    */
  private[pipeline] def bucketSlice(staging: String, bucket: Int): Dataset[ImageRow] = {
    import org.apache.spark.sql.Encoders
    val rowSchema = Encoders.product[ImageRow].schema
    // explicit schema: when every remaining bucket is row-EMPTY (small
    // inputs), staging holds only _SUCCESS and schema inference would throw
    // UNABLE_TO_INFER_SCHEMA on every resume — an unrecoverable loop
    spark.read
      .schema(rowSchema.add("bucket", org.apache.spark.sql.types.IntegerType))
      .parquet(staging)
      .where(col("bucket") === bucket)
      .select(rowSchema.fieldNames.map(col): _*)
      .as(Encoders.product[ImageRow])
  }


  /** Single-scan fresh path: one pipeline pass over the whole input, data and
    * metrics written `partitionBy(bucket)`, manifest committed for all
    * buckets afterwards (write-audit-publish: a crash anywhere before the
    * manifest append leaves the manifest empty, so the re-run overwrites the
    * same directories — idempotent).
    */
  private def runFresh(input: Dataset[ImageRow], runId: String): Int = {
    val withBucket = input.toDF().withColumn(
      "bucket", pmod(xxhash64(col("image_id")), lit(numBuckets)).cast("int"))
    val result = QualityFilter.runDF(spark, withBucket, cfg)
    result.persist()
    try {
      result.write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .parquet(s"$outDir/data")
      Metrics.partitionMetrics(result, runId, extraKeys = Seq("bucket"))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .parquet(s"$outDir/metrics")
    } finally result.unpersist()
    (0 until numBuckets).foreach(markDone)
    numBuckets
  }

  def readOutput(): DataFrame = spark.read.parquet(s"$outDir/data")
  def readMetrics(): DataFrame = spark.read.parquet(s"$outDir/metrics")
}
