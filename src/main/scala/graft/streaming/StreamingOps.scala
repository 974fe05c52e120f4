package graft.streaming

import graft.pipeline.{FilterConfig, QualityFilter}
import graft.rules.RuleEngine
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference has NO real streaming — its
  * "streaming" is rate-controlled batch delivery (SURVEY §2.8) — so this
  * module is the Spark-first upgrade: the same declarative rule set runs
  * unchanged on `readStream` sources because [[RuleEngine.annotate]] is a
  * stateless projection; watermarked windowed aggregation and
  * `flatMapGroupsWithState` cover the stateful shapes the reference's
  * duration/rate execution strategies approximate.
  */
object StreamingOps {

  /** The quality-filter rule annotation applied to a STREAMING DataFrame of
    * scored image rows — identical code path to batch (one projection; no
    * state, no watermark needed).
    */
  def annotateStream(stream: DataFrame, cfg: FilterConfig = FilterConfig()): DataFrame =
    RuleEngine.annotate(stream, QualityFilter.rules(cfg))

  /** The COMPLETE quality-filter stage on a streaming frame with the
    * input_hint schema: score (langid + perplexity via the columnar UDF —
    * stateless, stream-legal) → annotate → scrub kept captions. Identical
    * semantics to the batch [[QualityFilter.runDF]] rule-for-rule (the
    * newline-run parity spec pins the two paths); only the feature
    * evaluation differs (Column regexes here vs the fused single-scan
    * extractor in batch).
    */
  def filterStream(
      spark: SparkSession,
      stream: DataFrame,
      cfg: FilterConfig = FilterConfig()): DataFrame = {
    val scored = QualityFilter.scoreCols(spark, stream)
    val annotated = annotateStream(scored, cfg)
    annotated.withColumn("scrubbed_caption",
      when(col(RuleEngine.KeepCol), graft.functions.Scrubber.scrub(col("caption"))))
  }

  /** Windowed drop-reason counts with a watermark — streaming analog of the
    * per-partition metrics table (FIXTURES F4): one metrics row per
    * (window, reason).
    */
  def windowedDropCounts(
      annotated: DataFrame,
      tsCol: String,
      windowDuration: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    annotated
      .withWatermark(tsCol, watermark)
      .groupBy(
        window(col(tsCol), windowDuration),
        coalesce(col(RuleEngine.DropReasonCol), lit("__kept__")).as("reason"))
      .agg(count(lit(1)).as("n"))

  /** Checkpointed, idempotent streaming sink: each micro-batch overwrites
    * its own `batch=<id>` directory via foreachBatch while source offsets
    * commit to the Spark checkpoint — kill the query at any point and a
    * restart from the same checkpoint resumes at the last uncommitted batch,
    * re-overwriting at most one directory (exactly-once output; the
    * streaming twin of [[graft.pipeline.ResumableRunner]]'s
    * write-audit-publish manifest).
    */
  def checkpointedParquetSink(
      stream: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionSummary(user_id: Long, n_events: Long, closed: Boolean)

  /** Custom per-key state via flatMapGroupsWithState: counts events per user
    * session, emitting a summary when the session times out (the
    * KeyValueGroupedDataset stateful path of the north brief).
    */
  def sessionCounts(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      timeout: String = "30 minutes"): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (user, it, state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0L)
            state.remove()
            Iterator.single(SessionSummary(user, n, closed = true))
          } else {
            val n = state.getOption.getOrElse(0L) + it.size
            state.update(n)
            state.setTimeoutDuration(timeout)
            Iterator.empty
          }
      }
  }
}
