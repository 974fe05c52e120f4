package graft.rules

import org.apache.spark.sql.SparkSession

/** Gates that hold validation until an external precondition is met — the
  * reference ships four (`api/.../ValidationModels.scala:367-401`:
  * PauseWaitCondition / FileExistsWaitCondition / DataExistsWaitCondition /
  * WebhookWaitCondition) executed by `core/validator/
  * ValidationWaitImplicits.scala` with a retry loop (default 10 × 2 s) that
  * logs-and-continues on exhaustion.
  *
  * Same semantics here, tightened in two ways: `await` RETURNS whether the
  * condition was met (the reference's `waitBeforeValidation` is Unit — a
  * caller can't tell a satisfied gate from an exhausted one), and the retry
  * interval is milliseconds so specs run fast. All checks are driver-side
  * and cheap by construction: `FileExists` is one Hadoop-FS metadata call
  * (works on HDFS/S3A/local alike), `DataExists` pushes its predicate into
  * the scan and asks for ONE row (`limit(1)` — never a count), `Webhook` is
  * one JDK http request. Nothing here touches executors except the
  * single-row probe job.
  */
sealed trait WaitCondition {

  /** One probe: true = the gate is open. Must be side-effect free. */
  def check(spark: SparkSession): Boolean

  def maxRetries: Int = 10
  def retryIntervalMs: Long = 2000L

  /** Probe with retries; true iff the condition was met within
    * `maxRetries` attempts (first attempt is immediate). `sleep` is
    * injectable for tests.
    */
  final def await(spark: SparkSession, sleep: Long => Unit = Thread.sleep): Boolean = {
    var attempt = 0
    while (attempt <= maxRetries) {
      if (check(spark)) return true
      attempt += 1
      if (attempt <= maxRetries) sleep(retryIntervalMs)
    }
    false
  }
}

/** Unconditional pause, then proceed (never retries — always "met"). */
final case class PauseWait(pauseMs: Long) extends WaitCondition {
  override def maxRetries: Int = 0
  def check(spark: SparkSession): Boolean = { Thread.sleep(pauseMs); true }
}

/** Open when `path` exists on the session's Hadoop filesystem — the
  * upstream-job-dropped-a-file handshake. One namenode metadata call per
  * probe, any supported scheme (file:/hdfs:/s3a:).
  */
final case class FileExistsWait(
    path: String,
    override val maxRetries: Int = 10,
    override val retryIntervalMs: Long = 2000L) extends WaitCondition {
  def check(spark: SparkSession): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}

/** Open when at least one row of `format`-data at `path` satisfies the SQL
  * predicate `expr`. The probe is `.where(expr).limit(1)` — predicate
  * pushdown + early-out, so a 100-TB table answers from the first matching
  * file, not a full scan (the reference probes with `!df.isEmpty`, same
  * one-row shape).
  */
final case class DataExistsWait(
    format: String,
    path: String,
    expr: String,
    override val maxRetries: Int = 10,
    override val retryIntervalMs: Long = 2000L) extends WaitCondition {
  def check(spark: SparkSession): Boolean =
    // a missing/unreadable PATH is the waiting state (the upstream hasn't
    // written yet) — but once data loads, a bad EXPR must throw, not
    // masquerade as "gate closed" for the whole retry budget
    scala.util.Try {
      if (format == "table") spark.read.table(path)
      else spark.read.format(format).load(path)
    }.toOption.exists(df => !df.where(expr).isEmpty)
}

/** Open when `url` answers with one of `statusCodes`. Connection errors
  * count as "closed" (the endpoint isn't up yet — that's the point of
  * waiting).
  */
final case class WebhookWait(
    url: String,
    method: String = "GET",
    statusCodes: Set[Int] = Set(200),
    override val maxRetries: Int = 10,
    override val retryIntervalMs: Long = 2000L) extends WaitCondition {
  def check(spark: SparkSession): Boolean =
    scala.util.Try {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(5)).build()
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .method(method, java.net.http.HttpRequest.BodyPublishers.noBody())
        .timeout(java.time.Duration.ofSeconds(10)).build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
      statusCodes.contains(resp.statusCode())
    }.getOrElse(false)
}

object WaitCondition {

  /** Build from the plan-IR spec ([[graft.plan.WaitSpec]] fields passed
    * positionally to keep this module free of a plan dependency).
    */
  def fromSpec(
      typ: String,
      path: String,
      expr: String,
      url: String,
      format: String,
      pauseMs: Long,
      maxRetries: Int,
      retryIntervalMs: Long): WaitCondition = typ match {
    case "pause" => PauseWait(pauseMs)
    case "fileExists" => FileExistsWait(path, maxRetries, retryIntervalMs)
    case "dataExists" => DataExistsWait(format, path, expr, maxRetries, retryIntervalMs)
    case "webhook" => WebhookWait(url, "GET", Set(200), maxRetries, retryIntervalMs)
    case other => throw new IllegalArgumentException(
      s"unknown wait condition type '$other' (pause|fileExists|dataExists|webhook)")
  }
}
