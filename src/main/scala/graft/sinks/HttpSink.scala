package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rate-limited HTTP delivery — the reference's real-time sink surface
  * (`core/sink/http/HttpSinkProcessor.scala:32-93` posts per-row over an
  * async client; Pekko `.throttle(rate, 1s)` does the rate control in
  * `PekkoStreamingSinkWriter`). Recast on the JDK's own `java.net.http`
  * client (no Pekko, no external HTTP stack — round 1 scoped this out as
  * env-blocked, but the JDK client + `com.sun.net.httpserver` for tests
  * make the whole path exercisable hermetically):
  *
  *  - rows serialize to JSON IN THE PLAN (`to_json(struct(*))` — codegen'd,
  *    not a driver loop) and deliver via `foreachPartition`, so posting
  *    scales with executors;
  *  - `maxRowsPerSec` is a GLOBAL budget split evenly across partitions and
  *    enforced per partition by pacing (the Pekko-throttle semantics without
  *    a streaming framework);
  *  - failed posts retry `maxRetries` times with linear backoff, then count
  *    as failures (returned via accumulator) — delivery is at-least-once,
  *    like the reference's.
  */
object HttpSink {

  /** POST each row of `df` as a JSON body to `url`. Returns
    * (rowsPosted, rowsFailed). Blocking call — runs one Spark job.
    *
    * The returned counts are ATTEMPT counts, consistent with the
    * at-least-once contract: a Spark task retry or speculative duplicate
    * re-posts its partition and counts again, so posted+failed can exceed
    * `df.count()` under failures. Exact-delivery accounting requires an
    * idempotency key echoed by the receiver — out of scope here, as in the
    * reference's HTTP sink.
    */
  def postJson(
      df: DataFrame,
      url: String,
      maxRowsPerSec: Int = 0,
      maxRetries: Int = 2): (Long, Long) = {
    // the url is a driver-side constant: validate it HERE so a typo fails
    // the run loudly instead of burning a full Spark job counting every
    // row as a delivery failure inside postRows' per-row catch
    val u = java.net.URI.create(url)
    require(u.getScheme != null &&
      (u.getScheme.equalsIgnoreCase("http") || u.getScheme.equalsIgnoreCase("https")),
      s"postJson url must be http(s), got '$url'")
    postRows(
      df.select(
        lit(url).as("__fixed_url"),
        to_json(struct(df.columns.map(col): _*)).as("__json_body")),
      urlCol = "__fixed_url",
      methodCol = None, // always POST
      bodyCol = Some("__json_body"),
      headersCol = None,
      maxRowsPerSec = maxRowsPerSec,
      maxRetries = maxRetries)
  }

  /** One query parameter of a templated URL. `column` may be array-typed;
    * `style`/`explode` follow the OpenAPI serialization matrix the
    * reference's `httpQueryParam` builder supports (`TaskBuilder.scala:
    * 1877-1903`): form+explode → `n=a&n=b`, form collapsed → `n=a,b`,
    * spaceDelimited → `%20`, pipeDelimited → `|`.
    */
  final case class QueryParam(
      name: String,
      column: Column,
      isArray: Boolean = false,
      style: String = "form",
      explode: Boolean = true)

  /** Per-row URL Column from a `{param}`-templated string — the declarative
    * twin of the reference's `FieldBuilder.httpUrl` SQL assembly
    * (`TaskBuilder.scala:1915-1937`): each path param substitutes
    * URL-encoded into its `{name}` slot, query params render `name=value`
    * and join with '&' (null parts are dropped by `array_join`, exactly the
    * reference's ARRAY_JOIN semantics). Pure expression — codegen'd, no UDF.
    */
  def urlColumn(
      template: String,
      pathParams: Seq[(String, Column)] = Nil,
      queryParams: Seq[QueryParam] = Nil): Column = {
    val withPath = pathParams.foldLeft(lit(template)) { case (u, (n, v)) =>
      replace(u, lit(s"{$n}"), url_encode(v.cast("string")))
    }
    if (queryParams.isEmpty) withPath
    else {
      val parts = queryParams.map { qp =>
        if (qp.isArray) {
          val delim = (qp.style.toLowerCase, qp.explode) match {
            case ("form", false) => ","
            case ("spacedelimited", false) => "%20"
            case ("pipedelimited", false) => "|"
            case _ => s"&${qp.name}="
          }
          // element-wise stringify via an array CAST, not a transform
          // lambda: same values, and the expression renders to legal SQL
          // text (lambdas don't round-trip through Expression.sql — the
          // legacy-plan expansion reuses this Column as generator sql)
          when(size(qp.column) > 0,
            concat(lit(s"${qp.name}="),
              array_join(qp.column.cast("array<string>"), delim)))
        } else concat(lit(s"${qp.name}="), qp.column.cast("string"))
      }
      concat(withPath, lit("?"), array_join(array(parts: _*), "&"))
    }
  }

  /** Per-row HTTP delivery — the reference's full real-time row contract
    * (`HttpSinkProcessor.scala:168-199`): URL from the row's `urlCol`,
    * method from `methodCol` (default POST when absent/null), body from
    * `bodyCol` (skipped for GET/HEAD; DELETE keeps its body — the
    * reference's `setBody` is unconditional), headers from the optional
    * `headersCol` STRUCT column (each struct field = one header, string
    * values; the reference tags header fields via metadata — a struct keeps
    * the same per-row shape without metadata plumbing). Same pacing /
    * retry / accumulator contract as [[postJson]]; at-least-once.
    */
  def postRows(
      df: DataFrame,
      urlCol: String = "url",
      methodCol: Option[String] = Some("method"),
      bodyCol: Option[String] = Some("value"),
      headersCol: Option[String] = None,
      maxRowsPerSec: Int = 0,
      maxRetries: Int = 2): (Long, Long) = {
    val m = postRowsWithMetrics(df, urlCol, methodCol, bodyCol, headersCol,
      maxRowsPerSec, maxRetries)
    (m.posted, m.failed)
  }

  /** Delivery outcome + response-latency distribution — the reference's
    * load-test `PerformanceMetrics`/`SimplePercentileCalculator` surface
    * (`api/.../model/PerformanceMetrics.scala`, `core/generator/metrics/
    * SimplePercentileCalculator.scala`), collected distributively: each
    * executor adds per-request wall time (including retries) to a merged
    * log-scale histogram accumulator — no latency rows ever cross the
    * wire, so the metric costs O(buckets) per partition at any scale. */
  final case class DeliveryMetrics(
      posted: Long,
      failed: Long,
      latencyP50Ms: Double,
      latencyP95Ms: Double,
      latencyP99Ms: Double,
      latencyMeanMs: Double)

  /** Immutable merged-histogram snapshot — the accumulator's VALUE type.
    * (Returning the accumulator itself from `value` recurses infinitely in
    * `AccumulatorV2.toString`, which Spark's appStatus listener calls —
    * StackOverflow in the listener thread stops the SparkContext.) */
  private final case class LatencySnapshot(buckets: Array[Long], totalMicros: Long, n: Long) {
    override def toString: String = s"LatencySnapshot(n=$n)"
  }

  /** Log2/16-bucketed latency histogram (±~4% value error), mergeable. */
  private final class LatencyHistogram(
      val buckets: Array[Long] = new Array[Long](1024),
      var totalMicros: Long = 0L,
      var n: Long = 0L)
      extends org.apache.spark.util.AccumulatorV2[Long, LatencySnapshot] {
    def isZero: Boolean = n == 0L
    def copy(): LatencyHistogram = new LatencyHistogram(buckets.clone(), totalMicros, n)
    def reset(): Unit = { java.util.Arrays.fill(buckets, 0L); totalMicros = 0L; n = 0L }
    def add(micros: Long): Unit = {
      val v = math.max(1L, micros)
      val idx = math.min(1023, (16.0 * math.log(v.toDouble) / math.log(2.0)).toInt)
      buckets(idx) += 1; totalMicros += v; n += 1
    }
    def merge(o: org.apache.spark.util.AccumulatorV2[Long, LatencySnapshot]): Unit = {
      val h = o.value
      var i = 0; while (i < buckets.length) { buckets(i) += h.buckets(i); i += 1 }
      totalMicros += h.totalMicros; n += h.n
    }
    def value: LatencySnapshot = LatencySnapshot(buckets.clone(), totalMicros, n)
    /** Geometric-midpoint percentile in milliseconds. */
    def percentileMs(q: Double): Double = {
      if (n == 0) return 0.0
      val target = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L; var i = 0
      while (i < buckets.length && cum + buckets(i) < target) { cum += buckets(i); i += 1 }
      math.pow(2.0, (i + 0.5) / 16.0) / 1000.0
    }
    def meanMs: Double = if (n == 0) 0.0 else totalMicros.toDouble / n / 1000.0
  }

  def postRowsWithMetrics(
      df: DataFrame,
      urlCol: String = "url",
      methodCol: Option[String] = Some("method"),
      bodyCol: Option[String] = Some("value"),
      headersCol: Option[String] = None,
      maxRowsPerSec: Int = 0,
      maxRetries: Int = 2): DeliveryMetrics = {
    val spark = df.sparkSession
    val posted = spark.sparkContext.longAccumulator("http_sink_posted")
    val failed = spark.sparkContext.longAccumulator("http_sink_failed")
    val latency = new LatencyHistogram()
    spark.sparkContext.register(latency, "http_sink_latency")
    val headerNames: Seq[String] = headersCol.toSeq.flatMap { h =>
      df.schema(h).dataType match {
        case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSeq
        case other => throw new IllegalArgumentException(
          s"headersCol '$h' must be a struct of string header values, got $other")
      }
    }
    val sel = df.select(
      col(urlCol).cast("string").as("__url") +:
        methodCol.map(m => upper(coalesce(col(m).cast("string"), lit("POST"))).as("__method"))
          .getOrElse(lit("POST").as("__method")) +:
        bodyCol.map(b => col(b).cast("string").as("__body"))
          .getOrElse(lit(null).cast("string").as("__body")) +:
        headerNames.map(hn => col(s"${headersCol.get}.`$hn`").cast("string").as(s"__h_$hn")): _*)
    val nParts = math.max(1, sel.rdd.getNumPartitions)
    val perPartitionRate = if (maxRowsPerSec > 0) maxRowsPerSec.toDouble / nParts else 0.0
    val hNames = headerNames // serializable copy for the closure
    sel.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val client = java.net.http.HttpClient.newHttpClient()
      val t0 = System.nanoTime()
      var sent = 0L
      it.foreach { row =>
        if (perPartitionRate > 0) {
          val due = t0 + (sent * 1e9 / perPartitionRate).toLong
          val wait = due - System.nanoTime()
          if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        }
        var ok = false
        val reqT0 = System.nanoTime()
        try {
          val method = row.getString(1)
          val body = if (row.isNullAt(2)) None else Some(row.getString(2))
          val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(row.getString(0)))
          hNames.zipWithIndex.foreach { case (hn, i) =>
            if (!row.isNullAt(3 + i)) b.header(hn, row.getString(3 + i))
          }
          // GET/HEAD never carry a body (the JDK client rejects it for GET)
          val pub = body
            .filter(_ => method != "GET" && method != "HEAD")
            .map { s =>
              b.header("Content-Type", "application/json")
              java.net.http.HttpRequest.BodyPublishers.ofString(s)
            }
            .getOrElse(java.net.http.HttpRequest.BodyPublishers.noBody())
          val req = b.method(method, pub).build()
          var attempt = 0
          while (!ok && attempt <= maxRetries) {
            try {
              val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
              ok = resp.statusCode() >= 200 && resp.statusCode() < 300
            } catch { case _: Exception => }
            // back off only when another attempt will actually run — a
            // trailing sleep after the FINAL failure wastes executor time
            // and inflates the recorded latency of permanently-failed rows
            if (!ok) { attempt += 1; if (attempt <= maxRetries) Thread.sleep(50L * attempt) }
          }
        } catch { case _: Exception => () } // malformed URL / method → failure
        latency.add((System.nanoTime() - reqT0) / 1000L)
        if (ok) posted.add(1) else failed.add(1)
        sent += 1
      }
    }
    DeliveryMetrics(posted.value, failed.value,
      latency.percentileMs(0.50), latency.percentileMs(0.95),
      latency.percentileMs(0.99), latency.meanMs)
  }
}
