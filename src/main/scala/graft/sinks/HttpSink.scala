package graft.sinks

import org.apache.spark.sql.DataFrame
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
    val spark = df.sparkSession
    val posted = spark.sparkContext.longAccumulator("http_sink_posted")
    val failed = spark.sparkContext.longAccumulator("http_sink_failed")
    val json = df.select(to_json(struct(df.columns.map(col): _*)).as("body"))
    val nParts = math.max(1, json.rdd.getNumPartitions)
    // fractional per-partition budget: flooring at 1 row/sec/partition would
    // overshoot the GLOBAL cap by up to nParts/maxRowsPerSec times
    val perPartitionRate = if (maxRowsPerSec > 0) maxRowsPerSec.toDouble / nParts else 0.0
    json.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val client = java.net.http.HttpClient.newHttpClient()
      val t0 = System.nanoTime()
      var sent = 0L
      it.foreach { row =>
        // pacing: never exceed perPartitionRate rows/sec from this partition
        if (perPartitionRate > 0) {
          val due = t0 + (sent * 1e9 / perPartitionRate).toLong
          val wait = due - System.nanoTime()
          if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        }
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(row.getString(0)))
          .build()
        var attempt = 0
        var ok = false
        while (!ok && attempt <= maxRetries) {
          try {
            val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
            ok = resp.statusCode() >= 200 && resp.statusCode() < 300
          } catch { case _: Exception => }
          if (!ok) { attempt += 1; Thread.sleep(50L * attempt) }
        }
        if (ok) posted.add(1) else failed.add(1)
        sent += 1
      }
    }
    (posted.value, failed.value)
  }
}
