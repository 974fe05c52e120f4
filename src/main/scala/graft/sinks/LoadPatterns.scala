package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-shaped delivery rates — the reference's execution strategies
  * (`core/generator/execution/pattern/{ConstantLoadPattern,RampLoadPattern,
  * SpikeLoadPattern,SteppedLoadPattern,WaveLoadPattern,
  * BreakingPointPattern}.scala` + `BreakingPointExecutionStrategy.scala`,
  * 242 LoC): a load test declares records/sec as a function of elapsed
  * time, and generation is throttled to that shape.
  *
  * Recast for Spark's execution model: a pattern compiles to a CUMULATIVE
  * row-budget curve (`schedule`), sampled on a fixed tick and broadcast to
  * partitions as a plain array; each partition of ONE distributed job paces
  * itself against its share of that curve (same shape as [[HttpSink]]'s
  * constant budget — the reference instead runs a driver-side batch loop
  * per interval). Cumulative-budget pacing beats per-window batching at
  * scale: no per-window job scheduling overhead, no driver round-trips,
  * and a straggler partition catches up automatically because the budget
  * is cumulative, not per-tick.
  */
object LoadPatterns {

  /** records/sec as a function of elapsed time; total duration is known at
    * schedule time. All rates are doubles — sub-1/sec global rates stay
    * meaningful after the per-partition split.
    */
  sealed trait LoadPattern {
    def rateAt(elapsedSec: Double, totalSec: Double): Double
  }

  final case class Constant(rate: Double) extends LoadPattern {
    require(rate > 0, s"rate must be positive: $rate")
    def rateAt(t: Double, total: Double): Double = rate
  }

  /** Linear start→end over the full duration. */
  final case class Ramp(startRate: Double, endRate: Double) extends LoadPattern {
    require(startRate > 0 && endRate > 0, "rates must be positive")
    def rateAt(t: Double, total: Double): Double =
      if (total <= 0) startRate
      else startRate + (endRate - startRate) * math.min(t / total, 1.0)
  }

  /** `baseRate` except inside [spikeStart, spikeStart+spikeDuration)
    * (fractions of the total duration), where it is `spikeRate`.
    */
  final case class Spike(baseRate: Double, spikeRate: Double,
      spikeStart: Double, spikeDuration: Double) extends LoadPattern {
    require(baseRate > 0 && spikeRate > baseRate, "need spikeRate > baseRate > 0")
    require(spikeStart >= 0 && spikeStart + spikeDuration <= 1.0, "spike window within [0,1]")
    def rateAt(t: Double, total: Double): Double = {
      val p = if (total <= 0) 0.0 else t / total
      if (p >= spikeStart && p < spikeStart + spikeDuration) spikeRate else baseRate
    }
  }

  /** Piecewise-constant steps of (rate, durationSec); holds the last step's
    * rate past the declared end.
    */
  final case class Steps(steps: Seq[(Double, Double)]) extends LoadPattern {
    require(steps.nonEmpty && steps.forall { case (r, d) => r > 0 && d > 0 },
      "every step needs positive rate and duration")
    private val ends: Seq[(Double, Double)] =
      steps.scanLeft((0.0, 0.0)) { case ((end, _), (r, d)) => (end + d, r) }.tail
    def rateAt(t: Double, total: Double): Double =
      ends.find(t < _._1).map(_._2).getOrElse(ends.last._2)
  }

  /** Sine oscillation around `baseRate`: base + amplitude·sin(2π·freq·t/total),
    * floored at 0 (freq = full cycles over the duration).
    */
  final case class Wave(baseRate: Double, amplitude: Double, frequency: Double)
      extends LoadPattern {
    require(baseRate > 0 && amplitude >= 0 && frequency > 0, "invalid wave params")
    def rateAt(t: Double, total: Double): Double = {
      val p = if (total <= 0) 0.0 else t / total
      math.max(0.0, baseRate + amplitude * math.sin(2 * math.Pi * frequency * p))
    }
  }

  /** startRate + increment per `incrementIntervalSec` elapsed, optionally
    * capped — the open-ended stress shape searched by
    * [[findBreakingPoint]].
    */
  final case class BreakingPoint(startRate: Double, rateIncrement: Double,
      incrementIntervalSec: Double, maxRate: Option[Double] = None) extends LoadPattern {
    require(startRate > 0 && rateIncrement > 0 && incrementIntervalSec > 0, "invalid params")
    def rateAt(t: Double, total: Double): Double = {
      val r = startRate + (t / incrementIntervalSec).toInt * rateIncrement
      maxRate.fold(r)(math.min(r, _))
    }
  }

  /** Warmup / cooldown phases around a main pattern — the reference's
    * `WarmupCooldownManager.scala` (175 LoC) holds a constant rate before
    * and after the measured window so JIT/conn-pool effects don't pollute
    * it. As a pattern COMBINATOR the whole composite stays declarative:
    * the main pattern's own clock starts after the warmup (its `t` is
    * shifted), and measurement tooling drops the warmup/cooldown windows.
    */
  final case class Phased(
      warmupRate: Double, warmupSec: Double,
      main: LoadPattern, mainSec: Double,
      cooldownRate: Double, cooldownSec: Double) extends LoadPattern {
    require(warmupSec >= 0 && mainSec > 0 && cooldownSec >= 0, "invalid phase durations")
    def totalSec: Double = warmupSec + mainSec + cooldownSec
    def rateAt(t: Double, total: Double): Double =
      if (t < warmupSec) warmupRate
      else if (t < warmupSec + mainSec) main.rateAt(t - warmupSec, mainSec)
      else cooldownRate
  }

  /** Sample the pattern into a cumulative row-budget curve: entry i = total
    * rows allowed by time (i+1)·tickSec. Pure and deterministic — the unit
    * under test for every shape, and the broadcastable artifact the
    * executors pace against. Size = duration/tick entries (a 1-hour run at
    * 100 ms ticks is 36k doubles — trivially broadcastable).
    */
  def schedule(pattern: LoadPattern, durationSec: Double, tickSec: Double = 0.1): Array[Double] = {
    require(durationSec > 0 && tickSec > 0, "need positive duration and tick")
    val n = math.ceil(durationSec / tickSec).toInt
    val out = new Array[Double](n)
    var cum = 0.0
    var i = 0
    while (i < n) {
      // midpoint sample: exact for piecewise-constant shapes, 2nd-order for
      // the smooth ones
      cum += pattern.rateAt((i + 0.5) * tickSec, durationSec) * tickSec
      out(i) = cum
      i += 1
    }
    out
  }

  /** Rows allowed by elapsed time `t` under a schedule (linear interpolation
    * within a tick; beyond the schedule the final budget holds).
    */
  def allowedRows(cum: Array[Double], tickSec: Double, t: Double): Double = {
    if (t <= 0) 0.0
    else {
      val i = (t / tickSec).toInt
      if (i >= cum.length) cum.last
      else {
        val prev = if (i == 0) 0.0 else cum(i - 1)
        prev + (cum(i) - prev) * (t / tickSec - i)
      }
    }
  }

  /** POST each row of `df` as JSON to `url`, pacing GLOBAL delivery to
    * `pattern` over `durationSec`. Same distributed shape as
    * [[HttpSink.postJson]] — serialization in the plan, one job, posting
    * scales with executors — but the per-partition budget is the
    * time-varying curve instead of a constant rate. Returns
    * (rowsPosted, rowsFailed) attempt counts (at-least-once, as there).
    */
  def postJsonShaped(
      df: DataFrame,
      url: String,
      pattern: LoadPattern,
      durationSec: Double,
      tickSec: Double = 0.1,
      maxRetries: Int = 2): (Long, Long) = {
    val spark = df.sparkSession
    val posted = spark.sparkContext.longAccumulator("shaped_sink_posted")
    val failed = spark.sparkContext.longAccumulator("shaped_sink_failed")
    val cum = schedule(pattern, durationSec, tickSec)
    val json = df.select(to_json(struct(df.columns.map(col): _*)).as("body"))
    val nParts = math.max(1, json.rdd.getNumPartitions)
    json.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val client = java.net.http.HttpClient.newHttpClient()
      val t0 = System.nanoTime()
      var sent = 0L
      val horizonSec = cum.length * tickSec
      it.foreach { row =>
        // wait until the cumulative curve grants this partition its next
        // row; past the declared horizon everything is granted — the shape
        // constrains delivery WITHIN the duration, and rows beyond the
        // pattern's total budget must still complete (not hang the task)
        var granted = false
        while (!granted) {
          val elapsed = (System.nanoTime() - t0) / 1e9
          val allowed = allowedRows(cum, tickSec, elapsed) / nParts
          if (sent < allowed || elapsed >= horizonSec) granted = true
          else Thread.sleep(1L) // 1 ms poll — far below any meaningful tick
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

  final case class BreakingPointResult(
      /** Highest rate where the failure fraction stayed under threshold
        * (0 if even startRate broke). */
      maxSustainedRate: Double,
      /** Rate at which the threshold was first breached, if it was. */
      breakingRate: Option[Double],
      /** (rate, attempted, failed) per completed interval. */
      intervals: Seq[(Double, Long, Long)])

  /** Step the rate up per `BreakingPoint` until `deliver` reports a failure
    * fraction ≥ `failureThreshold` over an interval, or `maxRate`/`maxIntervals`
    * is hit (the reference's `BreakingPointExecutionStrategy.scala` search,
    * minus its wall-clock coupling). `deliver(n)` must attempt n sends and
    * return the failure count — injectable, so the search is testable
    * without a clock; the HTTP path passes a closure over
    * [[HttpSink.postJson]].
    */
  def findBreakingPoint(
      pattern: BreakingPoint,
      deliver: Long => Long,
      failureThreshold: Double = 0.05,
      maxIntervals: Int = 1000): BreakingPointResult = {
    val results = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Long)]
    var rate = pattern.startRate
    var sustained = 0.0
    var breaking: Option[Double] = None
    var i = 0
    while (breaking.isEmpty && i < maxIntervals &&
        pattern.maxRate.forall(rate <= _)) {
      val attempts = math.max(1L, math.round(rate * pattern.incrementIntervalSec))
      val failures = deliver(attempts)
      results += ((rate, attempts, failures))
      if (failures.toDouble / attempts >= failureThreshold) breaking = Some(rate)
      else sustained = rate
      rate += pattern.rateIncrement
      i += 1
    }
    BreakingPointResult(sustained, breaking, results.toSeq)
  }
}
