package graft.sinks

import graft.SparkSuite
import graft.sinks.LoadPatterns._

class LoadPatternsSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  test("schedule: constant pattern integrates to rate*duration") {
    val cum = schedule(Constant(50), durationSec = 10, tickSec = 0.1)
    assert(cum.length == 100)
    assert(math.abs(cum.last - 500.0) < 1e-9)
    // linearity: halfway through = half the budget
    assert(math.abs(cum(49) - 250.0) < 50 * 0.1 + 1e-9)
  }

  test("schedule: ramp doubles budget-weight toward the end") {
    val cum = schedule(Ramp(10, 110), durationSec = 10)
    // total = mean rate 60 * 10s
    assert(math.abs(cum.last - 600.0) < 1.0)
    // first half integrates the low rates: 10→60 avg 35 → 175 rows
    assert(math.abs(allowedRows(cum, 0.1, 5.0) - 175.0) < 2.0)
  }

  test("schedule: spike window carries the extra budget exactly") {
    val cum = schedule(Spike(baseRate = 10, spikeRate = 100, spikeStart = 0.4, spikeDuration = 0.2),
      durationSec = 10)
    // 8s at 10/s + 2s at 100/s = 280
    assert(math.abs(cum.last - 280.0) < 1e-6)
    assert(math.abs(allowedRows(cum, 0.1, 4.0) - 40.0) < 1e-6) // pre-spike
    assert(math.abs(allowedRows(cum, 0.1, 6.0) - 240.0) < 1e-6) // post-spike
  }

  test("schedule: steps hold each rate for its duration, last rate persists") {
    val p = Steps(Seq((5.0, 2.0), (20.0, 3.0), (10.0, 1.0)))
    assert(p.rateAt(1.0, 6.0) == 5.0 && p.rateAt(4.9, 6.0) == 20.0 && p.rateAt(5.5, 6.0) == 10.0)
    assert(p.rateAt(99.0, 6.0) == 10.0) // past the end
    val cum = schedule(p, durationSec = 6)
    assert(math.abs(cum.last - (10 + 60 + 10)) < 1e-6)
  }

  test("schedule: wave oscillates around base and never goes negative") {
    val p = Wave(baseRate = 10, amplitude = 15, frequency = 2)
    val rates = (0 until 100).map(i => p.rateAt(i * 0.1, 10.0))
    assert(rates.min == 0.0) // floored, not negative
    assert(rates.max > 20.0)
    // a whole number of cycles integrates close to base*duration plus the
    // floored-clip excess (clip only ADDS area)
    assert(schedule(p, 10).last >= 10.0 * 10 - 1.0)
  }

  test("breakingPoint pattern: stepwise increase, capped") {
    val p = BreakingPoint(startRate = 10, rateIncrement = 5, incrementIntervalSec = 2, maxRate = Some(22))
    assert(p.rateAt(0.5, 100) == 10.0 && p.rateAt(2.1, 100) == 15.0 && p.rateAt(4.5, 100) == 20.0)
    assert(p.rateAt(20.0, 100) == 22.0) // cap
  }

  test("phased: warmup and cooldown bracket the main pattern on a shifted clock") {
    val p = Phased(warmupRate = 5, warmupSec = 2,
      main = Ramp(10, 110), mainSec = 10,
      cooldownRate = 2, cooldownSec = 3)
    assert(p.totalSec == 15.0)
    assert(p.rateAt(1.0, 15) == 5.0) // warmup
    assert(p.rateAt(14.0, 15) == 2.0) // cooldown
    // main's clock starts at warmupSec: t=2 is the ramp's OWN t=0
    assert(math.abs(p.rateAt(2.0, 15) - 10.0) < 1e-9)
    assert(math.abs(p.rateAt(12.0 - 1e-9, 15) - 110.0) < 0.1)
    // budget = 5*2 + mean(60)*10 + 2*3 = 616
    assert(math.abs(schedule(p, p.totalSec).last - 616.0) < 1.5)
  }

  test("findBreakingPoint: locates the capacity cliff without a clock") {
    // synthetic system: flawless to 30 req/interval-second, then 50% failures
    val capacity = 30.0
    val bp = BreakingPoint(startRate = 10, rateIncrement = 5, incrementIntervalSec = 1)
    val res = findBreakingPoint(bp,
      deliver = n => if (n > capacity) n / 2 else 0L, failureThreshold = 0.05)
    assert(res.maxSustainedRate == 30.0)
    assert(res.breakingRate.contains(35.0))
    assert(res.intervals.map(_._1) == Seq(10.0, 15.0, 20.0, 25.0, 30.0, 35.0))
    // a capped search that never breaks reports the cap as sustained
    val capped = BreakingPoint(10, 5, 1, maxRate = Some(20))
    val ok = findBreakingPoint(capped, deliver = _ => 0L)
    assert(ok.breakingRate.isEmpty && ok.maxSustainedRate == 20.0)
  }

  test("postJsonShaped: rows beyond the pattern's total budget drain after the horizon") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ingest", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getRequestBody.readAllBytes(); ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      // 30 rows against a 10-row budget: the 20 extra must complete once the
      // 1s horizon passes (a pure cumulative-curve wait would hang forever)
      val df = (1 to 30).toDF("id").repartition(2)
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/ingest"
      val t0 = System.nanoTime()
      val (posted, failed) = postJsonShaped(df, url, Constant(10), durationSec = 1.0)
      assert(posted == 30 && failed == 0)
      assert((System.nanoTime() - t0) / 1e9 < 20.0)
    } finally server.stop(0)
  }

  test("postJsonShaped: delivered shape follows a step pattern within tolerance") {
    // in-JVM server records arrival times; 2 windows of 1s at 40/s then 120/s
    val arrivals = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ingest", (ex: com.sun.net.httpserver.HttpExchange) => {
      arrivals.add(System.nanoTime())
      ex.getRequestBody.readAllBytes()
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/ingest"
      val df = (1 to 160).toDF("id").repartition(4)
      val (posted, failed) = postJsonShaped(df, url,
        Steps(Seq((40.0, 1.0), (120.0, 1.0))), durationSec = 2.0)
      assert(posted == 160 && failed == 0)
      // windows are relative to the FIRST arrival: Spark job submission
      // costs hundreds of ms before any partition's pacing clock starts
      val raw = arrivals.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      val s = raw.map(t => (t - raw.min) / 1e9)
      val w1 = s.count(_ < 1.0)
      // window 1 budget is 40: pacing must hold delivery well under the
      // uncapped rate (the suite posts 160 rows in <100ms without pacing);
      // generous upper bound for scheduling jitter, firm lower bound
      assert(w1 >= 25 && w1 <= 60, s"window-1 arrivals: $w1")
      assert(s.length == 160)
      // everything lands within the declared 2s horizon (+slack)
      assert(s.max < 3.5, s"last arrival ${s.max}s")
    } finally server.stop(0)
  }
}
