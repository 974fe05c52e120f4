package graft.sinks

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

class HttpSinkSpec extends SparkSuite {

  // hermetic in-JVM HTTP server (JDK com.sun.net.httpserver)
  private def withServer[T](failFirstN: Int = 0)(body: (String, java.util.Set[String], AtomicInteger) => T): T = {
    val received = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val requests = new AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ingest", (ex: com.sun.net.httpserver.HttpExchange) => {
      val bodyStr = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val n = requests.incrementAndGet()
      if (n <= failFirstN) ex.sendResponseHeaders(503, -1)
      else { received.add(bodyStr); ex.sendResponseHeaders(200, -1) }
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/ingest", received, requests)
    finally server.stop(0)
  }

  test("every row delivered exactly as its JSON body; distributed posting") {
    val df = spark.range(300).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartition(6)
    withServer() { (url, received, _) =>
      val (posted, failed) = HttpSink.postJson(df, url)
      assert(posted == 300 && failed == 0)
      assert(received.size == 300)
      assert(received.contains("""{"id":7,"v":"v7"}"""))
    }
  }

  test("transient 503s are retried (at-least-once delivery)") {
    // first 3 requests 503 — row 0 retries through them (maxRetries=3 allows
    // 4 attempts) and every later row succeeds first try
    val df = spark.range(50).select(col("id")).coalesce(1)
    withServer(failFirstN = 3) { (url, received, requests) =>
      val (posted, failed) = HttpSink.postJson(df, url, maxRetries = 3)
      assert(posted == 50 && failed == 0)
      assert(received.size == 50)
      assert(requests.get() >= 53) // the 3 failures were retried
    }
  }

  test("global rate limit paces delivery") {
    val df = spark.range(60).select(col("id")).coalesce(2)
    withServer() { (url, received, _) =>
      val t0 = System.nanoTime()
      val (posted, _) = HttpSink.postJson(df, url, maxRowsPerSec = 100)
      val sec = (System.nanoTime() - t0) / 1e9
      assert(posted == 60 && received.size == 60)
      // 60 rows at 100 rows/sec global → >= ~0.5 s (pacing is per partition:
      // 2 partitions × 50/s → 30 rows each → ~0.6 s)
      assert(sec >= 0.45, s"finished too fast for the rate limit: $sec s")
    }
  }
}
