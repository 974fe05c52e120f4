package graft.sinks

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Per-row HTTP URL templating + delivery — the reference's
  * `FieldBuilder.httpUrl` SQL assembly (`TaskBuilder.scala:1915-1937`) and
  * `HttpSinkProcessor.scala:168-199` row contract (url/method/headers from
  * row fields), recast as pure Column expressions + the JDK http client.
  */
class HttpUrlSpec extends SparkSuite {

  test("urlColumn: path substitution is URL-encoded, query parts join with &") {
    val df = spark.range(1).select(
      lit(4L).as("uid"), lit("a b").as("seg"),
      lit("a b").as("q"), array(lit("x"), lit("y")).as("tags"))
    val url = HttpSink.urlColumn(
      "http://h/api/users/{uid}/{seg}/posts",
      pathParams = Seq("uid" -> col("uid"), "seg" -> col("seg")),
      queryParams = Seq(
        HttpSink.QueryParam("q", col("q")),
        HttpSink.QueryParam("tags", col("tags"), isArray = true)))
    val got = df.select(url.as("u")).head.getString(0)
    // Reference semantics (`TaskBuilder.scala:1921-1930`): PATH params go
    // through URL_ENCODE (form encoding, space → '+'); QUERY values are raw
    // CAST(... AS STRING) — no encoding. Pin both.
    assert(got == "http://h/api/users/4/a+b/posts?q=a b&tags=x&tags=y", got)
  }

  test("urlColumn: collapsed array styles (form/space/pipe delimiters)") {
    val df = spark.range(1).select(array(lit("a"), lit("b"), lit("c")).as("v"))
    def render(style: String, explode: Boolean) =
      df.select(HttpSink.urlColumn("http://h/x",
        queryParams = Seq(HttpSink.QueryParam("v", col("v"), isArray = true,
          style = style, explode = explode))).as("u")).head.getString(0)
    assert(render("form", explode = false) == "http://h/x?v=a,b,c")
    assert(render("spaceDelimited", explode = false) == "http://h/x?v=a%20b%20c")
    assert(render("pipeDelimited", explode = false) == "http://h/x?v=a|b|c")
    assert(render("form", explode = true) == "http://h/x?v=a&v=b&v=c")
  }

  test("urlColumn: empty array query part drops from the join (null filtering)") {
    val df = spark.range(1).select(lit(7).as("n"),
      array_remove(array(lit("z")), "z").as("empty"))
    val got = df.select(HttpSink.urlColumn("http://h/x",
      queryParams = Seq(
        HttpSink.QueryParam("n", col("n")),
        HttpSink.QueryParam("t", col("empty"), isArray = true))).as("u"))
      .head.getString(0)
    assert(got == "http://h/x?n=7", got)
  }

  private def withCaptureServer[T](body: (Int, java.util.Set[String]) => T): T = {
    val received = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val bodyStr = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val hdr = Option(ex.getRequestHeaders.getFirst("X-Track")).getOrElse("")
      received.add(s"${ex.getRequestMethod} ${ex.getRequestURI} h=$hdr b=$bodyStr")
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try body(server.getAddress.getPort, received)
    finally server.stop(0)
  }

  test("postRows: per-row url + method + headers + body delivered") {
    withCaptureServer { (port, received) =>
      val df = spark.range(4).select(
        HttpSink.urlColumn(s"http://127.0.0.1:$port/api/u/{id}",
          pathParams = Seq("id" -> col("id"))).as("url"),
        when(col("id") % 2 === 0, "GET").otherwise("POST").as("method"),
        concat(lit("""{"k":"""), col("id"), lit("}")).as("value"),
        struct(concat(lit("t"), col("id")).as("X-Track")).as("headers"))
      val (posted, failed) = HttpSink.postRows(df,
        headersCol = Some("headers"))
      assert(posted == 4 && failed == 0, s"posted=$posted failed=$failed")
      // GET rows carry no body; POST rows do
      assert(received.contains("""GET /api/u/0 h=t0 b="""))
      assert(received.contains("""POST /api/u/1 h=t1 b={"k":1}"""))
      assert(received.contains("""GET /api/u/2 h=t2 b="""))
      assert(received.contains("""POST /api/u/3 h=t3 b={"k":3}"""))
    }
  }

  test("postRows: malformed URL counts as failure, not a task crash") {
    withCaptureServer { (port, received) =>
      val df = spark.range(2).select(
        when(col("id") === 0, s"http://127.0.0.1:$port/ok")
          .otherwise("not a url").as("url"),
        lit("POST").as("method"), lit("{}").as("value"))
      val (posted, failed) = HttpSink.postRows(df, maxRetries = 0)
      assert(posted == 1 && failed == 1)
      assert(received.size == 1)
    }
  }

  test("legacy dialect: httpUrl/httpHeaders fields expand to url/method/headers columns") {
    val planYaml =
      """name: "http_plan"
        |tasks:
        |  - name: "api"
        |    dataSourceName: "api"
        |""".stripMargin
    val taskYaml =
      """name: "api"
        |steps:
        |  - name: "calls"
        |    count: {records: 50}
        |    fields:
        |      - name: "httpUrl"
        |        fields:
        |          - name: "url"
        |            static: "http://host:1234/api/users/{id}"
        |          - name: "method"
        |            static: "PUT"
        |          - name: "pathParam"
        |            fields:
        |              - name: "id"
        |                type: "int"
        |                options: {min: 1, max: 99}
        |          - name: "queryParam"
        |            fields:
        |              - name: "limit"
        |                type: "int"
        |                options: {min: 1, max: 9}
        |      - name: "httpHeaders"
        |        fields:
        |          - name: "X-Api-Key"
        |            static: "k-123"
        |      - name: "httpBody"
        |        fields:
        |          - name: "account_id"
        |            options: {regex: "ACC[0-9]{6}"}
        |""".stripMargin
    val spec = graft.plan.LegacyPlan.parsePlan(planYaml, Map("api" -> taskYaml))
    val out = graft.plan.MultiPlanRunner.run(spark, spec).frames("calls").cache()
    assert(out.count() == 50)
    // url built from the generated path/query params, method static
    assert(out.where(!col("url").rlike("^http://host:1234/api/users/[0-9]+\\?limit=[0-9]$"))
      .count() == 0, out.select("url").head.getString(0))
    assert(out.where(col("method") =!= "PUT").count() == 0)
    // url's path slot agrees with the row's own pathParamid field
    assert(out.where(!col("url").startsWith(
      concat(lit("http://host:1234/api/users/"), col("pathParamid")))).count() == 0)
    // headers struct + body mapping (value = TO_JSON(body)) still compose
    assert(out.where(col("headers.X-Api-Key") =!= "k-123").count() == 0)
    assert(out.where(!col("value").rlike("^\\{\"account_id\":\"ACC[0-9]{6}\"\\}$")).count() == 0)
    out.unpersist()
  }

  test("postJson: malformed fixed url fails loudly on the driver, not row-by-row") {
    val df = spark.range(3).selectExpr("id")
    intercept[IllegalArgumentException] {
      HttpSink.postJson(df, "not a url")
    }
    intercept[IllegalArgumentException] {
      HttpSink.postJson(df, "file:///etc/passwd")
    }
  }

  test("legacy httpUrl: dotted query-param names survive the rendered SQL") {
    val taskYaml =
      """name: "api"
        |steps:
        |  - name: "calls"
        |    count: {records: 5}
        |    fields:
        |      - name: "httpUrl"
        |        fields:
        |          - name: "url"
        |            static: "http://h/x"
        |          - name: "queryParam"
        |            fields:
        |              - name: "page.size"
        |                type: "int"
        |                options: {min: 3, max: 3}
        |""".stripMargin
    val tasks = graft.plan.LegacyPlan.parseTaskFile(taskYaml)
    val df = graft.generator.Generator.generate(spark, 5L,
      tasks.head.fields.map(_.toSpec), seed = 4L)
    val urls = df.select("url").collect().map(_.getString(0)).distinct
    assert(urls.sameElements(Array("http://h/x?page.size=3")), urls.mkString(","))
  }

  test("postRowsWithMetrics: latency percentiles from the merged histogram") {
    withCaptureServer { (port, received) =>
      val df = spark.range(40).select(
        lit(s"http://127.0.0.1:$port/m").as("url"),
        lit("POST").as("method"),
        concat(lit("""{"i":"""), col("id"), lit("}")).as("value"))
      val m = HttpSink.postRowsWithMetrics(df)
      assert(m.posted == 40 && m.failed == 0)
      // sane latency shape: all positive, monotone p50 <= p95 <= p99,
      // localhost round-trips land well under a second
      assert(m.latencyP50Ms > 0.0 && m.latencyP50Ms < 1000.0, m.toString)
      assert(m.latencyP50Ms <= m.latencyP95Ms && m.latencyP95Ms <= m.latencyP99Ms)
      assert(m.latencyMeanMs > 0.0 && m.latencyMeanMs < 1000.0)
      assert(received.size == 40)
    }
  }
}
