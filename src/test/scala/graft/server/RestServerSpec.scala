package graft.server

import graft.SparkSuite
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

class RestServerSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /plan executes a JSON plan end-to-end and reports validations") {
    val in = Files.createTempDirectory("graft_rest_in").toString
    Seq((1L, "good long text value here"), (2L, "no"), (3L, "another fine value"))
      .toDF("id", "text").write.mode("overwrite").parquet(in)
    val out = Files.createTempDirectory("graft_rest_out").toString + "/res"
    val srv = new RestServer(spark).start()
    try {
      val resp = post(srv.boundPort, "/plan",
        s"""{"name":"rest_plan","source":{"path":"$in"},
           |"rules":[{"name":"long_enough","expr":"length(text) >= 10"}],
           |"keepOnly":true,"sink":{"path":"$out"}}""".stripMargin)
      assert(resp.statusCode() == 200, resp.body())
      assert(resp.body().contains(""""rows_in":3""") && resp.body().contains(""""rows_out":2"""))
      assert(resp.body().contains(""""rule":"long_enough","total":3,"errors":1"""))
      assert(spark.read.parquet(out).count() == 2)
      // YAML body on the same endpoint
      val y = post(srv.boundPort, "/plan",
        s"name: yplan\nsource:\n  path: $in\n")
      assert(y.statusCode() == 200 && y.body().contains(""""plan":"yplan""""))
      // bad plan → 400; health → ok
      assert(post(srv.boundPort, "/plan", """{"nope": true}""").statusCode() == 400)
      val health = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(health.statusCode() == 200 && health.body().contains("ok"))
    } finally srv.stop()
  }
}
