package graft.server

import graft.plan.PlanRunner
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal REST entry point — the reference's third entry surface (SURVEY
  * §3.3: a web server accepting plan submissions, `core/ui/` ~2,400 LoC)
  * reduced to the part that matters for a headless engine, on the JDK's own
  * `com.sun.net.httpserver` (no web framework):
  *
  *   POST /plan    body = PlanSpec JSON or YAML → executes via PlanRunner,
  *                 responds with rows_in/rows_out + per-rule validation
  *                 results (400 on parse errors, 500 on execution errors)
  *   GET  /health  liveness
  *
  * With this, all three reference entry shapes exist: the Scala case-class
  * API ([[graft.plan.PlanSpec]]), YAML/JSON plan files
  * ([[PlanRunner.parseYaml]], `graft.Main --plan`), and REST submission.
  */
final class RestServer(spark: SparkSession, port: Int = 0) {

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def start(): RestServer = {
    server.createContext("/health", (ex: com.sun.net.httpserver.HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))
    server.createContext("/plan", (ex: com.sun.net.httpserver.HttpExchange) => {
      if (ex.getRequestMethod != "POST") respond(ex, 405, """{"error":"POST only"}""")
      else {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val parsed =
          try Right(if (body.trim.startsWith("{")) PlanRunner.parseJson(body)
                    else PlanRunner.parseYaml(body))
          catch { case e: Exception => Left(e) }
        parsed match {
          case Left(e) =>
            respond(ex, 400, s"""{"error":"invalid plan: ${esc(String.valueOf(e.getMessage))}"}""")
          case Right(plan) =>
            try {
              val o = PlanRunner.run(spark, plan)
              val vs = o.validations.map(v =>
                s"""{"rule":"${esc(v.rule)}","total":${v.total},"errors":${v.errors},"success":${v.success}}""")
                .mkString("[", ",", "]")
              respond(ex, 200,
                s"""{"plan":"${esc(o.plan)}","rows_in":${o.rowsIn},"rows_out":${o.rowsOut},""" +
                  s""""success":${o.success},"validations":$vs}""")
            } catch {
              case e: Exception =>
                respond(ex, 500, s"""{"error":"${esc(String.valueOf(e.getMessage))}"}""")
            }
        }
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)
}
