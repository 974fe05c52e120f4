package graft.rules

import graft.SparkSuite
import graft.generator.Generator
import org.apache.spark.sql.functions._

/** Drives the Confluent Schema Registry REST protocol against a hermetic
  * in-JVM server (the same harness as HttpSinkSpec): subjects listing,
  * subject/version fetch, id fetch, AVRO + JSON dispatch, and the
  * fetch → generate → validate round-trip the reference's importer exists
  * for (`ConfluentSchemaRegistryMetadata.scala`).
  */
class SchemaRegistrySpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private val avroSchema =
    """{"type":"record","name":"Txn","fields":[
      |  {"name":"txn_id","type":"string"},
      |  {"name":"amount","type":"double"},
      |  {"name":"status","type":{"type":"enum","name":"St","symbols":["open","closed"]}},
      |  {"name":"memo","type":["null","string"]}
      |]}""".stripMargin
  private val jsonSchema =
    """{"type":"object","required":["id"],"properties":{
      |  "id":{"type":"integer","minimum":1,"maximum":99},
      |  "tag":{"type":"string","enum":["a","b"]}
      |}}""".stripMargin

  private def jstr(sch: String): String =
    sch.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ")

  private def withRegistry[T](body: String => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, payload: String): Unit = {
      val bytes = payload.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getRequestURI.getPath match {
        case "/subjects" => respond(ex, 200, """["txns-value","events-value"]""")
        case "/subjects/txns-value/versions/latest" | "/subjects/txns-value/versions/3" =>
          // Confluent omits schemaType for AVRO — the default must apply
          respond(ex, 200,
            s"""{"subject":"txns-value","version":3,"id":7,"schema":"${jstr(avroSchema)}"}""")
        case "/subjects/events-value/versions/latest" =>
          respond(ex, 200,
            s"""{"subject":"events-value","version":1,"id":8,"schemaType":"JSON","schema":"${jstr(jsonSchema)}"}""")
        case "/schemas/ids/7" =>
          respond(ex, 200, s"""{"schema":"${jstr(avroSchema)}"}""")
        case "/subjects/protos-value/versions/latest" =>
          // main schema references an import subject — the shape of the
          // reference's own registry fixtures (get-example.json)
          respond(ex, 200,
            s"""{"subject":"protos-value","version":1,"schemaType":"PROTOBUF",
               |"references":[{"name":"my-import","subject":"my-import","version":1}],
               |"schema":"syntax = \\"proto3\\"; import \\"my-import.proto\\"; message Order { int64 qty = 1; Imported ext = 2; optional string note = 3; }"}""".stripMargin.replace("\n", ""))
        case "/subjects/my-import/versions/1" =>
          respond(ex, 200,
            s"""{"subject":"my-import","version":1,"schemaType":"PROTOBUF","schema":"syntax = \\"proto3\\"; message Imported { string tag = 1; }"}""")
        case "/subjects/thrifty/versions/latest" =>
          respond(ex, 200,
            s"""{"subject":"thrifty","version":1,"schemaType":"THRIFT","schema":"struct X {}"}""")
        case _ => respond(ex, 404, """{"error_code":40401,"message":"not found"}""")
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("subjects + AVRO subject: fetch, generate, rules hold") {
    withRegistry { base =>
      assert(SchemaRegistry.listSubjects(base) == Seq("txns-value", "events-value"))
      val imp = SchemaRegistry.importSubject(base, "txns-value")
      assert(imp.subject == "txns-value")
      assert(imp.specs.map(_.name) == Seq("txn_id", "amount", "status", "memo"))
      assert(imp.nullable.contains("memo")) // union-with-null → nullable hint
      val df = Generator.generate(s, 300, imp.specs, seed = 5L, nullProb = imp.nullable)
      assert(df.count() == 300)
      assert(df.where(!col("status").isin("open", "closed")).isEmpty)
      assert(RuleEngine.validateAll(df, imp.rules, threshold = 0.0)
        .forall(_.success))
      // id addressing returns the same schema (schemaType defaulted to AVRO)
      val byId = SchemaRegistry.fetchSchemaById(base, 7)
      // (jstr flattens newlines for JSON transport — compare parsed trees)
      assert(byId.schemaType == "AVRO" &&
        graft.util.Jsons.parse(byId.schema) == graft.util.Jsons.parse(avroSchema))
    }
  }

  test("JSON subject dispatches to the JSON-schema importer") {
    withRegistry { base =>
      val imp = SchemaRegistry.importSubject(base, "events-value")
      val df = Generator.generate(s, 200, imp.specs, seed = 6L)
      assert(df.where(col("id") < 1 || col("id") > 99).isEmpty)
      assert(df.where(!col("tag").isin("a", "b")).isEmpty)
      assert(RuleEngine.validateAll(df, imp.rules).forall(_.success))
    }
  }

  test("protobuf subject: schema references resolve through the registry") {
    withRegistry { base =>
      val imp = SchemaRegistry.importSubject(base, "protos-value")
      assert(imp.specs.map(_.name) == Seq("qty", "ext", "note"))
      assert(imp.nullable.contains("note")) // optional → nullable hint
      val df = Generator.generate(s, 100, imp.specs, seed = 7L, nullProb = imp.nullable)
      // the imported subject's message resolved as a nested struct
      assert(df.where(col("ext.tag").isNull).isEmpty)
      assert(df.where(col("qty") < 0).isEmpty)
    }
  }

  test("register -> import round-trip against a stateful registry") {
    // stateful stub: POST /subjects/{s}/versions stores the schema and
    // assigns an id; GET serves it back — the Confluent write protocol
    val stored = scala.collection.concurrent.TrieMap[String, (Int, String, String)]()
    val nextId = new java.util.concurrent.atomic.AtomicInteger(100)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, payload: String): Unit = {
      val bytes = payload.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("POST", p) if p.startsWith("/subjects/") && p.endsWith("/versions") =>
          val subject = p.stripPrefix("/subjects/").stripSuffix("/versions")
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val j = graft.util.Jsons.parse(body)
          val schema = graft.util.Jsons.str(j \ "schema").get
          val st = graft.util.Jsons.str(j \ "schemaType").getOrElse("AVRO")
          val id = nextId.incrementAndGet()
          stored(subject) = (id, st, schema)
          respond(ex, 200, s"""{"id":$id}""")
        case ("GET", p) if p.startsWith("/subjects/") && p.contains("/versions/") =>
          val subject = p.stripPrefix("/subjects/").takeWhile(_ != '/')
          stored.get(subject) match {
            case Some((id, st, schema)) => respond(ex, 200,
              s"""{"subject":"$subject","version":1,"id":$id,"schemaType":"$st","schema":"${jstr(schema)}"}""")
            case None => respond(ex, 404, """{"error_code":40401,"message":"nope"}""")
          }
        case _ => respond(ex, 404, """{"error_code":40401,"message":"nope"}""")
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val id = SchemaRegistry.register(base, "roundtrip-value", avroSchema)
      assert(id > 100)
      val imp = SchemaRegistry.importSubject(base, "roundtrip-value")
      assert(imp.subject == "roundtrip-value")
      assert(imp.specs.nonEmpty)
      // the imported specs generate (the schema survived the wire intact)
      val df = graft.generator.Generator.generate(s, 50L, imp.specs)
      assert(df.count() == 50)
      // registering under an encoded-character subject round-trips too
      val e = intercept[IllegalStateException](
        SchemaRegistry.importSubject(base, "never-registered"))
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("unknown schema types and HTTP errors fail loudly") {
    withRegistry { base =>
      val e = intercept[IllegalArgumentException](
        SchemaRegistry.importSubject(base, "thrifty"))
      assert(e.getMessage.contains("THRIFT"))
      val e2 = intercept[IllegalStateException](
        SchemaRegistry.fetchSchema(base, "missing-subject"))
      assert(e2.getMessage.contains("404"))
    }
  }
}
