package graft.rules

import graft.generator.FieldSpec
import org.json4s._

/** Confluent Schema Registry importer — the reference's
  * `core/generator/metadata/datasource/confluentschemaregistry/
  * ConfluentSchemaRegistryMetadata.scala`: fetch a schema from the
  * registry's REST protocol and turn it into generation metadata.
  *
  * Protocol (same endpoints as the reference):
  *  - `GET {base}/subjects` → JSON array of subject names;
  *  - `GET {base}/subjects/{subject}/versions/{version}` (version defaults
  *    to `latest`) → `{subject, version, id, schemaType, schema}`;
  *  - `GET {base}/schemas/ids/{id}` → `{schemaType, schema}`.
  *
  * Schema-type dispatch: `AVRO` (the registry default when `schemaType` is
  * absent) delegates to [[AvroSchema]]; `JSON` to [[JsonSchema]] — both
  * yield [[FieldSpec]]s plus constraint [[Rule]]s evaluated in one
  * projection; `PROTOBUF` (the only type the reference supports — its
  * avro/json branches are a TODO) parses via [[Proto3Schema]], with
  * schema `references` resolved through the registry transitively the way
  * the reference fetches referenced subjects.
  *
  * Transport is a plain `java.net.http.HttpClient` GET — registry metadata
  * is one small document, not data; generation driven by the imported
  * specs stays distributed.
  */
object SchemaRegistry {

  final case class RegistrySchema(
      subject: String,
      version: Int,
      schemaType: String,
      /** The schema document itself (Avro/JSON/proto3 schema as a string). */
      schema: String,
      /** Schema references: (name, subject, version) — protobuf imports
        * resolve through these (Confluent's references array). */
      references: Seq[(String, String, Int)] = Nil)

  final case class Imported(
      subject: String,
      specs: Seq[FieldSpec],
      rules: Seq[Rule],
      /** field → null-probability hint for nullable fields (Avro unions). */
      nullable: Map[String, Double])

  // one shared client: importSubject issues 1+N transitive GETs and a
  // per-request client would build a connection pool + selector thread each
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(10000)).build()

  private def get(url: String, timeoutMs: Long = 10000): String = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Accept", "application/vnd.schemaregistry.v1+json, application/json")
      .GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"schema registry GET $url returned ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  private def jsonStr(s: String): String = graft.util.Jsons.quote(s)

  /** Register a schema under a subject — the WRITE half of the Confluent
    * protocol (`POST /subjects/{subject}/versions`, body
    * `{schema, schemaType, references}`); returns the registry-assigned
    * schema id. Lets a discovered/authored plan push its schemas back to
    * the registry before generating against them (the reference's
    * metadata flow only reads). */
  def register(baseUrl: String, subject: String, schema: String,
      schemaType: String = "AVRO",
      references: Seq[(String, String, Int)] = Nil): Int = {
    val refsJson = references.map { case (n, s, v) =>
      s"""{"name":${jsonStr(n)},"subject":${jsonStr(s)},"version":$v}"""
    }.mkString("[", ",", "]")
    val body =
      s"""{"schema":${jsonStr(schema)},"schemaType":${jsonStr(schemaType)},"references":$refsJson}"""
    val req = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$baseUrl/subjects/${enc(subject)}/versions"))
      .timeout(java.time.Duration.ofMillis(10000))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"schema registry POST $baseUrl/subjects/$subject/versions returned " +
          s"${resp.statusCode()}: ${resp.body().take(200)}")
    graft.util.Jsons.dbl(graft.util.Jsons.parse(resp.body()) \ "id").map(_.toInt)
      .getOrElse(throw new IllegalStateException(
        s"register response for '$subject' has no id: ${resp.body().take(200)}"))
  }

  /** `GET /subjects` — all registered subject names. */
  def listSubjects(baseUrl: String): Seq[String] =
    graft.util.Jsons.parse(get(s"$baseUrl/subjects")) match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case other => throw new IllegalStateException(s"unexpected /subjects response: $other")
    }

  /** Confluent allows '/', spaces, '#' in subject names — path segments
    * must be percent-encoded or the request resolves to the wrong path. */
  private def enc(segment: String): String =
    java.net.URLEncoder.encode(segment, "UTF-8").replace("+", "%20")

  /** Fetch one schema by subject+version (the reference's
    * subject/version/id addressing; version defaults to `latest`). */
  def fetchSchema(baseUrl: String, subject: String, version: String = "latest"): RegistrySchema =
    parseResponse(get(s"$baseUrl/subjects/${enc(subject)}/versions/${enc(version)}"), subject)

  /** Fetch one schema by registry id (`GET /schemas/ids/{id}`). */
  def fetchSchemaById(baseUrl: String, id: Int): RegistrySchema =
    parseResponse(get(s"$baseUrl/schemas/ids/$id"), s"id-$id")

  private[rules] def parseResponse(body: String, fallbackSubject: String): RegistrySchema = {
    val j = graft.util.Jsons.parse(body)
    import graft.util.Jsons.{str, dbl, arr}
    val schema = str(j \ "schema").getOrElse(
      throw new IllegalStateException("registry response has no 'schema' field"))
    val refs = arr(j \ "references").flatMap { r =>
      str(r \ "subject").map(s => (
        str(r \ "name").getOrElse(s), s, dbl(r \ "version").map(_.toInt).getOrElse(1)))
    }
    RegistrySchema(
      str(j \ "subject").getOrElse(fallbackSubject),
      dbl(j \ "version").map(_.toInt).getOrElse(1),
      // Confluent omits schemaType for AVRO (the registry default)
      str(j \ "schemaType").getOrElse("AVRO"),
      schema, refs)
  }

  /** Schema document → generation specs + constraint rules, dispatched on
    * the registry's schemaType. `importTexts` supplies referenced schema
    * texts for protobuf imports (resolved from `references` by
    * [[importSubject]]). */
  def toImported(rs: RegistrySchema, importTexts: Seq[String] = Nil): Imported =
    rs.schemaType.toUpperCase match {
      case "AVRO" =>
        val imp = AvroSchema.parse(rs.schema)
        Imported(rs.subject, imp.specs, imp.rules, imp.nullable)
      case "JSON" =>
        val p = JsonSchema.parse(rs.schema)
        Imported(rs.subject, JsonSchema.toFieldSpecs(p), JsonSchema.toRules(p), Map.empty)
      case "PROTOBUF" =>
        // the reference supports ONLY protobuf here (ProtobufParser over the
        // registry's primary schema format); [[Proto3Schema]] parses the
        // schema text from scratch, imports resolved via references
        val (specs, nullable) = Proto3Schema.toSpecs(Proto3Schema.parse(rs.schema, importTexts))
        Imported(rs.subject, specs, Nil, nullable)
      case other =>
        throw new IllegalArgumentException(
          s"subject '${rs.subject}': registry schema type '$other' not supported " +
            "(AVRO, JSON, PROTOBUF are)")
    }

  /** One-call convenience: fetch + convert, resolving protobuf schema
    * references through the registry (one extra GET per referenced
    * subject, transitively). */
  def importSubject(baseUrl: String, subject: String, version: String = "latest"): Imported = {
    val rs = fetchSchema(baseUrl, subject, version)
    val imports = scala.collection.mutable.LinkedHashMap[String, String]()
    def resolve(refs: Seq[(String, String, Int)]): Unit = refs.foreach {
      case (_, refSubject, refVersion) if !imports.contains(refSubject) =>
        val r = fetchSchema(baseUrl, refSubject, refVersion.toString)
        imports(refSubject) = r.schema
        resolve(r.references)
      case _ => ()
    }
    resolve(rs.references)
    toImported(rs, imports.values.toSeq)
  }
}
