package graft.rules

import graft.SparkSuite
import graft.generator._
import org.apache.spark.sql.functions._

class OpenApiJsonSchemaSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private val userSchema =
    """{
      |  "$schema": "http://json-schema.org/draft-07/schema#",
      |  "type": "object",
      |  "required": ["id", "email", "status"],
      |  "properties": {
      |    "id": {"type": "integer", "minimum": 1, "maximum": 99999},
      |    "email": {"type": "string", "format": "email"},
      |    "status": {"enum": ["active", "inactive", "pending"]},
      |    "score": {"type": "number", "minimum": 0, "maximum": 1},
      |    "username": {"type": "string", "minLength": 3, "maxLength": 12},
      |    "code": {"type": "string", "pattern": "[A-Z]{2}-[0-9]{4}"},
      |    "tags": {"type": "array", "items": {"type": "string"}, "minItems": 1, "maxItems": 4},
      |    "address": {
      |      "type": "object",
      |      "required": ["city"],
      |      "properties": {
      |        "city": {"type": "string", "minLength": 2},
      |        "zip": {"type": "string", "pattern": "[0-9]{5}"}
      |      }
      |    },
      |    "ref_status": {"$ref": "#/definitions/Status"}
      |  },
      |  "definitions": {"Status": {"enum": ["ok", "bad"]}}
      |}""".stripMargin

  test("JSON schema → generated data validates against the SAME schema's rules") {
    val parsed = JsonSchema.parse(userSchema)
    val specs = JsonSchema.toFieldSpecs(parsed)
    assert(specs.map(_.name).toSet == Set(
      "id", "email", "status", "score", "username", "code", "tags", "address", "ref_status"))
    // structure: nested object became a StructSpec, array an ArraySpec
    assert(specs.collect { case st: StructSpec => st.children.map(_.name) }.head
      .toSet == Set("city", "zip"))
    assert(specs.exists(_.isInstanceOf[ArraySpec]))

    val df = Generator.generate(s, 500, specs, seed = 11L).cache()
    val rules = JsonSchema.toRules(parsed)
    assert(rules.nonEmpty)
    val results = RuleEngine.validateAll(df, rules)
    val failed = results.filterNot(_.success)
    assert(failed.isEmpty, s"schema-generated data failed its own rules: ${failed.map(_.rule)}")
    // spot semantics beyond the round-trip
    assert(df.where(!col("status").isin("active", "inactive", "pending")).isEmpty)
    assert(df.where(col("ref_status").isin("ok", "bad")).count() == 500) // $ref resolved
    assert(df.where(col("address.city").isNull).isEmpty)
    assert(df.select(max(size(col("tags")))).head().getInt(0) <= 4)
    df.unpersist()
  }

  test("JSON schema rules catch out-of-contract data") {
    val parsed = JsonSchema.parse(userSchema)
    val rules = JsonSchema.toRules(parsed)
    import graft.SharedSpark.spark.implicits._
    val bad = Seq(
      (0L, "not-an-email", "unknown", 2.0, "ab", "xx-0000", Seq.empty[String])
    ).toDF("id", "email", "status", "score", "username", "code", "tags")
      .withColumn("address", struct(lit(null).cast("string").as("city"), lit("123").as("zip")))
      .withColumn("ref_status", lit("nope"))
    val failures = RuleEngine.validateAll(bad, rules).filterNot(_.success)
    // id minimum, status enum, score max, username minLength, code pattern,
    // tags minItems, address.city required, address.zip pattern, ref enum
    assert(failures.size >= 8, failures.map(_.rule).toString)
  }

  test("allOf merges branches; oneOf narrows to the first") {
    val schema =
      """{"type":"object","properties":{
        |  "merged": {"allOf": [
        |     {"type":"integer","minimum":5},
        |     {"maximum":10}
        |  ]},
        |  "either": {"oneOf": [
        |     {"type":"string","pattern":"[a-c]{3}"},
        |     {"type":"integer"}
        |  ]}
        |}}""".stripMargin
    val specs = JsonSchema.toFieldSpecs(JsonSchema.parse(schema))
    val byName = specs.map(x => x.name -> x).toMap
    assert(byName("merged") == IntField("merged", 5, 10))
    assert(byName("either") == RegexField("either", "[a-c]{3}"))
  }

  test("OpenAPI: operations parsed, body schema round-trips through generation") {
    val doc =
      """openapi: 3.0.0
        |info: {title: pets, version: "1.0"}
        |servers:
        |  - url: "https://{env}.example.com/v1"
        |    variables: {env: {default: api}}
        |paths:
        |  /pets/{petId}:
        |    get:
        |      parameters:
        |        - {name: petId, in: path, schema: {type: integer, minimum: 1}}
        |        - {name: verbose, in: query, schema: {type: boolean}}
        |    post:
        |      requestBody:
        |        content:
        |          application/json:
        |            schema: {"$ref": "#/components/schemas/Pet"}
        |components:
        |  schemas:
        |    Pet:
        |      type: object
        |      required: [name]
        |      properties:
        |        name: {type: string, minLength: 1, maxLength: 30}
        |        kind: {enum: [cat, dog, fish]}
        |        age: {type: integer, minimum: 0, maximum: 30}
        |""".stripMargin
    val ops = OpenApi.parse(doc)
    assert(ops.size == 2)
    val get = ops.find(_.method == "GET").get
    assert(get.url == "https://api.example.com/v1/pets/{petId}")
    assert(get.paramFields.map(_.name).toSet == Set("pathParampetId", "queryParamverbose"))
    assert(get.bodyFields.isEmpty)

    val post = ops.find(_.method == "POST").get
    assert(post.bodyFields.map(_.name).toSet == Set("name", "kind", "age"))
    // generate request bodies from the spec and validate them against it
    val df = Generator.generate(s, 200, post.bodyFields, seed = 5L)
    val failed = RuleEngine.validateAll(df, post.bodyRules).filterNot(_.success)
    assert(failed.isEmpty, failed.map(_.rule).toString)
    assert(df.where(!col("kind").isin("cat", "dog", "fish")).isEmpty)
  }

  test("OpenAPI: per-row url field renders path + styled query params") {
    val doc =
      """openapi: 3.0.0
        |info: {title: t, version: "1.0"}
        |servers:
        |  - url: "http://h/api"
        |paths:
        |  /users/{uid}/posts:
        |    get:
        |      parameters:
        |        - {name: uid, in: path, schema: {type: integer, minimum: 7, maximum: 7}}
        |        - name: tags
        |          in: query
        |          style: form
        |          explode: false
        |          schema: {type: array, items: {enum: [x]}, minItems: 2, maxItems: 2}
        |""".stripMargin
    val op = OpenApi.parse(doc).head
    assert(op.urlSql.nonEmpty)
    // generate the param fields, add the computed url (the importer's SQL
    // is plain generator sql — same computed-column stage as any field)
    val df = Generator.generate(s, 3,
      op.paramFields :+ graft.generator.SqlField("url", op.urlSql), seed = 9L)
    val urls = df.select("url").collect().map(_.getString(0)).distinct
    assert(urls.sameElements(Array("http://h/api/users/7/posts?tags=x,x")), urls.mkString(","))
  }

  test("OpenAPI url field: $ref arrays, dotted names, explode defaults like the reference") {
    def doc(explodeLine: String) =
      s"""openapi: 3.0.0
         |info: {title: t, version: "1.0"}
         |servers:
         |  - url: "http://h"
         |paths:
         |  /q:
         |    get:
         |      parameters:
         |        - name: tags
         |          in: query
         |          style: pipeDelimited
         |$explodeLine
         |          schema: {"$$ref": "#/components/schemas/TagList"}
         |        - name: filter.name
         |          in: query
         |          schema: {enum: [z]}
         |components:
         |  schemas:
         |    TagList: {type: array, items: {enum: [x]}, minItems: 2, maxItems: 2}
         |""".stripMargin
    def urls(d: String) = {
      val op = OpenApi.parse(d).head
      Generator.generate(s, 2, op.paramFields :+ graft.generator.SqlField("url", op.urlSql),
        seed = 3L).select("url").collect().map(_.getString(0)).distinct
    }
    // explode: false → collapsed with the declared pipe delimiter; the
    // $ref'd array resolves to array-ness and the dotted param name stays
    // one column reference
    val collapsed = urls(doc("          explode: false"))
    assert(collapsed.sameElements(Array("http://h/q?tags=x|x&filter.name=z")),
      collapsed.mkString(","))
    // explode OMITTED → exploded, the REFERENCE's default for every style
    // (OpenAPIConverter.scala:86 / TaskBuilder.scala:1881), deliberately
    // NOT the OpenAPI spec's style-dependent default
    val exploded = urls(doc("          # explode omitted"))
    assert(exploded.sameElements(Array("http://h/q?tags=x&tags=x&filter.name=z")),
      exploded.mkString(","))
  }
}
