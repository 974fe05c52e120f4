package graft.rules

import graft.SparkSuite
import graft.generator._
import org.apache.spark.sql.functions._

class AvroSchemaSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private val avsc =
    """{
      |  "type": "record",
      |  "name": "Account",
      |  "namespace": "com.example",
      |  "fields": [
      |    {"name": "account_id", "type": "string"},
      |    {"name": "balance", "type": "double"},
      |    {"name": "age_days", "type": "int"},
      |    {"name": "nickname", "type": ["null", "string"]},
      |    {"name": "status", "type": {"type": "enum", "name": "Status",
      |       "symbols": ["OPEN", "CLOSED", "SUSPENDED"]}},
      |    {"name": "opened", "type": {"type": "int", "logicalType": "date"}},
      |    {"name": "updated", "type": {"type": "long", "logicalType": "timestamp-millis"}},
      |    {"name": "checksum", "type": {"type": "fixed", "name": "MD5", "size": 16}},
      |    {"name": "tags", "type": {"type": "array", "items": "string"}},
      |    {"name": "owner", "type": {"type": "record", "name": "Owner", "fields": [
      |       {"name": "name", "type": "string"},
      |       {"name": "vip", "type": "boolean"}
      |    ]}},
      |    {"name": "prev_status", "type": ["null", "Status"]}
      |  ]
      |}""".stripMargin

  test("avsc → field specs + rules: generated data validates against its own schema") {
    val imported = AvroSchema.parse(avsc)
    assert(imported.specs.size == 11)
    val byName = imported.specs.map(x => x.name -> x).toMap
    assert(byName("status").isInstanceOf[OneOfField])
    assert(byName("opened").isInstanceOf[DateField])
    assert(byName("updated").isInstanceOf[TimestampField])
    assert(byName("checksum") == RegexField("checksum", "[0-9a-f]{32}"))
    assert(byName("tags").isInstanceOf[ArraySpec])
    assert(byName("owner").asInstanceOf[StructSpec].children.map(_.name) == Seq("name", "vip"))
    // named-type reference resolved through the union
    assert(byName("prev_status").isInstanceOf[OneOfField])
    // nullability recorded only for the union-with-null fields
    assert(imported.nullable.keySet == Set("nickname", "prev_status"))

    val df = Generator.generate(s, 300, imported.specs, seed = 3L,
      nullProb = imported.nullable).cache()
    val results = RuleEngine.validateAll(df, imported.rules)
    val failed = results.filterNot(_.success)
    assert(failed.isEmpty, failed.map(_.rule).toString)
    // null hints actually produce nulls on nullable fields only
    assert(df.where(col("nickname").isNull).count() > 0)
    assert(df.where(col("account_id").isNull).isEmpty)
    assert(df.where(!col("status").isin("OPEN", "CLOSED", "SUSPENDED")).isEmpty)
    assert(df.where(length(col("checksum")) =!= 32).isEmpty)
    df.unpersist()
  }

  test("non-record top level is rejected") {
    intercept[IllegalArgumentException](AvroSchema.parse("""{"type": "string"}"""))
  }
}
