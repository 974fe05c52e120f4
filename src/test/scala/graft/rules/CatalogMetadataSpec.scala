package graft.rules

import graft.SparkSuite
import graft.generator._
import org.apache.spark.sql.functions._

class CatalogMetadataSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark
  import graft.SharedSpark.spark.implicits._

  test("OpenLineage dataset document → typed field specs → generated frame") {
    // Marquez GET /namespaces/{ns}/datasets response shape
    val json =
      """{
        |  "datasets": [
        |    {"id": {"namespace": "food_delivery", "name": "public.orders"},
        |     "fields": [
        |       {"name": "order_id", "type": "BIGINT", "tags": [], "description": "pk"},
        |       {"name": "amount", "type": "DECIMAL(10,2)", "tags": []},
        |       {"name": "placed_at", "type": "TIMESTAMP", "tags": []},
        |       {"name": "delivered", "type": "BOOLEAN", "tags": []},
        |       {"name": "note", "type": "VARCHAR(255)", "tags": []}
        |     ]}
        |  ],
        |  "totalCount": 1
        |}""".stripMargin
    val ds = OpenLineage.parse(json)
    assert(ds.size == 1 && ds.head.namespace == "food_delivery" && ds.head.name == "public.orders")
    val byName = ds.head.specs.map(f => f.name -> f).toMap
    assert(byName("order_id").isInstanceOf[IntField])
    assert(byName("amount").isInstanceOf[DoubleField]) // DECIMAL(10,2) parsed past the paren
    assert(byName("placed_at").isInstanceOf[TimestampField])
    assert(byName("note").isInstanceOf[AlphaNumField])
    val df = Generator.generate(s, 100, ds.head.specs, seed = 2L)
    assert(df.columns.toSet == Set("order_id", "amount", "placed_at", "delivered", "note"))
    assert(df.count() == 100)
  }

  test("OpenMetadata test cases → rules + dataset checks (param-key dispatch)") {
    // OpenMetadata /dataQuality/testCases response shape
    val json =
      """{"data": [
        |  {"name": "amount_between", "entityLink": "<#E::table::db.orders::columns::amount>",
        |   "parameterValues": [{"name": "minValue", "value": "0"}, {"name": "maxValue", "value": "500"}]},
        |  {"name": "status_allowed", "entityLink": "<#E::table::db.orders::columns::status>",
        |   "parameterValues": [{"name": "allowedValues", "value": "open,closed"}]},
        |  {"name": "id_unique", "entityLink": "<#E::table::db.orders::columns::id>",
        |   "parameterValues": [{"name": "fieldValuesToBeUnique", "value": "true"}]},
        |  {"name": "row_count", "entityLink": "<#E::table::db.orders>",
        |   "parameterValues": [{"name": "minValue", "value": "2"}, {"name": "maxValue", "value": "100"}]},
        |  {"name": "mean_check", "entityLink": "<#E::table::db.orders::columns::amount>",
        |   "parameterValues": [{"name": "minValueForMeanInCol", "value": "50"}, {"name": "maxValueForMeanInCol", "value": "200"}]},
        |  {"name": "custom_sql", "entityLink": "<#E::table::db.orders>",
        |   "parameterValues": [{"name": "sqlExpression", "value": "amount >= 0"}]}
        |]}""".stripMargin
    val imported = OpenMetadata.parse(json)
    // amount bounds (2 rules) + allowedValues + sql = 4 row rules
    assert(imported.rules.size == 4, imported.rules.map(_.name).toString)
    // unique + rowCountBetween + meanBetween = 3 dataset checks
    assert(imported.datasetChecks.size == 3, imported.datasetChecks.map(_._1).toString)

    val good = Seq((1L, 100.0, "open"), (2L, 150.0, "closed"), (3L, 80.0, "open"))
      .toDF("id", "amount", "status")
    assert(OpenMetadata.validate(good, imported).forall(_.success))

    val bad = Seq((1L, 600.0, "frozen"), (1L, -5.0, "open"))
      .toDF("id", "amount", "status")
    val failed = OpenMetadata.validate(bad, imported).filterNot(_.success).map(_.rule)
    // amount > 500, amount < 0, status not allowed, duplicate id, mean out of range
    assert(failed.size >= 4, failed.toString)
    assert(failed.exists(_.contains("unique")) && failed.exists(_.contains("mean")))
  }

  test("OpenMetadata table response → generation specs (the reference's own fixture)") {
    val p = java.nio.file.Paths.get(
      "/root/reference/app/src/test/resources/sample/metadata/openmetadata/get_table_response.json")
    assume(java.nio.file.Files.exists(p), "reference checkout not present")
    val tables = OpenMetadata.tableSpecs(java.nio.file.Files.readString(p))
    val (name, specs, rules) = tables.head
    assert(name == "dim_address" && specs.size == 12)
    // table-level PRIMARY_KEY constraint → notNull rules on its fields
    assert(rules.size == 2)
    val df = graft.generator.Generator.generate(spark, 50, specs, seed = 2L)
    assert(df.count() == 50 && df.columns.contains("address_id"))
    assert(RuleEngine.validateAll(df, rules).forall(_.success))
  }
}
