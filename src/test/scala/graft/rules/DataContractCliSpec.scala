package graft.rules

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Data Contract CLI importer: parse → generate → validate, including the
  * reference's own sample contract file (read from the reference checkout
  * when present — nothing is copied into this repo).
  */
class DataContractCliSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private val contractYaml =
    """dataContractSpecification: 0.9.3
      |id: orders_contract
      |info:
      |  title: Orders
      |servers:
      |  local-parquet:
      |    type: local
      |    path: /tmp/graft_dc_out
      |    format: parquet
      |models:
      |  orders:
      |    fields:
      |      order_id:
      |        type: long
      |        primary: true
      |        required: true
      |      status:
      |        type: string
      |        enum: [placed, shipped, returned]
      |      qty:
      |        type: int
      |        minimum: 1
      |        maximum: 99
      |        required: true
      |      ref:
      |        type: string
      |        pattern: "ord-[0-9]{6}"
      |      note:
      |        type: string
      |        minLength: 3
      |        maxLength: 12
      |      placed_at:
      |        type: timestamp_ntz
      |      shipping:
      |        type: object
      |        fields:
      |          city: {type: string}
      |          zip: {type: string, pattern: "[0-9]{5}"}
      |      tags:
      |        type: array
      |        items: {type: string, enum: [a, b, c]}
      |""".stripMargin

  test("contract parses; generated data satisfies the contract's own rules") {
    assert(DataContractCli.detect(contractYaml))
    assert(!DataContractCli.detect("""{"openapi": "3.0"}"""))
    val c = DataContractCli.parse(contractYaml)
    assert(c.id == "orders_contract")
    val m = c.models.head
    assert(m.name == "orders" && m.specs.size == 8)
    assert(DataContractCli.fileServer(c).contains(("/tmp/graft_dc_out", "parquet")))

    val df = DataContractCli.generate(s, c, 400, seed = 9L)("orders")
    assert(df.count() == 400)
    // typed + constrained generation: enum, range, regex, nested, array
    assert(df.where(!col("status").isin("placed", "shipped", "returned")).isEmpty)
    assert(df.where(col("qty") < 1 || col("qty") > 99).isEmpty)
    assert(df.where(!col("ref").rlike("^ord-[0-9]{6}$")).isEmpty)
    assert(df.where(!col("shipping.zip").rlike("^[0-9]{5}$")).isEmpty)
    assert(df.select(explode(col("tags")).as("t"))
      .where(!col("t").isin("a", "b", "c")).isEmpty)
    // primary → unique; rules + uniqueness checks all pass in validate()
    assert(df.select("order_id").distinct().count() == 400)
    val results = DataContractCli.validate(df, m)
    assert(results.nonEmpty && results.forall(_.success),
      results.filterNot(_.success).map(_.rule).toString)
  }

  test("the reference's sample datacontract.yaml imports and runs") {
    val p = java.nio.file.Paths.get(
      "/root/reference/app/src/test/resources/sample/metadata/datacontractcli/datacontract.yaml")
    assume(java.nio.file.Files.exists(p), "reference checkout not present")
    val c = DataContractCli.parse(java.nio.file.Files.readString(p))
    assert(c.id == "covid_cases")
    val m = c.models.find(_.name == "covid_cases").get
    assert(m.specs.size == 9) // fips..combined_key
    // s3 server block surfaces as a (location, format) target
    assert(DataContractCli.fileServer(c).exists(_._2 == "json"))
    val df = DataContractCli.generate(s, c, 100)("covid_cases")
    assert(df.count() == 100)
    assert(df.schema("confirmed").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("last_update").dataType == org.apache.spark.sql.types.TimestampType)
  }
}
