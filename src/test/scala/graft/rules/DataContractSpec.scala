package graft.rules

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DataContractSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private val contractYaml =
    """name: accounts
      |schema:
      |  - name: account
      |    properties:
      |      - name: account_id
      |        logicalType: string
      |        required: true
      |        unique: true
      |        logicalTypeOptions:
      |          pattern: "ACC[0-9]{6}"
      |      - name: balance
      |        logicalType: number
      |        required: true
      |        logicalTypeOptions:
      |          minimum: 0
      |          maximum: 10000
      |      - name: age
      |        logicalType: integer
      |        logicalTypeOptions:
      |          minimum: 18
      |          maximum: 90
      |      - name: note
      |        logicalType: string
      |        logicalTypeOptions:
      |          minLength: 1
      |          maxLength: 32
      |""".stripMargin

  test("contract → rules: violations found, one projection, error samples") {
    val df = Seq(
      ("ACC000001", 100.0, 30, "fine"),
      ("BAD", 100.0, 30, "fine"),           // pattern violation
      ("ACC000002", -5.0, 30, "fine"),      // balance below minimum
      ("ACC000003", 100.0, 17, "fine"),     // age below minimum
      ("ACC000003", 100.0, 30, "fine"),     // duplicate account_id
    ).toDF("account_id", "balance", "age", "note")
    val results = DataContract.validate(df, contractYaml)
    val byName = results.map(r => r.rule -> r).toMap
    assert(byName("account_id_matches").errors == 1)
    assert(byName("balance_between").errors == 1)
    assert(byName("age_between").errors == 1)
    assert(!byName("account_id_unique").success)
    assert(byName("note_lenbetween").success)
    assert(byName("account_id_matches").samples.head("account_id") == "BAD")
  }

  test("contract → generator specs: generated data satisfies the contract") {
    val c = DataContract.parse(contractYaml)
    val specs = DataContract.toFieldSpecs(c)
    val generated = graft.generator.Generator.generate(spark, 2000L, specs, seed = 6L)
    assert(generated.where(!col("account_id").rlike("^ACC[0-9]{6}$")).count() == 0)
    assert(generated.where(!col("balance").between(0.0, 10000.0)).count() == 0)
    assert(generated.where(!col("age").between(18, 90)).count() == 0)
    // the round trip: contract rules all pass on contract-generated data
    val results = DataContract.validate(generated, contractYaml)
    results.filterNot(_.rule == "account_id_unique") // regex ids may repeat
      .foreach(r => assert(r.success, s"${r.rule}: ${r.errors}/${r.total}"))
  }

  test("one-sided bounds: rules enforce them and generated data still satisfies them") {
    val oneSided =
      """name: onesided
        |schema:
        |  - name: t
        |    properties:
        |      - name: price
        |        logicalType: number
        |        logicalTypeOptions: {minimum: 100}
        |      - name: code
        |        logicalType: string
        |        logicalTypeOptions: {minLength: 30}
        |      - name: qty
        |        logicalType: integer
        |        logicalTypeOptions: {maximum: 5}
        |""".stripMargin
    val c = DataContract.parse(oneSided)
    // rules exist for every one-sided bound
    val bad = Seq((50.0, "x", 9L)).toDF("price", "code", "qty")
    val results = DataContract.validate(bad, oneSided).map(r => r.rule -> r.success).toMap
    assert(results == Map("price_gt" -> false, "code_lenbetween" -> false, "qty_lt" -> false))
    // generation honors the open side (no inverted ranges)
    val gen = graft.generator.Generator.generate(spark, 500L, DataContract.toFieldSpecs(c), seed = 2L)
    DataContract.validate(gen, oneSided)
      .foreach(r => assert(r.success, s"${r.rule}: ${r.errors}/${r.total}"))
  }

  test("ODCS v2 dataset/columns layout parses (the reference's full-example fixture)") {
    val p = java.nio.file.Paths.get(
      "/root/reference/app/src/test/resources/sample/metadata/odcs/full-example.odcs.yaml")
    assume(java.nio.file.Files.exists(p), "reference checkout not present")
    val c = DataContract.parse(java.nio.file.Files.readString(p))
    // v2: dataset[].columns[] with column/logicalType/isNullable
    assert(c.properties.size == 3)
    assert(c.properties.map(_.name).contains("txn_ref_dt"))
    // isNullable:false → required; generation + rules round-trip
    val rules = DataContract.toRules(c)
    assert(rules.nonEmpty)
    val df = graft.generator.Generator.generate(spark, 100, DataContract.toFieldSpecs(c), seed = 3L)
    assert(RuleEngine.validateAll(df, rules).forall(_.success))
  }
}
