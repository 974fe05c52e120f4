package graft.rules

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The reference-native validation YAML (modeled on
  * `sample/validation/json/json-validation.yaml`) running on this engine.
  */
class LegacyValidationSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private val yaml =
    """name: "account_checks"
      |description: "Account fields went through the system correctly"
      |dataSources:
      |  json:
      |    - options:
      |        path: "/tmp/somewhere"
      |      validations:
      |        - expr: "STARTSWITH(txn_id, 'txn')"
      |        - field: account_id
      |          validation:
      |            - type: "matches"
      |              regex: "ACC[0-9]{8}"
      |            - type: "null"
      |              negate: true
      |        - field: status
      |          validation:
      |            - type: "in"
      |              values: [ "open", "closed" ]
      |            - type: "distinctInSet"
      |              values: [ "open", "closed" ]
      |        - field: amount
      |          validation:
      |            - type: "between"
      |              min: 0
      |              max: 1000
      |            - type: "meanBetween"
      |              min: 10
      |              max: 500
      |            - type: "sumBetween"
      |              min: 1
      |              max: 1000000
      |            - type: "uniqueValuesProportionBetween"
      |              min: 0.5
      |              max: 1.0
      |        - field: created
      |          validation:
      |            - type: "matchDateTimeFormat"
      |              format: "yyyy-MM-dd"
      |""".stripMargin

  private def goodDf = Seq(
    ("txn1", "ACC12345678", "open", 100.5, "2024-01-01"),
    ("txn2", "ACC87654321", "closed", 250.0, "2024-02-03"),
    ("txn3", "ACC11112222", "open", 75.25, "2024-03-05"),
  ).toDF("txn_id", "account_id", "status", "amount", "created")

  test("reference validation YAML: mixed row + aggregate types, all green on good data") {
    val svs = LegacyValidation.parse(yaml)
    assert(svs.size == 1)
    val sv = svs.head
    assert(sv.dataSource == "json" && sv.options("path") == "/tmp/somewhere")
    // 1 expr + matches + notNull + in + between + matchDateTimeFormat = 6 row rules
    assert(sv.rules.size == 6, sv.rules.map(_.name).toString)
    // distinctInSet + mean + sum + uniqueProportion = 4 dataset checks
    assert(sv.datasetChecks.size == 4, sv.datasetChecks.map(_._1).toString)

    val results = LegacyValidation.validate(goodDf, sv)
    assert(results.size == 10)
    assert(results.forall(_.success), results.filterNot(_.success).map(_.rule).toString)
  }

  test("reference validation YAML: bad data fails the right checks, with samples") {
    val bad = Seq(
      ("pay9", "BAD", "frozen", 99999.0, "01/01/2024"),
      ("txn2", "ACC87654321", "frozen", 10.0, "2024-02-03"),
    ).toDF("txn_id", "account_id", "status", "amount", "created")
    val sv = LegacyValidation.parse(yaml).head
    val byName = LegacyValidation.validate(bad, sv).map(r => r.rule -> r).toMap
    // row failures carry offending-row samples
    val matches = byName("account_id_matches")
    assert(!matches.success && matches.errors == 1 && matches.samples.nonEmpty)
    assert(!byName("status_in").success)
    assert(!byName("amount_between").success)
    assert(!byName("created_dtfmt").success || byName.keys.exists(k =>
      k.startsWith("created") && !byName(k).success))
    // dataset-level: frozen is outside the distinct set; mean blown
    assert(!byName("status_distinctInSet").success)
    assert(!byName("amount_meanBetween").success)
    // negate flips: a negated between on a failing field passes
    val negated = Rules.between("amount", 0, 1000).negate("amount_not_between")
    assert(RuleEngine.validateAll(bad.limit(1), Seq(negated)).head.success)
  }
}
