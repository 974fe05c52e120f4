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

  test("preFilterExpr: validation applies only to matching rows (row + aggregate)") {
    val yaml =
      """name: "pref"
        |dataSources:
        |  parquet:
        |    - options: {}
        |      validations:
        |        - field: amount
        |          preFilterExpr: "status = 'open'"
        |          validation:
        |            - {type: between, min: 0, max: 100}
        |            - {type: sumBetween, min: 1, max: 150}
        |""".stripMargin
    val sv = LegacyValidation.parse(yaml).head
    // the filtered row rule lives in its preFilter GROUP (so fractional
    // thresholds divide by the filtered count), not among the plain rules
    assert(sv.rules.isEmpty && sv.filteredRules.size == 1)
    assert(sv.filteredRules.head._1 == "status = 'open'" && sv.filteredRules.head._2.size == 1)
    import graft.SharedSpark.spark.implicits._
    // closed rows violate both bounds — but the pre-filter excludes them
    val df = Seq(("open", 50.0), ("open", 70.0), ("closed", 9999.0), ("closed", -5.0))
      .toDF("status", "amount")
    val results = LegacyValidation.validate(df, sv)
    assert(results.forall(_.success), results.filterNot(_.success).map(_.rule).toString)
    // threshold denominator = FILTERED rows: 1 violation / 2 open rows =
    // 0.5 > 0.4 → fails even though 1/4 of ALL rows would pass the bar
    val dfMixed = Seq(("open", 50.0), ("open", 9999.0), ("closed", 1.0), ("closed", 2.0))
      .toDF("status", "amount")
    val r = LegacyValidation.validate(dfMixed, sv, threshold = 0.4)
      .find(_.rule == "amount_between").get
    assert(r.total == 2 && r.errors == 1 && !r.success)
    // without the filter the same data fails
    val noPre = LegacyValidation.parse(
      yaml.linesIterator.filterNot(_.contains("preFilterExpr")).mkString("\n")).head
    assert(LegacyValidation.validate(df, noPre).exists(!_.success))
  }

  test("rate/duration/pattern counts: volume = integral of the declared rate") {
    import graft.plan.LegacyPlan
    val taskYaml =
      """name: t
        |steps:
        |  - name: "by_rate"
        |    count: {rate: 50, duration: "30s"}
        |    fields: [{name: v, type: integer}]
        |  - name: "by_pattern"
        |    count:
        |      duration: "10s"
        |      pattern: {type: ramp, startRate: 10, endRate: 110}
        |    fields: [{name: v, type: integer}]
        |""".stripMargin
    val tasks = LegacyPlan.parseTaskFile(taskYaml)
    assert(tasks.find(_.name == "by_rate").get.count == 1500L) // 50/s × 30s
    assert(math.abs(tasks.find(_.name == "by_pattern").get.count - 600L) <= 1) // mean 60 × 10s
    assert(LegacyPlan.durationSeconds("5m") == 300.0 && LegacyPlan.durationSeconds("2h") == 7200.0)
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

  test("grammar breadth: global agg, item-list groupBy, upstream join, fieldNameType, empty") {
    import graft.SharedSpark.spark.implicits._
    val upstreamPath = java.nio.file.Files.createTempDirectory("graft_upstream").toString + "/accounts"
    Seq(("A1", 100.0), ("A2", 50.0)).toDF("account_id", "balance")
      .write.parquet(upstreamPath)
    val yaml =
      s"""name: breadth
         |dataSources:
         |  json:
         |    - options: {}
         |      validations:
         |        - {}
         |        - aggType: "count"
         |          aggExpr: "count == 4"
         |        - groupByFields: []
         |          aggType: "sum"
         |          aggField: "amount"
         |          validation:
         |            - {type: equal, value: 180.0}
         |        - fieldNameType: "fieldCountEqual"
         |          count: "2"
         |        - upstreamDataSource: "accounts"
         |          upstreamReadOptions: {path: "$upstreamPath"}
         |          joinFields: ["account_id"]
         |          joinType: "inner"
         |          validation:
         |            - expr: "amount <= accounts_balance"
         |""".stripMargin
    val sv = LegacyValidation.parse(yaml).head
    // the reference's sample shapes: empty entries skip; 5 declared →
    // 4 real checks (1 row-less global agg + item-list agg + names + upstream)
    assert(sv.entries.map(e => e.rules.size + e.datasetChecks.size).sum == 4)
    val df = Seq(("A1", 60.0), ("A1", 40.0), ("A2", 30.0), ("A2", 50.0))
      .toDF("account_id", "amount")
    val results = LegacyValidation.validateEntries(df, sv.entries)
    assert(results.size == 4 && results.forall(_.success),
      results.filterNot(_.success).map(_.rule).toString)
    // upstream prefix-rename + join is the real thing: violate it
    val bad = Seq(("A2", 51.0)).toDF("account_id", "amount") // > A2's 50 balance
    val r2 = LegacyValidation.validateEntries(bad, sv.entries)
    assert(!r2.find(_.rule == "upstream_accounts").get.success)
    // global count now 1 != 4 → fails too
    assert(!r2.find(_.rule.startsWith("groupby__count")).get.success ||
      r2.count(!_.success) >= 2)
  }

  test("per-validation errorThreshold: entry-level and item-level tolerances honored") {
    // reference sample/validation/simple/simple-validation.yaml carries
    // errorThreshold both on expr ENTRIES and inside field validation ITEMS;
    // mixed tolerances must still evaluate in one pass with each applied
    val yaml =
      """name: th
        |dataSources:
        |  json:
        |    - options: {}
        |      validations:
        |        - field: amount
        |          validation:
        |            - {type: between, min: 1, max: 10, errorThreshold: 2}
        |            - {type: "null", negate: true}
        |        - expr: "amount < 100"
        |          errorThreshold: 0.5
        |        - expr: "amount != 42"
        |""".stripMargin
    val sv = LegacyValidation.parse(yaml).head
    // 10 rows: two out of [1,10] (50, 42) → between has 2 errors (<=2 OK);
    // amount<100 has 0 errors; amount!=42 has 1 error and NO tolerance
    val df = ((1 to 8).map(_.toDouble) ++ Seq(50.0, 42.0)).toDF("amount")
    val byName = LegacyValidation.validateEntries(df, sv.entries).map(r => r.rule -> r).toMap
    assert(byName("amount_between").success && byName("amount_between").errors == 2)
    assert(!byName.filter(_._1.startsWith("expr_")).values.forall(_.success)) // the 42 rule
    // entry-level fractional threshold: 4/10 rows over 100 stays under 0.5
    val df2 = ((1 to 6).map(_.toDouble) ++ Seq(150.0, 200.0, 300.0, 400.0)).toDF("amount")
    val r2 = LegacyValidation.validateEntries(df2, sv.entries)
    val exprRules = r2.filter(_.rule.startsWith("expr_"))
    assert(exprRules.exists(r => r.errors == 4 && r.success)) // amount<100 @ 0.5
    // a third error on the item-level count threshold breaks it
    val df3 = ((1 to 7).map(_.toDouble) ++ Seq(50.0, 60.0, 70.0)).toDF("amount")
    val r3 = LegacyValidation.validateEntries(df3, sv.entries).map(r => r.rule -> r).toMap
    assert(!r3("amount_between").success && r3("amount_between").errors == 3)
  }
}
