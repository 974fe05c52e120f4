package graft.rules

import graft.SparkSuite

class GreatExpectationsSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private lazy val df = Seq(
    (1L, "alice", 30, "a@b.com", "open"),
    (2L, "bob", 17, "bob@example.org", "closed"),
    (3L, "carol", 200, "not-an-email", "open"),
    (4L, "dave", 45, "d@e.io", "pending"),
  ).toDF("id", "name", "age", "email", "status")

  private val suiteJson =
    """{
      |  "expectation_suite_name": "accounts",
      |  "expectations": [
      |    {"expectation_type": "expect_column_values_to_not_be_null",
      |     "kwargs": {"column": "name"}},
      |    {"expectation_type": "expect_column_values_to_be_between",
      |     "kwargs": {"column": "age", "min_value": 0, "max_value": 120}},
      |    {"expectation_type": "expect_column_values_to_match_regex",
      |     "kwargs": {"column": "email", "regex": "^[A-Za-z0-9.@-]+@[a-z.]+$"}},
      |    {"expectation_type": "expect_column_values_to_be_in_set",
      |     "kwargs": {"column": "status", "value_set": ["open", "closed", "pending"]}},
      |    {"expectation_type": "expect_column_values_to_be_unique",
      |     "kwargs": {"column": "id"}},
      |    {"expectation_type": "expect_column_mean_to_be_between",
      |     "kwargs": {"column": "age", "min_value": 0, "max_value": 100}},
      |    {"expectation_type": "expect_column_distinct_values_to_contain_set",
      |     "kwargs": {"column": "status", "value_set": ["open", "closed"]}},
      |    {"expectation_type": "expect_column_to_exist", "kwargs": {"column": "email"}},
      |    {"expectation_type": "expect_table_row_count_to_be_between",
      |     "kwargs": {"min_value": 1, "max_value": 1000}},
      |    {"expectation_type": "expect_column_values_to_be_fancy_unicorns",
      |     "kwargs": {"column": "id"}}
      |  ]
      |}""".stripMargin

  test("GX suite imports: row rules in one pass, dataset checks, unknown types skipped") {
    val imported = GreatExpectations.importSuite(GreatExpectations.parseSuite(suiteJson))
    assert(imported.rules.size == 4)
    assert(imported.checks.size == 5)
    assert(imported.skipped == Seq("expect_column_values_to_be_fancy_unicorns"))

    val results = GreatExpectations.validateSuite(df, suiteJson)
    val byName = results.map(r => r.rule -> r).toMap
    assert(!byName("age_between").success && byName("age_between").errors == 1) // age 200
    assert(!byName("email_matches").success && byName("email_matches").errors == 1)
    assert(byName("name_notnull").success)
    assert(byName("status_in").success)
    assert(byName("id_unique").success)
    assert(byName("age_mean").success)     // mean = 73 within [0,100]
    assert(byName("status_distinct_contains").success)
    assert(byName("email_exists").success && byName("row_count").success)
    assert(byName("skipped_expect_column_values_to_be_fancy_unicorns").success)
    // error samples flow through for failed row rules
    assert(byName("age_between").samples.head("id") == 3L)
  }

  test("GX edge cases: null one-sided bounds, real-world type names, bad kwargs skipped") {
    val edgeSuite =
      """{"expectations": [
        |  {"expectation_type": "expect_column_values_to_be_between",
        |   "kwargs": {"column": "age", "min_value": null, "max_value": 120}},
        |  {"expectation_type": "expect_column_values_to_be_of_type",
        |   "kwargs": {"column": "name", "type_": "StringType"}},
        |  {"expectation_type": "expect_column_values_to_be_of_type",
        |   "kwargs": {"column": "age", "type_": "int64"}},
        |  {"expectation_type": "expect_table_row_count_to_be_between",
        |   "kwargs": {"min_value": 1}},
        |  {"expectation_type": "expect_column_values_to_be_between",
        |   "kwargs": {"column": "age", "min_value": "not-a-number", "max_value": 5}}
        |]}""".stripMargin
    val imported = GreatExpectations.importSuite(GreatExpectations.parseSuite(edgeSuite))
    // the bad-bounds expectation is skipped; the rest import
    assert(imported.skipped == Seq("expect_column_values_to_be_between"))
    val results = GreatExpectations.validateSuite(df, edgeSuite)
    val byName = results.map(r => r.rule -> r).toMap
    assert(!byName("age_lt").success && byName("age_lt").errors == 1) // age 200 > 120
    assert(byName("name_hastypes").success) // StringType → string
    assert(byName("age_hastypes").success)  // int64 → {int,bigint,...}
    assert(byName("row_count").success)     // one-sided min
  }
}
