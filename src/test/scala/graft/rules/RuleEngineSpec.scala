package graft.rules

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Per-rule unit tests in the reference's style (small DF in, expected
  * pass/fail counts out — `ValidationOperationsTest`-like, SURVEY §5).
  */
class RuleEngineSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private def df = Seq(
    (1, "alice", 30, "a@b.com"),
    (2, "bob", 17, "bob at example"),
    (3, null.asInstanceOf[String], 45, "c@d.org"),
    (4, "carol", 200, ""),
    (5, "dave", -1, "e@f.io"),
  ).toDF("id", "name", "age", "contact")

  private def errors(r: Rule): Long =
    df.where(!coalesce(r.predicate, lit(false))).count()

  test("isNotNull") { assert(errors(Rules.isNotNull("name")) == 1) }
  test("between") { assert(errors(Rules.between("age", 0, 120)) == 2) }
  test("matches email") {
    assert(errors(Rules.matches("contact", "^[A-Za-z0-9.]+@[A-Za-z0-9.]+$")) == 2)
  }
  test("in") { assert(errors(Rules.in("name", Seq("alice", "bob", "carol", "dave"))) == 1) }
  test("lengthBetween") { assert(errors(Rules.lengthBetween("name", 3, 10)) == 1) }
  test("null predicate counts as error (strict-null contract)") {
    // name is null for id=3 → startsWith yields NULL → error
    assert(errors(Rules.startsWith("name", "a")) == 4)
  }

  test("annotate: first failing rule wins, canonical order") {
    val rules = Seq(
      Rules.isNotNull("name"),
      Rules.between("age", 0, 120),
      Rules.lengthBetween("contact", 1, 100))
    val out = RuleEngine.annotate(df, rules)
      .select("id", "drop_reason").as[(Int, String)].collect().toMap
    assert(out(1) == null)
    assert(out(3) == "name_notnull") // null name fails rule 1 before age check
    assert(out(4) == "age_between")  // 200 out of range; contact empty never reached
    assert(out(5) == "age_between")
  }

  test("validateAll: one pass, per-rule error counts + threshold") {
    val rules = Seq(Rules.isNotNull("name"), Rules.between("age", 0, 120))
    val rs = RuleEngine.validateAll(df, rules, threshold = 0.25)
    assert(rs.map(r => r.rule -> r.errors).toMap ==
      Map("name_notnull" -> 1L, "age_between" -> 2L))
    assert(rs.find(_.rule == "name_notnull").get.success) // 1/5 <= 0.25
    assert(!rs.find(_.rule == "age_between").get.success) // 2/5 > 0.25
  }

  test("groupBy validation: violating groups") {
    val sales = Seq(("a", 10.0), ("a", 20.0), ("b", 500.0), ("c", 5.0))
      .toDF("k", "v")
    val bad = GroupRules.groupByValidation(sales, Seq("k"), "v", "sum", _ <= 100.0)
    assert(bad.select("k").as[String].collect().toSeq == Seq("b"))
  }

  test("duplicateGroups + dropOverflowGroups") {
    val d = Seq(1, 1, 1, 2, 3, 3).toDF("k")
    assert(GroupRules.duplicateGroups(d, Seq("k")).count() == 2)
    assert(GroupRules.dropOverflowGroups(d, Seq("k"), 2).count() == 3) // k=1 dropped
  }

  test("monotonicity violations within partition groups") {
    val d = Seq((1, 1, 10.0), (1, 2, 12.0), (1, 3, 11.0), (2, 1, 5.0), (2, 2, 6.0))
      .toDF("g", "t", "v")
    val bad = GroupRules.monotonicityViolations(d, "v", "t", Seq("g"))
    assert(bad.select("g", "t").as[(Int, Int)].collect().toSeq == Seq((1, 3)))
  }

  test("quantiles + uniqueValuesProportion") {
    val d = (1 to 100).toDF("x")
    val qs = GroupRules.quantiles(d, "x", Seq(0.5))
    assert(math.abs(qs.head - 50.5) < 0.01)
    assert(GroupRules.uniqueValuesProportion(d, "x") == 1.0)
  }
}
