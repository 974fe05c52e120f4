package graft.plan

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Partial FK relationships (the reference's `nullability` block on a
  * foreign key, `core/foreignkey/strategy/NullabilityStrategy.scala`):
  * a fraction of child rows carries NULL FK fields, distributed randomly
  * (keyed hash) or over the head/tail of the generation order — with no
  * count job and no unpartitioned window, unlike the reference.
  */
class FkNullabilitySpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private def plan(strategy: String, pct: Double): MultiPlanSpec =
    MultiPlanRunner.parseYaml(
      s"""name: partial_fk
         |seed: 11
         |tasks:
         |  - name: parents
         |    count: 50
         |    fields:
         |      - {name: pid, type: sequential, prefix: P, pad: 6}
         |  - name: children
         |    count: 1000
         |    fields:
         |      - {name: idx, type: int, options: {incremental: 0}}
         |      - {name: pid, type: alphanum}
         |relationships:
         |  - {from: children.pid, to: parents.pid, nullPercentage: $pct, nullStrategy: $strategy}
         |""".stripMargin)

  test("random strategy: fraction matches, survivors reference real parents, deterministic") {
    val o1 = MultiPlanRunner.run(s, plan("random", 0.3))
    val kids = o1.frames("children").cache()
    val nullFrac = kids.where(col("pid").isNull).count() / 1000.0
    assert(math.abs(nullFrac - 0.3) < 0.05, s"null fraction $nullFrac")
    val parentKeys = o1.frames("parents").select("pid")
    assert(kids.where(col("pid").isNotNull).join(parentKeys, Seq("pid"), "left_anti")
      .count() == 0, "surviving FKs must reference real parents")
    // deterministic: a second run nulls the same rows
    val o2 = MultiPlanRunner.run(s, plan("random", 0.3))
    val nulls1 = kids.where(col("pid").isNull).select("idx").collect().map(_.getLong(0)).sorted
    val nulls2 = o2.frames("children").where(col("pid").isNull)
      .select("idx").collect().map(_.getLong(0)).sorted
    assert(nulls1.sameElements(nulls2))
    kids.unpersist()
  }

  test("head strategy: exactly the first N% in generation order") {
    val kids = MultiPlanRunner.run(s, plan("head", 0.2)).frames("children")
    val nullIdx = kids.where(col("pid").isNull).select("idx")
      .collect().map(_.getLong(0)).sorted
    assert(nullIdx.length == 200 && nullIdx.head == 0L && nullIdx.last == 199L)
  }

  test("tail strategy: exactly the last N%") {
    val kids = MultiPlanRunner.run(s, plan("tail", 0.15)).frames("children")
    val nullIdx = kids.where(col("pid").isNull).select("idx")
      .collect().map(_.getLong(0)).sorted
    assert(nullIdx.length == 150 && nullIdx.head == 850L && nullIdx.last == 999L)
  }

  test("unknown strategy fails loudly") {
    val e = intercept[IllegalArgumentException](MultiPlanRunner.run(s, plan("shuffle", 0.2)))
    assert(e.getMessage.contains("nullability strategy"))
  }

  test("composite FK nulls all fields together") {
    val p = MultiPlanRunner.parseYaml(
      """name: composite_partial
        |seed: 13
        |tasks:
        |  - name: parents
        |    count: 40
        |    fields:
        |      - {name: region, type: oneOf, values: [na, eu, ap]}
        |      - {name: code, type: sequential, prefix: K, pad: 4}
        |  - name: facts
        |    count: 600
        |    fields:
        |      - {name: region, type: alphanum}
        |      - {name: code, type: alphanum}
        |relationships:
        |  - {from: "facts.region,code", to: "parents.region,code", nullPercentage: 0.25, nullStrategy: random}
        |""".stripMargin)
    val facts = MultiPlanRunner.run(s, p).frames("facts").cache()
    // never half-null: region and code null together or not at all
    assert(facts.where(col("region").isNull =!= col("code").isNull).count() == 0)
    val frac = facts.where(col("region").isNull).count() / 600.0
    assert(math.abs(frac - 0.25) < 0.06, s"null fraction $frac")
    facts.unpersist()
  }

  test("legacy dialect: the nullability block parses onto the relationship") {
    val planYaml =
      """name: "legacy_partial"
        |tasks:
        |  - name: "db"
        |    dataSourceName: "db"
        |sinkOptions:
        |  seed: "21"
        |  foreignKeys:
        |    - source:
        |        dataSource: "db"
        |        step: "parents"
        |        fields: ["pid"]
        |      generate:
        |        - dataSource: "db"
        |          step: "children"
        |          fields: ["pid"]
        |      nullability:
        |        nullPercentage: 0.4
        |        strategy: "head"
        |""".stripMargin
    val taskYaml =
      """name: "db"
        |steps:
        |  - name: "parents"
        |    count: {records: 30}
        |    fields:
        |      - name: "pid"
        |        options: {regex: "P[0-9]{4}", isUnique: "true"}
        |  - name: "children"
        |    count: {records: 200}
        |    fields:
        |      - name: "idx"
        |        type: "long"
        |        options: {incremental: 0}
        |      - name: "pid"
        |""".stripMargin
    val spec = LegacyPlan.parsePlan(planYaml, Map("db" -> taskYaml))
    val r = spec.relationships.head
    assert(r.nullPercentage.contains(0.4) && r.nullStrategy.contains("head"))
    val kids = MultiPlanRunner.run(s, spec).frames("children")
    val nullIdx = kids.where(col("pid").isNull).select("idx")
      .collect().map(_.getLong(0)).sorted
    assert(nullIdx.length == 80 && nullIdx.head == 0L && nullIdx.last == 79L)
  }

  test("nested FK endpoints: child struct leaf sampled from parent, nullability writes in place") {
    // the reference's NestedFieldUtil surface: FK child field inside a
    // struct (`body.account_id`) — assignment must overwrite the struct
    // LEAF, not invent a literal dotted top-level column
    val plan = MultiPlanRunner.parseYaml(
      """name: nested_fk
        |seed: 31
        |tasks:
        |  - name: accounts
        |    count: 20
        |    fields:
        |      - {name: account_id, type: regex, pattern: "ACC[0-9]{4}"}
        |  - name: events
        |    count: 200
        |    fields:
        |      - name: body
        |        type: struct
        |        fields:
        |          - {name: account_id, type: alphanum}
        |          - {name: amount, type: double, lo: 1, hi: 9}
        |relationships:
        |  - {from: events.body.account_id, to: accounts.account_id, nullPercentage: 0.3}
        |""".stripMargin)
    val o = MultiPlanRunner.run(s, plan)
    val events = o.frames("events").cache()
    assert(events.columns.toSeq == Seq("body"), events.columns.mkString(","))
    assert(events.count() == 200)
    val nn = events.where(col("body.account_id").isNotNull)
    // every non-null leaf exists in the parent (referential integrity)
    assert(nn.join(o.frames("accounts"),
      nn("body.account_id") === col("account_id"), "left_anti").count() == 0)
    val nullFrac = events.where(col("body.account_id").isNull).count() / 200.0
    assert(math.abs(nullFrac - 0.3) < 0.1, s"null fraction $nullFrac")
    // sibling struct fields untouched by the overwrite
    assert(events.where(col("body.amount").isNull).count() == 0)
    events.unpersist()
  }

  test("legacy cardinality min/max on a NESTED child FK falls back to sampling, not an aborting fan") {
    val planYaml =
      """name: "p"
        |tasks:
        |  - name: "db"
        |    dataSourceName: "db"
        |sinkOptions:
        |  foreignKeys:
        |    - source: {dataSource: "db", step: "accounts", fields: ["account_id"]}
        |      generate:
        |        - dataSource: "db"
        |          step: "events"
        |          fields: ["body.account_id"]
        |          cardinality: {min: 2, max: 4}
        |""".stripMargin
    val taskYaml =
      """name: "db"
        |steps:
        |  - name: "accounts"
        |    count: {records: 10}
        |    fields:
        |      - name: "account_id"
        |        options: {regex: "ACC[0-9]{4}", isUnique: "true"}
        |  - name: "events"
        |    count: {records: 7}
        |    fields:
        |      - name: "body"
        |        type: struct
        |        fields:
        |          - name: "account_id"
        |          - name: "amount"
        |            type: "double"
        |""".stripMargin
    val spec = LegacyPlan.parsePlan(planYaml, Map("db" -> taskYaml))
    val o = MultiPlanRunner.run(s, spec)
    val events = o.frames("events").cache()
    // cardinality adjusts the child count to parents x midpoint(2,4)=3;
    // integrity is exact through the nested sampling path
    assert(events.count() == 30, s"got ${events.count()}")
    assert(events.where(col("body.account_id").isNull).count() == 0)
    assert(events.join(o.frames("accounts"),
      events("body.account_id") === col("account_id"), "left_anti").count() == 0)
    events.unpersist()
  }
}
