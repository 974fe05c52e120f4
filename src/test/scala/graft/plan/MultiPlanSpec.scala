package graft.plan

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MultiPlanSpecSuite extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private def planYaml(out: String): String =
    s"""name: shop
       |seed: 7
       |tasks:
       |  - name: customers
       |    count: 200
       |    fields:
       |      - {name: customer_id, type: sequential, prefix: C, pad: 6}
       |      - {name: full_name, type: template, template: "#{name.name}"}
       |      - {name: age, type: int, lo: 18, hi: 90}
       |      - {name: tier, type: oneOf, values: [gold, silver, bronze]}
       |    sink: {path: "$out/customers"}
       |  - name: orders
       |    count: 1
       |    fields:
       |      - {name: order_id, type: sequential, prefix: O, pad: 8}
       |      - {name: customer_id, type: alphanum}
       |      - {name: amount, type: double, lo: 1, hi: 500}
       |      - {name: amount_cents, type: sql, sql: "cast(round(amount * 100) as bigint)"}
       |      - {name: placed, type: date, start: "2023-01-01", days: 120}
       |    sink: {path: "$out/orders"}
       |relationships:
       |  - {from: orders.customer_id, to: customers.customer_id, ratio: 5}
       |validations:
       |  - dataset: orders
       |    rules:
       |      - {name: amount_positive, expr: "amount > 0"}
       |      - {name: cents_consistent, expr: "abs(amount_cents - amount * 100) <= 0.5"}
       |  - dataset: customers
       |    rules:
       |      - {name: adult, expr: "age >= 18"}
       |""".stripMargin

  test("two-table FK plan: insert order, cardinality, referential integrity, validations") {
    val out = Files.createTempDirectory("graft_multiplan").toString
    val plan = MultiPlanRunner.parseYaml(planYaml(out))
    assert(plan.tasks.size == 2 && plan.relationships.size == 1)

    val outcome = MultiPlanRunner.run(s, plan)
    // parents generate before children
    assert(outcome.insertOrder == Seq("customers", "orders"))
    // cardinality ratio OVERRIDES the declared child count: 200 × 5
    assert(outcome.counts == Map("customers" -> 200L, "orders" -> 1000L))
    val customers = outcome.frames("customers")
    val orders = outcome.frames("orders")
    assert(customers.count() == 200 && orders.count() == 1000)

    // referential integrity: every order's customer_id exists in customers
    val orphans = orders.join(customers.select("customer_id"), Seq("customer_id"), "left_anti")
    assert(orphans.isEmpty, "orders reference non-existent customers")
    // sampling actually spreads across parents (not all one key)
    assert(orders.select("customer_id").distinct().count() > 100)

    // computed field resolved after its dependency
    assert(orders.where(abs(col("amount_cents") - col("amount") * 100) > 0.5).isEmpty)

    // validations all green, per dataset
    assert(outcome.validations.keySet == Set("orders", "customers"))
    assert(outcome.success)

    // sinks written in insert order, readable, internal row id dropped
    val customersOnDisk = s.read.parquet(s"$out/customers")
    assert(customersOnDisk.count() == 200)
    assert(!customersOnDisk.columns.contains("__graft_rid"))
    assert(s.read.parquet(s"$out/orders").count() == 1000)

    // determinism: a second run of the same plan is byte-identical
    val again = MultiPlanRunner.run(s, plan)
    val a = outcome.frames("orders").orderBy("order_id").collect().map(_.toString)
    val b = again.frames("orders").orderBy("order_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("two FKs on one table sample independently (per-relationship seeds)") {
    val yaml =
      """name: twofk
        |tasks:
        |  - {name: pa, count: 100, fields: [{name: ka, type: sequential, prefix: A, pad: 5}]}
        |  - {name: pb, count: 100, fields: [{name: kb, type: sequential, prefix: B, pad: 5}]}
        |  - name: child
        |    count: 2000
        |    fields:
        |      - {name: id, type: sequential, prefix: C, pad: 6}
        |      - {name: ka, type: alphanum}
        |      - {name: kb, type: alphanum}
        |relationships:
        |  - {from: child.ka, to: pa.ka}
        |  - {from: child.kb, to: pb.kb}
        |""".stripMargin
    val o = MultiPlanRunner.run(s, MultiPlanRunner.parseYaml(yaml))
    val child = o.frames("child")
    // equal parent counts (100 = 100): a shared seed hashes both FKs to the
    // IDENTICAL index per row — the two key ranks would coincide on every
    // row. Independent draws coincide ~1/100 of the time.
    val sameRank = child
      .withColumn("ra", expr("cast(substring(ka, 2) as int)"))
      .withColumn("rb", expr("cast(substring(kb, 2) as int)"))
      .where(col("ra") === col("rb")).count()
    assert(sameRank < 200, s"FK ranks coincide on $sameRank/2000 rows — correlated sampling")
    assert(child.join(o.frames("pa").select("ka"), Seq("ka"), "left_anti").isEmpty)
    assert(child.join(o.frames("pb").select("kb"), Seq("kb"), "left_anti").isEmpty)
  }

  test("failing validation is reported, not thrown") {
    val yaml =
      """name: bad
        |tasks:
        |  - name: t
        |    count: 50
        |    fields:
        |      - {name: v, type: int, lo: 0, hi: 10}
        |validations:
        |  - dataset: t
        |    rules:
        |      - {name: impossible, expr: "v > 100"}
        |""".stripMargin
    val outcome = MultiPlanRunner.run(s, MultiPlanRunner.parseYaml(yaml))
    assert(!outcome.success)
    val r = outcome.validations("t").head
    assert(r.errors == 50 && r.samples.nonEmpty)
  }

  test("FK cycle is rejected loudly") {
    val yaml =
      """name: cyc
        |tasks:
        |  - {name: a, count: 10, fields: [{name: x, type: int}]}
        |  - {name: b, count: 10, fields: [{name: x, type: int}]}
        |relationships:
        |  - {from: a.x, to: b.x}
        |  - {from: b.x, to: a.x}
        |""".stripMargin
    val e = intercept[IllegalArgumentException](
      MultiPlanRunner.run(s, MultiPlanRunner.parseYaml(yaml)))
    assert(e.getMessage.contains("cycle"))
  }
}
