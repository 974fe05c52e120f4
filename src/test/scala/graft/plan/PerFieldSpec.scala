package graft.plan

import graft.SparkSuite
import graft.generator._
import org.apache.spark.sql.functions._

/** `count.perField` as real grouped generation (the reference's
  * PerFieldCount, `DataGeneratorFactory.scala:54-100`): exact per-group
  * member counts — static, min/max range (uniform/normal/zipf/power), or
  * weighted choices — standalone or fanned out of an FK parent frame with
  * exact referential integrity. */
class PerFieldSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private def groupSizes(df: org.apache.spark.sql.DataFrame, keyCol: String): Map[Long, Long] =
    df.groupBy(keyCol).count().collect()
      .map(r => r.getLong(1)).groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("standalone static: exact groups of N, member fields vary within a group") {
    val specs = Seq(
      SequentialField("gid", "G", 6),
      AlphaNumField("payload", 8, 8),
      SqlField("tag", "concat(gid, '-', payload)"))
    val df = Generator.generatePerField(s, 100L, specs, Seq("gid"),
      Generator.PerFieldCounts(count = Some(4L)), seed = 5L).cache()
    assert(df.count() == 400)
    val perGroup = df.groupBy("gid").agg(
      count(lit(1)).as("n"), count_distinct(col("payload")).as("v"))
    assert(perGroup.where(col("n") =!= 4).count() == 0)
    assert(perGroup.count() == 100)
    // member fields differ inside a group (regenerated per member row)
    assert(perGroup.where(col("v") < 2).count() == 0)
    // computed fields see the carried group column
    assert(df.where(col("tag") =!= concat(col("gid"), lit("-"), col("payload"))).count() == 0)
    df.unpersist()
  }

  test("min/max range: every size occurs, all inside bounds, deterministic") {
    val specs = Seq(SequentialField("gid", "G", 6), AlphaNumField("x", 4, 4))
    val df = Generator.generatePerField(s, 500L, specs, Seq("gid"),
      Generator.PerFieldCounts(min = Some(1), max = Some(5)), seed = 6L).cache()
    val sizes = groupSizes(df, "gid")
    assert(sizes.keySet == Set(1L, 2L, 3L, 4L, 5L), sizes.toString)
    val again = Generator.generatePerField(s, 500L, specs, Seq("gid"),
      Generator.PerFieldCounts(min = Some(1), max = Some(5)), seed = 6L)
    assert(again.count() == df.count())
    df.unpersist()
  }

  test("weighted sizes: fractions honored") {
    val specs = Seq(SequentialField("gid", "G", 6), AlphaNumField("x", 4, 4))
    val df = Generator.generatePerField(s, 2000L, specs, Seq("gid"),
      Generator.PerFieldCounts(weighted = Seq((1, 0.7), (5, 0.3))), seed = 7L).cache()
    val sizes = groupSizes(df, "gid")
    assert(sizes.keySet == Set(1L, 5L), sizes.toString)
    val frac1 = sizes(1L).toDouble / 2000.0
    assert(math.abs(frac1 - 0.7) < 0.04, s"size-1 fraction $frac1")
    df.unpersist()
  }

  test("normal distribution concentrates mid-range; zipf front-loads") {
    val specs = Seq(SequentialField("gid", "G", 6), AlphaNumField("x", 4, 4))
    val norm = Generator.generatePerField(s, 3000L, specs, Seq("gid"),
      Generator.PerFieldCounts(min = Some(1), max = Some(9),
        distribution = Some("normal")), seed = 8L)
    val nSizes = groupSizes(norm, "gid")
    assert(nSizes.keySet.subsetOf((1L to 9L).toSet))
    val mid = (4L to 6L).map(nSizes.getOrElse(_, 0L)).sum.toDouble / 3000.0
    assert(mid > 0.6, s"mid-band fraction $mid (uniform would be 0.33)")

    val zipf = Generator.generatePerField(s, 3000L, specs, Seq("gid"),
      Generator.PerFieldCounts(min = Some(1), max = Some(9),
        distribution = Some("zipf")), seed = 9L)
    val zSizes = groupSizes(zipf, "gid")
    // zipf: P(1) = 1/H(9) ≈ 0.354; strictly decreasing in k
    val f1 = zSizes.getOrElse(1L, 0L).toDouble / 3000.0
    assert(math.abs(f1 - 0.354) < 0.04, s"zipf size-1 fraction $f1")
    assert(zSizes.getOrElse(1L, 0L) > zSizes.getOrElse(9L, 0L) * 3)
  }

  test("FK fan-out: exact N children per parent, exact integrity, exact counts") {
    val plan = MultiPlanRunner.parseYaml(
      """name: fanout
        |seed: 17
        |tasks:
        |  - name: parents
        |    count: 50
        |    fields:
        |      - {name: pid, type: sequential, prefix: P, pad: 5}
        |      - {name: region, type: oneOf, values: [na, eu]}
        |  - name: children
        |    count: 999
        |    perField: {fieldNames: [pid], count: 3}
        |    fields:
        |      - {name: pid, type: alphanum}
        |      - {name: payload, type: alphanum, minLen: 6, maxLen: 6}
        |relationships:
        |  - {from: children.pid, to: parents.pid}
        |""".stripMargin)
    val o = MultiPlanRunner.run(s, plan)
    val kids = o.frames("children").cache()
    assert(o.counts("children") == 150L) // 50 parents × 3, declared 999 ignored
    assert(kids.count() == 150)
    val perParent = kids.groupBy("pid").count()
    assert(perParent.count() == 50 && perParent.where(col("count") =!= 3).count() == 0)
    assert(kids.join(o.frames("parents").select("pid"), Seq("pid"), "left_anti").count() == 0)
    kids.unpersist()
  }

  test("FK fan-out with range: per-parent sizes inside bounds, counts exact") {
    val plan = MultiPlanRunner.parseYaml(
      """name: fanout_range
        |seed: 19
        |tasks:
        |  - name: parents
        |    count: 200
        |    fields:
        |      - {name: pid, type: sequential, prefix: P, pad: 5}
        |  - name: children
        |    count: 1
        |    perField: {fieldNames: [pid], min: 1, max: 4}
        |    fields:
        |      - {name: pid, type: alphanum}
        |      - {name: v, type: int, lo: 1, hi: 100}
        |relationships:
        |  - {from: children.pid, to: parents.pid}
        |""".stripMargin)
    val o = MultiPlanRunner.run(s, plan)
    val kids = o.frames("children").cache()
    val perParent = kids.groupBy("pid").count()
    assert(perParent.where(col("count") < 1 || col("count") > 4).count() == 0)
    assert(perParent.count() == 200) // min 1 → every parent has children
    assert(o.counts("children") == kids.count())
    kids.unpersist()
  }

  test("legacy cardinality min/max + distribution synthesizes the fan-out") {
    val planYaml =
      """name: "card_plan"
        |tasks:
        |  - name: "db"
        |    dataSourceName: "db"
        |sinkOptions:
        |  foreignKeys:
        |    - source:
        |        dataSource: "db"
        |        step: "customers"
        |        fields: ["customer_id"]
        |      generate:
        |        - dataSource: "db"
        |          step: "orders"
        |          fields: ["customer_id"]
        |      cardinality:
        |        min: 1
        |        max: 6
        |        distribution: "normal"
        |""".stripMargin
    val taskYaml =
      """name: "db"
        |steps:
        |  - name: "customers"
        |    count: {records: 300}
        |    fields:
        |      - name: "customer_id"
        |        options: {regex: "C[0-9]{10}", isUnique: "true"}
        |  - name: "orders"
        |    count: {records: 1}
        |    fields:
        |      - name: "customer_id"
        |      - name: "amount"
        |        type: "double"
        |        options: {min: 1, max: 100}
        |""".stripMargin
    val spec = LegacyPlan.parsePlan(planYaml, Map("db" -> taskYaml))
    val orders = spec.tasks.find(_.name == "orders").get
    assert(orders.perField.contains(
      PerFieldDef(Seq("customer_id"), None, Some(1), Some(6), None, Some("normal"))))
    val o = MultiPlanRunner.run(s, spec)
    val df = o.frames("orders").cache()
    val perParent = df.groupBy("customer_id").count()
    assert(perParent.where(col("count") < 1 || col("count") > 6).count() == 0)
    assert(perParent.count() == 300)
    // normal: sizes 3-4 beat the 1/6 uniform share comfortably
    val sizes = df.groupBy("customer_id").count().groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val midFrac = (3L to 4L).map(sizes.getOrElse(_, 0L)).sum.toDouble / 300.0
    assert(midFrac > 0.5, s"mid fraction $midFrac")
    assert(o.counts("orders") == df.count())
    df.unpersist()
  }

  test("weighted perField in the legacy dialect (n->w count options)") {
    val taskYaml =
      """name: "t"
        |steps:
        |  - name: "access"
        |    count:
        |      records: 1000
        |      perField:
        |        fieldNames: ["customer_id"]
        |        options:
        |          oneOf: ["1->0.6", "2->0.2", "3->0.2"]
        |    fields:
        |      - name: "customer_id"
        |        options: {regex: "C[0-9]{12}", isUnique: "true"}
        |      - name: "role"
        |        options: {oneOf: "admin,viewer"}
        |""".stripMargin
    val tasks = LegacyPlan.parseTaskFile(taskYaml)
    assert(tasks.head.perField.exists(_.oneOf.contains(Seq("1->0.6", "2->0.2", "3->0.2"))))
    val o = MultiPlanRunner.run(s, MultiPlanSpec("w", 23L, tasks))
    val df = o.frames("access").cache()
    val sizes = groupSizes(df, "customer_id")
    assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L)), sizes.toString)
    val f1 = sizes.getOrElse(1L, 0L).toDouble / 1000.0
    assert(math.abs(f1 - 0.6) < 0.05, s"size-1 fraction $f1")
    assert(o.counts("access") == df.count())
    df.unpersist()
  }

  test("FK fan-out: duplicate parent key tuples fan once (per unique value set)") {
    // parents' key column has only 2 distinct values over 40 rows — the
    // pre-fix behavior emitted 40 bit-identical blocks (same draws, same
    // member identities); the contract is one block per DISTINCT tuple
    val plan = MultiPlanRunner.parseYaml(
      """name: dupfan
        |seed: 23
        |tasks:
        |  - name: parents
        |    count: 40
        |    fields:
        |      - {name: region, type: oneOf, values: [na, eu]}
        |  - name: children
        |    count: 1
        |    perField: {fieldNames: [region], count: 3}
        |    fields:
        |      - {name: region, type: alphanum}
        |      - {name: payload, type: alphanum, minLen: 6, maxLen: 6}
        |relationships:
        |  - {from: children.region, to: parents.region}
        |""".stripMargin)
    val o = MultiPlanRunner.run(s, plan)
    val kids = o.frames("children").cache()
    assert(kids.count() == 6, "2 distinct regions x 3 children")
    assert(o.counts("children") == 6L, "bookkeeping counts the fanned frame, not parents x per")
    assert(kids.distinct().count() == 6, "no bit-identical duplicate rows")
    kids.unpersist()
  }

  test("perField task with an extra FK: head/tail nullability is rejected, random works") {
    def yaml(strategy: String) =
      s"""name: pf_null
         |seed: 29
         |tasks:
         |  - name: parents
         |    count: 30
         |    fields:
         |      - {name: pid, type: sequential, prefix: P, pad: 5}
         |  - name: refs
         |    count: 10
         |    fields:
         |      - {name: rid, type: sequential, prefix: R, pad: 5}
         |  - name: children
         |    count: 1
         |    perField: {fieldNames: [pid], count: 4}
         |    fields:
         |      - {name: pid, type: alphanum}
         |      - {name: rid, type: alphanum}
         |relationships:
         |  - {from: children.pid, to: parents.pid}
         |  - {from: children.rid, to: refs.rid, nullPercentage: 0.25, nullStrategy: $strategy}
         |""".stripMargin
    // head/tail rank by sequential row index — perField rows carry hashed
    // member identities, so the strategies must be rejected loudly (the
    // pre-fix code parsed the hash as an index and nulled ~50%)
    val e = intercept[IllegalArgumentException] {
      MultiPlanRunner.run(s, MultiPlanRunner.parseYaml(yaml("head")))
    }
    assert(e.getMessage.contains("sequential row order"))
    val kids = MultiPlanRunner.run(s, MultiPlanRunner.parseYaml(yaml("random")))
      .frames("children").cache()
    assert(kids.count() == 120)
    val nullFrac = kids.where(col("rid").isNull).count() / 120.0
    assert(math.abs(nullFrac - 0.25) < 0.12, s"null fraction $nullFrac")
    assert(kids.where(col("pid").isNull).count() == 0, "fanned FK untouched")
    kids.unpersist()
  }

  test("hashed member identities survive the sequential-id pad (no lpad truncation)") {
    // SequentialField pads SHORT indices and must keep WIDE ones whole —
    // Spark lpad truncates to the first `pad` chars, which collapsed the
    // 64-bit member hashes to ~2^37 effective identity space
    import org.apache.spark.sql.functions.lit
    val spec = SequentialField("r", "X:", 5)
    val row = s.range(1).select(
      spec.toColumn(lit(0.5), lit(-1234567890123456789L), 1L).as("wide"),
      spec.toColumn(lit(0.5), lit(7L), 1L).as("short")).head()
    assert(row.getString(0) == "X:-1234567890123456789", row.getString(0))
    assert(row.getString(1) == "X:00007", row.getString(1))
  }

  test("nested perField path: struct leaf fixed per group, siblings vary per member") {
    // the reference's kafka-relationships sample: perField on
    // `body.customer_id` where customer_id is uuid+incremental (a sql
    // leaf over __index_inc) — leaf constant within a group, distinct
    // across groups, sibling struct fields regenerate per member row
    val taskYaml =
      """name: "k"
        |steps:
        |  - name: "cp"
        |    count:
        |      records: 10
        |      perField: {count: 3, fieldNames: ["body.customer_id"]}
        |    fields:
        |      - name: "key"
        |        type: "string"
        |        options: {sql: "body.customer_id"}
        |      - name: "messageBody"
        |        type: struct
        |        fields:
        |          - name: "customer_id"
        |            options: {uuid: "", incremental: 1}
        |          - name: "product"
        |            options: {regex: "PR[0-9]{6}"}
        |""".stripMargin
    val spec = graft.plan.LegacyPlan.parsePlan(
      """name: "p"
        |tasks:
        |  - name: "k"
        |    dataSourceName: "k"
        |""".stripMargin, Map("k" -> taskYaml))
    val df = MultiPlanRunner.run(s, spec).frames("cp").cache()
    assert(df.count() == 30)
    val g = df.groupBy(col("body.customer_id").as("cid")).agg(
      count(lit(1)).as("n"), count_distinct(col("body.product")).as("p"))
    assert(g.count() == 10, "10 distinct group leaves")
    assert(g.where(col("n") =!= 3).count() == 0, "exactly 3 members per group")
    assert(g.where(col("p") < 2).count() == 0, "sibling fields vary inside a group")
    // uuid 8-4-4-4-12 shape and the sql `key` sees the SPLICED value
    assert(df.where(!col("body.customer_id")
      .rlike("^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")).count() == 0)
    assert(df.where(col("key") =!= col("body.customer_id")).count() == 0)
    df.unpersist()
  }
}
