package graft.plan

import graft.SparkSuite
import graft.generator.ForeignKeys
import org.apache.spark.sql.functions._

/** FK `generationMode: all-combinations` (the reference's
  * `core/foreignkey/strategy/GenerationModeStrategy.scala:107-166`): the
  * child is blocked into 2^n groups covering every valid/invalid pattern of
  * the n FK fields — here with the block id derived from the sequential row
  * identity (one narrow projection; the reference uses an unpartitioned
  * row_number window).
  */
class FkAllCombinationsSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private def plan(mode: String): MultiPlanSpec =
    MultiPlanRunner.parseYaml(
      s"""name: combo_fk
         |seed: 17
         |tasks:
         |  - name: parents
         |    count: 30
         |    fields:
         |      - {name: region, type: oneOf, values: [na, eu, ap]}
         |      - {name: code, type: sequential, prefix: K, pad: 4}
         |  - name: facts
         |    count: 800
         |    fields:
         |      - {name: idx, type: int, options: {incremental: 0}}
         |      - {name: region, type: alphanum}
         |      - {name: code, type: alphanum}
         |relationships:
         |  - {from: "facts.region,code", to: "parents.region,code", generationMode: $mode}
         |""".stripMargin)

  test("all four valid/invalid patterns of a 2-field key appear, in contiguous blocks") {
    val out = MultiPlanRunner.run(s, plan("all-combinations"))
    val parents = out.frames("parents").select("region", "code").distinct().cache()
    val facts = out.frames("facts").cache()
    assert(facts.count() == 800)
    // per-field validity flag via broadcast membership on the single field
    val regions = parents.select("region").distinct().collect().map(_.getString(0)).toSet
    val codes = parents.select("code").distinct().collect().map(_.getString(0)).toSet
    val judged = facts
      .withColumn("rOk", col("region").isInCollection(regions))
      .withColumn("cOk", col("code").isInCollection(codes))
      .cache()
    // 2^2 = 4 blocks of 200 rows each, bit 0 = region, bit 1 = code:
    // block 0 → both invalid, 1 → region valid, 2 → code valid, 3 → both
    val byBlock = judged.groupBy(floor(col("idx") / 200).as("block"))
      .agg(sum(when(col("rOk"), 1).otherwise(0)).as("rValid"),
        sum(when(col("cOk"), 1).otherwise(0)).as("cValid"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byBlock(0L) == ((0L, 0L, 200L)), s"block 0: ${byBlock(0L)}")
    assert(byBlock(1L) == ((200L, 0L, 200L)), s"block 1: ${byBlock(1L)}")
    assert(byBlock(2L) == ((0L, 200L, 200L)), s"block 2: ${byBlock(2L)}")
    assert(byBlock(3L) == ((200L, 200L, 200L)), s"block 3: ${byBlock(3L)}")
    // invalid strings carry the reference's INVALID_ prefix
    assert(judged.where(!col("rOk") && !col("region").startsWith("INVALID_")).count() == 0)
    // valid-pattern rows reference a real parent TUPLE, not a per-field mix
    assert(judged.where(col("rOk") && col("cOk"))
      .join(parents, Seq("region", "code"), "left_anti").count() == 0)
    judged.unpersist(); facts.unpersist(); parents.unpersist()
  }

  test("deterministic across runs") {
    val a = MultiPlanRunner.run(s, plan("all-combinations")).frames("facts")
    val b = MultiPlanRunner.run(s, plan("all-combinations")).frames("facts")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("all-exist (default) leaves every FK valid") {
    val out = MultiPlanRunner.run(s, plan("all-exist"))
    val parents = out.frames("parents").select("region", "code").distinct()
    assert(out.frames("facts").join(parents, Seq("region", "code"), "left_anti").count() == 0)
  }

  test("numeric invalid values: long FK gets bounded positive hash, int stays in range") {
    import s.implicits._
    val parents = Seq(1000L, 1001L, 1002L).toDF("pk")
    val child = s.range(100).select(
      concat(lit("c:"), lpad(col("id").cast("string"), 6, "0")).as("rid"))
      .withColumn("pk", lit(0L))
    val assigned = ForeignKeys.assignKeys(child, "rid", "pk", parents, "pk", seed = 5L)
    val combo = ForeignKeys.applyAllCombinations(assigned, "rid", Seq("pk"), 100L, seed = 5L)
    // block 0 (first 50 rows) invalid, block 1 valid
    val invalid = combo.where(substring_index(col("rid"), ":", -1).cast("long") < 50)
    assert(invalid.where(col("pk").isin(1000L, 1001L, 1002L)).count() == 0 ||
      invalid.count() == 0) // hash collision with a tiny domain is possible but not at these values
    assert(invalid.where(col("pk") < 0 || col("pk") >= 999999999999L).count() == 0)
    val valid = combo.where(substring_index(col("rid"), ":", -1).cast("long") >= 50)
    assert(valid.where(!col("pk").isin(1000L, 1001L, 1002L)).count() == 0)
  }

  test("legacy dialect: generationMode parses from the generate relation") {
    val planYaml =
      """name: "legacy_combo"
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
        |          generationMode: "all-combinations"
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
    assert(spec.relationships.head.generationMode.contains("all-combinations"))
    val kids = MultiPlanRunner.run(s, spec).frames("children").cache()
    // 2^1 = 2 blocks: first 100 invalid (INVALID_ prefix), last 100 valid
    assert(kids.where(col("idx") < 100 && !col("pid").startsWith("INVALID_")).count() == 0)
    assert(kids.where(col("idx") >= 100 && !col("pid").rlike("^P[0-9]{4}$")).count() == 0)
    kids.unpersist()
  }
}
