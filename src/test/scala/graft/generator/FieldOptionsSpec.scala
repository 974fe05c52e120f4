package graft.generator

import graft.SparkSuite
import graft.plan.{FieldDef, LegacyPlan, MultiPlanSpec}
import org.apache.spark.sql.functions._

/** The reference's extended per-field generator options
  * (`api/.../model/Constants.scala:84-112,137`): distributions
  * (mean/stddev, normal, exponential), incremental, round,
  * dateExcludeWeekends, enableNull/enableEdgeCase bands, and the array
  * shape family (uniqueFrom / oneOf / weightedOneOf / fixedSize /
  * emptyProb) — each checked directly on the [[FieldSpec]] and through
  * the legacy YAML dialect.
  */
class FieldOptionsSpec extends SparkSuite {

  test("normal draw matches mean/stddev and is partitioning-invariant") {
    val specs = Seq(NormalField("g", 50.0, 10.0))
    val df = Generator.generate(spark, 20000L, specs, seed = 11L)
    val r = df.agg(avg("g"), stddev("g")).head()
    assert(math.abs(r.getDouble(0) - 50.0) < 0.5, s"mean ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 10.0) < 0.5, s"stddev ${r.getDouble(1)}")
    val a = Generator.generate(spark, 1000L, specs, seed = 12L, partitions = 3)
      .collect().map(_.getDouble(0)).sorted
    val b = Generator.generate(spark, 1000L, specs, seed = 12L, partitions = 17)
      .collect().map(_.getDouble(0)).sorted
    assert(a.sameElements(b))
  }

  test("range-clamped exponential stays in [lo, hi] and skews low") {
    val df = Generator.generate(spark, 10000L,
      Seq(ExpRangeField("e", 10.0, 100.0, 1.0)), seed = 13L)
    assert(df.where(col("e") < 10.0 || col("e") > 100.0).count() == 0)
    // reference formula diff*(-ln(1-u)/rate)+min → analytic median
    // diff*ln2/rate + min = 90*0.6931 + 10 ≈ 72.4 (clamped draws sit above)
    val med = df.stat.approxQuantile("e", Array(0.5), 0.005)(0)
    assert(math.abs(med - 72.4) < 3.0, s"exponential median $med ≈ 72.4 expected")
  }

  test("incremental is start + row index, collision-free") {
    val df = Generator.generate(spark, 5000L,
      Seq(IncrementalField("k", 100L)), seed = 14L, partitions = 7)
    val r = df.agg(min("k"), max("k"), count_distinct(col("k"))).head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 5099L && r.getLong(2) == 5000L)
  }

  test("weekday dates exclude weekends and stay in range") {
    val df = Generator.generate(spark, 4000L,
      Seq(WeekdayDateField("d", "2024-01-01", 28)), seed = 15L)
    assert(df.where(dayofweek(col("d")).isin(1, 7)).count() == 0)
    assert(df.where(col("d") < lit("2024-01-01") || col("d") > lit("2024-01-28")).count() == 0)
    // all 20 weekdays of the window show up
    assert(df.select("d").distinct().count() == 20)
  }

  test("arrayUniqueFrom draws a subset without repetition") {
    val vals = Seq("a", "b", "c", "d", "e")
    val df = Generator.generate(spark, 3000L,
      Seq(UniqueFromArrayField("arr", vals, 2, 4)), seed = 16L).cache()
    assert(df.where(size(col("arr")) < 2 || size(col("arr")) > 4).count() == 0)
    assert(df.where(size(array_distinct(col("arr"))) =!= size(col("arr"))).count() == 0)
    assert(df.where(size(array_except(col("arr"), array(vals.map(lit): _*))) > 0).count() == 0)
    // all three lengths occur
    assert(df.select(size(col("arr"))).distinct().count() == 3)
    df.unpersist()
  }

  test("round wraps the draw to the requested digits") {
    val df = Generator.generate(spark, 2000L,
      Seq(RoundWrapSpec(DoubleField("p", 0.0, 10.0), 2)), seed = 17L)
    assert(df.where(abs(col("p") * 100 - round(col("p") * 100, 0)) > 1e-9).count() == 0)
  }

  test("edge/null bands: fractions match, edge values come from the typed list") {
    val spec = EdgeNullWrapSpec(IntField("v", 1L, 100L), 0.2, 0.3, EdgeCases.forType("int"))
    val df = Generator.generate(spark, 20000L, Seq(spec), seed = 18L).cache()
    val nullFrac = df.where(col("v").isNull).count() / 20000.0
    // base range is [1,100], so Int.MaxValue/Int.MinValue/0 only arrive via the edge band
    val edgeFrac = df.where(col("v").isin(Int.MaxValue, Int.MinValue, 0)).count() / 20000.0
    val baseFrac = df.where(col("v").between(1, 100)).count() / 20000.0
    assert(math.abs(nullFrac - 0.3) < 0.02, s"null fraction $nullFrac")
    assert(math.abs(edgeFrac - 0.2) < 0.02, s"edge fraction $edgeFrac")
    assert(math.abs(baseFrac - 0.5) < 0.02, s"base fraction $baseFrac")
    df.unpersist()
  }

  test("empty-array injection fraction") {
    val spec = EmptyArrayWrapSpec(ArraySpec("a", AlphaNumField("element", 3, 5), 1, 3), 0.25)
    val df = Generator.generate(spark, 8000L, Seq(spec), seed = 19L).cache()
    val emptyFrac = df.where(size(col("a")) === 0).count() / 8000.0
    assert(math.abs(emptyFrac - 0.25) < 0.02, s"empty fraction $emptyFrac")
    assert(df.where(size(col("a")) > 3).count() == 0)
    df.unpersist()
  }

  test("weighted entry parsing: quoted values, last-colon split, loud errors") {
    assert(FieldDef.parseWeighted("f", Seq("'a':0.2", "b:0.8")) ==
      Seq(("a", 0.2), ("b", 0.8)))
    assert(FieldDef.parseWeighted("f", Seq("'x:y':1.5")) == Seq(("x:y", 1.5)))
    intercept[IllegalArgumentException](FieldDef.parseWeighted("f", Seq("noweight")))
    intercept[IllegalArgumentException](FieldDef.parseWeighted("f", Seq("a:NaNopeX")))
    intercept[IllegalArgumentException](FieldDef.parseWeighted("f", Seq("a:0", "b:0")))
  }

  test("legacy dialect: the full option family parses and generates") {
    val yaml =
      """name: "opts_task"
        |steps:
        |  - name: "t"
        |    count:
        |      records: 8000
        |    fields:
        |      - name: "score"
        |        type: "double"
        |        options: {distribution: "normal", mean: 50, stddev: 5, round: 1}
        |      - name: "seqno"
        |        type: "long"
        |        options: {incremental: 1000}
        |      - name: "biz_date"
        |        type: "date"
        |        options: {min: "2024-03-04", max: "2024-03-15", dateExcludeWeekends: "true"}
        |      - name: "evt"
        |        type: "timestamp"
        |        options: {min: "2024-01-01 00:00:00", max: "2024-01-11 00:00:00"}
        |      - name: "maybe"
        |        type: "string"
        |        options: {enableNull: "true", nullProb: 0.5}
        |      - name: "tags"
        |        type: "array"
        |        options:
        |          arrayUniqueFrom: ["red", "green", "blue"]
        |          arrayMinLen: 1
        |          arrayMaxLen: 3
        |      - name: "sizes"
        |        type: "array"
        |        options: {arrayOneOf: "S,M,L", arrayFixedSize: 2}
        |      - name: "wts"
        |        type: "array"
        |        options: {arrayWeightedOneOf: "'x':0.9,'y':0.1", arrayMinLen: 1, arrayMaxLen: 1}
        |      - name: "lat"
        |        type: "double"
        |        options: {distribution: "exponential", distributionRateParam: 2.0, min: 0, max: 10}
        |      - name: "codes"
        |        type: "array"
        |        options: {arrayType: "int", min: 5, max: 9, arrayFixedSize: 2}
        |      - name: "attrs"
        |        type: "map<string,string>"
        |        options: {mapMinSize: 1, mapMaxSize: 2}
        |""".stripMargin
    val tasks = LegacyPlan.parseTaskFile(yaml)
    val df = Generator.generate(spark, 8000L, tasks.head.fields.map(_.toSpec), seed = 21L).cache()

    val r = df.agg(avg("score"), stddev("score")).head()
    assert(math.abs(r.getDouble(0) - 50.0) < 0.5 && math.abs(r.getDouble(1) - 5.0) < 0.5)
    assert(df.where(abs(col("score") * 10 - round(col("score") * 10, 0)) > 1e-9).count() == 0)

    val sq = df.agg(min("seqno"), max("seqno"), count_distinct(col("seqno"))).head()
    assert(sq.getLong(0) == 1000L && sq.getLong(1) == 8999L && sq.getLong(2) == 8000L)

    assert(df.where(dayofweek(col("biz_date")).isin(1, 7)).count() == 0)
    assert(df.where(col("biz_date") < lit("2024-03-04") ||
      col("biz_date") > lit("2024-03-15")).count() == 0)

    assert(df.where(col("evt") < lit("2024-01-01 00:00:00") ||
      col("evt") > lit("2024-01-11 00:00:00")).count() == 0)

    val nullFrac = df.where(col("maybe").isNull).count() / 8000.0
    assert(math.abs(nullFrac - 0.5) < 0.02, s"null fraction $nullFrac")

    assert(df.where(size(col("tags")) < 1 || size(col("tags")) > 3).count() == 0)
    assert(df.where(size(array_distinct(col("tags"))) =!= size(col("tags"))).count() == 0)

    assert(df.where(size(col("sizes")) =!= 2).count() == 0)
    assert(df.where(size(array_except(col("sizes"), array(lit("S"), lit("M"), lit("L")))) > 0)
      .count() == 0)

    val xFrac = df.where(element_at(col("wts"), 1) === "x").count() / 8000.0
    assert(math.abs(xFrac - 0.9) < 0.02, s"weighted x fraction $xFrac")

    assert(df.where(col("lat") < 0.0 || col("lat") > 10.0).count() == 0)

    assert(df.where(size(col("codes")) =!= 2).count() == 0)
    assert(df.where(!forall(col("codes"), e => e.between(5, 9))).count() == 0)

    assert(df.where(size(col("attrs")) < 1 || size(col("attrs")) > 2).count() == 0)
    df.unpersist()
  }

  test("uuid: shaped, unique, deterministic across partitioning") {
    val specs = Seq(UuidField("u"))
    val df = Generator.generate(spark, 5000L, specs, seed = 31L).cache()
    val shape = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    assert(df.where(!col("u").rlike(shape)).count() == 0)
    assert(df.select("u").distinct().count() == 5000)
    df.unpersist()
    val a = Generator.generate(spark, 800L, specs, seed = 32L, partitions = 3)
      .collect().map(_.getString(0)).sorted
    val b = Generator.generate(spark, 800L, specs, seed = 32L, partitions = 17)
      .collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
  }

  test("legacy uuid variants: incremental-driven and field-driven md5 formatting") {
    val yaml =
      """name: "uuid_task"
        |steps:
        |  - name: "t"
        |    count: {records: 500}
        |    fields:
        |      - name: "account_id"
        |        options: {uuid: "", incremental: 1000000}
        |      - name: "seqno"
        |        type: "long"
        |        options: {incremental: 1000000}
        |      - name: "derived_id"
        |        options: {uuid: "seqno"}
        |      - name: "free_id"
        |        options: {uuid: ""}
        |""".stripMargin
    val tasks = LegacyPlan.parseTaskFile(yaml)
    val df = Generator.generate(spark, 500L, tasks.head.fields.map(_.toSpec), seed = 33L).cache()
    // the reference's formula: md5(cast(driving value as string)) as 8-4-4-4-12
    def uuidOf(c: org.apache.spark.sql.Column) = {
      val h = md5(c.cast("string"))
      concat(substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
        substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"), substring(h, 21, 12))
    }
    // account_id derives from 1000000 + row index == the seqno column
    assert(df.where(col("account_id") =!= uuidOf(col("seqno"))).count() == 0)
    assert(df.where(col("derived_id") =!= uuidOf(col("seqno"))).count() == 0)
    val shape = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    assert(df.where(!col("free_id").rlike(shape)).count() == 0)
    assert(df.select("free_id").distinct().count() == 500)
    df.unpersist()
  }

  test("native dialect: options block rides through json4s extraction") {
    val yaml =
      """name: "native_opts"
        |seed: 7
        |tasks:
        |  - name: "t"
        |    count: 3000
        |    fields:
        |      - name: "id"
        |        type: "int"
        |        options: {incremental: 5}
        |      - name: "v"
        |        type: "int"
        |        options: {enableEdgeCase: true, edgeCaseProb: 0.15}
        |""".stripMargin
    val plan = graft.plan.MultiPlanRunner.parseYaml(yaml)
    val df = Generator.generate(spark, 3000L, plan.tasks.head.fields.map(_.toSpec), seed = 7L)
      .cache()
    val r = df.agg(min("id"), max("id")).head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 3004L)
    val edgeFrac = df.where(col("v").isin(Int.MaxValue, Int.MinValue)).count() / 3000.0
    // 0 is both an edge case and in the base range — count only the extremes
    // (2/3 of the edge band): 0.15 * 2/3 = 0.10
    assert(math.abs(edgeFrac - 0.10) < 0.025, s"edge fraction $edgeFrac")
    df.unpersist()
  }

  test("legacy `type: string` (alphanum) injects string edge cases") {
    val yaml =
      """name: "edges"
        |steps:
        |  - name: "t"
        |    count: {records: 2000}
        |    fields:
        |      - name: "v"
        |        type: "string"
        |        options: {enableEdgeCase: true, edgeCaseProb: 0.2}
        |""".stripMargin
    val tasks = LegacyPlan.parseTaskFile(yaml)
    val df = Generator.generate(spark, 2000L, tasks.head.fields.map(_.toSpec), seed = 31L)
      .cache()
    // the legacy dialect maps `type: string` to the alphanum generator —
    // EdgeCases.forType must treat it as a string (it silently returned
    // Nil before, collapsing the edge band to 0)
    val edges = Set("", "\n", "\r", "\t", " ", "\u0000")
    val frac = df.where(col("v").isin(edges.toSeq: _*)).count() / 2000.0
    assert(math.abs(frac - 0.2) < 0.035, s"edge fraction $frac")
    df.unpersist()
  }

  test("isUnique on a faker expression uniquifies by construction") {
    val yaml =
      """name: "u"
        |steps:
        |  - name: "t"
        |    count: {records: 3000}
        |    fields:
        |      - name: "email"
        |        options: {expression: "#{Internet.emailAddress}", isUnique: "true"}
        |      - name: "nick"
        |        options: {expression: "#{Name.firstName}", isUnique: "true"}
        |""".stripMargin
    val tasks = LegacyPlan.parseTaskFile(yaml)
    val df = Generator.generate(spark, 3000L, tasks.head.fields.map(_.toSpec), seed = 41L)
      .cache()
    // 3000 rows over a ~2000-combination email lexicon WOULD collide; the
    // reference dedups + regenerates (UniqueFieldsUtil), a projection
    // splices the row index in instead — all distinct, still email-shaped
    assert(df.select(count_distinct(col("email"))).head.getLong(0) == 3000L)
    assert(df.where(!col("email")
      .rlike("^[a-z]+\\.[a-z]+\\.[0-9]+@[a-z.]+$")).count() == 0,
      df.select("email").head.getString(0))
    // non-email values append a '-<idx>' disambiguator
    assert(df.select(count_distinct(col("nick"))).head.getLong(0) == 3000L)
    assert(df.where(!col("nick").rlike("^[A-Za-z]+-[0-9]+$")).count() == 0,
      df.select("nick").head.getString(0))
    df.unpersist()
  }
}
