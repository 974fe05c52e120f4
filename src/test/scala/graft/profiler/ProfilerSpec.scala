package graft.profiler

import graft.SparkSuite
import graft.generator.{Generator, OneOfField, RegexField}
import graft.rules.RuleEngine
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private lazy val source = spark.range(500).select(
    col("id"),
    element_at(array(lit("alpha"), lit("beta"), lit("gamma")),
      (pmod(col("id"), lit(3)) + 1).cast("int")).as("category"),
    (pmod(col("id"), lit(97)).cast("double") / 4.0 + 10.0).as("price"),
    concat(lit("text number "), col("id")).as("description"),
    when(pmod(col("id"), lit(5)) === 0, lit(null)).otherwise(concat(lit("v"), col("id"))).as("maybe"))

  test("profile: one-pass stats are exact on a known frame") {
    val p = Profiler.profile(source).map(x => x.name -> x).toMap
    assert(p("id").rowCount == 500 && p("id").nullCount == 0)
    assert(p("id").min.contains(0.0) && p("id").max.contains(499.0))
    assert(p("price").min.contains(10.0) && p("price").max.contains(34.0))
    assert(p("maybe").nullCount == 100)
    assert(p("category").isLowCardinality)
    assert(p("category").topValues.head == ("alpha", 167L)) // ties broken by value
    assert(p("category").topValues.map(_._1).toSet == Set("alpha", "beta", "gamma"))
    assert(!p("description").isLowCardinality && p("description").distinctCount > 300)
    assert(p("description").minLen.contains(13) && p("description").maxLen.contains(15))
  }

  test("round-trip: profile → suggested specs generate data that passes suggested rules") {
    val profiles = Profiler.profile(source)
    val specs = Profiler.suggestFieldSpecs(profiles)
    assert(specs.exists { case OneOfField("category", vs) =>
      vs.map(_._1).toSet == Set("alpha", "beta", "gamma"); case _ => false })
    val generated = Generator.generate(spark, 2000L, specs, seed = 33L)
    // rules suggested from the source must hold on data generated to its shape
    // (skip maybe: source had nulls → no notNull rule; no range for strings)
    val rules = Profiler.suggestRules(profiles)
      .filterNot(_.name.startsWith("maybe")) // generator emits non-null; rules allow either
    assert(rules.nonEmpty)
    val results = RuleEngine.validateAll(generated, rules)
    results.foreach(r => assert(r.success, s"${r.rule}: ${r.errors}/${r.total} failed"))
  }

  test("name-based prediction: PII-shaped fields become regex generators that self-validate") {
    val piiNames = Seq("email", "phone_number", "ssn", "uuid", "ip_address", "mac_address")
    piiNames.foreach(n => assert(Profiler.predictByName(n).isDefined, n))
    assert(Profiler.predictByName("description").isEmpty)
    // generated emails actually look like emails (and would be caught by the scrubber)
    val spec = Profiler.predictByName("email").get.asInstanceOf[RegexField]
    val df = Generator.generate(spark, 300L, Seq(spec), seed = 8L)
    val re = "^[a-z]{5,10}\\.[a-z]{5,10}@(example|test|demo)\\.(com|org|net)$".r
    df.select("email").as[String].collect()
      .foreach(e => assert(re.findFirstIn(e).isDefined, e))
    val scrubbed = df.select(graft.functions.Scrubber.scrub(col("email")).as("s"))
    assert(scrubbed.where(col("s") =!= "[EMAIL]").count() == 0)
  }

  test("folder discovery: leaf dataset dirs found, partitioned layouts collapse to the root") {
    // the reference's FileMetadata walks a base folder and emits one
    // metadata target per dataset directory
    val root = java.nio.file.Files.createTempDirectory("graft_disc").toString
    spark.range(10).toDF("a").write.parquet(s"$root/customers")
    spark.range(10).selectExpr("id", "id % 3 as p").write
      .partitionBy("p").parquet(s"$root/nested/orders")
    spark.range(5).toDF("x").write.json(s"$root/events_json")
    val found = Profiler.discoverDatasets(spark, root)
    assert(found.map(_._1).sorted == Seq("customers", "nested/orders"))
    // the partitioned dataset resolved to its ROOT, not the p=0/p=1 leaves
    assert(found.find(_._1 == "nested/orders").get._2.endsWith("nested/orders"))
    assert(Profiler.discoverDatasets(spark, root, "json").map(_._1) == Seq("events_json"))
    assert(Profiler.discoverDatasets(spark, root + "/missing").isEmpty)
    // folder → profiles end-to-end; specs regenerate each discovered set
    val profiled = Profiler.profileFolder(spark, root)
    assert(profiled.size == 2)
    val (_, custProfiles) = profiled.find(_._1 == "customers").get
    assert(custProfiles.head.rowCount == 10)
    assert(Profiler.suggestFieldSpecs(custProfiles).nonEmpty)
  }
}
