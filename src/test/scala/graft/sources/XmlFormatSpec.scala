package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** XML source/sink — the reference ships spark-xml as a connector
  * (`api/.../Constants.scala` format matrix); Spark 4 absorbed it into
  * core (`sql/execution/datasources/xml`), so the format is first-class
  * here with no extra jar: `format("xml")` + rowTag both ways.
  */
class XmlFormatSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  test("xml round-trip: write with rowTag, read back schema + values") {
    val dir = Files.createTempDirectory("graft_xml").toString + "/records"
    val df = Seq((1L, "alpha", 9.5), (2L, "beta", 3.25), (3L, "gamma", 7.0))
      .toDF("id", "name", "score")
    df.write.option("rowTag", "record").format("xml").save(dir)
    val back = spark.read.option("rowTag", "record").format("xml").load(dir)
      .select("id", "name", "score").orderBy("id")
    assert(back.as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "alpha", 9.5), (2L, "beta", 3.25), (3L, "gamma", 7.0)))
  }

  test("legacy task with type xml generates to an XML sink") {
    val out = Files.createTempDirectory("graft_xml_task").toString
    val yaml =
      s"""name: t
         |steps:
         |  - name: "events"
         |    type: "xml"
         |    count: {records: 25}
         |    options: {path: "$out/events"}
         |    fields:
         |      - {name: event_id, options: {isUnique: true}}
         |      - {name: kind, options: {oneOf: [click, view]}}
         |""".stripMargin
    val tasks = graft.plan.LegacyPlan.parseTaskFile(yaml)
    // the sink carries the required rowTag (defaulted to the step name)
    assert(tasks.head.sink.exists(s => s.format == "xml" && s.options("rowTag") == "events"))
    // END-TO-END through the runner's own sink write — no manual rewrite
    graft.plan.MultiPlanRunner.run(spark,
      graft.plan.MultiPlanSpec("x", 1L, tasks))
    val back = spark.read.option("rowTag", "events").format("xml").load(s"$out/events")
    assert(back.count() == 25)
    assert(back.where(!col("kind").isin("click", "view")).isEmpty)
  }
}
