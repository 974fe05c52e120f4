package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class JdbcSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private lazy val url = Jdbc.derbyUrl(
    Files.createTempDirectory("graft_derby").toString + "/db")

  test("JDBC round-trip against embedded Derby: write, read, content equal") {
    val df = spark.range(1000).select(
      col("id"),
      concat(lit("name_"), col("id")).as("name"),
      (col("id") % 7).cast("double").as("score"))
    Jdbc.write(df, url, "people")
    val back = Jdbc.read(spark, url, "PEOPLE")
    assert(back.count() == 1000)
    val a = df.collect().map(_.toString).sorted
    val b = back.select("id", "name", "score").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("filter + projection push into the database (PushedFilters on the JDBC scan)") {
    val q = Jdbc.read(spark, url, "PEOPLE")
      .where(col("id") > 990).select("id", "name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"), plan)
    assert(q.count() == 9)
  }

  test("partitioned parallel read splits the key range") {
    val part = Jdbc.readPartitioned(spark, url, "PEOPLE", "id", 0L, 1000L, 8)
    assert(part.rdd.getNumPartitions == 8)
    assert(part.count() == 1000)
    assert(part.agg(sum("id")).head().getLong(0) == 999L * 1000 / 2)
  }
}
