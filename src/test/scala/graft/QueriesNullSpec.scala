package graft

import org.apache.spark.sql.functions._

/** Null-parity pins for driver queries whose one-scan rewrites must stay
  * byte-equivalent to their SELECT DISTINCT oracle twins on null-bearing
  * data the shipped testdata doesn't contain.
  */
class QueriesNullSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  test("q20: NULL flag values survive the one-scan collect_set shape like DISTINCT") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q20_nulls").toString
    Seq(
      (1L, "A", "F"),
      (2L, null.asInstanceOf[String], "O"),
      (3L, "A", null.asInstanceOf[String]),
      (4L, "A", "F"), // duplicate combination — DISTINCT keeps one
    ).toDF("l_orderkey", "l_returnflag", "l_linestatus")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq("east", "west").toDF("r_name").write.parquet(s"$dir/region.parquet")
    val rows = SparkEntry.queries("q20_all_combinations")(spark, dir)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getString(2)))
    // one row per combination (collect_set + null re-append must not dup)
    assert(rows.distinct.length == rows.length)
    val expected = for {
      rf <- Set(Option("A"), None)
      ls <- Set(Option("F"), Option("O"), None)
      rn <- Set("east", "west")
    } yield (rf, ls, rn)
    assert(rows.toSet == expected)
  }
}
