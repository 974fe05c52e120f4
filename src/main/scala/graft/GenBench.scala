package graft

import graft.generator._

/** Apples-to-apples generation benchmark: replicates the REFERENCE'S OWN
  * benchmark workload (`example/.../BenchmarkParquetPlanRun.scala:8-45` —
  * the numbers in BASELINE.md: 1M rows ≈ 44 s on 4 cores) with this
  * engine's declarative generator: regex account ids, ranged
  * double/date/int fields, an array-of-struct update history, a computed
  * field over the nested array (sort_array head), a computed year, and a
  * nested customer_details struct. Faker name/city run through the REAL
  * template expander ([[graft.generator.TemplateField]] — `#{Name.name}` /
  * `#{Address.city}`, the reference's faker-expression surface) instead of
  * the md5 stand-ins earlier rounds used.
  *
  * Usage: SPARK_GRAFT_CPUS=4 RECORD_COUNT=1000000 runMain graft.GenBench
  * Prints one JSON line with seconds + rows/sec.
  */
object GenBench {

  def specs: Seq[FieldSpec] = Seq(
    RegexField("account_id", "ACC[0-9]{8}"),
    DoubleField("balance", 10, 1000),
    DateField("date", "2022-01-01", 365),
    ArraySpec("update_history",
      StructSpec("e", Seq(
        TimestampField("updated_time", "2022-01-01 00:00:00", 86400L * 365),
        OneOfField("status", Seq(("open", 1), ("closed", 1), ("pending", 1), ("suspended", 1))))),
      minLen = 1, maxLen = 5),
    StructSpec("customer_details", Seq(
      TemplateField("name", "#{Name.name}"),
      IntField("age", 18, 90),
      TemplateField("city", "#{Address.city}"))),
    SqlField("year", "year(date)"),
    SqlField("status", "element_at(sort_array(update_history, false), 1).status"))

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("RECORD_COUNT", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val out = sys.env.getOrElse("GEN_BENCH_OUT", s"/tmp/graft_genbench_$rows")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup (plan compilation + codegen paths), then timed run incl. the
    // parquet write — the same boundary the reference measures
    Generator.generate(spark, 10000L, specs, seed = 1L, partitions = cpus * 2)
      .write.mode("overwrite").parquet(out + "_warm")
    val t0 = System.nanoTime()
    val df = Generator.generate(spark, rows, specs, seed = 1L, partitions = cpus * 4)
    if (sys.env.get("GEN_BENCH_NOOP").isDefined)
      df.write.mode("overwrite").format("noop").save()
    else df.write.mode("overwrite").parquet(out)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"generation","rows":$rows,"cpus":$cpus,"sec":$sec%.2f,"rows_per_sec":${(rows / sec).toLong}}""")
    spark.stop()
  }
}
