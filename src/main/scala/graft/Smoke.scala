package graft
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    val kept = df.where(org.apache.spark.sql.functions.col("keep")).count()
    println(s"SMOKE entry rows=$n kept=$kept")
    df.show(5, 60)
    spark.stop()
  }
}
