package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink helpers — the reference's database connectors
  * (postgres/mysql task configs, `api/.../Constants.scala:8-28`;
  * `core/util/DataSourceReader.scala:109-127` jdbc branch) mapped onto
  * Spark's built-in JDBC relation. Round 1 marked this env-blocked ("no
  * driver jars"), but Spark ships Derby (the embedded metastore database) —
  * a real JDBC engine — so the connector path is exercised for real:
  * genuine driver, genuine SQL pushdown, genuine partitioned parallel scans
  * (JdbcSpec). Swapping `url`/`driver` retargets any warehouse.
  */
object Jdbc {

  /** Embedded Derby URL for a local database directory (creates on write). */
  def derbyUrl(dir: String, create: Boolean = true): String =
    s"jdbc:derby:$dir${if (create) ";create=true" else ""}"

  val DerbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("jdbc")
      .option("url", url).option("dbtable", table)
      .save()

  /** Single-partition read (small dims / lookup tables). Filters and column
    * pruning push into the database as SQL (PushedFilters on the scan).
    */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .load()

  /** Partitioned parallel read — the scale path: `numPartitions` concurrent
    * range-bounded queries over `partitionColumn` (the reference reads JDBC
    * sources single-threaded; range splitting is what survives a big table).
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
}
