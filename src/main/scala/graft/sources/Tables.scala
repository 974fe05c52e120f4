package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-table sinks: partitioned and BUCKETED writes — the physical
  * layouts that make 100 TB joins cheap. The reference writes `partitionBy`
  * file sinks (`core/sink/BatchSinkWriter.scala:110-128`) and defers
  * co-location to Iceberg; with Spark's session catalog both layouts work
  * first-class:
  *
  *  - [[writePartitioned]]: one directory per partition value → partition
  *    PRUNING (a filter on the partition column skips whole directories);
  *  - [[writeBucketed]]: rows hash-bucketed (and sorted) by key → two tables
  *    bucketed the same way JOIN WITHOUT ANY EXCHANGE (TablesSpec asserts a
  *    zero-shuffle sort-merge join) — the "pre-shuffled" layout for the
  *    image_id-keyed tables this pipeline joins repeatedly (annotations ×
  *    metrics × embeddings).
  */
object Tables {

  def writePartitioned(
      df: DataFrame,
      table: String,
      partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).saveAsTable(table)

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.read.table(table)
}
