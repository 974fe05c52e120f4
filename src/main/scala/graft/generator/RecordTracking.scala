package graft.generator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generated-record tracking + cleanup — the reference's test-data
  * lifecycle (`core/generator/track/RecordTrackingProcessor.scala` +
  * `core/delete/DeleteRecordProcessor.scala`): a generation run appends
  * the rows' KEY columns to a tracking folder; a later delete run removes
  * exactly those rows from the data source again ("clean up the test data
  * you injected"), then drops the tracking state.
  *
  *  - tracked columns = the step's primary-key fields; a step without
  *    declared keys tracks ALL columns (reference `getFieldsToTrack`);
  *  - tracking layout: `<folder>/<plan>/<step>` parquet, append — several
  *    runs accumulate and are cleaned together;
  *  - delete = one distributed anti-join against the tracked keys; for a
  *    file sink the surviving rows are materialized (localCheckpoint)
  *    BEFORE overwriting the path being read.
  */
object RecordTracking {

  def trackPath(folder: String, plan: String, step: String): String =
    s"$folder/$plan/$step"

  /** Append the step's key columns (all columns when `keyCols` empty). */
  def track(df: DataFrame, keyCols: Seq[String], folder: String,
      plan: String, step: String): Unit = {
    val keys = if (keyCols.nonEmpty) df.select(keyCols.map(df.col): _*) else df
    keys.write.mode("append").parquet(trackPath(folder, plan, step))
  }

  /** Remove the tracked rows from a FILE data source (anti-join, rewrite),
    * then clear the step's tracking state. Returns (rowsBefore, rowsAfter);
    * None when no tracking state exists for the step.
    */
  def deleteTrackedFromFiles(spark: SparkSession, format: String, path: String,
      options: Map[String, String], folder: String, plan: String,
      step: String): Option[(Long, Long)] = {
    val tp = trackPath(folder, plan, step)
    val tpPath = new org.apache.hadoop.fs.Path(tp)
    val fs = tpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tpPath)) return None
    val tracked = spark.read.parquet(tp)
    val current = spark.read.format(format).options(options).load(path)
    val remaining = ForeignKeys.deleteTracked(current, tracked, tracked.columns.toSeq)
    // the rewrite overwrites the path `remaining` reads from — materialize
    // first or the overwrite truncates its own input mid-job
    val snap = remaining.localCheckpoint(true)
    val before = current.count()
    snap.write.mode("overwrite").format(format).options(options).save(path)
    fs.delete(tpPath, true)
    Some((before, snap.count()))
  }
}
