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
  *  - file cleanup = one distributed anti-join against the tracked keys;
  *    the caller supplies read/write (so sink conventions — single-file
  *    consolidation, csv headers — round-trip through the same
  *    [[graft.plan.Sinks]] path that wrote the data);
  *  - database cleanup = batched `DELETE WHERE k1=? AND k2=?` executed per
  *    partition of the tracked frame (constraint-preserving — a
  *    truncate-and-reinsert would fight the FK graph), children before
  *    parents.
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

  /** Tracked keys for a step, if any state exists. */
  def tracked(spark: SparkSession, folder: String, plan: String,
      step: String): Option[DataFrame] = {
    val tp = new org.apache.hadoop.fs.Path(trackPath(folder, plan, step))
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tp)) Some(spark.read.parquet(tp.toString)) else None
  }

  /** Drop a step's tracking state. */
  def clear(spark: SparkSession, folder: String, plan: String, step: String): Unit = {
    val tp = new org.apache.hadoop.fs.Path(trackPath(folder, plan, step))
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tp, true)
  }

  /** Remove the tracked rows from a FILE data source: anti-join, then
    * rewrite through the caller's writer (the same sink path that produced
    * the layout — single-file targets stay single files). Returns
    * (rowsBefore, rowsAfter); None when no tracking state exists.
    *
    * Scale note: the surviving rows are materialized (localCheckpoint)
    * before the in-place overwrite — right-sized for test-data cleanup
    * volumes. A deployment rewriting a multi-TB source would instead
    * write the survivors to a sibling temp directory and swap paths
    * (one write, no executor-storage copy); the anti-join itself is
    * already the scalable shape either way.
    */
  def deleteTrackedFromFiles(spark: SparkSession, current: => DataFrame,
      rewrite: DataFrame => Unit, folder: String, plan: String,
      step: String): Option[(Long, Long)] =
    tracked(spark, folder, plan, step).map { keys =>
      // `current` is by-name: a sink that was never written must no-op via
      // the tracking check above, not crash reading a missing path
      val cur = current
      val remaining = ForeignKeys.deleteTracked(cur, keys, keys.columns.toSeq)
      // the rewrite overwrites the files `remaining` reads from —
      // materialize first or the overwrite truncates its own input mid-job
      val snap = remaining.localCheckpoint(true)
      val before = cur.count()
      rewrite(snap)
      clear(spark, folder, plan, step)
      (before, snap.count())
    }

  /** Remove the tracked rows from a DATABASE table: batched keyed DELETEs
    * per partition of the tracked frame — preserves table constraints
    * (truncate-and-reinsert would fight the FK graph). Returns real
    * (rowsBefore, rowsAfter) table counts; None when no tracking state
    * exists.
    */
  def deleteTrackedFromJdbc(spark: SparkSession, url: String, table: String,
      folder: String, plan: String, step: String,
      batchSize: Int = 1000): Option[(Long, Long)] =
    tracked(spark, folder, plan, step).map { keys =>
      def tableCount(): Long = {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
          rs.next(); rs.getLong(1)
        } finally conn.close()
      }
      val before = tableCount()
      val cols = keys.columns.toSeq
      val sql = s"DELETE FROM $table WHERE " + cols.map(c => s"$c = ?").mkString(" AND ")
      keys.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val ps = conn.prepareStatement(sql)
          var pending = 0
          rows.foreach { r =>
            cols.indices.foreach(i => ps.setObject(i + 1, r.get(i)))
            ps.addBatch()
            pending += 1
            if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
          }
          if (pending > 0) ps.executeBatch()
          ps.close()
        } finally conn.close()
      }
      clear(spark, folder, plan, step)
      (before, tableCount())
    }
}
