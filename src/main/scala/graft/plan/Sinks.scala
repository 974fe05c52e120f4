package graft.plan

import org.apache.spark.sql.DataFrame

/** Shared batch-sink writer for [[SinkSpec]]s — the reference's sink
  * conveniences (`core/sink/BatchSinkWriter.scala` partitionDf at 259-265
  * + `FileConsolidator.scala`):
  *
  *  - `partitions` (reference step option of the same name): repartition
  *    to exactly N output files before writing;
  *  - single-FILE output: a sink path ending in a known file extension
  *    (`out/data.csv`, not a directory) means the user wants ONE real
  *    file there — the frame is written `coalesce(1)` to a temp
  *    directory and the single part file is moved to the path (the
  *    reference detects the suffix the same way and consolidates part
  *    files post-write). Single-file paths always replace the target
  *    (there is no appending to one file); `partitionBy` is rejected —
  *    the two are contradictory.
  *
  * Directory sinks behave exactly as before: `DataFrameWriter` with
  * mode/format/options/partitionBy.
  */
object Sinks {

  private val SingleFileExts =
    List(".json", ".csv", ".parquet", ".orc", ".xml", ".txt")

  /** Is this sink path a single-file target? */
  def singleFile(path: String): Boolean =
    SingleFileExts.exists(path.toLowerCase.endsWith)

  def write(df: DataFrame, s0: SinkSpec): Unit = {
    // reference `unwrapTopLevelArray` (BatchSinkWriter.scala:199-226): a
    // single-array-field frame writes as bare JSON array text (`[...]`)
    // instead of one object per line — fixture shape for API mocks
    val (df1, s) =
      if (s0.format == "json" && s0.options.get("unwrapTopLevelArray").contains("true") &&
          df.schema.fields.length == 1 && df.schema.fields.head.dataType.typeName == "array")
        (df.selectExpr(s"TO_JSON(`${df.schema.fields.head.name}`) AS value"),
          s0.copy(format = "text", options = s0.options - "unwrapTopLevelArray"))
      else (df, s0)
    val repart = s.options.get("partitions").flatMap(_.toIntOption)
      .map(n => df1.repartition(n)).getOrElse(df1)
    if (singleFile(s.path)) {
      require(s.partitionBy.isEmpty,
        s"sink '${s.path}': partitionBy and single-file output are contradictory")
      val hconf = df.sparkSession.sparkContext.hadoopConfiguration
      val target = new org.apache.hadoop.fs.Path(s.path)
      val fs = target.getFileSystem(hconf)
      val tmp = new org.apache.hadoop.fs.Path(s.path + ".spark-tmp")
      try {
        repart.coalesce(1).write.mode("overwrite").format(s.format)
          .options(s.options - "partitions").save(tmp.toString)
        val part = fs.listStatus(tmp)
          .find(f => f.isFile && f.getPath.getName.startsWith("part-"))
          .getOrElse(throw new IllegalStateException(
            s"no part file produced under $tmp"))
        fs.delete(target, false)
        require(fs.rename(part.getPath, target), s"rename ${part.getPath} -> $target failed")
      } finally fs.delete(tmp, true)
    } else {
      val w = repart.write.mode(s.mode).format(s.format).options(s.options - "partitions")
      val pw = if (s.partitionBy.nonEmpty) w.partitionBy(s.partitionBy: _*) else w
      pw.save(s.path)
    }
  }
}
