package graft.sinks

import org.apache.spark.sql.SparkSession

/** Post-sink output transformation — the reference's transformer stage
  * (`core/transformer/PerRecordTransformer.scala` 216 LoC +
  * `WholeFileTransformer.scala` 207 LoC): after a sink writes, a
  * user-supplied class (loaded by name, method resolved by reflection)
  * rewrites the output — per line, or per whole file. The reflection
  * contract is kept verbatim: `className` with a public `methodName`
  * taking `(String)` or `(String, Map[String, String])`.
  *
  * Execution is where this departs: the reference streams every line
  * through the DRIVER (`Source.fromFile` + a Scala loop — single-threaded,
  * heap-bound on big outputs). [[perRecord]] runs the same contract as one
  * distributed pass — `spark.read.text` → `mapPartitions` (instance +
  * method resolved once per partition, not per line) → `write.text` — so a
  * 100-TB output transforms at cluster width. [[wholeFile]] is inherently
  * one blob in/one blob out, so it stays a driver-side Hadoop-FS call
  * (works on any scheme), as in the reference.
  */
object Transformers {

  private def resolve(className: String, methodName: String): (AnyRef, java.lang.reflect.Method) = {
    val clazz = Class.forName(className)
    val instance = clazz.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    val method = clazz.getMethods.find(m => m.getName == methodName &&
        (m.getParameterCount == 1 || m.getParameterCount == 2))
      .getOrElse(throw new IllegalArgumentException(
        s"$className has no 1- or 2-arg method '$methodName'"))
    (instance, method)
  }

  private def invoke(instance: AnyRef, method: java.lang.reflect.Method,
      line: String, options: Map[String, String]): String =
    (if (method.getParameterCount == 2) method.invoke(instance, line, options)
     else method.invoke(instance, line)).asInstanceOf[String]

  /** Transform every line of the text output at `inputPath` into
    * `outputPath`. Returns the number of lines written. The class is
    * resolved ON THE EXECUTORS (it ships in the application jar), once per
    * partition.
    */
  def perRecord(
      spark: SparkSession,
      inputPath: String,
      outputPath: String,
      className: String,
      methodName: String = "transform",
      options: Map[String, String] = Map.empty): Long = {
    resolve(className, methodName) // fail fast on the driver for bad names
    import spark.implicits._
    val out = spark.read.textFile(inputPath).mapPartitions { lines =>
      val (instance, method) = resolve(className, methodName)
      lines.map(invoke(instance, method, _, options))
    }
    val obs = org.apache.spark.sql.Observation()
    out.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode("overwrite").text(outputPath)
    obs.get("n").asInstanceOf[Long]
  }

  /** Transform one file's entire content in a single call (the reference's
    * whole-file mode — e.g. wrapping an output in an envelope). Driver-side
    * by nature; any Hadoop-supported scheme.
    */
  def wholeFile(
      spark: SparkSession,
      inputPath: String,
      outputPath: String,
      className: String,
      methodName: String = "transform",
      options: Map[String, String] = Map.empty): Unit = {
    val (instance, method) = resolve(className, methodName)
    val inP = new org.apache.hadoop.fs.Path(inputPath)
    val fs = inP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val content = new String(fs.open(inP).readAllBytes(), "UTF-8")
    val transformed = invoke(instance, method, content, options)
    val outP = new org.apache.hadoop.fs.Path(outputPath)
    val os = fs.create(outP, true)
    try os.write(transformed.getBytes("UTF-8")) finally os.close()
  }
}
