package graft.sinks

import graft.SparkSuite
import java.nio.file.Files

/** User-style transformer classes resolved by name, as the reference's
  * reflection contract requires (public no-arg constructor + a 1- or
  * 2-arg String method).
  */
class UpperCaseTransformer {
  def transform(line: String): String = line.toUpperCase
}

class EnvelopeTransformer {
  def transform(content: String, options: Map[String, String]): String =
    options.getOrElse("prefix", "[") + content + options.getOrElse("suffix", "]")
}

class TransformersSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark
  import graft.SharedSpark.spark.implicits._

  test("perRecord: distributed line transform through a reflection-loaded class") {
    val in = Files.createTempDirectory("graft_tx_in").toString + "/data"
    val out = Files.createTempDirectory("graft_tx_out").toString + "/data"
    Seq("alpha", "bravo", "charlie").toDF("value").repartition(2)
      .write.text(in)
    val n = Transformers.perRecord(s, in, out,
      "graft.sinks.UpperCaseTransformer")
    assert(n == 3)
    val lines = s.read.textFile(out).collect().toSet
    assert(lines == Set("ALPHA", "BRAVO", "CHARLIE"))
    // bad class/method fail fast on the driver
    intercept[ClassNotFoundException](
      Transformers.perRecord(s, in, out, "no.such.Clazz"))
    intercept[IllegalArgumentException](
      Transformers.perRecord(s, in, out, "graft.sinks.UpperCaseTransformer", "nope"))
  }

  test("wholeFile: single-blob transform with options") {
    val dir = Files.createTempDirectory("graft_tx_whole")
    val in = dir.resolve("in.json")
    Files.writeString(in, """{"a":1}""")
    val out = dir.resolve("out.json").toString
    Transformers.wholeFile(s, in.toString, out,
      "graft.sinks.EnvelopeTransformer", "transform",
      Map("prefix" -> "{\"records\":[", "suffix" -> "]}"))
    assert(Files.readString(java.nio.file.Paths.get(out)) == """{"records":[{"a":1}]}""")
  }
}
