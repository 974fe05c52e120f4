package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (reference test style:
  * `app/src/test/.../core/util/SparkSuite.scala:7-21`). One session per JVM —
  * suites must not stop() it.
  */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local(8)
}

abstract class SparkSuite extends AnyFunSuite {
  def spark: SparkSession = SharedSpark.spark
}
