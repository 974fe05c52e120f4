package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
    (3L, Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
  ).toDF("id", "a", "b")

  test("vector_dot matches HOF formulation bit-exactly") {
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, z) => acc + z)
    val rows = df.select(call_function("vector_dot", col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
  }

  test("vector_cosine: orthogonal=0, zero-norm=NULL, null-safe") {
    val rows = df.select(col("id"), call_function("vector_cosine", col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(math.abs(rows(2L).asInstanceOf[Double]) < 1e-12)
    assert(rows(3L) == null)
    val withNull = Seq((Array(1.0f), null.asInstanceOf[Array[Float]])).toDF("a", "b")
    assert(withNull.select(call_function("vector_cosine", col("a"), col("b"))).head().isNullAt(0))
  }

  test("length mismatch fails fast") {
    val bad = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(call_function("vector_dot", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }

  test("expression is codegen'd (plan stays in WholeStageCodegen)") {
    // a Range-based frame (a local Seq collapses to LocalTableScan and
    // never enters codegen at all)
    val vecs = spark.range(100).select(
      array((1 to 8).map(i => (col("id") + i).cast("float")): _*).as("a"),
      array((1 to 8).map(i => (col("id") + i * 2).cast("float")): _*).as("b"))
    val q = vecs.select(call_function("vector_cosine", col("a"), col("b")).as("c"))
    val wsc = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.exists(_.toString.contains("vector_cosine")),
      q.queryExecution.executedPlan.toString)
    assert(q.where(col("c") <= 0).count() == 0) // and it executes
  }

  test("SQL surface: registered function usable from spark.sql") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vector_dot(a, b) AS d FROM vecs WHERE id = 1").head()
    assert(r.getDouble(0) == 32.0)
  }
}
