package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering the engine's native Catalyst functions.
  * Install via `GraftSession` (programmatic `withExtensions`) or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` on any
  * spark-submit — the cluster-deployment path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "vector_dot(a, b) takes 2 arguments")
        VectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[VectorCosine].getName, "vector_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "vector_cosine(a, b) takes 2 arguments")
        VectorCosine(children.head, children(1))
      }))
  }
}
