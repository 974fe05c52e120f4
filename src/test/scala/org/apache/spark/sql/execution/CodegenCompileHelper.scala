package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Test-only: force-compiles every WholeStageCodegen subtree of a plan with
  * Janino and THROWS on failure. In production a Janino failure is a silent
  * per-task interpreted fallback (plus an attempted compile + exception per
  * stage attempt — the round-1 RowScore bug paid that 1,152 times in one
  * run); specs want it loud. Lives in the spark.sql.execution package to
  * reach the `private[sql]` doCodeGen/compile API.
  */
object CodegenCompileHelper {

  /** Compiles all codegen subtrees; returns how many were compiled. */
  def compileAll(df: DataFrame): Int = {
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val subtrees = exec.collect { case w: WholeStageCodegenExec => w }
    subtrees.foreach { w =>
      val (_, code) = w.doCodeGen()
      CodeGenerator.compile(code) // throws CompileException on Janino failure
    }
    subtrees.size
  }
}
