package graft

import graft.functions.ExtractTextExpression
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — the canonical way to install the
  * engine's Catalyst extensions into any session, including spark-submit
  * jobs that never touch engine code directly:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * Currently injects the native `extract_text` expression for SQL use.
  * (No custom planner strategies or logical rules are registered: the
  * engine's MERGE is deliberately expressed as Catalyst-planned dataflow —
  * SURVEY.md §4.3 — so there is nothing the optimizer needs taught.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("extract_text"),
      new ExpressionInfo(classOf[ExtractTextExpression].getName,
        "extract_text"),
      (children: Seq[Expression]) => ExtractTextExpression(children.head)))
  }
}
