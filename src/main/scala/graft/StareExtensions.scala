package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.StareFunctions

/** Session extension registering the FULL STARE SQL surface with the
  * function registry (SURVEY.md §4.3.2): a `spark-submit --conf
  * spark.sql.extensions=graft.StareExtensions` user gets every function
  * — native codegen kernels (stare_sid / stare_clear /
  * stare_intersects_cover), the UDF-backed geometry/cover/TIV
  * surface, and the text/embedding pipeline kernels (text_simhash,
  * text_minhash, emb_cosine, …) — in plain `spark.sql` text with no
  * Scala imports and no
  * session-scoped register() call. The builder list itself lives in
  * StareFunctions.sqlFunctionBuilders so this path and the live-session
  * register() path can never drift apart. Mirrors the reference's
  * dataframe-method surface (staredataframe.py:741-1084). */
class StareExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    StareFunctions.sqlFunctionBuilders.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.StareFunctions", name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity, s"$name expects $arity arguments")
          builder(exprs)
        }))
    }
}
