package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.core.Sid
import graft.functions.{StareClearExpression, StareIntersectsCoverExpression, StareSidExpression}

/** Session extension registering the native STARE expressions with the
  * SQL function registry (SURVEY.md §4.3.2: functions injected via
  * SparkSessionExtensions so plain `spark.sql` and spark-submit
  * `--conf spark.sql.extensions=graft.StareExtensions` get them; the
  * udf-based helpers remain available via StareFunctions.register). */
class StareExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("stare_sid"),
      new ExpressionInfo(classOf[StareSidExpression].getName, "stare_sid"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "stare_sid(lat, lon, level)")
        StareSidExpression(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("stare_clear"),
      new ExpressionInfo(classOf[StareClearExpression].getName, "stare_clear"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "stare_clear(sid)")
        StareClearExpression(exprs(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("stare_intersects_cover"),
      new ExpressionInfo(classOf[StareIntersectsCoverExpression].getName, "stare_intersects_cover"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "stare_intersects_cover(sid, coverArrayLiteral)")
        require(exprs(1).foldable, "the cover must be a foldable array literal")
        val arr = exprs(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
        StareIntersectsCoverExpression(exprs(0), Sid.flattenRuns(Sid.mergedIntervals(arr)))
      }))
  }
}
