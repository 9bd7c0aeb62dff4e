package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Bridge into Spark's classic backend: Column <-> catalyst Expression.
  * Spark 4 made Column wrap a ColumnNode; ExpressionUtils is the
  * sanctioned conversion for classic-session extensions (the
  * SparkSessionExtensions function-injection path uses the same shape). */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column -> Expression conversion. ExpressionUtils.expression
    * wraps non-expression ColumnNodes in a lazy, Unevaluable
    * ColumnNodeExpression that only the Dataset-API analyzer resolves;
    * expressions returned from a FunctionRegistry builder (the
    * spark.sql path) never pass through that resolution, so they must
    * be converted up front. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register an expression-builder function on a LIVE session's
    * function registry (the injectFunction path only works at session
    * build time; sessionState is private[sql]). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Append a packed (partitionId << 40 | rowInPartition) LongType id
    * column in a SINGLE pass over the physical InternalRow iterator:
    * no extra Spark job (unlike rdd.zipWithIndex, which runs a
    * partition-count job that re-evaluates the whole upstream plan) and
    * no InternalRow -> Row -> InternalRow re-encode (unlike df.rdd).
    *
    * The id is a pure function of the partitioned input — deterministic
    * across re-computations of the same lineage, which is the property
    * the join-back/pair-dedup call sites need — and unique as long as no
    * partition exceeds 2^40 rows (enforced) and there are fewer than
    * 2^23 partitions (far beyond local or per-stage executor counts;
    * enforced too). Values are NOT contiguous, by design: contiguity
    * would cost a second evaluation of the plan. */
  def withPackedIdColumn(df: DataFrame, name: String): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val spark = ds.sparkSession
    val schema = StructType(df.schema.fields :+ StructField(name, LongType, nullable = false))
    val rdd = ds.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      if (pid >= (1 << 23)) throw new IllegalStateException(
        s"withPackedIdColumn: partition id $pid exceeds the 2^23 packing budget")
      val base = pid.toLong << 40
      var pos = 0L
      // reused envelope rows are safe: RDDScanExec immediately applies an
      // UnsafeProjection per row before anything downstream can buffer
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { r =>
        if (pos == (1L << 40)) throw new IllegalStateException(
          s"withPackedIdColumn: partition $pid exceeds 2^40 rows")
        extra.update(0, base | pos)
        pos += 1L
        joined(r, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    spark.internalCreateDataFrame(rdd, schema)
  }
}
