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
    * DETERMINISM CONTRACT (ADVICE r5): the id is a pure function of the
    * input's per-partition row ORDER. Scans, narrow ops, and cached
    * (materialized) frames have deterministic order; rows arriving
    * through an exchange (join/aggregate/repartition/...) do NOT — the
    * shuffle-fetch arrival order can differ between two independent
    * evaluations of the same plan, and call sites that evaluate the
    * id-bearing frame in TWO subtrees of one query (shuffleJoin's left
    * path, StareJoin.join) would pair rows against mismatched ids.
    * Callers with such lineages must stabilize order first —
    * StareJoin.withStableId does this automatically via
    * `hasOrderHazard` + an intra-partition sort.
    *
    * Ids are unique as long as no partition exceeds 2^40 rows
    * (enforced) and there are fewer than 2^23 partitions (far beyond
    * local or per-stage executor counts; enforced too). Values are NOT
    * contiguous, by design: contiguity would cost a second evaluation
    * of the plan. */
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

  /** True when the frame's lineage can deliver rows in a partition in a
    * NON-deterministic order across independent evaluations: any
    * exchange-bearing operator (join, aggregate, window, repartition,
    * global sort — sorts are only deterministic up to key ties, so they
    * count) below it. Uses the OPTIMIZED plan so cache substitution has
    * happened: a materialized InMemoryRelation is a leaf with frozen
    * block order — deterministic, and traversal stops there. */
  def hasOrderHazard(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ds.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort => true
      case _: RepartitionOperation | _: Deduplicate     => true
      case _: Except | _: Intersect                     => true
      case _                                            => false
    }
  }

  /** Orderable per Catalyst's ordering rules (MapType is not). */
  def isOrderable(dt: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
}
