package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow accessor for Spark's `private[sql]` Column↔Expression bridge.
  * Spark 4 wraps Column around ColumnNode; converting a custom Catalyst
  * expression (e.g. our DeclarativeAggregate) into a user-facing Column
  * goes through ExpressionUtils, which is sql-package-private — this is
  * the one sanctioned-shape shim the engine needs. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unpersist the block-backed RDD behind a materialized
    * (localCheckpoint'd) DataFrame (ADVICE r15): iterative loops that
    * checkpoint a new frame per round otherwise accumulate O(rounds ×
    * corpus) executor storage — the previous round's blocks are
    * unreferenced the moment the new round's are materialized, but
    * Dataset exposes no way to release them (`unpersist` only clears
    * CacheManager entries). Reaches the `private[sql]` LogicalRDD the
    * checkpoint left as the plan root. MUST only be called on frames
    * no later plan references: localCheckpoint truncates lineage, so an
    * unpersisted frame cannot be recomputed. No-op for reliable
    * checkpoints (their RDD is file-backed, not block-persisted). */
  def unpersistMaterialized(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
