package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-gated entries that exercise the STREAMING code paths
  * themselves (SURVEY §2.10): the batch gaps-and-islands twin
  * (`q_sessionize`) verifies the SEMANTICS, but until round 8 no
  * CORRECTNESS row ran the `flatMapGroupsWithState` operator — its
  * specs lived only in ScalaTest. Here the finite events table is
  * replayed through the real streaming engine with
  * `Trigger.AvailableNow` (micro-batches until the source is
  * exhausted, then terminate) into a memory sink, and the emitted
  * sessions are numbered per user by session start — producing the
  * exact frame the batch twin yields, so BOTH entries share one
  * oracle SQL and the stream path is hash-compared against DuckDB.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize_stream" -> ((s, dir) => {
      val sink = "q_sessionize_stream_sink"
      // runs to completion inside the entry (AvailableNow terminates
      // once caught up); the memory-sink rows outlive the query object
      Sessionize.run(s, dir, sink, availableNow = true)
      // sessions of one user are time-disjoint, so numbering by
      // start_us reproduces the batch twin's cumulative sess_no
      val w = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
      s.table(sink)
        .select(col("user_id"),
          row_number().over(w).cast("long").as("sess_no"),
          col("n_events"), col("start_us"), col("end_us"))
        .orderBy(col("user_id"), col("sess_no"))
    })
  )

  /** Same oracle as the batch twin — shared by reference so the two
    * entries can never drift. */
  val oracleSql: Map[String, String] = Map(
    "q_sessionize_stream" -> graft.ops.Analytical.oracleSql("q_sessionize")
  )
}
