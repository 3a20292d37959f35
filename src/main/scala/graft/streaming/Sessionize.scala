package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Custom-state streaming: per-user sessionization over `events` with
  * `flatMapGroupsWithState` (SURVEY §2.10 extension scope — the stateful
  * API a continuous 100 TB ingest pipeline uses for session windows that
  * plain event-time windows can't express).
  *
  * A session closes when `gapMinutes` pass without an event from that
  * user; state per user is one (start, last, count) triple — bounded, and
  * evicted via event-time timeout as the watermark advances.
  */
object Sessionize {

  case class Event(user_id: Long, ts_us: Long, event_type: String)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  def sessionize(events: Iterator[Event], gapUs: Long): Iterator[Session] = {
    // pure per-user fold, shared by the streaming path and tests
    val sorted = events.toSeq.sortBy(_.ts_us)
    val out = scala.collection.mutable.ArrayBuffer[Session]()
    var cur: Option[SessionState] = None
    sorted.foreach { e =>
      cur match {
        case Some(st) if e.ts_us - st.last <= gapUs =>
          cur = Some(st.copy(last = e.ts_us, n = st.n + 1))
        case Some(st) =>
          out += Session(e.user_id, st.start, st.last, st.n)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
      }
    }
    cur.foreach(st => out += Session(sorted.head.user_id, st.start, st.last, st.n))
    out.iterator
  }

  /** Streaming sessionization over the finite events parquet: groups by
    * user, folds with flatMapGroupsWithState. Finite-input variant: the
    * whole group arrives in one micro-batch, so every session (including
    * the trailing open one) is emitted immediately and state is dropped —
    * no timeout is registered (`GroupStateTimeout.NoTimeout`). An unbounded
    * deployment would instead keep `SessionState` across batches, set
    * `EventTimeTimeout` against a watermark, and emit the open session when
    * the timeout fires. */
  def run(spark: SparkSession, dir: String, name: String, gapMinutes: Int = 30): StreamingQuery = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events: Dataset[Event] = spark.readStream
      .schema(EventsStream.eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("event_type"))
      .as[Event]
    val gapUs = gapMinutes.toLong * 60 * 1000 * 1000

    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          // finite-input variant: fold the whole group, emit all sessions
          val all = sessionize(batch, gapUs).toSeq
          state.remove()
          all.iterator
        })

    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }
}
