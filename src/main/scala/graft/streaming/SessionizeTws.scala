package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.streaming.Sessionize.{Session, SessionState, TimedEvent}

/** Sessionization on `transformWithState` — Spark 4's arbitrary
  * stateful API (the successor of `flatMapGroupsWithState`): typed
  * named state (`ValueState`) plus EXPLICIT event-time timers replace
  * the single implicit GroupState + timeout. Semantics are
  * deliberately identical to [[Sessionize.incremental]] — same fold,
  * same min/max bounds rule, same timer clamp — so the driver row
  * replays the same multi-batch input and hash-compares against the
  * same batch oracle: two independent stateful-API implementations
  * pinned to one result.
  *
  * API differences this surfaces (and the driver row exercises):
  *  - state is NAMED and typed per variable (`session`, `timerTs`),
  *    not one opaque blob;
  *  - timers are explicit: `registerTimer` ADDS a timer, so re-arming
  *    on every batch requires deleting the previous one — its
  *    timestamp is itself state;
  *  - expiry arrives in `handleExpiredTimer`, not as a flagged
  *    invocation of the input handler;
  *  - the state-v2 backend requires the RocksDB state store provider
  *    (state off-heap on local disk — the production pick at real
  *    state sizes), which the entry sets per query.
  */
object SessionizeTws {

  class Processor(gapMinutes: Int)
      extends StatefulProcessor[Long, TimedEvent, Session] {
    private val gapUs = gapMinutes.toLong * 60 * 1000 * 1000
    private val gapMs = gapMinutes.toLong * 60 * 1000
    @transient private var sess: ValueState[SessionState] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sess = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)
      timer = getHandle.getValueState[Long]("timerTs",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[Session] = {
      val evs = rows.toSeq
        .map(e => e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L)
        .sorted
      val out = scala.collection.mutable.ArrayBuffer[Session]()
      var cur = if (sess.exists()) Some(sess.get()) else None
      evs.foreach { us =>
        cur match {
          case Some(st) if us - st.last <= gapUs =>
            // min/max, not overwrite — the Sessionize.incremental rule
            cur = Some(SessionState(
              math.min(st.start, us), math.max(st.last, us), st.n + 1))
          case Some(st) =>
            out += Session(user, st.start, st.last, st.n)
            cur = Some(SessionState(us, us, 1))
          case None =>
            cur = Some(SessionState(us, us, 1))
        }
      }
      cur.foreach { st =>
        sess.update(st)
        // fire once the watermark passes last+gap; clamp above the
        // current watermark (required when replaying old data)
        val expiry = math.max(st.last / 1000 + gapMs,
          timerValues.getCurrentWatermarkInMs() + 1)
        if (timer.exists()) getHandle.deleteTimer(timer.get())
        getHandle.registerTimer(expiry)
        timer.update(expiry)
      }
      out.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Session] = {
      val out =
        if (sess.exists()) {
          val st = sess.get()
          Iterator.single(Session(user, st.start, st.last, st.n))
        } else Iterator.empty
      sess.clear()
      timer.clear()
      out
    }
  }

  /** The [[Sessionize.incremental]] twin on the new API. */
  def incremental(events: Dataset[TimedEvent],
      gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .transformWithState(new Processor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
