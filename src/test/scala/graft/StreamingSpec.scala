package graft

import graft.streaming.EventsStream

/** Streaming extension: the windowed aggregation over events matches the
  * equivalent batch computation when the finite input is fully drained. */
class StreamingSpec extends SparkSpecBase {

  test("streaming hourly agg matches batch q1 shape and totals") {
    val q = EventsStream.runToMemory(spark, sfDir, "ev_stream_test")
    try {
      val streamed = spark.sql(
        "SELECT sum(n) AS total FROM ev_stream_test").head().getLong(0)
      val batch = SparkEntry.queries("q_events_window")(spark, sfDir)
        .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed == 1000L) // sf0.001 events row count
    } finally q.stop()
  }
}
