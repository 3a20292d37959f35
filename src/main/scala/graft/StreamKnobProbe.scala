package graft

import org.apache.spark.sql.SparkSession

/** Throwaway experiment harness for the streaming-floor work (r16):
  * runs selected streaming rows under session-conf variants to isolate
  * which fixed term (state-store maintenance, partition count, WAL)
  * the wall actually pays. Diagnostic main — never a declared query.
  *
  * Usage: tools/run.sh graft.StreamKnobProbe <query[,query...]> [runs]
  */
object StreamKnobProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_events_window_stream")
      .split(",").toSeq
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Scratch.install("knobprobe", preferTmpfs = true): Unit
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Engine.tune(spark)

    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map.empty,
      "noval" -> Map(
        "spark.sql.streaming.stateStore.commitValidation.enabled" -> "false"),
      "noval+nomaint" -> Map(
        "spark.sql.streaming.stateStore.commitValidation.enabled" -> "false",
        "spark.sql.streaming.stateStore.maintenanceInterval" -> "3600s"),
      "baseline2" -> Map.empty,
      "sp8" -> Map("spark.sql.shuffle.partitions" -> "8")
    )

    if (sys.env.get("SPARK_GRAFT_KNOB_JSON").contains("1")) {
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
            println(s"PROGRESS ${e.progress.json}")
          override def onQueryTerminated(
              e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        })
    }

    names.foreach { name =>
      val fn = graft.streaming.StreamQueries.queries(name)
      // warmup: replay dir + codegen
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      variants.foreach { case (tag, conf) =>
        val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        val walls = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        prev.foreach { case (k, vo) => vo match {
          case Some(v) => spark.conf.set(k, v)
          case None => spark.conf.unset(k)
        } }
        println(f"$name%-26s $tag%-14s min=${walls.min}%6.2fs  runs=${walls.map(w => f"$w%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
