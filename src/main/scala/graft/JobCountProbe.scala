package graft

import org.apache.spark.sql.SparkSession

/** Job-round counter (r16 evidence probe): run a query builder + noop
  * sink once and report how many Spark JOBS the invocation scheduled —
  * the driver-action count the ann_ivf_pq / bpe / clusterLabels
  * optimizations exist to cut (guide §1.5: sequential job rounds are
  * pure latency at any scale). Diagnostic main — never a declared row.
  *
  * Usage: tools/run.sh graft.JobCountProbe <query[,query...]>
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("ann_ivf_pq").split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Scratch.install("jobcount", preferTmpfs = true): Unit
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Engine.tune(spark)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val stages = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
        override def onStageSubmitted(
            e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          stages.incrementAndGet(): Unit
      })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      jobs.set(0L); stages.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      println(f"JOBS $name%-28s jobs=${jobs.get()}%3d stages=${stages.get()}%3d wall=$wall%6.2fs")
    }
    spark.stop()
  }
}
