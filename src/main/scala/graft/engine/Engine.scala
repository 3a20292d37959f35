package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session facade for the engine — the Spark analogue of the reference's
  * `build_ctx` (reference: src/lib.rs:21-60), which constructs a
  * SessionContext with default features, registers the random `types`
  * table, the `test` CSV, and the two custom sum UDAFs.
  *
  * Here the same responsibilities are: build a local SparkSession with
  * scale-appropriate defaults (AQE on, shuffle partitions sized to the
  * machine, UTC timezone), register the seeded `types` view, optionally
  * register the testdata parquet tables as views, and register the custom
  * aggregate functions (`sum_custom`, `sum_coercing`).
  *
  * All SQL surface beyond the custom aggregates is inherited from Catalyst,
  * exactly as the reference inherits DataFusion's default SQL surface via
  * `with_default_features()` (reference: src/lib.rs:27-31).
  */
object Engine {

  case class Options(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      typesTableLength: Long = 1024L, // reference default: src/main.rs:16-17
      seed: Long = 42L, // reference is unseeded (rand::thread_rng); we seed for test stability
      shufflePartitions: Int = 32,
      // reference registers datasets/test.csv unconditionally (src/lib.rs:57-58);
      // we bundle the public Apache Arrow aggregate_test_100 fixture and default
      // to it when present so `SELECT * FROM test` works out of the box
      csvPath: Option[String] = Options.defaultCsvPath
  )

  object Options {
    def defaultCsvPath: Option[String] = {
      val p = java.nio.file.Paths.get("datasets", "test.csv")
      if (java.nio.file.Files.exists(p)) Some(p.toString) else None
    }
  }

  /** Build (or reuse) the session and register tables + UDAFs. */
  def build(opts: Options = Options()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(opts.master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", opts.shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    configure(spark, opts)
    spark
  }

  /** Register views + UDAFs on an existing session (idempotent). */
  def configure(spark: SparkSession, opts: Options = Options()): SparkSession = {
    TypesTable.generate(spark, opts.typesTableLength, opts.seed)
      .createOrReplaceTempView("types")
    opts.csvPath.foreach { p =>
      // reference: CsvReadOptions::default() = header + type inference (src/lib.rs:57-58)
      spark.read.option("header", "true").option("inferSchema", "true").csv(p)
        .createOrReplaceTempView("test")
    }
    graft.udaf.Udafs.registerAll(spark)
    spark
  }

  /** Testdata tables (TESTDATA.md). Reading per-query keeps the parquet
    * scan lazy and lets Catalyst push filters/projections to the file. */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    // default; read as Long nanos (queries convert via `ts DIV 1000` →
    // timestamp_micros, preserving exact integer arithmetic)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every testdata table as a temp view named after itself. */
  def registerTestdata(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
