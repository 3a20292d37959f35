package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Engine.tune(spark)
    new java.io.File(outDir).mkdirs()
    // optional name filter (comma-separated) for fast local iteration;
    // the driver never sets it, so the full dump is the default
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // r10 verdict task 4: the README-trio row's oracle input — the
    // seeded 1M-row types table, dumped NEXT TO the output dir (never
    // inside it: the driver globs outDir's subdirectories as query
    // results). The __GRAFT_TYPES1M__ placeholder in the trio's oracle
    // SQL becomes this absolute path so DuckDB aggregates the exact
    // same float32 column Spark aggregated.
    // absolute: the oracle SQL's interpolated path is resolved by the
    // driver's DuckDB process from ITS working directory, not ours
    val typesDir = Paths.get(s"${outDir.stripSuffix("/")}__aux/types_1m")
      .toAbsolutePath.toString
    graft.engine.TypesTable.generate(spark, 1000000L, seed = 42)
      .write.mode("overwrite").parquet(typesDir)
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("__GRAFT_TYPES1M__", typesDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
