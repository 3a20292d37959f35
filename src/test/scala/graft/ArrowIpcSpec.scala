package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.ArrowIpc

/** Roundtrip correctness for the Arrow IPC source/sink (the oracle path
  * covers the aggregate shape; this pins raw values, nulls, every
  * supported type, and the multi-part-file layout). */
class ArrowIpcSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("dt", DateType)))

  test("arrow IPC roundtrip preserves values, nulls, and all supported types") {
    val rows = Seq(
      Row(1L, 10, 1.5, 2.5f, "alpha", true, java.sql.Date.valueOf("2020-01-31")),
      Row(2L, null, null, null, null, null, null),
      Row(3L, -7, -0.25, 0.0f, "Ω utf8 ✓", false, java.sql.Date.valueOf("1969-07-20")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema) // 3 partitions → 3 part files
    val dir = java.nio.file.Files.createTempDirectory("graft_arrow").toString
    ArrowIpc.write(df, dir)
    val files = new java.io.File(dir).list().filter(_.endsWith(".arrow"))
    assert(files.length == 3, s"expected one part file per partition: ${files.toSeq}")
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema == schema)
    assert(back.collect().toSet == rows.toSet)
  }

  test("arrow IPC rejects unsupported types loudly") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val dir = java.nio.file.Files.createTempDirectory("graft_arrow_bad").toString
    val e = intercept[IllegalArgumentException](ArrowIpc.write(df, dir))
    assert(e.getMessage.contains("unsupported"))
  }

  test("arrow IPC: empty frame roundtrips (schema-carrier part), partial reads don't wedge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_arrow_empty").toString
    ArrowIpc.write(spark.range(0).select($"id").toDF(), dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id") && back.count() == 0)
    // early-abort consumption (limit) must work — resources are closed
    // via the task-completion listener, not only on full drain
    val dir2 = java.nio.file.Files.createTempDirectory("graft_arrow_lim").toString
    ArrowIpc.write(spark.range(0, 1000, 1, 2).select($"id").toDF(), dir2)
    assert(ArrowIpc.read(spark, dir2).limit(3).collect().length == 3)
  }

  test("arrow IPC read refuses a directory without the _SUCCESS marker") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_arrow_nos").toString
    ArrowIpc.write(Seq(1L, 2L).toDF("id"), dir)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_SUCCESS"))
    val e = intercept[IllegalArgumentException](ArrowIpc.read(spark, dir))
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("arrow IPC batches: a >8192-row partition roundtrips exactly") {
    import spark.implicits._
    val df = spark.range(0, 20000, 1, 1)
      .select($"id", ($"id" % 97).cast("int").as("i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_arrow_big").toString
    ArrowIpc.write(df.toDF(), dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.count() == 20000)
    assert(back.agg(org.apache.spark.sql.functions.sum($"id")).head().getLong(0)
      == (0L until 20000L).sum)
  }
}
