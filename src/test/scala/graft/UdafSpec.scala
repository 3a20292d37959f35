package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType
import graft.engine.{Engine, TypesTable}
import graft.udaf.Udafs

/** Semantics of the two custom aggregates (SURVEY §2.4):
  * reference parity points — Float32 result type, empty→0.0f (not NULL),
  * coercion trichotomy, partial-merge correctness under repartitioning. */
class UdafSpec extends SparkSpecBase {

  private def withSession[A](f: => A): A = { Udafs.registerAll(spark); f }

  test("sum_custom returns FloatType, matches built-in sum within tolerance") {
    withSession {
      TypesTable.generate(spark, 100000, seed = 7).createOrReplaceTempView("types_t")
      val row = spark.sql(
        "SELECT sum_custom(float) AS s, sum(CAST(float AS DOUBLE)) AS ref FROM types_t").head()
      assert(spark.sql("SELECT sum_custom(float) AS s FROM types_t")
        .schema("s").dataType == FloatType)
      val (s, ref) = (row.getFloat(0), row.getDouble(1))
      assert(math.abs(s - ref) / ref < 1e-4, s"custom=$s ref=$ref")
    }
  }

  test("sum_custom coerces int input to float (reference coerce_types)") {
    withSession {
      val r = spark.sql("SELECT sum_custom(x) AS s FROM VALUES (1), (2), (3) AS t(x)").head()
      assert(r.getFloat(0) == 6.0f)
    }
  }

  test("sum_custom over empty input yields 0.0f, not NULL (cudarc/cubecl quirk)") {
    withSession {
      val r = spark.sql(
        "SELECT sum_custom(x) AS s FROM (SELECT CAST(1.0 AS FLOAT) AS x WHERE 1=0)").head()
      assert(!r.isNullAt(0) && r.getFloat(0) == 0.0f)
    }
  }

  test("sum_coercing int path accumulates in Int32 (32-bit wraparound)") {
    withSession {
      // 2^31-1 + 1 wraps to -2^31 in i32, then cast to float
      val r = spark.sql(
        "SELECT sum_coercing(x) AS s FROM VALUES (2147483647), (1) AS t(x)").head()
      assert(r.getFloat(0) == Int.MinValue.toFloat, s"got ${r.getFloat(0)}")
    }
  }

  test("sum_coercing float path returns Float32 and empty→0.0f") {
    withSession {
      // decimal literals must go through an explicit cast: the reference's
      // coerce_types rejects Decimal input (src/cubecl_sum_udaf.rs)
      val r = spark.sql(
        "SELECT sum_coercing(CAST(x AS DOUBLE)) AS s FROM VALUES (1.5), (2.25) AS t(x)").head()
      assert(r.getFloat(0) == 3.75f)
      val e = spark.sql(
        "SELECT sum_coercing(CAST(1.0 AS DOUBLE)) AS s FROM (SELECT 1 WHERE 1=0)").head()
      assert(!e.isNullAt(0) && e.getFloat(0) == 0.0f)
    }
  }

  test("sum_coercing rejects Decimal input like the reference's coerce_types") {
    withSession {
      val ex = intercept[Exception] {
        spark.sql("SELECT sum_coercing(x) FROM VALUES (1.5), (2.25) AS t(x)").head()
      }
      assert(ex.getMessage.contains("sum_coercing: unsupported input type"))
    }
  }

  test("sum_custom is partition-order invariant within fp tolerance") {
    withSession {
      val df = TypesTable.generate(spark, 50000, seed = 11)
      df.createOrReplaceTempView("t_a")
      df.repartition(17).createOrReplaceTempView("t_b")
      val a = spark.sql("SELECT sum_custom(float) FROM t_a").head().getFloat(0)
      val b = spark.sql("SELECT sum_custom(float) FROM t_b").head().getFloat(0)
      assert(math.abs(a - b) / math.max(1f, a.abs) < 1e-3)
    }
  }

  test("types table: seeded, right schema, value ranges match reference generators") {
    val df = TypesTable.generate(spark, 10000, seed = 42)
    val row = df.agg(
      min(col("float")), max(col("float")),
      min(length(col("string"))), max(length(col("string"))),
      countDistinct(col("string"))).head()
    assert(row.getFloat(0) >= 0f && row.getFloat(1) < 1f)
    assert(row.getInt(2) == 1 && row.getInt(3) == 1)
    assert(row.getLong(4) <= 26)
    // seeded: same seed → same sum
    val s1 = TypesTable.generate(spark, 1000, 5).agg(sum("int")).head().getLong(0)
    val s2 = TypesTable.generate(spark, 1000, 5).agg(sum("int")).head().getLong(0)
    assert(s1 == s2)
  }

  test("engine facade registers types view + UDAFs (README trio runs)") {
    Engine.configure(spark, Engine.Options(typesTableLength = 1024))
    val builtin = spark.sql("SELECT sum(float) FROM types").head().getDouble(0)
    val custom = spark.sql("SELECT sum_custom(float) FROM types").head().getFloat(0)
    val coercing = spark.sql("SELECT sum_coercing(float) FROM types").head().getFloat(0)
    assert(math.abs(builtin - custom) / builtin < 1e-4)
    assert(math.abs(builtin - coercing) / builtin < 1e-4)
  }
}
