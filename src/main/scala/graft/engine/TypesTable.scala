package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType}

/** The reference's in-memory random `types` table (reference:
  * src/lib.rs:36-52, generators :62-75): schema
  * `(string Utf8, float Float32, int Int32)`, all non-nullable;
  * `string` is one random lowercase letter, `float` is uniform f32 in
  * [0,1), `int` is a full-range random i32.
  *
  * The reference generates with an unseeded `rand::thread_rng`
  * (src/lib.rs:63,73); we generate with Spark's seeded `rand()` so golden
  * and property tests are reproducible. Generation is fully distributed:
  * `spark.range(n)` partitions the id space across executors and every
  * column derives from codegen'd expressions — no driver-side data, so the
  * same code generates a 10^6-row table locally or a 10^11-row table on a
  * cluster.
  */
object TypesTable {

  private val Letters = "abcdefghijklmnopqrstuvwxyz"

  def generate(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    // fixed partition count: rand(seed) seeds PER PARTITION, so letting
    // spark.range default to the core count would make the generated
    // data depend on the machine — 64 partitions keeps the table
    // identical everywhere while still parallelizing generation
    val parts = 64
    // rand(s) draws from stream (s + partitionIndex), so adjacent column
    // seeds alias across partitions (column k, partition p == column k+1,
    // partition p-1). Space the seeds far beyond any partition count so
    // the three columns are statistically independent streams.
    val colSeed = (k: Int) => seed + k.toLong * 0x100000L
    spark.range(0L, n, 1L, parts).select(
      // one uniform lowercase letter (reference: src/lib.rs:62-67)
      lit(Letters).substr((floor(rand(colSeed(0)) * 26) + 1).cast(IntegerType), lit(1))
        .alias("string"),
      // uniform f32 in [0,1) (reference: src/lib.rs:69-75)
      rand(colSeed(1)).cast(FloatType).alias("float"),
      // full-range i32 (reference: rand::Standard over i32, src/lib.rs:69-75)
      (floor(rand(colSeed(2)) * 4294967296L) - 2147483648L).cast(IntegerType).alias("int")
    )
  }
}
