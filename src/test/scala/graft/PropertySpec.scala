package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.udaf.Udafs

/** Property tests (SURVEY §5): UDAF results track the mathematical sum
  * within float tolerance regardless of data or partitioning. Uses raw
  * scalacheck generators with fixed seeds (scalatestplus bridge is not on
  * the offline classpath). */
class PropertySpec extends SparkSpecBase {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("sum_custom ≈ reference sum under random data and partitioning") {
    Udafs.registerAll(spark)
    import spark.implicits._
    val gen = for {
      xs <- Gen.listOfN(200, Gen.chooseNum(-1000.0f, 1000.0f))
      parts <- Gen.chooseNum(1, 7)
    } yield (xs, parts)
    samples(gen, 10).foreach { case (xs, parts) =>
      val df = xs.toDF("x").repartition(parts)
      df.createOrReplaceTempView("prop_t")
      val got = spark.sql("SELECT sum_custom(x) AS s FROM prop_t").head().getFloat(0)
      val want = xs.map(_.toDouble).sum
      assert(math.abs(got - want) <= math.max(1.0, math.abs(want)) * 1e-3,
        s"got=$got want=$want parts=$parts")
    }
  }

  test("sum_coercing(int) ≡ exact Int32 wrapping sum under partitioning") {
    Udafs.registerAll(spark)
    import spark.implicits._
    val gen = for {
      xs <- Gen.listOfN(100, Gen.chooseNum(Int.MinValue / 2, Int.MaxValue / 2))
      parts <- Gen.chooseNum(1, 5)
    } yield (xs, parts)
    samples(gen, 10).foreach { case (xs, parts) =>
      val df = xs.toDF("x").repartition(parts)
      df.createOrReplaceTempView("prop_i")
      val got = spark.sql("SELECT sum_coercing(x) AS s FROM prop_i").head().getFloat(0)
      val want = xs.foldLeft(0)(_ + _).toFloat // i32 wrap, then f32
      assert(got == want, s"got=$got want=$want parts=$parts")
    }
  }
}
