package graft

/** Every SparkEntry query must plan and execute on sf0.001, and every
  * oracle entry must point at an existing query with matching columns
  * (the driver hash-compares on name-sorted columns). */
class QueriesSmokeSpec extends SparkSpecBase {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes on sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
    }
  }
}
