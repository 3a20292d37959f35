package graft

import org.apache.spark.sql.functions._

/** Error-bound checks for the two sketch aggregates. Their queries are
  * rows-only for the driver (HLL / t-digest internals differ from
  * DuckDB's algorithms, so no cross-engine hash can exist) — these specs
  * are the corresponding correctness evidence: the sketches must land
  * within their documented error of the EXACT answers, at sf0.01 so the
  * groups are big enough for the bounds to be meaningful.
  */
class SketchAccuracySpec extends SparkSpecBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("approx_count_distinct is within 15% (3x the default 5% rsd) of exact") {
    // Spark's HLL++ default rsd is 0.05; per-group error beyond 3x the
    // rsd would indicate a broken sketch, not normal estimation noise
    // the 15% bracket now rides INSIDE the query as a boolean the
    // driver oracle pins TRUE; this spec asserts the same bit and that
    // the groups are big enough for the bound to be meaningful
    val rows = SparkEntry.queries("q_agg_approx_distinct")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts")
      assert(exact > 100, s"group too small for a meaningful bound: $r")
      assert(r.getAs[Boolean]("hll_within_15pct"),
        s"flag=${r.get(0)}: HLL estimate outside 15% of exact=$exact")
    }
  }

  test("percentile_approx(p50, acc=1000) lands within rank 0.45..0.55 of exact") {
    // the t-digest-style sketch guarantees RANK error <= 1/accuracy, not
    // value error; assert the approx median's value sits between the
    // exact 45th and 55th percentiles (50x looser than the 1/1000
    // guarantee — failure means the sketch is wrong, not unlucky)
    // the rank-window bracket now rides INSIDE the query as a boolean
    // the driver oracle pins TRUE; the spec asserts the same bit and
    // independently recomputes the sketch to keep a direct value check
    val rows = SparkEntry.queries("q_agg_approx_percentile")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_in_rank_bounds"),
        s"${r.get(0)}: sketch p50 outside exact p45..p55")
    }
    val direct = graft.engine.Engine.table(spark, sf01, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("pa"),
        percentile(col("o_totalprice"), lit(0.45)).as("lo"),
        percentile(col("o_totalprice"), lit(0.55)).as("hi"))
      .collect()
    direct.foreach { r =>
      assert(r.getDouble(1) >= r.getDouble(2) && r.getDouble(1) <= r.getDouble(3),
        s"${r.get(0)}: p50_approx=${r.getDouble(1)} outside [${r.getDouble(2)}, ${r.getDouble(3)}]")
    }
  }
}
