package graft.ops

import java.nio.file.Paths
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Engine

/** Scale-oriented join strategies, exercised as oracle-checked queries so
  * the rewrites are proven value-preserving:
  *
  *  - **salted join**: when one join key is pathologically hot, a plain
  *    shuffle join puts the whole hot key in one task. Salting splits the
  *    skewed (left) side into S sub-keys and explodes the build (right)
  *    side S×, so the hot key spreads over S tasks. AQE's skew-join
  *    handles moderate skew automatically; explicit salting is the tool
  *    for the extreme tail (one key = 10% of 100 TB).
  *  - **bucketed join**: pre-bucketing both fact tables on the join key
  *    at write time makes every future join on that key exchange-free —
  *    the physical plan must contain NO shuffle for the join itself.
  */
object Scale {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(spark, dir, name)

  /** Equi-join `left ⋈ right` on `key`, with the left side salted S ways.
    * Result is identical to a plain inner join — verified by oracle.
    *
    * The salt MUST be a pure function of row content (`saltCols`), never
    * of `monotonically_increasing_id()` or `rand()`: under stage retry a
    * recomputed row would draw a different salt and be dropped or
    * duplicated — exactly in the executor-loss regime salting exists
    * for. Content-derived salts are also deterministic, so Catalyst can
    * optimize across them. `saltCols` defaults to every non-key column
    * of `left` (falling back to the key itself when there are none);
    * pass one cheap HIGH-CARDINALITY column when available — if every
    * row of a hot key carries identical salt-column content (e.g. exact
    * replays), all of them draw the same salt and the hot partition is
    * NOT split; a per-row discriminator (line number, offset) restores
    * the spread. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
      saltCols: Seq[Column] = Nil): DataFrame = {
    val nonKey = left.columns.filterNot(_ == key).map(col).toSeq
    val src = if (saltCols.nonEmpty) saltCols
      else if (nonKey.nonEmpty) nonKey
      else Seq(col(key)) // degenerate but defined: single-column frame
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(src: _*), lit(salts)))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<bigint>")))
    saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // salted join ≡ plain join (oracle proves value preservation)
    "q_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      saltedJoin(li, o, "l_orderkey", 8, Seq(col("l_linenumber")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // bucketed tables: join must be exchange-free (asserted in spec)
    "q_bucketed_join" -> ((s, dir) => {
      val wh = Paths.get(sys.props("java.io.tmpdir"), "graft_warehouse").toString
      val sfTag = dir.replaceAll("[^0-9a-zA-Z]", "_")
      val liTbl = s"li_b_$sfTag"
      val oTbl = s"o_b_$sfTag"
      if (!s.catalog.tableExists(liTbl)) {
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
          .write.mode("overwrite").option("path", s"$wh/$liTbl")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(liTbl)
      }
      if (!s.catalog.tableExists(oTbl)) {
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
          .write.mode("overwrite").option("path", s"$wh/$oTbl")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(oTbl)
      }
      val li = s.table(liTbl)
      val o = s.table(oTbl)
      li.join(o.hint("merge"), li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
