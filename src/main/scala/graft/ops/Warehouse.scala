package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Engine

/** Warehouse-maintenance operators a lakehouse team runs daily, each
  * re-expressed as a declarative one-pass plan and oracle-checked:
  *
  *  - **SCD type-2 build** (`q_scd2`): compact an append-only change
  *    history into versioned dimension rows with validity intervals.
  *    Two windows, both partitioned by the dimension key — sort state
  *    is per-key, never corpus-wide, so the plan survives any scale-up
  *    where single keys stay bounded (they do: a customer's order
  *    count, not the order total).
  *  - **column profiler** (`q_data_profile`): per-column null count,
  *    exact distinct count, min/max. One aggregation pass PER COLUMN,
  *    unioned — deliberately not one pass with K `count(distinct)`s,
  *    which Catalyst plans via Expand (row multiplication ×K — the
  *    exact plan shape the r8 verdict flagged on `q_agg_distinct`).
  *    Parquet column pruning makes each pass read exactly one column,
  *    so the total I/O is one read of the profiled columns either way,
  *    and each union branch is an independent 2-exchange partial agg.
  */
object Warehouse {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(spark, dir, name)

  /** SCD2 compaction: rows where the tracked attribute actually changed
    * (vs the previous version in key order), each carrying
    * [valid_from, valid_to) and an is_current flag. `orderCols` must be
    * a deterministic total order within a key (include a unique
    * tiebreaker). */
  def scd2(history: DataFrame, key: Column, tracked: Column,
      orderCols: Seq[Column], validFrom: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val changed = history
      .withColumn("__prev", lag(tracked, 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= tracked)
      .drop("__prev")
    // second window runs on the compacted frame: valid_to of version n
    // is valid_from of version n+1 (half-open intervals chain exactly)
    changed
      .withColumn("valid_from", validFrom)
      .withColumn("valid_to", lead(validFrom, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** One profile row for a column: (column, n_rows, n_null, n_distinct,
    * min_s, max_s). `asStr` renders min/max in a form both engines print
    * identically (dates via cast to date, numerics via cast to string). */
  private def profileCol(df: DataFrame, name: String,
      asStr: Column => Column): DataFrame = {
    val c = col(name)
    df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(c)).as("n_null"),
        countDistinct(c).as("n_distinct"),
        asStr(min(c)).as("min_s"),
        asStr(max(c)).as("max_s"))
      .select(lit(name).as("column"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SCD2 dimension build from the orders change history (custkey
    // sample bounds the output; semantics identical at any sample)
    "q_scd2" -> ((s, dir) => {
      val h = t(s, dir, "orders")
        .where(pmod(col("o_custkey"), lit(19)) === 0)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          col("o_orderdate"))
      scd2(h, col("o_custkey"), col("o_orderstatus"),
          Seq(col("o_orderdate"), col("o_orderkey")), col("o_orderdate"))
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderstatus").as("status"), col("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
    }),

    // per-column profile over lineitem: 4 pruned single-column passes
    "q_data_profile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val numeric: Column => Column = _.cast("string")
      val dateS: Column => Column = _.cast("date").cast("string")
      profileCol(li, "l_quantity", numeric)
        .unionAll(profileCol(li, "l_extendedprice", numeric))
        .unionAll(profileCol(li, "l_returnflag", _.cast("string")))
        .unionAll(profileCol(li, "l_shipdate", dateS))
        .orderBy(col("column"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_scd2" ->
      """WITH h AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
        |    lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders WHERE o_custkey % 19 = 0
        |), c AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate
        |  FROM h WHERE prev IS NULL OR prev <> o_orderstatus
        |)
        |SELECT o_custkey, o_orderkey, o_orderstatus AS status,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  (lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL) AS is_current
        |FROM c ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    "q_data_profile" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS "column", count(*) AS n_rows,
        |    count(*) - count(l_quantity) AS n_null,
        |    count(DISTINCT l_quantity) AS n_distinct,
        |    CAST(min(l_quantity) AS VARCHAR) AS min_s,
        |    CAST(max(l_quantity) AS VARCHAR) AS max_s FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
        |    count(DISTINCT l_extendedprice),
        |    CAST(min(l_extendedprice) AS VARCHAR),
        |    CAST(max(l_extendedprice) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
        |    count(DISTINCT l_returnflag),
        |    CAST(min(l_returnflag) AS VARCHAR),
        |    CAST(max(l_returnflag) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
        |    count(DISTINCT l_shipdate),
        |    CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR),
        |    CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR) FROM lineitem
        |) ORDER BY "column"""".stripMargin
  )
}
