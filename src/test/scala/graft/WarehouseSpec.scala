package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-9 additions: SCD2 interval algebra,
  * profiler self-consistency, shard-manifest conservation, containment
  * admission, standardization moments, range-search/top-k consistency.
  * (Value-level cross-engine checks live in the driver oracle gate;
  * these assert the structural invariants a hash can't articulate.) */
class WarehouseSpec extends SparkSpecBase {

  test("q_scd2: intervals chain half-open per key, exactly one current row") {
    val rows = SparkEntry.queries("q_scd2")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, hist) =>
      // exactly one open interval per dimension key
      assert(hist.count(_.getBoolean(5)) == 1)
      def ts(r: Row, i: Int) = r.getAs[java.time.LocalDateTime](i)
      val sorted = hist.sortBy(r => (ts(r, 3).toString, r.getLong(1)))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // valid_to of version n IS valid_from of version n+1
          assert(ts(a, 4) == ts(b, 3))
          // consecutive versions differ in the tracked attribute
          assert(a.getString(2) != b.getString(2))
        case _ => ()
      }
      // only the last version is open-ended
      assert(sorted.last.isNullAt(4) && sorted.init.forall(!_.isNullAt(4)))
    }
  }

  test("q_scd2_asof: one row per key, every interval straddles the as-of date") {
    val asOf = java.time.LocalDate.parse("1995-06-15").atStartOfDay()
    val snap = SparkEntry.queries("q_scd2_asof")(spark, sfDir).collect()
    assert(snap.nonEmpty)
    assert(snap.map(_.getLong(0)).distinct.length == snap.length,
      "point-in-time read must yield exactly one version per key")
    snap.foreach { r =>
      val from = r.getAs[java.time.LocalDateTime](3)
      assert(!from.isAfter(asOf), s"valid_from $from after as-of")
      if (!r.isNullAt(4))
        assert(r.getAs[java.time.LocalDateTime](4).isAfter(asOf),
          "closed interval must end after the as-of date")
    }
    // the snapshot is exactly the q_scd2 rows whose interval contains T
    val full = SparkEntry.queries("q_scd2")(spark, sfDir).collect()
      .filter { r =>
        val from = r.getAs[java.time.LocalDateTime](3)
        !from.isAfter(asOf) &&
          (r.isNullAt(4) || r.getAs[java.time.LocalDateTime](4).isAfter(asOf))
      }.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(snap.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      == full, "snapshot must be the interval-containment slice of q_scd2")
  }

  test("q_events_stickiness: ratio on [0,1], dau never exceeds mau") {
    val rows = SparkEntry.queries("q_events_stickiness")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (day, dau, mau, st) =>
      assert(dau <= mau, s"$day: dau $dau > mau $mau")
      assert(st >= 0.0 && st <= 1.0, s"$day: stickiness $st")
    }
    // spot-check one populated day against a direct distinct count
    val (day, dau, _, _) = rows.maxBy(_._2)
    val direct = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("user_id", "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d")
      .where(s"CAST(d AS STRING) = '$day'")
      .selectExpr("user_id").distinct().count()
    assert(dau == direct, s"$day: dau $dau != direct $direct")
  }

  test("q_events_time_to_convert: percentiles ordered, exact plain recount") {
    val r = SparkEntry.queries("q_events_time_to_convert")(spark, sfDir)
      .collect().head
    val (n, p25, p50, p90, mx) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
    assert(n > 0 && p25 <= p50 && p50 <= p90 && p90 <= mx)
    // exact recount: first view → first purchase per user, p50 pinned
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS t").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    def firstBy(t: String) = ev.filter(_._2 == t).groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val fv = firstBy("view"); val fb = firstBy("purchase")
    val deltas = fv.keySet.intersect(fb.keySet).toSeq
      .map(u => (fb(u) - fv(u), u)).filter(_._1 >= 0)
      .map(t => t._1 / 1000000L).sorted
    assert(n == deltas.length)
    val idx = 0.5 * (deltas.length - 1)
    val (lo, hi) = (deltas(idx.toInt), deltas(math.ceil(idx).toInt))
    val want = math.rint((lo + (idx - idx.toInt) * (hi - lo)) * 10000) / 10000
    assert(p50 == want, s"p50 $p50 != recount $want")
  }

  test("q_events_new_vs_returning: decomposition exact, news sum to the cohort") {
    val rows = SparkEntry.queries("q_events_new_vs_returning")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, dau, nw, ret) =>
      assert(nw + ret == dau && nw >= 0 && ret >= 0, s"$d: $nw+$ret!=$dau") }
    // every user is new exactly once: Σ n_new = distinct users
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.map(_._3).sum == users)
    // day 1 has no possible returners
    assert(rows.head._4 == 0L, "first day must be all-new")
  }

  test("q_events_session_stats: totals reconcile with the raw session frame") {
    val r = SparkEntry.queries("q_events_session_stats")(spark, sfDir)
      .collect().head
    val sessions = SparkEntry.queries("q_sessionize")(spark, sfDir).collect()
    assert(r.getLong(1) == sessions.length, "n_sessions matches q_sessionize")
    assert(r.getLong(0) == sessions.map(_.getLong(0)).distinct.length)
    assert(r.getLong(3) >= 1L)
    val meanEv = sessions.map(_.getLong(2)).sum.toDouble / sessions.length
    assert(math.abs(r.getDouble(4) - meanEv) < 1e-5, "mean events per session")
    assert(r.getDouble(5) <= r.getDouble(6), "p50 <= p90 duration")
  }

  test("q_data_profile: counts reconcile and min<=max per column") {
    val rows = SparkEntry.queries("q_data_profile")(spark, sfDir).collect()
    assert(rows.length == 4)
    val nRows = rows.map(_.getLong(1)).distinct
    assert(nRows.length == 1 && nRows.head > 0) // one table, one row count
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)) // n_null
      assert(r.getLong(3) <= r.getLong(1) - r.getLong(2)) // distinct <= non-null
      assert(r.getString(4) <= r.getString(5) ||
        r.getString(0) != "l_returnflag") // string min<=max (lexical)
    }
  }

  test("mm_shard_manifest: byte/sample conservation, contiguous shard ids") {
    val m = SparkEntry.queries("mm_shard_manifest")(spark, sfDir).collect()
    val media = ext.Multimodal.mediaTable(spark, sfDir)
    val Row(totBytes: Long, totDocs: Long) = media
      .agg(sum(octet_length(col("payload")).cast("long")), count(lit(1)))
      .head()
    assert(m.map(_.getLong(1)).sum == totDocs)
    assert(m.map(_.getLong(2)).sum == totBytes)
    // greedy cumsum packing ⇒ shard ids are 0..n-1 with no holes
    assert(m.map(_.getLong(0)).toSeq == (0L until m.length).toSeq)
    // every shard's byte mass stays near the target: a shard closes the
    // first time the running sum crosses a 16 KB boundary, so it can
    // exceed 16 KB by at most one max-payload and undershoot only when
    // the next sample would overflow
    val maxPayload = media.agg(max(octet_length(col("payload")).cast("long")))
      .head().getLong(0)
    m.init.foreach(r => assert(r.getLong(2) < 16384 + maxPayload))
  }

  test("dedup_containment: admission exact, inter bounded by both sizes") {
    val rows = SparkEntry.queries("dedup_containment")(spark, sfDir).collect()
    assert(rows.nonEmpty) // non-vacuous at sf0.001 (12 pairs planted)
    rows.foreach { r =>
      val (inter, mn) = (r.getLong(2), r.getLong(3))
      assert(2 * inter >= mn && inter <= mn)
      assert(r.getDouble(4) >= 0.5 && r.getDouble(4) <= 1.0)
    }
  }

  test("emb_standardize: z-scores have ~zero global mean per construction") {
    val rows = SparkEntry.queries("emb_standardize")(spark, sfDir).collect()
    assert(rows.forall(_.getLong(1) == rows.head.getLong(1))) // equal dims
    // per-dim mean of z is 0 exactly, so the micro-grid sums cancel up
    // to per-element rounding (≤ 0.5 micro-units each)
    val slack = rows.length.toLong * rows.head.getLong(1)
    assert(math.abs(rows.map(_.getLong(2)).sum) <= slack)
  }

  test("ann_range_search: threshold respected; top-5 hits above τ appear") {
    val range = SparkEntry.queries("ann_range_search")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(range.nonEmpty && range.forall(_._3 >= 0.3))
    val top5Above = SparkEntry.queries("ann_bruteforce")(spark, sfDir).collect()
      .filter(_.getDouble(3) >= 0.3).map(r => (r.getLong(0), r.getLong(2)))
    val rangeSet = range.map(t => (t._1, t._2)).toSet
    top5Above.foreach(p => assert(rangeSet.contains(p)))
  }

  test("text_dsir: target-domain docs outscore the rest on average") {
    val w = SparkEntry.queries("text_dsir")(spark, sfDir)
    val docs = engine.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    val byIsEn = w.join(docs, Seq("doc_id"))
      .groupBy((col("lang") === "en").as("is_en"))
      .agg(avg(col("dsir") / col("n_tok")).as("a"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    val (enAvg, restAvg) = (byIsEn(true), byIsEn(false))
    // the weight is log p_target/p_raw summed over tokens: the slice
    // that DEFINES the target must score higher per token than its
    // complement, or the estimator is broken
    assert(enAvg > restAvg)
  }

  test("emb_outliers: <=5 per cluster, distances non-increasing in rank") {
    val rows = SparkEntry.queries("emb_outliers")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, cl) =>
      val byRank = cl.sortBy(_.getLong(1))
      assert(byRank.length <= 5)
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length).toSeq)
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(3) >= b.getDouble(3))
        case _ => ()
      }
    }
    // the outliers are the cluster's OWN farthest members: every (cluster,
    // vec) pair must appear in the assignment with the same distance
    val assign = SparkEntry.queries("emb_kmeans")(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      assert(assign((r.getLong(0), r.getLong(2))) == r.getDouble(3))
    }
  }

  test("text_ccnet_bucket: buckets partition each language; head outscores tail") {
    val rows = SparkEntry.queries("text_ccnet_bucket")(spark, sfDir).collect()
    val docs = engine.Engine.table(spark, sfDir, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (lang, bs) =>
      assert(bs.map(_.getLong(2)).sum == docs(lang)) // partition, no loss
      val mean = bs.map(r => r.getString(1) ->
        r.getLong(3).toDouble / r.getLong(2)).toMap
      for (h <- mean.get("head"); t <- mean.get("tail"))
        assert(h > t) // higher mean log-prob in head by construction
    }
  }

  test("pipe_dataset_diff: status counts reconcile with the construction") {
    val m = SparkEntry.queries("pipe_dataset_diff")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = engine.Engine.table(spark, sfDir, "documents")
    def n(p: org.apache.spark.sql.Column) = docs.filter(p).count()
    // construction: %11 deleted, %7 (surviving) text-appended, %13 new
    assert(m("added")._1 == n(col("doc_id") % 13 === 0))
    assert(m("removed")._1 == n(col("doc_id") % 11 === 0))
    assert(m("changed")._1 ==
      n(col("doc_id") % 7 === 0 && col("doc_id") % 11 =!= 0))
    assert(m.values.map(_._1).sum ==
      docs.count() + m("added")._1) // full outer = |v0 ∪ v1|
    // every change delta is visible: appends add 10 chars each, adds are
    // positive mass, removals negative
    assert(m("changed")._2 == 10 * m("changed")._1)
    assert(m("added")._2 > 0 && m("removed")._2 < 0)
    assert(m("unchanged")._2 == 0)
  }

  test("q_csv_dialect: the null token survives the roundtrip") {
    val rows = SparkEntry.queries("q_csv_dialect")(spark, sfDir).collect()
    val (nTot, nSrc) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(3)).sum)
    assert(nSrc > 0 && nSrc < nTot) // some real values, some real NULLs
  }

  test("q_schema_evolution: v1 rows null-fill the v2-only columns") {
    import spark.implicits._
    val tmp = graft.Scratch.tempDir("sevo").toString
    // 2 v1-era docs (even ids), 1 v2-era (odd) — quality = n_chars div 100
    Seq((2L, "en", 250L, "sA"), (4L, "en", 150L, "sB"), (5L, "en", 330L, "sC"))
      .toDF("doc_id", "lang", "n_chars", "source")
      .withColumn("text", lit("x"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("q_schema_evolution")(spark, tmp).collect()
    assert(r.length == 1)
    val row = (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    // n_with_source counts ONLY the odd-id (v2) doc; quality only its 3
    assert(row == ((3L, 730L, 1L, 3L)), s"got $row")
  }

  test("q_constraint_check: planted violations are counted exactly") {
    import spark.implicits._
    val tmp = graft.Scratch.tempDir("cons").toString
    // customer: dup key 1, one null acctbal
    Seq((1L, Some(10.0)), (1L, Some(20.0)), (2L, None), (3L, Some(5.0)))
      .toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    // orders: custkey 99 is an orphan; one date out of range
    Seq((100L, 1L, "1996-05-01"), (101L, 99L, "1996-06-01"),
      (102L, 2L, "1980-01-01"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // lineitem: orderkey 999 orphan; one zero and one oversize quantity
    Seq((100L, 5.0), (999L, 10.0), (100L, 0.0), (101L, 61.0))
      .toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = SparkEntry.queries("q_constraint_check")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("pk_customer_unique") == ((4L, 1L, false)))
    assert(out("notnull_customer_acctbal") == ((4L, 1L, false)))
    assert(out("fk_orders_custkey") == ((3L, 1L, false)))
    assert(out("range_orders_orderdate") == ((3L, 1L, false)))
    assert(out("fk_lineitem_orderkey") == ((4L, 1L, false)))
    assert(out("range_lineitem_quantity") == ((4L, 2L, false)))
  }

  test("q_cdc_apply: latest-op-wins merge on a planted feed") {
    import spark.implicits._
    val tmp = graft.Scratch.tempDir("cdc").toString
    // keys 1..21, all status O, price 10.0: base = non-%3 (14 rows);
    // updates %5 → {5,10,20}; deletes %7 → {7,14}; inserts %3 (7 rows)
    (1L to 21L).map(k => (k, "O", 10.0)).toDF(
        "o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = SparkEntry.queries("q_cdc_apply")(spark, tmp)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // O: 14 base − 3 updated − 2 deleted + 7 inserted = 16; U: 3
    assert(out == Map("O" -> ((16L, 16000L)), "U" -> ((3L, 3000L))), s"got $out")
  }

  test("q_stream_topk: per-hour ranks dense, counts non-increasing") {
    val rows = SparkEntry.queries("q_stream_topk")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, hr) =>
      val byRank = hr.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length).toSeq)
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) >= b.getLong(3))
        case _ => ()
      }
    }
  }
}
