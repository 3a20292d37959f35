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

  test("ratioRound ≡ BigDecimal HALF_UP at every scale used by the engine") {
    // the integer-rounding helper IS the cross-engine exactness story
    // for every ratio output — pin it against the mathematical
    // definition on random ratios plus the known half-way landmines
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cases = Seq((1L, 640L), (1L, 64L), (1L, 32L), (5L, 8L), (1L, 3L),
      (0L, 7L), (7L, 7L), (123456L, 100000L)) ++
      (1 to 200).map(_ => (rnd.nextInt(1000000).toLong, rnd.nextInt(999999).toLong + 1L))
    for (p <- Seq(4, 6)) {
      val got = cases.toDF("num", "den")
        .select(graft.ext.TextAnalysis.ratioRound(col("num"), col("den"), p).as("r"))
        .collect().map(_.getDouble(0))
      val want = cases.map { case (n, d) =>
        (BigDecimal(n) / BigDecimal(d))
          .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      got.zip(want).zip(cases).foreach { case ((g, w), c) =>
        assert(g == w, s"ratioRound($c, p=$p): got $g want $w")
      }
    }
  }

  test("gopher counters ≡ plain-Scala recount on random word soups") {
    // the gate's five counters are regex-derived; pin each against a
    // direct Scala recount so a regex change can never silently shift
    // a rule threshold
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vocab = Seq("the", "and", "zq", "##", "a1", "BBBB", "for", "...",
      "x", "longerword", "with", "7", "#tag", "W.", "is")
    val rnd = new scala.util.Random(7)
    val docs = (1 to 120).map { i =>
      val n = rnd.nextInt(30) + 1
      (i.toLong, (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val out = graft.ext.TextAnalysis.gopherFrame(docs.toDF("doc_id", "text"))
      .select(col("doc_id"), col("n_words"), col("sum_word_len"),
        col("n_alpha"), col("n_sym"), col("n_stop_distinct"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val stops = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
    docs.foreach { case (id, text) =>
      val words = text.split("\\s+").filter(_.nonEmpty)
      val wantSym = text.count(_ == '#') +
        "\\.\\.\\.".r.findAllIn(text).length
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSet
      val want = (words.length.toLong,
        words.map(_.length).sum.toLong,
        words.count(_.exists(_.isLetter)).toLong,
        wantSym.toLong,
        stops.count(toks.contains).toLong)
      assert(out(id) == want, s"doc $id '$text': got ${out(id)} want $want")
    }
  }

  test("cdc_cuts rolling update ≡ direct window recompute on random strings") {
    // the kernel derives h(i+1) = (h(i) − c_i)/31 + c_{i+7}·31⁷; this
    // pins that algebra against the DEFINITION (recompute each window
    // from scratch) on random ASCII + unicode-ish strings and the short/
    // empty edges, independently of the DuckDB oracle mirror
    val pows = Array.iterate(1L, 8)(_ * 31L)
    def naive(s: String): Seq[Int] = {
      val cps = s.codePoints().toArray
      val n = cps.length
      (0 to n - 8).flatMap { st =>
        val h = (0 until 8).map(j => cps(st + j).toLong * pows(j)).sum
        if (h % 64 == 0 && st + 8 < n) Some(st + 8) else None
      }
    }
    // astral-plane code points render as surrogate PAIRS in the JVM
    // string, so they stress exactly the codePointAt/charCount indexing
    // the kernel relies on (a char-indexed bug would shift every cut
    // after the first emoji); 😀 U+1F600, 𝕏 U+1D54F, 🝖 U+1F756
    val astral = Seq("😀", "𝕏", "🕖")
    val gen = for {
      len <- Gen.chooseNum(0, 300)
      s <- Gen.listOfN(len, Gen.frequency(
        9 -> Gen.alphaNumChar.map(_.toString), 3 -> Gen.const(" "),
        1 -> Gen.oneOf("é", "ß", "中"), 1 -> Gen.oneOf(astral)))
    } yield s.mkString
    val expr = graft.functions.HashExpressions.CdcCuts(
      org.apache.spark.sql.catalyst.expressions.Literal("x"))
    val edges = Seq("", "short", "exactly8", "exactly8!",
      astral.mkString * 3,                    // astral-only, 9 code points
      "abcdefg" + astral.head,                // astral closes the window
      astral.head + "abcdefgh")               // astral opens it
    val cases = samples(gen, 120) ++ edges
    assert(cases.size >= 120)
    cases.foreach { s =>
      val got = expr.kernel(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toIntArray().toSeq
      assert(got == naive(s), s"cuts diverge for ${s.take(40)}…: $got vs ${naive(s)}")
    }
  }

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

  test("minhash signature agreement estimates Jaccard (the property LSH relies on)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // sets with known overlap: A = w0..w99, B = wk..w(k+99) → J = (100-k)/(100+k)
    val overlaps = Seq(0, 10, 25, 50, 75, 90)
    val errs = overlaps.map { k =>
      val a = (0 until 100).map(i => s"w$i")
      val b = (k until (k + 100)).map(i => s"w$i")
      val df = Seq((a, b)).toDF("a", "b")
        .select(
          graft.functions.HashExpressions.minhash_sig(col("a"), 64).as("sa"),
          graft.functions.HashExpressions.minhash_sig(col("b"), 64).as("sb"))
        .select(size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
          x => x)).as("agree"))
      val agree = df.head().getInt(0)
      val est = agree / 64.0
      val j = (100.0 - k) / (100.0 + k)
      math.abs(est - j)
    }
    // per-pair binomial noise ~ sqrt(J(1-J)/64) ≈ 0.06; allow 3σ per pair
    errs.zip(overlaps).foreach { case (e, k) =>
      assert(e < 0.2, s"overlap shift $k: |est - J| = $e")
    }
    assert(errs.sum / errs.size < 0.08, s"mean estimation error ${errs.sum / errs.size}")
  }

  test("md5_bucket is uniform and stable") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 10000)
      .select(graft.functions.HashExpressions.md5Bucket(col("id").cast("string"), 10).as("b"))
    val counts = df.groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until 10L).toSet, counts.toString)
    counts.foreach { case (b, n) =>
      assert(n > 800 && n < 1200, s"bucket $b skewed: $n/10000")
    }
    // determinism across evaluations (retry-safety contract)
    val again = df.groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == again)
  }

  test("PPS certainty inclusion: w ≥ step forces a hit, mult counts multiples") {
    // the textbook systematic-PPS property: an interval of length ≥ step
    // must contain a multiple of step, so any doc with w ≥ step is
    // sampled with certainty, with multiplicity = multiples inside —
    // verified on random weight lines with the exact engine arithmetic
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 50) {
      val k = 40L
      val ws = (1 to 200).map(_ => rnd.nextInt(5000).toLong + 1L)
      val tot = ws.sum
      val step = math.max(tot / k, 1L)
      var cum = 0L
      ws.foreach { w =>
        val before = cum; cum += w
        val mult = cum / step - before / step
        assert(mult >= 0 && mult <= w / step + 1, s"trial $trial mult $mult")
        if (w >= step) assert(mult >= 1,
          s"trial $trial: certainty doc (w=$w ≥ step=$step) missed")
      }
      assert(cum / step == tot / step)
    }
  }

  test("winnowing guarantee: any shared 6-word run collides ≥1 fingerprint") {
    // the MOSS theorem the dedup_winnowing admission rule relies on:
    // with k=3 word-grams and window w=4, a shared contiguous run of
    // w+k−1 = 6 words contains one FULL window of identical grams, and
    // the min-hash gram of that window is selected in both documents —
    // so the fingerprint-hash sets must intersect, wherever the run
    // sits and whatever surrounds it
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(x: String): String =
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fpSet(text: String, k: Int = 3, w: Int = 4): Set[String] = {
      val ws = text.split(" ", -1)
      val hp = (1 to ws.length - (k - 1)).map(i =>
        (md5hex(ws.slice(i - 1, i - 1 + k).mkString(" ")), i.toLong))
      if (hp.length < w) Set.empty
      else (0 to hp.length - w).map(i => hp.slice(i, i + w).min._1).toSet
    }
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 40).map("w" + _)
    def soup(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
    for (trial <- 1 to 100) {
      val run = (1 to 6).map(i => s"shared${trial}_$i")
      def plant(pre: Int, post: Int) =
        (soup(pre) ++ run ++ soup(post)).mkString(" ")
      val a = plant(rnd.nextInt(30), rnd.nextInt(30))
      val b = plant(rnd.nextInt(30), rnd.nextInt(30))
      assert(fpSet(a).intersect(fpSet(b)).nonEmpty,
        s"trial $trial: shared 6-run produced no fingerprint collision")
    }
  }

  test("DistRank two-level rank ≡ global row_number on random keyed data") {
    // DistRank is load-bearing for every corpus-wide total order
    // (curriculum, vocab ranks, shuffle order, gini): the decomposition
    // must be EXACTLY the single-partition rank, including duplicate
    // order keys resolved by the tiebreaker and empty shards skipped
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicate-heavy values (mod 50) stress the tie path; ids unique
    val rows = (1 to 2000).map(i => (i.toLong, rnd.nextInt(200).toLong % 50))
    val df = rows.toDF("id", "v").repartition(13)
    // shard key: order-consistent with (v asc) — value buckets of 8
    val ranked = graft.ext.DistRank.rowNumber(spark, df,
        expr("v div 8"), Seq(col("v").asc, col("id").asc), "r")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val want = rows.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, v), i) => (id, v, i + 1L) }.toSet
    assert(ranked.length == rows.length)
    assert(ranked.toSet == want, "two-level rank must equal the global rank")
  }

  test("DistRank grouped rank ≡ per-group row_number on random keyed data") {
    // rowNumberGrouped carries dedup_levenshtein's sorted-neighborhood
    // blocking: the per-(group, shard) decomposition must be EXACTLY the
    // per-group rank, ties resolved by the tiebreaker, groups independent
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(200).toLong % 50))
    val df = rows.toDF("id", "g", "v").repartition(13)
    val ranked = graft.ext.DistRank.rowNumberGrouped(spark, df, Seq("g"),
        expr("v div 8"), Seq(col("v").asc, col("id").asc), "r")
      .select(col("id"), col("g"), col("r"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val want = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(t => (t._3, t._1)).zipWithIndex
        .map { case ((id, _, _), i) => (id, g, i + 1L) }
    }.toSet
    assert(ranked.length == rows.length)
    assert(ranked.toSet == want, "grouped rank must equal per-group row_number")
  }

  test("DistRank fails fast on NULL shard or group keys, never null ranks") {
    // the offset attach is a null-UNSAFE equi-join: a NULL key would
    // silently rank as NULL (and diverge from a DuckDB oracle's nulls
    // ordering). The census asserts instead (ADVICE r10).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, Some(1L)), (2L, None), (3L, Some(2L)))
      .toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      graft.ext.DistRank.rowNumber(spark, df,
        col("v"), Seq(col("id").asc), "r").collect()
    }
    assert(e1.getMessage.contains("NULL"))
    val df2 = Seq((1L, Some("a"), 1L), (2L, None, 1L))
      .toDF("id", "g", "v")
    val e2 = intercept[IllegalArgumentException] {
      graft.ext.DistRank.rowNumberGrouped(spark, df2, Seq("g"),
        col("v"), Seq(col("id").asc), "r").collect()
    }
    assert(e2.getMessage.contains("NULL"))
  }

  test("JaccardSim ≡ composed array_intersect form on random arrays (dups/unicode/empty)") {
    // the native kernel replaced the composed expression on every
    // minhash verify path — the two must agree on EVERY input shape,
    // including duplicate elements (remove-counting), multibyte
    // strings (UTF8String hashing), and empty sides (0.0 guard)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // null is IN the alphabet (ADVICE r10): array_intersect treats a
    // null element as one distinct value on both sides, and the kernel
    // must agree regardless of the array's physical layout
    val alphabet = Vector("a", "bb", "κόσμε", "日本", "x y", "", "ß", "z",
      null, null)
    def arr(): Seq[String] =
      Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.length)))
    val rows = (1 to 500).map(i => (i.toLong, arr(), arr()))
    val df = rows.toDF("id", "a", "b")
    val inter = size(array_intersect(col("a"), col("b"))).cast("double")
    val union = size(col("a")).cast("double") + size(col("b")).cast("double") - inter
    val out = df.select(col("id"),
        graft.functions.HashExpressions.jaccard_sim(col("a"), col("b")).as("nat"),
        when(union === 0, lit(0.0)).otherwise(inter / union).as("comp"))
      .collect()
    assert(out.length == rows.length)
    out.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"id=${r.getLong(0)}: native=${r.getDouble(1)} composed=${r.getDouble(2)}"))
  }

  test("anomaly flags: DECIMAL(38,0) inequality exact at planted 1e8-scale counts") {
    // 30 hours of one type at C ≈ 1e8 with one planted 4e8 spike:
    // dev2w ≈ (24·3e8)²·23 ≈ 1.2e21 — an order past the old BIGINT
    // ceiling (9.2e18), where the r9 form wrapped silently while DuckDB
    // raised. Ground truth recomputed in BigInt, compared exactly.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hr: Int) = new java.sql.Timestamp(base.getTime + hr * 3600000L)
    val rnd = new scala.util.Random(5)
    val ns = (0 until 30).map { hr =>
      if (hr == 27) 400000000L else 100000000L + rnd.nextInt(1000)
    }
    val dense = ns.zipWithIndex
      .map { case (n, hr) => (at(hr), "load", n) }
      .toDF("h", "event_type", "n")
    val out = graft.ops.Relational.anomalyFlags(dense)
      .orderBy(col("h"))
      .select(col("n"), col("w_n"), col("w_sum"), col("dev2w"),
        col("var_w"), col("is_anomaly"))
      .collect()
    assert(out.length == ns.length)
    var sawPastInt64 = false
    var sawFlag = false
    for (i <- ns.indices) {
      val w = ns.slice(math.max(0, i - 24), i)
      val wn = BigInt(w.length)
      val ws = w.map(BigInt(_)).sum
      val ws2 = w.map(x => BigInt(x) * BigInt(x)).sum
      val dev = wn * BigInt(ns(i)) - ws
      val dev2w = dev * dev * (wn - 1)
      val varw = BigInt(9) * wn * (wn * ws2 - ws * ws)
      val flag = w.length >= 12 && dev2w > varw
      val r = out(i)
      assert(BigInt(r.getDecimal(3).toBigInteger) == dev2w,
        s"hour $i dev2w: got ${r.getDecimal(3)} want $dev2w")
      assert(BigInt(r.getDecimal(4).toBigInteger) == varw,
        s"hour $i var_w: got ${r.getDecimal(4)} want $varw")
      assert(r.getBoolean(5) == flag, s"hour $i flag mismatch")
      if (dev2w > BigInt(Long.MaxValue)) sawPastInt64 = true
      if (flag) sawFlag = true
    }
    assert(sawPastInt64, "vacuous: no term exceeded the old 64-bit ceiling")
    assert(sawFlag, "vacuous: the planted spike did not flag")
  }
}
