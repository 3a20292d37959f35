package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins that every native expression's `doGenCode` actually COMPILES and
  * agrees with its interpreted `eval`.
  *
  * Why this spec exists: when generated Java fails Janino compilation,
  * Spark logs a warning and silently falls back to interpreted execution
  * — every other suite would stay green while the codegen path rots. Here
  * `spark.sql.codegen.fallback=false` turns that fallback into a hard
  * failure, and each expression's output is compared against the same
  * query under `factoryMode=NO_CODEGEN` (pure interpreted eval), so the
  * two execution paths cross-check each other value-for-value.
  */
class CodegenSpec extends SparkSpecBase {
  import graft.functions.HashExpressions._

  private def docs: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
  private def vecs: DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)

  /** Runs `build` under forced codegen and forced interpretation; both
    * must succeed and collect to identical rows. */
  private def bothWays(name: String)(build: => DataFrame): Unit = {
    def collectWith(mode: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      spark.conf.set("spark.sql.codegen.fallback", "false")
      try build.collect().map(_.toString()).toSeq.sorted
      finally {
        spark.conf.unset("spark.sql.codegen.factoryMode")
        spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
    val gen = collectWith("CODEGEN_ONLY")
    val interp = collectWith("NO_CODEGEN")
    assert(gen == interp, s"$name: codegen and interpreted results differ")
    assert(gen.nonEmpty, s"$name: vacuous check, no rows")
  }

  test("minhash_sig codegen compiles and matches interpreted eval") {
    bothWays("minhash_sig") {
      docs.select(col("doc_id"),
        minhash_sig(word_shingles(col("text"), 3), k = 16).as("sig"))
    }
  }

  test("simhash64 codegen compiles and matches interpreted eval") {
    bothWays("simhash64") {
      docs.select(col("doc_id"), simhash64(word_shingles(col("text"), 1)).as("fp"))
    }
  }

  test("char_entropy codegen compiles and matches interpreted eval") {
    bothWays("char_entropy") {
      docs.select(col("doc_id"), char_entropy(col("text")).as("ce"))
        .select(col("doc_id"), col("ce.n_uniq_chars"),
          round(col("ce.char_entropy"), 6).as("ent"))
    }
  }

  test("token_stats codegen compiles, matches interpreted eval and the windowed form") {
    bothWays("token_stats") {
      docs.select(col("doc_id"), token_stats(col("text")).as("ts"))
    }
    // value cross-check against the explode → groupBy → window
    // formulation this expression replaced (r12): identical
    // (n_words, n_distinct, top_word, top_cnt) per doc, including the
    // (cnt desc, word asc) tie rule, over the real corpus shard
    val viaExpr = docs
      .select(col("doc_id"), token_stats(col("text")).as("ts"))
      .filter(col("ts.n_words") > 0)
      .select(col("doc_id"), col("ts.n_words"), col("ts.n_distinct"),
        col("ts.top_word"), col("ts.top_cnt"))
      .collect().map(_.toString()).sorted.toSeq
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val viaWindow = docs
      .select(col("doc_id"), explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        x => length(x) > 0)).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("n_words", sum(col("cnt")).over(byDoc))
      .withColumn("n_distinct", count(lit(1)).over(byDoc))
      .withColumn("rn", row_number().over(
        byDoc.orderBy(col("cnt").desc, col("w"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        col("w"), col("cnt"))
      .collect().map(_.toString()).sorted.toSeq
    assert(viaExpr == viaWindow, "token_stats diverges from the windowed form")
    assert(viaExpr.nonEmpty, "vacuous: no docs with tokens")
    // edge pins: empty text and a tie both resolve deterministically
    val edge = spark.range(1).select(
      token_stats(lit("")).as("e"),
      token_stats(lit("b a b a")).as("t"),
      token_stats(lit("  ??  ")).as("p")).head()
    assert(edge.getStruct(0).toString == "[0,0,,0]", s"empty: ${edge.getStruct(0)}")
    assert(edge.getStruct(1).toString == "[4,2,a,2]", s"tie: ${edge.getStruct(1)}")
    assert(edge.getStruct(2).toString == "[0,0,,0]", s"punct: ${edge.getStruct(2)}")
  }

  test("winnow_sel codegen compiles, matches interpreted eval and the HOF chain") {
    bothWays("winnow_sel") {
      docs.select(col("doc_id"), winnow_sel(col("text"), 3, 4).as("wsel"))
    }
    // value cross-check against the transform/slice/array_min/
    // array_distinct chain this expression replaced (r12): identical
    // (n_grams, sel) per doc over the real corpus shard, including
    // first-occurrence order and the leftmost-min tie rule
    val viaExpr = docs
      .select(col("doc_id"), winnow_sel(col("text"), 3, 4).as("wsel"))
      .filter(col("wsel.n_grams") >= 4)
      .select(col("doc_id"), col("wsel.n_grams").as("n_grams"),
        col("wsel.sel").as("sel"))
      .collect().map(_.toString()).sorted.toSeq
    val viaHof = docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_grams", greatest(size(col("ws")) - 2, lit(0)).cast("long"))
      .filter(col("n_grams") >= 4)
      .withColumn("hp", expr(
        """transform(sequence(1, size(ws) - 2),
          |  i -> struct(md5(concat_ws(' ', slice(ws, i, 3))) AS h,
          |              cast(i AS bigint) AS pos))""".stripMargin))
      .withColumn("sel", expr(
        """array_distinct(transform(sequence(1, size(hp) - 3),
          |  i -> array_min(slice(hp, i, 4))))""".stripMargin))
      .select(col("doc_id"), col("n_grams"), col("sel"))
      .collect().map(_.toString()).sorted.toSeq
    assert(viaExpr == viaHof, "winnow_sel diverges from the HOF chain")
    assert(viaExpr.nonEmpty, "vacuous: no docs cleared the window gate")
  }

  test("cdc_cuts codegen compiles and matches interpreted eval") {
    bothWays("cdc_cuts") {
      docs.select(col("doc_id"), cdc_cuts(col("text")).as("cuts"))
    }
  }

  test("word_tiles codegen compiles and matches interpreted eval") {
    bothWays("word_tiles") {
      docs.select(col("doc_id"), word_tiles(col("text"), 10).as("tiles"))
    }
  }

  test("word_shingles codegen compiles and matches interpreted eval") {
    bothWays("word_shingles") {
      docs.select(col("doc_id"),
        word_shingles(col("text"), 2, distinct = false).as("sh"))
    }
  }

  test("gcd/lcm codegen compiles and matches interpreted eval") {
    bothWays("gcd_lcm") {
      spark.range(-50, 50).select(col("id"),
        num_gcd(col("id"), lit(36L)).as("g"),
        num_lcm(col("id") % 12, lit(-8L)).as("l"),
        num_lcm(col("id"), lit(0L)).as("lz"))
    }
  }

  test("dot_f32 codegen compiles and matches interpreted eval") {
    bothWays("dot_f32") {
      vecs.select(col("vec_id"),
        round(dot_f32(col("embedding"), col("embedding")), 6).as("ss"))
    }
  }

  test("jaccard_sim codegen compiles, matches interpreted eval and the composed form") {
    bothWays("jaccard_sim") {
      val a = docs.select(col("doc_id").as("ida"),
        word_shingles(col("text"), 3).as("sha"))
      val b = docs.select(col("doc_id").as("idb"),
        word_shingles(col("text"), 3).as("shb"))
      a.join(b, col("ida") % 7 === col("idb") % 7)
        .select(col("ida"), col("idb"),
          round(jaccard_sim(col("sha"), col("shb")), 9).as("j"))
    }
    // value pin against the composed expression it replaced: distinct
    // intersection over raw-size union, union 0 → 0.0
    val rows = docs.limit(40)
      .select(word_shingles(col("text"), 3).as("sh"), col("doc_id"))
    val a = rows.select(col("doc_id").as("ida"), col("sh").as("sha"))
    val b = rows.select(col("doc_id").as("idb"), col("sh").as("shb"))
    val both = a.crossJoin(b)
      .select(jaccard_sim(col("sha"), col("shb")).as("native"),
        {
          val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
          val union = size(col("sha")).cast("double") +
            size(col("shb")).cast("double") - inter
          when(union === 0, lit(0.0)).otherwise(inter / union).as("composed")
        })
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native=${r.getDouble(0)} composed=${r.getDouble(1)}"))
    // duplicate-element semantics pin (shingles() is distinct, so the
    // corpus never exercises this path): intersection counts DISTINCT
    // shared elements, the union denominator uses RAW sizes — exactly
    // the composed form. array('a','a','b') ∩ array('a','c') = {'a'}
    // → 1 / (3 + 2 − 1) = 0.25. Also the both-empty → 0.0 guard.
    graft.functions.Registry.registerAll(spark)
    val pins = spark.sql(
      """SELECT
        |  jaccard_sim(array('a','a','b'), array('a','c')) AS dup_case,
        |  jaccard_sim(CAST(array() AS ARRAY<STRING>),
        |              CAST(array() AS ARRAY<STRING>)) AS empty_case,
        |  jaccard_sim(array('x'), CAST(array() AS ARRAY<STRING>)) AS half_empty
        |""".stripMargin).head()
    assert(pins.getDouble(0) == 0.25, s"dup_case: ${pins.getDouble(0)}")
    assert(pins.getDouble(1) == 0.0)
    assert(pins.getDouble(2) == 0.0)
  }

  test("hyperplane_sig codegen compiles and matches interpreted eval") {
    bothWays("hyperplane_sig") {
      vecs.select(col("vec_id"), hyperplane_sig(col("embedding"), 16).as("sig"))
    }
  }

  test("unicode_normalize codegen compiles and matches interpreted eval") {
    bothWays("unicode_normalize") {
      // decomposed accent, NFC singleton (U+212B), decomposed Hangul
      // jamo, plain ASCII — the q_text_normalize fixture shapes plus
      // the non-NFC forms that have no DuckDB oracle
      val v = spark.sql(
        "SELECT s FROM VALUES ('café'), ('unit Å'), " +
          "('한'), ('plain'), ('ﬁle ①') AS t(s)")
      Seq("NFC", "NFD", "NFKC", "NFKD").foldLeft(v) { (df, form) =>
        df.withColumn(s"n_$form",
          graft.functions.HashExpressions.unicode_normalize(col("s"), form))
      }
    }
  }

  test("unicode_normalize forms pinned (NFKC folds ligature/circled, NFD decomposes)") {
    import graft.functions.HashExpressions.unicode_normalize
    val df = spark.sql("SELECT 'ﬁle ① café' AS s")
      .select(
        unicode_normalize(col("s"), "NFC").as("nfc"),
        unicode_normalize(col("s"), "NFD").as("nfd"),
        unicode_normalize(col("s"), "NFKC").as("nfkc"))
    val r = df.collect().head
    // NFC composes e+combining-acute but keeps compatibility chars
    assert(r.getString(0) == "ﬁle ① café", s"nfc: ${r.getString(0)}")
    // NFD re-decomposes the (now composed) accent
    assert(r.getString(1) == "ﬁle ① café", s"nfd: ${r.getString(1)}")
    // NFKC folds the fi ligature and the circled one to ASCII
    assert(r.getString(2) == "file 1 café", s"nfkc: ${r.getString(2)}")
  }

  test("signature projection stays inside whole-stage codegen") {
    // the point of dropping CodegenFallback: an operator containing these
    // expressions must no longer be ejected from WholeStageCodegen
    val df = docs.select(minhash_sig(word_shingles(col("text"), 3), 16).as("s"),
      simhash64(word_shingles(col("text"), 1)).as("f"))
    // a codegen'd operator renders as `*(stageId) Project`; an ejected
    // one renders bare — exactly what CodegenFallback used to cause
    val plan = df.queryExecution.executedPlan.toString()
    val projectLines = plan.linesIterator.filter(_.contains("Project")).toSeq
    assert(projectLines.nonEmpty, s"no Project in plan:\n$plan")
    assert(projectLines.forall(_.contains("*(")),
      s"Project not codegen'd (no *(n) prefix):\n$plan")
  }
}
