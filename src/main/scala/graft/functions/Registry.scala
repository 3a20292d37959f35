package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL-surface registration for the native expressions, the same way the
  * reference registers its UDAFs into the session function registry
  * (reference: src/lib.rs:53-55) — after this, plain SQL can call:
  *
  *   SELECT minhash_sig(word_shingles(text, 3), 64) FROM docs
  *   SELECT simhash64(word_shingles(text, 1)) FROM docs
  *   SELECT dot_f32(a, b) FROM vecs
  */
object Registry {
  import HashExpressions._

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, builder) for every native expression — shared by the
    * in-session registration below and the `SparkSessionExtensions`
    * injection path ([[graft.GraftExtensions]]). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> { exprs: Seq[Expression] => exprs match {
      case Seq(c) => MinHashSig(c, 64)
      case Seq(c, k) => MinHashSig(c, intArg(k, "minhash_sig k"))
      case _ => throw new IllegalArgumentException("minhash_sig(arr[, k])")
    }},
    "simhash64" -> { exprs: Seq[Expression] => SimHash64(exprs.head) },
    "char_entropy" -> { exprs: Seq[Expression] => CharEntropy(exprs.head) },
    "unicode_normalize" -> { exprs: Seq[Expression] => exprs match {
      case Seq(c) => UnicodeNormalize(c, "NFC")
      case Seq(c, f) => UnicodeNormalize(c, f match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"unicode_normalize form must be a string literal, got $other")
      })
      case _ => throw new IllegalArgumentException("unicode_normalize(s[, form])")
    }},
    "cdc_cuts" -> { exprs: Seq[Expression] => CdcCuts(exprs.head) },
    "token_stats" -> { exprs: Seq[Expression] => TokenStats(exprs.head) },
    "winnow_sel" -> { exprs: Seq[Expression] => exprs match {
      case Seq(c) => WinnowSel(c, 3, 4)
      case Seq(c, k, w) => WinnowSel(c, intArg(k, "winnow_sel k"),
        intArg(w, "winnow_sel w"))
      case _ => throw new IllegalArgumentException("winnow_sel(text[, k, w])")
    }},
    "word_tiles" -> { exprs: Seq[Expression] => exprs match {
      case Seq(c) => WordTiles(c, 10)
      case Seq(c, n) => WordTiles(c, intArg(n, "word_tiles n"))
      case _ => throw new IllegalArgumentException("word_tiles(text[, n])")
    }},
    "word_shingles" -> { exprs: Seq[Expression] => exprs match {
      case Seq(c) => WordShingles(c, 3, distinct = true)
      case Seq(c, n) => WordShingles(c, intArg(n, "word_shingles n"), distinct = true)
      case Seq(c, n, d) => WordShingles(c, intArg(n, "word_shingles n"),
        d match { case Literal(b: Boolean, _) => b; case _ => true })
      case _ => throw new IllegalArgumentException("word_shingles(text[, n[, distinct]])")
    }},
    "dot_f32" -> { exprs: Seq[Expression] => DotF32(exprs(0), exprs(1)) },
    "jaccard_sim" -> { exprs: Seq[Expression] => JaccardSim(exprs(0), exprs(1)) },
    "hyperplane_sig" -> { exprs: Seq[Expression] => exprs match {
      case Seq(c) => HyperplaneSig(c, 8)
      case Seq(c, b) => HyperplaneSig(c, intArg(b, "hyperplane_sig bits"))
      case _ => throw new IllegalArgumentException("hyperplane_sig(vec[, bits])")
    }},
    "num_gcd" -> { exprs: Seq[Expression] => Gcd(exprs(0), exprs(1)) },
    "num_lcm" -> { exprs: Seq[Expression] => Lcm(exprs(0), exprs(1)) },
    // deterministic sampling/splitting primitive, SQL form of
    // HashExpressions.md5Bucket (single shared definition): md5_bucket(x,
    // mod) ∈ [0, mod) — same value as DuckDB ('0x' || substr(md5(CAST(x
    // AS VARCHAR)), 1, 8))::BIGINT % mod for STRING and INTEGER keys.
    // Fractional keys are NOT oracle-portable (Spark renders 1e7 as
    // "1.0E7", DuckDB as "10000000.0") — cast or format them first.
    // NOTE: must stay value-identical to HashExpressions.md5Bucket (the
    // Column form); both are pinned to the same DuckDB-checked constant
    // (md5_bucket(42,100)=84) by ExtensionInjectionSpec + PropertySpec.
    // (A Bridge round-trip cannot be used here: column-node wrappers are
    // Unevaluable inside a function-registry builder.)
    "md5_bucket" -> { exprs: Seq[Expression] => exprs match {
      case Seq(c, m) =>
        import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Md5, Pmod, Substring}
        import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
        Pmod(Cast(Conv(Substring(Md5(Cast(Cast(c, StringType), BinaryType)),
          Literal(1), Literal(8)), Literal(16), Literal(10)), LongType), m)
      case _ => throw new IllegalArgumentException("md5_bucket(x, mod)")
    }}
  )

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
