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

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sig", exprs => exprs match {
      case Seq(c) => MinHashSig(c, 64)
      case Seq(c, k) => MinHashSig(c, intArg(k, "minhash_sig k"))
      case _ => throw new IllegalArgumentException("minhash_sig(arr[, k])")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles", exprs => exprs match {
      case Seq(c) => WordShingles(c, 3, distinct = true)
      case Seq(c, n) => WordShingles(c, intArg(n, "word_shingles n"), distinct = true)
      case Seq(c, n, d) => WordShingles(c, intArg(n, "word_shingles n"),
        d match { case Literal(b: Boolean, _) => b; case _ => true })
      case _ => throw new IllegalArgumentException("word_shingles(text[, n[, distinct]])")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("dot_f32",
      exprs => DotF32(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_sig", exprs => exprs match {
      case Seq(c) => HyperplaneSig(c, 8)
      case Seq(c, b) => HyperplaneSig(c, intArg(b, "hyperplane_sig bits"))
      case _ => throw new IllegalArgumentException("hyperplane_sig(vec[, bits])")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("num_gcd",
      exprs => Gcd(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("num_lcm",
      exprs => Lcm(exprs(0), exprs(1)), "scala_udf")
  }
}
