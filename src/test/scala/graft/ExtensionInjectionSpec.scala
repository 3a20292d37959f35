package graft

import org.apache.spark.sql.SparkSession

/** `spark.sql.extensions` deployment path: a session built with
  * [[GraftExtensions]] can call every native expression from plain SQL
  * with no programmatic registration call. */
class ExtensionInjectionSpec extends SparkSpecBase {

  test("GraftExtensions injects native functions at session build time") {
    val shared = spark // force the shared session (and its context) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      val d = s2.sql(
        "SELECT dot_f32(array(float(1.0), float(2.0)), array(float(3.0), float(4.0))) AS d")
        .head().getAs[Number](0).doubleValue()
      assert(math.abs(d - 11.0) < 1e-6, s"dot=$d")
      val sig = s2.sql("SELECT minhash_sig(word_shingles('a b c d e', 2), 4) AS s")
        .head().getSeq[Long](0)
      assert(sig.length == 4)
      assert(s2.sql("SELECT simhash64(word_shingles('hello world', 1)) AS h")
        .head().get(0) != null)
      // DuckDB-checked constant: ('0x'||substr(md5('42'),1,8))::BIGINT % 100 = 84
      assert(s2.sql("SELECT md5_bucket(42, 100) AS b").head().getLong(0) == 84L)
      // two fair symbols → exactly 1 bit of entropy, 2 distinct chars
      val ce = s2.sql(
        "SELECT char_entropy('aabb').n_uniq_chars AS u, char_entropy('aabb').char_entropy AS e")
        .head()
      assert(ce.getLong(0) == 2L && ce.getDouble(1) == 1.0, s"char_entropy: $ce")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
