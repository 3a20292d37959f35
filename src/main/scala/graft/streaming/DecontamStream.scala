package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.engine.Engine

/** Streaming decontamination — the continuous-ingest form of the batch
  * `pipe_decontam`: documents arriving on a file stream are flagged
  * against a STATIC benchmark gram set (stream-static join, the static
  * side broadcast per micro-batch).
  *
  * Unlike the dedup/sessionize streams this is deliberately STATELESS:
  * contamination is a pure function of (document, reference set), so no
  * watermark, no state store, and append mode — the shape that scales to
  * any ingest rate because each micro-batch is an independent map pass.
  * The per-doc gram array never explodes on the stream side:
  * `arrays_overlap` evaluates the membership test row-local against the
  * broadcast gram set (at 100 TB/day ingest the alternative —
  * explode + stateful agg — would shuffle every gram of every batch).
  */
object DecontamStream {

  /** Flagged stream: (doc_id, n_grams, contaminated) for every non-bench
    * document, semantically identical to batch `pipe_decontam` rows. */
  def flaggedDocs(spark: SparkSession, dir: String): DataFrame = {
    def sh = graft.functions.HashExpressions.word_shingles(col("text"), 8)
    // static reference side: the distinct benchmark grams, gathered into
    // one array row (tiny — bench sets are eval suites, not corpora).
    // localCheckpoint: a stream-static join re-executes the static
    // sub-plan EVERY micro-batch — uncheckpointed, each batch re-scans
    // and re-aggregates the bench docs (collect_set already dedups, so
    // no distinct either)
    val bench = Engine.table(spark, dir, "documents")
      .filter(col("doc_id") % 50 === 0)
      .select(explode(sh).as("gram"))
      .agg(collect_set(col("gram")).as("bench_grams"))
      .localCheckpoint(true)
    spark.readStream
      .schema(CurationStream.docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), sh.as("sh"))
      .crossJoin(bench) // stream-static; static side broadcasts
      .select(col("doc_id"),
        // coalesce(…, 0): word_shingles is null-intolerant, so NULL text
        // → sh NULL → size NULL, where batch pipe_decontam's
        // explode_outer+count emits 0 — the row-identity contract covers
        // NULL input too
        coalesce(size(col("sh")).cast("long"), lit(0L)).as("n_grams"),
        coalesce(arrays_overlap(col("sh"), col("bench_grams")), lit(false))
          .as("contaminated"))
  }

  def runToMemory(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val q = flaggedDocs(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }
}
