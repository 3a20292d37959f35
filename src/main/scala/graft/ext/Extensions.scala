package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline extension operators (BASELINE.json north star):
  * deduplication, similarity search, text analysis, multimodal plumbing.
  * Aggregated entry point; implementations live in the sibling objects.
  */
object Extensions {
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      Multimodal.queries ++ AsOf.queries ++ Pipeline.queries
  def oracleSql: Map[String, String] =
    Dedup.oracleSql ++ Similarity.oracleSql ++ TextAnalysis.oracleSql ++
      Multimodal.oracleSql ++ AsOf.oracleSql ++ Pipeline.oracleSql
}
