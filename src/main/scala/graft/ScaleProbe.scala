package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Engine

/** End-to-end scale probe: replicate the sf0.1 documents table Nx on
  * disk (default 100x → ~500k docs, an sf10-ish shard) and run the
  * dedup/curation pipelines over it once, reporting wall time and
  * SHUFFLE BYTES per query — measured evidence that the bucketed LSH
  * and narrow-projection designs hold beyond the driver's sf0.1.
  *
  * Replica 0 keeps each document verbatim; every other replica appends
  * a distinct tail token, so the shard is a 100-way NEAR-dup corpus —
  * the adversarial shape for MinHash banding (every bucket is hot; the
  * bucket cap is what keeps candidate generation non-quadratic).
  *
  * Usage: tools/run.sh graft.ScaleProbe [factor]   (writes a README row)
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // factor-specific default dir: a 10x and a 100x probe must never
    // silently share (and mis-report) one cached shard
    val out = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
      s"/tmp/graft_scale_probe_${factor}x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // _SUCCESS marker, not the directory: a generation run killed
    // mid-write must regenerate, not get probed as a complete shard
    if (!Files.exists(Paths.get(s"$out/documents.parquet/_SUCCESS"))) {
      val t0 = System.nanoTime()
      val docs = Engine.table(spark, base, "documents")
      val reps = spark.range(factor).select(col("id").as("k"))
      val text = when(col("k") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" v"), col("k")))
      docs.crossJoin(reps)
        .select(
          (col("doc_id") * factor + col("k")).as("doc_id"),
          text.as("text"), col("lang"), col("source"),
          length(text).cast("long").as("n_chars"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      println(f"generated ${factor}x shard in ${(System.nanoTime() - t0) / 1e9}%.1fs -> $out")
    }
    // embeddings shard for the ANN probes: replica 0 verbatim, every
    // other replica nudged by k·1e-3 per component — near-identical
    // vectors that all land in the same LSH buckets / IVF cells, the
    // adversarial shape for bucketed ANN (mirrors the documents shard's
    // near-dup construction)
    if (!Files.exists(Paths.get(s"$out/embeddings.parquet/_SUCCESS"))) {
      val t0 = System.nanoTime()
      val emb = Engine.table(spark, base, "embeddings")
      val reps = spark.range(factor).select(col("id").as("k"))
      val vec = when(col("k") === 0, col("embedding")).otherwise(
        transform(col("embedding"),
          x => (x + col("k").cast("float") * lit(0.001f)).cast("float")))
      emb.crossJoin(reps)
        .select(
          (col("vec_id") * factor + col("k")).as("vec_id"),
          vec.as("embedding"), col("label"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(f"generated ${factor}x embeddings in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val nDocs = Engine.table(spark, out, "documents").count()
    val nVecs = Engine.table(spark, out, "embeddings").count()
    println(s"shard: $nDocs documents, $nVecs embeddings")

    // shuffle volume = sum of per-operator "shuffle bytes written"
    // SQLMetrics over the executed (post-AQE) plan, via Explain.analyze.
    // The probed set covers every heavy family: hash dedup, LSH banding,
    // label-propagation clustering, the narrow curation composite,
    // gram-explode decontamination, and bucketed/cell-pruned ANN.
    val probes = Seq("dedup_exact", "dedup_minhash_lsh", "dedup_clusters",
      "curation_pipeline", "pipe_decontam", "ann_lsh", "ann_ivf",
      "pipe_stratified_sample", "text_unigram_logprob", "emb_quantize",
      "pipe_chunk", "dedup_substring", "pipe_decontam_bloom",
      "pipe_token_budget", "ann_pq", "ann_lsh_multiprobe")
    val onlyProbes = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val rows = probes.filter(n => onlyProbes.forall(_.contains(n))).map { name =>
      val t0 = System.nanoTime()
      val m = Explain.analyze(SparkEntry.queries(name)(spark, out))
        .filter(col("metric") === "shuffleBytesWritten")
        .agg(sum(col("value")).as("bytes"))
        .collect() // 1 row — diagnostic main, not an operator
      val secs = (System.nanoTime() - t0) / 1e9
      val shuffleMb = m.headOption.filterNot(_.isNullAt(0))
        .map(_.getLong(0) / 1e6).getOrElse(0.0)
      println(f"PROBE $name%-22s wall=$secs%8.1fs shuffle_written=$shuffleMb%10.1f MB")
      (name, secs, shuffleMb)
    }
    // durable artifact (only for unfiltered runs — a partial probe must
    // not overwrite a full one): walls are single-run ±30%; the
    // shuffle-bytes column is deterministic and is the scale evidence
    if (onlyProbes.isEmpty) {
      def r1(v: Double): Double = math.rint(v * 10) / 10
      val json = rows.map { case (n, w, mb) =>
        s""""$n":{"wall_s":${r1(w)},"shuffle_mb":${r1(mb)}}"""
      }.mkString(
        s"""{"factor":$factor,"docs":$nDocs,"vecs":$nVecs,"probes":{""", ",", "}}")
      val outFile = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT_DIR",
        "/root/repo") + s"/PROBE_LOCAL_${factor}x.json"
      try Files.writeString(Paths.get(outFile), json + "\n")
      catch { case e: Exception => System.err.println(s"[probe] write failed: $e") }
    }
    spark.stop()
  }
}
