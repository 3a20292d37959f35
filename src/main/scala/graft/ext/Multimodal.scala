package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Engine

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by a per-partition
  * batch "decoder".
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (see [[FakeCodec.decode]]) — what is
  * real and tested is the Spark-side plumbing a 100 TB pipeline needs:
  *
  *  - the schema contract (`binary` payload + struct metadata);
  *  - `mapPartitions` batch shape: the decoder is initialized once per
  *    partition (the expensive part for a real codec — model/codec init
  *    amortizes over the whole partition, the same pattern as a Pandas
  *    `mapInPandas` batch UDF);
  *  - bounded work: rows stream through the partition iterator (never
  *    materialized as a batch), and [[FakeCodec.decode]] reads at most
  *    [[FakeCodec.MaxDecodeBytes]] of any payload, bounding per-row
  *    decode CPU. NOTE the payload bytes themselves are materialized by
  *    the scan before decode sees them — a hard MEMORY bound needs
  *    scan-side truncation (substring on the binary column) or a
  *    max-blob-size filter at ingest, which a real deployment applies;
  *  - feature extraction output as a typed Dataset ready for downstream
  *    relational ops.
  */
object Multimodal {

  /** DETERMINISTIC FAKE of a media codec. A real deployment swaps this
    * object for JNI/codec bindings; everything downstream is unchanged. */
  object FakeCodec {
    /** Decode window cap: bytes of payload a single decode may touch.
      * Real codecs sniff headers/keyframes in a bounded window; enforcing
      * the bound here keeps per-row decode CPU independent of blob size. */
    val MaxDecodeBytes: Int = 64 << 20

    /** STUB: "decode" a payload into (width, height, n_frames, checksum).
      * Real decode is impossible in this container — this fake derives
      * deterministic pseudo-metadata from the bytes themselves (reading at
      * most [[MaxDecodeBytes]] of the payload). */
    def decode(payload: Array[Byte]): (Int, Int, Int, Long) = {
      var h = 1125899906842597L // deterministic FNV-ish roll
      var i = 0
      val end = math.min(payload.length, MaxDecodeBytes)
      while (i < end) { h = 31 * h + (payload(i) & 0xff); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      val frames = 1 + math.floorMod(h >> 20, 300).toInt
      (w, ht, frames, h)
    }
  }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(spark, dir, name)

  /** Documents re-cast as a multimodal table: payload = utf-8 bytes of the
    * text (stand-in for image bytes), metadata struct alongside. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(col("source").as("uri"), col("lang").as("codec"),
        col("n_chars").as("n_bytes_claimed")).as("meta"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // binary-column plumbing, expression side: sizes + hashes on blobs
    "mm_binary_meta" -> ((s, dir) =>
      mediaTable(s, dir)
        .select(col("media_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("meta.uri").as("uri"),
          col("meta.codec").as("codec"),
          (octet_length(col("payload")) === col("meta.n_bytes_claimed")).as("size_ok"))
        .orderBy(col("media_id"))),

    // batch "decode" via mapPartitions: codec init once per partition,
    // rows streamed through — the real pattern, a stubbed codec
    "mm_decode_features" -> ((s, dir) => {
      val media = mediaTable(s, dir).select(col("media_id"), col("payload"))
      val outSchema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("n_frames", IntegerType, nullable = false),
        StructField("checksum", LongType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      media.mapPartitions { rows =>
        // per-partition init happens HERE for a real codec (load model,
        // open decoder context); the stub needs none
        rows.map { r =>
          val (w, h, f, c) = FakeCodec.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), w, h, f, c)
        }
      }(enc).orderBy(col("media_id"))
    }),

    // resize plumbing: decoded dimensions → letterboxed target geometry
    // (pure arithmetic on the decode output — the real resize kernel
    // would run inside the same mapPartitions as FakeCodec.decode)
    "mm_resize_plan" -> ((s, dir) => {
      val target = 224
      val media = mediaTable(s, dir).select(col("media_id"), col("payload"))
      val outSchema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("src_w", IntegerType, nullable = false),
        StructField("src_h", IntegerType, nullable = false),
        StructField("dst_w", IntegerType, nullable = false),
        StructField("dst_h", IntegerType, nullable = false),
        StructField("pad_x", IntegerType, nullable = false),
        StructField("pad_y", IntegerType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      media.mapPartitions { rows =>
        rows.map { r =>
          val (w, h, _, _) = FakeCodec.decode(r.getAs[Array[Byte]]("payload"))
          val scale = target.toDouble / math.max(w, h)
          val dw = math.max(1, math.round(w * scale).toInt)
          val dh = math.max(1, math.round(h * scale).toInt)
          Row(r.getLong(0), w, h, dw, dh, (target - dw) / 2, (target - dh) / 2)
        }
      }(enc).orderBy(col("media_id"))
    }),

    // frame-sampling plumbing: deterministic frame indices per media row,
    // exploded to (media_id, frame_no) — the shape a video pipeline fans
    // out to before per-frame decode
    "mm_frame_sample" -> ((s, dir) => {
      val media = mediaTable(s, dir)
        .select(col("media_id"),
          // md5-derived frame count (not xxhash64): bit-identical in
          // DuckDB, so the fan-out is oracle-checkable
          (graft.functions.HashExpressions.md5Bucket(col("payload"), 30) + lit(2))
            .as("n_frames"))
      media
        .select(col("media_id"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(7))).as("frame_no"))
        .orderBy(col("media_id"), col("frame_no"))
    })
  )

  // Decode/frame ops hash stubbed bytes → rows-only checks, except the
  // pure-binary metadata query which DuckDB can mirror exactly.
  val oracleSql: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  source AS uri, lang AS codec,
        |  octet_length(CAST(text AS BLOB)) = n_chars AS size_ok
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 30 + 2 AS n_frames
        |  FROM documents)
        |SELECT media_id, unnest(range(0, n_frames, 7)) AS frame_no
        |FROM m ORDER BY media_id, frame_no""".stripMargin
  )
}
