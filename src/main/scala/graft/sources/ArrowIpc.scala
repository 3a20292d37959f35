package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC (Feather v2) file source + sink — the one Layer-B storage
  * capability of the reference's stack with no Spark built-in (the
  * reference links `arrow-ipc` via arrow 53.4.0, `Cargo.lock:154`,
  * though its first-party code never reads one; SURVEY §2.1 had it
  * descoped — this closes the row with a real implementation, using the
  * Arrow Java runtime that ships with Spark's own jars).
  *
  * The engine lives in [[ArrowIpcDataSource]] — a DataSource V2
  * `TableProvider` registered under the `arrowipc` short name, so the
  * format is SQL/DDL-visible like the reference's `STORED AS ARROW`
  * surface (CREATE TABLE ... USING arrowipc / spark.read.format). This
  * object keeps the original programmatic API as thin aliases plus the
  * shared type-mapping and carrier-write helpers.
  *
  * Scale shape mirrors parquet's:
  *  - the SINK writes one `part-*.arrow` file PER PARTITION through the
  *    Hadoop FileSystem API (so DFS/object stores work, not just local
  *    disk), streaming `BatchRows`-sized record batches — no driver
  *    collect, no whole-partition buffering;
  *  - the SOURCE distributes file PATHS over executors (one V2 input
  *    partition per file) and STREAMS each file's record batches through
  *    a Hadoop seekable channel — one allocator per task, one record
  *    batch resident at a time, unbounded file size (no 2 GB
  *    whole-file cap) — decoding only the pruned columns.
  *
  * HONEST LIMITS vs parquet: IPC is a transport/interop format, not a
  * query-optimized one — no row-group statistics, so no predicate
  * pushdown (filters apply post-scan), and the parallelism unit is the
  * FILE (record batches are back-to-back with no index, so no
  * intra-file splits — the sink's one-file-per-partition layout keeps
  * files balanced). Use it at the pipeline BOUNDARY (interchange with
  * Arrow-native tools), parquet for storage that gets queried.
  *
  * Type coverage: the scalar core (long/int/double/float/string/bool/
  * date/timestamp/binary), short/byte, decimal(p,s) on the exact
  * 128-bit grid, and arrays of the NUMERIC scalars (list<float> is the
  * embeddings interchange shape). Unsupported Spark types — nested
  * structs/maps, string arrays, null ARRAY ELEMENTS (a null array cell
  * itself is fine) — fail loudly at write time, never silently coerce.
  */
object ArrowIpc {

  private[sources] val BatchRows = 8192

  private[sources] def toArrowField(f: StructField): Field = {
    // arrays carry a child field; scalars have none
    f.dataType match {
      case ArrayType(elem, containsNull) =>
        val child = toArrowField(StructField("element", elem, containsNull))
        elem match {
          case LongType | IntegerType | DoubleType | FloatType => ()
          case other => throw new IllegalArgumentException(
            s"ArrowIpc: unsupported array element type $other for column ${f.name} " +
              "(numeric scalar elements only)")
        }
        return new Field(f.name,
          if (f.nullable) FieldType.nullable(ArrowType.List.INSTANCE)
          else FieldType.notNullable(ArrowType.List.INSTANCE),
          java.util.List.of(child))
      case _ => ()
    }
    val t: ArrowType = f.dataType match {
      case LongType      => new ArrowType.Int(64, true)
      case IntegerType   => new ArrowType.Int(32, true)
      case ShortType     => new ArrowType.Int(16, true)
      case ByteType      => new ArrowType.Int(8, true)
      case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType    => new ArrowType.Utf8
      case BooleanType   => ArrowType.Bool.INSTANCE
      case DateType      => new ArrowType.Date(DateUnit.DAY)
      // Spark timestamps ARE micros-since-epoch in UTC internally; the
      // "UTC" zone marks them instant-semantic for Arrow-native readers
      case TimestampType => new ArrowType.Timestamp(
        org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC")
      case BinaryType    => new ArrowType.Binary
      // Spark decimals are at most 38 digits — always the 128-bit grid
      case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
      case other => throw new IllegalArgumentException(
        s"ArrowIpc: unsupported Spark type $other for column ${f.name}")
    }
    new Field(f.name, if (f.nullable) FieldType.nullable(t) else FieldType.notNullable(t), null)
  }

  private[sources] def toSparkField(f: Field): StructField = {
    val t: DataType = f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case i: ArrowType.Int if i.getBitWidth == 16 => ShortType
      case i: ArrowType.Int if i.getBitWidth == 8  => ByteType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case d: ArrowType.Date if d.getUnit == DateUnit.DAY => DateType
      case ts: ArrowType.Timestamp
        if ts.getUnit == org.apache.arrow.vector.types.TimeUnit.MICROSECOND => TimestampType
      case _: ArrowType.Binary => BinaryType
      case d: ArrowType.Decimal if d.getBitWidth == 128 =>
        DecimalType(d.getPrecision, d.getScale)
      case _: ArrowType.List =>
        val child = toSparkField(f.getChildren.get(0))
        ArrayType(child.dataType, child.nullable)
      case other => throw new IllegalArgumentException(
        s"ArrowIpc: unsupported Arrow type $other for column ${f.getName}")
    }
    StructField(f.getName, t, f.isNullable)
  }

  /** Batchless IPC file holding only the schema — written by the V2
    * driver commit when a job produced zero rows, so an empty frame
    * still roundtrips. Temp+rename like every other part. */
  private[sources] def writeCarrier(dest: Path, tmp: Path, schemaJson: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val fs = dest.getFileSystem(conf)
    val out = fs.create(tmp, true)
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(ArrowSchema.fromJSON(schemaJson), allocator)
    val writer = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(out))
    try { writer.start(); writer.end() }
    finally { writer.close(); root.close(); allocator.close(); out.close() }
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      if (!fs.exists(dest))
        throw new java.io.IOException(s"ArrowIpc: carrier rename failed for $dest")
    }
  }

  /** Read-only adapter from a Hadoop `FSDataInputStream` to the NIO
    * `SeekableByteChannel` the Arrow reader consumes — the piece that
    * lets the scan STREAM record batches off DFS/object storage instead
    * of materializing whole files (a whole-file read would cap at the
    * 2 GB binary-cell limit and hold each file fully in memory; this
    * holds one record batch). */
  private[sources] final class HadoopSeekableChannel(
      in: org.apache.hadoop.fs.FSDataInputStream, length: Long)
      extends java.nio.channels.SeekableByteChannel {
    private var open = true
    // Per-channel scratch, grown on demand — a fresh byte[] per read()
    // call was per-batch garbage on large scans. Lives as long as the
    // file's reader, reused across every record batch.
    private var scratch: Array[Byte] = Array.emptyByteArray
    override def read(dst: java.nio.ByteBuffer): Int = {
      if (in.getPos >= length) return -1
      val want = math.min(dst.remaining().toLong, length - in.getPos).toInt
      if (scratch.length < want) scratch = new Array[Byte](math.max(want, 8192))
      // Hadoop streams may legally return 0 on a non-EOF read; Arrow's
      // readFully treats 0 as "retry", which would busy-spin through
      // this adapter. Absorb the retry here: loop until >=1 byte or EOF.
      var n = in.read(scratch, 0, want)
      while (n == 0 && in.getPos < length) n = in.read(scratch, 0, want)
      if (n > 0) dst.put(scratch, 0, n)
      n
    }
    override def position(): Long = in.getPos
    override def position(p: Long): java.nio.channels.SeekableByteChannel = {
      in.seek(p); this
    }
    override def size(): Long = length
    override def write(src: java.nio.ByteBuffer): Int =
      throw new UnsupportedOperationException("read-only channel")
    override def truncate(s: Long): java.nio.channels.SeekableByteChannel =
      throw new UnsupportedOperationException("read-only channel")
    override def isOpen: Boolean = open
    override def close(): Unit = { open = false; in.close() }
  }

  /** Write `df` as a directory of Arrow IPC part files (overwrite) —
    * alias for `df.write.format("arrowipc").mode("overwrite")`. Type
    * support is validated eagerly so callers get the unsupported-type
    * error at the call site, not from inside the write job. */
  def write(df: DataFrame, path: String): Unit = {
    df.schema.fields.foreach(toArrowField)
    df.write.format("arrowipc").mode("overwrite").save(path)
  }

  /** Scan a directory of Arrow IPC files — alias for
    * `spark.read.format("arrowipc")`, with the `_SUCCESS` guard checked
    * eagerly at the call site (the lazy SQL path re-checks at scan
    * planning). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ArrowIpcV2.requireSuccess(fs, dir, path)
    if (ArrowIpcV2.listParts(fs, dir).isEmpty)
      throw new IllegalArgumentException(s"ArrowIpc: no .arrow files under $path")
    spark.read.format("arrowipc").load(path)
  }
}
