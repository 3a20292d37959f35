package graft.sources

import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Arrow IPC (Feather v2) file source + sink — the one Layer-B storage
  * capability of the reference's stack with no Spark built-in (the
  * reference links `arrow-ipc` via arrow 53.4.0, `Cargo.lock:154`,
  * though its first-party code never reads one; SURVEY §2.1 had it
  * descoped — this closes the row with a real implementation, using the
  * Arrow Java runtime that ships with Spark's own jars).
  *
  * Scale shape mirrors parquet's:
  *  - the SINK writes one `part-NNNNN.arrow` file PER PARTITION through
  *    the Hadoop FileSystem API (so DFS/object stores work, not just
  *    local disk), streaming `BatchRows`-sized record batches — no
  *    driver collect, no whole-partition buffering;
  *  - the SOURCE distributes file PATHS over executors and STREAMS each
  *    file's record batches through a Hadoop seekable channel inside
  *    `mapPartitions` — one allocator per partition, one record batch
  *    resident at a time, unbounded file size (no 2 GB whole-file cap).
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
  * date) — unsupported Spark types fail loudly at write time.
  */
object ArrowIpc {

  private val BatchRows = 8192

  private[sources] def toArrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case LongType    => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType  => new ArrowType.Utf8
      case BooleanType => ArrowType.Bool.INSTANCE
      case DateType    => new ArrowType.Date(DateUnit.DAY)
      case other => throw new IllegalArgumentException(
        s"ArrowIpc: unsupported Spark type $other for column ${f.name}")
    }
    new Field(f.name, if (f.nullable) FieldType.nullable(t) else FieldType.notNullable(t), null)
  }

  private[sources] def toSparkField(f: Field): StructField = {
    val t: DataType = f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case d: ArrowType.Date if d.getUnit == DateUnit.DAY => DateType
      case other => throw new IllegalArgumentException(
        s"ArrowIpc: unsupported Arrow type $other for column ${f.getName}")
    }
    StructField(f.getName, t, f.isNullable)
  }

  /** Stream `rows` into `dest` as one IPC file, via a temp file + rename
    * COMMIT: a task that dies mid-write leaves only a `.tmp` orphan, and
    * when speculative twin attempts race, exactly one rename wins (the
    * loser deletes its temp and accepts the winner's file). */
  private def writeOneFile(rows: Iterator[Row], dest: Path, tmp: Path,
      schemaJson: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val fs = dest.getFileSystem(conf)
    val out = fs.create(tmp, true)
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(ArrowSchema.fromJSON(schemaJson), allocator)
    val writer = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(out))
    try {
      writer.start()
      val vecs = root.getFieldVectors.asScala.toArray
      var n = 0
      def flush(): Unit = if (n > 0) {
        root.setRowCount(n); writer.writeBatch(); root.allocateNew(); n = 0
      }
      rows.foreach { row =>
        var i = 0
        while (i < vecs.length) {
          if (row.isNullAt(i)) vecs(i).asInstanceOf[FieldVector] match {
            case v: BaseFixedWidthVector => v.setNull(n)
            case v: BaseVariableWidthVector => v.setNull(n)
            case v => throw new IllegalStateException(s"ArrowIpc: $v")
          }
          else vecs(i) match {
            case v: BigIntVector  => v.setSafe(n, row.getLong(i))
            case v: IntVector     => v.setSafe(n, row.getInt(i))
            case v: Float8Vector  => v.setSafe(n, row.getDouble(i))
            case v: Float4Vector  => v.setSafe(n, row.getFloat(i))
            case v: VarCharVector => v.setSafe(n, row.getString(i).getBytes(StandardCharsets.UTF_8))
            case v: BitVector     => v.setSafe(n, if (row.getBoolean(i)) 1 else 0)
            case v: DateDayVector => v.setSafe(n, row.getDate(i).toLocalDate.toEpochDay.toInt)
            case v => throw new IllegalStateException(s"ArrowIpc: $v")
          }
          i += 1
        }
        n += 1
        if (n == BatchRows) flush()
      }
      flush()
      writer.end()
    } finally { writer.close(); root.close(); allocator.close(); out.close() }
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      if (!fs.exists(dest)) // not a lost speculative race — a real failure
        throw new java.io.IOException(s"ArrowIpc: commit rename failed for $dest")
    }
  }

  /** Write `df` as a directory of Arrow IPC part files (overwrite).
    * Commit protocol: per-part temp+rename, then a `_SUCCESS` marker
    * once every partition has committed — `read` refuses a directory
    * without the marker, so a killed write can never be served as
    * complete data. An empty input still writes one batchless part
    * (the schema carrier) so the roundtrip of an empty frame works. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val arrowSchema = new ArrowSchema(df.schema.fields.map(toArrowField).toSeq.asJava)
    val schemaJson = arrowSchema.toJson // POJO Schema is not serializable; its JSON is
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val tc = TaskContext.get()
        val pid = TaskContext.getPartitionId()
        val attempt = if (tc == null) 0L else tc.taskAttemptId()
        writeOneFile(rows,
          new Path(path, f"part-$pid%05d.arrow"),
          new Path(path, f".part-$pid%05d-attempt-$attempt.tmp"),
          schemaJson, conf.value)
      }
    }
    if (!fs.listStatus(dir).exists(_.getPath.getName.endsWith(".arrow")))
      writeOneFile(Iterator.empty, new Path(path, "part-00000.arrow"),
        new Path(path, ".part-00000-driver.tmp"), schemaJson, conf.value)
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  /** Read-only adapter from a Hadoop `FSDataInputStream` to the NIO
    * `SeekableByteChannel` the Arrow reader consumes — the piece that
    * lets the scan STREAM record batches off DFS/object storage instead
    * of materializing whole files (the former `binaryFile` path capped
    * files at the 2 GB binary-cell limit and held each file fully in
    * memory; this holds one record batch). */
  private final class HadoopSeekableChannel(
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

  /** Scan a directory of Arrow IPC files back into a DataFrame. The
    * schema comes from the first part file (driver-side header read —
    * the IPC analogue of a parquet footer read). Requires the sink's
    * `_SUCCESS` marker: a directory from a killed write must fail
    * loudly, never be silently served with missing partitions.
    *
    * Distribution: file PATHS spread over executors; each task opens
    * its files through the Hadoop FileSystem and streams record batches
    * through a seekable channel — resident memory is one batch, not one
    * file, and file size is unbounded (the old whole-file `binaryFile`
    * row hit the 2 GB cell cap). IPC's unit of parallelism stays the
    * FILE (no intra-file splits: batches are back-to-back with no
    * row-group index), matching the sink's one-file-per-partition
    * layout. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir, "_SUCCESS")))
      throw new IllegalArgumentException(
        s"ArrowIpc: $path has no _SUCCESS marker — incomplete or foreign write")
    val parts = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".arrow")).sortBy(_.getName)
    val first = parts.headOption
      .getOrElse(throw new IllegalArgumentException(s"ArrowIpc: no .arrow files under $path"))
    val headerAlloc = new RootAllocator()
    val schema = try {
      val in = fs.open(first)
      val ch = new HadoopSeekableChannel(in, fs.getFileStatus(first).getLen)
      val r = new ArrowFileReader(ch, headerAlloc)
      try StructType(r.getVectorSchemaRoot.getSchema.getFields.asScala.map(toSparkField).toSeq)
      finally r.close() // closes the channel + stream
    } finally headerAlloc.close()
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val pathStrs = parts.map(_.toString).toSeq
    spark.createDataset(pathStrs)(org.apache.spark.sql.Encoders.STRING)
      .repartition(math.min(pathStrs.size,
        spark.sparkContext.defaultParallelism).max(1))
      .mapPartitions { files =>
        // one open reader/allocator at a time per partition, closed on
        // file exhaustion AND (for early-abort consumers like limit())
        // on task completion — without the listener a partially-drained
        // iterator would leak the allocator's direct buffers for the
        // JVM's lifetime
        var curReader: ArrowFileReader = null
        var curAlloc: RootAllocator = null
        def closeCur(): Unit = {
          if (curReader != null) { curReader.close(); curReader = null }
          if (curAlloc != null) { curAlloc.close(); curAlloc = null }
        }
        val tc = TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeCur())
        files.flatMap { pathStr =>
          closeCur() // previous file's resources, if its iterator was abandoned
          val p = new Path(pathStr)
          val pfs = p.getFileSystem(conf.value)
          curAlloc = new RootAllocator()
          curReader = new ArrowFileReader(
            new HadoopSeekableChannel(pfs.open(p), pfs.getFileStatus(p).getLen),
            curAlloc)
          val reader = curReader
          val root = reader.getVectorSchemaRoot
          new Iterator[Row] {
            private var inBatch = 0
            private var batchRows = 0
            private var done = false // idempotent-exhaustion guard: never
            // touch the (closed) reader again after the last batch
            private def advance(): Unit =
              while (!done && inBatch >= batchRows) {
                if (reader.loadNextBatch()) { batchRows = root.getRowCount; inBatch = 0 }
                else { done = true; closeCur() }
              }
            override def hasNext: Boolean = { advance(); !done }
            override def next(): Row = {
              advance()
              if (done) throw new NoSuchElementException("ArrowIpc: exhausted")
              val vecs = root.getFieldVectors
              val vals = new Array[Any](vecs.size())
              var i = 0
              while (i < vals.length) {
                val v = vecs.get(i)
                vals(i) =
                  if (v.isNull(inBatch)) null
                  else v match {
                    case x: BigIntVector  => x.get(inBatch)
                    case x: IntVector     => x.get(inBatch)
                    case x: Float8Vector  => x.get(inBatch)
                    case x: Float4Vector  => x.get(inBatch)
                    case x: VarCharVector => new String(x.get(inBatch), StandardCharsets.UTF_8)
                    case x: BitVector     => x.get(inBatch) == 1
                    case x: DateDayVector =>
                      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.get(inBatch).toLong))
                    case x => throw new IllegalStateException(s"ArrowIpc: $x")
                  }
                i += 1
              }
              inBatch += 1
              Row.fromSeq(vals.toSeq)
            }
          }
        }
      }(enc)
  }
}
