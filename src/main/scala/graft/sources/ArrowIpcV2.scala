package graft.sources

import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{Schema => ArrowSchema}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 face of the Arrow IPC source/sink — what makes the
  * format SQL/DDL-visible the way the reference reaches arrow through
  * table DDL (`STORED AS ARROW`, SURVEY §2.1; arrow-ipc via
  * `/root/reference/Cargo.lock:154`), instead of API-only:
  *
  *   spark.read.format("arrowipc").load(dir)
  *   df.write.format("arrowipc").mode("overwrite").save(dir)
  *   CREATE TABLE t USING arrowipc OPTIONS (path '...'); SELECT ... FROM t
  *
  * The scan/write engine is shared with [[ArrowIpc]] (which is now a thin
  * alias over this provider): per-file input partitions, record batches
  * streamed through a Hadoop seekable channel, one part file per write
  * task with temp+rename commit and a driver-side `_SUCCESS` marker.
  *
  * V2 extras the old API path could not express:
  *  - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): only required
  *    vectors are decoded into rows (IPC still reads whole batch bodies
  *    off disk — no per-column index exists in the format — but row
  *    materialization cost now scales with the projection, and `.explain`
  *    shows the pruned ReadSchema like any other scan).
  *  - APPEND mode: part names carry a per-job id, so appended jobs never
  *    collide with existing parts.
  *  - Task commit rides Spark's V2 commit coordinator (one attempt wins
  *    under speculation) instead of hand-rolled rename races.
  *
  * No filter pushdown on purpose: IPC has no row-group statistics
  * (honest-limits note on [[ArrowIpc]]); filters stay post-scan where
  * Catalyst put them.
  */
class ArrowIpcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrowipc"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowIpcV2.inferOrEmpty(ArrowIpcV2.pathOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ArrowIpcTable(
      ArrowIpcV2.pathOf(new CaseInsensitiveStringMap(properties)), schema)
}

private[sources] object ArrowIpcV2 {

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "arrowipc requires a path (load(dir) / OPTIONS (path '...'))")
    p
  }

  private def hadoopConf() =
    SparkSession.active.sparkContext.hadoopConfiguration

  /** Schema for table resolution. A missing/empty directory is NOT an
    * error here — this runs on the WRITE path too, where the target may
    * not exist yet (the query schema takes over via ACCEPT_ANY_SCHEMA).
    * A directory holding `.arrow` files without the sink's `_SUCCESS`
    * marker IS an error: serving (or silently overwriting) a half-written
    * directory must fail loudly. */
  def inferOrEmpty(path: String): StructType = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(hadoopConf())
    if (!fs.exists(dir)) return StructType(Nil)
    val parts = listParts(fs, dir)
    if (parts.isEmpty) return StructType(Nil)
    requireSuccess(fs, dir, path)
    readHeaderSchema(fs, parts.head)
  }

  def listParts(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Array[Path] =
    fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".arrow")).sortBy(_.getName)

  def requireSuccess(fs: org.apache.hadoop.fs.FileSystem, dir: Path, path: String): Unit =
    if (!fs.exists(new Path(dir, "_SUCCESS")))
      throw new IllegalArgumentException(
        s"ArrowIpc: $path has no _SUCCESS marker — incomplete or foreign " +
          "write; delete the directory to rewrite it")

  /** Driver-side header read of the first part — the IPC analogue of a
    * parquet footer read. */
  def readHeaderSchema(fs: org.apache.hadoop.fs.FileSystem, first: Path): StructType = {
    val alloc = new RootAllocator()
    try {
      val ch = new ArrowIpc.HadoopSeekableChannel(
        fs.open(first), fs.getFileStatus(first).getLen)
      val r = new ArrowFileReader(ch, alloc)
      try StructType(
        r.getVectorSchemaRoot.getSchema.getFields.asScala.map(ArrowIpc.toSparkField).toSeq)
      finally r.close() // closes the channel + stream
    } finally alloc.close()
  }
}

private[sources] class ArrowIpcTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"arrowipc.`$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
    // Only a FRESH target (no schema yet) accepts the query's schema
    // verbatim. An existing table must go through Spark's output
    // resolution instead — by-position rename + safe casts — or INSERT
    // INTO ... VALUES would write the literal relation's col1/col2
    // names into the appended part files.
    if (tableSchema.isEmpty) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowIpcScanBuilder(path, tableSchema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ArrowIpcWriteBuilder(path, info)
}

private[sources] class ArrowIpcScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(r: StructType): Unit = required = r
  override def build(): Scan = new ArrowIpcScan(path, required)
}

private[sources] class ArrowIpcScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ArrowIpc $path ReadSchema: ${required.fieldNames.mkString(", ")}"
  // one InputPartition per FILE: IPC record batches are back-to-back with
  // no index, so the file is the unit of parallelism (the sink's
  // one-file-per-partition layout keeps them balanced)
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    ArrowIpcV2.requireSuccess(fs, dir, path)
    val parts = ArrowIpcV2.listParts(fs, dir)
    if (parts.isEmpty)
      throw new IllegalArgumentException(s"ArrowIpc: no .arrow files under $path")
    parts.map(p => ArrowIpcInputPartition(p.toString): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowIpcReaderFactory(required, new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration))
}

private[sources] case class ArrowIpcInputPartition(file: String) extends InputPartition

private[sources] class ArrowIpcReaderFactory(
    required: StructType, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ArrowIpcPartitionReader(
      p.asInstanceOf[ArrowIpcInputPartition].file, required, conf)
}

/** Streams one file's record batches; decodes ONLY the pruned columns.
  * Resident memory is one record batch. Spark's DataSourceRDD closes the
  * reader on task completion, so early-abort consumers (limit) cannot
  * leak the allocator's direct buffers. */
private[sources] class ArrowIpcPartitionReader(
    file: String, required: StructType, conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val p = new Path(file)
  private val fs = p.getFileSystem(conf.value)
  private val alloc = new RootAllocator()
  private val reader = new ArrowFileReader(
    new ArrowIpc.HadoopSeekableChannel(fs.open(p), fs.getFileStatus(p).getLen), alloc)
  private val root = reader.getVectorSchemaRoot
  private val vecs = root.getFieldVectors
  // pruned-column indices resolved BY NAME against the file's schema —
  // robust to a projection order differing from the file's column order
  private val idx: Array[Int] = {
    val fileCols = root.getSchema.getFields.asScala.map(_.getName)
    required.fieldNames.map { n =>
      val i = fileCols.indexOf(n)
      if (i < 0) throw new IllegalArgumentException(
        s"ArrowIpc: column $n not present in $file (has: ${fileCols.mkString(", ")})")
      i
    }
  }
  private var cur = -1
  private var batchRows = 0

  override def next(): Boolean = {
    cur += 1
    while (cur >= batchRows) {
      if (!reader.loadNextBatch()) return false
      batchRows = root.getRowCount
      cur = 0
    }
    true
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](idx.length)
    var j = 0
    while (j < idx.length) {
      val v = vecs.get(idx(j))
      vals(j) =
        if (v.isNull(cur)) null
        else v match {
          case x: BigIntVector    => x.get(cur)
          case x: IntVector       => x.get(cur)
          case x: SmallIntVector  => x.get(cur)
          case x: TinyIntVector   => x.get(cur)
          case x: Float8Vector    => x.get(cur)
          case x: Float4Vector    => x.get(cur)
          case x: VarCharVector   => UTF8String.fromBytes(x.get(cur))
          case x: BitVector       => x.get(cur) == 1
          case x: DateDayVector   => x.get(cur) // InternalRow dates ARE epoch days
          case x: TimeStampMicroTZVector => x.get(cur) // micros since epoch = internal form
          case x: VarBinaryVector => x.get(cur)
          case x: DecimalVector   => // exact 128-bit grid, internal Decimal form
            org.apache.spark.sql.types.Decimal(
              x.getObject(cur), x.getPrecision, x.getScale)
          case x: org.apache.arrow.vector.complex.ListVector =>
            // offset-range read off the child data vector — no boxed
            // java.util.List materialization per cell
            val start = x.getElementStartIndex(cur)
            val end = x.getElementEndIndex(cur)
            val out = new Array[Any](end - start)
            val dv = x.getDataVector
            var k = start
            while (k < end) {
              out(k - start) = dv match {
                case e: Float4Vector => e.get(k)
                case e: Float8Vector => e.get(k)
                case e: BigIntVector => e.get(k)
                case e: IntVector    => e.get(k)
                case e => throw new IllegalStateException(s"ArrowIpc list elem: $e")
              }
              k += 1
            }
            new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
          case x => throw new IllegalStateException(s"ArrowIpc: $x")
        }
      j += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = { reader.close(); alloc.close() }
}

private[sources] class ArrowIpcWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ArrowIpcBatchWrite(path, info.schema(), doTruncate)
  }
}

/** Job-level write: per-task part files named with a job id (append-safe),
  * temp+rename task commit under Spark's commit coordinator, then a
  * driver-side `_SUCCESS` once every partition has committed — `read`
  * refuses a directory without the marker, so a killed write can never be
  * served as complete data. An all-empty input still gets one batchless
  * part (the schema carrier) so an empty frame roundtrips. */
private[sources] class ArrowIpcBatchWrite(
    path: String, schema: StructType, truncate: Boolean) extends BatchWrite {
  // driver-side, eager: unsupported Spark types fail at plan time
  private val schemaJson =
    new ArrowSchema(schema.fields.map(ArrowIpc.toArrowField).toSeq.asJava).toJson
  private val conf = new SerializableConfiguration(
    SparkSession.active.sparkContext.hadoopConfiguration)
  private val jobId = UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate && fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    new ArrowIpcWriterFactory(path, schemaJson, jobId, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (!fs.listStatus(dir).exists(_.getPath.getName.endsWith(".arrow")))
      ArrowIpc.writeCarrier(
        new Path(dir, s"part-$jobId-empty.arrow"),
        new Path(dir, s".part-$jobId-empty.tmp"), schemaJson, conf.value)
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (fs.exists(dir))
      fs.listStatus(dir)
        .filter(_.getPath.getName.startsWith(s".part-$jobId"))
        .foreach(s => fs.delete(s.getPath, false))
    // committed parts stay behind a missing _SUCCESS → unreadable, loud
  }
}

private[sources] class ArrowIpcWriterFactory(
    path: String, schemaJson: String, jobId: String, conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ArrowIpcDataWriter(path, schemaJson, jobId, partitionId, taskId, conf)
}

private[sources] case class ArrowIpcCommitMessage(file: String) extends WriterCommitMessage

/** Streams `BatchRows`-sized record batches to a temp file as rows
  * arrive; renames into place on task commit. The file is created lazily
  * on the first row so empty partitions leave nothing behind (the driver
  * writes the schema carrier if the whole job was empty). */
private[sources] class ArrowIpcDataWriter(
    path: String, schemaJson: String, jobId: String,
    partitionId: Int, taskId: Long, conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {

  private val dest = new Path(path, f"part-$jobId-$partitionId%05d.arrow")
  private val tmp = new Path(path, f".part-$jobId-$partitionId%05d-$taskId.tmp")
  private val fs = dest.getFileSystem(conf.value)

  private var out: org.apache.hadoop.fs.FSDataOutputStream = null
  private var allocator: RootAllocator = null
  private var root: VectorSchemaRoot = null
  private var writer: ArrowFileWriter = null
  private var vecs: Array[FieldVector] = null
  private var n = 0

  private def ensureOpen(): Unit = if (writer == null) {
    out = fs.create(tmp, true)
    allocator = new RootAllocator()
    root = VectorSchemaRoot.create(ArrowSchema.fromJSON(schemaJson), allocator)
    writer = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(out))
    writer.start()
    vecs = root.getFieldVectors.asScala.toArray
  }

  private def flush(): Unit = if (n > 0) {
    root.setRowCount(n); writer.writeBatch(); root.allocateNew(); n = 0
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    var i = 0
    while (i < vecs.length) {
      if (row.isNullAt(i)) vecs(i) match {
        case v: BaseFixedWidthVector    => v.setNull(n)
        case v: BaseVariableWidthVector => v.setNull(n)
        case v: org.apache.arrow.vector.complex.ListVector => v.setNull(n)
        case v => throw new IllegalStateException(s"ArrowIpc: $v")
      }
      else vecs(i) match {
        case v: BigIntVector    => v.setSafe(n, row.getLong(i))
        case v: IntVector       => v.setSafe(n, row.getInt(i))
        case v: SmallIntVector  => v.setSafe(n, row.getShort(i))
        case v: TinyIntVector   => v.setSafe(n, row.getByte(i))
        case v: Float8Vector    => v.setSafe(n, row.getDouble(i))
        case v: Float4Vector    => v.setSafe(n, row.getFloat(i))
        case v: VarCharVector   => v.setSafe(n, row.getUTF8String(i).getBytes)
        case v: BitVector       => v.setSafe(n, if (row.getBoolean(i)) 1 else 0)
        case v: DateDayVector   => v.setSafe(n, row.getInt(i)) // internal date = days
        case v: TimeStampMicroTZVector => v.setSafe(n, row.getLong(i)) // internal = micros
        case v: VarBinaryVector => v.setSafe(n, row.getBinary(i))
        case v: DecimalVector   =>
          v.setSafe(n, row.getDecimal(i, v.getPrecision, v.getScale).toJavaBigDecimal)
        case v: org.apache.arrow.vector.complex.ListVector =>
          // low-level offset API, not UnionListWriter: the child vector
          // came from the schema, and the promotable writer path would
          // try to re-create (or union-promote) it by name
          val arr = row.getArray(i)
          val m = arr.numElements()
          val start = v.startNewValue(n)
          val dv = v.getDataVector
          var k = 0
          while (k < m) {
            if (arr.isNullAt(k)) throw new IllegalStateException(
              "ArrowIpc: null array elements are not supported")
            dv match {
              case e: Float4Vector => e.setSafe(start + k, arr.getFloat(k))
              case e: Float8Vector => e.setSafe(start + k, arr.getDouble(k))
              case e: BigIntVector => e.setSafe(start + k, arr.getLong(k))
              case e: IntVector    => e.setSafe(start + k, arr.getInt(k))
              case e => throw new IllegalStateException(s"ArrowIpc list elem: $e")
            }
            k += 1
          }
          v.endValue(n, m)
        case v => throw new IllegalStateException(s"ArrowIpc: $v")
      }
      i += 1
    }
    n += 1
    if (n == ArrowIpc.BatchRows) flush()
  }

  private def closeAll(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    if (root != null) { root.close(); root = null }
    if (allocator != null) { allocator.close(); allocator = null }
    if (out != null) { out.close(); out = null }
  }

  override def commit(): WriterCommitMessage = {
    if (writer == null) return ArrowIpcCommitMessage(null) // empty partition
    flush()
    writer.end()
    closeAll()
    // commit coordinator already arbitrated attempts; rename is still
    // temp→final so a crash between end() and here leaves only a .tmp
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      if (!fs.exists(dest))
        throw new java.io.IOException(s"ArrowIpc: commit rename failed for $dest")
    }
    ArrowIpcCommitMessage(dest.toString)
  }

  override def abort(): Unit = {
    closeAll()
    fs.delete(tmp, false)
  }

  override def close(): Unit = closeAll()
}
