package graft.sources

import java.nio.channels.Channels
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC (Feather v2) import/export — the reference's
  * `ArrowTableFunction` surface (zero-copy Arrow stream scan + result
  * export, duckdb-6.cpp:7612), re-expressed for a distributed engine:
  * instead of one in-process stream, a directory of IPC files, one per
  * partition, written/read by the executors through the Hadoop
  * filesystem API (so the same code addresses local disk, HDFS, or
  * object stores on a real cluster).
  *
  * Scale notes: the write side streams each partition through a single
  * bounded `VectorSchemaRoot` (BatchRows rows per IPC record batch, no
  * partition-wide buffering); the read side parallelizes over files —
  * at 100 TB the file list is the unit of parallelism, matching how
  * parquet scans split. No driver materialization on either path.
  */
object ArrowIpc {

  private val BatchRows = 16384

  // ---- schema mapping ----

  private def toArrowField(f: StructField): Field = f.dataType match {
    case IntegerType => primitive(f.name, f.nullable, new ArrowType.Int(32, true))
    case LongType => primitive(f.name, f.nullable, new ArrowType.Int(64, true))
    case ShortType => primitive(f.name, f.nullable, new ArrowType.Int(16, true))
    case ByteType => primitive(f.name, f.nullable, new ArrowType.Int(8, true))
    case DoubleType =>
      primitive(f.name, f.nullable, new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
    case FloatType =>
      primitive(f.name, f.nullable, new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
    case StringType => primitive(f.name, f.nullable, ArrowType.Utf8.INSTANCE)
    case BinaryType => primitive(f.name, f.nullable, ArrowType.Binary.INSTANCE)
    case BooleanType => primitive(f.name, f.nullable, ArrowType.Bool.INSTANCE)
    case DateType => primitive(f.name, f.nullable, new ArrowType.Date(DateUnit.DAY))
    case TimestampNTZType =>
      primitive(f.name, f.nullable, new ArrowType.Timestamp(TimeUnit.MICROSECOND, null))
    case TimestampType =>
      primitive(f.name, f.nullable, new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC"))
    case d: DecimalType =>
      primitive(f.name, f.nullable, new ArrowType.Decimal(d.precision, d.scale, 128))
    case ArrayType(et, containsNull) =>
      val child = toArrowField(StructField("element", et, containsNull))
      new Field(f.name, new FieldType(f.nullable, ArrowType.List.INSTANCE, null),
        Seq(child).asJava)
    case other =>
      throw new UnsupportedOperationException(s"ArrowIpc: unsupported Spark type $other")
  }

  private def primitive(name: String, nullable: Boolean, t: ArrowType): Field =
    new Field(name, new FieldType(nullable, t, null), java.util.Collections.emptyList[Field])

  private def toSparkType(t: ArrowType, children: Seq[Field]): DataType = t match {
    case i: ArrowType.Int => i.getBitWidth match {
      case 8 => ByteType
      case 16 => ShortType
      case 32 => IntegerType
      case 64 => LongType
      case w => throw new UnsupportedOperationException(s"ArrowIpc: int width $w")
    }
    case fp: ArrowType.FloatingPoint => fp.getPrecision match {
      case FloatingPointPrecision.SINGLE => FloatType
      case _ => DoubleType
    }
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Date => DateType
    case ts: ArrowType.Timestamp =>
      if (ts.getTimezone == null) TimestampNTZType else TimestampType
    case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
    case _: ArrowType.List =>
      val c = children.head
      ArrayType(toSparkType(c.getType, c.getChildren.asScala.toSeq), c.isNullable)
    case other =>
      throw new UnsupportedOperationException(s"ArrowIpc: unsupported Arrow type $other")
  }

  private[sources] def toSparkSchema(s: ASchema): StructType =
    StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.getName, toSparkType(f.getType, f.getChildren.asScala.toSeq),
        f.isNullable)))

  // ---- value conversion (one row-index slot of one vector) ----

  private def micros(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case l: java.time.LocalDateTime =>
      l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000L
    case other => throw new UnsupportedOperationException(s"timestamp value $other")
  }

  private def epochDays(v: Any): Int = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case l: java.time.LocalDate => l.toEpochDay.toInt
    case other => throw new UnsupportedOperationException(s"date value $other")
  }

  private def setValue(vec: FieldVector, i: Int, v: Any): Unit = vec match {
    case x: IntVector => x.setSafe(i, v.asInstanceOf[Int])
    case x: BigIntVector => x.setSafe(i, v.asInstanceOf[Long])
    case x: SmallIntVector => x.setSafe(i, v.asInstanceOf[Short])
    case x: TinyIntVector => x.setSafe(i, v.asInstanceOf[Byte])
    case x: Float8Vector => x.setSafe(i, v.asInstanceOf[Double])
    case x: Float4Vector => x.setSafe(i, v.asInstanceOf[Float])
    case x: VarCharVector => x.setSafe(i, v.toString.getBytes(StandardCharsets.UTF_8))
    case x: VarBinaryVector => x.setSafe(i, v.asInstanceOf[Array[Byte]])
    case x: BitVector => x.setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
    case x: DateDayVector => x.setSafe(i, epochDays(v))
    case x: TimeStampMicroVector => x.setSafe(i, micros(v))
    case x: TimeStampMicroTZVector => x.setSafe(i, micros(v))
    case x: DecimalVector => x.setSafe(i, v.asInstanceOf[java.math.BigDecimal])
    case x: ListVector =>
      val w = x.getWriter
      w.setPosition(i)
      w.startList()
      val elems = v match {
        case s: scala.collection.Seq[_] => s
        case a: Array[_] => a.toSeq
        case other => throw new UnsupportedOperationException(s"array value $other")
      }
      elems.foreach {
        case null => w.writeNull()
        case e: Float => w.writeFloat4(e)
        case e: Double => w.writeFloat8(e)
        case e: Int => w.writeInt(e)
        case e: Long => w.writeBigInt(e)
        case e: String =>
          val b = e.getBytes(StandardCharsets.UTF_8)
          val buf = x.getAllocator.buffer(b.length)
          try { buf.writeBytes(b); w.writeVarChar(0, b.length, buf) }
          finally buf.close()
        case e => throw new UnsupportedOperationException(s"array element $e")
      }
      w.endList()
    case other =>
      throw new UnsupportedOperationException(s"ArrowIpc write: ${other.getClass}")
  }

  private def getValue(vec: FieldVector, i: Int): Any = vec match {
    case x: IntVector => x.get(i)
    case x: BigIntVector => x.get(i)
    case x: SmallIntVector => x.get(i)
    case x: TinyIntVector => x.get(i)
    case x: Float8Vector => x.get(i)
    case x: Float4Vector => x.get(i)
    case x: VarCharVector => new String(x.get(i), StandardCharsets.UTF_8)
    case x: VarBinaryVector => x.get(i)
    case x: BitVector => x.get(i) == 1
    case x: DateDayVector => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.get(i)))
    case x: TimeStampMicroVector =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(x.get(i), 1000000L), (Math.floorMod(x.get(i), 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case x: TimeStampMicroTZVector =>
      val us = x.get(i)
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    case x: DecimalVector => x.getObject(i)
    case x: ListVector =>
      val inner = x.getDataVector
      val start = x.getOffsetBuffer.getInt(i * 4L)
      val end = x.getOffsetBuffer.getInt((i + 1) * 4L)
      (start until end).map { j =>
        if (inner.isNull(j)) null else getValue(inner.asInstanceOf[FieldVector], j)
      }
    case other =>
      throw new UnsupportedOperationException(s"ArrowIpc read: ${other.getClass}")
  }

  // ---- write ----

  /** Write `df` as a directory of Arrow IPC files (one per partition).
    * Streams each partition in BatchRows record batches — bounded memory
    * regardless of partition size. */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val arrowFields = schema.fields.map(toArrowField) // fail fast on the driver
    require(arrowFields.nonEmpty, "ArrowIpc.write: empty schema")
    val outPath = new Path(dir)
    val driverFs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
    driverFs.delete(outPath, true)
    driverFs.mkdirs(outPath)

    val written = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val aschema = new ASchema(schema.fields.map(toArrowField).toSeq.asJava)
      val file = new Path(dir, f"part-$pid%05d.arrow")
      val fs = file.getFileSystem(new Configuration())
      val allocator = new RootAllocator()
      val root = VectorSchemaRoot.create(aschema, allocator)
      val out = fs.create(file, true)
      val writer = new ArrowFileWriter(root, null, Channels.newChannel(out))
      try {
        writer.start()
        val vectors = root.getFieldVectors.asScala.toArray
        while (rows.hasNext) {
          root.allocateNew()
          var n = 0
          while (n < BatchRows && rows.hasNext) {
            val row = rows.next()
            var c = 0
            while (c < vectors.length) {
              if (row.isNullAt(c)) vectors(c).setNull(n)
              else setValue(vectors(c), n, row.get(c))
              c += 1
            }
            n += 1
          }
          root.setRowCount(n)
          writer.writeBatch()
        }
        writer.end()
      } finally {
        writer.close()
        root.close()
        allocator.close()
        out.close()
      }
      Iterator.single(file.toString)
    }
    written.count() // force the distributed write
    ()
  }

  // ---- read ----

  /** Read a directory of Arrow IPC files (or a single file) as a
    * DataFrame. One Spark partition per IPC file. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val inPath = new Path(dir)
    val fs = inPath.getFileSystem(spark.sessionState.newHadoopConf())
    val files: Seq[String] =
      if (fs.getFileStatus(inPath).isDirectory)
        fs.listStatus(inPath).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".arrow")).map(_.toString).sorted
      else Seq(inPath.toString)
    require(files.nonEmpty, s"ArrowIpc.read: no .arrow files under $dir")

    // schema from the first file's footer (driver-side metadata read only)
    val sparkSchema = {
      val allocator = new RootAllocator()
      val in = fs.open(new Path(files.head))
      try {
        val bytes = readFully(in, fs.getFileStatus(new Path(files.head)).getLen)
        val reader = new ArrowFileReader(
          new ByteArrayReadableSeekableByteChannel(bytes), allocator)
        try toSparkSchema(reader.getVectorSchemaRoot.getSchema)
        finally reader.close()
      } finally { in.close(); allocator.close() }
    }

    val rdd = spark.sparkContext
      .parallelize(files, files.length)
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val path = new Path(p)
          val pfs = path.getFileSystem(new Configuration())
          val in = pfs.open(path)
          val bytes =
            try readFully(in, pfs.getFileStatus(path).getLen)
            finally in.close()
          val allocator = new RootAllocator()
          val reader = new ArrowFileReader(
            new ByteArrayReadableSeekableByteChannel(bytes), allocator)
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          try {
            val root = reader.getVectorSchemaRoot
            while (reader.loadNextBatch()) {
              val vectors = root.getFieldVectors.asScala.toArray
              var i = 0
              while (i < root.getRowCount) {
                val vals = new Array[Any](vectors.length)
                var c = 0
                while (c < vectors.length) {
                  vals(c) = if (vectors(c).isNull(i)) null else getValue(vectors(c), i)
                  c += 1
                }
                out += Row.fromSeq(vals.toIndexedSeq)
                i += 1
              }
            }
          } finally { reader.close(); allocator.close() }
          out.iterator
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  private def readFully(in: org.apache.hadoop.fs.FSDataInputStream, len: Long): Array[Byte] = {
    require(len <= Int.MaxValue, "ArrowIpc: single IPC file exceeds 2 GiB")
    val buf = new Array[Byte](len.toInt)
    in.readFully(0, buf)
    buf
  }
}
