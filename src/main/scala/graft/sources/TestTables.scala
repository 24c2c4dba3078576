package graft.sources

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's type-surface TABLE FUNCTIONS, callable through the
  * dialect (registration ref duckdb-6.cpp:13886-13887):
  *
  *  - `test_all_types()` — 3 rows (min / max / NULL) across the v0.7
  *    column set (GetTestTypes, duckdb-6.cpp:13661-13840), carried on
  *    graft's documented SURVEY §1.2 encodings (TIME/TIME_TZ as the
  *    order-isomorphic longs, HUGEINT as DECIMAL(38,0) with min/max
  *    SATURATED to the 38-digit domain — the reference's ±(2^127−1)
  *    needs 39 digits — ENUM/UUID/BIT as their string encodings).
  *  - `test_vector_types(expr [, all_flat])` — per-layout test vectors
  *    for the ARGUMENT's type (duckdb-6.cpp:13890-14135): FLAT
  *    [min,max,NULL], CONSTANT [min,min,min], DICTIONARY (the flat
  *    chunk sliced to entries {1,2} → [max,NULL]), SEQUENCE ([3,5,7]
  *    for the 8 integer types, flat values otherwise; lists/structs
  *    recurse). `all_flat` only changes the internal vector layout, so
  *    the row multiset is identical and the flag is accepted-ignored.
  */
object TestTables {

  private val DuckStr = "🦆" * 6 // 🦆×6
  private val GooNulSe = "goo\u0000se"
  private val BlobMin: Array[Byte] =
    "thisisalongblob\u0000withnullbytes".getBytes("UTF-8")
  private val BlobMax: Array[Byte] = Array[Byte](0, 0, 0, 'a'.toByte)

  private val TsMinUs = -9223372022400000000L // 290309-12-22 (BC) 00:00:00
  private val TsMaxUs = 9223372036854775806L  // micros max − 1 (inf reserved)
  private val TsSMaxUs = 9223372036854000000L
  private val TsMsMaxUs = 9223372036854775000L
  private val TsNsMinUs = -9223372036854775L  // ns min truncated to micros
  private val TsNsMaxUs = 9223372036854775L

  private def ntz(us: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
  private def inst(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  private val IntList: Seq[Any] = Seq(42, 999, null, null, -42)
  private val VarcharList: Seq[Any] = Seq(DuckStr, "goose", null, "")
  private val Dec38Max = BigDecimal("9999999999999999999999999999.9999999999")

  // packed TIME_TZ longs (TypeHelpers encoding: micros<<24 + 57599−offset)
  private val TimeTzMin = 0L // 00:00:00+15:59:59
  private val TimeTzMax = (86400000000L << 24) + (57599L + 57599L)

  /** Reference column order (duckdb-6.cpp:13661). */
  private val schema = StructType(Seq(
    StructField("bool", BooleanType), StructField("tinyint", ByteType),
    StructField("smallint", ShortType), StructField("int", IntegerType),
    StructField("bigint", LongType),
    StructField("hugeint", DecimalType(38, 0)),
    StructField("utinyint", ShortType), StructField("usmallint", IntegerType),
    StructField("uint", LongType), StructField("ubigint", DecimalType(20, 0)),
    StructField("date", DateType), StructField("time", LongType),
    StructField("timestamp", TimestampNTZType),
    StructField("timestamp_s", TimestampNTZType),
    StructField("timestamp_ms", TimestampNTZType),
    StructField("timestamp_ns", TimestampNTZType),
    StructField("time_tz", LongType),
    StructField("timestamp_tz", TimestampType),
    StructField("float", FloatType), StructField("double", DoubleType),
    StructField("dec_4_1", DecimalType(4, 1)),
    StructField("dec_9_4", DecimalType(9, 4)),
    StructField("dec_18_6", DecimalType(18, 6)),
    StructField("dec38_10", DecimalType(38, 10)),
    StructField("uuid", StringType),
    // interval spliced in AFTER createDataFrame (CalendarIntervalType
    // has no external row type) — see testAllTypes
    StructField("varchar", StringType), StructField("blob", BinaryType),
    StructField("bit", StringType),
    StructField("small_enum", StringType),
    StructField("medium_enum", StringType),
    StructField("large_enum", StringType),
    StructField("int_array", ArrayType(IntegerType)),
    StructField("double_array", ArrayType(DoubleType)),
    StructField("date_array", ArrayType(DateType)),
    StructField("timestamp_array", ArrayType(TimestampNTZType)),
    StructField("timestamptz_array", ArrayType(TimestampType)),
    StructField("varchar_array", ArrayType(StringType)),
    StructField("nested_int_array", ArrayType(ArrayType(IntegerType))),
    StructField("struct", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))),
    StructField("struct_of_arrays", StructType(Seq(
      StructField("a", ArrayType(IntegerType)),
      StructField("b", ArrayType(StringType))))),
    StructField("array_of_structs", ArrayType(StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))),
    StructField("map", MapType(StringType, StringType))))

  private def minRow = Row(
    false, Byte.MinValue, Short.MinValue, Int.MinValue, Long.MinValue,
    (-Dec38Max * BigDecimal(10).pow(10)).setScale(0), // −(10^38−1), saturated hugeint
    0.toShort, 0, 0L, BigDecimal(0).setScale(0),
    LocalDate.ofEpochDay(-2147483646L), 0L,
    ntz(TsMinUs), ntz(TsMinUs), ntz(TsMinUs), ntz(TsNsMinUs),
    TimeTzMin, inst(TsMinUs),
    -Float.MaxValue, -Double.MaxValue,
    BigDecimal("-999.9"), BigDecimal("-99999.9999"),
    BigDecimal("-999999999999.999999"), -Dec38Max,
    "00000000-0000-0000-0000-000000000000",
    DuckStr, BlobMin, "0010001001011100010101011010111",
    "DUCK_DUCK_ENUM", "enum_0", "enum_0",
    Seq.empty[Any], Seq.empty[Any], Seq.empty[Any], Seq.empty[Any],
    Seq.empty[Any], Seq.empty[Any], Seq.empty[Any],
    Row(null, null), Row(null, null), Seq.empty[Any],
    Map.empty[String, String])

  private def maxRow = Row(
    true, Byte.MaxValue, Short.MaxValue, Int.MaxValue, Long.MaxValue,
    (Dec38Max * BigDecimal(10).pow(10)).setScale(0),
    255.toShort, 65535, 4294967295L, BigDecimal("18446744073709551615"),
    LocalDate.ofEpochDay(2147483646L), 86400000000L,
    ntz(TsMaxUs), ntz(TsSMaxUs), ntz(TsMsMaxUs), ntz(TsNsMaxUs),
    TimeTzMax, inst(TsMaxUs),
    Float.MaxValue, Double.MaxValue,
    BigDecimal("999.9"), BigDecimal("99999.9999"),
    BigDecimal("999999999999.999999"), Dec38Max,
    "ffffffff-ffff-ffff-ffff-ffffffffffff",
    GooNulSe, BlobMax, "10101",
    "GOOSE", "enum_299", "enum_69999",
    IntList,
    Seq[Any](42.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, null, -42.0),
    Seq[Any](LocalDate.ofEpochDay(0), LocalDate.ofEpochDay(2147483647L),
      LocalDate.ofEpochDay(-2147483648L), null, LocalDate.of(2022, 5, 12)),
    Seq[Any](ntz(0), ntz(Long.MaxValue), ntz(-9223372036854775807L), null,
      LocalDateTime.of(2022, 5, 12, 16, 23, 45)),
    Seq[Any](inst(0), inst(Long.MaxValue), inst(-9223372036854775807L), null,
      inst(1652397825000000L)), // 2022-05-12 16:23:45-07
    VarcharList,
    Seq[Any](Seq.empty[Any], IntList, null, Seq.empty[Any], IntList),
    Row(42, DuckStr), Row(IntList, VarcharList),
    Seq[Any](Row(null, null), Row(42, DuckStr), null),
    scala.collection.immutable.ListMap("key1" -> DuckStr, "key2" -> "goose"))

  private def nullRow = Row(schema.fields.map(_ => null).toSeq: _*)

  /** `test_all_types()`: the 3-row min/max/NULL frame. */
  def testAllTypes(spark: SparkSession): DataFrame = {
    val base = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        minRow, maxRow, nullRow)), schema)
    // interval: min 0 / max 999 months 999 days 999999999 micros
    // (duckdb-6.cpp:13695-13703); make_interval is the one Spark
    // producer of mixed-class CalendarInterval columns
    val withInterval = base.withColumn("interval",
      when(col("bool").isNull, lit(null).cast("interval"))
        .when(col("bool"),
          expr("make_interval(0, 999, 0, 999, 0, 0, 999.999999)"))
        .otherwise(expr("make_interval(0, 0, 0, 0, 0, 0, 0)")))
    // splice interval into the reference's column position (after uuid)
    val names = schema.fieldNames.toSeq
    val (before, after) = names.splitAt(names.indexOf("varchar"))
    withInterval.select((before ++ Seq("interval") ++ after).map(col): _*)
  }

  // ---- test_vector_types ------------------------------------------

  private def minOf(dt: DataType): Any = dt match {
    case BooleanType => false
    case ByteType => Byte.MinValue
    case ShortType => Short.MinValue
    case IntegerType => Int.MinValue
    case LongType => Long.MinValue
    case FloatType => -Float.MaxValue
    case DoubleType => -Double.MaxValue
    case d: DecimalType => -decMax(d)
    case StringType => DuckStr
    case BinaryType => BlobMin
    case DateType => LocalDate.ofEpochDay(-2147483646L)
    case TimestampNTZType => ntz(TsMinUs)
    case TimestampType => inst(TsMinUs)
    case other => throw new UnsupportedOperationException(
      s"Unimplemented type for test_vector_types ${other.sql}")
  }

  private def maxOf(dt: DataType): Any = dt match {
    case BooleanType => true
    case ByteType => Byte.MaxValue
    case ShortType => Short.MaxValue
    case IntegerType => Int.MaxValue
    case LongType => Long.MaxValue
    case FloatType => Float.MaxValue
    case DoubleType => Double.MaxValue
    case d: DecimalType => decMax(d)
    case StringType => GooNulSe
    case BinaryType => BlobMax
    case DateType => LocalDate.ofEpochDay(2147483646L)
    case TimestampNTZType => ntz(TsMaxUs)
    case TimestampType => inst(TsMaxUs)
    case other => throw new UnsupportedOperationException(
      s"Unimplemented type for test_vector_types ${other.sql}")
  }

  private def decMax(d: DecimalType): BigDecimal =
    (BigDecimal(10).pow(d.precision) - 1) / BigDecimal(10).pow(d.scale)

  /** FLAT values [min, max, NULL]; lists/structs recurse exactly like
    * TestVectorFlat::GenerateValues (duckdb-6.cpp:13920-13960). */
  private def flatValues(dt: DataType): Seq[Any] = dt match {
    case st: StructType =>
      val children = st.fields.map(f => flatValues(f.dataType))
      (0 until 3).map(i => Row(children.map(_(i)): _*))
    case ArrayType(et, _) =>
      val c = flatValues(et)
      Seq(Seq(c(0), c(1)), Seq.empty[Any], Seq(c(2)))
    case _ => Seq(minOf(dt), maxOf(dt), null)
  }

  private def isSeqInt(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false // the 4 unsigned types ride these same encodings
  }

  /** SEQUENCE values: start 3 increment 2 count 3 for the integer
    * types; flat values otherwise; lists/structs recurse
    * (TestVectorSequence::GenerateVector, duckdb-6.cpp:13999-14046). */
  private def seqValues(dt: DataType): Seq[Any] = dt match {
    case ByteType => Seq(3.toByte, 5.toByte, 7.toByte)
    case ShortType => Seq(3.toShort, 5.toShort, 7.toShort)
    case IntegerType => Seq(3, 5, 7)
    case LongType => Seq(3L, 5L, 7L)
    case st: StructType =>
      val children = st.fields.map(f => seqValues(f.dataType))
      (0 until 3).map(i => Row(children.map(_(i)): _*))
    case ArrayType(et, _) =>
      // list entries (offset,len) = (0,2),(2,0),(2,1) over the child
      val c = seqValues(et)
      Seq(Seq(c(0), c(1)), Seq.empty[Any], Seq(c(2)))
    case _ => flatValues(dt)
  }

  /** A literal argument binds with `containsNull=false` nullability
    * (e.g. `[1]` → array<int> no-null), under which the catalyst
    * converter silently zeroes the generator's NULL members — force
    * fully-nullable before generating. */
  private def nullable(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => ArrayType(nullable(et), containsNull = true)
    case MapType(kt, vt, _) =>
      MapType(nullable(kt), nullable(vt), valueContainsNull = true)
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = nullable(f.dataType), nullable = true)))
    case other => other
  }

  /** `test_vector_types(expr)`: FLAT + CONSTANT + DICTIONARY + SEQUENCE
    * row blocks for the argument's type, column name `test_vector`. */
  def testVectorTypes(spark: SparkSession, dt0: DataType): DataFrame = {
    val dt = nullable(dt0)
    val flat = flatValues(dt)
    val rows = flat ++ // FLAT: min, max, NULL
      Seq.fill(3)(flat.head) ++ // CONSTANT: 3 × min
      Seq(flat(1), flat(2)) ++ // DICTIONARY: flat sliced to {1, 2}
      seqValues(dt) // SEQUENCE
    val s = StructType(Seq(StructField("test_vector", dt)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        java.util.Arrays.asList(rows.map(Row(_)): _*)), s)
  }
}
