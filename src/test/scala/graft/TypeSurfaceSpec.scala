package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-surface fixture: the all-types frame from FIXTURES.md (analog of
  * the reference's test_all_types() table function, duckdb-6.cpp:14173) —
  * min/max/null rows for every SURVEY §1.2 type mapping, round-tripped
  * through parquet.
  */
class TypeSurfaceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("c_bool", BooleanType), StructField("c_i8", ByteType),
    StructField("c_i16", ShortType), StructField("c_i32", IntegerType),
    StructField("c_i64", LongType),
    StructField("c_u64_widened", DecimalType(20, 0)), // UBIGINT widening
    StructField("c_hugeint", DecimalType(38, 0)),
    StructField("c_f32", FloatType), StructField("c_f64", DoubleType),
    StructField("c_decimal", DecimalType(18, 4)),
    StructField("c_str", StringType), StructField("c_bin", BinaryType),
    StructField("c_date", DateType), StructField("c_ts", TimestampType),
    StructField("c_arr", ArrayType(LongType)),
    StructField("c_map", MapType(StringType, LongType)),
    StructField("c_struct", StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))),
    StructField("c_nested", ArrayType(StructType(Seq(
      StructField("k", StringType), StructField("v", ArrayType(DoubleType))))))))

  private def rows = Seq(
    Row(true, Byte.MaxValue, Short.MaxValue, Int.MaxValue, Long.MaxValue,
      BigDecimal("18446744073709551615"), BigDecimal("99999999999999999999999999999999999999"),
      Float.MaxValue, Double.MaxValue, BigDecimal("99999999999999.9999"),
      "max — ünïcodé ñ 中文 🎉", Array[Byte](1, 2, 3),
      Date.valueOf("9999-12-31"), Timestamp.valueOf("2260-01-01 23:59:59.999999"),
      Seq(1L, 2L, 3L), Map("k1" -> 1L), Row(42L, "s"),
      Seq(Row("x", Seq(1.5, 2.5)))),
    Row(false, Byte.MinValue, Short.MinValue, Int.MinValue, Long.MinValue,
      BigDecimal(0), BigDecimal("-99999999999999999999999999999999999999"),
      Float.MinPositiveValue, -0.0, BigDecimal("-0.0001"),
      "", Array.emptyByteArray,
      Date.valueOf("0001-01-01"), Timestamp.valueOf("1677-09-22 00:00:00"),
      Seq.empty[Long], Map.empty[String, Long], Row(0L, ""),
      Seq.empty[Row]),
    Row(null, null, null, null, null, null, null, null, null, null,
      null, null, null, null, null, null, null, null))

  test("all-types frame round-trips through parquet") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
    val path = "target/graft_types/all_types"
    df.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.schema == schema)
    assert(back.count() == 3)
    // null row stays all-null; max row survives exactly
    assert(back.filter(col("c_bool").isNull).count() == 1)
    val mx = back.filter(col("c_bool") === true).head()
    assert(mx.getAs[Long]("c_i64") == Long.MaxValue)
    assert(mx.getAs[java.math.BigDecimal]("c_u64_widened").toString == "18446744073709551615")
    assert(mx.getAs[String]("c_str").contains("中文"))
    assert(mx.getAs[Row]("c_struct").getLong(0) == 42L)
  }

  test("expressions operate across the type surface") {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
    val r = df.agg(
      count(col("c_bool")).as("nn"),                 // nulls skipped
      max(col("c_i64")).as("mx"),
      sum(col("c_decimal")).as("sd"),
      max(length(col("c_str"))).as("sl")).head()
    assert(r.getAs[Long]("nn") == 2L)
    assert(r.getAs[Long]("mx") == Long.MaxValue)
    assert(r.getAs[Int]("sl") > 10)
  }

  test("unsigned widening and hugeint survive arithmetic") {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.take(1).toSeq), schema)
    val r = df.select((col("c_u64_widened") + 1).as("u1"),
      (col("c_hugeint") % 10).as("h1")).head()
    assert(r.getAs[java.math.BigDecimal]("u1").toString == "18446744073709551616")
  }

  test("TIME_TZ packed encoding: parse/render roundtrip and the reference ordering") {
    import graft.functions.TypeHelpers._
    import spark.implicits._
    // edge shapes beyond the fn_time_tz oracle row: fractional local
    // seconds, an offset with seconds, bare '+00'
    val lits = Seq("10:00:00+02", "10:00:00+00", "10:00:00-03",
      "01:02:03.5+05:30", "23:59:59-08", "08:15:00+00:30", "04:00:00+01:02:03")
    val df = lits.toDF("s").select(col("s"), timeTzFromString(col("s")).as("tz"))
    val back = df.select(timeTzToString(col("tz"))).collect().map(_.getString(0))
    assert(back.toSeq == lits)
    // ordering: LOCAL time ascending, offset DESCENDING on ties — the
    // oracle engine's packed-key order (probed r10: '+02' < '+00' < '-03'
    // at the same local time)
    val sorted = df.orderBy(col("tz")).select(col("s")).collect().map(_.getString(0))
    assert(sorted.toSeq == Seq("01:02:03.5+05:30", "04:00:00+01:02:03",
      "08:15:00+00:30", "10:00:00+02", "10:00:00+00", "10:00:00-03", "23:59:59-08"))
    // components recover exactly
    val r = df.filter(col("s") === "01:02:03.5+05:30")
      .select(timeTzTime(col("tz")), timeTzOffset(col("tz"))).head()
    assert(r.getLong(0) == (1L * 3600 + 2 * 60 + 3) * 1000000L + 500000L)
    assert(r.getLong(1) == 5 * 3600L + 30 * 60L)
  }
}

class LevenshteinWithinSpec extends SparkSpec {
  import graft.plans.LevenshteinWithin.compute

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("banded result equals thresholded full levenshtein") {
    val rng = new scala.util.Random(7)
    val words = Array.fill(40)(rng.alphanumeric.take(rng.nextInt(12)).mkString)
    for (a <- words.take(15); b <- words.take(15); k <- 0 to 4)
      assert(compute(a, b, k) == (lev(a, b) <= k), s"'$a' '$b' k=$k")
    assert(compute("", "", 0) && compute("", "ab", 2) && !compute("", "abc", 2))
  }

  test("expression path (codegen) matches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("kitten", "sitting"), ("abc", "abc"), ("abc", "xyz")).toDF("a", "b")
    val got = df.select(expr("levenshtein_within(a, b, 2)")).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(false, true, false)) // kitten→sitting is 3
  }
}

class ArrayDotSpec extends SparkSpec {
  import spark.implicits._

  test("array_dot matches manual dot product (codegen + interpreted)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val viaExpr = df.select(expr("array_dot(a, b)")).head().getDouble(0)
    assert(viaExpr == 32.0)
    // null element treated as 0; length mismatch takes common prefix
    val df2 = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](2.0, 2.0)))
      .toDF("a", "b")
    assert(df2.select(expr("array_dot(a, b)")).head().getDouble(0) == 2.0)
  }
}
