package graft

import java.sql.Date
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.ArrowIpc

class ArrowIpcSpec extends SparkSpec {

  test("mixed-type roundtrip preserves values, nulls, and schema") {
    val schema = StructType(Seq(
      StructField("i", IntegerType),
      StructField("l", LongType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("s", StringType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("dt", DateType),
      StructField("ts", TimestampNTZType),
      StructField("af", ArrayType(FloatType, containsNull = true)),
      StructField("as", ArrayType(StringType, containsNull = false))))
    val rows = Seq(
      Row(1, 10L, 1.5, 2.5f, "hello", true, Array[Byte](1, 2, 3),
        Date.valueOf("2024-02-29"), LocalDateTime.parse("2024-02-29T12:34:56.123456"),
        Seq(1.0f, null, 3.0f), Seq("a", "b")),
      Row(null, null, null, null, null, null, null, null, null, null, Seq.empty[String]),
      Row(-2, -20L, -0.25, -0.5f, "wörld ✓", false, Array.empty[Byte],
        Date.valueOf("1969-12-31"), LocalDateTime.parse("1969-12-31T23:59:59"),
        Seq.empty[Float].map(x => x: Any), Seq("c")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    ArrowIpc.write(df, "target/graft_arrow/spec_mixed")
    val back = ArrowIpc.read(spark, "target/graft_arrow/spec_mixed")

    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val a = df.collect().map(normRow).toSet
    val b = back.collect().map(normRow).toSet
    assert(a == b)
  }

  private def normRow(r: Row): Seq[Any] = r.toSeq.map {
    case b: Array[Byte] => b.toSeq
    case s: scala.collection.Seq[_] => s.toList
    case v => v
  }

  test("embeddings table (array<float>) roundtrips with one file per partition") {
    val emb = Engine.table(spark, "/root/testdata/sf0.001", "embeddings")
      .repartition(3)
    ArrowIpc.write(emb, "target/graft_arrow/spec_emb")
    val back = ArrowIpc.read(spark, "target/graft_arrow/spec_emb")
    assert(back.rdd.getNumPartitions == 3)
    val agg = back.agg(
      count(lit(1)), sum(col("vec_id")),
      round(sum(aggregate(col("embedding"), lit(0.0d), (a, x) => a + x)), 3)).head()
    val exp = emb.agg(
      count(lit(1)), sum(col("vec_id")),
      round(sum(aggregate(col("embedding"), lit(0.0d), (a, x) => a + x)), 3)).head()
    assert(agg == exp)
  }

  test("decimal and zoned-timestamp columns roundtrip") {
    val schema = StructType(Seq(
      StructField("dec", DecimalType(12, 4)),
      StructField("tsz", TimestampType)))
    val rows = Seq(
      Row(new java.math.BigDecimal("12345678.9012"),
        java.sql.Timestamp.valueOf("2024-06-15 08:30:00.5")),
      Row(new java.math.BigDecimal("-0.0001"), null),
      Row(null, java.sql.Timestamp.valueOf("1969-12-31 23:59:59")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    ArrowIpc.write(df, "target/graft_arrow/spec_dec")
    val back = ArrowIpc.read(spark, "target/graft_arrow/spec_dec")
    assert(back.schema == df.schema)
    assert(back.collect().map(_.toSeq.toList).toSet ==
      df.collect().map(_.toSeq.toList).toSet)
  }

  test("empty partitions produce readable schema-only files") {
    import spark.implicits._
    val df = Seq(1, 2).toDF("x").repartition(4)
    ArrowIpc.write(df, "target/graft_arrow/spec_empty")
    val back = ArrowIpc.read(spark, "target/graft_arrow/spec_empty")
    assert(back.as[Int].collect().sorted.toSeq == Seq(1, 2))
  }
}
