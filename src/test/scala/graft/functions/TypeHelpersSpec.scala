package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TypeHelpersSpec extends SparkSpec {
  import spark.implicits._

  test("union type: value / tag / extract round-trip") {
    val members = Seq("as_long", "as_str")
    val df = Seq(1L, 2L).toDF("x").select(
      TypeHelpers.unionValue(0, members, col("x")).as("u"))
      .union(Seq("hi").toDF("x").select(
        TypeHelpers.unionValue(1, members, col("x")).as("u")))
    val rows = df.select(
      TypeHelpers.unionTag(col("u")).as("tag"),
      TypeHelpers.unionExtract(col("u"), "as_long").as("l"),
      TypeHelpers.unionExtract(col("u"), "as_str").as("s")).collect()
    assert(rows.count(_.getByte(0) == 0) == 2)
    assert(rows.filter(_.getByte(0) == 1).head.getString(2) == "hi")
    assert(rows.filter(_.getByte(0) == 1).head.isNullAt(1))
  }

  test("enum dictionary, code and range helpers") {
    val vals = Seq("small", "medium", "large")
    TypeHelpers.enumDictionary(spark, "sizes", vals)
    assert(spark.table("enum_sizes").count() == 3)
    val codes = Seq("large", "small", "nope").toDF("v")
      .select(TypeHelpers.enumCode(vals, col("v"))).collect().map(r =>
        if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(codes.toSeq == Seq(2, 0, -1))
    val range = Seq(1).toDF("x").select(TypeHelpers.enumRange(vals)).head.getSeq[String](0)
    assert(range == vals)
  }

  test("collation rewrites: nocase / noaccent") {
    val df = Seq(("CAFE", "café")).toDF("a", "b")
    val r = df.select(
      (TypeHelpers.collateNocase(col("a")) ===
        TypeHelpers.collateNocase(col("b"))).as("nocase_only"),
      (TypeHelpers.collateNoaccent(TypeHelpers.collateNocase(col("a"))) ===
        TypeHelpers.collateNoaccent(TypeHelpers.collateNocase(col("b")))).as("both")).head()
    assert(!r.getBoolean(0)) // accent still differs under nocase alone
    assert(r.getBoolean(1))  // nocase + noaccent compares equal
    assert(TypeHelpers.nfcNormalize("é") == "é")
  }

  test("sequences: nextval/currval single-driver semantics") {
    TypeHelpers.createSequence("s1", start = 10)
    assert(TypeHelpers.nextval("s1") == 10L)
    assert(TypeHelpers.nextval("s1") == 11L)
    assert(TypeHelpers.currval("s1") == 11L)
    intercept[IllegalArgumentException](TypeHelpers.nextval("missing"))
  }

  test("glob table function lists matching files") {
    val files = TypeHelpers.glob(spark, "/root/testdata/sf0.001/*.parquet")
    assert(files.count() == 10)
    assert(files.filter(col("file").contains("lineitem")).count() == 1)
    assert(TypeHelpers.glob(spark, "/root/testdata/none/*.x").count() == 0)
  }
}
