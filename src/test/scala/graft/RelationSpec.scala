package graft

import org.apache.spark.sql.functions._

/** Relation API (reference §3.2 analog) — lazy composition over
  * DataFrames with string expressions. */
class RelationSpec extends SparkSpec {
  import spark.implicits._

  private def base() = Relation(
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0)).toDF("id", "grp", "v"))

  test("project / filter / aggregate / order / limit compose lazily") {
    val out = base()
      .filter("v > 6")
      .project("id, grp, v * 2 AS v2")
      .aggregate("sum(v2) AS s, count(*) AS n", "grp")
      .order("s DESC")
      .limit(1)
      .execute()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("s") == 60.0)
  }

  test("join / union / except across relations") {
    val dims = Relation(Seq(("a", "alpha"), ("b", "beta")).toDF("grp", "label"))
    val joined = base().alias("l").join(dims.alias("r"), "l.grp = r.grp", "inner")
    assert(joined.count() == 3)
    val u = base().union(base())
    assert(u.count() == 6)
    assert(u.distinct().count() == 3)
  }

  test("values constructor and create/insertInto") {
    val r = Relation.values(spark, Seq(Seq(1, "x"), Seq(2, "y")), Seq("k", "s"))
    r.create("rel_t")
    Relation.values(spark, Seq(Seq(3, "z")), Seq("k", "s")).insertInto("rel_t")
    assert(spark.table("rel_t").count() == 3)
  }

  test("exportDatabase dumps tables + DDL") {
    Engine.createTable(spark, "exp_a", Seq((1L, "x")).toDF("id", "s"))
    Engine.exportDatabase(spark, "target/graft_export")
    assert(new java.io.File("target/graft_export/exp_a.parquet").exists())
    val ddl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("target/graft_export/schema.sql")))
    assert(ddl.contains("CREATE TABLE exp_a (id BIGINT, s STRING);"))
    assert(spark.read.parquet("target/graft_export/exp_a.parquet").count() == 1)
  }

  test("importDatabase restores exported tables") {
    Engine.createTable(spark, "imp_a", Seq((7L, "q")).toDF("id", "s"))
    Engine.exportDatabase(spark, "target/graft_export2")
    spark.catalog.dropTempView("imp_a")
    Engine.importDatabase(spark, "target/graft_export2")
    assert(spark.table("imp_a").head().getLong(0) == 7L)
  }

  test("bar renders proportional blocks") {
    import graft.queries.ScalarFns.bar
    // The reference amalgamation's BarScalarFunction does NOT pad, but the
    // DuckDB 1.0 oracle right-pads with spaces to `width` UTF-8 bytes —
    // multi-byte block chars exceed the byte budget so full bars get no pad.
    assert(bar(10, 0, 10, 10) == "█" * 10)
    assert(bar(5, 0, 10, 10) == "█" * 5)
    assert(bar(0, 0, 10, 10) == " " * 10)
    assert(bar(3.25, 0, 10, 4).startsWith("█"))
  }
}
