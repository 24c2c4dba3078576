package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr}

/** Relation API analog (reference: `Relation` duckdb.hpp:18636 with
  * Project/Filter/Limit/Order/Join/Union/…, duckdb.hpp:18680-18736):
  * lazy, composable, string-expression relational building over a
  * DataFrame. Each call just builds more of the logical plan — like the
  * reference, where every Relation node feeds the same planner path
  * (GetQueryNode → Binder), here everything feeds Catalyst.
  */
case class Relation(df: DataFrame) {

  /** Split a top-level comma list (paren/quote aware). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '\'' => inStr = !inStr
      case '(' if !inStr => depth += 1
      case ')' if !inStr => depth -= 1
      case ',' if !inStr && depth == 0 => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  def project(exprs: String): Relation = Relation(df.selectExpr(splitTop(exprs): _*))
  def filter(cond: String): Relation = Relation(df.where(cond))

  def aggregate(aggs: String, groups: String = ""): Relation = {
    val aggExprs = splitTop(aggs).map(expr)
    val grouped =
      if (groups.trim.isEmpty) df.groupBy()
      else df.groupBy(splitTop(groups).map(expr): _*)
    Relation(grouped.agg(aggExprs.head, aggExprs.tail: _*))
  }

  def order(by: String): Relation =
    Relation(df.orderBy(splitTop(by).map { e =>
      val up = e.toUpperCase
      if (up.endsWith(" DESC")) expr(e.substring(0, e.length - 5)).desc
      else if (up.endsWith(" ASC")) expr(e.substring(0, e.length - 4)).asc
      else expr(e).asc
    }: _*))

  def limit(n: Int): Relation = Relation(df.limit(n))
  def distinct(): Relation = Relation(df.distinct())
  def alias(name: String): Relation = Relation(df.as(name))

  def join(other: Relation, cond: String, joinType: String = "inner"): Relation =
    Relation(df.join(other.df, expr(cond), joinType))
  def crossProduct(other: Relation): Relation = Relation(df.crossJoin(other.df))
  def union(other: Relation): Relation = Relation(df.unionAll(other.df))
  def except(other: Relation): Relation = Relation(df.except(other.df))
  def intersect(other: Relation): Relation = Relation(df.intersect(other.df))

  /** Terminal ops (reference Execute()/WriteCSV/Create/Insert). */
  def execute(): Array[org.apache.spark.sql.Row] = df.collect()
  def count(): Long = df.count()
  def create(name: String): Unit = Engine.createTable(df.sparkSession, name, df)
  def insertInto(name: String): Unit = Engine.insertInto(df.sparkSession, name, df)
  def writeCsv(path: String): Unit = sources.Csv.write(df, path)
  def writeParquet(path: String): Unit = df.write.mode("overwrite").parquet(path)
}

object Relation {
  /** Connection::Table analog. */
  def table(spark: org.apache.spark.sql.SparkSession, name: String): Relation =
    Relation(spark.table(name))

  /** Connection::ReadCSV analog. */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String): Relation =
    Relation(sources.Csv.read(spark, path))

  /** Connection::Values analog. */
  def values(spark: org.apache.spark.sql.SparkSession, rows: Seq[Seq[Any]],
             names: Seq[String]): Relation = {
    val sql = rows.map(_.map {
      case s: String => "'" + s.replace("'", "''") + "'"
      case null => "NULL"
      case v => v.toString
    }.mkString("(", ",", ")")).mkString(",")
    Relation(spark.sql(s"SELECT * FROM (VALUES $sql) AS v(${names.mkString(",")})"))
  }
}
