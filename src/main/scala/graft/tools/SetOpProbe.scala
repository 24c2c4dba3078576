package graft.tools
object SetOpProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("local[8]", 8)
    val cases = Seq(
      "s01" -> "SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 'a') t ORDER BY x",
      "s11" -> "SELECT x FROM (SELECT true AS x UNION ALL SELECT 1) t ORDER BY x",
      "dfl" -> "SELECT typeof(x) AS ty FROM (SELECT CAST(1.5 AS DECIMAL(11,1)) AS x UNION ALL SELECT CAST(2.5 AS FLOAT)) t LIMIT 1",
      "dbl" -> "SELECT x FROM (SELECT 0.1::DOUBLE AS x UNION ALL SELECT 'z') t ORDER BY x",
      "hug" -> "SELECT typeof(x) AS ty FROM (SELECT CAST(1 AS HUGEINT) AS x UNION ALL SELECT 2) t LIMIT 1",
      "big" -> "SELECT typeof(x) AS ty FROM (SELECT CAST(1 AS BIGINT) AS x UNION ALL SELECT CAST(2.5 AS DECIMAL(11,1))) t LIMIT 1",
      "dts" -> "SELECT x FROM (SELECT DATE '2024-01-02' AS x UNION ALL SELECT TIMESTAMP '2024-01-01 01:00:00') t ORDER BY x",
      "blb" -> "SELECT typeof(x) AS ty FROM (SELECT 'ab' AS x UNION ALL SELECT BLOB '\\x01') t LIMIT 1",
      "cte" -> "WITH c AS (SELECT 7 AS x) SELECT x FROM c UNION ALL SELECT 'q' ORDER BY x",
      "trip" -> "SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 'a' UNION ALL SELECT true) t ORDER BY x",
      "nat" -> "SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 2) t ORDER BY x",
      "byname" -> "SELECT * FROM (SELECT 1 AS a, 2 AS b UNION ALL BY NAME SELECT 3 AS b, 4 AS a) t ORDER BY a"
    )
    cases.foreach { case (n, q) =>
      val r = scala.util.Try {
        val df = graft.SqlDialect.sql(spark, q)
        df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",") + " | " +
          df.collect().map(_.toSeq.mkString("[",",","]")).mkString(" ")
      }
      println(s"PROBE $n => ${r.fold(e => "ERR " + e.getMessage.split("\n").head.take(100), identity)}")
    }
    spark.stop()
  }
}
