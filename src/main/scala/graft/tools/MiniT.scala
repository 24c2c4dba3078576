package graft.tools
object MiniT {
  def main(args: Array[String]): Unit = {
    val q = "SELECT count(*) AS n FROM nation WHERE n_name SIMILAR TO '.*(IA|US).*'"
    val spark = graft.Engine.session("local[4]", 4)
    graft.Engine.registerAll(spark, "/root/testdata/sf0.001")
    println("rewritten: " + graft.SqlDialect.rewriteCore(spark, q))
    println(graft.SqlDialect.sql(spark, q).collect().mkString)
    spark.stop()
  }
}
