package graft.tools

import graft.Engine

/** Dev diagnostic: print schema + a few rows + the formatted plan of a
  * parquet file or an inventory query. Usage:
  *   runMain graft.tools.Probe <parquet-path>
  *   runMain graft.tools.Probe query <name> <sfDir>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]")
    args match {
      case Array("query", name, sfDir) =>
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.printSchema()
        df.show(10, truncate = false)
        df.explain("formatted")
      case Array("execplan", name, sfDir) =>
        // the FINAL adaptive plan (after runtime replanning + exchange
        // reuse), which explain() on the lazy frame cannot show
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        println(p)
        println(s"SCANCOUNT=${"Scan parquet".r.findAllIn(p).size} " +
          s"REUSED=${"ReusedExchange".r.findAllIn(p).size}")
      case Array("functions") =>
        Engine.functionsTable(spark).collect()
          .foreach(r => println("FN " + r.getString(0)))
      case Array(path) =>
        val df = spark.read.parquet(path)
        df.printSchema()
        df.show(5, truncate = false)
        println(s"count=${df.count()}")
      case _ => System.err.println("usage: Probe <path> | Probe query <name> <sfDir>")
    }
    spark.stop()
  }
}
