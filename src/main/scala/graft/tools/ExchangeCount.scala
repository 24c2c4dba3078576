package graft.tools

import graft.Engine

/** Dev diagnostic: print the physical Exchange count for each named
  * inventory query at a given sf dir. */
object ExchangeCount {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val names = args(0).split(",")
    names.foreach { n =>
      val plan = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      val all = "Exchange".r.findAllIn(plan).size
      val bc = "BroadcastExchange".r.findAllIn(plan).size
      println(s"EXCOUNT $n shuffles=${all - bc} broadcasts=$bc")
    }
    spark.stop()
  }
}
