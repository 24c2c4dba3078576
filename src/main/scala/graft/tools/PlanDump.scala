package graft.tools

import graft.Engine

/** Dev diagnostic: dump the formatted physical plan of an inventory query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    args(0).split(",").foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
