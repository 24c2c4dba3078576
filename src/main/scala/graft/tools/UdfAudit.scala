package graft.tools

/** Dev diagnostic: list inventory queries whose PHYSICAL plan contains a
  * ScalaUDF node (codegen-fencing, boxed per-row interpretation). */
object UdfAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val n = "UDF".r.findAllIn(plan).size
        if (n > 0) println(s"UDF $name count=$n")
      } catch { case e: Throwable => println(s"UDF $name ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
