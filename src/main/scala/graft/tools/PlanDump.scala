package graft.tools

/** Prints the formatted ADAPTIVE (post-execution) plan of named
  * SparkEntry queries — the lab companion to FloorProfile: the timeline
  * says which job is slow, this says what that job runs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PlanDump q1 [q2 ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.collect()
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
