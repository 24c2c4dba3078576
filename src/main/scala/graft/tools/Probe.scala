package graft.tools

import graft.Engine

/** Dev diagnostic: print schema + a few rows + the formatted plan of a
  * parquet file or an inventory query. Usage:
  *   runMain graft.tools.Probe <parquet-path>
  *   runMain graft.tools.Probe query <name> <sfDir>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
    args match {
      case Array("rewrite", sql) =>
        // dialect debug: print the post-rewrite SQL without executing
        println("REWRITTEN: " + graft.SqlDialect.rewriteCore(spark, sql))
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
      case Array("stagetime", name, sfDir) =>
        // per-stage wall time + task counts of the SECOND (warm) run,
        // noop sink like Bench — locates which exchange/scan a slow
        // query actually spends its time in
        val stages = scala.collection.mutable.Buffer[(Int, Long, Int, String)]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            stages += ((si.stageId,
              si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
              si.numTasks, si.name.linesIterator.next().take(90)))
          }
        })
        def run(): Double = {
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e6
        }
        run() // warm-up: JIT + file index + broadcast pools
        Thread.sleep(500) // drain async listener bus BEFORE clearing —
        // late warm-up stage events would otherwise pollute the report
        stages.clear()
        val wall = run()
        Thread.sleep(500) // listener bus drain
        stages.sortBy(_._1).foreach { case (id, ms, nt, nm) =>
          println(f"STAGE $id%3d ${ms}%5d ms tasks=$nt%-3d $nm") }
        println(f"WALL $wall%.0f ms")
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
