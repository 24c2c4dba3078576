package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev diagnostic behind BASELINE.md's streaming carve-out: run one
  * streaming inventory transform at the given sf dir and print each
  * micro-batch's durationMs breakdown (planning / offset-WAL / state
  * commit / addBatch) plus the state-store row count — the evidence
  * that the wall is micro-batch machinery, not the windowed aggregation
  * itself. Usage: runMain graft.tools.StreamProfile [sfDir]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", 32)
    // optional state-store provider override (RocksDB trial):
    sys.env.get("SPARK_GRAFT_STATESTORE").foreach(p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        def g(k: String) = Option(d.get(k)).map(_.toString).getOrElse("-")
        val stateRows = p.stateOperators.map(_.numRowsTotal).sum
        val commit = p.stateOperators.map(_.commitTimeMs).sum
        lines.add(s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"triggerMs=${g("triggerExecution")} planMs=${g("queryPlanning")} " +
          s"walMs=${g("walCommit")} offsetMs=${g("latestOffset")} " +
          s"addBatchMs=${g("addBatch")} stateCommitMs=$commit stateRows=$stateRows")
      }
    })
    val name = args.lift(1).getOrElse("sess")
    def once(): Long = {
      val out = name match {
        case "sess" => graft.streaming.EventStreams.runToBatch(spark, dir,
          s"prof_${System.nanoTime()}", graft.streaming.EventStreams.sessions(_, "30 minutes"))
        case "sessA" => graft.streaming.EventStreams.runToBatchAppend(spark, dir,
          s"prof_${System.nanoTime()}", graft.streaming.EventStreams.sessions(_, "30 minutes"))
        case "tumb" => graft.streaming.EventStreams.runToBatch(spark, dir,
          s"prof_${System.nanoTime()}", graft.streaming.EventStreams.tumbling(_, "5 minutes"))
        case "tumbA" => graft.streaming.EventStreams.runToBatchAppend(spark, dir,
          s"prof_${System.nanoTime()}", graft.streaming.EventStreams.tumbling(_, "5 minutes"))
        case other => sys.error(s"unknown transform $other")
      }
      out.count()
    }
    // pass 1 cold (JIT/codegen), pass 2-3 warm — the bench regime
    (1 to 3).foreach { p => lines.add(s"--- pass $p ---")
      val t0 = System.nanoTime
      val n = once()
      println(f"RESULT rows=$n wall=${(System.nanoTime - t0) / 1e9}%.3f")
    }
    Thread.sleep(500)
    lines.forEach(println)
    spark.stop()
  }
}
