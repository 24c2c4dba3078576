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

    // bigstate: synthetic N-key stateful aggregation for the
    // state-store provider crossover (round-8 verdict #8). The sf0.1
    // events table tops out at ~95k states — far below where the
    // in-heap HDFSBacked provider starts paying GC/heap rent — so this
    // mode generates nKeys distinct sessions (2 events each, one
    // windowed-agg state row per key), runs ONE AvailableNow batch into
    // a noop sink, and the listener reports stateRows + commit time.
    // Run with SPARK_GRAFT_STATESTORE to switch providers and
    // SPARK_DRIVER_MEM to move the heap wall.
    if (name == "bigstate") {
      import org.apache.spark.sql.functions._
      val nKeys = args.lift(2).map(_.toLong).getOrElse(5000000L)
      val tmp = java.nio.file.Files.createTempDirectory("graft_bigstate_").toString
      spark.range(nKeys * 2)
        .select((col("id") % nKeys).as("k"),
          (lit(1704067200L) + (col("id") % 3600L)).cast("timestamp").as("ts"),
          (col("id") * 7L).as("v"))
        .repartition(8).write.mode("overwrite").parquet(tmp)
      val sch = spark.read.parquet(tmp).schema
      def pass(): Double = {
        val t0 = System.nanoTime()
        val q = spark.readStream.schema(sch).parquet(tmp)
          .withWatermark("ts", "10 minutes")
          .groupBy(col("k"), window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
          .writeStream.format("noop").outputMode("update")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft_bigstate_ck_").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      (1 to 2).foreach { p =>
        val w = pass()
        println(f"RESULT bigstate pass=$p keys=$nKeys wall=$w%.3f " +
          s"provider=${sys.env.getOrElse("SPARK_GRAFT_STATESTORE", "hdfs-default")} " +
          s"heap=${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}")
      }
      Thread.sleep(500)
      lines.forEach(println)
      spark.stop()
      return
    }

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
        // the stream_sliding bench shape (r13 carve-out refresh)
        case "slideA" => graft.streaming.EventStreams.runToBatchAppend(spark, dir,
          s"prof_${System.nanoTime()}",
          graft.streaming.EventStreams.sliding(_, "10 minutes", "5 minutes"))
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
