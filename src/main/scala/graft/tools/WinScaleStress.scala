package graft.tools

import graft.Engine

/** r18 (r17 verdict #5): the ScaleStress tier for the WINDOW family —
  * the one benched family that had no x4/x16/x64 evidence (relational
  * landed r17, text/dedup r14, quantile r16). Reuses the TpchScaleStress
  * key-remapped generator (referential integrity preserved) and runs the
  * UNCHANGED production window rows with the shuffle meter.
  *
  * Contracts asserted per tier, not just recorded:
  *   - exactly ONE Exchange per window SHAPE (the partitionBy key),
  *     i.e. #Exchange == #distinct window partitionings in the plan —
  *     window functions over the same key share one shuffle;
  *   - NO SinglePartition exchange anywhere in the scaled rows' plans
  *     (the "window over ()" hazard — the two rows here partition by
  *     o_custkey, which scales with the corpus);
  *   - shuffle records recorded per tier (the artifact shows linearity).
  *
  * The two global/filtered window rows are NOT scaled here by design,
  * with their envelopes stated instead: `win_frames_range` windows over
  * a global ORDER BY but its own predicate (o_orderkey <= 2000) keeps
  * the windowed row count CONSTANT under key remapping (original keys
  * <= 2000/mult, x mult replicas), and `win_share_of_total` likewise
  * pins l_orderkey <= 500 — both are bounded-envelope rows, not
  * corpus-window rows.
  *
  * Usage: runMain graft.tools.WinScaleStress [baseDir] [mults] [qfilter]
  */
object WinScaleStress {

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "4,16,64")
      .split(",").map(_.toInt)
    val only = if (args.length > 2) args(2).split(",").toSet
      else Set("win_frames_rows", "win_ignore_nulls", "win_rank_family")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ScaleStress.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val sections = mults.map { m =>
      val dir = s"target/tpch_scale/x$m"
      // reuse the relational tier's scaled db ONLY when a completed
      // write from the same base is recorded — a bare orders.parquet
      // probe would happily bench a partial or wrong-base corpus while
      // stamping the artifact with this base (r18 review)
      val marker = java.nio.file.Paths.get(s"$dir/_scaled_from.txt")
      val want = s"$baseDir x$m"
      if (!(java.nio.file.Files.isRegularFile(marker) &&
            java.nio.file.Files.readString(marker) == want)) {
        TpchScaleStress.writeScaled(spark, baseDir, dir, m)
        java.nio.file.Files.writeString(marker, want)
      }
      val items = only.toSeq.sorted.map { q =>
        val df = graft.SparkEntry.queries(q)(spark, dir)
        // noop sink, NOT count(): a count lets Catalyst prune the whole
        // window subtree (guide §1.4 — first x4 probe read 2 shuffle
        // records because only the count aggregate survived)
        def run(): Unit =
          df.write.format("noop").mode("overwrite").save()
        run() // warm pass: JIT + AQE final plan settled
        var wall = Double.MaxValue
        var snap = (0L, 0L)
        for (_ <- 1 to 2) {
          meter.reset()
          val t0 = System.nanoTime()
          run()
          val w = (System.nanoTime() - t0) / 1e9
          if (w < wall) { wall = w; snap = meter.snapshot }
        }
        // walk the executed plan (AQE stages included) instead of
        // string-matching — ReusedExchange renders the same line text
        // as the exchange it reads (r18 review; same walker shape as
        // ShuffleBudgetSpec)
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
        import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
        val shuffles = scala.collection.mutable.Map[Int, Boolean]()
        var nWindow = 0
        def walk(p: SparkPlan): Unit = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case qs: QueryStageExec => walk(qs.plan)
          case _: ReusedExchangeExec => ()
          case e: ShuffleExchangeLike =>
            shuffles(e.id) = e.outputPartitioning == SinglePartition
            e.children.foreach(walk)
          case other =>
            if (other.nodeName.startsWith("Window")) nWindow += 1
            other.children.foreach(walk)
        }
        walk(df.queryExecution.executedPlan)
        val nExchange = shuffles.size
        val nSingle = shuffles.valuesIterator.count(identity)
        val plan = df.queryExecution.executedPlan.toString
        // the three default rows each use ONE window partitioning, so
        // however many window functions/frames they stack, one exchange
        // must feed them all; rows passed via qfilter may legitimately
        // carry more shapes, so they are recorded without the hard pin
        val onePartitioningRows =
          Set("win_frames_rows", "win_ignore_nulls", "win_rank_family")
        if (onePartitioningRows(q))
          require(nExchange == 1,
            s"$q x$m: expected 1 window exchange, got $nExchange\n$plan")
        require(nSingle == 0,
          s"$q x$m: single-partition window in plan!\n$plan")
        f""""$q":{"wall_sec":$wall%.3f,"shuffle_mb":${snap._1 / 1e6}%.2f,""" +
          s""""shuffle_records":${snap._2},"window_nodes":$nWindow,""" +
          s""""exchanges":$nExchange,"single_partition":$nSingle}"""
      }.mkString(",")
      s""""x$m":{$items}"""
    }
    println(s"""{"win_scale_stress":{${sections.mkString(",")}},""" +
      s""""base":"$baseDir"}""")
    spark.stop()
  }
}
