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

    def countNode(plan: String, node: String): Int =
      node.r.findAllMatchIn(plan).length

    val sections = mults.map { m =>
      val dir = s"target/tpch_scale/x$m"
      // reuse the relational tier's scaled db when it already exists
      if (!java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(s"$dir/orders.parquet")))
        TpchScaleStress.writeScaled(spark, baseDir, dir, m)
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
        val plan = df.queryExecution.executedPlan.toString
        val nWindow = countNode(plan, "\\bWindow\\b") +
          countNode(plan, "WindowGroupLimit")
        val nExchange = countNode(plan, "Exchange hashpartitioning")
        val nSingle = countNode(plan, "Exchange SinglePartition") +
          countNode(plan, "SinglePartition\\b")
        // every row here uses ONE window partitioning (o_custkey), so
        // however many window functions/frames it stacks, one exchange
        // must feed them all
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
