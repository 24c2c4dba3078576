package graft.tools

import org.apache.spark.sql.functions._

/** Round-16 decomposition lab for the two rule-3 orphans the r15
  * verdict flagged (`tpcds_channel_intersect` 5.9×, `tpcds_moving_peer`
  * 5.4×): times each structural slice of the query (scan → joins →
  * aggregate → full) and the candidate rewrites, min-of-5 after
  * warm-up, so BASELINE.md can class the rows with numbers instead of
  * rule-3 paperwork. Companion facts: the sf0.1 lineitem/orders parquet
  * are ONE row group each (600k / 150k rows), so every scan-rooted
  * stage here is a single Spark task AND a single duck scan thread —
  * per-thread engine speed is what this measures.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TpcdsLab"
  */
object TpcdsLab {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.Engine.registerAll(spark, dir)

    def minMs(label: String)(body: => Unit): Unit = {
      (1 to 3).foreach(_ => body)
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime; body; (System.nanoTime - t0) / 1e6
      }.min
      println(f"$label%-32s ${t}%8.1f ms")
    }

    // ---- moving_peer slices ------------------------------------------
    minMs("mp scan lineitem count") {
      spark.sql("SELECT count(*) FROM lineitem").collect()
    }
    minMs("mp scan + revenue expr") {
      spark.sql("""SELECT sum(l_extendedprice * (1 - l_discount))
        FROM lineitem""").collect()
    }
    minMs("mp + join orders (month)") {
      spark.sql("""SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
          sum(l_extendedprice * (1 - l_discount)) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY m""").collect()
    }
    minMs("mp full 4-table rev agg") {
      spark.sql("""SELECT n_name, CAST(month(o_orderdate) AS BIGINT) AS m,
          sum(l_extendedprice * (1 - l_discount)) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, m""").collect()
    }
    minMs("mp full query") {
      graft.SparkEntry.queries("tpcds_moving_peer")(spark, dir).collect()
    }

    // ---- channel_intersect: current set-op text vs rewrites ----------
    minMs("ci current set-op text") {
      graft.SparkEntry.queries("tpcds_channel_intersect")(spark, dir).collect()
    }
    minMs("ci conditional-agg rewrite") {
      spark.sql("""SELECT CAST(count(*) AS BIGINT) AS n FROM (
          SELECT o_custkey
          FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
          GROUP BY o_custkey
          HAVING max(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) = 1
             AND max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1
             AND max(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) = 0
        ) t""").collect()
    }
    minMs("ci two-level agg rewrite") {
      // per-order flags first (orderkey-local, rides the join), then
      // per-customer fold — same answer, smaller mid-agg state
      spark.sql("""SELECT CAST(count(*) AS BIGINT) AS n FROM (
          SELECT o_custkey
          FROM (SELECT o_custkey,
                  max(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ha,
                  max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS hr,
                  max(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS hp
                FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
                GROUP BY o_orderkey, o_custkey) per_order
          GROUP BY o_custkey
          HAVING max(ha) = 1 AND max(hr) = 1 AND max(hp) = 0
        ) t""").collect()
    }
    // ---- the parallelism experiment ----------------------------------
    // Both rows' bulk stage is ONE task because the driver's sf0.1
    // parquet is one row group per table (Spark's scan split unit).
    // Rewrite the same rows as 32 row groups and re-run the same SQL:
    // if the times collapse, the over-2× ratio is a data-LAYOUT
    // artifact of the fixture, not a plan defect — at 100 TB every
    // table is thousands of row groups and the stage parallelizes.
    val labDir = "target/tpcds_lab_parquet"
    for (tb <- Seq("lineitem", "orders", "customer", "nation")) {
      spark.read.parquet(s"$dir/$tb.parquet")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$labDir/$tb.parquet")
      spark.read.parquet(s"$labDir/$tb.parquet").createOrReplaceTempView(tb)
    }
    val mpSql = """WITH rev AS (
        SELECT n_name, CAST(month(o_orderdate) AS BIGINT) AS m,
          sum(l_extendedprice * (1 - l_discount)) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, m),
      w AS (
        SELECT n_name, m, round(CAST(r AS DOUBLE), 2) AS r,
          round(CAST(avg(r) OVER (PARTITION BY n_name ORDER BY m
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE), 2) AS peer
        FROM rev)
      SELECT n_name, m, r AS rev, peer AS peer_avg,
        round(CAST(r / peer AS DOUBLE), 4) AS ratio
      FROM w WHERE r > 1.1 * peer OR r < 0.9 * peer
      ORDER BY n_name, m"""
    val ciSql = """SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'A'
        INTERSECT
        SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      ) t"""
    minMs("mp 32-row-group layout") { spark.sql(mpSql).collect() }
    minMs("ci 32-row-group layout") { spark.sql(ciSql).collect() }
    // file bin-packing folds 32 small files back into ~1 scan split
    // (openCostInBytes 4 MB); drop it so the layout actually yields
    // 32 scan tasks — the 100 TB condition, where splits are plentiful
    spark.conf.set("spark.sql.files.maxPartitionBytes", "524288")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    minMs("mp 32-task scan") { spark.sql(mpSql).collect() }
    minMs("ci 32-task scan") { spark.sql(ciSql).collect() }

    // ---- raw-API control: same joins/agg, no dialect, no views -------
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val or = spark.read.parquet(s"$dir/orders.parquet")
    val cu = spark.read.parquet(s"$dir/customer.parquet")
    val na = spark.read.parquet(s"$dir/nation.parquet")
    minMs("mp raw API rev agg") {
      li.join(or, li("l_orderkey") === or("o_orderkey"))
        .join(cu, or("o_custkey") === cu("c_custkey"))
        .join(na, cu("c_nationkey") === na("n_nationkey"))
        .groupBy(col("n_name"), month(col("o_orderdate")).cast("long").as("m"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"))
        .collect()
    }
    minMs("mp raw API no month") {
      li.join(or, li("l_orderkey") === or("o_orderkey"))
        .join(cu, or("o_custkey") === cu("c_custkey"))
        .join(na, cu("c_nationkey") === na("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"))
        .collect()
    }
    minMs("mp raw API join-count only") {
      li.join(or, li("l_orderkey") === or("o_orderkey"))
        .join(cu, or("o_custkey") === cu("c_custkey"))
        .join(na, cu("c_nationkey") === na("n_nationkey"))
        .select(count(lit(1))).collect()
    }
    minMs("mp raw API li+or join only") {
      li.join(or, li("l_orderkey") === or("o_orderkey"))
        .select(count(lit(1))).collect()
    }

    // ---- stage-level truth: where does mp's time actually go? --------
    import org.apache.spark.scheduler._
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.add(f"stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"wall=${wall}%5d ms exec=${si.taskMetrics.executorRunTime}%5d ms " +
          f"cpu=${si.taskMetrics.executorCpuTime / 1000000}%5d ms " +
          si.name.takeWhile(_ != '\n').take(60))
      }
    })
    spark.sql(mpSql).collect()
    Thread.sleep(400); stages.clear()
    val t0 = System.nanoTime
    spark.sql(mpSql).collect()
    println(f"mp stage profile (total ${(System.nanoTime - t0) / 1e6}%.1f ms):")
    Thread.sleep(400)
    stages.forEach(s => println("  " + s))
    spark.stop()
  }
}
