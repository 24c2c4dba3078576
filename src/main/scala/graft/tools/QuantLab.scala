package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Dev lab: time alternate shapes of agg_approx_quantile (2.10x in the
  * r10 artifact — VERDICT #2 wants the probe fused with a bins scan).
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.QuantLab /root/testdata/sf0.1"
  */
object QuantLab {
  private def q0(spark: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.queries("agg_approx_quantile")(spark, dir)

  // shared: per-flag finisher over the fused (flag, qty, c, eplo, ephi)
  // table — qty quantile lo/hi ranks from the discrete-value cumsum,
  // ep ranks are plain sums
  private val finishWalk = udf { (bins: Seq[org.apache.spark.sql.Row], qs: Seq[Double]) =>
    var n = 0L
    bins.foreach(r => n += r.getLong(1))
    qs.map { q =>
      var cum = 0L; var lo = 0L; var hi = 0L; var found = false
      val it = bins.iterator
      while (!found && it.hasNext) {
        val c = it.next().getLong(1)
        if (cum + c >= q * n) { lo = cum; hi = cum + c; found = true }
        else cum += c
      }
      Seq(lo, hi, n)
    }
  }

  private def okOf(arr: String, i: Int, q: Double) = {
    val lo = col(arr).getItem(i).getItem(0)
    val hi = col(arr).getItem(i).getItem(1)
    val n = col(arr).getItem(i).getItem(2)
    (lo <= n * q + n * 0.02) && (hi >= n * q - n * 0.02)
  }

  private def fusedFromEstimate(li: DataFrame, ep: DataFrame): DataFrame =
    li.join(broadcast(ep), "l_returnflag")
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("__c"),
        count(when(col("l_extendedprice") < col("__ep_v"), 1)).as("__eplo"),
        count(when(col("l_extendedprice") <= col("__ep_v"), 1)).as("__ephi"))
      .groupBy(col("l_returnflag"))
      .agg(sort_array(collect_list(struct(col("l_quantity").cast("double"), col("__c"))))
        .as("__bins"),
        sum(col("__c")).as("n"), sum(col("__eplo")).as("__ep_lo"),
        sum(col("__ephi")).as("__ep_hi"))
      .select(col("l_returnflag"), col("n").cast("long").as("n"),
        ((col("__ep_lo") <= col("n") * 0.5 + col("n") * 0.02) &&
          (col("__ep_hi") >= col("n") * 0.5 - col("n") * 0.02)).as("med_ok"),
        finishWalk(col("__bins"), typedLit(Seq(0.1, 0.9))).as("__qt"))
      .select(col("l_returnflag"), col("n"), col("med_ok"),
        okOf("__qt", 0, 0.1).as("p10_ok"), okOf("__qt", 1, 0.9).as("p90_ok"))

  // q1: two scans — ep-bins estimate scan (as today), then ONE fused
  // scan doing qty bins + ep probe counters together
  private def q1(spark: SparkSession, dir: String): DataFrame = {
    val (epMin, epMax) =
      Engine.parquetColumnRange(spark, dir, "lineitem", "l_extendedprice")
    val nBins = 4096
    val w = math.max((epMax - epMin) / nBins, 1e-9)
    val li = Engine.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
    val rankPick = udf { (bins: Seq[org.apache.spark.sql.Row], qs: Seq[Double]) =>
      var n = 0L
      bins.foreach(r => n += r.getLong(1))
      qs.map { q =>
        var cum = 0L; var b = 0.0; var found = false
        val it = bins.iterator
        while (!found && it.hasNext) {
          val r = it.next()
          if (cum + r.getLong(1) >= q * n) { b = r.getDouble(0); found = true }
          else cum += r.getLong(1)
        }
        b
      }
    }
    val ep = li.select(col("l_returnflag"), col("l_extendedprice"))
      .groupBy(col("l_returnflag"),
        floor((col("l_extendedprice") - lit(epMin)) / lit(w)).cast("double").as("__b"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("l_returnflag"))
      .agg(sort_array(collect_list(struct(col("__b"), col("__c")))).as("__bins"))
      .select(col("l_returnflag"),
        (lit(epMin) + (rankPick(col("__bins"), typedLit(Seq(0.5))).getItem(0) + 1) * w)
          .as("__ep_v"))
    fusedFromEstimate(li, ep)
  }

  // q2: head-sample estimate (one exact-median pass over ~60k rows from
  // the file head) + the same single fused full scan
  private def q2(spark: SparkSession, dir: String): DataFrame = {
    val li = Engine.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
    val ep = li.select(col("l_returnflag"), col("l_extendedprice"))
      .limit(60000)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("__ep_v"))
    fusedFromEstimate(li, ep)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val variants = Seq[(String, () => DataFrame)](
      "q0_current_3scan" -> (() => q0(spark, dir)),
      "q1_fused_2scan" -> (() => q1(spark, dir)),
      "q2_sample_1full" -> (() => q2(spark, dir)),
      "q3_shipped" -> (() => graft.queries.Relational.approxQuantileContract(
        Engine.table(spark, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity")))))
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    val ref = q0(spark, dir).collect().map(_.toString).sorted
    variants.drop(1).foreach { case (n, f) =>
      val got = f().collect().map(_.toString).sorted
      println(s"MATCH $n = ${ref.sameElements(got)}")
    }
    val stages = scala.collection.mutable.Buffer[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks))
      }
    })
    variants.foreach { case (n, f) =>
      val times = (1 to 3).map { i =>
        if (i == 3) { Thread.sleep(500); stages.clear() }
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      Thread.sleep(500)
      println(f"TIME $n%-22s min=${times.min}%7.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
      stages.sortBy(_._1).foreach { case (id, ms, nt) =>
        println(f"  STAGE $id%4d ${ms}%5d ms tasks=$nt") }
    }
    spark.stop()
  }
}
