package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Engine

/** Dev lab: text_dup_spans is the nearest production row to the 2x bar
  * (1.82x, r12 artifact, duck-min 0.188 s vs spark 0.341 s) and drifting
  * up as duck-min stabilizes. Probe stagetime decomposition (r13, warm):
  * scan+explode 168 ms (1 task), gram window 114 ms (4 tasks), island
  * window + final agg 94 ms, presentation orderBy ~93 ms, write 24 ms —
  * stage sum 493 ms on an 821 ms wall. Variants isolate:
  *   v1  drop the presentation orderBy (tools/compare sorts rows — the
  *       range sort is a sample job + an exchange of pure waste);
  *   v2  v1 + fold the two-level island aggregate into ONE groupBy over
  *       lag-diffs (dup_tokens = sum(diff where diff<=n) + n*n_spans);
  *   v3  v2 + window-free duplication decision: repartition(__g) ONCE and
  *       build the min<>max aggregate AND the probe join from the same
  *       exchange (ReuseExchange fires — same REPARTITION_BY_COL subtree;
  *       hash agg + shuffle-hash join, so the 2M-row gram stream is never
  *       SORTED, unlike WindowExec's partition sort);
  *   v4  v2 + round-robin spread of the 5000 source docs ahead of the
  *       serial tokenize+explode scan stage (single-row-group parquet =
  *       1 task otherwise; the 10 MB text shuffle may or may not pay for
  *       itself on this box).
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.DupSpansLab /root/testdata/sf0.1"
  */
object DupSpansLab {
  private val n = 10

  private def shipped(spark: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.queries("text_dup_spans")(spark, dir)

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Engine.table(spark, dir, "documents")

  private def posStream(d: DataFrame): DataFrame = d
    .select(col("doc_id"), call_function("ws_token_hashes", col("text")).as("__th"))
    .select(col("doc_id"), size(col("__th")).cast("long").as("n_tokens"),
      posexplode(call_function("gram_roll_hashes", col("__th"), lit(n))))
    .withColumnsRenamed(Map("pos" -> "__p", "col" -> "__g"))

  private def windowMarks(pos: DataFrame): DataFrame = {
    val wGram = Window.partitionBy(col("__g"))
    pos
      .withColumn("__lo", min(col("doc_id")).over(wGram))
      .withColumn("__hi", max(col("doc_id")).over(wGram))
      .filter(col("__lo") =!= col("__hi"))
  }

  // v3 core: one explicit exchange on __g, both the min<>max aggregate and
  // the probe read it (ReuseExchange), hash-agg + shuffle-hash join — no
  // sort anywhere on the gram stream.
  private def aggJoinMarks(pos: DataFrame): DataFrame = {
    val posR = pos.repartition(col("__g"))
    val dup = posR.groupBy(col("__g"))
      .agg(min(col("doc_id")).as("__lo"), max(col("doc_id")).as("__hi"))
      .filter(col("__lo") =!= col("__hi"))
      .select(col("__g"))
    posR.join(dup.hint("shuffle_hash"), Seq("__g"))
  }

  // classic two-level island fold (shipped shape, minus presentation sort)
  private def islandAggTwoLevel(marks: DataFrame): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("__p"))
    marks
      .withColumn("__new",
        when(col("__p") - lag(col("__p"), 1).over(wDoc) <= n, 0L).otherwise(1L))
      .withColumn("__isl", sum(col("__new")).over(wDoc))
      .groupBy(col("doc_id"), col("n_tokens"), col("__isl"))
      .agg((max(col("__p")) - min(col("__p")) + n).as("__span_tok"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_spans"), sum(col("__span_tok")).as("dup_tokens"))
      .withColumn("dup_frac", round(col("dup_tokens") / col("n_tokens"), 6))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("n_tokens"),
        col("dup_frac"))
  }

  // fused island fold: one lag pass, ONE groupBy — n_spans counts island
  // starts (diff null or > n), dup_tokens sums within-island diffs + n per
  // island
  private def islandAggFused(marks: DataFrame): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("__p"))
    marks
      .withColumn("__d", col("__p") - lag(col("__p"), 1).over(wDoc))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(
        sum(when(col("__d").isNull || col("__d") > n, 1L).otherwise(0L)).as("n_spans"),
        (sum(when(col("__d") <= n, col("__d")).otherwise(0L)) +
          lit(n.toLong) * sum(when(col("__d").isNull || col("__d") > n, 1L)
            .otherwise(0L))).as("dup_tokens"))
      .withColumn("dup_frac", round(col("dup_tokens") / col("n_tokens"), 6))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("n_tokens"),
        col("dup_frac"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val variants = Seq[(String, () => DataFrame)](
      "v0_shipped" -> (() => shipped(spark, dir)),
      "v1_no_orderby" -> (() =>
        islandAggTwoLevel(windowMarks(posStream(docs(spark, dir))))),
      "v2_fused_isl" -> (() =>
        islandAggFused(windowMarks(posStream(docs(spark, dir))))),
      "v3_aggjoin" -> (() =>
        islandAggFused(aggJoinMarks(posStream(docs(spark, dir))))),
      "v4_spread" -> (() =>
        islandAggFused(windowMarks(posStream(
          docs(spark, dir).repartition(spark.sparkContext.defaultParallelism))))))
    // warm + correctness vs shipped
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    val ref = variants.head._2().collect().map(_.toString).sorted
    variants.drop(1).foreach { case (nm, f) =>
      val got = f().collect().map(_.toString).sorted
      println(s"MATCH $nm = ${ref.sameElements(got)}")
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
    variants.foreach { case (nm, f) =>
      // 12 reps, late-rep stage capture: a 2-5-rep min samples an
      // unconverged JIT curve (BASELINE.md round-13 WarmLab note)
      val times = (1 to 12).map { i =>
        if (i == 12) { Thread.sleep(300); stages.clear() }
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      Thread.sleep(300)
      println(f"TIME $nm%-14s min=${times.min}%7.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
      stages.sortBy(_._1).foreach { case (id, ms, nt) =>
        println(f"  STAGE $id%4d ${ms}%5d ms tasks=$nt") }
    }
    spark.stop()
  }
}
