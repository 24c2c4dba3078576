package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Dedup

/** Dev lab: dedup_embedding_cosine_lsh is the one production row over the
  * 2x bar (2.64x, r11 artifact). FloorProfile decomposed it to 3 AQE job
  * submissions with 284 ms of inter-job driver gaps on ~0.2 s of actual
  * execution — a fixed-shape 2-shuffle plan on 600k rows where AQE has
  * nothing to re-optimize. Variants: shipped (AQE on) vs the same query
  * with a non-adaptive physical plan pinned at executedPlan-force time.
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.LshLab /root/testdata/sf0.1"
  */
object LshLab {
  private def shipped(spark: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.queries("dedup_embedding_cosine_lsh")(spark, dir)

  private def noAqe(spark: SparkSession, dir: String): DataFrame = {
    val df = shipped(spark, dir)
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
    df
  }

  // the shipped query body with a round-robin spread of the 2000 compact
  // source rows ahead of the banding kernel + banded shuffle write
  // (single-row-group parquet = 1 task otherwise; Engine.spread rationale)
  private def spreadVariant(spark: SparkSession, dir: String): DataFrame = {
    val e = Engine.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
      .repartition(spark.sparkContext.defaultParallelism)
    val L = 720720L
    Dedup.cosineLshScoredPairsWeighted(e, "vec_id", "v",
      graft.queries.Pipeline.lshPlanes, numBands = 8, bitsPerBand = 8,
      maxBucket = 250, carry = Seq("label"))
      .withColumn("w", expr(s"$L div band_collisions"))
      .groupBy(col("label_a").as("la"), col("label_b").as("lb"))
      .agg(sum(when(col("cos") >= 0.35, col("w")).otherwise(lit(0L))).as("wsim"),
        sum(col("w")).as("wcand"),
        round(max(col("cos")), 6).as("max_cos"))
      .select(col("la"), col("lb"),
        when(assert_true(col("wsim") % L === 0 && col("wcand") % L === 0,
          lit("undercounted")).isNull,
          expr(s"wsim div $L")).as("n_sim"),
        expr(s"wcand div $L").as("n_cand"),
        col("max_cos"))
  }

  private def withNoAqe(spark: SparkSession)(df: DataFrame): DataFrame = {
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
    df
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val variants = Seq[(String, () => DataFrame)](
      "v0_shipped_aqe" -> (() => shipped(spark, dir)),
      "v1_noaqe_pinned" -> (() => noAqe(spark, dir)),
      "v2_spread" -> (() => spreadVariant(spark, dir)),
      "v3_spread_noaqe" -> (() => withNoAqe(spark)(spreadVariant(spark, dir))),
      // narrow banded exchange (id/band/bucket only, no vectors carried):
      // isolates the vector-carry cost of the wide exchange
      "v4_narrow_cands" -> (() => {
        val e = Engine.table(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        Dedup.cosineLshCandidates(e, "vec_id", "v",
          graft.queries.Pipeline.lshPlanes, numBands = 8, bitsPerBand = 8,
          maxBucket = 250)
      }))
    // warm + correctness: both variants must agree row-for-row
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    val ref = variants.head._2().collect().map(_.toString).sorted
    variants.drop(1).foreach { case (n, f) =>
      val got = f().collect().map(_.toString).sorted
      println(s"MATCH $n = ${ref.sameElements(got)}")
    }
    // exchange shape of the pinned plan: the banded exchange must still be
    // materialized once (ReuseExchange without AQE) or the variant loses
    val pinned = noAqe(spark, dir).queryExecution.executedPlan
    val scans = pinned.collect {
      case s if s.getClass.getSimpleName.contains("FileSourceScan") => s }
    val reused = pinned.collect {
      case s if s.getClass.getSimpleName.contains("ReusedExchange") => s }
    println(s"PINNED scans=${scans.size} reused=${reused.size}")
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
      // 12 reps, late-rep stage capture: a 2-5-rep min samples an
      // unconverged JIT curve (BASELINE.md round-13 WarmLab note)
      val times = (1 to 12).map { i =>
        if (i == 12) { Thread.sleep(300); stages.clear() }
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      Thread.sleep(300)
      println(f"TIME $n%-18s min=${times.min}%7.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
      stages.sortBy(_._1).foreach { case (id, ms, nt) =>
        println(f"  STAGE $id%4d ${ms}%5d ms tasks=$nt") }
    }
    spark.stop()
  }
}
