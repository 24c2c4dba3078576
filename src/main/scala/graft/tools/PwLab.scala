package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Engine

/** Dev lab: join_piecewise_merge (1.73x, r12 artifact; duck-min 0.106 s
  * vs spark 0.183 s). Probe stagetime: the bucketed equi-join runs its
  * ~7.5M-pair refine + aggregate in ONE task, 187 ms of a 274 ms stage
  * sum — AQE coalesces the bucket shuffle on INPUT bytes (tiny: 1k
  * suppliers x ~16 bucket replicas + 15k customers) and the pair blowup
  * happens after the exchange, invisible to the coalescer. Variants pin
  * AQE coalescing off / partition floors in a child session and measure
  * whether spreading the pair stage pays on this box.
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PwLab /root/testdata/sf0.1"
  */
object PwLab {
  private val sql =
    """SELECT count(*) AS n_pairs,
      |  CAST(sum(s.s_suppkey) AS BIGINT) AS sk_sum,
      |  CAST(sum(c.c_custkey) AS BIGINT) AS ck_sum,
      |  round(max(c.c_acctbal - s.s_acctbal), 2) AS max_gap
      |FROM supplier s JOIN customer c ON s.s_acctbal < c.c_acctbal""".stripMargin

  private def child(s: SparkSession, dir: String,
                    confs: (String, String)*): SparkSession = {
    val c = s.newSession()
    c.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    confs.foreach { case (k, v) => c.conf.set(k, v) }
    Engine.registerAll(c, dir)
    c
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val sessions = Seq[(String, SparkSession)](
      "v0_shipped" -> child(spark, dir),
      "v1_nocoalesce" -> child(spark, dir,
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false"),
      "v2_noaqe" -> child(spark, dir, "spark.sql.adaptive.enabled" -> "false"),
      "v3_min8" -> child(spark, dir,
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1b",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "48kb"))
    def run(s: SparkSession): DataFrame = s.sql(sql)
    sessions.foreach { case (_, s) => run(s).write.format("noop").mode("overwrite").save() }
    val ref = run(sessions.head._2).collect().map(_.toString).sorted
    sessions.drop(1).foreach { case (nm, s) =>
      println(s"MATCH $nm = ${ref.sameElements(run(s).collect().map(_.toString).sorted)}") }
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
    sessions.foreach { case (nm, s) =>
      // 12 reps, late-rep stage capture: a 2-5-rep min samples an
      // unconverged JIT curve (BASELINE.md round-13 WarmLab note)
      val times = (1 to 12).map { i =>
        if (i == 12) { Thread.sleep(300); stages.clear() }
        val t0 = System.nanoTime()
        run(s).write.format("noop").mode("overwrite").save()
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
