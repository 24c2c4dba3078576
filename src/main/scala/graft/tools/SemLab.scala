package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine

/** Dev lab: pipeline_semdedup (r13 artifact 1.60x, ~0.177 s vs duck-min
  * ~0.11 s) is the one watch row that never had a published
  * decomposition. Shape at sf0.1: 2000 embeddings, k=8 clusters,
  * Lloyd memo serves after the first call, then ONE repartition(cid)
  * exchange feeding both self-join sides (ReuseExchange), SMJ with the
  * cosine predicate, groupBy(id,cid) keep-rule count. Probe stagetime:
  * stages 53+14+71 = 138 ms on a 311 ms isolated wall — the majority is
  * DRIVER job-wave floor (AQE materializes the exchange as its own job,
  * the final stage is another, plus the noop commit), not compute.
  * Variants:
  *   v1 aqe_off   — static planning: with 8 clusters and fixed 32
  *       shuffle partitions there is nothing for AQE to re-plan; drops
  *       one job wave per exchange materialization.
  *   v2 broadcast — build side broadcast instead of the shared cid
  *       exchange. LOCAL-ONLY reference point: the build side is the
  *       whole corpus, so this shape dies at 100 TB (the shipped
  *       exchange shape is the scale-correct one); measured to bound
  *       what the exchange machinery costs on 2000 rows.
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SemLab /root/testdata/sf0.1"
  */
object SemLab {

  private def shipped(spark: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.queries("pipeline_semdedup")(spark, dir)

  private def aqeOff(spark: SparkSession, dir: String): DataFrame = {
    val child = Engine.pinnedSession(spark, "semlab-aqe-off") { c =>
      c.conf.set("spark.sql.adaptive.enabled", "false")
    }
    shipped(child, dir)
  }

  private def broadcastVariant(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity.{semanticAssignments, dot}
    val quant = semanticAssignments(
        Engine.table(spark, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iterations = 2, scale = 1000L)
      .select(col("id"), col("cid"), col("w").cast("array<double>").as("__wd"))
      .withColumn("__nn", sqrt(dot(col("__wd"), col("__wd"))))
    val b = quant.select(col("cid").as("__cidb"), col("id").as("__idb"),
      col("__wd").as("__wb"), col("__nn").as("__nb"))
    quant
      .join(broadcast(b),
        col("cid") === col("__cidb") && col("__idb") < col("id") &&
          dot(col("__wd"), col("__wb")) / (col("__nn") * col("__nb")) >= 0.35,
        "left")
      .groupBy(col("id"), col("cid"))
      .agg(count(col("__idb")).as("__mates"))
      .filter(col("__mates") === 0)
      .select(col("id").as("vec_id"), col("cid"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val variants = Seq[(String, () => DataFrame)](
      "v0_shipped" -> (() => shipped(spark, dir)),
      "v1_aqe_off" -> (() => aqeOff(spark, dir)),
      "v2_broadcast" -> (() => broadcastVariant(spark, dir)))
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
      val times = (1 to 12).map { i =>
        if (i == 12) { Thread.sleep(300); stages.clear() }
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      Thread.sleep(300)
      println(f"TIME $nm%-13s min=${times.min}%7.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
      stages.sortBy(_._1).foreach { case (id, ms, nt) =>
        println(f"  STAGE $id%4d ${ms}%5d ms tasks=$nt") }
    }
    spark.stop()
  }
}
