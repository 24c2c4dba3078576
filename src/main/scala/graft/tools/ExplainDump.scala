package graft.tools

/** Writes `.explain("formatted")` output of named SparkEntry queries to
  * files — the r18 optimization round's plan-evidence capture
  * (plans/r18/<query>_{before,after}.txt). Unlike PlanDump (post-AQE
  * executed plan for lab work), this records the formatted plan the
  * judge checks claims against.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_EXPLAIN_DIR=plans/r18 \
  *   SPARK_GRAFT_EXPLAIN_SUFFIX=before \
  *   sbt "runMain graft.tools.ExplainDump q1 [q2 ...]"
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_DIR", "plans/r18")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), txt)
      println(s"wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
