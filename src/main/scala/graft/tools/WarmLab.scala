package graft.tools

import graft.Engine

/** Dev lab (r13, self-review #9): an isolated SPARK_GRAFT_ONLY bench of
  * ONE query reads ~2x its in-inventory value — far beyond the 10-20%
  * subset note. Hypotheses: (a) JIT depth — one query's warm pass +
  * 2 timed reps never gets the shared Spark infrastructure (codegen
  * compiler, parquet reader, shuffle writer) to C2 steady state, while
  * 226 prior queries do; (b) some same-query cache. Discriminator:
  *   mode `reps`   — cold JVM, run ONE query N times, print the curve
  *                   (if the wall keeps falling past rep 3, it is
  *                   warmup depth, not a missing cache);
  *   mode `cohort` — cold JVM, one pass each over 8 OTHER queries
  *                   first, then the target twice (if the target lands
  *                   near its in-inventory value on rep 1, the warmth
  *                   is SHARED infrastructure, not per-query).
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.WarmLab <reps|cohort> [query]"
  */
object WarmLab {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("reps")
    val target = args.lift(1).getOrElse("dedup_embedding_cosine_lsh")
    val dir = "/root/testdata/sf0.1"
    val spark =
      if (mode == "bench") {
        // replicate graft.Bench's session exactly (1 MB splits, big
        // codegen cache, simple explain events, UI off, cached tables)
        val s = org.apache.spark.sql.SparkSession.builder()
          .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
          .appName("warmlab")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
          .config("spark.sql.codegen.cache.maxEntries", "5000")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.ui.explainMode", "simple")
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        graft.functions.DuckFunctions.register(s)
        Seq("embeddings", "documents").foreach(t =>
          Engine.table(s, dir, t).cache().count())
        s
      } else Engine.session(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e6
    }
    mode match {
      case "reps" | "bench" =>
        (1 to 12).foreach(i => println(f"REP $i%2d ${run(target)}%7.1f ms"))
      case "cohort" =>
        val warmers = Seq("dedup_exact", "dedup_minhash_pairs",
          "pipeline_semdedup", "text_bigram_lm", "agg_q1_pricing",
          "join_inner", "win_rank_family", "sim_cosine_topk")
        warmers.foreach(w => println(f"WARM $w%-24s ${run(w)}%7.1f ms"))
        (1 to 3).foreach(i => println(f"TARGET $i ${run(target)}%7.1f ms"))
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
