package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._

/** Per-query fixed-cost ("job floor") profiler — the measurement behind
  * the BASELINE.md floor note. Prints, for a fresh DataFrame each run
  * (the bench protocol — reusing a pinned plan would silently reuse AQE
  * stage outputs, i.e. cache results):
  *
  *   1. planning-phase split (analyze / optimize / physical / AQE
  *      materialization / final collect) for a trivial 25-row aggregate
  *      and for the named queries;
  *   2. the per-shuffle-barrier increment (0..3 chained aggregates);
  *   3. the job timeline of one query (driver gaps between jobs = AQE
  *      re-optimization + stage bookkeeping, not data).
  *
  * Findings on this container (local[32], warm JVM, sf0.1): ~80-90 ms
  * base per fresh action (≈half before the first job: SQL-execution
  * bookkeeping + AQE stage setup; ≈27 ms per job even pinned), +16-25 ms
  * per extra shuffle barrier, and task compute of single-digit ms. For
  * multi-stage queries over tiny inputs the wall clock is therefore
  * driver latency, not execution — the cost a one-query-per-cluster run
  * amortizes to nothing, and the reason sub-0.1s-in-DuckDB queries
  * cannot go much below ~0.1-0.4 s here regardless of operator quality.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.FloorProfile [query ...]"
  */
object FloorProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("dedup_embedding_cosine_lsh", "dedup_minhash_pairs", "tpch_q3ish")

    def timeMs[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime; val r = body
      ((System.nanoTime - t0) / 1e6, r)
    }
    def minOf(n: Int)(body: => Unit): Double =
      (1 to n).map(_ => timeMs(body)._1).min

    // 1. per-barrier increment on a trivial table
    val nation = graft.Engine.table(spark, dir, "nation")
    def chain(k: Int) = {
      var df = nation.groupBy("n_regionkey").agg(count(lit(1)).as("c0"))
      for (i <- 1 until k)
        df = df.groupBy(s"c${i - 1}").agg(count(lit(1)).as(s"c$i"))
      if (k == 0) nation.select(count(lit(1)).as("c")) else df
    }
    for (k <- 0 to 3) {
      (1 to 3).foreach(_ => chain(k).collect())
      println(f"barriers=$k min=${minOf(5)(chain(k).collect())}%.1f ms")
    }

    // 2. phase split per named query
    names.foreach { n =>
      def fresh = graft.SparkEntry.queries(n)(spark, dir)
      (1 to 3).foreach(_ => fresh.collect())
      val df = fresh
      val qe = df.queryExecution
      val (tOpt, _) = timeMs(qe.optimizedPlan)
      val (tPhy, _) = timeMs(qe.executedPlan)
      val (tRdd, _) = timeMs(qe.toRdd) // AQE stage-by-stage materialization
      val (tCol, _) = timeMs(df.collect())
      println(f"$n optimize=$tOpt%.1f physical=$tPhy%.1f " +
        f"aqeMaterialize=$tRdd%.1f finalCollect=$tCol%.1f ms")
    }

    // 3. job timeline of the first named query
    val ev = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var t0 = System.nanoTime
    def ms = (System.nanoTime - t0) / 1e6
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        ev.add(f"$ms%7.1f ms job ${j.jobId} start")
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        ev.add(f"$ms%7.1f ms job ${j.jobId} end")
    })
    def fresh0 = graft.SparkEntry.queries(names.head)(spark, dir)
    fresh0.collect()
    Thread.sleep(300); ev.clear(); t0 = System.nanoTime
    fresh0.collect()
    println(f"${names.head} timeline total=$ms%.1f ms (gaps = driver-side AQE)")
    Thread.sleep(300)
    ev.forEach(println)
    spark.stop()
  }
}
