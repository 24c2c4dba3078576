package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Recursion

/** Scratch profiler for the recursive-CTE fixpoint (not part of the
  * driver contract). SPARK_GRAFT_REC_UNROLL / _AQE control the knobs. */
object RecBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // warm
    spark.range(10).count()
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val seed = Seq(1L).toDF("i")
      val series = Recursion.fixpoint(seed,
        f => f.filter(col("i") < 20).select((col("i") + 1).as("i")),
        maxIterations = 25)
      val n = series.count()
      println(f"round $round: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$n")
    }
    spark.stop()
  }
}
