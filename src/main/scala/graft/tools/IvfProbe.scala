package graft.tools

import graft.Engine
import org.apache.spark.sql.functions._

/** Dev diagnostic: stage-by-stage wall clock of sim_ivf_topk. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    def ms[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"IVFPROBE $tag ${(System.nanoTime() - t0) / 1e6}%.1f ms"); r
    }
    // warm
    val e = Engine.table(spark, dir, "embeddings"); e.cache().count()
    val q = e.filter(col("vec_id") < 5)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val cents = ms("kmeansCentroids")(
        graft.operators.Similarity.kmeansCentroids(e, "vec_id", "embedding", 16, 3))
      val ivf = graft.operators.Similarity.ivfTopK(e, q, "vec_id", "embedding", 16, 4, 10)
      ms("ivf.count")(ivf.count())
      val exact = graft.operators.Similarity.cosineTopK(e, q, "vec_id", "embedding", 10)
      ms("exact.count")(exact.count())
      ms("full query")(graft.SparkEntry.queries("sim_ivf_topk")(spark, dir).count())
    }
    spark.stop()
  }
}
