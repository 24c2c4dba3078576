package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Dedup

/** r18 optimization lab: decompose dedup_fuzzy_names_blocked (0.99 s
  * merged-min baseline) — where does the time go between the
  * delete-neighborhood Generate (runs on BOTH self-join sides), the
  * candidate equi-join + dropDuplicates, and the banded-Levenshtein
  * refine?
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.FuzzyLab /root/testdata/sf0.1"
  */
object FuzzyLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val sup = Engine.table(spark, dir, "supplier").cache()
    println("rows=" + sup.count())

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-32s min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val base = sup.select(col("s_suppkey").cast("long").as("id"),
      col("s_name").as("s"))
    graft.functions.DuckFunctions.register(spark)
    val keyed = base.select(col("id"),
      explode(Dedup.deleteNeighborhoodHashesCol(base)(col("s"), 2)).as("key"))

    println("keyed rows = " + keyed.count())
    val cand = keyed.select(col("key"), col("id").as("id_a"))
      .join(keyed.select(col("key"), col("id").as("id_b")), Seq("key"))
      .filter(col("id_a") < col("id_b"))
    println("joined candidate rows (pre-dedup) = " + cand.count())
    println("distinct candidate pairs = " +
      cand.select("id_a", "id_b").distinct().count())

    time("keyed (Generate) only") { keyed }
    time("join only (no dedup)") { cand }
    time("join + dropDuplicates") {
      cand.select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
    }
    time("full fuzzyPairs") {
      Dedup.fuzzyPairs(sup, "s_suppkey", "s_name", 2)
    }
    time("full row (agg)") {
      graft.SparkEntry.queries("dedup_fuzzy_names_blocked")(spark, dir)
    }
    spark.stop()
  }
}
