package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Engine

/** Dev lab (r15 verdict #4): decompose the exact holistic-aggregate
  * cohort — agg_quantile 1.09 s / agg_quantile_disc_sem 1.29 s in the
  * r14 artifact, the heaviest non-streaming spark rows. Questions:
  * (a) how much is ObjectHashAggregate per-group value buffering vs
  * job floor; (b) does a sort/window rank formulation beat it; (c)
  * does a value-HISTOGRAM cumsum (grouped counts + window walk) beat
  * both when distinct counts are small.
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ExactQuantLab /root/testdata/sf0.1"
  */
object ExactQuantLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val li = Engine.table(spark, dir, "lineitem").cache()
    li.count()

    def time(name: String)(mk: => DataFrame): Unit = {
      // warm + best of 3 (same protocol as Bench)
      mk.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    println("distinct counts: qty=" +
      li.select(countDistinct(col("l_quantity"))).head().getLong(0) +
      " price=" + li.select(countDistinct(col("l_extendedprice"))).head().getLong(0) +
      " rows=" + li.count())

    // baseline: the inventory row (fused percentile array + median + mode)
    time("baseline(agg_quantile)") {
      graft.SparkEntry.queries("agg_quantile")(spark, dir)
    }

    // components
    time("median only") {
      li.groupBy(col("l_returnflag")).agg(round(median(col("l_quantity")), 4).as("m"))
    }
    time("percentile pair only") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.75))").as("p"))
    }
    time("mode only") {
      li.groupBy(col("l_returnflag")).agg(mode(col("l_linestatus")).as("m"))
    }
    time("count only (floor)") {
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    }

    // histogram cumsum: grouped counts (narrow shuffle), then a window
    // walk over the per-(flag,value) rows — exact, distributed, and the
    // state is O(distinct values), not O(rows)
    def histoQuantile(valueCol: String, qs: Seq[Double]): DataFrame = {
      val counts = li.groupBy(col("l_returnflag"), col(valueCol).as("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("l_returnflag").orderBy("v")
      val cum = counts
        .withColumn("cumBefore",
          coalesce(sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum("c").over(
          Window.partitionBy("l_returnflag")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // for each q: continuous rank r = q*(n-1); take values at
      // floor(r) and ceil(r) and interpolate
      val picks = qs.zipWithIndex.map { case (q, i) =>
        val r = lit(q) * (col("n") - 1)
        val loK = floor(r).cast("long")
        val hiK = ceil(r).cast("long")
        val hasLo = col("cumBefore") <= loK && loK < col("cumBefore") + col("c")
        val hasHi = col("cumBefore") <= hiK && hiK < col("cumBefore") + col("c")
        struct(
          max(when(hasLo, col("v"))).as(s"lo$i"),
          max(when(hasHi, col("v"))).as(s"hi$i"),
          max(when(hasLo, r - loK.cast("double"))).as(s"f$i"))
      }
      cum.groupBy(col("l_returnflag"))
        .agg(picks.head, picks.tail: _*)
    }
    time("histo percentile pair") {
      histoQuantile("l_extendedprice", Seq(0.25, 0.75))
    }
    time("histo median qty") {
      histoQuantile("l_quantity", Seq(0.5))
    }
    // mode via counts + max_by (distributed, no value buffers)
    time("mode via max_by") {
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1)).as("c"))
        .groupBy(col("l_returnflag"))
        .agg(expr("max_by(l_linestatus, struct(c, l_linestatus))").as("m"))
    }
    // fused all-three via histogram shapes
    time("fused histo full row") {
      val p = histoQuantile("l_extendedprice", Seq(0.25, 0.75))
      val m = histoQuantile("l_quantity", Seq(0.5))
      val mo = li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1)).as("c"))
        .groupBy(col("l_returnflag"))
        .agg(expr("max_by(l_linestatus, struct(c, l_linestatus))").as("mode_ls"))
      p.join(m, "l_returnflag").join(mo, "l_returnflag")
    }

    // disc row baseline + histo twin
    time("baseline(disc_sem)") {
      graft.SparkEntry.queries("agg_quantile_disc_sem")(spark, dir)
    }

    // two-pass bin refinement: stats scan → bin counts (constant
    // state) → driver cumsum over ≤B bins/group → one filtered tail
    // scan sorting only the needed bins. No per-group value buffers.
    time("bin-refine percentile pair") {
      val B = 4096
      val g = col("l_returnflag")
      val v = col("l_extendedprice")
      val stats = li.groupBy(g).agg(
        min(v).as("lo"), max(v).as("hi"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
      val loM = typedLit(stats.map { case (k, s) => k -> s._1 })
      val hiM = typedLit(stats.map { case (k, s) => k -> s._2 })
      val bin = least(lit(B - 1), greatest(lit(0),
        floor((v - loM(g)) / (hiM(g) - loM(g) + lit(1e-300)) * B))).cast("int")
      val binCounts = li.groupBy(g, bin.as("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      // driver: locate the bins holding the floor/ceil ranks per q
      val qs = Seq(0.25, 0.75)
      val needed = scala.collection.mutable.Map
        .empty[(String, Int), scala.collection.mutable.ArrayBuffer[(Double, Long, Long)]]
      stats.foreach { case (flag, (_, _, n)) =>
        val cums = (0 until B).scanLeft(0L)((acc, b) =>
          acc + binCounts.getOrElse((flag, b), 0L))
        qs.foreach { q =>
          val r = q * (n - 1)
          Seq(math.floor(r).toLong, math.ceil(r).toLong).distinct.foreach { k =>
            val b = cums.indexWhere(_ > k) - 1
            needed.getOrElseUpdate((flag, b),
              scala.collection.mutable.ArrayBuffer.empty) += ((q, k, cums(b)))
          }
        }
      }
      val keys = needed.keys.toSeq
      val keyLit = typedLit(keys.map { case (f, b) => f + "#" + b })
      val tail = li.select(g.as("flag"), v.as("v"), bin.as("b"))
        .where(concat_ws("#", col("flag"), col("b")).isin(keys.map {
          case (f, b) => f + "#" + b }: _*))
        .groupBy(col("flag"), col("b"))
        .agg(sort_array(collect_list(col("v"))).as("vs"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      val rows = stats.keys.toSeq.sorted.map { flag =>
        val picked = qs.map { q =>
          val n = stats(flag)._3
          val r = q * (n - 1)
          def at(k: Long): Double = {
            val b = needed.collectFirst { case ((f, bb), items)
              if f == flag && items.exists(_._2 == k) => bb }.get
            val cumBefore = needed((flag, b)).find(_._2 == k).get._3
            tail((flag, b))((k - cumBefore).toInt)
          }
          val lo = at(math.floor(r).toLong)
          val hi = at(math.ceil(r).toLong)
          lo + (r - math.floor(r)) * (hi - lo)
        }
        (flag, picked.head, picked(1))
      }
      spark.createDataFrame(rows).toDF("flag", "p25", "p75")
    }

    // r16: the PROMOTED operator (operators.ExactQuantile, chained-bin
    // membership + per-value-count tail) and the conf-gated inventory
    // row riding it — the crossover numbers BASELINE.md cites
    time("operator ExactQuantile pair") {
      graft.operators.ExactQuantile.quantiles(
        li, "l_returnflag", "l_extendedprice", Seq(0.25, 0.75))
    }
    time("agg_quantile binRefine=true") {
      spark.conf.set("spark.graft.exactQuantile.binRefine", "true")
      try graft.SparkEntry.queries("agg_quantile")(spark, dir)
      finally spark.conf.set("spark.graft.exactQuantile.binRefine", "false")
    }
    spark.stop()
  }
}
