package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom aggregate functions that Spark lacks as builtins.
  *
  * Reference registration sites: product / entropy in the distributive
  * aggregate list (duckdb-4.cpp:14860-14880), histogram in the nested list
  * (duckdb-5.cpp:1246-1249). Implemented as typed
  * [[org.apache.spark.sql.expressions.Aggregator]]s — partial-aggregable
  * (map-side combine happens before the shuffle), so they scale the same
  * way builtin aggregates do.
  */
object Aggs {

  /** product(x): running double product (null inputs skipped; empty → null). */
  object ProductAgg extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
    def zero: (Double, Long) = (1.0, 0L)
    def reduce(b: (Double, Long), a: java.lang.Double): (Double, Long) =
      if (a == null) b else (b._1 * a, b._2 + 1)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 * y._1, x._2 + y._2)
    def finish(b: (Double, Long)): java.lang.Double =
      if (b._2 == 0) null else Double.box(b._1)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** entropy(x): log-2 Shannon entropy of the value distribution
    * (reference semantics: -Σ p·log2 p over value counts). Buffer is a
    * value→count map; merge is additive, so the aggregate is distributive
    * over partitions.
    */
  object EntropyAgg extends Aggregator[String, Map[String, Long], java.lang.Double] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val (small, large) = if (x.size < y.size) (x, y) else (y, x)
      small.foldLeft(large) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
    }
    def finish(b: Map[String, Long]): java.lang.Double = {
      val n = b.values.sum.toDouble
      if (n == 0) null
      else Double.box(-b.values.map { c => val p = c / n; p * math.log(p) / math.log(2.0) }.sum)
    }
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** vecsum(v): element-wise sum of array<double> vectors (used by the
    * k-means centroid update — partial-aggregable, so each map task
    * reduces its partition to one k×dim buffer before the shuffle;
    * ragged inputs sum over the common prefix). */
  object VecSumAgg extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.emptyDoubleArray
    private def add(b: Array[Double], a: Seq[Double]): Array[Double] =
      if (a == null || a.isEmpty) b
      else if (b.isEmpty) a.toArray
      else {
        val out = if (b.length >= a.length) b else java.util.Arrays.copyOf(b, a.length)
        var i = 0
        val it = a.iterator
        while (it.hasNext) { out(i) += it.next(); i += 1 }
        out
      }
    def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = add(b, a)
    def merge(x: Array[Double], y: Array[Double]): Array[Double] =
      add(x, scala.collection.immutable.ArraySeq.unsafeWrapArray(y))
    def finish(b: Array[Double]): Seq[Double] =
      if (b.isEmpty) null else scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    def bufferEncoder: Encoder[Array[Double]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** vecsum over array<bigint> — the INTEGER-EXACT centroid update for
    * [[graft.operators.Similarity.semanticClusters]]: long sums have no
    * float rounding, so any engine replaying the same quantized inputs
    * computes bit-identical centroids (the order-dependence of double
    * addition would otherwise make distributed vs single-node sums
    * diverge in the low bits and flip boundary assignments). */
  object VecSumLongAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    private def add(b: Array[Long], a: Seq[Long]): Array[Long] =
      if (a == null || a.isEmpty) b
      else if (b.isEmpty) a.toArray
      else {
        val out = if (b.length >= a.length) b else java.util.Arrays.copyOf(b, a.length)
        var i = 0
        val it = a.iterator
        while (it.hasNext) { out(i) += it.next(); i += 1 }
        out
      }
    def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = add(b, a)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      add(x, scala.collection.immutable.ArraySeq.unsafeWrapArray(y))
    def finish(b: Array[Long]): Seq[Long] =
      if (b.isEmpty) null else scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    def bufferEncoder: Encoder[Array[Long]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Misra-Gries heavy-hitters sketch: top-k frequency estimation in
    * O(k) memory per partial — the bounded-memory path for token
    * counting over a corpus too wide for an exact groupBy. Mergeable
    * (summaries sum, then the (k+1)-largest count is subtracted and
    * non-positive entries dropped), so map-side combine applies and the
    * shuffle carries k entries per partition. Guarantees after any
    * merge tree: est(x) ≤ true(x) and true(x) − est(x) ≤ N/(k+1).
    */
  class TopKSketchAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] = {
      if (a == null) return b
      if (b.contains(a)) b.updated(a, b(a) + 1L)
      else if (b.size < k) b.updated(a, 1L)
      else {
        // decrement-all round: removes one occurrence of k+1 distinct
        // values (the arriving one included) — the classic MG step
        b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      }
    }
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = EntropyAgg.merge(x, y)
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** histogram(x): value → occurrence count map
    * (reference: nested aggregate `histogram`, duckdb-5.cpp:1246-1249). */
  object HistogramAgg extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      EntropyAgg.merge(x, y)
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
