package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range-join strategies (reference: PhysicalPiecewiseMergeJoin
  * duckdb-3.cpp:17261, PhysicalIEJoin duckdb-3.cpp:15445).
  *
  * Spark plans a bare inequality join as broadcast-nested-loop — fine for
  * a small side, quadratic disaster at scale. `pointInRange` converts a
  * bounded-width interval join into an equi-join: bucket the point side,
  * explode the interval side over the buckets it spans, shuffle both on
  * the bucket key, refine exactly. One hash-partition shuffle instead of
  * an O(n·m) loop — the 100 TB plan shape.
  */
object RangeJoin {

  /** Join `points` rows to `ranges` rows whose [loCol, hiCol] interval
    * contains the point, via bucketed equi-join.
    *
    * @param bucketWidth ≥ the maximum interval width (each range row
    *   explodes to (width/bucketWidth)+1 buckets — keep it comparable to
    *   the typical interval so the explode factor stays ~2).
    * @param refine exact predicate (point, lo, hi) => boolean, applied
    *   after the bucket equi-join (default: lo < point ≤ hi).
    */
  def pointInRange(points: DataFrame, pointCol: String,
                   ranges: DataFrame, loCol: String, hiCol: String,
                   bucketWidth: Double,
                   refine: (Column, Column, Column) => Column =
                     (p, lo, hi) => p > lo && p <= hi): DataFrame = {
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    // inverted/empty intervals (hi < lo) match nothing; without the guard
    // Sequence(start > stop, step 1) throws at runtime
    val rb = ranges.filter(col(loCol) <= col(hiCol)).withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(rb, Seq("__bucket"))
      .filter(refine(col(pointCol), col(loCol), col(hiCol)))
      .drop("__bucket")
  }
}
