package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each probe row, the most recent build row
  * with build.time <= probe.time on the same key.
  *
  * (Not in the reference at v0.7 — flagged in SURVEY §2.3 as the natural
  * extra; essential for event/feature pipelines.)
  *
  * Implementation is the union-merge formulation: tag build rows, union
  * with probe rows, and take `last(value) IGNORE NULLS` over a
  * (key, time)-ordered window. ONE shuffle on the key — no range join,
  * no per-row probe — so it scales like a sort-merge join. Build rows at
  * exactly probe.time match (<= semantics, build sorts first on ties).
  */
object AsofJoin {

  def lastValueBefore(probe: DataFrame, build: DataFrame,
                      key: String, time: String, valueCol: String,
                      as: String): DataFrame =
    asof(probe, build, key, time, valueCol, as, forward = false)

  /** Forward asof: the EARLIEST build value at or after each probe time
    * (reference ASOF supports both inequality directions). Same
    * union+window shape: one shuffle on the key, no join. */
  def firstValueAfter(probe: DataFrame, build: DataFrame,
                      key: String, time: String, valueCol: String,
                      as: String): DataFrame =
    asof(probe, build, key, time, valueCol, as, forward = true)

  private def asof(probe: DataFrame, build: DataFrame,
                   key: String, time: String, valueCol: String,
                   as: String, forward: Boolean): DataFrame = {
    val valueType = build.schema(valueCol).dataType
    val probeCols = probe.columns.toSeq

    val p = probe
      .withColumn("__v", lit(null).cast(valueType))
      .withColumn("__side", lit(1))
    val b0 = build.select(col(key), col(time), col(valueCol).as("__v"))
      .withColumn("__side", lit(0))
    // build rows carry nulls for the probe-only columns
    val b = probeCols.foldLeft(b0) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(probe.schema(c).dataType))
    }

    val ordered = (probeCols :+ "__v" :+ "__side").map(col)
    val all = p.select(ordered: _*).unionAll(b.select(ordered: _*))

    // tie order keeps the equal-time build row inside the probe's frame
    // on either direction (backward: build sorts before the probe row;
    // forward: after it)
    val w =
      if (forward)
        Window.partitionBy(col(key))
          .orderBy(col(time).asc, col("__side").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy(col(key))
          .orderBy(col(time).asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked =
      if (forward) all.withColumn(as, first(col("__v"), ignoreNulls = true).over(w))
      else all.withColumn(as, last(col("__v"), ignoreNulls = true).over(w))
    marked.filter(col("__side") === 1).drop("__v", "__side")
  }
}
