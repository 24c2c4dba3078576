package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward asof picks the latest build row at or before probe time") {
    val probe = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L), (4L, "w", 50L))
      .toDF("id", "k", "t")
    val build = Seq(("u", 10L, 100.0), ("u", 15L, 150.0), ("v", 1L, 999.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.lastValueBefore(probe, build, "k", "t", "v", "asof_v")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out(1L) == 100.0) // equal time matches (<=)
    assert(out(2L) == 150.0) // latest before 20
    assert(out(3L) == null)  // nothing at or before 5
    assert(out(4L) == null)  // key with no build rows
  }

  test("forward asof picks the earliest build row at or after probe time") {
    val probe = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L), (4L, "w", 50L))
      .toDF("id", "k", "t")
    val build = Seq(("u", 10L, 100.0), ("u", 15L, 150.0), ("v", 1L, 999.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.firstValueAfter(probe, build, "k", "t", "v", "asof_v")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out(1L) == 100.0) // equal time matches (>=)
    assert(out(2L) == null)  // nothing at or after 20
    assert(out(3L) == 100.0) // earliest after 5
    assert(out(4L) == null)  // key with no build rows
  }
}
