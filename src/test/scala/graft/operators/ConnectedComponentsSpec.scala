package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** localEdgeLimit = 0 forces the distributed star loop; the default
    * exercises the driver-local union-find tier. */
  private def cc(edges: Seq[(Long, Long)], maxRounds: Int = 50,
                 localLimit: Long = 100000L): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b", maxRounds, localLimit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side union-find ground truth (independent implementation). */
  private def bruteForce(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("two disjoint cliques resolve to their minimum ids (both tiers)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    assert(cc(edges) == want)
    assert(cc(edges, localLimit = 0L) == want)
  }

  test("distributed tier: path graph converges in O(log^2 n) rounds, not O(n)") {
    // diameter 63: plain label propagation would need ~63 rounds;
    // large-star/small-star must finish well inside 12
    val edges = (0L until 63L).map(i => (i, i + 1))
    assert(cc(edges, maxRounds = 12, localLimit = 0L) ==
      (0L to 63L).map(_ -> 0L).toMap)
  }

  test("both tiers match union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(80)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      val want = bruteForce(edges)
      assert(cc(edges) == want)
      assert(cc(edges, localLimit = 0L) == want)
    }
  }

  test("empty and self-loop-only edge lists yield no rows (both tiers)") {
    assert(cc(Seq.empty) == Map.empty)
    assert(cc(Seq((5L, 5L))) == Map.empty)
    assert(cc(Seq((5L, 5L)), localLimit = 0L) == Map.empty)
  }

  test("duplicate and reversed edges are idempotent (both tiers)") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    assert(cc(edges) == want)
    assert(cc(edges, localLimit = 0L) == want)
  }
}
