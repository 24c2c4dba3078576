package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxRounds: Int = 50): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b", maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side union-find ground truth. */
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

  test("two disjoint cliques resolve to their minimum ids") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L))
    assert(cc(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("path graph converges in O(log^2 n) rounds, not O(n)") {
    // diameter 63: plain label propagation would need ~63 rounds;
    // large-star/small-star must finish well inside 12
    val edges = (0L until 63L).map(i => (i, i + 1))
    assert(cc(edges, maxRounds = 12) == (0L to 63L).map(_ -> 0L).toMap)
  }

  test("matches union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(80)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      assert(cc(edges) == bruteForce(edges))
    }
  }

  test("empty and self-loop-only edge lists yield no rows") {
    assert(cc(Seq.empty) == Map.empty)
    assert(cc(Seq((5L, 5L))) == Map.empty)
  }

  test("duplicate and reversed edges are idempotent") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
    assert(cc(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
