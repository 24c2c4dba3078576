package graft.operators

import graft.SparkSpec

class HybridRrfSpec extends SparkSpec {
  import spark.implicits._

  // Query doc 0 with qv=[1,0]; arms deliberately disagree:
  //   lexical ("cat"): 1 (tf=3) > 3 (tf=1); 2 and 4 match nothing
  //   dense (cosine): 2 (.995) > 3 (.707) > 1 (0); 4 (-1) cut by armK=3
  // RRF(60): d1 = 1/61+1/63 = .032266, d3 = 1/62+1/62 = .032258,
  //          d2 = 1/61 = .016393 → order 1, 3, 2 (arms alone disagree
  //          on all three).
  private val docs = Seq(
    (0L, "x"), (1L, "cat cat cat"), (2L, "dog dog"), (3L, "cat y"), (4L, "z"))
    .toDF("doc_id", "text")
  private val embs = Seq(
    (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), (2L, Array(0.99f, 0.1f)),
    (3L, Array(0.7f, 0.7f)), (4L, Array(-1.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("hybridRrf fuses disagreeing arms by reciprocal rank") {
    val out = Similarity.hybridRrf(docs, embs, "doc_id", "text", "vec_id", "embedding",
        queryId = 0L, Seq("cat"), k = 5, armK = 3, numShards = 2)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 2L), s"fusion order wrong: ${out.toSeq}")
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 1L && byId(1L)._3 == 3L)
    assert(byId(3L)._2 == 2L && byId(3L)._3 == 2L)
    assert(byId(2L)._2 == -1L && byId(2L)._3 == 1L) // lexical arm missed it
    assert(math.abs(byId(1L)._4 - 0.032266) < 1e-6)
    assert(math.abs(byId(3L)._4 - 0.032258) < 1e-6)
    // doc 4 retrieved by neither arm: absent entirely, not rank-0
    assert(!out.exists(_._1 == 4L))
  }
}
