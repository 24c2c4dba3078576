package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // Hand-computed Okapi BM25 (k1=1.2, b=0.75, Lucene idf):
  // N=4, avgdl=2.75, df(cat)=df(dog)=2 → idf=ln 2 for both.
  private val docs = Seq(
    (1L, "cat cat dog fish"),
    (2L, "cat fish fish fish"),
    (3L, "dog"),
    (4L, "fish eel")).toDF("doc_id", "text")

  test("bm25TopK scores and ranks against the hand-computed values") {
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("cat", "dog"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 2L)) // rank by score desc
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 2L) // both terms hit
    assert(math.abs(byId(1L)._3 - 1.4295) < 1e-3)
    assert(math.abs(byId(3L)._3 - 0.9372) < 1e-3) // short doc boosted by b
    assert(math.abs(byId(2L)._3 - 0.5845) < 1e-3)
  }

  test("bm25TopK excludes no-hit docs and honors k") {
    val all = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("cat", "dog"), k = 10)
      .collect()
    assert(all.length == 3) // doc 4 matches nothing
    val top1 = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("cat", "dog"), k = 1)
      .collect()
    assert(top1.map(_.getLong(0)).toSeq == Seq(1L))
  }
}
