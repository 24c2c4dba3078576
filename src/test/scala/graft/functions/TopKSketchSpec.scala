package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopKSketchSpec extends AnyFunSuite {

  private def runSketch(k: Int, items: Seq[String],
                        chunks: Int = 1): Map[String, Long] = {
    val agg = new Aggs.TopKSketchAgg(k)
    val partials = items.grouped(math.max(1, items.size / chunks)).map { part =>
      part.foldLeft(agg.zero)(agg.reduce)
    }
    agg.finish(partials.foldLeft(agg.zero)(agg.merge))
  }

  test("exact when distinct values fit in k") {
    val items = Seq("a", "b", "a", "c", "a", "b")
    assert(runSketch(8, items) == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("never overcounts and stays within N/(k+1), single and merged") {
    val rnd = new scala.util.Random(11)
    // zipf-ish stream: value i drawn with weight 1/(i+1)
    val items = Seq.fill(5000) {
      val r = rnd.nextDouble()
      val i = math.min(49, (1.0 / (r + 0.02) - 1.0).toInt)
      s"v$i"
    }
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (chunks <- Seq(1, 7)) {
      val est = runSketch(8, items, chunks)
      assert(est.size <= 8)
      est.foreach { case (v, e) =>
        assert(e <= exact(v), s"$v overcounted: $e > ${exact(v)}")
        assert(exact(v) - e <= items.size / 9.0,
          s"$v outside MG bound: ${exact(v) - e}")
      }
    }
  }

  test("a strong majority item always survives") {
    val items = Seq.fill(900)("hot") ++ (1 to 300).map(i => s"cold$i")
    val est = runSketch(4, scala.util.Random.shuffle(items))
    assert(est.contains("hot"))
    assert(est("hot") <= 900L && 900L - est("hot") <= items.size / 5.0)
  }
}
