package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Baseline is brute-force cosine top-k (broadcast the query set, scan
  * the corpus once — the right plan at any corpus size when the query set
  * is small). The scale path is LSH bucketing (random hyperplanes): one
  * shuffle on the bucket key instead of a full cross product.
  */
object Similarity {

  /** dot(a, b) over two array<double> columns — the native codegen'd
    * [[graft.plans.ArrayDot]] expression (registered by
    * DuckFunctions.register / GraftExtensions). */
  def dot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  /** L2 norm of an array<double> column. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector (small set,
    * broadcast), the k nearest corpus vectors. Corpus-side norm is
    * computed once per row; the join is a broadcast nested loop — a
    * single corpus scan, no shuffle of the corpus itself; the only
    * shuffle is the final per-query top-k (tiny: k rows per query after
    * partial TopK).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cnorm", norm(col("cv")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qnorm", norm(col("qv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("rn").cast("long").as("rn"), col("sim"))
  }

  /** Deterministic random hyperplanes: `numPlanes` × `dim`, components in
    * {-1, +1} from a seeded PRNG (sign-random projections preserve cosine
    * similarity in expectation). Small — intended for literal broadcast.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(if (rng.nextBoolean()) 1.0 else -1.0)
  }

  /** Sign-LSH bucket id: bit p = sign(dot(v, plane_p)). Expression-only
    * (the planes are folded in as literals), no shuffle.
    */
  def lshBucket(vecCol: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vecCol, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Per-row scores against driver-known centroids, folded in as literal
    * arrays: score_i = dot(v, c_i)/|c_i|. |v| is a per-row constant, so
    * the argmax over i equals the cosine argmax — no need to divide by it.
    * Everything stays inside whole-stage codegen; zero joins, zero
    * shuffles.
    */
  private def centroidScores(vecCol: Column,
                             centroids: Array[(Int, Array[Double])]): Array[Column] =
    centroids.map { case (cid, cv) =>
      val n = { val s = math.sqrt(cv.map(x => x * x).sum); if (s == 0) 1.0 else s }
      struct((dot(vecCol, array(cv.map(lit).toIndexedSeq: _*)) / n).as("s"),
        lit(cid).as("cid"))
    }

  /** Assign each vector to its nearest centroid. Centroids are k
    * driver-known rows — folding them into a single
    * greatest(struct(score, cid)) argmax keeps assignment a pure map
    * stage (the old crossJoin(broadcast)+groupBy(min_by) pushed n×k rows
    * through a shuffle per call). */
  def assignToCentroids(vectors: DataFrame,
                        centroids: Array[(Int, Array[Double])]): DataFrame = {
    val scored = centroidScores(col("v"), centroids)
    val best = if (scored.length == 1) scored.head else greatest(scored.toIndexedSeq: _*)
    vectors.withColumn("cid", best.getField("cid"))
  }

  /** Distributed Lloyd k-means over array<double> vectors (no MLlib):
    * deterministic init (first k by id), shuffle-free literal-centroid
    * assignment, centroid update via a partial-aggregable vector-sum
    * Aggregator — each iteration is one corpus scan + a k-row shuffle
    * (map-side combine reduces to k×dim doubles per partition).
    * Returns driver-side centroids (k is small by construction).
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iterations: Int): Array[(Int, Array[Double])] = {
    val v = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    var centroids: Array[(Int, Array[Double])] = v.orderBy(col("id")).limit(k).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    val vecsum = udaf(graft.functions.Aggs.VecSumAgg)
    for (_ <- 0 until iterations) {
      centroids = assignToCentroids(v, centroids)
        .groupBy(col("cid"))
        .agg(vecsum(col("v")).as("vs"), count(lit(1)).as("n"))
        .collect()
        .map { r =>
          val n = r.getLong(2)
          (r.getInt(0), r.getSeq[Double](1).toArray.map(_ / n))
        }
        .sortBy(_._1)
    }
    centroids
  }

  /** IVF approximate NN: coarse-quantize the corpus into k-means cells,
    * probe only the `nProbe` cells nearest each query — corpus is
    * scanned once for assignment, search touches ~nProbe/k of the data.
    * The inverted-file scale path alongside sign-LSH. The corpus never
    * shuffles: assignment is a map stage and the probe set (queries ×
    * nProbe, small by contract) broadcasts onto it.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              numCells: Int, nProbe: Int, k: Int, trainIterations: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(corpus, idCol, vecCol, numCells, trainIterations)
    val v = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val assigned = assignToCentroids(v, centroids)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    // nProbe nearest cells per query: literal centroid scores sorted
    // per-row — no crossJoin, no window shuffle over the query set
    val cells = array(centroidScores(col("qv"), centroids).toIndexedSeq: _*)
    val probes = q
      .select(col("qid"), col("qv"),
        explode(slice(reverse(array_sort(cells)), 1, nProbe).getField("cid")).as("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    assigned.join(broadcast(probes), "cid")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"), cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("rn").cast("long").as("rn"), col("sim"))
  }

  /** LSH-bucketed approximate NN: bucket every vector, then compute exact
    * cosine only within buckets. One shuffle (bucket key) instead of a
    * quadratic cross product — the 100-TB-scale variant of cosineTopK.
    */
  def lshNearNeighbors(corpus: DataFrame, idCol: String, vecCol: String,
                       numPlanes: Int = 12, dim: Int = 64, k: Int = 5,
                       maxBucket: Int = 1000): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val b = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
      // skew guard (same move as Dedup.minhashCandidates): a degenerate
      // bucket — e.g. all-zero vectors hashing together — would make the
      // in-bucket self-join quadratic; cap it like a salting cutoff
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy("bucket")))
      .filter(col("bsize") <= maxBucket)
      .drop("bsize")
    val l = b.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    val pairs = l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("bucket"), col("id_a"), col("id_b"),
        cosine(col("v_a"), col("v_b")).as("sim"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("sim").desc, col("id_b").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
