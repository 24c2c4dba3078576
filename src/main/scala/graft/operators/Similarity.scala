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

  /** Assign each vector to its nearest centroid (centroids broadcast —
    * they are k rows). One scan, no shuffle until the group-by. */
  def assignToCentroids(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("dist", -cosine(col("v"), col("cv")))
    scored.groupBy(col("id"))
      .agg(min_by(col("cid"), col("dist")).as("cid"), first(col("v")).as("v"))
  }

  /** Distributed Lloyd k-means over array<double> vectors (no MLlib):
    * deterministic init (first k by id), assignment via broadcast
    * centroids, centroid update via posexplode + per-dimension mean.
    * Each iteration is one scan + one (cluster, dim) shuffle.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iterations: Int): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    var centroids = v.orderBy(col("id")).limit(k)
      .select((row_number().over(Window.orderBy(col("id"))) - 1).as("cid"), col("v").as("cv"))
      .localCheckpoint()
    for (_ <- 0 until iterations) {
      val assigned = assignToCentroids(v, centroids)
      centroids = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("x"))
        .groupBy(col("cid"))
        .agg(sort_array(collect_list(struct(col("pos"), col("x")))).as("px"))
        .select(col("cid"), expr("transform(px, p -> p.x)").as("cv"))
        .localCheckpoint()
    }
    centroids
  }

  /** IVF approximate NN: coarse-quantize the corpus into k-means cells,
    * probe only the `nProbe` cells nearest each query — corpus is
    * scanned once for assignment, search touches ~nProbe/k of the data.
    * The inverted-file scale path alongside sign-LSH.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              numCells: Int, nProbe: Int, k: Int, trainIterations: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(corpus, idCol, vecCol, numCells, trainIterations)
    val v = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val assigned = assignToCentroids(v, centroids)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    // nProbe nearest cells per query (tiny: queries × k cells)
    val wq = Window.partitionBy(col("qid")).orderBy(col("qdist").asc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("qdist", -cosine(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(wq)).filter(col("prn") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    probes.join(assigned, "cid")
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
                       numPlanes: Int = 12, dim: Int = 64, k: Int = 5): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val b = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
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
