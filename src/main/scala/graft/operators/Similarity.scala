package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFns._

/** Similarity search over embedding columns (SURVEY §2.B LLM block).
  *
  * Baseline: brute-force cosine top-k (one scan, no shuffle until the
  * final top-k which is `TakeOrderedAndProject` — driver receives k rows
  * only). Scale paths: sign-LSH bucketing for near-dup pairs and an IVF
  * (inverted-file) index with broadcast centroids for ANN queries.
  */
object Similarity {

  /** Brute-force cosine top-k of `queryId`'s vector over the whole corpus.
    * The 1-row query side is broadcast; the scan side never shuffles — at
    * 100 TB this is one pass over the data with k rows returned per
    * partition, then a global top-k merge.
    */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = broadcast(emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qv")))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(q)
      .select(col("vec_id"), round(cosine(col("embedding"), col("qv")), 4).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }

  /** All-pairs cosine >= `threshold`, blocked by `blockCol` (LSH-style
    * blocking: only same-block pairs are compared, keeping the join
    * output linear in block sizes rather than O(n²) on the corpus).
    */
  def blockedSimilarityJoin(emb: DataFrame, blockCol: String,
      threshold: Double): DataFrame = {
    val a = emb.as("a"); val b = emb.as("b")
    a.join(b, col(s"a.$blockCol") === col(s"b.$blockCol") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** IVF (inverted-file) approximate nearest neighbour.
    *
    * Index build: `nCentroids` seed centroids (deterministic: lowest
    * vec_ids) refined with `iters` Lloyd steps — each step is a broadcast
    * nested-loop assign (corpus × tiny centroid table) + groupBy mean, both
    * fully distributed. Query: score only the `nProbe` closest clusters —
    * the fraction of the corpus scanned is nProbe/nCentroids.
    *
    * Centroids are collected to the driver only because there are O(100)
    * of them; the corpus itself never leaves executors.
    */
  def ivfTopK(spark: SparkSession, emb: DataFrame, queryId: Long, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 1): DataFrame = {
    import spark.implicits._
    val dim = 64
    var centroids = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = assign(emb, centroids)
      centroids = assigned.join(emb, "vec_id")
        .groupBy(col("cid"))
        .agg(array((0 until dim).map(i =>
          avg(element_at(col("embedding"), i + 1).cast("double"))): _*).as("cv"))
    }
    val qv = emb.filter(col("vec_id") === queryId).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    val qvCol = array(qv.map(lit): _*)
    val probed = centroids
      .withColumn("csim", cosine(col("cv"), qvCol))
      .orderBy(desc("csim")).limit(nProbe)
      .select(col("cid"))
    val assignment = assign(emb, centroids)
    emb.join(assignment, "vec_id").join(broadcast(probed), "cid")
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(cosine(col("embedding"), qvCol), 4).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }

  /** Assign every vector to its nearest centroid (broadcast NLJ + argmax). */
  private def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("embedding"), col("cv")))
    val best = scored.groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("csim"), col("cid"))).as("cid"))
    best
  }
}
