package graft.transforms

import graft.functions.Vectors.{dot, l2norm, lshBuckets}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector k-NN machinery behind the KNN language verb — the q34 (exact
  * brute force), q35 (sign-LSH) and q46 (IVF) shapes from
  * [[graft.queries.Similarity]], generalized over column names and
  * parameters so a data engineer can drive similarity search from AQL.
  *
  * Reference analogue: none — the reference engine
  * (michaelbironneau/analyst) has no vector operators; this is the
  * beyond-parity LLM-pipeline surface exposed as a TRANSFORM verb.
  *
  * All entry points take `corpus` and `queries` frames of shape
  * (id, v, nrm) — v an array<double>, nrm its L2 norm (see the verb's
  * prep in TransformParser) — and return (qid, neighbor_id, cosine,
  * rank): each query row's top-k cosine neighbors from the corpus, self
  * excluded, rank 1..k by (cosine DESC, neighbor id) — deterministic
  * including ties. Cosines are rounded at 1e-6 and dot products fold
  * left-to-right, so the EXACT method hash-matches q34's DuckDB oracle
  * (gate q125).
  *
  * Scale shapes (same as the gates they generalize): the corpus side
  * never shuffles for scoring — only the (small) query frame broadcasts;
  * LSH candidates are bucket collisions; IVF scans nprobe/cells of the
  * corpus; the per-query top-k is the only key shuffle.
  */
object VecKnn {

  /** Exact cosine rerank of (qid, qv, qnrm, cid, cv, cnrm) pair rows. */
  private def scored(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("cid"))
    pairs
      .withColumn("cosine",
        round(dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("cid").as("neighbor_id"), col("cosine"),
        col("rank"))
  }

  /** Exact-rerank a distinct (qid, cid) candidate frame. */
  private def rerank(cand: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int): DataFrame =
    scored(cand
      .join(corpus.toDF("cid", "cv", "cnrm"), "cid")
      .join(broadcast(queries.toDF("qid", "qv", "qnrm")), "qid"), k)

  /** Brute-force exact top-k (q34's plan): broadcast the query frame
    * against the partitioned corpus — one corpus scan per query batch,
    * no shuffle until the per-query top-k.
    */
  def exact(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    scored(corpus.toDF("cid", "cv", "cnrm")
      .join(broadcast(queries.toDF("qid", "qv", "qnrm")),
        col("qid") =!= col("cid")), k)

  /** Sign-LSH ANN (q35's plan): `tables` hash tables × `bits` sign bits;
    * candidates collide in ≥ 1 table and only candidates pay the exact
    * rerank. Vector width is probed from one corpus row (bounded driver
    * action — the hyperplanes need the dimension count up front).
    */
  def lsh(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 16, bits: Int = 4): DataFrame = {
    val dims = corpus.select(size(col("v"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    if (dims == 0) return exact(corpus, queries, k) // empty corpus
    val buckets = corpus.select(col("id").as("cid"),
      posexplode(lshBuckets(col("v"), tables, bits, dims))
        .as(Seq("t", "bucket")))
    val qb = queries.select(col("id").as("qid"),
      posexplode(lshBuckets(col("v"), tables, bits, dims))
        .as(Seq("t", "bucket")))
    val cand = buckets.join(qb, Seq("t", "bucket"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    rerank(cand, corpus, queries, k)
  }

  /** IVF ANN (q46's plan): seeded coarse k-means quantizer, probe the
    * `nprobe` cells whose centroids are cosine-nearest each query, exact
    * rerank inside. Trains per invocation (the verb has no
    * index-lifecycle surface; at 100 TB an engineer materializes the
    * cell assignment once and reuses it across query batches).
    */
  def ivf(corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 8): DataFrame = {
    // KMeans.fit throws on zero rows — give the empty corpus the same
    // clean empty result the EXACT and LSH methods produce
    if (corpus.isEmpty) return exact(corpus, queries, k)
    val s = corpus.sparkSession
    val fe = corpus.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col("v")))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(cells).setSeed(42L).setMaxIter(3).setInitMode("random")
      .fit(fe)
    val assigned = km.transform(fe)
      .select(col("id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"), col("prediction").as("cluster"))
    val cents = s.createDataFrame(
      km.clusterCenters.toIndexedSeq.zipWithIndex
        .map { case (c, i) => (i, c.toArray) })
      .toDF("cluster", "centroid")
    val cw = Window.partitionBy("qid")
      .orderBy(col("cdist").desc, col("cluster"))
    val probes = queries.toDF("qid", "qv", "qnrm")
      .crossJoin(broadcast(cents))
      .withColumn("cdist",
        dot(col("qv"), col("centroid"))
          / (col("qnrm") * l2norm(col("centroid"))))
      .withColumn("crank", row_number().over(cw))
      .where(col("crank") <= nprobe)
      .select(col("qid"), col("qv"), col("qnrm"), col("cluster"))
    scored(assigned
      .join(broadcast(probes), Seq("cluster"))
      .where(col("qid") =!= col("cid")), k)
  }
}
