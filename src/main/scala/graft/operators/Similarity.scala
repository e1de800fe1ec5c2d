package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths, per the scale brief:
  *  - brute-force cosine top-k: one pass over the table against a
  *    broadcast probe vector — the exact baseline; at 100 TB this is a
  *    full scan but with NO shuffle except the global top-k
  *    (TakeOrderedAndProject), which is the optimal exact plan;
  *  - LSH-bucketed ANN (BucketedRandomProjectionLSH): random-projection
  *    buckets prune the scan to matching buckets — the approximate
  *    scale path for repeated queries / knn-joins.
  */
object Similarity {

  /** Exact cosine top-k against a single probe row taken from the same
    * table (probeId). The probe side is one row — the plan is a
    * BroadcastNestedLoopJoin whose build side has exactly 1 row, i.e.
    * O(N) scan work (not an all-pairs product), then per-row cosine and
    * TakeOrderedAndProject. Ordering is on the ROUNDED score with an id
    * tie-break so the result is total-ordered and engine-independent. */
  def bruteTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), ArrayOps.asDouble(col("embedding")).as("v"))
    val probe = e.where(col("vec_id") === probeId).select(col("v").as("pv"))
    // cosine_sim is the native codegen expression (GraftExtensions) —
    // bit-identical to ArrayOps.cosine, one fused pass instead of three
    // interpreted higher-order folds
    e.crossJoin(broadcast(probe))
      .select(col("vec_id"), round(call_function("cosine_sim", col("v"), col("pv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Approximate nearest neighbours via random-projection LSH buckets.
    * Returns (vec_id, distCol) for the k nearest to the probe row. */
  def annTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val feat = emb.select(col("vec_id"),
      array_to_vector(ArrayOps.asDouble(col("embedding"))).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(3).setSeed(42)
    val model = lsh.fit(feat)
    val probeVec = feat.where(col("vec_id") === probeId)
      .head().getAs[org.apache.spark.ml.linalg.Vector]("features")
    model.approxNearestNeighbors(feat, Vectors.dense(probeVec.toArray), k)
      .select(col("vec_id"), round(col("distCol"), 6).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity cut,
    * bucketed by LSH so candidate generation is an equi-join on hash
    * buckets (approxSimilarityJoin), never an all-pairs product. */
  def cosineNearDupPairs(emb: DataFrame, maxL2: Double): DataFrame = {
    val feat = emb.select(col("vec_id"),
      array_to_vector(ArrayOps.asDouble(col("embedding"))).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(3).setSeed(42)
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, maxL2, "l2_dist")
      .select(col("datasetA.vec_id").as("id_a"), col("datasetB.vec_id").as("id_b"),
        round(col("l2_dist"), 6).as("l2_dist"))
      .where(col("id_a") < col("id_b"))
  }
}
