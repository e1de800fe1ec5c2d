package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, NGram, Tokenizer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash-groupBy), MinHash+LSH banded near-dup, SimHash, and
  * exact n-gram Jaccard. All designed for 100 TB: every candidate
  * generation step is a bucketed equi-join (never an all-pairs cross
  * join); exact verification runs only on candidate pairs.
  */
object Dedup {

  /** Word 3-shingles of a space-separated text column as an array
    * column — guarded so <3-word docs yield an empty array (Spark's
    * `sequence(1,0)` would otherwise produce a DESCENDING sequence). */
  def shingles3(text: Column): Column = {
    val w = split(text, " ")
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact n-gram Jaccard similarity of two texts: |A∩B| / |A∪B| over
    * distinct 3-shingles — integer set sizes, so the division is the
    * only float op (bit-identical across engines). */
  def jaccard3(a: Column, b: Column): Column = {
    val sa = array_distinct(shingles3(a))
    val sb = array_distinct(shingles3(b))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb))
  }

  /** MinHash+LSH near-duplicate pairs: shingle → binary HashingTF →
    * MinHashLSH (numHashTables bands) → approxSimilarityJoin, which
    * explodes per-band signatures and equi-joins on (band, signature) —
    * the banded/bucketed plan; candidates then carry the exact Jaccard
    * distance in `distCol`. No cross join at any scale.
    *
    * Input must have columns (id: long, text: string). */
  def minHashPairs(docs: DataFrame, threshold: Double, numTables: Int = 5): DataFrame = {
    val withShingles = docs
      .withColumn("sh", shingles3(col("text")))
      .where(size(col("sh")) > 0) // MinHashLSH requires ≥1 non-zero feature
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 18)
    val feat = tf.transform(withShingles).select("id", "features")
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(42)
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, threshold, "jaccard_dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        col("jaccard_dist"))
      .where(col("id_a") < col("id_b")) // dedupe symmetric pairs + self-pairs
  }

  /** 64-bit SimHash of the word tokens: per token a stable 64-bit hash
    * (xxhash64); bit i votes +1/-1 weighted by token occurrence; the
    * sign vector re-packs into a BIGINT. Pure per-row array math — no
    * shuffle; candidates come from equality on 16-bit bands. */
  def simHash64(text: Column): Column = {
    val tokens = split(text, " ")
    // Shift amounts must be Scala Ints for the functions API — the 64
    // bit positions are static, so unroll them driver-side; the per-row
    // work stays one codegen'd expression tree.
    val votes = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, tok) => {
        val h = xxhash64(tok)
        val bits = array((0 until 64).map(i =>
          shiftright(h, i).bitwiseAND(1).cast("int")): _*)
        zip_with(acc, bits, (a, b) => a + when(b === 1, 1).otherwise(-1))
      })
    // pack sign bits: Σ (vote_i > 0) << i ; bit 63 flips the sign —
    // fine, it is an opaque 64-bit fingerprint.
    (0 until 64).map(i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
  }

  /** The b-th 16-bit band of a 64-bit simhash (b in 0..3) — the LSH
    * bucketing key for hamming-distance candidates. */
  def simHashBand(h: Column, b: Int): Column =
    shiftright(h, b * 16).bitwiseAND(0xffffL)

  /** Candidate pairs sharing at least one 16-bit band, verified by
    * hamming distance (bit_count of XOR) ≤ maxHamming. The band join is
    * an equi-join on (band index, band value) after a 4× explode. */
  def simHashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val hashed = docs.select(col("id"), simHash64(col("text")).as("sh"))
    val banded = hashed.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), simHashBand(col("sh"), b).as("bv"))): _*)).as("bk"))
    val a = banded.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bk"))
    val b = banded.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bk"))
    a.join(b, "bk")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct() // a pair can match in >1 band
      .where(col("hamming") <= maxHamming)
  }
}
