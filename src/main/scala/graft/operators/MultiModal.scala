package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque BINARY columns with a typed metadata struct; decode /
  * feature-extract / frame-sample are per-row functions over the bytes.
  *
  * The actual codecs (JPEG/PNG/audio) are STUBBED — this container has
  * no image/audio libraries — behind [[decodeStub]]: a deterministic
  * fake that "decodes" bytes into a 16-bin byte histogram. Everything
  * around the stub is the real Spark plumbing the brief asks for:
  * binary column + metadata schema, per-row batch-shaped UDFs, and
  * partition-parallel execution (no shuffle, no state — at 100 TB these
  * run inside the scan stage exactly like the ImageGeometry family).
  */
object MultiModal {

  /** Wrap a text column as a fake media payload: UTF-8 bytes + typed
    * metadata (the schema a real ingest would carry: media kind, byte
    * length, fake width/height derived deterministically). */
  def asMedia(df: DataFrame, textCol: String): DataFrame = {
    val bytes = col(textCol).cast("binary")
    df.withColumn("payload", bytes)
      .withColumn("meta", struct(
        lit("fake/raw").as("mime"),
        length(bytes).as("n_bytes"),
        (length(bytes) % 64 + 1).as("width"),
        (length(bytes) % 48 + 1).as("height")))
  }

  /** STUB decoder: a real implementation would parse the codec here
    * (???-equivalent); the deterministic fake is a 16-bin histogram of
    * byte values so tests/oracles can pin the plumbing end-to-end. */
  val decodeStub = udf((payload: Array[Byte]) => {
    val hist = new Array[Int](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1; i += 1 }
    hist.toSeq
  })

  /** STUB frame sampler: every k-th byte stands in for every k-th video
    * frame — the slice/stride plumbing is what is being exercised. */
  val frameSampleStub = udf((payload: Array[Byte], k: Int) => {
    val n = (payload.length + k - 1) / k
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = payload(i * k); i += 1 }
    out
  })

  /** "Feature extraction" over the decoded histogram: normalized bins. */
  def histNormalized(hist: Column, nBytes: Column): Column =
    transform(hist, b => b.cast("double") / nBytes)
}
