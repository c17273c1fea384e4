package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.table

/** Multimodal-column plumbing: media as opaque BINARY payloads + typed
  * metadata, with decode/feature-extract/frame-sample passes.
  *
  * The Spark-side machinery here is real and tested — schema (binary +
  * metadata struct), partition-wise batch processing, deterministic
  * feature shapes. The actual codec call is a clearly-marked STUB (this
  * container has no image/audio libraries): `decodeStub` derives a
  * deterministic fake "decoded frame" from the payload bytes. In
  * production the stub body is the only thing that changes (JNI/FFI into
  * libjpeg/ffmpeg), not the pipeline shape. mapPartitions is the JVM
  * analog of Python's mapInPandas: per-partition batch iteration with
  * reusable buffers, no per-row setup cost.
  */
object Multimodal {

  /** Typed media record: payload + metadata the pipeline carries around. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String,
                         width: Int, height: Int)

  /** Extracted features: byte-histogram "embedding" + sampled "frames". */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, mime: String,
                           hist: Array[Double], frames: Array[Long],
                           thumb_w: Int, thumb_h: Int)

  /** Media table synthesized deterministically from documents: the text's
    * UTF-8 bytes stand in for an encoded image. Metadata (mime, dims) is
    * derived arithmetic — SQL-expressible, so this layer is oracle-checked.
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      octet_length(col("text")).as("n_bytes"),
      when(octet_length(col("text")) % 3 === 0, "image/png")
        .when(octet_length(col("text")) % 3 === 1, "image/jpeg")
        .otherwise("video/mp4").as("mime"),
      (lit(64) + octet_length(col("text")) % 512).as("width"),
      (lit(64) + (octet_length(col("text")) * 7) % 512).as("height"))

  /** Oracle-checked projection of the metadata layer (no binary column —
    * the payload is exercised by multimodalFeatures and the spec).
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    mediaMeta(s, dir).drop("payload")

  /** STUB decode: a real implementation would hand `payload` to an image/
    * video codec here. The fake is deterministic in the bytes so tests and
    * rows-only checks are stable.
    */
  // format: off
  private def decodeStub(payload: Array[Byte]): (Array[Double], Array[Long]) = {
    // ??? <- real codec call goes here (libjpeg/ffmpeg via FFI); stubbed:
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1; i += 1 }
    val n = math.max(payload.length, 1)
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    // "frame sampling": first/quarter/mid/three-quarter/last byte offsets
    val frames = Array(0, n / 4, n / 2, 3 * n / 4, n - 1)
      .map(o => (payload(math.min(o, payload.length - 1)) & 0xff).toLong)
    (hist, frames)
  }
  // format: on

  /** Feature extraction over the binary column — partition-wise batch
    * processing through the typed Dataset API. Array-typed output for the
    * spec (histogram normalization etc. assert on the raw values).
    */
  def multimodalFeaturesRaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaMeta(s, dir)
      .select(col("doc_id"), col("payload"), col("mime"), col("width"),
        col("height"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (hist, frames) = decodeStub(r.payload)
          // "resize": clamp the fake dims to a thumbnail box, ratio kept
          val scale = math.min(1.0, 128.0 / math.max(r.width, r.height))
          MediaFeatures(r.doc_id, r.payload.length, r.mime, hist, frames,
            math.max(1, (r.width * scale).toInt),
            math.max(1, (r.height * scale).toInt))
        }
      }
      .toDF()
  }

  /** Driver-facing features query (rows-only check; the stub histogram has
    * no SQL equivalent worth writing). Arrays are canonicalized to joined
    * strings — the driver's oracle harness can't sort/hash ARRAY outputs,
    * so the scalar encoding is what makes the row/schema check possible.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    multimodalFeaturesRaw(s, dir).select(
      col("doc_id"), col("n_bytes"), col("mime"),
      array_join(transform(col("hist"),
        x => x.cast("decimal(10,4)").cast("string")), ",").as("hist"),
      array_join(transform(col("frames"), _.cast("string")), ",")
        .as("frames"),
      col("thumb_w"), col("thumb_h"))
}
