package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads + a typed metadata struct, processed per-partition in
  * batches (the Spark-side plumbing a real decoder plugs into).
  *
  * The actual media decode is STUBBED (this container has no codec
  * libraries): `decodeStub` produces a deterministic fake feature vector
  * from the payload bytes. Everything around it — schema contract,
  * partition-batch iteration, feature column shape — is real and tested,
  * so swapping the stub for a JNI/ONNX decoder changes one function.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Wrap a text table as fake media rows: payload = UTF-8 bytes.
    * Stands in for `spark.read.format("binaryFile")` over an object
    * store, which yields the same (path, length, content) shape.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(col(textCol)).cast("long").as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  val FeatureDim = 8

  /** STUB decoder: a real implementation would decode the image/audio
    * payload and run feature extraction here, batch-at-a-time per
    * partition. The fake is deterministic — mean/spread stats over byte
    * windows — so tests and oracles are stable.
    */
  private def fakeFeatures(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (payload == null || payload.isEmpty) return out
    val window = math.max(1, payload.length / FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      var sum = 0L; var n = 0
      var j = i * window
      while (j < math.min(payload.length, (i + 1) * window)) { sum += payload(j) & 0xff; n += 1; j += 1 }
      out(i) = if (n == 0) 0f else sum.toFloat / n
      i += 1
    }
    out
  }

  /** Per-partition batched "decode": binary payload → feature vector.
    * mapPartitions (not per-row map) so a real decoder can amortize
    * model/codec init across the whole batch — the same shape
    * mapInPandas gives Python decoders.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields :+ StructField("features", ArrayType(FloatType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // real decoder init would happen once per partition, here
      rows.map { r =>
        val feats = fakeFeatures(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** STUB resize: a real implementation would decode, spatially resample
    * to the target resolution, and re-encode; the deterministic fake
    * stride-samples every ⌈len/target⌉-th byte so the output is ≤target
    * bytes and starts at byte 0. Same mapPartitions batch shape as
    * decodeFeatures (codec init amortizes per partition).
    */
  def resize(media: DataFrame, targetBytes: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields :+ StructField("resized", BinaryType))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val resized =
          if (p == null || p.isEmpty) Array.emptyByteArray
          else {
            val stride = math.max(1, (p.length + targetBytes - 1) / targetBytes)
            val out = new Array[Byte]((p.length + stride - 1) / stride)
            var i = 0
            while (i < out.length) { out(i) = p(i * stride); i += 1 }
            out
          }
        Row.fromSeq(r.toSeq :+ resized)
      }
    }(enc)
  }

  /** Deterministic frame-sampling stub: pick every `stride`-th byte
    * window as a "frame" (real impl: video frame extraction). Returns
    * exploded (media_id, frame_no, frame_bytes).
    */
  def sampleFrames(media: DataFrame, stride: Int = 64, maxFrames: Int = 8): DataFrame = {
    // integral floor-div: sequence() rejects fractional bounds
    val lastWindow = greatest(expr(s"(length(payload) - 1) div $stride"), lit(0))
    media.select(
      col("media_id"),
      posexplode(
        slice(
          transform(
            sequence(lit(0), lastWindow.cast("int")),
            i => col("payload").substr(i * stride + 1, lit(stride))),
          1, maxFrames)).as(Seq("frame_no", "frame_bytes")))
  }
}
