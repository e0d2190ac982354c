package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * treated as opaque `binary` payload columns with a typed metadata
  * struct, per the north-star spec (no reference citation — greenfield
  * beyond gnocchi's surface).
  *
  * Design for 100 TB: everything that can be a Catalyst expression is
  * one (payload slicing, frame enumeration, checksums — codegen'd, no
  * shuffle); only the codec boundary uses typed `mapPartitions`, the
  * Scala analogue of `mapInPandas` — per-partition batch iteration with
  * reusable buffers, so a real decoder (libjpeg/ffmpeg via JNI) drops
  * in without changing the plumbing, schema, or partitioning.
  *
  * DECODE IS A STUB: this container has no image/audio codec libraries,
  * so `decodeStub` deterministically fakes a grayscale frame from the
  * payload bytes (payload = pixels, fixed-width rows). The Spark-side
  * shape — binary in, struct of features out, partition-batched — is
  * real and tested.
  */
object Multimodal {

  val DefaultFrameSize = 64
  val FakeImageWidth = 32

  case class MediaFeatures(media_id: Long, width: Int, height: Int,
                           mean_byte: Double, min_byte: Int, max_byte: Int,
                           hist16: Seq[Long])
  case class MediaMeta(kind: String, n_bytes: Int, width: Int, height: Int)
  case class Media(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  /** Attach a deterministic binary payload + typed metadata to a
    * document table (UTF-8 bytes of the text stand in for an encoded
    * media stream — reproducible in any engine via `encode`).
    */
  def withPayload(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  kind: String = "image"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        lit(kind).as("kind"),
        octet_length(col("payload")).as("n_bytes"),
        lit(FakeImageWidth).as("width"),
        ceil(octet_length(col("payload")) / lit(FakeImageWidth.toDouble))
          .cast("int").as("height")))

  /** Video-style frame sampling: slice the payload into fixed-size
    * frames and keep every `every`-th one. Pure Catalyst (sequence +
    * explode + substring on binary) — codegen'd, shuffle-free, and the
    * frame bytes are never materialized wider than one frame.
    */
  def frameSample(media: DataFrame, frameSize: Int = DefaultFrameSize,
                  every: Int = 2): DataFrame = {
    val nf = (octet_length(col("payload")) / frameSize).cast("long")
    media
      .withColumn("frame_no",
        explode(when(nf > 0, sequence(lit(0L), nf - 1, lit(every.toLong)))
          .otherwise(array().cast("array<long>"))))
      .select(col("media_id"), col("frame_no"),
        substring(col("payload"),
          (col("frame_no") * frameSize + 1).cast("int"), lit(frameSize))
          .as("frame_bytes"))
      .withColumn("frame_md5", md5(col("frame_bytes")))
  }

  /** THE CODEC BOUNDARY — deterministic fake in this container.
    * A real build would decode `bytes` with an image library here
    * (e.g. TwelveMonkeys/javacv); everything downstream only sees the
    * returned pixel grid, so swapping the implementation is local.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val width = FakeImageWidth
    val height = (bytes.length + width - 1) / width
    (width, height, bytes) // payload bytes ARE the grayscale pixels
  }

  /** Decode + feature-extract (mean/min/max intensity, 16-bin
    * histogram) via typed `mapPartitions`: one decoded image in flight
    * per task, histogram buffer reused across rows — constant memory
    * per partition regardless of corpus size.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val hist = new Array[Long](16)
        it.map { case (id, payload) =>
          val (w, h, px) = decodeStub(payload)
          java.util.Arrays.fill(hist, 0L)
          var sum = 0L; var mn = 255; var mx = 0; var i = 0
          while (i < px.length) {
            val v = px(i) & 0xff
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            hist(v >> 4) += 1; i += 1
          }
          val mean = if (px.length == 0) 0.0 else sum.toDouble / px.length
          MediaFeatures(id, w, h, mean,
            if (px.length == 0) 0 else mn, if (px.length == 0) 0 else mx,
            hist.clone().toSeq)
        }
      }
      .toDF()
  }

  /** Nearest-neighbor resize on the decoded pixel grid, re-encoded as a
    * payload column with updated metadata. Same typed-`mapPartitions`
    * batch shape as [[decodeFeatures]] — a real implementation swaps
    * the pixel math for a codec call, nothing else moves.
    */
  def resize(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, px) = decodeStub(bytes)
          val buf = new Array[Byte](outW * outH)
          var y = 0
          while (y < outH) {
            val sy = if (outH == 1) 0 else y * h / outH
            var x = 0
            while (x < outW) {
              val sx = if (outW == 1) 0 else x * w / outW
              val idx = sy * w + sx
              buf(y * outW + x) = if (idx < px.length) px(idx) else 0
              x += 1
            }
            y += 1
          }
          Media(id, buf, MediaMeta("image", outW * outH, outW, outH))
        }
      }
      .toDF()
  }
}
