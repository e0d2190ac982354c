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
  * DECODE IS REAL for images the JDK ships codecs for (PNG/BMP/GIF/
  * JPEG via `javax.imageio`, gated by the mm5 round-trip) and for
  * RIFF/WAVE PCM16 audio (hand-rolled chunk-walking codec, gated by
  * the mm6 round-trip). Image payloads with no known magic or a
  * format this JDK lacks fall back to `decodeStub`, which
  * deterministically fakes a grayscale frame from the payload bytes
  * (payload = pixels, fixed-width rows); the audio plane has no stub —
  * bad payloads fail loudly. Video decode remains out of scope (no
  * codec in the container); frame SAMPLING over opaque payloads is
  * mm2.
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
    // a non-positive size would silently yield zero frames (null
    // division → empty array branch) — caller typos must be loud
    require(frameSize > 0 && every > 0,
      s"frameSize and every must be positive, got ($frameSize, $every)")
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

  /** Deterministic fallback for payloads no JDK codec can read:
    * payload bytes ARE the grayscale pixels, fixed-width rows. Keeps
    * the text-payload fixtures (mm1–mm4) engine-reproducible.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val width = FakeImageWidth
    val height = (bytes.length + width - 1) / width
    (width, height, bytes)
  }

  // magic prefixes for the formats every stock JDK decodes
  private val ImageMagic: Seq[Array[Byte]] = Seq(
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
    Array(0xff.toByte, 0xd8.toByte), // JPEG
    Array('B'.toByte, 'M'.toByte), // BMP
    Array('G'.toByte, 'I'.toByte, 'F'.toByte))

  private def looksLikeImage(b: Array[Byte]): Boolean =
    ImageMagic.exists(m => b.length >= m.length &&
      m.indices.forall(i => b(i) == m(i)))

  /** THE CODEC BOUNDARY — real `javax.imageio` decode for PNG/BMP/GIF/
    * JPEG payloads (magic-sniffed first so text payloads never pay a
    * parse attempt), grayscale-converted; anything unreadable falls
    * back to [[decodeStub]]. Everything downstream only sees the
    * returned pixel grid, so richer codecs (TwelveMonkeys, javacv)
    * drop in here without moving anything else.
    */
  // JVM-global, set ONCE — not per decoded row on the hot path
  javax.imageio.ImageIO.setUseCache(false)

  /** Decompression-bomb cap: a few-KB payload can DECLARE a huge pixel
    * grid (40000×40000 ≈ 1.6 G pixels) and the full decode would then
    * OOM the executor — an Error, not the Exception the stub fallback
    * catches. Reader-reported dimensions are checked against this cap
    * BEFORE decoding; 64 M pixels = 64 MB grayscale, comfortably inside
    * a task's memory at any corpus scale.
    */
  private val MaxDecodePixels = 64L * 1024 * 1024

  /** Reader-declared (width, height) without decoding pixel data. */
  private def declaredDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
        catch { case _: Exception => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  private[graft] def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    // a null cell in a 100 TB corpus must not abort the job: it is
    // "unreadable", so it takes the documented stub fallback
    if (bytes == null) return decodeStub(Array.emptyByteArray)
    val inBounds = looksLikeImage(bytes) &&
      (try declaredDims(bytes).exists { case (w, h) =>
          w.toLong * h <= MaxDecodePixels }
       catch { case _: Exception => false })
    if (inBounds) {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img != null) {
        val w = img.getWidth; val h = img.getHeight
        val gray =
          if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
          else {
            val g = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val gr = g.createGraphics()
            gr.drawImage(img, 0, 0, null); gr.dispose(); g
          }
        val px = new Array[Byte](w * h)
        gray.getRaster.getDataElements(0, 0, w, h, px)
        return (w, h, px)
      }
    }
    decodeStub(bytes)
  }

  /** Encode a grayscale pixel grid as PNG through the same JDK codec —
    * the fixture generator for the mm5 round-trip gate (PNG grayscale
    * is lossless, so decode(encodePng(px)) == px exactly).
    */
  def encodePng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode + feature-extract (mean/min/max intensity, 16-bin
    * histogram) via typed `mapPartitions`: one decoded image in flight
    * per task, histogram buffer reused across rows — constant memory
    * per partition regardless of corpus size.
    */
  /** The one typed codec-boundary projection every decode entry point
    * shares — a fix to id/payload handling lands once, not three times.
    */
  private def mediaRows(media: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
  }

  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    mediaRows(media)
      .mapPartitions { it =>
        val hist = new Array[Long](16)
        it.map { case (id, payload) =>
          val (w, h, px) = decode(payload)
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

  case class AudioFeatures(media_id: Long, sample_rate: Long,
                           n_samples: Long, min_s: Long, max_s: Long,
                           sum_s: Long, sum_sq: Long)

  /** RIFF/WAVE PCM16-mono encoder — the fixture generator for the mm6
    * audio round-trip gate (PCM is uncompressed, so
    * `decodeWav(encodeWav(r, s)) == (r, s)` exactly). Layout per the
    * public RIFF spec: `RIFF<size>WAVE`, a 16-byte `fmt ` chunk
    * (format 1 = PCM, 1 channel, 16-bit little-endian), one `data`
    * chunk.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** RIFF/WAVE PCM16-mono decoder: walks the chunk list (unknown
    * chunks are skipped with odd-size padding, per spec), reads the
    * sample rate from `fmt ` and the samples from `data`. Rejects
    * non-RIFF payloads and non-PCM16-mono streams loudly — the audio
    * plane has no stub fallback, a bad payload is a data error.
    */
  private[graft] def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 12 && tag() == "RIFF", "not a RIFF payload")
    bb.getInt() // declared size; trust the buffer bound instead
    require(tag() == "WAVE", "not a WAVE stream")
    var rate = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && (rate < 0 || samples == null)) {
      val id = tag(); val sz = bb.getInt()
      // a corrupt negative/short size would move position BACKWARDS and
      // the chunk walk would never terminate — fail loudly instead
      require(sz >= 0, s"corrupt chunk size $sz in '$id'")
      // validate against the buffer BEFORE any read or allocation: a
      // truncated chunk body must be a descriptive data error, not a
      // raw BufferUnderflowException, and a corrupt multi-GB declared
      // size must not trigger an OOM-sized allocation
      require(sz <= bb.remaining(),
        s"chunk '$id' size $sz exceeds remaining ${bb.remaining()} bytes")
      // next chunk starts after the data + the RIFF odd-size pad byte —
      // for EVERY chunk kind (a per-arm skip would misalign the walk on
      // odd-sized fmt/data chunks); pad clamped for files that omit the
      // final pad at EOF
      val next = math.min(bb.position() + sz + (sz & 1), bb.limit())
      id match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too short: $sz")
          val fmt = bb.getShort(); val ch = bb.getShort()
          require(fmt == 1 && ch == 1, s"need PCM mono: fmt=$fmt ch=$ch")
          rate = bb.getInt()
          bb.getInt(); bb.getShort() // byte rate, block align
          val bits = bb.getShort()
          require(bits == 16, s"need 16-bit samples: $bits")
        case "data" =>
          val n = sz / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort(); i += 1 }
        case _ => ()
      }
      bb.position(next)
    }
    require(rate > 0 && samples != null, "missing fmt or data chunk")
    (rate, samples)
  }

  /** Decode + feature-extract over an audio payload column through the
    * real WAV codec: exact integer aggregates (count/min/max/sum/sum of
    * squares) per stream — everything downstream (duration, RMS,
    * normalization) derives from these without float drift. Same typed
    * `mapPartitions` codec boundary as [[decodeFeatures]].
    */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    mediaRows(media)
      .mapPartitions(_.map { case (id, payload) =>
        // the audio plane has no stub fallback (bad payload = data
        // error) but the error must name the row, not surface as an
        // anonymous NPE from inside the codec
        require(payload != null, s"null audio payload for media_id=$id")
        val (rate, s) = decodeWav(payload)
        var mn = Long.MaxValue; var mx = Long.MinValue
        var sum = 0L; var sq = 0L; var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          if (v < mn) mn = v; if (v > mx) mx = v
          sum += v; sq += v * v; i += 1
        }
        AudioFeatures(id, rate.toLong, s.length.toLong,
          if (s.isEmpty) 0L else mn, if (s.isEmpty) 0L else mx, sum, sq)
      })
      .toDF()
  }

  /** Nearest-neighbor resize on the decoded pixel grid, re-encoded as a
    * payload column with updated metadata. Same typed-`mapPartitions`
    * batch shape as [[decodeFeatures]] — a real implementation swaps
    * the pixel math for a codec call, nothing else moves.
    */
  def resize(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    // same loud-failure rule as frameSample: a non-positive target
    // would raise a raw NegativeArraySizeException mid-task (or emit
    // silent zero-pixel grids for outW=0) — caller typos must fail at
    // plan build, naming the arguments
    require(outW > 0 && outH > 0,
      s"resize target must be positive, got (${outW}x$outH)")
    val spark = media.sparkSession
    import spark.implicits._
    mediaRows(media)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, px) = decode(bytes)
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
