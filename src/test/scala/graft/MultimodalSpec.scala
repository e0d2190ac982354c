package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    Multimodal.withPayload(rows.toDF("doc_id", "text"))
  }

  test("payload metadata: bytes, fake dims") {
    val m = media((1L, "a" * 100))
    val r = m.select("meta.n_bytes", "meta.width", "meta.height").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((100, 32, 4)))
  }

  test("frame sampling slices payload into every-2nd 8-byte frame") {
    val text = "0123456789abcdefghijklmnopqrstuv0123" // 36 bytes -> 4 frames
    val frames = Multimodal.frameSample(media((7L, text)), frameSize = 8,
        every = 2)
      .orderBy("frame_no").collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    val f0 = new String(frames(0).getAs[Array[Byte]]("frame_bytes"), "UTF-8")
    val f2 = new String(frames(1).getAs[Array[Byte]]("frame_bytes"), "UTF-8")
    assert(f0 == "01234567" && f2 == "ghijklmn")
  }

  test("short payload produces no frames") {
    assert(Multimodal.frameSample(media((1L, "tiny")), frameSize = 64).count() == 0)
  }

  test("decode features: mean/min/max/histogram over payload bytes") {
    val r = Multimodal.decodeFeatures(media((1L, "ab"))).head()
    // 'a'=97, 'b'=98 -> mean 97.5, both in histogram bin 6 (96..111)
    assert(r.getAs[Double]("mean_byte") == 97.5)
    assert(r.getAs[Int]("min_byte") == 97 && r.getAs[Int]("max_byte") == 98)
    assert(r.getAs[Seq[Long]]("hist16")(6) == 2L)
  }

  test("resize: nearest-neighbor picks expected source pixels") {
    // 64 bytes = 2 rows of 32; resize to 2x2 samples rows {0,1} cols {0,16}
    val text = ("A" * 16 + "B" * 16) + ("C" * 16 + "D" * 16)
    val r = Multimodal.resize(media((1L, text)), 2, 2).head()
    val px = new String(r.getAs[Array[Byte]]("payload"), "UTF-8")
    assert(px == "ABCD")
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") == 2 && meta.getAs[Int]("height") == 2)
  }

  test("real PNG decode: encodePng → decodeFeatures recovers exact pixels") {
    val s = spark
    import s.implicits._
    // 4×2 grayscale gradient; PNG is lossless so features are exact
    val px = Array[Byte](0, 32, 64, 96, (128 - 256).toByte,
      (160 - 256).toByte, (192 - 256).toByte, (255 - 256).toByte)
    val png = Multimodal.encodePng(4, 2, px)
    assert(png.take(4).sameElements(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val m = Seq((9L, png)).toDF("media_id", "payload")
    val r = Multimodal.decodeFeatures(m).head()
    // REAL dims from the PNG header, not the fake 32-wide fallback
    assert(r.getAs[Int]("width") == 4 && r.getAs[Int]("height") == 2)
    assert(r.getAs[Int]("min_byte") == 0 && r.getAs[Int]("max_byte") == 255)
    assert(r.getAs[Double]("mean_byte") == px.map(_ & 0xff).sum / 8.0)
    // resize through the real decode path too: 2x1 samples (0,0),(0,2)
    val rz = Multimodal.resize(m, 2, 1).head()
    val out = rz.getAs[Array[Byte]]("payload")
    assert(out.toSeq == Seq[Byte](0, 64))
  }

  test("non-image payloads still take the deterministic fallback") {
    val s = spark
    import s.implicits._
    // 'BM' magic but unparseable -> ImageIO returns null -> stub path
    val junk = ("BM" + "x" * 62).getBytes("UTF-8")
    val r = Multimodal.decodeFeatures(
      Seq((1L, junk)).toDF("media_id", "payload")).head()
    assert(r.getAs[Int]("width") == 32 && r.getAs[Int]("height") == 2)
  }

  test("WAV codec: encode→decode identity, junk-chunk skipping, loud " +
      "rejection of non-PCM") {
    val samples = Array.tabulate(1000)(i =>
      ((i * 7919 % 65536) - 32768).toShort)
    val (r1, s1) = Multimodal.decodeWav(Multimodal.encodeWav(44100, samples))
    assert(r1 == 44100 && s1.sameElements(samples))
    // empty stream round-trips
    val (r2, s2) = Multimodal.decodeWav(
      Multimodal.encodeWav(8000, Array.empty[Short]))
    assert(r2 == 8000 && s2.isEmpty)
    // an unknown odd-sized chunk before fmt/data is skipped with its
    // pad byte (the RIFF rule real files exercise via LIST/INFO)
    val base = Multimodal.encodeWav(16000, samples.take(4))
    val junk = java.nio.ByteBuffer.allocate(base.length + 14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put(base, 0, 12) // RIFF....WAVE
    junk.put("LIST".getBytes("US-ASCII")); junk.putInt(5)
    junk.put(Array[Byte](1, 2, 3, 4, 5, 0)) // 5 bytes + pad
    junk.put(base, 12, base.length - 12)
    val (r3, s3) = Multimodal.decodeWav(junk.array())
    assert(r3 == 16000 && s3.sameElements(samples.take(4)))
    // no stub fallback in the audio plane: garbage fails loudly
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("not audio at all".getBytes)
    }
    // a truncated chunk BODY is a descriptive data error, not a raw
    // BufferUnderflowException: declare fmt sz=16 with only 10 bytes
    val trunc = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    trunc.put("RIFF".getBytes("US-ASCII")); trunc.putInt(22)
    trunc.put("WAVE".getBytes("US-ASCII"))
    trunc.put("fmt ".getBytes("US-ASCII")); trunc.putInt(16)
    trunc.put(Array.fill[Byte](10)(0))
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeWav(java.util.Arrays.copyOf(trunc.array(), 30))
    }
    assert(e.getMessage.contains("exceeds remaining"))
    // and a corrupt huge declared size fails the same way, BEFORE any
    // allocation (no OOM-sized array)
    val huge = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    huge.put("RIFF".getBytes("US-ASCII")); huge.putInt(12)
    huge.put("WAVE".getBytes("US-ASCII"))
    huge.put("data".getBytes("US-ASCII")); huge.putInt(Int.MaxValue - 8)
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.decodeWav(huge.array())
    }
    assert(e2.getMessage.contains("exceeds remaining"))
  }

  test("decode hardening: null payload stubs, bomb dims rejected " +
      "before decode, non-positive frame sizes loud") {
    val s = spark
    import s.implicits._
    // null payload row flows through the stub, not an NPE that would
    // abort a 100 TB job on one bad cell
    val media = Seq((1L, Option("abc".getBytes)),
      (2L, Option.empty[Array[Byte]])).toDF("media_id", "payload")
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap // media_id -> height
    assert(feats(2L) == 0) // empty stub grid
    // a tiny payload DECLARING a giant pixel grid must fall back to
    // the stub instead of attempting a multi-GB decode: real PNG
    // header with width=height=50000 (2.5 G pixels), CRC-correct IHDR
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(50000); ihdr.putInt(50000)
    ihdr.put(8.toByte); ihdr.put(0.toByte) // bit depth, grayscale
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    val crc = new java.util.zip.CRC32()
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdr.array())
    val bomb = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13 + 4)
    bomb.put(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte))
    bomb.putInt(13); bomb.put("IHDR".getBytes("US-ASCII"))
    bomb.put(ihdr.array()); bomb.putInt(crc.getValue.toInt)
    val (w, h, px) = Multimodal.decode(bomb.array())
    // stub dims, not 50000x50000, and no giant allocation happened
    assert(w == Multimodal.FakeImageWidth && px.length == bomb.array().length)
    assert(h == (px.length + w - 1) / w)
    // while a REAL small image still decodes through the codec
    val png = Multimodal.encodePng(3, 2, Array[Byte](1, 2, 3, 4, 5, 6))
    val (w2, h2, px2) = Multimodal.decode(png)
    assert((w2, h2) == ((3, 2)) && px2.sameElements(
      Array[Byte](1, 2, 3, 4, 5, 6)))
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(media, frameSize = 0)
    }
  }

  test("audioFeatures: exact integer aggregates through the real codec") {
    val s = spark
    import s.implicits._
    val media = Seq(
      (1L, Multimodal.encodeWav(16000, Array[Short](-3, 0, 5, 5))),
      (2L, Multimodal.encodeWav(8000, Array.empty[Short])))
      .toDF("media_id", "payload")
    val got = Multimodal.audioFeatures(media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) == ((16000L, 4L, -3L, 5L, 7L, 59L)))
    assert(got(2L) == ((8000L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("embedding near-dup finds the duplicated vector pair") {
    val s = spark
    import s.implicits._
    val em = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.999, 0.01, 0.0)), // near dup of 1
      (3L, Seq(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val pairs = graft.llm.Dedup.embeddingNearDup(em, threshold = 0.95,
        idCol = "vec_id", vecCol = "embedding")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
