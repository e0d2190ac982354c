package graft

import org.scalatest.funsuite.AnyFunSuite

/** Malformed-wire fuzz for every hand-rolled byte decoder: random and
  * structurally corrupt payloads must fail with a clean exception (or
  * parse to something) — never hang, never walk backwards, never
  * allocate unbounded, never surface a raw index error where a
  * descriptive require exists. These decoders sit on untrusted wire
  * input (remote-write bodies, migration objects, audio payloads), so
  * the fuzz is deterministic-seeded and runs every build.
  */
class WireFuzzSpec extends AnyFunSuite {

  private def cleanly(what: String)(f: => Any): Unit =
    try { f; () } catch {
      case scala.util.control.NonFatal(_) => ()
      // an Error (StackOverflow, OOM, AIOOBE is an Exception so it
      // lands above — allowed but the targeted tests below pin the
      // descriptive paths) must fail the fuzz loudly
    }

  test("random bytes through every byte decoder: terminate cleanly") {
    val rnd = new scala.util.Random(20260816L)
    for (i <- 0 until 1000) {
      val b = new Array[Byte](rnd.nextInt(96))
      rnd.nextBytes(b)
      cleanly("prom")(graft.ingest.PromProto.parseWriteRequest(b))
      cleanly("amqp")(graft.ingest.Amqp.parseMessage(b))
      cleanly("carb-raw")(graft.sources.Carbonara.decodeBound(b))
      cleanly("carb-agg")(graft.sources.Carbonara.decodeAgg(b, 0.0, 60.0))
      cleanly("wav")(graft.llm.Multimodal.decodeWav(b))
      cleanly("img")(graft.llm.Multimodal.decode(b))
    }
  }

  test("bit-flipped VALID payloads terminate cleanly in every decoder") {
    val rnd = new scala.util.Random(987654321L)
    val prom = graft.ingest.PromProto.encodeWriteRequest(Seq(
      graft.ingest.PromProto.Series(Map("__name__" -> "cpu", "job" -> "x"),
        Seq((1700000000000L, 1.5), (1700000001000L, 2.5)))))
    val raw = graft.sources.Carbonara.encodeBound(
      Array(1000000000L, 2000000000L, 3000000000L), Array(1.0, 2.0, 3.0))
    val agg = graft.sources.Carbonara.encodeAggCompressed(
      Array(0L, 60_000_000_000L), Array(1.0, 2.0), 0.0, 60.0)
    val amqp = graft.ingest.Amqp.encodeMessage(
      "collectd".getBytes("UTF-8"), subject = Some("telemetry"))
    val wav = graft.llm.Multimodal.encodeWav(8000, Array[Short](1, -2, 3))
    for (_ <- 0 until 500) {
      def flipped(src: Array[Byte]): Array[Byte] = {
        val c = src.clone()
        for (_ <- 0 to rnd.nextInt(3))
          c(rnd.nextInt(c.length)) = (rnd.nextInt(256) - 128).toByte
        c
      }
      cleanly("prom")(graft.ingest.PromProto.parseWriteRequest(flipped(prom)))
      cleanly("amqp")(graft.ingest.Amqp.parseMessage(flipped(amqp)))
      cleanly("carb-raw")(graft.sources.Carbonara.decodeBound(flipped(raw)))
      cleanly("carb-agg")(
        graft.sources.Carbonara.decodeAgg(flipped(agg), 0.0, 60.0))
      cleanly("wav")(graft.llm.Multimodal.decodeWav(flipped(wav)))
    }
  }

  test("a declared protobuf length near 2^31 fails DESCRIPTIVELY (the " +
      "Int `pos + len` would overflow past the bound, ending in a raw " +
      "index error or a wrapped cursor)") {
    // field 1 wire 2, then varint 2^31 - 1 as the length, no payload
    val huge = Array[Byte](0x0a,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x07)
    val e = intercept[IllegalArgumentException](
      graft.ingest.PromProto.parseWriteRequest(huge))
    assert(e.getMessage.contains("bad length"), e.getMessage)
    // same shape through the skip path: field 99 (unknown) wire 2
    val hugeSkip = Array[Byte]((99 << 3 | 2).toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x07)
    val e2 = intercept[IllegalArgumentException](
      graft.ingest.PromProto.parseWriteRequest(hugeSkip))
    assert(e2.getMessage.contains("corrupt length-delimited"), e2.getMessage)
  }

  test("an lz4 header claiming multi-GB from a small block fails before " +
      "allocation; a truncated chunk size in WAV fails before the read") {
    val tiny = graft.sources.Carbonara.lz4Compress(Array[Byte](1, 2, 3))
    val lying = tiny.clone()
    // overwrite the u32le uncompressed-length header with ~2 GB
    lying(0) = 0xff.toByte; lying(1) = 0xff.toByte
    lying(2) = 0xff.toByte; lying(3) = 0x7f
    val e = intercept[IllegalArgumentException](
      graft.sources.Carbonara.lz4Decompress(lying))
    assert(e.getMessage.contains("maximum ratio"), e.getMessage)
    val wav = graft.llm.Multimodal.encodeWav(8000, Array[Short](1, 2, 3))
    val truncated = java.util.Arrays.copyOf(wav, wav.length - 2)
    val e2 = intercept[IllegalArgumentException](
      graft.llm.Multimodal.decodeWav(truncated))
    assert(e2.getMessage.contains("exceeds remaining"), e2.getMessage)
  }
}
