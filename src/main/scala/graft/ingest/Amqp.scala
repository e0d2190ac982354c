package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal AMQP 1.0 bare-message codec (OASIS AMQP 1.0 spec, parts
  * 1.6 "type encodings" and 3.2 "message format") — enough to carry the
  * collectd payload the reference's amqp1d daemon consumes
  * (gnocchi/amqp1d.py:60-160 reads `message.body` via python-proton and
  * feeds the JSON to the collectd handler). No AMQP library exists on
  * this classpath, so — like [[PromProto]] for protobuf — the encoding
  * layer is hand-rolled from the public spec: described types
  * (constructor 0x00 + ulong descriptor), the standard message sections
  * (header 0x70 … footer 0x78), and the primitive format codes a proton
  * sender actually emits. Unknown sections and primitive types are
  * skipped/tolerated so richer senders still parse.
  *
  * Scope: the BARE MESSAGE only (sections concatenated back-to-back as
  * they sit inside a transfer frame payload). Connection/session/link
  * framing (part 2) is transport negotiation with no data semantics —
  * deliberately out of scope, as rest/api.py's HTTP layer is for I1.
  */
object Amqp {

  /** Decoded bare message: body as UTF-8 text (data section bytes or an
    * amqp-value string), plus the two property maps a consumer keys on.
    */
  final case class Message(body: String,
                           contentType: Option[String] = None,
                           subject: Option[String] = None,
                           appProperties: Map[String, String] = Map.empty)

  // ------------------------------------------------------------- read

  private final class Reader(buf: Array[Byte], var pos: Int, val until: Int) {
    def hasNext: Boolean = pos < until
    def u8(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def u32(): Long = {
      var out = 0L; var i = 0
      while (i < 4) { out = (out << 8) | (buf(pos + i) & 0xffL); i += 1 }
      pos += 4; out
    }
    def u64(): Long = {
      var out = 0L; var i = 0
      while (i < 8) { out = (out << 8) | (buf(pos + i) & 0xffL); i += 1 }
      pos += 8; out
    }
    def bytes(n: Int): Array[Byte] = {
      // compare in Long: a corrupt vbin32/str32 length near 2^31
      // would overflow `pos + n` negative and sneak past this bound
      require(n >= 0 && pos.toLong + n <= until, s"bad length $n")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
  }

  /** One AMQP primitive/described value, mapped to plain JVM types:
    * described → (descriptor, value) tuple; list → Vector; map → Map;
    * str/sym → String; vbin → Array[Byte]; numbers → Long/Double.
    */
  private def readValue(r: Reader): Any = {
    val code = r.u8()
    code match {
      case 0x00 => // described type: descriptor value, then the value
        val descriptor = readValue(r)
        val value = readValue(r)
        (descriptor, value)
      case 0x40 => null // null
      case 0x41 => true
      case 0x42 => false
      case 0x56 => r.u8() != 0 // boolean
      case 0x43 | 0x44 => 0L // uint0 / ulong0
      case 0x50 => r.u8().toLong // ubyte
      case 0x51 => r.u8().toByte.toLong // byte (signed)
      case 0x52 | 0x53 => r.u8().toLong // smalluint / smallulong
      case 0x54 | 0x55 => r.u8().toByte.toLong // smallint / smalllong
      case 0x60 => ((r.u8() << 8) | r.u8()).toLong // ushort
      case 0x61 => ((r.u8() << 8) | r.u8()).toShort.toLong // short (signed)
      case 0x70 => r.u32() // uint
      case 0x71 => r.u32().toInt.toLong // int (signed)
      case 0x72 => java.lang.Float.intBitsToFloat(r.u32().toInt).toDouble
      case 0x80 | 0x81 | 0x83 => r.u64() // ulong / long / timestamp(ms)
      case 0x82 => java.lang.Double.longBitsToDouble(r.u64())
      case 0x98 => new String(r.bytes(16), UTF_8) // uuid (opaque here)
      case 0xa0 => r.bytes(r.u8()) // vbin8
      case 0xb0 => r.bytes(r.u32().toInt) // vbin32
      case 0xa1 | 0xa3 => new String(r.bytes(r.u8()), UTF_8) // str8/sym8
      case 0xb1 | 0xb3 => new String(r.bytes(r.u32().toInt), UTF_8)
      case 0x45 => Vector.empty // list0
      case 0xc0 => readList(r, r.u8(), r.u8(), countWidth = 1)
      case 0xd0 => readList(r, r.u32().toInt, r.u32().toInt, countWidth = 4)
      case 0xc1 => readMap(r, r.u8(), r.u8())
      case 0xd1 => readMap(r, r.u32().toInt, r.u32().toInt)
      case 0xe0 => readArray(r, r.u8(), r.u8())
      case 0xf0 => readArray(r, r.u32().toInt, r.u32().toInt)
      case c => throw new IllegalArgumentException(
        f"unsupported AMQP format code 0x$c%02x")
    }
  }

  // size field includes the count field's own width (spec 1.6.18)
  private def readList(r: Reader, size: Int, count: Int,
                       countWidth: Int): Vector[Any] = {
    val end = r.pos + size - countWidth
    val out = Vector.newBuilder[Any]
    var i = 0
    while (i < count) { out += readValue(r); i += 1 }
    require(r.pos == end, "list size mismatch")
    out.result()
  }

  private def readMap(r: Reader, size: Int, count: Int): Map[Any, Any] = {
    require(count % 2 == 0, "map count must be even")
    val out = Map.newBuilder[Any, Any]
    var i = 0
    while (i < count) { val k = readValue(r); out += k -> readValue(r); i += 2 }
    out.result()
  }

  private def readArray(r: Reader, size: Int, count: Int): Vector[Any] = {
    // monomorphic array: ONE constructor, then `count` payloads.
    // Only the string/symbol widths a proton sender uses are handled.
    val code = r.u8()
    val out = Vector.newBuilder[Any]
    var i = 0
    while (i < count) {
      out += (code match {
        case 0xa1 | 0xa3 => new String(r.bytes(r.u8()), UTF_8)
        case 0xb1 | 0xb3 => new String(r.bytes(r.u32().toInt), UTF_8)
        case 0x82 => java.lang.Double.longBitsToDouble(r.u64())
        case 0x81 | 0x80 => r.u64()
        case c => throw new IllegalArgumentException(
          f"unsupported array element code 0x$c%02x")
      })
      i += 1
    }
    out.result()
  }

  /** Parse a bare message: the concatenation of described sections.
    * Body: `data` bytes UTF-8-decoded, or an `amqp-value` string;
    * multiple data sections concatenate (spec 3.2.6).
    */
  def parseMessage(bytes: Array[Byte]): Message = {
    val r = new Reader(bytes, 0, bytes.length)
    var body = new StringBuilder
    var contentType: Option[String] = None
    var subject: Option[String] = None
    var appProps = Map.empty[String, String]
    // proton emits numeric descriptors; the spec also allows the symbol
    // aliases (e.g. "amqp:data:binary") — normalize those to the codes
    val symCodes = Map(
      "amqp:header:list" -> 0x70L, "amqp:delivery-annotations:map" -> 0x71L,
      "amqp:message-annotations:map" -> 0x72L, "amqp:properties:list" -> 0x73L,
      "amqp:application-properties:map" -> 0x74L, "amqp:data:binary" -> 0x75L,
      "amqp:amqp-sequence:list" -> 0x76L, "amqp:amqp-value:*" -> 0x77L,
      "amqp:footer:map" -> 0x78L)
    while (r.hasNext) {
      readValue(r) match {
        case (d0, v) => (d0 match {
          case n: Long => n
          case s: String => symCodes.getOrElse(s, -1L)
          case _ => -1L
        }) match {
          case 0x75 => // data
            body ++= new String(v.asInstanceOf[Array[Byte]], UTF_8)
          case 0x77 => // amqp-value
            v match {
              case s: String => body ++= s
              case b: Array[Byte] => body ++= new String(b, UTF_8)
              case other => throw new IllegalArgumentException(
                s"unsupported amqp-value body: $other")
            }
          case 0x73 => // properties list: subject @4, content-type @7
            val l = v.asInstanceOf[Vector[Any]]
            subject = l.lift(3).collect { case s: String => s }
            contentType = l.lift(6).collect { case s: String => s }
          case 0x74 => // application-properties
            appProps = v.asInstanceOf[Map[Any, Any]].collect {
              case (k: String, pv) => k -> String.valueOf(pv)
            }
          case _ => () // header/annotations/sequence/footer: no data here
        }
        case other => throw new IllegalArgumentException(
          s"bare message must be described sections, got: $other")
      }
    }
    Message(body.result(), contentType, subject, appProps)
  }

  /** Read ONE value starting at `from`, returning it with the end
    * position — the AMQP frame layer ([[AmqpWire]]) needs to know
    * where a performative ends and the message payload begins.
    */
  private[ingest] def readOneValue(buf: Array[Byte], from: Int,
                                   until: Int): (Any, Int) = {
    val r = new Reader(buf, from, until)
    val v = readValue(r)
    (v, r.pos)
  }

  // ------------------------------------------------------------ write

  private[ingest] def sym(o: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    if (b.length <= 0xff) { o.write(0xa3); o.write(b.length) }
    else { o.write(0xb3); writeU32(o, b.length) }
    o.write(b, 0, b.length)
  }

  private[ingest] def str(o: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    if (b.length <= 0xff) { o.write(0xa1); o.write(b.length) }
    else { o.write(0xb1); writeU32(o, b.length) }
    o.write(b, 0, b.length)
  }

  private[ingest] def writeU32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }

  private[ingest] def descriptor(o: ByteArrayOutputStream, code: Int): Unit = {
    o.write(0x00); o.write(0x53); o.write(code) // 0x00 smallulong <code>
  }

  /** 32-bit-width compound (list32/map32) from pre-encoded elements —
    * writers always use the wide form; readers accept both.
    */
  private[ingest] def compound(o: ByteArrayOutputStream, formatCode: Int,
                       count: Int, payload: Array[Byte]): Unit = {
    o.write(formatCode)
    writeU32(o, payload.length + 4) // size includes the count field
    writeU32(o, count)
    o.write(payload, 0, payload.length)
  }

  /** Encode a bare message: properties (subject + content-type),
    * optional application-properties, and the body as ONE data section.
    */
  def encodeMessage(body: Array[Byte],
                    contentType: String = "application/json",
                    subject: Option[String] = None,
                    appProperties: Map[String, String] = Map.empty)
  : Array[Byte] = {
    val o = new ByteArrayOutputStream()
    // properties: 7-element list [message-id,user-id,to,subject,
    // reply-to,correlation-id,content-type]
    descriptor(o, 0x73)
    val pl = new ByteArrayOutputStream()
    pl.write(0x40); pl.write(0x40); pl.write(0x40) // id, user-id, to
    subject match { case Some(s) => str(pl, s); case None => pl.write(0x40) }
    pl.write(0x40); pl.write(0x40) // reply-to, correlation-id
    sym(pl, contentType)
    compound(o, 0xd0, 7, pl.toByteArray)
    if (appProperties.nonEmpty) {
      descriptor(o, 0x74)
      val mp = new ByteArrayOutputStream()
      for ((k, v) <- appProperties) { str(mp, k); str(mp, v) }
      compound(o, 0xd1, appProperties.size * 2, mp.toByteArray)
    }
    descriptor(o, 0x75) // data
    o.write(0xb0); writeU32(o, body.length); o.write(body, 0, body.length)
    o.toByteArray
  }
}
