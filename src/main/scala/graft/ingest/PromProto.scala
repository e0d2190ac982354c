package graft.ingest

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire codec for the Prometheus remote-write 1.0
  * payload (public schema, prometheus/prompb/remote.proto +
  * types.proto):
  *
  *   WriteRequest { repeated TimeSeries timeseries = 1; }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  *   Label        { string name = 1; string value = 2; }
  *   Sample       { double value = 1; int64 timestamp = 2; }  // ms epoch
  *
  * Hand-rolled because no protobuf-java is on the classpath — the wire
  * format is just varints + length-delimited frames, ~100 lines. The
  * reference decodes the same payload with the generated prompb classes
  * (gnocchi/rest/prometheus/remote_pb2.py, used at rest/api.py:2319-2371).
  * Unknown fields are skipped, so newer remote-write senders
  * (exemplars, metadata fields) still parse.
  */
object PromProto {

  final case class Series(labels: Map[String, String],
                          samples: Seq[(Long, Double)])

  // ------------------------------------------------------------- read

  private final class Reader(buf: Array[Byte], var pos: Int, val until: Int) {
    def hasNext: Boolean = pos < until

    def readVarint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        // bound to THIS message's window — a truncated varint must
        // fail, not silently consume the parent message's bytes
        require(pos < until, "truncated varint")
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "varint too long")
      }
      out // unreachable
    }

    def readTag(): (Int, Int) = {
      val v = readVarint()
      ((v >>> 3).toInt, (v & 7).toInt)
    }

    def readFixed64(): Long = {
      require(pos + 8 <= until, "truncated fixed64")
      var out = 0L
      var i = 0
      while (i < 8) { out |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      out
    }

    /** Length-delimited field: returns a sub-reader over its bytes. */
    def readSub(): Reader = {
      // compare in Long: a corrupt length near 2^31 would overflow
      // `pos + len` negative and sneak PAST this bound (ending in a
      // raw ArrayIndexOutOfBounds or a wrapped cursor instead of this
      // descriptive failure)
      val len = readVarint()
      require(len >= 0 && pos.toLong + len <= until, s"bad length $len")
      val r = new Reader(buf, pos, pos + len.toInt)
      pos += len.toInt
      r
    }

    def readString(): String = {
      val r = readSub()
      new String(buf, r.pos, r.until - r.pos, "UTF-8")
    }

    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => require(pos + 8 <= until, "truncated fixed64"); pos += 8
      case 2 =>
        // a corrupt length whose .toInt goes negative would move pos
        // BACKWARDS and the parse loop would never terminate — bound
        // it, comparing in Long (a length near 2^31 would overflow an
        // Int `pos + len` past the bound)
        val len = readVarint()
        require(len >= 0 && pos.toLong + len <= until,
          s"corrupt length-delimited field: len=$len at $pos")
        pos += len.toInt
      case 5 => require(pos + 4 <= until, "truncated fixed32"); pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  /** Parse an UNCOMPRESSED WriteRequest. */
  def parseWriteRequest(bytes: Array[Byte]): Seq[Series] = {
    val out = Seq.newBuilder[Series]
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasNext) r.readTag() match {
      case (1, 2) => out += parseTimeSeries(r.readSub())
      case (_, w) => r.skip(w)
    }
    out.result()
  }

  private def parseTimeSeries(r: Reader): Series = {
    val labels = Map.newBuilder[String, String]
    val samples = Seq.newBuilder[(Long, Double)]
    while (r.hasNext) r.readTag() match {
      case (1, 2) =>
        val lr = r.readSub()
        var name = ""; var value = ""
        while (lr.hasNext) lr.readTag() match {
          case (1, 2) => name = lr.readString()
          case (2, 2) => value = lr.readString()
          case (_, w) => lr.skip(w)
        }
        labels += name -> value
      case (2, 2) =>
        val sr = r.readSub()
        var v = 0.0; var ts = 0L
        while (sr.hasNext) sr.readTag() match {
          case (1, 1) => v = java.lang.Double.longBitsToDouble(sr.readFixed64())
          case (2, 0) => ts = sr.readVarint()
          case (_, w) => sr.skip(w)
        }
        samples += ((ts, v))
      case (_, w) => r.skip(w)
    }
    Series(labels.result(), samples.result())
  }

  // ------------------------------------------------------------ write

  private def writeVarint(o: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }

  private def writeTag(o: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(o, (field.toLong << 3) | wire)

  private def writeBytes(o: ByteArrayOutputStream, field: Int,
                         b: Array[Byte]): Unit = {
    writeTag(o, field, 2); writeVarint(o, b.length.toLong); o.write(b, 0, b.length)
  }

  /** Serialize a WriteRequest (for tests and as a sender facade). */
  def encodeWriteRequest(series: Seq[Series]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    for (s <- series) {
      val ts = new ByteArrayOutputStream()
      for ((n, v) <- s.labels) {
        val l = new ByteArrayOutputStream()
        writeBytes(l, 1, n.getBytes("UTF-8"))
        writeBytes(l, 2, v.getBytes("UTF-8"))
        writeBytes(ts, 1, l.toByteArray)
      }
      for ((t, v) <- s.samples) {
        val sm = new ByteArrayOutputStream()
        writeTag(sm, 1, 1)
        val bits = java.lang.Double.doubleToLongBits(v)
        var i = 0
        while (i < 8) { sm.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
        writeTag(sm, 2, 0); writeVarint(sm, t)
        writeBytes(ts, 2, sm.toByteArray)
      }
      writeBytes(o, 1, ts.toByteArray)
    }
    o.toByteArray
  }
}
