package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import graft.ingest.{Amqp, RemoteWrite}

class AmqpSpec extends SparkSpec {

  test("bare-message round trip: properties + app-properties + data body") {
    val body = """[{"host":"h1","plugin":"cpu","values":[1.5]}]"""
    val enc = Amqp.encodeMessage(body.getBytes(UTF_8),
      contentType = "application/json", subject = Some("collectd"),
      appProperties = Map("sender" -> "amqp1d-test"))
    val m = Amqp.parseMessage(enc)
    assert(m.body == body)
    assert(m.contentType.contains("application/json"))
    assert(m.subject.contains("collectd"))
    assert(m.appProperties == Map("sender" -> "amqp1d-test"))
  }

  test("reader accepts the narrow proton-style encodings the writer skips") {
    // hand-built message: properties as list8 with sym8 content-type,
    // app-properties as map8, body as amqp-value str8 — the compact
    // forms a real proton sender emits for small messages
    val o = new ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(o.write)
    def s8(s: String): Unit = {
      val x = s.getBytes(UTF_8); b(0xa1, x.length); o.write(x, 0, x.length)
    }
    // properties: descriptor 0x73, list8 [null,null,null,"subj",null,
    // null,sym8 "text/plain"]
    b(0x00, 0x53, 0x73)
    val pl = {
      val t = new ByteArrayOutputStream()
      t.write(0x40); t.write(0x40); t.write(0x40)
      t.write(0xa1); t.write(4); t.write("subj".getBytes(UTF_8))
      t.write(0x40); t.write(0x40)
      t.write(0xa3); t.write(10); t.write("text/plain".getBytes(UTF_8))
      t.toByteArray
    }
    b(0xc0, pl.length + 1, 7); o.write(pl, 0, pl.length)
    // application-properties: map8 {"k": smallint 7}
    b(0x00, 0x53, 0x74)
    val mp = {
      val t = new ByteArrayOutputStream()
      t.write(0xa1); t.write(1); t.write('k'); t.write(0x54); t.write(7)
      t.toByteArray
    }
    b(0xc1, mp.length + 1, 2); o.write(mp, 0, mp.length)
    // body: amqp-value str8
    b(0x00, 0x53, 0x77); s8("payload")

    val m = Amqp.parseMessage(o.toByteArray)
    assert(m.body == "payload")
    assert(m.subject.contains("subj"))
    assert(m.contentType.contains("text/plain"))
    assert(m.appProperties == Map("k" -> "7"))
    // symbol descriptor alias form also resolves
    val o2 = new ByteArrayOutputStream()
    o2.write(0x00); o2.write(0xa3); o2.write(16)
    o2.write("amqp:data:binary".getBytes(UTF_8), 0, 16)
    o2.write(0xa0); o2.write(2); o2.write('h'); o2.write('i')
    assert(Amqp.parseMessage(o2.toByteArray).body == "hi")
  }

  test("signed fixed-width ints sign-extend; unsigned stay unsigned") {
    // app-properties map with every fixed-width int code carrying -1
    // (signed codes) or all-ones (unsigned codes): byte 0x51, short
    // 0x61, int 0x71 must decode to -1; ubyte 0x50, ushort 0x60, uint
    // 0x70 must decode to 255 / 65535 / 4294967295.
    val o = new ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(o.write)
    b(0x00, 0x53, 0x74) // application-properties descriptor
    val mp = {
      val t = new ByteArrayOutputStream()
      def key(k: String): Unit = {
        t.write(0xa1); t.write(k.length)
        t.write(k.getBytes(UTF_8), 0, k.length)
      }
      key("b");  t.write(0x51); t.write(0xff)
      key("s");  t.write(0x61); t.write(0xff); t.write(0xff)
      key("i");  t.write(0x71); (0 until 4).foreach(_ => t.write(0xff))
      key("ub"); t.write(0x50); t.write(0xff)
      key("us"); t.write(0x60); t.write(0xff); t.write(0xff)
      key("ui"); t.write(0x70); (0 until 4).foreach(_ => t.write(0xff))
      t.toByteArray
    }
    b(0xc1, mp.length + 1, 12); o.write(mp, 0, mp.length)
    b(0x00, 0x53, 0x77); b(0xa1, 1, 'x') // amqp-value body
    val m = Amqp.parseMessage(o.toByteArray)
    assert(m.appProperties("b") == "-1")
    assert(m.appProperties("s") == "-1")
    assert(m.appProperties("i") == "-1")
    assert(m.appProperties("ub") == "255")
    assert(m.appProperties("us") == "65535")
    assert(m.appProperties("ui") == "4294967295")
  }

  test("multiple data sections concatenate; unknown sections are skipped") {
    val o = new ByteArrayOutputStream()
    // header section (0x70, list0) — no data semantics, must be skipped
    o.write(0x00); o.write(0x53); o.write(0x70); o.write(0x45)
    def data(s: String): Unit = {
      o.write(0x00); o.write(0x53); o.write(0x75)
      val x = s.getBytes(UTF_8); o.write(0xa0); o.write(x.length)
      o.write(x, 0, x.length)
    }
    data("ab"); data("cd")
    assert(Amqp.parseMessage(o.toByteArray).body == "abcd")
  }

  test("amqp1d end-to-end: collectd JSON over the real wire codec") {
    val s = spark
    import s.implicits._
    val json =
      """[{"host":"web1","plugin":"cpu","plugin_instance":"0",
        |"type":"percent","type_instance":"idle","time":1700000000.0,
        |"dsnames":["value"],"values":[93.5]},
        |{"host":"web1","plugin":"df","plugin_instance":"",
        |"type":"df_complex","type_instance":"free","time":1700000000.0,
        |"dsnames":["value"],"values":[1.25e10]},
        |{"host":"web1","plugin":"load","plugin_instance":"",
        |"type":"load","type_instance":"","time":1700000000.0,
        |"dsnames":["shortterm","midterm","longterm"],
        |"values":[0.5,0.4,0.3]}]""".stripMargin
    val msgs = Seq(Amqp.encodeMessage(json.getBytes(UTF_8))).toDF("msg")
    val out = RemoteWrite.amqpToMeasures(msgs)
      .orderBy("metric").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3))).toSeq
    // names per amqp1d.py _serialize_identifier: plugin[-pi]@type[-ti]
    // with a -dsname suffix ONLY for multi-dsname messages
    assert(out == Seq(
      ("web1", "cpu-0@percent-idle", 93.5),
      ("web1", "df@df_complex-free", 1.25e10),
      ("web1", "load@load-longterm", 0.3),
      ("web1", "load@load-midterm", 0.4),
      ("web1", "load@load-shortterm", 0.5)))
  }
}
