package graft

import org.apache.spark.sql.functions._
import graft.ingest.{LineProtocol, Statsd}

class ProtocolSpec extends SparkSpec {

  private def lines(ls: String*) = {
    val s = spark
    import s.implicits._
    ls.toDF("line")
  }

  test("influx: tags sorted, resource tag extracted, fields fan out") {
    val parsed = LineProtocol.parse(lines(
      "cpu,zone=us,host=web1 user=3.5,sys=1.5i 1700000000000000000"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("ts_ns"), r.getDouble(3))).toSet
    assert(parsed == Set(
      ("web1", "cpu.user@zone=us", 1700000000000000000L, 3.5),
      ("web1", "cpu.sys@zone=us", 1700000000000000000L, 1.5)))
  }

  test("influx: escaped separators, booleans, strings skipped, no ts") {
    val parsed = LineProtocol.parse(lines(
      """disk\ io,host=a\,b ok=t,label="x y",v=2 """)).collect()
    val byMetric = parsed.map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(byMetric == Map("disk io.ok" -> 1.0, "disk io.v" -> 2.0))
    assert(parsed.forall(_.getString(0) == "a,b"))
    assert(parsed.forall(_.isNullAt(2)))
  }

  test("influx: malformed lines and comments dropped") {
    assert(LineProtocol.parse(lines("# comment", "", "junk")).count() == 0)
  }

  test("influx: escaped quotes inside string field values don't break " +
      "the split; malformed statsd values drop, not abort") {
    // the \" inside the quoted string must not toggle quote state —
    // the numeric field and timestamp after it survive
    val parsed = LineProtocol.parse(lines(
      "cpu,host=a msg=\"say \\\"hi\\\" x\",v=3 100")).collect()
    assert(parsed.map(r => r.getString(1) -> r.getDouble(3)).toMap
      == Map("cpu.v" -> 3.0))
    assert(parsed.forall(_.getLong(2) == 100L))
    // statsd: "1.2.3" is not a double — the line drops instead of
    // reaching an ANSI cast that aborts the batch
    val s = spark
    import s.implicits._
    val bad = Seq(("b:1.2.3|c", 1L), ("ok:2|c", 2L), ("e:1e3|c", 3L))
      .toDF("line", "seq")
    val out = Statsd.flush(Statsd.parse(bad)).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("counter")).toMap
    assert(out == Map("ok" -> 2.0, "e" -> 1000.0))
    // prometheus: a corrupt negative length-delimited skip must error,
    // not hang the parse loop
    intercept[IllegalArgumentException](
      graft.ingest.PromProto.parseWriteRequest(
        Array(0x1A, 0xFA, 0xFF, 0xFF, 0xFF, 0x0F).map(_.toByte)))
  }

  test("statsd: counter sampling, gauge last-write, timer distribution") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("hits:1|c|@0.5", 1L), ("hits:2|c", 2L),
      ("temp:10|g", 3L), ("temp:12|g", 4L),
      ("lat:100|ms", 5L), ("lat:300|ms", 6L))
      .toDF("line", "seq")
    val out = Statsd.flush(Statsd.parse(df)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("hits", "c")).getAs[Double]("counter") == 4.0) // 1/0.5 + 2
    assert(out(("temp", "g")).getAs[Double]("gauge") == 12.0)
    val lat = out(("lat", "ms"))
    assert(lat.getAs[Long]("n") == 2 && lat.getAs[Double]("mean") == 200.0
      && lat.getAs[Double]("lower") == 100.0
      && lat.getAs[Double]("upper") == 300.0)
  }

  test("json measures: ISO and epoch timestamps, single + batch forms " +
      "(rest/api.py:455-468,1855-1860)") {
    val s = spark
    import s.implicits._
    val single = Seq(
      ("m1", """[{"timestamp": "2014-01-01T12:00:01", "value": 8.0},
                 {"timestamp": "1388577662.5", "value": 9.0}]"""))
      .toDF("metric_id", "body")
    val got = graft.ingest.JsonMeasures.parse(single)
      .orderBy("timestamp")
      .collect().map(r => (r.getTimestamp(1).toString, r.getDouble(2))).toSeq
    assert(got == Seq(
      ("2014-01-01 12:00:01.0", 8.0),
      ("2014-01-01 12:01:02.5", 9.0))) // epoch 1388577662.5 UTC
    val batch = Seq(
      ("""{"m1": [{"timestamp": "2014-01-01T12:00:00", "value": 1.0}],
          "m2": [{"timestamp": "2014-01-01T12:00:00", "value": 2.0},
                 {"timestamp": "2014-01-01T12:01:00", "value": 3.0}]}"""))
      .toDF("body")
    val counts = graft.ingest.JsonMeasures.parseBatch(batch)
      .groupBy("metric_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("m1" -> 1L, "m2" -> 2L))

    // relative timespans (utils.py:103-109 pytimeparse fallback):
    // "-5 minutes" lands 300 s before now, multi-segment "2h32m" adds
    // up, and the whole batch shares ONE now (current_timestamp is
    // query-constant)
    val before = System.currentTimeMillis()
    val rel = graft.ingest.JsonMeasures.parse(Seq(
      ("m1", """[{"timestamp": "-5 minutes", "value": 1.0},
                 {"timestamp": "-2h32m", "value": 2.0}]"""))
      .toDF("metric_id", "body"))
      .orderBy(org.apache.spark.sql.functions.desc("timestamp"))
      .collect().map(_.getTimestamp(1).getTime)
    val after = System.currentTimeMillis()
    assert(rel(0) >= before - 300_000 && rel(0) <= after - 300_000 + 1000)
    assert(math.abs((rel(0) - rel(1)) - (9120_000L - 300_000L)) < 5,
      s"relative spacing off: ${rel.toSeq}")
    // malformed stamps DROP as single bad rows — skip-and-count corpus
    // semantics (r14: the old fall-through to ANSI to_timestamp made
    // ONE poison row abort the whole batch; so did a regex-legal
    // overflow epoch like 1e300 via the bare long cast). The strict
    // 400 contract lives at the REST door (RestApi.parseMeasureList).
    val poisoned = graft.ingest.JsonMeasures.parse(Seq(
      ("m1", """[{"timestamp": "5 lightyears", "value": 1.0},
                 {"timestamp": "1e300", "value": 2.0},
                 {"timestamp": "999999999999999999999999s", "value": 3.0},
                 {"timestamp": "2014-01-01T12:00:00", "value": 4.0}]"""))
      .toDF("metric_id", "body")).collect()
    assert(poisoned.length == 1 && poisoned.head.getDouble(2) == 4.0,
      s"poison rows must drop, good rows survive: ${poisoned.toSeq}")
  }

  private def newGraft() = new graft.api.Graft(spark,
    java.nio.file.Files.createTempDirectory("graft-proto").toString)

  private def await(what: String)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + 15_000_000_000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cond, s"timed out waiting for $what")
  }

  test("statsd UDP daemon: datagram -> buffered lines -> flush -> " +
      "store read (statsd.py:32-130 end to end over a real socket)") {
    val g = newGraft()
    g.createPolicy(graft.model.ArchivePolicy("st", 0,
      Seq(graft.model.ArchivePolicyItem(
        graft.model.Granularity.seconds(60), None, None)),
      Set("mean", "sum")))
    val server = new graft.ingest.StatsdServer(g, policyName = Some("st"))
    val port = server.serve(0)
    try {
      val sock = new java.net.DatagramSocket()
      def send(text: String): Unit = {
        val b = text.getBytes("UTF-8")
        sock.send(new java.net.DatagramPacket(b, b.length,
          java.net.InetAddress.getLoopbackAddress, port))
      }
      // two datagrams: counter accumulates with sampling, gauge
      // last-write-wins, timer keeps last
      send("hits:2|c|@0.5\nhits:1|c\ntemp:20|g")
      send("temp:25|g\nlat:7|ms\nlat:9|ms")
      await("6 buffered lines")(server.pendingLines == 6)
      server.flush()
      assert(server.pendingLines == 0)
      g.process() // drain the 202-staged measures into the store
      def lastValue(name: String): Double =
        g.getMeasures(name, "mean").last._3
      assert(lastValue("hits|c") === 5.0)  // 2/0.5 + 1
      assert(lastValue("temp|g") === 25.0) // last write
      assert(lastValue("lat|ms") === 9.0)  // last write
      // a second flush with nothing buffered is a no-op
      server.flush()
    } finally server.stop()
  }

  test("statsd flush failure contract: a held store lock is LOUD, " +
      "nothing is lost, and the next flush drains everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft-proto-lock").toString
    val g = new graft.api.Graft(spark, dir)
    g.createPolicy(graft.model.ArchivePolicy("st", 0,
      Seq(graft.model.ArchivePolicyItem(
        graft.model.Granularity.seconds(60), None, None)),
      Set("mean")))
    val server = new graft.ingest.StatsdServer(g, policyName = Some("st"))
    val port = server.serve(0)
    try {
      val sock = new java.net.DatagramSocket()
      val b = "temp:20|g".getBytes("UTF-8")
      sock.send(new java.net.DatagramPacket(b, b.length,
        java.net.InetAddress.getLoopbackAddress, port))
      await("1 buffered line")(server.pendingLines == 1)
      // a LIVE concurrent writer holds the metric's SACK lock
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val lock = new org.apache.hadoop.fs.Path(s"$dir/st/.lock.sack." +
        graft.ingest.MetricStore.sackOfId("temp|g"))
      fs.mkdirs(lock.getParent)
      fs.create(lock, false).close()
      // landing fails loudly (the flush LOOP catches+logs+backs off;
      // direct callers see the error) — staging kept the measure.
      // no wait: the contract under test is the failure, not the queue
      spark.conf.set("spark.graft.ingest.lockWaitMs", "0")
      try intercept[IllegalStateException](server.flush())
      finally spark.conf.unset("spark.graft.ingest.lockWaitMs")
      assert(server.pendingLines == 0, "line buffer drained into staging")
      assert(g.status().getOrElse("temp|g", 0L) === 1L,
        "failed landing lost the staged measure")
      fs.delete(lock, false)
      // next flush (nothing newly buffered) drains the retained staging
      server.flush()
      assert(g.status().isEmpty)
      assert(g.getMeasures("temp|g", "mean").map(_._3) === Seq(20.0))
    } finally server.stop()
  }

  test("statsd stamps flushed measures with RECEIPT time, not flush " +
      "time (statsd.py treat_metric utcnow at receipt)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-proto-ts").toString
    val g = new graft.api.Graft(spark, dir)
    g.createPolicy(graft.model.ArchivePolicy("st1s", 0,
      Seq(graft.model.ArchivePolicyItem(
        graft.model.Granularity.seconds(1), None, None)),
      Set("mean")))
    val server = new graft.ingest.StatsdServer(g, policyName = Some("st1s"))
    val port = server.serve(0)
    try {
      val sock = new java.net.DatagramSocket()
      val b = "temp:42|g".getBytes("UTF-8")
      sock.send(new java.net.DatagramPacket(b, b.length,
        java.net.InetAddress.getLoopbackAddress, port))
      await("1 buffered line")(server.pendingLines == 1)
      val recvMs = System.currentTimeMillis()
      Thread.sleep(2500) // flush-time stamping would land 2.5 s later
      server.flush()
      val bucketMs = g.getMeasures("temp|g", "mean").last._1.getTime
      assert(math.abs(bucketMs - recvMs) < 1500,
        s"flushed bucket $bucketMs is not the receipt second (~$recvMs)")
    } finally server.stop()
  }

  test("serveAll runs http + statsd + amqp under one lifecycle and " +
      "stop() flushes the daemons' buffers before closing") {
    val g = newGraft()
    g.createPolicy(graft.model.ArchivePolicy("svc", 0,
      Seq(graft.model.ArchivePolicyItem(
        graft.model.Granularity.seconds(60), None, None)),
      Set("mean")))
    val server = new graft.rest.RestServer(
      new graft.rest.RestApi(g))
    val (hp, sp, ap) = server.serveAll(g, 0, 0, 0,
      flushDelayS = None, policyName = Some("svc"))
    try {
      assert(hp > 0 && sp > 0 && ap > 0)
      // http door answers
      val conn = java.net.URI.create(s"http://127.0.0.1:$hp/v1/status")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode === 200)
      // statsd door receives
      val sock = new java.net.DatagramSocket()
      val b = "svc.load:3.5|g".getBytes("UTF-8")
      sock.send(new java.net.DatagramPacket(b, b.length,
        java.net.InetAddress.getLoopbackAddress, sp))
      await("datagram buffered")(
        server.statsdDaemon.exists(_.pendingLines == 1))
    } finally server.stop() // flushes the buffered gauge
    g.process()
    assert(g.getMeasures("svc.load|g", "mean").map(_._3) === Seq(3.5))
  }

  test("amqp1d TCP daemon: AMQP 1.0 handshake + transfer over a real " +
      "socket -> collectd mapping -> store read (amqp1d.py:60-160)") {
    import graft.ingest.AmqpWire._
    val g = newGraft()
    g.createPolicy(graft.model.ArchivePolicy("am", 0,
      Seq(graft.model.ArchivePolicyItem(
        graft.model.Granularity.seconds(60), None, None)),
      Set("mean", "sum")))
    val server = new graft.ingest.AmqpServer(g, policyName = Some("am"))
    val port = server.serve(0)
    try {
      val sock = new java.net.Socket(
        java.net.InetAddress.getLoopbackAddress, port)
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      val in = new java.io.DataInputStream(sock.getInputStream)
      out.write(ProtocolHeader); out.flush()
      val echoed = new Array[Byte](8)
      in.readFully(echoed)
      assert(echoed.sameElements(ProtocolHeader))
      // open -> open reply
      out.write(frame(Open, 1, elems(o => str(o, "spec-client")))); out.flush()
      assert(readFrame(in).get._1 === Open)
      // begin -> begin reply
      out.write(frame(Begin, 4, elems { o =>
        nul(o); uint(o, 0); uint(o, 1000); uint(o, 1000)
      })); out.flush()
      assert(readFrame(in).get._1 === Begin)
      // attach (sender role=false) -> attach reply + flow credit
      out.write(frame(Attach, 3, elems { o =>
        str(o, "collectd"); uint(o, 0); bool(o, v = false)
      })); out.flush()
      assert(readFrame(in).get._1 === Attach)
      val flow = readFrame(in).get
      assert(flow._1 === Flow)
      assert(flow._2(6).asInstanceOf[Long] > 0) // link credit granted
      // one transfer carrying a collectd JSON bare message through the
      // real wire codec
      val json =
        """[{"host":"web1","plugin":"cpu","plugin_instance":"",""" +
        """"type":"idle","type_instance":"","time":1388577600.0,""" +
        """"dsnames":["value"],"values":[42.0]},""" +
        """{"host":"web1","plugin":"mem","plugin_instance":"",""" +
        """"type":"used","type_instance":"","time":1388577660.0,""" +
        """"dsnames":["value"],"values":[7.5]}]"""
      val msg = graft.ingest.Amqp.encodeMessage(json.getBytes("UTF-8"),
        subject = Some("telemetry"))
      out.write(frame(Transfer, 2, elems { o => uint(o, 0); uint(o, 0) },
        payload = msg))
      out.flush()
      await("1 buffered body")(server.pendingBodies == 1)
      // close -> close reply
      out.write(frame(Close, 0, Array.emptyByteArray)); out.flush()
      assert(readFrame(in).get._1 === Close)
      sock.close()
      server.flush()
      g.process()
      assert(g.getMeasures("web1/cpu@idle", "mean").map(_._3) === Seq(42.0))
      assert(g.getMeasures("web1/mem@used", "mean").map(_._3) === Seq(7.5))
    } finally server.stop()
  }

  test("facade staging survives concurrent writers — the serveAll " +
      "daemon race: no lost appends, atomic create-if-absent") {
    val s = spark
    import s.implicits._
    val g = newGraft()
    g.createPolicy(graft.model.ArchivePolicy("mt", 0,
      Seq(graft.model.ArchivePolicyItem(
        graft.model.Granularity.seconds(60), None, None)),
      Set("mean")))
    g.createMetric("seed", "mt")
    val raced = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.CopyOnWriteArrayList[Throwable]()
    val threads =
      // 4 writers on the Seq door (the statsd flush path)
      (1 to 4).map { i => new Thread(() => {
        (1 to 50).foreach { j =>
          g.addMeasures("seed",
            Seq((f"2014-01-01 12:${i}%02d:${j % 60}%02d", 1.0)))
        }
      }, s"race-seq-$i") } ++
      // 2 writers on the bulk DataFrame door (the amqp flush path)
      (1 to 2).map { i => new Thread(() => {
        (1 to 4).foreach { _ =>
          g.batchAddMeasures(Seq(
            ("bulk", java.sql.Timestamp.valueOf(s"2014-01-01 13:0$i:00"), 1.0),
            ("bulk", java.sql.Timestamp.valueOf(s"2014-01-01 13:0$i:01"), 2.0),
            ("bulk", java.sql.Timestamp.valueOf(s"2014-01-01 13:0$i:02"), 3.0))
            .toDF("metric_id", "timestamp", "value"))
        }
      }, s"race-bulk-$i") } ++
      // 2 creators racing the SAME metric id: exactly one must win
      (1 to 2).map { _ => new Thread(() => {
        try g.createMetric("contested", "mt")
        catch { case _: graft.api.GraftError.Conflict => raced.incrementAndGet() }
      }) }
    threads.foreach { t =>
      t.setUncaughtExceptionHandler((_, e) => errors.add(e)); t.start()
    }
    threads.foreach(_.join(30000))
    assert(errors.isEmpty, s"writer threads failed: $errors")
    val st = g.status()
    assert(st("seed") === 200L, "seq-door appends lost in the race")
    assert(st("bulk") === 24L, "bulk-door unions lost in the race")
    assert(raced.get === 1, "putIfAbsent must let exactly one creator win")
    assert(g.hasMetric("contested"))
  }
}
