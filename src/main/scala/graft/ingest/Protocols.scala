package graft.ingest

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{DatagramPacket, DatagramSocket, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.functions._
import graft.api.Graft

/** Socket front-ends for the wire codecs — the listening daemons the
  * reference runs as separate services (`gnocchi-statsd`,
  * `gnocchi-amqp1d`), re-expressed as thin accept/receive loops that
  * buffer driver-side (exactly as the reference's in-memory dicts do)
  * and flush through the SAME oracle-gated codec paths
  * ([[Statsd.parse]]/[[Statsd.flush]],
  * [[RemoteWrite.collectdToMeasures]]) into the [[Graft]] facade.
  * Receive loops are bounded-buffer by design: a flush interval bounds
  * what sits on the driver, and everything from the parse onward is a
  * DataFrame plan.
  */

/** UDP statsd daemon (statsd.py:32-130 Stats + StatsdServer):
  * datagrams of `bucket:value|type[|@rate]` lines accumulate between
  * flushes; [[flush]] applies the statsd aggregate semantics through
  * the gated codec — counters sum sampling-scaled, gauges and timers
  * keep the last write — and lands ONE measure per metric at flush
  * time, creating missing metrics like the reference (configured
  * policy name, else the R9 rules).
  */
final class StatsdServer(g: Graft, policyName: Option[String] = None,
                         flushDelayS: Option[Double] = None) {
  // (line, arrival seq, receipt millis) — the reference stamps utcnow
  // at RECEIPT (statsd.py treat_metric), not at flush, so each line
  // carries its receive time through to the flushed measure
  private val lines =
    scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
  private val seq = new AtomicLong(0L)
  private val running = new AtomicBoolean(false)
  private var socket: Option[DatagramSocket] = None
  private var threads: List[Thread] = Nil

  /** Bind and start the receive loop (daemon thread); returns the
    * bound port (pass 0 for an ephemeral one).
    */
  def serve(port: Int = 8125): Int = {
    require(socket.isEmpty, "already serving")
    val sock = new DatagramSocket(port)
    sock.setSoTimeout(200) // poll running so stop() terminates the loop
    socket = Some(sock)
    running.set(true)
    val t = new Thread(() => {
      val buf = new Array[Byte](65536)
      while (running.get()) {
        try {
          val pkt = new DatagramPacket(buf, buf.length)
          sock.receive(pkt)
          val text = new String(pkt.getData, pkt.getOffset, pkt.getLength, UTF_8)
          val recvMs = System.currentTimeMillis()
          lines.synchronized {
            text.split("\n").iterator.filter(_.nonEmpty)
              .foreach(l => lines += ((l, seq.getAndIncrement(), recvMs)))
          }
        } catch {
          case _: java.net.SocketTimeoutException => ()
          case _: Throwable if !running.get() => ()
          case e: Throwable => // transient receive error: log, keep serving
            System.err.println(s"[statsd] receive error: ${e.getMessage}")
        }
      }
    }, "graft-statsd")
    t.setDaemon(true)
    t.start()
    threads = t :: threads
    flushDelayS.foreach { d =>
      val f = new Thread(() =>
        Protocols.flushLoop("statsd", running, d, () => flush()),
        "graft-statsd-flush")
      f.setDaemon(true)
      f.start()
      threads = f :: threads
    }
    sock.getLocalPort
  }

  /** Lines received and not yet flushed (spec/ops introspection). */
  def pendingLines: Int = lines.synchronized(lines.size)

  /** Flush the buffered lines into the store: the reference's
    * per-flush treat_metric + flush pass (statsd.py:60-117). Metric
    * names carry the `|type` suffix exactly as the reference appends
    * it; per kind the flushed value is counter-sum (`c`, scaled by
    * 1/sampling) or last-write (`g`, `ms`). The flushed timestamp is
    * the LAST contributing line's RECEIPT time — the reference stamps
    * utcnow per treat_metric call and the final dict state wins, so
    * flush-time stamping would shift by up to one flush interval.
    * Receipt stamping also makes a failed-landing retry idempotent:
    * the re-flushed point reproduces the same timestamp and new-wins
    * merge dedups it.
    *
    * Failure contract: a staging failure restores the line buffer and
    * rethrows (nothing was accepted); a LANDING failure leaves the
    * measures 202-staged — [[graft.api.Graft.process]] re-stages
    * internally — and the next flush's process() drains them. Either
    * way no line is lost, and the flush loop logs + backs off.
    */
  def flush(): Unit = {
    val snapshot = lines.synchronized {
      val s = lines.toList; lines.clear(); s
    }
    if (snapshot.nonEmpty)
      try {
        val s = g.spark
        import s.implicits._
        val parsed = Statsd.parse(snapshot.toDF("line", "seq", "recv_ms"),
          extra = Seq("recv_ms"))
        // seq rises with arrival, so max(recv_ms) IS the last write's
        // receipt time per (bucket, kind); joined onto the gated
        // aggregate rather than folded into it (the codec's output
        // shape is oracle-pinned)
        val stamped = Statsd.flush(parsed).join(
          parsed.groupBy("bucket", "kind")
            .agg(max(col("recv_ms")).as("recv_ms")),
          Seq("bucket", "kind"))
        val measures = stamped
          .filter(col("kind").isin("c", "g", "ms"))
          .select(
            concat(col("bucket"), lit("|"), col("kind")).as("metric_id"),
            timestamp_millis(col("recv_ms")).as("timestamp"),
            when(col("kind") === "c", col("counter"))
              .otherwise(col("gauge")).as("value"))
        // the live metric-name set is daemon-bounded: driver-sized
        val ids = measures.select("metric_id").distinct()
          .collect().map(_.getString(0))
        ids.foreach(Protocols.ensureMetric(g, _, policyName))
        g.batchAddMeasures(measures) // ONE bulk staging, not per-metric
      } catch { case e: Throwable =>
        lines.synchronized { snapshot.reverseIterator.foreach(_ +=: lines) }
        throw e
      }
    // land what is staged (ours plus anything already pending) — the
    // metricd role fused into the daemon; no-op when staging is empty.
    // Serialized on the shared facade: the statsd and amqp1d timers
    // (and a shutdown drain) must contend on the JVM monitor, not
    // surface routine same-process races as held-store-lock errors —
    // cross-PROCESS contention stays the lock's loud-retry.
    g.synchronized(g.process())
  }


  /** Stop receiving: closes the socket and joins the receive/flush
    * threads, so the buffer is quiescent — the caller then runs a
    * final [[flush]] to drain everything that was received (the
    * shutdown ordering [[graft.rest.RestServer.stop]] relies on).
    */
  def stop(): Unit = {
    running.set(false)
    socket.foreach(_.close())
    socket = None
    threads.foreach(_.join(2000))
    threads = Nil
  }
}

private[ingest] object Protocols {
  /** Create-if-absent tolerant of a concurrent creator (two daemon
    * flush threads can race the same name; Graft's putIfAbsent makes
    * the loser throw Conflict — losing the race IS success here).
    */
  def ensureMetric(g: Graft, name: String, policyName: Option[String]): Unit =
    if (!g.hasMetric(name))
      try policyName match {
        case Some(p) => g.createMetric(name, p)
        case None    => g.createMetric(name) // R9 rules pick the policy
      } catch {
        case _: graft.api.GraftError.Conflict if g.hasMetric(name) => ()
      }

  /** Periodic flush loop shared by the daemons. A failing flush must
    * be LOUD and leave data intact (a silent catch turned a held store
    * lock into a silent data sink — r7 verdict): the flush() failure
    * contract retains the buffer/staging, this loop logs the error and
    * backs off exponentially (cap 32x the configured interval) so a
    * persistently failing store isn't hammered, then the first success
    * resets the cadence.
    */
  def flushLoop(tag: String, running: AtomicBoolean, delayS: Double,
                flush: () => Unit): Unit = {
    val baseMs = math.max(1L, (delayS * 1000).toLong)
    var delayMs = baseMs
    while (running.get()) {
      Thread.sleep(delayMs)
      if (running.get())
        try { flush(); delayMs = baseMs }
        catch { case e: Throwable =>
          System.err.println(s"[$tag] flush failed (data retained, " +
            s"backing off): ${e.getMessage}")
          delayMs = math.min(delayMs * 2, baseMs * 32)
        }
    }
  }
}

/** AMQP 1.0 frame layer (OASIS AMQP 1.0 part 2) over the [[Amqp]]
  * value codec: protocol header, frame envelope
  * `size(4) doff(1) type(1) channel(2)`, and the open/begin/attach/
  * flow/transfer/close performatives (descriptors 0x10-0x18) as
  * described lists. Shared by [[AmqpServer]] and test clients.
  */
object AmqpWire {
  val ProtocolHeader: Array[Byte] =
    Array('A', 'M', 'Q', 'P', 0, 1, 0, 0).map(_.toByte)

  final val Open = 0x10
  final val Begin = 0x11
  final val Attach = 0x12
  final val Flow = 0x13
  final val Transfer = 0x14
  final val Detach = 0x16
  final val End = 0x17
  final val Close = 0x18

  /** Encode one frame: a performative described list (from pre-encoded
    * element bytes + count) followed by an optional payload.
    */
  def frame(descriptorCode: Int, count: Int, elements: Array[Byte],
            payload: Array[Byte] = Array.emptyByteArray,
            channel: Int = 0): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    Amqp.descriptor(body, descriptorCode)
    if (count == 0) body.write(0x45) // list0
    else Amqp.compound(body, 0xd0, count, elements)
    body.write(payload, 0, payload.length)
    val b = body.toByteArray
    val o = new ByteArrayOutputStream()
    Amqp.writeU32(o, b.length + 8)
    o.write(2) // doff
    o.write(0) // type: AMQP frame
    o.write((channel >>> 8) & 0xff); o.write(channel & 0xff)
    o.write(b, 0, b.length)
    o.toByteArray
  }

  /** Encoded element helpers for performative field lists. */
  def elems(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val o = new ByteArrayOutputStream(); f(o); o.toByteArray
  }
  def nul(o: ByteArrayOutputStream): Unit = o.write(0x40)
  def bool(o: ByteArrayOutputStream, v: Boolean): Unit =
    o.write(if (v) 0x41 else 0x42)
  def uint(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write(0x70); Amqp.writeU32(o, v.toInt)
  }
  def str(o: ByteArrayOutputStream, s: String): Unit = Amqp.str(o, s)

  /** One decoded frame: (performative descriptor code, fields, payload
    * bytes after the performative). `None` for empty (heartbeat)
    * frames.
    */
  def readFrame(in: DataInputStream): Option[(Long, Vector[Any], Array[Byte])] = {
    val size = in.readInt()
    require(size >= 8, s"bad frame size $size")
    val doff = in.readUnsignedByte()
    in.readUnsignedByte() // type
    in.readUnsignedShort() // channel
    in.skipNBytes(doff * 4L - 8)
    val bodyLen = size - doff * 4
    if (bodyLen == 0) return None // heartbeat
    val body = new Array[Byte](bodyLen)
    in.readFully(body)
    val (value, end) = Amqp.readOneValue(body, 0, body.length)
    value match {
      case (code: Long, fields: Vector[Any] @unchecked) =>
        Some((code, fields, java.util.Arrays.copyOfRange(body, end, body.length)))
      case other => throw new IllegalArgumentException(
        s"frame body is not a performative: $other")
    }
  }
}

/** TCP AMQP 1.0 daemon (amqp1d.py:60-160): accepts a connection,
  * answers the open/begin/attach handshake with receiver-role replies
  * plus link credit, and buffers each transfer's bare-message body
  * (collectd JSON, decoded through the gated [[Amqp.parseMessage]]).
  * [[flush]] runs the buffered bodies through the gated
  * [[RemoteWrite.collectdToMeasures]] mapping and lands the measures
  * via the facade's bulk door, creating `host/metric` metrics like the
  * batch route. Scope matches the codec's: the data path (part 3 bare
  * messages in transfer frames); SASL layers are out of scope.
  */
final class AmqpServer(g: Graft, policyName: Option[String] = None,
                       flushDelayS: Option[Double] = None) {
  private val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
  private val running = new AtomicBoolean(false)
  private var server: Option[ServerSocket] = None
  private val threads = new java.util.concurrent.CopyOnWriteArrayList[Thread]()
  private val live = java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  def serve(port: Int = 5672): Int = {
    require(server.isEmpty, "already serving")
    val srv = new ServerSocket(port)
    srv.setSoTimeout(200)
    server = Some(srv)
    running.set(true)
    val t = new Thread(() => {
      while (running.get()) {
        try {
          val conn = srv.accept()
          live.add(conn)
          // one thread per connection: an idle client must not starve
          // the accept loop, and stop() can close live sockets to
          // unblock their readers
          val h = new Thread(() => {
            try handleConnection(conn)
            catch { case _: Throwable if !running.get() => ()
                    case e: Throwable =>
                      System.err.println(s"[amqp1d] connection error: ${e.getMessage}") }
            finally { live.remove(conn); try conn.close() catch { case _: Throwable => () } }
          }, "graft-amqp1d-conn")
          h.setDaemon(true)
          h.start()
          threads.add(h)
        } catch {
          case _: java.net.SocketTimeoutException => ()
          case _: Throwable if !running.get() => ()
          case e: Throwable =>
            System.err.println(s"[amqp1d] accept error: ${e.getMessage}")
        }
      }
    }, "graft-amqp1d")
    t.setDaemon(true)
    t.start()
    threads.add(t)
    flushDelayS.foreach { d =>
      val f = new Thread(() =>
        Protocols.flushLoop("amqp1d", running, d, () => flush()),
        "graft-amqp1d-flush")
      f.setDaemon(true)
      f.start()
      threads.add(f)
    }
    srv.getLocalPort
  }

  private def handleConnection(conn: Socket): Unit = {
    import AmqpWire._
    val in = new DataInputStream(conn.getInputStream)
    val out = new DataOutputStream(conn.getOutputStream)
    val header = new Array[Byte](8)
    in.readFully(header)
    require(header.take(4).sameElements("AMQP".getBytes(UTF_8)) &&
      header(4) == 0, s"unsupported protocol header (SASL not offered)")
    out.write(ProtocolHeader); out.flush()
    var open = true
    while (open && running.get()) {
      readFrame(in) match {
        case None => () // heartbeat
        case Some((Open, _, _)) =>
          out.write(frame(Open, 1, elems(o => str(o, "graft-amqp1d"))))
          out.flush()
        case Some((Begin, _, _)) =>
          out.write(frame(Begin, 4, elems { o =>
            nul(o); uint(o, 0); uint(o, Int.MaxValue); uint(o, Int.MaxValue)
          }))
          out.flush()
        case Some((Attach, fields, _)) =>
          val linkName = fields.headOption match {
            case Some(s: String) => s; case _ => "link-0"
          }
          val handle = fields.lift(1) match {
            case Some(h: Long) => h; case _ => 0L
          }
          // reply attach with the mirrored name and RECEIVER role,
          // then grant link credit so the sender may transfer
          out.write(frame(Attach, 3, elems { o =>
            str(o, linkName); uint(o, handle); bool(o, v = true)
          }))
          out.write(frame(Flow, 7, elems { o =>
            uint(o, 0); uint(o, Int.MaxValue) // next-in-id, in-window
            uint(o, 0); uint(o, Int.MaxValue) // next-out-id, out-window
            uint(o, handle); uint(o, 0); uint(o, 1000) // handle, dc, credit
          }))
          out.flush()
        case Some((Transfer, _, payload)) =>
          val msg = Amqp.parseMessage(payload)
          bodies.synchronized { bodies += msg.body }
        case Some((Close, _, _)) =>
          out.write(frame(Close, 0, Array.emptyByteArray)); out.flush()
          open = false
        case Some((Detach | End, _, _)) => () // teardown chatter
        case Some((Flow, _, _)) => ()
        case Some((other, _, _)) =>
          throw new IllegalArgumentException(
            f"unsupported performative 0x$other%02x")
      }
    }
  }

  /** Messages received and not yet flushed (spec/ops introspection). */
  def pendingBodies: Int = bodies.synchronized(bodies.size)

  /** Flush buffered collectd bodies through the gated mapping into the
    * store (amqp1d.py BatchProcessor._flush): metrics are
    * `host/metric` ids created on first sight, measures land via the
    * facade's bulk DataFrame door, then process() drains staging (the
    * metricd role fused into the daemon). Same failure contract as
    * [[StatsdServer.flush]]: staging failure restores the body buffer
    * and rethrows; landing failure leaves the measures 202-staged for
    * the next flush's process() — collectd bodies carry their own
    * timestamps, so the retry is new-wins idempotent.
    */
  def flush(): Unit = {
    val snapshot = bodies.synchronized {
      val s = bodies.toList; bodies.clear(); s
    }
    if (snapshot.nonEmpty)
      try {
        val s = g.spark
        import s.implicits._
        val measures = RemoteWrite.collectdToMeasures(snapshot.toDF("body"))
          .select(concat(col("resource_id"), lit("/"), col("metric"))
              .as("metric_id"),
            col("timestamp"), col("value"))
        // the live metric-name set is daemon-bounded (hosts × plugins),
        // not measure-bounded — same envelope as the REST wire doors
        val ids = measures.select("metric_id").distinct()
          .collect().map(_.getString(0))
        ids.foreach(Protocols.ensureMetric(g, _, policyName))
        g.batchAddMeasures(measures)
      } catch { case e: Throwable =>
        bodies.synchronized { snapshot.reverseIterator.foreach(_ +=: bodies) }
        throw e
      }
    g.synchronized(g.process()) // same intra-JVM serialization as statsd
  }

  /** Stop accepting and close live connections (unblocking their
    * reader threads), then join everything — after this the body
    * buffer is quiescent and the caller's final [[flush]] drains it.
    */
  def stop(): Unit = {
    running.set(false)
    server.foreach(_.close())
    server = None
    live.forEach(c => try c.close() catch { case _: Throwable => () })
    threads.forEach(_.join(2000))
    threads.clear()
  }
}
