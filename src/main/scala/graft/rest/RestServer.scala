package graft.rest

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.json4s.JNothing

/** Wire binding for [[RestApi]] on the JDK's built-in HTTP server (the
  * reference runs a WSGI app, rest/app.py; here the server is a thin
  * adapter — all semantics live in the transport-free dispatcher).
  * Zero extra dependencies: `com.sun.net.httpserver` ships with the
  * JDK. Start with `serve()`; returns the bound port (pass 0 to pick a
  * free one).
  *
  * Deployment shell matching the reference's app wrapping
  * (rest/app.py:186 wraps the app in oslo CORS middleware; the
  * auth_mode selects the auth_helper):
  *  - `allowedOrigins`: CORS origins ("*" wildcards). Empty = CORS off
  *    (oslo's default until allowed_origin is configured). A preflight
  *    OPTIONS from an allowed origin answers 200 with the reference's
  *    allow-headers set (opts.py:250-257); allowed simple requests
  *    carry Access-Control-Allow-Origin on the response.
  *  - `authMode`: "basic" (Authorization user, identification-only —
  *    auth_helper.BasicAuthHelper), "remoteuser" (the proxy's
  *    X-Remote-User — RemoteUserAuthHelper's request.remote_user), or
  *    "keystone" (X-User-Id/X-Project-Id → "user:project" —
  *    KeystoneAuthHelper.get_current_user).
  */
class RestServer(api: RestApi,
                 allowedOrigins: Seq[String] = Nil,
                 authMode: String = "basic") {

  require(Set("basic", "remoteuser", "keystone").contains(authMode),
    s"unknown auth mode: $authMode")

  // the reference's CORS allow-headers defaults (opts.py set_defaults)
  private val corsAllowHeaders = Seq("Authorization", "X-Auth-Token",
    "X-Subject-Token", "X-User-Id", "X-Domain-Id", "X-Project-Id",
    "X-Roles", "Content-Type").mkString(",")

  private def originAllowed(o: String): Boolean =
    allowedOrigins.contains("*") || allowedOrigins.contains(o)

  @volatile private var server: Option[HttpServer] = None
  @volatile private var statsd: Option[graft.ingest.StatsdServer] = None
  @volatile private var amqp: Option[graft.ingest.AmqpServer] = None

  /** Start the HTTP door plus the statsd/amqp1d socket daemons under
    * ONE lifecycle (the reference runs them as sibling services of the
    * API; here `stop()` tears all three down). Returns
    * (http, statsd, amqp) bound ports; pass 0s for ephemeral ones.
    */
  def serveAll(g: graft.api.Graft, httpPort: Int = 8041,
               statsdPort: Int = 8125, amqpPort: Int = 5672,
               flushDelayS: Option[Double] = Some(10.0),
               policyName: Option[String] = None): (Int, Int, Int) = {
    val hp = serve(httpPort)
    try {
      val st = new graft.ingest.StatsdServer(g, policyName, flushDelayS)
      val am = new graft.ingest.AmqpServer(g, policyName, flushDelayS)
      statsd = Some(st)
      amqp = Some(am)
      (hp, st.serve(statsdPort), am.serve(amqpPort))
    } catch {
      // a later bind failure must not leave earlier doors running: a
      // failed serveAll holds no ports
      case e: Throwable => try stop() catch { case _: Throwable => () }; throw e
    }
  }

  def serve(port: Int = 8041): Int = {
    // one server per lifecycle: a second serve() would silently leak
    // the first HttpServer (only the last lands in `server`, so stop()
    // could never reach the earlier one's port)
    require(server.isEmpty, "server already started — stop() it first")
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        // CORS preflight (rest/app.py:186 oslo middleware): an OPTIONS
        // with Origin + Access-Control-Request-Method never reaches the
        // app; an allowed origin gets the allow-* header set, a
        // disallowed one a bare 200 with no CORS headers (oslo's
        // posture — not an error)
        val origin = Option(ex.getRequestHeaders.getFirst("Origin"))
        val preflightMethod = Option(
          ex.getRequestHeaders.getFirst("Access-Control-Request-Method"))
        if (ex.getRequestMethod == "OPTIONS" && origin.isDefined &&
            preflightMethod.isDefined) {
          ex.getRequestBody.readAllBytes()
          if (origin.exists(originAllowed)) {
            val h = ex.getResponseHeaders
            h.add("Access-Control-Allow-Origin", origin.get)
            h.add("Access-Control-Allow-Methods", preflightMethod.get)
            h.add("Access-Control-Allow-Headers", corsAllowHeaders)
            h.add("Vary", "Origin")
          }
          ex.sendResponseHeaders(200, -1)
          ex.close()
          return
        }
        val resp =
          try {
            val body = ex.getRequestBody.readAllBytes()
            // REPEATED keys (?groupby=a&groupby=b, ?attrs=x&attrs=y,
            // ?sort=..&sort=..) comma-join in order — the dispatcher's
            // list-valued params split on "," (the reference's
            // arg_to_list surface); single-occurrence values are
            // untouched, so commas inside e.g. ?filter= survive
            val query = Option(ex.getRequestURI.getRawQuery)
              .map(_.split("&").toSeq.filter(_.nonEmpty).map { kv =>
                kv.split("=", 2) match {
                  case Array(k, v) => decode(k) -> decode(v)
                  case Array(k)    => decode(k) -> ""
                }
              }.groupBy(_._1).view
                .mapValues(_.map(_._2).mkString(",")).toMap)
              .getOrElse(Map.empty[String, String])
            // auth_helper seam → the dispatcher's creator: the mode
            // picks where the identity comes from (identification, not
            // authentication — as gnocchi's own `basic` mode)
            val creator: Option[String] = authMode match {
              case "basic" =>
                Option(ex.getRequestHeaders.getFirst("Authorization"))
                  .map(_.trim).filter(_.toLowerCase.startsWith("basic "))
                  .flatMap { h =>
                    try Some(new String(
                      java.util.Base64.getDecoder.decode(h.substring(6).trim),
                      StandardCharsets.UTF_8).split(":", 2)(0))
                    catch { case _: IllegalArgumentException => None }
                  }.filter(_.nonEmpty)
              case "remoteuser" => // the proxy's REMOTE_USER
                Option(ex.getRequestHeaders.getFirst("X-Remote-User"))
                  .filter(_.nonEmpty)
              case "keystone" => // "user:project" (auth_helper.py:31-35)
                val u = Option(ex.getRequestHeaders.getFirst("X-User-Id"))
                val p = Option(ex.getRequestHeaders.getFirst("X-Project-Id"))
                if (u.isEmpty && p.isEmpty) None
                else Some(u.getOrElse("") + ":" + p.getOrElse(""))
            }
            // raw path: the dispatcher decodes per-segment, so ids with
            // an encoded slash survive routing
            // first value per header name — the routes that read
            // headers (influx resource-tag) are single-valued
            val reqHeaders = {
              import scala.jdk.CollectionConverters._
              ex.getRequestHeaders.asScala.collect {
                case (k, vs) if !vs.isEmpty => k -> vs.get(0)
              }.toMap
            }
            api.dispatchBytes(ex.getRequestMethod,
              ex.getRequestURI.getRawPath, query, body, creator, reqHeaders)
          } catch { // the dispatcher maps domain errors; this is transport
            case e: Throwable =>
              Response(500, org.json4s.JObject(
                "code" -> org.json4s.JInt(500),
                "description" -> org.json4s.JString(String.valueOf(e.getMessage))))
          }
        val bytes = resp.body match {
          case JNothing => Array.empty[Byte]
          case b => RestApi.renderJson(b).getBytes(StandardCharsets.UTF_8)
        }
        if (bytes.nonEmpty)
          ex.getResponseHeaders.add("Content-Type", "application/json")
        resp.headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
        // allowed simple cross-origin requests carry the allow header
        if (origin.exists(originAllowed)) {
          ex.getResponseHeaders.add("Access-Control-Allow-Origin", origin.get)
          ex.getResponseHeaders.add("Vary", "Origin")
        }
        ex.sendResponseHeaders(resp.status,
          if (bytes.isEmpty) -1 else bytes.length.toLong)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    // a small pool: long reads (measures scans) must not block
    // healthchecks or ingest. Safe because the facade's catalog
    // mutators serialize on Graft.catalogLock and Spark actions are
    // thread-safe; daemon threads so a leaked server can't pin the JVM
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
      r => { val t = new Thread(r, "graft-http"); t.setDaemon(true); t }))
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  private def decode(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  /** The side daemons started by [[serveAll]] (spec/ops introspection). */
  def statsdDaemon: Option[graft.ingest.StatsdServer] = statsd
  def amqpDaemon: Option[graft.ingest.AmqpServer] = amqp

  def stop(): Unit = {
    // stop the receive loops FIRST (quiescing each buffer), THEN run
    // the final flush — the reverse order would snapshot the buffer
    // while the receive thread still appends, silently dropping
    // anything received after the snapshot
    def closing(door: String)(f: => Unit): Unit =
      try f catch { case e: Throwable =>
        System.err.println(s"[graft] $door shutdown error: ${e.getMessage}") }
    statsd.foreach { s => closing("statsd") { s.stop(); s.flush() } }
    amqp.foreach { a => closing("amqp1d") { a.stop(); a.flush() } }
    statsd = None; amqp = None
    server.foreach { s =>
      val ex = s.getExecutor
      s.stop(0)
      ex match {
        case p: java.util.concurrent.ExecutorService => p.shutdown()
        case _ => ()
      }
    }
    server = None
  }
}
