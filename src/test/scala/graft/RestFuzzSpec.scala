package graft

import graft.rest.RestApi

/** REST-door fuzz: the reference maps every malformed request to a
  * 4xx (pecan converts unhandled route misses and abort()s; its JSON
  * deserialization errors are 400s) — an uncaught exception class in
  * our dispatch surfaces as a 500 instead. Throw a few hundred
  * seeded-random requests (garbage segments, truncated/hostile JSON
  * bodies, wrong methods, hostile query strings) at a live facade and
  * assert NOTHING escapes as a 5xx or an exception. The corpus mixes
  * real route vocabulary with garbage so requests reach deep handlers,
  * not just the 404 wall.
  */
class RestFuzzSpec extends SparkSpec {

  test("a few hundred hostile requests: every response is 2xx/4xx, " +
      "never a 500, never an escaped exception") {
    val root = java.nio.file.Files.createTempDirectory("graft-restfuzz")
      .toString
    val api = new RestApi(new graft.api.Graft(spark, root))
    // seed real entities so deep handlers are reachable
    assert(api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "fz", "back_window": 0,
          "definition": [{"granularity": "60", "points": 10}],
          "aggregation_methods": ["mean"]}""").status == 201)
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "fzm", "archive_policy_name": "fz"}""").status == 201)
    api.dispatch("POST", "/v1/metric/fzm/measures", body =
      """[{"timestamp": "2014-01-01T12:00:01Z", "value": 1.0}]""")

    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L))
    val methods = Vector("GET", "POST", "PATCH", "DELETE", "PUT", "HEAD")
    val segs = Vector("v1", "v2", "metric", "archive_policy",
      "archive_policy_rule", "resource", "generic", "search", "aggregates",
      "batch", "resources", "metrics", "measures", "status", "resource_type",
      "capabilities", "fzm", "fz", "history", "..", "", "%41%2e", "zzz",
      "3fa85f64-5717-4562-b3fc-2c963f66afa6", "-1", "9".repeat(40),
      "é中🦊", "a" * 300, "null", "true", "metric\n")
    val queries = Vector("", "?granularity=60", "?granularity=-1",
      "?granularity=abc", "?start=zzz&stop=-5", "?limit=-3&marker=@@",
      "?details=maybe", "?filter=zone%20%3D%20'", "?sort=nope:asc",
      "?granularity=60&granularity=1e309", "?refresh=yes&history=x")
    val bodies = Vector("", "{", "[", "null", "true", "42", "\"x\"",
      "{}", "[]", "[{]", "{\"name\":}", "[{\"timestamp\": 1}]",
      """[{"timestamp": "1e999", "value": 1}]""",
      """[{"timestamp": "2014-01-01T12:00:01Z", "value": "NaN"}]""",
      """{"name": "fz", "back_window": -1, "definition": []}""",
      """{"id": 42, "archive_policy_name": {"a": []}}""",
      """{"absent": [{"op": "???"}]}""",
      """{"=": {"started_at": "garbage"}}""",
      """{"and": [{"and": [{"and": [{"and": [{"=": {"x": 1}}]}]}]}]}""",
      """[{"timestamp": "-9999999999 days", "value": 1}]""",
      """{"measures": {"fzm": [{"timestamp": true, "value": []}]}}""",
      "\u0000\u0001\u0002", "a" * 2000,
      """{"definition": [{"granularity": "0"}], "name": "z"}""")

    var served = 0
    for (i <- 0 until 1200) {
      val depth = 1 + rnd.nextInt(4)
      val path = "/" + (Vector("v1") ++
        Vector.fill(depth)(segs(rnd.nextInt(segs.size)))).mkString("/") +
        queries(rnd.nextInt(queries.size))
      val method = methods(rnd.nextInt(methods.size))
      val body = bodies(rnd.nextInt(bodies.size))
      val resp =
        try api.dispatch(method, path, body = body)
        catch {
          case e: Throwable =>
            fail(s"#$i $method $path body=${body.take(40)} ESCAPED: " +
              s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      assert(resp.status < 500,
        s"#$i $method $path body=${body.take(60)} -> ${resp.status}")
      served += 1
    }
    assert(served == 1200)
  }

  test("keystone-scoped fuzz: hostile requests under requireAuth + " +
      "keystone with random identities/roles never 500 — the policy " +
      "filter merge and scope checks hold on every door") {
    val root = java.nio.file.Files.createTempDirectory("graft-ksfuzz")
      .toString
    val g = new graft.api.Graft(spark, root)
    val api = new RestApi(g, requireAuth = true, authMode = "keystone")
    val s = spark
    import s.implicits._
    g.setResources(Seq(("r1", "u1:p1", "fr", "p1"))
      .toDF("id", "creator", "zone", "project_id"))
    assert(api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "kz", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""",
      creator = Some("admin")).status == 201)
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "kzm", "archive_policy_name": "kz"}""",
      creator = Some("u1:p1")).status == 201)

    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(31513513L))
    val methods = Vector("GET", "POST", "PATCH", "DELETE")
    val segs = Vector("v1", "metric", "resource", "generic", "search",
      "kzm", "kz", "r1", "history", "measures", "metrics",
      "archive_policy", "status", "aggregates", "zzz", "é中", "")
    val creators = Vector(None, Some("u1:p1"), Some("u2:p2"),
      Some("admin"), Some(":"), Some("u:"), Some(":p"), Some("nocolon"),
      Some("a:b:c"))
    val roleHdrs = Vector(Map.empty[String, String],
      Map("X-Roles" -> "admin"), Map("X-Roles" -> "reader , ,admin"),
      Map("X-Roles" -> ","), Map("x-roles" -> "ADMIN"),
      Map("X-Roles" -> "member"))
    val bodies = Vector("", "{}", """{"=": {"zone": "fr"}}""",
      """{"=": {"creator": null}}""", """{"like": {"project_id": "%"}}""",
      """{"and": [{"=": {"x": 1}}]}""", "[{]",
      """[{"timestamp": "2014-01-01T12:00:01Z", "value": 1.0}]""")
    for (i <- 0 until 600) {
      val depth = 1 + rnd.nextInt(4)
      val path = "/" + (Vector("v1") ++
        Vector.fill(depth)(segs(rnd.nextInt(segs.size)))).mkString("/")
      val resp =
        try api.dispatch(methods(rnd.nextInt(methods.size)), path,
          body = bodies(rnd.nextInt(bodies.size)),
          creator = creators(rnd.nextInt(creators.size)),
          reqHeaders = roleHdrs(rnd.nextInt(roleHdrs.size)))
        catch {
          case e: Throwable =>
            fail(s"#$i $path ESCAPED: ${e.getClass.getName}: " +
              s"${String.valueOf(e.getMessage).take(200)}")
        }
      assert(resp.status < 500, s"#$i $path -> ${resp.status}")
    }
  }
}
