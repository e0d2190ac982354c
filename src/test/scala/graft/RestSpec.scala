package graft

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods
import graft.rest.{RestApi, RestServer}

/** REST surface over the Graft facade: route semantics through the
  * transport-free dispatcher, plus one socket round-trip on the JDK
  * server binding.
  */
class RestSpec extends SparkSpec {

  private def newApi = {
    val root = java.nio.file.Files.createTempDirectory("graft-rest").toString
    new RestApi(new graft.api.Graft(spark, root))
  }

  test("policy → metric → measures → status → read round-trip") {
    val api = newApi
    val p = api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "spec", "back_window": 0,
          "definition": [{"granularity": "60", "points": 100}],
          "aggregation_methods": ["mean", "max"]}""")
    assert(p.status === 201)
    assert((p.body \ "definition")(0) \ "timespan" === JDouble(6000.0))

    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "m1", "archive_policy_name": "spec"}""").status === 201)

    val post = api.dispatch("POST", "/v1/metric/m1/measures", body =
      """[{"timestamp": "2014-01-01T12:00:01Z", "value": 1.0},
          {"timestamp": "2014-01-01T12:00:40Z", "value": 3.0},
          {"timestamp": "2014-01-01T12:01:30Z", "value": 5.0}]""")
    assert(post.status === 202)

    val st = api.dispatch("GET", "/v1/status")
    assert(st.body \ "storage" \ "summary" \ "measures" === JInt(3))
    assert(st.body \ "storage" \ "summary" \ "metrics" === JInt(1))

    val got = api.dispatch("GET", "/v1/metric/m1/measures",
      query = Map("refresh" -> "true"))
    assert(got.status === 200)
    val triples = got.body.asInstanceOf[JArray].arr.map {
      case JArray(List(JString(t), JDouble(gr), JDouble(v))) => (t, gr, v)
      case other => fail(s"bad triple: $other")
    }
    assert(triples === List(
      ("2014-01-01T12:00:00Z", 60.0, 2.0), // (1+3)/2
      ("2014-01-01T12:01:00Z", 60.0, 5.0)))

    // max series + a start slice
    val mx = api.dispatch("GET", "/v1/metric/m1/measures",
      query = Map("aggregation" -> "max", "start" -> "2014-01-01T12:01:00Z"))
    assert(mx.body.asInstanceOf[JArray].arr.map {
      case JArray(List(_, _, JDouble(v))) => v; case _ => fail()
    } === List(5.0))
  }

  test("influxdb compatibility handshake: ping + CREATE DATABASE, " +
      "then a telegraf-shaped write sequence (rest/influxdb.py:106-139)") {
    val api = newApi
    // 1. ping (telegraf probes before anything else): 204 + version hdr
    val ping = api.dispatch("GET", "/v1/influxdb/ping")
    assert(ping.status === 204)
    assert(ping.headers.contains("X-Influxdb-Version"))
    assert(api.dispatch("HEAD", "/v1/influxdb/ping").status === 204)
    // 2. CREATE DATABASE (form-encoded body, as influx clients send it)
    val cq = api.dispatch("POST", "/v1/influxdb/query",
      body = "q=CREATE+DATABASE+telegraf")
    assert(cq.status === 204)
    // created as a resource type; repeating passes (already-exists)
    assert(api.dispatch("GET", "/v1/resource_type/telegraf").status === 200)
    assert(api.dispatch("POST", "/v1/influxdb/query",
      body = "q=CREATE+DATABASE+telegraf").status === 204)
    // quoted name + trailing semicolon, query-param form
    assert(api.dispatch("POST", "/v1/influxdb/query",
      query = Map("q" -> "create database \"tele-graf\";")).status === 204)
    // anything else is the reference's 501 triple
    val notImpl = api.dispatch("POST", "/v1/influxdb/query",
      body = "q=SELECT+*+FROM+cpu")
    assert(notImpl.status === 501)
    assert(notImpl.body \ "reason" === JString("Query not implemented"))
    assert(notImpl.body \ "detail" === JString("q"))
    // 3. the write a real client then issues lands end to end
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "all", "metric_pattern": "*", "archive_policy_name": "low"}""")
    assert(api.dispatch("POST", "/v1/influxdb/write",
      body = "cpu,host=web01 value=0.5 1388577600000000000").status === 204)
    val st = api.dispatch("GET", "/v1/status")
    assert(st.body \ "storage" \ "summary" \ "measures" === JInt(1))
    // 4. "/" is rewritten to "_" in metric names (influxdb.py:225-229)
    // and X-Gnocchi-InfluxDB-Tag-Resource-ID picks the resource tag
    assert(api.dispatch("POST", "/v1/influxdb/write",
      body = "disk/io,dc=east,host=web01 rate/s=2.0 1388577600000000000",
      reqHeaders = Map("x-gnocchi-influxdb-tag-resource-id" -> "dc"))
      .status === 204)
    val ids = api.dispatch("GET", "/v1/metric").body match {
      case JArray(ms) => ms.map(m => JsonMethods.compact(
        JsonMethods.render(m \ "id")))
      case _ => Nil
    }
    assert(ids.exists(_.contains("east/disk_io.rate_s@host=web01")))
    assert(!ids.exists(_.contains("disk/io")))
    // 5. a line missing the selected resource tag aborts 400 with the
    // reference's message (influxdb.py:198-208) — a typo'd tag header
    // must not silently rebucket lines under an invented resource
    val before = api.dispatch("GET", "/v1/status")
      .body \ "storage" \ "summary" \ "measures"
    val missing = api.dispatch("POST", "/v1/influxdb/write",
      body = "cpu,host=web01 value=0.5 1388577600000000000",
      reqHeaders = Map("x-gnocchi-influxdb-tag-resource-id" -> "hots"))
    assert(missing.status === 400)
    assert(missing.body \ "reason" ===
      JString("Unable to find key `hots' in tags"))
    // nothing staged by the rejected write
    assert(api.dispatch("GET", "/v1/status")
      .body \ "storage" \ "summary" \ "measures" === before)
  }

  test("/v1/status always carries the metricd block in the " +
      "no-coordinator shape (rest/api.py:2216-2219)") {
    val api = newApi
    val st = api.dispatch("GET", "/v1/status")
    assert(st.status === 200)
    assert(st.body \ "metricd" \ "processors" === JNull)
    // statistics carries the engine's own counters (lock_leaks) —
    // shape-wise the reference's dict, content engine-specific
    assert((st.body \ "metricd" \ "statistics" \ "lock_leaks")
      .isInstanceOf[JInt])
  }

  test("unknown metric and bad input map to 404/400") {
    val api = newApi
    assert(api.dispatch("POST", "/v1/metric/nope/measures",
      body = """[{"timestamp": "2014-01-01T12:00:01Z", "value": 1}]""")
      .status === 404)
    assert(api.dispatch("GET", "/v1/archive_policy/nope").status === 404)
    assert(api.dispatch("POST", "/v1/archive_policy",
      body = """{"name": "x"""").status === 400)
    assert(api.dispatch("GET", "/v1/no/such/route").status === 404)
    // wrong METHOD on a known route → 405 (gabbits/archive.yaml)
    assert(api.dispatch("PUT", "/v1/archive_policy").status === 405)
    assert(api.dispatch("PUT", "/v1/metric").status === 405)
    // a granularity the policy never stored → 404, not empty 200
    // (gabbits/metric-granularity.yaml "invalid granularity")
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "g404", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "mg", "archive_policy_name": "g404"}""")
    assert(api.dispatch("GET", "/v1/metric/mg/measures",
      query = Map("granularity" -> "42")).status === 404)
    assert(api.dispatch("GET", "/v1/metric/mg/measures",
      query = Map("granularity" -> "60")).status === 200)
    // an aggregation the policy never stored is also a 404, not an
    // empty 200 (rest/api.py:508-515 "Aggregation method ... does not
    // exist for this metric"; gabbits/metric.yaml)
    assert(api.dispatch("GET", "/v1/metric/mg/measures",
      query = Map("aggregation" -> "median")).status === 404)
    // resample without a granularity is ambiguous → 400
    // (gabbits/metric.yaml "resample no granularity")
    val noG = api.dispatch("GET", "/v1/metric/mg/measures",
      query = Map("resample" -> "120"))
    assert(noG.status === 400)
    assert((noG.body \ "description").asInstanceOf[JString].s
      .contains("A granularity must be specified to resample"))
    // pre-epoch timestamps reject on the measure doors
    // (utils.to_timestamps; gabbits/metric.yaml "before epoch")
    val preEpoch = api.dispatch("POST", "/v1/metric/mg/measures",
      body = """[{"timestamp": "1915-03-06T14:33:57Z", "value": 43.1}]""")
    assert(preEpoch.status === 400)
    assert((preEpoch.body \ "description").asInstanceOf[JString].s
      .contains("Timestamp must be after Epoch"))
  }

  test("measure search compiles the boolean tree (rest/api.py:1514-1652)") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "s", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "m", "archive_policy_name": "s"}""")
    api.dispatch("POST", "/v1/metric/m/measures", body =
      """[{"timestamp": "2014-01-01T12:00:01Z", "value": 1.0},
          {"timestamp": "2014-01-01T12:01:01Z", "value": 9.0}]""")
    api.dispatch("GET", "/v1/metric/m/measures",
      query = Map("refresh" -> "true")) // drain staging
    val hit = api.dispatch("POST", "/v1/search/metric",
      query = Map("metric_id" -> "m", "granularity" -> "60"),
      body = """{">=": 5}""")
    assert(hit.status === 200)
    val vals = hit.body.asInstanceOf[JArray].arr.map(r => r \ "value")
    assert(vals === List(JDouble(9.0)))
  }

  test("aggregates DSL and batch ingest routes") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "s", "definition": [{"granularity": "300"}],
          "aggregation_methods": ["mean"]}""")
    // R9 rule picks the policy for batch-created metrics
    assert(api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "all", "metric_pattern": "*",
          "archive_policy_name": "s"}""").status === 201)
    // batch body: resource → metric name → measures (rest/api.py:1726-1848)
    assert(api.dispatch("POST", "/v1/batch/resources/metrics/measures",
      body = """{"r1": {"cpu": [
          {"timestamp": "2014-01-01T00:00:10Z", "value": 4.0},
          {"timestamp": "2014-01-01T00:02:00Z", "value": 8.0}]}}""",
      query = Map("create_metrics" -> "true")).status === 202)
    // drain via ?refresh (metric id with an encoded slash routes intact)
    assert(api.dispatch("GET", "/v1/metric/r1%2Fcpu/measures",
      query = Map("refresh" -> "true")).status === 200)
    // a scalar⊕series tree is NOT aggregated (operations.py:168-178) —
    // the output fans out per metric reference, keyed by the leaf's
    // aggregation (gabbits/aggregates-with-metric-ids.yaml "aggregates
    // with + 2.0"): {"measures": {"r1/cpu": {"mean": [[ts, g, v]...]}}}
    val agg = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(* 2 (metric r1/cpu mean))", "granularity": 300}""")
    assert(agg.status === 200)
    val rows = (agg.body \ "measures" \ "r1/cpu" \ "mean")
      .asInstanceOf[JArray].arr
    assert(rows.map { case JArray(List(_, JDouble(g300), JDouble(v))) =>
        assert(g300 === 300.0); v
      case _ => fail() }
      === List(12.0)) // 2 * mean(4, 8)

    // details=true attaches the resolved metric references next to the
    // measures (rest/aggregates/api.py:639-646)
    val det = api.dispatch("POST", "/v1/aggregates",
      query = Map("details" -> "true"),
      body = """{"operations": "(* 2 (metric r1/cpu mean))",
        "granularity": 300}""")
    assert(det.status === 200)
    val refs = (det.body \ "references").asInstanceOf[JArray].arr
    assert(refs.map(_ \ "id") === List(JString("r1/cpu")))
    assert(refs.head \ "archive_policy" \ "name" === JString("s"))
    assert((det.body \ "measures" \ "r1/cpu" \ "mean")
      .asInstanceOf[JArray].arr.nonEmpty)
    // without details the block is absent, as before
    assert(agg.body \ "references" === JNothing)
    // unknown metric in the operations with details → 404
    assert(api.dispatch("POST", "/v1/aggregates",
      query = Map("details" -> "true"),
      body = """{"operations": "(metric ghost mean)",
        "granularity": 300}""").status === 404)
    // unknown AGGREGATION METHOD is also a 404, not a 400 — the
    // reference's AggregationDoesNotExist ("Metrics with unknown
    // aggregation", rest/aggregates/api.py:186-188)
    assert(api.dispatch("POST", "/v1/aggregates",
      body = """{"operations": "(metric r1/cpu median)",
        "granularity": 300}""").status === 404)

    // a measure missing timestamp/value is malformed INPUT → 400 (not
    // a 404 from the raw map miss), with nothing staged
    val noVal = api.dispatch("POST", "/v1/batch/resources/metrics/measures",
      body = """{"r1": {"cpu": [{"timestamp": "2014-01-01T00:04:00Z"}]}}""")
    assert(noVal.status === 400)
    assert((noVal.body \ "description").asInstanceOf[JString].s
      .contains("missing 'value'"))
    val noTs = api.dispatch("POST", "/v1/batch/resources/metrics/measures",
      body = """{"r1": {"cpu": [{"value": 4.5}]}}""")
    assert(noTs.status === 400)
    assert((noTs.body \ "description").asInstanceOf[JString].s
      .contains("missing 'timestamp'"))
    // pre-epoch timestamps reject on the batch door too
    // (utils.to_timestamps, utils.py:119-120)
    val preEpoch = api.dispatch("POST", "/v1/batch/resources/metrics/measures",
      body = """{"r1": {"cpu": [{"timestamp": "1915-01-01T00:00:00Z",
        "value": 1.0}]}}""")
    assert(preEpoch.status === 400)
    assert((preEpoch.body \ "description").asInstanceOf[JString].s
      .contains("Timestamp must be after Epoch"))
  }

  test("aggregates per-reference shape: unaggregated trees fan out " +
      "per metric (gabbits/aggregates-with-metric-ids.yaml)") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "pr", "definition": [{"granularity": "300"}],
          "aggregation_methods": ["mean"]}""")
    for (m <- Seq("ma", "mb"))
      api.dispatch("POST", "/v1/metric", body =
        s"""{"name": "$m", "archive_policy_name": "pr"}""")
    // ma covers three buckets; mb misses the FIRST one (its ffill
    // residual leading NaN must drop per-series, processor.py:257-262)
    api.dispatch("POST", "/v1/metric/ma/measures", body =
      """[{"timestamp": "2014-01-01T00:00:00Z", "value": 1.0},
          {"timestamp": "2014-01-01T00:05:00Z", "value": 2.0},
          {"timestamp": "2014-01-01T00:10:00Z", "value": 3.0}]""")
    api.dispatch("POST", "/v1/metric/mb/measures", body =
      """[{"timestamp": "2014-01-01T00:05:00Z", "value": 10.0},
          {"timestamp": "2014-01-01T00:10:00Z", "value": 20.0}]""")
    api.dispatch("GET", "/v1/metric/ma/measures",
      query = Map("refresh" -> "true"))
    api.dispatch("GET", "/v1/metric/mb/measures",
      query = Map("refresh" -> "true"))

    // bare multi-metric leaf → {metric: {agg: [...]}} with BOTH refs
    val multi = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(metric (ma mean) (mb mean))",
          "granularity": 300, "fill": "ffill"}""")
    assert(multi.status === 200)
    def triples(v: JValue) = v.asInstanceOf[JArray].arr.map {
      case JArray(List(JString(t), JDouble(g), JDouble(x))) => (t, g, x)
      case other => fail(s"bad triple $other")
    }
    val ma = triples(multi.body \ "measures" \ "ma" \ "mean")
    val mb = triples(multi.body \ "measures" \ "mb" \ "mean")
    assert(ma === List(("2014-01-01T00:00:00Z", 300.0, 1.0),
      ("2014-01-01T00:05:00Z", 300.0, 2.0),
      ("2014-01-01T00:10:00Z", 300.0, 3.0)))
    // mb's leading grid bucket stays NaN after ffill → dropped for mb
    // only; ma keeps its own t0 bucket
    assert(mb === List(("2014-01-01T00:05:00Z", 300.0, 10.0),
      ("2014-01-01T00:10:00Z", 300.0, 20.0)))

    // the same tree wrapped in `aggregate` collapses to ONE
    // "aggregated" list (processor.py:232-240 is_aggregated=True)
    val agg = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(aggregate mean (metric (ma mean) (mb mean)))",
          "granularity": 300}""")
    assert(agg.status === 200)
    assert(triples(agg.body \ "measures" \ "aggregated")
      === List(("2014-01-01T00:00:00Z", 300.0, 1.0),
        ("2014-01-01T00:05:00Z", 300.0, 6.0),
        ("2014-01-01T00:10:00Z", 300.0, 11.5)))
    assert(agg.body \ "measures" \ "ma" === JNothing)

    // no-granularity form: per-ref triples across every common
    // granularity, coarse→fine (single 300 s policy here — shape only)
    val auto = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(metric (ma mean) (mb mean))"}""")
    assert(auto.status === 200)
    assert(triples(auto.body \ "measures" \ "ma" \ "mean").size === 3)

    // start/stop query params slice the read window, as the
    // reference's post(self, start=None, stop=None, ...)
    // (gabbits/aggregates-with-metric-ids.yaml "with start/stop")
    val sliced = api.dispatch("POST", "/v1/aggregates",
      query = Map("start" -> "2014-01-01T00:05:00Z",
        "stop" -> "2014-01-01T00:09:59Z"),
      body = """{"operations": "(metric (ma mean) (mb mean))",
          "granularity": 300}""")
    assert(sliced.status === 200)
    assert(triples(sliced.body \ "measures" \ "ma" \ "mean")
      === List(("2014-01-01T00:05:00Z", 300.0, 2.0)))
    assert(triples(sliced.body \ "measures" \ "mb" \ "mean")
      === List(("2014-01-01T00:05:00Z", 300.0, 10.0)))

    // operations also arrive in the nested-LIST form
    // (OperationsSchema accepts both; gabbits/aggregates-with-metric-
    // ids.yaml uses it throughout) — a repeated ref dedupes in the
    // references block, and references carry archive_policy
    val listForm = api.dispatch("POST", "/v1/aggregates",
      query = Map("details" -> "true"), body =
      """{"operations": ["metric", ["ma", "mean"], ["mb", "mean"],
                         ["mb", "mean"]],
          "granularity": 300}""")
    assert(listForm.status === 200)
    assert(triples(listForm.body \ "measures" \ "ma" \ "mean").size === 3)
    val refs = (listForm.body \ "references").asInstanceOf[JArray].arr
    assert(refs.map(_ \ "id") === List(JString("ma"), JString("mb")))
    assert(refs.map(r => r \ "archive_policy" \ "name")
      === List(JString("pr"), JString("pr")))
    val listAgg = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": ["*", 2, ["aggregate", "mean",
            ["metric", ["ma", "mean"], ["mb", "mean"]]]],
          "granularity": 300}""")
    assert(triples(listAgg.body \ "measures" \ "aggregated").map(_._3)
      === List(2.0, 12.0, 23.0))
  }

  test("resource search route uses the filter DSL") {
    val api = newApi
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api2 = new RestApi(g)
    g.setResources(Seq(
      ("r1", "instance", "fr"), ("r2", "instance", "de"),
      ("r3", "volume", "fr")).toDF("id", "type", "zone"))
    val resp = api2.dispatch("POST", "/v1/search/resource/generic",
      body = """{"filter": "type = 'instance' and zone = 'fr'"}""")
    assert(resp.status === 200)
    assert(resp.body.asInstanceOf[JArray].arr.map(_ \ "id")
      === List(JString("r1")))
    // empty in-list rejects on both wire shapes (gabbits/search.yaml
    // "search empty in_" / "empty in_ query string" → 400)
    assert(api2.dispatch("POST", "/v1/search/resource/generic",
      body = """{"in": {"id": []}}""").status === 400)
    assert(api2.dispatch("POST", "/v1/search/resource/generic",
      query = Map("filter" -> "id in []")).status === 400)
    // ?filter= carries the string grammar on the search route
    // (gabbits/search.yaml "search in_ query string")
    val qf = api2.dispatch("POST", "/v1/search/resource/generic",
      query = Map("filter" -> "id in ['r1', 'r3']"))
    assert(qf.status === 200)
    assert(qf.body.asInstanceOf[JArray].arr.map(_ \ "id")
      === List(JString("r1"), JString("r3")))

    // the raw attribute-filter JSON tree is the same body's native
    // wire shape (rest/api.py:1381-1437)
    val tree = api2.dispatch("POST", "/v1/search/resource/generic",
      body = """{"and": [{"=": {"type": "instance"}},
                         {"in": {"zone": ["fr", "es"]}}]}""")
    assert(tree.status === 200)
    assert(tree.body.asInstanceOf[JArray].arr.map(_ \ "id")
      === List(JString("r1")))
    val neg = api2.dispatch("POST", "/v1/search/resource/generic",
      body = """{"not": {"like": {"zone": "f%"}}}""")
    assert(neg.body.asInstanceOf[JArray].arr.map(_ \ "id")
      === List(JString("r2")))
    // empty body matches every resource, as the reference
    assert(api2.dispatch("POST", "/v1/search/resource/generic")
      .body.asInstanceOf[JArray].arr.size === 3)
  }

  test("epoch-number timestamps are accepted on POST measures") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "s", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "m", "archive_policy_name": "s"}""")
    // 1388577601 = 2014-01-01T12:00:01Z
    assert(api.dispatch("POST", "/v1/metric/m/measures",
      body = """[{"timestamp": 1388577601, "value": 2.0},
                 {"timestamp": 1388577602.5, "value": 4.0}]""").status === 202)
    val got = api.dispatch("GET", "/v1/metric/m/measures",
      query = Map("refresh" -> "true"))
    assert(got.body.asInstanceOf[JArray].arr.map {
      case JArray(List(JString(t), _, JDouble(v))) => (t, v); case _ => fail()
    } === List(("2014-01-01T12:00:00Z", 3.0)))
  }

  test("influxdb line-protocol write route: parse, auto-create, stage") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "s", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "all", "metric_pattern": "*", "archive_policy_name": "s"}""")
    // ns timestamps; one string field (dropped), one tagged series
    val bodyLines =
      """cpu,host=h1 usage=0.5,label="x" 1388577601000000000
        |cpu,host=h1 usage=0.7 1388577602000000000
        |mem,host=h2,core=0 used=10i 1388577601000000000""".stripMargin
    val resp = api.dispatch("POST", "/v1/influxdb/write", body = bodyLines)
    assert(resp.status === 204)
    val st = api.dispatch("GET", "/v1/status")
    assert(st.body \ "storage" \ "summary" \ "measures" === JInt(3))
    val got = api.dispatch("GET", "/v1/metric/h1%2Fcpu.usage/measures",
      query = Map("refresh" -> "true"))
    assert(got.body.asInstanceOf[JArray].arr.map {
      case JArray(List(_, _, JDouble(v))) => v; case _ => fail()
    } === List(0.6)) // mean(0.5, 0.7) in one minute bucket
  }

  test("prometheus remote-write route decodes the real wire body") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "s", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "all", "metric_pattern": "*", "archive_policy_name": "s"}""")
    val body = org.xerial.snappy.Snappy.compress(
      graft.ingest.PromProto.encodeWriteRequest(Seq(
        graft.ingest.PromProto.Series(
          Map("__name__" -> "up", "job" -> "node", "instance" -> "i1"),
          Seq((1388577601000L, 1.0), (1388577662000L, 0.0))))))
    assert(api.dispatchBytes("POST", "/v1/prometheus/write",
      Map.empty, body).status === 202)
    val got = api.dispatch("GET", "/v1/metric/node@i1%2Fup/measures",
      query = Map("refresh" -> "true"))
    assert(got.body.asInstanceOf[JArray].arr.map {
      case JArray(List(JString(t), _, JDouble(v))) => (t, v); case _ => fail()
    } === List(("2014-01-01T12:00:00Z", 1.0), ("2014-01-01T12:01:00Z", 0.0)))
  }

  test("resource listing pagination and resource-type CRUD routes") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(
      ("r1", "fr"), ("r2", "de"), ("r3", "fr"), ("r4", "us"))
      .toDF("id", "zone"))
    // page 1: 2 rows sorted by zone desc then id; marker pages on id
    val p1 = api.dispatch("GET", "/v1/resource/generic",
      query = Map("sort" -> "zone:desc", "limit" -> "2"))
    assert(p1.body.asInstanceOf[JArray].arr.map(_ \ "id")
      === List(JString("r4"), JString("r1"))) // us, then fr (id tiebreak)
    val p2 = api.dispatch("GET", "/v1/resource/generic",
      query = Map("limit" -> "2", "marker" -> "r2"))
    assert(p2.body.asInstanceOf[JArray].arr.map(_ \ "id")
      === List(JString("r3"), JString("r4")))
    assert(api.dispatch("GET", "/v1/resource/generic/r3").body \ "zone"
      === JString("fr"))
    assert(api.dispatch("GET", "/v1/resource/generic/nope").status === 404)

    val rt = api.dispatch("POST", "/v1/resource_type", body =
      """{"name": "instance", "attributes": {
          "host": {"type": "string", "required": true, "max_length": 64},
          "cores": {"type": "number", "min": 1}}}""")
    assert(rt.status === 201)
    val got = api.dispatch("GET", "/v1/resource_type/instance")
    assert(got.body \ "attributes" \ "host" \ "max_length" === JInt(64))
    assert(got.body \ "attributes" \ "cores" \ "min" === JDouble(1.0))
    assert(api.dispatch("DELETE", "/v1/resource_type/instance").status === 204)
    assert(api.dispatch("GET", "/v1/resource_type/instance").status === 404)
  }

  test("legacy /v1/aggregation/resource route: body-is-filter-tree, " +
      "?filter=, groupby list, no-granularity = every common " +
      "granularity coarse->fine (gabbits/resource-aggregation.yaml)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "300"},
          {"granularity": "1"}], "aggregation_methods": ["mean", "max"]}""")
    // the gabbi fixture: three resources, shared user, projects A,A,B
    val vals = Map("m1" -> (43.1, 12.0), "m2" -> (23.0, 8.0),
      "m3" -> (230.0, 45.41))
    for ((m, (v1, v2)) <- vals) {
      api.dispatch("POST", "/v1/metric",
        body = s"""{"id": "$m", "archive_policy_name": "low"}""")
      api.dispatch("POST", s"/v1/metric/$m/measures", body =
        s"""[{"timestamp": "2015-03-06T14:33:57Z", "value": $v1},
             {"timestamp": "2015-03-06T14:34:12Z", "value": $v2}]""")
    }
    g.process()
    g.setResources(Seq(("r1", "A", "U"), ("r2", "A", "U"), ("r3", "B", "U"))
      .toDF("id", "project_id", "user_id"))
    g.setMetrics(Seq(("m1", "r1", "cpu.util"), ("m2", "r2", "cpu.util"),
      ("m3", "r3", "cpu.util")).toDF("metric_id", "resource_id", "name"))
    // groupby + body filter tree + NO granularity → both policy
    // granularities, coarse first (the gabbi golden values)
    val grouped = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu.util",
      query = Map("groupby" -> "project_id"),
      body = """{"=": {"user_id": "U"}}""")
    assert(grouped.status === 200)
    val arr = grouped.body.asInstanceOf[JArray].arr
    assert(arr.map(_ \ "group") === List(
      JObject("project_id" -> JString("A")),
      JObject("project_id" -> JString("B"))))
    def triples(i: Int) = (arr(i) \ "measures").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JArray].arr).map { t =>
        (t(1), t(2)) match {
          case (JDouble(gr), JDouble(v)) => (gr, v)
          case other => fail(s"bad triple tail: $other")
        }
      }
    def close(got: Seq[(Double, Double)], want: Seq[(Double, Double)]) =
      got.size == want.size && got.zip(want).forall { case ((g1, v1), (g2, v2)) =>
        g1 == g2 && math.abs(v1 - v2) < 1e-9 }
    // the gabbi golden values (aggregates-with-resources fixture data)
    assert(close(triples(0), Seq((300.0, 21.525), (1.0, 33.05), (1.0, 10.0))))
    assert(close(triples(1), Seq((300.0, 137.705), (1.0, 230.0), (1.0, 45.41))))
    // repeated groupby keys (comma-joined at the transport) and the
    // ?filter= string-DSL form
    val multi = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu.util",
      query = Map("groupby" -> "project_id,user_id",
        "filter" -> "user_id = 'U'", "granularity" -> "300"))
    assert(multi.body.asInstanceOf[JArray].arr.map(_ \ "group") === List(
      JObject("project_id" -> JString("A"), "user_id" -> JString("U")),
      JObject("project_id" -> JString("B"), "user_id" -> JString("U"))))
    // invalid groupby attribute → 400 (rest/api.py:1700-1703)
    val bad = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu.util",
      query = Map("groupby" -> "project_id,thisisdumb"))
    assert(bad.status === 400)
    assert((bad.body \ "description").asInstanceOf[JString].s
      .contains("Invalid groupby attribute"))
    // ungrouped + granularity → flat triples, as before
    val flat = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu.util",
      query = Map("granularity" -> "300"))
    val fv = flat.body.asInstanceOf[JArray].arr.map(t =>
      t.asInstanceOf[JArray].arr(2)).collect { case JDouble(v) => v }
    assert(fv.size === 1)
    assert(math.abs(fv.head - (27.55 + 15.5 + 137.705) / 3) < 1e-9)
    // ?resample re-buckets each metric with the SAME method before the
    // cross-metric reaggregation — max-of-maxes, not avg (r10 review).
    // With no ?reaggregation the cross-metric agg defaults to the FETCH
    // aggregation (rest/api.py:2021-2022): max across the maxes
    val rs = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu.util",
      query = Map("granularity" -> "1", "resample" -> "600",
        "aggregation" -> "max"))
    val rv = rs.body.asInstanceOf[JArray].arr.map(t =>
      t.asInstanceOf[JArray].arr(2)).collect { case JDouble(v) => v }
    assert(rv.size === 1)
    assert(math.abs(rv.head - 230.0) < 1e-9)
    // explicit ?reaggregation=mean restores the mean-across form
    val rsMean = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu.util",
      query = Map("granularity" -> "1", "resample" -> "600",
        "aggregation" -> "max", "reaggregation" -> "mean"))
    val rvMean = rsMean.body.asInstanceOf[JArray].arr.map(t =>
      t.asInstanceOf[JArray].arr(2)).collect { case JDouble(v) => v }
    assert(rvMean.size === 1)
    assert(math.abs(rvMean.head - (43.1 + 23.0 + 230.0) / 3) < 1e-9)
    // resample without an explicit granularity is ambiguous → 400
    assert(api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu.util",
      query = Map("resample" -> "600")).status === 400)
  }

  test("legacy aggregation carries the reference's full fill / " +
      "needed_overlap / trim-to-overlap contract (rest/api.py:2014-2131, " +
      "processor.py:200-220)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "two", "definition": [{"granularity": "300"},
          {"granularity": "60"}], "aggregation_methods": ["mean", "max"]}""")
    // a has two 60s buckets (12:00, 12:01); b only the first — 50%
    // overlap when both buckets are in range
    for ((m, pts) <- Seq(
        "a" -> Seq("2015-01-01T12:00:10Z" -> 10.0,
          "2015-01-01T12:01:10Z" -> 20.0),
        "b" -> Seq("2015-01-01T12:00:20Z" -> 30.0))) {
      api.dispatch("POST", "/v1/metric",
        body = s"""{"id": "$m", "archive_policy_name": "two"}""")
      api.dispatch("POST", s"/v1/metric/$m/measures", body =
        pts.map { case (t, v) => s"""{"timestamp": "$t", "value": $v}""" }
          .mkString("[", ",", "]"))
    }
    g.process()
    def vals(r: graft.rest.Response): Seq[(Double, Double)] =
      r.body.asInstanceOf[JArray].arr.map(_.asInstanceOf[JArray].arr)
        .map(t => (t(1), t(2)) match {
          case (JDouble(gr), JDouble(v)) => (gr, v)
          case other => fail(s"bad triple: $other")
        })
    // no fill, no bounds: the span TRIMS to the overlapping range
    // (processor.py:207-214) — only the complete 12:00 bucket survives
    val trimmedR = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "60"))
    assert(trimmedR.status === 200)
    assert(vals(trimmedR) === Seq((60.0, 20.0)))
    // an explicit stop keeps the partial tail bucket in the span →
    // 50% < the default needed_overlap=100 → 400 with the reference
    // message
    val under = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "60",
        "stop" -> "2015-01-01T12:05:00Z"))
    assert(under.status === 400)
    assert((under.body \ "description").asInstanceOf[JString].s
      .contains("datapoints overlap in this timespan (50.00%)"))
    // lowering needed_overlap admits the partial bucket: the 12:01
    // value aggregates nan-skipping (a alone)
    val loose = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "60",
        "stop" -> "2015-01-01T12:05:00Z", "needed_overlap" -> "50"))
    assert(loose.status === 200)
    assert(vals(loose) === Seq((60.0, 20.0), (60.0, 20.0)))
    // numeric fill pads b's missing bucket (and skips the overlap
    // check): mean(20, 0) = 10 at 12:01
    val filled = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "60", "fill" -> "0"))
    assert(vals(filled) === Seq((60.0, 20.0), (60.0, 10.0)))
    // ffill carries b's 12:00 value forward: mean(20, 30) = 25
    val ffilled = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "60",
        "fill" -> "ffill"))
    assert(vals(ffilled) === Seq((60.0, 20.0), (60.0, 25.0)))
    // granularity accepts the reference's to_timespan surface
    // (utils.py:138-150): float seconds and pytimeparse spans; garbage
    // is a 400 (gabbits/aggregation.yaml "granularity not float")
    assert(vals(api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "60.0")))
      === Seq((60.0, 20.0)))
    assert(vals(api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "1 minute")))
      === Seq((60.0, 20.0)))
    assert(api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "foobar"))
      .status === 400)
    assert(api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "-60"))
      .status === 400)
    // FillSchema rejection (rest/api.py:1941-1944) and the
    // needed_overlap number check (validate_qs)
    val badFill = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "60",
        "fill" -> "bogus"))
    assert(badFill.status === 400)
    assert((badFill.body \ "description").asInstanceOf[JString].s
      .contains("Must be a float, 'dropna', 'null', 'ffill'"))
    assert(api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "60",
        "needed_overlap" -> "many")).status === 400)
    // disjoint series with no fill → the reference's "No overlap";
    // needed_overlap=0 waives it and emits both partial buckets
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "c", "archive_policy_name": "two"}""")
    api.dispatch("POST", "/v1/metric/c/measures", body =
      """[{"timestamp": "2015-01-01T12:03:10Z", "value": 50.0}]""")
    g.process()
    val disjoint = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "b,c", "granularity" -> "60"))
    assert(disjoint.status === 400)
    assert((disjoint.body \ "description").asInstanceOf[JString].s
      .contains("No overlap"))
    val waived = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "b,c", "granularity" -> "60",
        "needed_overlap" -> "0"))
    assert(vals(waived) === Seq((60.0, 30.0), (60.0, 50.0)))
    // no granularity → EVERY common granularity, coarse→fine
    // (rest/api.py:2041-2058) — 300s first, then the 60s rows
    val all = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a", "aggregation" -> "max"))
    assert(vals(all) === Seq((300.0, 20.0), (60.0, 10.0), (60.0, 20.0)))
    // POST form: the id list rides in the JSON body (MetricIDsSchema,
    // rest/api.py:2133-2163 post_metric = get_metric)
    val posted = api.dispatch("POST", "/v1/aggregation/metric",
      query = Map("granularity" -> "60"), body = """["a", "b"]""")
    assert(posted.status === 200)
    assert(vals(posted) === Seq((60.0, 20.0)))
    // a granularity the policies never stored → 404 with the
    // reference's AggregationDoesNotExist message (gnocchi issue #148),
    // on the legacy door AND the aggregates DSL door
    val noGran = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "a,b", "granularity" -> "42"))
    assert(noGran.status === 404)
    assert((noGran.body \ "description").asInstanceOf[JString].s
      .contains("at granularity '42.0' for metric"))
    assert(api.dispatch("POST", "/v1/aggregates",
      body = """{"operations": "(metric a mean)",
        "granularity": 42}""").status === 404)
    // grouped route: a group whose resources own no matching metric
    // still appears, with empty measures (rest/api.py:1925-1937)
    g.setResources(Seq(("r1", "east"), ("r2", "east"), ("r3", "west"))
      .toDF("id", "zone"))
    g.setMetrics(Seq(("a", "r1", "cpu"), ("b", "r2", "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    val grouped = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu",
      query = Map("granularity" -> "60", "groupby" -> "zone"))
    val arr = grouped.body.asInstanceOf[JArray].arr
    assert(arr.map(_ \ "group") === List(
      JObject("zone" -> JString("east")), JObject("zone" -> JString("west"))))
    assert((arr(1) \ "measures").asInstanceOf[JArray].arr.isEmpty)
  }

  test("search-scoped /v1/aggregates without granularity returns every " +
      "common granularity coarse->fine, and resolved measure-less " +
      "metrics list as [] (gabbits/aggregates-with-resources.yaml " +
      "'batch get list')") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low2", "definition": [{"granularity": "300"},
          {"granularity": "1"}], "aggregation_methods": ["mean"]}""")
    for ((m, v) <- Seq("c1" -> 10.0, "c2" -> 30.0)) {
      api.dispatch("POST", "/v1/metric",
        body = s"""{"id": "$m", "archive_policy_name": "low2"}""")
      api.dispatch("POST", s"/v1/metric/$m/measures", body =
        s"""[{"timestamp": "2015-03-06T14:33:57Z", "value": $v}]""")
    }
    // idle exists on r1 but never receives measures
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "i1", "archive_policy_name": "low2"}""")
    g.process()
    g.setResources(Seq(("r1", "east"), ("r2", "west")).toDF("id", "zone"))
    g.setMetrics(Seq(("c1", "r1", "cpu.util"), ("c2", "r2", "cpu.util"),
      ("i1", "r1", "cpu.idle")).toDF("metric_id", "resource_id", "name"))
    def triples(v: JValue) = v.asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JArray].arr).map { t =>
        (t(1), t(2)) match {
          case (JDouble(gr), JDouble(x)) => (gr, x)
          case other => fail(s"bad triple: $other")
        }
      }
    // non-aggregated fan-out, NO granularity: coarse→fine per metric,
    // and the resolved-but-empty cpu.idle appears as []
    val fan = api.dispatch("POST", "/v1/aggregates", body =
      """{"search": "id like '%'",
          "operations": "(metric (cpu.util mean) (cpu.idle mean))"}""")
    assert(fan.status === 200)
    assert(triples(fan.body \ "measures" \ "r1" \ "cpu.util" \ "mean")
      === List((300.0, 10.0), (1.0, 10.0)))
    assert(triples(fan.body \ "measures" \ "r2" \ "cpu.util" \ "mean")
      === List((300.0, 30.0), (1.0, 30.0)))
    assert((fan.body \ "measures" \ "r1" \ "cpu.idle" \ "mean")
      === JArray(Nil))
    // aggregated scoped tree, NO granularity: one list coarse→fine
    val agg = api.dispatch("POST", "/v1/aggregates", body =
      """{"search": "id like '%'",
          "operations": "(aggregate mean (metric cpu.util mean))"}""")
    assert(agg.status === 200)
    assert(triples(agg.body \ "measures" \ "aggregated")
      === List((300.0, 20.0), (1.0, 20.0)))
    // grouped, NO granularity: per-group coarse→fine
    val grp = api.dispatch("POST", "/v1/aggregates",
      query = Map("groupby" -> "zone"), body =
      """{"search": "id like '%'",
          "operations": "(aggregate mean (metric cpu.util mean))"}""")
    assert(grp.status === 200)
    val arr = grp.body.asInstanceOf[JArray].arr
    assert(arr.map(_ \ "group") === List(
      JObject("zone" -> JString("east")), JObject("zone" -> JString("west"))))
    assert(triples(arr(0) \ "measures" \ "measures" \ "aggregated")
      === List((300.0, 10.0), (1.0, 10.0)))
    // the body's resource_type scopes the search when the catalog is
    // typed (FetchController resource_type="generic" default) — an
    // instance-scoped query must not see generic resources
    g.setResources(Seq(("r1", "east", "generic"), ("r2", "west", "instance"))
      .toDF("id", "zone", "type"))
    val typed = api.dispatch("POST", "/v1/aggregates", body =
      """{"search": "id like '%'", "resource_type": "instance",
          "operations": "(aggregate mean (metric cpu.util mean))",
          "granularity": 300}""")
    assert(typed.status === 200)
    assert(triples(typed.body \ "measures" \ "aggregated")
      === List((300.0, 30.0))) // c2 only — r1 is generic-typed
    // a leaf-less operations tree with search and no granularity is a
    // clean 400, not an empty-reduce crash
    assert(api.dispatch("POST", "/v1/aggregates", body =
      """{"search": "id like '%'", "operations": "(+ 1 1)"}""")
      .status === 400)
    // a sub-second body-JSON granularity must not silently floor to 0
    val subSec = api.dispatch("POST", "/v1/aggregates", body =
      """{"search": "id like '%'", "granularity": 0.5,
          "operations": "(aggregate mean (metric cpu.util mean))"}""")
    assert(subSec.status === 400)
    assert((subSec.body \ "description").asInstanceOf[JString].s
      .contains("sub-second"))
    // numeric groupby attributes order NUMERICALLY in the legacy
    // grouped response (the reference sorts typed attribute values:
    // 2 before 10, not '10' before '2')
    g.setResources(Seq(("r1", 10L), ("r2", 2L)).toDF("id", "rank"))
    val lg = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu.util",
      query = Map("granularity" -> "300", "groupby" -> "rank"))
    assert(lg.status === 200)
    assert(lg.body.asInstanceOf[JArray].arr.map(_ \ "group") === List(
      JObject("rank" -> JInt(2)), JObject("rank" -> JInt(10))))
  }

  test("over-stale lock holds count as lock_leaks in /v1/status " +
      "metricd statistics (misconfigured lockStaleMs is observable)") {
    val s = spark
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "300"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "lk1", "archive_policy_name": "low"}""")
    api.dispatch("POST", "/v1/metric/lk1/measures", body =
      """[{"timestamp": "2015-03-06T14:33:00Z", "value": 1.0}]""")
    val before = graft.ingest.MetricStore.lockLeaks.get()
    s.conf.set("spark.graft.ingest.lockStaleMs", "0")
    try g.process() // any real batch outlives a 0 ms staleness bound
    finally s.conf.unset("spark.graft.ingest.lockStaleMs")
    val st = api.dispatch("GET", "/v1/status")
    val leaks = (st.body \ "metricd" \ "statistics" \ "lock_leaks")
      .asInstanceOf[JInt].num
    assert(leaks >= BigInt(before + 1))
  }

  test("metric listing filters/sort/creator and search-route " +
      "pagination + attrs; invalid sort key/dir 400 " +
      "(gabbits/metric-list.yaml, pagination.yaml, search.yaml)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "first_archive", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric", creator = Some("jd"), body =
      """{"id": "disk.io.rate", "unit": "B/s",
          "archive_policy_name": "first_archive"}""")
    api.dispatch("POST", "/v1/metric", creator = Some("foobar"), body =
      """{"id": "cpu.util", "unit": "ns",
          "archive_policy_name": "first_archive"}""")
    def ids(resp: graft.rest.Response) = resp.body.asInstanceOf[JArray].arr.map(_ \ "id")
    assert(ids(api.dispatch("GET", "/v1/metric",
      query = Map("unit" -> "ns"))) === List(JString("cpu.util")))
    assert(ids(api.dispatch("GET", "/v1/metric",
      query = Map("creator" -> "jd"))) === List(JString("disk.io.rate")))
    assert(ids(api.dispatch("GET", "/v1/metric",
      query = Map("creator" -> "nobody"))) === Nil)
    assert(ids(api.dispatch("GET", "/v1/metric",
      query = Map("name" -> "disk.io.rate"))) === List(JString("disk.io.rate")))
    assert(ids(api.dispatch("GET", "/v1/metric",
      query = Map("archive_policy_name" -> "first_archive",
        "sort" -> "name:desc"))) ===
      List(JString("disk.io.rate"), JString("cpu.util")))
    // the next-page Link preserves the filters and sort (r10 review:
    // a bare marker link pages a different, unfiltered listing)
    val lk = api.dispatch("GET", "/v1/metric",
      query = Map("archive_policy_name" -> "first_archive",
        "sort" -> "name:desc", "limit" -> "1"))
    assert(ids(lk) === List(JString("disk.io.rate")))
    val link = lk.headers("Link")
    assert(link.contains("sort=name%3Adesc"))
    assert(link.contains("archive_policy_name=first_archive"))
    assert(link.contains("marker=disk.io.rate"))
    // creator rides the single-metric GET (gabbits/base.yaml
    // "$.creator: foobar")
    assert(api.dispatch("GET", "/v1/metric/cpu.util").body \ "creator"
      === JString("foobar"))
    // invalid sort dir / key → 400 (pagination.yaml)
    assert(api.dispatch("GET", "/v1/metric",
      query = Map("sort" -> "id:invalid")).status === 400)
    assert(api.dispatch("GET", "/v1/metric",
      query = Map("sort" -> "invalid:asc")).status === 400)
    assert(api.dispatch("GET", "/v1/metric",
      query = Map("marker" -> "nope")).status === 400)
    // resource listing with an unknown sort column → 400, not 500
    g.setResources(Seq(("r1", "east"), ("r2", "west")).toDF("id", "zone"))
    assert(api.dispatch("GET", "/v1/resource/generic",
      query = Map("sort" -> "invalid:asc")).status === 400)
    assert(api.dispatch("GET", "/v1/resource/generic",
      query = Map("sort" -> "id:invalid")).status === 400)
    // search route pages with sort+marker and projects with attrs
    val p1 = api.dispatch("POST", "/v1/search/resource/generic",
      query = Map("sort" -> "zone:desc", "limit" -> "1"))
    assert(ids(p1) === List(JString("r2")))
    val p2 = api.dispatch("POST", "/v1/search/resource/generic",
      query = Map("sort" -> "zone:desc", "limit" -> "1", "marker" -> "r2"))
    assert(ids(p2) === List(JString("r1")))
    val proj = api.dispatch("POST", "/v1/search/resource/generic",
      query = Map("attrs" -> "id,bogus"))
    assert(proj.body.asInstanceOf[JArray].arr.forall {
      case JObject(fields) => fields.map(_._1).toSet == Set("id")
      case _ => false
    })
  }

  test("root version document, healthcheck, resource index page, and " +
      "status?details=False (gabbits/base.yaml, healthcheck.yaml)") {
    val s = spark
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    val root = api.dispatch("GET", "/")
    assert((root.body \ "versions")(0) \ "id" === JString("v1.0"))
    assert((root.body \ "versions")(0) \ "status" === JString("CURRENT"))
    assert(api.dispatch("GET", "/healthcheck").status === 200)
    val idx = api.dispatch("GET", "/v1/resource/")
    assert(idx.body \ "generic" === JString("/v1/resource/generic"))
    val st = api.dispatch("GET", "/v1/status")
    assert((st.body \ "storage").asInstanceOf[JObject].obj.size === 2)
    val nodet = api.dispatch("GET", "/v1/status",
      query = Map("details" -> "False"))
    assert((nodet.body \ "storage").asInstanceOf[JObject].obj.size === 1)
    assert((nodet.body \ "metricd").asInstanceOf[JObject].obj.size === 2)
  }

  test("scoped+grouped aggregates route (search/groupby body form)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "300"}],
          "aggregation_methods": ["mean"]}""")
    for (m <- Seq("u1", "u2")) {
      api.dispatch("POST", "/v1/metric",
        body = s"""{"id": "$m", "archive_policy_name": "low"}""")
      api.dispatch("POST", s"/v1/metric/$m/measures", body =
        s"""[{"timestamp": "2015-03-06T14:33:00Z",
              "value": ${if (m == "u1") 10.0 else 30.0}}]""")
    }
    g.process()
    g.setResources(Seq(("r1", "east"), ("r2", "west")).toDF("id", "zone"))
    g.setMetrics(Seq(("u1", "r1", "mem.used"), ("u2", "r2", "mem.used"))
      .toDF("metric_id", "resource_id", "name"))
    val resp = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(aggregate sum (metric mem.used mean))",
          "granularity": 300,
          "search": "zone in ['east', 'west']",
          "groupby": ["zone"]}""")
    assert(resp.status === 200)
    // reference grouped shape (rest/aggregates/api.py:653-672 +
    // gabbits/aggregates-with-resources.yaml): a LIST of
    // {group: {...}, measures: {measures: {aggregated: [[ts,g,v]...]}}}
    val groups = resp.body.asInstanceOf[JArray].arr
    assert(groups.map(_ \ "group") === List(
      JObject("zone" -> JString("east")), JObject("zone" -> JString("west"))))
    assert(groups.map(e =>
        (e \ "measures" \ "measures" \ "aggregated").asInstanceOf[JArray]
          .arr.map(t => t.asInstanceOf[JArray].arr(2))) ===
      List(List(JDouble(10.0)), List(JDouble(30.0))))
    // details=true attaches each group's matched resources
    val det = api.dispatch("POST", "/v1/aggregates",
      query = Map("details" -> "true"), body =
      """{"operations": "(aggregate sum (metric mem.used mean))",
          "granularity": 300,
          "search": "zone in ['east', 'west']",
          "groupby": ["zone"]}""")
    assert(det.body.asInstanceOf[JArray].arr.map(e =>
        (e \ "measures" \ "references").asInstanceOf[JArray].arr
          .map(_ \ "id")) ===
      List(List(JString("r1")), List(JString("r2"))))
    // a window past every measure still returns the groups, with EMPTY
    // aggregated lists — the group list comes from the matched
    // resources, not the measures (api.py:653-672)
    val late = api.dispatch("POST", "/v1/aggregates",
      query = Map("start" -> "2020-01-01T00:00:00Z"), body =
      """{"operations": "(aggregate sum (metric mem.used mean))",
          "granularity": 300,
          "search": "zone in ['east', 'west']",
          "groupby": ["zone"]}""")
    assert(late.status === 200)
    assert(late.body.asInstanceOf[JArray].arr.map(e =>
        (e \ "measures" \ "measures" \ "aggregated")
          .asInstanceOf[JArray].arr.size) === List(0, 0))
    // a search matching nothing 404s with the referenced metric names
    // (api.py:602-606)
    val none = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(aggregate sum (metric mem.used mean))",
          "granularity": 300,
          "search": "zone = 'nowhere'",
          "groupby": ["zone"]}""")
    assert(none.status === 404)
  }

  test("use_history=true groups by the attribute's revision windows " +
      "(rest/aggregates/api.py:571-577)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "300"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "u1", "archive_policy_name": "low"}""")
    // one measure per revision side; the zone edge sits ON a bucket
    // boundary so each bucket lands wholly in one group
    api.dispatch("POST", "/v1/metric/u1/measures", body =
      """[{"timestamp": "2015-03-06T14:33:00Z", "value": 10.0},
          {"timestamp": "2015-03-06T14:36:00Z", "value": 30.0}]""")
    g.process()
    g.setMetrics(Seq(("u1", "r1", "load"))
      .toDF("metric_id", "resource_id", "name"))
    def t(x: String) = java.sql.Timestamp.from(java.time.Instant.parse(x))
    g.setResourceHistory(Seq(
      ("r1", "east", t("2015-03-06T00:00:00Z"),
        Option(t("2015-03-06T14:35:00Z"))),
      ("r1", "west", t("2015-03-06T14:35:00Z"),
        Option.empty[java.sql.Timestamp]))
      .toDF("id", "zone", "revision_start", "revision_end"))
    val resp = api.dispatch("POST", "/v1/aggregates",
      query = Map("use_history" -> "true"),
      body = """{"operations": "(aggregate mean (metric load mean))",
          "granularity": 300,
          "search": "zone in ['east', 'west']",
          "groupby": ["zone"]}""")
    assert(resp.status === 200)
    val groups = resp.body.asInstanceOf[JArray].arr
    assert(groups.map(_ \ "group") === List(
      JObject("zone" -> JString("east")), JObject("zone" -> JString("west"))))
    assert(groups.map(e =>
        (e \ "measures" \ "measures" \ "aggregated").asInstanceOf[JArray]
          .arr.map(t => t.asInstanceOf[JArray].arr(2))) ===
      List(List(JDouble(10.0)), List(JDouble(30.0))))
  }

  test("use_history=true takes a groupby LIST and an arbitrary " +
      "aggregated tree (Grouper, rest/aggregates/api.py:674-682; " +
      "group key tuple :191-194); edge-straddling buckets weight " +
      "fractionally") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "300"}],
          "aggregation_methods": ["mean"]}""")
    for (m <- Seq("u1", "u2")) {
      api.dispatch("POST", "/v1/metric",
        body = s"""{"id": "$m", "archive_policy_name": "low"}""")
      // one measure per 5-min bucket at :30, :35, :40
      api.dispatch("POST", s"/v1/metric/$m/measures", body =
        s"""[{"timestamp": "2015-03-06T14:30:00Z", "value": 10.0},
             {"timestamp": "2015-03-06T14:35:00Z", "value": 20.0},
             {"timestamp": "2015-03-06T14:40:00Z", "value": 40.0}]""")
    }
    g.process()
    g.setMetrics(Seq(("u1", "r1", "load"), ("u2", "r1", "temp"))
      .toDF("metric_id", "resource_id", "name"))
    def t(x: String) = java.sql.Timestamp.from(java.time.Instant.parse(x))
    // zone flips MID-BUCKET (14:37:30) → that bucket splits 50/50; env
    // is the second groupby attribute and never changes
    g.setResourceHistory(Seq(
      ("r1", "east", "prod", t("2015-03-06T00:00:00Z"),
        Option(t("2015-03-06T14:37:30Z"))),
      ("r1", "west", "prod", t("2015-03-06T14:37:30Z"),
        Option.empty[java.sql.Timestamp]))
      .toDF("id", "zone", "env", "revision_start", "revision_end"))
    val resp = api.dispatch("POST", "/v1/aggregates",
      query = Map("use_history" -> "true"),
      body = """{"operations":
            "(+ (aggregate mean (metric load mean)) (aggregate mean (metric temp mean)))",
          "granularity": 300,
          "search": "env = 'prod'",
          "groupby": ["zone", "env"]}""")
    assert(resp.status === 200)
    val groups = resp.body.asInstanceOf[JArray].arr
    // groupby attrs are sorted (api.py:557): key order env, zone
    assert(groups.map(_ \ "group") === List(
      JObject("env" -> JString("prod"), "zone" -> JString("east")),
      JObject("env" -> JString("prod"), "zone" -> JString("west"))))
    def triples(i: Int) =
      (groups(i) \ "measures" \ "measures" \ "aggregated")
        .asInstanceOf[JArray].arr.map(_.asInstanceOf[JArray].arr)
    // tree value per bucket = load + temp = 20, 40, 80
    // east: [14:30 full) 20, [14:35 half) 40*0.5=20
    assert(triples(0).map(x => (x(0), x(2))) === List(
      (JString("2015-03-06T14:30:00Z"), JDouble(20.0)),
      (JString("2015-03-06T14:35:00Z"), JDouble(20.0))))
    // west: [14:35 half) 40*0.5=20, [14:40 full) 80
    assert(triples(1).map(x => (x(0), x(2))) === List(
      (JString("2015-03-06T14:35:00Z"), JDouble(20.0)),
      (JString("2015-03-06T14:40:00Z"), JDouble(80.0))))
  }

  test("search-scoped non-aggregated aggregates fan out per resource " +
      "(_get_measures_by_name -> processor r_output)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "300"}],
          "aggregation_methods": ["mean"]}""")
    for ((m, v) <- Seq(("u1", 10.0), ("u2", 30.0), ("u3", 7.0))) {
      api.dispatch("POST", "/v1/metric",
        body = s"""{"id": "$m", "archive_policy_name": "low"}""")
      api.dispatch("POST", s"/v1/metric/$m/measures", body =
        s"""[{"timestamp": "2015-03-06T14:33:00Z", "value": $v}]""")
    }
    g.process()
    g.setResources(Seq(("r1", "east"), ("r2", "west"), ("r3", "north"))
      .toDF("id", "zone"))
    // r1 carries mem.used + cpu.util; r2 carries mem.used; metric
    // leaves are NAME wildcards fnmatched per resource
    g.setMetrics(Seq(("u1", "r1", "mem.used"), ("u2", "r2", "mem.used"),
      ("u3", "r1", "cpu.util")).toDF("metric_id", "resource_id", "name"))
    val resp = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(metric (mem.used mean) (cpu.* mean))",
          "granularity": 300,
          "search": "zone in ['east', 'west']"}""")
    assert(resp.status === 200)
    def one(rid: String, met: String) =
      (resp.body \ "measures" \ rid \ met \ "mean").asInstanceOf[JArray]
        .arr.map { case JArray(List(_, JDouble(gr), JDouble(v))) =>
          assert(gr === 300.0); v
        case other => fail(s"bad triple $other") }
    assert(one("r1", "mem.used") === List(10.0))
    assert(one("r1", "cpu.util") === List(7.0))
    assert(one("r2", "mem.used") === List(30.0))
    // r2 has no cpu.* metric and r3 is outside the search scope
    assert(resp.body \ "measures" \ "r2" \ "cpu.util" === JNothing)
    assert(resp.body \ "measures" \ "r3" === JNothing)
    // nothing resolves → 404 NoSuchMetric, as the reference
    assert(api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(metric ghost.* mean)", "granularity": 300,
          "search": "zone = 'east'"}""").status === 404)
    // details=true attaches the matched resources (api.py:708-709)
    val det = api.dispatch("POST", "/v1/aggregates",
      query = Map("details" -> "true"), body =
      """{"operations": "(metric (mem.used mean) (cpu.* mean))",
          "granularity": 300, "search": "zone in ['east', 'west']"}""")
    assert((det.body \ "references").asInstanceOf[JArray].arr
      .map(_ \ "id").toSet === Set(JString("r1"), JString("r2")))
  }

  test("policy/rule/metric listing + delete routes") {
    val api = newApi
    for (n <- Seq("b-pol", "a-pol"))
      api.dispatch("POST", "/v1/archive_policy", body =
        s"""{"name": "$n", "definition": [{"granularity": "60"}]}""")
    // name-sorted, alongside the reference's default presets
    // (low/medium/high/bool, archive_policy.py DEFAULT_ARCHIVE_POLICIES)
    val ls = api.dispatch("GET", "/v1/archive_policy")
    val names = ls.body.asInstanceOf[JArray].arr.map(_ \ "name")
    assert(names.filter(n => n == JString("a-pol") || n == JString("b-pol"))
      === List(JString("a-pol"), JString("b-pol")))
    assert(names.contains(JString("low")) && names.contains(JString("bool")))

    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"metric_pattern": "disk.*", "archive_policy_name": "a-pol"}""")
    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"metric_pattern": "*", "archive_policy_name": "b-pol"}""")
    // precedence order: longest pattern first
    assert(api.dispatch("GET", "/v1/archive_policy_rule").body
      .asInstanceOf[JArray].arr.map(_ \ "metric_pattern")
      === List(JString("disk.*"), JString("*")))
    assert(api.dispatch("GET", "/v1/archive_policy_rule/disk.*")
      .body \ "archive_policy_name" === JString("a-pol"))
    assert(api.dispatch("GET", "/v1/archive_policy_rule/none").status === 404)

    // named rules + PATCH rename (gabbits/archive-rule.yaml): name is
    // the route key and the only mutable field; missing/taken → 400
    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "rule3", "metric_pattern": "net.*",
          "archive_policy_name": "a-pol"}""")
    assert(api.dispatch("PATCH", "/v1/archive_policy_rule/rule3")
      .status === 400) // missing name in body
    val ren = api.dispatch("PATCH", "/v1/archive_policy_rule/rule3",
      body = """{"name": "rule3_renamed"}""")
    assert(ren.status === 200)
    assert(ren.body \ "metric_pattern" === JString("net.*"))
    assert(api.dispatch("GET", "/v1/archive_policy_rule/rule3")
      .status === 404)
    assert(api.dispatch("GET", "/v1/archive_policy_rule/rule3_renamed")
      .body \ "archive_policy_name" === JString("a-pol"))
    // rename onto a taken name → 400 with the reference's message
    val taken = api.dispatch("PATCH", "/v1/archive_policy_rule/*",
      body = """{"name": "rule3_renamed"}""")
    assert(taken.status === 400)
    assert((taken.body \ "description").asInstanceOf[JString].s
      .contains("already exists"))
    // duplicate CREATE under one name → 409
    // (ArchivePolicyRuleAlreadyExists, rest/api.py:403-404)
    assert(api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "rule3_renamed", "metric_pattern": "x.*",
          "archive_policy_name": "a-pol"}""").status === 409)
    assert(api.dispatch("DELETE", "/v1/archive_policy_rule/rule3_renamed")
      .status === 204)

    api.dispatch("POST", "/v1/metric",
      body = """{"id": "disk.io", "archive_policy_name": "a-pol"}""")
    // policy in use → 400; rule delete + unused policy delete → 204
    assert(api.dispatch("DELETE", "/v1/archive_policy/a-pol").status === 400)
    assert(api.dispatch("DELETE", "/v1/archive_policy_rule/disk.*")
      .status === 204)
    assert(api.dispatch("DELETE", "/v1/archive_policy/b-pol").status === 204)
    assert(api.dispatch("DELETE", "/v1/archive_policy/b-pol").status === 404)

    // metric listing pages on the id marker; detail embeds the policy
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "cpu.util", "archive_policy_name": "a-pol"}""")
    val m1 = api.dispatch("GET", "/v1/metric", query = Map("limit" -> "1"))
    assert(m1.body.asInstanceOf[JArray].arr.map(_ \ "id")
      === List(JString("cpu.util")))
    val m2 = api.dispatch("GET", "/v1/metric",
      query = Map("marker" -> "cpu.util"))
    assert(m2.body.asInstanceOf[JArray].arr.map(_ \ "id")
      === List(JString("disk.io")))
    assert(api.dispatch("GET", "/v1/metric/disk.io").body \
      "archive_policy" \ "name" === JString("a-pol"))
    assert(api.dispatch("GET", "/v1/metric/ghost").status === 404)
  }

  test("batch metrics measures route: unknown ids 400 with the list") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "p", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "m1", "archive_policy_name": "p"}""")
    val bad = api.dispatch("POST", "/v1/batch/metrics/measures", body =
      """{"m1": [{"timestamp": "2014-01-01T12:00:00Z", "value": 1}],
          "ghost": [{"timestamp": "2014-01-01T12:00:00Z", "value": 2}]}""")
    assert(bad.status === 400)
    assert((bad.body \ "description").asInstanceOf[JString].s.contains("ghost"))
    assert(api.dispatch("POST", "/v1/batch/metrics/measures", body =
      """{"m1": [{"timestamp": "2014-01-01T12:00:00Z", "value": 1},
                 {"timestamp": "2014-01-01T12:00:30Z", "value": 3}]}""")
      .status === 202)
    val got = api.dispatch("GET", "/v1/metric/m1/measures",
      query = Map("refresh" -> "true"))
    assert(got.body.asInstanceOf[JArray].arr.map {
      case JArray(List(_, _, JDouble(v))) => v; case _ => fail()
    } === List(2.0))
  }

  test("resource row CRUD with history end-dating") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r1", "fr", 2.0)).toDF("id", "zone", "weight"))
    g.setResourceHistory(Seq.empty[(String, String, Double,
      java.sql.Timestamp)].toDF("id", "zone", "weight", "revision_end"))

    // create: catalog-schema fill, duplicate 409
    assert(api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "r2", "zone": "de"}""").status === 201)
    assert(api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "r2", "zone": "de"}""").status === 409)
    assert(api.dispatch("GET", "/v1/resource/generic/r2").body \ "zone"
      === JString("de"))

    // patch: value updated in place, OLD row end-dated into history
    val patched = api.dispatch("PATCH", "/v1/resource/generic/r1",
      query = Map("now" -> "1700000000"),
      body = """{"zone": "us", "weight": 5}""")
    assert(patched.status === 200)
    assert(patched.body \ "zone" === JString("us"))
    assert(patched.body \ "weight" === JDouble(5.0))
    assert(api.dispatch("PATCH", "/v1/resource/generic/ghost",
      body = """{"zone": "x"}""").status === 404)
    assert(api.dispatch("PATCH", "/v1/resource/generic/r1",
      body = """{"nope": 1}""").status === 400)

    // delete: row gone, 404 after
    assert(api.dispatch("DELETE", "/v1/resource/generic/r2").status === 204)
    assert(api.dispatch("GET", "/v1/resource/generic/r2").status === 404)
    assert(api.dispatch("DELETE", "/v1/resource/generic/r2").status === 404)
  }

  test("resource POST/PATCH ResourceSchema surface: inline metrics, " +
      "extra-keys 400, revision only when a value changes " +
      "(gabbits/resource.yaml; rest/api.py:1060-1069, utils.py:358-370)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r0", "seed", null: java.sql.Timestamp))
      .toDF("id", "user_id", "revision_start"))
    g.setResourceHistory(Seq.empty[(String, String, java.sql.Timestamp,
      java.sql.Timestamp)]
      .toDF("id", "user_id", "revision_start", "revision_end"))
    assert(api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "medium", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""",
      creator = Some("admin")).status === 201)

    // unknown body key → the voluptuous extra-keys 400
    val extra = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "rx", "nope": 1}""")
    assert(extra.status === 400)
    assert(jstrOf(extra.body \ "description")
      .contains("extra keys not allowed @ data['nope']"))

    // create with an empty metrics dict → 201 and $.metrics == {}
    val c = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "res-a", "user_id": "u1", "metrics": {}}""")
    assert(c.status === 201)
    assert(c.body \ "metrics" === JObject(Nil))

    // inline-metric failures are ATOMIC — no resource row lands.
    // slash name (rest/api.py:604-606):
    val slash = api.dispatch("POST", "/v1/resource/generic", body =
      """{"id": "res-b",
          "metrics": {"disk/iops": {"archive_policy_name": "medium"}}}""")
    assert(slash.status === 400)
    assert(jstrOf(slash.body \ "description") ===
      "'/' is not supported in metric name")
    assert(api.dispatch("GET", "/v1/resource/generic/res-b").status === 404)
    // unknown existing-metric uuid:
    val ghost = api.dispatch("POST", "/v1/resource/generic", body =
      """{"id": "res-b",
          "metrics": {"cpu": "00000000-0000-0000-0000-000000000000"}}""")
    assert(ghost.status === 400)
    assert(jstrOf(ghost.body \ "description").contains("does not exist"))
    assert(api.dispatch("GET", "/v1/resource/generic/res-b").status === 404)
    // unknown policy, and no matching R9 rule:
    assert(api.dispatch("POST", "/v1/resource/generic", body =
      """{"id": "res-b",
          "metrics": {"cpu": {"archive_policy_name": "noexist"}}}""")
      .status === 400)
    val norule = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "res-b", "metrics": {"cpu": {}}}""")
    assert(norule.status === 400)
    assert(jstrOf(norule.body \ "description").contains(
      "No archive policy name specified and no archive policy rule found"))

    // create WITH an inline metric: response and single GET embed it
    val ok1 = api.dispatch("POST", "/v1/resource/generic", body =
      """{"id": "res-b",
          "metrics": {"disk.iops": {"archive_policy_name": "medium"}}}""")
    assert(ok1.status === 201)
    val mid = jstrOf(ok1.body \ "metrics" \ "disk.iops")
    assert(mid.nonEmpty)
    assert(api.dispatch("GET", "/v1/resource/generic/res-b")
      .body \ "metrics" \ "disk.iops" === JString(mid))

    // attach an EXISTING free-standing metric by uuid at create time
    assert(api.dispatch("POST", "/v1/metric", body =
      """{"id": "5a301761-bbbb-46e2-8900-8b4f6fe6675a",
          "archive_policy_name": "medium"}""").status === 201)
    val okAttach = api.dispatch("POST", "/v1/resource/generic", body =
      """{"id": "res-d",
          "metrics": {"cpu": "5a301761-bbbb-46e2-8900-8b4f6fe6675a"}}""")
    assert(okAttach.status === 201)
    assert(okAttach.body \ "metrics" \ "cpu" ===
      JString("5a301761-bbbb-46e2-8900-8b4f6fe6675a"))

    // ---- PATCH: revision bookkeeping + metric REPLACE semantics ----
    val cc = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "res-c", "user_id": "u2"}""")
    assert(cc.status === 201)
    def histSize: Int = api.dispatch("GET",
      "/v1/resource/generic/res-c/history")
      .body.asInstanceOf[JArray].arr.size
    val p1 = api.dispatch("PATCH", "/v1/resource/generic/res-c",
      query = Map("now" -> "1700000000"), body = """{"user_id": "foobar"}""")
    assert(p1.status === 200 && p1.body \ "user_id" === JString("foobar"))
    assert(histSize === 1) // one end-dated revision
    // same-value patch: no useless revision, revision_start untouched
    val p2 = api.dispatch("PATCH", "/v1/resource/generic/res-c",
      query = Map("now" -> "1700000100"), body = """{"user_id": "foobar"}""")
    assert(p2.status === 200)
    assert(p2.body \ "revision_start" === p1.body \ "revision_start")
    assert(histSize === 1)
    // metrics-only patch: metric set changes, NO revision
    // (is_resource_revision_needed skips the metrics key)
    val pm = api.dispatch("PATCH", "/v1/resource/generic/res-c", body =
      """{"metrics": {"disk.iops": {"archive_policy_name": "medium"}}}""")
    assert(pm.status === 200)
    assert(jstrOf(pm.body \ "metrics" \ "disk.iops").nonEmpty)
    assert(histSize === 1)
    // a bad metrics map patches NOTHING (validate-before-detach)
    val pbad = api.dispatch("PATCH", "/v1/resource/generic/res-c", body =
      """{"user_id": "never",
          "metrics": {"x": "00000000-0000-0000-0000-000000000000"}}""")
    assert(pbad.status === 400)
    val after = api.dispatch("GET", "/v1/resource/generic/res-c")
    assert(after.body \ "user_id" === JString("foobar"))
    assert(jstrOf(after.body \ "metrics" \ "disk.iops").nonEmpty)
    // REPLACE: a rule-resolved metric swaps the whole named set
    assert(api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "io-rule", "metric_pattern": "disk.io.*",
          "archive_policy_name": "medium"}""",
      creator = Some("admin")).status === 201)
    val pr = api.dispatch("PATCH", "/v1/resource/generic/res-c",
      body = """{"metrics": {"disk.io.rate": {}}}""")
    assert(pr.status === 200)
    assert(pr.body \ "metrics" \ "disk.iops" === JNothing)
    assert(jstrOf(pr.body \ "metrics" \ "disk.io.rate").nonEmpty)
    // patching `id` is the schema's extra-keys 400 (gabbi pins
    // detail: ["id"])
    val pid = api.dispatch("PATCH", "/v1/resource/generic/res-c",
      body = """{"id": "foobar"}""")
    assert(pid.status === 400)
    assert(jstrOf(pid.body \ "description")
      .contains("extra keys not allowed @ data['id']"))
    // "{}" is an existence check: 200, current state echoed
    val pe = api.dispatch("PATCH", "/v1/resource/generic/res-c",
      body = "{}")
    assert(pe.status === 200)
    assert(pe.body \ "user_id" === JString("foobar"))
    assert(jstrOf(pe.body \ "metrics" \ "disk.io.rate").nonEmpty)
    assert(api.dispatch("PATCH", "/v1/resource/generic/nothere",
      body = "{}").status === 404)
  }

  test("catalog mutators are thread-safe under the multi-threaded " +
      "door: concurrent creates and same-row patches lose nothing") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r0", "z0", 0.0)).toDF("id", "zone", "weight"))
    g.setResourceHistory(Seq.empty[(String, String, Double,
      java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("id", "zone", "weight", "revision_start", "revision_end"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      // 16 concurrent creates: every one must land (a lost update
      // would silently drop a whole row)
      val creates = (1 to 16).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = api.dispatch("POST", "/v1/resource/generic",
            body = s"""{"id": "c$i", "zone": "z"}""").status
        })
      }
      assert(creates.map(_.get()).count(_ == 201) === 16)
      assert(g.searchResources("zone = \"z\"").count() === 16)
      // 8 concurrent patches of ONE row with distinct values: each
      // change end-dates a revision — a lost update shows as a
      // missing history row
      val patches = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = api.dispatch("PATCH", "/v1/resource/generic/r0",
            query = Map("now" -> (1700000000L + i).toString),
            body = s"""{"weight": $i.5}""").status
        })
      }
      assert(patches.map(_.get()).count(_ == 200) === 8)
      assert(g.resourceHistory("r0").count() === 8)
    } finally pool.shutdown()
  }

  test("measure timestamps: relative timespans accepted, format fixed " +
      "by the first element (utils.to_timestamps:86-123; gabbits/" +
      "metric-timestamp-format.yaml)") {
    val g = new graft.api.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    assert(api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "cookies", "definition": [{"granularity": "1"}],
          "aggregation_methods": ["mean"]}""",
      creator = Some("admin")).status === 201)
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "mrel", "archive_policy_name": "cookies"}""")
      .status === 201)
    // relative timestamp lands now-anchored (pytimeparse fallback)
    assert(api.dispatch("POST", "/v1/metric/mrel/measures", body =
      """[{"timestamp": "-5 minutes", "value": 43.1}]""").status === 202)
    val got = api.dispatch("GET", "/v1/metric/mrel/measures",
      query = Map("refresh" -> "true"))
    val vals = got.body.asInstanceOf[JArray].arr.map {
      case JArray(List(_, _, JDouble(v))) => v; case other => fail(s"$other")
    }
    assert(vals === List(43.1))
    // a batch whose FIRST stamp is epoch rejects a relative follower
    // (the gabbi's mixed-timestamps 400)
    assert(api.dispatch("POST", "/v1/metric/mrel/measures", body =
      """[{"timestamp": 1478012832, "value": 43.1},
          {"timestamp": "-5 minutes", "value": 43.1}]""").status === 400)
    // and an ISO batch rejects a relative follower
    assert(api.dispatch("POST", "/v1/metric/mrel/measures", body =
      """[{"timestamp": "2015-03-06T14:33:57Z", "value": 1.0},
          {"timestamp": "2h32m", "value": 2.0}]""").status === 400)
    // compact multi-segment timespans parse ("2h32m" = 9120 s)
    assert(api.dispatch("POST", "/v1/metric/mrel/measures", body =
      """[{"timestamp": "-2h32m", "value": 7.0}]""").status === 202)
  }

  test("POST /v1/metric with resource_id attaches a NAMED metric " +
      "(gabbits/create-metric-with-resource-id.yaml; MetricSchema " +
      "rest/api.py:596,622-632)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq.empty[(String, String, String)]
      .toDF("id", "creator", "original_resource_id"))
    g.setResourceHistory(Seq.empty[(String, String, String,
      java.sql.Timestamp)]
      .toDF("id", "creator", "original_resource_id", "revision_end"))
    assert(api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "medium", "definition": [{"granularity": "1"}],
          "aggregation_methods": ["mean"]}""",
      creator = Some("admin")).status === 201)
    assert(api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "foobar"}""", creator = Some("foobar"))
      .status === 201)

    val c = api.dispatch("POST", "/v1/metric", body =
      """{"resource_id": "foobar", "archive_policy_name": "medium",
          "name": "cpu"}""", creator = Some("foobar"))
    assert(c.status === 201)
    // the resource id transforms under the creator — the gabbi pins
    // this exact uuid5
    assert(c.body \ "resource_id" ===
      JString("2fbfbb20-8d56-5e1e-afb9-b3007da11fdf"))
    assert(c.body \ "name" === JString("cpu"))
    assert(c.body \ "creator" === JString("foobar"))
    assert(c.body \ "archive_policy_name" === JString("medium"))
    // listed under the resource's named metrics
    val listed = api.dispatch("GET", "/v1/resource/generic/foobar/metric",
      creator = Some("foobar"))
    assert(listed.body.asInstanceOf[JArray].arr.exists(m =>
      m \ "name" === JString("cpu")))

    // duplicate (resource, name) on THIS door is 400 (abort(400,
    // NamedMetricAlreadyExists), rest/api.py:665-666), not the named
    // door's 409
    val dup = api.dispatch("POST", "/v1/metric", body =
      """{"resource_id": "foobar", "archive_policy_name": "medium",
          "name": "cpu"}""", creator = Some("foobar"))
    assert(dup.status === 400)
    assert(jstrOf(dup.body \ "description")
      .contains("Named metric cpu already exists"))

    // resource_id without a name is the reference's attribute error
    val noname = api.dispatch("POST", "/v1/metric", body =
      """{"resource_id": "foobar", "archive_policy_name": "medium"}""",
      creator = Some("foobar"))
    assert(noname.status === 400)
    assert(jstrOf(noname.body \ "description")
      .contains("Name cannot be null if resource_id is not null"))
  }

  test("resource metric list/append, history, and resource-type listing " +
      "routes") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r1", "fr")).toDF("id", "zone"))
    g.setResourceHistory(Seq(
      ("r1", "de", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      ("r1", "fr", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "zone", "revision_start", "revision_end"))
    g.setMetrics(Seq(("m0", "cpu", "r1"))
      .toDF("metric_id", "name", "resource_id"))
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "back_window": 0, "aggregation_methods": ["mean"],
          "definition": [{"granularity": "300", "points": 100}]}""")
    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "all", "metric_pattern": "*",
          "archive_policy_name": "low"}""")

    // list: the pre-registered named metric
    val l0 = api.dispatch("GET", "/v1/resource/generic/r1/metric")
    assert(l0.status === 200)
    assert(l0.body === JArray(List(JObject(List(
      "name" -> JString("cpu"), "id" -> JString("m0"))))))

    // append two, one with an explicit policy
    val ap = api.dispatch("POST", "/v1/resource/generic/r1/metric", body =
      """{"mem": {"archive_policy_name": "low"}, "disk": null}""")
    assert(ap.status === 201)
    val names = api.dispatch("GET", "/v1/resource/generic/r1/metric").body
      .asInstanceOf[JArray].arr.map(m => jstrOf(m \ "name"))
    assert(names === List("cpu", "disk", "mem"))
    // collision → 409; unknown resource → 404
    assert(api.dispatch("POST", "/v1/resource/generic/r1/metric",
      body = """{"cpu": null}""").status === 409)
    assert(api.dispatch("POST", "/v1/resource/generic/ghost/metric",
      body = """{"x": null}""").status === 404)
    // the appended metric resolves through the named-metric read route
    assert(api.dispatch("GET",
      "/v1/resource/generic/r1/metric/mem/measures",
      query = Map("granularity" -> "300")).status === 200)

    // history: both revisions, in revision order
    val h = api.dispatch("GET", "/v1/resource/generic/r1/history")
    assert(h.status === 200)
    val zones = h.body.asInstanceOf[JArray].arr.map(r => jstrOf(r \ "zone"))
    assert(zones === List("de", "fr"))

    // resource-type listing includes generic + registered types
    api.dispatch("POST", "/v1/resource_type", body =
      """{"name": "vm", "attributes": {}}""")
    val tl = api.dispatch("GET", "/v1/resource_type")
    assert(tl.status === 200)
    assert(tl.body.asInstanceOf[JArray].arr.map(t => jstrOf(t \ "name"))
      .contains("vm"))
  }

  test("resource-type PATCH applies attribute add/remove with backfill") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r1", "fr")).toDF("id", "zone"))
    api.dispatch("POST", "/v1/resource_type", body =
      """{"name": "instance", "attributes": {
          "zone": {"type": "string", "required": true}}}""")
    val p = api.dispatch("PATCH", "/v1/resource_type/instance", body =
      """[{"op": "add", "path": "/attributes/flavor",
           "value": {"type": "string", "required": true,
                     "options": {"fill": "small"}}},
          {"op": "remove", "path": "/attributes/zone"}]""")
    assert(p.status === 200)
    assert(p.body \ "attributes" \ "flavor" \ "type" === JString("string"))
    assert(p.body \ "attributes" \ "zone" === JNothing)
    // the backfill reached the registered resource table
    assert(api.dispatch("GET", "/v1/resource/generic/r1").body \ "flavor"
      === JString("small"))
  }

  test("resource-named-metric measures and legacy aggregation routes") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "p", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    for ((m, v) <- Seq("u1" -> 10.0, "u2" -> 30.0)) {
      api.dispatch("POST", "/v1/metric",
        body = s"""{"id": "$m", "archive_policy_name": "p"}""")
      api.dispatch("POST", s"/v1/metric/$m/measures", body =
        s"""[{"timestamp": "2014-01-01T12:00:00Z", "value": $v},
             {"timestamp": "2014-01-01T12:02:00Z", "value": ${v + 2}}]""")
    }
    g.process()
    g.setMetrics(Seq(("u1", "r1", "mem.used"), ("u2", "r2", "mem.used"))
      .toDF("metric_id", "resource_id", "name"))

    val viaRes = api.dispatch("GET",
      "/v1/resource/generic/r2/metric/mem.used/measures")
    assert(viaRes.status === 200)
    assert(viaRes.body.asInstanceOf[JArray].arr.map {
      case JArray(List(_, _, JDouble(v))) => v; case _ => fail()
    } === List(30.0, 32.0))
    assert(api.dispatch("GET",
      "/v1/resource/generic/r2/metric/ghost/measures").status === 404)

    // legacy mean-across-metrics, then a stop slice
    val agg = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "u1,u2", "aggregation" -> "mean",
        "granularity" -> "60"))
    assert(agg.body.asInstanceOf[JArray].arr.map {
      case JArray(List(_, _, JDouble(v))) => v; case _ => fail()
    } === List(20.0, 22.0))
    val sliced = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "u1,u2", "granularity" -> "60",
        "stop" -> "2014-01-01T12:01:00Z"))
    assert(sliced.body.asInstanceOf[JArray].arr.size === 1)

    // legacy resource-scoped form: named metric across searched
    // resources; empty body = all resources
    g.setResources(Seq(("r1", "east"), ("r2", "west")).toDF("id", "zone"))
    val scoped = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/mem.used",
      query = Map("granularity" -> "60"),
      body = """{"filter": "zone = 'west'"}""")
    assert(scoped.body.asInstanceOf[JArray].arr.map {
      case JArray(List(_, _, JDouble(v))) => v; case _ => fail()
    } === List(30.0, 32.0))
    val all = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/mem.used",
      query = Map("granularity" -> "60"))
    assert(all.body.asInstanceOf[JArray].arr.map {
      case JArray(List(_, _, JDouble(v))) => v; case _ => fail()
    } === List(20.0, 22.0))
  }

  test("property: archive-policy JSON wire round-trips through the API") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val api = newApi
    val genGran = Gen.oneOf(
      Gen.chooseNum(1L, 86400L).map(g => graft.model.Granularity.seconds(g)),
      Gen.oneOf("Y", "H", "Q", "M", "W").map(graft.model.Granularity.Calendar(_)))
    val genItem = for {
      g <- genGran
      pts <- Gen.option(Gen.chooseNum(1L, 10000L))
    } yield graft.model.ArchivePolicyItem(g, pts, None).completed
    val genMethods = Gen.someOf(Seq("mean", "max", "min", "sum", "count",
      "std", "median", "95pct", "rate:mean")).suchThat(_.nonEmpty)
    var n = 0
    val p = Prop.forAll(Gen.nonEmptyListOf(genItem), genMethods) { (items, ms) =>
      n += 1
      val name = s"prop$n"
      val posted = api.dispatch("POST", "/v1/archive_policy", body =
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(
            ("name" -> name) ~ ("back_window" -> 0) ~
              ("aggregation_methods" -> ms.toList) ~
              ("definition" -> items.map { i =>
                ("granularity" -> i.granularity.token) ~
                  ("points" -> i.points)
              }))))
      val got = api.dispatch("GET", s"/v1/archive_policy/$name")
      posted.status == 201 && got.status == 200 &&
        (got.body \ "aggregation_methods") ==
          JArray(ms.toList.sorted.map(JString(_))) &&
        (got.body \ "definition").asInstanceOf[JArray].arr.map(
          d => jstrOf(d \ "granularity")) == items.map(_.granularity.token)
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private def jstrOf(v: JValue): String =
    v match { case JString(s) => s; case other => other.toString }

  test("non-UUID resource ids transform to uuid5 and route by both forms " +
      "(utils.py:38-59, transformedids.yaml)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq.empty[(String, String, String, String)]
      .toDF("id", "original_resource_id", "creator", "zone"))
    g.setResourceHistory(Seq.empty[(String, String, String, String,
      java.sql.Timestamp)]
      .toDF("id", "original_resource_id", "creator", "zone", "revision_end"))

    // create with a raw string id as user foobar: the stored id is a
    // uuid, the raw value lands in original_resource_id
    val c = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "generic one", "zone": "fr"}""",
      creator = Some("foobar"))
    assert(c.status === 201)
    val internal = jstrOf(c.body \ "id")
    assert(internal === "5229fefb-33bd-5bcf-8c4b-a752a08f2516") // python uuid5
    assert(c.body \ "original_resource_id" === JString("generic one"))
    assert(c.body \ "creator" === JString("foobar"))

    // GET by external id and by internal uuid return the same row
    val byExt = api.dispatch("GET", "/v1/resource/generic/generic one",
      creator = Some("foobar"))
    assert(byExt.status === 200 && jstrOf(byExt.body \ "id") === internal)
    val byInt = api.dispatch("GET", s"/v1/resource/generic/$internal")
    assert(byInt.status === 200 && jstrOf(byInt.body \ "id") === internal)

    // duplicate raw id same creator → 409; DIFFERENT creator → a
    // different uuid5, so 201 (the gabbit's cross-user case)
    assert(api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "generic one", "zone": "fr"}""",
      creator = Some("foobar")).status === 409)
    val other = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "generic one", "zone": "de"}""",
      creator = Some("pasta"))
    assert(other.status === 201)
    assert(jstrOf(other.body \ "id") !== internal)

    // a UUID-shaped (untransformed) id ALSO records the submitted raw
    // string in original_resource_id (rest/api.py:1170 stores
    // str(original) for every create), including python's lenient
    // urn:uuid: form which passes through rather than transforming
    val uu = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "urn:uuid:AAAA1761-aaaa-46e2-8900-8b4f6fe6675a",
        "zone": "fr"}""",
      creator = Some("foobar"))
    assert(uu.status === 201)
    assert(jstrOf(uu.body \ "id") === "aaaa1761-aaaa-46e2-8900-8b4f6fe6675a")
    assert(uu.body \ "original_resource_id" ===
      JString("urn:uuid:AAAA1761-aaaa-46e2-8900-8b4f6fe6675a"))

    // '/' in a transformable id → 400 with the reference's message
    val bad = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "id-with-/", "zone": "x"}""", creator = Some("foobar"))
    assert(bad.status === 400)
    assert(jstrOf(bad.body \ "description")
      .contains("'/' is not supported in resource id"))

    // PATCH by external id routes to the transformed row
    val p = api.dispatch("PATCH", "/v1/resource/generic/generic one",
      query = Map("now" -> "1700000000"),
      body = """{"zone": "us"}""", creator = Some("foobar"))
    assert(p.status === 200 && p.body \ "zone" === JString("us"))

    // scalar/column parity: the facade door and the bulk column form
    // agree on transformed AND passthrough ids
    import org.apache.spark.sql.functions.col
    val ids = Seq("generic one", "web server 3",
      "5A301761-AAAA-46E2-8900-8B4F6FE6675A")
    for (creator <- Seq(Some("foobar"), None)) {
      val viaCol = ids.map(i => (i, creator.orNull))
        .toDF("raw", "c")
        .select(graft.catalog.ResourceUuid.transformCol(col("raw"), col("c")))
        .collect().map(_.getString(0))
      val viaScalar = ids.map(graft.catalog.ResourceUuid.transform(_, creator))
      assert(viaCol.toSeq === viaScalar)
    }
  }

  test("paginated listings emit Link rel=next with the keyset marker " +
      "(rest/api.py:1474-1481)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources((1 to 7).map(i => (f"r$i%02d", "z")).toDF("id", "zone"))

    // walk the pages via the returned link only
    var path = "/v1/resource/generic"
    var query = Map("limit" -> "3")
    var seen = List.empty[String]
    var hops = 0
    while (path != null && hops < 10) {
      val r = api.dispatch("GET", path, query = query)
      assert(r.status === 200)
      seen ++= r.body.asInstanceOf[JArray].arr.map(x => jstrOf(x \ "id"))
      r.headers.get("Link") match {
        case Some(l) =>
          val m = """<([^>?]+)\?([^>]*)>; rel="next"""".r.findFirstMatchIn(l)
            .getOrElse(fail(s"bad Link header: $l"))
          path = m.group(1)
          query = m.group(2).split("&").map(_.split("=", 2))
            .map(a => a(0) -> java.net.URLDecoder.decode(a(1), "UTF-8")).toMap
        case None => path = null
      }
      hops += 1
    }
    assert(seen === (1 to 7).map(i => f"r$i%02d").toList)

    // metric listing: same contract
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    (1 to 5).foreach(i => api.dispatch("POST", "/v1/metric",
      body = s"""{"id": "m$i", "archive_policy_name": "low"}"""))
    val m1 = api.dispatch("GET", "/v1/metric", query = Map("limit" -> "2"))
    assert(m1.headers("Link").contains("marker=m2"))
    val m2 = api.dispatch("GET", "/v1/metric",
      query = Map("limit" -> "2", "marker" -> "m2"))
    assert(m2.body.asInstanceOf[JArray].arr.map(x => jstrOf(x \ "id"))
      === List("m3", "m4"))
    // a short (last) page carries no Link
    assert(api.dispatch("GET", "/v1/metric",
      query = Map("limit" -> "2", "marker" -> "m4")).headers.get("Link").isEmpty)
  }

  test("typed routes scope by the <type> segment; generic stays " +
      "unscoped; duplicate metric create 409s; apostrophe ids survive") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(
      ("r1", "instance", "fr"), ("r2", "volume", "fr"), ("o'id", "volume", "de"))
      .toDF("id", "type", "zone"))

    def ids(r: graft.rest.Response): List[String] =
      r.body.asInstanceOf[JArray].arr.map(x => jstrOf(x \ "id"))
    // listing scopes; generic sees everything
    assert(ids(api.dispatch("GET", "/v1/resource/instance")) === List("r1"))
    assert(ids(api.dispatch("GET", "/v1/resource/generic")).size === 3)
    // search scopes
    assert(ids(api.dispatch("POST", "/v1/search/resource/volume",
      body = """{"=": {"zone": "fr"}}""")) === List("r2"))
    // delete-by-query under a typed route can't cross types
    assert(api.dispatch("DELETE", "/v1/resource/instance",
      body = """{"=": {"zone": "fr"}}""").body \ "deleted" === JInt(1))
    assert(ids(api.dispatch("GET", "/v1/resource/generic")).toSet
      === Set("r2", "o'id"))
    // apostrophe-bearing raw-registered ids route (backslash escaping)
    assert(api.dispatch("GET", "/v1/resource/generic/o'id").status === 200)
    assert(api.dispatch("DELETE", "/v1/resource/generic/o'id").status === 204)

    // duplicate metric id → 409, and the original policy mapping stays
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "pa", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "pb", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "dup", "archive_policy_name": "pa"}""").status === 201)
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "dup", "archive_policy_name": "pb"}""").status === 409)
    assert(g.metricPolicyName("dup") === "pa")
  }

  test("DELETE /v1/resource/<type> deletes by query; empty query refused " +
      "(rest/api.py:1249-1278)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r1", "fr"), ("r2", "de"), ("r3", "de"))
      .toDF("id", "zone"))
    // empty body AND no ?filter= → 400 with the caution
    val deny = api.dispatch("DELETE", "/v1/resource/generic")
    assert(deny.status === 400)
    assert(jstrOf(deny.body \ "description").contains("can not be empty"))
    // filter-tree body deletes matches and reports the count
    val del = api.dispatch("DELETE", "/v1/resource/generic",
      body = """{"=": {"zone": "de"}}""")
    assert(del.status === 200)
    assert(del.body \ "deleted" === JInt(2))
    assert(api.dispatch("GET", "/v1/resource/generic").body
      .asInstanceOf[JArray].arr.map(r => jstrOf(r \ "id")) === List("r1"))
    // string-grammar form via ?filter=
    assert(api.dispatch("DELETE", "/v1/resource/generic",
      query = Map("filter" -> "zone = 'fr'")).body \ "deleted" === JInt(1))
  }

  test("?details=true embeds metrics, ?attrs projects, single GET " +
      "carries the metrics map (rest/api.py:1219-1223 jsonify)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r1", "fr", 2.0), ("r2", "us", 3.0))
      .toDF("id", "zone", "weight"))
    g.setMetrics(Seq(("m0", "cpu", "r1"), ("m1", "mem", "r1"))
      .toDF("metric_id", "name", "resource_id"))

    val det = api.dispatch("GET", "/v1/resource/generic",
      query = Map("details" -> "true"))
    assert(det.status === 200)
    val r1 = det.body.asInstanceOf[JArray].arr
      .find(r => r \ "id" == JString("r1")).get
    assert(r1 \ "metrics" === JObject(List(
      "cpu" -> JString("m0"), "mem" -> JString("m1"))))
    val r2 = det.body.asInstanceOf[JArray].arr
      .find(r => r \ "id" == JString("r2")).get
    assert(r2 \ "metrics" === JObject(Nil))

    val proj = api.dispatch("GET", "/v1/resource/generic",
      query = Map("attrs" -> "zone"))
    proj.body.asInstanceOf[JArray].arr.foreach { r =>
      assert(r.asInstanceOf[JObject].obj.map(_._1).toSet === Set("id", "zone"))
    }

    val one = api.dispatch("GET", "/v1/resource/generic/r1")
    assert(one.body \ "zone" === JString("fr"))
    assert(one.body \ "metrics" === JObject(List(
      "cpu" -> JString("m0"), "mem" -> JString("m1"))))
  }

  test("?history=true: revision union (current as -1), id@revision " +
      "marker walk, history search (rest/api.py:1220-1241,1453-1475)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r1", "fr"), ("r2", "us")).toDF("id", "zone"))
    g.setResourceHistory(Seq(
      ("r1", "de", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      ("r1", "be", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
      .toDF("id", "zone", "revision_start", "revision_end"))

    def idsRevs(r: graft.rest.Response): List[(String, BigInt)] =
      r.body.asInstanceOf[JArray].arr.map(x =>
        (jstrOf(x \ "id"), x \ "revision" match {
          case JInt(n) => n; case JLong(n) => BigInt(n); case o => fail(s"$o")
        }))

    val p1 = api.dispatch("GET", "/v1/resource/generic",
      query = Map("history" -> "true", "limit" -> "3"))
    assert(p1.status === 200)
    assert(idsRevs(p1) === List(("r1", BigInt(-1)), ("r1", BigInt(1)),
      ("r1", BigInt(2))))
    val link = p1.headers("Link")
    assert(link.contains("marker=r1%402") || link.contains("marker=r1@2"))
    val p2 = api.dispatch("GET", "/v1/resource/generic",
      query = Map("history" -> "true", "limit" -> "3", "marker" -> "r1@2"))
    assert(idsRevs(p2) === List(("r2", BigInt(-1))))
    assert(p2.headers.get("Link").isEmpty)

    // the Link marker derives from the PRE-projection rows: an attrs
    // projection that strips `revision` must not degrade it to id@-1
    val pa = api.dispatch("GET", "/v1/resource/generic",
      query = Map("history" -> "true", "limit" -> "3", "attrs" -> "zone"))
    assert(pa.headers("Link").contains("r1%402") ||
      pa.headers("Link").contains("r1@2"))

    // history search crosses revisions; plain search sees only current
    val h = api.dispatch("POST", "/v1/search/resource/generic",
      query = Map("history" -> "true"),
      body = """{"=": {"zone": "de"}}""")
    assert(idsRevs(h) === List(("r1", BigInt(1))))
    assert(api.dispatch("POST", "/v1/search/resource/generic",
      body = """{"=": {"zone": "de"}}""")
      .body.asInstanceOf[JArray].arr.isEmpty)
  }

  test("enforce hook: admin-only and admin-or-creator rules " +
      "(rest/api.py:113, policy.json defaults)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g, requireAuth = true)
    g.setResources(Seq.empty[(String, String, String)]
      .toDF("id", "creator", "zone"))
    g.setResourceHistory(Seq.empty[(String, String, String,
      java.sql.Timestamp)].toDF("id", "creator", "zone", "revision_end"))

    val polBody = """{"name": "low", "definition": [{"granularity": "60"}],
        "aggregation_methods": ["mean"]}"""
    // archive-policy mutation: admin only; reads stay open
    assert(api.dispatch("POST", "/v1/archive_policy", body = polBody)
      .status === 401) // unauthenticated
    assert(api.dispatch("POST", "/v1/archive_policy", body = polBody,
      creator = Some("mallory")).status === 403)
    assert(api.dispatch("POST", "/v1/archive_policy", body = polBody,
      creator = Some("admin")).status === 201)
    assert(api.dispatch("GET", "/v1/archive_policy").status === 200)

    // resource mutation: creator or admin; others denied
    val cr = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "box", "zone": "fr"}""", creator = Some("alice"))
    assert(cr.status === 201)
    val boxId = jstrOf(cr.body \ "id") // internal uuid (id salted by alice)
    // mallory's EXTERNAL lookup re-salts with mallory → no such
    // resource → 404 (lookup-before-enforce, as the reference);
    // attacking the internal id directly is the 403 case
    assert(api.dispatch("PATCH", "/v1/resource/generic/box",
      query = Map("now" -> "1700000000"), body = """{"zone": "de"}""",
      creator = Some("mallory")).status === 404)
    assert(api.dispatch("PATCH", s"/v1/resource/generic/$boxId",
      query = Map("now" -> "1700000000"), body = """{"zone": "de"}""",
      creator = Some("mallory")).status === 403)
    assert(api.dispatch("PATCH", "/v1/resource/generic/box",
      query = Map("now" -> "1700000000"), body = """{"zone": "de"}""",
      creator = Some("alice")).status === 200)
    assert(api.dispatch("DELETE", s"/v1/resource/generic/$boxId",
      creator = Some("mallory")).status === 403)
    // admin reaches another user's resource by its INTERNAL id (the
    // external form re-salts with the requester, as the reference)
    assert(api.dispatch("DELETE", s"/v1/resource/generic/$boxId",
      creator = Some("admin")).status === 204)

    // destructive metric routes need an authenticated creator too
    // (policy.json guards metric create/delete; measures POST records
    // the creator) — an unauthenticated request may not delete metrics
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "gm", "archive_policy_name": "low"}""")
      .status === 401)
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "gm", "archive_policy_name": "low"}""",
      creator = Some("alice")).status === 201)
    assert(api.dispatch("POST", "/v1/metric/gm/measures",
      body = """[{"timestamp": "2014-01-01T12:00:01Z", "value": 1.0}]""")
      .status === 401)
    assert(api.dispatch("POST", "/v1/metric/gm/measures",
      body = """[{"timestamp": "2014-01-01T12:00:01Z", "value": 1.0}]""",
      creator = Some("alice")).status === 202)
    assert(api.dispatch("DELETE", "/v1/metric/gm").status === 401)
    assert(api.dispatch("DELETE", "/v1/metric/gm",
      creator = Some("alice")).status === 204)
  }

  test("keystone read scoping: non-admin search/list sees only its own " +
      "project's resources, X-Roles admin sees all, out-of-project " +
      "single reads 404 (auth_helper.py:225-270, rest/api.py:1457-1466)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g, requireAuth = true, authMode = "keystone")
    g.setResources(Seq.empty[(String, String, String, String)]
      .toDF("id", "creator", "zone", "project_id"))
    g.setResourceHistory(Seq.empty[(String, String, String,
      java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("id", "creator", "zone", "revision_start", "revision_end"))
    g.setMetrics(Seq.empty[(String, String, String)]
      .toDF("metric_id", "resource_id", "name"))
    val alice = Some("alice:proj1")
    val bob = Some("bob:proj2")
    val adminHdr = Map("X-Roles" -> "reader,admin")
    assert(api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "boxa", "zone": "fr"}""", creator = alice)
      .status === 201)
    val rb = api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "boxb", "zone": "de"}""", creator = bob)
    assert(rb.status === 201)
    val bobInternal = jstrOf(rb.body \ "id")
    // bob also creates a resource BELONGING to alice's project — the
    // project_id arm of the policy filter must surface it to alice
    assert(api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "shared", "zone": "nl", "project_id": "proj1"}""",
      creator = bob).status === 201)

    def seen(r: graft.rest.Response): Set[String] = {
      assert(r.status === 200, r.body)
      r.body.asInstanceOf[JArray].arr.map(x => jstrOf(x \ "zone")).toSet
    }
    // search door: disjoint views per project; admin sees everything
    assert(seen(api.dispatch("POST", "/v1/search/resource/generic",
      creator = alice)) === Set("fr", "nl"))
    assert(seen(api.dispatch("POST", "/v1/search/resource/generic",
      creator = bob)) === Set("de", "nl"))
    assert(seen(api.dispatch("POST", "/v1/search/resource/generic",
      creator = Some("root:adm"), reqHeaders = adminHdr)) ===
      Set("fr", "de", "nl"))
    // the policy filter AND-merges with the request's own tree
    assert(seen(api.dispatch("POST", "/v1/search/resource/generic",
      body = """{"=": {"zone": "de"}}""", creator = alice)) === Set())
    // listing door scopes identically
    assert(seen(api.dispatch("GET", "/v1/resource/generic",
      creator = alice)) === Set("fr", "nl"))
    assert(seen(api.dispatch("GET", "/v1/resource/generic",
      creator = Some("root:adm"), reqHeaders = adminHdr)) ===
      Set("fr", "de", "nl"))
    // unauthenticated keystone reads are 401 (enforce without identity)
    assert(api.dispatch("POST", "/v1/search/resource/generic")
      .status === 401)
    // single read: out-of-project rows answer 404 (anti-enumeration,
    // auth_helper.py:195-200); admin reads them fine
    assert(api.dispatch("GET", s"/v1/resource/generic/$bobInternal",
      creator = alice).status === 404)
    assert(api.dispatch("GET", s"/v1/resource/generic/$bobInternal",
      creator = bob).status === 200)
    assert(api.dispatch("GET", s"/v1/resource/generic/$bobInternal",
      creator = Some("root:adm"), reqHeaders = adminHdr).status === 200)

    // mutations: a plain keystone user is NOT admin (403); X-Roles
    // admin satisfies the admin rule, as oslo policy's role:admin
    assert(api.dispatch("POST", "/v1/archive_policy",
      body = """{"name": "ks", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""",
      creator = alice).status === 403)
    assert(api.dispatch("POST", "/v1/archive_policy",
      body = """{"name": "ks", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""",
      creator = Some("root:adm"), reqHeaders = adminHdr).status === 201)
    // role-admin also reaches another project's resource mutations
    // (admin_or_creator with role:admin)
    assert(api.dispatch("PATCH", s"/v1/resource/generic/$bobInternal",
      query = Map("now" -> "1700000000"), body = """{"zone": "at"}""",
      creator = Some("root:adm"), reqHeaders = adminHdr).status === 200)
    // metric listing scopes to the creator's project
    // (get_metric_policy_filter: creator LIKE "%:project")
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "ma", "archive_policy_name": "ks"}""",
      creator = alice).status === 201)
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "mb", "archive_policy_name": "ks"}""",
      creator = bob).status === 201)
    def metricIds(r: graft.rest.Response): Set[String] = {
      assert(r.status === 200, r.body)
      r.body.asInstanceOf[JArray].arr.map(x => jstrOf(x \ "id")).toSet
    }
    assert(metricIds(api.dispatch("GET", "/v1/metric",
      creator = alice)) === Set("ma"))
    assert(metricIds(api.dispatch("GET", "/v1/metric",
      creator = bob)) === Set("mb"))
    assert(metricIds(api.dispatch("GET", "/v1/metric",
      creator = Some("root:adm"), reqHeaders = adminHdr)) ===
      Set("ma", "mb"))
    // single-metric doors enforce the same creator-project rule
    // (enforce_metric, rest/api.py:479-499): foreign project 403,
    // unknown id stays 404 (lookup-before-enforce), admin reads fine
    assert(api.dispatch("GET", "/v1/metric/mb", creator = alice)
      .status === 403)
    assert(api.dispatch("GET", "/v1/metric/mb/measures", creator = alice)
      .status === 403)
    assert(api.dispatch("POST", "/v1/metric/mb/measures",
      body = """[{"timestamp": "2014-01-01T12:00:01Z", "value": 1.0}]""",
      creator = alice).status === 403)
    assert(api.dispatch("DELETE", "/v1/metric/mb", creator = alice)
      .status === 403)
    assert(api.dispatch("GET", "/v1/metric/nope", creator = alice)
      .status === 404)
    assert(api.dispatch("GET", "/v1/metric/mb", creator = bob)
      .status === 200)
    assert(api.dispatch("GET", "/v1/metric/mb",
      creator = Some("root:adm"), reqHeaders = adminHdr).status === 200)
    // resource-scoped sub-routes hide foreign resources the same way
    // the single read does (history, named-metric list/attach)
    assert(api.dispatch("GET",
      s"/v1/resource/generic/$bobInternal/history", creator = alice)
      .status === 404)
    assert(api.dispatch("GET",
      s"/v1/resource/generic/$bobInternal/metric", creator = alice)
      .status === 404)
    assert(api.dispatch("POST",
      s"/v1/resource/generic/$bobInternal/metric",
      body = """{"stealth": {"archive_policy_name": "ks"}}""",
      creator = alice).status === 404)
    assert(api.dispatch("GET",
      s"/v1/resource/generic/$bobInternal/metric", creator = bob)
      .status === 200)
    assert(api.dispatch("GET",
      s"/v1/resource/generic/$bobInternal/history",
      creator = Some("root:adm"), reqHeaders = adminHdr).status === 200)
    // measure-plane doors scope too: the metric-id aggregates forms
    // and the value search refuse foreign metrics; the owner passes
    assert(api.dispatch("POST", "/v1/aggregates",
      body = """{"operations": "(metric mb mean)"}""",
      creator = alice).status === 403)
    assert(api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "mb"), creator = alice).status === 403)
    assert(api.dispatch("POST", "/v1/search/metric",
      query = Map("metric_id" -> "mb"), body = """{">": 0}""",
      creator = alice).status === 403)
    assert(api.dispatch("POST", "/v1/aggregates",
      body = """{"operations": "(metric mb mean)"}""",
      creator = bob).status === 200)
    // batch measure writes enforce per-metric scope too
    assert(api.dispatch("POST", "/v1/batch/metrics/measures",
      body = """{"mb": [{"timestamp": "2014-01-01T12:00:01Z",
                          "value": 1.0}]}""",
      creator = alice).status === 403)
    assert(api.dispatch("POST", "/v1/batch/metrics/measures",
      body = """{"mb": [{"timestamp": "2014-01-01T12:00:01Z",
                          "value": 1.0}]}""",
      creator = bob).status === 202)
  }

  test("MetricsSchema string values attach an EXISTING metric " +
      "(rest/api.py:732-746); duplicates in one request reject") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r1", "fr")).toDF("id", "zone"))
    g.setMetrics(Seq.empty[(String, String, String)]
      .toDF("metric_id", "name", "resource_id"))
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    // a free-standing metric, then attach it BY ID via the string form
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "5a301761-aaaa-46e2-8900-8b4f6fe6675a",
          "archive_policy_name": "low"}""")
    val at = api.dispatch("POST", "/v1/resource/generic/r1/metric",
      body = """{"cpu": "5a301761-aaaa-46e2-8900-8b4f6fe6675a"}""")
    assert(at.status === 201)
    val listed = api.dispatch("GET", "/v1/resource/generic/r1/metric")
    assert(listed.body === JArray(List(JObject(List(
      "name" -> JString("cpu"),
      "id" -> JString("5a301761-aaaa-46e2-8900-8b4f6fe6675a"))))))
    // a string naming an UNKNOWN metric id is a 400, not a create
    assert(api.dispatch("POST", "/v1/resource/generic/r1/metric",
      body = """{"mem": "0000aaaa-0000-0000-0000-000000000000"}""")
      .status === 400)
    // and the failed attach must not have created anything: atomicity
    assert(api.dispatch("GET", "/v1/resource/generic/r1/metric").body
      .asInstanceOf[JArray].arr.size === 1)
    // duplicate names within one request body reject up front
    assert(api.dispatch("POST", "/v1/resource/generic/r1/metric",
      body = """{"mem": null, "mem": {"archive_policy_name": "low"}}""")
      .status === 400)
    // unknown-resource 404 now applies to the GET routes too
    assert(api.dispatch("GET", "/v1/resource/generic/ghost/metric")
      .status === 404)
    assert(api.dispatch("GET", "/v1/resource/generic/ghost/history")
      .status === 404)
  }

  test("malformed bodies map to 400, absent objects to 404, collisions " +
      "to 409 — via the typed GraftError boundary, no 500s") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    g.setResources(Seq(("r1", "fr")).toDF("id", "zone"))
    // {"and": <non-array>} previously ClassCastException'd → must be 400
    assert(api.dispatch("POST", "/v1/search/resource/generic",
      body = """{"and": {"=": {"zone": "fr"}}}""").status === 400)
    assert(api.dispatch("POST", "/v1/search/resource/generic",
      body = """{"or": 7}""").status === 400)
    // unknown policy on metric CREATE is bad input → 400 with the
    // reference's message (gabbits/metric.yaml "create metric bad
    // archive policy"; rest/api.py:688 abort(400, NoSuchArchivePolicy))
    val badPol = api.dispatch("POST", "/v1/metric",
      body = """{"id": "m", "archive_policy_name": "nope"}""")
    assert(badPol.status === 400)
    assert(jstrOf(badPol.body \ "description")
      .contains("Archive policy nope does not exist"))
    assert(api.dispatch("GET", "/v1/metric/ghost/measures").status === 404)
    // typed Conflict: duplicate metric id → 409
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "m", "archive_policy_name": "low"}""").status === 201)
    assert(api.dispatch("POST", "/v1/metric",
      body = """{"id": "m", "archive_policy_name": "low"}""").status === 409)
    // same non-array bug class in the measure-search predicate parser
    assert(api.dispatch("POST", "/v1/search/metric",
      query = Map("metric_id" -> "m", "granularity" -> "60"),
      body = """{"and": {">=": 10}}""").status === 400)
  }

  test("socket round-trip on the JDK server binding") {
    val api = newApi
    val server = new RestServer(api)
    val port = server.serve(0)
    try {
      val url = java.net.URI.create(s"http://127.0.0.1:$port/v1/capabilities").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode === 200)
      val body = new String(conn.getInputStream.readAllBytes())
      assert((JsonMethods.parse(body) \ "aggregation_methods")
        .asInstanceOf[JArray].arr.contains(JString("mean")))
    } finally server.stop()
  }

  test("NaN measure literal ingests through the JSON door and " +
      "poisons its bucket, as the reference (python json accepts NaN; " +
      "carbonara.py:134-146 stores and propagates it)") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "nn", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean", "min", "count"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "mn", "archive_policy_name": "nn"}""")
    // bare NaN literal, exactly as python's json module emits/accepts
    val post = api.dispatch("POST", "/v1/metric/mn/measures", body =
      """[{"timestamp": "2014-01-01T12:00:01Z", "value": 3.0},
          {"timestamp": "2014-01-01T12:00:40Z", "value": NaN}]""")
    assert(post.status === 202)
    def vals(agg: String) = api.dispatch("GET", "/v1/metric/mn/measures",
      query = Map("refresh" -> "true", "aggregation" -> agg))
      .body.asInstanceOf[JArray].arr.map {
        case JArray(List(_, _, JDouble(v))) => v
        case other => fail(s"bad triple: $other")
      }
    assert(vals("mean").map(_.isNaN) === List(true)) // NaN poisons mean
    assert(vals("min") === List(3.0))                // min ignores NaN
    assert(vals("count") === List(2.0))              // count counts it
    // and the wire round-trips: bare NaN in, bare NaN out (python
    // json.dumps emits NaN unquoted) — on the REST door's DEDICATED
    // mapper; the process-global json4s mapper stays stock (other
    // json4s consumers in the JVM must not see NaN literals)
    assert(RestApi.renderJson(JArray(List(JDouble(Double.NaN)))) === "[NaN]")
    assert(RestApi.parseJson("[NaN]") match {
      case JArray(List(JDouble(v))) => v.isNaN
      case JArray(List(JDecimal(_))) => false
      case _ => false
    })
    assert(JsonMethods.compact(JsonMethods.render(
      JArray(List(JDouble(Double.NaN))))) === "[\"NaN\"]")
    intercept[Exception](JsonMethods.parse("[NaN]"))
    // the BATCH doors must accept NaN literals too — their body
    // re-parses inside the facade, which must not fall back to the
    // stock mapper (review r10: batch NaN 400 regression)
    assert(api.dispatch("POST", "/v1/batch/metrics/measures", body =
      """{"mn": [{"timestamp": "2014-01-01T12:00:50Z", "value": NaN}]}""")
      .status === 202)
    assert(vals("count") === List(3.0)) // the batch NaN landed
    // the RESOURCE batch door re-renders and re-parses its body inside
    // the facade — that parse must not fall back to the stock mapper
    // (r10 review: batch NaN 400 regression)
    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"metric_pattern": "*", "archive_policy_name": "nn"}""")
    assert(api.dispatch("POST", "/v1/batch/resources/metrics/measures",
      query = Map("create_metrics" -> "true"),
      body = """{"rb1": {"bm": [{"timestamp": "2014-01-01T12:00:50Z",
                                 "value": NaN}]}}""").status === 202)
  }

  test("influx write accepts a chunked Transfer-Encoding body " +
      "(influxdb.py:141-152)") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "ch", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "all", "metric_pattern": "*",
          "archive_policy_name": "ch"}""")
    val server = new RestServer(api)
    val port = server.serve(0)
    try {
      // telegraf can post chunked (uwsgi dechunks for the reference);
      // the JDK server dechunks for us — pin it end-to-end with a raw
      // socket so no client library silently buffers to Content-Length
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        val out = sock.getOutputStream
        val lines = "cpu,host=h1 value=4.0 1388577600000000000\n" +
          "cpu,host=h1 value=8.0 1388577630000000000\n"
        val chunk = lines.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val head = s"POST /v1/influxdb/write HTTP/1.1\r\n" +
          s"Host: 127.0.0.1:$port\r\n" +
          "Transfer-Encoding: chunked\r\n\r\n"
        out.write(head.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // two chunks, split mid-line to prove reassembly
        val cut = chunk.length / 2
        for ((lo, hi) <- Seq((0, cut), (cut, chunk.length))) {
          out.write(s"${(hi - lo).toHexString}\r\n".getBytes)
          out.write(chunk, lo, hi - lo)
          out.write("\r\n".getBytes)
        }
        out.write("0\r\n\r\n".getBytes)
        out.flush()
        val status = new String(sock.getInputStream.readNBytes(12))
        assert(status === "HTTP/1.1 204")
      } finally sock.close()
      // the staged measures are readable: both lines landed intact
      val got = api.dispatch("GET", "/v1/metric/h1%2Fcpu.value/measures",
        query = Map("refresh" -> "true"))
      assert(got.status === 200)
      val vals = got.body.asInstanceOf[JArray].arr.map {
        case JArray(List(_, _, JDouble(v))) => v
        case other => fail(s"bad triple: $other")
      }
      assert(vals === List(6.0)) // one 60 s bucket, mean(4, 8)
    } finally server.stop()
  }

  test("resource-type attribute schema is CLOSED: extra keys, inverted " +
      "min_length/max_length and min/max bounds are 400s; min_length " +
      "round-trips (gabbits/resource-type.yaml)") {
    val api = newApi
    // extra key in an attribute spec
    assert(api.dispatch("POST", "/v1/resource_type", body =
      """{"name": "rt1", "attributes": {"foo": {"type": "string",
          "max_length": 32, "min_length": 5, "noexist": "foo"}}}""")
      .status === 400)
    // min_length > max_length
    assert(api.dispatch("POST", "/v1/resource_type", body =
      """{"name": "rt1", "attributes": {"name": {"type": "string",
          "required": true, "max_length": 2, "min_length": 5}}}""")
      .status === 400)
    // min > max on number
    assert(api.dispatch("POST", "/v1/resource_type", body =
      """{"name": "rt1", "attributes": {"int": {"type": "number",
          "required": false, "max": 3, "min": 8}}}""")
      .status === 400)
    // nothing half-created by the rejected bodies
    assert(api.dispatch("GET", "/v1/resource_type/rt1").status === 404)
    // a valid min_length lands and reads back
    val ok = api.dispatch("POST", "/v1/resource_type", body =
      """{"name": "rt1", "attributes": {"name": {"type": "string",
          "required": true, "max_length": 64, "min_length": 2}}}""")
    assert(ok.status === 201)
    val got = api.dispatch("GET", "/v1/resource_type/rt1")
    assert(got.body \ "attributes" \ "name" \ "min_length" === JInt(2))
    assert(got.body \ "attributes" \ "name" \ "max_length" === JInt(64))
  }

  test("influx write get-or-creates typed resources with named-metric " +
      "attachments; type conflict is the 409 " +
      "(gabbits/influxdb.yaml, rest/api.py:398-458)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    // a registered catalog with the reference's builtin columns
    g.setResources(
      Seq.empty[(String, String, String, String)]
        .toDF("id", "type", "creator", "original_resource_id"))
    api.dispatch("POST", "/v1/influxdb/query",
      query = Map("q" -> "create database influxdbtest"))
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "3600"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/archive_policy_rule", body =
      """{"name": "all", "metric_pattern": "*",
          "archive_policy_name": "low"}""")
    val w = api.dispatch("POST", "/v1/influxdb/write",
      query = Map("db" -> "influxdbtest"),
      body = "mymetric,host=foobar,mytag=myvalue field=123 " +
        "1510581804179554816",
      creator = Some("admin"))
    assert(w.status === 204)
    // the resource landed: uuid5 id, original id, creator, db type
    // (gabbits/influxdb.yaml "check resource created")
    val rid = graft.catalog.ResourceUuid.transform("foobar", Some("admin"))
    assert(rid === "b4d568e4-7af1-5aec-ac3f-9c09fa3685a9") // the gabbi id
    val row = g.searchResources(s"id = '$rid'").collect().head
    assert(row.getAs[String]("type") === "influxdbtest")
    assert(row.getAs[String]("original_resource_id") === "foobar")
    assert(row.getAs[String]("creator") === "admin")
    // the metric is attached by NAME and readable via the resource
    // route (gabbi "check measures processed")
    val got = api.dispatch("GET",
      s"/v1/resource/influxdbtest/foobar/metric/" +
        "mymetric.field@mytag=myvalue/measures",
      query = Map("refresh" -> "true"), creator = Some("admin"))
    assert(got.status === 200)
    assert(got.body.asInstanceOf[JArray].arr.map {
      case JArray(List(JString(t), JDouble(gr), JDouble(v))) => (t, gr, v)
      case other => fail(s"bad triple: $other")
    } === List(("2017-11-13T14:00:00Z", 3600.0, 123.0)))
    // re-write: same resource passes (no duplicate), measures stage
    assert(api.dispatch("POST", "/v1/influxdb/write",
      query = Map("db" -> "influxdbtest"),
      body = "mymetric,host=foobar field=1 1510581805179554816",
      creator = Some("admin")).status === 204)
    assert(g.searchResources(s"id = '$rid'").count() === 1L)
    // an existing resource of a DIFFERENT type is the reference's 409
    // with the transformed id as detail
    api.dispatch("POST", "/v1/resource/generic",
      body = """{"id": "conflict"}""", creator = Some("admin"))
    val cf = api.dispatch("POST", "/v1/influxdb/write",
      query = Map("db" -> "influxdbtest"),
      body = "mymetric,host=conflict field=1 1510581804179554816",
      creator = Some("admin"))
    assert(cf.status === 409)
    assert(cf.body \ "cause" === JString("Resource already exists"))
    assert(cf.body \ "detail" === JString(
      graft.catalog.ResourceUuid.transform("conflict", Some("admin"))))
  }

  test("CORS preflight + auth-mode seam on the server shell " +
      "(rest/app.py:186, auth_helper.py)") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    val server = new graft.rest.RestServer(api,
      allowedOrigins = Seq("http://grafana.local"), authMode = "keystone")
    val port = server.serve(0)
    // raw socket: HttpURLConnection strips restricted headers (Origin)
    def http(method: String, path: String,
             headers: Map[String, String] = Map.empty,
             body: String = ""): (Int, Map[String, String], String) = {
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        val bodyBytes = body.getBytes("UTF-8")
        val head = new StringBuilder(s"$method $path HTTP/1.1\r\n")
          .append(s"Host: 127.0.0.1:$port\r\n")
          .append("Connection: close\r\n")
        headers.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
        head.append(s"Content-Length: ${bodyBytes.length}\r\n\r\n")
        sock.getOutputStream.write(head.toString.getBytes("UTF-8"))
        sock.getOutputStream.write(bodyBytes)
        sock.getOutputStream.flush()
        val raw = new String(sock.getInputStream.readAllBytes(), "UTF-8")
        val Array(hdrPart, bodyPart) = raw.split("\r\n\r\n", 2) match {
          case a if a.length == 2 => a
          case a => Array(a(0), "")
        }
        val lines = hdrPart.split("\r\n")
        val code = lines(0).split(" ")(1).toInt
        // the JDK server normalizes header case — key on lowercase
        val hs = lines.drop(1).flatMap(_.split(":", 2) match {
          case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
          case _ => None
        }).toMap
        (code, hs, bodyPart)
      } finally sock.close()
    }
    try {
      // preflight from the allowed origin: allow-* headers
      val (pc, ph, _) = http("OPTIONS", "/v1/metric", Map(
        "Origin" -> "http://grafana.local",
        "Access-Control-Request-Method" -> "POST"))
      assert(pc === 200)
      assert(ph.get("access-control-allow-origin") ===
        Some("http://grafana.local"))
      assert(ph.get("access-control-allow-methods") === Some("POST"))
      assert(ph("access-control-allow-headers").contains("X-User-Id"))
      // preflight from a DISALLOWED origin: bare 200, no CORS headers
      val (dc, dh, _) = http("OPTIONS", "/v1/metric", Map(
        "Origin" -> "http://evil.example",
        "Access-Control-Request-Method" -> "POST"))
      assert(dc === 200)
      assert(!dh.contains("access-control-allow-origin"))
      // simple request from the allowed origin carries the allow header
      val (sc, sh, _) = http("GET", "/v1/status",
        Map("Origin" -> "http://grafana.local"))
      assert(sc === 200)
      assert(sh.get("access-control-allow-origin") ===
        Some("http://grafana.local"))
      // keystone auth mode: X-User-Id/X-Project-Id → "user:project"
      // creator recorded on the created metric
      val (mc, _, _) = http("POST", "/v1/metric",
        Map("Content-Type" -> "application/json",
          "X-User-Id" -> "u1", "X-Project-Id" -> "p1"),
        """{"id": "km1", "archive_policy_name": "low"}""")
      assert(mc === 201)
      assert(api.g.metricCreatorOf("km1") === Some("u1:p1"))
    } finally server.stop()
    // remoteuser mode reads the proxy's X-Remote-User
    val server2 = new graft.rest.RestServer(api, authMode = "remoteuser")
    val port2 = server2.serve(0)
    try {
      val conn = new java.net.URL(s"http://127.0.0.1:$port2/v1/metric")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setRequestProperty("X-Remote-User", "ops")
      conn.setDoOutput(true)
      conn.getOutputStream.write(
        """{"id": "rm1", "archive_policy_name": "low"}""".getBytes("UTF-8"))
      assert(conn.getResponseCode === 201)
      conn.disconnect()
      assert(api.g.metricCreatorOf("rm1") === Some("ops"))
    } finally server2.stop()
  }

  test("grouped /v1/aggregates with NO granularity plans PER GROUP: " +
      "heterogeneous archive policies across groups each evaluate at " +
      "their own common set (rest/aggregates/api.py:649-672)") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "polA", "definition": [{"granularity": "3600"},
          {"granularity": "300"}], "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "polB", "definition": [{"granularity": "3600"},
          {"granularity": "60"}], "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "mA", "archive_policy_name": "polA"}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "mB", "archive_policy_name": "polB"}""")
    api.dispatch("POST", "/v1/metric/mA/measures", body =
      """[{"timestamp": "2015-01-01T12:00:30Z", "value": 2.0},
          {"timestamp": "2015-01-01T12:03:10Z", "value": 4.0}]""")
    api.dispatch("POST", "/v1/metric/mB/measures", body =
      """[{"timestamp": "2015-01-01T12:00:20Z", "value": 10.0},
          {"timestamp": "2015-01-01T12:01:10Z", "value": 20.0}]""")
    g.process()
    g.setResources(Seq(("r1", "east"), ("r2", "west")).toDF("id", "zone"))
    g.setMetrics(Seq(("mA", "r1", "cpu"), ("mB", "r2", "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    val resp = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(aggregate mean (metric cpu mean))",
          "search": "id like '%'",
          "groupby": ["zone"]}""")
    assert(resp.status === 200, s"body: ${resp.body}")
    val arr = resp.body.asInstanceOf[JArray].arr
    assert(arr.map(_ \ "group") === List(
      JObject("zone" -> JString("east")), JObject("zone" -> JString("west"))))
    def triples(i: Int): Seq[(Double, Double)] =
      (arr(i) \ "measures" \ "measures" \ "aggregated")
        .asInstanceOf[JArray].arr.map(_.asInstanceOf[JArray].arr)
        .map(t => (t(1), t(2)) match {
          case (JDouble(gr), JDouble(v)) => (gr, v)
          case other => fail(s"bad triple tail: $other")
        })
    // east plans {3600, 300} (polA), west plans {3600, 60} (polB) —
    // a single GLOBAL intersection would emit only the shared 3600
    assert(triples(0) === Seq((3600.0, 3.0), (300.0, 3.0)))
    assert(triples(1) === Seq((3600.0, 15.0), (60.0, 10.0), (60.0, 20.0)))
    // disjoint policy sets: global intersection is EMPTY (the old
    // plan threw "No granularity match"); per-group planning succeeds
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "polC", "definition": [{"granularity": "120"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "mC", "archive_policy_name": "polC"}""")
    api.dispatch("POST", "/v1/metric/mC/measures", body =
      """[{"timestamp": "2015-01-01T12:00:40Z", "value": 7.0}]""")
    g.process()
    g.setResources(Seq(("r1", "east"), ("r3", "south"))
      .toDF("id", "zone"))
    g.setMetrics(Seq(("mA", "r1", "cpu"), ("mC", "r3", "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    val dj = api.dispatch("POST", "/v1/aggregates", body =
      """{"operations": "(aggregate mean (metric cpu mean))",
          "search": "id like '%'",
          "groupby": ["zone"]}""")
    assert(dj.status === 200)
    val djArr = dj.body.asInstanceOf[JArray].arr
    assert(djArr.map(_ \ "group") === List(
      JObject("zone" -> JString("east")), JObject("zone" -> JString("south"))))
  }

  test("batch measure doors enforce the fixed-format-per-list contract " +
      "(utils.to_timestamps:86-123, gabbits/metric-timestamp-format.yaml)") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "bm1", "archive_policy_name": "low"}""")
    // /v1/batch/metrics/measures: ISO list with an epoch intruder → 400
    val mixed = api.dispatch("POST", "/v1/batch/metrics/measures", body =
      """{"bm1": [{"timestamp": "2015-01-01T12:00:00Z", "value": 1.0},
                  {"timestamp": "1420113600", "value": 2.0}]}""")
    assert(mixed.status === 400)
    assert((mixed.body \ "description").asInstanceOf[JString].s
      .contains("mixed timestamp formats"))
    // nothing staged by the rejected batch
    assert(api.dispatch("GET", "/v1/status")
      .body \ "storage" \ "summary" \ "measures" === JInt(0))
    // a uniform list lands
    assert(api.dispatch("POST", "/v1/batch/metrics/measures", body =
      """{"bm1": [{"timestamp": "2015-01-01T12:00:00Z", "value": 1.0},
                  {"timestamp": "2015-01-01T12:00:30Z", "value": 3.0}]}""")
      .status === 202)
    // batch/resources door (Graft.batchAddMeasures): same contract
    val g = api.dispatch("POST", "/v1/batch/resources/metrics/measures",
      query = Map("create_metrics" -> "true"), body =
      """{"rX": {"cpu": {"archive_policy_name": "low", "measures":
           [{"timestamp": "2015-01-01T12:00:00Z", "value": 1.0},
            {"timestamp": 1420113600, "value": 2.0}]}}}""")
    assert(g.status === 400)
    assert((g.body \ "description").asInstanceOf[JString].s
      .contains("mixed timestamp formats"))
    // relative-timespan list: accepted, and anchored on ONE now
    assert(api.dispatch("POST", "/v1/batch/metrics/measures", body =
      """{"bm1": [{"timestamp": "-5 minutes", "value": 5.0},
                  {"timestamp": "-1 minute", "value": 7.0}]}""")
      .status === 202)
    // mixing relative with ISO in one list → 400
    assert(api.dispatch("POST", "/v1/batch/metrics/measures", body =
      """{"bm1": [{"timestamp": "-5 minutes", "value": 5.0},
                  {"timestamp": "2015-01-01T12:00:00Z", "value": 7.0}]}""")
      .status === 400)
  }

  test("relative start/stop params resolve against ONE request now " +
      "(utils.py:80-84)") {
    val api = newApi
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    api.dispatch("POST", "/v1/metric",
      body = """{"id": "rn1", "archive_policy_name": "low"}""")
    // anchor: 2015-01-01T12:10:00Z
    val anchor = java.time.Instant.parse("2015-01-01T12:10:00Z")
      .toEpochMilli
    api.withRequestNow(anchor) {
      // relative ingest stamps anchor on the pinned now
      assert(api.dispatch("POST", "/v1/metric/rn1/measures", body =
        """[{"timestamp": "-10 minutes", "value": 1.0},
            {"timestamp": "-4 minutes", "value": 3.0}]""").status === 202)
    }
    // window [-7 min, -1 min] of the SAME anchor contains only the
    // -4 min point; with two different nows the boundary could drift
    val got = api.withRequestNow(anchor) {
      api.dispatch("GET", "/v1/metric/rn1/measures",
        query = Map("refresh" -> "true",
          "start" -> "-7 minutes", "stop" -> "-1 minute"))
    }
    assert(got.status === 200)
    val vals = got.body.asInstanceOf[JArray].arr.map {
      case JArray(List(JString(t), _, JDouble(v))) => (t, v)
      case other => fail(s"bad triple: $other")
    }
    assert(vals === List(("2015-01-01T12:06:00Z", 3.0)))
  }

  test("legacy aggregation: a null cross-metric cell is an absent " +
      "point, not 0.0; a metric under several groups labels each group " +
      "with its OWN attr tuple") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-rest").toString)
    val api = new RestApi(g)
    api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "low", "definition": [{"granularity": "60"}],
          "aggregation_methods": ["mean"]}""")
    for (m <- Seq("n1", "n2"))
      api.dispatch("POST", "/v1/metric",
        body = s"""{"id": "$m", "archive_policy_name": "low"}""")
    // both metrics NaN at 12:00, real values at 12:01 → the 12:00
    // cross-metric mean is null (all-NaN) and must NOT surface as 0.0
    g.addMeasures("n1", Seq(("2015-01-01 12:00:30", Double.NaN),
      ("2015-01-01 12:01:30", 1.0)))
    g.addMeasures("n2", Seq(("2015-01-01 12:00:40", Double.NaN),
      ("2015-01-01 12:01:40", 3.0)))
    g.process()
    // fill=null keeps the all-NaN bucket as NaN (numpy nanmean of
    // all-NaN) — and NEVER as 0.0
    val resp = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "n1,n2", "granularity" -> "60",
        "fill" -> "null"))
    assert(resp.status === 200)
    val vals = resp.body.asInstanceOf[JArray].arr.map {
      case JArray(List(JString(t), _, JDouble(v))) => (t, v)
      case other => fail(s"bad triple: $other")
    }
    assert(vals.map(_._1) ===
      List("2015-01-01T12:00:00Z", "2015-01-01T12:01:00Z"))
    assert(vals(0)._2.isNaN)
    assert(vals(1)._2 === 2.0)
    // fill=dropna drops the NaN position from the OUTPUT
    // (processor.py:237-244) — absent, not 0.0
    val dn = api.dispatch("GET", "/v1/aggregation/metric",
      query = Map("metric" -> "n1,n2", "granularity" -> "60",
        "fill" -> "dropna"))
    assert(dn.body.asInstanceOf[JArray].arr.map {
      case JArray(List(JString(t), _, JDouble(v))) => (t, v)
      case other => fail(s"bad triple: $other")
    } === List(("2015-01-01T12:01:00Z", 2.0)))

    // one metric attached under TWO groupby tuples: each group's rows
    // carry only its own tuple (the old metric_id join cross-producted)
    g.setResources(Seq(("r1", "east"), ("r2", "west")).toDF("id", "zone"))
    g.setMetrics(Seq(("n1", "r1", "cpu"), ("n1", "r2", "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    val grouped = api.dispatch("POST",
      "/v1/aggregation/resource/generic/metric/cpu",
      query = Map("granularity" -> "60", "groupby" -> "zone"))
    assert(grouped.status === 200)
    val arr = grouped.body.asInstanceOf[JArray].arr
    assert(arr.map(_ \ "group") === List(
      JObject("zone" -> JString("east")), JObject("zone" -> JString("west"))))
    // single-metric groups short-circuit to the raw read (NaN bucket
    // included): each group sees n1's series exactly ONCE (the
    // cross-product duplicated it)
    for (i <- 0 to 1) {
      val ms = (arr(i) \ "measures").asInstanceOf[JArray].arr.map {
        case JArray(List(JString(t), _, JDouble(v))) => (t, v)
        case other => fail(s"bad triple: $other")
      }
      assert(ms.map(_._1) ===
        List("2015-01-01T12:00:00Z", "2015-01-01T12:01:00Z"))
      assert(ms(0)._2.isNaN)
      assert(ms(1)._2 === 1.0)
    }
  }

  test("async.yaml walk: inline metric at resource create, " +
      "empty-measures read is 200 [], resource-scoped POST is 202, " +
      "?refresh=true drains before the read") {
    val api = newApi
    assert(api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "moderate",
          "definition": [{"granularity": "1 second"}]}""").status === 201)
    assert(api.dispatch("POST", "/v1/resource/generic", body =
      """{"id": "41937416-1644-497d-a0ed-b43d55a2b0ea",
          "started_at": "2015-06-06T02:02:02.000000",
          "metrics": {"some.counter":
            {"archive_policy_name": "moderate"}}}""").status === 201)
    // "confirm no metrics yet": a metric with no measures reads 200 []
    val empty = api.dispatch("GET", "/v1/resource/generic/" +
      "41937416-1644-497d-a0ed-b43d55a2b0ea/metric/some.counter/measures")
    assert(empty.status === 200)
    assert(empty.body === JArray(Nil))
    assert(api.dispatch("POST", "/v1/resource/generic/" +
      "41937416-1644-497d-a0ed-b43d55a2b0ea/metric/some.counter/measures",
      body = """[{"timestamp": "2015-06-06T14:33:00", "value": 11},
                 {"timestamp": "2015-06-06T14:35:00", "value": 12}]""")
      .status === 202)
    val got = api.dispatch("GET", "/v1/resource/generic/" +
      "41937416-1644-497d-a0ed-b43d55a2b0ea/metric/some.counter/measures",
      query = Map("refresh" -> "true"))
    assert(got.status === 200)
    val rows = got.body.asInstanceOf[JArray].arr
    assert(rows.nonEmpty)
    // $[-1][-1]: 12 — the last triple's value
    rows.last match {
      case JArray(List(_, _, v)) => assert(v === JDouble(12.0))
      case other => fail(s"bad last triple: $other")
    }
  }

  test("metric-derived.yaml walk: rate:mean/95pct/max goldens, " +
      "server-assigned metric id, and a mid-series split push (drained " +
      "between chunks) computes identical rates") {
    val api = newApi
    assert(api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "carrot-cake",
          "aggregation_methods": ["rate:mean", "rate:max", "rate:95pct",
                                  "max"],
          "definition": [{"granularity": "1 minute"}]}""").status === 201)
    val created1 = api.dispatch("POST", "/v1/metric",
      body = """{"archive_policy_name": "carrot-cake"}""")
    assert(created1.status === 201)
    val m1 = (created1.body \ "id").asInstanceOf[JString].s
    assert(m1.nonEmpty)
    val all = Seq(
      "14:33:00" -> 10, "14:34:10" -> 13, "14:34:20" -> 13,
      "14:34:30" -> 15, "14:34:40" -> 18, "14:34:50" -> 20,
      "14:35:00" -> 22, "14:35:10" -> 26, "14:35:20" -> 30,
      "14:35:30" -> 31, "14:35:40" -> 37, "14:35:50" -> 55,
      "14:36:00" -> 62, "14:36:10" -> 100, "14:36:20" -> 102,
      "14:36:30" -> 103, "14:36:40" -> 104, "14:36:50" -> 110)
    def measuresJson(xs: Seq[(String, Int)]) = xs.map { case (t, v) =>
      s"""{"timestamp": "2015-03-06T$t", "value": $v}"""
    }.mkString("[", ",", "]")
    assert(api.dispatch("POST", s"/v1/metric/$m1/measures",
      body = measuresJson(all)).status === 202)
    def read(mid: String, agg: String, refresh: Boolean = false) = {
      val r = api.dispatch("GET", s"/v1/metric/$mid/measures",
        query = Map("aggregation" -> agg) ++
          (if (refresh) Map("refresh" -> "true") else Map.empty))
      assert(r.status === 200)
      r.body.asInstanceOf[JArray].arr.map {
        case JArray(List(JString(t), _, JDouble(v))) => (t, v)
        case other => fail(s"bad triple: $other")
      }
    }
    def ts(hm: String) = s"2015-03-06T$hm:00Z"
    val rateMean = read(m1, "rate:mean", refresh = true)
    assert(rateMean === List(
      (ts("14:34"), 2.0), (ts("14:35"), 5.833333333333333),
      (ts("14:36"), 9.166666666666666)))
    assert(read(m1, "rate:95pct") === List(
      (ts("14:34"), 3.0), (ts("14:35"), 15.0), (ts("14:36"), 30.25)))
    assert(read(m1, "rate:max") === List(
      (ts("14:34"), 3.0), (ts("14:35"), 18.0), (ts("14:36"), 38.0)))
    assert(read(m1, "max") === List(
      (ts("14:33"), 10.0), (ts("14:34"), 20.0), (ts("14:35"), 55.0),
      (ts("14:36"), 110.0)))
    // second metric: the SAME data split MID-SERIES across two pushes,
    // drained in between — the incremental job must diff the new
    // chunk's first point (30 @14:35:20) against the previous chunk's
    // LAST RAW point (26 @14:35:10), so every rate matches one-shot
    val created2 = api.dispatch("POST", "/v1/metric",
      body = """{"archive_policy_name": "carrot-cake"}""")
    val m2 = (created2.body \ "id").asInstanceOf[JString].s
    assert(m2 !== m1)
    assert(api.dispatch("POST", s"/v1/metric/$m2/measures",
      body = measuresJson(all.take(8))).status === 202)
    assert(read(m2, "rate:mean", refresh = true).nonEmpty)
    assert(api.dispatch("POST", s"/v1/metric/$m2/measures",
      body = measuresJson(all.drop(8))).status === 202)
    assert(read(m2, "rate:mean", refresh = true) === rateMean)
    assert(read(m2, "rate:95pct") === List(
      (ts("14:34"), 3.0), (ts("14:35"), 15.0), (ts("14:36"), 30.25)))
    assert(read(m2, "rate:max") === List(
      (ts("14:34"), 3.0), (ts("14:35"), 18.0), (ts("14:36"), 38.0)))
    assert(read(m2, "max") === List(
      (ts("14:33"), 10.0), (ts("14:34"), 20.0), (ts("14:35"), 55.0),
      (ts("14:36"), 110.0)))
  }

  test("resample-calendar.yaml walk: ?resample=Y/H/Q/M/W over a daily " +
      "policy — calendar token in the gran slot, nested archive_policy " +
      "in the metric list, archive_policy_name on create") {
    val api = newApi
    assert(api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "cookies",
          "definition": [{"granularity": "1 day"}]}""").status === 201)
    val emptyList = api.dispatch("GET", "/v1/metric")
    assert(emptyList.status === 200 && emptyList.body === JArray(Nil))
    val created = api.dispatch("POST", "/v1/metric",
      body = """{"archive_policy_name": "cookies"}""")
    assert(created.status === 201)
    assert(created.body \ "archive_policy_name" === JString("cookies"))
    val mid = (created.body \ "id").asInstanceOf[JString].s
    assert(api.dispatch("GET", s"/v1/metric/$mid").body \
      "archive_policy" \ "name" === JString("cookies"))
    val listed = api.dispatch("GET", "/v1/metric")
    assert(listed.body.asInstanceOf[JArray].arr.head \
      "archive_policy" \ "name" === JString("cookies"))
    assert(api.dispatch("POST", s"/v1/metric/$mid/measures", body =
      """[{"timestamp": "2015-03-01T14:34:12", "value": 10},
          {"timestamp": "2015-03-06T14:34:12", "value": 12},
          {"timestamp": "2015-04-01T14:34:12", "value": 2},
          {"timestamp": "2015-04-06T14:34:12", "value": 4},
          {"timestamp": "2015-10-06T14:34:12", "value": 7},
          {"timestamp": "2016-01-06T14:34:12", "value": 12},
          {"timestamp": "2016-02-06T14:34:12", "value": 4}]""")
      .status === 202)
    def cal(unit: String) = {
      val r = api.dispatch("GET", s"/v1/metric/$mid/measures",
        query = Map("resample" -> unit, "granularity" -> "86400"))
      assert(r.status === 200)
      r.body.asInstanceOf[JArray].arr.map {
        case JArray(List(JString(t), gran, JDouble(v))) =>
          assert(gran === JString(unit)) // calendar token, not 86400.0
          (t, v)
        case other => fail(s"bad triple: $other")
      }
    }
    // plain daily read first (drains staging via refresh)
    val daily = api.dispatch("GET", s"/v1/metric/$mid/measures",
      query = Map("refresh" -> "true"))
    assert(daily.body.asInstanceOf[JArray].arr.size === 7)
    assert(cal("Y") === List(
      ("2015-01-01T00:00:00Z", 7.0), ("2016-01-01T00:00:00Z", 8.0)))
    assert(cal("H") === List(
      ("2015-01-01T00:00:00Z", 7.0), ("2015-07-01T00:00:00Z", 7.0),
      ("2016-01-01T00:00:00Z", 8.0)))
    assert(cal("Q") === List(
      ("2015-01-01T00:00:00Z", 11.0), ("2015-04-01T00:00:00Z", 3.0),
      ("2015-10-01T00:00:00Z", 7.0), ("2016-01-01T00:00:00Z", 8.0)))
    assert(cal("M") === List(
      ("2015-03-01T00:00:00Z", 11.0), ("2015-04-01T00:00:00Z", 3.0),
      ("2015-10-01T00:00:00Z", 7.0), ("2016-01-01T00:00:00Z", 12.0),
      ("2016-02-01T00:00:00Z", 4.0)))
    assert(cal("W") === List(
      ("2015-03-01T00:00:00Z", 11.0), ("2015-03-29T00:00:00Z", 2.0),
      ("2015-04-05T00:00:00Z", 4.0), ("2015-10-04T00:00:00Z", 7.0),
      ("2016-01-03T00:00:00Z", 12.0), ("2016-01-31T00:00:00Z", 4.0)))
  }

  test("search-metric.yaml walk: repeated granularity params, " +
      "pytimeparse spellings, structured 400 for a missing " +
      "aggregation, and Invalid value for start/stop") {
    val api = newApi
    assert(api.dispatch("POST", "/v1/archive_policy", body =
      """{"name": "high",
          "definition": [
            {"granularity": "1 second", "timespan": "1 hour"},
            {"granularity": "2 second", "timespan": "1 hour"}]}""")
      .status === 201)
    val created = api.dispatch("POST", "/v1/metric",
      body = """{"archive_policy_name": "high"}""")
    assert(created.status === 201)
    val mid = (created.body \ "id").asInstanceOf[JString].s
    val measures = (0 until 12).map(i =>
      s"""{"timestamp": "2014-10-06T14:34:${12 + 2 * i}", "value": 12}""")
      .mkString("[", ",", "]")
    assert(api.dispatch("POST", "/v1/batch/metrics/measures",
      body = s"""{"$mid": $measures}""").status === 202)
    assert(api.dispatch("GET", s"/v1/metric/$mid/measures",
      query = Map("refresh" -> "true")).status === 200) // drain
    // one correct granularity, "1s" spelling
    val one = api.dispatch("POST", "/v1/search/metric",
      query = Map("metric_id" -> mid, "granularity" -> "1s"),
      body = """{"=": 12}""")
    assert(one.status === 200)
    // repeated granularity params comma-join at the server — both the
    // "1second" and "2s" spellings parse, both series search
    val multi = api.dispatch("POST", "/v1/search/metric",
      query = Map("metric_id" -> mid, "granularity" -> "1second,2s"),
      body = """{"=": 12}""")
    assert(multi.status === 200)
    // correct + incorrect → the STRUCTURED AggregationDoesNotExist 400
    val mixed = api.dispatch("POST", "/v1/search/metric",
      query = Map("metric_id" -> mid, "granularity" -> "1s,300"),
      body = """{"=": 12}""")
    assert(mixed.status === 400)
    assert(mixed.body \ "description" \ "cause" ===
      JString("Aggregation does not exist"))
    assert(mixed.body \ "description" \ "detail" \ "granularity" ===
      JInt(300))
    assert(mixed.body \ "description" \ "detail" \ "aggregation_method" ===
      JString("mean"))
    // pure incorrect → same shape
    val wrong = api.dispatch("POST", "/v1/search/metric",
      query = Map("metric_id" -> mid, "granularity" -> "300"),
      body = """{"=": 12}""")
    assert(wrong.status === 400)
    assert(wrong.body \ "description" \ "cause" ===
      JString("Aggregation does not exist"))
    // unicode operators in the body; bad start/stop pin their 400s
    val badStart = api.dispatch("POST", "/v1/search/metric",
      query = Map("metric_id" -> mid, "start" -> "foobar"),
      body = """{"∧": [{"≥": 1000}]}""")
    assert(badStart.status === 400)
    assert((badStart.body \ "description").asInstanceOf[JString].s
      .contains("Invalid value for start"))
    val badStop = api.dispatch("POST", "/v1/search/metric",
      query = Map("metric_id" -> mid, "stop" -> "foobar"),
      body = """{"∧": [{"≥": 1000}]}""")
    assert(badStop.status === 400)
    assert((badStop.body \ "description").asInstanceOf[JString].s
      .contains("Invalid value for stop"))
  }
}
