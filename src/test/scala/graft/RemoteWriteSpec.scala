package graft

import org.apache.spark.sql.functions._
import graft.ingest.RemoteWrite

class RemoteWriteSpec extends SparkSpec {

  test("prometheus mapping: job@instance resource, __name__ metric, NaN dropped") {
    val s = spark
    import s.implicits._
    val samples = Seq(
      (Map("__name__" -> "up", "job" -> "api", "instance" -> "h1:9090"),
        1700000000000L, 1.0),
      (Map("__name__" -> "up", "job" -> "api", "instance" -> "h1:9090"),
        1700000015000L, Double.NaN), // staleness marker
      (Map("job" -> "api"), 1700000000000L, 5.0)) // unnamed -> dropped
      .toDF("labels", "ts_ms", "value")
    val out = RemoteWrite.prometheusToMeasures(samples).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "api@h1:9090")
    assert(out(0).getString(1) == "up")
    assert(out(0).getDouble(3) == 1.0)
  }

  test("remote-write WIRE round trip: snappy + protobuf WriteRequest") {
    import graft.ingest.PromProto
    val s = spark
    import s.implicits._
    val req = PromProto.encodeWriteRequest(Seq(
      PromProto.Series(
        Map("__name__" -> "up", "job" -> "api", "instance" -> "h1:9090"),
        Seq((1700000000000L, 1.0), (1700000015000L, 0.5))),
      PromProto.Series(
        Map("__name__" -> "cpu", "job" -> "api", "instance" -> "h2:9090"),
        Seq((1700000000000L, 42.0)))))
    val body = org.xerial.snappy.Snappy.compress(req)
    val out = RemoteWrite.remoteWriteToMeasures(Seq(body).toDF("body"))
      .orderBy("timestamp", "metric")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getDouble(3))).toSeq
    assert(out == Seq(
      ("api@h2:9090", "cpu", 1700000000000L, 42.0),
      ("api@h1:9090", "up", 1700000000000L, 1.0),
      ("api@h1:9090", "up", 1700000015000L, 0.5)))
    // unknown fields (e.g. exemplars = field 3) are skipped, not fatal
    val withUnknown = req ++ Array[Byte](0x1a, 0x02, 0x08, 0x00) // field 3 len 2
    val parsed = PromProto.parseWriteRequest(withUnknown)
    assert(parsed.map(_.samples.size).sum == 3)
  }

  test("collectd mapping: per-dsname fan-out, instance dashes") {
    val s = spark
    import s.implicits._
    val body =
      """[{"host":"web1","plugin":"cpu","plugin_instance":"0",
          "type":"cpu","type_instance":"idle","time":1700000000.25,
          "dsnames":["value"],"values":[99.5]},
         {"host":"web1","plugin":"df","plugin_instance":"",
          "type":"df_complex","type_instance":"free","time":1700000000.0,
          "dsnames":["read","write"],"values":[1.0,2.0]}]"""
        .replaceAll("\n\\s*", "")
    val out = RemoteWrite.collectdToMeasures(Seq(body).toDF("body"))
      .collect().map(r => (r.getString(1), r.getDouble(3))).toSet
    assert(out == Set(
      ("cpu-0@cpu-idle", 99.5),
      ("df@df_complex-free-read", 1.0),
      ("df@df_complex-free-write", 2.0)))
  }

  test("store compact and raw re-truncation keep data readable") {
    val root = java.nio.file.Files.createTempDirectory("graft-j2").toString
    val g = new graft.api.Graft(spark, root)
    g.createMetric("m", "low")
    g.addMeasures("m", Seq(("2024-01-01 10:00:00", 1.0),
      ("2024-01-01 10:05:00", 3.0)))
    g.process()
    val store = new graft.ingest.MetricStore(spark, s"$root/low",
      g.policies("low"))
    val before = g.getMeasures("m", "mean")
    store.compact()
    store.truncateRaw()
    assert(g.getMeasures("m", "mean") == before)
  }
}
