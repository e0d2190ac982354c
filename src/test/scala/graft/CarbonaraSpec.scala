package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.sources.Carbonara

/** Byte-level pins for the carbonara codec (fixtures generated with
  * numpy/struct exactly as the reference packs them — see each hex
  * blob) plus encode→decode round-trip properties and the Spark
  * import/export path end-to-end.
  */
class CarbonaraSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // numpy: ts=[1451520000e9, +12s, +63.5s] as <Q first-abs deltas,
  //        vals=[1.5, -2.25, NaN] as <d
  private val boundPayload = hex(
    "000060e0bfd52414007841cb02000000001be5c80e00000000" +
      "0000000000f83f00000000000002c0000000000000f87f")
  private val boundTs = Array(1451520000_000000000L,
    1451520012_000000000L, 1451520075_500000000L)
  private val boundVals = Array(1.5, -2.25, Double.NaN)

  // numpy: deltas=[2,3,9] <H ++ vals=[10.0, 20.5, -0.125] <d
  private val aggCPayload = hex(
    "0200030009000000000000002440" +
      "0000000000803440000000000000c0bf")
  private val aggKey = 1451520000.0
  private val aggGran = 3600.0
  private val aggTs = Array(2L, 5L, 14L)
    .map(b => 1451520000_000000000L + b * 3600_000000000L)
  private val aggVals = Array(10.0, 20.5, -0.125)

  // numpy padded <?d records for the same three points
  private val aggPaddedBytes = hex(
    "010000000000002440000000000000000000000000000000000000010000" +
      "000000803440000000000000000000000000000000000000000000000000" +
      "000000000000000000000000000000000000000000000000000000000000" +
      "00000000000000000000000000000000000001000000000000c0bf")

  test("raw buffer: decode of the numpy-packed payload and round-trip") {
    val (ts, vs) = Carbonara.decodeBound(Carbonara.lz4Compress(boundPayload))
    assert(ts.toSeq == boundTs.toSeq)
    assert(vs.take(2).toSeq == boundVals.take(2).toSeq && vs(2).isNaN)
    val again = Carbonara.decodeBound(Carbonara.encodeBound(boundTs, boundVals))
    assert(again._1.toSeq == boundTs.toSeq)
    assert(java.util.Arrays.equals(
      again._2.map(java.lang.Double.doubleToLongBits),
      boundVals.map(java.lang.Double.doubleToLongBits)))
  }

  test("aggregate split: compressed format decodes the numpy payload; " +
      "encode emits the identical pre-compression bytes") {
    val wire = 'c'.toByte +: Carbonara.lz4Compress(aggCPayload)
    val (ts, vs) = Carbonara.decodeAgg(wire, aggKey, aggGran)
    assert(ts.toSeq == aggTs.toSeq && vs.toSeq == aggVals.toSeq)
    val enc = Carbonara.encodeAggCompressed(aggTs, aggVals, aggKey, aggGran)
    assert(enc(0) == 'c'.toByte)
    assert(java.util.Arrays.equals(
      Carbonara.lz4Decompress(enc.drop(1)), aggCPayload))
  }

  test("aggregate split: padded format decodes; encode matches numpy " +
      "bytes and the reference offset") {
    val (ts, vs) = Carbonara.decodeAgg(
      // reference objects store the full padded array from the split
      // start; our fixture starts at the first point (offset 18),
      // so prepend the two missing empty records
      Array.fill[Byte](18)(0) ++ aggPaddedBytes, aggKey, aggGran)
    assert(ts.toSeq == aggTs.toSeq && vs.toSeq == aggVals.toSeq)
    val (off, bytes) = Carbonara.encodeAggPadded(aggTs, aggVals, aggKey, aggGran)
    assert(off == 18) // numpy: int((first-key)/gran)*9
    assert(java.util.Arrays.equals(bytes, aggPaddedBytes))
  }

  test("corrupt/degenerate payloads fail loudly, not silently") {
    // ragged tail = mid-stream truncation: values sit after all
    // timestamps, so silent tail-dropping would desynchronize reads
    val ragged = intercept[IllegalArgumentException] {
      Carbonara.decodeBound(Carbonara.lz4Compress(new Array[Byte](23)))
    }
    assert(ragged.getMessage.contains("whole number"))
    intercept[IllegalArgumentException] {
      Carbonara.decodeAgg(
        'c'.toByte +: Carbonara.lz4Compress(new Array[Byte](13)),
        aggKey, aggGran)
    }
    intercept[IllegalArgumentException] { // padded: 9n + 5
      Carbonara.decodeAgg(new Array[Byte](14), aggKey, aggGran)
    }
    // an lz4 header claiming more than the format's max expansion is
    // corrupt — and must reject BEFORE the output allocation, not OOM
    val bomb = new Array[Byte](8)
    java.nio.ByteBuffer.wrap(bomb)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(Int.MaxValue)
    val claimed = intercept[IllegalArgumentException] {
      Carbonara.lz4Decompress(bomb)
    }
    assert(claimed.getMessage.contains("maximum ratio"))
    // a zero/negative granularity in a split name would collapse every
    // decoded point onto the split key — reject loudly
    val zg = intercept[IllegalArgumentException] {
      Carbonara.decodeAgg(new Array[Byte](9), aggKey, 0.0)
    }
    assert(zg.getMessage.contains("non-positive granularity"))
    // padded encoder refuses what the compressed one refuses:
    // unaligned timestamps (silent shift) and same-slot collisions
    // (silent overwrite)
    val g = math.round(aggGran * 1e9)
    val k = math.round(aggKey * 1e9)
    intercept[IllegalArgumentException] {
      Carbonara.encodeAggPadded(Array(k, k + g * 3 / 2),
        Array(1.0, 2.0), aggKey, aggGran)
    }
    intercept[IllegalArgumentException] {
      Carbonara.encodeAggPadded(Array(k, k), Array(1.0, 2.0),
        aggKey, aggGran)
    }
    // export path guard: ids that cannot form an object path abort
    // rather than silently re-importing under the wrong metric
    val s = spark
    import s.implicits._
    val bad = Seq(("cpu/user", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1.0)).toDF("metric_id", "timestamp", "value")
    val e = intercept[Exception] {
      Carbonara.rawBufferObjects(bad).collect()
    }
    assert(e.getMessage != null || e.getCause != null) // wrapped by Spark
  }

  test("codec round-trips hold for arbitrary series (property)") {
    val genSeries = for {
      n <- Gen.chooseNum(0, 200)
      deltas <- Gen.listOfN(n, Gen.chooseNum(1L, 3_000_000_000_000L))
      vals <- Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-1e15, 1e15),
        Gen.oneOf(Seq(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
          Double.MinPositiveValue))))
    } yield {
      val ts = deltas.scanLeft(1451520000_000000000L)(_ + _).tail.toArray
      (ts, vals.toArray)
    }
    val p = Prop.forAll(genSeries) { case (ts, vs) =>
      val (t2, v2) = Carbonara.decodeBound(Carbonara.encodeBound(ts, vs))
      t2.toSeq == ts.toSeq && java.util.Arrays.equals(
        v2.map(java.lang.Double.doubleToLongBits),
        vs.map(java.lang.Double.doubleToLongBits))
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)

    // aggregate arm: buckets within one split window
    val genAgg = for {
      n <- Gen.chooseNum(0, 100)
      buckets <- Gen.listOfN(n, Gen.chooseNum(0L, 3599L)).map(_.distinct.sorted)
      vals <- Gen.listOfN(buckets.length max n, Gen.chooseNum(-1e12, 1e12))
    } yield (buckets.map(b => 1451520000_000000000L + b * 300_000000000L)
      .toArray, vals.take(buckets.length).toArray)
    val p2 = Prop.forAll(genAgg) { case (ts, vs) =>
      val c = Carbonara.decodeAgg(
        Carbonara.encodeAggCompressed(ts, vs, 1451520000.0, 300.0),
        1451520000.0, 300.0)
      val pd =
        if (ts.isEmpty) (Array.empty[Long], Array.empty[Double])
        else {
          val (off, bytes) = Carbonara.encodeAggPadded(
            ts, vs, 1451520000.0, 300.0)
          Carbonara.decodeAgg(Array.fill[Byte](off)(0) ++ bytes,
            1451520000.0, 300.0)
        }
      c._1.toSeq == ts.toSeq && c._2.toSeq == vs.toSeq &&
        pd._1.toSeq == ts.toSeq && pd._2.toSeq == vs.toSeq
    }
    val res2 = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(100), p2)
    assert(res2.passed, res2.status.toString)
  }

  test("MetricStore migration round-trip: exportCarbonara then " +
      "importCarbonara reproduces aggregates and raw buffer exactly") {
    import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("carbonara-mig")
    val policy = ArchivePolicy("mig", 1,
      Seq(ArchivePolicyItem(Granularity.seconds(300), None, None)),
      Set("mean", "count"))
    val src = new graft.ingest.MetricStore(s, s"$tmp/src", policy)
    val measures = (0 until 500).map { i =>
      (s"m-${i % 7}", java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z")
          .plusSeconds(i * 137L)), math.sin(i) * 100)
    }.toDF("metric_id", "timestamp", "value")
    src.addMeasures(measures)
    src.exportCarbonara(s"$tmp/tree")
    val dst = new graft.ingest.MetricStore(s, s"$tmp/dst", policy)
    dst.importCarbonara(s"$tmp/tree")
    def aggSet(st: graft.ingest.MetricStore) = st.aggregates
      .select(col("metric_id"), col("method"), col("gran_s"),
        unix_timestamp(col("bucket")).cast("long"), col("value"),
        col("split"), col("msack"))
      .collect().map(_.toSeq).toSet
    def rawSet(st: graft.ingest.MetricStore) = st.rawBuffer
      .select(col("metric_id"), col("timestamp"), col("value"), col("sack"))
      .collect().map(_.toSeq).toSet
    assert(aggSet(dst) == aggSet(src))
    assert(rawSet(dst) == rawSet(src))
    // and the migrated store serves reads + accepts the next batch
    assert(dst.getMeasures("m-1", "mean", 300L).count() ==
      src.getMeasures("m-1", "mean", 300L).count())
    dst.addMeasures(Seq(("m-1", java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T20:00:00Z")), 5.0))
      .toDF("metric_id", "timestamp", "value"))
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("store import/export: export writes the reference layout and " +
      "readAggregates/readRaw recover every row") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("carbonara-store").toString
    val aggRows = Seq(
      ("m-aaaa", "mean", 300L, 1451520000L, 1.0),
      ("m-aaaa", "mean", 300L, 1451520600L, 2.5),
      // second split window of the same series
      ("m-aaaa", "mean", 300L, 1451520000L + 300 * 3600, 7.0),
      ("m-aaaa", "max", 300L, 1451520000L, 9.0),
      ("m-bbbb", "mean", 3600L, 1451520000L, -4.0))
      .toDF("metric_id", "method", "granularity_s", "bucket_s", "value")
    Carbonara.writeObjects(Carbonara.aggSplitObjects(aggRows), base)
    val rawRows = Seq(
      ("m-aaaa", java.sql.Timestamp.from(
        java.time.Instant.parse("2016-01-01T00:00:12Z")), 5.5),
      ("m-aaaa", java.sql.Timestamp.from(
        java.time.Instant.parse("2016-01-01T01:30:00.250Z")), -1.0),
      ("m-bbbb", java.sql.Timestamp.from(
        java.time.Instant.parse("2016-01-01T00:00:00Z")), 0.125))
      .toDF("metric_id", "timestamp", "value")
    Carbonara.writeObjects(Carbonara.rawBufferObjects(rawRows), base)

    // the split object for the second window got its own file
    assert(new java.io.File(
      s"$base/m-aaaa/agg_mean").listFiles().length == 2)
    assert(new java.io.File(s"$base/m-aaaa/agg_mean/1451520000.0_300.0_v3")
      .exists())

    val gotAgg = Carbonara.readAggregates(s, base)
      .select("metric_id", "method", "granularity_s", "bucket_s", "value")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2).toLong, r.getLong(3), r.getDouble(4))).toSet
    assert(gotAgg == aggRows.collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet)

    val gotRaw = Carbonara.readRaw(s, base)
      .select("metric_id", "timestamp", "value")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toInstant,
        r.getDouble(2))).toSet
    assert(gotRaw == rawRows.collect().map(r => (r.getString(0),
      r.getTimestamp(1).toInstant, r.getDouble(2))).toSet)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
