package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import net.jpountz.lz4.LZ4Factory

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference engine's on-disk serialization (carbonara), as a
  * byte-compatible codec plus Spark import/export plumbing — the
  * migration path for a user switching an existing store to this
  * engine (SURVEY §2.9 / I8).
  *
  * Three wire shapes, all little-endian (numpy `<` dtypes):
  *
  *  - '''Raw measure buffer''' (`BoundTimeSerie`,
  *    carbonara.py:375-411): lz4-block of
  *    `u64 ns-timestamp deltas (first absolute) ++ f64 values`.
  *  - '''Aggregate split, compressed''' (carbonara.py:756-780):
  *    `'c' ++ lz4-block(u16 bucket-count deltas ++ f64 values)`;
  *    timestamps rebuild as `cumsum(deltas)·granularity + split_key`
  *    (carbonara.py:718-726). A split holds ≤ 3600 points
  *    (SplitKey.POINTS_PER_SPLIT, carbonara.py:494) so bucket deltas
  *    fit u16.
  *  - '''Aggregate split, padded''' (carbonara.py:781-802): 9-byte
  *    `<?d` records (present-flag, value), record `i` ⇒ bucket
  *    `split_key + i·granularity`; serialize returns the byte offset
  *    of the first point for offset-writable stores.
  *
  * The lz4 framing is the python `lz4.block` default: a `u32le`
  * uncompressed-length header followed by one standard LZ4 block
  * (both sides interoperate with any LZ4 block codec; lz4-java ships
  * with Spark).
  *
  * Store layout (storage/file.py:118-145): per-metric directory whose
  * LAST path segment is the dashed metric uuid (subdir sharding only
  * prefixes extra segments), holding `none_v3` (raw buffer) and
  * `agg_<method>/<split_epoch>_<granularity_s>_v3` split objects,
  * both float-formatted seconds (SplitKey.__str__,
  * carbonara.py:555-561).
  */
object Carbonara {

  final val Version = "v3"
  final val PointsPerSplit = 3600L // carbonara.py:494

  // ------------------------------------------------------------- lz4 framing

  @transient private lazy val lz4 = LZ4Factory.fastestInstance()

  /** python lz4.block.compress: u32le raw length + one LZ4 block. */
  def lz4Compress(payload: Array[Byte]): Array[Byte] = {
    val c = lz4.fastCompressor()
    val out = new Array[Byte](4 + c.maxCompressedLength(payload.length))
    ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length)
    val n = c.compress(payload, 0, payload.length, out, 4)
    java.util.Arrays.copyOf(out, 4 + n)
  }

  /** python lz4.block.decompress of [[lz4Compress]]'s framing. */
  def lz4Decompress(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 4, s"lz4 block too short: ${data.length}")
    val n = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).getInt()
    require(n >= 0, s"negative lz4 payload length $n")
    // LZ4 expands at most 255x + a small constant: a header claiming
    // more is corrupt, and allocating it first would OOM the executor
    // before the decompressor ever complains
    require(n <= (data.length.toLong - 4) * 255 + 16,
      s"lz4 header claims $n bytes from a ${data.length - 4}-byte " +
        "block — over the format's maximum ratio, corrupt object")
    val out = new Array[Byte](n)
    val got = lz4.safeDecompressor().decompress(data, 4, data.length - 4, out, 0)
    require(got == n,
      s"lz4 payload decompressed to $got bytes, header says $n — corrupt " +
        "object (a zero-filled tail would decode as phantom points)")
    out
  }

  // --------------------------------------------------- raw buffer (none_v3)

  /** Decode a raw-buffer object to (ns timestamps, values); the
    * timestamps are delta-encoded with the first absolute
    * (carbonara.py:379-404). */
  def decodeBound(data: Array[Byte]): (Array[Long], Array[Double]) = {
    val raw = lz4Decompress(data)
    // a ragged tail means mid-stream truncation/corruption — and since
    // values sit AFTER all timestamps, it would also desynchronize
    // every value read; fail loudly like lz4Decompress does
    require(raw.length % 16 == 0,
      s"raw-buffer payload length ${raw.length} is not a whole number " +
        "of <Qd> records — corrupt object")
    val n = raw.length / 16 // _SERIALIZATION_TIMESTAMP_VALUE_LEN = <Qd>
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val ts = new Array[Long](n)
    val vs = new Array[Double](n)
    var cum = 0L
    var i = 0
    while (i < n) { cum += bb.getLong(i * 8); ts(i) = cum; i += 1 }
    i = 0
    while (i < n) { vs(i) = bb.getDouble(n * 8 + i * 8); i += 1 }
    (ts, vs)
  }

  /** Encode sorted (ns timestamps, values) as a raw-buffer object
    * (carbonara.py:406-411). */
  def encodeBound(tsNs: Array[Long], values: Array[Double]): Array[Byte] = {
    require(tsNs.length == values.length,
      s"ts/value length mismatch: ${tsNs.length} vs ${values.length}")
    val n = tsNs.length
    val raw = new Array[Byte](n * 16)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      bb.putLong(i * 8, if (i == 0) tsNs(0) else tsNs(i) - tsNs(i - 1))
      i += 1
    }
    i = 0
    while (i < n) { bb.putDouble(n * 8 + i * 8, values(i)); i += 1 }
    lz4Compress(raw)
  }

  // --------------------------------------------- aggregate split (agg_<m>/…)

  /** Decode one aggregate split object to (ns bucket timestamps,
    * values), handling both the compressed and the padded format
    * (carbonara.py:697-741). `keyEpochSec`/`granSec` come from the
    * object name. */
  def decodeAgg(data: Array[Byte], keyEpochSec: Double,
                granSec: Double): (Array[Long], Array[Double]) = {
    if (data.isEmpty) return (Array.empty, Array.empty)
    // a zero/negative granularity can only come from a corrupt object
    // name — decoding with it would silently collapse every point onto
    // the split key
    require(granSec > 0,
      s"non-positive granularity ${granSec}s in split object name — " +
        "corrupt object")
    val keyNs = math.round(keyEpochSec * 1e9)
    val granNs = math.round(granSec * 1e9)
    if (data(0) == 'c'.toByte) {
      val raw = lz4Decompress(java.util.Arrays.copyOfRange(data, 1, data.length))
      require(raw.length % 10 == 0,
        s"compressed agg payload length ${raw.length} is not a whole " +
          "number of <Hd> records — corrupt object")
      val n = raw.length / 10 // COMPRESSED_SERIAL_LEN = <Hd>
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      val ts = new Array[Long](n)
      val vs = new Array[Double](n)
      var cum = 0L
      var i = 0
      while (i < n) {
        cum += bb.getShort(i * 2) & 0xffff
        ts(i) = keyNs + cum * granNs
        i += 1
      }
      i = 0
      while (i < n) { vs(i) = bb.getDouble(n * 2 + i * 8); i += 1 }
      (ts, vs)
    } else {
      // padded <?d records; record i => key + i*gran where flag set
      require(data.length % 9 == 0,
        s"padded agg payload length ${data.length} is not a whole " +
          "number of <?d> records — corrupt object")
      val n = data.length / 9 // PADDED_SERIAL_LEN
      val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      val ts = Array.newBuilder[Long]
      val vs = Array.newBuilder[Double]
      var i = 0
      while (i < n) {
        if (data(i * 9) != 0) {
          ts += keyNs + i * granNs
          vs += bb.getDouble(i * 9 + 1)
        }
        i += 1
      }
      (ts.result(), vs.result())
    }
  }

  /** Encode sorted in-split bucket timestamps/values in the compressed
    * format (carbonara.py:774-780). */
  def encodeAggCompressed(tsNs: Array[Long], values: Array[Double],
                          keyEpochSec: Double, granSec: Double): Array[Byte] = {
    require(tsNs.length == values.length,
      s"ts/value length mismatch: ${tsNs.length} vs ${values.length}")
    val keyNs = math.round(keyEpochSec * 1e9)
    val granNs = math.round(granSec * 1e9)
    val n = tsNs.length
    val raw = new Array[Byte](n * 10)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    var prev = keyNs
    var i = 0
    while (i < n) {
      require((tsNs(i) - prev) % granNs == 0,
        s"timestamp ${tsNs(i)} at $i is not aligned to the ${granNs}ns " +
          "granularity — integer-dividing would silently shift the point")
      val d = (tsNs(i) - prev) / granNs
      require(d >= 0 && d <= 0xffff,
        s"bucket delta $d out of u16 at $i (split too wide?)")
      // same rule as the padded encoder: two points in one granule is
      // an upstream bug (aggregated buckets are unique by
      // construction) — a zero delta would silently encode a duplicate
      // timestamp that re-imports as two coincident points
      require(i == 0 || d > 0,
        s"duplicate bucket timestamp ${tsNs(i)} at $i — aggregated " +
          "points must be unique per granule")
      bb.putShort(i * 2, d.toShort)
      prev = tsNs(i)
      i += 1
    }
    i = 0
    while (i < n) { bb.putDouble(n * 2 + i * 8, values(i)); i += 1 }
    'c'.toByte +: lz4Compress(raw)
  }

  /** Encode in the padded offset-writable format
    * (carbonara.py:781-802): returns (byte offset of the first point,
    * bytes from that point on). */
  def encodeAggPadded(tsNs: Array[Long], values: Array[Double],
                      keyEpochSec: Double,
                      granSec: Double): (Int, Array[Byte]) = {
    require(tsNs.length == values.length,
      s"ts/value length mismatch: ${tsNs.length} vs ${values.length}")
    if (tsNs.isEmpty) return (0, Array.empty)
    val keyNs = math.round(keyEpochSec * 1e9)
    val granNs = math.round(granSec * 1e9)
    val n = tsNs.length
    val eOffset = ((tsNs(n - 1) - tsNs(0)) / granNs).toInt + 1
    val out = new Array[Byte](eOffset * 9)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      // same guards as the compressed encoder: integer-dividing an
      // unaligned timestamp would silently SHIFT the point, and two
      // points in one granule would silently overwrite each other
      require((tsNs(i) - keyNs) % granNs == 0,
        s"timestamp ${tsNs(i)} at $i is not aligned to the ${granNs}ns " +
          "granularity — integer-dividing would silently shift the point")
      val loc = ((tsNs(i) - tsNs(0)) / granNs).toInt
      require(out(loc * 9) == 0,
        s"two points in one ${granNs}ns granule at slot $loc — the " +
          "second would silently overwrite the first")
      out(loc * 9) = 1
      bb.putDouble(loc * 9 + 1, values(i))
      i += 1
    }
    val offset = ((tsNs(0) - keyNs) / granNs).toInt * 9
    (offset, out)
  }

  // ------------------------------------------------------ names & split keys

  /** SplitKey epoch for a bucket (carbonara.py:504-510): floor to
    * granularity·3600. */
  def splitKeyEpochS(bucketS: Long, granS: Long): Long =
    math.floorDiv(bucketS, granS * PointsPerSplit) * granS * PointsPerSplit

  /** Object name for one aggregate split:
    * `<epoch>_<granularity_s>_v3`, both float-formatted as
    * SplitKey.__str__/timespan_total_seconds render them. */
  def splitObjectName(keyEpochSec: Double, granSec: Double): String =
    s"${fmtF(keyEpochSec)}_${fmtF(granSec)}_$Version"

  private def fmtF(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e16) s"${d.toLong}.0"
    else d.toString

  /** Parse `<epoch>_<gran>_v3` (allowing unversioned names too) into
    * (splitEpochSec, granularitySec). */
  def parseSplitName(name: String): Option[(Double, Double)] = {
    val base = if (name.endsWith(s"_$Version"))
      name.dropRight(Version.length + 1) else name
    base.split('_') match {
      case Array(k, g) =>
        try Some((k.toDouble, g.toDouble))
        catch { case _: NumberFormatException => None }
      case _ => None
    }
  }

  // ------------------------------------------------------------ Spark import

  private val rawSchema = StructType(Seq(
    StructField("metric_id", StringType),
    StructField("ts", LongType),
    StructField("value", DoubleType)))

  private val aggSchema = StructType(Seq(
    StructField("metric_id", StringType),
    StructField("method", StringType),
    StructField("granularity_s", DoubleType),
    StructField("ts", LongType),
    StructField("value", DoubleType)))

  /** Import every raw measure buffer under a reference store tree as
    * `(metric_id, timestamp, value)`. Distributed: the binaryFile
    * source lists and reads splits across executors; decode is pure
    * per-file map work (one buffer per metric, reference-bounded to
    * the back window). */
  def readRaw(spark: SparkSession, basepath: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(rawSchema)
    val rows = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", s"none_$Version")
      .load(basepath)
      .select(col("path"), col("content"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val parts = r.getString(0).split('/')
          val metric = parts(parts.length - 2)
          val (ts, vs) = decodeBound(r.getAs[Array[Byte]](1))
          ts.indices.iterator.map(i => Row(metric, ts(i), vs(i)))
        }
      }(enc)
    rows.select(col("metric_id"),
      // floor, not truncate-toward-zero: a pre-1970 sub-us timestamp
      // must not move FORWARD across a bucket boundary
      timestamp_micros(expr(
        "(ts - ((ts % 1000) + 1000) % 1000) div 1000")).as("timestamp"),
      col("value"))
  }

  /** Import every aggregate split under a reference store tree as
    * `(metric_id, method, granularity_s, bucket_s, timestamp, value)`.
    * Split key and granularity parse from the object NAME, method from
    * the `agg_<method>` directory — pure per-file decode, no shuffle.
    */
  def readAggregates(spark: SparkSession, basepath: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(aggSchema)
    val rows = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      // split object names start with the epoch digit — the glob keeps
      // the none_v3 raw buffers out of the scan entirely (the rlike
      // below is a row filter; by then binaryFile has already read the
      // file body)
      .option("pathGlobFilter", "{[0-9],-}*") // '-': pre-1970 splits
      .load(basepath)
      .filter(col("path").rlike("/agg_[^/]+/[^/]+$"))
      .select(col("path"), col("content"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val parts = r.getString(0).split('/')
          val name = parts(parts.length - 1)
          val aggDir = parts(parts.length - 2)
          val metric = parts(parts.length - 3)
          parseSplitName(name).iterator.flatMap { case (key, gran) =>
            val method = aggDir.stripPrefix("agg_")
            val (ts, vs) = decodeAgg(r.getAs[Array[Byte]](1), key, gran)
            ts.indices.iterator.map(i => Row(metric, method, gran, ts(i), vs(i)))
          }
        }
      }(enc)
    rows.select(col("metric_id"), col("method"), col("granularity_s"),
      // floor, not truncate-toward-zero: pre-1970 ns must bucket DOWN
      expr("(ts - ((ts % 1000000000) + 1000000000) % 1000000000) div 1000000000")
        .as("bucket_s"),
      // same floor rule as bucket_s — `div` truncation would let a
      // pre-1970 timestamp and its bucket disagree
      timestamp_micros(expr(
        "(ts - ((ts % 1000) + 1000) % 1000) div 1000")).as("timestamp"),
      col("value"))
  }

  // ------------------------------------------------------------ Spark export

  /** Pack aggregate rows `(metric_id, method, granularity_s long,
    * bucket_s long, value)` into carbonara split objects
    * `(metric_id, method, rel_path, data)` — one compressed object per
    * (metric, method, granularity, split key), the incremental unit
    * the reference writes. One shuffle on the object key; object
    * payloads are built per group, never collected. */
  /** Metric-id path-segment guard for export `rel_path`s: the
    * reference keys objects by UUID, but ids here are arbitrary
    * strings — a '/' would nest directories and RE-IMPORT under the
    * wrong metric (the readers take path segments positionally), and
    * a ':' in the leading segment makes `new Path(base, rel)` parse it
    * as a URI scheme. Refuse loudly instead of silently corrupting a
    * migration.
    */
  private def pathSafeId(id: String): String = {
    require(id.nonEmpty && !id.contains('/') && !id.contains(':'),
      s"metric id '$id' cannot form a carbonara object path " +
        "(empty, or contains '/' or ':') — rename or map ids before export")
    id
  }

  def aggSplitObjects(rows: DataFrame): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    // second-keyed input contract: bucket_s is whole seconds, so a
    // non-whole-second granularity (valid in the reference, and
    // emitted by readAggregates) cannot round-trip here — the long
    // cast would truncate it (1.5 -> 1, 0.5 -> 0). Refuse loudly AT
    // EXECUTION, per row, keeping this builder lazy (the old eager
    // isEmpty probe ran the whole upstream pipeline twice).
    val gD = col("granularity_s").cast("double")
    val gGuarded = when(gD >= 1.0 && gD === floor(gD), gD.cast("long"))
      .otherwise(raise_error(concat(
        lit("aggSplitObjects: granularity "), gD.cast("string"),
        lit(" is not a whole second >= 1 (bucket_s is second-keyed); " +
          "filter before export"))).cast("long"))
    rows.select(col("metric_id").cast("string"), col("method"),
        gGuarded.as("granularity_s"), col("bucket_s").cast("long"),
        col("value").cast("double"))
      .as[(String, String, Long, Long, Double)]
      .groupByKey { t: (String, String, Long, Long, Double) =>
        (t._1, t._2, t._3, splitKeyEpochS(t._4, t._3))
      }
      .mapGroups { (k: (String, String, Long, Long),
                    it: Iterator[(String, String, Long, Long, Double)]) =>
        val pts = it.map(t => (t._4 * 1_000_000_000L, t._5)).toArray.sortBy(_._1)
        val data = encodeAggCompressed(pts.map(_._1), pts.map(_._2),
          k._4.toDouble, k._3.toDouble)
        (k._1, k._2,
          s"${pathSafeId(k._1)}/agg_${k._2}/" +
            splitObjectName(k._4.toDouble, k._3.toDouble),
          data)
      }
      .toDF("metric_id", "method", "rel_path", "data")
  }

  /** Pack raw measure rows `(metric_id, timestamp, value)` into
    * `(metric_id, rel_path, data)` raw-buffer objects (one per
    * metric, `none_v3`). */
  def rawBufferObjects(rows: DataFrame): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    rows.select(col("metric_id").cast("string"),
        unix_micros(col("timestamp")) * 1000L, col("value").cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (m: String, it: Iterator[(String, Long, Double)]) =>
        val pts = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        (m, s"${pathSafeId(m)}/none_$Version",
          encodeBound(pts.map(_._1), pts.map(_._2)))
      }
      .toDF("metric_id", "rel_path", "data")
  }

  /** Write `(rel_path, data)` objects under `basepath` through the
    * Hadoop filesystem — executor-side, one file per object, any
    * supported FS. */
  def writeObjects(objects: DataFrame, basepath: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      objects.sparkSession.sparkContext.hadoopConfiguration)
    objects.select(col("rel_path"), col("data")).foreachPartition {
      it: Iterator[Row] =>
        // raw FS: a ChecksumFileSystem would litter the store tree
        // with .crc sidecars the reference engine never writes
        val fs0 = new org.apache.hadoop.fs.Path(basepath)
          .getFileSystem(conf.value)
        val fs = fs0 match {
          case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
          case other => other
        }
        it.foreach { r =>
          val p = new org.apache.hadoop.fs.Path(basepath, r.getString(0))
          val out = fs.create(p, true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
    }
  }
}
