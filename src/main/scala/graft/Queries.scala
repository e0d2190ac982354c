package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.expressions.Window
import graft.model.Granularity
import graft.timeseries.{Bucketing, Kernels, TimeSeriesOps}
import graft.ops.{Compiler, GroupedOps, Parser}
import graft.catalog.{Filter, FilterParser, HistoryAgg, Pagination}
import graft.query.MeasureSearch
import graft.llm.{Dedup, Multimodal, Pipeline, Pq, Similarity, TextAnalysis}
import graft.model.{ArchivePolicy, ArchivePolicyItem}
import graft.ingest.MetricStore

/** The operator inventory as driver-checkable queries (SURVEY §2 ids in
  * the names). Every query with a DuckDB-expressible semantic carries an
  * oracle in [[Oracles]]; output columns are named identically on both
  * sides, timestamps are emitted as epoch-second longs, and doubles are
  * quantized to float32 on both sides (CAST AS REAL in the oracle) so
  * the hash compare is stable: decimal ROUND is unsafe (data means land
  * exactly on half-way points and Spark HALF_UP disagrees with DuckDB's
  * binary round), while IEEE double->float narrowing is identical in
  * both engines and last-ulp double noise vanishes below float precision.
  */
object Queries {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive event-time normalization. The testdata generator
    * has shipped `events.ts` both as parquet TIMESTAMP(NANOS) — which
    * Spark reads as LongType under nanosAsLong — and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) — which Spark reads as
    * TIMESTAMP_NTZ; queries must survive either era without edits.
    * Output is session-UTC TimestampType in every case (µs precision;
    * the ns-era data is µs-aligned so narrowing is lossless).
    */
  def adaptTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      // integer `div`, not `/1000` double division: at epoch-ns
      // magnitude (~1.7e18) a double's ulp is ~256 ns, so the rounded
      // quotient can land 1 µs off the exact value DuckDB's epoch_us
      // computes — invisible under second-floor bucketing, fatal for
      // µs-exact comparisons (au1)
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      // NTZ wall-clock reinterpreted under the UTC session is the same
      // instant the generator wrote (it emits UTC)
      case TimestampNTZType | TimestampType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"unsupported $tsCol type for events: $other")
    }

  def events(s: SparkSession, dir: String): DataFrame =
    adaptTs(table(s, dir, "events"))

  /** Pushdown-friendly raw slice `[loS, hiS)` (epoch seconds) on events
    * BEFORE ts normalization: the literals match the stored type, so the
    * predicate reaches the parquet scan (PushedFilters → row-group
    * pruning) in every schema era; a predicate on the derived column
    * would read the whole corpus at scale.
    */
  def eventsSlice(s: SparkSession, dir: String, loS: Long, hiS: Long): DataFrame = {
    val raw = table(s, dir, "events")
    val sliced = raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= loS * 1_000_000_000L &&
          col("ts") < hiS * 1_000_000_000L)
      case TimestampNTZType =>
        raw.filter(
          col("ts") >= lit(java.time.LocalDateTime.ofEpochSecond(
            loS, 0, java.time.ZoneOffset.UTC)) &&
          col("ts") < lit(java.time.LocalDateTime.ofEpochSecond(
            hiS, 0, java.time.ZoneOffset.UTC)))
      case TimestampType =>
        raw.filter(col("ts") >= lit(java.time.Instant.ofEpochSecond(loS)) &&
          col("ts") < lit(java.time.Instant.ofEpochSecond(hiS)))
      case other => throw new IllegalArgumentException(
        s"unsupported ts type for events: $other")
    }
    adaptTs(sliced)
  }

  private val H = 3600L
  private def bucketS(ts: Column = col("bucket")): Column =
    unix_timestamp(ts).cast("long").as("bucket_s")
  private def r6(c: Column): Column = c.cast("float")

  /** Hourly per-event-type series via the kernel registry. */
  private def hourly(s: SparkSession, dir: String, method: String): DataFrame =
    Kernels.aggregate(events(s, dir), method, Granularity.seconds(H),
      Seq("event_type"), "ts", "value", tieCols = Seq("event_id"))

  /** Long-format hourly mean series keyed by DSL ref name. */
  private def hourlyLong(s: SparkSession, dir: String,
                         types: Seq[String]): DataFrame =
    hourly(s, dir, "mean")
      .filter(col("event_type").isin(types: _*))
      .select(concat(col("event_type"), lit("/mean")).as("ref"),
        col("bucket"), col("value"))

  private def grid(s: SparkSession, dir: String, types: Seq[String]) =
    Compiler.align(hourlyLong(s, dir, types), types.map(t => s"$t/mean"))

  private val allTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Shared ANN-recall verification shape (sim2/3/4/5/6). Rows are the
    * EXACT top-5 per query — independently recomputable by the oracle
    * (DuckDB `list_cosine_similarity` brute force), so the baseline
    * every recall is measured against sits under an external check at
    * ANY sf — plus a `recall_ok` flag comparing the approximate arm's
    * hit count to `minRecall` × total. Thresholds carry margin over
    * the measured recalls, so a testdata regeneration moves the
    * numbers without faking a red round; the point-exact recall
    * values are pinned on fixtures in LlmSpec.
    */
  private def annRecallRows(em: DataFrame, q: DataFrame, approx: DataFrame,
                            minRecall: Double): DataFrame = {
    // operator-internal persist that the returned plan reads —
    // registered with OpCaches so long-lived sessions can release it
    val exact = graft.llm.OpCaches.persist(
      Similarity.bruteForceTopK(em, q, k = 5)
        .select("query_id", "corpus_id"))
    val hits = exact.join(approx.select("query_id", "corpus_id"),
        Seq("query_id", "corpus_id"))
      .agg(count(lit(1)).as("__h"))
    val tot = exact.agg(count(lit(1)).as("__t"))
    exact.crossJoin(hits).crossJoin(tot)
      .select(col("query_id"), col("corpus_id"),
        (col("__h") >= col("__t") * minRecall).as("recall_ok"))
  }

  // ---------------------------------------------------------------- measure plane

  val measureQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_mean" -> ((s, dir) =>
      hourly(s, dir, "mean").select(col("event_type"), bucketS(), r6(col("value")).as("v"))),
    "a2_sum" -> ((s, dir) =>
      hourly(s, dir, "sum").select(col("event_type"), bucketS(), r6(col("value")).as("v"))),
    "a3_min_max" -> ((s, dir) =>
      events(s, dir)
        .withColumn("bucket", Bucketing.floorTimestamp(col("ts"), H * 1_000_000_000L))
        .groupBy("event_type", "bucket")
        .agg(r6(min("value")).as("min_v"), r6(max("value")).as("max_v"))
        .select(col("event_type"), bucketS(), col("min_v"), col("max_v"))),
    "a4_median" -> ((s, dir) =>
      hourly(s, dir, "median").select(col("event_type"), bucketS(), r6(col("value")).as("v"))),
    "a5_std" -> ((s, dir) =>
      hourly(s, dir, "std").select(col("event_type"), bucketS(), r6(col("value")).as("v"))),
    "a6_count" -> ((s, dir) =>
      hourly(s, dir, "count").select(col("event_type"), bucketS(),
        col("value").cast("long").as("n"))),
    "a7_first_last" -> ((s, dir) =>
      events(s, dir)
        .withColumn("bucket", Bucketing.floorTimestamp(col("ts"), H * 1_000_000_000L))
        .groupBy("event_type", "bucket")
        .agg(r6(min_by(col("value"), struct(col("ts"), col("event_id")))).as("first_v"),
             r6(max_by(col("value"), struct(col("ts"), col("event_id")))).as("last_v"))
        .select(col("event_type"), bucketS(), col("first_v"), col("last_v"))),
    "a8_p95" -> ((s, dir) =>
      hourly(s, dir, "95pct").select(col("event_type"), bucketS(), r6(col("value")).as("v"))),
    "a9_rate_mean" -> ((s, dir) =>
      hourly(s, dir, "rate:mean").select(col("event_type"), bucketS(), r6(col("value")).as("v"))),
    "a10_resample" -> ((s, dir) =>
      TimeSeriesOps.resample(hourly(s, dir, "mean"), "mean",
          Granularity.seconds(86400), Seq("event_type"))
        .select(col("event_type"), bucketS(), r6(col("value")).as("v"))),
    "a11_truncate" -> ((s, dir) =>
      TimeSeriesOps.truncate(
          hourly(s, dir, "mean"), 7L * 86400 * 1_000_000_000L, Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min(unix_timestamp(col("bucket")).cast("long")).as("min_bucket_s"))),
    "a12_fetch" -> ((s, dir) => {
      // Instant.parse, not Timestamp.valueOf: valueOf parses in the
      // HOST JVM timezone (only the Spark session is pinned UTC), so a
      // non-UTC host would shift the window against the UTC oracle
      val fromTs = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-10T13:37:00Z"))
      val toTs = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-20T00:00:00Z"))
      // pre-filter on the RAW ts (type-matched literals via eventsSlice)
      // so the slice reaches the parquet scan (PushedFilters ->
      // row-group pruning); a predicate on the derived bucket column
      // cannot push down and reads the whole corpus at scale.
      // [floor(from,g), floor(to,g)+g) is a superset of the bucket
      // slice; exact fetch still applies after.
      val loS = (fromTs.getTime / 1000) / H * H
      val hiS = (toTs.getTime / 1000) / H * H + H
      val raw = eventsSlice(s, dir, loS, hiS)
      val agg = Kernels.aggregate(raw, "mean", Granularity.seconds(H),
        Seq("event_type"), "ts", "value", tieCols = Seq("event_id"))
      TimeSeriesOps.fetch(agg, Granularity.seconds(H), Some(fromTs), Some(toTs))
        .select(col("event_type"), bucketS(), r6(col("value")).as("v"))
    }),
    "b1_bucket_5m" -> ((s, dir) =>
      Kernels.aggregate(events(s, dir), "mean", Granularity.seconds(300),
          Seq("event_type"), "ts", "value")
        .select(col("event_type"), bucketS(), r6(col("value")).as("v"))),
    "b2_week_sunday" -> ((s, dir) =>
      events(s, dir)
        .withColumn("bucket", Bucketing.calendarBucket(col("ts"), "W"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), r6(sum("value")).as("sum_v"))
        .select(unix_timestamp(col("bucket")).cast("long").as("week_s"),
          col("n"), col("sum_v"))),
    "b2_year" -> ((s, dir) =>
      events(s, dir)
        .withColumn("bucket", Bucketing.calendarBucket(col("ts"), "Y"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("bucket")).cast("long").as("year_s"), col("n"))),
    "b2_month" -> ((s, dir) =>
      events(s, dir)
        .withColumn("bucket", Bucketing.calendarBucket(col("ts"), "M"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("bucket")).cast("long").as("month_s"), col("n"))),
    "b2_quarter" -> ((s, dir) =>
      events(s, dir)
        .withColumn("bucket", Bucketing.calendarBucket(col("ts"), "Q"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("bucket")).cast("long").as("quarter_s"),
          col("n"))),
    "b2_half" -> ((s, dir) =>
      events(s, dir)
        .withColumn("bucket", Bucketing.calendarBucket(col("ts"), "H"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("bucket")).cast("long").as("half_s"),
          col("n"))),
    "b3_labels" -> ((s, dir) => {
      val e = events(s, dir)
      e.groupBy(
          Bucketing.calendarLabel(col("ts"), "day_of_week").as("dow"),
          Bucketing.calendarLabel(col("ts"), "quarter_of_year").as("q"),
          Bucketing.calendarLabel(col("ts"), "half_of_year").as("hy"))
        .agg(count(lit(1)).as("n"), r6(avg("value")).as("v"))
    }),
    // Sessionization: 30-min inactivity gap per user; per-session
    // event count, start, duration
    "ss1_sessionize" -> ((s, dir) => {
      val sess = TimeSeriesOps.sessionize(
        events(s, dir).select("user_id", "ts", "event_id"),
        Seq("user_id"), "ts", gapS = 1800L)
      sess.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(unix_timestamp(col("ts"))).cast("long").as("start_s"),
          (max(unix_timestamp(col("ts"))) -
            min(unix_timestamp(col("ts")))).cast("long").as("dur_s"))
    }),
    // As-of join: each click gets the latest error at-or-before its
    // timestamp per user (union + running-window formulation, one
    // shuffle, no join operator); the oracle is DuckDB's NATIVE
    // ASOF LEFT JOIN — two independent implementations of the
    // semantics under one hash
    "au1_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("err_value"))
      TimeSeriesOps.asofJoin(clicks, errors, Seq("user_id"), "ts", "ts")
        .select(col("event_id"),
          unix_micros(col("asof_ts")).as("err_ts_us"),
          r6(col("asof_err_value")).as("err_value"))
    }),
    "m1_merge_dedup" -> ((s, dir) => {
      // project BEFORE the merge: the dedup shuffles every column it
      // carries, and dragging the wide props payload through the
      // (key, ts) exchange costs ~30% at 32× scale for nothing
      val ev = events(s, dir)
        .select("user_id", "event_type", "ts", "value", "event_id")
      val newB = ev.filter(col("event_id") % 3 === 0)
        .withColumn("value", col("value") * 2)
      val merged = TimeSeriesOps.merge(newB, ev,
        Seq("user_id", "event_type"), "ts", col("event_id"),
        orderBound = 1L << 61)
      merged.groupBy("event_type")
        .agg(count(lit(1)).as("n"), r6(sum("value")).as("sum_v"))
    }))

  // ---------------------------------------------------------------- DSL plane

  val dslQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x2_arith" -> ((s, dir) => {
      val g = Compiler.eval(
        Parser.parse("(/ (+ (metric click mean) (metric error mean)) 2)"),
        grid(s, dir, Seq("click", "error")))
      // /v1/aggregates defaults to fill="dropna" → NaN/null rows dropped
      // post-eval (rest/aggregates/api.py:522-523, processor.py:237-244)
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
        .filter(col("v").isNotNull)
    }),
    "x3_clip" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse("(clip (metric view mean) 10 80)"),
        grid(s, dir, Seq("view")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    "x4_unary" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse("(abs (neg (metric click mean)))"),
        grid(s, dir, Seq("click")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    "x5_rateofchange" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse("(rateofchange (metric click mean))"),
        grid(s, dir, Seq("click")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    "x6_rateofchangesec" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse("(rateofchangesec (metric click mean))"),
        grid(s, dir, Seq("click")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    "x7_aggregate_mean" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse(
        "(aggregate mean (metric (click mean) (error mean) (purchase mean) (signup mean) (view mean)))"),
        grid(s, dir, allTypes))
      g.df.select(bucketS(), r6(col("aggregated")).as("v"))
    }),
    "x7_aggregate_std" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse(
        "(aggregate std (metric (click mean) (error mean) (purchase mean) (signup mean) (view mean)))"),
        grid(s, dir, allTypes))
      // population std across the metric axis (numpy nanstd, ddof=0)
      g.df.select(bucketS(), r6(col("aggregated")).as("v"))
        .filter(col("v").isNotNull)
    }),
    "x7_aggregate_var" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse(
        "(aggregate var (metric (click mean) (error mean) (purchase mean) (signup mean) (view mean)))"),
        grid(s, dir, allTypes))
      g.df.select(bucketS(), r6(col("aggregated")).as("v"))
        .filter(col("v").isNotNull)
    }),
    "x7_aggregate_max" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse(
        "(aggregate max (metric (click mean) (error mean) (purchase mean) (signup mean) (view mean)))"),
        grid(s, dir, allTypes))
      g.df.select(bucketS(), r6(col("aggregated")).as("v"))
        .filter(col("v").isNotNull)
    }),
    "x8_rolling_sum4" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse("(rolling sum 4 (metric click mean))"),
        grid(s, dir, Seq("click")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    "x9_resample_dsl" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse("(resample mean 86400 (metric click mean))"),
        grid(s, dir, Seq("click")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    // rolling rate:X = first-difference of the rolled series, one more
    // row consumed (operations.py:38-49 rated_agg + :258-259)
    "x8b_rolling_rate" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse(
          "(rolling rate:sum 4 (metric click mean))"),
        grid(s, dir, Seq("click")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    // resample hands each series to the CARBONARA kernels
    // (operations.py:264-280): exact-interpolated Npct and
    // timestamp-ordered last are resample-only aggregation names
    // (RESAMPLE_AVAILABLE_AGG_MAP)
    "x9b_resample_pct" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse(
          "(resample 95pct 86400 (metric click mean))"),
        grid(s, dir, Seq("click")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    "x9c_resample_last" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse(
          "(resample last 86400 (metric click mean))"),
        grid(s, dir, Seq("click")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    "p3_align_fill0" -> ((s, dir) => {
      val g = grid(s, dir, Seq("click", "purchase"))
      val filled = TimeSeriesOps.fill(g.df, g.cols, "0")
      filled.select(bucketS(),
        r6(col("click/mean")).as("click_v"), r6(col("purchase/mean")).as("purchase_v"))
    }),
    "p4_ffill" -> ((s, dir) => {
      val g = grid(s, dir, allTypes)
      val filled = TimeSeriesOps.fill(g.df, Seq("click/mean"), "ffill")
      filled.select(bucketS(), r6(col("click/mean")).as("click_ff"))
    }),
    "p4_bfill" -> ((s, dir) => {
      val g = grid(s, dir, allTypes)
      val filled = TimeSeriesOps.fill(g.df, Seq("click/mean"), "bfill")
      filled.select(bucketS(), r6(col("click/mean")).as("click_bf"))
    }),
    "p5_overlap" -> ((s, dir) => {
      val g = grid(s, dir, allTypes)
      val (_, pct) = Compiler.overlapPercent(g,
        trimHead = false, trimTail = false)
      import s.implicits._
      Seq(pct.toFloat).toDF("pct")
    }),
    // X10 grid sanity under the oracle: the aligned hourly grid passes
    // the check (row count pins it saw every bucket), and the SAME grid
    // declared as 7200 s must be rejected — hourly buckets carry two
    // residues mod 7200. The oracle derives BOTH facts from the data.
    "x10_sanity" -> ((s, dir) => {
      val g = Compiler.sanityCheck(grid(s, dir, Seq("click")),
        3600L * 1_000_000_000L)
      val rejected =
        try { Compiler.sanityCheck(g, 7200L * 1_000_000_000L); false }
        catch { case _: IllegalArgumentException => true }
      g.df.agg(count(lit(1)).as("aligned_buckets"))
        .withColumn("misaligned_rejected", lit(rejected))
    }),
    // X11: EXECUTABLE pin of the repo's one deliberate semantic
    // divergence (NOTES "null-vs-NaN grid cells"). The reference
    // materializes absent grid cells as numpy NaN, so a comparison
    // sees them — eq(NaN, 0) → False (operations.py:160-188) is a
    // real non-NaN 0.0 and `aggregate count` COUNTS it: the reference
    // returns the full grid width (here 2) for every union bucket.
    // This engine keeps absent cells null; eq(null, 0) → null and the
    // nan-skipping count SKIPS it, so the count is the number of
    // PRESENT series per bucket. The oracle encodes the repo's pinned
    // semantics; a consumer needing the reference's arithmetic over
    // absent cells densifies first with an explicit fill.
    "x11_cmp_gap" -> ((s, dir) => {
      val g = Compiler.eval(Parser.parse(
          "(aggregate count (eq (metric (purchase mean) (signup mean)) 0))"),
        grid(s, dir, Seq("purchase", "signup")))
      g.df.select(bucketS(), r6(col(g.cols.head)).as("v"))
    }),
    // P1 granularity planning under the oracle (processor.py:89-132):
    // granularities common to every referenced metric's policy, coarse
    // first; disjoint policies raise `No granularity match`. The plan
    // is a pure function of the declared policies, so the oracle pins
    // it exactly (sf-independent by construction).
    "p1_granularities" -> ((s, dir) => {
      import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}
      // fresh root (see j7): the durable catalog journals policy events
      val p1root = storeRoot("p1", dir)
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p1root), true)
      val g = new graft.api.Graft(s, p1root)
      def pol(name: String, grans: Long*): Unit = g.createPolicy(
        ArchivePolicy(name, 0,
          grans.map(x => ArchivePolicyItem(Granularity.seconds(x), None, None)),
          Set("mean")))
      pol("p1a", 300L, 3600L, 86400L)
      pol("p1b", 3600L, 86400L, 604800L)
      pol("p1c", 60L)
      g.createMetric("mA", "p1a"); g.createMetric("mB", "p1b")
      g.createMetric("mC", "p1c")
      val planned = g.commonGranularities(Seq("mA", "mB"))
      val noMatch =
        try { g.commonGranularities(Seq("mA", "mC")); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("No granularity match") }
      import s.implicits._
      planned.zipWithIndex
        .map { case (gr, i) => (i + 1L, gr, noMatch) }
        .toDF("ord", "gran_s", "no_match_rejected")
    }),
    "s1_search_measures" -> ((s, dir) => {
      import MeasureSearch._
      val pred = Or(Seq(
        Cmp(">", Value, Const(80)),
        Cmp("<", Arith("*", Value, Const(2)), Const(30))))
      hourly(s, dir, "mean").filter(MeasureSearch.compile(pred, col("value")))
        .select(col("event_type"), bucketS(), r6(col("value")).as("v"))
    }))

  // ---------------------------------------------------------------- catalog plane

  val catalogQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_filter_dsl" -> ((s, dir) => {
      val f = Filter.And(Seq(
        Filter.Cmp("=", "c_mktsegment", "BUILDING"),
        Filter.Cmp(">", "c_acctbal", 1000.0)))
      table(s, dir, "customer").filter(Filter.compile(f))
        .select(col("c_custkey"), col("c_name"), r6(col("c_acctbal")).as("acctbal"))
    }),
    "r2_string_grammar" -> ((s, dir) => {
      val f = FilterParser.parse(
        "(c_mktsegment = \"AUTOMOBILE\" or c_mktsegment = \"MACHINERY\") " +
          "and not c_acctbal < 0 and c_nationkey in [1, 2, 3, 4, 5]")
      table(s, dir, "customer").filter(Filter.compile(f))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    }),
    // lifespan is a COMPUTED field of the DSL compiler now
    // (sqlalchemy.py:1541-1568): the filter goes through
    // Filter.compile, not a hand-derived column
    "r3_lifespan" -> ((s, dir) => {
      val res = table(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(min("o_orderdate").as("started_at"), max("o_orderdate").as("ended_at"))
      res.filter(Filter.compile(FilterParser.parse(s"lifespan > ${30 * 86400}")))
        .withColumn("lifespan_days",
          ((unix_timestamp(col("ended_at")) - unix_timestamp(col("started_at"))) / 86400L)
            .cast("long"))
        .select(col("o_custkey"), col("lifespan_days"))
    }),
    "r3b_created_by" -> ((s, dir) => {
      val res = table(s, dir, "customer")
        .withColumn("creator",
          concat(col("c_mktsegment"), lit(":"), col("c_nationkey").cast("string")))
      res.filter(Filter.compile(FilterParser.parse(
          "created_by_user_id = \"BUILDING\" and created_by_project_id in [\"3\", \"7\"]")))
        .select(col("c_custkey"), col("c_nationkey"))
    }),
    "r4_pagination" -> ((s, dir) =>
      Pagination(table(s, dir, "customer"),
          Seq("c_custkey" -> true), "c_custkey", Some(100L), 50)
        .select(col("c_custkey"), col("c_name"))),
    // keyset page 2 under a NON-UNIQUE DESCENDING primary sort must
    // equal the offset-based page 2 of the same total order — the case
    // a bare `uniqueKey > marker` filter gets wrong
    "r4b_pagination_multisort" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
      val sorts = Seq("c_mktsegment" -> false)
      val p1 = Pagination(cust, sorts, "c_custkey", None, 50)
        .select(col("c_custkey")).collect()
      val marker = p1.last.getLong(0)
      Pagination(cust, sorts, "c_custkey", Some(marker), 50)
        .select(col("c_custkey"), col("c_mktsegment"))
    }),
    "r5_history_union" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val numbered = o.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_custkey"))))
      val history = numbered.filter(col("rn") < col("n"))
        .select(col("o_orderkey"), col("o_custkey"), col("rn").cast("int").as("revision"))
      val current = numbered.filter(col("rn") === col("n"))
        .select(col("o_orderkey"), col("o_custkey"), lit(-1).as("revision"))
      history.unionByName(current)
    }),
    "r6_metric_list" -> ((s, dir) => {
      val o = table(s, dir, "orders").filter(col("o_orderstatus") === "O")
      o.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), r6(sum("o_totalprice")).as("total"))
    }),
    "r7_details_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
    }),
    "r8_delete_count" -> ((s, dir) => {
      val f = Filter.And(Seq(
        Filter.Cmp("=", "o_orderstatus", "F"),
        Filter.Cmp("<", "o_totalprice", 30000.0)))
      table(s, dir, "orders").filter(Filter.compile(f))
        .agg(count(lit(1)).as("deleted"))
    }),
    // ResourceUUID id transformation (utils.py:38-59) under the
    // oracle: the COLUMN form (pure codegen'd sha1 + string ops — the
    // bulk-backfill path) against uuid5 values computed independently
    // with the public RFC-4122 algorithm. UUID-shaped ids pass through
    // canonicalized; same id under two creators diverges. Inputs are
    // fixed strings, so the oracle is exact at any sf.
    "r10_resource_uuid" -> ((s, dir) => {
      import s.implicits._
      Seq(
        ("generic zero", Some("foobar")),
        ("generic one", Some("foobar")),
        ("generic zero", Some("pasta")),
        ("instance-0042", Some("admin")),
        ("web server 3", Option.empty[String]),
        ("5A301761-AAAA-46E2-8900-8B4F6FE6675A", Some("foobar")))
        .toDF("raw_id", "creator")
        .select(col("raw_id"), col("creator"),
          graft.catalog.ResourceUuid.transformCol(col("raw_id"), col("creator"))
            .as("uuid"))
    }),
    "r9_policy_rules" -> ((s, dir) => {
      import s.implicits._
      val rules = Seq(("%", "low"), ("c%", "medium"), ("cl%", "high"), ("s%", "bool"))
        .toDF("pattern", "policy")
      val names = events(s, dir).select(col("event_type").as("name")).distinct()
      // longest-pattern-wins fnmatch (indexer/__init__.py:460-466)
      val j = names.join(broadcast(rules), expr("name LIKE pattern"))
      val w = Window.partitionBy(col("name"))
        .orderBy(length(col("pattern")).desc, col("pattern"))
      j.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("name"), col("policy"))
    }),
    // G1 plan shape: resolve the SCOPE first (segment customers →
    // their orders, narrow projection), then broadcast it against the
    // fact table — the fact side is never shuffled. This encodes the
    // same assumption the reference makes when it materializes the
    // resolved metric list driver-side (rest/aggregates/api.py:541-607):
    // a scoped query's resolved scope is bounded. Measured 32×-scale:
    // 2.9 s vs 9.9 s for the lineitem⋈orders sort-merge shuffle.
    "g1_scoped_agg" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val o = table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val c = table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val scope = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month"))
      li.join(broadcast(scope), li("l_orderkey") === scope("o_orderkey"))
        .groupBy(col("month"))
        .agg(r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
             count(lit(1)).as("n"))
        .select(unix_timestamp(col("month")).cast("long").as("month_s"),
          col("revenue"), col("n"))
    }),
    "g2_groupby_agg" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))),
          o("o_custkey") === c("c_custkey"))
        .groupBy(col("n_name"))
        .agg(r6(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
             count(lit(1)).as("n"))
    }),
    "g3_history_weight" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), unix_timestamp(col("ts")).cast("long").as("ts_s"),
          col("value"))
      import s.implicits._
      val cut = java.time.Instant.parse("2024-01-15T12:30:00Z").getEpochSecond
      val lo = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
      val hi = java.time.Instant.parse("2024-02-01T00:00:00Z").getEpochSecond
      val users = ev.select(col("user_id")).distinct()
      val revisions = users.crossJoin(
        Seq(("A", lo, cut), ("B", cut, hi)).toDF("grp", "rev_start_s", "rev_end_s"))
      HistoryAgg.weightedGroupAgg(ev, revisions, H, "user_id")
        .select(col("grp"), col("bucket_s"), r6(col("v")).as("v"))
    }),
    // G3/G4 use_history with PER-RESOURCE revision windows derived from
    // the data (each user's history flips window at first-event-day +
    // 7d + 30min — the half-hour offset forces fractional bucket
    // weighting at every revision edge)
    "g3b_history_windows" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"),
        unix_timestamp(col("ts")).cast("long").as("ts_s"), col("value"))
      val cuts = ev.groupBy("user_id")
        .agg(((floor(min(col("ts_s")) / 86400L) * 86400L) + 7L * 86400 + 1800)
          .cast("long").as("cut_s"))
      val revs = cuts
        .withColumn("w", explode(array(
          struct(lit("w1").as("grp"), lit(0L).as("rev_start_s"),
            col("cut_s").as("rev_end_s")),
          struct(lit("w2").as("grp"), col("cut_s").as("rev_start_s"),
            lit(4_000_000_000L).as("rev_end_s")))))
        .select(col("user_id"), col("w.grp").as("grp"),
          col("w.rev_start_s").as("rev_start_s"), col("w.rev_end_s").as("rev_end_s"))
      HistoryAgg.weightedGroupAgg(ev, revs, H, "user_id")
        .select(col("grp"), col("bucket_s"), r6(col("v")).as("v"))
    }),
    // G3c: the FULL Grouper surface (rest/aggregates/api.py:258-493) —
    // a two-attribute groupby and a two-metric operations tree,
    // evaluated per resource (users), weighted by revision windows
    // that flip an attribute MID-BUCKET (fractional coefficients), and
    // summed per (group tuple, bucket). ga is a static user attribute;
    // gb flips at first-event-day + 7d + 30min.
    "g3c_history_multiattr" -> ((s, dir) => {
      def perType(t: String): DataFrame =
        events(s, dir).filter(col("event_type") === t)
          .groupBy(col("user_id").as("__rid"),
            concat(lit(t + "/"), col("user_id")).as("sid"),
            Bucketing.floorTimestamp(col("ts"), H * 1_000_000_000L).as("bucket"))
          .agg(avg("value").as("value"))
      val per = GroupedOps.run(Parser.parse(
          "(/ (aggregate sum (metric click mean)) " +
            "(aggregate sum (metric view mean)))"),
          Seq("__rid"), { case (name, _) => perType(name) }, None)
        // the reference's default fill=dropna drops NaN/inf PER
        // RESOURCE before the Grouper weights and sums (processor.py:
        // 237-244 inside _get_measures_by_name)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) =!= lit(Double.PositiveInfinity))
        .withColumn("bucket_s", unix_timestamp(col("bucket")).cast("long"))
        .select(col("__rid"), col("bucket_s"), col("value"))
      val cuts = events(s, dir).groupBy(col("user_id").as("__rid"))
        .agg(((floor(min(unix_timestamp(col("ts"))) / 86400L) * 86400L) +
          7L * 86400 + 1800).cast("long").as("cut_s"))
      val revs = cuts
        .withColumn("w", explode(array(
          struct(lit("w1").as("gb"), lit(0L).as("rev_start_s"),
            col("cut_s").as("rev_end_s")),
          struct(lit("w2").as("gb"), col("cut_s").as("rev_start_s"),
            lit(4_000_000_000L).as("rev_end_s")))))
        .select(col("__rid"),
          concat(lit("u"), col("__rid") % 2).as("ga"),
          col("w.gb").as("gb"),
          col("w.rev_start_s").as("rev_start_s"),
          col("w.rev_end_s").as("rev_end_s"))
      HistoryAgg.weightedJoin(per, revs, H, "__rid", Seq("ga", "gb"))
        .select(col("ga"), col("gb"), col("bucket_s"),
          r6(col("value")).as("value"))
    }),
    // G5: resource-grouped NESTED operations (api.py:191-493 groupby ×
    // the full operations grammar). "Resources" = users (grp = id%3),
    // "metrics" = event types, series = hourly means per (user, type).
    "g5_grouped_ratio" -> ((s, dir) => {
      // the group's grid spans the UNION of BOTH subtrees' buckets
      // (processor builds ONE matrix over every referenced series) and
      // nansum over an all-absent bucket is 0.0 (operations.py:26-36)
      // — so click-only buckets divide by 0 (→ ±inf per true_divide)
      // and view-only buckets emit 0.0. The dropna output contract
      // (processor.py:257-262) then drops the non-finite positions.
      GroupedOps.run(Parser.parse(
          "(* 100 (/ (aggregate sum (metric click mean)) " +
            "(aggregate sum (metric view mean))))"),
          Seq("grp"), { case (name, _) => userHourly(s, dir, name) }, None)
        .filter(col("value").isNotNull && !isnan(col("value")) &&
          abs(col("value")) =!= lit(Double.PositiveInfinity))
        .select(col("grp"), bucketS(), r6(col("value")).as("value"))
    }),
    // rolling window per series INSIDE the group collapse: positional
    // over the densified per-group bucket union, full windows only
    "g5b_grouped_rolling" -> ((s, dir) => {
      GroupedOps.run(Parser.parse(
          "(aggregate max (rolling mean 3 (metric click mean)))"),
          Seq("grp"), { case (name, _) => userHourly(s, dir, name) }, None)
        .select(col("grp"), bucketS(), r6(col("value")).as("value"))
    }))

  /** Hourly mean series per (user-group, user) of one event type — the
    * grouped-ops leaf expansion over the events table. */
  private def userHourly(s: SparkSession, dir: String, eventType: String): DataFrame =
    events(s, dir).filter(col("event_type") === eventType)
      .groupBy((col("user_id") % 3).as("grp"),
        col("user_id").cast("string").as("sid"),
        Bucketing.floorTimestamp(col("ts"), H * 1_000_000_000L).as("bucket"))
      .agg(avg("value").as("value"))

  // ---------------------------------------------------------------- LLM pipeline

  val llmQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd1_exact_dedup" -> ((s, dir) =>
      Dedup.exact(table(s, dir, "documents"))
        .select(col("content_hash"), col("canonical_id"), col("dup_count"))),
    "dd2_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(table(s, dir, "documents"), n = 3, numHashes = 64,
        bands = 16, threshold = 0.4)
        .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))),
    // Pigeonhole candidate generation is LOSSLESS by construction, so
    // the pair set must equal the in-engine brute-force Hamming scan
    // over the same signatures: mismatches (symmetric difference) is
    // structurally 0 at ANY sf; n_docs ties the run to the data. The
    // discovered pair CONTENT is pinned on fixtures in LlmSpec — a
    // data-count literal here would fake-red on testdata regeneration.
    "dd3_simhash" -> ((s, dir) => {
      // verification harness: the brute-force Hamming arm is O(n²), so
      // the comparison domain is bounded — a no-op at the gate/bench
      // SFs (doc_id < 5000 there), a slice at sf1+
      val docs = table(s, dir, "documents").filter(col("doc_id") < 10000)
      // one signature pass shared by both arms (cache: ~16 bytes/doc)
      val sig = graft.llm.OpCaches.persist(Dedup.simhash(docs))
      val pigeon = Dedup.simhashPairsOnSig(sig, radius = 3)
      val l = sig.select(col("id").as("id_a"), col("simhash").as("sig_a"))
      val r = sig.select(col("id").as("id_b"), col("simhash").as("sig_b"))
      val brute = l.join(r, col("id_a") < col("id_b"))
        .withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
      val diff = pigeon.unionByName(brute)
        .groupBy("id_a", "id_b", "hamming").agg(count(lit(1)).as("c"))
        .filter(col("c") =!= 2)
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(diff.agg(count(lit(1)).as("mismatches")))
    }),
    "dd4_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardAllPairs(
          table(s, dir, "documents").filter(col("doc_id") < 200), n = 3, threshold = 0.4)
        .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))),
    "sim1_bruteforce_cosine" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      Similarity.bruteForceTopK(em, em.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("corpus_id"), r6(col("cosine")).as("cosine"),
          col("rank"))
    }),
    // ANN recall@5 against the in-engine exact baseline (sim1). Output
    // shape shared by sim2/3/5/6 (annRecallRows): the EXACT top-5 rows,
    // which the oracle recomputes independently (DuckDB
    // list_cosine_similarity brute force — the baseline itself is
    // under an external oracle at any sf), plus a recall_ok flag whose
    // threshold carries margin over the measured recall so a testdata
    // regeneration can't fake-red the round. The point-exact recall on
    // well-separated fixtures is pinned in LlmSpec.
    "sim2_ivf_recall" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val q = em.filter(col("vec_id") < 10)
      annRecallRows(em, q,
        Similarity.ivfTopK(em, q, k = 5, nlist = 16, nprobe = 8),
        minRecall = 0.7) // measured 0.88 at sf0.01
    }),
    // Persisted-index IVF: same centroids/assignment as sim2 through a
    // build-once/probe-many parquet index — the probe's broadcast cell
    // join dynamically prunes the cell-partitioned scan. Identical
    // centroids ⇒ identical candidate sets ⇒ sim2's recall reproduces
    // (parquet round-trip preserves doubles).
    "sim5_ivf_index" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val root = s"/tmp/graft-q-ivf/sim5-${math.abs(dir.hashCode)}"
      Similarity.writeIvfIndex(em, root, nlist = 16)
      val q = em.filter(col("vec_id") < 10)
      annRecallRows(em, q,
        Similarity.probeIvfIndex(s, root, q, k = 5, nprobe = 8),
        minRecall = 0.7) // sim2's bound: same centroids and assignment
    }),
    // Persisted IVF-PQ index (sim4's operator at sim5's
    // build-once/probe-many split): centroids + codebooks + CODES
    // partitioned by cell on disk — 8 bytes/vector where sim5's index
    // carries raw vectors — probed with DPP cell pruning and the same
    // constant-shortlist exact re-rank. Same deterministic centroids
    // and codebooks as sim4 ⇒ identical candidate sets ⇒ sim4's
    // measured recall (0.94-0.98) reproduces; bound carries margin.
    "sim7_ivfpq_index" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val root = s"/tmp/graft-q-ivfpq/sim7-${math.abs(dir.hashCode)}"
      val books = Pq.train(em, m = 8, k = 256, iters = 10, sampleN = 2048)
      Pq.writeIvfPqIndex(em, root, books, nlist = 16)
      val q = em.filter(col("vec_id") < 10)
      annRecallRows(em, q,
        Pq.probeIvfPqIndex(s, root, em, q, k = 5, nprobe = 12,
          shortlist = 200),
        minRecall = 0.65)
    }),
    "sim3_lsh_recall" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val q = em.filter(col("vec_id") < 10)
      // b=4/L=16 suits this corpus's weak neighbor structure (top-5
      // cosines ≈0.3–0.5); sharper buckets (higher b, more L) apply
      // when near-dups are true near-dups — see LlmSpec
      annRecallRows(em, q,
        Similarity.lshTopK(em, q, k = 5, bitsPerTable = 4, tables = 16),
        minRecall = 0.8) // measured 0.94 at sf0.01
    }),
    // Persisted-index LSH: sim3's parameters through the postings
    // layout — identical bucket keys ⇒ identical candidate set ⇒
    // reproduces sim3's recall
    "sim6_lsh_index" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val root = s"/tmp/graft-q-ivf/sim6-${math.abs(dir.hashCode)}"
      Similarity.writeLshIndex(em, root, bitsPerTable = 4, tables = 16)
      val q = em.filter(col("vec_id") < 10)
      annRecallRows(em, q,
        Similarity.probeLshIndex(s, root, q, k = 5),
        minRecall = 0.8)
    }),
    "txt1_tokens" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.wordCount(col("text")).as("n_words"),
          length(col("text")).as("n_chars_m"))),
    "txt2_quality" -> ((s, dir) =>
      TextAnalysis.qualitySignals(table(s, dir, "documents"))
        .select(col("doc_id"), col("n_words"),
          r6(col("punct_ratio")).as("punct_ratio"),
          r6(col("stopword_ratio")).as("stopword_ratio"),
          r6(col("mean_word_len")).as("mean_word_len"),
          r6(col("quality_score")).as("quality_score"))),
    "txt3_langid" -> ((s, dir) =>
      TextAnalysis.languageScores(table(s, dir, "documents"))
        .select(col("doc_id"), r6(col("en_score")).as("en_score"),
          r6(col("de_score")).as("de_score"),
          r6(col("es_score")).as("es_score"))),
    "txt4_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprintSql(table(s, dir, "documents"))
        .select(col("doc_id"), col("content_hash"), col("winnow_fp"))),
    // MOSS-style dedup candidates: pairs sharing >= 2 winnowing
    // fingerprints (ids only through the self-join)
    "dd8_fingerprint_dup" -> ((s, dir) =>
      Dedup.fingerprintDup(table(s, dir, "documents"))
        .select(col("id_a"), col("id_b"), col("shared"))),
    // threshold 0.45 sits just under this corpus's max pairwise cosine
    // (~0.51), so the result is non-empty — real evidence, unlike a
    // trivially-empty 0.95 cut. Exact guarded path = the oracle's own
    // semantics; the LSH default path is equivalence-checked in dd5b.
    "dd5_embedding_dup" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
        .filter(col("vec_id") < 200)
      Dedup.embeddingNearDupExact(em, threshold = 0.45,
        idCol = "vec_id", vecCol = "embedding")
        .select(col("id_a"), col("id_b"), r6(col("cosine")).as("cosine"))
    }),
    // LSH-default vs exact equivalence at a true near-dup threshold
    // (0.95): both are empty on this corpus, and the spec suite pins
    // the non-empty case on synthetic near-identical vectors.
    "dd5b_embedding_lsh" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
        .filter(col("vec_id") < 200)
      val lsh = Dedup.embeddingNearDup(em, threshold = 0.95)
        .select("id_a", "id_b")
      val exact = Dedup.embeddingNearDupExact(em, threshold = 0.95)
        .select("id_a", "id_b")
      val diff = lsh.unionByName(exact)
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
        .filter(col("c") =!= 2)
      diff.agg(count(lit(1)).as("mismatches"))
    }),
    "mm1_payload_meta" -> ((s, dir) =>
      Multimodal.withPayload(table(s, dir, "documents"))
        .select(col("media_id"), col("meta.kind").as("kind"),
          col("meta.n_bytes").as("n_bytes"), col("meta.width").as("width"),
          col("meta.height").as("height"))),
    "mm2_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(
          Multimodal.withPayload(table(s, dir, "documents")),
          frameSize = 64, every = 2)
        .select(col("media_id"), col("frame_no"), col("frame_md5"))),
    "mm3_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(
          Multimodal.withPayload(table(s, dir, "documents")))
        .select(col("media_id"), col("width"), col("height"),
          r6(col("mean_byte")).as("mean_byte"), col("min_byte"),
          col("max_byte"))),
    "mm4_resize" -> ((s, dir) =>
      Multimodal.resize(
          Multimodal.withPayload(table(s, dir, "documents")), 8, 8)
        .select(col("media_id"), md5(col("payload")).as("payload_md5"),
          col("meta.width").as("width"), col("meta.height").as("height"))),
    // REAL codec gate: 16×16 grayscale pixels generated per doc from a
    // SQL-expressible formula, encoded to PNG and decoded back through
    // javax.imageio — the oracle recomputes the features from the same
    // formula, so any lossy/shifted decode breaks the hash. (PNG
    // grayscale is lossless; decode(encodePng(px)) == px exactly.)
    // real RIFF/WAVE PCM16 codec round-trip: SQL-derivable samples
    // encode to wire bytes, decode through the chunk-walking parser,
    // aggregate exactly — the whole codec sits under the hash compare
    "mm6_wav_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val media = table(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = (400 + (id % 5) * 100).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 131 + i.toLong * 17) % 65536) - 32768).toShort)
          (id, Multimodal.encodeWav(16000, samples))
        }).toDF("media_id", "payload")
      Multimodal.audioFeatures(media)
        .select(col("media_id").as("doc_id"), col("sample_rate"),
          col("n_samples"), col("min_s"), col("max_s"), col("sum_s"),
          col("sum_sq"))
    }),
    "mm5_decode_png" -> ((s, dir) => {
      import s.implicits._
      val media = table(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val px = Array.tabulate(256)(i => ((id * 31 + i * 7) % 256).toByte)
          (id, Multimodal.encodePng(16, 16, px))
        }).toDF("media_id", "payload")
      Multimodal.decodeFeatures(media)
        .select(col("media_id").as("doc_id"), col("width"), col("height"),
          r6(col("mean_byte")).as("mean_byte"), col("min_byte"),
          col("max_byte"))
    }),
    // Protocol round-trips: render events as wire bodies, parse them
    // back, aggregate — the oracle aggregates events directly, so the
    // whole parser is under the hash compare. Double values survive
    // exactly via cast-to-string round-tripping (shortest repr).
    "i1_json_measures" -> ((s, dir) => {
      val body = events(s, dir).select(to_json(
        map(concat(lit("cpu."), col("event_type")),
          array(struct(
            date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("timestamp"),
            col("value").as("value"))))).as("body"))
      ingest.JsonMeasures.parseBatch(body)
        .groupBy("metric_id")
        .agg(count(lit(1)).as("n"), sum("value").as("sum_v"),
          max(unix_timestamp(col("timestamp"))).cast("long").as("max_ts_s"))
        .select(col("metric_id"), col("n"), r6(col("sum_v")).as("sum_v"),
          col("max_ts_s"))
    }),
    "i2_influx_lines" -> ((s, dir) => {
      val lines = events(s, dir).select(concat(
          lit("cpu,host=h"), col("user_id"),
          lit(",type="), col("event_type"),
          lit(" value="), col("value").cast("string"),
          lit(" "), (unix_micros(col("ts")) * 1000).cast("string"))
        .as("line"))
      ingest.LineProtocol.parse(lines)
        .groupBy("resource_id", "metric")
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
        .select(col("resource_id"), col("metric"), col("n"),
          r6(col("sum_v")).as("sum_v"))
    }),
    // I3 full wire: one snappy+protobuf WriteRequest per (user, type)
    // series, decoded back through the real codec, then aggregated
    "i3_remote_write" -> ((s, dir) => {
      import s.implicits._
      val bodies = events(s, dir)
        .select(col("user_id"), col("event_type"),
          (unix_micros(col("ts")) / 1000).cast("long").as("ts_ms"),
          col("value"))
        .as[(Long, String, Long, Double)]
        .groupByKey { case (u, t, _, _) => (u, t) }
        .mapGroups { (key: (Long, String),
                      it: Iterator[(Long, String, Long, Double)]) =>
          val samples = it.map { case (_, _, ts, v) => (ts, v) }.toSeq
          org.xerial.snappy.Snappy.compress(
            ingest.PromProto.encodeWriteRequest(Seq(ingest.PromProto.Series(
              Map("__name__" -> key._2, "job" -> "load",
                "instance" -> key._1.toString),
              samples))))
        }.toDF("body")
      ingest.RemoteWrite.remoteWriteToMeasures(bodies)
        .groupBy("metric", "resource_id")
        .agg(count(lit(1)).as("n"), r6(sum("value")).as("sum_v"))
    }),
    // I5 full wire: one AMQP 1.0 bare message per host carrying the
    // collectd JSON payload, decoded back through the real codec
    // (amqp1d.py:117-131), then aggregated under the oracle hash.
    "i5_amqp_collectd" -> ((s, dir) => {
      import s.implicits._
      val msgs = events(s, dir)
        .select(col("user_id"), col("event_type"),
          (unix_micros(col("ts")).cast("double") / 1e6).as("time"),
          col("value"))
        .as[(Long, String, Double, Double)]
        .groupByKey((r: (Long, String, Double, Double)) => r._1)
        .mapGroups { (host: Long, it: Iterator[(Long, String, Double, Double)]) =>
          val entries = it.map { case (_, t, ts, v) =>
            s"""{"host":"h$host","plugin":"cpu","plugin_instance":"","type":"$t","type_instance":"","time":$ts,"dsnames":["value"],"values":[$v]}"""
          }.mkString("[", ",", "]")
          ingest.Amqp.encodeMessage(entries.getBytes("UTF-8"),
            subject = Some("telemetry"))
        }.toDF("msg")
      ingest.RemoteWrite.amqpToMeasures(msgs)
        .groupBy("resource_id", "metric")
        .agg(count(lit(1)).as("n"), r6(sum("value")).as("sum_v"))
    }),
    "i4_statsd_flush" -> ((s, dir) => {
      val lines = events(s, dir).select(
        concat(col("event_type"), lit(":"), col("value").cast("string"),
          lit("|ms")).as("line"),
        col("event_id").as("seq"))
      ingest.Statsd.flush(ingest.Statsd.parse(lines))
        .select(col("bucket"), col("kind"), col("n"),
          r6(col("mean")).as("mean"), r6(col("lower")).as("lower"),
          r6(col("upper")).as("upper"))
    }),
    // I8 carbonara aggregate splits: hourly per-user means pack into
    // real split objects (compressed wire format, carbonara.py:774-780),
    // decode through the codec, re-encode PADDED (carbonara.py:781-802),
    // decode again — both on-disk formats sit under the oracle hash.
    "i8_carbonara_agg" -> ((s, dir) => {
      import s.implicits._
      val hourlyRows = events(s, dir)
        .groupBy(col("user_id"),
          (floor(unix_timestamp(col("ts")) / H) * H).cast("long")
            .as("bucket_s"))
        .agg(avg("value").as("value"))
        .select(col("user_id").cast("string").as("metric_id"),
          lit("mean").as("method"), lit(H).as("granularity_s"),
          col("bucket_s"), col("value"))
      graft.sources.Carbonara.aggSplitObjects(hourlyRows)
        .select(col("metric_id"), col("rel_path"), col("data"))
        .as[(String, String, Array[Byte])]
        .flatMap { case (m, path, data) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          val (key, gran) = graft.sources.Carbonara.parseSplitName(name).get
          val (ts1, vs1) = graft.sources.Carbonara.decodeAgg(data, key, gran)
          val (off, pad) = graft.sources.Carbonara
            .encodeAggPadded(ts1, vs1, key, gran)
          val (ts2, vs2) = graft.sources.Carbonara
            .decodeAgg(Array.fill[Byte](off)(0) ++ pad, key, gran)
          ts2.indices.map(i => (m, ts2(i) / 1_000_000_000L, vs2(i)))
        }
        .toDF("metric_id", "bucket_s", "value")
        .select(col("metric_id").cast("long").as("user_id"),
          col("bucket_s"), r6(col("value")).as("v"))
    }),
    // I8 carbonara raw buffers: per-user measure streams through the
    // BoundTimeSerie delta+lz4 codec (carbonara.py:375-411); the
    // decoded points aggregate to the same hourly means.
    "i8_carbonara_raw" -> ((s, dir) => {
      import s.implicits._
      graft.sources.Carbonara.rawBufferObjects(
          events(s, dir).select(
            col("user_id").cast("string").as("metric_id"),
            col("ts").as("timestamp"), col("value")))
        .select(col("metric_id"), col("data")).as[(String, Array[Byte])]
        .flatMap { case (m, data) =>
          val (ts, vs) = graft.sources.Carbonara.decodeBound(data)
          ts.indices.map(i => (m, ts(i), vs(i)))
        }
        .toDF("metric_id", "ts_ns", "value")
        .groupBy(col("metric_id").cast("long").as("user_id"),
          (expr("ts_ns div 3600000000000") * H).cast("long").as("bucket_s"))
        .agg(count(lit(1)).as("n"), r6(avg("value")).as("v"))
    }),
    // Fuzzy-dedup clustering: LSH near-dup pairs (dd2's parameters)
    // → connected components → one (canonical, size) row per cluster.
    // The fused fuzzyClusters path feeds CC representative-level star
    // edges (linear in copy-group size) instead of the expanded
    // member-level pair set (quadratic); the oracle replays it as
    // exact-jaccard pairs + a recursive min-label closure in SQL.
    "dd6_dup_clusters" -> ((s, dir) =>
      Dedup.fuzzyClusters(table(s, dir, "documents"), n = 3, numHashes = 64,
        bands = 16, threshold = 0.4)),
    "txt5_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(table(s, dir, "documents"))
        .select(col("doc_id"), r6(col("dup_line_frac")).as("dup_line_frac"),
          r6(col("top_2gram_frac")).as("top_2gram_frac"))),
    // K-means assignment self-check: every vector's assigned-cell
    // cosine must be the true argmax over ALL centroids (tolerance for
    // float noise); emits (violations=0, n=corpus size) — both
    // SQL-checkable without replaying Lloyd's algorithm in the oracle.
    // Cluster-recovery semantics are pinned in LlmSpec on synthetic
    // well-separated clusters.
    // IVF-PQ ANN recall@5 vs the exact baseline (Jégou et al. IVFADC):
    // coarse k-means cells prune each query to nprobe=12 of nlist=16
    // cells, ADC scores the survivors' 8-byte codes — the candidate
    // join never carries raw vectors — and exact cosine re-ranks a
    // CONSTANT 200-id shortlist (40·k, independent of corpus size;
    // r13 sized it at 10% of the corpus, which is an O(N) exact pass
    // per query batch — a brute force wearing a PQ costume at 10⁹
    // vectors). k*=256 sub-quantizers — the PQ paper's standard
    // codebook size (§V: one byte per code); the r13 sf0.1 sidecar
    // caught a k=16 toy codebook under-recalling (0.40@50). Measured
    // recall: 0.98/0.96/0.94 at sf0.001/0.01/0.1 — identical to the
    // exact-within-probed-cells IVF at the same nprobe, i.e. the PQ
    // stage costs ZERO recall at these scales and every miss is a
    // coarse cell miss. Flat re-rank volume: inv_sim4_rerank_ratio.
    "sim4_pq_recall" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val q = em.filter(col("vec_id") < 10)
      val books = Pq.train(em, m = 8, k = 256, iters = 10, sampleN = 2048)
      annRecallRows(em, q,
        Pq.ivfAdcTopK(em, q, books, k = 5, nlist = 16, nprobe = 12,
          shortlist = 200),
        minRecall = 0.65)
    }),
    "dd7_repeated_spans" -> ((s, dir) =>
      Dedup.repeatedSpans(table(s, dir, "documents"), w = 5)
        .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
          r6(col("dup_frac")).as("dup_frac"))),
    // Bigram-LM perplexity (CCNet-style quality signal): the corpus LM
    // is trained and applied in one plan; the oracle replays counts,
    // smoothing, and the log-space average exactly (double log/exp
    // noise vanishes under float32 quantization).
    "lm1_perplexity" -> ((s, dir) =>
      TextAnalysis.perplexity(table(s, dir, "documents"))
        .select(col("doc_id"), col("n_bigrams"),
          r6(col("avg_logp")).as("avg_logp"), r6(col("ppl")).as("ppl"))),
    // ExactSubstr span removal: tokens under any cross-doc duplicated
    // 5-gram are cut and the survivors reassembled (native merged walk)
    "es1_span_removal" -> ((s, dir) =>
      Dedup.removeRepeatedSpans(table(s, dir, "documents"), w = 5)
        .select(col("doc_id"), col("n_kept"), col("n_removed"),
          md5(col("clean")).as("clean_md5"))),
    "txt6_idf" -> ((s, dir) =>
      TextAnalysis.docFrequency(table(s, dir, "documents"))
        .select(col("token"), col("df"), r6(col("idf")).as("idf"))),
    // SemDeDup cell-restricted dedup vs ground truth: corpus size
    // (data-derived), every recorded witness recomputed from raw
    // vectors (violations = 0 structurally at any sf), the exact
    // lower-id near-dup count on the bounded id<200 slice — which the
    // oracle RECOMPUTES with DuckDB's own brute-force cosine scan —
    // and a recovery bound (cell restriction can only LOSE cross-cell
    // pairs; at least half the exact dups must survive, with margin
    // over the measured rate). Point-exact drop/recovery counts are
    // pinned on well-separated fixtures in LlmSpec.
    "sd1_semdedup" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val tau = 0.4
      val dd = graft.llm.OpCaches.persist(
        Dedup.semDedup(em, nClusters = 8, threshold = tau))
      val dropped = dd.filter(col("dropped"))
      val viol = dropped
        .join(em.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .join(em.select(col("vec_id").as("witness_id"),
          col("embedding").as("__wv")), Seq("witness_id"))
        .withColumn("__c", Similarity.cosine(col("embedding"), col("__wv")))
        .agg(coalesce(sum(when(col("__c") < tau - 1e-9, 1L).otherwise(0L)),
          lit(0L)).as("witness_violations"))
      val exactDups = Dedup.embeddingNearDupExact(
          em.filter(col("vec_id") < 200), threshold = tau)
        .select(col("id_b").as("vec_id")).distinct()
      dd.agg(count(lit(1)).as("n"))
        .crossJoin(viol)
        .crossJoin(exactDups.agg(count(lit(1)).as("exact_dups_200")))
        .crossJoin(exactDups.join(dropped, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("__rec")))
        .select(col("n"), col("witness_violations"), col("exact_dups_200"),
          (col("__rec") * 2 >= col("exact_dups_200")).as("recovery_ok"))
    }),
    "cl1_kmeans" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val cents = Similarity.kmeansCentroids(em, nlist = 8, iters = 3)
      val best = em.crossJoin(broadcast(cents))
        .withColumn("c", Similarity.cosine(col("embedding"), col("centroid")))
        .groupBy("vec_id").agg(max(col("c")).as("best_c"))
      val assigned = Similarity.kmeansAssignWith(em, cents)
      assigned.join(best, Seq("vec_id"))
        .agg(sum(when(col("centroid_cosine") < col("best_c") - 1e-9, 1L)
          .otherwise(0L)).as("violations"),
          count(lit(1)).as("n"))
    }))

  // ---------------------------------------------------------------- store plane

  /** Store-ingest input: measures deduped to one value per (metric,
    * timestamp) via max event_id. The store's new-wins merge tie-breaks
    * duplicate timestamps WITHIN a batch by delivery order, which no
    * independent oracle can replay — so the store queries pre-collapse
    * duplicates deterministically and put the whole write/read machinery
    * (sack-partitioned buffer, back-window, split overwrite, pruned
    * multi-series scan) under the hash compare instead.
    */
  private def dedupMeasures(s: SparkSession, dir: String): DataFrame =
    events(s, dir).groupBy(col("event_type").as("metric_id"),
        col("ts").as("timestamp"))
      .agg(max_by(col("value"), col("event_id")).as("value"))

  /** Fresh store under /tmp, wiped at query start (path deterministic
    * per (tag, sf dir) so repeated runs are idempotent). */
  /** Pin a smaller shuffle-partition count for a stateful streaming
    * query's lifetime: every micro-batch commits one state-store delta
    * per shuffle partition, so 32 partitions are 32 tiny checkpoint
    * files per operator per batch — pure fixed overhead at this state
    * size. The count is recorded in the query's offset log at start,
    * so it only applies to queries started inside the block; batch
    * jobs keep the session's 32. (On a real cluster this is the same
    * deploy-time knob, sized to state volume instead.)
    */
  private def withStreamPartitions[A](s: SparkSession, n: Int)(f: => A): A = {
    val old = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", old)
  }

  /** One canonical scratch-root scheme — anything re-opening a store
    * (j5's shrunk policy) derives the SAME path from here. */
  private def storeRoot(tag: String, dir: String): String =
    s"/tmp/graft-q-store/$tag-${math.abs(dir.hashCode)}"

  private def freshStore(s: SparkSession, tag: String, dir: String,
                         policy: ArchivePolicy): MetricStore = {
    val root = storeRoot(tag, dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    new MetricStore(s, root, policy)
  }

  val storeQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1/I7/P2 under the oracle hash: one incremental-job batch into a
    // fresh store, read back through the partition-pruned multi-series
    // scan; the oracle recomputes the same hourly aggregates directly.
    "j1_store_roundtrip" -> ((s, dir) => {
      val store = freshStore(s, "j1", dir, ArchivePolicy("j1", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean", "max", "count")))
      store.addMeasures(dedupMeasures(s, dir))
      store.getMeasuresMany(allTypes, Seq("mean", "max", "count"), 3600L)
        .select(col("metric_id"), col("method"), bucketS(),
          r6(col("value")).as("v"))
    }),
    // J1 through the DISTRIBUTED-metadata fallback (the path a
    // fleet-cardinality batch takes): the threshold knob forces it,
    // and the store must byte-match the same oracle as j1 — the
    // driver-literal fast path and the join formulation are
    // interchangeable under the hash compare, at any sf.
    "j1b_store_fallback" -> ((s, dir) => {
      val store = freshStore(s, "j1b", dir, ArchivePolicy("j1b", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean", "max", "count")))
      s.conf.set("spark.graft.ingest.maxDriverMetrics", "0")
      try store.addMeasures(dedupMeasures(s, dir))
      finally s.conf.set("spark.graft.ingest.maxDriverMetrics", "100000")
      store.getMeasuresMany(allTypes, Seq("mean", "max", "count"), 3600L)
        .select(col("metric_id"), col("method"), bucketS(),
          r6(col("value")).as("v"))
    }),
    // J4 BATCH expunge under the oracle: one partition-pruned rewrite
    // removes two metrics; the survivors must equal a recompute that
    // never saw them.
    "j4b_expunge_many" -> ((s, dir) => {
      val store = freshStore(s, "j4b", dir, ArchivePolicy("j4b", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean", "count")))
      store.addMeasures(dedupMeasures(s, dir))
      store.expungeMetrics(Seq("click", "view"))
      store.getMeasuresMany(allTypes, Seq("mean", "count"), 3600L)
        .select(col("metric_id"), col("method"), bucketS(),
          r6(col("value")).as("v"))
    }),
    // P2 multi-series scan UNDER THE ORACLE: metric/method SUBSET with
    // from/to slicing — the bounds prune split partitions before the
    // fetch slice, and `from` floors to the granularity (a 00:00:30
    // query returns the 00:00 bucket); the oracle recomputes the same
    // hourly aggregates windowed to [floor(from), to].
    "p2_measures_many" -> ((s, dir) => {
      val store = freshStore(s, "p2", dir, ArchivePolicy("p2", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean", "max")))
      store.addMeasures(dedupMeasures(s, dir))
      store.getMeasuresMany(Seq("click", "error"), Seq("mean", "max"), 3600L,
        from = Some(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-10T00:00:30Z"))),
        to = Some(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-20T12:00:00Z"))))
        .select(col("metric_id"), col("method"), bucketS(),
          r6(col("value")).as("v"))
    }),
    // P6 output shaping under the oracle (processor.py:229-272 /
    // rest/api.py:510-517): the FULL facade path — bulk ingest, drain,
    // then the shaped triple read across every declared granularity,
    // coarse→fine with buckets ascending within each. The `ord` column
    // pins the shaping ORDER itself (the hash compare is row-order
    // blind, so the contract rides in the data).
    "p6_shaped" -> ((s, dir) => {
      val root = s"/tmp/graft-q-store/p6-${math.abs(dir.hashCode)}"
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val g = new graft.api.Graft(s, root)
      g.createPolicy(ArchivePolicy("p6", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None),
          ArchivePolicyItem(Granularity.seconds(86400), None, None)),
        Set("mean")))
      g.createMetric("click", "p6")
      g.batchAddMeasures(dedupMeasures(s, dir)
        .filter(col("metric_id") === "click"))
      val triples = g.getMeasures("click", "mean", refreshFirst = true)
      import s.implicits._
      triples.zipWithIndex.map { case ((ts, granS, v), i) =>
        (i + 1L, granS, ts.getTime / 1000L, v)
      }.toDF("ord", "gran_s", "bucket_s", "v")
        .select(col("ord"), col("gran_s"), col("bucket_s"), r6(col("v")).as("v"))
    }),
    // P6b per-reference output shaping under the oracle
    // (processor.py:246-272 m_output, 257-262 per-series drop): a
    // TWO-metric unaggregated `/v1/aggregates` read with fill=ffill
    // through the full facade. `purchase` is ingested only from
    // Jan 10 on, so its leading grid buckets stay NaN after ffill and
    // must drop PER SERIES — `click` keeps every bucket it owns. The
    // long (metric_id, method, bucket, value) frame is the REST door's
    // {metric: {agg: [...]}} fan-out, row-for-row.
    "p6b_shaped_refs" -> ((s, dir) => {
      val root = s"/tmp/graft-q-store/p6b-${math.abs(dir.hashCode)}"
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val g = new graft.api.Graft(s, root)
      g.createPolicy(ArchivePolicy("p6b", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean")))
      g.createMetric("click", "p6b")
      g.createMetric("purchase", "p6b")
      // shared dedup frame cached across the two staged batches (the
      // st1/m2 pattern) — see g6 for the measured rationale
      val meas = dedupMeasures(s, dir).cache()
      g.batchAddMeasures(meas.filter(col("metric_id") === "click"))
      g.batchAddMeasures(meas.filter(col("metric_id") === "purchase" &&
        col("timestamp") >=
          lit(java.time.Instant.parse("2024-01-10T00:00:00Z"))))
      g.process()
      meas.unpersist()
      g.aggregatesRefs("(metric (click mean) (purchase mean))", 3600L,
          fill = Some("ffill"))
        .select(col("metric_id"), col("method"), bucketS(),
          r6(col("value")).as("v"))
    }),
    // Search-scoped NON-aggregated aggregates under the oracle
    // (rest/aggregates/api.py:684-710 _get_measures_by_name →
    // processor.py:264-272 r_output): metric leaves are NAME wildcards
    // resolved per matched resource; the full facade path (ingest →
    // store scan → grid → per-resource fan-out) emits one series per
    // (resource, metric). srv1/load carries the click series and
    // srv2/load the purchase series; the search scope excludes srv3.
    "g6_resource_refs" -> ((s, dir) => {
      val root = s"/tmp/graft-q-store/g6-${math.abs(dir.hashCode)}"
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val g = new graft.api.Graft(s, root)
      g.createPolicy(ArchivePolicy("g6", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean")))
      for (m <- Seq("m_c", "m_p", "m_v")) g.createMetric(m, "g6")
      // cache the shared dedup frame across the three staged batches
      // (the st1/m2 pattern): the drain otherwise recomputes the
      // events dedup once PER batch when it materializes the union —
      // profiled at ~2 extra full dedup passes inside process()
      val meas = dedupMeasures(s, dir).cache()
      g.batchAddMeasures(meas.filter(col("metric_id") === "click")
        .withColumn("metric_id", lit("m_c")))
      g.batchAddMeasures(meas.filter(col("metric_id") === "purchase")
        .withColumn("metric_id", lit("m_p")))
      g.batchAddMeasures(meas.filter(col("metric_id") === "view")
        .withColumn("metric_id", lit("m_v")))
      g.process()
      meas.unpersist()
      import s.implicits._
      g.setResources(Seq(("srv1", "a"), ("srv2", "b"), ("srv3", "c"))
        .toDF("id", "zone"))
      g.setMetrics(Seq(("m_c", "srv1", "load"), ("m_p", "srv2", "load"),
        ("m_v", "srv3", "load")).toDF("metric_id", "resource_id", "name"))
      g.aggregatesByResource("(metric load mean)", 3600L,
          "zone in ['a', 'b']")
        .select(col("resource_id"), col("metric_name"), col("method"),
          bucketS(), r6(col("value")).as("v"))
    }),
    // B2-through-the-store under the oracle: a policy declaring
    // calendar granularities (M + W) alongside the hourly fixed one;
    // ingest, then read monthly and weekly series through the
    // calendar door (fixed-series resample on read, mean-of-means).
    "b4_calendar_store" -> ((s, dir) => {
      val store = freshStore(s, "b4", dir, ArchivePolicy("b4", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None),
          ArchivePolicyItem(Granularity.Calendar("M"), None, None),
          ArchivePolicyItem(Granularity.Calendar("W"), None, None)),
        Set("mean", "max")))
      store.addMeasures(dedupMeasures(s, dir))
      Seq("M", "W").map { u =>
        store.getMeasuresCalendar(allTypes, Seq("mean", "max"), u, 3600L)
          .withColumn("unit", lit(u))
      }.reduce(_ unionByName _)
        .select(col("metric_id"), col("method"), col("unit"), bucketS(),
          r6(col("value")).as("v"))
    }),
    // J7 backlog report under the oracle: stage one day of events
    // through the BULK ingestion door (the metricd sack write,
    // incoming/__init__.py:202-214) — the measures stay a DataFrame end
    // to end; status() reduces them to per-metric pending counts with
    // one aggregate, never a row collect.
    // Legacy /v1/aggregation cross-metric contract under the oracle
    // (rest/api.py:2014-2131 via Graft.legacyCrossAggregation):
    // five per-event-type metrics ingest through the facade with two of
    // them WINDOW-RESTRICTED (signup starts Jan 5, click ends Jan 20),
    // then the no-fill read trims to the span where every series has a
    // bucket (processor.py:200-220 — first/last fully-covered bucket;
    // needed_overlap=0 so partial coverage inside the span aggregates
    // nan-skipping instead of erroring) and means across the present
    // series per bucket. The oracle reproduces the dedup, the window
    // restrictions, the completeness span, and the nan-skipping mean
    // independently in SQL.
    "g7_legacy_overlap" -> ((s, dir) => {
      import s.implicits._
      val root = storeRoot("g7", dir)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val g = new graft.api.Graft(s, root)
      g.createPolicy(ArchivePolicy("g7", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean")))
      allTypes.foreach(t => g.createMetric(t, "g7"))
      g.batchAddMeasures(dedupMeasures(s, dir).filter(
        (col("metric_id") =!= "signup" ||
          col("timestamp") >= lit("2024-01-05").cast("timestamp")) &&
        (col("metric_id") =!= "click" ||
          col("timestamp") < lit("2024-01-20").cast("timestamp"))))
      g.process()
      g.setResources(allTypes.map(t => (s"r-$t", "z")).toDF("id", "zone"))
      g.setMetrics(allTypes.map(t => (t, s"r-$t", "load"))
        .toDF("metric_id", "resource_id", "name"))
      g.legacyResourceAggregation("load", "mean", Some(3600L),
          g.searchResources("zone = 'z'"), Nil, acrossAgg = "mean",
          neededOverlap = 0.0)
        .select(bucketS(), r6(col("value")).as("value"))
    }),
    // Durable catalog plane (CatalogStore; the reference's persistent
    // indexer, indexer/sqlalchemy.py): ingest through facade #1, TEAR
    // IT DOWN, reconstruct facade #2 on the same root with NO
    // re-registration, and serve the search-scoped legacy aggregation
    // through the reloaded policies / metric→policy map / resources /
    // metric attachments. The oracle recomputes the same cross-metric
    // mean with trim-to-overlap independently in SQL — identical to a
    // never-restarted read, which is the whole durability contract.
    "cat1_restart_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val root = storeRoot("cat1", dir)
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val g1 = new graft.api.Graft(s, root)
      g1.createPolicy(ArchivePolicy("cat1", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean")))
      allTypes.foreach(t => g1.createMetric(t, "cat1"))
      g1.setResources(allTypes.map(t => (s"r-$t", "z")).toDF("id", "zone"))
      g1.setMetrics(allTypes.map(t => (t, s"r-$t", "load"))
        .toDF("metric_id", "resource_id", "name"))
      g1.batchAddMeasures(dedupMeasures(s, dir))
      g1.process()
      g1.persistCatalog() // capture the bulk-registered frames
      g1.close() // real teardown: releases the catalog writer lock
      // ---- restart: everything below runs on the RELOADED catalog
      val g2 = new graft.api.Graft(s, root)
      g2.legacyResourceAggregation("load", "mean", Some(3600L),
          g2.searchResources("zone = 'z'"), Nil, acrossAgg = "mean",
          neededOverlap = 0.0)
        .select(bucketS(), r6(col("value")).as("value"))
    }),
    "j7_backlog" -> ((s, dir) => {
      import s.implicits._
      // fresh root: the now-durable catalog would otherwise replay the
      // previous run's metric registrations and collide on create
      val j7root = storeRoot("j7", dir)
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(j7root), true)
      val g = new graft.api.Graft(s, j7root)
      allTypes.foreach(t => g.createMetric(t, "low"))
      g.batchAddMeasures(events(s, dir)
        .filter(col("ts") < lit("2024-01-02").cast("timestamp"))
        .select(col("event_type").as("metric_id"),
          col("ts").as("timestamp"), col("value")))
      g.status().toSeq.toDF("metric_id", "n_pending")
    }),
    // I6 under the oracle: the same round-trip as j1, but measures
    // arrive through the Structured Streaming drain (file source +
    // foreachBatch incremental job) as two time-ordered micro-batch
    // file drops. Time-ordered chunks pass the back-window acceptance
    // (each chunk is newer than the last), so the final store state
    // must equal a one-shot batch ingest and the oracle recomputes it
    // directly from events.
    "st1_streaming_ingest" -> ((s, dir) => {
      // backWindow = 744 blocks (the whole month): batching patterns
      // must all equal one-shot ingest (rejection semantics are m2's
      // job; st1 exercises the drain)
      val store = freshStore(s, "st1", dir, ArchivePolicy("st1", 744,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean", "count")))
      val root = s"/tmp/graft-q-stream/st1-${math.abs(dir.hashCode)}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/staging"))
      val d = dedupMeasures(s, dir).cache()
      // ATOMIC chunk drops (the standard file-source ingestion
      // pattern): each chunk is written BESIDE the watched tree and
      // renamed in as ONE directory, so the continuously-polling drain
      // can never list a half-committed chunk. Before this, the source
      // raced the chunk writer's task commits and split a chunk into
      // 2+ micro-batches — each paying a full incremental-ingest job
      // (~40% of the row's cost, and the row's main variance source).
      // Final store state is identical either way (month-wide back
      // window, new-wins merge); the oracle pins it.
      val q = graft.streaming.StreamingIngest.start(
        s, s"$root/staging/*", s"$root/ckpt", store)
      try {
        val cuts = Seq(
          col("timestamp") < lit("2024-01-16").cast("timestamp"),
          col("timestamp") >= lit("2024-01-16").cast("timestamp"))
        cuts.zipWithIndex.foreach { case (c, i) =>
          d.filter(c).write.mode("overwrite").parquet(s"$root/chunk-$i")
          fs.rename(new org.apache.hadoop.fs.Path(s"$root/chunk-$i"),
            new org.apache.hadoop.fs.Path(s"$root/staging/chunk-$i"))
          q.processAllAvailable()
        }
      } finally q.stop()
      d.unpersist()
      store.getMeasuresMany(allTypes, Seq("mean", "count"), 3600L)
        .select(col("metric_id"), col("method"), bucketS(),
          r6(col("value")).as("v"))
    }),
    // Watermarked streaming window aggregation in APPEND mode: each
    // chunk is ONE part-file (coalesce(1)) so micro-batch boundaries
    // are deterministic (a multi-file chunk can split across batches in
    // any order — the st1 trap); a window emits exactly once, when the
    // watermark (max event time − 90 min) passes its end, so the final
    // table = the full hourly aggregate MINUS the still-open tail
    // windows — which is exactly what the oracle replays.
    "st2_streaming_window" -> ((s, dir) => {
      val root = s"/tmp/graft-q-stream/st2-${math.abs(dir.hashCode)}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/staging"))
      val qn = s"st2_${math.abs(dir.hashCode)}"
      if (s.catalog.tableExists(qn)) s.catalog.dropTempView(qn)
      val ev = events(s, dir)
        .select(col("ts"), col("event_type"), col("value")).cache()
      val src = s.readStream.schema(ev.schema).parquet(s"$root/staging")
      withStreamPartitions(s, 8) {
        val q = graft.streaming.StreamingIngest
          .windowedHourly(src, "90 minutes")
          .writeStream.format("memory").queryName(qn)
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append").start()
        try {
          val cut = lit("2024-01-16").cast("timestamp")
          Seq(col("ts") < cut, col("ts") >= cut).foreach { c =>
            ev.filter(c).coalesce(1).write.mode("append")
              .parquet(s"$root/staging")
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      ev.unpersist()
      s.table(qn).select(
        unix_timestamp(col("window.start")).cast("long").as("bucket_s"),
        col("event_type"), col("n"), r6(col("v")).as("v"))
    }),
    // Streaming incremental dedup: chunk 1 = even doc ids, chunk 2 =
    // odd (one part-file each — deterministic micro-batches), so the
    // kept set pins FIRST-BATCH-WINS: a duplicate content present in
    // both chunks must keep its even-chunk winner even when an odd doc
    // has the smaller hash order; within a batch the min doc id wins.
    "st3_streaming_dedup" -> ((s, dir) => {
      val root = s"/tmp/graft-q-stream/st3-${math.abs(dir.hashCode)}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/staging"))
      val docs = table(s, dir, "documents").select("doc_id", "text").cache()
      val q = graft.streaming.StreamingIngest.dedupDrain(
        s, s"$root/staging", s"$root/ckpt", s"$root/index", s"$root/kept")
      try {
        Seq(col("doc_id") % 2 === 0, col("doc_id") % 2 === 1).foreach { c =>
          docs.filter(c).coalesce(1).write.mode("append")
            .parquet(s"$root/staging")
          q.processAllAvailable()
        }
      } finally q.stop()
      docs.unpersist()
      s.read.parquet(s"$root/kept").select("doc_id", "content_md5")
    }),
    // Streaming SESSION windows (built-in session_window state with
    // cross-batch merging): chunks split chronologically, so sessions
    // straddling the cut must merge across micro-batches in the state
    // store; a session emits once the watermark passes its end
    // (last event + gap). Deterministic: one part-file per chunk, and
    // chunk 2's events are all newer than any batch-1-closed session,
    // so no closed session can be extended.
    "st4_streaming_sessions" -> ((s, dir) => {
      val root = s"/tmp/graft-q-stream/st4-${math.abs(dir.hashCode)}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/staging"))
      val qn = s"st4_${math.abs(dir.hashCode)}"
      if (s.catalog.tableExists(qn)) s.catalog.dropTempView(qn)
      val ev = events(s, dir).select("user_id", "ts").cache()
      val src = s.readStream.schema(ev.schema).parquet(s"$root/staging")
      withStreamPartitions(s, 8) {
        val q = src.withWatermark("ts", "90 minutes")
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .writeStream.format("memory").queryName(qn)
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append").start()
        try {
          val cut = lit("2024-01-16").cast("timestamp")
          Seq(col("ts") < cut, col("ts") >= cut).foreach { c =>
            ev.filter(c).coalesce(1).write.mode("append")
              .parquet(s"$root/staging")
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      ev.unpersist()
      s.table(qn).select(col("user_id"),
        unix_timestamp(col("sw.start")).cast("long").as("start_s"),
        unix_timestamp(col("sw.end")).cast("long").as("end_s"),
        col("n_events"))
    }),
    // M2 back-window acceptance + cross-batch new-wins merge: batch 2
    // replays the first days with poisoned values (+1000 — must be
    // REJECTED by the back window or hourly means shift visibly) and
    // re-delivers the final hours with +500 (must be ACCEPTED, and must
    // OVERRIDE batch 1's points at the same timestamps — new wins).
    "m2_backwindow" -> ((s, dir) => {
      val store = freshStore(s, "m2", dir, ArchivePolicy("m2", 3,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean", "count")))
      val d = dedupMeasures(s, dir).cache()
      store.addMeasures(d)
      val late = d
        .filter(col("timestamp") < lit("2024-01-05 00:00:00").cast("timestamp"))
        .withColumn("value", col("value") + 1000)
      val redo = d
        .filter(col("timestamp") >= lit("2024-01-30 18:00:00").cast("timestamp"))
        .withColumn("value", col("value") + 500)
      store.addMeasures(late.unionByName(redo))
      d.unpersist()
      store.getMeasuresMany(allTypes, Seq("mean", "count"), 3600L)
        .select(col("metric_id"), col("method"), bucketS(),
          r6(col("value")).as("v"))
    }),
    // J3 physical retention expiry: 300 s granularity with a 10-day
    // timespan; expiry drops whole split directories strictly older
    // than the oldest key to keep — the oracle replays the SplitKey
    // arithmetic (split = floor(bucket / (300·3600))).
    "j3_retention" -> ((s, dir) => {
      val store = freshStore(s, "j3", dir, ArchivePolicy("j3", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(300), Some(2880L), None)),
        Set("mean")))
      val d = dedupMeasures(s, dir)
      store.addMeasures(d)
      val nowS = d.agg(max(unix_timestamp(col("timestamp")))).head.getLong(0)
      store.expireRetention(nowS)
      store.aggregates
        .select(col("metric_id"), bucketS(), r6(col("value")).as("v"))
    }),
    // J2 split compaction is LOSSLESS: after compact() the aggregate
    // content must be byte-identical to what the incremental job wrote
    // — same oracle as the j1 mean arm.
    "j2_compaction" -> ((s, dir) => {
      val store = freshStore(s, "j2", dir, ArchivePolicy("j2", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean")))
      store.addMeasures(dedupMeasures(s, dir))
      store.compact()
      store.aggregates
        .select(col("metric_id"), bucketS(), r6(col("value")).as("v"))
    }),
    // J5 raw re-truncation after a back_window SHRINK (the reference's
    // needs_raw_data_truncation pass): ingest under back_window=3, then
    // re-open the same store with back_window=0 and truncateRaw — the
    // buffer must shrink to the final block per metric.
    "j5_raw_truncation" -> ((s, dir) => {
      val policyDef = Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None))
      val store = freshStore(s, "j5", dir,
        ArchivePolicy("j5", 3, policyDef, Set("mean")))
      store.addMeasures(dedupMeasures(s, dir))
      val shrunk = new MetricStore(s, storeRoot("j5", dir),
        ArchivePolicy("j5", 0, policyDef, Set("mean")))
      shrunk.truncateRaw()
      shrunk.rawBuffer
        .groupBy("metric_id")
        .agg(count(lit(1)).as("n"),
          min(unix_timestamp(col("timestamp"))).cast("long").as("min_ts_s"))
    }),
    // J6 end-dating + resurrection + auto-clean over a catalog derived
    // from the data: users are resources, last event = last activity.
    // TWO janitor passes, reference semantics (chef.py: ended_at =
    // the RUN time, strict < inactivity boundary): pass A at now-12h
    // ends users idle >8h then (stamp now-12h → later auto-cleaned);
    // pass B at now-4h ends the next cohort (stamp now-4h → inside
    // grace, kept) and must NOT re-stamp pass-A resources. Every 7th
    // user then receives a fresh measure (ingest resurrection clears
    // ended_at); auto-clean at corpus end drops resources ended more
    // than 6 h ago. Output: (id, ended_s, kept) — four classes, all
    // populated at sf0.01 (23 / 17 / resurrected / active).
    "j6_end_dating" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id").cast("string").as("id"),
        unix_timestamp(col("ts")).cast("long").as("ts_s"))
      val res = ev.groupBy("id")
        .agg(min(col("ts_s")).as("started_s"))
        .withColumn("started_at", to_timestamp(from_unixtime(col("started_s"))))
        .withColumn("ended_at", lit(null).cast("timestamp"))
        .select("id", "started_at", "ended_at")
      val act = ev.groupBy(col("id").as("resource_id"))
        .agg(max(col("ts_s")).as("last_ts_s"))
      val nowS = act.agg(max("last_ts_s")).head.getLong(0)
      val passA = graft.catalog.Maintenance.endDateInactive(
        res, act, nowS - 12L * 3600, inactiveS = 8L * 3600)
      val passB = graft.catalog.Maintenance.endDateInactive(
        passA, act, nowS - 4L * 3600, inactiveS = 8L * 3600)
      val fresh = act.filter(col("resource_id").cast("long") % 7 === 0)
        .withColumn("last_ts_s", lit(nowS))
      val resur = graft.catalog.Maintenance.resurrect(passB, fresh)
      val kept = graft.catalog.Maintenance.autoClean(resur, nowS,
          graceS = 6L * 3600)
        .select(col("id"), lit(1L).as("kept"))
      resur
        .select(col("id"),
          unix_timestamp(col("ended_at")).cast("long").as("ended_s"))
        .join(kept, Seq("id"), "left")
        .withColumn("kept", coalesce(col("kept"), lit(0L)))
    }),
    // J4 metric expunge: one metric's rows vanish from every split (and
    // splits left empty are deleted, not stranded by the dynamic
    // overwrite); the oracle is the j1 aggregate minus that metric.
    "j4_expunge" -> ((s, dir) => {
      val store = freshStore(s, "j4", dir, ArchivePolicy("j4", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean", "count")))
      store.addMeasures(dedupMeasures(s, dir))
      store.expungeMetric("click")
      store.aggregates
        .select(col("metric_id"), col("method"), bucketS(),
          r6(col("value")).as("v"))
    }))

  // ------------------------------------------------- training-data assembly

  val pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "smp1_stratified_sample" -> ((s, dir) =>
      Pipeline.stratifiedSample(table(s, dir, "documents"), "source", k = 5)
        .select(col("source"), col("doc_id"))),
    "smp2_hash_split" -> ((s, dir) =>
      Pipeline.hashSplit(table(s, dir, "documents"))
        .select(col("doc_id"), col("split"))),
    "pk1_pack_chunks" -> ((s, dir) =>
      Pipeline.packChunks(table(s, dir, "documents"),
          TextAnalysis.wordCount(col("text")), budget = 512,
          strataCol = "source")
        .select(col("doc_id"), col("token_offset"), col("first_win"),
          col("last_win"))),
    // benchmark set = every 50th doc; corpus docs sharing any word
    // 3-gram with it are flagged with their distinct-overlap count
    "dc1_decontaminate" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Pipeline.decontaminate(docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), n = 3)
    }),
    // sliding-window chunking: 64-token windows every 32 tokens — the
    // training-prep step between cleaning and packing; pure map
    "ck1_chunk_windows" -> ((s, dir) =>
      Pipeline.chunkDocs(table(s, dir, "documents"), size = 64,
        stride = 32)
        .select(col("doc_id"), col("chunk_idx"), col("tok_start"),
          col("n_tokens"), col("chunk_text"))),
    // embedding-space complement of dc1/dc2: per-corpus-vector max
    // cosine + hit count against the broadcast benchmark set (exact
    // arm; the IVF-pruned arm is the documented scale knob)
    "dc3_semantic_decontaminate" -> ((s, dir) => {
      val em = table(s, dir, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      Pipeline.semanticDecontaminate(em.filter(col("vec_id") % 50 =!= 0),
        em.filter(col("vec_id") % 50 === 0), threshold = 0.35)
        .select(col("vec_id"), r6(col("best_cosine")).as("best_cosine"),
          col("n_hits"))
    }),
    // fuzzy complement of dc1: minhash-LSH candidates between the same
    // corpus/benchmark split, verified by exact 3-gram jaccard — bench
    // bands + shingles broadcast, the corpus side never shuffles
    "dc2_fuzzy_decontaminate" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Pipeline.fuzzyDecontaminate(docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), n = 3, threshold = 0.4)
        .select(col("doc_id"), col("bench_id"),
          r6(col("jaccard")).as("jaccard"))
    }),
    // synthetic corpus carries no PII — inject a deterministic payload
    // on every 7th doc so detection, counting, and scrubbing all sit
    // under the hash compare (scrubbed text enters as its md5)
    "pii1_scrub" -> ((s, dir) => {
      val withPii = table(s, dir, "documents").withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com from 10.0."),
            (col("doc_id") % 256).cast("string"), lit("."),
            (col("doc_id") % 100).cast("string"), lit(" tel 555-123-4567")))
          .otherwise(col("text")))
      TextAnalysis.piiSignals(withPii)
        .select(col("doc_id"), col("n_emails"), col("n_ipv4"),
          col("n_phones"), md5(col("scrubbed")).as("scrub_md5"))
    }),
    "qf1_quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(table(s, dir, "documents"))
        .select(col("doc_id"), col("keep"), col("reasons"))),
    // model-based quality scoring: fasttext-style linear classifier
    // over md5-hashing-trick features. The weights ride the TRAINED-
    // MODEL door: a (bucket, weight) parquet artifact written beside
    // the run (carrying the documented pseudo-model — a real training
    // job would drop its own file here) is loaded and broadcast into
    // the scorer, so the swap point is exercised end to end while the
    // DuckDB oracle reproduces the same values arithmetically.
    "qf2_linear_score" -> ((s, dir) => {
      val wPath = s"${System.getProperty("java.io.tmpdir")}/graft-qf2-weights"
      val fs = new org.apache.hadoop.fs.Path(wPath)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$wPath/_SUCCESS")))
        TextAnalysis.writeBucketWeights(s, wPath,
          TextAnalysis.pseudoBucketWeights)
      val w = TextAnalysis.loadBucketWeights(s, wPath)
      TextAnalysis.linearQualityScore(table(s, dir, "documents"),
          weights = Some(w))
        .select(col("doc_id"),
          col("quality_prob").cast("float").as("quality_prob"))
    }),
    // paragraph-style dedup over delimiter-free text: 10-word segments,
    // first occurrence (min doc, min position) wins corpus-wide, docs
    // reassembled from survivors — reassembly sits under the md5 hash
    "seg1_segment_dedup" -> ((s, dir) =>
      Dedup.segmentDedup(table(s, dir, "documents"), segWords = 10)),
    // standing corpus = src0 docs; incoming batch = the rest; batch
    // docs whose normalized content already exists in the corpus drop
    "inc1_incremental_dedup" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.incrementalDedup(docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"))
        .select(col("doc_id"), col("source"))
    }),
    // mixture whitelist: keep ~100% of src0, ~50% of src1, ~25% of
    // src2; any other source drops entirely
    "mix1_mixture_sample" -> ((s, dir) =>
      Pipeline.mixtureSample(table(s, dir, "documents"),
          Seq("src0" -> "g", "src1" -> "80", "src2" -> "40"), "source")
        .select(col("doc_id"), col("source"))),
    "zipf1_term_stats" -> ((s, dir) =>
      TextAnalysis.termStats(table(s, dir, "documents"), topK = 50)),
    // corpus report over ROLLUP grouping sets: per (source, lang),
    // per source, and grand-total rows in one pass
    "rep1_corpus_report" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      TextAnalysis.qualityFilter(docs)
        .withColumn("__w", TextAnalysis.wordCount(col("text")))
        .rollup("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__w")).as("total_words"),
          sum(col("keep")).as("n_kept"))
        // sentinel instead of rollup NULLs: engine-portable sort+compare
        .select(coalesce(col("source"), lit("<all>")).as("source"),
          coalesce(col("lang"), lit("<all>")).as("lang"),
          col("n_docs"), col("total_words"), col("n_kept"))
    }),
    // Bloom-filter standing-index dedup: bloom must keep a SUBSET of
    // the exact-new set (false positives drop, never resurrect), with
    // the FP count bounded; the oracle pins the exact count and the
    // two invariants as literal TRUEs — a violated bound hash-fails
    "bloom1_incremental_bloom" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val corpus = docs.filter(col("source") === "src0")
      val batch = docs.filter(col("source") =!= "src0")
      val exactNew = Dedup.incrementalDedup(corpus, batch).select("doc_id")
      val bloomNew = Dedup.incrementalDedupBloom(corpus, batch).select("doc_id")
      val fp = exactNew.join(bloomNew, Seq("doc_id"), "left_anti")
      val ghost = bloomNew.join(exactNew, Seq("doc_id"), "left_anti")
      exactNew.agg(count(lit(1)).as("n_exact_new"))
        .crossJoin(fp.agg(count(lit(1)).as("__fp")))
        .crossJoin(ghost.agg(count(lit(1)).as("__ghost")))
        .crossJoin(batch.agg(count(lit(1)).as("__nb")))
        .select(col("n_exact_new"),
          (col("__fp") * 20 <= col("__nb")).as("fp_ok"),
          (col("__ghost") === 0).as("no_false_negatives"))
    }),
    // URL canonicalization + dedup: every 5th doc carries an injected
    // URL; scheme/case/query/trailing-slash variants of the same page
    // must collapse to one normalized key
    "url1_url_dedup" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val withUrl = docs.withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" see "),
          when(col("doc_id") % 10 === 0, lit("https://WWW.Example"))
            .otherwise(lit("http://example")),
          (col("doc_id") % 7).cast("string"), lit(".com/p/"),
          (col("doc_id") % 13).cast("string"),
          when(col("doc_id") % 10 === 0, lit("/?utm=x#top"))
            .otherwise(lit("/"))))
          .otherwise(col("text")))
      TextAnalysis.urlDedup(withUrl)
    }),
    // flagship composition: the full assembly pipeline in one plan —
    // quality gate → exact dedup (canonical survives) → benchmark
    // decontamination → deterministic split → per-split corpus stats.
    // Every stage is one of the oracle-gated operators above; the
    // composition itself sits under a single hash compare.
    "pipe1_assemble" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 50 =!= 0)
      val bench = docs.filter(col("doc_id") % 50 === 0)
      // Decide-then-attach (guide §8, r16): every stage decision flows
      // as id-sized rows and the document TEXT never crosses a join —
      // the old per-stage id joins each shuffled the text payload at
      // scale. Equivalences (oracle hash-verified):
      //  * the quality gate is a pure per-row map, so the old
      //    corpus⋈keepIds self-join IS the filter predicate itself;
      //  * Dedup.exact shuffles only (content_hash, id) — its input
      //    text stays map-side;
      //  * contamination is a pure function of CONTENT (decontaminate
      //    collapses exact copies first and expands the verdict back),
      //    so decontaminate(kept) ∩ canon ids ==
      //    decontaminate(kept ⋈ canon) ids — no text re-attach to the
      //    canonical set;
      //  * the final stats need doc_id + n_words only, and the quality
      //    pass already computed n_words from the same `signals` struct
      //    field wordCount reads — so nothing re-reads text at the end.
      val kept = TextAnalysis.qualityFilter(corpus)
        .filter(col("reasons") === 0)
        .select(col("doc_id"), col("text"), col("n_words"))
      val canon = Dedup.exact(kept).select(col("canonical_id").as("doc_id"))
      val contaminated = Pipeline.decontaminate(kept, bench, n = 3)
        .select("doc_id")
      // id-only joins from here down (shuffle_hash: both sides are
      // corpus-sized id frames — sort-free at any scale)
      val cleanIds = canon.join(contaminated.hint("shuffle_hash"),
        Seq("doc_id"), "left_anti")
      Pipeline.hashSplit(cleanIds)
        .join(kept.select("doc_id", "n_words").hint("shuffle_hash"),
          Seq("doc_id"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_words").as("total_words"))
    }))

  /** Semi-structured metadata: JSON attribute extraction from the
    * events props column (codegen'd get_json_object — no UDF), then a
    * grouped aggregate over the extracted value. */
  val miscQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_json_props" -> ((s, dir) =>
      table(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), r6(avg("k")).as("avg_k"),
          sum(when(col("k") >= 90, 1L).otherwise(0L)).as("n_high"))))

  val all: Map[String, (SparkSession, String) => DataFrame] =
    measureQueries ++ dslQueries ++ catalogQueries ++ llmQueries ++
      storeQueries ++ pipelineQueries ++ miscQueries
}
