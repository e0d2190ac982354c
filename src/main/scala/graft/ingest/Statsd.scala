package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statsd ingestion semantics (reference: gnocchi/statsd.py:32-130):
  * lines `bucket:value|type[|@rate]` where type is `c` (counter,
  * sampling-rate-scaled sum), `g` (gauge, last write wins), or
  * `ms`/`h`/timer (distribution: count/mean/lower/upper/sum).
  *
  * The format has no escaping, so parsing is pure Catalyst
  * (`regexp_extract` — codegen'd, no shuffle); the flush aggregation
  * is one hash aggregate per (bucket, kind).
  */
object Statsd {

  // value/rate groups admit ONLY well-formed doubles — a loose char
  // class ([-+0-9.eE]+) would match "1.2.3" and the downstream
  // cast("double") then aborts the batch under ANSI instead of
  // dropping the malformed line
  private val Pat = "^([^:|]+):([-+]?(?:[0-9]+\\.?[0-9]*|\\.[0-9]+)" +
    "(?:[eE][-+]?[0-9]+)?)\\|([a-zA-Z]+)" +
    "(?:\\|@((?:[0-9]+\\.?[0-9]*|\\.[0-9]+)(?:[eE][-+]?[0-9]+)?))?$"

  /** Parse a one-string-column DataFrame of statsd lines into
    * `(bucket, value, kind, rate, seq)`; `seqCol` (arrival order)
    * breaks gauge last-write ties deterministically. `extra` names
    * input columns carried through unchanged (the daemon threads its
    * per-line receipt timestamp this way).
    */
  def parse(lines: DataFrame, lineCol: String = "line",
            seqCol: String = "seq", extra: Seq[String] = Nil): DataFrame =
    lines
      .withColumn("bucket", regexp_extract(col(lineCol), Pat, 1))
      // regexp_extract yields "" for non-matches/absent groups; guard
      // before the cast (ANSI mode makes a bare cast of "" throw)
      .withColumn("__v", regexp_extract(col(lineCol), Pat, 2))
      .withColumn("value",
        when(col("__v") =!= "", col("__v").cast("double")))
      .withColumn("kind", regexp_extract(col(lineCol), Pat, 3))
      .withColumn("__r", regexp_extract(col(lineCol), Pat, 4))
      .withColumn("rate",
        coalesce(when(col("__r") =!= "", col("__r").cast("double")), lit(1.0)))
      .filter(col("bucket") =!= "" && col("value").isNotNull)
      .select((Seq(col("bucket"), col("value"), col("kind"), col("rate"),
        col(seqCol).cast("long").as("seq")) ++ extra.map(col)): _*)

  /** Flush: one row per (bucket, kind) with the statsd aggregate
    * semantics. Counters scale by 1/rate; gauges keep the last write
    * (max_by on seq); timers report the distribution.
    */
  def flush(parsed: DataFrame): DataFrame =
    parsed.groupBy("bucket", "kind").agg(
      // try_divide: a malformed `|@0` sampling rate must contribute
      // nothing (NULL, skipped by sum) — a bare `/` under ANSI throws,
      // turning one poison line into a permanently failing flush
      sum(when(col("kind") === "c",
        try_divide(col("value"), col("rate")))).as("counter"),
      max_by(col("value"), col("seq")).as("gauge"),
      count(lit(1)).as("n"),
      avg(col("value")).as("mean"),
      min(col("value")).as("lower"),
      max(col("value")).as("upper"),
      sum(col("value")).as("total"))
}
