package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Session settings every entry point needs: UTC, AQE, sane local
    * shuffle parallelism, and nanos-as-long so the ns-precision events
    * table is readable (Spark has no TIMESTAMP(NANOS) type).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.functions.GraftExtensions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    // InferFiltersFromGenerate copies the generator's input expression
    // into a `size(e) > 0` filter; when that input is computed (e.g. a
    // shingle pipeline), pushdown then drags the duplicated expression
    // below exchanges onto the scan side — serializing arbitrarily
    // heavy per-row work into the (often single-task) read stage.
    .config("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    // ObjectHashAggregate (collect_list/collect_set — the dedup
    // collapse groups, per-doc span position lists, history packing)
    // falls back to SORT-based aggregation once a task sees more than
    // this many distinct groups; the stock default of 128 turns every
    // corpus-sized list aggregate into a de-facto sort. Our list
    // buffers are small and bounded (member ids per distinct content,
    // gram positions per doc), so 1M in-memory groups per task is
    // ~100 MB worst-case against multi-GB executor task memory, and
    // the sort fallback still engages beyond it.
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 20).toString)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Resource-scoped aggregation (SURVEY §2.6 G1): revenue per month for
    * one market segment across the lineitem/orders/customer join.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.catalogQueries("g1_scoped_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. EVERY query carries an oracle: ops whose
    * kernels are not SQL-expressible (minhash/simhash signatures,
    * approximate ANN) are posed as self-verifying queries instead —
    * recall vs the in-engine exact baseline, symmetric difference vs a
    * brute-force arm — whose outcome the oracle pins. */
  def oracleSql: Map[String, String] = Oracles.all
}
