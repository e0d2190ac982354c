package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}
import graft.ingest.MetricStore

/** Structured Streaming ingestion: the streaming analogue of the
  * incoming→metricd pipeline (SURVEY §2.9 I6). A file-source stream of
  * raw measures drains through the same incremental job per micro-batch
  * (`foreachBatch`), so batch and streaming share one code path —
  * the back-window rule doubles as the watermark
  * (BoundTimeSerie, carbonara.py:321-476).
  */
object StreamingIngest {

  /** Start draining a staging directory of parquet measure files
    * (metric_id STRING, timestamp TIMESTAMP, value DOUBLE) into the
    * store. Checkpointed → exactly-once per micro-batch combined with
    * the store's idempotent split overwrites.
    */
  def start(spark: SparkSession, stagingDir: String, checkpointDir: String,
            store: MetricStore): StreamingQuery =
    start(spark, stagingDir, checkpointDir, store, 0, 1)

  /** Sack-sharded drain — the metricd FLEET posture
    * (cli/metricd.py:160-220: each worker owns a subset of sacks via
    * the partitioned hash ring). `workers` drains share one staging
    * directory; worker `workerId` ingests only measures whose metric
    * hashes into its sack residue class, each under its OWN checkpoint.
    * Disjoint sack sets mean the per-sack store locks never collide,
    * so the workers' incremental jobs commit fully in parallel against
    * one store. Membership is sack-deterministic (sackOf % workers), so
    * re-sharding to a different worker count needs fresh checkpoints —
    * exactly the reference's ring-rebalance restart.
    */
  def start(spark: SparkSession, stagingDir: String, checkpointDir: String,
            store: MetricStore, workerId: Int, workers: Int): StreamingQuery = {
    require(workers > 0 && workerId >= 0 && workerId < workers,
      s"need 0 <= workerId < workers, got $workerId/$workers")
    val schema = MetricStore.emptyMeasures(spark).schema
    spark.readStream
      .schema(schema)
      .parquet(stagingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val mine =
          if (workers == 1) batch
          else batch.filter(
            pmod(MetricStore.sackOf(col("metric_id")), lit(workers))
              === workerId)
        // no isEmpty probe (one extra Spark job per micro-batch):
        // addMeasures discovers emptiness from its own single metadata
        // action and exits before any store work
        store.addMeasures(mine)
      }
      .start()
  }

  /** Watermarked event-time window aggregation — the built-in
    * Structured Streaming aggregation surface (watermark + tumbling
    * window + partial-agg state), complementing the foreachBatch drain
    * above. In append output mode a window emits exactly once, when the
    * watermark (max observed event time − delay) passes its end; rows
    * arriving after their window closed are dropped. State is bounded:
    * open windows only, evicted on emit.
    */
  def windowedHourly(src: DataFrame, delay: String,
                     tsCol: String = "ts",
                     keyCol: String = "event_type",
                     valCol: String = "value"): DataFrame =
    src.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), "1 hour"), col(keyCol))
      // count(valCol), not count(*): null measures don't count, the
      // same rule windowedAgg's `count` column applies — the two
      // streaming agg doors must not disagree on null handling
      .agg(avg(col(valCol)).as("v"), count(col(valCol)).as("n"))

  /** Streaming incremental dedup drain: each micro-batch of documents
    * dedups within itself (min id per content hash), anti-joins the
    * standing hash index built by every PREVIOUS batch, and appends its
    * survivors — the streaming composition of the batch-side
    * `Dedup.incrementalDedup`. First batch to carry a content wins;
    * later re-deliveries are dropped.
    *
    * Exactly-once: outputs land in `batch=<id>` subdirectories written
    * with per-batch OVERWRITE, so a replayed micro-batch (checkpoint
    * recovery) rewrites its own partition instead of appending
    * duplicates. The index is the union of the batch subdirs — at
    * cluster scale the same layout holds (or a transactional table
    * format replaces it); only 128-bit hashes are ever stored, never
    * document bodies.
    */
  def dedupDrain(spark: SparkSession, stagingDir: String,
                 checkpointDir: String, indexDir: String,
                 keptDir: String): StreamingQuery = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    spark.readStream
      .schema(schema)
      .parquet(stagingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        dedupBatch(batch, id, indexDir, keptDir, Some(checkpointDir))
      }
      .start()
  }

  /** One micro-batch of the dedup drain — extracted so replay semantics
    * are directly testable. Idempotent in `id`: running the same
    * (batch, id) twice yields identical survivors, because the standing
    * index is built from PRIOR batches only. On checkpoint replay the
    * failed attempt's own `batch=<id>` subdir may already exist, and
    * including it would anti-join away every survivor and then overwrite
    * the kept/index partitions with empty output — silent data loss.
    */
  private[graft] def dedupBatch(batch: DataFrame, id: Long,
                                indexDir: String, keptDir: String,
                                ownerTag: Option[String] = None): Unit = {
    val s = batch.sparkSession
    // resolve against the INDEX path's filesystem, not the default FS —
    // an s3a:// index under an hdfs:// default would throw "Wrong FS"
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // the SAME content identity as the batch dedup plane
    // (Dedup.contentKey: null-safe, normalized-md5) — a local key
    // formula here could silently diverge from Dedup.exact
    val winners = batch
      .withColumn("content_md5", graft.llm.Dedup.contentKey(col("text")))
      .groupBy("content_md5").agg(min(col("doc_id")).as("doc_id"))
    val indexPath = new org.apache.hadoop.fs.Path(indexDir)
    // ownership marker: a RESET checkpoint restarts batch ids at 0, and
    // an old run that produced ONLY batch=0 would slip past the max-id
    // guard below (its single dir is this batch's own name, excluded
    // from priorBatches). The marker pins the index to one checkpoint
    // location; a mismatch refuses before any write touches the old
    // run's survivors. (A checkpoint DELETED and recreated at the very
    // same path is indistinguishable — that is explicit user
    // destruction of the stream's state.)
    for (tag <- ownerTag) {
      val marker = new org.apache.hadoop.fs.Path(indexPath, "_checkpoint")
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val held = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        require(held == tag,
          s"dedup index $indexDir belongs to the stream checkpointed at " +
            s"'$held' but this stream checkpoints at '$tag' — use a " +
            "fresh indexDir/keptDir instead of interleaving two streams")
      } else {
        fs.mkdirs(indexPath)
        val out = fs.create(marker, true)
        try out.write(tag.getBytes(
          java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
      }
    }
    val priorBatches =
      if (fs.exists(indexPath))
        fs.listStatus(indexPath).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("batch=") &&
            st.getPath.getName != s"batch=$id")
          .map(_.getPath.toString)
      else Seq.empty[String]
    // a RESET checkpoint against a populated index restarts batch ids
    // at 0: the old run's batch=<n> dirs would read as "prior" history
    // while overwrite clobbers its batch=<id> — refuse loudly instead
    // of silently losing the old run's survivors. Legitimate replay
    // never sees an existing id above its own.
    val maxExisting = priorBatches
      .map { p =>
        // parse the NAME's tag, not lastIndexOf('=') on the full path —
        // a stray 'batch=backup=3' copy must refuse, not read as 3
        val tag = new org.apache.hadoop.fs.Path(p).getName
          .stripPrefix("batch=")
        tag.toLongOption.getOrElse(throw new IllegalStateException(
          s"dedup index $indexDir contains a non-numeric batch " +
            s"directory '$p' — remove or rename the stray entry (only " +
            "batch=<n> dirs written by this drain belong here)"))
      }
      .maxOption.getOrElse(-1L)
    require(maxExisting <= id,
      s"dedup index $indexDir already holds batch=$maxExisting but this " +
        s"stream is at batch=$id — the checkpoint was reset against a " +
        "populated index. Use a fresh indexDir/keptDir (or restore the " +
        "original checkpoint) instead of interleaving two streams.")
    val index =
      if (priorBatches.nonEmpty)
        s.read.parquet(priorBatches: _*).select("content_md5")
      else winners.limit(0).select("content_md5")
    val survivors = winners
      .join(index, Seq("content_md5"), "left_anti")
      .localCheckpoint(true) // cut lineage off files the writes touch
    survivors.select("doc_id", "content_md5")
      .write.mode("overwrite").parquet(s"$keptDir/batch=$id")
    survivors.select("content_md5")
      .write.mode("overwrite").parquet(s"$indexDir/batch=$id")
  }

  final case class Point(metric_id: String, ts_ms: Long, value: Double)
  final case class BoundState(points: Seq[(Long, Double)])

  /** M2 as CUSTOM STREAMING STATE (BoundTimeSerie.set_values,
    * carbonara.py:321-476, via flatMapGroupsWithState): per metric the
    * state is the open buffer of the last `backWindow`+1 blocks.
    * Each micro-batch:
    *   1. incoming points older than `floor(last, block) −
    *      block×backWindow` are REJECTED (the reference raises/drops);
    *   2. survivors merge into the buffer, newest batch winning on a
    *      duplicate timestamp (M1 semantics);
    *   3. points that fall out of the advancing window are EMITTED
    *      downstream — they are immutable now, the streaming analogue
    *      of "run the aggregation callback, then truncate the buffer".
    * State is bounded by construction (≤ backWindow+1 blocks/metric),
    * so a million-metric stream holds a million small buffers sharded
    * across executors by the groupByKey hash — no global state.
    */
  def boundedSeries(measures: Dataset[Point], blockS: Long,
                    backWindow: Int): Dataset[Point] = {
    val spark = measures.sparkSession
    import spark.implicits._
    measures.groupByKey(_.metric_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (metric: String, it: Iterator[Point], state: GroupState[BoundState]) => {
          val prev = state.getOption.map(_.points).getOrElse(Seq.empty)
          val incoming = it.map(p => (p.ts_ms, p.value)).toSeq
          if (incoming.isEmpty) Iterator.empty
          else {
            // floorDiv: truncating division rounds pre-epoch (negative)
            // timestamps toward zero, sliding the window a block too new
            def firstBlock(lastMs: Long): Long =
              (Math.floorDiv(Math.floorDiv(lastMs, 1000L), blockS) * blockS -
                blockS * backWindow) * 1000
            // reject-too-old measures the OLD buffer's last timestamp
            // (carbonara.py:354-373: set_values slices incoming at
            // first_block_timestamp() of the PRE-merge series, and only
            // when the buffer is non-empty) — cutting against the
            // batch's own max would silently drop in-window history
            // that arrives in the same micro-batch as newer points
            // (a backfill burst, the first batch ever)
            val accepted = prev.map(_._1).maxOption match {
              case Some(prevLast) => incoming.filter(_._1 >= firstBlock(prevLast))
              case None => incoming
            }
            // merge, new wins on duplicate ts. Within ONE micro-batch
            // the reference keeps the first DELIVERED duplicate
            // (carbonara.py:92-105), but the iterator order after the
            // groupByKey shuffle is not a delivery order — it is
            // undefined — so "first in iterator" would make replays
            // nondeterministic. Tie-break deterministically instead:
            // the smallest value wins for equal timestamps (any total
            // order would do; this one is replay-stable).
            val merged = scala.collection.mutable.LinkedHashMap[Long, Double]()
            for ((t, v) <- accepted.sortBy(p => (p._1, p._2))
                 if !merged.contains(t)) merged(t) = v
            for ((t, v) <- prev if !merged.contains(t)) merged(t) = v
            // truncation measures the POST-merge last timestamp
            // (carbonara.py:369-373 _truncate after set_values)
            val firstBlockMs = firstBlock(merged.keys.max)
            val (open, closed) = merged.toSeq.partition(_._1 >= firstBlockMs)
            state.update(BoundState(open.sortBy(_._1)))
            closed.sortBy(_._1).iterator
              .map { case (t, v) => Point(metric, t, v) }
          }
        })
  }

  /** Pure-streaming windowed aggregation (no store): watermarked
    * tumbling-window mean/count per metric — the Spark-native shape of
    * a gnocchi archive-policy item for pipelines that want push-based
    * results instead of a materialized table.
    */
  def windowedAgg(measures: DataFrame, granularity: String,
                  watermark: String): DataFrame =
    measures
      .withWatermark("timestamp", watermark)
      .groupBy(col("metric_id"), window(col("timestamp"), granularity))
      .agg(avg("value").as("mean"), count("value").as("count"),
        min("value").as("min"), max("value").as("max"), sum("value").as("sum"))
      .select(col("metric_id"), col("window.start").as("bucket"),
        col("mean"), col("count"), col("min"), col("max"), col("sum"))
}
