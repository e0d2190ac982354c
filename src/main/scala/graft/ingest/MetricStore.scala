package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{ArchivePolicy, Granularity}
import graft.timeseries.{Kernels, TimeSeriesOps}

/** Materialized aggregate store + incremental aggregation job.
  *
  * Replaces the reference's incoming/chef/metricd pipeline
  * (storage/__init__.py:583-742): sacks, distributed locks and the hash
  * ring disappear — shuffle partitioning by metric_id gives the
  * parallelism, and idempotent dynamic-partition overwrites give the
  * exactly-once the locks were for.
  *
  * Layout (mirrors the reference's keying, SURVEY §1.4):
  *   raw/                           raw-measure buffer, back-window bounded
  *   agg/method=<m>/gran_s=<g>/split=<k>/   aggregate rows
  * where split = floor(bucket_epoch / (gran_s * 3600)) — the SplitKey
  * rule of ≤3600 points per partition per granularity
  * (carbonara.py:494). Reads prune on (method, gran_s, split) so a
  * time-range fetch touches only its splits at any corpus size.
  */
class MetricStore(spark: SparkSession, root: String, policy: ArchivePolicy) {
  import MetricStore._

  private val rawPath = s"$root/raw"
  private val aggPath = s"$root/agg"

  private val fixedGranNs: Seq[Long] = policy.definition.collect {
    case item if item.granularity.isInstanceOf[Granularity.Fixed] =>
      item.granularity.asInstanceOf[Granularity.Fixed].ns
  }
  // Fail at construction, not with a divide-by-zero deep in addMeasures:
  // the store keys blocks/splits in whole seconds.
  require(fixedGranNs.nonEmpty,
    s"policy ${policy.name}: MetricStore requires at least one fixed " +
      "granularity (calendar-only policies are not storable)")
  require(fixedGranNs.forall(_ % 1_000_000_000L == 0),
    s"policy ${policy.name}: sub-second granularities are not supported " +
      "by MetricStore (second-aligned fixed granularities only)")

  // ---- filesystem contract gate (the reference splits drivers on the
  // same line: storage/ceph.py:53 WRITE_FULL vs storage/file.py:57
  // rename-into-place). The writer locks and swapWrite lean on ATOMIC
  // create / rename; HDFS-class filesystems provide both, object
  // stores do not — there the locks narrow but cannot CLOSE the
  // concurrent-writer window, so the deployment must pin a single
  // writer per store and say so explicitly, or the store refuses to
  // open (loud beats silently-corruptible).
  locally {
    // via the URI, not getScheme(): the latter is optional on the
    // FileSystem API and raw/wrapped handles may not implement it
    val scheme = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getUri.getScheme
    val atomicSchemes =
      Set("file", "hdfs", "viewfs", "o3fs", "ofs", "abfs", "abfss")
    if (!atomicSchemes.contains(scheme) &&
        !spark.conf.getOption("spark.graft.store.acceptNonAtomicFs")
          .contains("true"))
      throw new IllegalStateException(
        s"store root $root: filesystem scheme '$scheme' is not known to " +
          "provide the atomic create/rename the store's writer locks " +
          "and partition swaps rely on. Move the store to an HDFS-class " +
          "filesystem, or pin a SINGLE writer per store at the " +
          "deployment level and set " +
          "spark.graft.store.acceptNonAtomicFs=true to accept that " +
          "contract.")
  }

  private def fixedGrans: Seq[Long] = fixedGranNs.map(_ / 1_000_000_000L)

  private def timespanS(granS: Long): Option[Long] =
    policy.definition.collectFirst {
      case item if item.granularity == Granularity.seconds(granS) =>
        item.completed.timespanNs.map(_ / 1_000_000_000L)
    }.flatten

  /** Read a store plane, or its empty frame when the plane does not
    * exist yet. The fallback triggers ONLY on genuine absence (path
    * missing, or present but holding no data files — e.g. after a
    * whole-plane expunge left the bare root): a TRANSIENT read failure
    * (object-store throttle, corrupt footer) must PROPAGATE, because a
    * swallowed one here would make addMeasures treat the store as
    * empty and the warm-path swapWrite would then permanently replace
    * the touched partitions with batch-only rows.
    */
  private def readOr(path: String, schemaOf: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasDataFilesOnce(dir: org.apache.hadoop.fs.Path): Boolean = {
      val rootPrefix = fs.makeQualified(dir).toString
      val it = fs.listFiles(dir, true)
      var found = false
      while (!found && it.hasNext) {
        val fp = it.next().getPath
        // mirror Spark's listing: skip _metadata files and anything
        // under a dot-prefixed dir (swapWrite staging). Hidden-dir
        // detection must be RELATIVE to the plane root — a store that
        // itself lives under a dot-directory (e.g. ~/.data/store) is
        // not hidden from Spark, and treating it as empty here would
        // trigger readOr's fallback and let swapWrite replace real
        // partitions with batch-only rows.
        val rel = fs.makeQualified(fp).toString
          .stripPrefix(rootPrefix).stripPrefix("/")
        // Spark's shouldFilterOut skips '_'-prefixed SEGMENTS too
        // (_temporary from a crashed committer): counting those as
        // data would make spark.read see zero files and throw instead
        // of taking the empty-store fallback — a permanent wedge
        found = !rel.split('/').exists(s =>
          s.startsWith(".") || s.startsWith("_"))
      }
      found
    }
    // A CONCURRENT writer on other sacks may be mid-swap (delete(dest)
    // → rename) while this walk or Spark's own file listing descends
    // the tree: a directory can vanish between its parent listing and
    // its own. Those partitions are never OURS — our sacks are either
    // locked (mutators) or immutable for the read's duration isn't
    // guaranteed anyway (reads are lock-free snapshots) — so a
    // vanished-entry race is retried here and tolerated in the scan
    // via the per-relation ignoreMissingFiles option (scoped to this
    // read, NOT the session: a globally-missing file elsewhere must
    // still fail loudly).
    def hasDataFiles(dir: org.apache.hadoop.fs.Path): Boolean = {
      var attempt = 0
      while (true) {
        try return hasDataFilesOnce(dir)
        catch {
          case e: java.io.FileNotFoundException =>
            attempt += 1
            if (attempt > 3) throw e
        }
      }
      false // unreachable
    }
    // Explicit schema: skips plan-time footer inference, which would
    // otherwise open a file that a concurrent writer may be renaming.
    if (fs.exists(p) && hasDataFiles(p))
      spark.read.schema(schemaOf.schema)
        .option("ignoreMissingFiles", "true").parquet(path)
    else schemaOf.limit(0)
  }

  def rawBuffer: DataFrame =
    readOr(rawPath, emptyMeasures(spark).withColumn("sack", lit(0)))

  def aggregates: DataFrame = readOr(aggPath, emptyAggregates(spark))

  private def pathExists(p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Cross-writer mutual exclusion for store mutation, PER SACK
    * (SURVEY §2.10 — the reference serializes writers per sack with
    * tooz locks, chef.py:426-431, and shards sacks across a metricd
    * fleet, cli/metricd.py:160-220). One lock file per sack under the
    * store root (`.lock.sack.N`), taken for a whole mutation batch:
    * two ingest jobs touching DISJOINT sack sets commit fully in
    * parallel — the fleet scale-out posture — while same-sack writers
    * serialize. A batch acquires the locks of every sack it touches in
    * ASCENDING sack order (ordered acquisition: no deadlock against
    * any other writer, including store-wide maintenance, which takes
    * all sacks). Acquisition is an ATOMIC create — HDFS-like
    * filesystems get create(overwrite=false) (atomic there); file://
    * roots get O_EXCL via nio CREATE_NEW, because Hadoop's
    * RawLocalFileSystem implements non-overwrite create as a racy
    * exists-then-create; object stores without atomic create keep the
    * documented single-writer deployment contract. A HELD lock is
    * waited on up to `spark.graft.ingest.lockWaitMs` (default 60 s —
    * a colliding batch queues behind the holder, the reference's
    * blocking tooz-lock posture), then the writer fails LOUDLY, so it
    * can never reach the stale-staging sweep and delete the holder's
    * in-flight staging (the lost-batch mode the r6 review called out).
    * A lock older than `spark.graft.ingest.lockStaleMs` (default 1 h,
    * far beyond any batch) is presumed crashed and broken — the
    * (age-gated) staging sweep then sorts out whatever the dead writer
    * left.
    */
  private def lockStaleMs: Long = spark.conf
    .getOption("spark.graft.ingest.lockStaleMs").map(_.toLong)
    .getOrElse(3600_000L)

  /** Store-wide mutation door: maintenance ops (compaction, retention,
    * raw truncation, import) rewrite partitions of every sack, so they
    * take ALL sack locks — still in ascending order, so they queue
    * cleanly behind/ahead of any per-sack ingest batch.
    */
  private def withStoreLock[A](f: => A): A =
    withSackLocks(0 until NumSacks)(f)

  private def withSackLocks[A](sacks: Seq[Int])(f: => A): A = {
    // path-scoped FS: a store on s3a:// under an hdfs:// default FS
    // must not resolve to the default filesystem
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(rootP)
    val staleMs = lockStaleMs
    val waitMs = spark.conf
      .getOption("spark.graft.ingest.lockWaitMs").map(_.toLong)
      .getOrElse(60_000L)
    // ownership token (shared by every sack lock of this batch):
    // release only deletes a lock that still holds OUR token — after a
    // stale-break the (presumed-crashed but actually slow) old holder
    // must not free the NEW holder's lock and re-open the
    // concurrent-sweep window
    val token = java.util.UUID.randomUUID().toString
    def lockOf(sack: Int) =
      new org.apache.hadoop.fs.Path(s"$root/.lock.sack.$sack")
    def tryAcquire(lock: org.apache.hadoop.fs.Path): Boolean =
      if (fs.getScheme == "file")
        // RawLocalFileSystem implements create(overwrite=false) as a
        // non-atomic exists-then-create, so two local writers could
        // both acquire; O_EXCL via CREATE_NEW is the real atomic op
        try {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(lock.toUri.getPath),
            token.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch { case _: java.io.IOException => false }
      else {
        var created = false
        try {
          val out = fs.create(lock, false)
          created = true
          out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close(); true
        }
        catch { case _: java.io.IOException =>
          // created-but-token-write-failed would self-orphan the lock:
          // WE hold a file no token identifies, every retry (ours
          // included) reads "locked by another writer" until the
          // stale break — clean it up best-effort before reporting
          // acquisition failure
          if (created)
            try fs.delete(lock, false) catch { case _: java.io.IOException => () }
          false
        }
      }
    def acquire(sack: Int): Unit = {
      val lock = lockOf(sack)
      if (tryAcquire(lock)) return
      val deadline = System.currentTimeMillis() + waitMs
      while (true) {
        val age = try System.currentTimeMillis() -
            fs.getFileStatus(lock).getModificationTime
          catch { case _: java.io.FileNotFoundException => Long.MaxValue }
        // crashed-stale (or vanished mid-probe): break once and retry;
        // a LIVE holder keeps the lock and this writer waits out the
        // deadline, then fails loudly. The break is an atomic RENAME
        // to a unique name — a bare delete would let two breakers both
        // clear the stale lock and both acquire
        if (age > staleMs) {
          val broken = new org.apache.hadoop.fs.Path(
            s"$root/.lock.sack.$sack.broken.$token")
          if (try fs.rename(lock, broken) catch
                { case _: java.io.IOException => false })
            fs.delete(broken, false)
        }
        if (tryAcquire(lock)) return
        if (System.currentTimeMillis() >= deadline)
          throw new IllegalStateException(
            s"store $root sack $sack is locked by another writer ($lock, " +
              s"age ${age / 1000}s); retry this batch after it finishes " +
              "or remove the lock if the holder crashed")
        Thread.sleep(50)
      }
    }
    val sorted = sacks.distinct.sorted
    val held = scala.collection.mutable.ListBuffer.empty[Int]
    var acquiredAt = 0L
    def releaseAll(): Unit = {
      // an over-stale hold must NOT delete at all: the token read and
      // the delete are not atomic, so a successor that just broke our
      // stale lock and acquired could lose ITS lock to our delete —
      // reopening the concurrent-writer window the lock exists to
      // close. Under staleMs no breaker may act, so check-then-delete
      // is race-free there.
      if (held.nonEmpty &&
          System.currentTimeMillis() - acquiredAt > staleMs) {
        // counted so operators SEE a misconfigured lockStaleMs (every
        // over-stale batch leaks its lock files) — surfaced through
        // /v1/status metricd.statistics
        held.foreach(_ => MetricStore.lockLeaks.incrementAndGet())
        System.err.println(
          s"[graft] WARN: this batch held sack locks ${held.mkString(",")} " +
            s"of $root longer than lockStaleMs=${staleMs}ms — leaving " +
            "them for the next writer's stale break instead of racing a " +
            "possible successor. Raise spark.graft.ingest.lockStaleMs " +
            "above the longest batch.")
        return
      }
      for (s <- held.reverseIterator) {
        val lock = lockOf(s)
        val mine =
          try {
            val in = fs.open(lock)
            val heldTok = try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8) finally in.close()
            heldTok == token
          } catch { case _: java.io.IOException => false }
        if (mine) fs.delete(lock, false)
        else System.err.println(
          s"[graft] WARN: sack lock $lock no longer ours — a writer " +
            "broke it as stale while this batch ran; its output may " +
            "interleave with ours. Raise spark.graft.ingest.lockStaleMs " +
            "above the longest batch.")
      }
    }
    try {
      sorted.foreach { s =>
        acquire(s)
        if (held.isEmpty) acquiredAt = System.currentTimeMillis()
        held += s
      }
      f
    } finally releaseAll()
  }

  /** Replace the touched partitions of a partitioned parquet tree with
    * `df`'s rows in ONE materialization: write to a dot-prefixed
    * staging subtree (invisible to Spark's file listing), then swap
    * each staged leaf partition directory into place with filesystem
    * renames. Semantics match dynamic-partition-overwrite — only
    * partitions that receive output are replaced — but without the
    * eager localCheckpoint the self-read hazard otherwise forces: the
    * write job consumes the old files BEFORE any rename touches them,
    * so nothing is read mid-replacement, the output is materialized
    * once instead of twice (profiled at ~40% of warm ingest), and no
    * executor memory pins the intermediate (a localCheckpoint dies
    * with its executors on a real cluster). Renames are metadata ops
    * on HDFS-like filesystems; object stores degrade to copies, the
    * same cost the Hadoop output committer already pays there.
    *
    * SINGLE WRITER per SACK, by MECHANISM: every public mutator runs
    * under [[withSackLocks]] for the sacks it touches, so two live
    * writers can only ever rename DISJOINT leaf partitions of this
    * tree. The stale-staging sweep below is therefore AGE-GATED on
    * lockStaleMs: a fresh `.staging-*` dir may belong to a live
    * concurrent writer on other sacks (dot-prefixed, so invisible to
    * readers either way) and must survive; one older than the
    * staleness threshold can only be a crashed writer's — no live
    * batch outlives lockStaleMs by the lock contract. The reference
    * serializes writers with tooz sack locks (chef.py:426-431); the
    * per-sack lock files are the same discipline without the lock
    * service.
    */
  private def swapWrite(df: DataFrame, path: String,
                        partCols: Seq[String], sortCols: Seq[String]): Unit = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafDirs(root: org.apache.hadoop.fs.Path) =
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        root, Seq.fill(partCols.size)("*").mkString("/"))))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(_.isDirectory)
    def destOf(root: org.apache.hadoop.fs.Path,
               st: org.apache.hadoop.fs.FileStatus) = {
      val rel = fs.makeQualified(st.getPath).toString
        .stripPrefix(fs.makeQualified(root).toString).stripPrefix("/")
      new org.apache.hadoop.fs.Path(base, rel)
    }
    // Stale staging from a crashed writer — invisible to readers, but
    // NOT always safe to delete. Three cases, told apart by the
    // _SUCCESS marker and the destination state:
    //   no _SUCCESS        → the write itself crashed; originals were
    //                        never touched → delete the partial bytes;
    //   _SUCCESS + every leaf's dest exists → the rename phase never
    //                        started (or nothing was staged): originals
    //                        intact, the crashed batch just retries →
    //                        delete;
    //   _SUCCESS + some dest MISSING → the writer died between
    //                        delete(dest) and rename: the staging tree
    //                        holds the ONLY copy of that partition —
    //                        refuse to proceed, loudly, instead of
    //                        destroying it.
    val sweepStaleMs = lockStaleMs
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(base, ".staging-*")))
      .foreach(_.iterator
        // fresh staging = possibly a LIVE writer on disjoint sacks —
        // leave it; only age-stale staging is a crashed writer's
        .filter(s => System.currentTimeMillis() - s.getModificationTime >
          sweepStaleMs)
        .foreach { s =>
        val committed = fs.exists(
          new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS"))
        val orphaned = committed &&
          leafDirs(s.getPath).exists(l => !fs.exists(destOf(s.getPath, l)))
        if (orphaned) throw new IllegalStateException(
          s"swapWrite: ${s.getPath} holds the only copy of partitions " +
            "whose originals were already removed by a crashed writer; " +
            "recover by renaming its leaf dirs into place before retrying")
        fs.delete(s.getPath, true)
      })
    val staging = new org.apache.hadoop.fs.Path(base,
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    stage(s"  swap:write ${base.getName}")(
      df.repartition(partCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.partitionBy(partCols: _*).parquet(staging.toString))
    stage(s"  swap:rename ${base.getName}")(
    for (st <- leafDirs(staging)) {
      val dest = destOf(staging, st)
      fs.delete(dest, true)
      fs.mkdirs(dest.getParent)
      // a silently-failed rename followed by the staging cleanup below
      // would drop this partition's data — fail loudly instead; the
      // staged bytes survive for a re-run
      require(fs.rename(st.getPath, dest),
        s"swapWrite: rename ${st.getPath} -> $dest failed; staged output " +
          "left in place")
    })
    fs.delete(staging, true)
  }

  // opt-in stage timing on stderr (GRAFT_INGEST_TIMING=1): the ingest
  // job is the store's hot loop, and its cost model (O(batch) vs
  // O(split rewrite)) is worth being able to SEE, not infer
  private val stageTiming = sys.env.contains("GRAFT_INGEST_TIMING")
  private def stage[A](label: String)(f: => A): A =
    if (!stageTiming) f
    else {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[ingest] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

  /** The incremental job: merge a batch of new measures into the raw
    * buffer (back-window acceptance, new-wins dedup), recompute ONLY the
    * affected (metric, granularity, bucket≥first-new) groups
    * (storage/__init__.py:643-668), and overwrite only the touched split
    * partitions.
    */
  def addMeasures(batch: DataFrame): Unit = {
    // Batch-ONLY metadata — which metrics, their min/max timestamps,
    // and from them WHICH SACKS the batch touches — is computed before
    // any lock: it reads nothing from the store, and the sack set is
    // exactly the lock set, so disjoint-sack batches ingest fully in
    // parallel (the reference's per-sack tooz-lock regime,
    // chef.py:426-431). Everything that reads or writes store state
    // runs inside the sack locks.
    import spark.implicits._
    // The incoming batch feeds multiple independent actions (batch
    // metadata, the merge materialization); unpersisted, each re-ran
    // the caller's whole upstream pipeline — profiled at ~2 extra
    // batch computations per ingest. One persist bounds it at one
    // computation (the batch is ingest-sized; it gets written out
    // anyway), and ONE aggregate carries all per-metric metadata —
    // batch min/max per metric — so the cache is scanned once for it,
    // not per metadatum.
    //
    // EXCEPT scan-shaped batches: when the batch plan holds no
    // aggregate/join/window/generate/sort (a plain projected+filtered
    // source read — the fleet bulk-ingest shape), re-running the scan
    // for the second consumer is cheaper than materializing every row
    // into the cache first (measured: the cache write dominated the
    // metadata stage at 32× — ~2.8 s of a 12.8 s ingest — for a batch
    // whose scan recomputes in ~0.4 s). Expensive upstreams (the
    // facade's deduped unions, anything pre-aggregated) keep the
    // persist.
    val scanShaped = {
      import org.apache.spark.sql.catalyst.plans.logical._
      val plan = batch.queryExecution.optimizedPlan
      plan.collectFirst {
        case p @ (_: Aggregate | _: Join | _: Window | _: Generate |
                  _: Sort | _: Distinct | _: Deduplicate) => p
      }.isEmpty &&
      // determinism gate (r16): skipping the persist re-evaluates the
      // batch plan once per consumer (metadata pass, then merge). A
      // scan-shaped plan carrying a non-deterministic expression (e.g.
      // a rand() sampling filter) can yield DIFFERENT rows on
      // re-evaluation — the sack-lock set and driver metadata would
      // then disagree with the rows actually ingested. Keep the persist
      // for those.
      plan.forall(_.expressions.forall(_.deterministic))
    }
    val batchP0 = batch.select("metric_id", "timestamp", "value")
    val batchP =
      if (scanShaped) batchP0
      else batchP0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchMetaDf = batchP.groupBy("metric_id")
      .agg(min(unix_timestamp(col("timestamp"))).as("mn"),
        max(unix_timestamp(col("timestamp"))).as("mx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val maxDriverMetrics = spark.conf
        .get("spark.graft.ingest.maxDriverMetrics", "100000").toLong
      // ONE action decides the path AND fetches the fast-path metadata:
      // collect up to maxDriverMetrics+1 rows — more than the threshold
      // means fallback (the rows are discarded unread), at or under it
      // the collected rows ARE the batch metadata. The old count() +
      // collect() pair cost a second job per ingest for the same
      // information (the persisted aggregate is scanned either way).
      val overLimit = math.min(maxDriverMetrics, Int.MaxValue - 1L).toInt + 1
      val headMeta: Array[(String, Long, Long)] =
        stage("batch metadata")(batchMetaDf.limit(overLimit).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
      // EMPTY batch: nothing to accept, merge, or rewrite — the full
      // pipeline below would run 4+ no-op Spark jobs to write nothing
      // (an empty batch touches no sacks, so every downstream frame is
      // empty and no partition is overwritten). The streaming drain
      // relies on this early exit instead of paying its own
      // isEmpty probe job per micro-batch. (An empty headMeta always
      // lands on the driver path: 0 <= maxDriverMetrics.)
      if (headMeta.isEmpty) return
      val driverPath = headMeta.length <= maxDriverMetrics
      val batchMeta: Array[(String, Long, Long)] =
        if (driverPath) headMeta else Array.empty
      // the sack set is ≤ NumSacks rows at ANY metric cardinality, so it
      // stays a driver literal in both paths — partition pruning needs
      // literals (a join on a partition column does not prune the scan)
      val batchSacks: Seq[Int] =
        if (driverPath) batchMeta.map(t => sackOfId(t._1)).distinct.toSeq
        else batchMetaDf.select(sackOf(col("metric_id")).as("s")).distinct()
          .collect().map(_.getInt(0)).toSeq
      withSackLocks(batchSacks)(
        addMeasuresImpl(batchP, batchMetaDf, driverPath, batchMeta,
          batchSacks))
    } finally {
      batchMetaDf.unpersist()
      batchP.unpersist()
    }
  }

  private def addMeasuresImpl(batchP: DataFrame, batchMetaDf: DataFrame,
      driverPath: Boolean, batchMeta: Array[(String, Long, Long)],
      batchSacks: Seq[Int]): Unit = {
    val blockS = fixedGrans.max
    // rate: methods need one extra block of history (chef.py:261-262)
    val backBlocks = policy.backWindow +
      (if (policy.aggregationMethods.exists(_.startsWith("rate:"))) 1 else 0)

    // ---- M2 BoundTimeSerie.set_values order (carbonara.py:354-373):
    // 1. acceptance: drop INCOMING points older than the back window
    //    computed from the OLD buffer's last timestamp;
    // 2. merge (new wins);
    // 3. aggregate from the merged series (so accepted late points still
    //    reach their buckets);
    // 4. only then truncate the stored buffer to the NEW last timestamp.
    //
    // The buffer read is restricted UP FRONT to the sacks the batch
    // touches — a partition-pruned scan on the sack layout — so the
    // whole job is O(batch's sacks), untouched metrics never enter the
    // merge/window/truncate pipeline.
    //
    // Batch/buffer METADATA (which metrics, which sacks, old-buffer
    // last timestamps, first-new timestamps) is materialized ONCE.
    // Below `spark.graft.ingest.maxDriverMetrics` touched metrics the
    // metadata lands in driver-local relations + broadcast joins — the
    // fast path, sized for the reference's own sack regime (~hundreds
    // of metrics per batch). ABOVE it, the same quantities are computed
    // as distributed frames and plain joins: a 100 TB fleet batch
    // touching 10 M metrics would otherwise put ~1 GB of metadata and a
    // multi-million-element isin on the driver. The two paths produce
    // identical store bytes (IngestSpec pins this).
    import spark.implicits._
    // broadcast hint only on the fast path: at fallback cardinality the
    // per-metric frames are too big to broadcast — AQE picks the join
    val hb: DataFrame => DataFrame = if (driverPath) broadcast else identity

    val rawTouched =
      rawBuffer.filter(col("sack").isin(batchSacks: _*))
        .select("metric_id", "timestamp", "value")
    val oldLastAgg = rawTouched.groupBy("metric_id")
      .agg(max(unix_timestamp(col("timestamp"))).as("__old_last_s"))
    val oldLastRows: Seq[(String, Long)] =
      if (!driverPath) Nil
      else stage("old-buffer lasts")(oldLastAgg.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq)
    // fallback-path persisted frames, unpersisted at the end
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val oldLast =
      if (driverPath) oldLastRows.toDF("metric_id", "__old_last_s")
      else {
        val p = oldLastAgg
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persisted += p; p
      }
    val accepted = batchP
      .join(hb(oldLast), Seq("metric_id"), "left")
      .filter(col("__old_last_s").isNull ||
        unix_timestamp(col("timestamp")) >=
          (floor(col("__old_last_s") / blockS) * blockS -
            lit(blockS.toLong * backBlocks)).cast("long"))
      .drop("__old_last_s")
    val merged = TimeSeriesOps.merge(
      accepted, rawTouched,
      Seq("metric_id"), "timestamp", lit(0), orderBound = 1L)
      .cache()
    // per-metric last timestamp as an AGGREGATE + join, not a window:
    // the aggregate partial-combines map-side to one row per metric
    // (the window formulation re-shuffles every measure row)
    val lasts = merged.groupBy("metric_id")
      .agg(max(unix_timestamp(col("timestamp"))).as("__last_s"))
    val bounded = merged
      .join(hb(lasts), Seq("metric_id"))
      .withColumn("__floor_s",
        (floor(col("__last_s") / blockS) * blockS - lit(blockS.toLong * backBlocks)).cast("long"))
      .filter(unix_timestamp(col("timestamp")) >= col("__floor_s"))
      .drop("__last_s", "__floor_s")

    // First affected timestamp per metric. The exact value is min
    // ACCEPTED timestamp; its block-aligned lower bound
    // max(acceptance threshold, batch min) is equally correct: a
    // smaller firstNew only widens the recompute range, and every
    // bucket at or after the (block-aligned) threshold is fully
    // recomputable from the retained raw buffer — the same envelope
    // the acceptance filter and the buffer truncation already share.
    // (A fully-rejected metric recomputes its retained range to
    // identical values — idempotent overwrite.)
    //
    // Fast path: a driver computation, no extra action. It also
    // enumerates the touched (split, msack) partitions as DRIVER
    // literals: per metric the recompute range is
    // [floor(firstNew/gran)·gran, floor(last/gran)·gran] with
    // last ≤ max(batch max, old-buffer last) — both known on the
    // driver. These literals pre-prune the stored-agg scan below:
    // without them the kept join carries only isnotnull partition
    // filters (plan-probed) and every warm batch scans the store's
    // FULL split history. The set is a safe superset (the exact
    // `touched` join still refines it).
    //
    // Fallback path: firstNew is a distributed join of the batch
    // metadata with the old-buffer lasts, and split pruning degrades
    // to the GLOBAL [min firstNew, max last] range — two scalars from
    // one tiny aggregate — with the exact `touched` join refining as
    // before.
    val (firstNew: DataFrame, splitPrune: org.apache.spark.sql.Column) =
      if (driverPath) {
        val oldLastMap = oldLastRows.toMap
        val firstNewLocal: Seq[(String, Long)] = batchMeta.toSeq.map {
          case (m, mn, _) =>
            val thr = oldLastMap.get(m).map(s =>
              math.floorDiv(s, blockS) * blockS - blockS.toLong * backBlocks)
            (m, thr.map(math.max(_, mn)).getOrElse(mn))
        }
        val batchMaxMap = batchMeta.map { case (m, _, mx) => (m, mx) }.toMap
        // (lo, hi) split RANGES first — never materialize the literals
        // until the total size is known to be bounded: a deep backfill
        // or one corrupt far-future timestamp makes a single range
        // span millions of splits, and `lo to hi` before the size
        // check would build them all on the driver
        val ranges: Seq[(Long, Long)] = fixedGrans.flatMap { granS =>
          firstNewLocal.map { case (m, fn) =>
            val lastS = math.max(batchMaxMap(m),
              oldLastMap.getOrElse(m, Long.MinValue))
            (math.floorDiv(math.floorDiv(fn, granS) * granS, granS * 3600),
              math.floorDiv(lastS, granS * 3600))
          }
        }.filter { case (lo, hi) => hi >= lo }
        val totalSize = ranges.foldLeft(0L) { case (acc, (lo, hi)) =>
          if (acc > 4096) acc else acc + (hi - lo + 1)
        }
        val prune =
          if (totalSize <= 4096)
            col("split").isin(
              ranges.flatMap { case (lo, hi) => lo to hi }.distinct: _*)
          else lit(true) // degenerate range: unpruned scan, exact join refines
        (firstNewLocal.toDF("metric_id", "__first_new_s"), prune)
      } else {
        val fn = batchMetaDf.join(oldLast, Seq("metric_id"), "left")
          .select(col("metric_id"),
            when(col("__old_last_s").isNull, col("mn"))
              .otherwise(greatest(col("mn"),
                (floor(col("__old_last_s") / blockS) * blockS -
                  lit(blockS.toLong * backBlocks)).cast("long")))
              .as("__first_new_s"),
            greatest(col("mx"), coalesce(col("__old_last_s"), col("mx")))
              .as("__last_all_s"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persisted += fn
        val b = stage("global bounds")(fn
          .agg(min("__first_new_s").as("lo"), max("__last_all_s").as("hi"))
          .collect()(0))
        val (fnMin, lastMax) = (b.getLong(0), b.getLong(1))
        val splitLo = fixedGrans.map(g =>
          math.floorDiv(math.floorDiv(fnMin, g) * g, g * 3600)).min
        val splitHi = fixedGrans.map(g => math.floorDiv(lastMax, g * 3600)).max
        (fn.select("metric_id", "__first_new_s"),
          col("split").between(splitLo, splitHi))
      }

    val rateMethods =
      policy.aggregationMethods.toSeq.filter(_.startsWith("rate:")).sorted
    val plainMethods =
      policy.aggregationMethods.toSeq.filterNot(_.startsWith("rate:")).sorted
    val newAggRows = fixedGrans.map { granS =>
      val withFn = merged.join(hb(firstNew), Seq("metric_id"))
      val winStart =
        (floor(col("__first_new_s") / granS) * granS - lit(blockS)).cast("long")
      val affectedRaw = withFn
        .filter(unix_timestamp(col("timestamp")) >= winStart)
        .drop("__first_new_s")
      // one shared hash aggregate for every non-rate method (unpivoted
      // to long form), plus one pass per rate: method — the batch's
      // shuffle count no longer scales with the policy's method list
      val plainRows =
        if (plainMethods.isEmpty) Nil
        else Seq(Kernels.aggregateAll(affectedRaw, plainMethods,
          Granularity.seconds(granS), Seq("metric_id"), "timestamp", "value"))
      // rate: diffs at the window edge need each metric's LAST point
      // BEFORE the window — the predecessor of an out-of-order point
      // can sit arbitrarily far back (r14 fuzz: a point inserted
      // between two stored points more than one block after its
      // predecessor silently LOST its diff; the one-block history only
      // covers gap ≤ block). The reference gets this by recomputing
      // the whole retained back window every cycle (chef.py:261-262
      // keeps back_window+1 blocks and re-aggregates from the window
      // edge); this stays O(batch + 1 row/metric): one max_by over the
      // already-pruned touched-sack merge. The predecessor's own
      // bucket falls before the keep threshold, so only its
      // CONTRIBUTION to the first in-window diff survives.
      val rateRows =
        if (rateMethods.isEmpty) Nil
        else {
          val preds = withFn
            .filter(unix_timestamp(col("timestamp")) < winStart)
            .groupBy("metric_id")
            .agg(max_by(struct(col("timestamp"), col("value")),
              col("timestamp")).as("__p"))
            .select(col("metric_id"), col("__p.timestamp").as("timestamp"),
              col("__p.value").as("value"))
          Seq(Kernels.aggregateAll(affectedRaw.unionByName(preds),
            rateMethods, Granularity.seconds(granS),
            Seq("metric_id"), "timestamp", "value"))
        }
      (plainRows ++ rateRows).reduce(_ unionByName _)
        .join(hb(firstNew), Seq("metric_id"))
        .filter(unix_timestamp(col("bucket")) >=
          (floor(col("__first_new_s") / granS) * granS).cast("long"))
        .drop("__first_new_s")
        .select(col("metric_id"), col("bucket"), col("value"),
          col("method"), lit(granS).as("gran_s"),
          splitOf(col("bucket"), granS).as("split"),
          sackOf(col("metric_id")).as("msack"))
    }.reduce(_ unionByName _)

    // Keep stored rows of touched partitions that predate the recompute
    // range. The partition key includes the metric sack (msack): the
    // reference's split objects are PER METRIC (carbonara SplitKey), so
    // its warm rewrite is O(touched metric); a (method, gran, split)
    // layout alone bundles EVERY metric into one time-split and a batch
    // touching 0.1% of the fleet would rewrite 100% of the split.
    // Sacking bounds rewrite amplification at fleet scale — only the
    // batch's sacks' rows are re-read and re-written — and metric-
    // filtered reads prune to 1/NumSacks of the files on top of the
    // time pruning.
    val touched = newAggRows.select("method", "gran_s", "split", "msack")
      .distinct()
    val boundary = newAggRows.groupBy("metric_id", "method", "gran_s")
      .agg(min(unix_timestamp(col("bucket"))).as("__lo_s"))
    val prunedAgg =
      aggregates.filter(splitPrune && col("msack").isin(batchSacks: _*))
    val kept = prunedAgg
      .join(touched, Seq("method", "gran_s", "split", "msack"))
      .join(boundary, Seq("metric_id", "method", "gran_s"), "left")
      .filter(col("__lo_s").isNull ||
        unix_timestamp(col("bucket")) < col("__lo_s"))
      .drop("__lo_s")

    // Warm path: swapWrite stages the merged output BESIDE the store
    // and renames touched partitions into place — one materialization,
    // no self-read hazard (the job drains the old files before any
    // rename), no localCheckpoint. The repartition inside swapWrite
    // keeps one file per directory per owning task, and the
    // (metric_id, bucket) in-file clustering gives parquet row-group
    // stats so single-metric reads skip row groups — the within-file
    // analogue of the partition pruning above.
    // FRESH-STORE fast path: nothing in the plan reads a missing
    // aggPath (readOr fell back to an empty local relation), so first
    // ingests write straight through without staging renames.
    val aggExists = pathExists(aggPath)
    val aggJob: () => Unit = () =>
      if (aggExists)
        stage("agg write")(swapWrite(
          kept.select(newAggRows.columns.map(col).toSeq: _*)
            .unionByName(newAggRows),
          aggPath, Seq("method", "gran_s", "split", "msack"),
          Seq("metric_id", "bucket")))
      else stage("agg write")(newAggRows
        .repartition(col("method"), col("gran_s"), col("split"), col("msack"))
        .sortWithinPartitions("metric_id", "bucket")
        .write
        // scoped HERE, not on the shared session — a global conf flip
        // would change overwrite semantics for every other writer
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("method", "gran_s", "split", "msack")
        .mode(SaveMode.Overwrite)
        .parquet(aggPath))

    // Raw buffer is sack-partitioned (the reference's sack analogue,
    // incoming/__init__.py:243-244): a batch rewrites ONLY the sacks of
    // the metrics it touches — O(batch's sacks), not O(buffer).
    // sacks from the driver literal list (≤ NumSacks rows, both paths) —
    // the accepted-frame formulation re-scanned the batch inside this write
    val touchedSacks = batchSacks.toDF("sack")
    val rawOut = bounded.withColumn("sack", sackOf(col("metric_id")))
      .join(broadcast(touchedSacks), Seq("sack"))
    // same warm/fresh split as the aggregate side: swapWrite drains
    // rawPath fully (including merged-cache recomputes on eviction)
    // before any rename touches it, so no checkpoint is needed
    val rawJob: () => Unit = () =>
      if (pathExists(rawPath))
        stage("raw write")(swapWrite(rawOut, rawPath,
          Seq("sack"), Seq("metric_id", "timestamp")))
      else stage("raw write")(rawOut
        .repartition(col("sack"))
        .sortWithinPartitions("metric_id", "timestamp")
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("sack")
        .mode(SaveMode.Overwrite)
        .parquet(rawPath))

    // The aggregate rewrite and the raw-buffer rewrite are INDEPENDENT
    // jobs — disjoint output trees, both reading the same cached
    // `merged` frame — so submit them concurrently (guide §2.6 overlap
    // independent jobs): the raw write's tasks back-fill the agg
    // write's stage tail instead of serializing after it. Both futures
    // complete inside the caller's sack locks; unpersist only runs once
    // neither job can still recompute from the cache, and the first
    // failure is rethrown after both settle.
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext =
        MetricStore.storeWriteEc
      val fa = Future(aggJob())
      val fb = Future(rawJob())
      val ra = scala.util.Try(Await.result(fa, Duration.Inf))
      val rb = scala.util.Try(Await.result(fb, Duration.Inf))
      merged.unpersist()
      persisted.foreach(_.unpersist())
      ra.get
      rb.get
    }
  }

  /** Single-metric read (§3.1): partition-pruned scan + fetch slicing;
    * optional resample to a coarser granularity (A10).
    */
  def getMeasures(
      metricId: String, method: String, granS: Long,
      from: Option[java.sql.Timestamp] = None,
      to: Option[java.sql.Timestamp] = None,
      resample: Option[Granularity] = None): DataFrame = {
    var df = aggregates
      .filter(col("method") === method && col("gran_s") === granS &&
        col("msack") === sackOfId(metricId) && // sack partition pruning
        col("metric_id") === metricId)
    for (f <- from) df = df.filter(col("split") >= splitOf(lit(f), granS))
    for (t <- to) df = df.filter(col("split") <= splitOf(lit(t), granS))
    // the reference READ ORDER (storage/__init__.py:294-338): prune
    // splits → truncate (retention anchored at the pruned series' last
    // point) → resample over the whole pruned range → fetch at the
    // OUTPUT granularity. Fetching fine-first would hand resample a
    // PARTIAL first coarse bucket (the reference's resample sees every
    // fine bucket of split(from)); truncating after a to-slice would
    // re-anchor retention at the in-range last point.
    for (tsS <- timespanS(granS))
      df = TimeSeriesOps.truncate(df, tsS * 1_000_000_000L,
        Seq("metric_id", "method", "gran_s"))
    (resample match {
      case Some(g) =>
        TimeSeriesOps.fetch(
          TimeSeriesOps.resample(df, method, g,
            Seq("metric_id", "method", "gran_s")),
          g, from, to)
      case None =>
        TimeSeriesOps.fetch(df, Granularity.seconds(granS), from, to)
    }).select("metric_id", "bucket", "value")
  }

  /** P2 multi-series fetch (processor.py:134-137): ONE pruned scan with
    * IN predicates instead of the reference's per-series thread-pool
    * fan-out — returns (metric_id, method, bucket, value) for every
    * requested combination present in the store.
    */
  def getMeasuresMany(metricIds: Seq[String], methods: Seq[String],
                      granS: Long,
                      from: Option[java.sql.Timestamp] = None,
                      to: Option[java.sql.Timestamp] = None): DataFrame = {
    var df = aggregates
      .filter(col("gran_s") === granS &&
        col("method").isin(methods: _*) &&
        col("msack").isin(metricIds.map(sackOfId).distinct: _*) &&
        col("metric_id").isin(metricIds: _*))
    // start/stop prune split partitions before the fetch slice, so a
    // time-bounded fleet query reads only its splits' files
    for (f <- from) df = df.filter(col("split") >= splitOf(lit(f), granS))
    for (t <- to) df = df.filter(col("split") <= splitOf(lit(t), granS))
    // truncate BEFORE the fetch slice, as getMeasures (the reference
    // read order) — retention anchors at the pruned series' last point
    for (tsS <- timespanS(granS)) // retention truncate on read, as A11
      df = TimeSeriesOps.truncate(df, tsS * 1_000_000_000L,
        Seq("metric_id", "method", "gran_s"))
    df = TimeSeriesOps.fetch(df, Granularity.seconds(granS), from, to)
    df.select("metric_id", "method", "bucket", "value")
  }

  /** Calendar-granularity read (B2 through the store, gnocchi
    * calendar.py:95-100): resample the stored fixed series to calendar
    * buckets on read with the SAME method per series — the A10
    * reaggregation contract (resampled mean = mean-of-means). Storage
    * stays fixed-granularity: calendar spans are irregular, so
    * materializing them would forfeit the numeric split pruning of the
    * fixed layout, while this read costs one partial-aggregable hash
    * aggregate over the already split-pruned fixed scan.
    *
    * The calendar unit must be declared in the policy (like any other
    * materialized granularity); `baseGranS` picks which stored fixed
    * series feeds the resample.
    */
  def getMeasuresCalendar(metricIds: Seq[String], methods: Seq[String],
                          unit: String, baseGranS: Long,
                          from: Option[java.sql.Timestamp] = None,
                          to: Option[java.sql.Timestamp] = None): DataFrame = {
    require(policy.definition.exists(
        _.granularity == Granularity.Calendar(unit)),
      s"policy ${policy.name}: calendar granularity $unit not declared")
    val base = getMeasuresMany(metricIds, methods, baseGranS, from, to)
    // SINGLE pass: every kernel evaluates as one aggregate column over
    // one shared (metric, method, calendar-bucket) hash aggregate, and
    // each row keeps its own method's value — a per-method
    // filter+resample union would re-scan and re-shuffle the store
    // once per method (plan-audited: 4 scans for 2 methods × 2 units)
    val bases = methods.map(graft.timeseries.Kernels.baseMethod).distinct
    val aggCols = bases.map(m =>
      graft.timeseries.Kernels.aggColumn(m, col("value"), col("bucket"))
        .as(s"__v_$m")) :+ count(col("value")).as("__n")
    val grouped = base
      .withColumn("__b2",
        graft.timeseries.Bucketing.calendarBucket(col("bucket"), unit))
      .groupBy(col("metric_id"), col("method"), col("__b2").as("bucket"))
      .agg(aggCols.head, aggCols.tail: _*)
    val value = bases.foldLeft(lit(null).cast("double")) { (acc, m) =>
      when(col("method") === m ||
        col("method") === s"rate:$m", col(s"__v_$m")).otherwise(acc)
    }
    val gt1 = bases.filter(graft.timeseries.Kernels.needsCountGt1)
    val keep = gt1.foldLeft(lit(true)) { (acc, m) =>
      acc && !(col("method").isin(m, s"rate:$m") && col("__n") <= 1)
    }
    grouped.filter(keep)
      .select(col("metric_id"), col("method"), col("bucket"),
        value.as("value"))
  }

  /** Migration OUT: render this store's whole content as a
    * reference-layout carbonara tree — every (metric, method,
    * granularity) series becomes compressed split objects
    * (`agg_<method>/<key>_<gran>_v3`), the raw buffer becomes
    * per-metric `none_v3` objects. A reference deployment can read the
    * result with its own unserializers; one shuffle per object plane.
    */
  def exportCarbonara(destPath: String): Unit = {
    graft.sources.Carbonara.writeObjects(
      graft.sources.Carbonara.aggSplitObjects(
        aggregates.select(col("metric_id"), col("method"),
          col("gran_s").cast("long").as("granularity_s"),
          unix_timestamp(col("bucket")).cast("long").as("bucket_s"),
          col("value"))),
      destPath)
    graft.sources.Carbonara.writeObjects(
      graft.sources.Carbonara.rawBufferObjects(
        rawBuffer.select("metric_id", "timestamp", "value")),
      destPath)
  }

  /** Migration IN: materialize a reference store tree into THIS store's
    * layout. Aggregates import VERBATIM (never recomputed — the
    * reference's raw buffer is back-window bounded and cannot rebuild
    * aggregate history); only second-aligned granularities are
    * representable in this layout (sub-second splits are skipped, and
    * a count is printed so a migration can't silently drop them). The
    * raw buffer lands in the sack layout ready for the next
    * addMeasures. Fresh-store only: merging into live content is the
    * incremental job's business, not the migrator's.
    */
  def importCarbonara(srcPath: String): Unit = withStoreLock(importCarbonaraImpl(srcPath))

  private def importCarbonaraImpl(srcPath: String): Unit = {
    require(!pathExists(aggPath) && !pathExists(rawPath),
      s"importCarbonara requires a fresh store (found content under $root)")
    // persist: the dropped-count action and the write below would each
    // re-list, re-read and re-lz4-decode the ENTIRE source store — the
    // dominant cost of a large migration, paid twice
    val all = graft.sources.Carbonara.readAggregates(spark, srcPath)
      .withColumn("__aligned",
        col("granularity_s") === col("granularity_s").cast("long").cast("double"))
      .persist()
    try {
    val dropped = all.filter(!col("__aligned")).count()
    if (dropped > 0)
      System.err.println(s"[carbonara-import] $dropped sub-second-granularity " +
        "rows are not representable in the second-keyed store; skipped")
    val out = all.filter(col("__aligned"))
      .withColumn("gran_s", col("granularity_s").cast("long"))
      .select(col("metric_id"), col("timestamp").as("bucket"), col("value"),
        col("method"), col("gran_s"),
        floor(unix_timestamp(col("timestamp")) / (col("gran_s") * 3600))
          .cast("long").as("split"),
        sackOf(col("metric_id")).as("msack"))
    out.repartition(col("method"), col("gran_s"), col("split"), col("msack"))
      .sortWithinPartitions("metric_id", "bucket")
      .write.partitionBy("method", "gran_s", "split", "msack")
      .parquet(aggPath)
    } finally all.unpersist()
    graft.sources.Carbonara.readRaw(spark, srcPath)
      .withColumn("sack", sackOf(col("metric_id")))
      .repartition(col("sack"))
      .sortWithinPartitions("metric_id", "timestamp")
      .write.partitionBy("sack")
      .parquet(rawPath)
  }

  /** J2 split compaction (storage/__init__.py:528-550): rewrite the
    * aggregate table clustered by its partition key so each immutable
    * split directory collapses to one file. Optional — the analogue of
    * the reference's "compress for fun" pass / OPTIMIZE.
    */
  def compact(): Unit = withStoreLock {
    swapWrite(aggregates, aggPath,
      Seq("method", "gran_s", "split", "msack"), Seq("metric_id", "bucket"))
  }

  /** J5 raw-buffer re-truncation (chef.py:186-295): re-apply the
    * back-window bound to the stored raw buffer without new measures —
    * the `needs_raw_data_truncation` pass after a back_window shrink.
    */
  def truncateRaw(): Unit = withStoreLock(truncateRawImpl())

  private def truncateRawImpl(): Unit = {
    val blockS = fixedGrans.max
    // rate: methods need one extra block of history, EXACTLY as the
    // ingest path retains (addMeasures) — truncating to the bare
    // backWindow would discard the predecessor points the first
    // rate-diff at the recompute boundary needs
    val backBlocks = policy.backWindow +
      (if (policy.aggregationMethods.exists(_.startsWith("rate:"))) 1 else 0)
    val raw = rawBuffer
    // aggregate + broadcast, not a window (see addMeasures)
    val lasts = raw.groupBy("metric_id")
      .agg(max(unix_timestamp(col("timestamp"))).as("__last_s"))
    val bounded = raw
      .join(broadcast(lasts), Seq("metric_id"))
      .withColumn("__floor_s",
        (floor(col("__last_s") / blockS) * blockS -
          lit(blockS * backBlocks.toLong)).cast("long"))
      .filter(unix_timestamp(col("timestamp")) >= col("__floor_s"))
      .drop("__last_s", "__floor_s")
      .withColumn("sack", sackOf(col("metric_id")))
    swapWrite(bounded, rawPath, Seq("sack"), Seq("metric_id", "timestamp"))
  }

  /** J4 metric expunge (chef.py:297-345): remove one metric's rows from
    * the raw buffer and every aggregate split.
    *
    * Aggregate side: enumerate the (method, gran_s, split) partitions
    * that contain the metric (plan-time scalar list, bounded by the
    * retention window — the reference enumerates objects the same way,
    * storage/__init__.py:516-527), rewrite only those, and explicitly
    * delete the ones left with no surviving rows — dynamic partition
    * overwrite only replaces partitions that RECEIVE output, so a
    * filtered rewrite alone would leave all-expunged splits on disk.
    * Raw side: the sack layout makes this a one-sack rewrite (or a
    * directory drop when the sack held only this metric).
    */
  def expungeMetric(metricId: String): Unit = expungeMetrics(Seq(metricId))

  /** Batched expunge — the janitor's shape (cli/metricd.py:262-299
    * processes deletions in batches): N metrics cost ONE partition-
    * pruned rewrite of the union of their touched (split, msack)
    * slices, not N store rewrites. The touched-partition list is a
    * driver scalar bounded by batch size × retention, the same
    * envelope the reference enumerates objects in.
    */
  def expungeMetrics(metricIds: Seq[String]): Unit =
    // the ids name the touched sacks up front — lock only those, so an
    // expunge batch runs beside ingest on other sacks
    withSackLocks(metricIds.map(sackOfId).distinct)(
      expungeMetricsImpl(metricIds))

  private def expungeMetricsImpl(metricIds: Seq[String]): Unit = {
    if (metricIds.isEmpty) return
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // the batch lives in at most NumSacks msacks — scans and rewrites
    // touch only those sacks' slices of the touched splits
    val sacks = metricIds.map(sackOfId).distinct
    val touched = aggregates.filter(col("msack").isin(sacks: _*) &&
        col("metric_id").isin(metricIds: _*))
      .select(col("method"), col("gran_s").cast("long"),
        col("split").cast("long"), col("msack").cast("int"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    if (touched.nonEmpty) {
      val touchedDf = touched.toSeq.toDF("method", "gran_s", "split", "msack")
      // persist (not checkpoint) spans the kept-collect and the write;
      // swapWrite itself needs no lineage cut — recomputes still read
      // the untouched store files until the final renames
      val remaining = aggregates
        .join(broadcast(touchedDf), Seq("method", "gran_s", "split", "msack"))
        .filter(!col("metric_id").isin(metricIds: _*))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val kept = remaining
        .select(col("method"), col("gran_s").cast("long"),
          col("split").cast("long"), col("msack").cast("int"))
        .distinct()
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      if (!kept.isEmpty)
        swapWrite(remaining, aggPath,
          Seq("method", "gran_s", "split", "msack"), Seq("metric_id", "bucket"))
      remaining.unpersist()
      // splits left with no surviving rows: swapWrite only replaces
      // partitions that receive output, so drop the directories.
      // Partition VALUES are path-escaped by Spark on write
      // (`rate:mean` → `rate%3Amean`): build the path the same way or
      // the delete silently misses the directory.
      touched.filterNot(kept).foreach { case (m, g, s, z) =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$aggPath/method=${escapePart(m)}/gran_s=$g/split=$s/msack=$z"),
          true)
      }
    }

    // raw side: rewrite only the sacks that actually hold target rows
    // (a batch id whose sack holds only OTHER metrics costs nothing)
    val raw = rawBuffer
    val targetSacks = raw.filter(col("sack").isin(sacks: _*) &&
        col("metric_id").isin(metricIds: _*))
      .select(col("sack").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (targetSacks.nonEmpty) {
      val remainingRaw = raw.filter(col("sack").isin(targetSacks: _*))
        .filter(!col("metric_id").isin(metricIds: _*))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // sacks whose every row belonged to the batch end up with no
      // output partition — drop those directories (≤ NumSacks rows)
      val keptSacks = remainingRaw.select(col("sack").cast("int"))
        .distinct().collect().map(_.getInt(0)).toSet
      if (keptSacks.nonEmpty)
        swapWrite(remainingRaw, rawPath,
          Seq("sack"), Seq("metric_id", "timestamp"))
      targetSacks.filterNot(keptSacks).foreach(z =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$rawPath/sack=$z"), true))
      remainingRaw.unpersist()
    }
  }

  /** J3 retention expiry: physically drop whole splits strictly older
    * than the oldest key to keep (storage/__init__.py:516-527).
    */
  def expireRetention(nowS: Long): Unit = withStoreLock(expireRetentionImpl(nowS))

  private def expireRetentionImpl(nowS: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (granS <- fixedGrans; tsS <- timespanS(granS)) {
      val oldestSplit = (nowS - tsS) / (granS * 3600)
      for (method <- policy.aggregationMethods.toSeq.sorted) {
        // escaped like the write side — a raw `rate:mean` path never
        // exists, so rate splits would never expire
        val dir = new org.apache.hadoop.fs.Path(
          s"$aggPath/method=${escapePart(method)}/gran_s=$granS")
        if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
          val name = st.getPath.getName // split=<k>
          if (name.startsWith("split=") &&
              name.stripPrefix("split=").toLong < oldestSplit)
            fs.delete(st.getPath, true)
        }
      }
    }
  }
}

object MetricStore {
  /** Store-lock files left behind by over-stale holds (release
    * deliberately leaves the lock for the successor's stale break) —
    * process-wide, so /v1/status can surface a misconfigured
    * lockStaleMs instead of it only WARNing into a log.
    */
  val lockLeaks = new java.util.concurrent.atomic.AtomicLong(0)

  /** Shared daemon pool for submitting a store's independent write
    * jobs concurrently (agg + raw rewrite per ingest). Cached: at most
    * 2 threads per in-flight ingest, idle threads reaped — the Spark
    * scheduler does the real work, these only block on job completion.
    */
  private[ingest] val storeWriteEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-store-write")
        t.setDaemon(true)
        t
      }))

  /** Partition-directory escaping, exactly as Spark's write path does
    * it (`method=rate:mean` lands as `method=rate%3Amean`). Every
    * hand-built partition path MUST go through this. */
  def escapePart(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(v)

  /** SplitKey rule: 3600 buckets per split per granularity
    * (carbonara.py:479-567, POINTS_PER_SPLIT at :494). */
  def splitOf(bucket: org.apache.spark.sql.Column, granS: Long) =
    floor(unix_timestamp(bucket) / (granS * 3600)).cast("long")

  /** Sack count for the raw buffer layout (the reference defaults to
    * 128 sacks, incoming/__init__.py:43; 32 here to match local[32] —
    * a deploy-time constant either way). */
  val NumSacks = 32

  /** Sack assignment — hash-bucket of the metric id, the analogue of
    * `metric_id.int % NUM_SACKS` (incoming/__init__.py:243-244). */
  def sackOf(metricId: org.apache.spark.sql.Column) =
    pmod(xxhash64(metricId), lit(NumSacks.toLong)).cast("int")

  /** Driver-side twin of [[sackOf]] (same xxhash64, same default seed
    * 42): metric-id literals known on the driver prune sack partitions
    * without a Spark job. Parity with the column form is spec-pinned.
    */
  def sackOfId(metricId: String): Int =
    Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(metricId),
        org.apache.spark.sql.types.StringType, 42L),
      NumSacks.toLong).toInt

  def emptyMeasures(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("metric_id", StringType),
        StructField("timestamp", TimestampType),
        StructField("value", DoubleType))))
  }

  def emptyAggregates(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("metric_id", StringType),
        StructField("bucket", TimestampType),
        StructField("value", DoubleType),
        StructField("method", StringType),
        StructField("gran_s", LongType),
        StructField("split", LongType),
        StructField("msack", IntegerType))))
  }
}
