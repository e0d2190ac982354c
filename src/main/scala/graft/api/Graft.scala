package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import graft.model.{ArchivePolicy, Granularity}
import graft.ingest.MetricStore
import graft.ops.{Compiler, Parser}
import graft.catalog.{Filter, FilterParser}
import graft.query.MeasureSearch

/** Scala facade mirroring the reference's REST surface (SURVEY §3):
  * policies, metrics, measure ingestion with deferred processing
  * (202-accepted semantics), single-metric reads, the cross-metric
  * expression DSL, value-threshold search, and resource search.
  */
class Graft(val spark: SparkSession, root: String) {

  // Catalog maps are concurrent and the staging plane takes
  // `stagingLock`: the statsd/amqp1d daemons started by
  // RestServer.serveAll flush into this instance from their own
  // threads, racing the HTTP dispatcher. Bare single-key reads are
  // safe on the TrieMaps; every compound check-then-act and every
  // touch of `pending`/`pendingDf` synchronizes.
  val policies: mutable.Map[String, ArchivePolicy] =
    scala.collection.concurrent.TrieMap(ArchivePolicy.defaults.toSeq: _*)
  private val metricPolicy = scala.collection.concurrent.TrieMap[String, String]()
  private val stores = mutable.Map[String, MetricStore]()
  private val stagingLock = new Object
  private val pending = mutable.ArrayBuffer[(String, java.sql.Timestamp, Double)]()
  // bulk-staged measures stay a DataFrame end to end — the corpus never
  // lands on the driver; status()/process() reduce it with aggregates
  // (#metrics rows), not row collects
  private val pendingBulk = mutable.ArrayBuffer[DataFrame]()
  // balanced pairwise union: a left-deep unionByName chain grows plan
  // depth linearly with staged batches (a daemon flushing every few
  // seconds between drains would overflow Catalyst's analyzer);
  // log-depth keeps thousands of staged batches analyzable
  private def pendingDf: Option[DataFrame] = {
    var level: Seq[DataFrame] = pendingBulk.toSeq
    while (level.size > 1)
      level = level.grouped(2).map(g =>
        if (g.size == 2) g(0).unionByName(g(1)) else g(0)).toSeq
    level.headOption
  }
  @volatile private var resources: Option[DataFrame] = None

  // `catalogLock` serializes the catalog read-modify-write mutators
  // (create/patch/delete resources, metric attachment, ALTER
  // backfills, the periodic compaction) so the REST door can run
  // multi-threaded: a lost update between two concurrent PATCHes would
  // silently drop one. Reads stay lock-free — the frames are
  // volatile-published immutable plans. Order discipline: never take
  // stagingLock while holding catalogLock — callees under this lock
  // must not reach storeOf/addMeasures.
  private val catalogLock = new Object

  /** Catalog mutations (row CRUD, end-dating, resurrection, ALTER
    * backfills) stack plan nodes on the in-memory catalog frames; a
    * long-lived server would grow an unbounded lineage (and eventually
    * a StackOverflow in analysis). Every `catalogCompactEvery`
    * mutations the catalog and history frames are cut to their
    * materialized contents — catalogs are driver-bounded metadata, so
    * the localCheckpoint is one small job.
    */
  private var catalogMutations = 0
  // small: retype (resource-type ALTER) references the catalog frame
  // twice per call, so its tree can still double per mutation — 2^8
  // nodes is the worst pre-compaction plan
  private val catalogCompactEvery = 8

  // ---- durable catalog plane ----------------------------------------
  // The reference's indexer is persistent SQL (indexer/sqlalchemy.py);
  // this facade journals every catalog mutation as ONE JSON event under
  // `<root>/_catalog` (O(1) per mutation, like a SQL row write) and
  // cuts full snapshots at rotation points — see
  // [[graft.catalog.CatalogStore]]. Loading happens at the constructor
  // TAIL (bottom of this class), after every field initializes.
  // var, not val: [[reloadCatalog]] swaps in a fresh store when a read
  // door's staleness probe sees another process's writer advance the
  // on-disk generation (loadedGen/segment baselines are load-time vals)
  @volatile private var catalogStore =
    new graft.catalog.CatalogStore(spark, root)
  // Set for the full duration of [[reloadCatalog]] (which only runs
  // under catalogLock). [[refreshIfStale]] re-reads it AFTER probing
  // the store: both vars are volatile, so a reader that observed the
  // mid-reload fresh store (which already reads not-stale) must on its
  // NEXT volatile read see the flag still true — and routes through
  // catalogLock instead of reading half-rebuilt catalog maps.
  @volatile private var reloadInProgress = false
  // true while the constructor replays the journal: mutators run their
  // normal bodies but journal() no-ops (events must not re-journal)
  private var replayingCatalog = false
  // set by the non-replayable frame doors (setResources / setMetrics /
  // setResourceHistory / resurrection): the next journal append cuts a
  // snapshot FIRST, so replay never applies an event to stale frames
  @volatile private var framesDirty = false
  private var journaledEvents = 0
  // Rotation is COST-PROPORTIONAL (amortized doubling), not a fixed
  // event count: a snapshot rewrites the FULL driver maps + all three
  // catalog frames — O(catalog) — so cutting one every fixed-256
  // events made N metric creates pay O(N²/256) total snapshot work,
  // where the reference's SQL indexer writes one row per mutation,
  // O(1) forever (indexer/sqlalchemy.py). Rotating only once the
  // journal has outgrown the size of the LAST snapshot means each
  // snapshot captures a catalog at least twice the previous one, so
  // total snapshot work telescopes to O(N) for N mutations — while
  // replay-on-load stays bounded by one catalog's worth of journal.
  private val journalRotateMin = 256
  // map entries + frame rows captured by the last snapshot; set by
  // persistCatalogLocked, seeded from the loaded maps at construction
  private var lastSnapshotSize = 0L
  private def journalRotateBound: Long =
    math.max(journalRotateMin.toLong, lastSnapshotSize)
  private def catalogMapEntries: Long =
    (policies.size + policyRules.size + resourceTypes.size +
      metricPolicy.size + metricUnit.size + metricCreator.size).toLong

  private def jevt(op: String,
                   fields: (String, org.json4s.JValue)*): org.json4s.JValue =
    org.json4s.JObject(
      ("op" -> (org.json4s.JString(op): org.json4s.JValue)) :: fields.toList)

  // serializes append+rotate against explicit persists, so a rotation
  // can never drop a journal segment out from under a concurrent
  // append (the RestServer pool runs mutators on 8 threads). Ordering:
  // persistLock may be taken while holding catalogLock/stagingLock
  // (mutators journal at the end of their locked bodies); nothing
  // holding persistLock takes those locks.
  private val persistLock = new Object

  /** Append one post-mutation event. Rotation happens AFTER the append
    * (the snapshot then reflects the event's outcome and the journal
    * starts empty — replay-consistent either way). A pending dirty
    * frame must instead flush at door ENTRY ([[flushDirtyFrames]]):
    * snapshotting between a mutation and its own event would capture
    * the mutation in the snapshot AND replay it from the journal.
    * Because mutation and append are not one atomic step, a rotation
    * racing the gap can snapshot a mutation whose event then lands in
    * the NEW journal — replay is DUPLICATE-TOLERANT for exactly that
    * (at-least-once journal semantics, see the load block).
    */
  private def journal(evt: org.json4s.JValue): Unit =
    if (!replayingCatalog) persistLock.synchronized {
      // the FIRST-ever event cuts a proper generation-0 snapshot
      // (maps + any registered frames), so a journal-only lifetime
      // always leaves a loadable maps.json behind
      if (!catalogStore.initialized) persistCatalogLocked()
      catalogStore.append(evt)
      journaledEvents += 1
      if (journaledEvents >= journalRotateBound) persistCatalogLocked()
    }

  /** Journal an event, rolling the door's in-memory mutation back if
    * the append refuses (writer-lock conflict, generation fence): the
    * caller's retry after resolving the conflict must not see a
    * half-applied state that was never durable. Map-plane doors pass a
    * cheap inverse; frame-plane doors (attach, resource CRUD) journal
    * residue whose inverse is a frame rebuild — there a refused append
    * leaves the facade condemned for writes, which the thrown Conflict
    * already signals.
    */
  private def journalOrRollback(evt: org.json4s.JValue)
                               (rollback: => Unit): Unit =
    try journal(evt)
    catch { case t: Throwable => rollback; throw t }

  /** Door-entry barrier: capture any non-replayable frame registration
    * (setResources / setMetrics / setResourceHistory / resurrection)
    * BEFORE a journaled mutation runs, so replay applies the event to
    * the exact frames it saw live. No-op when clean.
    */
  private def flushDirtyFrames(): Unit =
    if (!replayingCatalog && framesDirty) persistCatalog()

  /** Clean shutdown: snapshot any pending frame registrations and
    * release the journal stream. The journal itself is already durable
    * per event, so skipping close() loses nothing but the last dirty
    * set* frames. */
  def close(): Unit = {
    if (framesDirty) persistCatalog()
    catalogStore.close()
  }

  /** Cut a full catalog snapshot (maps + frames) and rotate the
    * journal — the explicit flush point for clean shutdown; also called
    * automatically before a journaled event when a bulk frame
    * registration is pending, at the rotation bound, and on the first
    * event of a fresh root.
    */
  def persistCatalog(): Unit =
    if (!replayingCatalog) persistLock.synchronized { persistCatalogLocked() }

  private def persistCatalogLocked(): Unit = {
    import org.json4s._
    import graft.catalog.CatalogJson
    val maps = JObject(List(
      "policies" -> JArray(policies.values.toList.sortBy(_.name)
        .map(CatalogJson.policyToJson)),
      "rules" -> JArray(policyRules.toList.map { case (n, p, a) =>
        JArray(List(JString(n), JString(p), JString(a))) }),
      "metric_policy" -> JObject(metricPolicy.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) }),
      "metric_unit" -> JObject(metricUnit.toList
        .map { case (k, v) => k -> (JString(v): JValue) }),
      "metric_creator" -> JObject(metricCreator.toList
        .map { case (k, v) => k -> (JString(v): JValue) }),
      "resource_types" -> JArray(resourceTypes.values.toList
        .sortBy(_.name).map(CatalogJson.rtToJson))))
    catalogStore.snapshot(maps, Map(
      "resources" -> resources,
      "metrics_catalog" -> metricsCatalog,
      "resource_history" -> resourceHistoryTbl))
    // re-point the frames at the NEW generation: the superseded
    // generation's files were just deleted, so a frame LOADED from it
    // would throw FileNotFound on its next action. Also cuts any
    // mutation-chain lineage (the snapshot is the localCheckpoint's
    // durable twin).
    resources = resources.flatMap(_ =>
      catalogStore.currentFrame("resources"))
    metricsCatalog = metricsCatalog.flatMap(_ =>
      catalogStore.currentFrame("metrics_catalog"))
    resourceHistoryTbl = resourceHistoryTbl.flatMap(_ =>
      catalogStore.currentFrame("resource_history"))
    framesDirty = false
    journaledEvents = 0
    // the next rotation bound: this snapshot's size. Frame counts are
    // three small jobs over the just-written parquet (footer-count
    // scans) — O(catalog), same class as the snapshot that preceded
    // them, and they only run at rotation points
    lastSnapshotSize = catalogMapEntries +
      Seq(resources, metricsCatalog, resourceHistoryTbl)
        .flatten.map(_.count()).sum
  }
  private def noteCatalogMutation(): Unit = catalogLock.synchronized {
    catalogMutations += 1
    if (catalogMutations % catalogCompactEvery == 0) {
      resources = resources.map(_.localCheckpoint(true))
      resourceHistoryTbl = resourceHistoryTbl.map(_.localCheckpoint(true))
      // the metric-attachment catalog stacks a plan node per attach /
      // detach / expunge — sustained metric churn on a long-lived
      // server would grow its lineage unboundedly without the same cut
      metricsCatalog = metricsCatalog.map(_.localCheckpoint(true))
    }
  }

  /** Create-or-replace (deliberate facade divergence: the reference
    * 409s a duplicate name, but this facade seeds the default policies
    * and tests/deployments re-declare them freely). Replacing a policy
    * re-opens its store lazily so reads and ingest never mix the old
    * and new definitions. */
  def createPolicy(p: ArchivePolicy): Unit = {
    flushDirtyFrames()
    // mutation+journal under ONE lock: two racing non-commutative
    // writes on the same key must journal in the order they applied,
    // or a restart replays to a state the live facade never served
    catalogLock.synchronized {
      val prev = policies.get(p.name)
      policies(p.name) = p
      stores.remove(p.name)
      journalOrRollback(graft.catalog.CatalogJson.policyToJson(p) match {
        case org.json4s.JObject(fs) => jevt("policy_create", fs: _*)
        case other => sys.error(s"bad policy json: $other")
      }) {
        prev match {
          case Some(old) => policies(p.name) = old
          case None      => policies.remove(p.name)
        }
        stores.remove(p.name)
      }
    }
  }

  /** PATCH /v1/archive_policy/<name> (sqlalchemy.py:642-662): only
    * timespan/points may change — granularities can be neither added,
    * dropped, nor altered (`UnsupportedArchivePolicyChange`). The
    * policy's store is re-opened with the new definition so the
    * retention-on-read (A11) and future truncations pick it up; stored
    * splits are untouched until the next J3/J5 pass, as in the
    * reference.
    */
  def updatePolicy(name: String,
                   items: Seq[graft.model.ArchivePolicyItem],
                   backWindow: Option[Int] = None): Unit = {
    flushDirtyFrames()
    catalogLock.synchronized {
      val cur = policies.getOrElse(name,
        GraftError.notFound(s"no policy $name"))
      require(cur.definition.size == items.size,
        s"$name: Cannot add or drop granularities")
      val curSorted = cur.definition.sortBy(_.granularity.token)
      val newSorted = items.sortBy(_.granularity.token)
      for ((c, n) <- curSorted.zip(newSorted))
        require(c.granularity == n.granularity,
          s"$name: ${c.granularity.token} granularity interval was changed")
      policies(name) = cur.copy(definition = items,
        backWindow = backWindow.getOrElse(cur.backWindow))
      stores.remove(name) // reopen lazily with the updated policy
      journalOrRollback(jevt("policy_update",
        "name" -> org.json4s.JString(name),
        "definition" -> org.json4s.JArray(
          items.toList.map(graft.catalog.CatalogJson.itemToJson)),
        "back_window" -> backWindow.map(b =>
          org.json4s.JLong(b.toLong): org.json4s.JValue)
          .getOrElse(org.json4s.JNull))) {
        policies(name) = cur; stores.remove(name)
      }
    }
  }

  /** GET /v1/capability (rest/api.py:2172-2177): the closed operator
    * set — basic kernels plus their `rate:` variants and Npct forms
    * are accepted dynamically by the kernel registry.
    */
  def capabilities: Set[String] = {
    val base = graft.model.ArchivePolicy.basicMethods
    base ++ base.map("rate:" + _)
  }

  def createMetric(id: String, policyName: String): Unit =
    createMetric(id, policyName, None)

  /** `unit` is the reference's informational metric attribute
    * (MetricSchema `rest/api.py:661-669`, ≤31 chars). A duplicate id
    * rejects (re-pointing an existing metric at another policy would
    * silently orphan its stored aggregates). */
  def createMetric(id: String, policyName: String,
                   unit: Option[String]): Unit = {
    flushDirtyFrames()
    // a metric-creation body naming an unknown policy is BAD INPUT
    // (rest/api.py:688 aborts 400 on indexer.NoSuchArchivePolicy),
    // unlike the 404 of looking UP /v1/archive_policy/<name>
    GraftError.valid(policies.contains(policyName),
      s"Archive policy $policyName does not exist")
    unit.foreach(u => require(u.length <= 31,
      s"unit too long (${u.length} > 31)"))
    catalogLock.synchronized {
      GraftError.fresh(metricPolicy.putIfAbsent(id, policyName).isEmpty,
        s"metric $id already exists")
      unit.foreach(metricUnit(id) = _)
      journalOrRollback(jevt("metric_create",
        "id" -> org.json4s.JString(id),
        "policy" -> org.json4s.JString(policyName),
        "unit" -> unit.map(u => org.json4s.JString(u): org.json4s.JValue)
          .getOrElse(org.json4s.JNull))) {
        metricPolicy.remove(id); metricUnit.remove(id)
      }
    }
  }

  private val metricUnit = scala.collection.concurrent.TrieMap[String, String]()

  def metricUnitOf(id: String): Option[String] = metricUnit.get(id)

  // creator is recorded by the REST door (the reference's auth_helper
  // value lands on the metric row, rest/api.py MetricsController.post)
  private val metricCreator = scala.collection.concurrent.TrieMap[String, String]()

  def setMetricCreator(id: String, creator: String): Unit = {
    flushDirtyFrames()
    catalogLock.synchronized {
      val prev = metricCreator.get(id)
      metricCreator(id) = creator
      journalOrRollback(jevt("metric_creator",
        "id" -> org.json4s.JString(id),
        "creator" -> org.json4s.JString(creator))) {
        prev match {
          case Some(old) => metricCreator(id) = old
          case None      => metricCreator.remove(id)
        }
      }
    }
  }

  def metricCreatorOf(id: String): Option[String] = metricCreator.get(id)

  /** Bulk metric-id → catalog name map (one driver-bounded collect —
    * the listing door must not collect per row). Empty without a
    * registered catalog. */
  def metricNames: Map[String, String] = {
    refreshIfStale()
    metricsCatalog.map(_.select("metric_id", "name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap)
      .getOrElse(Map.empty)
  }

  // @volatile immutable snapshot: the daemon flush threads read rules
  // through createMetric -> rulePolicy while the HTTP thread mutates.
  // Rules are NAMED entities (name, metric_pattern, archive_policy):
  // the REST routes key on the name, matching keys on the pattern
  // (rest/api.py ArchivePolicyRulesController).
  @volatile private var policyRules = Vector.empty[(String, String, String)]

  /** R9 archive-policy rules (indexer/__init__.py:460-466): glob
    * pattern → policy; metric creation without an explicit policy takes
    * the LONGEST matching pattern. The rule NAME is unique
    * (indexer ArchivePolicyRuleAlreadyExists).
    */
  def createPolicyRule(name: String, pattern: String,
                       policyName: String): Unit = {
    // rule bodies naming an unknown policy → 400 (rest/api.py
    // ArchivePolicyRulesController.post aborts 400 on
    // NoSuchArchivePolicy)
    GraftError.valid(policies.contains(policyName),
      s"Archive policy $policyName does not exist")
    flushDirtyFrames()
    stagingLock.synchronized {
      // 409, not 400: ArchivePolicyRuleAlreadyExists aborts 409
      // (rest/api.py:403-404) — and Conflict is what journal replay
      // skips under at-least-once duplication
      GraftError.fresh(!policyRules.exists(_._1 == name),
        s"Archive policy rule $name already exists.")
      policyRules :+= ((name, pattern, policyName))
      journalOrRollback(jevt("rule_create",
        "name" -> org.json4s.JString(name),
        "pattern" -> org.json4s.JString(pattern),
        "policy" -> org.json4s.JString(policyName))) {
        policyRules = policyRules.filterNot(_._1 == name)
      }
    }
  }

  /** Name-defaults-to-pattern shorthand (facade callers). */
  def createPolicyRule(pattern: String, policyName: String): Unit =
    createPolicyRule(pattern, pattern, policyName)

  /** PATCH /v1/archive_policy_rule/<name>: rename
    * (rest/api.py ArchivePolicyRuleController.patch — name is the only
    * mutable field; a taken target name is a client error).
    */
  def renamePolicyRule(name: String, newName: String): Unit = {
    flushDirtyFrames()
    stagingLock.synchronized {
      val i = policyRules.indexWhere(_._1 == name)
      GraftError.found(i >= 0, s"no archive policy rule $name")
      require(!policyRules.exists(_._1 == newName),
        s"Archive policy rule $newName already exists.")
      val old = policyRules(i)
      policyRules = policyRules.updated(i, old.copy(_1 = newName))
      journalOrRollback(jevt("rule_rename",
        "name" -> org.json4s.JString(name),
        "new_name" -> org.json4s.JString(newName))) {
        policyRules = policyRules.updated(i, old)
      }
    }
  }

  /** Longest-matching-rule policy for a metric name
    * (indexer/__init__.py:460-466). */
  private def rulePolicy(metricName: String): String = policyRules
    .filter { case (_, p, _) => graft.catalog.Fnmatch.matches(p, metricName) }
    .sortBy { case (_, p, _) => (-p.length, p) }
    // no matching rule is a 400 on every creation door (the
    // MetricSchema classmethod aborts 400, rest/api.py:608-616)
    .headOption.map(_._3).getOrElse(GraftError.badInput(
      "No archive policy name specified and no archive policy rule " +
        s"found matching the metric name $metricName"))

  /** Create a metric letting the rules pick the policy. */
  def createMetric(id: String): Unit = createMetric(id, rulePolicy(id))

  /** Rules-picked policy with an explicit unit. */
  def createMetricRuled(id: String, unit: Option[String]): Unit =
    createMetric(id, rulePolicy(id), unit)

  def hasMetric(id: String): Boolean = metricPolicy.contains(id)

  /** GET /v1/archive_policy — all policies, name-sorted. */
  def listPolicies: Seq[ArchivePolicy] = {
    refreshIfStale()
    policies.values.toSeq.sortBy(_.name)
  }

  /** DELETE /v1/archive_policy/<name>: refuses while any metric still
    * uses the policy (indexer ArchivePolicyInUse → 400).
    */
  def deletePolicy(name: String): Unit = {
    flushDirtyFrames()
    catalogLock.synchronized {
      GraftError.found(policies.contains(name), s"no policy $name")
      require(!metricPolicy.values.exists(_ == name),
        s"archive policy $name is still in use")
      val removed = policies.remove(name)
      journalOrRollback(
        jevt("policy_delete", "name" -> org.json4s.JString(name))) {
        removed.foreach(policies(name) = _)
      }
    }
  }

  /** GET /v1/archive_policy_rule — (name, pattern, policy) rules in
    * match-precedence order (longest pattern first, the order
    * [[rulePolicy]] applies them).
    */
  def listPolicyRules: Seq[(String, String, String)] = {
    refreshIfStale()
    policyRules.toSeq.sortBy { case (_, p, _) => (-p.length, p) }
  }

  def deletePolicyRule(name: String): Unit = {
    flushDirtyFrames()
    stagingLock.synchronized {
      val i = policyRules.indexWhere(_._1 == name)
      GraftError.found(i >= 0, s"no archive policy rule $name")
      val old = policyRules(i)
      policyRules = policyRules.patch(i, Nil, 1)
      journalOrRollback(
        jevt("rule_delete", "name" -> org.json4s.JString(name))) {
        policyRules = policyRules.patch(i, Seq(old), 0)
      }
    }
  }

  /** GET /v1/metric — the registered metrics as (id, policy name),
    * id-sorted (driver-local by the bounded-metric-set assumption the
    * catalog maps already make).
    */
  def listMetrics: Seq[(String, String)] = {
    refreshIfStale()
    metricPolicy.toSeq.sortBy(_._1)
  }

  def metricPolicyName(id: String): String = metricPolicy.getOrElse(id,
    GraftError.notFound(s"unknown metric $id"))

  /** R8 delete-by-query (sqlalchemy.py:1034-1066): drop resources
    * matching the filter, returning the count.
    */
  def deleteResources(filterStr: String): Long =
    deleteResources(FilterParser.parse(filterStr))

  def deleteResources(f: Filter): Long = catalogLock.synchronized {
    flushDirtyFrames()
    // SQL DELETE semantics: only rows where the predicate is TRUE are
    // deleted. A bare `!pred` would also drop NULL-predicate rows
    // (null attributes) silently and uncounted — three-valued logic.
    val pred = coalesce(Filter.compile(f), lit(false))
    val current = resources.getOrElse(
      return 0L)
    val n = current.filter(pred).count()
    resources = Some(current.filter(!pred))
    noteCatalogMutation()
    journal(jevt("res_delete",
      "filter" -> graft.catalog.CatalogJson.filterToJson(f)))
    n
  }

  private def storeOf(policyName: String): MetricStore =
    stagingLock.synchronized {
      stores.getOrElseUpdate(policyName,
        new MetricStore(spark, s"$root/$policyName", policies(policyName)))
    }

  /** POST …/measures — enqueue, return immediately (rest/api.py:488-494).
    * This Seq door models a small REST body; for corpus-sized ingestion
    * use the DataFrame overloads below — routing bulk data through a
    * driver-side Seq ships the corpus through the driver at scale.
    */
  def addMeasures(metricId: String, points: Seq[(String, Double)]): Unit = {
    GraftError.found(metricPolicy.contains(metricId), s"unknown metric $metricId")
    val rows = points.map { case (t, v) =>
      (metricId, java.sql.Timestamp.valueOf(t), v)
    }
    stagingLock.synchronized { pending ++= rows }
  }

  /** Bulk ingestion door: stage a `(metric_id, timestamp, value)` frame
    * for one metric. Distributed end to end — the measures never touch
    * the driver (the batch-POST analogue of the reference's metricd
    * sack write, incoming/__init__.py:202-214).
    */
  def addMeasures(metricId: String, batch: DataFrame): Unit = {
    GraftError.found(metricPolicy.contains(metricId), s"unknown metric $metricId")
    batchAddMeasures(batch.select(lit(metricId).as("metric_id"),
      col("timestamp"), col("value")))
  }

  /** Bulk multi-metric ingestion: stage a `(metric_id, timestamp,
    * value)` frame. Rows targeting unknown metrics are dropped when the
    * frame meets the catalog at process() (the reference 400s them at
    * POST; a distributed pre-check here would cost a job per batch).
    */
  def batchAddMeasures(batch: DataFrame): Unit = {
    val b = batch.select(col("metric_id").cast("string"),
      col("timestamp").cast("timestamp"), col("value").cast("double"))
    stagingLock.synchronized {
      pendingBulk += b
    }
  }

  /** POST /v1/batch/resources/metrics/measures?create_metrics=
    * (rest/api.py:1726-1848): body maps resource id → metric NAME →
    * measures, where measures is either a bare array or
    * `{archive_policy_name, unit, measures}`. Unknown (resource, name)
    * pairs reject with the 400 list unless `createMetrics`, which
    * creates them — explicit policy if given, else the R9 rules — and
    * registers the named metric in the catalog.
    */
  /** Batch-by-resource JSON door (rest/api.py:1726-1879). Divergence
    * from the reference: body resource keys are matched VERBATIM
    * against the metrics catalog (no ResourceUUID re-salting) — this
    * facade's catalogs key externally-registered raw ids, and
    * reference-shaped clients send UUID keys, which the transformation
    * passes through unchanged anyway.
    */
  def batchAddMeasures(json: String, createMetrics: Boolean = false,
                       nowMs: Long = System.currentTimeMillis()): Unit = {
    flushDirtyFrames()
    import org.json4s._
    // JsonCodec, not the stock json4s mapper: a batch body carrying a
    // bare NaN measure literal must ingest, same as the single door
    val body = JsonCodec.parse(json) match {
      case JObject(fields) => fields
      case other => throw new IllegalArgumentException(s"bad batch body: $other")
    }
    // Plan-time metric listing, as the reference's list_metrics call —
    // which is FILTERED to the body's resources (rest/api.py:1758-1773
    // builds the attribute_filter from the body keys). The body is
    // REST-page bounded, so the collect is O(body), not O(fleet
    // catalog).
    val bodyRids: Seq[String] = body.map(_._1).distinct
    val known: Map[(String, String), String] = metricsCatalog.map(
        _.filter(col("resource_id").isin(bodyRids: _*))
          .select("resource_id", "name", "metric_id").collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap)
      .getOrElse(Map.empty)
    // The timestamp FORMAT is fixed per measure LIST by its first
    // element, mixing is the 400, relative stamps anchor on ONE now
    // per request — the shared door contract lives in
    // [[graft.ingest.MeasureList]].
    import graft.ingest.MeasureList
    def numOf(v: JValue): Double = MeasureList.numOf(v)
    // PHASE 1 — parse and validate the WHOLE body with no state
    // mutation: a failure on a later entry must not leave earlier
    // metrics created but unregistered (non-atomic 400s)
    val unknown = mutable.ArrayBuffer[(String, String)]()
    val toCreate = mutable.ArrayBuffer[(String, String, String, String)]()
    val staged = mutable.ArrayBuffer[(String, java.sql.Timestamp, Double)]()
    for ((rid, entry) <- body) entry match {
      case JObject(metrics) => for ((name, payload) <- metrics) {
        val (polOpt, measures) = payload match {
          case JArray(ms) => (None, ms)
          case o: JObject =>
            val pol = o \ "archive_policy_name" match {
              case JString(p) => Some(p); case _ => None
            }
            val ms = o \ "measures" match { case JArray(a) => a; case _ => Nil }
            (pol, ms)
          case other =>
            throw new IllegalArgumentException(s"bad measures for $name: $other")
        }
        val metricId = known.get((rid, name)) match {
          case Some(id) => Some(id)
          case None if createMetrics =>
            val id = s"$rid/$name"
            val pol = polOpt.getOrElse(rulePolicy(name)) // throws: no rule
            GraftError.valid(policies.contains(pol),
              s"Archive policy $pol does not exist")
            GraftError.fresh(!hasMetric(id) && !toCreate.exists(_._1 == id),
              s"metric $id already exists")
            toCreate += ((id, rid, name, pol))
            Some(id)
          case None => unknown += ((rid, name)); None
        }
        val listMode = MeasureList.modeOf(measures.headOption
          .map(m => m \ "timestamp").getOrElse(JNothing))
        for (id <- metricId; m <- measures) m match {
          case JObject(f) =>
            val fm = f.toMap
            // a measure missing either key is malformed INPUT (400), not
            // a bare map miss (NoSuchElementException maps to 404)
            val ts = fm.getOrElse("timestamp",
              GraftError.badInput(s"measure for $id is missing 'timestamp'"))
            val v = fm.getOrElse("value",
              GraftError.badInput(s"measure for $id is missing 'value'"))
            staged += ((id, MeasureList.tsOf(ts, listMode, nowMs), numOf(v)))
          case other => throw new IllegalArgumentException(s"bad measure: $other")
        }
      }
      case other => // the reference 400s a non-object resource entry
        throw new IllegalArgumentException(s"bad resource entry $rid: $other")
    }
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      "Unknown metrics: " + unknown.map { case (r, n) => s"$r/$n" }
        .sorted.mkString(", "))
    // PHASE 2 — everything validated: mutate
    toCreate.foreach { case (id, _, _, pol) => createMetric(id, pol) }
    if (toCreate.nonEmpty) {
      import spark.implicits._
      val rows = toCreate.toSeq.map { case (id, rid, name, _) =>
        (id, rid, name) }.toDF("metric_id", "resource_id", "name")
      catalogLock.synchronized {
        metricsCatalog = Some(metricsCatalog
          .map(_.unionByName(rows, allowMissingColumns = true)).getOrElse(rows))
        noteCatalogMutation()
        journal(jevt("metric_attach", "rows" -> org.json4s.JArray(
          toCreate.toList.map { case (id, rid, name, _) =>
            org.json4s.JArray(List(org.json4s.JString(id),
              org.json4s.JString(rid), org.json4s.JString(name))) })))
      }
    }
    stagingLock.synchronized { pending ++= staged }
  }

  private val lastMeasure =
    scala.collection.concurrent.TrieMap[String, java.sql.Timestamp]()

  /** Metric metadata: when the metric last received measures
    * (`update_last_measure_timestamp`, storage/__init__.py:702). */
  def lastMeasureTimestamp(metricId: String): Option[java.sql.Timestamp] =
    lastMeasure.get(metricId)

  /** Drain the staging buffer through the incremental job — the metricd
    * pass (chef.py:383-424). `refresh(metric)` is the inline
    * read-your-writes variant (rest/api.py:539-547). Ingest also
    * advances `last_measure_timestamp` and resurrects ended resources
    * whose metrics received current measures
    * (storage/__init__.py:694-725).
    */
  def process(): Unit = {
    import spark.implicits._
    // snapshot+clear the staging plane atomically; the Spark work below
    // runs on the snapshot, outside the lock
    val (seqRows, bulkPart) = stagingLock.synchronized {
      if (pending.isEmpty && pendingBulk.isEmpty) return
      val sr = pending.toList
      pending.clear()
      val bp = pendingDf
      pendingBulk.clear()
      (sr, bp)
    }
    // a failed drain must NOT lose 202-accepted measures: re-stage the
    // snapshot and rethrow (store ingest is new-wins idempotent, so a
    // partially-written batch re-ingests harmlessly on retry)
    try processDrained(seqRows, bulkPart)
    catch {
      case e: Throwable =>
        stagingLock.synchronized {
          pending.prependAll(seqRows)
          bulkPart.foreach(pendingBulk.prepend(_))
        }
        throw e
    }
  }

  private def processDrained(
      seqRows: List[(String, java.sql.Timestamp, Double)],
      bulkPart: Option[DataFrame]): Unit = {
    import spark.implicits._
    val seqPart =
      if (seqRows.isEmpty) None
      else Some(seqRows.toDF("metric_id", "timestamp", "value"))
    val hadBulk = bulkPart.isDefined
    val batch = (seqPart.toSeq ++ bulkPart.toSeq).reduce(_ unionByName _)
    // the metric→policy map is driver-sized (catalog rows): broadcast,
    // never shuffle the measures on it; bulk rows targeting unknown
    // metrics drop here (the reference 400s them at POST — a
    // distributed pre-check would cost an extra job per batch)
    val byPolicy = batch.join(
      broadcast(metricPolicy.toSeq.toDF("metric_id", "policy")),
      Seq("metric_id"))
    // bulk plans are corpus-sized: pin the joined frame once instead of
    // re-reading the source per policy partition of the loop below
    if (hadBulk) byPolicy.persist()
    // Which policies does the batch actually touch? ONE tiny aggregate
    // over the (pinned) frame instead of one isEmpty probe per
    // REGISTERED policy: the facade seeds 4 default policies, so every
    // drain paid ~4 empty-probe Spark jobs before any real ingest.
    // The distinct is exact, so the set of stores receiving addMeasures
    // is identical; iteration order is irrelevant (stores are disjoint
    // per policy) but kept sorted for determinism.
    val present = byPolicy.select("policy").distinct()
      .collect().map(_.getString(0)).toSet
    policies.keys.toSeq.sorted.filter(present).foreach { pol =>
      storeOf(pol).addMeasures(
        byPolicy.filter(col("policy") === pol).drop("policy"))
    }
    // Metadata updates: last-measure timestamps + resource
    // resurrection. Resurrection stays a DISTRIBUTED join end to end —
    // the per-metric maxima never round-trip through the driver on its
    // account. The `lastMeasure` point-lookup cache is the only
    // driver-side consumer, and it collects ONLY below the same
    // touched-metric threshold as the store's ingest metadata
    // (spark.graft.ingest.maxDriverMetrics): a 10 M-metric fleet batch
    // would otherwise pin ~600 MB of map entries on the driver for a
    // cache whose reference analogue lives in the indexer DB. Above
    // the threshold the cache simply isn't advanced for this batch
    // (lastMeasureTimestamp returns None = not tracked).
    val maximaDf = byPolicy
      .groupBy("metric_id").agg(max(col("timestamp")).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxDriverMetrics = spark.conf
      .get("spark.graft.ingest.maxDriverMetrics", "100000").toLong
    // one action, not count()+collect(): fetch up to the threshold+1
    // rows — over it means a fleet-cardinality batch (cache skipped,
    // rows discarded), at or under it the rows are the update itself
    val overLimit = math.min(maxDriverMetrics, Int.MaxValue - 1L).toInt + 1
    val maximaHead = maximaDf.limit(overLimit).collect()
    if (maximaHead.length <= maxDriverMetrics)
      maximaHead.foreach { r =>
        val (m, t) = (r.getString(0), r.getTimestamp(1))
        if (lastMeasure.get(m).forall(_.getTime < t.getTime)) lastMeasure(m) = t
      }
    // resurrection needs lifecycle columns; typed tables without them
    // (no end-dating in play) have nothing to un-end-date
    for (res <- resources if res.columns.contains("ended_at");
         mets <- metricsCatalog) {
      val activity = maximaDf
        .select(col("metric_id"), unix_timestamp(col("t")).as("last_ts_s"))
        .join(mets.select("metric_id", "resource_id"), Seq("metric_id"))
        .groupBy(col("resource_id"))
        .agg(max(col("last_ts_s")).as("last_ts_s"))
      // materialize eagerly: the catalog (driver-bounded metadata)
      // must not keep a lazy reference to this batch's frames past the
      // unpersists below — same localCheckpoint the periodic catalog
      // compaction already uses. Re-read `resources` INSIDE the lock:
      // the `res` binding above predates it, and a concurrent PATCH in
      // between would be silently overwritten.
      catalogLock.synchronized {
        resources = resources.map(r =>
          graft.catalog.Maintenance.resurrect(r, activity)
            .localCheckpoint(true))
        // resurrection is derived from the (already durable) measure
        // plane, not replayable from an event — dirty-mark so the next
        // snapshot point captures it
        framesDirty = true
      }
      noteCatalogMutation()
    }
    maximaDf.unpersist()
    if (hadBulk) byPolicy.unpersist()
  }

  def refresh(metricId: String): Unit = {
    import spark.implicits._
    val (seqMine, dfMine) = stagingLock.synchronized {
      val sm = pending.filter(_._1 == metricId).toSeq
      val dm = pendingDf.map(_.filter(col("metric_id") === metricId))
      if (sm.isEmpty && dm.isEmpty) return
      pending.filterInPlace(_._1 != metricId)
      pendingBulk.mapInPlace(_.filter(col("metric_id") =!= metricId))
      (sm, dm)
    }
    val parts =
      (if (seqMine.nonEmpty)
        Seq(seqMine.toSeq.toDF("metric_id", "timestamp", "value"))
      else Nil) ++ dfMine.toSeq
    val batch = parts.reduce(_ unionByName _)
    try if (!batch.isEmpty) storeOf(metricPolicy(metricId)).addMeasures(batch)
    catch { // same drain-durability contract as process()
      case e: Throwable =>
        stagingLock.synchronized {
          pending.prependAll(seqMine)
          dfMine.foreach(pendingBulk.prepend(_))
        }
        throw e
    }
  }

  /** GET /v1/metric/<id>/measures (§3.1): triples coarse→fine across all
    * (or one) granularity.
    */
  def getMeasures(
      metricId: String, method: String = "mean",
      granS: Option[Long] = None,
      from: Option[String] = None, to: Option[String] = None,
      resample: Option[Granularity] = None,
      refreshFirst: Boolean = false): Seq[(java.sql.Timestamp, Long, Double)] = {
    refreshIfStale()
    if (refreshFirst) refresh(metricId)
    // a method the policy never stored is the reference's 404
    // ("Aggregation method X does not exist for this metric",
    // rest/api.py:508-515), not an empty 200
    requireMethod(metricId, method)
    // resampling without a source granularity is ambiguous — the
    // reference 400s (rest/api.py measures GET;
    // gabbits/metric.yaml "resample no granularity")
    GraftError.valid(resample.isEmpty || granS.isDefined,
      "A granularity must be specified to resample")
    val pol = policies(metricPolicy(metricId))
    val polGrans = pol.definition.map(_.granularity).collect {
      case Granularity.Fixed(ns) => ns / 1_000_000_000L
    }.sorted.reverse // coarse first (rest/api.py:510-517)
    // a granularity the policy never stored is the reference's
    // GranularityDoesNotExist → 404 (rest/api.py:517-521;
    // gabbits/metric-granularity.yaml "invalid granularity"), not an
    // empty 200
    for (g <- granS if !polGrans.contains(g))
      GraftError.notFound(
        s"Granularity '$g' for metric $metricId does not exist")
    val grans = granS.map(Seq(_)).getOrElse(polGrans)
    grans.flatMap { g =>
      storeOf(pol.name)
        .getMeasures(metricId, method, g,
          from.map(java.sql.Timestamp.valueOf),
          to.map(java.sql.Timestamp.valueOf), resample)
        .orderBy("bucket").collect()
        .map(r => (r.getTimestamp(1), g, r.getDouble(2)))
    }
  }

  /** P1 granularity planning (processor.py:89-132): granularities
    * common to every referenced metric's policy, coarse first; empty
    * intersection is the reference's `UnAggregableTimeseries('No
    * granularity match')`.
    */
  def commonGranularities(metricIds: Seq[String]): Seq[Long] = {
    val granSets = metricIds.map { m =>
      policies(metricPolicy(m)).definition.map(_.granularity).collect {
        case Granularity.Fixed(ns) => ns / 1_000_000_000L
      }.toSet
    }
    val common = granSets.reduceOption(_ intersect _).getOrElse(Set.empty)
    if (common.isEmpty)
      throw new IllegalArgumentException("No granularity match")
    common.toSeq.sorted.reverse
  }

  private def requireMethod(metricId: String, method: String): Unit = {
    val pol = policies(metricPolicy(metricId))
    // 404, not 400: the reference aborts 404 on AggregationDoesNotExist
    // everywhere — the aggregates door ("Metrics with unknown
    // aggregation", rest/aggregates/api.py:186-188, 605) and the legacy
    // door (rest/api.py:2102-2112) alike
    if (!pol.aggregationMethods.contains(method))
      GraftError.notFound(
        s"Aggregation method '$method' for metric $metricId does not exist")
  }

  /** [[requireMethod]] plus the granularity-exists check: a (method,
    * granularity) pair the metric's policy never stored is the
    * reference's AggregationDoesNotExist 404 on every cross-metric door
    * (`archive_policy.get_aggregation` returning None —
    * rest/api.py:2063-2068, rest/aggregates/api.py:603-607,
    * gabbits/aggregation.yaml "non existing granularity",
    * gnocchi issue #148) — not an empty 200 from a bucket-less scan.
    */
  private def requireAgg(metricId: String, method: String,
                         granS: Long): Unit = {
    requireMethod(metricId, method)
    val pol = policies(metricPolicy(metricId))
    val ok = pol.definition.map(_.granularity).exists {
      case Granularity.Fixed(ns) => ns / 1_000_000_000L == granS
      case _ => false
    }
    if (!ok) GraftError.notFound(
      s"Aggregation method '$method' at granularity '${granS.toDouble}' " +
        s"for metric $metricId does not exist")
  }

  /** POST /v1/aggregates with plan-time granularity resolution: no
    * `granS` → evaluate at every common granularity, coarse→fine,
    * concatenated with a `gran_s` column (processor.py:229-272 output
    * shaping).
    */
  def aggregatesAuto(operations: String,
                     fill: Option[String] = None,
                     from: Option[java.sql.Timestamp] = None,
                     to: Option[java.sql.Timestamp] = None): DataFrame = {
    refreshIfStale()
    val refs = collectRefs(Parser.parse(operations))
    commonGranularities(refs.map(_._1).distinct)
      .map(g => aggregates(operations, g, fill, from = from, to = to)
        .withColumn("gran_s", lit(g)))
      .reduce(_ unionByName _)
  }

  /** POST /v1/aggregates (§3.2): the cross-metric expression DSL over
    * referenced metrics at one granularity.
    *
    * P5 contract (processor.py:200-220): when `neededOverlap` is given
    * and no fill is set, the grid is trimmed to its overlapping span
    * (from/to are unset in this facade) and the overlap fraction must
    * reach the threshold or the query errors (`UnAggregableTimeseries`
    * in the reference). The REST layer defaulted `fill="dropna"` when
    * neither was given (rest/aggregates/api.py:522-523); here fill
    * stays explicit so NaN-skipping evaluation remains reachable.
    */
  def aggregates(operations: String, granS: Long,
                 fill: Option[String] = None,
                 neededOverlap: Option[Double] = None,
                 from: Option[java.sql.Timestamp] = None,
                 to: Option[java.sql.Timestamp] = None): DataFrame = {
    refreshIfStale()
    val out = aggregatesGrid(operations, granS, fill, neededOverlap, from, to)
    // Output-stage drop (processor.py:237-244, 257-262): for
    // dropna/ffill/bfill/full_*, positions where the series value is
    // NaN or ±inf (residual leading gaps after ffill, division blowups)
    // are dropped from the emitted measures. Exact per-series semantics
    // for the single-series result; a multi-series wide frame drops
    // only all-empty rows here (per-series drop lives in the
    // [[aggregatesRefs]] fan-out, where each reference is its own rows).
    outputDrop(out.df, out.cols, fill)
  }

  /** The evaluated grid behind [[aggregates]], before output-stage
    * dropping — wide frame keyed by `bucket` with one `metric/method`
    * column per reference.
    */
  private def aggregatesGrid(operations: String, granS: Long,
                 fill: Option[String] = None,
                 neededOverlap: Option[Double] = None,
                 from: Option[java.sql.Timestamp] = None,
                 to: Option[java.sql.Timestamp] = None): graft.ops.Grid =
    aggregatesGridAst(Parser.parse(operations), granS, fill, neededOverlap,
      from, to)

  private def aggregatesGridAst(ast: graft.ops.Node, granS: Long,
                 fill: Option[String],
                 neededOverlap: Option[Double],
                 from: Option[java.sql.Timestamp],
                 to: Option[java.sql.Timestamp]): graft.ops.Grid = {
    val refs = collectRefs(ast)
    refs.foreach { case (m, a) => requireAgg(m, a, granS) }
    val effFill = fill
    // P2: one pruned scan per policy store with IN predicates, not a
    // read per referenced series (processor.py:134-137); start/stop
    // prune split partitions at the scan
    val long = refs.groupBy { case (m, _) => metricPolicy(m) }.map {
      case (pol, polRefs) =>
        storeOf(pol).getMeasuresMany(polRefs.map(_._1).distinct,
            polRefs.map(_._2).distinct, granS, from, to)
          .join(broadcast {
            import spark.implicits._
            polRefs.toDF("metric_id", "method")
          }, Seq("metric_id", "method"))
          .select(concat(col("metric_id"), lit("/"), col("method")).as("ref"),
            col("bucket"), col("value"))
    }.reduce(_ unionByName _)
    // X10 grid sanity (operations.py:303-328): buckets must sit on the
    // requested granularity before any operator runs
    val grid = Compiler.sanityCheck(
      Compiler.align(long, refs.map { case (m, a) => Compiler.refName(m, a) }),
      granS * 1_000_000_000L)
    val checked = neededOverlap match {
      case Some(need) if effFill.isEmpty =>
        // per-EDGE trim (processor.py:206-212): head trims only when
        // `from` is unset, tail only when `to` is unset — a caller
        // bounding one side keeps the other side's non-overlapping rows
        // out of the percent denominator via the trim, not the bound
        val (trimmed, pct) = Compiler.overlapPercent(grid,
          trimHead = from.isEmpty, trimTail = to.isEmpty)
        if (pct < need) throw new IllegalArgumentException(
          f"Unable to aggregate: overlap $pct%.1f%% < needed $need%.1f%%")
        trimmed
      case _ => grid
    }
    val filled = effFill match {
      // "dropna" does NOT touch the grid (processor.py:173-175: its
      // grid filler is NaN, same as null/None) — evaluation stays
      // NaN-skipping over partial buckets; the dropping happens at
      // OUTPUT, per series. A grid-level row filter here would remove
      // a bucket from EVERY series whenever ANY series misses it,
      // changing aggregate-across/rolling results on unaligned series.
      case Some("dropna") | Some("null") => checked
      case Some(f) => checked.copy(df =
        graft.timeseries.TimeSeriesOps.fill(checked.df, checked.cols, f,
          partitionCols = checked.partCols))
      case None => checked
    }
    // a non-elementwise series⊕series self-joins the grid: share the
    // built grid rather than re-running the scans per join side
    val shared =
      if (Compiler.hasGridJoin(ast))
        // OpCaches: auto-released after the consuming action — a bare
        // persist() would pin one cache entry per REST /v1/aggregates
        // call for the session's lifetime
        filled.copy(df = graft.llm.OpCaches.persist(filled.df))
      else filled
    Compiler.eval(ast, shared)
  }

  /** Whether `/v1/aggregates` output is the single "aggregated" list
    * or the per-reference fan-out (processor.py:229-272) — see
    * [[Compiler.isAggregated]].
    */
  def aggregatesIsAggregated(operations: String): Boolean =
    Compiler.isAggregated(Parser.parse(operations))

  /** Per-reference output of `/v1/aggregates` for NON-aggregated
    * operations trees (processor.py:246-272 m_output): the wide grid
    * fans out to `(metric_id, method, bucket, value)` rows — one set
    * per metric reference, each carrying the leaf's aggregation name.
    * Per-series drop semantics (processor.py:257-262): for
    * dropna/ffill/bfill/full_* fills, NaN/±inf positions drop PER
    * SERIES (a residual leading gap in one metric doesn't cost the
    * other its bucket); absent grid cells (null) never emit — triples
    * carry present points only, as the single-series door. The fan-out
    * is a narrow explode over the already-evaluated grid: no extra
    * scan, shuffle, or join at any scale.
    */
  def aggregatesRefs(operations: String, granS: Long,
                     fill: Option[String] = None,
                     neededOverlap: Option[Double] = None,
                     from: Option[java.sql.Timestamp] = None,
                     to: Option[java.sql.Timestamp] = None): DataFrame =
    refsFanOut(
      aggregatesGrid(operations, granS, fill, neededOverlap, from, to), fill)

  private def refsFanOut(out: graft.ops.Grid,
                         fill: Option[String]): DataFrame = {
    val pairs = out.cols.map(c =>
      struct(lit(c).as("ref"), col(c).cast("double").as("value")))
    val long = out.df
      .select((out.partCols.map(col) ++ Seq(col("bucket"),
        explode(array(pairs: _*)).as("__s"))): _*)
      // refName is `$metric/$method` and metric ids may themselves
      // contain '/' (batch-created `resource/name` metrics) — the
      // method is the LAST segment, the metric id everything before it
      .select((out.partCols.map(col) ++ Seq(
        regexp_extract(col("__s.ref"), "^(.*)/([^/]*)$", 1).as("metric_id"),
        regexp_extract(col("__s.ref"), "^(.*)/([^/]*)$", 2).as("method"),
        col("bucket"), col("__s.value").as("value"))): _*)
    val present = long.filter(col("value").isNotNull)
    if (fill.exists(OutputDropFills))
      present.filter(!isnan(col("value")) &&
        abs(col("value")) =!= lit(Double.PositiveInfinity))
    else present
  }

  /** Search-scoped, non-grouped `/v1/aggregates`
    * (rest/aggregates/api.py:562-569 → `_get_measures_by_name`,
    * api.py:684-710): metric leaves are NAME WILDCARDS, fnmatched
    * against the metrics of every resource the filter matches; all
    * resolved (resource × metric) series evaluate on ONE grid (one
    * pruned multi-series scan per policy, same as the id form). The
    * long output `(resource_id, metric_name, method, bucket, value)`
    * is the REST door's per-resource fan-out
    * (processor.py:246-272 r_output) with the per-series NaN/inf drop;
    * wrap the tree in `aggregate` for the single collapsed series
    * (that form routes through the grouped door). No resolved metric
    * at all → NotFound, as the reference's NoSuchMetric
    * (api.py:697-701).
    */
  def aggregatesByResource(operations: String, granS: Long,
                           filterStr: String,
                           fill: Option[String] = None,
                           neededOverlap: Option[Double] = None,
                           from: Option[java.sql.Timestamp] = None,
                           to: Option[java.sql.Timestamp] = None): DataFrame = {
    import graft.ops._
    val ast0 = Parser.parse(operations)
    val wildcards = collectRefs(ast0)
    val res = searchResources(filterStr)
    val cat = metricsCatalog.getOrElse(sys.error("no metrics catalog"))
      .join(broadcast(res.select(col("id").as("resource_id"))),
        Seq("resource_id"))
    // resolved scope is catalog metadata — driver-bounded by contract
    // (rest/aggregates/api.py resolves the same list in the indexer)
    val resolved: Map[String, Seq[(String, String, String)]] =
      wildcards.map(_._1).distinct.map { pat =>
        pat -> cat
          .filter(col("name").rlike(graft.catalog.Fnmatch.regex(pat)))
          .select("metric_id", "resource_id", "name").collect().toSeq
          .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      }.toMap
    if (resolved.values.forall(_.isEmpty))
      throw new GraftError.NotFound(
        s"Metrics not found: ${wildcards.map(_._1).distinct.sorted.mkString(", ")}")
    // rewrite name-wildcard leaves to the resolved metric-ID leaves —
    // the compiler then treats each (resource × metric) as its own
    // series, exactly the reference's reference list
    def rewrite(n: Node): Node = n match {
      case MetricLeaf(rs) =>
        val expanded = rs.flatMap { case (pat, agg) =>
          resolved(pat).map { case (mid, _, _) => (mid, agg) } }.distinct
        // a leaf whose every wildcard resolved empty would reach the
        // compiler as a zero-series grid and die with an opaque shape
        // error — reject it here with the unresolved patterns instead
        if (expanded.isEmpty) throw new GraftError.NotFound(
          s"Metrics not found: ${rs.map(_._1).distinct.sorted.mkString(", ")}")
        MetricLeaf(expanded)
      case Bin(op, l, r)       => Bin(op, rewrite(l), rewrite(r))
      case Clip(s, lo, hi)     => Clip(rewrite(s), lo, hi)
      case Un(op, s)           => Un(op, rewrite(s))
      case RateOfChange(p, s)  => RateOfChange(p, rewrite(s))
      case AggAcross(a, s)     => AggAcross(a, rewrite(s))
      case Rolling(a, w, s)    => Rolling(a, w, rewrite(s))
      case Resample(a, g, s)   => Resample(a, g, rewrite(s))
      case other               => other
    }
    val long = refsFanOut(aggregatesGridAst(rewrite(ast0), granS, fill,
      neededOverlap, from, to), fill)
    // metric_id → (resource_id, metric name): broadcast metadata join,
    // no shuffle on the measure rows
    val naming = broadcast(cat.select(col("metric_id"),
      col("resource_id"), col("name").as("metric_name")))
    long.join(naming, Seq("metric_id"))
      .select(col("resource_id"), col("metric_name"), col("method"),
        col("bucket"), col("value"))
  }

  /** Common granularities of every metric the operations' name
    * wildcards resolve to within the filtered scope — the
    * no-granularity form of the search-scoped/grouped doors
    * (rest/aggregates/api.py passes granularity=None through to the
    * processor's P1 planning; gabbits/aggregates-with-resources.yaml
    * "batch get" cases return every common granularity coarse→fine).
    * No resolved metric at all → NotFound, as `_get_measures_by_name`.
    * Catalog metadata — driver-bounded by contract.
    */
  def commonGranularitiesByResource(operations: String,
                                    filterStr: String): Seq[Long] =
    commonGranularitiesScoped(operations, searchResources(filterStr))

  /** Per-GROUP granularity planning for the grouped aggregates door's
    * no-granularity form: the reference's get_measures_grouping calls
    * `_get_measures_by_name` PER GROUP (rest/aggregates/api.py:649-672),
    * so each group's common granularities come from ITS OWN resolved
    * metrics — heterogeneous archive policies across groups evaluate
    * each group at its own set (a single global intersection would omit
    * finer per-group granularities, or throw where the reference
    * succeeds). A group with no matched metric drops (the per-group
    * NoSuchMetric `pass`, api.py:671-672); a group whose metrics share
    * no granularity errors the WHOLE request ("No granularity match"
    * aborts 400 via get_measures_or_abort); no group resolving any
    * metric is the 404. Catalog metadata — driver-bounded by contract.
    * Returns (group attr tuple, coarse→fine granularities) pairs.
    */
  def commonGranularitiesByGroup(operations: String, filterStr: String,
      groupby: Seq[String]): Seq[(Seq[Any], Seq[Long])] = {
    val pats = collectRefs(Parser.parse(operations)).map(_._1).distinct
    GraftError.valid(pats.nonEmpty,
      "Operations must reference at least one metric")
    val res = searchResources(filterStr)
    val nameMatch = pats.map(p =>
      col("name").rlike(graft.catalog.Fnmatch.regex(p))).reduce(_ || _)
    val rows = metricsCatalog.getOrElse(sys.error("no metrics catalog"))
      .filter(nameMatch)
      .join(broadcast(res.select((col("id").as("resource_id") +:
        groupby.map(col)): _*).distinct()), Seq("resource_id"))
      .select((col("metric_id") +: groupby.map(col)): _*).distinct()
      .collect().toSeq
      .map(r => (groupby.map(a => r.getAs[Any](a)), r.getString(0)))
    if (rows.isEmpty) throw new GraftError.NotFound(
      s"Metrics not found: ${pats.sorted.mkString(", ")}")
    val byGroup = rows.groupBy(_._1)
    // same fan-out guard as the legacy door: per-group planning is the
    // reference's own per-group loop, but a high-cardinality groupby
    // must fail loudly instead of silently owning the driver
    val maxGroups = spark.conf
      .get("spark.graft.aggregation.maxGroups", "10000").toInt
    GraftError.valid(byGroup.size <= maxGroups,
      s"groupby resolves ${byGroup.size} groups, above the " +
        s"spark.graft.aggregation.maxGroups cap ($maxGroups) — group on " +
        "a lower-cardinality attribute or raise the cap")
    byGroup.toSeq.map { case (k, rs) =>
      k -> commonGranularities(rs.map(_._2).distinct)
    }
  }

  /** Per-RESOURCE granularity planning for the use_history grouped
    * door's no-granularity form: the Grouper evaluates each resource
    * revision slice through its own `_get_measures_by_name` call
    * (rest/aggregates/api.py:383-417), so common granularities resolve
    * per RESOURCE against the history-matched scope. Resources with no
    * matched metric drop (the per-slice NoSuchMetric `continue`).
    * Returns (resource id, coarse→fine granularities) pairs.
    */
  def commonGranularitiesPerResourceHistory(operations: String,
      filterStr: String): Seq[(String, Seq[Long])] = {
    val pats = collectRefs(Parser.parse(operations)).map(_._1).distinct
    GraftError.valid(pats.nonEmpty,
      "Operations must reference at least one metric")
    val pred = Filter.compile(FilterParser.parse(filterStr))
    val hist = resourceHistoryTbl.getOrElse(throw new IllegalStateException(
      "no resource history table — call setResourceHistory(df) first"))
      .filter(pred)
    val nameMatch = pats.map(p =>
      col("name").rlike(graft.catalog.Fnmatch.regex(p))).reduce(_ || _)
    val rows = metricsCatalog.getOrElse(sys.error("no metrics catalog"))
      .filter(nameMatch)
      .join(broadcast(hist.select(col("id").as("resource_id")).distinct()),
        Seq("resource_id"))
      .select("resource_id", "metric_id").distinct()
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    if (rows.isEmpty) throw new GraftError.NotFound(
      s"Metrics not found: ${pats.sorted.mkString(", ")}")
    rows.groupBy(_._1).toSeq.map { case (rid, rs) =>
      rid -> commonGranularities(rs.map(_._2).distinct)
    }
  }

  private def commonGranularitiesScoped(operations: String,
                                        res: DataFrame): Seq[Long] = {
    val pats = collectRefs(Parser.parse(operations)).map(_._1).distinct
    // a leaf-less tree (pure scalars) references no metric — clean 400,
    // not an empty-reduce crash
    GraftError.valid(pats.nonEmpty,
      "Operations must reference at least one metric")
    val cat = metricsCatalog.getOrElse(sys.error("no metrics catalog"))
      .join(broadcast(res.select(col("id").as("resource_id")).distinct()),
        Seq("resource_id"))
    val nameMatch = pats.map(p =>
      col("name").rlike(graft.catalog.Fnmatch.regex(p))).reduce(_ || _)
    val ids = cat.filter(nameMatch).select("metric_id").distinct()
      .collect().map(_.getString(0)).toSeq
    if (ids.isEmpty) throw new GraftError.NotFound(
      s"Metrics not found: ${pats.sorted.mkString(", ")}")
    commonGranularities(ids)
  }

  /** Every (resource_id, metric name, method) the operations' wildcards
    * resolve to within the filtered scope — the key universe of the
    * per-resource fan-out response: a resolved metric with NO measures
    * still appears with an empty list
    * (gabbits/aggregates-with-resources.yaml "batch get list" pins
    * `cpu.idle.mean: []`). Catalog metadata, driver-bounded.
    */
  def resolvedResourceMetricRefs(operations: String,
      filterStr: String): Seq[(String, String, String)] = {
    val refs = collectRefs(Parser.parse(operations))
    val res = searchResources(filterStr)
    val cat = metricsCatalog.getOrElse(sys.error("no metrics catalog"))
      .join(broadcast(res.select(col("id").as("resource_id"))),
        Seq("resource_id"))
    // ONE collect of the union-matched rows; per-pattern attribution is
    // a driver-side fnmatch over the (catalog-bounded) name list — not
    // one Spark job per reference
    val pats = refs.map(_._1).distinct
    if (pats.isEmpty) return Nil
    val nameMatch = pats.map(p =>
      col("name").rlike(graft.catalog.Fnmatch.regex(p))).reduce(_ || _)
    val rows = cat.filter(nameMatch)
      .select("resource_id", "name").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    refs.flatMap { case (pat, m) =>
      rows.collect { case (rid, name)
        if graft.catalog.Fnmatch.matches(pat, name) => (rid, name, m) }
    }.distinct
  }

  /** Resources matched by `filterStr` that own at least one metric
    * matching a leaf wildcard of `operations` — the resource set the
    * reference's `_get_measures_by_name` builds its `references`
    * response block from (rest/aggregates/api.py:684-710) — with the
    * requested attribute columns, independent of whether the resolved
    * series produced any output rows. Catalog metadata, driver-bounded
    * by contract. Returns `(attr values, resource_id)` pairs.
    */
  def resolvedResourceScope(operations: String, filterStr: String,
      attrs: Seq[String] = Nil): Seq[(Seq[Any], String)] =
    resolvedScopeOf(searchResources(filterStr),
      collectRefs(Parser.parse(operations)).map(_._1).distinct, attrs)

  /** As [[resolvedResourceScope]] but over the resource HISTORY table:
    * one entry per (attribute values, resource) across the resource's
    * matching attribute revisions — the Grouper's group membership
    * (rest/aggregates/api.py:325-353).
    */
  def resolvedResourceScopeHistory(operations: String, filterStr: String,
      attrs: Seq[String]): Seq[(Seq[Any], String)] = {
    val pred = Filter.compile(FilterParser.parse(filterStr))
    val hist = resourceHistoryTbl.getOrElse(throw new IllegalStateException(
      "no resource history table — call setResourceHistory(df) first"))
      .filter(pred)
    resolvedScopeOf(hist,
      collectRefs(Parser.parse(operations)).map(_._1).distinct, attrs)
  }

  private def resolvedScopeOf(res: DataFrame, pats: Seq[String],
      attrs: Seq[String]): Seq[(Seq[Any], String)] = {
    val cat = metricsCatalog.getOrElse(sys.error("no metrics catalog"))
    val nameMatch = pats.map(p =>
      col("name").rlike(graft.catalog.Fnmatch.regex(p))).reduce(_ || _)
    cat.filter(nameMatch)
      .join(broadcast(res.select((col("id").as("resource_id") +:
        attrs.map(col)): _*).distinct()), Seq("resource_id"))
      .select((col("resource_id") +: attrs.map(col)): _*).distinct()
      .collect().toSeq
      .map(r => (attrs.map(a => r.getAs[Any](a)), r.getAs[String]("resource_id")))
  }

  /** [[aggregatesRefs]] across every common granularity, coarse→fine
    * with a `gran_s` column — the no-granularity form of the
    * per-reference door (processor.py:246-272 iterates samplings in
    * reverse-sorted order).
    */
  def aggregatesRefsAuto(operations: String,
                         fill: Option[String] = None,
                         from: Option[java.sql.Timestamp] = None,
                         to: Option[java.sql.Timestamp] = None): DataFrame = {
    val refs = collectRefs(Parser.parse(operations))
    commonGranularities(refs.map(_._1).distinct)
      .map(g => aggregatesRefs(operations, g, fill, from = from, to = to)
        .withColumn("gran_s", lit(g)))
      .reduce(_ unionByName _)
  }

  /** Fill modes whose OUTPUT drops NaN/±inf positions per series
    * (processor.py:237-244).
    */
  private val OutputDropFills: Set[String] =
    Set("dropna", "ffill", "bfill", "full_ffill", "full_bfill")

  /** Output-stage measure drop (processor.py:237-244, 257-262): exact
    * per-series semantics for a single-series result; a multi-series
    * wide frame drops only all-empty rows (each series' own gaps drop
    * at serialization, where the frame fans out per reference).
    */
  private def outputDrop(df: DataFrame, valueCols: Seq[String],
                         fill: Option[String]): DataFrame =
    if (fill.exists(OutputDropFills)) {
      def absent(c: Column) =
        c.isNull || isnan(c) || abs(c) === lit(Double.PositiveInfinity)
      if (valueCols.sizeIs == 1) df.filter(!absent(col(valueCols.head)))
      else df.filter(!valueCols.map(c => absent(col(c))).reduce(_ && _))
    } else df

  private def collectRefs(n: graft.ops.Node): Seq[(String, String)] = n match {
    case graft.ops.MetricLeaf(refs) => refs
    case graft.ops.Bin(_, l, r) => (collectRefs(l) ++ collectRefs(r)).distinct
    case graft.ops.Clip(s, _, _) => collectRefs(s)
    case graft.ops.Un(_, s) => collectRefs(s)
    case graft.ops.RateOfChange(_, s) => collectRefs(s)
    case graft.ops.AggAcross(_, s) => collectRefs(s)
    case graft.ops.Rolling(_, _, s) => collectRefs(s)
    case graft.ops.Resample(_, _, s) => collectRefs(s)
    case _ => Nil
  }

  /** The metric references an operations expression resolves to —
    * the `details=true` references block of `/v1/aggregates`
    * (rest/aggregates/api.py:639-646). Unknown metrics 404, as the
    * reference's lookup with details=True does.
    */
  def aggregatesReferences(operations: String): Seq[(String, String)] = {
    val refs = collectRefs(Parser.parse(operations))
    refs.map(_._1).distinct.foreach(metricPolicyName) // NotFound on unknowns
    refs
  }

  /** J7 backlog report (/v1/status, incoming/__init__.py:202-214):
    * pending (staged, unprocessed) measure counts per metric.
    */
  def status(): Map[String, Long] = {
    refreshIfStale()
    val (seqSnap, dfSnap) = stagingLock.synchronized {
      (pending.toList, pendingDf)
    }
    val seqCounts: Map[String, Long] =
      seqSnap.groupBy(_._1).map { case (m, pts) => m -> pts.size.toLong }
    // bulk plane reduces distributed: one count aggregate, #metrics rows
    val dfCounts: Map[String, Long] = dfSnap.map(
        _.groupBy("metric_id").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap)
      .getOrElse(Map.empty)
    (seqCounts.keySet ++ dfCounts.keySet).map(k =>
      k -> (seqCounts.getOrElse(k, 0L) + dfCounts.getOrElse(k, 0L))).toMap
  }

  /** J4 metric delete + expunge (chef.py:297-345): drop the metric's
    * staged measures, stored aggregates, and raw buffer, then forget
    * the metric. The reference marks status='delete' and lets the
    * janitor expunge asynchronously; one synchronous call covers both
    * here — idempotent rewrites replace the janitor's locking.
    */
  def deleteMetric(metricId: String): Unit = {
    flushDirtyFrames()
    GraftError.found(metricPolicy.contains(metricId), s"unknown metric $metricId")
    stagingLock.synchronized {
      pending.filterInPlace(_._1 != metricId)
      pendingBulk.mapInPlace(_.filter(col("metric_id") =!= metricId))
    }
    storeOf(metricPolicy(metricId)).expungeMetric(metricId)
    metricPolicy.remove(metricId)
    metricUnit.remove(metricId)
    metricCreator.remove(metricId)
    dropFromMetricsCatalog(Seq(metricId))
    journal(jevt("metric_delete", "ids" -> org.json4s.JArray(
      List(org.json4s.JString(metricId)))))
  }

  /** Forget deleted metrics in the resource-attachment catalog — a
    * dangling row would keep listing the metric and crash later
    * glob-matched group-by aggregates on the missing policy entry. */
  private def dropFromMetricsCatalog(ids: Seq[String]): Unit =
    catalogLock.synchronized {
      for (cat <- metricsCatalog) {
        metricsCatalog = Some(cat.filter(!col("metric_id").isin(ids: _*)))
        noteCatalogMutation()
      }
    }

  /** Bulk deletion — the janitor batch (J4 at fleet scale,
    * cli/metricd.py:262-299): one partition-pruned store rewrite per
    * POLICY for the whole batch, not one per metric.
    */
  def deleteMetrics(metricIds: Seq[String]): Unit = {
    flushDirtyFrames()
    val unknown = metricIds.filterNot(metricPolicy.contains)
    GraftError.valid(unknown.isEmpty,
      s"unknown metrics: ${unknown.distinct.sorted.mkString(", ")}")
    val ids = metricIds.distinct
    if (ids.isEmpty) return
    stagingLock.synchronized {
      pending.filterInPlace(p => !ids.contains(p._1))
      pendingBulk.mapInPlace(_.filter(!col("metric_id").isin(ids: _*)))
    }
    ids.groupBy(metricPolicy).foreach { case (pol, group) =>
      storeOf(pol).expungeMetrics(group)
    }
    ids.foreach { id =>
      metricPolicy.remove(id); metricUnit.remove(id); metricCreator.remove(id)
    }
    dropFromMetricsCatalog(ids)
    journal(jevt("metric_delete", "ids" -> org.json4s.JArray(
      ids.toList.map(org.json4s.JString(_)))))
  }

  // ---- janitor maintenance doors (cli/metricd.py:262-299) -----------

  /** J3 across the store plane: drop splits older than each policy's
    * retention for every policy that currently stores metrics — the
    * MetricJanitor cleanup pass made callable. Calendar-only policies
    * have no store to expire.
    */
  def expireRetention(nowS: Long): Unit = {
    refreshIfStale()
    activeStorablePolicies.foreach(p => storeOf(p).expireRetention(nowS))
  }

  /** chef.py:186-243 clean_raw_data_inactive_metrics: re-truncate the
    * raw buffers of every active store so metrics that stopped
    * receiving measures still shed raw points after a back-window
    * shrink (ingest-time truncation only runs when measures arrive).
    * Idempotent — a buffer already inside its window rewrites to
    * itself, so the janitor can run it on every cycle.
    */
  def truncateRawAll(): Unit = {
    refreshIfStale()
    activeStorablePolicies.foreach(p => storeOf(p).truncateRaw())
  }

  private def activeStorablePolicies: Set[String] =
    metricPolicy.values.toSet.filter(p => policies(p).definition.exists(
      _.granularity.isInstanceOf[Granularity.Fixed]))

  /** J6 as the janitor runs it (cli/metricd.py:279-297):
    * `inactiveAfterS` end-dates resources whose EVERY metric has been
    * inactive longer than that (chef.py resource_ended_at_
    * normalization — activity is the facade's last-measure cache, the
    * reference's indexer last_measure_timestamp column);
    * `cleanupAfterS` then deletes resources whose `ended_at` is more
    * than that many seconds past (chef.py auto_clean_expired_
    * resources — routed through [[deleteResources]], so the deletion
    * journals and counts like any R8 delete). Either knob absent skips
    * its pass, as the reference's disabled-by-default options.
    * Returns the number of resources auto-cleaned.
    */
  def maintainResources(nowS: Long,
                        inactiveAfterS: Option[Long] = None,
                        cleanupAfterS: Option[Long] = None): Long = {
    refreshIfStale()
    import spark.implicits._
    for (inactiveS <- inactiveAfterS;
         res <- resources if res.columns.contains("ended_at");
         mets <- metricsCatalog) {
      val lm = lastMeasure.toSeq.map { case (m, t) => (m, t.getTime / 1000) }
      val activity = lm.toDF("metric_id", "last_ts_s")
        .join(mets.select("metric_id", "resource_id"), Seq("metric_id"))
        .groupBy(col("resource_id"))
        .agg(max(col("last_ts_s")).as("last_ts_s"))
      // same eager-materialize + re-read-inside-lock discipline as the
      // ingest resurrection pass above
      catalogLock.synchronized {
        resources = resources.map(r =>
          graft.catalog.Maintenance
            .endDateInactive(r, activity, nowS, inactiveS)
            .localCheckpoint(true))
        framesDirty = true
      }
      noteCatalogMutation()
    }
    (for (cleanupS <- cleanupAfterS;
          res <- resources if res.columns.contains("ended_at")) yield {
      val boundary = java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(nowS - cleanupS))
      // STRICTLY-older-than deletes, the autoClean boundary contract
      deleteResources(Filter.Cmp("<", "ended_at", boundary.toString))
    }).getOrElse(0L)
  }

  /** POST /v1/search/metric (S1). */
  def searchMetricValues(metricIds: Seq[String], method: String, granS: Long,
                         pred: MeasureSearch.Pred): DataFrame =
    searchMetricValuesMulti(metricIds, method, Some(Seq(granS)), pred)

  /** S1 over MULTIPLE granularities with a fetch window
    * (SearchMetricController.post, rest/api.py:1654-1705: repeated
    * ?granularity= params each search their own stored series; absent
    * granularity searches every granularity of each metric's policy;
    * a granularity the policy never stored is the reference's
    * storage.AggregationDoesNotExist → 400 at the REST layer). */
  def searchMetricValuesMulti(metricIds: Seq[String], method: String,
                              granS: Option[Seq[Long]],
                              pred: MeasureSearch.Pred,
                              from: Option[java.sql.Timestamp] = None,
                              to: Option[java.sql.Timestamp] = None)
      : DataFrame = {
    refreshIfStale()
    val frames = metricIds.flatMap { m =>
      val polGrans = policies(metricPolicy(m)).definition
        .map(_.granularity).collect {
          case graft.model.Granularity.Fixed(ns) => ns / 1_000_000_000L
        }
      val gs = granS.getOrElse(polGrans.sorted.reverse)
      gs.map { g =>
        GraftError.valid(polGrans.contains(g),
          s"Aggregation does not exist: granularity $g, method $method")
        storeOf(metricPolicy(m)).getMeasures(m, method, g, from, to)
      }
    }
    // the fold can be EMPTY: no metric ids, or a calendar-only policy
    // searched with no ?granularity (polGrans collects only Fixed —
    // calendar series have no wire representation in the reference's
    // float-seconds ?granularity param, so absent-granularity search
    // covers the fixed granularities and an all-calendar policy
    // yields none). reduce on Nil throws; serve the empty result
    // frame instead of an uncaught 500 at POST /v1/search/metric.
    frames.reduceOption(_ unionByName _)
      .getOrElse {
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("metric_id", StringType),
            StructField("bucket", TimestampType),
            StructField("value", DoubleType))))
      }
      .filter(MeasureSearch.compile(pred, col("value")))
  }

  /** Resource catalog: register a typed resource table + search with the
    * filter DSL (string grammar or tree).
    */
  def setResources(df: DataFrame): Unit = {
    resources = Some(df)
    // bulk frame registration is not replayable from a journal event —
    // mark dirty so the next journaled mutation (or explicit
    // persistCatalog) cuts a snapshot capturing it first
    framesDirty = true
  }

  /** The reference's BASE resource schema (ResourceSchema,
    * rest/api.py:1060-1066 + the Resource model): a fresh deployment
    * accepts generic resources carrying started_at / ended_at /
    * user_id / project_id out of the box — no frame-registration step
    * exists there. A fresh facade therefore bootstraps EMPTY
    * resources/history frames with the base columns on the first
    * resource-plane touch; setResources / setResourceHistory still
    * replace them for custom-attribute fixtures (async.yaml posts a
    * generic resource before anything else).
    */
  private val baseResourceSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", StringType),
      StructField("type", StringType),
      StructField("creator", StringType),
      StructField("original_resource_id", StringType),
      StructField("started_at", TimestampType),
      StructField("ended_at", TimestampType),
      StructField("user_id", StringType),
      StructField("project_id", StringType),
      StructField("revision_start", TimestampType)))
  }

  private def bootstrapResourcePlane(): Unit = {
    import org.apache.spark.sql.types._
    val base = baseResourceSchema
    def empty(s: StructType) = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    if (resources.isEmpty) setResources(empty(base))
    if (resourceHistoryTbl.isEmpty) setResourceHistory(empty(StructType(
      base.fields :+ StructField("revision_end", TimestampType))))
  }

  /** Whether a resource catalog frame is registered — wire doors
    * (influx/prometheus) auto-create resources only when one is. */
  def hasResourceTable: Boolean = resources.isDefined

  /** Register catalog attachment rows for EXISTING metrics — the wire
    * doors' get_or_create_resource_and_metrics residue
    * (rest/api.py:398-458): influx/prometheus writes auto-create
    * `<resource>/<name>` metrics and must surface them as the
    * resource's NAMED metrics. Already-attached (resource, name) pairs
    * skip. Rows are wire-body bounded.
    */
  def attachExistingMetrics(rows: Seq[(String, String, String)]): Unit =
      catalogLock.synchronized {
    flushDirtyFrames()
    if (rows.isEmpty) return
    import spark.implicits._
    val rids = rows.map(_._2).distinct
    val existing: Set[(String, String)] = metricsCatalog.map(
        _.filter(col("resource_id").isin(rids: _*))
          .select("resource_id", "name").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet)
      .getOrElse(Set.empty)
    val fresh = rows.distinct.filterNot(r => existing((r._2, r._3)))
    if (fresh.isEmpty) return
    val df = fresh.toDF("metric_id", "resource_id", "name")
    metricsCatalog = Some(metricsCatalog
      .map(_.unionByName(df, allowMissingColumns = true)).getOrElse(df))
    noteCatalogMutation()
    journal(jevt("metric_attach", "rows" -> org.json4s.JArray(
      fresh.toList.map { case (mid, rid, name) =>
        org.json4s.JArray(List(org.json4s.JString(mid),
          org.json4s.JString(rid), org.json4s.JString(name))) })))
  }

  def searchResources(filterStr: String): DataFrame =
    searchResources(FilterParser.parse(filterStr))

  /** Pre-parsed filter-tree form (the REST search body's native shape,
    * rest/api.py:1381-1437). */
  def searchResources(f: Filter): DataFrame = {
    refreshIfStale()
    resources.getOrElse(throw new IllegalStateException(
        "no resource table registered — call setResources(df) first"))
      .filter(Filter.compile(f))
  }

  /** Scope a catalog frame to one resource type. `generic` is the
    * reference's type-unscoped view; any other route segment filters
    * when the catalog carries a `type` column (so a query under
    * /v1/resource/volume can never read or delete instances).
    */
  private def typeScoped(df: DataFrame, tpe: String): DataFrame =
    if (tpe == "generic" || !df.columns.contains("type")) df
    else df.filter(col("type") === tpe)

  def searchResources(f: Filter, tpe: String): DataFrame =
    typeScoped(searchResources(f), tpe)

  def deleteResources(f: Filter, tpe: String): Long = {
    val scoped = resources.exists(_.columns.contains("type")) &&
      tpe != "generic"
    deleteResources(
      if (scoped) Filter.And(Seq(f, Filter.Cmp("=", "type", tpe))) else f)
  }

  /** R4: searchResources with keyset pagination. */
  def searchResources(filterStr: String, sorts: Seq[(String, Boolean)],
                      uniqueKey: String, marker: Option[Any],
                      limit: Int): DataFrame =
    graft.catalog.Pagination(searchResources(filterStr), sorts, uniqueKey,
      marker, limit)

  /** GET /v1/resource/<type> (rest/api.py ResourcesController): the
    * unfiltered catalog page, keyset-paginated on `id`.
    */
  def listResources(sorts: Seq[(String, Boolean)] = Seq("id" -> true),
                    marker: Option[Any] = None, limit: Int = 100,
                    tpe: String = "generic",
                    scope: Option[Filter] = None): DataFrame = {
    refreshIfStale()
    val base = typeScoped(resources.getOrElse(throw new IllegalStateException(
      "no resource table registered — call setResources(df) first")), tpe)
    // `scope` is the REST door's keystone policy filter — AND-merged
    // before pagination so markers stay consistent with the page set
    graft.catalog.Pagination(
      scope.fold(base)(f => base.filter(Filter.compile(f))),
      sorts, "id", marker, limit)
  }

  /** R5 at the REST surface (`?history=true`,
    * sqlalchemy.py:1167-1270): every history revision ∪ the current
    * rows as revision −1. History revisions are numbered per id in
    * revision order (the reference's revision pk is a DB sequence; a
    * per-id ordinal is the deterministic analogue).
    */
  def resourcesWithHistory: DataFrame = {
    refreshIfStale()
    val res = resources.getOrElse(throw new IllegalStateException(
      "no resource table registered — call setResources(df) first"))
    val hist = resourceHistoryTbl.getOrElse(throw new IllegalStateException(
      "no resource history table — call setResourceHistory(df) first"))
    val orderCol =
      if (hist.columns.contains("revision_start")) col("revision_start")
      else col("revision_end")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(orderCol.asc_nulls_last)
    hist.withColumn("revision", row_number().over(w))
      .unionByName(res.withColumn("revision", lit(-1)),
        allowMissingColumns = true)
  }

  /** History listing page: keyset marker is `id@revision`
    * (rest/api.py:1238-1241) — Pagination resolves that form natively
    * against (uniqueKey, revision). */
  def listResourcesHistory(sorts: Seq[(String, Boolean)] = Seq("id" -> true),
                           marker: Option[Any] = None,
                           limit: Int = 100,
                           tpe: String = "generic",
                           scope: Option[Filter] = None): DataFrame = {
    val base = typeScoped(resourcesWithHistory, tpe)
    graft.catalog.Pagination(
      scope.fold(base)(f => base.filter(Filter.compile(f))),
      sorts :+ ("revision" -> true), "id", marker, limit)
  }

  def searchResourcesHistory(f: Filter): DataFrame =
    resourcesWithHistory.filter(Filter.compile(f))

  /** Named metrics for a PAGE of resources (the reference's jsonify
    * embeds `metrics: {name: id}` per resource; its list_resources
    * eager-joins them, sqlalchemy.py:1346). The id list is REST-page
    * bounded, so this is one pruned collect — O(page), not O(fleet).
    */
  def metricsForResources(ids: Seq[String]): Map[String, Seq[(String, String)]] = {
    refreshIfStale()
    metricsCatalog match {
      case None => Map.empty
      case Some(mets) => mets
        .filter(col("resource_id").isin(ids: _*))
        .select("resource_id", "name", "metric_id")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .groupBy(_._1)
        .map { case (rid, rows) =>
          rid -> rows.toSeq.map(t => (t._2, t._3)).sortBy(_._1)
        }
    }
  }

  /** POST /v1/resource/<type> (rest/api.py ResourcesController.post):
    * append one resource row parsed from the JSON body against the
    * registered catalog's schema (absent attributes null-fill; a
    * `type` column, when present, defaults to the route's type).
    * Duplicate ids reject (the reference's 409).
    *
    * Non-UUID ids transform to uuid5(id, creator) — the reference's
    * ResourceUUID door (utils.py:38-59) — with the raw value kept in
    * `original_resource_id` and the creator recorded, when the
    * registered catalog carries those columns.
    */
  def createResource(tpe: String, id: String, json: String,
                     creator: Option[String] = None): Unit =
      catalogLock.synchronized {
    flushDirtyFrames()
    if (resources.isEmpty) bootstrapResourcePlane()
    val res = resources.get
    val rid = graft.catalog.ResourceUuid.transform(id, creator)
    GraftError.fresh(res.filter(col("id") === rid).isEmpty,
      s"resource $rid already exists")
    import spark.implicits._
    var row = spark.read.schema(res.schema).json(Seq(json).toDS)
      .withColumn("id", lit(rid).cast(res.schema("id").dataType))
    if (res.columns.contains("original_resource_id"))
      // the reference stores str(submitted id) for EVERY created
      // resource (rest/api.py:1170), transformed or not
      row = row.withColumn("original_resource_id",
        coalesce(col("original_resource_id"), lit(id)))
    if (res.columns.contains("creator"))
      row = row.withColumn("creator",
        coalesce(col("creator"), creator.map(lit).getOrElse(lit(null))))
    if (res.columns.contains("type"))
      row = row.withColumn("type", coalesce(col("type"), lit(tpe)))
    resources = Some(res.unionByName(row))
    noteCatalogMutation()
    journal(jevt("res_create", "tpe" -> org.json4s.JString(tpe),
      "id" -> org.json4s.JString(id), "json" -> org.json4s.JString(json),
      "creator" -> creator.map(c =>
        org.json4s.JString(c): org.json4s.JValue).getOrElse(org.json4s.JNull)))
  }

  /** PATCH /v1/resource/<type>/<id>: update attribute values on the
    * current row; the PRE-patch row is end-dated into the registered
    * history table (`revision_end` = `nowS`) so G3/G4 history
    * weighting sees the attribute change — the reference's
    * ResourceHistory insert on update (sqlalchemy.py:886-920).
    * Updates must name existing catalog columns; values are cast to
    * the column's type.
    */
  def patchResource(id: String, updates: Map[String, Any],
                    nowS: Long): Unit = catalogLock.synchronized {
    flushDirtyFrames()
    val res = resources.getOrElse(throw new IllegalStateException(
      "no resource table registered — call setResources(df) first"))
    val bad = updates.keySet -- res.columns
    require(bad.isEmpty, s"unknown attributes: ${bad.toSeq.sorted.mkString(", ")}")
    val cur = res.filter(col("id") === id)
    // revision only when a submitted value actually DIFFERS from the
    // stored one (utils.is_resource_revision_needed:358-370) — a
    // same-value patch is an existence check, no useless history row.
    // One action covers the 404 check and the diff.
    val changed = updates.map { case (k, v) =>
      !(col(k) <=> lit(v).cast(res.schema(k).dataType))
    }.reduceOption(_ || _).getOrElse(lit(false))
    val curRows = cur.select(changed.as("c")).collect()
    GraftError.found(curRows.nonEmpty, s"no resource $id")
    if (!curRows.head.getBoolean(0)) return // nothing to write
    resourceHistoryTbl = resourceHistoryTbl.map(_.unionByName(
      cur.withColumn("revision_end",
        to_timestamp(from_unixtime(lit(nowS)))),
      allowMissingColumns = true))
    // the surviving row's revision restarts at the patch time
    // (sqlalchemy.py:934 `r.revision_start = now`)
    val revised =
      if (res.columns.contains("revision_start"))
        updates + ("revision_start" ->
          new java.sql.Timestamp(nowS * 1000L))
      else updates
    // ONE projection over a SINGLE reference to the catalog frame — a
    // filter(≠id) ∪ patched-filter(=id) formulation references the
    // previous catalog plan twice, so sustained patching doubles the
    // plan tree per call (exponential analysis blow-up long before the
    // periodic compaction can cut it; OOMed at ~25 patches).
    val patched = revised.foldLeft(res) { case (df, (k, v)) =>
      df.withColumn(k, when(col("id") === id,
        lit(v).cast(res.schema(k).dataType)).otherwise(col(k)))
    }
    resources = Some(patched)
    noteCatalogMutation()
    journal(jevt("res_patch", "id" -> org.json4s.JString(id),
      "updates" -> org.json4s.JObject(updates.toList.map { case (k, v) =>
        k -> graft.catalog.CatalogJson.anyToJson(v) }),
      "now_s" -> org.json4s.JLong(nowS)))
  }

  /** DELETE /v1/resource/<type>/<id> — 404 when absent. */
  def deleteResource(id: String): Unit = {
    // the string grammar's escape is backslash-based, not SQL ''
    val n = deleteResources(Filter.Cmp("=", "id", id))
    if (n == 0) throw new NoSuchElementException(s"no resource $id")
  }

  private val resourceTypes = scala.collection.concurrent
    .TrieMap[String, graft.catalog.ResourceTypes.ResourceType]()

  /** Resource-type lifecycle (POST/PATCH/DELETE /v1/resource_type,
    * resource_type.py + indexer/sqlalchemy.py:340-480). PATCH applies
    * each attribute change's backfill to BOTH the registered resource
    * table and the history table, mirroring the reference's ALTER of
    * `tablename` and `tablename_history`.
    */
  def createResourceType(rt: graft.catalog.ResourceTypes.ResourceType): Unit = {
    flushDirtyFrames()
    GraftError.fresh(!resourceTypes.contains(rt.name),
      s"resource type ${rt.name} already exists")
    rt.attrs.foreach(a => graft.catalog.ResourceTypes.requireValidName(a.name))
    resourceTypes(rt.name) = rt
    journal(jevt("rt_create",
      "rt" -> graft.catalog.CatalogJson.rtToJson(rt)))
  }

  def resourceType(name: String): graft.catalog.ResourceTypes.ResourceType =
    resourceTypes.getOrElse(name,
      GraftError.notFound(s"no resource type $name"))

  def patchResourceType(
      name: String,
      add: Seq[(graft.catalog.ResourceTypes.AttrSpec, Option[Any])] = Nil,
      del: Seq[String] = Nil,
      update: Seq[(String, Boolean, Option[Any])] = Nil): Unit =
      catalogLock.synchronized {
    flushDirtyFrames()
    var rt = resourceType(name)
    val fns = scala.collection.mutable.ArrayBuffer[DataFrame => DataFrame]()
    for ((spec, fill) <- add) {
      val (next, fn) = rt.addAttribute(spec, fill); rt = next; fns += fn
    }
    for (attr <- del) {
      val (next, fn) = rt.removeAttribute(attr); rt = next; fns += fn
    }
    for ((attr, required, fill) <- update) {
      val (next, fn) = rt.updateAttribute(attr, required, fill)
      rt = next; fns += fn
    }
    val all = fns.reduceOption(_ andThen _).getOrElse(identity[DataFrame] _)
    // apply to the type's slice of each registered table; a table
    // without a `type` column holds one type and transforms wholesale
    def retype(df: DataFrame): DataFrame =
      if (df.columns.contains("type"))
        df.filter(col("type") === name).transform(all)
          .unionByName(df.filter(col("type").isNull || col("type") =!= name),
            allowMissingColumns = true)
      else all(df)
    resources = resources.map(retype)
    resourceHistoryTbl = resourceHistoryTbl.map(retype)
    noteCatalogMutation()
    resourceTypes(name) = rt
    journal(jevt("rt_patch", "name" -> org.json4s.JString(name),
      "add" -> org.json4s.JArray(add.toList.map { case (spec, fill) =>
        org.json4s.JArray(List(graft.catalog.CatalogJson.attrToJson(spec),
          graft.catalog.CatalogJson.anyToJson(fill))) }),
      "del" -> org.json4s.JArray(del.toList.map(org.json4s.JString(_))),
      "update" -> org.json4s.JArray(update.toList.map {
        case (attr, required, fill) => org.json4s.JArray(List(
          org.json4s.JString(attr), org.json4s.JBool(required),
          graft.catalog.CatalogJson.anyToJson(fill))) })))
  }

  def deleteResourceType(name: String): Unit = {
    flushDirtyFrames()
    val _ = resourceType(name)
    // the reference 400s when resources of the type still exist
    // (sqlalchemy.py delete_resource_type → ResourceTypeInUse)
    for (res <- resources if res.columns.contains("type")) {
      require(res.filter(col("type") === name).isEmpty,
        s"resource type $name is still in use")
    }
    resourceTypes.remove(name)
    journal(jevt("rt_delete", "name" -> org.json4s.JString(name)))
  }

  // private[graft]: specs assert the compaction keeps this frame's
  // lineage bounded under attach churn
  @volatile private[graft] var metricsCatalog: Option[DataFrame] = None

  /** Metric catalog `(metric_id, resource_id, name)` — the named-metric
    * side of resources (indexer metric table, sqlalchemy_base.py:79-122).
    */
  def setMetrics(df: DataFrame): Unit = {
    metricsCatalog = Some(df)
    framesDirty = true // see setResources
  }

  /** Metric NAME from the catalog (None for standalone metrics or when
    * no catalog is registered) — the `name` field the reference's
    * aggregates `references` block carries. Driver-bounded lookup.
    */
  def metricNameOf(id: String): Option[String] =
    metricsCatalog.flatMap(_.filter(col("metric_id") === id)
      .select("name").collect().headOption.map(_.getString(0)))

  /** Resolve a resource's NAMED metric to its metric id
    * (GET /v1/resource/<type>/<id>/metric/<name>/..., the indexer's
    * (resource_id, name) unique key).
    */
  def resourceMetricId(resourceId: String, name: String): String = {
    val cat = metricsCatalog.getOrElse(throw new IllegalStateException(
      "no metric catalog registered — call setMetrics(df) first"))
    cat.filter(col("resource_id") === resourceId && col("name") === name)
      .select("metric_id").collect().map(_.getString(0)).headOption
      .getOrElse(throw new NoSuchElementException(
        s"resource $resourceId has no metric named $name"))
  }

  /** Metrics attached to one resource, (name, metric_id) sorted by
    * name (NamedMetricController.get_all, rest/api.py:799-817). */
  def resourceMetrics(resourceId: String): Seq[(String, String)] = {
    refreshIfStale()
    val cat = metricsCatalog.getOrElse(throw new IllegalStateException(
      "no metric catalog registered — call setMetrics(df) first"))
    cat.filter(col("resource_id") === resourceId)
      .select("name", "metric_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sortBy(_._1)
  }

  /** Append NAMED metrics to a resource (NamedMetricController.post,
    * rest/api.py:773-797): each (name, optional policy) creates the
    * metric — explicit policy if given, else the R9 rules — and
    * registers it under the resource. An already-attached name rejects
    * the whole call (NamedMetricAlreadyExists → 409 at the route
    * layer). Returns the created (name, metric_id) pairs.
    */
  def attachMetrics(resourceId: String,
                    metrics: Seq[(String, Option[String])]): Seq[(String, String)] = {
    // duplicates reject loudly (a Map would silently keep the last),
    // and the result keeps the CALLER's order, not name-sorted
    val dup = metrics.map(_._1).groupBy(identity)
      .collect { case (n, more) if more.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate metric names: ${dup.toSeq.sorted.mkString(", ")}")
    val byName = attachMetricsSchema(resourceId,
      metrics.toMap.map { case (n, p) => n -> Right(p) }).toMap
    metrics.map { case (n, _) => (n, byName(n)) }
  }

  /** MetricsSchema validation with NO state mutated — shared by the
    * attach path and the create-resource-with-metrics path so a metric
    * failure can't leave a half-created resource behind: slash names
    * (rest/api.py:604-606), existing-id attaches
    * (indexer NoSuchMetric), policy/rule resolution for creates, and
    * derived-id freshness (a mid-loop createMetric Conflict would
    * leave earlier names created but unregistered).
    */
  def validateMetricsSchema(
      resourceId: String,
      metrics: Map[String, Either[String, Option[String]]]): Unit = {
    for (_ <- metrics.keys.find(_.contains('/')))
      GraftError.badInput("'/' is not supported in metric name")
    metrics.foreach {
      case (_, Left(mid)) =>
        // a bad attach BODY is the reference's 400, not a 404 — so a
        // plain IllegalArgumentException, not GraftError.NotFound
        if (!hasMetric(mid)) throw new IllegalArgumentException(
          s"Metric $mid does not exist")
      case (n, Right(pol)) =>
        val p = pol.getOrElse(rulePolicy(n)) // throws when no rule matches
        GraftError.valid(policies.contains(p),
          s"Archive policy $p does not exist")
    }
    for ((n, Right(_)) <- metrics)
      GraftError.fresh(!hasMetric(s"$resourceId/$n"),
        s"metric $resourceId/$n already exists")
  }

  /** The full MetricsSchema attach contract (rest/api.py:732-746):
    * per name either Left(existing metric id to ATTACH) or
    * Right(policy option) to CREATE (None → the R9 rules pick).
    * Validation is all-or-nothing: names (including intra-request
    * duplicates at the wire layer — a Map here), policies, and
    * existing-metric ids are checked BEFORE any state mutates, so a
    * late failure can't leave earlier metrics created but unregistered.
    */
  def attachMetricsSchema(resourceId: String,
                          metrics: Map[String, Either[String, Option[String]]],
                          units: Map[String, String] = Map.empty)
      : Seq[(String, String)] = catalogLock.synchronized {
    flushDirtyFrames()
    // tolerate an unregistered metrics catalog: the first attach
    // bootstraps it (the union at the tail handles None), exactly as
    // the batch-ingest door does
    val existing: Set[String] = metricsCatalog.map(
        _.filter(col("resource_id") === resourceId)
          .select("name").collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)
    for (n <- metrics.keys.find(existing.contains))
      GraftError.conflict(
        s"metric $n already exists for resource $resourceId")
    validateMetricsSchema(resourceId, metrics)
    val attached = metrics.toSeq.sortBy(_._1).map {
      case (name, Left(mid)) => (mid, resourceId, name)
      case (name, Right(pol)) =>
        val id = s"$resourceId/$name"
        createMetric(id, pol.getOrElse(rulePolicy(name)), units.get(name))
        (id, resourceId, name)
    }
    import spark.implicits._
    val rows = attached.toDF("metric_id", "resource_id", "name")
    metricsCatalog = Some(metricsCatalog
      .map(_.unionByName(rows, allowMissingColumns = true)).getOrElse(rows))
    noteCatalogMutation()
    journal(jevt("metric_attach", "rows" -> org.json4s.JArray(
      attached.toList.map { case (mid, rid, name) =>
        org.json4s.JArray(List(org.json4s.JString(mid),
          org.json4s.JString(rid), org.json4s.JString(name))) })))
    attached.map(c => (c._3, c._1))
  }

  /** POST /v1/resource/<type> with an inline `metrics` map
    * (ResourceSchema's Optional('metrics'), rest/api.py:1060-1069):
    * the reference creates resource + metrics in ONE indexer call and
    * aborts 400 with nothing created when a metric is invalid — so the
    * metrics validate BEFORE the resource row lands.
    */
  def createResourceWithMetrics(
      tpe: String, id: String, json: String,
      metrics: Map[String, Either[String, Option[String]]],
      creator: Option[String] = None): Unit = catalogLock.synchronized {
    val rid = graft.catalog.ResourceUuid.transform(id, creator)
    validateMetricsSchema(rid, metrics)
    createResource(tpe, id, json, creator)
    if (metrics.nonEmpty) attachMetricsSchema(rid, metrics)
  }

  /** PATCH /v1/resource/<type>/<id> `metrics` semantics
    * (sqlalchemy.py:958-966): REPLACE — every currently-attached
    * metric detaches (resource_id → NULL; the metric itself survives,
    * the reference's janitor reaps detached metrics separately), then
    * the new map attaches.
    */
  def replaceResourceMetrics(
      resourceId: String,
      metrics: Map[String, Either[String, Option[String]]])
      : Seq[(String, String)] = catalogLock.synchronized {
    flushDirtyFrames()
    validateMetricsSchema(resourceId, metrics)
    metricsCatalog = metricsCatalog.map(_.withColumn("resource_id",
      when(col("resource_id") === resourceId, lit(null))
        .otherwise(col("resource_id"))))
    noteCatalogMutation()
    journal(jevt("metric_detach_all",
      "resource_id" -> org.json4s.JString(resourceId)))
    if (metrics.isEmpty) Nil else attachMetricsSchema(resourceId, metrics)
  }

  /** The registered resource catalog's columns — the REST door's
    * input-schema surface (schema_for(), rest/api.py:1153-1155). A
    * GET is a pure read: with no frame registered it serves the BASE
    * schema's names directly instead of bootstrapping frames — the
    * bootstrap sets framesDirty, and a read-only facade that
    * dirty-marked on a schema GET would snapshot at close(), taking
    * the catalog writer lock it has no business holding. */
  def resourceColumns: Seq[String] = catalogLock.synchronized {
    refreshIfStale()
    resources.map(_.columns.toSeq)
      .getOrElse(baseResourceSchema.fieldNames.toSeq)
  }

  /** One resource's revision rows from the registered history table,
    * ordered by revision_start (the resource history endpoint; the
    * table's convention carries the CURRENT revision as a NULL
    * `revision_end` row, so the full lifecycle reads out of one
    * filter). */
  def resourceHistory(id: String): DataFrame = {
    val hist = resourceHistoryTbl.getOrElse(throw new IllegalStateException(
      "no resource history table — call setResourceHistory(df) first"))
    hist.filter(col("id") === id).orderBy("revision_start")
  }

  /** All registered resource types, sorted by name
    * (ResourceTypesController.get_all, rest/api.py:1283-1288). */
  def listResourceTypes: Seq[graft.catalog.ResourceTypes.ResourceType] = {
    refreshIfStale()
    resourceTypes.values.toSeq.sortBy(_.name)
  }

  /** G1/G2 resource-scoped group-by aggregation
    * (rest/aggregates/api.py:541-672): resolve resources by filter,
    * match metrics by (glob) name, fetch every matched series in one
    * pruned scan, and collapse per (group attrs, bucket) — Spark turns
    * the reference's per-group loop into one shuffle. Covers the
    * `(aggregate <acrossAgg> (metric <name> <method>))` shape; richer
    * nested expressions evaluate per-metric via [[aggregates]].
    */
  def groupByAggregates(metricName: String, method: String, granS: Long,
                        filterStr: String, groupby: Seq[String],
                        acrossAgg: String = "mean",
                        from: Option[java.sql.Timestamp] = None,
                        to: Option[java.sql.Timestamp] = None): DataFrame =
    legacyResourceAggregation(metricName, method, Some(granS),
      searchResources(filterStr), groupby, acrossAgg, from, to)
      .drop("gran_s")

  /** Legacy `/v1/aggregation/resource/<type>/metric/<name>` semantics
    * (rest/api.py:1893-1937 AggregationResourceController.post → one
    * `get_cross_metric_measures_from_objs` call per GROUP): the NAMED
    * metric across the searched resources, optional `groupby`
    * attribute list. Resolves the per-group metric lists (catalog
    * metadata, driver-bounded by contract) and hands them to
    * [[legacyCrossAggregation]] — all groups evaluate in ONE plan.
    * Output: `(groupby..., bucket, gran_s, value)`; groups with no
    * matched metric emit nothing here (the REST door lists them with
    * empty measures from the resolved scope, rest/api.py:2028-2029).
    */
  def legacyResourceAggregation(metricName: String, method: String,
      granS: Option[Long], resScope: DataFrame, groupby: Seq[String],
      acrossAgg: String = "mean",
      from: Option[java.sql.Timestamp] = None,
      to: Option[java.sql.Timestamp] = None,
      resampleS: Option[Long] = None,
      fill: Option[String] = None,
      refreshFirst: Boolean = false,
      neededOverlap: Double = 100.0): DataFrame = {
    // groupby must name real resource attributes (rest/api.py:1700-1703
    // "Invalid groupby attribute")
    groupby.find(a => !resScope.columns.contains(a)).foreach { a =>
      throw new IllegalArgumentException(s"Invalid groupby attribute: $a") }
    // full fnmatch semantics incl. `?` and char classes — a glob
    // EXTENSION over the reference's exact `r.get_metric(name)` lookup
    // (a wildcard-free name matches exactly, same as the reference)
    val mets = metricsCatalog.getOrElse(sys.error("no metrics catalog"))
      .filter(col("name").rlike(graft.catalog.Fnmatch.regex(metricName)))
      .join(broadcast(resScope.select((col("id").as("resource_id") +:
        groupby.map(col)): _*)), Seq("resource_id"))
    legacyCrossAggregation(
      mets.select((col("metric_id") +: groupby.map(col)): _*).distinct(),
      groupby, method, acrossAgg, granS, neededOverlap, fill, resampleS,
      from, to, refreshFirst)
  }

  /** The reference's `get_cross_metric_measures_from_objs`
    * (rest/api.py:2014-2131), vectorized over GROUPS: each distinct
    * groupby-attribute tuple of `metGroups` is one reference call, but
    * every group evaluates in one shared plan per granularity.
    *
    * Faithful surface:
    *  - `fill` is the FillSchema (rest/api.py:1941-1944): any
    *    float()-coercible literal, or one of null / dropna / ffill /
    *    bfill / full_ffill / full_bfill — anything else is a 400 with
    *    the schema's message. Numeric fill pads each group's
    *    (metric × bucket-union) grid; the *fill modes forward/backward
    *    fill each series over its group's bucket union; `null`/`dropna`
    *    leave the grid sparse (their grid filler is NaN ≡ absent here).
    *  - no `fill` → the overlap contract (processor.py:200-220) PER
    *    GROUP: buckets where every series has a value are the overlap;
    *    none at all (incl. a group with a measure-less metric) errors
    *    "No overlap" when `neededOverlap` > 0; the span trims to the
    *    overlapping range on sides without an explicit bound, and the
    *    overlap fraction of the trimmed span must reach `neededOverlap`
    *    (default 100, as the route's signature) or the whole request
    *    errors, exactly like the reference's per-group abort.
    *  - `resample` re-buckets each series with the SAME fetch method
    *    AFTER fill/trim (the reference puts resample inside the built
    *    operations tree, rest/api.py:2073-2085) using the carbonara
    *    kernels ([[Compiler.resampleAgg]]); requires an explicit
    *    granularity (rest/api.py:2032-2034).
    *  - cross-metric reaggregation is the nan-skipping AGG_MAP
    *    ([[Compiler.nanSkipAgg]]); with a dropna-family fill the
    *    aggregated output drops NaN/±inf positions
    *    (processor.py:237-244).
    *  - a group resolving to ONE metric short-circuits to the raw
    *    store read — no reaggregation, fill, or overlap check
    *    (rest/api.py:2098-2121).
    *  - no granularity → EVERY granularity common to the group's
    *    metrics, coarse→fine, per group (rest/api.py:2041-2058);
    *    an empty intersection errors "No granularity match".
    *  - a method some matched metric's policy never stored is the
    *    404 AggregationDoesNotExist (rest/api.py:2063-2068).
    *
    * Known pinned divergence (shared with the whole DSL surface, see
    * NOTES): absent grid cells are null, not numpy-NaN operands — a
    * resampled bucket that covers an absent fine bucket aggregates the
    * present cells instead of going NaN.
    *
    * `metGroups`: one row per (metric_id, groupby attr values...).
    * Output: `(groupby..., bucket, gran_s, value)`.
    */
  def legacyCrossAggregation(metGroups: DataFrame, groupby: Seq[String],
      method: String, reagg: String, granS: Option[Long],
      neededOverlap: Double, fill: Option[String], resampleS: Option[Long],
      from: Option[java.sql.Timestamp], to: Option[java.sql.Timestamp],
      refreshFirst: Boolean): DataFrame = {
    import spark.implicits._
    // FillSchema (rest/api.py:1941-1944) — validate BEFORE any work
    val fillModes =
      Set("null", "dropna", "ffill", "bfill", "full_ffill", "full_bfill")
    val numericFill: Option[Double] = fill.filterNot(fillModes).map { f =>
      graft.timeseries.TimeSeriesOps.parseFloatLiteral(f).getOrElse(
        GraftError.badInput(
          "Must be a float, 'dropna', 'null', 'ffill', 'bfill', " +
            "'full_ffill' or 'full_bfill'"))
    }
    GraftError.valid(resampleS.isEmpty || granS.isDefined,
      "A granularity must be specified to resample")
    // resolved scope: driver-bounded catalog metadata by contract (the
    // reference materializes the same per-group metric lists,
    // rest/api.py:1916-1931)
    val metRows: Seq[(String, Seq[Any])] = metGroups.collect().toSeq
      .map(r => (r.getString(0), groupby.map(a => r.getAs[Any](a))))
    val outCols = (groupby.map(col) ++
      Seq(col("bucket"), col("gran_s"), col("value")))
    if (metRows.isEmpty)
      // no metric matched anywhere: empty page with the scope's
      // attribute column types (the gabbi "no data" golden)
      return metGroups.limit(0).select(groupby.map(col): _*)
        .withColumn("bucket", lit(null).cast("timestamp"))
        .withColumn("gran_s", lit(granS.getOrElse(0L)))
        .withColumn("value", lit(null).cast("double"))
        .select(outCols: _*)
    if (refreshFirst) metRows.map(_._1).distinct.foreach(refresh)
    metRows.map(_._1).distinct.foreach { id =>
      metricPolicyName(id) // unknown metric → 404 before the agg check
      granS match {
        case Some(g) => requireAgg(id, method, g)
        case None    => requireMethod(id, method)
      }
    }
    // group index: metric → group is unique (a resource carries one
    // attribute tuple), so the driver key never round-trips through a
    // value rendering — joins ride a broadcast (metric_id, __g) map
    val groups: Map[Seq[Any], Seq[String]] =
      metRows.groupBy(_._2).view.mapValues(_.map(_._1).distinct).toMap
    // fan-out guard (same discipline as the dedup bucket caps): the
    // per-group driver planning loop below (commonGranularities per
    // distinct groupby tuple) is the reference's own per-group loop
    // (rest/api.py:1916-1931), but a high-cardinality `groupby` would
    // silently turn it into the bottleneck at fleet scale — cap it with
    // a clear error instead (spark.graft.aggregation.maxGroups)
    val maxGroups = spark.conf
      .get("spark.graft.aggregation.maxGroups", "10000").toInt
    GraftError.valid(groups.size <= maxGroups,
      s"groupby resolves ${groups.size} groups, above the " +
        s"spark.graft.aggregation.maxGroups cap ($maxGroups) — group on " +
        "a lower-cardinality attribute or raise the cap")
    val gIndex: Map[Seq[Any], Int] = groups.keys.toSeq.zipWithIndex.toMap
    val keyDf = broadcast(metRows.map { case (mid, k) => (mid, gIndex(k)) }
      .toDF("metric_id", "__g"))
    val sizeOf: Map[Int, Int] =
      groups.map { case (k, ids) => gIndex(k) -> ids.size }
    // per-GROUP common granularities when none requested (each group is
    // its own get_cross_metric_measures call, rest/api.py:2041-2058)
    val gransBy: Map[Int, Seq[Long]] = groups.map { case (k, ids) =>
      gIndex(k) -> granS.map(Seq(_)).getOrElse(commonGranularities(ids)) }
    val allGrans = gransBy.values.flatten.toSeq.distinct.sorted.reverse
    val sizeDf = broadcast(sizeOf.toSeq.toDF("__g", "__gn"))
    // groupby attr values per group, built from the DRIVER-side gIndex
    // map (attr column TYPES come from the metGroups schema). Joining
    // metGroups back to keyDf on metric_id would cross-product a metric
    // attached under SEVERAL groupby tuples: each group index would
    // inherit every attr tuple of the metric, duplicating output rows
    // across groups.
    val attrSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__g",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        groupby.map(a => metGroups.schema(a)))
    val attrRows: java.util.List[org.apache.spark.sql.Row] =
      scala.jdk.CollectionConverters.SeqHasAsJava(
        gIndex.toSeq.map { case (k, gi) =>
          org.apache.spark.sql.Row.fromSeq(gi +: k) }).asJava
    val attrsByG = broadcast(spark.createDataFrame(attrRows, attrSchema))
    val perGran = allGrans.map { gr =>
      val gIds = groups.collect {
        case (k, ids) if gransBy(gIndex(k)).contains(gr) => ids
      }.flatten.toSeq.distinct
      val series = gIds.groupBy(metricPolicy).map { case (pol, polIds) =>
        storeOf(pol).getMeasuresMany(polIds, Seq(method), gr, from, to)
      }.reduceOption(_ unionByName _)
        .getOrElse(MetricStore.emptyAggregates(spark)
          .select("metric_id", "method", "bucket", "value"))
        .select("metric_id", "bucket", "value")
      val labeled = series.join(keyDf, Seq("metric_id"))
        .join(sizeDf, Seq("__g"))
      // single-metric groups short-circuit to the raw read
      // (rest/api.py:2098-2121): no reaggregation, fill, overlap
      val single = labeled.filter(col("__gn") === 1)
      val multi0 = labeled.filter(col("__gn") > 1)
        .select("__g", "__gn", "metric_id", "bucket", "value")
      // ---- fill / overlap on the multi-metric groups (one grid per
      // group in the reference; here one sparse long frame for all)
      // (group bucket-union × group metrics) padding grid, shared by
      // the numeric and ffill-family fills
      def paddedGrid(m0: DataFrame): DataFrame = {
        val buckets = m0.select(col("__g"), col("bucket")).distinct()
        val gmets = m0.select(col("__g"), col("metric_id")).distinct()
        buckets.join(gmets, Seq("__g"))
          .join(m0.select("metric_id", "bucket", "value"),
            Seq("metric_id", "bucket"), "left")
      }
      val multiFilled: DataFrame = fill match {
        case None =>
          // overlap check + trim-to-overlap (processor.py:200-220),
          // per group, erroring the WHOLE request like the per-group
          // abort does. ONE action computes everything: per-bucket
          // completeness collapses the fetched frame to (group, bucket)
          // rows, a window over that SMALL frame finds each group's
          // overlap span, and one aggregate emits (nC, nB-in-span,
          // span) per group — #groups rows, driver-bounded.
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("__g"))
          val perBucket = multi0.groupBy(col("__g"), col("__gn"),
              col("bucket"))
            .agg(count(when(!isnan(col("value")), 1)).as("__k"))
            .withColumn("__c", col("__k") === col("__gn"))
            .withColumn("__firstC",
              min(when(col("__c"), col("bucket"))).over(w))
            .withColumn("__lastC",
              max(when(col("__c"), col("bucket"))).over(w))
          // buckets counting toward the trimmed span: sides with an
          // explicit bound don't trim (processor.py:207-214)
          val inSpan =
            (if (from.isDefined) lit(true) else col("bucket") >= col("__firstC")) &&
            (if (to.isDefined) lit(true) else col("bucket") <= col("__lastC"))
          val gstats = perBucket.groupBy(col("__g"))
            .agg(sum(when(col("__c"), 1L).otherwise(0L)).as("nC"),
              count(when(inSpan, 1)).as("nB"),
              min(col("__firstC")).as("firstC"),
              max(col("__lastC")).as("lastC"))
            .collect().map(r => r.getInt(0) ->
              (r.getLong(1), r.getLong(2), r.getTimestamp(3),
                r.getTimestamp(4))).toMap
          val expected = sizeOf.collect {
            case (gi, n) if n > 1 && gransBy(gi).contains(gr) => gi }
          val spans = expected.flatMap { gi =>
            val (nC, nB, firstC, lastC) = gstats.getOrElse(gi,
              (0L, 0L, null: java.sql.Timestamp, null: java.sql.Timestamp))
            if (nC == 0L) {
              // a multi-metric group with no fully-covered bucket —
              // including one whose metric never got measures — is the
              // reference's UnAggregableTimeseries (processor.py:203-206)
              GraftError.valid(neededOverlap <= 0, "No overlap")
              None
            } else {
              val pct = nC * 100.0 / nB
              GraftError.valid(pct >= neededOverlap,
                f"Less than $neededOverlap%f%% of datapoints overlap in " +
                  f"this timespan ($pct%.2f%%)")
              Some((gi, firstC, lastC))
            }
          }.toSeq
          if (spans.isEmpty) multi0
          else {
            val spanDf = broadcast(spans.toDF("__g", "__firstC", "__lastC"))
            multi0.join(spanDf, Seq("__g"), "left").filter(
              (if (from.isDefined) lit(true)
               else col("__firstC").isNull || col("bucket") >= col("__firstC")) &&
              (if (to.isDefined) lit(true)
               else col("__lastC").isNull || col("bucket") <= col("__lastC")))
              .drop("__firstC", "__lastC")
          }
        case Some(m) if fillModes(m) && m != "null" && m != "dropna" =>
          // ffill-family: pad each series to its GROUP's bucket union,
          // then forward/backward fill per series (processor.py:184-196)
          graft.timeseries.TimeSeriesOps.fill(paddedGrid(multi0),
              Seq("value"), m, partitionCols = Seq("metric_id"))
            .filter(col("value").isNotNull) // residual edge gaps ≡ NaN
        case _ =>
          numericFill.filterNot(_.isNaN) match {
            case Some(d) =>
              // numeric pad: absent cells take the filler, stored NaN
              // stays NaN (the reference's grid is initialized with the
              // filler and then overwritten by series values)
              paddedGrid(multi0)
                .withColumn("value", coalesce(col("value"), lit(d)))
            // null / dropna / NaN-numeric: the grid filler is NaN ≡
            // absent — evaluation stays sparse and nan-skipping
            case None => multi0
          }
      }
      // ---- resample AFTER fill/trim, same-method carbonara kernels
      val outGran = resampleS.getOrElse(gr)
      def resampled(df: DataFrame): DataFrame = resampleS match {
        case None => df.select("__g", "metric_id", "bucket", "value")
        case Some(rs) => df
          .withColumn("__b", graft.timeseries.Bucketing.floorTimestamp(
            col("bucket"), rs * 1_000_000_000L))
          .groupBy(col("__g"), col("metric_id"), col("__b"))
          .agg(Compiler.resampleAgg(method, col("value"), col("bucket"))
            .as("value"))
          .select(col("__g"), col("metric_id"), col("__b").as("bucket"),
            col("value"))
      }
      // ---- cross-metric reaggregation: nan-skipping AGG_MAP
      val multiOut0 = resampled(multiFilled)
        .groupBy(col("__g"), col("bucket"))
        .agg(Compiler.nanSkipAgg(reagg, col("value")).as("value"))
      // output-stage drop for the dropna family (processor.py:237-244
      // — the ONE shared spelling of that contract); the single-metric
      // short-circuit bypasses it, as the reference
      val multiOut = outputDrop(multiOut0, Seq("value"), fill)
      resampled(single).select(col("__g"), col("bucket"), col("value"))
        .unionByName(multiOut)
        .withColumn("gran_s", lit(outGran))
    }
    perGran.reduce(_ unionByName _)
      .join(attrsByG, Seq("__g"))
      .select(outCols: _*)
  }

  /** G2+X*: resource-grouped evaluation of an ARBITRARY nested
    * operations expression (rest/aggregates/api.py:541-672 with a full
    * `operations` body, e.g.
    * `(* 100 (/ (aggregate sum (metric mem.used mean)) (aggregate sum
    * (metric mem.total mean))))` per availability zone).
    *
    * Metric leaves name metrics by (glob) NAME, expanding to one series
    * per matched resource in each group. Everything below an
    * `(aggregate ...)` evaluates in long format partitioned by
    * (group, series) — see [[graft.ops.GroupedOps]] — each aggregate
    * collapses with one shuffle on (group, bucket), and the remaining
    * scalar tree runs per group through the partCols-aware grid
    * [[Compiler]]. Output: `(groupby..., bucket, value)`.
    */
  def groupByAggregatesOps(operations: String, granS: Long,
                           filterStr: String, groupby: Seq[String],
                           fill: Option[String] = None,
                           from: Option[java.sql.Timestamp] = None,
                           to: Option[java.sql.Timestamp] = None,
                           onlyGroups: Option[Seq[Seq[Any]]] = None)
      : DataFrame = {
    import graft.ops.GroupedOps
    // onlyGroups: the no-granularity REST form evaluates each
    // granularity only over the groups whose OWN common set contains it
    // ([[commonGranularitiesByGroup]]) — a metric of an excluded group
    // may not store this granularity at all, and must not 404 the
    // requireAgg check below. Restriction is a BROADCAST null-safe
    // semi-join on the attr tuple: an OR-of-AND predicate would grow
    // one term per group and blow up analysis at fleet group counts.
    val res = onlyGroups match {
      case None => searchResources(filterStr)
      case Some(keys) =>
        val res0 = searchResources(filterStr)
        if (keys.isEmpty) res0.limit(0)
        else {
          val schema = org.apache.spark.sql.types.StructType(
            groupby.map(a => res0.schema(a)))
          val keyRows: java.util.List[org.apache.spark.sql.Row] =
            scala.jdk.CollectionConverters.SeqHasAsJava(
              keys.map(k => org.apache.spark.sql.Row.fromSeq(k))).asJava
          val keyDf = spark.createDataFrame(keyRows, schema)
          res0.join(broadcast(keyDf),
            groupby.map(a => res0(a) <=> keyDf(a)).reduce(_ && _),
            "left_semi")
        }
    }
    // expand each distinct ref once: glob-match the catalog, label with
    // the resource's group attrs, one pruned store scan per policy
    GroupedOps.run(Parser.parse(operations), groupby, { case (name, method) =>
      val mets = metricsCatalog.getOrElse(sys.error("no metrics catalog"))
        .filter(col("name").rlike(graft.catalog.Fnmatch.regex(name)))
        .join(broadcast(res.select((col("id").as("resource_id") +:
          groupby.map(col)): _*)), Seq("resource_id"))
      val ids = mets.select("metric_id").distinct()
        .collect().map(_.getString(0)).toSeq // metric list, as the reference
      ids.foreach(requireAgg(_, method, granS))
      val series = ids.groupBy(metricPolicy).map { case (pol, polIds) =>
        storeOf(pol).getMeasuresMany(polIds, Seq(method), granS, from, to)
      }.reduceOption(_ unionByName _)
        .getOrElse(MetricStore.emptyAggregates(spark)
          .select("metric_id", "method", "bucket", "value"))
      series
        .join(broadcast(mets.select(
          (col("metric_id") +: groupby.map(col)): _*)), Seq("metric_id"))
        .select((groupby.map(col) ++ Seq(
          concat(col("metric_id"), lit("/"), lit(method)).as("sid"),
          col("bucket"), col("value"))): _*)
    }, fill) match {
      // same output-stage contract as the ungrouped door: the grouped
      // result is one series per group, so the per-series drop is a
      // row filter on its single value column
      case out => outputDrop(out, Seq("value"), fill)
    }
  }

  @volatile private var resourceHistoryTbl: Option[DataFrame] = None

  /** Resource revision history (ResourceHistory table,
    * sqlalchemy_base.py:301-318): one row per attribute revision with
    * `revision_start`/`revision_end` (NULL end = current row).
    */
  def setResourceHistory(df: DataFrame): Unit = {
    resourceHistoryTbl = Some(df)
    framesDirty = true // see setResources
  }

  /** G3/G4 `use_history=true` group-by aggregation, single-attribute
    * convenience form (rest/aggregates/api.py:191-493): revision
    * windows come from the catalog's resource history — a resource
    * contributes each bucket to the group its attribute had AT THAT
    * TIME, fractionally (overlap/granularity) where a bucket straddles
    * a revision edge, summed per (group, bucket) (api.py:231-259,
    * 462-470). Delegates to the generalized Grouper door
    * ([[groupByAggregatesHistoryOps]]) with an `(aggregate sum ...)`
    * tree: per-metric weighting then group-summing equals per-resource
    * summing then weighting by linearity (a resource's window weights
    * every one of its metrics identically), and the delegation gives
    * this form the same `truncate_resource_time_window` semantics
    * (first-revision reach-back, window clamping) as the REST door —
    * the two used to diverge. Output: `(grp, bucket_s, v)`.
    */
  def groupByAggregatesHistory(metricName: String, method: String,
                               granS: Long, filterStr: String,
                               groupby: String,
                               from: Option[java.sql.Timestamp] = None,
                               to: Option[java.sql.Timestamp] = None): DataFrame =
    // build the (aggregate sum (metric name method)) tree DIRECTLY — a
    // metric name carrying parser-significant characters (spaces,
    // parentheses) must not round-trip through the ops grammar
    groupByAggregatesHistoryAst(
        graft.ops.AggAcross("sum",
          graft.ops.MetricLeaf(Seq((metricName, method)))),
        granS, filterStr, Seq(groupby), None, from, to)
      .select(col(groupby).as("grp"),
        unix_timestamp(col("bucket")).cast("long").as("bucket_s"),
        col("value").as("v"))

  /** G3/G4 generalized `use_history=true` — the reference's full
    * Grouper surface (rest/aggregates/api.py:258-493): a groupby
    * attribute LIST and an ARBITRARY aggregated operations tree. The
    * tree evaluates PER RESOURCE (api.py:383-419 runs
    * `_get_measures_by_name` per revision slice — bucket values don't
    * depend on the slice bounds, so one per-resource evaluation +
    * an interval join against the revision windows is equivalent);
    * each output bucket is weighted by
    * `usage_coefficient = overlap / granularity` (api.py:244-259,
    * 462-470) and same-bucket values within a group are summed
    * (api.py:231-241). Output: `(groupby..., bucket, value)`.
    *
    * Per `truncate_resource_time_window` (api.py:356-381) every
    * revision window clamps to `[from, to]` and a resource's FIRST
    * MATCHING revision reaches back to the query start (unbounded when
    * none): measures predating it belong to it. The reach-back is
    * computed AFTER the attribute filter, as the reference does — its
    * Grouper truncates the rows `list_resources(history=True,
    * attribute_filter=...)` returned (api.py:301-309, 325-353), so a
    * filter that excludes the true first revision hands the reach-back
    * to the earliest SURVIVING one. The
    * reference's cross-resource `join_sequential_groups` merge
    * (api.py:213-226) — which DROPS a second resource whose truncated
    * window starts at the same instant — is not reproduced: same-
    * resource merges are coverage-equivalent under the interval-join
    * sum, and the cross-resource row drop is a reference defect.
    */
  def groupByAggregatesHistoryOps(operations: String, granS: Long,
      filterStr: String, groupby: Seq[String],
      fill: Option[String] = None,
      from: Option[java.sql.Timestamp] = None,
      to: Option[java.sql.Timestamp] = None,
      onlyResources: Option[Seq[String]] = None): DataFrame =
    groupByAggregatesHistoryAst(Parser.parse(operations), granS, filterStr,
      groupby, fill, from, to, onlyResources)

  /** AST form of [[groupByAggregatesHistoryOps]] (see
    * [[groupByAggregatesHistory]] for why the convenience door must not
    * round-trip names through the grammar). */
  def groupByAggregatesHistoryAst(ast: graft.ops.Node, granS: Long,
      filterStr: String, groupby: Seq[String],
      fill: Option[String] = None,
      from: Option[java.sql.Timestamp] = None,
      to: Option[java.sql.Timestamp] = None,
      onlyResources: Option[Seq[String]] = None): DataFrame = {
    import graft.ops.GroupedOps
    val pred = Filter.compile(FilterParser.parse(filterStr))
    var hist = resourceHistoryTbl.getOrElse(throw new IllegalStateException(
      "no resource history table — call setResourceHistory(df) first"))
      .filter(pred)
    // onlyResources: the no-granularity REST form evaluates each
    // granularity only over the resources whose OWN common set contains
    // it ([[commonGranularitiesPerResourceHistory]]); restriction is by
    // resource ID, so every kept resource keeps ALL its revisions and
    // the first-revision reach-back is unchanged
    for (ids <- onlyResources) hist = hist.filter(col("id").isin(ids: _*))
    // G4 period filter (api.py:279-299): prune revisions outside the
    // query window before the interval join
    for (f <- from) hist = hist.filter(
      col("revision_end").isNull || col("revision_end") >= f)
    for (t <- to) hist = hist.filter(col("revision_start") < t)
    val fromS = from.map(_.toInstant.getEpochSecond)
    val toS = to.map(_.toInstant.getEpochSecond)
    val negInf = Long.MinValue / 4; val posInf = Long.MaxValue / 4
    // history is catalog-sized by contract (one row per attribute
    // revision) — the per-resource window ranking and the broadcast
    // below both lean on that
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("revision_start"))
    val revs = hist
      .withColumn("__rn", row_number().over(rw))
      .withColumn("rev_start_s",
        when(col("__rn") === 1, lit(fromS.getOrElse(negInf)))
          .otherwise(greatest(unix_timestamp(col("revision_start")),
            lit(fromS.getOrElse(negInf)))))
      .withColumn("rev_end_s",
        least(coalesce(unix_timestamp(col("revision_end")), lit(posInf)),
          lit(toS.getOrElse(posInf))))
      .select((col("id").as("__rid") +: groupby.map(col)) ++
        Seq(col("rev_start_s"), col("rev_end_s")): _*)
    val resIds = hist.select(col("id").as("resource_id")).distinct()
    val per = GroupedOps.run(ast, Seq("__rid"),
      { case (name, method) =>
        val mets = metricsCatalog.getOrElse(sys.error("no metrics catalog"))
          .filter(col("name").rlike(graft.catalog.Fnmatch.regex(name)))
          .join(broadcast(resIds), Seq("resource_id"))
        val ids = mets.select("metric_id").distinct()
          .collect().map(_.getString(0)).toSeq // metric list, as the reference
        ids.foreach(requireAgg(_, method, granS))
        val series = ids.groupBy(metricPolicy).map { case (pol, polIds) =>
          storeOf(pol).getMeasuresMany(polIds, Seq(method), granS, from, to)
        }.reduceOption(_ unionByName _)
          .getOrElse(MetricStore.emptyAggregates(spark)
            .select("metric_id", "method", "bucket", "value"))
        series.join(broadcast(
            mets.select(col("metric_id"), col("resource_id"))), Seq("metric_id"))
          .select(col("resource_id").as("__rid"),
            concat(col("metric_id"), lit("/"), lit(method)).as("sid"),
            col("bucket"), col("value"))
      }, fill)
    // the reference drops NaN/inf per resource slice (processor
    // fill=dropna output contract) BEFORE weighting and group-summing
    val dropped = outputDrop(per, Seq("value"), fill)
      .withColumn("bucket_s", unix_timestamp(col("bucket")).cast("long"))
      .select(col("__rid"), col("bucket_s"), col("value"))
    graft.catalog.HistoryAgg.weightedJoin(dropped, revs, granS,
        "__rid", groupby)
      .withColumn("bucket", col("bucket_s").cast("timestamp"))
      .select((groupby.map(col) ++ Seq(col("bucket"), col("value"))): _*)
  }

  /** P6 output shaping (processor.py:229-272): collect a single-metric
    * read into the reference's triple form, or an `aggregates` result
    * into `ref -> [(bucket, gran, value)]`.
    */
  def shaped(df: DataFrame, granS: Long): Seq[(java.sql.Timestamp, Long, Double)] = {
    // silently picking the LAST column of a multi-series grid would
    // drop the others; and a null cell (fill="null", unaligned grids)
    // would unbox to a fabricated 0.0 — reject the first, skip the
    // second (triples carry present points only)
    val valueCols = df.columns.filterNot(_ == "bucket")
    require(valueCols.length == 1,
      s"shaped() needs exactly one value column, got " +
        s"(${valueCols.mkString(", ")}) — multi-series results use the " +
        "grouped/auto doors")
    val vi = df.columns.indexOf(valueCols.head)
    df.orderBy("bucket").collect().toSeq
      .filter(r => !r.isNullAt(vi))
      .map { r =>
        (r.getAs[java.sql.Timestamp]("bucket"), granS, r.getDouble(vi))
      }
  }

  // ---- durable-catalog replay ---------------------------------------

  /** Apply one journaled catalog event. Map-plane events replay through
    * the SAME public mutators (journal() no-ops while replaying); the
    * events whose live door also touched the measure plane (metric
    * deletion → store expunge) or created entities journaled separately
    * (attach rows) apply their catalog-side residue directly.
    */
  private def replayEvent(evt: org.json4s.JValue): Unit = {
    import org.json4s._
    import graft.catalog.CatalogJson
    def str(v: JValue): String = v.asInstanceOf[JString].s
    def optStr(v: JValue): Option[String] = v match {
      case JString(s) => Some(s); case _ => None
    }
    (evt \ "op") match {
      case JString("policy_create") =>
        createPolicy(CatalogJson.policyFromJson(evt))
      case JString("policy_update") => updatePolicy(str(evt \ "name"),
        (evt \ "definition").asInstanceOf[JArray].arr
          .map(CatalogJson.itemFromJson),
        evt \ "back_window" match {
          case JInt(n) => Some(n.toInt); case JLong(n) => Some(n.toInt)
          case _ => None
        })
      case JString("policy_delete") => deletePolicy(str(evt \ "name"))
      case JString("rule_create") => createPolicyRule(str(evt \ "name"),
        str(evt \ "pattern"), str(evt \ "policy"))
      case JString("rule_rename") =>
        renamePolicyRule(str(evt \ "name"), str(evt \ "new_name"))
      case JString("rule_delete") => deletePolicyRule(str(evt \ "name"))
      case JString("metric_create") => createMetric(str(evt \ "id"),
        str(evt \ "policy"), optStr(evt \ "unit"))
      case JString("metric_creator") =>
        setMetricCreator(str(evt \ "id"), str(evt \ "creator"))
      case JString("metric_delete") =>
        // catalog-side residue only: the store expunge already happened
        // (and persisted) before this event landed
        val ids = (evt \ "ids").asInstanceOf[JArray].arr.map(str)
        ids.foreach { id =>
          metricPolicy.remove(id); metricUnit.remove(id)
          metricCreator.remove(id)
        }
        dropFromMetricsCatalog(ids)
      case JString("metric_attach") =>
        // the metric_create events preceded this one; only the catalog
        // attachment rows replay here. Dedupe against already-attached
        // (resource, name) pairs: under at-least-once journal semantics
        // a rotation racing the mutation-vs-append gap can leave this
        // event in BOTH the snapshot and the journal, and a blind union
        // would duplicate the catalog rows.
        import spark.implicits._
        val rows = (evt \ "rows").asInstanceOf[JArray].arr.map {
          case JArray(List(m, r, n)) => (str(m),
            (r match { case JString(s) => s; case _ => null }), str(n))
          case other => throw new IllegalStateException(s"bad attach: $other")
        }
        catalogLock.synchronized {
          val rids = rows.map(_._2).filter(_ != null).distinct
          val existing: Set[(String, String)] = metricsCatalog.map(
              _.filter(col("resource_id").isin(rids: _*))
                .select("resource_id", "name").collect()
                .map(r => (r.getString(0), r.getString(1))).toSet)
            .getOrElse(Set.empty)
          val fresh = rows.filterNot(r =>
            r._2 != null && existing((r._2, r._3)))
          if (fresh.nonEmpty) {
            val df = fresh.toDF("metric_id", "resource_id", "name")
            metricsCatalog = Some(metricsCatalog
              .map(_.unionByName(df, allowMissingColumns = true))
              .getOrElse(df))
            noteCatalogMutation()
          }
        }
      case JString("metric_detach_all") =>
        val rid = str(evt \ "resource_id")
        catalogLock.synchronized {
          metricsCatalog = metricsCatalog.map(_.withColumn("resource_id",
            when(col("resource_id") === rid, lit(null))
              .otherwise(col("resource_id"))))
          noteCatalogMutation()
        }
      case JString("res_create") => createResource(str(evt \ "tpe"),
        str(evt \ "id"), str(evt \ "json"), optStr(evt \ "creator"))
      case JString("res_patch") =>
        val updates = (evt \ "updates").asInstanceOf[JObject].obj.map {
          case (k, v) => k -> CatalogJson.anyFromJson(v)
        }.toMap
        patchResource(str(evt \ "id"), updates, evt \ "now_s" match {
          case JInt(n) => n.toLong; case JLong(n) => n
          case other => throw new IllegalStateException(s"bad now_s: $other")
        })
      case JString("res_delete") =>
        deleteResources(CatalogJson.filterFromJson(evt \ "filter"))
      case JString("rt_create") =>
        createResourceType(CatalogJson.rtFromJson(evt \ "rt"))
      case JString("rt_patch") =>
        // idempotent re-apply (at-least-once journal): adds whose attr
        // already exists and dels whose attr is already gone skip —
        // a duplicated event otherwise throws mid-replay
        val rtName = str(evt \ "name")
        val have: Set[String] = resourceTypes.get(rtName)
          .map(_.attrs.map(_.name).toSet).getOrElse(Set.empty)
        val adds = (evt \ "add").asInstanceOf[JArray].arr.map {
          case JArray(List(spec, fill)) =>
            (CatalogJson.attrFromJson(spec),
              Option(CatalogJson.anyFromJson(fill)))
          case other => throw new IllegalStateException(s"bad add: $other")
        }.filterNot { case (spec, _) => have(spec.name) }
        val dels = (evt \ "del").asInstanceOf[JArray].arr.map(str)
          .filter(have)
        val updates = (evt \ "update").asInstanceOf[JArray].arr.map {
          case JArray(List(n, req, fill)) => (str(n),
            req.asInstanceOf[JBool].value,
            Option(CatalogJson.anyFromJson(fill)))
          case other => throw new IllegalStateException(s"bad update: $other")
        }
        if (adds.nonEmpty || dels.nonEmpty || updates.nonEmpty)
          patchResourceType(rtName, adds, dels, updates)
      case JString("rt_delete") => deleteResourceType(str(evt \ "name"))
      case other => throw new IllegalStateException(
        s"unknown catalog event: $other")
    }
  }

  /** Load the durable catalog from the current [[catalogStore]]: maps
    * snapshot, frame snapshots, then journal replay through the same
    * mutators (journaling suppressed). Called from the constructor
    * tail and from [[reloadCatalog]].
    */
  private def loadCatalogFromDisk(): Unit = {
    if (catalogStore.loadedGen.isDefined) {
      replayingCatalog = true
      try {
        import org.json4s._
        import graft.catalog.CatalogJson
        // maps.json may be absent for a generation cut implicitly by a
        // journal-only lifetime — the journal then replays over the
        // DEFAULT state, which is exactly what it recorded
        for (maps <- catalogStore.loadMaps()) {
          policies.clear()
          (maps \ "policies").asInstanceOf[JArray].arr
            .map(CatalogJson.policyFromJson).foreach(p => policies(p.name) = p)
          policyRules = (maps \ "rules").asInstanceOf[JArray].arr.map {
            case JArray(List(JString(n), JString(p), JString(a))) => (n, p, a)
            case other => throw new IllegalStateException(s"bad rule: $other")
          }.toVector
          def strMap(v: JValue): Seq[(String, String)] = v match {
            case JObject(fields) => fields.collect {
              case (k, JString(s)) => k -> s
            }
            case _ => Nil
          }
          metricPolicy ++= strMap(maps \ "metric_policy")
          metricUnit ++= strMap(maps \ "metric_unit")
          metricCreator ++= strMap(maps \ "metric_creator")
          (maps \ "resource_types").asInstanceOf[JArray].arr
            .map(CatalogJson.rtFromJson)
            .foreach(rt => resourceTypes(rt.name) = rt)
        }
        resources = catalogStore.loadFrame("resources")
        metricsCatalog = catalogStore.loadFrame("metrics_catalog")
        resourceHistoryTbl = catalogStore.loadFrame("resource_history")
        val events = catalogStore.journalEvents()
        events.foreach { ev =>
          // at-least-once journal: a rotation racing the tiny gap
          // between a mutation and its own append can leave the event
          // in BOTH the snapshot and the new journal. A duplicate
          // CREATE then replays as a 409 and a duplicate DELETE/RENAME
          // as a 404 — both are skips, not corruption (patches and
          // detaches re-apply as same-value no-ops). Any OTHER failure
          // still throws: an event that can't replay for a reason
          // beyond at-least-once duplication is real corruption and
          // must not load half a catalog silently.
          try replayEvent(ev)
          catch {
            case e: graft.api.GraftError.Conflict =>
              System.err.println(
                s"[catalog] skipping duplicate journal event: ${e.getMessage}")
            case e: graft.api.GraftError.NotFound =>
              System.err.println("[catalog] skipping journal event for " +
                s"an already-deleted entity: ${e.getMessage}")
          }
        }
        journaledEvents = events.size
        // seed the rotation bound from the loaded catalog so a reloaded
        // facade doesn't fall back to min-bound rotation cadence; frame
        // rows are folded in at the next snapshot (counting them here
        // would put three Spark jobs on EVERY facade construction)
        lastSnapshotSize = catalogMapEntries
      } finally replayingCatalog = false
    }
  }

  /** Drop every in-memory catalog structure and reload from disk — the
    * read facade's answer to a writer in ANOTHER process advancing the
    * catalog. The reference has no staleness problem by construction:
    * every API worker request is a fresh SQL query against the current
    * indexer state (indexer/sqlalchemy.py:1273-1402); this facade
    * loads once, so read doors probe ([[refreshIfStale]]) and reload
    * here rather than silently serving a dead generation forever.
    * Staged measures are untouched (measure plane), but the
    * MetricStore cache clears: stores derive from POLICY DEFINITIONS,
    * and the advance may carry a policy update/delete+recreate whose
    * new definition only the snapshot records — a same-facade
    * updatePolicy invalidates its store entry, and a reload must
    * invalidate identically or serve measures through the old config.
    */
  private def reloadCatalog(): Unit = {
    System.err.println(s"[catalog] on-disk catalog at $root advanced " +
      "past this facade's loaded state — reloading")
    reloadInProgress = true
    try {
      catalogStore.close()
      stores.clear()
      policies.clear(); policies ++= ArchivePolicy.defaults
      policyRules = Vector.empty
      metricPolicy.clear(); metricUnit.clear(); metricCreator.clear()
      resourceTypes.clear()
      resources = None; metricsCatalog = None; resourceHistoryTbl = None
      framesDirty = false
      journaledEvents = 0
      lastSnapshotSize = 0L
      catalogStore = new graft.catalog.CatalogStore(spark, root)
      loadCatalogFromDisk()
    } finally reloadInProgress = false
  }

  /** Read-door freshness barrier: when the on-disk catalog advanced
    * (cheap probe — one MANIFEST read + a stat per journal segment),
    * reload before serving. Writers never reach the reload: a facade
    * holding the writer lock is fresh by construction (the generation
    * fence), and a stale would-be writer gets a loud Conflict from
    * [[graft.catalog.CatalogStore]] instead. Double-checked under
    * catalogLock so concurrent read doors reload once.
    */
  private def refreshIfStale(): Unit =
    // framesDirty = this facade holds LOCALLY registered frames
    // (setResources/setMetrics) not yet persisted — an auto-reload
    // would silently discard them. Keep serving the local view; the
    // facade's next WRITE hits the generation fence (loud Conflict,
    // documented recovery: reconstruct), which is the honest outcome
    // for un-durable local state that lost the race.
    // The flag is checked BOTH before and after the stale probe: the
    // second volatile read is totally ordered after the (volatile)
    // catalogStore read, so a reader that raced a mid-reload store
    // swap — whose fresh store already reads not-stale — cannot also
    // see the flag cleared, and serializes behind the reload instead
    // of reading half-rebuilt maps.
    if (!replayingCatalog && !framesDirty &&
        (reloadInProgress || catalogStore.stale() || reloadInProgress))
      catalogLock.synchronized {
        if (!framesDirty && catalogStore.stale()) reloadCatalog()
      }

  // ---- constructor TAIL: load the durable catalog -------------------
  // Every field above is initialized before replay touches it. A fresh
  // root is a no-op; an existing catalog loads its snapshot and replays
  // the journal through the mutators (journaling suppressed).
  locally { loadCatalogFromDisk() }
}
