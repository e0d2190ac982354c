package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Durable catalog plane under `<root>/_catalog` — the Spark-side
  * analogue of the reference's persistent indexer
  * (indexer/sqlalchemy.py; models at sqlalchemy_base.py:79-318). The
  * measure plane (MetricStore parquet) was already durable; without
  * this, a process restart orphaned every stored aggregate: the data
  * survived but the metric→policy bindings, resource rows, revision
  * history, and rules that make it readable were session memory.
  *
  * Layout (same atomic-rename discipline as MetricStore's split
  * writes):
  * {{{
  *   _catalog/MANIFEST          # {"gen": N} — renamed into place
  *   _catalog/gen_N/maps.json   # driver-bounded catalog maps
  *   _catalog/gen_N/resources/          # parquet, optional
  *   _catalog/gen_N/metrics_catalog/    # parquet, optional
  *   _catalog/gen_N/resource_history/   # parquet, optional
  *   _catalog/journal_N.jsonl   # one JSON event per catalog mutation
  * }}}
  *
  * Write path: each catalog mutation appends ONE journal line (O(1),
  * like the reference's SQL row write — never an O(catalog) rewrite on
  * the mutation hot path); a new GENERATION (full snapshot + journal
  * rotation) is cut when a non-replayable frame registration must be
  * captured, when the journal grows past the rotation bound, or on an
  * explicit persist. Events are flushed per append (durable against
  * process exit — the restart scenario); the snapshot path goes through
  * the filesystem rename barrier.
  *
  * Read path: load `gen_N` maps + frames, then replay `journal_N`
  * through the same facade mutators (with journaling suppressed).
  *
  * Single-WRITER by contract, like the reference's one-indexer
  * deployment — and since round 13 the contract is ENFORCED, not just
  * documented: the first journal write (append or snapshot) takes a
  * token-bearing writer lock (`_catalog/LOCK`, the same atomic-create
  * discipline as MetricStore.withStoreLock) held until [[close]]. A
  * second writer on the same root gets a loud
  * [[graft.api.GraftError.Conflict]] instead of silently interleaving
  * journal segments written under different loaded states. Read-only
  * facades never lock (the reference's many-API-worker analogue: N
  * readers, one writer). A lock whose owning PROCESS is provably dead
  * (same host, pid gone) is broken with a warning; a lock from a live
  * or unverifiable owner must be removed by hand. Acquisition also
  * fences on the GENERATION: if the manifest or journal advanced since
  * this facade loaded, writing would fork history, so the acquisition
  * throws and the caller reconstructs the facade.
  *
  * Durability contract: every append is flushed (and hflushed on
  * streams that support it) — durable against PROCESS EXIT, which is
  * the restart scenario the plane exists for. It is NOT durable
  * against power loss by default: a raw-local flush leaves the page
  * cache in charge, where the reference's SQL WAL fsyncs. Set
  * `spark.graft.catalog.journalSync=force` to hsync (fsync) every
  * event where the stream supports Syncable, trading mutation latency
  * for power-loss durability. Multi-writer atomicity belongs to the
  * MEASURE plane (MetricStore.withStoreLock), not the catalog.
  */
class CatalogStore(spark: SparkSession, root: String) {

  private val dir = s"$root/_catalog"
  // A PRIVATE, raw (checksum-free) filesystem handle: the shared cached
  // LocalFileSystem is checksummed, and its output stream buffers whole
  // 512-byte chunks until close — a flushed journal line would not be
  // on disk, defeating the durability contract. Raw local flush()es
  // straight through. (HDFS-style filesystems are not checksum-wrapped
  // and pass through unchanged.) Resolved via Path.getFileSystem so a
  // SCHEMELESS root lands on the same default filesystem Spark's
  // df.write/spark.read use for the frame snapshots — pinning "file:"
  // here would split the manifest/journal plane from the parquet plane
  // on any cluster whose fs.defaultFS is not file://.
  private val fsOuter = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration) match {
    // getFileSystem returns the CACHED shared instance; newInstance a
    // private one so unwrapping checksums can't affect other users
    case shared =>
      org.apache.hadoop.fs.FileSystem.newInstance(
        shared.getUri, spark.sparkContext.hadoopConfiguration)
  }
  private val fs = fsOuter match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }
  private def path(s: String) = new org.apache.hadoop.fs.Path(s)

  // ---- filesystem contract gate: the writer lock (atomic create +
  // rename-verified stale break) and the MANIFEST swap (delete →
  // rename) both lean on atomic namespace operations. Object stores
  // provide neither — the crash windows this plane carefully
  // enumerates would silently widen — so a non-HDFS-class scheme must
  // be explicitly accepted (single-writer, operator-managed recovery)
  // or the catalog refuses to open.
  locally {
    // via the URI: RawLocalFileSystem (the checksum-unwrapped handle)
    // does not implement getScheme()
    val scheme = fs.getUri.getScheme
    val atomicSchemes =
      Set("file", "hdfs", "viewfs", "o3fs", "ofs", "abfs", "abfss")
    if (!atomicSchemes.contains(scheme) &&
        !spark.conf.getOption("spark.graft.store.acceptNonAtomicFs")
          .contains("true"))
      throw new IllegalStateException(
        s"catalog at $root: filesystem scheme '$scheme' is not known to " +
          "provide the atomic create/rename the catalog's writer lock " +
          "and manifest swap rely on. Move the catalog to an HDFS-class " +
          "filesystem, or pin a SINGLE writer at the deployment level " +
          "and set spark.graft.store.acceptNonAtomicFs=true to accept " +
          "that contract.")
  }

  private val journalLock = new Object
  private var gen: Int = -1
  private var journalOut: Option[java.io.OutputStream] = None

  // ---- writer lock ---------------------------------------------------
  private val lockFile = path(s"$dir/LOCK")
  private val writerToken = java.util.UUID.randomUUID().toString
  private var lockHeld = false
  // canonical key for the same-JVM live-writer registry
  private lazy val dirKey = fs.makeQualified(path(dir)).toString
  private val journalSyncForce =
    spark.conf.getOption("spark.graft.catalog.journalSync")
      .contains("force")

  /** Take the writer lock (idempotent once held). Called at the top of
    * [[append]] and [[snapshot]] — the two write doors — NOT at
    * construction, so read-only facades stay lock- and write-free.
    * Three failure modes, all loud:
    *  - a live facade in THIS JVM holds it → Conflict naming the root;
    *  - a lock from another process: pid provably dead on this host →
    *    broken with a warning; alive or unverifiable → Conflict;
    *  - the catalog ADVANCED since this facade loaded (manifest
    *    generation or journal segment count moved — a previous writer
    *    came and went) → Conflict telling the caller to reconstruct,
    *    because appending under stale in-memory state would fork
    *    history. On `file://` roots the create is java.nio
    *    CREATE_NEW — O_EXCL, genuinely atomic mutual exclusion; on
    *    HDFS-style stores Hadoop's create(overwrite=false) is already
    *    an atomic namespace operation. Either way the stale-break
    *    path re-reads the lock and verifies OUR token landed before
    *    proceeding (create-then-verify), so two writers racing to
    *    break the same dead pid's lock cannot both win.
    */
  private val lockIsLocal = fs.getUri.getScheme == "file"
  private def ensureWriterLock(): Unit = {
    if (lockHeld) return
    val host = java.net.InetAddress.getLocalHost.getHostName
    val pid = ProcessHandle.current().pid()
    val lockBytes =
      s"""{"token":"$writerToken","pid":$pid,"host":"$host"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def tryCreate(): Boolean =
      if (lockIsLocal)
        try {
          // O_EXCL on the local plane: Hadoop's RawLocalFileSystem
          // create(overwrite=false) is check-then-create, a real race
          // window; Files.write(CREATE_NEW) is one atomic syscall
          val p = java.nio.file.Paths.get(lockFile.toUri.getPath)
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, lockBytes,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch { case _: java.io.IOException => false }
      else
        try {
          val o = fs.create(lockFile, false)
          try o.write(lockBytes) finally o.close()
          true
        } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val txt = try {
        val in = fs.open(lockFile)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      } catch { case _: java.io.IOException => "" }
      val j = try JsonMethods.parse(txt) catch { case _: Throwable => JNothing }
      val lockToken = j \ "token" match { case JString(s) => s; case _ => "" }
      val lockHost = j \ "host" match { case JString(s) => s; case _ => "" }
      val lockPid = j \ "pid" match {
        case JInt(n) => n.toLong; case JLong(n) => n; case _ => -1L
      }
      if (lockToken.nonEmpty &&
          CatalogStore.activeWriters.get(dirKey) == lockToken)
        graft.api.GraftError.conflict(
          s"catalog at $root is locked by another live writer facade " +
            "in this process; close it before writing here")
      val holder = ProcessHandle.of(lockPid)
      val provablyDead = lockHost == host && lockPid > 0 &&
        !(holder.isPresent && holder.get.isAlive)
      if (!provablyDead)
        graft.api.GraftError.conflict(
          s"catalog at $root is locked by writer pid $lockPid on " +
            s"$lockHost; if that process is dead, delete $dir/LOCK")
      System.err.println(s"[catalog] breaking stale writer lock of dead " +
        s"pid $lockPid on $root")
      // Break via ATOMIC RENAME to a unique name, not delete: two
      // writers recovering from the SAME dead pid would each read the
      // stale lock, and with delete-then-create the second delete can
      // remove the first winner's FRESH lock (TOCTOU) — both proceed
      // as writers. Rename is atomic on local and HDFS namespaces, so
      // exactly one breaker wins the stale lock; the loser's rename
      // finds the source gone and conflicts out to retry against
      // whatever lock the winner then created.
      val broken = path(s"$dir/LOCK.broken.$writerToken")
      if (!fs.rename(lockFile, broken))
        graft.api.GraftError.conflict(
          s"catalog at $root: another writer broke the same stale lock " +
            "first; retry")
      // Rename-then-VERIFY: between our stale read and our rename,
      // another breaker may have already broken the stale lock and
      // created its own FRESH one — in which case the file we just
      // renamed is a live writer's lock, not the stale one. Re-read
      // what landed under LOCK.broken.<token>: if its token differs
      // from the stale token we decided to break, put it back and
      // conflict out instead of stealing a live lock.
      val brokenTxt = try {
        val in = fs.open(broken)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      } catch { case _: java.io.IOException => "" }
      val brokenToken =
        (try JsonMethods.parse(brokenTxt) catch {
          case _: Throwable => JNothing
        }) \ "token" match { case JString(s) => s; case _ => "" }
      if (brokenToken != lockToken) {
        val restored = fs.rename(broken, lockFile)
        graft.api.GraftError.conflict(
          s"catalog at $root: another writer recovered the stale lock " +
            s"first and now holds a fresh one" +
            (if (restored) "" else
              s" (restore failed — move $dir/LOCK.broken.$writerToken " +
                s"back to $dir/LOCK manually)") + "; retry")
      }
      fs.delete(broken, false)
      if (!tryCreate())
        graft.api.GraftError.conflict(
          s"catalog at $root: another writer took the lock while this " +
            "facade was breaking a stale one; retry")
    }
    // generation fence — under the lock, so nobody can advance it now
    def fenceFail(what: String): Nothing = {
      fs.delete(lockFile, false)
      graft.api.GraftError.conflict(
        s"catalog at $root advanced since this facade loaded ($what); " +
          "reconstruct the facade to write here")
    }
    val mfGen = readManifestGen()
    if (mfGen >= 0) {
      if (mfGen != gen) fenceFail(s"generation $mfGen, loaded $gen")
    } else if (gen >= 0) fenceFail(s"manifest gone, loaded $gen")
    if (gen >= 0) {
      val segsNow = Iterator.from(0).map(segPath(gen, _))
        .takeWhile(fs.exists).size
      if (segsNow != segsAtLoad)
        fenceFail(s"journal segments $segsNow, loaded $segsAtLoad")
    }
    CatalogStore.activeWriters.put(dirKey, writerToken)
    lockHeld = true
  }

  /** Generation found on disk at construction, None for a fresh root.
    * When the MANIFEST is missing but generation snapshots exist (a
    * crash in the manifest's delete→rename window), recovery picks the
    * HIGHEST generation carrying a maps.json — a later snapshot always
    * subsumes everything before it, so the newest complete one is the
    * correct restore point.
    */
  val loadedGen: Option[Int] = {
    val mf = path(s"$dir/MANIFEST")
    val fromManifest: Option[Int] =
      if (!fs.exists(mf)) None
      else {
        val in = fs.open(mf)
        val txt = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        JsonMethods.parse(txt) \ "gen" match {
          case JInt(n)  => Some(n.toInt)
          case JLong(n) => Some(n.toInt)
          case _        => None
        }
      }
    val resolved = fromManifest.orElse {
      if (!fs.exists(path(dir))) None
      else {
        val gens = fs.listStatus(path(dir)).toSeq
          .map(_.getPath.getName)
          .collect { case n if n.startsWith("gen_") =>
            n.stripPrefix("gen_").toIntOption }
          .flatten
          .filter(g => fs.exists(path(s"$dir/gen_$g/maps.json")))
        val best = gens.maxOption
        best.foreach { g =>
          System.err.println(s"[catalog] no MANIFEST under $dir — " +
            s"recovered generation $g from the snapshot scan")
          writeManifest(g)
        }
        best
      }
    }
    resolved.foreach(gen = _)
    resolved
  }

  /** Journal segments present at load time — the writer-lock fence
    * compares against this to detect a writer that came and went after
    * this facade loaded its state. */
  private val segsAtLoad: Int = loadedGen.map(g =>
    Iterator.from(0).map(segPath(g, _)).takeWhile(fs.exists).size)
    .getOrElse(0)

  // ---- read-facade staleness ------------------------------------------
  // What this instance EXPECTS on disk: segment count and total journal
  // bytes for the current generation. Our own appends/rotations move
  // these in step with the filesystem, so [[stale]] reads OUR writes as
  // fresh and only ANOTHER process's writes as staleness.
  private var expectedSegs: Int = segsAtLoad
  private var expectedJournalLen: Long = loadedGen.map(g =>
    Iterator.from(0).map(segPath(g, _)).takeWhile(fs.exists)
      .map(p => fs.getFileStatus(p).getLen).sum).getOrElse(0L)

  /** `{"gen": N}` currently on disk, −1 when absent/unreadable. */
  private def readManifestGen(): Int = {
    val mf = path(s"$dir/MANIFEST")
    if (!fs.exists(mf)) -1
    else try {
      val in = fs.open(mf)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      JsonMethods.parse(txt) \ "gen" match {
        case JInt(n) => n.toInt; case JLong(n) => n.toInt; case _ => -1
      }
    } catch { case _: java.io.IOException => -1 }
  }

  /** True when the on-disk catalog has ADVANCED past this instance's
    * view — another process's writer rotated a generation (MANIFEST
    * moved), opened a fresh journal segment, or appended events
    * (journal bytes grew). The reference's API workers read the
    * CURRENT indexer state on every request
    * (indexer/sqlalchemy.py:1273-1402); this probe is the long-lived
    * read facade's analogue, cheap enough for a read door: one
    * MANIFEST read plus a stat per journal segment. A facade holding
    * the writer lock is never stale — the lock plus the generation
    * fence guarantee nobody else can advance the catalog under it.
    */
  def stale(): Boolean = journalLock.synchronized {
    try {
      if (lockHeld) false
      else if (readManifestGen() != gen) true
      else if (gen < 0) false
      else {
        val segs = Iterator.from(0).map(segPath(gen, _))
          .takeWhile(fs.exists).toVector
        segs.size != expectedSegs ||
          segs.map(p => fs.getFileStatus(p).getLen).sum != expectedJournalLen
      }
    } catch {
      // never throw from the probe: a racing reload can close this
      // instance between a caller's unlocked first check and its
      // locked re-check — "filesystem closed" here means a fresher
      // store is taking over, so report not-stale and let the caller's
      // locked re-check run against the new instance
      case _: java.io.IOException => false
    }
  }

  /** Whether any on-disk catalog state exists yet. */
  def initialized: Boolean = gen >= 0

  /** maps.json of the loaded generation — None when the generation was
    * cut implicitly (journal-only lifetimes before the first snapshot
    * wrote no maps.json); the caller then replays the journal over the
    * DEFAULT state, which is exactly what such a journal contains. */
  def loadMaps(): Option[JValue] = loadedGen.flatMap { g =>
    val p = path(s"$dir/gen_$g/maps.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      Some(JsonMethods.parse(txt))
    }
  }

  /** A frame snapshot of the loaded generation, if it was registered. */
  def loadFrame(name: String): Option[DataFrame] = loadedGen.flatMap { g =>
    val p = s"$dir/gen_$g/$name"
    if (fs.exists(path(p))) Some(spark.read.parquet(p)) else None
  }

  // The journal is a sequence of write-once SEGMENTS (journal_N.jsonl,
  // journal_N_1.jsonl, …): each process lifetime writes a fresh
  // segment, because Hadoop's checksummed LocalFileSystem does not
  // support append(). Replay reads segments in order.
  private def segPath(g: Int, k: Int) = path(
    if (k == 0) s"$dir/journal_$g.jsonl" else s"$dir/journal_${g}_$k.jsonl")

  /** The loaded generation's journal events, in append order across
    * all segments. A TORN FINAL line (the process died mid-write of an
    * event — the raw write is not atomic) is dropped with a warning
    * instead of bricking every subsequent open; a malformed line
    * anywhere else is real corruption and still throws.
    */
  def journalEvents(): Seq[JValue] = loadedGen.toSeq.flatMap { g =>
    val lines = Iterator.from(0).map(segPath(g, _)).takeWhile(fs.exists)
      .flatMap { p =>
        val in = fs.open(p)
        val txt = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        txt.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      }.toVector
    lines.zipWithIndex.flatMap { case (line, i) =>
      try Some(JsonMethods.parse(line))
      catch {
        case e: Throwable if i == lines.size - 1 =>
          System.err.println(s"[catalog] dropping torn journal tail " +
            s"(${line.length} bytes): ${e.getMessage}")
          None
      }
    }
  }

  /** Append one event to the current generation's journal (flushed, so
    * it survives process exit). Cuts generation 0 implicitly on the
    * first event of a fresh root.
    */
  def append(evt: JValue): Unit = journalLock.synchronized {
    ensureWriterLock()
    val out = journalOut.getOrElse {
      if (gen < 0) { gen = 0; writeManifest(0) }
      val k = Iterator.from(0).find(i => !fs.exists(segPath(gen, i))).get
      val o = fs.create(segPath(gen, k))
      journalOut = Some(o)
      expectedSegs = k + 1
      o
    }
    val bytes = (JsonMethods.compact(JsonMethods.render(evt)) + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.write(bytes)
    expectedJournalLen += bytes.length
    out.flush()
    out match {
      case h: org.apache.hadoop.fs.FSDataOutputStream =>
        // hflush = durable against process exit; hsync (conf-gated,
        // spark.graft.catalog.journalSync=force) = fsync per event, the
        // reference's SQL-WAL power-loss contract
        if (journalSyncForce) h.hsync() else h.hflush()
      case _ =>
    }
  }

  /** Cut a new generation: full maps + frame snapshot, fresh journal.
    * The manifest rename is the commit point; a crash mid-snapshot
    * leaves the previous generation intact.
    */
  def snapshot(maps: JValue,
               frames: Map[String, Option[DataFrame]]): Unit =
      journalLock.synchronized {
    ensureWriterLock()
    val next = gen + 1
    val genDir = s"$dir/gen_$next"
    fs.delete(path(genDir), true)
    fs.mkdirs(path(genDir))
    val mp = fs.create(path(s"$genDir/maps.json"))
    try mp.write(JsonMethods.compact(JsonMethods.render(maps))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally mp.close()
    for ((name, Some(df)) <- frames)
      df.write.mode("overwrite").parquet(s"$genDir/$name")
    // fresh journal BEFORE the manifest flips: the commit point must
    // never expose a generation paired with a stale journal
    Iterator.from(0).map(segPath(next, _)).takeWhile(fs.exists)
      .foreach(fs.delete(_, false))
    journalOut.foreach(_.close())
    journalOut = None
    writeManifest(next)
    val prev = gen
    gen = next
    expectedSegs = 0
    expectedJournalLen = 0L
    // Cleanup with ONE generation of GRACE: the caller re-points its
    // frames at `next` right after this returns, but a query already
    // in flight may still hold a plan reading `prev` — deleting it here
    // would fail that read mid-flight. Deleting `prev - 1` instead
    // bounds storage at two generations while giving in-flight readers
    // a full rotation to drain.
    if (prev >= 1) {
      fs.delete(path(s"$dir/gen_${prev - 1}"), true)
      Iterator.from(0).map(segPath(prev - 1, _)).takeWhile(fs.exists)
        .foreach(fs.delete(_, false))
    }
  }

  private def writeManifest(g: Int): Unit = {
    val tmp = path(s"$dir/MANIFEST.tmp")
    fs.delete(tmp, false)
    val o = fs.create(tmp)
    try o.write(s"""{"gen": $g}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally o.close()
    val mf = path(s"$dir/MANIFEST")
    // Hadoop rename won't overwrite, so the delete→rename pair has a
    // manifest-less crash window — the loadedGen snapshot-scan recovery
    // covers it; the rename RESULT is still checked so a silent
    // filesystem refusal can't strand the tmp file as the only copy
    fs.delete(mf, false)
    require(fs.rename(tmp, mf), s"could not publish $mf")
  }

  /** Frame of the CURRENT generation (valid right after [[snapshot]]) —
    * callers re-point their in-memory frames here, because the
    * superseded generation's files are deleted and a plan still reading
    * them would throw FileNotFound on its next action.
    */
  def currentFrame(name: String): Option[DataFrame] =
      journalLock.synchronized {
    if (gen < 0) None
    else {
      val p = s"$dir/gen_$gen/$name"
      if (fs.exists(path(p))) Some(spark.read.parquet(p)) else None
    }
  }

  def close(): Unit = journalLock.synchronized {
    journalOut.foreach(_.close())
    journalOut = None
    if (lockHeld) {
      try fs.delete(lockFile, false) catch { case _: Throwable => () }
      CatalogStore.activeWriters.remove(dirKey, writerToken)
      lockHeld = false
    }
    // newInstance bypasses the Hadoop FS cache, so this instance is
    // ours to close (leaked sockets/threads on HDFS-style filesystems)
    try fsOuter.close() catch { case _: Throwable => () }
  }
}

object CatalogStore {
  /** Live writer-lock holders in THIS JVM, canonical-dir → token. Lets
    * a second facade in the same process fail with a precise message
    * (the pid in the lock file is ours either way); entries leave on
    * [[CatalogStore.close]]. A facade abandoned without close keeps its
    * entry — by contract, close your facades. */
  private val activeWriters =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
}

/** JSON codecs for the catalog plane's driver-side values: archive
  * policies, rules, resource types, filter trees, and the `Any` values
  * riding patch/fill events. Kept beside [[CatalogStore]] so the
  * journal's wire shape has ONE home.
  */
object CatalogJson {
  import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}
  import ResourceTypes.{AttrSpec, AttrType, ResourceType}

  // ---- Any values (patch updates, resource-type fills) ----
  def anyToJson(v: Any): JValue = v match {
    case null                   => JNull
    case None                   => JNull
    case Some(x)                => anyToJson(x)
    case s: String              => JString(s)
    case b: Boolean             => JBool(b)
    case i: Int                 => JLong(i.toLong)
    case l: Long                => JLong(l)
    case f: Float               => JDouble(f.toDouble)
    case d: Double              => JDouble(d)
    case n: BigDecimal          => JDecimal(n)
    case n: java.math.BigDecimal => JDecimal(BigDecimal(n))
    case t: java.sql.Timestamp  =>
      JObject(List("__ts__" -> JLong(t.getTime)))
    case d: java.sql.Date       =>
      JObject(List("__date__" -> JLong(d.getTime)))
    case other => throw new IllegalArgumentException(
      s"unserializable catalog value: $other (${other.getClass})")
  }

  def anyFromJson(v: JValue): Any = v match {
    case JNull | JNothing => null
    case JString(s)  => s
    case JBool(b)    => b
    case JInt(n)     => n.toLong
    case JLong(n)    => n
    case JDouble(n)  => n
    case JDecimal(n) => n
    case JObject(List(("__ts__", JLong(ms)))) => new java.sql.Timestamp(ms)
    case JObject(List(("__ts__", JInt(ms)))) =>
      new java.sql.Timestamp(ms.toLong)
    case JObject(List(("__date__", JLong(ms)))) => new java.sql.Date(ms)
    case JObject(List(("__date__", JInt(ms)))) => new java.sql.Date(ms.toLong)
    case other => throw new IllegalArgumentException(s"bad value: $other")
  }

  // ---- archive policies ----
  def policyToJson(p: ArchivePolicy): JValue = JObject(List(
    "name" -> JString(p.name),
    "back_window" -> JLong(p.backWindow.toLong),
    "methods" -> JArray(p.aggregationMethods.toList.sorted.map(JString(_))),
    "definition" -> JArray(p.definition.toList.map(itemToJson))))

  def itemToJson(i: ArchivePolicyItem): JValue = JObject(List(
    "granularity" -> JString(i.granularity.token),
    "points" -> i.points.map(JLong(_)).getOrElse(JNull),
    "timespan_ns" -> i.timespanNs.map(JLong(_)).getOrElse(JNull)))

  def policyFromJson(v: JValue): ArchivePolicy = ArchivePolicy(
    name = (v \ "name").asInstanceOf[JString].s,
    backWindow = longOf(v \ "back_window").toInt,
    definition = (v \ "definition").asInstanceOf[JArray].arr.map(itemFromJson),
    aggregationMethods = (v \ "methods").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JString].s).toSet)

  def itemFromJson(v: JValue): ArchivePolicyItem = ArchivePolicyItem(
    granularity = Granularity.parse((v \ "granularity").asInstanceOf[JString].s),
    points = optLong(v \ "points"),
    timespanNs = optLong(v \ "timespan_ns"))

  private def longOf(v: JValue): Long = v match {
    case JInt(n) => n.toLong; case JLong(n) => n
    case JDouble(n) => n.toLong
    case other => throw new IllegalArgumentException(s"bad long: $other")
  }
  private def optLong(v: JValue): Option[Long] = v match {
    case JNull | JNothing => None
    case other => Some(longOf(other))
  }

  // ---- resource types ----
  def rtToJson(rt: ResourceType): JValue = JObject(List(
    "name" -> JString(rt.name),
    "attrs" -> JArray(rt.attrs.toList.map(attrToJson))))

  def attrToJson(a: AttrSpec): JValue = {
    val t: JValue = a.tpe match {
      case AttrType.Str(max, min) =>
        JObject(List("kind" -> JString("str"), "max" -> JLong(max.toLong),
          "min" -> JLong(min.toLong)))
      case AttrType.Uuid     => JObject(List("kind" -> JString("uuid")))
      case AttrType.Datetime => JObject(List("kind" -> JString("datetime")))
      case AttrType.Num(mn, mx) => JObject(List(
        "kind" -> JString("num"),
        "min" -> mn.map(JDouble(_)).getOrElse(JNull),
        "max" -> mx.map(JDouble(_)).getOrElse(JNull)))
      case AttrType.Bool     => JObject(List("kind" -> JString("bool")))
    }
    JObject(List("name" -> JString(a.name), "type" -> t,
      "required" -> JBool(a.required)))
  }

  def rtFromJson(v: JValue): ResourceType = ResourceType(
    (v \ "name").asInstanceOf[JString].s,
    (v \ "attrs").asInstanceOf[JArray].arr.map(attrFromJson))

  def attrFromJson(v: JValue): AttrSpec = {
    val t = v \ "type"
    val tpe: AttrType = (t \ "kind").asInstanceOf[JString].s match {
      case "str"      => AttrType.Str(longOf(t \ "max").toInt,
        optLong(t \ "min").map(_.toInt).getOrElse(0))
      case "uuid"     => AttrType.Uuid
      case "datetime" => AttrType.Datetime
      case "num"      => AttrType.Num(
        optDouble(t \ "min"), optDouble(t \ "max"))
      case "bool"     => AttrType.Bool
      case other => throw new IllegalArgumentException(s"bad attr kind: $other")
    }
    AttrSpec((v \ "name").asInstanceOf[JString].s, tpe,
      (v \ "required").asInstanceOf[JBool].value)
  }

  private def optDouble(v: JValue): Option[Double] = v match {
    case JNull | JNothing => None
    case JDouble(n) => Some(n)
    case JInt(n) => Some(n.toDouble)
    case JLong(n) => Some(n.toDouble)
    case other => throw new IllegalArgumentException(s"bad double: $other")
  }

  // ---- filter trees (the reference's wire shape, rest/api.py:1381+) ----
  def filterToJson(f: Filter): JValue = f match {
    case Filter.Cmp(op, attr, value) =>
      JObject(List(op -> JObject(List(attr -> anyToJson(value)))))
    case Filter.In(attr, values) =>
      JObject(List("in" -> JObject(List(
        attr -> JArray(values.toList.map(anyToJson))))))
    case Filter.Like(attr, pat) =>
      JObject(List("like" -> JObject(List(attr -> JString(pat)))))
    case Filter.And(subs) =>
      JObject(List("and" -> JArray(subs.toList.map(filterToJson))))
    case Filter.Or(subs) =>
      JObject(List("or" -> JArray(subs.toList.map(filterToJson))))
    case Filter.Not(sub) =>
      JObject(List("not" -> filterToJson(sub)))
  }

  def filterFromJson(v: JValue): Filter = v match {
    case JObject(List(("and", JArray(subs)))) =>
      Filter.And(subs.map(filterFromJson))
    case JObject(List(("or", JArray(subs)))) =>
      Filter.Or(subs.map(filterFromJson))
    case JObject(List(("not", sub))) => Filter.Not(filterFromJson(sub))
    case JObject(List(("like", JObject(List((attr, JString(p))))))) =>
      Filter.Like(attr, p)
    case JObject(List(("in", JObject(List((attr, JArray(vs))))))) =>
      Filter.In(attr, vs.map(anyFromJson))
    case JObject(List((op, JObject(List((attr, value)))))) =>
      Filter.Cmp(op, attr, anyFromJson(value))
    case other => throw new IllegalArgumentException(s"bad filter: $other")
  }
}
