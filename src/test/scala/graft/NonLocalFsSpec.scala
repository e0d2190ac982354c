package graft

import graft.ingest.MetricStore
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}

/** Filesystem-contract tests: the store and catalog planes assume
  * atomic create/rename; an object-store-profile filesystem (emulated
  * by [[ObjectStoreFs]]) must be refused loudly unless the deployment
  * explicitly accepts the single-writer contract — and once accepted,
  * the full ingest/read path must still be CORRECT through non-atomic
  * renames (they cost copies, not correctness, under one writer).
  */
class NonLocalFsSpec extends SparkSpec {

  private def policy = ArchivePolicy("obj", 0,
    Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
    Set("mean"))

  private def objRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.objstore.impl", classOf[ObjectStoreFs].getName)
    "objstore://" +
      java.nio.file.Files.createTempDirectory("graft-obj").toString
  }

  test("store open on an object-store scheme refuses loudly without " +
      "the single-writer acceptance flag; catalog open likewise") {
    val root = objRoot()
    val e = intercept[IllegalStateException](
      new MetricStore(spark, s"$root/store", policy))
    assert(e.getMessage.contains("objstore") &&
      e.getMessage.contains("atomic"), e.getMessage)
    val e2 = intercept[IllegalStateException](
      new graft.api.Graft(spark, s"$root/graft"))
    assert(e2.getMessage.contains("objstore") &&
      e2.getMessage.contains("atomic"), e2.getMessage)
  }

  test("with the contract accepted, warm ingest + reads run end to end " +
      "through non-atomic copy+delete renames (single writer)") {
    val root = objRoot()
    spark.conf.set("spark.graft.store.acceptNonAtomicFs", "true")
    try {
      val store = new MetricStore(spark, s"$root/store", policy)
      store.addMeasures(measures(("m", "2014-01-01 12:00:01", 1.0)))
      // warm batch: swapWrite's delete+rename path through the shim
      store.addMeasures(measures(("m", "2014-01-01 12:00:31", 3.0),
        ("m", "2014-01-01 12:01:01", 5.0)))
      val got = store.getMeasures("m", "mean", 60)
        .collect().map(r => (r.getTimestamp(1).toString, r.getDouble(2)))
        .toSeq.sortBy(_._1)
      assert(got == Seq(("2014-01-01 12:00:00.0", 2.0),
        ("2014-01-01 12:01:00.0", 5.0)))
      // catalog plane: journal + snapshot + restart round-trip through
      // the shim's non-atomic rename (still correct: single writer)
      val g = new graft.api.Graft(spark, s"$root/graft")
      g.createPolicy(policy)
      g.createMetric("cm", "obj")
      g.addMeasures("cm", Seq(("2014-01-01 12:00:01", 7.0)))
      g.process()
      g.close()
      val g2 = new graft.api.Graft(spark, s"$root/graft")
      assert(g2.getMeasures("cm", "mean").map(_._3) == Seq(7.0))
      g2.close()
      // maintenance plane through the shim: compaction, expunge, and
      // retention expiry are all swapWrite/delete shapes — correct
      // under copy+delete renames with a single writer
      val store2 = new MetricStore(spark, s"$root/store", policy)
      store2.compact()
      assert(store2.getMeasures("m", "mean", 60).count() == 2)
      store2.addMeasures(measures(("gone", "2014-01-01 12:00:05", 9.0)))
      store2.expungeMetric("gone")
      assert(store2.getMeasures("gone", "mean", 60).isEmpty)
      assert(store2.getMeasures("m", "mean", 60).count() == 2)
    } finally spark.conf.unset("spark.graft.store.acceptNonAtomicFs")
  }
}
