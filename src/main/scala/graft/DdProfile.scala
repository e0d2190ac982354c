package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Scratch profiler for dd6_dup_clusters: times pipeline PREFIXES
  * (the LmProfile pattern — stage deltas name the expensive segment)
  * and the connected-components rounds individually.
  */
object DdProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm scan

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ddprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warm JIT with one full pass
    time("warm_full_dd6") {
      Dedup.duplicateClusters(
        Dedup.minhashLsh(docs, n = 3, numHashes = 64, bands = 16,
          threshold = 0.4)).write.format("noop").mode("overwrite").save()
    }

    val pairs = Dedup.minhashLsh(docs, n = 3, numHashes = 64, bands = 16,
      threshold = 0.4)
    time("pairs_only") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    val nPairs = time("pairs_count") { pairs.count() }
    println(s"[ddprof] n_pairs=$nPairs")

    // materialize the pairs once so CC timing excludes pair generation
    val mat = pairs.localCheckpoint(true)
    val ini = mat
      .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
    val nIni = time("ini_distinct") { ini.count() }
    println(s"[ddprof] n_edges=$nIni")

    def star(edges: DataFrame, large: Boolean): DataFrame = {
      val bi = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = bi.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val j = bi.join(mins, "u")
      val out =
        if (large) j.filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
        else j.filter(col("v") <= col("u") && col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
          .unionAll(mins.filter(col("m") =!= col("u"))
            .select(col("u"), col("m").as("v")))
      out.filter(col("u") =!= col("v")).distinct()
    }
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var cur = ini.localCheckpoint(true)
    var curSig = sig(cur)
    var converged = cur.isEmpty
    var it = 0
    while (!converged && it < 50) {
      val next = time(s"cc_round_$it") {
        star(star(cur, large = true), large = false).localCheckpoint(true)
      }
      val nextSig = time(s"cc_sig_$it") { sig(next) }
      converged = nextSig == curSig &&
        time(s"cc_except_$it") { next.exceptAll(cur).isEmpty }
      cur = next; curSig = nextSig; it += 1
    }
    println(s"[ddprof] cc_iterations=$it final_edges=${curSig._1}")

    time("final_groupby") {
      val nodes = ini.select(explode(array(col("u"), col("v"))).as("id")).distinct()
      nodes.join(cur.select(col("u").as("id"), col("v").as("component")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("component"))
        .groupBy(col("component")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
