package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.ingest.PromProto

/** Property tests for the invariants most likely to break on edge
  * inputs: the protobuf wire codec round trip and keyset pagination
  * completeness under arbitrary sorts/markers.
  */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("PromProto: encode→decode is identity for any WriteRequest") {
    val genLabel = for {
      n <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
      v <- Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)
    } yield (n, v)
    val genSample = for {
      ts <- Gen.chooseNum(0L, 4_102_444_800_000L)
      v <- Gen.oneOf(Gen.chooseNum(-1e18, 1e18), Gen.oneOf(
        Seq(0.0, -0.0, Double.MaxValue, Double.MinPositiveValue,
          Double.NegativeInfinity, Double.PositiveInfinity)))
    } yield (ts, v)
    val genSeries = for {
      labels <- Gen.mapOf(genLabel)
      samples <- Gen.listOf(genSample)
    } yield PromProto.Series(labels, samples)
    check(Prop.forAll(Gen.listOfN(5, genSeries)) { series =>
      val bytes = PromProto.encodeWriteRequest(series)
      val back = PromProto.parseWriteRequest(
        org.xerial.snappy.Snappy.uncompress(
          org.xerial.snappy.Snappy.compress(bytes)))
      back == series
    }, n = 100)
  }

  test("Amqp: encode→decode is identity for any body/props (incl. unicode)") {
    import graft.ingest.Amqp
    val genStr = Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableChar, Gen.oneOf('é', 'λ', '中', '\n', '"')))
      .map(_.mkString)
    val genMsg = for {
      body <- genStr
      ct <- Gen.oneOf("application/json", "text/plain", "x/" + "y" * 300)
      subj <- Gen.option(genStr)
      props <- Gen.mapOf(Gen.zip(
        Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString), genStr))
    } yield (body, ct, subj, props)
    check(Prop.forAll(genMsg) { case (body, ct, subj, props) =>
      val m = Amqp.parseMessage(Amqp.encodeMessage(
        body.getBytes("UTF-8"), ct, subj, props))
      m.body == body && m.contentType.contains(ct) &&
        m.subject == subj && m.appProperties == props
    }, n = 150)
  }

  test("remove_spans: native walk == interval-set reference, any spans") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val gen = for {
      n <- Gen.chooseNum(0, 40)
      words <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd"))
      w <- Gen.chooseNum(1, 6)
      starts <- Gen.listOf(Gen.chooseNum(0, math.max(n - 1, 0)))
    } yield (words, starts.distinct.sorted, w)
    check(Prop.forAll(gen) { case (words, starts, w) =>
      val covered = starts.flatMap(st => st until math.min(st + w, words.size)).toSet
      val expKept = words.zipWithIndex.collect {
        case (word, i) if !covered.contains(i) => word }
      val row = Seq((words, starts)).toDF("words", "starts")
        .select(call_function("remove_spans", col("words"),
          col("starts").cast("array<int>"), lit(w)).as("r"))
        .select(col("r.clean"), col("r.n_kept")).head()
      row.getString(0) == expKept.mkString(" ") && row.getInt(1) == expKept.size
    }, n = 60)
  }

  test("asofJoin: window formulation == per-row reference, any streams") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val gen = for {
      nl <- Gen.chooseNum(0, 25)
      nr <- Gen.chooseNum(0, 25)
      lefts <- Gen.listOfN(nl, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.chooseNum(0L, 50L)))
      rights <- Gen.listOfN(nr, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.chooseNum(0L, 50L)))
    } yield (lefts.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      rights.map { case (k, t) => (k, t) }.distinct
        .map { case (k, t) => (k, t, k.hashCode + t * 3.0) })
    check(Prop.forAll(gen) { case (lefts, rights) =>
      val got = graft.timeseries.TimeSeriesOps.asofJoin(
          lefts.toDF("k", "t", "lid"), rights.toDF("k", "t", "v"),
          Seq("k"), "t", "t")
        .select("lid", "asof_v").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      lefts.forall { case (k, t, lid) =>
        val exp = rights.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        got(lid) == exp
      }
    }, n = 40)
  }

  test("sessionize: islands == per-row reference, any gaps") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val gen = for {
      n <- Gen.chooseNum(0, 30)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b"),
        Gen.chooseNum(0L, 400L)))
      gap <- Gen.chooseNum(1L, 60L)
    } yield (rows.map(r => (r._1, r._2)).distinct, gap)
    check(Prop.forAll(gen) { case (rows, gap) =>
      val df = rows.toDF("k", "sec")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val got = graft.timeseries.TimeSeriesOps
        .sessionize(df, Seq("k"), "ts", gap)
        .select("k", "sec", "session_id").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      rows.groupBy(_._1).forall { case (k, ks) =>
        val ts = ks.map(_._2).sorted
        val sessIds = ts.scanLeft((0L, Long.MinValue / 4)) {
          case ((sid, prev), t) =>
            (if (t - prev > gap) sid + 1 else sid, t)
        }.tail
        ts.zip(sessIds).forall { case (t, (sid, _)) =>
          got((k, t)) == sid }
      }
    }, n = 40)
  }

  test("merge: packed hash-agg fast path == window general path, any batches") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // order keys unique per (key, ts) group by construction (the
    // orderUnique contract): the global row index
    val gen = for {
      nNew <- Gen.chooseNum(0, 25)
      nOld <- Gen.chooseNum(0, 25)
      rows <- Gen.listOfN(nNew + nOld, Gen.zip(Gen.oneOf("a", "b"),
        Gen.chooseNum(0L, 12L), Gen.chooseNum(-50.0, 50.0)))
    } yield {
      val idx = rows.zipWithIndex.map { case ((k, t, v), i) =>
        (k, t, v, i.toLong) }
      (idx.take(nNew), idx.drop(nNew))
    }
    check(Prop.forAll(gen) { case (newRows, oldRows) =>
      def df(rs: Seq[(String, Long, Double, Long)]) =
        rs.toDF("k", "t", "v", "ord")
      def run(bound: Long) = graft.timeseries.TimeSeriesOps.merge(
          df(newRows), df(oldRows), Seq("k"), "t", col("ord"),
          orderBound = bound)
        .select("k", "t", "v", "ord").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
      run(200L) == run(0L) // fast path vs row_number window path
    }, n = 40)
  }

  test("store ingest: any incremental batch split == one-shot, any data") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    def newStore() = {
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      // back window wide enough that NO batch order rejects points —
      // the invariant under test is the incremental recompute, not
      // acceptance (IngestSpec pins acceptance separately)
      new graft.ingest.MetricStore(s, dir,
        graft.model.ArchivePolicy("p", 1000,
          Seq(graft.model.ArchivePolicyItem(
            graft.model.Granularity.seconds(60), None, None)),
          Set("mean", "max", "count")))
    }
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("m", "n"),
        Gen.chooseNum(0L, 600L), Gen.chooseNum(-10.0, 10.0)))
      cut <- Gen.chooseNum(0, n)
    } yield (rows.map { case (k, t, v) => (k, t, v) }
      .groupBy(r => (r._1, r._2)).values.map(_.head).toList, cut)
    check(Prop.forAll(gen) { case (rows, cut0) =>
      val cut = math.min(cut0, rows.size)
      def df(rs: Seq[(String, Long, Double)]) = rs
        .toDF("metric_id", "sec", "value")
        .select(col("metric_id"), timestamp_seconds(col("sec"))
          .as("timestamp"), col("value"))
      val inc = newStore()
      if (rows.take(cut).nonEmpty) inc.addMeasures(df(rows.take(cut)))
      if (rows.drop(cut).nonEmpty) inc.addMeasures(df(rows.drop(cut)))
      val full = newStore()
      full.addMeasures(df(rows))
      def dump(st: graft.ingest.MetricStore) = st.aggregates
        .select("metric_id", "method", "bucket", "value").collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getTimestamp(2).getTime, r.getDouble(3))).toSet
      dump(inc) == dump(full)
    }, n = 15)
  }

  test("PromProto: NaN samples survive the wire bit-exactly") {
    val s = PromProto.Series(Map("__name__" -> "up"),
      Seq((1L, Double.NaN)))
    val back = PromProto.parseWriteRequest(
      PromProto.encodeWriteRequest(Seq(s)))
    assert(back.head.samples.head._2.isNaN)
  }

  test("Pagination: pages concatenate to the full total order, any sort") {
    val s = spark
    import s.implicits._
    // non-unique sort values force tiebreaker correctness
    val genRows = Gen.listOfN(60, for {
      a <- Gen.chooseNum(0, 5)
      b <- Gen.oneOf("x", "y", "z")
    } yield (a, b))
    val genSorts = Gen.someOf(Seq(
      ("a", true), ("a", false), ("b", true), ("b", false))).map(_.toList)
    check(Prop.forAll(genRows, genSorts) { (rows, sorts0) =>
      // at most one direction per column, id tiebreaker appended by impl
      val sorts = sorts0.distinctBy(_._1)
      val df = rows.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
      val pageSize = 7
      // ground truth: one full ordered scan
      val order = sorts.map { case (c, asc) =>
        if (asc) org.apache.spark.sql.functions.col(c).asc
        else org.apache.spark.sql.functions.col(c).desc
      } :+ org.apache.spark.sql.functions.col("id").asc
      val full = df.orderBy(order: _*).select("id")
        .collect().map(_.getLong(0)).toSeq
      // paged: follow markers to exhaustion
      var marker: Option[Any] = None
      val acc = scala.collection.mutable.ArrayBuffer[Long]()
      var done = false
      while (!done) {
        val page = graft.catalog.Pagination(df, sorts, "id", marker, pageSize)
          .select("id").collect().map(_.getLong(0)).toSeq
        acc ++= page
        if (page.size < pageSize) done = true else marker = Some(page.last)
      }
      acc.toSeq == full
    }, n = 30)
  }

  test("repetition_signals: native == reference semantics, any text") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // plain-Scala reference for the pinned Column semantics
    def ref(text: String): (Int, Int, Int, Int) = {
      val lines = text.split("\n", -1).filter(_.exists(_ != ' '))
      val nLines = lines.length
      val nDup = nLines - lines.distinct.length
      val toks = text.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val top = if (grams.isEmpty) 0 else grams.groupBy(identity).values.map(_.size).max
      (nLines, nDup, grams.size, top)
    }
    val token = Gen.oneOf("aa", "bb", "cc", "the", "x,y", "Zz", " ", "\t",
      "\n", "  ", "aa aa")
    val genText = Gen.listOf(token).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(25, genText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = df.select(col("doc_id"),
          call_function("repetition_signals", col("text")).as("r"))
        .select("doc_id", "r.n_lines", "r.n_dup_lines", "r.n_grams", "r.top_gram")
        .collect()
        .map(r => (r.getLong(0),
          (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
      texts.zipWithIndex.forall { case (t, i) => got(i.toLong) == ref(t) }
    }, n = 40)
  }

  test("packChunks: offsets tile the token stream exactly, any corpus") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val genDocs = Gen.listOfN(40, for {
      src <- Gen.oneOf("a", "b", "c")
      nw <- Gen.chooseNum(0, 12)
    } yield (src, List.fill(nw)("w").mkString(" ")))
    check(Prop.forAll(genDocs, Gen.chooseNum(1, 20)) { (docs, budget) =>
      val df = docs.zipWithIndex
        .map { case ((src, t), i) => (i.toLong, src, t) }
        .toDF("doc_id", "source", "text")
      val got = graft.llm.Pipeline.packChunks(df,
          graft.llm.TextAnalysis.wordCount(col("text")), budget, "source")
        .select("source", "doc_id", "token_offset", "first_win", "last_win")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(t => (t._1, t._2))
      val toks = docs.zipWithIndex
        .map { case ((src, t), i) =>
          ((src, i.toLong), t.split(" ").count(_.nonEmpty).toLong) }
        .sortBy(_._1)
      // ground truth: sequential scan in (source, id) order
      var cum = 0L
      val ok = got.zip(toks).forall { case ((_, _, off, fw, lw), (_, n)) =>
        val expFw = cum / budget
        val expLw = (cum + math.max(n, 1) - 1) / budget
        val pass = off == cum && fw == expFw && lw == expLw
        cum += n
        pass
      }
      ok && cum == toks.map(_._2).sum
    }, n = 40)
  }

  test("chunkDocs: windows == per-doc reference slicing, any corpus/params") {
    val s = spark
    import s.implicits._
    val genDoc = Gen.chooseNum(0, 20).flatMap(nw =>
      Gen.listOfN(nw, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)))
    val genParams = for {
      size <- Gen.chooseNum(1, 12)
      stride <- Gen.chooseNum(1, size)
    } yield (size, stride)
    check(Prop.forAll(Gen.listOfN(15, genDoc), genParams) {
      case (docsW, (size, stride)) =>
        val df = docsW.zipWithIndex
          .map { case (w, i) => (i.toLong, w.mkString(" ")) }
          .toDF("doc_id", "text")
        val got = graft.llm.Pipeline.chunkDocs(df, size, stride)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getString(4))).toSet
        val exp = docsW.zipWithIndex.flatMap { case (w, i) =>
          val n = w.length
          (0 until n by stride).zipWithIndex.map { case (st, k) =>
            val nt = math.min(size, n - st)
            (i.toLong, k.toLong, st.toLong, nt.toLong,
              w.slice(st, st + nt).mkString(" "))
          }
        }.toSet
        got == exp
    }, n = 30)
  }

  test("hashSplit: exhaustive, deterministic, content-independent") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.listOfN(30, Gen.chooseNum(0L, 1_000_000L))) { ids0 =>
      val ids = ids0.distinct
      val df = ids.map(i => (i, s"text-$i")).toDF("doc_id", "text")
      val got = graft.llm.Pipeline.hashSplit(df)
        .select("doc_id", "split").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      // every doc gets exactly one of the three labels, and relabeling
      // the text changes nothing (split depends only on the id)
      val relabeled = graft.llm.Pipeline.hashSplit(
          ids.map(i => (i, "other")).toDF("doc_id", "text"))
        .select("doc_id", "split").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      got.values.forall(Set("train", "val", "test")) && relabeled == got
    }, n = 20)
  }

  test("decontaminate: flags exactly the docs sharing an n-gram") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val genDoc = Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    check(Prop.forAll(Gen.listOfN(12, genDoc), Gen.listOfN(2, genDoc)) {
      (corpus, bench) =>
        val cdf = corpus.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val bdf = bench.zipWithIndex
          .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
        val got = graft.llm.Pipeline.decontaminate(cdf, bdf, n = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        def grams(t: String): Set[String] =
          t.split(" ").filter(_.nonEmpty).sliding(2).filter(_.size == 2)
            .map(_.mkString(" ")).toSet
        val bg = bench.flatMap(grams).toSet
        val exp = corpus.zipWithIndex.flatMap { case (t, i) =>
          val hits = grams(t).intersect(bg).size
          if (hits > 0) Some((i.toLong, hits.toLong)) else None
        }.toMap
        got == exp
    }, n = 30)
  }

  private val genVec: Gen[Seq[Double]] = for {
    d <- Gen.chooseNum(1, 8)
    v <- Gen.listOfN(d, Gen.oneOf(
      Gen.chooseNum(-10.0, 10.0),
      Gen.oneOf(Seq(0.0, -0.0, 1.0, -1.0, 0.5))))
  } yield v

  test("lsh_keys: fused kernel == per-table lshBucketCol, any vector") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dims = 5
    val genV = Gen.listOfN(dims, Gen.chooseNum(-10.0, 10.0))
    check(Prop.forAll(Gen.listOfN(8, genV)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val nbits = 6
      val tables = 3
      val fused = df.select(col("id"),
        call_function("lsh_keys", col("v"), lit(nbits), lit(tables)).as("ks"))
      val cols = (0 until tables).map(t =>
        graft.llm.Similarity.lshBucketCol(col("v"), nbits, t, dims).as(s"k$t"))
      val unfused = df.select(col("id") +: cols: _*)
      val a = fused.collect().map(r =>
        (r.getLong(0), r.getSeq[Long](1).toList)).toMap
      val b = unfused.collect().map(r =>
        (r.getLong(0), (0 until tables).map(t => r.getLong(t + 1)).toList)).toMap
      a == b
    }, n = 20)
  }

  test("vec_top_cells: fused argmax == plain-Scala cosine argmax") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dims = 4
    val genV = Gen.listOfN(dims, Gen.chooseNum(-5.0, 5.0))
    check(Prop.forAll(Gen.listOfN(6, genV), Gen.listOfN(5, genV)) {
      (vecs, cents) =>
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v")
        val centsSeq = cents.zipWithIndex.map { case (c, i) => (i, c: Seq[Double]) }
        // compare the cosine as raw BITS: an all-zero centroid/vector
        // yields NaN (0/0) in BOTH arms, but specialized
        // Tuple2[Int, Double] equality uses primitive == where
        // NaN != NaN — the map compare would fail on agreeing NaNs
        def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)
        val got = df.select(col("id"), element_at(
            graft.llm.Similarity.topCellsLocal(col("v"), centsSeq, 1), 1)
            .as("tc"))
          .select(col("id"), col("tc.cell"), col("tc.cosine"))
          .collect()
          .map(r => (r.getLong(0), (r.getInt(1), bits(r.getDouble(2)))))
          .toMap
        def dot(a: Seq[Double], b: Seq[Double]): Double = {
          var s0 = 0.0; var i = 0
          while (i < a.length && i < b.length) { s0 += a(i) * b(i); i += 1 }
          s0
        }
        val exp = vecs.zipWithIndex.map { case (v, i) =>
          val cos = cents.map(c =>
            dot(v, c) / (math.sqrt(dot(v, v)) * math.sqrt(dot(c, c))))
          // (cosine desc, cell asc) with Spark double semantics
          val best = cos.zipWithIndex.reduceLeft { (a, b) =>
            val cmp = if (a._1 == b._1) 0
              else java.lang.Double.compare(a._1, b._1)
            if (cmp >= 0) a else b
          }
          (i.toLong, (best._2, bits(best._1)))
        }.toMap
        got == exp
    }, n = 20)
  }

  test("pq_encode: fused quantizer == plain-Scala n2-2dot argmin") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val m = 2
    val d = 3
    val genV = Gen.listOfN(m * d, Gen.chooseNum(-5.0, 5.0))
    val genBook = Gen.listOfN(m, Gen.listOfN(4, Gen.listOfN(d,
      Gen.chooseNum(-5.0, 5.0))))
    check(Prop.forAll(Gen.listOfN(5, genV), genBook) { (vecs, booksL) =>
      val books: graft.llm.Pq.Codebooks =
        booksL.map(_.map(_.toArray).toArray).toArray
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = graft.llm.Pq.encode(df, books)
        .select(col("vec_id"), col("pq_code"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toMap
      val exp = vecs.zipWithIndex.map { case (v, i) =>
        val codes = (0 until m).map { sIdx =>
          val sub = v.slice(sIdx * d, sIdx * d + d)
          val dists = books(sIdx).map { c =>
            val n2 = c.map(x => x * x).sum
            var dot = 0.0; var j = 0
            while (j < d) { dot += sub(j) * c(j); j += 1 }
            n2 - 2.0 * dot
          }
          dists.zipWithIndex.reduceLeft { (a, b) =>
            val cmp = if (a._1 == b._1) 0
              else java.lang.Double.compare(a._1, b._1)
            if (cmp <= 0) a else b
          }._2
        }.toList
        (i.toLong, codes)
      }.toMap
      got == exp
    }, n = 20)
  }

  test("filter DSL fuzz: random trees render to the string grammar and " +
      "parse back identical; the catalog-journal JSON codec round-trips " +
      "too (R1/R2 + CatalogJson)") {
    import graft.catalog.{Filter, FilterParser, CatalogJson}
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(120012L))
    val attrs = Vector("zone", "n", "flag", "name", "started_at")
    val strs = Vector("east", "a b", "it's", "x\\y", "中文", "a%",
      "3fa85f64-5717-4562-b3fc-2c963f66afa6", "")
    val ops = Vector("=", "<", ">", "<=", ">=", "!=")
    def genVal(): Any = rnd.nextInt(5) match {
      case 0 => strs(rnd.nextInt(strs.size))
      case 1 => rnd.nextInt(2000) - 1000L
      case 2 => (rnd.nextInt(200) - 100) / 4.0 match {
        case d if d == d.floor => d + 0.5 // keep a '.' so it stays Double
        case d => d
      }
      case 3 => rnd.nextBoolean()
      case 4 => null
    }
    def genTree(depth: Int): Filter =
      if (depth == 0) rnd.nextInt(4) match {
        case 0 | 1 => Filter.Cmp(ops(rnd.nextInt(ops.size)),
          attrs(rnd.nextInt(attrs.size)), genVal())
        case 2 => Filter.In(attrs(rnd.nextInt(attrs.size)),
          (1 to 1 + rnd.nextInt(3)).map(_ => genVal()).filter(_ != null)
            match { case Nil => Seq("x"); case vs => vs })
        case 3 => Filter.Like(attrs(rnd.nextInt(attrs.size)),
          strs(rnd.nextInt(strs.size)) + "%")
      }
      else rnd.nextInt(4) match {
        case 0 => Filter.And(Seq(genTree(depth - 1), genTree(depth - 1)))
        case 1 => Filter.Or(Seq(genTree(depth - 1), genTree(depth - 1)))
        case 2 => Filter.Not(genTree(depth - 1))
        case 3 => genTree(0)
      }
    def q(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def rv(v: Any): String = v match {
      case null => "null"
      case s: String => q(s)
      case b: Boolean => b.toString
      case d: Double => d.toString // simple decimals only (no exponent)
      case x => x.toString
    }
    def render(f: Filter): String = f match {
      case Filter.Cmp(op, a, v) => s"$a $op ${rv(v)}"
      case Filter.In(a, vs) => s"$a in [${vs.map(rv).mkString(", ")}]"
      case Filter.Like(a, p) => s"$a like ${q(p)}"
      case Filter.And(Seq(l, r)) => s"(${render(l)} and ${render(r)})"
      case Filter.Or(Seq(l, r)) => s"(${render(l)} or ${render(r)})"
      case Filter.Not(s0) => s"not (${render(s0)})"
      case other => sys.error(s"unrenderable: $other")
    }
    for (k <- 1 to 300) {
      val tree = genTree(1 + rnd.nextInt(3))
      val s = render(tree)
      val reparsed = FilterParser.parse(s)
      assert(reparsed === tree, s"#$k grammar round-trip: $s")
      // the durable-catalog journal codec must round-trip the same tree
      val viaJson = CatalogJson.filterFromJson(CatalogJson.filterToJson(tree))
      assert(viaJson === tree, s"#$k json round-trip: $tree")
    }
  }
}
