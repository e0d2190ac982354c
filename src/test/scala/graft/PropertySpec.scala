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
}
