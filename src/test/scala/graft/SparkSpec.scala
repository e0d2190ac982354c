package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkEntry.configure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  /** (metric, ts, value) measures frame. */
  def measures(rows: (String, String, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (m, t, v) => (m, ts(t), v) }
      .toDF("metric_id", "timestamp", "value")
  }
}
