package graft

import graft.catalog._
import graft.model.{ArchivePolicy, Granularity}

class CatalogSpec extends SparkSpec {

  test("string grammar: precedence and parentheses (rest/api.py:1298-1378)") {
    val f = FilterParser.parse("(a = 1 and not b > 2) or c in [1, 2]")
    assert(f == Filter.Or(Seq(
      Filter.And(Seq(
        Filter.Cmp("=", "a", 1L),
        Filter.Not(Filter.Cmp(">", "b", 2L)))),
      Filter.In("c", Seq(1L, 2L)))))
  }

  test("string grammar: quoted strings, bools, null, like") {
    val f = FilterParser.parse("name like \"abc%\" and alive = true and gone = null")
    assert(f == Filter.And(Seq(
      Filter.And(Seq(
        Filter.Like("name", "abc%"),
        Filter.Cmp("=", "alive", true))),
      Filter.Cmp("=", "gone", null))))
  }

  test("!= is null-safe (sqlalchemy.py:1593-1595)") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1)), ("b", None), ("c", Some(2)))
      .toDF("k", "v")
    val got = df.filter(Filter.compile(Filter.Cmp("!=", "v", 1)))
      .select("k").collect().map(_.getString(0)).toSet
    assert(got == Set("b", "c")) // null row kept
  }

  test("empty IN is false (sqlalchemy.py:1462-1466)") {
    val s = spark
    import s.implicits._
    val df = Seq(1, 2).toDF("v")
    assert(df.filter(Filter.compile(Filter.In("v", Nil))).count() == 0)
  }

  test("archive policy method algebra (archive_policy.py:116-142)") {
    assert(ArchivePolicy.resolveMethods(Set("*")) == ArchivePolicy.basicMethods)
    assert(ArchivePolicy.resolveMethods(Set("+95pct")) ==
      ArchivePolicy.defaultMethods + "95pct")
    assert(ArchivePolicy.resolveMethods(Set("-mean")) ==
      ArchivePolicy.defaultMethods - "mean")
    assert(ArchivePolicy.resolveMethods(Set("mean", "max")) == Set("mean", "max"))
  }

  test("policy item completion: timespan = granularity * points") {
    val item = graft.model.ArchivePolicyItem(
      Granularity.seconds(300), Some(12L), None).completed
    assert(item.timespanNs.contains(300L * 12 * 1_000_000_000L))
  }

  test("granularity parse: seconds, suffixes, calendar tokens") {
    assert(Granularity.parse("300") == Granularity.seconds(300))
    assert(Granularity.parse("5m") == Granularity.seconds(300))
    assert(Granularity.parse("1h") == Granularity.seconds(3600))
    assert(Granularity.parse("W") == Granularity.Calendar("W"))
  }

  test("default policies match the reference (archive_policy.py:266-305)") {
    val high = ArchivePolicy.defaults("high")
    assert(high.definition.size == 3)
    assert(high.aggregations.size == 18) // 3 granularities × 6 methods
  }
}
