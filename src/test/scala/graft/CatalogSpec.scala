package graft

import graft.catalog._
import graft.model.{ArchivePolicy, Granularity}
import org.apache.spark.sql.functions._

class CatalogSpec extends SparkSpec {

  test("keyset pagination pages correctly under a non-unique multi-sort") {
    val s = spark
    import s.implicits._
    // seg is non-unique; sorting by (seg asc, id asc)
    val df = Seq((1L, "b"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "a"),
      (6L, "c"), (7L, "a"), (8L, "b")).toDF("id", "seg")
    val sorts = Seq("seg" -> true)
    val full = df.orderBy(col("seg").asc, col("id").asc)
      .select("id").collect().map(_.getLong(0)).toSeq
    // page through with limit 3, marker = last id of previous page
    var marker: Option[Any] = None
    var got = Seq.empty[Long]
    var page = Pagination(df, sorts, "id", marker, 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    while (page.nonEmpty) {
      got ++= page
      marker = Some(page.last)
      page = Pagination(df, sorts, "id", marker, 3)
        .select("id").collect().map(_.getLong(0)).toSeq
    }
    assert(got == full) // naive `id > marker` drops id 2,3 after marker 4

    // descending primary sort
    val fullDesc = df.orderBy(col("seg").desc, col("id").asc)
      .select("id").collect().map(_.getLong(0)).toSeq
    val p1 = Pagination(df, Seq("seg" -> false), "id", None, 4)
      .select("id").collect().map(_.getLong(0)).toSeq
    val p2 = Pagination(df, Seq("seg" -> false), "id", Some(p1.last), 4)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(p1 ++ p2 == fullDesc)
  }

  test("id@revision history marker (sqlalchemy.py:1325-1343)") {
    val s = spark
    import s.implicits._
    val df = Seq(("r1", 1L), ("r1", 2L), ("r1", 3L), ("r2", 1L), ("r2", 2L))
      .toDF("id", "revision")
    val page = Pagination(df, Seq("id" -> true, "revision" -> true), "id",
      Some("r1@2"), 10)
      .select("id", "revision").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(page == Seq(("r1", 3L), ("r2", 1L), ("r2", 2L)))
  }

  test("fnmatch: * ? and char classes (indexer/__init__.py:460-466)") {
    assert(Fnmatch.matches("cpu.*", "cpu.util"))
    assert(Fnmatch.matches("cpu?util", "cpu.util"))
    assert(!Fnmatch.matches("cpu?util", "cpu..util"))
    assert(Fnmatch.matches("disk[0-9].io", "disk3.io"))
    assert(!Fnmatch.matches("disk[!0-9].io", "disk3.io"))
    assert(!Fnmatch.matches("a+b", "aab")) // regex chars are literal
    assert(Fnmatch.matches("a+b", "a+b"))
    // python fnmatch compiles DOTALL: '*' crosses newlines
    assert(Fnmatch.matches("*", "a\nb"))
    assert(Fnmatch.matches("a*b", "a\nb"))
  }

  test("string grammar: word operators, backslash unescape; empty " +
      "and/or compile to their SQL identities") {
    assert(FilterParser.parse("a ne 1") == Filter.Cmp("ne", "a", 1L))
    assert(FilterParser.parse("a lt 2 and a ge 1") == Filter.And(Seq(
      Filter.Cmp("lt", "a", 2L), Filter.Cmp("ge", "a", 1L))))
    // pyparsing QuotedString(escChar='\\'): every \x pair unescapes
    assert(FilterParser.parse("name = 'a\\\\b'") ==
      Filter.Cmp("=", "name", "a\\b"))
    // unicode boolean forms, like the already-supported ≠/≤/≥
    assert(FilterParser.parse("a = 1 ∧ b = 2") == Filter.And(Seq(
      Filter.Cmp("=", "a", 1L), Filter.Cmp("=", "b", 2L))))
    assert(FilterParser.parse("a = 1 ∨ ¬ b = 2") == Filter.Or(Seq(
      Filter.Cmp("=", "a", 1L), Filter.Not(Filter.Cmp("=", "b", 2L)))))
    // `like null` is a clean parse error, not an NPE-backed 500
    val lk = intercept[IllegalArgumentException](
      FilterParser.parse("name like null"))
    assert(lk.getMessage.contains("like"))
    // '&&' inside a glob class is three literals, not Java class
    // intersection
    assert(Fnmatch.matches("[a&&b]", "&"))
    assert(Fnmatch.matches("[a&&b]", "a"))
    assert(!Fnmatch.matches("[a&&b]", "c"))
    val s = spark
    import s.implicits._
    val df = Seq(("r1", 1L), ("r2", 2L)).toDF("id", "n")
    assert(df.filter(Filter.compile(Filter.And(Nil))).count() == 2)
    assert(df.filter(Filter.compile(Filter.Or(Nil))).count() == 0)
  }

  test("truncated filter expression raises a clean parse error, not " +
      "head-of-empty") {
    val e = intercept[IllegalArgumentException](
      FilterParser.parse("a in [1, 2"))
    assert(e.getMessage.contains("unexpected end"))
    assert(intercept[IllegalArgumentException](
      FilterParser.parse("a =")).getMessage.contains("unexpected end"))
    // empty in-list is the reference's REST 400 (gabbits/search.yaml
    // "empty in_ query string"), raised at parse time
    assert(intercept[IllegalArgumentException](
      FilterParser.parse("id in []")).getMessage
      .contains("at least one value"))
  }

  test("pagination marker: id containing '@' with non-numeric suffix " +
      "resolves as a plain id, not a malformed history marker") {
    val s = spark
    import s.implicits._
    val df = Seq(("user@host", 1L), ("zz", 2L)).toDF("id", "revision")
    val page = Pagination(df, Seq("id" -> true), "id",
      Some("user@host"), 10).select("id").collect().map(_.getString(0))
    assert(page.toSeq == Seq("zz"))
  }

  test("computed filter fields: lifespan and created_by_* (sqlalchemy.py:1541-1568)") {
    val s = spark
    import s.implicits._
    val res = Seq(
      ("r1", "2024-01-01 00:00:00", "2024-01-31 00:00:00", "alice:proj1"),
      ("r2", "2024-01-01 00:00:00", "2024-01-02 00:00:00", "bob:proj2"),
      ("r3", "2024-01-01 00:00:00", null, "alice:proj2"))
      .toDF("id", "started_at", "ended_at", "creator")
      .withColumn("started_at", to_timestamp(col("started_at")))
      .withColumn("ended_at", to_timestamp(col("ended_at")))
    def ids(q: String) =
      res.filter(Filter.compile(FilterParser.parse(q)))
        .select("id").collect().map(_.getString(0)).toSeq.sorted
    assert(ids(s"lifespan > ${7 * 86400}") == Seq("r1"))
    assert(ids("created_by_user_id = \"alice\"") == Seq("r1", "r3"))
    assert(ids("created_by_project_id = \"proj2\"") == Seq("r2", "r3"))
    assert(ids("created_by_user_id = \"alice\" and lifespan < 86401") == Nil)
  }

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

  test("null comparand: '= null' IS NULL, '!= null' IS NOT NULL " +
      "(the live-resource filter `ended_at = null`)") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some("x")), ("b", None)).toDF("k", "ended_at")
    def ks(f: Filter) = df.filter(Filter.compile(f))
      .select("k").collect().map(_.getString(0)).toSet
    assert(ks(FilterParser.parse("ended_at = null")) == Set("b"))
    assert(ks(FilterParser.parse("ended_at != null")) == Set("a"))
    assert(ks(Filter.Cmp("<", "ended_at", null)) == Set.empty)
  }

  test("unquoted UUIDs and ISO dates tokenize as one value " +
      "(pyparsing accepts both unquoted)") {
    assert(FilterParser.parse("id = 3fa85f64-5717-4562-b3fc-2c963f66afa6")
      == Filter.Cmp("=", "id", "3fa85f64-5717-4562-b3fc-2c963f66afa6"))
    assert(FilterParser.parse("started_at >= 2024-01-01T00:00:00")
      == Filter.Cmp(">=", "started_at", "2024-01-01T00:00:00"))
    // plain numbers still lex as numbers
    assert(FilterParser.parse("v > 1000") == Filter.Cmp(">", "v", 1000L))
  }

  test("fnmatch literal-] classes and literal leading ^ " +
      "(python fnmatch.translate semantics)") {
    assert(Fnmatch.matches("[]]", "]"))
    assert(Fnmatch.matches("[!]]", "x") && !Fnmatch.matches("[!]]", "]"))
    assert(Fnmatch.matches("[^]", "^") && !Fnmatch.matches("[^]", "a"))
    assert(Fnmatch.matches("[!abc]", "d") && !Fnmatch.matches("[!abc]", "a"))
  }

  test("archive policy method algebra (archive_policy.py:116-142)") {
    assert(ArchivePolicy.resolveMethods(Set("*")) == ArchivePolicy.basicMethods)
    assert(ArchivePolicy.resolveMethods(Set("+95pct")) ==
      ArchivePolicy.defaultMethods + "95pct")
    assert(ArchivePolicy.resolveMethods(Set("-mean")) ==
      ArchivePolicy.defaultMethods - "mean")
    assert(ArchivePolicy.resolveMethods(Set("mean", "max")) == Set("mean", "max"))
    // the -/+ loop applies AFTER `*` expands (archive_policy.py:126-133)
    assert(ArchivePolicy.resolveMethods(Set("*", "-mean")) ==
      ArchivePolicy.basicMethods - "mean")
    // (the reference applies -/+ entries in Python SET iteration order,
    // so {"*","-x","+x"} is nondeterministic there — not pinned here;
    // this engine applies adds then subs deterministically)
  }

  test("policy item completion: timespan = granularity * points") {
    val item = graft.model.ArchivePolicyItem(
      Granularity.seconds(300), Some(12L), None).completed
    assert(item.timespanNs.contains(300L * 12 * 1_000_000_000L))
    // timespan-only: points floors, timespan RE-DERIVES
    // (archive_policy.py:216-219: 1000s at 300s → points 3, span 900s)
    val t = graft.model.ArchivePolicyItem(
      Granularity.seconds(300), None, Some(1000L * 1_000_000_000L)).completed
    assert(t.points.contains(3L))
    assert(t.timespanNs.contains(900L * 1_000_000_000L))
    // sub-granule timespan → calculated points 0 → loud error
    intercept[IllegalArgumentException](graft.model.ArchivePolicyItem(
      Granularity.seconds(300), None, Some(100L * 1_000_000_000L)).completed)
    // both given: points wins, timespan overwrites (py:221-223)
    val b = graft.model.ArchivePolicyItem(Granularity.seconds(300),
      Some(2L), Some(1000L * 1_000_000_000L)).completed
    assert(b.timespanNs.contains(600L * 1_000_000_000L))
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

  test("ResourceUUID edges: 32-hex canonicalizes, 289-char cap, '/' " +
      "rejects, creator salting (utils.py:38-59)") {
    import graft.catalog.ResourceUuid
    // UUID forms pass through canonicalized (lowercase, dashed)
    assert(ResourceUuid.transform("5A301761AAAA46E289008B4F6FE6675A")
      === "5a301761-aaaa-46e2-8900-8b4f6fe6675a")
    assert(ResourceUuid.transform("5A301761-AAAA-46E2-8900-8B4F6FE6675A")
      === "5a301761-aaaa-46e2-8900-8b4f6fe6675a")
    // exactly 289 transforms; 290 rejects with the reference's message
    val ok289 = "x" * 289
    assert(ResourceUuid.transform(ok289).matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
    val e = intercept[IllegalArgumentException](
      ResourceUuid.transform("x" * 290))
    assert(e.getMessage.contains(">289 max allowed"))
    assert(intercept[IllegalArgumentException](
      ResourceUuid.transform("a/b")).getMessage
      .contains("'/' is not supported"))
    // creator salting: same id, different creator → different uuid;
    // absent creator uses the NUL sentinel (a distinct third value)
    val a = ResourceUuid.transform("web-1", Some("alice"))
    val b = ResourceUuid.transform("web-1", Some("bob"))
    val n = ResourceUuid.transform("web-1", None)
    assert(Set(a, b, n).size === 3)
    // column form agrees on the edge shapes too
    import org.apache.spark.sql.functions.{col, lit}
    val s = spark
    import s.implicits._
    val got = Seq("5A301761AAAA46E289008B4F6FE6675A", ok289, "a/b", "x" * 290)
      .toDF("v")
      .select(ResourceUuid.transformCol(col("v"), lit(null)).as("u"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("5a301761-aaaa-46e2-8900-8b4f6fe6675a"))
    assert(got(1).contains(ResourceUuid.transform(ok289)))
    assert(got(2).isEmpty && got(3).isEmpty) // bulk form: null, not throw
  }

  test("ResourceUUID passthrough accepts every python-uuid.UUID form: " +
      "urn:uuid:, braced, arbitrary dashes (utils.py ResourceUUID " +
      "calls uuid.UUID first)") {
    import graft.catalog.ResourceUuid
    val canonical = "5a301761-aaaa-46e2-8900-8b4f6fe6675a"
    val forms = Seq(
      s"urn:uuid:$canonical",
      s"{$canonical}",
      "{5A301761AAAA46E289008B4F6FE6675A}",
      "5a30-1761aaaa-46e2-89008b4f-6fe6675a", // arbitrary dash placement
      s"urn:uuid:{$canonical}")
    forms.foreach { f =>
      assert(ResourceUuid.transform(f) === canonical, s"scalar: $f")
    }
    // something that is NOT a uuid under python's parse still transforms
    assert(ResourceUuid.transform("urn:uuid:not-a-uuid").matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
    // column form agrees on every form
    import org.apache.spark.sql.functions.{col, lit}
    val s = spark
    import s.implicits._
    val got = forms.toDF("v")
      .select(ResourceUuid.transformCol(col("v"), lit(null)).as("u"))
      .collect().map(_.getString(0))
    assert(got.forall(_ == canonical), got.mkString(","))
  }
}
