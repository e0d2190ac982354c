package graft

import org.apache.spark.sql.functions._
import graft.catalog.ResourceTypes._

class ResourceTypesSpec extends SparkSpec {

  private val instanceType = ResourceType("instance", Seq(
    AttrSpec("flavor", AttrType.Str(maxLength = 8), required = true),
    AttrSpec("vcpus", AttrType.Num(min = Some(1), max = Some(128))),
    AttrSpec("image_ref", AttrType.Uuid),
    AttrSpec("active", AttrType.Bool)))

  test("structType = built-ins + declared attributes with declared types") {
    val st = instanceType.structType
    assert(st.fieldNames.take(2).toSeq == Seq("id", "type"))
    assert(st("flavor").dataType.typeName == "string")
    assert(!st("flavor").nullable)
    assert(st("vcpus").dataType.typeName == "double")
    assert(st("active").dataType.typeName == "boolean")
  }

  test("validate coerces, fills missing optionals, counts violations") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      ("r1", "small", 4, "123e4567-e89b-12d3-a456-426614174000"),
      ("r2", "waytoolongflavor", 4, "123e4567-e89b-12d3-a456-426614174000"),
      ("r3", "small", 999, "not-a-uuid"))
      .toDF("id", "flavor", "vcpus", "image_ref")
    val out = instanceType.validate(raw)
    assert(out.columns.contains("active")) // missing optional -> null col
    assert(out.schema("vcpus").dataType.typeName == "double")
    val v = out.select("id", "__violations").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v == Map("r1" -> 0, "r2" -> 1, "r3" -> 2))
    // default type name filled
    assert(out.select("type").distinct().head().getString(0) == "instance")
  }

  test("a non-null value the type cannot cast is a VIOLATION, not a " +
      "silent null") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      ("r1", "small", "4", "123e4567-e89b-12d3-a456-426614174000"),
      ("r2", "small", "lots", "123e4567-e89b-12d3-a456-426614174000"))
      .toDF("id", "flavor", "vcpus", "image_ref")
    val v = instanceType.validate(raw).select("id", "__violations").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v == Map("r1" -> 0, "r2" -> 1)) // "lots" fails the Num cast
  }

  test("missing required attribute column errors") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException](
      instanceType.validate(Seq(("r1", 2.0)).toDF("id", "vcpus")))
    assert(e.getMessage.contains("flavor"))
  }

  test("a column that is neither built-in nor declared rejects loudly " +
      "(the reference's extra-keys invalid input), not a silent drop") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException](instanceType.validate(
      Seq(("r1", "small", "oops")).toDF("id", "flavor", "undeclared")))
    assert(e.getMessage.contains("extra keys not allowed"))
    assert(e.getMessage.contains("undeclared"))
  }

  test("ALTER: add with fill, required-without-fill rejected, drop") {
    // required + fill backfills existing rows (sqlalchemy.py:394-460)
    val (t2, backfill) = instanceType.addAttribute(
      AttrSpec("region", AttrType.Str(), required = true), Some("eu-1"))
    assert(t2.attrs.exists(_.name == "region"))
    val s = spark
    import s.implicits._
    val df = backfill(Seq(("r1", "small")).toDF("id", "flavor"))
    assert(df.select("region").head().getString(0) == "eu-1")
    // required without fill → the reference's InvalidResourceAttributeOption
    val e = intercept[IllegalArgumentException](instanceType.addAttribute(
      AttrSpec("region", AttrType.Str(), required = true), None))
    assert(e.getMessage.contains("must not be empty if required=True"))
    // optional without fill → null column
    val (_, bf2) = instanceType.addAttribute(
      AttrSpec("zone", AttrType.Str()), None)
    assert(bf2(Seq(("r1", "small")).toDF("id", "flavor"))
      .select("zone").head().isNullAt(0))
    // drop
    val (t3, drop) = t2.removeAttribute("region")
    assert(!t3.attrs.exists(_.name == "region"))
    assert(!drop(df).columns.contains("region"))
    // built-in name clash + bad chars rejected
    intercept[IllegalArgumentException](
      instanceType.addAttribute(AttrSpec("id", AttrType.Str()), None))
    intercept[IllegalArgumentException](
      instanceType.addAttribute(AttrSpec("_bad", AttrType.Str()), None))
  }

  test("facade PATCH alters current + history tables per type slice") {
    val s = spark
    import s.implicits._
    val g = new graft.api.Graft(spark,
      java.nio.file.Files.createTempDirectory("graft-rt").toString)
    g.createResourceType(ResourceType("instance", Seq(
      AttrSpec("flavor", AttrType.Str()))))
    g.setResources(Seq(("r1", "instance", "small"), ("r2", "volume", "big"))
      .toDF("id", "type", "flavor"))
    g.setResourceHistory(Seq(("r1", "instance", "tiny", 1))
      .toDF("id", "type", "flavor", "revision"))
    g.patchResourceType("instance",
      add = Seq((AttrSpec("region", AttrType.Str(), required = true),
        Some("eu-1"))))
    assert(g.resourceType("instance").attrs.map(_.name) ==
      Seq("flavor", "region"))
    val cur = g.searchResources("type = \"instance\"")
      .select("id", "region").collect().map(r => (r.getString(0), r.getString(1)))
    assert(cur.toSeq == Seq(("r1", "eu-1")))
    // untouched type keeps a null in the widened union schema
    val vol = g.searchResources("type = \"volume\"").select("region").head()
    assert(vol.isNullAt(0))
    // deleting an in-use type rejects; after resources drop it succeeds
    val e = intercept[IllegalArgumentException](g.deleteResourceType("instance"))
    assert(e.getMessage.contains("in use"))
    g.deleteResources("type = \"instance\"")
    g.deleteResourceType("instance")
    intercept[IllegalArgumentException](g.resourceType("instance"))
  }
}
