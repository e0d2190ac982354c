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

  test("missing required attribute column errors") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException](
      instanceType.validate(Seq(("r1", 2.0)).toDF("id", "vcpus")))
    assert(e.getMessage.contains("flavor"))
  }
}
