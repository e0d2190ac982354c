package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dynamic resource types (SURVEY §1.1 ResourceType): user-declared
  * attribute schemas built at runtime into a `StructType`
  * (gnocchi/resource_type.py:131-216; per-type SQL tables
  * indexer/sqlalchemy.py:142-257). One DataFrame/table per type; no
  * Catalyst changes needed — the schema is data, not code.
  */
object ResourceTypes {

  sealed trait AttrType { def dataType: DataType }
  object AttrType {
    /** max_length bound enforced by validate() (resource_type.py:131-150) */
    final case class Str(maxLength: Int = 255,
                         minLength: Int = 0) extends AttrType {
      val dataType: DataType = StringType
    }
    case object Uuid extends AttrType { val dataType: DataType = StringType }
    case object Datetime extends AttrType {
      val dataType: DataType = TimestampType
    }
    /** optional numeric range (resource_type.py:171-187) */
    final case class Num(min: Option[Double] = None,
                         max: Option[Double] = None) extends AttrType {
      val dataType: DataType = DoubleType
    }
    case object Bool extends AttrType { val dataType: DataType = BooleanType }
  }

  final case class AttrSpec(name: String, tpe: AttrType,
                            required: Boolean = false)

  /** Built-in columns every resource carries
    * (sqlalchemy_base.py:244-318). */
  val builtinFields: Seq[StructField] = Seq(
    StructField("id", StringType, nullable = false),
    StructField("type", StringType),
    StructField("creator", StringType),
    StructField("user_id", StringType),
    StructField("project_id", StringType),
    StructField("original_resource_id", StringType),
    StructField("started_at", TimestampType),
    StructField("ended_at", TimestampType),
    StructField("revision_start", TimestampType),
    StructField("revision_end", TimestampType))

  /** Attribute-name rule (resource_type.py:82-86): ≤63 chars, starts
    * alphanumeric, no clash with built-in columns. */
  private val validAttrName = "^[a-zA-Z0-9][a-zA-Z0-9_]*$".r
  def requireValidName(n: String): Unit = {
    require(n.length <= 63 && validAttrName.matches(n) &&
      !builtinFields.exists(_.name == n),
      s"invalid resource attribute name: $n")
  }

  final case class ResourceType(name: String, attrs: Seq[AttrSpec]) {
    /** The runtime schema: built-ins + declared attributes. */
    def structType: StructType =
      StructType(builtinFields ++ attrs.map(a =>
        StructField(a.name, a.tpe.dataType, nullable = !a.required)))

    /** Validate + coerce a raw frame against this type: missing
      * optional attributes become null columns, missing required ones
      * error, values are cast to the declared types, and bound checks
      * (string length, numeric range, uuid shape) become a
      * `__violations` count the caller can assert on — invalid ROWS are
      * the reference's 400 path; here they're filterable data.
      */
    def validate(df: DataFrame): DataFrame = {
      val missingRequired = attrs.filter(a =>
        a.required && !df.columns.contains(a.name))
      require(missingRequired.isEmpty,
        s"missing required attributes: ${missingRequired.map(_.name)}")
      // a column that is neither a built-in nor a declared attribute is
      // INVALID INPUT, schema-level (the reference's voluptuous schema
      // rejects extra keys, rest/api.py:1060-1069) — rejecting loudly
      // beats the silent drop the final projection used to apply
      val unknown = df.columns.filterNot(structType.fieldNames.contains)
      require(unknown.isEmpty,
        s"Invalid input: extra keys not allowed: ${unknown.sorted.mkString(", ")}")
      val withAll = structType.fields.foldLeft(df) { (d, f) =>
        if (d.columns.contains(f.name)) d
        else d.withColumn(f.name, lit(null).cast(f.dataType))
      }
      // a non-null value the declared type cannot represent is a
      // VIOLATION, not a silent null (or, under ANSI, a whole-job
      // crash): try_cast nulls on failure, and the check sees the
      // pre-cast value — counted before the fold rewrites each column
      val castViolations = attrs
        .filter(a => df.columns.contains(a.name))
        .map { a =>
          val raw = col(a.name)
          when(raw.isNotNull && raw.try_cast(a.tpe.dataType).isNull, 1)
            .otherwise(0)
        }
        .reduceOption(_ + _).getOrElse(lit(0))
      val withCastViol = withAll.withColumn("__cast_viol", castViolations)
      val casted = structType.fields.foldLeft(withCastViol) { (d, f) =>
        d.withColumn(f.name, col(f.name).try_cast(f.dataType))
      }
      val checks: Seq[org.apache.spark.sql.Column] = attrs.flatMap { a =>
        val c = col(a.name)
        val bounds = a.tpe match {
          case AttrType.Str(maxLen, minLen) =>
            Seq(length(c) <= maxLen, length(c) >= minLen)
          case AttrType.Num(mn, mx) =>
            mn.map(v => c >= v).toSeq ++ mx.map(v => c <= v).toSeq
          case AttrType.Uuid => Seq(c.rlike(
            "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
            "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"))
          case _ => Nil
        }
        val req = if (a.required) Seq(c.isNotNull) else Nil
        (bounds.map(b => c.isNull || b) ++ req)
      }
      val violation = checks
        .map(ok => when(ok, 0).otherwise(1))
        .reduceOption(_ + _).getOrElse(lit(0))
      casted
        .withColumn("type", coalesce(col("type"), lit(name)))
        .withColumn("__violations", violation + col("__cast_viol"))
        .select((structType.fieldNames.toSeq.map(col) :+ col("__violations")): _*)
    }

    /** ALTER: add an attribute (PATCH /v1/resource_type/<name>,
      * resource_type.py:66-104 + indexer/sqlalchemy.py:394-460). A
      * required attribute must carry a `fill` value — existing rows
      * have no value for it (the reference's "must not be empty if
      * required=True"). Returns the new type plus the backfill to map
      * over the type's CURRENT AND HISTORY tables (the reference
      * ALTERs both `tablename` and `tablename_history`).
      */
    def addAttribute(spec: AttrSpec,
                     fill: Option[Any]): (ResourceType, DataFrame => DataFrame) = {
      requireValidName(spec.name)
      require(attrs.forall(_.name != spec.name),
        s"attribute ${spec.name} already exists on type $name")
      require(!spec.required || fill.isDefined,
        s"Option 'fill' of resource attribute ${spec.name} is invalid: " +
          "must not be empty if required=True")
      val next = copy(attrs = attrs :+ spec)
      val backfill: DataFrame => DataFrame = { df =>
        val base =
          if (df.columns.contains(spec.name)) df
          else df.withColumn(spec.name, lit(null).cast(spec.tpe.dataType))
        fill match {
          case Some(v) => base.withColumn(spec.name,
            coalesce(col(spec.name), lit(v).cast(spec.tpe.dataType)))
          case None => base
        }
      }
      (next, backfill)
    }

    /** ALTER: drop an attribute (sqlalchemy.py:417-419 drop_column on
      * both tables). */
    def removeAttribute(attrName: String): (ResourceType, DataFrame => DataFrame) = {
      require(attrs.exists(_.name == attrName),
        s"no attribute $attrName on type $name")
      (copy(attrs = attrs.filterNot(_.name == attrName)), _.drop(attrName))
    }

    /** ALTER: fill remaining nulls of an existing optional attribute
      * when it becomes required (`fill_null_attribute_values`,
      * sqlalchemy.py:409-410 + 462-480). */
    def updateAttribute(attrName: String, required: Boolean,
                        fill: Option[Any]): (ResourceType, DataFrame => DataFrame) = {
      val spec = attrs.find(_.name == attrName).getOrElse(
        throw new IllegalArgumentException(s"no attribute $attrName on type $name"))
      require(!required || spec.required || fill.isDefined,
        s"Option 'fill' of resource attribute $attrName is invalid: " +
          "must not be empty if required=True")
      val next = copy(attrs = attrs.map(a =>
        if (a.name == attrName) a.copy(required = required) else a))
      val backfill: DataFrame => DataFrame = { df =>
        fill match {
          case Some(v) => df.withColumn(attrName,
            coalesce(col(attrName), lit(v).cast(spec.tpe.dataType)))
          case None => df
        }
      }
      (next, backfill)
    }
  }
}
