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
    final case class Str(maxLength: Int = 255) extends AttrType {
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
      val withAll = structType.fields.foldLeft(df) { (d, f) =>
        if (d.columns.contains(f.name)) d
        else d.withColumn(f.name, lit(null).cast(f.dataType))
      }
      val casted = structType.fields.foldLeft(withAll) { (d, f) =>
        d.withColumn(f.name, col(f.name).cast(f.dataType))
      }
      val checks: Seq[org.apache.spark.sql.Column] = attrs.flatMap { a =>
        val c = col(a.name)
        val bounds = a.tpe match {
          case AttrType.Str(maxLen) => Seq(length(c) <= maxLen)
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
        .withColumn("__violations", violation)
        .select((structType.fieldNames.toSeq.map(col) :+ col("__violations")): _*)
    }
  }
}
