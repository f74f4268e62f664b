package graft.schema

import org.apache.spark.sql.types._

/**
 * Logical type system of the engine (reference: tostore `DataType`,
 * /root/reference/lib/src/model/table_schema.dart:1888-1899).
 *
 * Mapping chosen for Spark (SURVEY.md §1.2): integer→Long, bigInt→Decimal(38,0),
 * double→Double, text→String, blob→Binary, boolean→Boolean,
 * datetime→Timestamp, array→Array, vector→Array[Float], json→String.
 */
sealed abstract class GType(val spark: DataType)
object GType {
  case object GInteger  extends GType(LongType)
  case object GBigInt   extends GType(DecimalType(38, 0))
  case object GDouble   extends GType(DoubleType)
  case object GText     extends GType(StringType)
  case object GBlob     extends GType(BinaryType)
  case object GBoolean  extends GType(BooleanType)
  case object GDateTime extends GType(TimestampType)
  final case class GArray(elem: GType) extends GType(ArrayType(elem.spark))
  case object GVector   extends GType(ArrayType(FloatType))
  case object GJson     extends GType(StringType)
}

/** PK generator strategies (reference: table_schema.dart:1917-1932). */
sealed trait PkStrategy
object PkStrategy {
  case object None           extends PkStrategy
  case object Sequential     extends PkStrategy
  case object TimestampBased extends PkStrategy
  case object DatePrefixed   extends PkStrategy
  case object ShortCode      extends PkStrategy
}

/**
 * Primary keys are always TEXT in the reference
 * (table_schema.dart:2032-2036) and sort numeric-string: length first,
 * then lexicographic (value_matcher.dart:121-148) so '2' < '10'.
 */
final case class PrimaryKeyConfig(
    name: String = "id",
    strategy: PkStrategy = PkStrategy.Sequential)

final case class VectorFieldConfig(
    dimensions: Int,
    precision: String = "float32")

/** Reference: FieldSchema (table_schema.dart:1177-1216). */
final case class FieldSchema(
    name: String,
    dtype: GType,
    nullable: Boolean = true,
    defaultValue: Option[Any] = None,
    unique: Boolean = false,
    createIndex: Boolean = false,
    maxLength: Option[Int] = None,
    minLength: Option[Int] = None,
    minValue: Option[Double] = None,
    maxValue: Option[Double] = None,
    defaultCurrentTimestamp: Boolean = false,
    vectorConfig: Option[VectorFieldConfig] = None,
    comment: Option[String] = None)

/** Reference: ForeignKeySchema (table_schema.dart:2814-2886). */
sealed trait FkAction
object FkAction {
  case object Restrict   extends FkAction
  case object Cascade    extends FkAction
  case object SetNull    extends FkAction
  case object SetDefault extends FkAction
  case object NoAction   extends FkAction
}

final case class ForeignKeySchema(
    fields: Seq[String],
    referencedTable: String,
    referencedFields: Seq[String],
    onDelete: FkAction = FkAction.Restrict,
    onUpdate: FkAction = FkAction.Restrict,
    enabled: Boolean = true)

/** Reference: IndexSchema (table_schema.dart:1704,1902-1905). Indexes are
  * semantic-only in Spark: uniqueness drives upsert matching. */
final case class IndexSchema(
    fields: Seq[String],
    unique: Boolean = false,
    indexType: String = "btree")

/** Reference: TableTtlConfig (table_schema.dart:1804-1885). In Spark a TTL
  * becomes a standing scan-time filter + compaction job. */
final case class TtlConfig(ttlMs: Long, sourceField: Option[String] = None)

/** Reference: TableSchema (table_schema.dart:12-57). */
final case class TableSchema(
    name: String,
    primaryKey: PrimaryKeyConfig = PrimaryKeyConfig(),
    fields: Seq[FieldSchema] = Nil,
    indexes: Seq[IndexSchema] = Nil,
    foreignKeys: Seq[ForeignKeySchema] = Nil,
    isGlobal: Boolean = false,
    ttl: Option[TtlConfig] = None) {

  def sparkSchema: StructType = {
    val pkField = StructField(primaryKey.name, StringType, nullable = false)
    StructType(pkField +: fields.map(f =>
      StructField(f.name, f.dtype.spark, f.nullable)))
  }

  def fieldNames: Seq[String] = primaryKey.name +: fields.map(_.name)

  /** All unique key-sets: PK + declared unique indexes + unique fields
    * (reference getAllIndexes, table_schema.dart:79-131). */
  def uniqueKeySets: Seq[Seq[String]] =
    Seq(Seq(primaryKey.name)) ++
      indexes.filter(_.unique).map(_.fields) ++
      fields.filter(_.unique).map(f => Seq(f.name))
}
