package graft.schema

/**
 * Chained schema-update API — the reference's `updateSchema(table)`
 * builder (/root/reference/lib/tostore.dart:1083-1102: addField /
 * removeField / renameField / modifyField). `apply()` performs ONE atomic
 * table rewrite and re-registers the schema.
 *
 * Differences from the reference, by design: the rewrite is synchronous
 * (no task id / migration status to poll — the reference migrates in
 * background isolates; see COVERAGE "Migration task status"), and
 * `modifyField` takes a Scala transform of the declared `FieldSchema`
 * (type changes cast, constraint changes apply to FUTURE writes).
 *
 * Renames PRESERVE data: the physical rename happens before the
 * reconcile-select, and the primary key, unique indexes and FK fields
 * follow the rename. `modifyField` addresses fields by their NEW name
 * when combined with a rename in the same chain.
 */
final case class SchemaUpdateBuilder(
    engine: graft.Graft,
    table: String,
    adds: Seq[FieldSchema] = Nil,
    removes: Seq[String] = Nil,
    renames: Seq[(String, String)] = Nil,
    mods: Seq[(String, FieldSchema => FieldSchema)] = Nil) {

  def addField(f: FieldSchema): SchemaUpdateBuilder = copy(adds = adds :+ f)
  def addField(name: String, dtype: GType, nullable: Boolean = true,
      defaultValue: Option[Any] = None): SchemaUpdateBuilder =
    addField(FieldSchema(name, dtype, nullable = nullable, defaultValue = defaultValue))
  def removeField(name: String): SchemaUpdateBuilder = copy(removes = removes :+ name)
  def renameField(from: String, to: String): SchemaUpdateBuilder =
    copy(renames = renames :+ (from -> to))
  def modifyField(name: String)(f: FieldSchema => FieldSchema): SchemaUpdateBuilder =
    copy(mods = mods :+ (name -> f))

  /** One atomic rewrite + registry update. */
  def apply(): Unit = engine.applySchemaUpdate(this)
}
