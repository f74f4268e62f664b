package graft.schema

/**
 * Chained schema-update API — the reference's `updateSchema(table)`
 * builder (/root/reference/lib/tostore.dart:1083-1102: addField /
 * removeField / renameField / modifyField). `apply()` performs ONE atomic
 * table rewrite and re-registers the schema.
 *
 * Differences from the reference, by design: each rewrite is
 * synchronous-atomic — `apply()` migrates the current space only;
 * `applyAsync()` is the reference's task form (all spaces + task id for
 * `queryMigrationTaskStatus`), completed by the time it returns rather
 * than polled (the reference migrates in background isolates; Spark
 * executors are that machinery here). `modifyField` takes a Scala
 * transform of the declared `FieldSchema` (type changes cast,
 * constraint changes apply to FUTURE writes).
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
    mods: Seq[(String, FieldSchema => FieldSchema)] = Nil,
    indexAdds: Seq[IndexSchema] = Nil,
    indexRemoves: Seq[Seq[String]] = Nil,
    fkAdds: Seq[ForeignKeySchema] = Nil,
    fkRemoves: Seq[Seq[String]] = Nil,
    fkMods: Seq[(Seq[String], ForeignKeySchema => ForeignKeySchema)] = Nil,
    pkConfig: Option[PrimaryKeyConfig] = None,
    ttlSet: Option[Option[TtlConfig]] = None, // Some(None) = disableTtl
    newName: Option[String] = None) {

  def addField(f: FieldSchema): SchemaUpdateBuilder = copy(adds = adds :+ f)
  def addField(name: String, dtype: GType, nullable: Boolean = true,
      defaultValue: Option[Any] = None): SchemaUpdateBuilder =
    addField(FieldSchema(name, dtype, nullable = nullable, defaultValue = defaultValue))
  def removeField(name: String): SchemaUpdateBuilder = copy(removes = removes :+ name)
  def renameField(from: String, to: String): SchemaUpdateBuilder =
    copy(renames = renames :+ (from -> to))
  def modifyField(name: String)(f: FieldSchema => FieldSchema): SchemaUpdateBuilder =
    copy(mods = mods :+ (name -> f))

  /** Indexes are SEMANTIC here (uniqueness drives upsert matching;
    * physical indexing is parquet stats — SURVEY §4). Addressed by their
    * field list, post-rename names. */
  def addIndex(ix: IndexSchema): SchemaUpdateBuilder = copy(indexAdds = indexAdds :+ ix)
  def addIndex(fields: Seq[String], unique: Boolean): SchemaUpdateBuilder =
    addIndex(IndexSchema(fields, unique))
  def removeIndex(fields: Seq[String]): SchemaUpdateBuilder =
    copy(indexRemoves = indexRemoves :+ fields)

  /** FK changes take effect for FUTURE enforced writes. Addressed by the
    * FK's field list (post-rename names). */
  def addForeignKey(fk: ForeignKeySchema): SchemaUpdateBuilder = copy(fkAdds = fkAdds :+ fk)
  def removeForeignKey(fields: Seq[String]): SchemaUpdateBuilder =
    copy(fkRemoves = fkRemoves :+ fields)
  def modifyForeignKey(fields: Seq[String])(
      f: ForeignKeySchema => ForeignKeySchema): SchemaUpdateBuilder =
    copy(fkMods = fkMods :+ (fields -> f))

  /** Change the PK config. A different `name` renames the PK COLUMN
    * (data preserved, like renameField). */
  def setPrimaryKeyConfig(pk: PrimaryKeyConfig): SchemaUpdateBuilder =
    copy(pkConfig = Some(pk))

  def setTtlConfig(ttl: TtlConfig): SchemaUpdateBuilder = copy(ttlSet = Some(Some(ttl)))
  def disableTtl: SchemaUpdateBuilder = copy(ttlSet = Some(None))

  /** Rename the table itself: physical directory move + registry re-key. */
  def renameTable(to: String): SchemaUpdateBuilder = copy(newName = Some(to))

  /** One atomic rewrite + registry update. */
  def apply(): Unit = engine.applySchemaUpdate(this)

  /** Reference-parity task form (tostore.dart:1083-1119 — `final taskId
    * = await db.updateSchema('users').renameField(...)`): applies the
    * SAME update in every space holding `table` (current space first),
    * records a migration task with real per-space record counts, and
    * returns the task id for `queryMigrationTaskStatus`. Each space's
    * rewrite is synchronous-atomic — the task is complete when this
    * returns (see [[MigrationStatus]] for why there is nothing to poll
    * mid-flight here). */
  def applyAsync(): String = engine.applySchemaUpdateAllSpaces(this)
}
