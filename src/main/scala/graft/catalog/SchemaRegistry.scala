package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.schema._

/**
 * In-memory catalog of declared table schemas + spaces — the semantic role
 * of the reference's schema manager (/root/reference/lib/src/model/table_schema.dart:12-57,
 * spaces: lib/tostore.dart:529-532, isGlobal: table_schema.dart:37).
 *
 * Physical indexes disappear in Spark (parquet min/max + dictionary +
 * bloom stats take their place); the registry keeps their SEMANTIC role:
 * unique key sets drive upsert matching, foreign keys drive auto-joins,
 * PK strategy drives the numeric-string sort shim.
 */
final class SchemaRegistry {
  private var schemas = Map.empty[(String, String), TableSchema] // (space, table)

  def register(space: String, schema: TableSchema): Unit = synchronized {
    val key = if (schema.isGlobal) ("global", schema.name) else (space, schema.name)
    schemas += key -> schema
  }

  def get(space: String, table: String): Option[TableSchema] =
    schemas.get((space, table)).orElse(schemas.get(("global", table)))

  def drop(space: String, table: String): Unit = synchronized {
    schemas -= ((space, table))
  }

  /** Tables VISIBLE FROM a space: its own registrations + global ones. */
  def tables(space: String): Seq[String] =
    schemas.keys.collect { case (s, t) if s == space || s == "global" => t }.toSeq

  /** Tables registered UNDER a space only (no global bleed-through) —
    * the set space-scoped accounting (SpaceInfo) must use. */
  def ownTables(space: String): Seq[String] =
    schemas.keys.collect { case (s, t) if s == space => t }.toSeq

  /** Every space that has at least one registration. */
  def allSpaces: Seq[String] = schemas.keys.map(_._1).toSeq.distinct

  /** Drop every registration (deleteDatabase). */
  def clearAll(): Unit = synchronized { schemas = Map.empty }

  // Migration-task ledger (reference queryMigrationTaskStatus parity,
  // lib/tostore.dart:1104-1124) — shared across switchSpace views like
  // the schema map itself, so a task started from one space view is
  // queryable from any other.
  private var migTasks = Map.empty[String, MigrationStatus]
  private var migCounter = 0

  def newMigrationTaskId(table: String): String = synchronized {
    migCounter += 1; s"mig-$table-$migCounter"
  }
  def putMigrationTask(s: MigrationStatus): Unit = synchronized {
    migTasks += s.taskId -> s
  }
  def migrationTask(id: String): Option[MigrationStatus] = migTasks.get(id)

  /** Resolve the FK join keys between `from` and `to`, forward (from
    * references to) or reverse (to references from) — reference
    * query_builder.dart:851-951. Returns ALL (fromField, toField) pairs of
    * the FK; composite FKs use the first pair as ON and the residual pairs
    * as WHERE equality filters (reference quirk,
    * query_builder.dart:210-253) — the caller applies that split. */
  def resolveFkJoin(from: String, to: String,
      space: String = "default"): Option[Seq[(String, String)]] = {
    def pairs(s: TableSchema, target: String): Option[Seq[(String, String)]] =
      s.foreignKeys.find(fk => fk.enabled && fk.referencedTable == target)
        .map(fk => fk.fields.zip(fk.referencedFields))
    get(space, from).flatMap(pairs(_, to))
      .orElse(get(space, to).flatMap(pairs(_, from).map(_.map(_.swap))))
  }

  /** Numeric-string PK sort shim: sequential / timestampBased /
    * datePrefixed PKs sort length-first then lexicographic so '2' < '10'
    * (value_matcher.dart:121-148; golden: ['1','2','3','10','20'],
    * database_tester.dart:1587-1603). Expressed as the two-column sort key
    * (length(pk), pk) — pure Catalyst, no comparator UDF. */
  def numericStringSortCols(table: String, field: String, c: Column,
      space: String = "default"): Seq[Column] =
    get(space, table) match {
      case Some(s) if s.primaryKey.name == field &&
          (s.primaryKey.strategy == PkStrategy.Sequential ||
           s.primaryKey.strategy == PkStrategy.TimestampBased ||
           s.primaryKey.strategy == PkStrategy.DatePrefixed) =>
        Seq(length(c), c)
      case _ => Seq(c)
    }
}
