package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.SchemaRegistry
import graft.query.QueryBuilder
import graft.schema.TableSchema

/**
 * Engine facade — the role of the reference's `ToStore` entry object
 * (/root/reference/lib/tostore.dart). Holds a SparkSession, a schema
 * registry, a read-only data directory (driver TESTDATA parquet) and an
 * optional managed warehouse for write operations.
 *
 * Resolution order for `table(name)`: managed warehouse table (current
 * space, then global) → `$dataDir/$name.parquet`.
 *
 * Spaces (lib/tostore.dart:529-532): isolated namespaces; global tables are
 * visible from every space. In Spark a space is a path prefix in the
 * warehouse; `switchSpace` returns a cheap engine copy.
 */
final class Graft(
    val spark: SparkSession,
    val dataDir: String,
    val warehouse: Option[String] = None,
    val space: String = "default",
    val registry: SchemaRegistry = new SchemaRegistry,
    val defaultQueryLimit: Int = 1000, // data_store_config.dart:208
    val maxQueryOffset: Int = 10000) { // data_store_config.dart:209

  def switchSpace(name: String): Graft =
    new Graft(spark, dataDir, warehouse, name, registry, defaultQueryLimit, maxQueryOffset)

  def createTable(schema: TableSchema): Unit = {
    registry.register(space, schema)
    warehouse.foreach { w =>
      val p = managedPath(schema.name, schema.isGlobal)
      if (!Files.exists(Paths.get(p)))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema.sparkSchema)
          .write.mode("overwrite").parquet(p)
    }
  }

  def createTables(schemas: TableSchema*): Unit = schemas.foreach(createTable)

  private[graft] def managedPath(name: String, global: Boolean = false): String = {
    val w = warehouse.getOrElse(
      throw new IllegalStateException("engine has no warehouse configured for writes"))
    val sp = if (global || registry.get(space, name).exists(_.isGlobal)) "global" else space
    s"$w/$sp/$name"
  }

  private def managedExists(name: String): Boolean =
    warehouse.exists { w =>
      Files.exists(Paths.get(s"$w/$space/$name")) ||
        Files.exists(Paths.get(s"$w/global/$name"))
    }

  /** Read a table as a DataFrame. TTL tables get the reference's standing
    * expiry filter at scan time (table_schema.dart:1804-1885). */
  def table(name: String): DataFrame = {
    val df =
      if (managedExists(name)) {
        val w = warehouse.get
        val local = s"$w/$space/$name"
        val p = if (Files.exists(Paths.get(local))) local else s"$w/global/$name"
        graft.sources.ParquetNanos.read(spark, p)
      } else graft.sources.ParquetNanos.read(spark, s"$dataDir/$name.parquet")
    registry.get(space, name).flatMap(_.ttl) match {
      case Some(ttl) =>
        val src = ttl.sourceField.getOrElse("_system_ingest_ts_ms")
        import org.apache.spark.sql.functions._
        df.where(col(src) >= (current_timestamp() - expr(s"INTERVAL ${ttl.ttlMs / 1000} SECOND")))
      case None => df
    }
  }

  def query(name: String): QueryBuilder = QueryBuilder(this, name)
}

object Graft {
  /** Engine over the driver TESTDATA layout: `$sfDir/<table>.parquet`. */
  def apply(spark: SparkSession, sfDir: String): Graft = new Graft(spark, sfDir)

  def withWarehouse(spark: SparkSession, sfDir: String, warehouseDir: String): Graft =
    new Graft(spark, sfDir, Some(warehouseDir))

  /** Local session tuned per the build notes: 32 threads, 32 shuffle
    * partitions (not 200), AQE on for runtime re-planning/skew handling. */
  def localSession(appName: String = "graft", cores: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
