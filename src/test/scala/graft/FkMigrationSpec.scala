package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.expr.Cond
import graft.schema._

/** FK delete enforcement (foreign_key_manager.dart) + schema
  * auto-migration ("Instance Schema Auto Upgrade" reference suite). */
class FkMigrationSpec extends SparkSpec {

  private def engineWith(onDelete: FkAction): Graft = {
    val wh = Files.createTempDirectory("graft_fk").toString
    val e = Graft.withWarehouse(spark, sfDir, wh)
    e.createTable(TableSchema("dept", PrimaryKeyConfig("id", PkStrategy.None),
      Seq(FieldSchema("dname", GType.GText, nullable = false))))
    e.createTable(TableSchema("emp", PrimaryKeyConfig("id", PkStrategy.None),
      Seq(
        FieldSchema("ename", GType.GText, nullable = false),
        FieldSchema("dept_id", GType.GText, defaultValue = Some("d0"))),
      foreignKeys = Seq(ForeignKeySchema(Seq("dept_id"), "dept", Seq("id"),
        onDelete = onDelete))))
    e.batchInsert("dept", Seq(
      Map("id" -> "d1", "dname" -> "eng"), Map("id" -> "d2", "dname" -> "ops")))
    e.batchInsert("emp", Seq(
      Map("id" -> "e1", "ename" -> "ada", "dept_id" -> "d1"),
      Map("id" -> "e2", "ename" -> "bob", "dept_id" -> "d1"),
      Map("id" -> "e3", "ename" -> "cyd", "dept_id" -> "d2")))
    e
  }

  test("onDelete=restrict refuses while references exist (table_schema.dart:2756-2786)") {
    val e = engineWith(FkAction.Restrict)
    intercept[IllegalStateException] {
      e.deleteEnforced("dept", Cond.Leaf("id", "=", "d1"))
    }
    assert(e.table("dept").count() == 2)
    // deleting an unreferenced parent is fine after children go
    e.deleteEnforced("emp", Cond.Leaf("dept_id", "=", "d1"))
    e.deleteEnforced("dept", Cond.Leaf("id", "=", "d1"))
    assert(e.table("dept").count() == 1)
  }

  test("onDelete=cascade removes referencing rows") {
    val e = engineWith(FkAction.Cascade)
    e.deleteEnforced("dept", Cond.Leaf("id", "=", "d1"))
    assert(e.table("dept").count() == 1)
    val emps = e.table("emp").collect()
    assert(emps.length == 1 && emps(0).getAs[String]("id") == "e3")
  }

  test("onDelete=setNull nulls the FK fields; setDefault restores declared default") {
    val e = engineWith(FkAction.SetNull)
    e.deleteEnforced("dept", Cond.Leaf("id", "=", "d1"))
    val after = e.table("emp").orderBy("id").collect()
    assert(after.length == 3)
    assert(after(0).isNullAt(after(0).fieldIndex("dept_id")))
    assert(after(2).getAs[String]("dept_id") == "d2")

    val e2 = engineWith(FkAction.SetDefault)
    e2.deleteEnforced("dept", Cond.Leaf("id", "=", "d1"))
    val afterD = e2.table("emp").orderBy("id").collect()
    assert(afterD(0).getAs[String]("dept_id") == "d0")
  }

  test("migrateTable: added field gets default, removed field dropped, type cast applied") {
    val wh = Files.createTempDirectory("graft_mig").toString
    val e = Graft.withWarehouse(spark, sfDir, wh)
    e.createTable(TableSchema("t", PrimaryKeyConfig("id", PkStrategy.None),
      Seq(FieldSchema("a", GType.GInteger), FieldSchema("gone", GType.GText))))
    e.batchInsert("t", Seq(Map("id" -> "1", "a" -> 7, "gone" -> "x")))
    e.migrateTable(TableSchema("t", PrimaryKeyConfig("id", PkStrategy.None),
      Seq(
        FieldSchema("a", GType.GDouble),                       // type widened
        FieldSchema("b", GType.GText, defaultValue = Some("d")), // added w/ default
        FieldSchema("c", GType.GInteger))))                    // added nullable
    val r = e.table("t").collect()(0)
    assert(r.schema.fieldNames.toSeq == Seq("id", "a", "b", "c"))
    assert(r.getAs[Double]("a") == 7.0)
    assert(r.getAs[String]("b") == "d")
    assert(r.isNullAt(r.fieldIndex("c")))
  }
}
