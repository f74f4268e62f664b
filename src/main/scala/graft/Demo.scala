package graft

import org.apache.spark.sql.SparkSession

/** Library usage demo + smoke probe: fluent chain, pagination metadata,
  * cursor walk, and the reference's safety guards (offset cap,
  * condition-less update refusal). Run:
  *   sbt "runMain graft.Demo /root/testdata/sf0.001"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.localSession("graft-demo", cores = 8)
    val db = Graft(spark, dir)

    // fluent chain with loose typing ("45" on a DOUBLE column)
    val top = db.query("lineitem")
      .where("l_quantity", ">", "45")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderByDesc("l_extendedprice")
      .orderByAsc("l_orderkey", "l_linenumber")
      .limit(5)
    println("page1:")
    val page1 = top.run()
    page1.data.foreach(r => println(s"  $r"))
    println(s"hasMore=${page1.hasMore} nextCursor=${page1.nextCursor.isDefined}")
    println("page2 via cursor:")
    page1.next().data.foreach(r => println(s"  $r"))

    // scalar shortcuts
    println(s"count=${db.query("orders").whereEqual("o_orderstatus", "F").count()}")
    println(s"exists=${db.query("orders").whereEqual("o_orderstatus", "ZZZ").exists()}")

    // guard rails
    try db.query("lineitem").orderByAsc("l_orderkey").offset(999999).limit(1).toDF.count()
    catch { case e: IllegalArgumentException => println(s"offset guard: ${e.getMessage}") }
    try graft.write.Writes.updatePreview(db.table("orders"), Nil, graft.expr.Cond.True)
    catch { case e: IllegalArgumentException => println(s"update guard: ${e.getMessage}") }

    spark.stop()
  }
}
