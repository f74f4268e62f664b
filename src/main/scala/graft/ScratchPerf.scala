package graft

import org.apache.spark.sql.functions._

/** Throwaway perf probe (not part of the library; removed before round end). */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.localSession("scratch")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm-up
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val docs = Graft(spark, dir).table("documents")
    for (i <- 1 to 3) {
      time(s"q25 as-is #$i") {
        SparkEntry.queries("q25_dedup_exact")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("groupBy fp only (no order)") {
      docs.groupBy(graft.functions.GraftFunctions.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("dupes"))
        .write.format("noop").mode("overwrite").save()
    }
    time("fingerprint project only") {
      docs.select(graft.functions.GraftFunctions.fingerprint(col("text")).as("fp"))
        .write.format("noop").mode("overwrite").save()
    }
    time("plain count") { docs.selectExpr("count(*)").write.format("noop").mode("overwrite").save() }
    time("q25 again post-warm") {
      SparkEntry.queries("q25_dedup_exact")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
