package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.install)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up so the alphabetically-first query doesn't absorb
    // one-time JIT + classloading cost (~5 s) into its measurement
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    try SparkEntry.queries("q19_count")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Structured Streaming machinery warm-up (state store provider, commit
    // log, micro-batch planner classloading — otherwise the first streaming
    // gate absorbs several seconds of one-time cost)
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ms = MemoryStream[Int]
      ms.addData(1, 2, 3)
      val q = ms.toDS().groupBy($"value").count()
        .writeStream.format("memory").queryName("__bench_warm")
        .outputMode("complete").start()
      q.processAllAvailable(); q.stop()
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_REPS=3 → per-query MIN of N runs (local records only —
    // the driver runs reps=1; min filters this host's co-tenant noise)
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(1).max(1)
    val results = SparkEntry.selectedQueries().sortBy(_._1).map { case (name, fn) =>
      // (elapsed, succeeded) per rep: min over SUCCESSFUL reps only — a
      // fast failure must not masquerade as a speedup in the record
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: full evaluation of every output column (count() would
        // let Catalyst prune map-side work and under-measure)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val good = runs.filter(_._2).map(_._1)
      val dt = if (good.nonEmpty) good.min else runs.map(_._1).max
      System.err.println(f"[bench] $name $dt%.2f s" +
        (if (good.isEmpty) " (ALL REPS FAILED)" else ""))
      name -> dt
    }
    // 3-decimal seconds (1 ms grain): the full-precision line ran ~3.5 KB
    // and the driver's capture window clipped it mid-line four rounds
    // running (BENCH_r05–r08 "parsed": null); rounding keeps it ~2 KB
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"cpus":"$cpus"}"""
    // FIRST post-run stdout line, flushed immediately — nothing (record
    // IO, spark.stop) may run before it: the driver's tail has clipped a
    // late-emitted record four consecutive rounds
    println(line)
    System.out.flush()
    // Self-recording: ALSO persist the exact same line to
    // target/bench.json (overridable for tests) in case stdout is lost.
    val recordPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    try {
      val p = java.nio.file.Paths.get(recordPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] record written to $recordPath")
    } catch { case e: Throwable => System.err.println(s"[bench] record write failed: $e") }
    // identical line again as the LAST stdout line: a tail-biased capture
    // window sees a complete record too (duplicates are safe — first- and
    // last-match parsers read the same bytes)
    println(line)
    System.out.flush()
    spark.stop()
  }
}
