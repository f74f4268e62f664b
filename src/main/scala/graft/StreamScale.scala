package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Per-micro-batch cost curve for the streaming near-dup path (the q88/
 * q111 adjudication, measured): feeds `batches` parquet files of a FIXED
 * `batchRows` size through [[pipeline.Dedup.dedupStreamNear]] with
 * maxFilesPerTrigger=1, then reads the per-batch `triggerExecution`
 * durations off the query progress log. The dedup state (band-bucket →
 * min-id) grows with every batch; if per-batch latency stays flat as the
 * accumulated corpus grows — batch 16 no slower than batch 2 — the
 * "state is bounded per key, wall time is harness orchestration"
 * adjudication is a measured curve, not a claim.
 *
 * Corpus is synthesized adversarially for STATE (hash-random token
 * text, ~no near-dups, so every doc's bands enter the state store and
 * state size is maximal ≈ bands·docs keys); a production corpus with
 * real duplicate mass carries strictly less state.
 *
 * The per-batch record also carries Spark's own duration BREAKDOWN
 * (queryPlanning / addBatch / walCommit / commitOffsets / latestOffset)
 * and the state operators' commit times, so the "orchestration floor"
 * is a decomposition, not a single opaque number — WHICH fixed cost
 * dominates (incremental re-planning, state-store commits, offset-log
 * fsyncs, or the work itself) is readable off the line. arg 4 sets
 * `spark.sql.shuffle.partitions` (= state-store partition count, fixed
 * at checkpoint creation): comparing partitions=32 vs 4 at the same
 * batch size measures how much of the floor is per-partition state
 * machinery — the sizing lever DEPLOY.md's streaming recipe exposes
 * for real clusters (state partitions sized to state, not defaulted).
 *
 * Usage: runMain graft.StreamScale [batchRows] [batches] [tokensPerDoc]
 *   [shufflePartitions]
 * Prints ONE JSON line: per-batch durations (ms) in batch order.
 */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val batchRows = args.lift(0).map(_.toInt).getOrElse(2500)
    val batches = args.lift(1).map(_.toInt).getOrElse(16)
    val tokens = args.lift(2).map(_.toInt).getOrElse(40)
    val shufflePartitions = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("streamscale").toString
    val feed = base + "/feed"
    // one file per batch, mtimes ascending so maxFilesPerTrigger=1
    // replays them in batch order; timestamps inside a 1000 s window so
    // the 6 h watermark never evicts mid-run (the q88 construction)
    val t0 = 1700000000000L
    (0 until batches).foreach { b =>
      spark.range(b.toLong * batchRows, (b + 1).toLong * batchRows)
        .select(col("id").as("doc_id"),
          expr(s"""concat_ws(' ', transform(sequence(0, ${tokens - 1}),
            j -> concat('t', pmod(xxhash64(id, j), 5000))))""").as("text"),
          timestamp_seconds(lit(1767225600L) + pmod(col("id"), lit(1000)))
            .as("ts"))
        .coalesce(1).write.mode("append").parquet(feed)
      val dir = new java.io.File(feed)
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .filter(_.lastModified() > t0 + b.toLong * 60000L)
        .foreach(f => { f.setLastModified(t0 + b.toLong * 60000L): Unit })
    }
    val schema = spark.read.parquet(feed).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
    val q = pipeline.Dedup.dedupStreamNear(stream, "text", "ts",
        watermark = "6 hours", shingleN = 3, k = 12, bands = 4,
        oracleHash = true)
      .select("doc_id")
      .writeStream.format("memory").queryName("streamscale_mem")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val finished = q.awaitTermination(600000)
    require(finished, "streamscale: query did not finish within 600 s")
    // durationMs keys vary by phase; missing → 0 so rows stay rectangular
    val phases = Seq("triggerExecution", "queryPlanning", "addBatch",
      "walCommit", "commitOffsets", "latestOffset")
    val prog = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map { p =>
        val d = phases.map(k => Option(p.durationMs.get(k))
          .map(_.longValue).getOrElse(0L))
        val stateCommit = p.stateOperators.toSeq.map(_.commitTimeMs).sum
        (p.batchId, d, stateCommit, p.numInputRows)
      }
    q.stop()
    val survivors = spark.table("streamscale_mem").count()
    val durs = prog.sortBy(_._1)
      .map { case (b, d, sc, r) =>
        s"""[$b,${d.mkString(",")},$sc,$r]""" }.mkString("[", ",", "]")
    println(s"""{"family":"stream_neardup_batches","batch_rows":$batchRows,""" +
      s""""batches":$batches,"shuffle_partitions":$shufflePartitions,""" +
      s""""survivors":$survivors,""" +
      s""""per_batch_cols":"[id,${phases.mkString(",")},stateCommitMs,rows]",""" +
      s""""per_batch":$durs}""")
    spark.stop()
  }
}
