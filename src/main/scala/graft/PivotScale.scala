package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale rehearsal for [[operators.GraphOps.betweenness]]'s Brandes-pivot
 * knob (`sources`): on a graph big enough that the DISTRIBUTED regime's
 * pair-composition join dominates, wall time must scale with
 * |pivots|·n-shaped pair mass, not n² — the contract that makes exact
 * betweenness usable at real scale (sample sources, scale the published
 * sum by n/(2|S|) caller-side).
 *
 * Fixture: deterministic ring+chord graph — node i joins i+1 (mod n) and
 * 7i+3 (mod n), so the graph is connected, degree ≈ 4, and reach within
 * `maxHops` is a constant r ≈ Σ 4^h independent of n. Composition mass at
 * pivot count k is then ≈ r²·k (each node v is reached by ~r·k/n pivots
 * and reaches ~r targets, summed over n nodes) — linear in k with a
 * fixed BFS floor, which is exactly what the harness should read.
 *
 * Usage: runMain graft.PivotScale [n] [maxHops] [k1,k2,...] [reps]
 * Prints one JSON line per pivot count: min-of-`reps` seconds.
 */
object PivotScale {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(4096)
    val maxHops = args.lift(1).map(_.toInt).getOrElse(3)
    val ks = args.lift(2).getOrElse("64,256,1024,4096")
      .split(",").toSeq.map(_.trim.toInt)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def nm(i: Long): String = f"n$i%07d"
    val edges = spark.range(n)
      .select(col("id"), pmod(col("id") + 1, lit(n.toLong)).as("r"),
        pmod(col("id") * 7 + 3, lit(n.toLong)).as("c"))
      .selectExpr(s"id", "stack(2, r, c) as dst")
      .select(udf(nm _).apply(col("id")).as("src"),
        udf(nm _).apply(col("dst")).as("dst"))
      .localCheckpoint(true)
    val edgeCount = edges.count()
    // JVM warm-up: one tiny all-sources run off the clock
    operators.GraphOps.betweenness(
      edges.where(col("src") < nm(64) && col("dst") < nm(64)),
      maxHops = maxHops, maxLocalEdges = 0).count()
    ks.foreach { k =>
      require(k >= 1 && k <= n, s"pivot count $k out of [1,$n]")
      val pivots = (0 until k).map(i => nm(i.toLong))
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val out = operators.GraphOps.betweenness(edges, maxHops = maxHops,
          maxLocalEdges = 0, // force the distributed regime
          sources = if (k == n) None else Some(pivots))
        val rows = out.count()
        require(rows == n.toLong, s"expected $n node rows, got $rows")
        (System.nanoTime() - t0) / 1e9
      }
      val label = if (k == n) "all(exact)" else k.toString
      // BigDecimal render: locale-safe JSON (f"%.2f" commas under de_DE)
      val sec = BigDecimal(secs.min)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
      println(s"""{"family":"betweenness_pivots","n":$n,"edges":$edgeCount,""" +
        s""""max_hops":$maxHops,"pivots":"$label","sec":$sec}""")
      System.out.flush()
    }
    spark.stop()
  }
}
