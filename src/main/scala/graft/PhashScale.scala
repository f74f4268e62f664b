package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale rehearsal for the 64-bit perceptual-hash near-dup operators at
 * CONSTANT near-dup family density — the regime a real image corpus
 * lives in, where the q103–q105 gate fixture cannot go: `BmpCodec.bitOf`
 * draws from a fixed 256×64-pattern space (the price of a
 * DuckDB-recomputable closed form), so past ~16k images pigeonhole
 * inflates family sizes and pair mass grows quadratically BY FIXTURE
 * CONSTRUCTION, telling you nothing about the operators. Here every
 * family of `famSize` ids gets a fresh xxhash64-random 64-bit base
 * pattern (uniform → cross-family hamming ≈ 32) and each member flips
 * one distinct low bit — members sit pairwise at hamming 2, expected
 * output exactly n/famSize · C(famSize, 2) pairs, LINEAR in n.
 *
 * Compares `Dedup.hammingPairs64` (4×16-bit bands — exact but
 * birthday-bound: candidate mass O(n²/2¹⁶)) against
 * `Dedup.hammingPairsBlocked` (Manku-style C(6,3)-table ~32-bit block
 * keys — exact with candidate mass O(n²/2³²)). Per size prints pair
 * count + wall for each variant; the banded variant is skipped above
 * `bandedCap` rows where its candidate mass is the known story and the
 * run would only burn the rehearsal budget re-proving it.
 *
 * Usage: runMain graft.PhashScale [n1,n2,...] [famSize] [reps] [bandedCap]
 */
object PhashScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.lift(0).getOrElse("50000,500000,2000000,5000000")
      .split(",").toSeq.map(_.trim.toLong)
    val famSize = args.lift(1).map(_.toInt).getOrElse(20)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val bandedCap = args.lift(3).map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(famSize <= 64, "flips must stay inside the lo half")

    def corpus(n: Long) = {
      val fam = floor(col("id") / famSize)
      spark.range(n).select(
        col("id"),
        xxhash64(lit("hi"), fam).as("hi"),
        xxhash64(lit("lo"), fam)
          .bitwiseXOR(expr(s"shiftleft(1L, cast(id % $famSize as int))"))
          .as("lo"))
    }

    val results = sizes.flatMap { n =>
      val df = corpus(n).localCheckpoint(true) // pin: exclude gen cost
      val expectPairs = (n / famSize) * (famSize.toLong * (famSize - 1) / 2)
      val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "blocked" -> (() => pipeline.Dedup.hammingPairsBlocked(
          df, "id", "hi", "lo", maxHamming = 2)),
        "banded" -> (() => pipeline.Dedup.hammingPairs64(
          df, "id", "hi", "lo", maxHamming = 2)))
      val out = variants.filter(v => v._1 == "blocked" || n <= bandedCap)
        .map { case (name, mk) =>
          val runs = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            val nPairs = mk().count()
            ((System.nanoTime() - t0) / 1e9, nPairs)
          }
          val nPairs = runs.head._2
          if (nPairs != expectPairs)
            System.err.println(
              s"[phash-scale] WARNING $name n=$n pairs=$nPairs expected=$expectPairs")
          val dt = runs.map(_._1).min
          System.err.println(f"[phash-scale] $name n=$n pairs=$nPairs $dt%.2f s")
          (name, n, dt, nPairs)
        }
      df.unpersist()
      out
    }
    val js = results.map { case (name, n, dt, p) =>
      f"""{"variant":"$name","n":$n,"pairs":$p,"sec":$dt%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"rehearsal":"phash","famSize":$famSize,"reps":$reps,"results":$js}""")
    spark.stop()
  }
}
