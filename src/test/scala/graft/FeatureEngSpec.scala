package graft

import org.apache.spark.sql.functions._

import graft.operators.FeatureEng

/** Smoothed target encoding + best-Gini-split decision stump. */
class FeatureEngSpec extends SparkSpec {
  import spark.implicits._

  test("woeEncode: hand-smoothed WoE/IV; zero-information input scores ~0") {
    // a: 3 rows 2 pos; b: 2 rows 0 pos — k=2, P=2, NN=3
    // a: dp=3/4, dn=2/5 → woe=ln(1.875); b: dp=1/4, dn=3/5 → woe=ln(5/12)
    val df = Seq(("a", true), ("a", true), ("a", false),
      ("b", false), ("b", false)).toDF("c", "y")
    val rows = FeatureEng.woeEncode(df, col("c"), col("y"))
      .orderBy("category").collect()
    assert(rows.map(r => (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
      r.getAs[Long]("n_neg"))).toSeq == Seq((3L, 2L, 1L), (2L, 0L, 2L)))
    assert(rows(0).getAs[Double]("woe") == 0.628608659422)
    assert(rows(0).getAs[Double]("iv_term") == 0.220013030798)
    assert(rows(1).getAs[Double]("woe") == -0.875468737354)
    assert(rows(1).getAs[Double]("iv_term") == 0.306414058074)
    assert(rows.forall(_.getAs[Double]("iv") == 0.526427))
    // label independent of category → every smoothed woe is exactly 0
    val flat = Seq(("a", true), ("a", false), ("b", true), ("b", false))
      .toDF("c", "y")
    val f = FeatureEng.woeEncode(flat, col("c"), col("y")).collect()
    assert(f.forall(_.getAs[Double]("woe") == 0.0))
    assert(f.forall(_.getAs[Double]("iv") == 0.0))
  }

  test("targetEncode: m=0 is the raw mean; m>0 shrinks toward the prior") {
    val df = Seq(("A", 150L), ("A", 50L), ("B", 0L), ("B", 0L)).toDF("c", "u")
    val raw = FeatureEng.targetEncode(df, col("c"), col("u"), m = 0L)
      .orderBy("category").collect()
    assert(raw.map(_.getAs[Double]("enc")).toSeq == Seq(100.0, 0.0))
    assert(raw.map(_.getAs[Double]("raw_mean")).toSeq == Seq(100.0, 0.0))
    // prior = 50; m = 2 pulls both halfway: (200·4 + 2·200)/(4·4) = 75
    val sm = FeatureEng.targetEncode(df, col("c"), col("u"), m = 2L)
      .orderBy("category").collect()
    assert(sm.map(_.getAs[Double]("enc")).toSeq == Seq(75.0, 25.0))
    // a singleton category with huge m is pinned to the prior
    val one = Seq(("A", 1000L), ("B", 0L), ("C", 0L), ("D", 0L)).toDF("c", "u")
    val pinned = FeatureEng.targetEncode(one, col("c"), col("u"), m = 1000000L)
      .orderBy("category").head()
    assert(math.abs(pinned.getAs[Double]("enc") - 250.0) < 0.01)
  }

  test("isotonicCalibrate: PAVA hand case == brute-force minimax; contracts") {
    // rates per score 1..5: 0, 1, 0, 1, 1 -> fit 0, .5, .5, 1, 1
    val df = Seq((1L, false), (2L, true), (3L, false), (4L, true), (5L, true))
      .toDF("v", "y")
    val got = FeatureEng.isotonicCalibrate(df, col("v"), col("y")).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 0.0), (2L, 0.5), (3L, 0.5), (4L, 1.0), (5L, 1.0)))
    // a longer mixed case vs an independent brute-force minimax
    val data = Seq(
      (1L, 2L, 0L), (2L, 3L, 3L), (3L, 4L, 1L), (4L, 2L, 2L), (5L, 5L, 2L))
    val rows = data.flatMap { case (v, n, pos) =>
      (1L to n).map(i => (v, i <= pos)) }
    val fit = FeatureEng.isotonicCalibrate(rows.toDF("v", "y"), col("v"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val cn = data.map(_._2).scanLeft(0L)(_ + _)
    val cp = data.map(_._3).scanLeft(0L)(_ + _)
    def minimax(i: Int): Double = (0 until i + 1).map { j =>
      (i until data.size).map { k =>
        (cp(k + 1) - cp(j)).toDouble / (cn(k + 1) - cn(j)).toDouble
      }.min
    }.max
    data.zipWithIndex.foreach { case ((v, _, _), i) =>
      assert(fit(v) == BigDecimal(minimax(i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"v=$v")
    }
    // monotone output
    val seq = data.map(_._1).sorted.map(fit)
    assert(seq == seq.sorted)
    // distinct-cardinality contract refuses loudly
    intercept[IllegalArgumentException] {
      FeatureEng.isotonicCalibrate(df, col("v"), col("y"), maxDistinct = 3)
        .collect()
    }
  }

  test("percentileRank: mid-rank hand case, endpoints, ties, null drop") {
    val df = Seq(Some(10L), Some(20L), Some(20L), Some(30L), None).toDF("v")
    val got = FeatureEng.percentileRank(df, col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // n=4: 10 -> (0·2+1+1)/8 = 0.25; 20 ties -> (2+2+1)/8 = 0.625; 30 -> 1.0
    assert(got.toSeq == Seq((10L, 1L, 0L, 0.25), (20L, 2L, 1L, 0.625),
      (30L, 1L, 3L, 1.0)))
    // partition-layout invariance (prefix sums, not a global window)
    val re = FeatureEng.percentileRank(df.repartition(7), col("v")).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(re.toSeq == Seq((10L, 0.25), (20L, 0.625), (30L, 1.0)))
  }

  test("decisionStump: perfect split, pure-label zero parent, published rationals") {
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("x", "y")
    val r = FeatureEng.decisionStump(perfect, col("x"), col("y")).head()
    assert(r.getAs[Double]("threshold") == 2.0)
    assert(r.getAs[Long]("n_left") == 2 && r.getAs[Long]("pos_left") == 0)
    assert(r.getAs[Long]("n_right") == 2 && r.getAs[Long]("pos_right") == 2)
    assert(r.getAs[Double]("gini_parent") == 0.5)
    assert(r.getAs[Double]("gini_split") == 0.0)
    assert(r.getAs[Double]("gain") == 0.5)
    // one-class data: parent gini 0, all splits cost 0, earliest threshold
    val pure = Seq((1.0, true), (2.0, true), (3.0, true)).toDF("x", "y")
    val p = FeatureEng.decisionStump(pure, col("x"), col("y")).head()
    assert(p.getAs[Double]("threshold") == 1.0)
    assert(p.getAs[Double]("gini_parent") == 0.0 && p.getAs[Double]("gain") == 0.0)
    // hand rational on an imperfect split: x=(1,2,3), y=(T,F,T)
    // v=1: cost = 2·(0 + 1·1·1)/(3·1·2) = 1/3; v=2: 2·(1·1·1 + 0)/(3·2·1) = 1/3
    // → tie at 0.333333, earliest v=1 wins
    val mix = Seq((1.0, true), (2.0, false), (3.0, true)).toDF("x", "y")
    val m = FeatureEng.decisionStump(mix, col("x"), col("y")).head()
    assert(m.getAs[Double]("threshold") == 1.0)
    assert(m.getAs[Double]("gini_split") == 0.333333)
  }

  test("featureRank: perfect predictor outranks noise; contracts loud") {
    // x1 IS the label (gain = parent gini 0.5); x2 is uninformative
    // (best split cost equals parent -> gain 0)
    val df = Seq((0L, 0L, false), (0L, 1L, false), (1L, 0L, true),
      (1L, 1L, true)).toDF("x1", "x2", "y")
    val rows = FeatureEng.featureRank(df,
        Seq("strong" -> col("x1"), "noise" -> col("x2")), col("y"))
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("strong", "noise"))
    assert(rows(0).getAs[Double]("gain") == 0.5)
    assert(rows(1).getAs[Double]("gain") == 0.0)
    intercept[IllegalArgumentException] {
      FeatureEng.featureRank(df, Seq.empty, col("y"))
    }
    intercept[IllegalArgumentException] {
      FeatureEng.featureRank(df,
        Seq("a" -> col("x1"), "a" -> col("x2")), col("y"))
    }
  }

  test("quantileNormalize: hand-computed pooled map, monotone, edge anchors") {
    // A = [1,1,2], B = [5,6,6,7]; pool = [1,1,2,5,6,6,7], N = 7
    // A v=1: pos = ceil(2·7/3) = 5 → pooled cum(6)=6 covers → 6
    // A v=2: pos = 7 → 7 (group max → pooled max, always)
    // B v=5: pos = ceil(7/4) = 2 → cum(1)=2 → 1 (group min near pooled min)
    // B v=6: pos = ceil(5.25) = 6 → 6 ; B v=7: pos = 7 → 7
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L),
      ("B", 5L), ("B", 6L), ("B", 6L), ("B", 7L)).toDF("g", "x")
    val out = FeatureEng.quantileNormalize(df, col("g"), col("x"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(4))).toMap
    assert(out == Map(("A", 1L) -> 6L, ("A", 2L) -> 7L,
      ("B", 5L) -> 1L, ("B", 6L) -> 6L, ("B", 7L) -> 7L))
    // partition-layout invariance
    val re = FeatureEng.quantileNormalize(df.repartition(5), col("g"), col("x"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(4))).toMap
    assert(re == out)
    // identical groups are a fixed point: every value maps to itself
    val same = Seq(("A", 1L), ("A", 3L), ("B", 1L), ("B", 3L)).toDF("g", "x")
    val fix = FeatureEng.quantileNormalize(same, col("g"), col("x"))
      .collect().map(r => (r.getLong(1), r.getLong(4)))
    assert(fix.forall { case (v, q) => v == q })
    // distinct-cardinality contract is loud
    intercept[IllegalArgumentException] {
      FeatureEng.quantileNormalize(df, col("g"), col("x"), maxDistinct = 2L)
    }
  }
}
