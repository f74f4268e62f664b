package graft

import org.apache.spark.sql.functions._

import graft.operators.FeatureEng

/** Smoothed target encoding + best-Gini-split decision stump. */
class FeatureEngSpec extends SparkSpec {
  import spark.implicits._

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
}
