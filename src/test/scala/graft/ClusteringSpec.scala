package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("gridDbscan: hand case — core triangle, border, noise, second cluster") {
    // eps=2, minPts=3: {1,2,3} mutually close -> core, one component;
    // 4 touches only core 2 -> border into component 1; 5 isolated ->
    // noise; {6,7,8} coincident -> their own core component 6
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 3L, 0L),
      (5L, 10L, 10L), (6L, 20L, 20L), (7L, 20L, 20L), (8L, 20L, 20L))
      .toDF("id", "x", "y")
    val got = Clustering.gridDbscan(pts, "id", "x", "y", eps = 2, minPts = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) == ((3L, "core", 1L)))
    assert(got(2L) == ((4L, "core", 1L)))
    assert(got(3L) == ((3L, "core", 1L)))
    assert(got(4L) == ((2L, "border", 1L)))
    assert(got(5L) == ((1L, "noise", -1L)))
    assert(got(6L) == ((3L, "core", 6L)))
    assert(got(7L) == ((3L, "core", 6L)))
    assert(got(8L) == ((3L, "core", 6L)))
    // cross-cell recall: points straddling a cell boundary still pair
    // (9 at x=4 is in cell 2 with eps=2; 2 at x=1 is in cell 0 — NOT
    // adjacent, dist 3 > eps anyway; 10 at x=3,y=1 is cell (1,0),
    // dist to 4 (cell (1,0)) is 1 — same cell)
    val edge = Seq((1L, 3L, 0L), (2L, 4L, 0L), (3L, 5L, 0L))
      .toDF("id", "x", "y") // consecutive, cells 1,2,2 at eps=2
    val er = Clustering.gridDbscan(edge, "id", "x", "y", eps = 2, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(er == Map(1L -> "core", 2L -> "core", 3L -> "core"))
  }

  test("gridDbscan contracts: negative coords refuse; dense cell refuses") {
    val neg = Seq((1L, -1L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Clustering.gridDbscan(neg, "id", "x", "y", eps = 2, minPts = 2).collect()
    }
    val dense = (1 to 100).map(i => (i.toLong, 0L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Clustering.gridDbscan(dense, "id", "x", "y", eps = 2, minPts = 2,
        maxCellPoints = 50).collect()
    }
  }

  test("gridDbscan: layout-invariant (repartition changes nothing)") {
    val pts = (1 to 60).map(i => (i.toLong, (i % 10).toLong * 3, (i % 7).toLong * 3))
      .toDF("id", "x", "y")
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.gridDbscan(df, "id", "x", "y", eps = 4, minPts = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1).toSeq
    assert(run(pts) == run(pts.repartition(13)))
  }

  test("agreement: hand contingency, perfect = 1, one-cluster ARI NULL, " +
      "nulls excluded, overflow contract") {
    // truth [a,a,b,b] vs pred [x,x,y,z]: TP=1, A=2, B=1, C=6
    // P=1, R=.5, F1=2/3, ARI = 2(6-2)/(6*3-4) = 8/14
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "z"))
      .toDF("tr", "pr")
    val r = Clustering.agreement(df, "tr", "pr").head()
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("tp_pairs") == 1)
    assert(r.getAs[Long]("pairs_truth") == 2 && r.getAs[Long]("pairs_pred") == 1)
    assert(r.getAs[Double]("precision") == 1.0)
    assert(r.getAs[Double]("recall") == 0.5)
    assert(r.getAs[Double]("f1") == 0.666667)
    assert(r.getAs[Double]("ari") == math.rint(8.0 / 14.0 * 1e6) / 1e6)
    // identical partitions: every metric 1
    val same = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("tr", "pr")
    val rs = Clustering.agreement(same, "tr", "pr").head()
    assert(rs.getAs[Double]("f1") == 1.0 && rs.getAs[Double]("ari") == 1.0)
    // one cluster on both sides: ARI denominator 0 -> NULL, F1 still 1
    val one = Seq(("a", "x"), ("a", "x"), ("a", "x")).toDF("tr", "pr")
    val ro = Clustering.agreement(one, "tr", "pr").head()
    assert(ro.isNullAt(ro.fieldIndex("ari")))
    assert(ro.getAs[Double]("f1") == 1.0)
    // a null label on either side drops the point
    val withNull = Seq(("a", "x"), ("a", null), (null, "y"), ("b", "y"))
      .toDF("tr", "pr")
    assert(Clustering.agreement(withNull, "tr", "pr").head()
      .getAs[Long]("n") == 2)
    intercept[IllegalArgumentException] {
      Clustering.agreement(df, "tr", "pr", maxPoints = 3L).collect()
    }
  }

  test("kmeansLloyd: two-blob convergence, weighted ≡ row semantics, md5 init order") {
    // {0,1} and {100,101}: any init converges to centroids {0,100} by
    // iteration 3 (floor-divided means), n=2 each, last-round mean
    // sqdist = floor((0²+1²)/2) = 0 on both sides
    val df = Seq(0L, 1L, 100L, 101L).toDF("x")
    val rows = Clustering.kmeansLloyd(df, Seq(col("x")), k = 2, iters = 6)
      .orderBy("c0").collect()
    assert(rows.map(_.getAs[Long]("c0")).toSeq == Seq(0L, 100L))
    assert(rows.forall(_.getAs[Long]("n") == 2L))
    assert(rows.forall(_.getAs[Double]("mean_sqdist") == 0.0))
    // duplicate rows weight the mean: {0,0,0,9} with k=1 -> floor(9/4)=2
    val wdf = Seq(0L, 0L, 0L, 9L).toDF("x")
    val w = Clustering.kmeansLloyd(wdf, Seq(col("x")), k = 1, iters = 1).head()
    assert(w.getAs[Long]("c0") == 2L && w.getAs[Long]("n") == 4L)
    // cluster ids follow md5('|'-joined coords) hex order — replicate
    val pts = Seq(3L, 7L, 11L)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expectOrder = pts.sortBy(p => (md5hex(p.toString), p))
    val fixed = Clustering.kmeansLloyd(pts.toDF("x"), Seq(col("x")),
      k = 3, iters = 2).orderBy("cluster").collect()
    assert(fixed.map(_.getAs[Long]("c0")).toSeq == expectOrder)
    assert(fixed.forall(r => r.getAs[Long]("n") == 1L &&
      r.getAs[Double]("mean_sqdist") == 0.0))
    // span above the d-dependent fast-path bound routes the ITERATION
    // loop to the decimal distance class and converges identically in
    // structure: blobs at 0 and 1e10 (span > spanBound≈3.04e9 for d=1,
    // inside the [0, 1e12] contract) — same geometry as the long-path
    // two-blob case, scaled
    val hugeKm = Clustering.kmeansLloyd(
      Seq(0L, 1L, 10000000000L, 10000000001L).toDF("x"),
      Seq(col("x")), k = 2, iters = 6).orderBy("c0").collect()
    assert(hugeKm.map(_.getAs[Long]("c0")).toSeq == Seq(0L, 10000000000L))
    assert(hugeKm.forall(_.getAs[Long]("n") == 2L))
    // refusals: negative coords, k above the distinct-tuple count
    intercept[IllegalArgumentException] {
      Clustering.kmeansLloyd(Seq(-1L, 2L).toDF("x"), Seq(col("x")), 1, 1)
    }
    intercept[IllegalArgumentException] {
      Clustering.kmeansLloyd(Seq(5L, 5L).toDF("x"), Seq(col("x")), 2, 1)
    }
  }

  test("silhouetteSimplified: separated clusters score 1, layout-free, k>=2") {
    // two point masses at 0 and 10, k=2: each point sits ON its centroid
    // (a=0) with the other 10 away (b=10) → s = 1 everywhere
    val df = Seq(0L, 0L, 10L, 10L).toDF("x")
    val rows = Clustering.silhouetteSimplified(df, Seq(col("x")), k = 2,
      iters = 3).collect()
    assert(rows.map(_.getAs[Int]("cluster")).toSeq == Seq(-1, 0, 1))
    assert(rows.forall(_.getAs[Double]("mean_sil") == 1.0))
    assert(rows.head.getAs[Long]("n") == 4L) // the ALL rollup
    // a point midway scores lower than the on-centroid points, and the
    // readout is partition-layout free (weighted decimal sums)
    val mid = (Seq.fill(20)(0L) ++ Seq.fill(20)(100L) ++ Seq(40L)).toDF("x")
    val a = Clustering.silhouetteSimplified(mid.repartition(7),
      Seq(col("x")), 2, 6).collect()
    val b = Clustering.silhouetteSimplified(mid.repartition(2),
      Seq(col("x")), 2, 6).collect()
    assert(a.toSeq == b.toSeq)
    val all = a.find(_.getAs[Int]("cluster") == -1).get
    assert(all.getAs[Double]("mean_sil") > 0.5 &&
      all.getAs[Double]("mean_sil") < 1.0)
    intercept[IllegalArgumentException] {
      Clustering.silhouetteSimplified(df, Seq(col("x")), 1, 1)
    }
    // span above the d-dependent fast-path bound must route to the
    // decimal path and still score the two tight far-apart masses
    // exactly 1 (span 1e10 > spanBound≈3.04e9 for d=1, inside
    // kmeansLloyd's [0, 1e12] coordinate contract). NOTE the raw-long
    // wrap the BigInt span guards against is unreachable through THIS
    // entry point today — kmeansLloyd requires non-negative coords
    // ≤ 1e12, so max−min always fits a long — the BigInt form is
    // defense-in-depth should that contract ever loosen.
    val huge = Seq(0L, 0L, 10000000000L, 10000000000L).toDF("x")
    val h = Clustering.silhouetteSimplified(huge, Seq(col("x")), 2, 3)
      .collect()
    assert(h.forall(_.getAs[Double]("mean_sil") == 1.0))
  }
  test("kmeans/silhouette: packed-long argmin path == decimal struct path " +
      "byte-for-byte, ties included") {
    // The long fast path now packs (dist, idx) into dist·k + j and takes
    // least(...) / a when-chain second-least; the decimal path keeps the
    // (d, i) struct array_min / array_sort. Both must publish IDENTICAL
    // rows on the same data — including argmin ties: with centroids
    // converging to 0 and 10, the value 5 is equidistant (25 each) and
    // must break to the smaller cluster index on BOTH paths.
    val df = (Seq.fill(8)(0L) ++ Seq.fill(8)(10L) ++
      Seq(5L, 3L, 7L, 2L, 8L, 1L, 9L)).toDF("x")
    val kmFast = Clustering.kmeansLloyd(df, Seq(col("x")), k = 2, iters = 4)
      .orderBy("cluster").collect()
    val kmDec = Clustering.kmeansLloyd(df, Seq(col("x")), k = 2, iters = 4,
      forceDecimalPath = true).orderBy("cluster").collect()
    assert(kmFast.toSeq == kmDec.toSeq)
    val silFast = Clustering.silhouetteSimplified(df, Seq(col("x")), k = 2,
      iters = 4).collect()
    val silDec = Clustering.silhouetteSimplified(df, Seq(col("x")), k = 2,
      iters = 4, forceDecimalPath = true).collect()
    assert(silFast.toSeq == silDec.toSeq)
    // 2-D: exercises the summed packed distance and the d-dependent bound
    val df2 = Seq((0L, 0L), (1L, 1L), (50L, 49L), (51L, 50L), (25L, 25L),
      (0L, 1L), (50L, 50L), (26L, 24L)).toDF("x", "y")
    val feats = Seq(col("x"), col("y"))
    val km2F = Clustering.kmeansLloyd(df2, feats, k = 3, iters = 5)
      .orderBy("cluster").collect()
    val km2D = Clustering.kmeansLloyd(df2, feats, k = 3, iters = 5,
      forceDecimalPath = true).orderBy("cluster").collect()
    assert(km2F.toSeq == km2D.toSeq)
    val sil2F = Clustering.silhouetteSimplified(df2, feats, k = 3, iters = 5)
      .collect()
    val sil2D = Clustering.silhouetteSimplified(df2, feats, k = 3, iters = 5,
      forceDecimalPath = true).collect()
    assert(sil2F.toSeq == sil2D.toSeq)
  }

  test("gmm1d: separated clusters converge to exact-replay params, tiny n refuses") {
    import spark.implicits._
    // 10x"10" + 10x"100": p25/p75 init lands on the cluster values;
    // three 9dp-rounded EM rounds pin to the independently replayed
    // fixed point (the residual 1e-6/1e-5 dust IS the documented
    // deterministic readout, not noise)
    val df = (Seq.fill(10)(10L) ++ Seq.fill(10)(100L)).toDF("x")
    val r = graft.operators.Clustering.gmm1d(df, col("x")).head()
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("mu1") == 10.000001 && r.getAs[Double]("mu2") == 99.999999)
    assert(r.getAs[Double]("sigma2_1") == 8.8e-5 && r.getAs[Double]("sigma2_2") == 2.0e-5)
    assert(r.getAs[Double]("w1") == 0.5 && r.getAs[Double]("w2") == 0.5)
    // a single constant value: both components land on it, ordered
    val const = graft.operators.Clustering.gmm1d(
      Seq.fill(5)(7L).toDF("x"), col("x")).head()
    assert(const.getAs[Double]("mu1") == 7.0 && const.getAs[Double]("mu2") == 7.0)
    assert(const.getAs[Double]("sigma2_1") == 0.000001)
    intercept[IllegalArgumentException] {
      graft.operators.Clustering.gmm1d(Seq(1L).toDF("x"), col("x"))
    }
  }
}
