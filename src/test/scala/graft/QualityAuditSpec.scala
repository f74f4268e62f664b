package graft

import graft.operators.QualityAudit._

class QualityAuditSpec extends SparkSpec {
  import spark.implicits._

  test("each rule counts its violations with the documented NULL semantics") {
    val df = Seq(
      (1L, Some(5.0), Some("x")),
      (1L, Some(60.0), None),        // dup key; out of range; null s
      (2L, None, Some("y")),         // null v: NOT a range violation
      (9L, Some(10.0), Some("z"))    // 9 missing from dim
    ).toDF("k", "v", "s")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val got = audit(df, Seq(
        NotNull("s"), Bounds("v", 1.0, 50.0),
        Unique(Seq("k")), RefIntegrity("k", dim, "dk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null:s" -> 1L,
      "range:v" -> 1L,      // 60.0 only; the NULL is not counted here
      "unique:k" -> 1L,     // one extra row for key 1
      "ref:k" -> 1L))       // key 9
  }

  test("clean data reports zero everywhere (coalesced empties)") {
    val df = Seq((1L, 2.0)).toDF("k", "v")
    val got = audit(df, Seq(Bounds("v", 1.0, 3.0), Unique(Seq("k"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L))
  }
}
