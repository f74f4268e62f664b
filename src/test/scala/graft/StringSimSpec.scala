package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.jaroWinkler
import graft.expr.StringSimKernel
import org.apache.spark.unsafe.types.UTF8String

class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimKernel.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values match DuckDB's jaro_winkler_similarity") {
    // values probed from DuckDB 'jaro_winkler_similarity' directly
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("", "") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no same-position matches
    // boost only above jaro 0.7 (DuckDB-verified):
    assert(math.abs(jw("abcdefgh", "abzzzzzz") - 0.5) < 1e-12)
    assert(math.abs(jw("aaapppp", "aaaqqqq") - 0.6190476190476191) < 1e-12)
  }

  test("nameMatchBlocked recovers a planted transposed twin and respects a<b") {
    val ents = Seq(
      (1L, "belmona"), (2L, "blemona"),   // transposed twin, same block b_7
      (3L, "corrisa"),                    // same length, different first char
      (4L, "belmonax")                    // different length -> different block
    ).toDF("k", "nm")
    val out = graft.pipeline.EntityMatch.nameMatchBlocked(ents, "k", "nm", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1)
    val (a, b, sim) = out.head
    assert((a, b) == ((1L, 2L)))
    // m=7, t=1, prefix=1: jaro=(1+1+6/7)/3, jw = jaro + 0.1*(1-jaro)
    val jaro = (1.0 + 1.0 + 6.0 / 7.0) / 3.0
    val expected = BigDecimal(jaro + 0.1 * (1.0 - jaro))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sim == expected)
  }
}
