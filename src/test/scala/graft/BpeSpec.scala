package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{bpeCount, bpeEncode}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r")

  private def enc(s: String): Seq[String] =
    Seq(s).toDF("t").select(bpeEncode(col("t"), merges).as("x"))
      .head().getSeq[String](0)

  test("greedy merge follows table priority, not adjacency order") {
    // "ther": (t,h) rank0 -> [th,e,r]; (th,e) rank1 beats (e,r) rank3
    // -> [the,r]. A rank slip would produce [th,er] instead.
    assert(enc("ther") == Seq("the", "r"))
    assert(enc("the") == Seq("the"))
    assert(enc("thin") == Seq("th", "in"))
  }

  test("same-pair occurrences merge left-to-right without overlap") {
    val m2 = Seq("a" -> "a")
    val out = Seq("aaa aaaa").toDF("t")
      .select(bpeEncode(col("t"), m2).as("x")).head().getSeq[String](0)
    // aaa -> [aa, a]; aaaa -> [aa, aa]
    assert(out == Seq("aa", "a", "aa", "aa"))
  }

  test("unknown chars stay split; empty/whitespace text -> 0 tokens; count matches encode") {
    assert(enc("xyz") == Seq("x", "y", "z"))
    val df = Seq("", "   ", "the in xx").toDF("t")
      .select(bpeCount(col("t"), merges).as("n")).collect().map(_.getInt(0))
    assert(df.toSeq == Seq(0, 0, 4))
  }

  test("surrogate pairs survive the symbol split") {
    // U+1F600 is one symbol, not two broken chars
    val out = enc("a😀b")
    assert(out == Seq("a", "😀", "b"))
  }
}
