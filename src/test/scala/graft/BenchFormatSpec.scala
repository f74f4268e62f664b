package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract constraint on the bench stdout record: the
  * driver captures only the LAST 2000 bytes of stdout (measured from
  * BENCH_r09.json's `tail` length) and sbt appends a ~80-byte
  * "[success] Total time ..." trailer after our last line. The compact
  * record must therefore stay under ~1900 bytes at the CURRENT query
  * count — this spec fails the build the moment query growth breaks
  * that, instead of silently costing another round of driver records. */
class BenchFormatSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("short keys are the qNN prefix and collide for no registered query") {
    assert(BenchFormat.shortKey("q01_filter_range") == "q01")
    assert(BenchFormat.shortKey("q130_rag_prep") == "q130")
    val shorts = names.map(BenchFormat.shortKey)
    assert(shorts.distinct.size == names.size)
  }

  test("compact line fits the driver tail window with worst-case values") {
    // 99.99 is a per-query worst case with margin: the heaviest query on
    // record (q111) runs ~15 s; a 100 s single query would itself be a
    // regression caught elsewhere. 3x today's query count: the slowest-60
    // cut must keep the line bounded regardless of growth.
    val results = (names ++ (500 until 500 + 2 * names.size)
      .map(i => s"q${i}_synthetic")).map(_ -> 99.99)
    val line = BenchFormat.formatCompact(results, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(
      line.length <= 1900,
      s"compact bench line is ${line.length} bytes at ${results.size} queries — " +
        "over the 1900-byte budget (2000-byte driver tail minus sbt trailer).")
  }

  test("compact line keeps the slowest queries and totals ALL of them") {
    val results = (1 to 100).map(i => (f"q$i%03d_x", if (i <= 70) 0.1 else 5.0))
    val line = BenchFormat.formatCompact(results, "sf", keep = 30)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("n").asInt == 100)
    assert(node.get("queries").size == 30)
    // every kept entry is one of the 5.0 s slow queries
    val it = node.get("queries").fields()
    while (it.hasNext) assert(it.next().getValue.asDouble == 5.0)
    assert(math.abs(node.get("value").asDouble - (70 * 0.1 + 30 * 5.0)) < 1e-6)
  }

  test("compact line is valid JSON with the contract fields") {
    val results = Seq("q01_filter_range" -> 1.234, "q100_audio_spectrum" -> 0.5)
    val line = BenchFormat.formatCompact(results, "/root/testdata/sf0.1")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(math.abs(node.get("value").asDouble - 1.73) < 1e-9)
    assert(node.get("sf").asText == "sf0.1")
    assert(node.get("reps").asInt == 1) // default param; Bench passes its N
    val r2 = BenchFormat.formatCompact(results, "sf", reps = 2)
    val r2node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r2)
    assert(r2node.get("reps").asInt == 2)
    val qs = node.get("queries")
    assert(qs.size == 2)
    assert(math.abs(qs.get("q01").asDouble - 1.2) < 1e-9)
    assert(math.abs(qs.get("q100").asDouble - 0.5) < 1e-9)
    // adaptive precision: >= ~10 s renders whole seconds
    val slow = BenchFormat.formatCompact(Seq("q01_filter_range" -> 12.34), "sf")
    val slowNode = new com.fasterxml.jackson.databind.ObjectMapper().readTree(slow)
    assert(math.abs(slowNode.get("queries").get("q01").asDouble - 12.0) < 1e-9)
  }

  test("full line keeps full names and 3-decimal grain") {
    val results = Seq("q01_filter_range" -> 1.2345)
    val line = BenchFormat.formatFull(results, "/root/testdata/sf0.1", 2, "32")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(math.abs(node.get("queries").get("q01_filter_range").asDouble - 1.235) < 1e-9)
    assert(node.get("reps").asInt == 2)
    assert(node.get("sf").asText == "/root/testdata/sf0.1")
  }

  test("failed queries are named in the full record and counted compactly") {
    val results = Seq("q01_filter_range" -> 1.0, "q02_filter_in_like" -> 0.01)
    val full = BenchFormat.formatFull(results, "sf0.1", 2, "32",
      failed = Seq("q02_filter_in_like"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(full)
    assert(node.get("failed").get(0).asText == "q02_filter_in_like")
    val compact = BenchFormat.formatCompact(results, "sf0.1", failed = 1)
    val cn = new com.fasterxml.jackson.databind.ObjectMapper().readTree(compact)
    assert(cn.get("failed").asInt == 1)
    // absent when clean — the healthy record shape is unchanged
    assert(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(BenchFormat.formatFull(results, "sf0.1", 2, "32"))
      .get("failed") == null)
  }

  test("gate invariant: every declared query has an oracle and vice versa " +
      "(a missing entry would silently become a no_oracle driver row)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    // name discipline: every key is qNNN_snake and numbers are unique
    val nums = q.toSeq.map { n =>
      assert(n.matches("q\\d+_[a-z0-9_]+"), s"bad query name: $n")
      n.drop(1).takeWhile(_.isDigit).toInt
    }
    assert(nums.distinct.size == nums.size, "duplicate query numbers")
  }
}
