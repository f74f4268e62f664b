package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Join-skew probe — the cheap question to ask BEFORE paying for a big
 * join or entity-match pass: how skewed is each candidate key's
 * multiplicity distribution? (The q138 entity-match family documents
 * exactly this pre-flight; this operator makes it first-class for any
 * key.)
 *
 * For each key column: count per key value (map-combined), tag with the
 * column name, and run the exact histogram-bisection quantile selection
 * ([[Quantiles]]) over the multiplicity distribution — p=1.0 is the max
 * (the heaviest key's fan-out), the p50/p875 spread is the skew shape.
 * Everything downstream of the per-key counts is count-relation-sized
 * (ndv rows, not event rows), and the quantile pass never sorts a full
 * group.
 */
object SkewProbe {

  /** @return (key_col, p DOUBLE, value DOUBLE multiplicity) per quantile. */
  def multiplicityProfile(df: DataFrame, keyCols: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.75, 0.875, 1.0)): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val counts = keyCols.map { k =>
      df.groupBy(col(k)).agg(count(lit(1)).as("cnt"))
        .select(lit(k).as("key_col"), col("cnt").cast("double").as("cnt"))
    }.reduce(_ unionByName _)
    Quantiles.exactQuantiles(counts, Seq("key_col"), "cnt", ps)
  }
}
