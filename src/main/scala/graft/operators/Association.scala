package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Market-basket co-occurrence and association rules: support-counted item
 * pairs plus confidence/lift — the first pass of Apriori (Agrawal &
 * Srikant, VLDB 1994), which at warehouse scale is usually the ONLY pass
 * anyone needs (pairs drive "bought together"; k≥3 itemsets are rarely
 * actionable).
 *
 * Shape at scale: distinct (basket, item) first — multiplicity inside a
 * basket must not inflate support — then pairs via a basket-keyed
 * self-join (item_a < item_b). The join is keyed on the BASKET, so the
 * shuffle is one partition pass of the basket-item table and the blowup
 * per basket is items², bounded by `maxItemsPerBasket` (a loud guard: a
 * degenerate mega-basket would otherwise square silently — same contract
 * as PPJoin's posting caps). Pair counting and single-item supports
 * partially aggregate map-side; the metrics join is |items|-sized and
 * broadcast.
 *
 * Reference anchor: none (the reference has no analytics of this shape);
 * SURVEY §2 extension family.
 */
object Association {

  /**
   * Association pairs: (item_a, item_b, support, conf_ab, conf_ba, lift)
   * for item_a < item_b, support ≥ `minSupport` baskets. conf_ab =
   * P(b∈basket | a∈basket), lift = n·supp(ab)/(supp(a)·supp(b)) — both
   * 6dp-rounded pure functions of exact counts.
   */
  def pairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxItemsPerBasket: Int = 1000): DataFrame = {
    // referenced by the guard, the basket count, the singles agg and BOTH
    // self-join sides — five actions would otherwise re-derive the
    // upstream (possibly join-shaped) basket table each time
    val bi = df.select(col(basketCol).as("b"), col(itemCol).cast("string").as("i"))
      .where(col("i").isNotNull).distinct().cache()
    val fat = bi.groupBy(col("b")).agg(count(lit(1)).as("sz"))
      .where(col("sz") > maxItemsPerBasket).limit(1).collect()
    require(fat.isEmpty,
      s"basket ${fat.headOption.map(_.get(0))} exceeds maxItemsPerBasket=$maxItemsPerBasket")
    val nBaskets = bi.select(col("b")).distinct().count()
    val singles = bi.groupBy(col("i")).agg(count(lit(1)).as("supp"))
    val l = bi.select(col("b"), col("i").as("item_a"))
    val r = bi.select(col("b"), col("i").as("item_b"))
    val pairSupp = l.join(r, Seq("b")).where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
    pairSupp
      .join(broadcast(singles.select(col("i").as("item_a"), col("supp").as("__sa"))), "item_a")
      .join(broadcast(singles.select(col("i").as("item_b"), col("supp").as("__sb"))), "item_b")
      .select(col("item_a"), col("item_b"), col("support"),
        round(col("support").cast("double") / col("__sa").cast("double"), 6).as("conf_ab"),
        round(col("support").cast("double") / col("__sb").cast("double"), 6).as("conf_ba"),
        round(lit(nBaskets).cast("double") * col("support").cast("double")
          / (col("__sa").cast("double") * col("__sb").cast("double")), 6).as("lift"))
  }

  /**
   * Item-item "bought together" recommendations: binary-basket cosine
   * sim(a,b) = supp(ab)/√(supp(a)·supp(b)) = √(conf_ab·conf_ba) — a pure
   * rounded function of [[pairs]]' PUBLISHED columns (cross-engine
   * reproducible by construction); both rule directions feed the bounded
   * top-k-per-item ranking ([[graft.plans.TopK.perKey]], rec-name
   * tiebreak). Output: (item, rec, sim, rank).
   */
  def recommendations(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, topK: Int = 3): DataFrame = {
    val p = pairs(df, basketCol, itemCol, minSupport)
      .withColumn("sim", round(sqrt(col("conf_ab") * col("conf_ba")), 6))
    val both = p.select(col("item_a").as("item"), col("item_b").as("rec"), col("sim"))
      .unionByName(p.select(col("item_b").as("item"), col("item_a").as("rec"), col("sim")))
    graft.plans.TopK.perKey(both, Seq("item"), "sim", topK, "rec", desc = true)
  }
}
