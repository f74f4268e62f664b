package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/**
 * In-engine supervised document classification — the CCNet/fastText role
 * (gating a corpus by a TRAINED classifier rather than hand rules) as
 * pure relational algebra: train on one deterministic hash split of the
 * corpus, score the other, entirely inside the plan. No model file, no
 * driver-side training loop, no UDF — the "model" is three count
 * relations, and scoring is a join.
 */
object Classify {

  /**
   * Multinomial Naive Bayes over whitespace tokens, trained and
   * evaluated in ONE plan. Split is [[Sampling.sampledFlag]] (pure
   * function of (salt, id) — reproducible, leakage-safe); training is
   * token counting: per-class token counts c(w,c), class token totals,
   * train-vocab size V, and doc-count priors, all exact integers.
   * Scoring a test doc for class c is the textbook smoothed log
   * posterior
   *
   *   score(d,c) = ln(n_c/n_train) + Σ_{w∈d} ln((c(w,c)+1)/(tot_c+V))
   *
   * with EVERY ln term 12dp-rounded and DECIMAL(38,12)-summed (the Σ
   * doctrine — partial-sum order cannot leak into the published
   * prediction), Laplace α=1, and unseen-in-train tokens taking the
   * α/(tot_c+V) floor. Prediction is the exact-decimal argmax,
   * ties broken by smallest class label.
   *
   * Shape at scale: tokens explode once (no shuffle), the count tables
   * shuffle keyed on the TOKEN (map-side combined, linear in token
   * volume — never keyed on a doc pair); per-token class counts ride as
   * a |C|-bounded map per vocab row; test tokens join that table on the
   * token key and fan out by the broadcast class table — the only row
   * multiplier is |C|, probed and REFUSED above `maxClasses` before any
   * scoring work. Output: the test-split confusion matrix
   * (label, predicted, n_docs) ordered — rows sum to the test doc
   * count; labels absent from train appear as rows but never as
   * predictions. Docs with NULL text or no tokens after whitespace
   * splitting (empty / whitespace-only) are excluded from BOTH splits
   * up front — they carry no evidence and would otherwise pollute the
   * class priors (train) or score as a phantom empty token (test).
   */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainFrac: Double = 0.8, salt: String = "nb",
      maxClasses: Int = 64): DataFrame = {
    require(trainFrac > 0.0 && trainFrac < 1.0,
      s"trainFrac must be in (0,1): $trainFrac")
    // fanOut ahead of tokenization: the documents scan is row-group
    // bound (1 task on the gate fixture) and the whole tokenize +
    // explode pipeline serialized on it (measured 0.8 s single-task
    // stages in q400/q402); no-op at scale
    val base = graft.functions.GraftFunctions.fanOut(
        docs.select(col(idCol).as("id"),
          col(labelCol).cast("string").as("__y0"),
          col(textCol).as("__t0")))
      .select(col("id"), col("__y0").cast("string").as("y"),
        // split("", "\\s+") yields [""] — a PHANTOM token that would
        // count into V and every posterior, so zero-length tokens are
        // removed at tokenization (mirrored in the DuckDB oracle)
        array_remove(whitespaceTokens(lower(col("__t0"))), "").as("ws"))
      // NULL-text AND tokenless (empty / whitespace-only) docs are
      // excluded UP FRONT (not silently dropped at the explode): they
      // would otherwise count into the class priors but never score,
      // breaking "confusion mass == test doc count"
      .where(col("id").isNotNull && col("y").isNotNull &&
        col("ws").isNotNull && size(col("ws")) > 0)
      .withColumn("is_train", Sampling.sampledFlag(col("id"), trainFrac, salt))
    val classes = base.where(col("is_train")).groupBy(col("y"))
      .agg(count(lit(1)).as("n_docs"))
    // probe-then-refuse: |C| is the scoring row multiplier below
    val nClasses = classes.limit(maxClasses + 1).count()
    require(nClasses >= 1, "naiveBayes: train split has no labeled docs")
    require(nClasses <= maxClasses,
      s"naiveBayes: > $maxClasses train classes — the class table is a " +
        "broadcast row multiplier; bucket the label first")
    val toks = base.select(col("id"), col("y"), col("is_train"),
      explode(col("ws")).as("w"))
    val cnt = toks.where(col("is_train")).groupBy(col("w"), col("y"))
      .agg(count(lit(1)).as("c"))
    val classTok = cnt.groupBy(col("y")).agg(sum(col("c")).as("tot"))
    val vocabN = cnt.select(col("w")).distinct().agg(count(lit(1)).as("v"))
    val tokMap = cnt.groupBy(col("w"))
      .agg(map_from_entries(collect_list(struct(col("y"), col("c")))).as("m"))
    val classesFull = classes.join(classTok, Seq("y"))
      .crossJoin(vocabN)
      .crossJoin(classes.agg(sum(col("n_docs")).as("n_train")))
      .select(col("y").as("cls"), col("n_docs"), col("tot"), col("v"),
        col("n_train"))
    val decS = "decimal(38,12)"
    val terms = toks.where(!col("is_train"))
      .join(tokMap, Seq("w"), "left")
      .crossJoin(broadcast(classesFull))
      .select(col("id"), col("y"), col("cls"),
        round(log((coalesce(element_at(col("m"), col("cls")), lit(0L))
            + lit(1L)).cast("double")
          / (col("tot") + col("v")).cast("double")), 12).cast(decS).as("t"),
        round(log(col("n_docs").cast("double")
          / col("n_train").cast("double")), 12).cast(decS).as("prior"))
    // the argmax key must keep the FULL 12dp scale: a naive
    // `sum + max` lands in Spark's precision-loss lane (decimal(38,11))
    // and `* -1` would cut further to 6dp, while the DuckDB twin never
    // reduces scale — so both operands cast to decimal(25,12) first
    // (score magnitude < 10¹³ for any corpus that fits in storage:
    // ≥ −30 per token), making the add exact at (26,12), and the
    // negation is type-preserving unary minus
    val perClass = terms.groupBy(col("id"), col("y"), col("cls"))
      .agg((sum(col("t")).cast("decimal(25,12)")
        + max(col("prior")).cast("decimal(25,12)")).as("score"))
    val pred = perClass.groupBy(col("id"), col("y"))
      .agg(min(struct((-col("score")).as("ns"),
        col("cls").as("cls"))).as("best"))
      .select(col("y").as("label"), col("best.cls").as("predicted"))
    pred.groupBy(col("label"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("label"), col("predicted"))
  }

  /**
   * Classifier quality readout from a confusion RELATION
   * (label, predicted, count) — [[naiveBayes]]'s output shape, or any
   * counted predictions: accuracy, Cohen's κ and the macro-averaged
   * precision/recall/F1 in one row. Every input is an exact long count;
   * κ is the exact integer rational (n·diag − Σ row·col)/(n² − Σ row·col)
   * — chance-corrected agreement, the number that exposes an
   * accuracy-flattering majority-class classifier — published as one
   * double divide, NULL (loudly) when both margins are a single class
   * (pe = 1, κ undefined). Per-class precision = tp/col, recall =
   * tp/row, F1 = 2tp/(2tp+fp+fn) (the single-divide harmonic form, not
   * a composition of rounded P and R); a class never predicted takes
   * precision/F1 = 0 (stated, rather than silently NaN — the spirit of
   * sklearn's zero_division=0, NOT sklearn-equivalent: sklearn's macro
   * average runs over the UNION of true and predicted labels, while
   * here macro means run over the LABEL (row) classes only — a
   * predicted-only class affects κ's chance term pe but is excluded
   * from n_classes and the macro sums, by declared contract). Macro
   * means are 12dp-rounded per-class
   * terms DECIMAL-summed over the LABEL classes, one divide by k.
   * Plan: the confusion relation is |labels|·|preds|-bounded BY
   * CONSTRUCTION, so it is probe-refused above `maxCells` and pinned
   * locally — the (possibly expensive) plan PRODUCING it runs exactly
   * once, not once per margin aggregation; nothing here touches
   * unit-level data. Output: (n, n_classes, accuracy, kappa,
   * macro_precision, macro_recall, macro_f1), 6dp.
   */
  def confusionMetrics(confusion: DataFrame, labelCol: String,
      predCol: String, nCol: String, maxCells: Int = 65536): DataFrame = {
    val decS = "decimal(38,12)"
    val c0 = confusion.select(col(labelCol).cast("string").as("y"),
        col(predCol).cast("string").as("p"), col(nCol).cast("long").as("m"))
      .where(col("y").isNotNull && col("p").isNotNull && col("m") > 0)
    val pinned = c0.limit(maxCells + 1).collect()
    require(pinned.length <= maxCells,
      s"confusionMetrics: > $maxCells confusion cells — not a class-pair" +
        "-bounded relation; aggregate (label, predicted) first")
    val c = confusion.sparkSession.createDataFrame(
      java.util.Arrays.asList(pinned: _*), c0.schema)
    val rows = c.groupBy(col("y")).agg(sum(col("m")).as("row_n"),
      sum(when(col("p") === col("y"), col("m")).otherwise(0L)).as("tp"))
    val cols = c.groupBy(col("p")).agg(sum(col("m")).as("col_n"))
    val per = rows.join(cols, col("y") === col("p"), "left")
      .select(col("row_n"), col("tp"),
        coalesce(col("col_n"), lit(0L)).as("col_n"))
    val fp = col("col_n") - col("tp")
    val fn = col("row_n") - col("tp")
    val prec = when(col("col_n") > 0,
      round(col("tp").cast("double") / col("col_n").cast("double"), 12))
      .otherwise(lit(0.0))
    val rec = round(col("tp").cast("double") / col("row_n").cast("double"), 12)
    val f1 = when(lit(2L) * col("tp") + fp + fn > 0,
      round((lit(2L) * col("tp")).cast("double")
        / (lit(2L) * col("tp") + fp + fn).cast("double"), 12))
      .otherwise(lit(0.0))
    val agg0 = per.agg(count(lit(1)).as("k"),
      sum(col("row_n")).as("nn"), sum(col("tp")).as("diag"),
      // decimal BEFORE the multiply — a Long product wraps silently past
      // ~3e9-row margins while the HUGEINT oracle stays exact
      sum(col("row_n").cast("decimal(19,0)") * col("col_n").cast("decimal(19,0)"))
        .as("pe_s"),
      sum(prec.cast(decS)).as("p_s"), sum(rec.cast(decS)).as("r_s"),
      sum(f1.cast(decS)).as("f_s"))
    val n2 = (col("nn").cast("decimal(19,0)") * col("nn").cast("decimal(19,0)"))
      .cast("decimal(38,0)")
    agg0.select(col("nn").as("n"), col("k").as("n_classes"),
      round(col("diag").cast("double") / col("nn").cast("double"), 6)
        .as("accuracy"),
      when(n2 =!= col("pe_s"),
        round((col("nn").cast("decimal(19,0)") * col("diag").cast("decimal(19,0)")
            - col("pe_s")).cast("decimal(38,0)").cast("double")
          / (n2 - col("pe_s")).cast("double"), 6)).as("kappa"),
      round(col("p_s").cast("double") / col("k").cast("double"), 6)
        .as("macro_precision"),
      round(col("r_s").cast("double") / col("k").cast("double"), 6)
        .as("macro_recall"),
      round(col("f_s").cast("double") / col("k").cast("double"), 6)
        .as("macro_f1"))
  }
}
