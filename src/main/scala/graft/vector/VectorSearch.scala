package graft.vector

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/**
 * Vector similarity search — the engine's answer to the reference's
 * `vectorSearch(table, {fieldName, queryVector, topK, distanceThreshold})`
 * (/root/reference/lib/tostore.dart:493-511) and its NGH/Vamana ANN index
 * (/root/reference/lib/src/core/ngh_graph_engine.dart:14-23).
 *
 * A graph index is a pointer-chasing structure — the wrong shape for a
 * shared-nothing engine. The Spark-native design:
 *   - exact: scan + codegen'd distance expression + TakeOrderedAndProject
 *     (O(N·d) per query but embarrassingly parallel; the correctness
 *     oracle);
 *   - IVF: k-means centroids (tiny model on the driver), assignment column
 *     written once; a query prunes to nprobe nearest partitions — the
 *     100 TB path, same recall/latency knobs as FAISS-IVF;
 *   - LSH: spark.ml BucketedRandomProjectionLSH for join-style ANN.
 *
 * Result schema matches the reference: (pk, distance, score∈[0,1])
 * (query_result.dart:207-228).
 */
object VectorSearch {

  /** distance Column for a metric (l2 | cosine | innerProduct —
    * table_schema.dart:2511-2531; cosine is the reference default). */
  def distCol(metric: String, v: Column, q: Column): Column = metric match {
    case "l2"           => l2Distance(v, q)
    case "cosine"       => cosineDistance(v, q)
    case "innerProduct" => innerProductDistance(v, q)
    case m              => throw new IllegalArgumentException(s"unknown metric $m")
  }

  private def qArray(queryVector: Seq[Double]): Column =
    array(queryVector.map(lit): _*)

  /** Exact top-K: full scan, distance in whole-stage codegen, global
    * TakeOrderedAndProject (per-partition heap + driver merge — no full
    * sort, no shuffle of the data). */
  def exact(
      table: DataFrame,
      pkCol: String,
      vecCol: String,
      queryVector: Seq[Double],
      topK: Int = 10,
      metric: String = "cosine",
      distanceThreshold: Option[Double] = None): DataFrame = {
    val d = distCol(metric, col(vecCol), qArray(queryVector))
    val out = table
      .where(col(vecCol).isNotNull) // null vectors would sort (nulls-first) into the top-K
      .select(col(pkCol).as("pk"), round(d, 6).as("distance"))
      .withColumn("score", round(vectorScore(metric, col("distance")), 6))
    val thresholded = distanceThreshold.fold(out)(t => out.where(col("distance") <= t))
    thresholded.orderBy(col("distance").asc, col("pk").asc).limit(topK)
  }

  /**
   * Binary (sign-bit) quantized search — the 64×-compression rung of the
   * precision ladder (float32 → int8 → PQ → this): stage 1 ranks by
   * hamming distance between 64-plane sign signatures (`SignLshExpr`
   * kernel; two XOR+popcounts per row against 16 bytes of state — the
   * cheapest possible scan), stage 2 re-ranks the topK×rerankFactor
   * window at full precision. With `rerankFactor·topK ≥ N` the window is
   * the corpus and the result EQUALS `exact` — the q96-style degeneration
   * regime the q114 gate hash-matches; at production factors recall
   * depends on how much angular structure the embeddings have (sign
   * bits quantize direction only — the spec publishes measured recall
   * on TESTDATA). Output: (pk, distance, score), `exact`'s schema.
   */
  def binarySearch(
      table: DataFrame,
      pkCol: String,
      vecCol: String,
      queryVector: Seq[Double],
      topK: Int = 10,
      metric: String = "cosine",
      rerankFactor: Int = 10): DataFrame = {
    val spark = table.sparkSession
    import spark.implicits._
    val planes = 64
    def sigOf(v: Column) = kcol(graft.expr.SignLshExpr(kexp(v), planes))
    // query signature through the SAME kernel on a one-row plan, packed
    // into unsigned 32-bit halves like every 64-bit hash in the repo
    val qSig = Seq(Tuple1(queryVector)).toDF("v")
      .select(sigOf(col("v"))).head.getString(0)
    val qHi = java.lang.Long.parseLong(qSig.substring(0, 32), 2)
    val qLo = java.lang.Long.parseLong(qSig.substring(32, 64), 2)
    val withSig = table.where(col(vecCol).isNotNull)
      .withColumn("__sig", sigOf(col(vecCol)))
      .withColumn("__hi", conv(substring(col("__sig"), 1, 32), 2, 10).cast("long"))
      .withColumn("__lo", conv(substring(col("__sig"), 33, 32), 2, 10).cast("long"))
    val cands = withSig
      .withColumn("__ham",
        (bit_count(col("__hi").bitwiseXOR(lit(qHi))) +
          bit_count(col("__lo").bitwiseXOR(lit(qLo)))).cast("int"))
      .orderBy(col("__ham").asc, col(pkCol).asc)
      .limit(topK * rerankFactor) // TakeOrdered: no global sort materializes
    val d = distCol(metric, col(vecCol), qArray(queryVector))
    cands
      .select(col(pkCol).as("pk"), round(d, 6).as("distance"))
      .withColumn("score", round(vectorScore(metric, col("distance")), 6))
      .orderBy(col("distance").asc, col("pk").asc)
      .limit(topK)
  }

  /** Multi-query exact top-K in ONE job: the query set (tiny: ids ×
    * dim doubles) broadcasts against the table, distances evaluate in
    * whole-stage codegen, and a per-query window keeps K rows. The batch
    * shape a 100 TB ANN serving job wants — one scan amortizes across the
    * whole query set instead of one scan per query. Output: (qid, pk,
    * distance, score, rank). */
  def exactBatch(
      table: DataFrame,
      pkCol: String,
      vecCol: String,
      queries: Seq[(Long, Seq[Double])],
      topK: Int = 10,
      metric: String = "cosine"): DataFrame = {
    val spark = table.sparkSession
    import spark.implicits._
    val qdf = broadcast(queries.toDF("qid", "qv"))
    val d = distCol(metric, col(vecCol), col("qv"))
    val scored = table.where(col(vecCol).isNotNull)
      .join(qdf) // cartesian with a broadcast-tiny side: one pass over the table
      .select(col("qid"), col(pkCol).as("pk"), round(d, 6).as("distance"))
    rankPerQuery(scored, metric, topK)
  }

  /** Shared tail of the batch searches: per-query window top-K + score.
    * Input must carry (qid, pk, distance). */
  private[vector] def rankPerQuery(scored: DataFrame, metric: String, topK: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("distance").asc, col("pk").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .withColumn("score", round(vectorScore(metric, col("distance")), 6))
      .select("qid", "pk", "distance", "score", "rank")
  }

  // ---------- IVF (inverted-file) index ----------

  /** IVF model: centroids live on the driver (nlist × dim doubles — tiny);
    * the indexed table gains a `__ivf_cell` column and should be written
    * back partitioned/clustered by it so a probe prunes file groups. */
  /** For metric=cosine the cell geometry lives in UNIT space (spherical
    * k-means approximation): L2-argmin over unit vectors orders exactly
    * like cosine distance, so centroids are trained on and compared
    * against normalized vectors. Raw L2 cells under a cosine query metric
    * misalign whenever vector norms vary — measured ~10 recall points at
    * nprobe=nlist/2 on the TESTDATA embeddings. */
  final case class IvfModel(centroids: Array[Array[Double]], metric: String) {
    def nearestCells(q0: Seq[Double], nprobe: Int): Seq[Int] = {
      val q = if (metric == "cosine") IvfModel.unit(q0) else q0
      centroids.zipWithIndex.map { case (c, i) =>
        val d = math.sqrt(c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2).toSeq
    }
  }
  object IvfModel {
    private[vector] def unit(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
  }

  /** Train IVF centroids with spark.ml KMeans (seeded, deterministic). */
  def ivfTrain(table: DataFrame, vecCol: String, nlist: Int = 16,
      metric: String = "cosine", seed: Long = 42L): IvfModel = {
    val normalize = metric == "cosine"
    val toVec = udf { (a: Seq[Float]) =>
      val d = a.map(_.toDouble).toArray
      if (normalize) {
        val n = math.sqrt(d.map(x => x * x).sum)
        if (n != 0.0) { var i = 0; while (i < d.length) { d(i) /= n; i += 1 } }
      }
      Vectors.dense(d)
    }
    val feats = table.select(toVec(col(vecCol)).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(feats)
    IvfModel(km.clusterCenters.map(_.toArray), metric)
  }

  /** Assignment column: argmin over centroid distances — pure codegen
    * expression chain (no UDF in the scan path). */
  def ivfCell(model: IvfModel, vecCol0: Column): Column = {
    val assign = (v: Column) => {
      val ds = model.centroids.zipWithIndex.map { case (c, i) =>
        val cc = array(c.map(lit): _*)
        struct(l2Distance(v, cc).as("d"), lit(i).as("i"))
      }
      array_min(array(ds: _*)).getField("i")
    }
    if (model.metric == "cosine")
      graft.functions.GraftFunctions.bind(greatest(l2Norm(vecCol0), lit(1e-30))) { n =>
        assign(transform(vecCol0, x => x.cast("double") / n))
      }
    else assign(vecCol0)
  }

  /** ANN probe: prune to nprobe cells, exact re-rank inside them. On a
    * table written `partitionBy(__ivf_cell)` the IN-filter becomes
    * partition pruning — only nprobe/nlist of the data is read. */
  def ivfSearch(
      indexed: DataFrame, // must carry __ivf_cell
      model: IvfModel,
      pkCol: String,
      vecCol: String,
      queryVector: Seq[Double],
      topK: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val cells = model.nearestCells(queryVector, nprobe)
    exact(indexed.where(col("__ivf_cell").isin(cells: _*)),
      pkCol, vecCol, queryVector, topK, model.metric)
  }

  /** Add the cell column (call once, then write clustered by it). */
  def ivfIndex(table: DataFrame, model: IvfModel, vecCol: String): DataFrame =
    table.withColumn("__ivf_cell", ivfCell(model, col(vecCol)))

  /**
   * Predicate-constrained ANN — the filtered-search problem every vector
   * store faces (the reference's `vectorSearch` has no predicate surface;
   * this is the production extension). Pre-filter vs post-filter is a
   * correctness trap, not a tuning knob: a WHERE clause can empty the
   * probed cells, so a fixed nprobe silently under-returns. Strategy here:
   * the predicate rides INSIDE the probed-cell scan (one pass — at scale
   * it prunes row groups alongside the cell partition pruning, never a
   * second pass over candidates), and when the probe under-fills `topK`
   * the search ESCALATES nprobe geometrically. The terminal rung scans
   * every cell, where the result EQUALS the exact filtered scan by
   * construction — so selective filters degrade gracefully to
   * brute-force-over-the-filter instead of returning silent partials.
   * ≤ log2(nlist)+1 bounded jobs; the count that drives escalation is on
   * an already-topK-limited result, never the table.
   */
  def ivfSearchFiltered(
      indexed: DataFrame, // must carry __ivf_cell
      model: IvfModel,
      pkCol: String,
      vecCol: String,
      predicate: Column,
      queryVector: Seq[Double],
      topK: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val nlist = model.centroids.length
    var p = math.min(math.max(nprobe, 1), nlist)
    while (p < nlist) {
      val cells = model.nearestCells(queryVector, p)
      val res = exact(indexed.where(col("__ivf_cell").isin(cells: _*) && predicate),
        pkCol, vecCol, queryVector, topK, model.metric)
      if (res.count() >= topK) return res
      p = math.min(p * 2, nlist)
    }
    // full probe: every cell scanned — identical row set to the unindexed
    // filtered scan, so this rung is exact (and oracle-checkable)
    exact(indexed.where(predicate), pkCol, vecCol, queryVector, topK, model.metric)
  }

  /**
   * Hard-negative mining for contrastive training: for each anchor, the
   * `topK` MOST similar rows with a DIFFERENT label, excluding
   * near-duplicates (cosine ≥ `nearDupCeil` — an unlabeled positive in
   * disguise poisons the loss; ceiling from the batch-negative literature,
   * e.g. RocketQA's denoised negatives). The hardest negatives are the
   * ones that move the margin; random negatives are mostly trivial.
   *
   * Shape: anchors BROADCAST (bounded batches — mine in anchor chunks),
   * similarity scored in ONE corpus pass, per-anchor ranking on the
   * bounded top-k-per-key physical operator (shuffle moves topK·|anchors|
   * rows). Similarity rounds to 6dp BEFORE ranking, pk breaks ties — the
   * ranking an external engine reproduces exactly. At higher anchor
   * volume, swap the scan for `ivfSearchFiltered` probes per anchor (the
   * label predicate rides the cell scan).
   *
   * Output: (qid, qlabel, pk, sim, rank), rank 1..topK per anchor.
   */
  def hardNegatives(
      table: DataFrame,
      pkCol: String,
      vecCol: String,
      labelCol: String,
      anchorPredicate: Column,
      topK: Int = 10,
      nearDupCeil: Double = 0.95): DataFrame = {
    val anchors = table.where(anchorPredicate).select(
      col(pkCol).as("qid"), col(vecCol).as("__qv"), col(labelCol).as("qlabel"))
    val sim = cosineSimilarity(col(vecCol), col("__qv"))
    val scored = table.where(col(vecCol).isNotNull)
      .crossJoin(broadcast(anchors))
      .where(col(labelCol) =!= col("qlabel"))
      .select(col("qid"), col("qlabel"), col(pkCol).as("pk"),
        round(sim, 6).as("sim"))
      .where(col("sim") < nearDupCeil)
    graft.plans.TopK.perKey(scored, Seq("qid"), "sim", topK, "pk", desc = true)
  }

  /**
   * IVF-PQ (the FAISS-standard pairing): probe `nprobe` cells (partition
   * pruning on a clustered layout — only nprobe/nlist of the data is
   * READ), rank the probed rows by ADC lookup on the byte codes (no
   * vector math in the scan), then re-rank `topK × rerankFactor`
   * candidates at full precision. The three independently-tested stages
   * composed: cell pruning bounds IO, PQ bounds the scan's CPU and the
   * candidate collect, `exact` carries the result contract.
   */
  def ivfPqSearch(
      indexed: DataFrame, // must carry __ivf_cell + PQ codes column
      ivf: IvfModel,
      pq: PqModel,
      pkCol: String,
      codesCol: String,
      vecCol: String,
      queryVector: Seq[Double],
      topK: Int = 10,
      nprobe: Int = 4,
      metric: String = "l2",
      rerankFactor: Int = 8): DataFrame = {
    val cells = ivf.nearestCells(queryVector, nprobe)
    pqSearch(indexed.where(col("__ivf_cell").isin(cells: _*)),
      pkCol, codesCol, vecCol, pq, queryVector, topK, metric, rerankFactor)
  }

  /** Multi-query IVF probe in ONE job: the probed-cell union becomes a
    * STATIC partition filter (files outside every query's cells are never
    * read), a broadcast (qid, cell) map restricts each query to its own
    * nprobe cells, and a per-query window ranks the exact re-rank. Same
    * output shape as `exactBatch`. */
  def ivfSearchBatch(
      indexed: DataFrame, // cell-partitioned layout (ivfWriteClustered)
      model: IvfModel,
      pkCol: String,
      vecCol: String,
      queries: Seq[(Long, Seq[Double])],
      topK: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val probes = queries.flatMap { case (qid, q) =>
      model.nearestCells(q, nprobe).map(c => qid -> c)
    }
    val allCells = probes.map(_._2).distinct
    val probeDf = broadcast(probes.toDF("qid", "__probe_cell"))
    val qdf = broadcast(queries.toDF("qid", "qv"))
    val d = distCol(model.metric, col(vecCol), col("qv"))
    val scored = indexed
      .where(col("__ivf_cell").isin(allCells: _*)) // static partition pruning
      .join(probeDf, col("__ivf_cell") === col("__probe_cell")) // per-query cells
      .join(qdf, "qid")
      .where(col(vecCol).isNotNull)
      .select(col("qid"), col(pkCol).as("pk"), round(d, 6).as("distance"))
    rankPerQuery(scored, model.metric, topK)
  }

  /** Persist trained centroids (nlist × dim doubles + metric — driver-
    * tiny): a serving job `ivfLoad`s the model instead of retraining, the
    * missing piece between "train once" and "probe forever" (the
    * reference persists its ANN graph the same way,
    * vector_index_manager.dart index files). */
  def ivfSave(model: IvfModel, spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    stagedModelWrite(model.centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, model.metric) }
      .toDF("cell", "centroid", "metric"), path)
  }

  /** Staged write + swap for persisted model artifacts — the Writes
    * discipline, not a bare overwrite: Spark's `mode(Overwrite)` deletes
    * the old directory BEFORE the new one is durable, so a crashed save
    * would destroy the previously-serving model and a concurrent load
    * could observe a partial directory. Here the old model stays intact
    * until the staged copy is complete, then one rename swaps it in. */
  private def stagedModelWrite(df: DataFrame, path: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(path + ".staging")
    val bak = new org.apache.hadoop.fs.Path(path + ".old")
    if (fs.exists(tmp)) fs.delete(tmp, true) // crashed-save debris
    try df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    catch { case e: Throwable => fs.delete(tmp, true); throw e }
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) { if (!fs.rename(dst, bak))
      throw new java.io.IOException(s"model swap: cannot move $dst aside") }
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"model swap: cannot publish $tmp")
    fs.delete(bak, true): Unit
  }

  /** Load a persisted IVF model (exact centroid doubles round-trip). */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession, path: String): IvfModel = {
    val rows = spark.read.parquet(path).select("cell", "centroid", "metric").collect()
    require(rows.nonEmpty, s"no IVF model at $path")
    IvfModel(rows.sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray), rows.head.getString(2))
  }

  /** Materialize the index the way a 100 TB deployment must: directory-
    * partitioned by `__ivf_cell`, so `ivfSearch`'s IN-filter becomes a
    * PHYSICAL partition filter — only nprobe/nlist of the files are listed
    * and read. This is the engine's answer to the reference's NGH graph
    * pruning (ngh_graph_engine.dart:14-23): a graph prunes neighbors, a
    * shared-nothing engine prunes files. */
  def ivfWriteClustered(table: DataFrame, vecCol: String, model: IvfModel,
      path: String): Unit =
    graft.operators.Scale.writeClustered(ivfIndex(table, model, vecCol), path, "__ivf_cell")

  /**
   * Recall report for the clustered IVF layout — SURVEY §7.3: "the
   * approximate path must publish recall alongside latency". Trains a
   * seeded model, writes the clustered layout to `clusteredPath`, and for
   * each nprobe averages recall@topK of `ivfSearch` (over the clustered
   * table, physically pruned) against `exact` on the same queries, plus
   * the fraction of rows the probe actually scanned (cell-size weighted —
   * the pruning ratio a cluster would see as bytes-read).
   *
   * Output: (nprobe, recall_at_k, scanned_frac) — one row per nprobe.
   */
  def ivfRecallReport(
      embs: DataFrame,
      pkCol: String,
      vecCol: String,
      clusteredPath: String,
      queryIds: Seq[Long],
      nprobes: Seq[Int],
      topK: Int = 10,
      nlist: Int = 8,
      metric: String = "cosine",
      seed: Long = 42L): DataFrame = {
    val spark = embs.sparkSession
    val model = ivfTrain(embs, vecCol, nlist, metric, seed)
    ivfWriteClustered(embs, vecCol, model, clusteredPath)
    val clustered = spark.read.parquet(clusteredPath)
    // per-cell row counts (nlist rows → driver) make scanned_frac pure
    // arithmetic instead of a count() job per (query, nprobe)
    val cellSizes = clustered.groupBy(col("__ivf_cell")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = math.max(1L, cellSizes.values.sum).toDouble
    val queries = embs.where(col(pkCol).isin(queryIds: _*))
      .select(col(pkCol), col(vecCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    // one job for ALL exact oracles, one job per nprobe for ALL probes —
    // the batched operators keep the report O(nprobes) jobs, not
    // O(queries × nprobes)
    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "pk").collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exactTop = topSets(exactBatch(embs, pkCol, vecCol, queries, topK, metric))
    val rows = nprobes.map { np =>
      val annTop = topSets(ivfSearchBatch(clustered, model, pkCol, vecCol, queries, topK, np))
      var hits = 0; var denom = 0; var scanned = 0.0
      queries.foreach { case (id, q) =>
        hits += (exactTop.getOrElse(id, Set.empty) & annTop.getOrElse(id, Set.empty)).size
        denom += exactTop.getOrElse(id, Set.empty).size
        scanned += model.nearestCells(q, np).map(c => cellSizes.getOrElse(c, 0L)).sum / total
      }
      (np, math.round(hits.toDouble / math.max(1, denom) * 10000) / 10000.0,
        math.round(scanned / math.max(1, queries.length) * 10000) / 10000.0)
    }
    import spark.implicits._
    rows.toDF("nprobe", "recall_at_k", "scanned_frac")
  }

  // ---------- int8 quantization (reference vector_quantizer.dart) ----------

  /** Symmetric int8 quantization: q = round(x · 127/amax) clamped to
    * [-127,127], plus the per-vector scale needed to dequantize — the
    * reference's int8 storage precision (table_schema.dart:2481-2498).
    * 4× smaller scan footprint for ANN pre-filtering; re-rank on the
    * full-precision column. */
  def quantizeInt8(v: Column): Column =
    graft.functions.GraftFunctions.bind(
      aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))) { amax =>
      struct(
        transform(v, x => least(greatest(
          round(x.cast("double") * lit(127.0) / amax), lit(-127)), lit(127)).cast("byte")).as("q"),
        (amax / lit(127.0)).cast("float").as("scale"))
    }

  /** Dequantize an int8-quantized struct back to float — codegen kernel
    * (`DequantizeInt8Expr`), one static call per row instead of an
    * interpreted per-element lambda; HOF twin below is the byte-identity
    * spec cross-check. */
  def dequantizeInt8(q: Column): Column =
    kcol(graft.expr.DequantizeInt8Expr(kexp(q)))

  private[graft] def dequantizeInt8Hof(q: Column): Column =
    transform(q.getField("q"), x => (x.cast("float") * q.getField("scale")).cast("float"))

  /**
   * Two-stage search over int8 storage — the engine's analog of the
   * reference's PQ ADC pre-filter + full-vector re-rank
   * (vector_index_manager.dart:475-515): stage 1 scans ONLY the 4×-smaller
   * quantized column (ReadSchema excludes the full vectors) and keeps
   * `topK × rerankFactor` candidate KEYS (TakeOrderedAndProject heaps →
   * one driver-tiny collect); stage 2 is `exact` over the candidate-key
   * IN-filter, which pushes to the parquet scan so the full-precision
   * column is read for O(topK × rerank) rows, not the table.
   *
   * @param quantCol column holding `quantizeInt8(vec)` structs
   * @param vecCol   full-precision column (re-rank)
   */
  def searchQuantized(
      table: DataFrame,
      pkCol: String,
      quantCol: String,
      vecCol: String,
      queryVector: Seq[Double],
      topK: Int = 10,
      metric: String = "cosine",
      rerankFactor: Int = 4): DataFrame = {
    val q = qArray(queryVector)
    // bind() the dequantize: cosine references its argument twice
    // (dot + norm), and an unbound lambda HOF evaluates interpreted,
    // once per reference per row (see GraftFunctions.bind)
    val approxD = graft.functions.GraftFunctions.bind(
      dequantizeInt8(col(quantCol)))(v => distCol(metric, v, q))
    val candidatePks = table
      .where(col(quantCol).isNotNull)
      .select(col(pkCol).as("pk"), approxD.as("__approx"))
      .orderBy(col("__approx").asc, col("pk").asc)
      .limit(math.max(topK * rerankFactor, topK))
      .collect().map(_.get(0))
    // exact() carries the result contract (null guard, rounding, score,
    // tie-break) — the IN-filter lands in PushedFilters for the re-read
    exact(table.where(col(pkCol).isin(candidatePks: _*)), pkCol, vecCol,
      queryVector, topK, metric)
  }

  // ---------- product quantization (PQ + ADC) ----------

  /** PQ codebooks: `m` subspaces × `k` centroids × `dsub` dims. The whole
    * model is m·k·dsub doubles — driver/broadcast-tiny (the reference
    * persists the same shape: vector_index_manager.dart PQ tables). */
  case class PqModel(codebooks: Array[Array[Array[Double]]], dim: Int) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def dsub: Int = dim / m
  }

  /**
   * Train PQ codebooks: seeded k-means++ and Lloyd's per subspace, run
   * LOCALLY over one bounded collect of the training vectors. A codebook
   * is m·k·dsub parameters — statistically saturated by a bounded sample,
   * so at 100 TB pass a `Sampling.hashSample` of the corpus (the
   * `maxTrainRows` guard refuses an unsampled giant input rather than
   * OOM-ing the driver). One job instead of m spark.ml fits: the fit
   * overhead dominated the data cost by 10× at codebook sizes.
   * Deterministic under `seed` (seeded init, fixed iteration order).
   */
  def pqTrain(table: DataFrame, vecCol: String, m: Int = 8, k: Int = 16,
      seed: Long = 42L, iters: Int = 10, maxTrainRows: Int = 262144): PqModel = {
    val rows = table.select(col(vecCol)).where(col(vecCol).isNotNull)
      .limit(maxTrainRows + 1).collect()
    require(rows.length <= maxTrainRows,
      s"pqTrain input exceeds $maxTrainRows rows — pass a hashSample at scale")
    require(rows.nonEmpty, "pqTrain needs at least one vector")
    val data = rows.map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = data.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val books = Array.tabulate(m) { s =>
      val subs = data.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloyd(subs, k, iters, new scala.util.Random(seed + s))
    }
    PqModel(books, dim)
  }

  /** Seeded k-means++ init + Lloyd's iterations (local, deterministic). */
  private def lloyd(xs: Array[Array[Double]], k: Int, iters: Int,
      rnd: scala.util.Random): Array[Array[Double]] = {
    val d = xs.head.length
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // k-means++ seeding
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = xs(rnd.nextInt(xs.length)).clone()
    val minD = xs.map(dist2(_, centers(0)))
    for (c <- 1 until k) {
      val total = minD.sum
      val pick =
        if (total <= 0) xs(rnd.nextInt(xs.length)) // fewer distinct points than k
        else {
          var r = rnd.nextDouble() * total; var i = 0
          while (i < xs.length - 1 && r > minD(i)) { r -= minD(i); i += 1 }
          xs(i)
        }
      centers(c) = pick.clone()
      var i = 0
      while (i < xs.length) {
        val dd = dist2(xs(i), centers(c)); if (dd < minD(i)) minD(i) = dd; i += 1
      }
    }
    // Lloyd's: assign to nearest (lowest index wins ties), recompute means
    val assign = new Array[Int](xs.length)
    for (_ <- 0 until iters) {
      var i = 0
      while (i < xs.length) {
        var best = 0; var bd = dist2(xs(i), centers(0)); var c = 1
        while (c < k) {
          val dd = dist2(xs(i), centers(c))
          if (dd < bd) { bd = dd; best = c }
          c += 1
        }
        assign(i) = best; i += 1
      }
      val sums = Array.fill(k)(new Array[Double](d))
      val cnts = new Array[Int](k)
      i = 0
      while (i < xs.length) {
        val c = assign(i); cnts(c) += 1
        var j = 0; while (j < d) { sums(c)(j) += xs(i)(j); j += 1 }
        i += 1
      }
      for (c <- 0 until k if cnts(c) > 0) {
        var j = 0; while (j < d) { centers(c)(j) = sums(c)(j) / cnts(c); j += 1 }
      }
      // empty cluster: leave its center in place (deterministic)
    }
    centers
  }

  /** Encode a vector into `m` byte codes — per subspace, argmin over the
    * codebook's centroid distances. Same codegen argmin-chain shape as
    * `ivfCell`: no UDF in the scan path, 32× smaller storage at
    * (m=8, k=16, dim=64, float32). */
  def pqEncode(model: PqModel, vecCol0: Column): Column = {
    val dsub = model.dsub
    val codes = model.codebooks.zipWithIndex.map { case (book, s) =>
      bind(slice(vecCol0, s * dsub + 1, dsub)) { sub =>
        val ds = book.zipWithIndex.map { case (c, j) =>
          struct(l2Distance(sub, array(c.map(lit): _*)).as("d"),
            lit(j).as("i"))
        }
        array_min(array(ds: _*)).getField("i")
      }
    }
    // NULL vectors must encode to NULL, not garbage: argmin over all-null
    // distances picks an arbitrary index that would pass isNotNull
    // filters downstream and crowd real candidates out of the ADC scan
    when(vecCol0.isNull, lit(null)).otherwise(array(codes: _*))
  }

  /** Per-query ADC lookup table, computed on the driver: entry (s, j) =
    * ‖q_s − codebook_s[j]‖² — m×k doubles per query, broadcast-tiny. */
  private def adcLutLocal(model: PqModel, queryVector: Seq[Double]): Seq[Seq[Double]] = {
    val dsub = model.dsub
    model.codebooks.zipWithIndex.map { case (book, s) =>
      val qs = queryVector.slice(s * dsub, (s + 1) * dsub)
      book.map(c => qs.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).toSeq
    }.toSeq
  }

  /** Sum of the m code lookups against a LUT column (array<array<double>>)
    * — `PqAdcExpr` codegen kernel (the PQ scan's hot loop); the HOF twin
    * below stays as its byte-identity spec cross-check. */
  private def adcDistFromLut(lut: Column, codesCol: Column, m: Int): Column =
    kcol(graft.expr.PqAdcExpr(kexp(lut), kexp(codesCol)))

  private[graft] def adcDistFromLutHof(lut: Column, codesCol: Column, m: Int): Column =
    bind(lut) { t =>
      aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, s) => acc +
          element_at(element_at(t, s + 1), element_at(codesCol, s + 1) + 1))
    }

  /** ADC (asymmetric distance) approximation: the query's per-subspace
    * distances to every centroid form an m×k lookup table of LITERALS;
    * a row's approximate distance² is the sum of its m code lookups —
    * no vector math per row at all, just m array reads. */
  def pqAdcDist(model: PqModel, queryVector: Seq[Double], codesCol: Column): Column = {
    val lut = array(adcLutLocal(model, queryVector).map(row =>
      array(row.map(lit): _*)): _*)
    adcDistFromLut(lut, codesCol, model.m)
  }

  /**
   * Two-stage PQ search: stage 1 scans ONLY the byte-code column and
   * heap-keeps `topK × rerankFactor` candidates by ADC distance
   * (TakeOrderedAndProject — one driver-tiny collect of keys); stage 2
   * re-ranks the candidates on the full-precision column through
   * `exact` (result contract: null guard, rounding, score, tie-break).
   * With a generous rerankFactor this recovers the exact top-K —
   * gate-verified against the exact-search oracle.
   */
  def pqSearch(
      table: DataFrame,
      pkCol: String,
      codesCol: String,
      vecCol: String,
      model: PqModel,
      queryVector: Seq[Double],
      topK: Int = 10,
      metric: String = "l2",
      rerankFactor: Int = 8): DataFrame = {
    // ADC tables are squared-L2 by construction — candidate selection
    // under any other metric would silently drop true neighbors the
    // re-rank can never recover. For cosine, UNIT-NORMALIZE vectors
    // before pqTrain/pqEncode and query with a unit vector: l2 order on
    // the unit sphere IS cosine order.
    require(metric == "l2",
      s"pqSearch candidates rank by L2 ADC; got metric '$metric' — normalize vectors and use l2 for cosine semantics")
    val candidatePks = table
      .where(col(codesCol).isNotNull)
      .select(col(pkCol).as("pk"),
        pqAdcDist(model, queryVector, col(codesCol)).as("__adc"))
      // malformed code arrays ADC-score to null; Spark sorts nulls FIRST
      // on asc, so they must be dropped or they crowd out real candidates
      .where(col("__adc").isNotNull)
      .orderBy(col("__adc").asc, col("pk").asc)
      .limit(math.max(topK * rerankFactor, topK))
      .collect().map(_.get(0))
    exact(table.where(col(pkCol).isin(candidatePks: _*)), pkCol, vecCol,
      queryVector, topK, metric)
  }

  /** Persist trained PQ codebooks (m·k·dsub doubles — driver-tiny, the
    * same contract as `ivfSave`): a serving job `pqLoad`s the model
    * instead of paying a re-train per process. Doubles round-trip exactly
    * through parquet, so a loaded model encodes and ranks bit-identically
    * (vector_index_manager.dart persists its PQ tables the same way). */
  def pqSave(model: PqModel, spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    val rows = for {
      s <- model.codebooks.indices
      j <- model.codebooks(s).indices
    } yield (s, j, model.codebooks(s)(j).toSeq, model.dim)
    stagedModelWrite(rows.toDF("subspace", "centroid", "values", "dim"), path)
  }

  /** Load a persisted PQ model (exact codebook doubles round-trip). */
  def pqLoad(spark: org.apache.spark.sql.SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(path)
      .select("subspace", "centroid", "values", "dim").collect()
    require(rows.nonEmpty, s"no PQ model at $path")
    val books = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
      rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray).toArray
    }.toArray
    PqModel(books, rows.head.getInt(3))
  }

  /** Multi-query PQ search in ONE stage-1 job (`exactBatch`'s shape for
    * the ADC scan): every query's m×k ADC LUT broadcasts against the
    * byte-code column, a per-query window heap-keeps `topK × rerank`
    * candidates, ONE bounded collect of (qid, pk) keys, then one exact
    * re-rank job over the candidate IN-filter (full vectors read for
    * O(queries × topK × rerank) rows, not per query). A PQ serving job
    * runs 2 jobs for the whole query set instead of 2 per query. */
  def pqSearchBatch(
      table: DataFrame,
      pkCol: String,
      codesCol: String,
      vecCol: String,
      model: PqModel,
      queries: Seq[(Long, Seq[Double])],
      topK: Int = 10,
      metric: String = "l2",
      rerankFactor: Int = 8): DataFrame = {
    pqSearchBatchCounted(table, pkCol, codesCol, vecCol, model, queries,
      topK, metric, rerankFactor)._1
  }

  /** `pqSearchBatch` plus the MEASURED count of distinct full-precision
    * rows the re-rank actually read (the candidate keys are already
    * driver-materialized, so the count is free) — `pqRecallReport`
    * publishes it as candidate_frac instead of the topK×rf upper bound. */
  private[graft] def pqSearchBatchCounted(
      table: DataFrame, pkCol: String, codesCol: String, vecCol: String,
      model: PqModel, queries: Seq[(Long, Seq[Double])], topK: Int,
      metric: String, rerankFactor: Int): (DataFrame, Long) = {
    require(metric == "l2",
      s"pqSearchBatch candidates rank by L2 ADC; got metric '$metric' — normalize vectors and use l2 for cosine semantics")
    val scored = withQueryLuts(table.where(col(codesCol).isNotNull), pkCol,
      codesCol, model, queries)
    rerankCandidates(table, pkCol, vecCol, scored, queries, topK, metric,
      rerankFactor)
  }

  /** Multi-query IVF-PQ in ONE stage-1 job: the probed-cell union is a
    * STATIC partition filter (only the union's files are read), a
    * broadcast (qid, cell) map restricts each query to its own nprobe
    * cells, ADC ranks inside them, and the shared bounded re-rank
    * finishes at full precision. `ivfSearchBatch` × `pqSearchBatch`
    * composed — the 100 TB serving shape: IO bounded by cells, CPU
    * bounded by byte codes, accuracy restored on candidates only. */
  def ivfPqSearchBatch(
      indexed: DataFrame, // cell-partitioned layout carrying PQ codes
      ivf: IvfModel,
      pq: PqModel,
      pkCol: String,
      codesCol: String,
      vecCol: String,
      queries: Seq[(Long, Seq[Double])],
      topK: Int = 10,
      nprobe: Int = 4,
      metric: String = "l2",
      rerankFactor: Int = 8): DataFrame = {
    require(metric == "l2",
      s"ivfPqSearchBatch candidates rank by L2 ADC; got metric '$metric'")
    val spark = indexed.sparkSession
    import spark.implicits._
    val probes = queries.flatMap { case (qid, q) =>
      ivf.nearestCells(q, nprobe).map(c => qid -> c)
    }
    val allCells = probes.map(_._2).distinct
    val probeDf = broadcast(probes.toDF("qid", "__probe_cell"))
    val pruned = indexed
      .where(col("__ivf_cell").isin(allCells: _*)) // static partition pruning
      .where(col(codesCol).isNotNull)
      .join(probeDf, col("__ivf_cell") === col("__probe_cell")) // per-query cells
    val scored = withQueryLuts(pruned, pkCol, codesCol, pq, queries,
      joinOnQid = true)
    // re-rank reads stay inside the probed-cell union too: the candidate
    // IN-filter composes with the static partition filter
    rerankCandidates(indexed.where(col("__ivf_cell").isin(allCells: _*)),
      pkCol, vecCol, scored, queries, topK, metric, rerankFactor)._1
  }

  /**
   * Recall report for the PQ serving path — SURVEY §7.3's "the
   * approximate path must publish recall alongside latency", the PQ
   * counterpart of `ivfRecallReport`. Trains a seeded codebook, encodes
   * once, and for each rerankFactor measures mean recall@topK of
   * `pqSearchBatch` against `exactBatch` on the same queries, plus the
   * candidate fraction the re-rank actually touched at full precision
   * and the storage compression of the code column. One batch job per
   * rerankFactor — O(factors) jobs, not O(queries × factors).
   *
   * Output: (rerank_factor, recall_at_k, candidate_frac, compression_x).
   */
  /** [[pqTrain]] with its documented at-scale contract APPLIED instead of
    * refused: corpora past the driver-Lloyd cap are deterministically
    * hash-sampled (pk-keyed, fixed salt) to ~90% of `maxTrainRows`
    * before training; at or below the cap the input passes through
    * untouched, so existing sub-cap callers stay bit-identical. The 90%
    * target keeps the realized sample safely under pqTrain's hard
    * `require` even at binomial-noise extremes. */
  def pqTrainCapped(table: DataFrame, pkCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, seed: Long = 42L, iters: Int = 10,
      maxTrainRows: Int = 262144): PqModel = {
    val n = table.count()
    val in = if (n <= maxTrainRows) table
      else {
        val mod = (n * 10 + maxTrainRows.toLong * 9 - 1) / (maxTrainRows.toLong * 9)
        table.where(pmod(xxhash64(col(pkCol), lit("pqtrain")), lit(mod)) === 0)
      }
    pqTrain(in, vecCol, m, k, seed, iters, maxTrainRows)
  }

  def pqRecallReport(
      embs: DataFrame,
      pkCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      rerankFactors: Seq[Int],
      topK: Int = 10,
      m: Int = 8,
      k: Int = 16,
      seed: Long = 42L): DataFrame = {
    val spark = embs.sparkSession
    // capped-train contract: the report must survive any corpus size
    // (training on a bounded deterministic sample IS the at-scale
    // recipe); sub-cap fixtures — every gate — train on the full set,
    // bit-identical to before
    val model = pqTrainCapped(embs, pkCol, vecCol, m, k, seed)
    val coded = embs.select(col(pkCol), col(vecCol),
      pqEncode(model, col(vecCol)).as("__pq"))
    val total = math.max(1L, coded.where(col("__pq").isNotNull).count())
    val queries = embs.where(col(pkCol).isin(queryIds: _*))
      .select(col(pkCol), col(vecCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "pk").collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exactTop = topSets(exactBatch(embs, pkCol, vecCol, queries, topK, "l2"))
    val compression = model.dim * 4.0 / model.m // float32 dims vs 1-byte codes
    val rows = rerankFactors.map { rf =>
      val (annDf, candDistinct) = pqSearchBatchCounted(coded, pkCol, "__pq",
        vecCol, model, queries, topK, "l2", rf)
      val annTop = topSets(annDf)
      var hits = 0; var denom = 0
      queries.foreach { case (id, _) =>
        hits += (exactTop.getOrElse(id, Set.empty) & annTop.getOrElse(id, Set.empty)).size
        denom += exactTop.getOrElse(id, Set.empty).size
      }
      // candidate_frac is MEASURED: distinct candidate pks the re-rank
      // actually read at full precision / corpus size (not the topK×rf
      // window-size upper bound — overlapping or short windows differ)
      (rf, math.round(hits.toDouble / math.max(1, denom) * 10000) / 10000.0,
        math.round(math.min(1.0, candDistinct / total.toDouble) * 10000) / 10000.0,
        math.round(compression * 100) / 100.0)
    }
    import spark.implicits._
    rows.toDF("rerank_factor", "recall_at_k", "candidate_frac", "compression_x")
  }

  /** Stage 1 of the batch PQ searches: broadcast-join the per-query ADC
    * LUTs (cartesian when `joinOnQid` is false — every query sees every
    * row; equi-join on qid when the input already carries a per-query
    * restriction) and score codes against them → (qid, pk, __adc). */
  private def withQueryLuts(rows: DataFrame, pkCol: String, codesCol: String,
      model: PqModel, queries: Seq[(Long, Seq[Double])],
      joinOnQid: Boolean = false): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val lutDf = broadcast(queries
      .map { case (qid, q) => (qid, adcLutLocal(model, q)) }
      .toDF("qid", "__lut"))
    val joined =
      if (joinOnQid) rows.join(lutDf, "qid")
      else rows.join(lutDf) // cartesian with a broadcast-tiny side
    joined.select(col("qid"), col(pkCol).as("pk"),
      adcDistFromLut(col("__lut"), col(codesCol), model.m).as("__adc"))
      // short/out-of-range code arrays score null; exclude them here so
      // the downstream asc candidate window never ranks nulls first
      .where(col("__adc").isNotNull)
  }

  /** Stage 2 of the batch PQ searches: per-query window keeps the ADC
    * top `topK × rerank`, ONE driver-tiny collect of (qid, pk), then the
    * exact re-rank reads full vectors behind a pushed candidate
    * IN-filter. Output: (qid, pk, distance, score, rank) — `exactBatch`'s
    * contract. */
  private def rerankCandidates(table: DataFrame, pkCol: String, vecCol: String,
      scored: DataFrame, queries: Seq[(Long, Seq[Double])], topK: Int,
      metric: String, rerankFactor: Int): (DataFrame, Long) = {
    val spark = table.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("__adc").asc, col("pk").asc)
    val candRows = scored.withColumn("__r", row_number().over(w))
      .where(col("__r") <= math.max(topK * rerankFactor, topK))
      .select("qid", "pk").collect()
    val pkType = table.schema(pkCol).dataType
    val candSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pk", pkType)))
    val candDf = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*), candSchema))
    val allPks = candRows.map(_.get(1)).distinct
    val qdf = broadcast(queries.toDF("qid", "qv"))
    val d = distCol(metric, col(vecCol), col("qv"))
    val rescored = table
      .where(col(pkCol).isin(allPks: _*)) // pushed to the parquet scan
      .where(col(vecCol).isNotNull)
      .select(col(pkCol).as("pk"), col(vecCol))
      .join(candDf, "pk") // candidate → its own queries only
      .join(qdf, "qid")
      .select(col("qid"), col("pk"), round(d, 6).as("distance"))
    (rankPerQuery(rescored, metric, topK), allPks.length.toLong)
  }

  // ---------- LSH (spark.ml) ----------

  /** Approximate similarity JOIN for all-pairs workloads, via
    * BucketedRandomProjectionLSH (Euclidean). Returns (a, b, l2dist). */
  def lshSimilarityJoin(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      maxL2: Double,
      bucketLength: Double = 2.0,
      numTables: Int = 3,
      seed: Long = 42L): DataFrame = {
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val feats = embs.select(col(idCol).as("id"), toVec(col(vecCol)).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, maxL2, "l2dist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"), col("l2dist"))
      .where(col("a") < col("b"))
  }
}
