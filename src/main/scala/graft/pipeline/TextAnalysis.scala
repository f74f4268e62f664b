package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/**
 * Text-analysis operators for large-scale training-data pipelines.
 * All pure `Column` expressions (codegen'd, no UDFs) so they run inside
 * whole-stage codegen and scale linearly with input partitions — no
 * shuffle, no driver materialization.
 *
 * The reference has no text functions beyond LIKE
 * (/root/reference/lib/src/query/query_condition.dart — SURVEY.md §2.9);
 * these are the engine's pipeline extensions.
 */
object TextAnalysis {

  /**
   * Hashing-trick text embedding (feature hashing, Weinberger et al.
   * 2009): each token lands in `pmod(hash(w), dim)` with a ±1 sign from
   * an independent hash bit; bucket sums are l2-normalized. Turns raw
   * text into a fixed-dim vector with NO trained model — the bridge from
   * the text operators to the vector-search family (cosine near-dup,
   * IVF/PQ ANN) when no embedding column exists. tf-weighted by
   * construction: a token's occurrences accumulate.
   *
   * Shape at scale: explode → (id, bucket) partial-agg shuffle →
   * per-doc assemble; both aggs map-side combine, the vector materializes
   * as codegen HOFs (`transform`/`aggregate`), never a UDF.
   *
   * Hash families (the Dedup convention): production = `xxhash64`;
   * `oracleHash = true` = md5-hex arithmetic, reproducible in any engine
   * with md5 (bucket from 8 hex digits, sign from the first digit's
   * parity).
   *
   * Output: (`idCol`, n_tokens, embedding array[double]); an all-zero
   * accumulation (possible under sign cancellation) yields the zero
   * vector rather than a divide-by-zero.
   */
  def hashEmbed(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int = 64,
      oracleHash: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(dim > 0 && dim <= 4096, s"dim must be in (0, 4096], got $dim")
    val toks = docs.select(col(idCol),
      explode(whitespaceTokens(lower(col(textCol)))).as("w"))
    val (bucket, parity) =
      if (oracleHash)
        (pmod(conv(substring(md5(col("w")), 25, 8), 16, 10).cast("long"), lit(dim.toLong)),
         pmod(conv(substring(md5(col("w")), 1, 1), 16, 10).cast("long"), lit(2L)))
      else
        (pmod(xxhash64(col("w")), lit(dim.toLong)),
         pmod(xxhash64(lit("sign"), col("w")), lit(2L)))
    val sign = when(parity === 0L, lit(1.0)).otherwise(lit(-1.0))
    val g = toks
      .select(col(idCol), bucket.as("b"), sign.as("s"))
      .groupBy(col(idCol), col("b"))
      .agg(sum(col("s")).as("v"), count(lit(1)).as("c"))
    g.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        map_from_arrays(collect_list(col("b")), collect_list(col("v"))).as("m"))
      .withColumn("__vec", transform(
        sequence(lit(0L), lit(dim - 1L)),
        // try_element_at, not element_at: a missing bucket must read as
        // 0.0 under ANSI mode too, not throw
        i => coalesce(try_element_at(col("m"), i), lit(0.0))))
      .withColumn("__nrm", sqrt(aggregate(col("__vec"), lit(0.0),
        (acc, x) => acc + x * x)))
      .select(col(idCol), col("n_tokens"),
        transform(col("__vec"),
          x => when(col("__nrm") > 0, x / col("__nrm")).otherwise(lit(0.0)))
          .as("embedding"))
  }

  // ---------- token counting ----------

  /** Whitespace token count (see GraftFunctions.tokenCount). */
  def tokenCountWs(text: Column): Column = tokenCount(text)

  /** BPE-ish subword token count: words + digits + punctuation runs,
    * approximating a byte-pair tokenizer's segmentation. Counts matches of
    * the segment regex instead of materializing the array. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Rough LLM token estimate: ceil(chars/4) — the common heuristic for
    * budget planning; cheap enough to run over 100 TB. */
  def tokenEstimate(text: Column): Column = ceil(length(text) / lit(4.0)).cast("long")

  // ---------- quality scoring ----------

  /** Ratio of alphabetic chars to all chars (0 for empty). */
  def alphaRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / total)
  }

  /** Ratio of punctuation chars to all chars. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", "")).cast("double") / total)
  }

  /** Mean whitespace-token length. */
  def meanWordLen(text: Column): Column =
    bind(whitespaceTokens(text)) { toks =>
      when(size(toks) === 0, 0.0)
        .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
    }

  /** English stopword ratio among whitespace tokens — the classic
    * Gopher/C4-style quality signal. */
  val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "was", "for", "on", "are", "as", "with", "at", "be", "this", "have",
    "from", "by", "not", "but", "they", "you", "his", "her", "we")

  /** Marker-hit counts per set in ONE codegen pass over the tokens
    * (HOF `filter` is CodegenFallback — interpreted per token per set). */
  private def markerCounts(toks: Column, sets: Seq[Seq[String]]): Column =
    kcol(graft.expr.MarkerCountsExpr(kexp(toks), sets))

  def stopwordRatio(text: Column, stopwords: Seq[String] = StopwordsEn): Column =
    bind(whitespaceTokens(lower(text))) { toks =>
      val hits = element_at(markerCounts(toks, Seq(stopwords)), 1)
      when(size(toks) === 0, 0.0)
        .otherwise(hits.cast("double") / size(toks))
    }

  /**
   * Term-blocklist density — the safety-filter stage shape (NSFW /
   * toxicity / spam proxy): exact-token hits against a caller-supplied
   * blocklist, published as count + density + a thresholded flag. The
   * LEXICON is the policy (callers bring their own); the operator
   * contributes the scale shape — one tokenize + one kernel pass per
   * row (the stopwordRatio machinery), no joins, no shuffle. Exact
   * token match only, by design: substring matching flags "class" for
   * "ass" (the classic Scunthorpe failure) — callers wanting stemmed or
   * fuzzy policies normalize upstream.
   *
   * Returns struct (n_tokens, n_hits, density, flagged).
   */
  def blocklistScore(text: Column, terms: Seq[String],
      flagDensity: Double = 0.02): Column = {
    require(terms.nonEmpty, "empty blocklist")
    bind(whitespaceTokens(lower(text))) { toks =>
      val hits = element_at(markerCounts(toks, Seq(terms)), 1).cast("long")
      val dens = when(size(toks) === 0, 0.0)
        .otherwise(round(hits.cast("double") / size(toks).cast("double"), 6))
      struct(size(toks).cast("long").as("n_tokens"), hits.as("n_hits"),
        dens.as("density"), (dens >= flagDensity).as("flagged"))
    }
  }

  /**
   * Composite quality score ∈ [0,1]: mean of clamped component signals —
   * (a) length in a healthy band, (b) alpha ratio, (c) stopword presence,
   * (d) not punctuation-soup. Deterministic, SQL-expressible (oracle-able).
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punct = lit(1.0) - least(punctRatio(text) * lit(5.0), lit(1.0))
    round((lenScore + alpha + stop + punct) / lit(4.0), 6)
  }

  // ---------- language identification ----------

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: broadcast as literals into codegen. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "was", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "con", "por", "para"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "per", "con", "sono", "della"))

  private def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(markers.map(lit): _*), t)))

  /** Per-language marker-hit count over whitespace tokens. */
  def langScore(text: Column, lang: String): Column =
    markerHits(whitespaceTokens(lower(text)), LangMarkers.toMap.apply(lang))

  /** Argmax language among LangMarkers; ties broken by declaration order;
    * "und" (undetermined) when no marker hits at all. One tokenize + one
    * kernel pass produces every language's score; the argmax fold reads
    * array slots. */
  def langId(text: Column): Column =
    bind(markerCounts(whitespaceTokens(lower(text)), LangMarkers.map(_._2))) { scores =>
      val scored = LangMarkers.zipWithIndex.map { case ((l, _), i) =>
        (l, element_at(scores, i + 1))
      }
      val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
        case ((bl, bs), (l, s)) => (when(s > bs, lit(l)).otherwise(bl), greatest(s, bs))
      }
      when(best._2 === 0, "und").otherwise(best._1)
    }

  /** Unicode-script counts (ScriptKernel.Buckets order) in one kernel
    * pass — the script-level split BEFORE langId's within-script marker
    * vote; works on languages with no marker list at all. */
  def scriptProfile(text: Column): Column =
    kcol(graft.expr.ScriptProfileExpr(kexp(text)))

  /** Argmax writing system over the LETTER buckets (digits/whitespace/
    * other never vote); ties broken by bucket order; "und" for text with
    * no letters. */
  def dominantScript(text: Column): Column =
    bind(scriptProfile(text)) { p =>
      val letters = graft.expr.ScriptKernel.Buckets.zipWithIndex
        .filter { case (n, _) => n != "digit" && n != "space" && n != "other" }
      val scored = letters.map { case (n, i) => (n, element_at(p, i + 1)) }
      val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
        case ((bn, bs), (n, s)) => (when(s > bs, lit(n)).otherwise(bn), greatest(s, bs))
      }
      when(best._2 === 0, "und").otherwise(best._1)
    }

  // ---------- fused document profile ----------

  /** Every q27-class signal in ONE kernel pass per document:
    * STRUCT<len, bpe_cnt, alpha_cnt, punct_cnt, tok_cnt, marker_hits>
    * where marker_hits[1] is the stopword hit count and slots 2..n are the
    * `LangMarkers` languages in declaration order. Byte-identical to the
    * individual Column formulations (PipelineSpec cross-checks); the
    * separate functions each re-run a regex or tokenize chain per column.
    * Project the struct once, then derive with the `*FromProfile` helpers
    * (CollapseProject won't inline a non-cheap multi-use alias). */
  /** Unicode normalization (NFC by default) — codegen kernel
    * (`NormalizeExpr`); Spark ships no normalization built-in, yet
    * canonicalization is load-bearing before any fingerprint/shingle/
    * simhash pass: precomposed and combining-mark spellings are
    * byte-different and would never dedup together. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    kcol(graft.expr.NormalizeExpr(kexp(text), form))

  def textProfile(text: Column): Column =
    kcol(graft.expr.TextProfileExpr(kexp(text), StopwordsEn +: LangMarkers.map(_._2)))

  /** `tokenCountBpe` from a profile struct. */
  def bpeFromProfile(p: Column): Column = p.getField("bpe_cnt")

  /** `tokenEstimate` from a profile struct (identical arithmetic). */
  def tokenEstimateFromProfile(p: Column): Column =
    ceil(p.getField("len") / lit(4.0)).cast("long")

  /** `qualityScore` from a profile struct — the same expression tree shape
    * (casts, guards, rounding) over kernel-computed counts. */
  def qualityFromProfile(p: Column): Column = {
    val len = p.getField("len")
    val lenScore = least(len.cast("double") / lit(200.0), lit(1.0))
    val alpha = when(len === 0, 0.0).otherwise(p.getField("alpha_cnt").cast("double") / len)
    val stopRatio = when(p.getField("tok_cnt") === 0, 0.0)
      .otherwise(element_at(p.getField("marker_hits"), 1).cast("double") / p.getField("tok_cnt"))
    val stop = least(stopRatio * lit(4.0), lit(1.0))
    val punctRatio = when(len === 0, 0.0)
      .otherwise(p.getField("punct_cnt").cast("double") / len)
    val punct = lit(1.0) - least(punctRatio * lit(5.0), lit(1.0))
    round((lenScore + alpha + stop + punct) / lit(4.0), 6)
  }

  /** `langId` from a profile struct — identical argmax fold over the
    * language slots (marker_hits[2..]). */
  def langFromProfile(p: Column): Column = {
    val scores = p.getField("marker_hits")
    val scored = LangMarkers.zipWithIndex.map { case ((l, _), i) =>
      (l, element_at(scores, i + 2))
    }
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (l, s)) => (when(s > bs, lit(l)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 === 0, "und").otherwise(best._1)
  }

  // ---------- fingerprinting ----------

  /** Polynomial rolling hash of the normalized text (base 31, mod 1e9+7),
    * computed with a higher-order aggregate over characters — a true
    * rolling fingerprint (vs md5 in GraftFunctions.fingerprint), still
    * deterministic and SQL-expressible. The modulus keeps acc*31+255
    * comfortably inside a long under ANSI overflow checking. */
  def rollingFingerprint(text: Column): Column =
    kcol(graft.expr.RollingFpExpr(kexp(text)))

  /** HOF twin of rollingFingerprint — byte-identical, interpreted; kept as
    * the kernel's spec cross-check. */
  private[graft] def rollingFingerprintHof(text: Column): Column = {
    val Mod = 1000000007L
    val chars = split(normalizeText(text), "")
    aggregate(chars, lit(7L),
      (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch).cast("long"), lit(0L)), lit(Mod)))
  }

  // ---------- context-window chunking ----------

  /**
   * Split documents into fixed-size token windows with overlap — the
   * context-window chunking step of an LLM training/RAG pipeline. A doc of
   * `n` whitespace tokens becomes `1 + ceil((n - tokensPerChunk) / step)`
   * chunks of up to `tokensPerChunk` tokens, each starting `step =
   * tokensPerChunk - overlap` after the last; the final chunk may be
   * short. A doc at most one window wide stays whole.
   *
   * Output: (`idCol`, `chunk_idx`, `chunk_text`, `chunk_tokens`).
   *
   * Shape at scale: pure narrow ops — tokenize, build the window starts
   * with `sequence`, slice per window, `posexplode` — all inside
   * whole-stage codegen on the scan, no shuffle, output partitioning
   * inherits the input's. The token array is `bind`-projected once per
   * row (k window slices would otherwise re-tokenize k times —
   * CollapseProject inlines by lexical count, see GraftFunctions.bind).
   */
  def chunkByTokens(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, tokensPerChunk: Int, overlap: Int = 0)
      : org.apache.spark.sql.DataFrame = {
    require(tokensPerChunk > 0, "tokensPerChunk must be positive")
    require(overlap >= 0 && overlap < tokensPerChunk,
      s"overlap must be in [0, tokensPerChunk): $overlap")
    val step = tokensPerChunk - overlap
    // NULL text produces no chunks (SQL unnest-over-NULL semantics) — and
    // keeps size(null) = -1 out of the window arithmetic
    val base = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), whitespaceTokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__n"))
    val nChunks = when(col("__n") <= tokensPerChunk, lit(1))
      .otherwise(ceil((col("__n") - lit(tokensPerChunk)).cast("double") / lit(step))
        .cast("int") + 1)
    base
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(col("__toks"), i * step + 1, lit(tokensPerChunk)))))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_text"),
        least(lit(tokensPerChunk.toLong),
          col("__n") - col("chunk_idx") * step).as("chunk_tokens"))
  }

  // ---------- repetition signals (Gopher-style quality filters) ----------

  /** Token-level dup-word fraction — the single formulation shared by
    * `dupWordFrac` and `repetitionSignals` (one copy, no drift). */
  private def dupFracOfToks(toks: Column): Column =
    when(size(toks) === 0, 0.0).otherwise(
      round(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks), 6))

  /** Fraction of whitespace tokens that are repeats of an earlier token:
    * `1 - distinct/total` (0 for a single-token doc). Per-row narrow op —
    * no shuffle, scales linearly with the scan. */
  def dupWordFrac(text: Column): Column =
    bind(whitespaceTokens(text))(dupFracOfToks)

  /** Word bigrams ("tok[i] tok[i+1]") of the whitespace tokenization; empty
    * array below two tokens. */
  private def wordBigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Share of the most frequent element in `arr` (0 for empty). Computed
    * per row as the longest equal-run of the SORTED array — one
    * `array_sort` + one linear `aggregate` pass, instead of the
    * explode → count → argmax plan that would shuffle twice on (row, elem).
    * At 100 TB the shuffle-free formulation is the scale path: the mode of
    * a bounded-size per-document array never needs to leave its partition. */
  def topRunFrac(arr: Column): Column =
    bind(array_sort(arr)) { sorted =>
      when(size(sorted) === 0, 0.0).otherwise(
        round(
          aggregate(sorted,
            struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
            (st, x) => bind(when(x === st.getField("prev"), st.getField("run") + 1L)
                .otherwise(lit(1L))) { run =>
              struct(x.as("prev"), run.as("run"),
                greatest(st.getField("best"), run).as("best"))
            },
            st => st.getField("best")).cast("double") / size(sorted), 6))
    }

  /** Share of the most frequent word bigram among all bigrams (0 below two
    * tokens) — the Gopher "top-2-gram fraction" repetition filter. */
  def topBigramFrac(text: Column): Column =
    bind(whitespaceTokens(text))(toks => topRunFrac(wordBigrams(toks)))

  /**
   * Per-document repetition profile: (`idCol`, n_tokens, dup_word_frac,
   * top_bigram_frac). One projection over the scan — tokenization is
   * `bind`-projected once per row and every signal is a narrow op, so the
   * whole operator is shuffle-free and partition-parallel (the 100 TB
   * shape: no explode, no groupBy, no join).
   */
  def repetitionSignals(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol),
      bind(whitespaceTokens(col(textCol))) { toks =>
        struct(
          size(toks).cast("long").as("n_tokens"),
          dupFracOfToks(toks).as("dup_word_frac"),
          topRunFrac(wordBigrams(toks)).as("top_bigram_frac"))
      }.as("__r"))
      .select(col(idCol), col("__r.n_tokens").as("n_tokens"),
        col("__r.dup_word_frac").as("dup_word_frac"),
        col("__r.top_bigram_frac").as("top_bigram_frac"))

  // ---------- compression-ratio quality signal ----------

  /** Deflate-compressed size of UTF-8 text — the classic corpus quality
    * signal (C4/Gopher-family filters drop documents whose compression
    * ratio marks them as boilerplate/repetition at one extreme or
    * high-entropy garbage at the other). DETERMINISTIC: a fixed Deflater
    * level with the default strategy produces identical bytes on every
    * JVM (zlib's algorithm is fully specified by its parameters), so the
    * signal is reproducible across runs and partitionings — but no SQL
    * engine exposes deflate, so this ships spec-covered rather than
    * DuckDB-gated. Implemented as a Scala UDF by necessity (no built-in
    * Column covers deflate); the per-row cost is the codec itself, which
    * dominates any expression-eval overhead.
    */
  def deflateLen(text: Column, level: Int = 6): Column = {
    val f = udf { (s: String) =>
      if (s == null) 0L
      else {
        val d = new java.util.zip.Deflater(level)
        try {
          d.setInput(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          d.finish()
          val buf = new Array[Byte](8192)
          var total = 0L
          while (!d.finished()) total += d.deflate(buf)
          total
        } finally d.end()
      }
    }
    f(text)
  }

  /** compressed/raw byte ratio, rounded: low = repetitive boilerplate,
    * ~1+ = high-entropy noise; natural prose sits in between (the filter
    * band is corpus-tuned). 0 for empty/null text. */
  def compressionRatio(text: Column, level: Int = 6): Column =
    bind(when(text.isNull, 0L).otherwise(
      length(to_binary(text, lit("utf-8"))).cast("long"))) { raw =>
      when(raw === 0L, 0.0)
        .otherwise(round(deflateLen(text, level).cast("double") / raw, 6))
    }

  // ---------- PII detection + redaction ----------

  /** PII patterns, kept inside the RE2 ∩ java.util.regex common subset so
    * the DuckDB oracle runs the byte-identical pattern. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  val Ipv4Re  = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Per-document PII hit counts, computed on the raw text BEFORE
    * redaction (a redacted email must still count). Pure codegen regex
    * ops — shuffle-free, scan-parallel. */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("email_cnt"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long").as("phone_cnt"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long").as("ip_cnt"))

  /** Redact emails → `<EMAIL>`, phones → `<PHONE>`, IPv4s → `<IP>`, in
    * that fixed order (emails first so their dotted domains can't be
    * half-eaten by the IP pass). Spark `regexp_replace` replaces every
    * occurrence — the oracle needs the explicit 'g' flag. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  // ---------- markup stripping ----------

  /** Markup-strip patterns, RE2 ∩ java.util.regex subset (inline (?is)
    * flags instead of engine-specific options, so the DuckDB oracle runs
    * byte-identical patterns with only its 'g' flag added). */
  val ScriptStyleRe = "(?is)<(script|style)[^>]*>.*?</(script|style)>"
  val CommentRe     = "(?s)<!--.*?-->"
  val TagRe         = "<[^>]+>"

  /**
   * Strip HTML/XML markup down to text — the first pass every web-corpus
   * pipeline runs before any quality/dedup stage. Order matters and is
   * fixed: script/style blocks (content AND tags die together), comments,
   * then remaining tags → spaces, then one non-recursive entity-decode
   * pass (named five + `&amp;` LAST, so `&amp;lt;` decodes to the literal
   * `&lt;` exactly like a real one-pass decoder), then whitespace
   * collapse + trim. Pure codegen `regexp_replace`/`replace` chain —
   * shuffle-free, scan-parallel, no UDF.
   */
  def stripMarkup(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, ScriptStyleRe, " "), CommentRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  // ---------- sequence packing ----------

  /**
   * URL component extraction — the C4/RefinedWeb URL-filter stage's
   * parser: scheme, host (userinfo and port stripped, lowercased), tld
   * (last dot-label of the host — no public-suffix list is shipped, so
   * multi-label suffixes like co.uk read as 'uk'; documented), path
   * depth (non-empty segments) and query-param count. Pure codegen
   * `regexp_extract` chain in the RE2 ∩ java.regex subset — shuffle-free
   * and engine-reproducible. A schemeless or unparseable URL yields
   * empty host/tld and zero counts (filter-stage honesty: never throws).
   */
  /**
   * Flesch reading ease + Flesch–Kincaid grade from three regexp-run
   * counts — sentences are [.!?]+ runs (floored at 1), words \S+ runs,
   * syllables [aeiouy]+ vowel groups (the standard heuristic; vowel
   * groups cannot span whitespace, so one pass over the whole text
   * equals the per-word sum). Entirely codegen regexp counting + fixed
   * literal coefficients, one rounded expression — cross-engine exact.
   * Empty text (0 words) yields NULL scores. Returns a struct
   * (n_sentences, n_words, n_syllables, flesch, fk_grade).
   */
  def readability(text: Column): Column = {
    val words = size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast("long")
    val sents = greatest(lit(1L),
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long"))
    val sylls = size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("long")
    val w = words.cast("double"); val s = sents.cast("double")
    val y = sylls.cast("double")
    struct(
      sents.as("n_sentences"), words.as("n_words"), sylls.as("n_syllables"),
      when(words > 0, round(
        lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (y / w), 6))
        .as("flesch"),
      when(words > 0, round(
        lit(0.39) * (w / s) + lit(11.8) * (y / w) - lit(15.59), 6))
        .as("fk_grade"))
  }

  def urlFeatures(url: Column): Column = bind(url) { u =>
    val rest = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://(.*)$", 1)
    val authority = regexp_extract(rest, "^([^/?#]*)", 1)
    val host = lower(regexp_extract(
      regexp_extract(authority, "^(?:[^@]*@)?(.*)$", 1), "^([^:]*)", 1))
    val path = regexp_extract(rest, "^[^/?#]*(/[^?#]*)?", 1)
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    struct(
      lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)).as("scheme"),
      host.as("host"),
      regexp_extract(host, "([^.]+)$", 1).as("tld"),
      size(filter(split(path, "/"), s => s =!= "")).cast("long").as("path_depth"),
      when(query === "", lit(0L))
        .otherwise(size(split(query, "&")).cast("long")).as("n_params"))
  }

  /** Blocklist verdict over `urlFeatures`: tld membership + an optional
    * host regex (spam domains, link farms). Composable with
    * `Sampling.stratifiedFlag`-style keeps — this is the FILTER, the
    * parser stays reusable. */
  def urlBlocked(url: Column, blockedTlds: Seq[String],
      blockedHostRegex: String = ""): Column = bind(urlFeatures(url)) { f =>
    val byTld =
      if (blockedTlds.isEmpty) lit(false)
      else f.getField("tld").isin(blockedTlds: _*)
    val byHost =
      if (blockedHostRegex.isEmpty) lit(false)
      else f.getField("host").rlike(blockedHostRegex)
    byTld || byHost
  }

  /**
   * Pack documents into fixed token budgets — the batch-construction step
   * before training. Deterministic "fill then overflow" strategy: within
   * each `groupCol` partition, docs are taken in `idCol` order and a doc
   * opens bin `floor(tokens_before_it / budget)`; a bin may overflow by at
   * most one doc (true reset-greedy packing is inherently sequential
   * state — this variant is order-deterministic, windowed-SQL-expressible
   * on any engine, and therefore oracle-checkable).
   *
   * Output: (`idCol`, `groupCol`, tokens, bin, pos).
   *
   * Shape at scale: ONE window partitioned by `groupCol` — packing
   * parallelizes across groups (source, shard, language...) and never
   * forms a global sort. Don't call it with a constant group at 100 TB;
   * pack per shard.
   */
  def packBudget(docs: org.apache.spark.sql.DataFrame, idCol: String,
      groupCol: String, tokens: Column, budget: Int)
      : org.apache.spark.sql.DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val before = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBin = docs
      .select(col(idCol), col(groupCol), tokens.cast("long").as("tokens"))
      .withColumn("__cum", coalesce(sum(col("tokens")).over(before), lit(0L)))
      .withColumn("bin", floor(col("__cum") / lit(budget.toDouble)))
    withBin
      .withColumn("pos", row_number().over(
        Window.partitionBy(col(groupCol), col("bin")).orderBy(col(idCol)))
        .cast("long"))
      .drop("__cum")
  }

  // ---------- corpus profiling ----------

  /** Per-group length distribution: count, EXACT interpolated p50/p90/p99
    * and mean of `lenCol` — the data-profiling summary a pipeline prints
    * before filtering decisions. Exact `percentile` (not approx) so the
    * result is engine-independent; it aggregates a per-group sorted sketch
    * in one shuffle. For interactive 100 TB profiling swap in
    * `percentile_approx`, which is merge-combinable with bounded memory —
    * kept exact here because the gate hash-compares against the oracle's
    * `quantile_cont`. */
  def lengthProfile(docs: org.apache.spark.sql.DataFrame, groupCol: String,
      lenCol: String): org.apache.spark.sql.DataFrame =
    docs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("cnt"),
      round(expr(s"percentile($lenCol, 0.5D)"), 6).as("p50"),
      round(expr(s"percentile($lenCol, 0.9D)"), 6).as("p90"),
      round(expr(s"percentile($lenCol, 0.99D)"), 6).as("p99"),
      round(avg(col(lenCol)), 6).as("mean_len"))

  /** Drop per-group length outliers: keep rows whose `lenCol` lies inside
    * the group's [`lo`, `hi`] percentile band — the standard pre-training
    * length cut, computed per source so a long-form source isn't judged by
    * a short-form source's distribution. The percentile table is
    * group-cardinality-sized and BROADCAST back onto the scan (no shuffle
    * of the data side); cutoffs round to 6dp on both engine and oracle so
    * interpolation float dust can't flip a boundary row. */
  def trimOutliers(docs: org.apache.spark.sql.DataFrame, groupCol: String,
      lenCol: String, lo: Double = 0.05, hi: Double = 0.95)
      : org.apache.spark.sql.DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1: $lo, $hi")
    val bands = docs.groupBy(col(groupCol)).agg(
      round(expr(s"percentile($lenCol, ${lo}D)"), 6).as("__lo"),
      round(expr(s"percentile($lenCol, ${hi}D)"), 6).as("__hi"))
    docs.join(broadcast(bands), groupCol)
      .where(col(lenCol) >= col("__lo") && col(lenCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Rank-based curriculum bins (the ORACLE path): `ntile(nBins)` over
    * (score, id) — equal-population buckets with ties split
    * deterministically by id. A corpus-wide single-partition sort window:
    * exact and engine-reproducible, labeled oracle-only — `scoreBins` is
    * the scale route. */
  def scoreBinsExact(docs: org.apache.spark.sql.DataFrame, idCol: String,
      scoreCol: String, nBins: Int): org.apache.spark.sql.DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    docs.withColumn("bin", ntile(nBins).over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col(scoreCol).asc, col(idCol).asc)).cast("long"))
  }

  /** Value-based curriculum bins (the SCALE path): one `approxQuantile`
    * pass derives nBins−1 cutpoints (driver-bounded: nBins values), the
    * assignment is a broadcast codegen CASE — no corpus-wide sort, no
    * shuffle of the data side. With `relErr = 0` and distinct scores this
    * equals `scoreBinsExact` (spec-pinned); under heavy score ties the
    * value-based bins are uneven where rank-based bins split ties — the
    * documented trade for one-pass scalability. Null scores fall in no
    * bin (bin = null). */
  def scoreBins(docs: org.apache.spark.sql.DataFrame, idCol: String,
      scoreCol: String, nBins: Int,
      relErr: Double = 0.001): org.apache.spark.sql.DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val cuts = docs.stat.approxQuantile(scoreCol, probs, relErr)
    val bin = cuts.zipWithIndex.foldRight(
      when(col(scoreCol).isNotNull, lit(nBins.toLong)): Column) {
      case ((cut, i), rest) => when(col(scoreCol) <= cut, lit(i + 1L)).otherwise(rest)
    }
    docs.withColumn("bin", bin)
  }

  /**
   * Log-template mining (Drain-lite): collapse each line to its TEMPLATE
   * by masking the variable tokens — UUIDs → `<id>`, long hex / 0x ids
   * → `<hex>`, numbers → `<n>` — then count lines per template. The
   * curation tool for machine-generated text: template frequency is how
   * boilerplate, crawler chrome and log spew get identified for dedup
   * or removal BEFORE tokens are spent on them. Pure codegen projection
   * (three regexp passes + whitespace collapse) into one template-keyed
   * count and a bounded TakeOrdered — no corpus-wide window, no
   * explode. Tie-break: (count desc, template asc), deterministic.
   *
   * Output: topK rows (template, n_lines).
   */
  def logTemplates(df: org.apache.spark.sql.DataFrame, textCol: Column,
      topK: Int = 20): org.apache.spark.sql.DataFrame = {
    require(topK >= 1, "topK >= 1")
    val uuid = "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
    val hex = "\\b(0x[0-9a-fA-F]+|[0-9a-f]{16,})\\b"
    val num = "\\b[0-9]+(\\.[0-9]+)?\\b"
    val masked = regexp_replace(regexp_replace(regexp_replace(
      textCol, uuid, "<id>"), hex, "<hex>"), num, "<n>")
    val template = trim(regexp_replace(masked, "\\s+", " "))
    df.select(template.as("template"))
      .where(col("template") =!= "")
      .groupBy(col("template")).agg(count(lit(1)).as("n_lines"))
      .orderBy(col("n_lines").desc, col("template").asc)
      .limit(topK)
  }
}
