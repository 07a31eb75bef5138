package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.ConnectedComponents
import graft.pipeline.Fixtures

/** Text-analysis + packing operators over the `documents` table — the
  * training-data-pipeline side of the engine (builder brief:
  * language-ID, quality scoring, token counting / BPE, fingerprinting,
  * contamination, sequence packing, corpus mixing). The deduplication
  * family lives in [[Dedup]] and the streaming / lake-ingest rows in
  * [[StreamIngest]]; both share this object's text kernels (tokenizer,
  * shingles, SimHash signature, MinHash digest parser), which is why
  * those kernels are `private[queries]` here.
  *
  * Parity strategy: every computation here is *discrete* (string md5,
  * integer counts) or a single deterministic IEEE-double expression
  * mirrored verbatim in the DuckDB oracle. md5 hex strings compare
  * lexicographically the same in both engines, which makes MinHash
  * signatures (min over md5 strings) engine-portable without sharing
  * any hash implementation.
  *
  * Scale notes (100 TB): all pipelines below are shuffle-bounded by
  * LSH-style *blocking* — candidate pairs come from equi-joins on band
  * signatures / bit-blocks, never from an O(n²) cross join. The only
  * all-pairs work happens inside a candidate bucket, which hashing
  * keeps small; skewed buckets (e.g. boilerplate-heavy shingles) are
  * the known hazard and would be salted or capped at ingest.
  */
object Documents {


  /** planted BPE vocabulary shared by d10/d12's contract oracles:
    * 8 disjoint letter-pair words with strictly decreasing power-of-
    * two frequencies (each contributes exactly ONE candidate pair and
    * vanishes once merged → rounds 1..8 forced, tie-free) plus one
    * chain word whose internal pairs all tie at 2 (rounds 9..11
    * decided purely by the (count desc, left, right) tie-break). */
  private[queries] object BpeFixture {
    val vocab: Seq[(String, Long)] = Seq(
      "ab" -> 512L, "cd" -> 256L, "ef" -> 128L, "gh" -> 64L,
      "ij" -> 32L, "kl" -> 16L, "mn" -> 8L, "op" -> 4L, "xyzw" -> 2L)
  }

  /** d22's chunk pipeline: split each doc into non-overlapping 10-word
    * chunks and flag each occurrence keep iff it is the corpus-wide
    * first (min (doc_id, idx) struct over identical content — struct
    * ordering, no arithmetic packing, so a pathological ≥1e6-chunk doc
    * can never alias into its neighbor) — ONE window min partitioned
    * by the chunk string, a single corpus-scale shuffle, never a
    * self-join re-scan. Returns (doc_id, idx, chunk, keep). */
  private def chunkKeepFlags(docs: DataFrame): DataFrame = {
    val ch = docs
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, (size(arr) - 1) div 10),
          |  i -> struct(CAST(i AS BIGINT) AS idx,
          |              array_join(slice(arr, i * 10 + 1, 10), ' ') AS chunk))"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.idx").as("idx"), col("g.chunk").as("chunk"))
    val w = Window.partitionBy("chunk")
    val key = struct(col("doc_id"), col("idx"))
    ch.withColumn("keep", key === min(key).over(w))
  }

  /** doc → one row per word (keeps empty tokens out). */
  private[queries] def tokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")

  /** doc → distinct 3-gram word shingles. element_at is 1-based, same
    * as DuckDB list indexing, so the oracle mirrors index-for-index. */
  private[queries] def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .select(
        col("doc_id"),
        col("arr"),
        explode(
          when(size(col("arr")) >= 3, sequence(lit(1), size(col("arr")) - 2))
            .otherwise(array().cast("array<int>"))).as("i"))
      .select(
        col("doc_id"),
        concat_ws(
          " ",
          element_at(col("arr"), col("i")),
          element_at(col("arr"), col("i") + 1),
          element_at(col("arr"), col("i") + 2)).as("sh"))
      .distinct()

  private[queries] val ShinglesSql =
    """arrs AS (SELECT doc_id, string_split(text,' ') AS arr FROM documents),
      |shpos AS (SELECT doc_id, arr, unnest(range(1, greatest(len(arr)-2,0)+1)) AS i FROM arrs),
      |sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS sh FROM shpos)""".stripMargin

  /** 32-char bit-string SimHash over a doc's distinct words: bit p is
    * the sign of Σ_words (±1), where the ±1 comes from the parity of
    * hex digit p of md5(word). Engine-portable: md5 + instr + substring
    * behave identically in Spark and DuckDB. */
  private[queries] def simhashDf(docs: DataFrame): DataFrame = {
    // all 32 bit-position sums as aggregate columns of ONE groupBy:
    // md5 evaluated once per (doc, word), no position explode, and the
    // shuffle carries one 32-int row per doc (map-side partial sums)
    val sums = (1 to 32).map { p =>
      sum(expr(s"CASE WHEN (instr('0123456789abcdef', substring(h, $p, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END"))
        .as(s"s$p")
    }
    tokens(docs)
      .select(col("doc_id"), col("w")).distinct()
      .withColumn("h", md5(col("w").cast("binary")))
      .groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(
        col("doc_id"),
        concat((1 to 32).map(p => when(col(s"s$p") >= 0, "1").otherwise("0")): _*).as("simhash"))
  }

  private[queries] val SimhashSql =
    """tok AS (SELECT DISTINCT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) t WHERE w <> ''),
      |bits AS (
      |  SELECT doc_id, p,
      |    CASE WHEN sum(CASE WHEN (instr('0123456789abcdef', substring(md5(w), p, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END) >= 0
      |         THEN '1' ELSE '0' END AS bit
      |  FROM tok CROSS JOIN (SELECT unnest(range(1,33)) AS p) ps
      |  GROUP BY doc_id, p),
      |sig AS (SELECT doc_id, string_agg(bit, '' ORDER BY p) AS simhash FROM bits GROUP BY doc_id)""".stripMargin

  /** Σ of per-position mismatch indicators — the shared generator
    * ([[graft.core.Hamming.sql32]]), used verbatim by both engines
    * (no join over positions). */
  private[queries] val hamming32: String = graft.core.Hamming.sql32

  /** DuckDB positional parse of the first 15 hex digits of an
    * arbitrary md5-hex SQL expression → BIGINT (the generic form of
    * [[mhBaseDuck]]). */
  private[queries] def MhDuckParse(md5Expr: String): String = MhDuckParseN(md5Expr, 15)

  /** Same hex-digit fold over the first `n` md5 digits — narrower
    * widths keep ANSI bigint sums over many rows overflow-free
    * (48-bit × 10k rows stays under 2^63). */
  private[queries] def MhDuckParseN(md5Expr: String, n: Int): String =
    (0 until n).map { k =>
      val pow = java.math.BigInteger.valueOf(16L).pow(n - 1 - k)
      s"(instr('0123456789abcdef', substring($md5Expr, ${k + 1}, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")

  /** Distributed two-pass prefix sum of `n_tokens` in `doc_id` order —
    * the running-offset ("start") column of sequence packing WITHOUT a
    * single-partition window.
    *
    * Pass 1 groups docs into chunks of `chunk` ids (`doc_id div chunk`
    * is monotone in doc_id, so chunk-order ∘ local-order == global
    * order) and takes per-chunk running sums under a PARTITIONED window
    * — fully parallel, each task sorts only its chunks. Pass 2 collects
    * the per-chunk subtotals (|corpus| / chunk rows — ≤ ~10⁵ entries at
    * a billion docs with chunk = 8192, the same metadata class as a
    * bucket manifest), folds them into cumulative offsets on the
    * driver, and re-enters the plan as a broadcast map literal, so
    * `start = offset(chunk) + local running sum` is a pure projection.
    * No Exchange SinglePartition anywhere; oracle-identical to the
    * global ORDER BY window it replaces. */
  private[queries] def packedStarts(toks: DataFrame, chunk: Long): DataFrame = {
    // persist the chunked input: it feeds BOTH the subtotal collect and
    // the returned frame, so without the cache the whole upstream plan
    // (in d18 the full dedup+gate+mix chain) would execute twice — and
    // correctness would silently ride on that plan being deterministic
    // across the two executions
    val byChunk = graft.operators.CorpusPipeline.chunked(toks, chunk).persist()
    // checkpoint the placed frame (one narrow row per doc) off the
    // cached input, then release the cache — single upstream execution,
    // nothing pinned beyond the result the callers consume
    val placed = placedFrame(byChunk).localCheckpoint()
    byChunk.unpersist()
    placed
  }

  /** the lazy placement plan (chunk-partitioned window + broadcast
    * offset map) packedStarts checkpoints; split out so PlanSpec can
    * assert the window shape that the checkpoint's lineage truncation
    * hides from downstream plans. The `_ck` column the input must
    * carry IS the contract — chunking happened upstream. The kernel
    * itself lives in [[graft.operators.CorpusPipeline]] (shared with
    * the streaming twin's per-micro-batch placement). */
  private[queries] def placedFrame(byChunk: DataFrame): DataFrame =
    graft.operators.CorpusPipeline.placedFrame(byChunk)

  /** PlanSpec hook: the pre-checkpoint placement plan for a docs
    * frame, built exactly as d9/d18 build it. */
  private[queries] def placedPlanForSpec(docs: DataFrame, chunk: Long = 8192L): DataFrame =
    placedFrame(
      tokens(docs).groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
        .withColumn("_ck", expr(s"doc_id div $chunk")))

  /** Shared packing tail of d9 / d18: explode each doc over the bins
    * its [start, start + n_tokens) span touches and sum the clipped
    * per-bin contributions. Integer `div` throughout — matches the
    * oracle's `//` and stays exact past 2⁵³ cumulative tokens, where
    * double division would round bins. */
  private[queries] def packBins(placed: DataFrame, cap: Long): DataFrame =
    graft.operators.CorpusPipeline.binSpans(placed, cap)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("contrib").as("n_tokens"))
      .orderBy("bin")

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // d1 — token counting (whitespace tokenizer): per-doc token +
    // distinct-word counts. Map-side partial agg keeps the shuffle at
    // one row per doc.
    QueryDef(
      "d1_token_count",
      (s, d) => tokens(Tables.documents(s, d))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("w")).as("n_distinct"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, count(*) AS n_tokens, count(DISTINCT w) AS n_distinct
             |FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) t
             |WHERE w <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),

    // d1b — BPE-ish regex tokenization (word / number / punctuation
    // classes, the GPT-style pre-tokenizer shape) next to the
    // whitespace count; the class pattern evaluates identically under
    // Java regex and RE2.
    QueryDef(
      "d1b_token_bpe",
      (s, d) => Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")).as("n_bpe_tokens"),
          size(filter(split(col("text"), " "), w => w =!= "")).as("n_ws_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens,
             |  len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_ws_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // d2 — quality scoring: length/stopword/token-shape ratios folded
    // into one score. Every double op is a single shared expression
    // tree, so Spark and DuckDB produce bit-identical IEEE results.
    QueryDef(
      "d2_quality_score",
      (s, d) => tokens(Tables.documents(s, d))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(length(col("w"))).as("sum_len"),
          sum(when(col("w").isin("the", "a", "of", "and", "to", "in", "is", "on"), 1L).otherwise(0L)).as("n_stop"))
        .select(
          col("doc_id"),
          col("n_tokens"),
          (col("sum_len").cast("double") / col("n_tokens").cast("double")).as("avg_token_len"),
          (col("n_stop").cast("double") / col("n_tokens").cast("double")).as("stop_ratio"))
        .withColumn(
          "quality",
          least(col("n_tokens").cast("double") / 200.0, lit(1.0)) * 0.5 +
            col("stop_ratio") * 0.25 +
            least(col("avg_token_len") / 5.0, lit(1.0)) * 0.25)
        .orderBy("doc_id"),
      Some("""WITH agg AS (
             |  SELECT doc_id, count(*) AS n_tokens, sum(length(w)) AS sum_len,
             |    sum(CASE WHEN w IN ('the','a','of','and','to','in','is','on') THEN 1 ELSE 0 END) AS n_stop
             |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) t
             |  WHERE w <> '' GROUP BY doc_id),
             |proj AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
             |    CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio
             |  FROM agg)
             |SELECT doc_id, n_tokens, avg_token_len, stop_ratio,
             |  least(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) * 0.5 + stop_ratio * 0.25 +
             |  least(avg_token_len / 5.0, 1.0) * 0.25 AS quality
             |FROM proj ORDER BY doc_id""".stripMargin),
    ),

    // d3 — language-ID (stopword-profile heuristic): score each
    // candidate language by marker-word hits, argmax with a fixed
    // precedence. (The synthetic corpus shares one vocabulary across
    // langs, so predictions skew 'en' — the operator under test is the
    // deterministic profile-scoring plan, not model accuracy.)
    QueryDef(
      "d3_lang_id",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = tokens(docs)
          .groupBy("doc_id")
          .agg(
            sum(when(col("w").isin("the", "a", "is"), 1L).otherwise(0L)).as("s_en"),
            sum(when(col("w").isin("der", "und", "das"), 1L).otherwise(0L)).as("s_de"),
            sum(when(col("w").isin("el", "los", "una"), 1L).otherwise(0L)).as("s_es"),
            sum(when(col("w").isin("le", "les", "des"), 1L).otherwise(0L)).as("s_fr"))
        docs.select(col("doc_id"), col("lang"))
          .join(scored, "doc_id")
          .withColumn(
            "pred",
            when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
              .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
              .when(col("s_es") >= col("s_fr"), "es")
              .otherwise("fr"))
          .select(col("doc_id"), col("lang"), col("pred"), (col("pred") === col("lang")).as("is_match"))
          .orderBy("doc_id")
      },
      Some("""WITH sc AS (
             |  SELECT doc_id,
             |    sum(CASE WHEN w IN ('the','a','is') THEN 1 ELSE 0 END) AS s_en,
             |    sum(CASE WHEN w IN ('der','und','das') THEN 1 ELSE 0 END) AS s_de,
             |    sum(CASE WHEN w IN ('el','los','una') THEN 1 ELSE 0 END) AS s_es,
             |    sum(CASE WHEN w IN ('le','les','des') THEN 1 ELSE 0 END) AS s_fr
             |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) t
             |  WHERE w <> '' GROUP BY doc_id),
             |p AS (
             |  SELECT d.doc_id, d.lang,
             |    CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
             |         WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
             |         WHEN s_es >= s_fr THEN 'es'
             |         ELSE 'fr' END AS pred
             |  FROM documents d JOIN sc ON d.doc_id = sc.doc_id)
             |SELECT doc_id, lang, pred, (pred = lang) AS is_match FROM p ORDER BY doc_id""".stripMargin),
    ),

    // d4 — document fingerprinting: whole-doc content hash + winnowing-
    // style minimum shingle hash (the smallest md5 over the doc's
    // 3-gram shingles — a 1-feature locality-sensitive sketch).
    QueryDef(
      "d4_fingerprint",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.select(col("doc_id"), md5(col("text").cast("binary")).as("content_fp"))
          .join(
            shingles(docs).groupBy("doc_id")
              .agg(min(md5(col("sh").cast("binary"))).as("min_shingle_fp"), count(lit(1)).as("n_shingles")),
            "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH $ShinglesSql,
              |fp AS (SELECT doc_id, min(md5(sh)) AS min_shingle_fp, count(*) AS n_shingles FROM sh GROUP BY doc_id)
              |SELECT d.doc_id, md5(d.text) AS content_fp, fp.min_shingle_fp, fp.n_shingles
              |FROM documents d JOIN fp ON d.doc_id = fp.doc_id ORDER BY d.doc_id""".stripMargin),
    ),

    // d4b — Rabin-Karp rolling-hash fingerprint (incremental O(n)
    // sliding window over the raw bytes; winnowing min-hash). The
    // kernel is incremental, but its VALUE is a plain polynomial mod
    // 1e9+7 — so the oracle recomputes every window hash positionally
    // (16 inlined ord() terms with precomputed 257^k coefficients)
    // and must land on the same per-doc minimum: a genuine cross-check
    // of the O(n) rolling recurrence against direct evaluation.
    // ENCODING ASSUMPTION: the kernel hashes UTF-8 BYTES at byte
    // offsets while the oracle's ord()/length()/substring are
    // CHARACTER-based — they agree only because documents.text is
    // pure ASCII (the fixture generator guarantees it). If non-ASCII
    // fixtures ever land here, switch the oracle to octet-level
    // access (encode(text) + octet positions) before trusting parity.
    QueryDef(
      "d4b_rolling_fingerprint",
      (s, d) => {
        val rollUdf = udf((t: String) => graft.core.Bytes.minRollingHash(t.getBytes("UTF-8"), 16))
        Tables.documents(s, d)
          .select(col("doc_id"), rollUdf(col("text")).as("min_rolling_hash"))
          .orderBy("doc_id")
      },
      Some {
        val M = 1000000007L
        val terms = (0 until 16).map { j =>
          val coeff = java.math.BigInteger.valueOf(257L).modPow(
            java.math.BigInteger.valueOf(15L - j), java.math.BigInteger.valueOf(M))
          s"CAST(ord(substring(text, p + $j, 1)) AS BIGINT) * $coeff"
        }.mkString(" + ")
        s"""WITH pos AS (
           |  SELECT doc_id, text, unnest(range(1, length(text) - 16 + 2)) AS p
           |  FROM documents WHERE length(text) >= 16),
           |h AS (SELECT doc_id, ($terms) % $M AS hash FROM pos)
           |SELECT d.doc_id, CAST(COALESCE(mn.mh, -1) AS BIGINT) AS min_rolling_hash
           |FROM documents d LEFT JOIN (SELECT doc_id, min(hash) AS mh FROM h GROUP BY doc_id) mn
           |  ON mn.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin
      },
    ),

    // d5 — deterministic train/validation/test split: the assignment
    // is a pure function of the stable id (md5 bucket 0..99 → 80/10/10)
    // so the split is reproducible across runs, engines and cluster
    // sizes — the property a training pipeline needs from its split.
    QueryDef(
      "d5_train_test_split",
      (s, d) => Tables.documents(s, d)
        .withColumn("bucket",
          expr("(instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16 + " +
            "(instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 2, 1)) - 1)") % 100)
        .withColumn("split",
          when(col("bucket") < 80, "train").when(col("bucket") < 90, "valid").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"))
        .orderBy("split"),
      // CAST(sum AS BIGINT): DuckDB integer SUM is HUGEINT → float64 in
      // the driver's pandas compare; cast pins it to int64 like Spark.
      Some("""SELECT split, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM (
             |  SELECT n_chars,
             |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
             |  FROM (SELECT n_chars,
             |    ((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
             |     (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 100 AS b
             |    FROM documents) t) s
             |GROUP BY split ORDER BY split""".stripMargin),
    ),

    // d6 — class-balanced sampling: deterministic top-n per label in
    // md5-shuffled order (a reproducible stratified sample keyed only
    // on stable ids).
    QueryDef(
      "d6_balanced_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang").orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select("lang", "doc_id", "rn")
          .orderBy("lang", "rn")
      },
      Some("""SELECT lang, doc_id, rn FROM (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents) t
             |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin),
    ),

    // d7 — PII scrubbing: regex redaction of emails and phone-shaped
    // numbers with per-doc hit counts. The corpus is synthetic, so a
    // deterministic injector plants PII in a known subset on BOTH
    // engines — the redactor must then remove exactly what was
    // planted. Per-row regex, fully codegen'd, embarrassingly
    // parallel at any scale.
    QueryDef(
      "d7_pii_scrub",
      (s, d) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"
        Tables.documents(s, d)
          // plant: every 3rd doc gets an email, every 5th a phone
          .withColumn("dirty", concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" user"), col("doc_id").cast("string"), lit("@example.com"))).otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit(" +12-345-6789")).otherwise(lit(""))))
          .select(
            col("doc_id"),
            regexp_count(col("dirty"), lit(emailRe)).as("n_emails"),
            regexp_count(col("dirty"), lit(phoneRe)).as("n_phones"),
            length(regexp_replace(regexp_replace(col("dirty"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
              .as("clean_len"))
          .orderBy("doc_id")
      },
      Some("""WITH dirty AS (
             |  SELECT doc_id, text ||
             |    CASE WHEN doc_id % 3 = 0 THEN ' user' || doc_id || '@example.com' ELSE '' END ||
             |    CASE WHEN doc_id % 5 = 0 THEN ' +12-345-6789' ELSE '' END AS dirty
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
             |  CAST(len(regexp_extract_all(dirty, '\+[0-9]{2}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
             |  length(regexp_replace(regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\+[0-9]{2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS clean_len
             |FROM dirty ORDER BY doc_id""".stripMargin),
    ),

    // d8 — benchmark-contamination check: fraction of each training
    // doc's 3-gram shingles that appear in a held-out benchmark set
    // (docs 0–9 here). The benchmark shingle set is tiny → broadcast
    // semi-join per shingle; no O(n²), scales with corpus size only.
    QueryDef(
      "d8_contamination",
      (s, d) => {
        val sh = shingles(Tables.documents(s, d))
        val bench = sh.filter(col("doc_id") < 10).select(col("sh").as("bsh")).distinct()
        val train = sh.filter(col("doc_id") >= 10)
        train
          .join(broadcast(bench), col("sh") === col("bsh"), "left_outer")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("bsh").isNotNull, 1L).otherwise(0L)).as("n_contaminated"))
          .withColumn("contamination",
            (col("n_contaminated").cast("double") / col("n_shingles").cast("double")))
          .filter(col("contamination") >= 0.5)
          .select("doc_id", "n_shingles", "n_contaminated", "contamination")
          .orderBy("doc_id")
      },
      Some(s"""WITH $ShinglesSql,
              |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 10),
              |scored AS (
              |  SELECT t.doc_id, count(*) AS n_shingles,
              |    CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
              |  FROM sh t LEFT OUTER JOIN bench b ON t.sh = b.sh
              |  WHERE t.doc_id >= 10 GROUP BY t.doc_id)
              |SELECT doc_id, n_shingles, n_contaminated,
              |  CAST(n_contaminated AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS contamination
              |FROM scored
              |WHERE CAST(n_contaminated AS DOUBLE) / CAST(n_shingles AS DOUBLE) >= 0.5
              |ORDER BY doc_id""".stripMargin),
    ),

    // d9 — token-sequence packing: documents laid out contiguously (by
    // doc_id) into fixed 512-token training sequences, straddling
    // allowed (the standard pretraining packing with cross-boundary
    // attention masks). Offsets come from the distributed two-pass
    // prefix sum ([[packedStarts]] — chunked partitioned windows +
    // broadcast chunk offsets, no single-partition Exchange), bin
    // membership an explode over the doc's bin span; every bin except
    // the last must hold exactly 512 tokens — the oracle checks the
    // clipped per-bin token contributions exactly. chunk = 64 so even
    // sf0.01's 500 docs exercise the multi-chunk offset path.
    QueryDef(
      "d9_sequence_packing",
      (s, d) => {
        val toks = tokens(Tables.documents(s, d)).groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"))
        packBins(packedStarts(toks, chunk = 64L), cap = 512L)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, count(*) AS n_tokens FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
             |  WHERE w <> '' GROUP BY doc_id),
             |placed AS (
             |  SELECT doc_id, n_tokens,
             |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
             |  FROM toks),
             |spans AS (
             |  SELECT doc_id, n_tokens, start,
             |    unnest(range(CAST(start // 512 AS BIGINT), CAST((start + n_tokens - 1) // 512 + 1 AS BIGINT))) AS bin
             |  FROM placed)
             |SELECT bin, count(*) AS n_docs,
             |  CAST(SUM(least(start + n_tokens, (bin + 1) * 512) - greatest(start, bin * 512)) AS BIGINT) AS n_tokens
             |FROM spans GROUP BY bin ORDER BY bin""".stripMargin),
    ),

    // d18 — the FULL training-data pipeline as one composed plan:
    // exact dedup (keep smallest id per content hash) → quality gate
    // (≥ 30 tokens) → weighted corpus mix (d16's seeded hash rates) →
    // 512-token sequence packing (d9's prefix-sum layout). Every
    // stage is individually oracled elsewhere; this query proves the
    // COMPOSITION end-to-end against one chained SQL oracle — the
    // shape a real preprocessing job ships: dedup's one shuffle, the
    // gate and mix map-side, packing's chunked partitioned windows
    // (plus one metadata-sized chunk-offset collect — see
    // [[packedStarts]]). Output is the packed-bin manifest.
    QueryDef(
      "d18_pipeline_e2e",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keep = docs
          .groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val gated = tokens(docs.join(keep, Seq("doc_id"), "left_semi"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
          .filter(col("n_tokens") >= 30)
        val mixed = gated.filter(graft.operators.CorpusPipeline.mixKeep)
        packBins(packedStarts(mixed, chunk = 64L), cap = 512L)
      },
      Some(s"""WITH keep AS (
              |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
              |toks AS (
              |  SELECT t.doc_id, count(*) AS n_tokens FROM (
              |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
              |  JOIN keep k ON k.doc_id = t.doc_id
              |  WHERE w <> '' GROUP BY t.doc_id),
              |gated AS (SELECT doc_id, n_tokens FROM toks WHERE n_tokens >= 30),
              |mixed AS (
              |  SELECT doc_id, n_tokens FROM gated
              |  WHERE (${MhDuckParse("md5('mix|' || CAST(doc_id AS VARCHAR))")} + 1) / 1152921504606846976.0
              |    <= CASE doc_id % 3 WHEN 0 THEN 0.9 WHEN 1 THEN 0.5 ELSE 0.2 END),
              |placed AS (
              |  SELECT doc_id, n_tokens,
              |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
              |  FROM mixed),
              |spans AS (
              |  SELECT doc_id, n_tokens, start,
              |    unnest(range(CAST(start // 512 AS BIGINT), CAST((start + n_tokens - 1) // 512 + 1 AS BIGINT))) AS bin
              |  FROM placed)
              |SELECT bin, count(*) AS n_docs,
              |  CAST(SUM(least(start + n_tokens, (bin + 1) * 512) - greatest(start, bin * 512)) AS BIGINT) AS n_tokens
              |FROM spans GROUP BY bin ORDER BY bin""".stripMargin),
      headline = true,
    ),

    // d18_scale — the packing prefix sum PROVED at a million docs:
    // executor-born corpus (s.range, no parquet), token counts from a
    // portable integer formula both engines compute bit-identically,
    // packed by the same packedStarts/packBins path as d9/d18 with
    // chunk = 8192 (123 chunk offsets in the broadcast map —
    // metadata-sized). The plan contains NO single-partition Exchange:
    // chunked partitioned windows + a broadcast-literal offset
    // projection. Fully hash-oracled — DuckDB regenerates the corpus
    // from range(1e6), reruns the global-window packing, and must land
    // on the same ~390k-bin summary.
    QueryDef(
      "d18_scale",
      (s, _) => {
        val toks = s.range(1000000L).select(
          col("id").as("doc_id"),
          expr("(id * 2654435761) % 400 + 1").as("n_tokens"))
        packBins(packedStarts(toks, chunk = 8192L), cap = 512L)
          .agg(
            count(lit(1)).as("n_bins"),
            sum(when(col("n_tokens") === 512L, 1L).otherwise(0L)).as("n_full_bins"),
            sum("n_tokens").as("total_tokens"),
            max("n_docs").as("max_docs_per_bin"),
            sum(col("bin") * col("n_tokens")).as("checksum"))
      },
      Some("""WITH ids AS (SELECT unnest(range(1000000)) AS doc_id),
             |toks AS (SELECT doc_id, (doc_id * 2654435761) % 400 + 1 AS n_tokens FROM ids),
             |placed AS (
             |  SELECT doc_id, n_tokens,
             |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
             |  FROM toks),
             |spans AS (
             |  SELECT n_tokens, start,
             |    unnest(range(CAST(start // 512 AS BIGINT), CAST((start + n_tokens - 1) // 512 + 1 AS BIGINT))) AS bin
             |  FROM placed),
             |bins AS (
             |  SELECT bin, count(*) AS n_docs,
             |    CAST(SUM(least(start + n_tokens, (bin + 1) * 512) - greatest(start, bin * 512)) AS BIGINT) AS n_tokens
             |  FROM spans GROUP BY bin)
             |SELECT count(*) AS n_bins,
             |  CAST(SUM(CASE WHEN n_tokens = 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_full_bins,
             |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             |  max(n_docs) AS max_docs_per_bin,
             |  CAST(SUM(bin * n_tokens) AS BIGINT) AS checksum
             |FROM bins""".stripMargin),
      headline = true,
    ),

    // d12 — BPE ENCODE with the learned merge table: the apply side of
    // d10 — every doc tokenized by the trained merges, per-doc BPE
    // token count out. The merge table is trained once (driver) and
    // broadcast into a per-word kernel; encode cost is a map over the
    // corpus. PLANTED-CONTRACT oracle: train on [[BpeFixture.vocab]]
    // with 8 merges (exactly the 8 forced disjoint-pair merges — see
    // d10's uniqueness argument), then encode 500 planted docs where
    // doc i holds (i%5)+1 copies of planted word i%9. Post-merge cost
    // is closed-form — 1 token for the 8 merged pair-words, 4 for the
    // un-merged chain word — so DuckDB recomputes every per-doc count
    // from the same generation formula the docs are built from. A
    // wrong merge table or a wrong apply kernel shifts counts and
    // fails the hash. BpeTrainerSpec still pins train/apply on real
    // corpus text.
    QueryDef(
      "d12_bpe_encode",
      (s, _) => {
        import graft.operators.BpeTrainer
        import s.implicits._
        val rules = BpeTrainer.train(BpeFixture.vocab.toDF("word", "freq"), merges = 8)
        val bc = s.sparkContext.broadcast(rules)
        val nTok = udf((w: String) => BpeTrainer.applyMerges(w, bc.value).length)
        val wordArr = typedLit(BpeFixture.vocab.map(_._1))
        val docs = s.range(500L).select(
          col("id").as("doc_id"),
          array_join(
            array_repeat(
              element_at(wordArr, (col("id") % 9 + 1).cast("int")),
              (col("id") % 5 + 1).cast("int")),
            " ").as("text"))
        // run the iterative merge kernel once per distinct (doc, word),
        // then weight by occurrence count — near-vocabulary-scale work
        // instead of corpus-scale
        tokens(docs)
          .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
          .select(col("doc_id"), (nTok(col("w")) * col("cnt")).as("n"))
          .groupBy("doc_id").agg(sum("n").as("n_bpe_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH ids AS (SELECT unnest(range(500)) AS doc_id)
             |SELECT doc_id,
             |  CAST(((doc_id % 5) + 1) *
             |       (CASE WHEN doc_id % 9 = 8 THEN 4 ELSE 1 END) AS BIGINT) AS n_bpe_tokens
             |FROM ids ORDER BY doc_id""".stripMargin),
    ),

    // d13 — quality-percentile gate: keep docs above the exact corpus
    // median length (interpolated percentile — both engines compute
    // the same (a+b)/2 on the same middle values). The "top half by
    // quality" curation cut, as a one-scalar broadcast filter.
    QueryDef(
      "d13_quality_filter",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // percentile of an empty corpus is NULL — nothing can beat the
        // median of nothing, so the gate passes nothing through
        val thrRow = docs.agg(expr("percentile(n_chars, 0.5)")).head()
        val thr = if (thrRow.isNullAt(0)) Double.MaxValue else thrRow.getDouble(0)
        docs.filter(col("n_chars") > thr)
          .select("doc_id", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars FROM documents
             |WHERE n_chars > (SELECT quantile_cont(n_chars, 0.5) FROM documents)
             |ORDER BY doc_id""".stripMargin),
    ),

    // d14 — inverted-index AND query: posting-list intersection for
    // "docs containing ALL of k terms" — the search-shaped access
    // path. Terms are picked deterministically (frequency ranks
    // 10/20/30) via orderBy.limit(30) — TakeOrderedAndProject, a
    // per-partition top-30 merged on one 30-row task, NEVER a global
    // row_number sort of the vocabulary (a web-scale vocab would pin
    // that on one task); the rank window then runs over ≤ 30 rows.
    // The intersection is a groupBy-count over only the probed terms'
    // postings, never a corpus scan per term.
    QueryDef(
      "d14_inverted_index",
      (s, d) => {
        val tok = tokens(Tables.documents(s, d))
        val top = tok.groupBy("w").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("w")).limit(30)
        val w = Window.orderBy(col("freq").desc, col("w")) // ≤ 30 rows
        val terms = top
          .withColumn("rk", row_number().over(w))
          .filter(col("rk").isin(10, 20, 30))
          .select("w")
        tok.select("doc_id", "w").distinct()
          .join(broadcast(terms), Seq("w"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_terms"))
          .filter(col("n_terms") === 3)
          .select("doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, w FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
             |  WHERE w <> ''),
             |freqs AS (SELECT w, count(*) AS freq FROM tok GROUP BY w),
             |terms AS (
             |  SELECT w FROM (
             |    SELECT w, row_number() OVER (ORDER BY freq DESC, w) AS rk FROM freqs) r
             |  WHERE rk IN (10, 20, 30)),
             |hits AS (
             |  SELECT DISTINCT t.doc_id, t.w FROM tok t JOIN terms x ON x.w = t.w)
             |SELECT doc_id FROM hits GROUP BY doc_id HAVING count(*) = 3
             |ORDER BY doc_id""".stripMargin),
    ),

    // d19 — BM25-RANKED text search: the retrieval-shaped sibling of
    // d14's boolean AND, and the access path a contamination / quality
    // retrieval job actually runs. Query terms are the same
    // deterministic frequency-rank picks (10/20/30); each (doc, term)
    // hit scores idf * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl)) with
    // k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5)); top 20 docs
    // by summed score. Plan shape at scale: the 3-term list and the
    // per-term df are broadcast, so only the probed terms' postings
    // survive the scan; corpus stats (N, avgdl) are a one-row
    // broadcast crossjoin; the final top-k is TakeOrderedAndProject.
    // Parity: per-term scores are one deterministic IEEE-double
    // expression mirrored verbatim; the per-doc sum goes through
    // DECIMAL(28,12) (order-independent, like dsum) and the output is
    // a 1e4 fixed-point BIGINT, absorbing libm last-bit differences.
    QueryDef(
      "d19_bm25",
      (s, d) => bm25Top(s, d, 20),
      Some(s"""WITH $Bm25Ctes
              |SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_fp
              |FROM scored
              |ORDER BY score_fp DESC, doc_id
              |LIMIT 20""".stripMargin),
      headline = true,
    ),

    // ss19 — HYBRID retrieval: reciprocal-rank fusion of the lexical
    // (d19 BM25) and vector (exact fixed-point MIPS) rankings over the
    // SAME corpus (doc_id ≡ vec_id in the fixture star) — the fused
    // access path a retrieval/decontamination pipeline actually serves,
    // because each ranking finds matches the other misses. RRF is
    // computed in pure integers (⌊10¹²/(60+rank)⌋ per list, summed) so
    // the fused ordering is hash-exact; `in_bm25`/`in_vec` expose the
    // provenance of each fused hit. Plan shape: two independent top-k
    // spines (both TakeOrderedAndProject) joined full-outer on ≤ 2k
    // rows — the fusion itself is free at any corpus size.
    QueryDef(
      "ss19_hybrid_rrf",
      (s, d) => {
        val kList = 20
        val wb = Window.orderBy(col("score_fp").desc, col("doc_id")) // ≤ 20 rows
        val bm = bm25Top(s, d, kList)
          .withColumn("rb", row_number().over(wb))
          .select(col("doc_id").as("id"), col("rb"))
        val e = Tables.embeddings(s, d).withColumn("f", Similarity.fxCol)
        val q = e.filter(col("vec_id") === 0).select(col("f").as("qf"))
        val wv = Window.orderBy(col("ip").desc, col("id")) // ≤ 20 rows
        val vec = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
          .select(col("vec_id").as("id"), Similarity.ip(col("f"), col("qf")).as("ip"))
          .orderBy(col("ip").desc, col("id")).limit(kList)
          .withColumn("rc", row_number().over(wv))
          .select("id", "rc")
        bm.join(vec, Seq("id"), "full_outer")
          .select(col("id").as("doc_id"),
            (coalesce(expr("1000000000000L div (rb + 60)"), lit(0L)) +
              coalesce(expr("1000000000000L div (rc + 60)"), lit(0L))).as("rrf_fp"),
            col("rb").isNotNull.as("in_bm25"),
            col("rc").isNotNull.as("in_vec"))
          .orderBy(col("rrf_fp").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH $Bm25Ctes,
              |bm AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score_fp DESC, doc_id) AS rb
              |       FROM (SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_fp
              |             FROM scored ORDER BY score_fp DESC, doc_id LIMIT 20)),
              |fxl AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(x*1e7) AS BIGINT)) AS f
              |        FROM embeddings),
              |qv AS (SELECT f AS qf FROM fxl WHERE vec_id = 0),
              |vpos AS (SELECT a.vec_id, unnest(range(1, len(a.f)+1)) AS i, a.f AS f, b.qf AS qf
              |         FROM fxl a CROSS JOIN qv b WHERE a.vec_id <> 0),
              |vips AS (SELECT vec_id, sum(f[i]*qf[i]) AS ip FROM vpos GROUP BY vec_id),
              |vt AS (SELECT vec_id AS id, row_number() OVER (ORDER BY ip DESC, vec_id) AS rc
              |       FROM (SELECT vec_id, ip FROM vips ORDER BY ip DESC, vec_id LIMIT 20)),
              |fused AS (
              |  SELECT COALESCE(bm.id, v.id) AS doc_id,
              |    COALESCE(1000000000000 // (bm.rb + 60), 0) +
              |      COALESCE(1000000000000 // (v.rc + 60), 0) AS rrf_fp,
              |    bm.rb IS NOT NULL AS in_bm25, v.rc IS NOT NULL AS in_vec
              |  FROM bm FULL OUTER JOIN vt v ON v.id = bm.id)
              |SELECT doc_id, CAST(rrf_fp AS BIGINT) AS rrf_fp, in_bm25, in_vec
              |FROM fused ORDER BY rrf_fp DESC, doc_id LIMIT 10""".stripMargin),
    ),

    // d20 — REPETITION filter (Gopher-style quality signals, adapted
    // to word-stream docs): per doc, the modal-2-gram fraction and the
    // duplicated-3-gram fraction; a doc is flagged when the top 2-gram
    // covers > 20% of its 2-grams or > 18% of its 3-gram occurrences
    // are repeats — the "looping text" degeneracy gate every crawl
    // pipeline runs. Entirely per-doc groupBy (no corpus-wide state,
    // no shuffle beyond the doc-keyed aggregations) and all-integer
    // output: thresholds compare via cross-multiplication, so the row
    // is hash-exact with no float in sight. Spark `sequence` is
    // inclusive and descends when start > stop, so n-gram index
    // ranges are guarded by size; DuckDB `range` is half-open and
    // empty in that case — the guards keep the two aligned.
    QueryDef(
      "d20_repetition_filter",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("arr"))
        def grams(n: Int): DataFrame = {
          val idx = when(size(col("arr")) >= n,
            sequence(lit(1), size(col("arr")) - (n - 1)))
            .otherwise(array().cast("array<int>"))
          val parts = (0 until n)
            .map(j => "element_at(arr, i + " + j + ")")
            .mkString("concat_ws(' ', ", ", ", ")")
          base.select(col("doc_id"), explode(idx).as("i"), col("arr"))
            .select(col("doc_id"), expr(parts).as("g"))
        }
        val s2 = grams(2).groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(sum("c").as("n2"), max("c").as("top2_cnt"))
        val s3 = grams(3).groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(sum("c").as("n3"),
            sum(when(col("c") > 1, col("c")).otherwise(lit(0))).as("n3_dup"))
        s2.join(s3, Seq("doc_id"))
          .select(col("doc_id"), col("n2"), col("top2_cnt"),
            col("n3"), col("n3_dup"),
            (col("top2_cnt") * 5 > col("n2") ||
              col("n3_dup") * 50 > col("n3") * 9).as("flagged"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
             |g2 AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(arr)),
             |      i -> arr[i] || ' ' || arr[i+1])) AS g
             |  FROM base),
             |g3 AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(arr) - 1),
             |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS g
             |  FROM base),
             |s2 AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2, max(c) AS top2_cnt FROM (
             |    SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g) t
             |  GROUP BY doc_id),
             |s3 AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3,
             |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n3_dup FROM (
             |    SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g) t
             |  GROUP BY doc_id)
             |SELECT s2.doc_id, n2, top2_cnt, n3, n3_dup,
             |  (top2_cnt * 5 > n2 OR n3_dup * 50 > n3 * 9) AS flagged
             |FROM s2 JOIN s3 ON s3.doc_id = s2.doc_id
             |ORDER BY s2.doc_id""".stripMargin),
    ),

    // d21 — BIGRAM-LM perplexity gate (the CCNet/CC-style "train a
    // small LM on the corpus, drop what it finds surprising" filter):
    // an add-one-smoothed bigram model is fit on the WHOLE corpus —
    // c(w1,w2) and c(w1·) by shuffle groupBy with map-side combine,
    // V = corpus vocab — then every doc is scored by its mean
    // negative log-likelihood sum(-ln((c12+1)/(c1+V)))/n. The score
    // join is bigram-keyed equi-join of the doc stream against the
    // model — the real 100-TB shape (model >> memory, so it is NOT
    // broadcast; co-partitioned by bigram on both sides of one
    // shuffle). Output is the 20 most-surprising docs as 1e4
    // fixed-point NLL: every ln() argument is a ratio of exact
    // integers, summed through DECIMAL(28,12), so the fixed-point
    // output absorbs libm last-bit drift (same recipe as d19).
    QueryDef(
      "d21_bigram_lm",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("arr"))
        val bi = base.select(col("doc_id"),
          explode(when(size(col("arr")) >= 2,
            sequence(lit(1), size(col("arr")) - 1))
            .otherwise(array().cast("array<int>"))).as("i"), col("arr"))
          .select(col("doc_id"),
            expr("element_at(arr, i)").as("w1"),
            expr("concat_ws(' ', element_at(arr, i), element_at(arr, i+1))").as("g"))
        val c12 = bi.groupBy("g").agg(count(lit(1)).as("c12"))
        val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
        val vocab = base
          .select(explode(col("arr")).as("w")).agg(countDistinct("w").as("v"))
        bi.join(c12, Seq("g"))
          .join(c1, Seq("w1"))
          .crossJoin(broadcast(vocab))
          .withColumn("nll",
            -log((col("c12") + lit(1.0)) / (col("c1") + col("v"))))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("nll").cast("decimal(28,12)")).cast("double").as("nll_sum"))
          .select(col("doc_id"), col("n_bigrams"),
            expr("CAST(floor(nll_sum / n_bigrams * 10000 + 0.5) AS BIGINT)")
              .as("mean_nll_fp"))
          .orderBy(col("mean_nll_fp").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
             |bi AS (
             |  SELECT doc_id, g[1] AS w1, g[1] || ' ' || g[2] AS g FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, len(arr)),
             |        i -> [arr[i], arr[i+1]])) AS g
             |    FROM base) t),
             |c12 AS (SELECT g, count(*) AS c12 FROM bi GROUP BY g),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
             |vocab AS (
             |  SELECT count(DISTINCT w) AS v FROM (
             |    SELECT unnest(arr) AS w FROM base) t),
             |scored AS (
             |  SELECT bi.doc_id, count(*) AS n_bigrams,
             |    CAST(sum(CAST(
             |      -ln((c12.c12 + 1.0) / (c1.c1 + vocab.v))
             |      AS DECIMAL(28,12))) AS DOUBLE) AS nll_sum
             |  FROM bi
             |  JOIN c12 ON c12.g = bi.g
             |  JOIN c1 ON c1.w1 = bi.w1
             |  CROSS JOIN vocab
             |  GROUP BY bi.doc_id)
             |SELECT doc_id, n_bigrams,
             |  CAST(floor(nll_sum / n_bigrams * 10000 + 0.5) AS BIGINT) AS mean_nll_fp
             |FROM scored
             |ORDER BY mean_nll_fp DESC, doc_id
             |LIMIT 20""".stripMargin),
    ),

    // d22 — CORPUS-WIDE chunk dedup with reassembly (the C4 recipe,
    // adapted to word-stream docs: C4 drops every repeated three-
    // sentence span corpus-wide and keeps the first occurrence; here
    // the unit is the non-overlapping 10-word chunk). Every doc is
    // chunked, each chunk occurrence keeps iff it is the GLOBAL first
    // (min doc_id·1e6+idx over identical content — one window min
    // partitioned by chunk, a single corpus-scale shuffle, no self-
    // join re-scan), and each doc is reassembled from its surviving
    // chunks in order. Output per doc: chunk counts and the md5 of
    // the reassembled text — all discrete, hash-exact. This is the
    // boilerplate-removal pass a crawl pipeline runs BEFORE doc-level
    // dedup: it edits docs instead of dropping them.
    QueryDef(
      "d22_chunk_dedup",
      (s, d) => {
        chunkKeepFlags(Tables.documents(s, d))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
            md5(array_join(
              transform(
                array_sort(collect_list(when(col("keep"),
                  struct(col("idx"), col("chunk"))))),
                x => x.getField("chunk")),
              " ").cast("binary")).as("kept_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (
             |  SELECT doc_id, g['idx'] AS idx, g['chunk'] AS chunk FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(0, (len(arr) - 1) // 10 + 1),
             |        i -> {'idx': i,
             |              'chunk': array_to_string(arr[i*10+1 : i*10+10], ' ')})) AS g
             |    FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) b) t),
             |kept AS (
             |  SELECT doc_id, idx, chunk,
             |    {'d': doc_id, 'i': idx} =
             |      min({'d': doc_id, 'i': idx}) OVER (PARTITION BY chunk) AS keep
             |  FROM ch)
             |SELECT doc_id,
             |  count(*) AS n_chunks,
             |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  md5(coalesce(
             |    string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY idx), ''))
             |    AS kept_md5
             |FROM kept
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      headline = true,
    ),

    // d22_scale — chunk dedup PROVED at a million docs / 5M chunks:
    // executor-born corpus (s.range, no parquet) where chunk 0 of doc
    // i is the boilerplate "b<i%1000>"×10 (each shared by exactly
    // 1000 docs, so only doc i%1000 keeps it) and chunks 1–4 are
    // unique. The FULL text→split→chunk→window pipeline runs — not a
    // shortcut over pre-built chunk rows — and the largest window
    // partition is the 1000-occurrence boilerplate group, the healthy
    // shape (identical content at 100 TB means bounded partitions,
    // not skew). Fully hash-oracled: DuckDB regenerates the corpus
    // from range(1e6), replays first-occurrence semantics, and must
    // land on the same planted counts AND the doc_id·n_kept checksum.
    QueryDef(
      "d22_scale",
      (s, _) => {
        val words =
          Seq.fill(10)(concat(lit("b"), col("id") % 1000)) ++
            (1 to 4).flatMap(j =>
              concat(lit("u"), col("id"), lit("x"), lit(j)) +: Seq.fill(9)(lit("f")))
        val docs = s.range(1000000L).select(
          col("id").as("doc_id"), concat_ws(" ", words: _*).as("text"))
        chunkKeepFlags(docs)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nc"),
            sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("nk"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum("nc").as("n_chunks"),
            sum("nk").as("n_kept"),
            sum(when(col("nk") === 5L, 1L).otherwise(0L)).as("n_docs_keep5"),
            sum(col("doc_id") * col("nk")).as("checksum"))
      },
      Some("""WITH ids AS (SELECT unnest(range(1000000)) AS doc_id),
             |ch AS (
             |  SELECT doc_id, j.j AS idx,
             |    CASE WHEN j.j = 0
             |      THEN array_to_string(list_transform(range(0, 10),
             |             x -> 'b' || (doc_id % 1000)), ' ')
             |      ELSE 'u' || doc_id || 'x' || j.j || repeat(' f', 9)
             |    END AS chunk
             |  FROM ids CROSS JOIN (SELECT unnest(range(0, 5)) AS j) j),
             |kept AS (
             |  SELECT doc_id,
             |    {'d': doc_id, 'i': idx} =
             |      min({'d': doc_id, 'i': idx}) OVER (PARTITION BY chunk) AS keep
             |  FROM ch),
             |per AS (
             |  SELECT doc_id, count(*) AS nc,
             |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS nk
             |  FROM kept GROUP BY doc_id)
             |SELECT count(*) AS n_docs,
             |  CAST(sum(nc) AS BIGINT) AS n_chunks,
             |  CAST(sum(nk) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN nk = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_keep5,
             |  CAST(sum(doc_id * nk) AS BIGINT) AS checksum
             |FROM per""".stripMargin),
      headline = true,
    ),

    // d15 — heavy hitters via count-min sketch (operators.CountMin):
    // exact top-10 words with the sketch's ERROR CONTRACT asserted per
    // row — estimate ≥ exact (the one-sided guarantee) and estimate ≤
    // exact + ⌈e/width · N⌉ (the Cormode-Muthukrishnan bound, which
    // holds deterministically here because the hash seeds are fixed).
    // The sketch buffer is depth×width longs REGARDLESS of vocabulary
    // size — the fixed-memory path when the exact groupBy's shuffle
    // (O(distinct)) is the bottleneck. DuckDB recomputes the exact
    // spine and asserts both contract booleans TRUE — the same
    // error-contract oracle shape as a8_approx_distinct; merge-
    // commutativity stays in CountMinSpec.
    QueryDef(
      "d15_cms_heavy_hitters",
      (s, d) => {
        import graft.operators.CountMin
        val w = tokens(Tables.documents(s, d)).select(col("w"))
        val counters = w.agg(CountMin.cmsAgg(col("w"))).head().getSeq[Long](0)
        val bc = s.sparkContext.broadcast(CountMin.fromArray(counters))
        val est = udf((word: String) => bc.value.estimate(word))
        w.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("w")).limit(10)
          .withColumn("cms_est", est(col("w")))
          .crossJoin(w.agg(count(lit(1)).as("n_tokens")))
          .select(
            col("w"), col("exact_cnt"),
            (col("cms_est") >= col("exact_cnt")).as("est_ge_exact"),
            (col("cms_est") <= col("exact_cnt") +
              ceil(lit(math.E / 1024.0) * col("n_tokens")).cast("long")).as("est_within_eps"))
          .orderBy(col("exact_cnt").desc, col("w"))
      },
      Some("""WITH tok AS (
             |  SELECT w FROM (
             |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
             |  WHERE w <> '')
             |SELECT w, count(*) AS exact_cnt,
             |  TRUE AS est_ge_exact, TRUE AS est_within_eps
             |FROM tok GROUP BY w
             |ORDER BY exact_cnt DESC, w LIMIT 10""".stripMargin),
    ),

    // d11 — WEIGHTED sampling without replacement (Efraimidis-
    // Spirakis A-Res): key = ln(u)/w with u a deterministic md5-
    // derived uniform, take the top-100 keys — longer (higher-weight)
    // docs are proportionally likelier, yet the draw is reproducible
    // and engine-portable (u is exact integer arithmetic; the ln/÷
    // ranking evaluates identically on both engines' IEEE doubles).
    // One TakeOrderedAndProject, no shuffle of the corpus — the
    // quality-weighted subset selection step of a curation pipeline.
    QueryDef(
      "d16_corpus_mix",
      // data MIXING: the step before training that samples each source
      // corpus at its own weight (web 0.9 / code 0.5 / books 0.2 here,
      // sources simulated by doc_id % 3). Membership is a pure hash
      // decision — deterministic, seedable ('mix|' prefix), and
      // embarrassingly parallel: at 100 TB the mix is a map-only pass,
      // no shuffle until the per-source accounting aggregate. Output
      // is the per-source budget sheet (docs kept, chars kept).
      (s, d) => {
        Tables.documents(s, d)
          .select(
            expr("CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'code' ELSE 'books' END").as("source"),
            col("n_chars"), graft.operators.CorpusPipeline.mixKeep.as("kept"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_sampled"),
            sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("chars_sampled"))
          .orderBy("source")
      },
      Some(s"""WITH mixed AS (
              |  SELECT
              |    CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'code' ELSE 'books' END AS source,
              |    n_chars,
              |    (${MhDuckParse("md5('mix|' || CAST(doc_id AS VARCHAR))")} + 1) / 1152921504606846976.0
              |      <= CASE doc_id % 3 WHEN 0 THEN 0.9 WHEN 1 THEN 0.5 ELSE 0.2 END AS kept
              |  FROM documents)
              |SELECT source, count(*) AS n_docs,
              |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
              |  CAST(sum(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT) AS chars_sampled
              |FROM mixed GROUP BY source ORDER BY source""".stripMargin),
    ),

    QueryDef(
      "d17_token_budget",
      // budgeted curriculum selection: fill each source's token budget
      // (5000 here) with its LARGEST documents first — rank + running
      // total inside the source partition, cut at the budget. The
      // ordering keys are integers (n_tokens, doc_id), so the cut is
      // engine-exact. The per-source window input is BOUNDED by a
      // two-level top-K pre-filter: a doc past per-source rank K =
      // budget can never fit (the K docs ahead of it carry ≥ 1 token
      // each, so its running total already exceeds the budget), and
      // the rank-≤-K cut itself runs per (source, input-partition) —
      // distributed — so each source's final window sees ≤ K·P rows
      // no matter how large the source is.
      (s, d) => {
        val budget = 5000L
        val nt = tokens(Tables.documents(s, d))
          .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
          .withColumn("source",
            expr("CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'code' ELSE 'books' END"))
          .withColumn("pid", spark_partition_id())
        val wLocal = Window.partitionBy("source", "pid")
          .orderBy(col("n_tokens").desc, col("doc_id"))
        val pruned = nt
          .withColumn("lrk", row_number().over(wLocal))
          .filter(col("lrk") <= budget) // superset of the per-source top-K
          .drop("lrk", "pid")
        val w = Window.partitionBy("source")
          .orderBy(col("n_tokens").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pruned.withColumn("cum", sum("n_tokens").over(w))
          .filter(col("cum") <= budget)
          .select("source", "doc_id", "n_tokens", "cum")
          .orderBy("source", "cum")
      },
      Some("""WITH nt AS (
             |  SELECT doc_id, count(*) AS n_tokens
             |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) t
             |  WHERE w <> '' GROUP BY doc_id),
             |src AS (
             |  SELECT doc_id, n_tokens,
             |    CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'code' ELSE 'books' END AS source
             |  FROM nt),
             |c AS (
             |  SELECT source, doc_id, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM src)
             |SELECT source, doc_id, n_tokens, CAST(cum AS BIGINT) AS cum
             |FROM c WHERE cum <= 5000 ORDER BY source, cum""".stripMargin),
    ),

    QueryDef(
      "d11_weighted_sample",
      (s, d) => {
        // u in (0,1]: (H+1)/2^60 with H the first 15 md5 hex digits
        val u = (expr("CAST(conv(substring(md5(concat('samp|', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)") + 1
          ).cast("double") / lit(math.pow(2, 60))
        // the es_key ranking stays internal: ln() differs by 1 ulp
        // between engines, which is invisible to the ORDER (keys are
        // far apart) but not to a rendered double column
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"), (log(u) / col("n_chars")).as("es_key"))
          .orderBy(col("es_key").desc, col("doc_id"))
          .limit(100)
          .select("doc_id", "n_chars")
      },
      Some(s"""WITH keyed AS (
              |  SELECT doc_id, n_chars,
              |    ln((${MhDuckParse("md5('samp|' || CAST(doc_id AS VARCHAR))")} + 1) / 1152921504606846976.0)
              |      / n_chars AS es_key
              |  FROM documents)
              |SELECT doc_id, n_chars FROM keyed
              |ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin),
    ),

    // d10 — real BPE merge-table training (not the regex
    // approximation d1b uses for counting): the iterative
    // argmax-and-merge loop over a word-frequency table.
    // PLANTED-CONTRACT oracle — the planted vocabulary
    // ([[BpeFixture.vocab]]) makes all 11 merge rounds PROVABLY
    // unique, so DuckDB recomputes the full merge table from the
    // generation formula:
    //   · 8 disjoint letter-pair words ("ab".."op") with strictly
    //     decreasing powers-of-two frequencies 512..4 — each
    //     contributes exactly one candidate pair, no two counts tie,
    //     and a merged pair-word has no remaining pairs, so rounds
    //     1..8 are forced in frequency order;
    //   · one chain word "xyzw" at freq 2 whose pairs ALL tie at 2 —
    //     rounds 9..11 are then decided solely by the documented
    //     (count desc, left, right) tie-break: (x,y) → (xy,z) →
    //     (xyz,w). A trainer with a different (or nondeterministic)
    //     tie order fails the hash.
    // BpeTrainerSpec still pins training on real corpus text and the
    // driver/distributed path equivalence.
    QueryDef(
      "d10_bpe_merges",
      (s, _) => {
        import s.implicits._
        // lhs/rhs, not left/right: the driver gate re-selects columns
        // by bare name, and left/right are SQL keywords
        graft.operators.BpeTrainer.train(BpeFixture.vocab.toDF("word", "freq"), merges = 11)
          .map(r => (r.step, r.left, r.right, r.left + r.right, r.count))
          .toDF("step", "lhs", "rhs", "merged", "cnt")
      },
      Some("""SELECT CAST(step AS INTEGER) AS step,
             |  chr(CAST(97 + (step-1)*2 AS INTEGER)) AS lhs,
             |  chr(CAST(98 + (step-1)*2 AS INTEGER)) AS rhs,
             |  chr(CAST(97 + (step-1)*2 AS INTEGER))
             |    || chr(CAST(98 + (step-1)*2 AS INTEGER)) AS merged,
             |  CAST(pow(2, 10 - step) AS BIGINT) AS cnt
             |FROM (SELECT unnest(range(1, 9)) AS step)
             |UNION ALL SELECT 9, 'x', 'y', 'xy', 2
             |UNION ALL SELECT 10, 'xy', 'z', 'xyz', 2
             |UNION ALL SELECT 11, 'xyz', 'w', 'xyzw', 2
             |ORDER BY step""".stripMargin),
    ),

    // d23 — Unicode NFC normalization as a native codegen expression
    // (expressions.NfcNormalizeExpr): the canonical first step of text
    // cleaning — decomposed sequences (e + U+0301) and precomposed
    // forms (é) must hash/dedup/compare as ONE byte string, or every
    // downstream dedup signal silently splits on encoding. The fixture
    // plants both forms; the oracle replays it with DuckDB's own
    // nfc_normalize — two independent implementations of the Unicode
    // standard must agree on every byte (pinned via a summed 60-bit
    // md5 checksum over the normalized text). Pure map work: codegen,
    // no shuffle until the one summary aggregate.
    QueryDef(
      "d23_nfc_normalize",
      (s, _) => {
        val docs = s.range(10000L).select(
          col("id").as("doc_id"),
          concat(
            // decomposed (e + combining acute) vs precomposed (\u00e9)
            when(col("id") % 3 === 0, lit("cafe" + "\u0301"))
              .when(col("id") % 3 === 1, lit("caf" + "\u00e9"))
              .otherwise(lit("plain")),
            lit(" doc "), col("id")).as("text"))
        docs
          .withColumn("nt", graft.functions.GraftFunctions.nfcNormalize(col("text")))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("nt") =!= col("text"), 1L).otherwise(0L)).as("n_changed"),
            sum(expr(
              "CAST(conv(substring(md5(CAST(nt AS BINARY)), 1, 12), 16, 10) AS BIGINT)"))
              .as("checksum"),
            countDistinct(expr("substring(nt, 1, 4)")).as("n_prefixes"))
      },
      Some(s"""WITH ids AS (SELECT unnest(range(10000)) AS doc_id),
              |docs AS (
              |  SELECT doc_id,
              |    CASE doc_id % 3 WHEN 0 THEN 'cafe' || chr(769)
              |         WHEN 1 THEN 'caf' || chr(233)
              |         ELSE 'plain' END || ' doc ' || doc_id AS text
              |  FROM ids),
              |norm AS (SELECT doc_id, text, nfc_normalize(text) AS nt FROM docs)
              |SELECT count(*) AS n_docs,
              |  CAST(sum(CASE WHEN nt <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
              |  CAST(sum(${MhDuckParseN("md5(nt)", 12)}) AS BIGINT) AS checksum,
              |  CAST(count(DISTINCT substring(nt, 1, 4)) AS BIGINT) AS n_prefixes
              |FROM norm""".stripMargin),
    ),

    // d24 — compression-ratio quality gate (deflate size over raw
    // size, the Dolma/RedPajama signal): repetitive boilerplate
    // deflates far below the corpus norm, random noise sits near 1 —
    // both tails get dropped by curation. Pure codegen map work
    // (expressions.DeflateRatioExpr) + one summary aggregate.
    // PLANTED-CONTRACT oracle (DuckDB has no deflate): three planted
    // classes sit far from both thresholds — measured over all 10k
    // docs incl. the varying id suffix: repetitive ≤ 0.043 (threshold
    // 0.35), md5-hex noise ≥ 1.09 (threshold 0.9), natural ≈ 0.64 —
    // so the oracle recomputes the gate DECISIONS from the planted
    // class alone while Spark derives them through the real deflate
    // kernel. A mis-banding of any single doc breaks the counts.
    // DeflateRatioSpec still pins the signal's ordering properties
    // and codegen parity on real corpus text.
    QueryDef(
      "d24_compression_gate",
      (s, _) => {
        val boiler = "the quick brown fox jumps over the lazy dog " * 40
        val natural = "Curating a balanced training corpus means scoring every " +
          "document for quality, language, and length before it enters the mix. " +
          "Quality scoring keeps the corpus healthy: documents with strong " +
          "structure and varied vocabulary pass the gate, while documents that " +
          "repeat the same template are removed."
        val docs = s.range(10000L).select(
          col("id").as("doc_id"),
          concat(
            when(col("id") % 3 === 0, lit(boiler))
              .when(col("id") % 3 === 1, md5(concat(lit("noise "), col("id"))))
              .otherwise(lit(natural)),
            lit(" doc "), col("id")).as("text"))
        val r = graft.functions.GraftFunctions.deflateRatio(col("text"))
        docs
          .select(col("doc_id"), r.as("ratio"))
          .select(col("doc_id"),
            when(col("ratio") < 0.35, "too_repetitive")
              .when(col("ratio") > 0.9, "too_random")
              .otherwise("keep").as("band"))
          .groupBy("band").agg(count(lit(1)).as("n_docs"))
          .orderBy("band")
      },
      Some("""WITH ids AS (SELECT unnest(range(10000)) AS id)
             |SELECT CASE WHEN id % 3 = 0 THEN 'too_repetitive'
             |            WHEN id % 3 = 1 THEN 'too_random'
             |            ELSE 'keep' END AS band,
             |  count(*) AS n_docs
             |FROM ids GROUP BY band ORDER BY band""".stripMargin),
    ),
  )


  /** d19's BM25 chain (shared with ss19's fusion): query terms are the
    * deterministic frequency-rank picks (10/20/30); each (doc, term)
    * hit scores idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) with
    * k1 = 1.2, b = 0.75, idf = ln(1 + (N−df+0.5)/(df+0.5)); top `k`
    * docs by the summed score. Plan shape at scale: the 3-term list
    * and per-term df broadcast, so only the probed terms' postings
    * survive the scan; corpus stats (N, avgdl) are a one-row broadcast
    * crossjoin; the final top-k is TakeOrderedAndProject. Parity:
    * per-term scores are one deterministic IEEE-double expression
    * mirrored verbatim in [[Bm25Ctes]]; the per-doc sum goes through
    * DECIMAL(28,12) (order-independent, like dsum) and the output is
    * a 1e4 fixed-point BIGINT, absorbing libm last-bit differences. */
  private def bm25Top(s: SparkSession, d: String, k: Int): DataFrame = {
    val tok = tokens(Tables.documents(s, d))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val top = tok.groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(30)
    val w = Window.orderBy(col("freq").desc, col("w")) // ≤ 30 rows
    val terms = top
      .withColumn("rk", row_number().over(w))
      .filter(col("rk").isin(10, 20, 30))
      .select("w")
    val tf = tok.join(broadcast(terms), Seq("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("ts",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(sum(col("ts").cast("decimal(28,12)")).cast("double").as("score"))
      .select(col("doc_id"),
        expr("CAST(floor(score * 10000 + 0.5) AS BIGINT)").as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** the DuckDB twin of [[bm25Top]] up through the `scored` CTE. */
  // lazy: referenced by oracle-SQL interpolations inside `all`, which the
  // object initializer builds BEFORE this field would otherwise be assigned
  private lazy val Bm25Ctes: String =
    """tok AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE w <> ''),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
      |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |freqs AS (SELECT w, count(*) AS freq FROM tok GROUP BY w),
      |terms AS (
      |  SELECT w FROM (
      |    SELECT w, row_number() OVER (ORDER BY freq DESC, w) AS rk FROM freqs) r
      |  WHERE rk IN (10, 20, 30)),
      |tf AS (
      |  SELECT t.doc_id, t.w, count(*) AS tf
      |  FROM tok t JOIN terms x ON x.w = t.w GROUP BY t.doc_id, t.w),
      |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |scored AS (
      |  SELECT tf.doc_id,
      |    CAST(sum(CAST(
      |      ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
      |        * (tf.tf * 2.2)
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
      |      AS DECIMAL(28,12))) AS DOUBLE) AS score
      |  FROM tf
      |  JOIN df ON df.w = tf.w
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  CROSS JOIN stats s
      |  GROUP BY tf.doc_id)""".stripMargin

  /** per-doc content hash — the shared derivation behind exact-dup
    * detection in dd10 (delta vs corpus) and dd11 (cluster edges). */
  private[queries] def contentHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))

}
