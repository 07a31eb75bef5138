package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.ConnectedComponents
import graft.pipeline.Fixtures

/** Text-analysis + deduplication operators over the `documents` table —
  * the training-data-pipeline side of the engine (builder brief: exact
  * dedup, MinHash+LSH, SimHash, n-gram Jaccard, language-ID, quality
  * scoring, token counting, fingerprinting).
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

  /** LSH band-join skew guard: buckets above this row count get a
    * salted self-join (a 10k-doc bucket would otherwise pin 10k² pair
    * work on one task); below it, plain equi-join — no salt overhead
    * at healthy cardinalities. */
  private val BandSkewThreshold = 2000L
  private val BandSalts = 16

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
  private def tokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")

  /** doc → distinct 3-gram word shingles. element_at is 1-based, same
    * as DuckDB list indexing, so the oracle mirrors index-for-index. */
  private def shingles(docs: DataFrame): DataFrame =
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

  private val ShinglesSql =
    """arrs AS (SELECT doc_id, string_split(text,' ') AS arr FROM documents),
      |shpos AS (SELECT doc_id, arr, unnest(range(1, greatest(len(arr)-2,0)+1)) AS i FROM arrs),
      |sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS sh FROM shpos)""".stripMargin

  /** 32-char bit-string SimHash over a doc's distinct words: bit p is
    * the sign of Σ_words (±1), where the ±1 comes from the parity of
    * hex digit p of md5(word). Engine-portable: md5 + instr + substring
    * behave identically in Spark and DuckDB. */
  private def simhashDf(docs: DataFrame): DataFrame = {
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

  private val SimhashSql =
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
  private val hamming32: String = graft.core.Hamming.sql32

  /** 60-bit MinHash slot: the first 15 hex digits of md5("<seed>|sh")
    * as a BIGINT. Numeric order == hex-string lexicographic order, so
    * min() picks the same element in both engines — but a LONG min
    * hash-aggregates (map-side combine), where a binary/string min
    * falls back to SortAggregate. DuckDB side parses the same 15
    * digits positionally.
    *
    * One md5 per shingle: the 8 MinHash permutations are affine
    * universal hashes h_j(x) = (a_j·(H mod M) + b_j) mod M over the
    * single 60-bit base digest H — the standard single-base-hash
    * MinHash construction; md5 (the expensive part) runs once per
    * row instead of 8×. All arithmetic stays below 2^62 (a_j < 2^31,
    * H mod M < 2^31), portable BIGINT in both engines. */
  private val MhM = 2147483647L // 2^31 − 1 (prime)
  private val MhA = Array(1299709L, 15485863L, 32452843L, 49979687L, 67867967L, 86028121L, 104395301L, 122949823L)
  private val MhB = Array(15487469L, 32452867L, 49979693L, 67867979L, 86028157L, 104395303L, 122949829L, 141650939L)

  /** base 60-bit digest column (one md5 per shingle), Spark side. */
  private val mhBaseSpark = "CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT)"

  /** same base digest in DuckDB (positional hex parse). */
  private lazy val mhBaseDuck = MhDuckParse("md5(sh)")

  private def mhSlot(j: Int, base: String): String =
    s"(${mhConstA(j)} * (($base) % $MhM) + ${mhConstB(j)}) % $MhM"

  /** DuckDB positional parse of the first 15 hex digits of an
    * arbitrary md5-hex SQL expression → BIGINT (the generic form of
    * [[mhBaseDuck]]). */
  private def MhDuckParse(md5Expr: String): String = MhDuckParseN(md5Expr, 15)

  /** Same hex-digit fold over the first `n` md5 digits — narrower
    * widths keep ANSI bigint sums over many rows overflow-free
    * (48-bit × 10k rows stays under 2^63). */
  private def MhDuckParseN(md5Expr: String, n: Int): String =
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
  private def packedStarts(toks: DataFrame, chunk: Long): DataFrame = {
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
  private def packBins(placed: DataFrame, cap: Long): DataFrame =
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

    // dd7 — substring-level dedup (the Lee et al. "deduplicating
    // training data" shape): 10-token grams exploded with positions,
    // grams repeated ANYWHERE in the corpus found by one global
    // groupBy (map-side combine), then each doc scored by its fraction
    // of positions covered by a repeated gram. No pairwise work at
    // all — cost is one shuffle of the gram table; at 100 TB the gram
    // hash (not the text) crosses the wire.
    QueryDef(
      "dd7_substring_dedup",
      (s, d) => {
        val n = 10
        val grams = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("arr"))
          .select(col("doc_id"), col("arr"),
            explode(when(size(col("arr")) >= n, sequence(lit(1), size(col("arr")) - (n - 1)))
              .otherwise(array().cast("array<int>"))).as("i"))
          .select(col("doc_id"), col("i"),
            // hash the joined gram: only the 64-bit hash shuffles
            xxhash64(concat_ws(" ", (0 until n).map(k => element_at(col("arr"), col("i") + k)): _*)).as("g"))
        val repeated = grams.groupBy("g")
          .agg(count(lit(1)).as("cnt"), countDistinct("doc_id").as("ndocs"))
          .filter(col("cnt") > 1)
          .select(col("g"))
        grams
          .join(repeated, Seq("g"), "left_semi")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_dup_grams"))
          .join(grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams")), Seq("doc_id"), "right_outer")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
            (coalesce(col("n_dup_grams"), lit(0L)).cast("double") / col("n_grams").cast("double")).as("dup_fraction"))
          .filter(col("dup_fraction") >= 0.05)
          .orderBy("doc_id")
      },
      Some("""WITH arrs AS (SELECT doc_id, string_split(text,' ') AS arr FROM documents),
             |pos AS (SELECT doc_id, arr, unnest(range(1, greatest(len(arr)-9,0)+1)) AS i FROM arrs),
             |grams AS (
             |  SELECT doc_id, i,
             |    hash(arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3] || ' ' || arr[i+4] || ' ' ||
             |         arr[i+5] || ' ' || arr[i+6] || ' ' || arr[i+7] || ' ' || arr[i+8] || ' ' || arr[i+9]) AS g
             |  FROM pos),
             |rep AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
             |dup AS (SELECT doc_id, count(*) AS n_dup_grams FROM grams SEMI JOIN rep USING (g) GROUP BY doc_id),
             |tot AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id)
             |SELECT t.doc_id, t.n_grams, COALESCE(d.n_dup_grams, 0) AS n_dup_grams,
             |  CAST(COALESCE(d.n_dup_grams, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE) AS dup_fraction
             |FROM tot t LEFT JOIN dup d ON t.doc_id = d.doc_id
             |WHERE CAST(COALESCE(d.n_dup_grams, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE) >= 0.05
             |ORDER BY t.doc_id""".stripMargin),
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

    // st7 — the d18 pipeline as a STREAM: the same composition (exact
    // dedup → quality gate → corpus mix → 512-token packing) run
    // through graft.streaming.StreamingPipeline — stateful content-
    // hash dedup (flatMapGroupsWithState), stateless gate/mix, and an
    // incrementally maintained packing manifest whose per-batch
    // placement reuses the chunked prefix-sum discipline (O(1) driver
    // state, one distributed pass per micro-batch). The corpus is
    // replayed in id-ordered micro-batches (3 at fixture volume — the
    // backfill-replay order; the driver-side collect here is fixture
    // wiring, a real deployment reads the ingest log); the emitted row
    // carries the
    // BATCH pipeline's manifest summary (everything the oracle
    // recomputes) plus the stream≡batch verdict across all five
    // accumulators. This is the backfill→live claim for the document
    // pipeline, driver-gated like the zk MV family.
    QueryDef(
      "st7_stream_pipeline",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        // batch twin — exactly the d18 stages
        val keep = docs
          .groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val gated = tokens(docs.join(keep, Seq("doc_id"), "left_semi"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
          .filter(col("n_tokens") >= 30)
        val mixed = gated.filter(graft.operators.CorpusPipeline.mixKeep).persist()
        val bins = packBins(packedStarts(mixed, chunk = 64L), cap = 512L)
        val b = bins.agg(
          coalesce(sum("n_tokens"), lit(0L)).as("total_tokens"),
          count(lit(1)).as("n_bins"),
          coalesce(sum(when(col("n_tokens") === 512L, 1L).otherwise(0L)), lit(0L)).as("n_full_bins"),
          coalesce(sum(col("bin") * col("n_tokens")), lit(0L)).as("layout_checksum"))
          .collect()(0)
        val nKept = mixed.count()
        mixed.unpersist()

        // the stream: same corpus, 3 id-ordered micro-batches. The
        // stateful dedup allocates one state-store instance per
        // shuffle partition per micro-batch — at fixture volume 8
        // partitions carry the state with a quarter of the store
        // commit overhead (a real deployment sizes this to the
        // executor count, same as any stateful stream)
        import graft.streaming.StreamingPipeline
        implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
        val prevParts = s.conf.getOption("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val es = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[StreamingPipeline.Doc]
        val mv = new StreamingPipeline.PackingMv(cap = 512L)
        val q = StreamingPipeline.run(es.toDS(), mv)
        try {
          val all = docs.select("doc_id", "text").orderBy("doc_id").collect()
            .map(r => StreamingPipeline.Doc(r.getLong(0), r.getString(1)))
          all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
            es.addData(chunk.toSeq); q.processAllAvailable()
          }
        } finally {
          q.stop()
          prevParts match {
            case Some(v) => s.conf.set("spark.sql.shuffle.partitions", v)
            case None => s.conf.unset("spark.sql.shuffle.partitions")
          }
        }
        val st = mv.state
        val matches = st.nDocs == nKept &&
          st.totalTokens == b.getLong(0) &&
          st.nBins(512L) == b.getLong(1) &&
          st.nFullBins(512L) == b.getLong(2) &&
          st.checksum == b.getLong(3)
        Seq((nKept, b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3), matches))
          .toDF("n_docs_kept", "total_tokens", "n_bins", "n_full_bins",
            "layout_checksum", "stream_matches_batch")
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
              |  FROM placed),
              |bins AS (
              |  SELECT bin, count(*) AS n_docs,
              |    CAST(SUM(least(start + n_tokens, (bin + 1) * 512) - greatest(start, bin * 512)) AS BIGINT) AS n_tokens
              |  FROM spans GROUP BY bin)
              |SELECT (SELECT count(*) FROM mixed) AS n_docs_kept,
              |  (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM bins) AS total_tokens,
              |  (SELECT count(*) FROM bins) AS n_bins,
              |  (SELECT CAST(COALESCE(SUM(CASE WHEN n_tokens = 512 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM bins) AS n_full_bins,
              |  (SELECT CAST(COALESCE(SUM(bin * n_tokens), 0) AS BIGINT) FROM bins) AS layout_checksum,
              |  TRUE AS stream_matches_batch""".stripMargin),
      headline = true,
      streamingDriver = true,
    ),

    // st8 — streaming NEAR-dup ingest gate (the streaming cell of the
    // dedup matrix, graft.streaming.StreamingNearDup): the committed
    // corpus (doc_id % 10 ≠ 0) bootstraps bucket-partitioned
    // signature/hash stores, then the held-out delta streams in 3
    // arrival-ordered micro-batches; each batch is gated by
    // directory-PRUNED store probes (pigeonhole block equi-join +
    // hamming ≤ 3 for near, content hash for exact) plus batch-local
    // earlier-arrival comparison, and its signatures append into the
    // same layout — the write-time routing key is the read-time
    // index, so a batch of B docs reads ≤ min(4B, NBuckets) store
    // dirs, never the whole store. Verdicts depend only on the arrival
    // order `seq`, NOT on micro-batch boundaries
    // (StreamingNearDupSpec pins 1-batch ≡ 3-batch ≡ foreachBatch
    // stream), which is why the oracle can replay the whole run as
    // one global similar-to-any-earlier SQL with no batch structure.
    QueryDef(
      "st8_stream_neardup",
      (s, d) => {
        import graft.streaming.StreamingNearDup
        val docs = Tables.documents(s, d)
        // seq packs (batch, doc_id) into one long: corpus far below
        // every delta, batches 1e7 apart — needs doc_id < 1e7 (same
        // loud-failure discipline as dd13's id-offset namespaces)
        val maxId = Option(docs.agg(max("doc_id")).collect()(0)
          .getAs[java.lang.Long](0)).map(_.longValue).getOrElse(-1L)
        require(maxId < 10000000L,
          s"st8's arrival-order seq encoding needs max doc_id < 1e7, got $maxId")
        val seqCol = when(col("doc_id") % 10 =!= 0, col("doc_id") - 1000000000L)
          .otherwise(
            (when(col("doc_id") % 30 === 0, 0L)
              .when(col("doc_id") % 30 === 10, 1L)
              .otherwise(2L)) * 10000000L + col("doc_id"))
        // the HASH derivation is the spine (every doc has a content
        // hash); the signature joins LEFT because a token-less doc has
        // no simhash row — it must still get a verdict (exact-dup
        // semantics only), exactly as the oracle's sig CTE omits it
        // while its hash CTE covers it
        val base = contentHashes(docs)
          .join(simhashDf(docs), Seq("doc_id"), "left")
          .withColumn("seq", seqCol).persist()
        val root = java.nio.file.Files.createTempDirectory("stream_neardup").toString
        // micro-batch frames are tiny — 8 shuffle partitions carry
        // them with a quarter of the per-stage overhead (the st7
        // discipline; a real deployment sizes this to the executors)
        // getOption/unset save-restore (the skew_aqe_join discipline):
        // a defaulted conf must come back DEFAULTED, not pinned to its
        // default's value as an explicit session setting
        val touched = Seq("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")
        val saved = touched.map(k => k -> s.conf.getOption(k))
        s.conf.set("spark.sql.shuffle.partitions", "8")
        // ~18 tiny stages across the 3 gates: AQE's per-stage
        // materialize-then-replan barrier costs more than it saves on
        // micro-batch-sized shuffles — run the gates non-adaptive
        s.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          StreamingNearDup.bootstrap(base.filter(col("doc_id") % 10 =!= 0), root)
          (0 until 3).map { b =>
            StreamingNearDup.processBatch(s,
              base.filter(col("doc_id") % 30 === b * 10), root)
          }.reduce(_ unionByName _).orderBy("doc_id")
        } finally {
          saved.foreach {
            case (k, Some(v)) => s.conf.set(k, v)
            case (k, None) => s.conf.unset(k)
          }
          base.unpersist()
          graft.core.Fs.deleteRecursively(new java.io.File(root))
        }
      },
      Some(s"""WITH $SimhashSql,
              |hx AS (SELECT doc_id, md5(text) AS h FROM documents),
              |ordx AS (SELECT doc_id,
              |    CASE WHEN doc_id % 10 <> 0 THEN doc_id - 1000000000
              |         ELSE (CASE doc_id % 30 WHEN 0 THEN 0 WHEN 10 THEN 1 ELSE 2 END) * 10000000 + doc_id
              |    END AS seq
              |  FROM documents),
              |db AS (SELECT g.doc_id, o.seq, g.simhash, p, substring(g.simhash, p*8+1, 8) AS blk
              |       FROM sig g JOIN ordx o ON o.doc_id = g.doc_id
              |       CROSS JOIN (SELECT unnest(range(0,4)) AS p) ps),
              |cand AS (SELECT DISTINCT a.doc_id, b.doc_id AS cid, a.simhash AS sig_a, b.simhash AS sig_b
              |         FROM db a JOIN db b ON a.p = b.p AND a.blk = b.blk AND b.seq < a.seq
              |         WHERE a.doc_id % 10 = 0),
              |nr AS (SELECT doc_id, min(cid) AS nm FROM cand WHERE $hamming32 <= 3 GROUP BY doc_id),
              |ho AS (SELECT h.doc_id, o.seq, h.h FROM hx h JOIN ordx o ON o.doc_id = h.doc_id),
              |ex AS (SELECT a.doc_id, min(b.doc_id) AS em FROM ho a JOIN ho b ON a.h = b.h AND b.seq < a.seq
              |       WHERE a.doc_id % 10 = 0 GROUP BY a.doc_id)
              |SELECT d.doc_id,
              |  CASE WHEN e.em IS NOT NULL THEN 'exact_dup'
              |       WHEN n.nm IS NOT NULL THEN 'near_dup' ELSE 'keep' END AS verdict,
              |  COALESCE(e.em, n.nm, -1) AS match_id
              |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
              |LEFT JOIN ex e ON e.doc_id = d.doc_id
              |LEFT JOIN nr n ON n.doc_id = d.doc_id
              |ORDER BY d.doc_id""".stripMargin),
      streamingDriver = true,
    ),

    // ------------------------------------------------------------------
    // dd1 — exact dedup: hash-groupBy on the content hash, keep the
    // smallest doc_id per group. Map-side partial agg means only one
    // row per distinct content crosses the shuffle.
    QueryDef(
      "dd1_dedup_exact",
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin),
    ),

    // dd2 — MinHash + LSH near-dup detection, the full pipeline:
    // shingle → 8-permutation MinHash (one md5 base digest per
    // shingle, affine universal hashes per slot) → 4 bands × 2 rows →
    // candidate pairs from band-signature equi-join → exact n-gram
    // Jaccard verification ≥ 0.5. Candidates come only from band
    // buckets (never O(n²)); at 100 TB the band join is the one
    // shuffle and Jaccard runs per candidate pair.
    QueryDef(
      "dd2_minhash_lsh",
      (s, d) => minhashPairs(s, d).orderBy("doc_a", "doc_b"),
      Some(s"""WITH $ShinglesSql,
              |shb AS (SELECT doc_id, $mhBaseDuck AS hb FROM sh),
              |mh AS (
              |  SELECT doc_id,
              |    ${(0 until 8).map(j => s"min(${mhSlot(j, "hb")}) AS mh$j").mkString(", ")},
              |    count(*) AS n
              |  FROM shb GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, b.band,
              |    CAST(CASE b.band WHEN 0 THEN least(mh0,mh1) WHEN 1 THEN least(mh2,mh3)
              |         WHEN 2 THEN least(mh4,mh5) ELSE least(mh6,mh7) END AS VARCHAR)
              |    || '#' ||
              |    CAST(CASE b.band WHEN 0 THEN greatest(mh0,mh1) WHEN 1 THEN greatest(mh2,mh3)
              |         WHEN 2 THEN greatest(mh4,mh5) ELSE greatest(mh6,mh7) END AS VARCHAR) AS sig
              |  FROM mh CROSS JOIN (SELECT unnest(range(0,4)) AS band) b),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
              |counts AS (SELECT doc_id, n FROM mh),
              |inter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS inter
              |  FROM cand c
              |  JOIN sh sa ON sa.doc_id = c.doc_a
              |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
              |  GROUP BY c.doc_a, c.doc_b)
              |SELECT i.doc_a, i.doc_b,
              |  CAST(i.inter AS DOUBLE) / CAST(ca.n + cb.n - i.inter AS DOUBLE) AS jaccard
              |FROM inter i
              |JOIN counts ca ON ca.doc_id = i.doc_a
              |JOIN counts cb ON cb.doc_id = i.doc_b
              |WHERE CAST(i.inter AS DOUBLE) / CAST(ca.n + cb.n - i.inter AS DOUBLE) >= 0.5
              |ORDER BY i.doc_a, i.doc_b""".stripMargin),
      headline = true,
    ),

    // dd6 — edit-distance near-dup: levenshtein over a 60-char prefix
    // with length-bucket blocking (the classic length-filter for edit
    // distance — only docs of similar size can be near in edit space,
    // so the join key is the length bucket, never all pairs).
    QueryDef(
      "dd6_levenshtein_neardup",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            substring(col("text"), 1, 20).as("prefix"),
            (col("n_chars") / 10).cast("long").as("lb"))
        val a = docs.select(col("doc_id").as("doc_a"), col("prefix").as("pa"), col("lb"))
        val b = docs.select(col("doc_id").as("doc_b"), col("prefix").as("pb"), col("lb"))
        a.join(b, Seq("lb"))
          .filter(col("doc_a") < col("doc_b"))
          .withColumn("dist", levenshtein(col("pa"), col("pb")))
          .filter(col("dist") <= 3)
          .select("doc_a", "doc_b", "dist")
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH p AS (SELECT doc_id, substring(text, 1, 20) AS prefix, n_chars // 10 AS lb FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  levenshtein(a.prefix, b.prefix) AS dist
             |FROM p a JOIN p b ON a.lb = b.lb AND a.doc_id < b.doc_id
             |WHERE levenshtein(a.prefix, b.prefix) <= 3
             |ORDER BY doc_a, doc_b""".stripMargin),
    ),

    // dd3 — SimHash fingerprints (32-bit bit-string per doc).
    QueryDef(
      "dd3_simhash",
      (s, d) => simhashDf(Tables.documents(s, d)).orderBy("doc_id"),
      Some(s"""WITH $SimhashSql
              |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin),
    ),

    // dd3b — term-frequency-weighted SimHash (the classical form):
    // each word contributes ±count instead of ±1, so repeated terms
    // dominate the signature. Same portable md5-parity construction.
    QueryDef(
      "dd3b_simhash_weighted",
      (s, d) => {
        val sums = (1 to 32).map { p =>
          sum(expr(s"CASE WHEN (instr('0123456789abcdef', substring(h, $p, 1)) - 1) % 2 = 1 THEN cnt ELSE -cnt END"))
            .as(s"s$p")
        }
        tokens(Tables.documents(s, d))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
          .withColumn("h", md5(col("w").cast("binary")))
          .groupBy("doc_id")
          .agg(sums.head, sums.tail: _*)
          .select(
            col("doc_id"),
            concat((1 to 32).map(p => when(col(s"s$p") >= 0, "1").otherwise("0")): _*).as("simhash_w"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, w, count(*) AS cnt FROM (
             |    SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents) t
             |  WHERE w <> '' GROUP BY doc_id, w),
             |bits AS (
             |  SELECT doc_id, p,
             |    CASE WHEN sum(CASE WHEN (instr('0123456789abcdef', substring(md5(w), p, 1)) - 1) % 2 = 1 THEN cnt ELSE -cnt END) >= 0
             |         THEN '1' ELSE '0' END AS bit
             |  FROM tok CROSS JOIN (SELECT unnest(range(1,33)) AS p) ps
             |  GROUP BY doc_id, p),
             |sig AS (SELECT doc_id, string_agg(bit, '' ORDER BY p) AS simhash_w FROM bits GROUP BY doc_id)
             |SELECT doc_id, simhash_w FROM sig ORDER BY doc_id""".stripMargin),
    ),

    // dd4 — SimHash near-dup pairs: hamming ≤ 3 over the 32-bit
    // signatures. Candidate blocking by the 4 8-bit blocks — by
    // pigeonhole, any pair within distance 3 shares at least one
    // block, so the union of 4 equi-joins has perfect recall with no
    // O(n²) scan. Hamming itself is a generated 32-term expression —
    // no per-bit join.
    QueryDef(
      "dd4_simhash_neardup",
      (s, d) => simhashPairs(s, d).orderBy("doc_a", "doc_b"),
      Some(s"""WITH $SimhashSql,
              |pairs AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    a.simhash AS sig_a, b.simhash AS sig_b
              |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
              |    substring(a.simhash,1,8)  = substring(b.simhash,1,8)  OR
              |    substring(a.simhash,9,8)  = substring(b.simhash,9,8)  OR
              |    substring(a.simhash,17,8) = substring(b.simhash,17,8) OR
              |    substring(a.simhash,25,8) = substring(b.simhash,25,8)))
              |SELECT doc_a, doc_b, $hamming32 AS hamming
              |FROM pairs
              |WHERE $hamming32 <= 3
              |ORDER BY doc_a, doc_b""".stripMargin),
    ),

    // dd8 — dedup CLUSTERS: the transitive closure of the dd4 near-dup
    // pairs (a≈b, b≈c ⇒ one cluster), every doc labeled with its
    // component (= min doc_id in the cluster), singletons included.
    // Spark side: alternating large-star/small-star contraction
    // (operators/ConnectedComponents) — two shuffles per round,
    // O(log) rounds, no driver-side edge state. Oracle side: DuckDB
    // recursive CTE computing min-label reachability.
    QueryDef(
      "dd8_dedup_clusters",
      (s, d) => {
        val pairs = simhashPairs(s, d).select("doc_a", "doc_b")
        val docs  = Tables.documents(s, d).select("doc_id")
        ConnectedComponents
          .assign(s, pairs, docs)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $SimhashSql,
              |pairs AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    a.simhash AS sig_a, b.simhash AS sig_b
              |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
              |    substring(a.simhash,1,8)  = substring(b.simhash,1,8)  OR
              |    substring(a.simhash,9,8)  = substring(b.simhash,9,8)  OR
              |    substring(a.simhash,17,8) = substring(b.simhash,17,8) OR
              |    substring(a.simhash,25,8) = substring(b.simhash,25,8))),
              |npairs AS (SELECT doc_a, doc_b FROM pairs WHERE $hamming32 <= 3),
              |edges AS (SELECT doc_a AS s, doc_b AS t FROM npairs
              |          UNION SELECT doc_b, doc_a FROM npairs),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.t, r.r FROM reach r JOIN edges e ON e.s = r.id)
              |SELECT id AS doc_id, min(r) AS component
              |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin),
    ),

    // dd9 — cluster summary + canonical-doc selection: per cluster,
    // keep the longest doc (tiebreak: lowest doc_id) — the "which copy
    // survives dedup" decision a pretraining pipeline actually ships.
    QueryDef(
      "dd9_cluster_canon",
      (s, d) => {
        val pairs = simhashPairs(s, d).select("doc_a", "doc_b")
        val docs  = Tables.documents(s, d)
        val cc = ConnectedComponents
          .assign(s, pairs, docs.select("doc_id"))
          .withColumnRenamed("id", "doc_id")
        val labeled = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
        val w = Window.partitionBy("component").orderBy(col("n_chars").desc, col("doc_id").asc)
        val sel = labeled
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("component"), col("doc_id").as("canon_doc"), col("n_chars").as("canon_chars"))
        labeled
          .groupBy("component").agg(count(lit(1)).as("n_docs"))
          .join(sel, "component")
          .select("component", "n_docs", "canon_doc", "canon_chars")
          .orderBy("component")
      },
      Some(s"""WITH RECURSIVE $SimhashSql,
              |pairs AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    a.simhash AS sig_a, b.simhash AS sig_b
              |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
              |    substring(a.simhash,1,8)  = substring(b.simhash,1,8)  OR
              |    substring(a.simhash,9,8)  = substring(b.simhash,9,8)  OR
              |    substring(a.simhash,17,8) = substring(b.simhash,17,8) OR
              |    substring(a.simhash,25,8) = substring(b.simhash,25,8))),
              |npairs AS (SELECT doc_a, doc_b FROM pairs WHERE $hamming32 <= 3),
              |edges AS (SELECT doc_a AS s, doc_b AS t FROM npairs
              |          UNION SELECT doc_b, doc_a FROM npairs),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.t, r.r FROM reach r JOIN edges e ON e.s = r.id),
              |cc AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
              |labeled AS (
              |  SELECT c.id AS doc_id, c.component, d.n_chars
              |  FROM cc c JOIN documents d ON d.doc_id = c.id),
              |sel AS (
              |  SELECT component, doc_id AS canon_doc, n_chars AS canon_chars,
              |    row_number() OVER (PARTITION BY component ORDER BY n_chars DESC, doc_id ASC) AS rn
              |  FROM labeled),
              |agg AS (SELECT component, count(*) AS n_docs FROM labeled GROUP BY component)
              |SELECT a.component, a.n_docs, s.canon_doc, s.canon_chars
              |FROM agg a JOIN sel s ON s.component = a.component AND s.rn = 1
              |ORDER BY a.component""".stripMargin),
    ),

    // dd14 — cluster-aware train/test split: near-dup CLUSTERS are the
    // split unit, not documents. A doc-level hash split (d5) lets one
    // copy of a duplicated page land in train while its twin lands in
    // test — the classic eval-contamination leak; pipelines split by
    // dedup cluster for exactly this reason. The component id (min
    // doc_id of the dd8 cluster) feeds the SAME md5 80/10/10 rule d5
    // applies to doc ids, so every cluster member shares a split by
    // construction — and the verdict re-proves it the hard way:
    // `cross_split_pairs` counts near-dup PAIRS straddling a split
    // boundary, which must be exactly 0 (a doc-level split fails this
    // immediately on the planted twins). Cost beyond dd8's contraction
    // is one map-side md5 + one groupBy — nothing pairwise.
    QueryDef(
      "dd14_cluster_split",
      (s, d) => {
        val pairs = simhashPairs(s, d).select("doc_a", "doc_b")
        val docs  = Tables.documents(s, d)
        val cc = ConnectedComponents
          .assign(s, pairs, docs.select("doc_id"))
          .withColumnRenamed("id", "doc_id")
        val labeled = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
          .withColumn("b",
            expr("(instr('0123456789abcdef', substring(md5(CAST(component AS STRING)), 1, 1)) - 1) * 16 + " +
              "(instr('0123456789abcdef', substring(md5(CAST(component AS STRING)), 2, 1)) - 1)") % 100)
          .withColumn("split",
            when(col("b") < 80, "train").when(col("b") < 90, "valid").otherwise("test"))
        val sp = labeled.select("doc_id", "split")
        val leaks = pairs
          .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
          .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
          .agg(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("cross_split_pairs"))
        labeled.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("component").as("n_clusters"),
            sum("n_chars").as("total_chars"))
          .crossJoin(broadcast(leaks))
          .select(col("split"), col("n_docs"), col("n_clusters"),
            col("total_chars"), coalesce(col("cross_split_pairs"), lit(0L)).as("cross_split_pairs"))
          .orderBy("split")
      },
      Some(s"""WITH RECURSIVE $SimhashSql,
              |pairs AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    a.simhash AS sig_a, b.simhash AS sig_b
              |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
              |    substring(a.simhash,1,8)  = substring(b.simhash,1,8)  OR
              |    substring(a.simhash,9,8)  = substring(b.simhash,9,8)  OR
              |    substring(a.simhash,17,8) = substring(b.simhash,17,8) OR
              |    substring(a.simhash,25,8) = substring(b.simhash,25,8))),
              |npairs AS (SELECT doc_a, doc_b FROM pairs WHERE $hamming32 <= 3),
              |edges AS (SELECT doc_a AS s, doc_b AS t FROM npairs
              |          UNION SELECT doc_b, doc_a FROM npairs),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.t, r.r FROM reach r JOIN edges e ON e.s = r.id),
              |cc AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
              |lab AS (
              |  SELECT c.doc_id, c.component, d.n_chars,
              |    CASE WHEN c.b < 80 THEN 'train' WHEN c.b < 90 THEN 'valid' ELSE 'test' END AS split
              |  FROM (SELECT doc_id, component,
              |      ((instr('0123456789abcdef', substring(md5(CAST(component AS VARCHAR)), 1, 1)) - 1) * 16 +
              |       (instr('0123456789abcdef', substring(md5(CAST(component AS VARCHAR)), 2, 1)) - 1)) % 100 AS b
              |    FROM cc) c JOIN documents d ON d.doc_id = c.doc_id)
              |SELECT split, count(*) AS n_docs, count(DISTINCT component) AS n_clusters,
              |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
              |  (SELECT count(*) FROM npairs p
              |     JOIN lab la ON la.doc_id = p.doc_a
              |     JOIN lab lb ON lb.doc_id = p.doc_b
              |   WHERE la.split <> lb.split) AS cross_split_pairs
              |FROM lab GROUP BY split ORDER BY split""".stripMargin),
    ),
    // dd10 — INCREMENTAL dedup: a delta batch (doc_id % 10 == 0)
    // arrives against an existing corpus (the rest). Each delta doc is
    // verdicted exact_dup (md5 content match in corpus), near_dup
    // (simhash hamming ≤ 3 vs corpus), or keep — without re-clustering
    // the corpus. The joins are delta-driven: content-hash equi-join
    // plus the 4-block simhash equi-join, so ingest cost scales with
    // the delta (corpus side is the probed build), the production
    // shape for continuous corpus growth.
    QueryDef(
      "dd10_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val isDelta = col("doc_id") % 10 === 0
        val hx = contentHashes(docs)
        val exact = hx.filter(isDelta).join(
            hx.filter(!isDelta).select(col("doc_id").as("cid"), col("h")), Seq("h"))
          .groupBy("doc_id").agg(min("cid").as("em"))

        // integer signature once per doc: the pair filter is one
        // bit_count(xor) instead of 32 substring compares per
        // candidate (the simhashPairs discipline)
        val sig = simhashDf(docs)
          .withColumn("sig_int", graft.core.Hamming.sigIntCol(col("simhash")))
          .persist()
        val blk = sig.select(col("doc_id"), col("simhash"), col("sig_int"),
            explode(sequence(lit(0), lit(graft.core.Hamming.Blocks - 1))).as("k"))
          .withColumn("blk", expr(graft.core.Hamming.blkSql("simhash", "k")))
        val near = blk.filter(isDelta)
          .select(col("doc_id"), col("sig_int").as("ia"), col("k"), col("blk"))
          .join(blk.filter(!isDelta)
            .select(col("doc_id").as("cid"), col("sig_int").as("ib"), col("k"), col("blk")),
            Seq("k", "blk"))
          .select("doc_id", "cid", "ia", "ib").distinct()
          .filter(expr("bit_count(ia ^ ib)") <= 3)
          .groupBy("doc_id").agg(min("cid").as("nm"))

        docs.filter(isDelta).select("doc_id")
          .join(exact, Seq("doc_id"), "left")
          .join(near, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            when(col("em").isNotNull, "exact_dup")
              .when(col("nm").isNotNull, "near_dup")
              .otherwise("keep").as("verdict"),
            coalesce(col("em"), col("nm"), lit(-1L)).as("match_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $SimhashSql,
              |hx AS (SELECT doc_id, md5(text) AS h FROM documents),
              |ex AS (
              |  SELECT dh.doc_id, min(ch.doc_id) AS em
              |  FROM hx dh JOIN hx ch ON dh.h = ch.h AND ch.doc_id % 10 <> 0
              |  WHERE dh.doc_id % 10 = 0 GROUP BY dh.doc_id),
              |db AS (
              |  SELECT doc_id, simhash, p, substring(simhash, p*8+1, 8) AS blk
              |  FROM sig CROSS JOIN (SELECT unnest(range(0,4)) AS p) ps),
              |cand AS (
              |  SELECT DISTINCT a.doc_id, b.doc_id AS cid, a.simhash AS sig_a, b.simhash AS sig_b
              |  FROM db a JOIN db b ON a.p = b.p AND a.blk = b.blk
              |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
              |nr AS (SELECT doc_id, min(cid) AS nm FROM cand WHERE $hamming32 <= 3 GROUP BY doc_id)
              |SELECT d.doc_id,
              |  CASE WHEN e.em IS NOT NULL THEN 'exact_dup'
              |       WHEN n.nm IS NOT NULL THEN 'near_dup'
              |       ELSE 'keep' END AS verdict,
              |  COALESCE(e.em, n.nm, -1) AS match_id
              |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
              |LEFT JOIN ex e ON e.doc_id = d.doc_id
              |LEFT JOIN nr n ON n.doc_id = d.doc_id
              |ORDER BY d.doc_id""".stripMargin),
    ),
    // dd_scale — the dedup family at 1M documents, executor-born (no
    // driver-side data), one summary row out. This is the 100 TB dress
    // rehearsal for the whole family: exact dedup (hash groupBy),
    // near-dup detection, and transitive clustering — with the LSH
    // knob turned for corpus size: a 64-bit SimHash with 4×16-bit
    // pigeonhole blocks (≈15 docs per bucket at 1M, where the 8-bit
    // blocks dd4 uses at 5k docs would put ~3900 docs in each bucket
    // and quadratically explode the candidate join). Planted
    // structure: every 97th doc is an exact copy, every 101st/next a
    // one-word-changed near copy — so all counts are deterministic.
    QueryDef(
      "dd_scale_1m",
      (s, _) => {
        val n = 1000000L
        val docs = s.range(n).select(
          col("id").as("doc_id"),
          expr("CASE WHEN id % 97 = 96 THEN id - 1 ELSE id END").as("uid"))
          .select(col("doc_id"),
            expr("CASE WHEN uid % 101 <= 1 THEN uid - (uid % 101) ELSE uid END").as("seed"),
            col("uid"))
        val text = concat_ws(" ",
          (1 to 19).map(j => concat(lit("w"), pmod(xxhash64(col("seed"), lit(j)), lit(50000L)))) :+
            concat(lit("u"), col("uid")): _*)
        // NOTE: the corpus is deliberately NOT persisted — the text
        // synthesis is pure codegen (xxhash64+concat) and re-running it
        // per pass measures faster than caching 1M materialized rows.
        val corpus = docs.select(col("doc_id"), text.as("text"))

        val nExact = corpus.select(md5(col("text").cast("binary")).as("h"))
          .groupBy("h").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(sum(col("c") - 1)).head().getLong(0)

        // SIMD-in-a-long bit counting: lane k packs the counts of bit
        // positions {k, k+8, …, k+56} as 8 byte-wide counters in one
        // long (per-doc word count ≤ 20 < 256 ⇒ no lane carry), so the
        // 64 per-bit sums collapse to 8 lanes; the 64-way unpack
        // afterwards is a pure projection. Bit p of the signature =
        // majority vote: 2·count_p ≥ n_words.
        //
        // The whole signature is built per-ROW with higher-order
        // functions (array_distinct → xxhash64 → aggregate lane sums):
        // a doc's words never leave its row, so the signature stage is
        // map-only — no explode, no 20M-row distinct shuffle, no
        // groupBy shuffle. At 100 TB that removes the two largest
        // shuffles of the whole dedup pipeline; the only remaining
        // shuffles are the (k, block) candidate join and CC.
        val laneMask = java.lang.Long.parseLong("0101010101010101", 16)
        val sigExpr = (0 until 64).map { p =>
          when(expr(s"((element_at(lanes, ${p % 8 + 1}) >> ${8 * (p / 8)}) & 255) * 2") >= col("nw"),
            lit(1L << p)).otherwise(lit(0L))
        }.reduce(_ + _)
        val sig = corpus
          .withColumn("ws", array_distinct(split(col("text"), " ")))
          .withColumn("nw", size(col("ws")))
          .withColumn("lanes",
            expr(s"""aggregate(transform(ws, w -> xxhash64(w)),
                     array_repeat(0L, 8),
                     (acc, h) -> transform(acc, (a, i) -> a + ((h >> i) & $laneMask)))"""))
          .select(col("doc_id"), sigExpr.as("sig"))
          .persist()
        val blk = sig.select(col("doc_id"), col("sig"),
          explode(sequence(lit(0), lit(3))).as("k"))
          .withColumn("blk", expr("(sig >> (k * 16)) & 65535"))
        val pairs = blk.select(col("doc_id").as("a"), col("sig").as("sa"), col("k"), col("blk"))
          .join(blk.select(col("doc_id").as("b"), col("sig").as("sb"), col("k"), col("blk")),
            Seq("k", "blk"))
          .filter(col("a") < col("b"))
          .withColumn("hm", expr("bit_count(sa ^ sb)"))
          .filter(col("hm") <= 3)
          .select("a", "b").distinct()
          .persist()
        // decompose every found pair against the planted structure:
        // uid(x) recovers the exact-dup group, seed(uid) the near-dup
        // group — a pair is EXACT iff uids match, NEAR iff seeds match,
        // SPURIOUS otherwise. At 64-bit signatures the deterministic
        // truth is 10309 exact + 1621 near + 0 spurious (one changed
        // word in 20 flips ~11 bits on average, so hamming≤3 catches a
        // minority of planted near copies but NOTHING unplanted).
        val cls = pairs.select(
          expr("CASE WHEN a % 97 = 96 THEN a - 1 ELSE a END").as("ua"),
          expr("CASE WHEN b % 97 = 96 THEN b - 1 ELSE b END").as("ub"))
          .select(col("ua"), col("ub"),
            expr("CASE WHEN ua % 101 <= 1 THEN ua - ua % 101 ELSE ua END").as("sa"),
            expr("CASE WHEN ub % 101 <= 1 THEN ub - ub % 101 ELSE ub END").as("sb"))
          .agg(
            sum(when(col("ua") === col("ub"), 1L).otherwise(0L)).as("ex"),
            sum(when(col("ua") =!= col("ub") && col("sa") === col("sb"), 1L).otherwise(0L)).as("nr"),
            sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("sp"))
          .head()
        val (nExactFound, nNearFound, nSpurious) =
          (cls.getLong(0), cls.getLong(1), cls.getLong(2))
        val nPairs = nExactFound + nNearFound + nSpurious
        val nClusters = graft.operators.ConnectedComponents.run(s, pairs)
          .select("component").distinct().count()
        sig.unpersist(); pairs.unpersist()
        val nExactPlanted = (n - 97) / 97 + 1 // ids ≡ 96 (mod 97)

        import s.implicits._
        Seq((n, nExact,
          nExactFound == nExactPlanted, // banding recall at hamming 0 is total
          nSpurious == 0L,              // precision 1.0: nothing unplanted
          nClusters >= nExactPlanted && nClusters <= nPairs))
          .toDF("n_docs", "n_exact_dup_docs",
            "exact_recall_ok", "no_false_positives", "clusters_ok")
      },
      // DuckDB recomputes the exact-dup count from the PLANTED
      // arithmetic (ids ≡ 96 mod 97) — an independent cross-check of
      // the md5 groupBy — and asserts the recall/precision/cluster
      // contracts, which are deterministic under the fixed signature
      // seeds (same shape as a8_approx_distinct's error contract).
      Some("""SELECT CAST(1000000 AS BIGINT) AS n_docs,
             |  (SELECT count(*) FROM (SELECT unnest(range(1000000)) AS id)
             |   WHERE id % 97 = 96) AS n_exact_dup_docs,
             |  TRUE AS exact_recall_ok, TRUE AS no_false_positives,
             |  TRUE AS clusters_ok""".stripMargin),
    ),

    // dd_scale_10m — the NEXT DECADE of the dedup family: 10M docs
    // through the same exact + SimHash-banded path, with the pigeonhole
    // knob sizing ITSELF from the corpus ([[blockBitsFor]]): at 10M the
    // 16-bit blocks dd_scale_1m uses would hold ~150 docs per bucket
    // (4 × 65536 buckets × 150²/2 ≈ 3 B candidate pairs — quadratic
    // death), so the knob doubles the block to 32 bits, which widens
    // the signature to 4 × 32 = 128 bits (two longs) — bucket
    // occupancy drops to ~0.002 and the candidate join is linear
    // again. Pigeonhole is preserved: 4 blocks still guarantee a
    // hamming≤3 pair shares at least one block. Same planted
    // structure as the 1M row (every 97th doc an exact copy, every
    // 101st/next a one-word-changed near copy), so every contract is
    // deterministic; per-doc wall-time vs dd_scale_1m is the decade
    // comparison BASELINE.md records.
    QueryDef(
      "dd_scale_10m",
      (s, _) => {
        val n = 10000000L
        val bb = blockBitsFor(n) // = 32 ⇒ 128-bit signature in two longs
        val docs = s.range(n).select(
          col("id").as("doc_id"),
          expr("CASE WHEN id % 97 = 96 THEN id - 1 ELSE id END").as("uid"))
          .select(col("doc_id"),
            expr("CASE WHEN uid % 101 <= 1 THEN uid - (uid % 101) ELSE uid END").as("seed"),
            col("uid"))
        val text = concat_ws(" ",
          (1 to 19).map(j => concat(lit("w"), pmod(xxhash64(col("seed"), lit(j)), lit(50000L)))) :+
            concat(lit("u"), col("uid")): _*)
        val corpus = docs.select(col("doc_id"), text.as("text"))

        // the dd_scale_1m lane trick, twice: each 64-bit half gets its
        // own independent word hash (xxhash64(w) / xxhash64(w, 1)) and
        // its own 8-lane byte-packed majority counters. Two deliberate
        // departures from the 1M row, both measured on this corpus:
        // (1) the lanes are FLAT COLUMN ARITHMETIC, not a
        // transform/aggregate chain — higher-order-function lambdas
        // evaluate interpreted per element (~10⁹ interpreted evals
        // here dominated the first cut ~3x); the fixed 20-word shape
        // keeps the whole signature inside whole-stage codegen (a
        // variable-width corpus would keep the HOF form); and (2) the
        // majority vote is a SWAR byte-parallel threshold — add
        // (128 − nWords/2) to all eight byte counters of a lane at
        // once and collect the high bits — instead of 128 CASE
        // branches with ANSI-checked adds (~1.5x on the stage). Byte 7
        // votes separately so the parallel add can never carry into
        // the sign bit. The signature table lands in a TEMP PARQUET
        // (three long columns): it is read three times below, and at
        // 10M rows the columnar cache build costs more than the
        // parquet round-trip.
        val nWords = 20
        val laneMask = java.lang.Long.parseLong("0101010101010101", 16)
        val withH = corpus
          .withColumn("ws", split(col("text"), " "))
          .select(col("doc_id") +:
            ((1 to nWords).map(j =>
              xxhash64(element_at(col("ws"), lit(j))).as(s"h${j}_lo")) ++
             (1 to nWords).map(j =>
               xxhash64(element_at(col("ws"), lit(j)), lit(1)).as(s"h${j}_hi"))): _*)
        def lanes(half: String) = (0 until 8).map { i =>
          (1 to nWords).map(j => expr(s"(h${j}_$half >> $i) & $laneMask"))
            .reduce(_ + _).as(s"l${i}_$half")
        }
        val withLanes = withH.select(
          col("doc_id") +: (lanes("lo") ++ lanes("hi")): _*)
        val loMask = 0x00FFFFFFFFFFFFFFL
        val addT = {
          val t = (128 - nWords / 2).toLong
          (0 until 7).map(b => t << (8 * b)).reduce(_ | _)
        }
        val vMask = 0x0001010101010101L
        def sigCol(half: String): Column = (0 until 8).map { i =>
          val l = s"l${i}_$half"
          expr(s"shiftleft(((((($l & $loMask) + $addT) >> 7) & $vMask) | " +
            s"shiftleft((((($l >> 56) + ${128 - nWords / 2}) >> 7) & 1), 56)), $i)")
        }.reduce(_ bitwiseOR _)
        val sigDir = java.nio.file.Files.createTempDirectory("dd10m_sig").toFile
        try {
        withLanes
          .select(col("doc_id"), sigCol("lo").as("lo"), sigCol("hi").as("hi"))
          .write.mode("overwrite").parquet(sigDir.getPath)
        val sig = s.read.parquet(sigDir.getPath)
        val nExact = corpus.select(md5(col("text").cast("binary")).as("h"))
          .groupBy("h").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(sum(col("c") - 1)).head().getLong(0)

        // candidate join shuffles ONLY (bkey, doc_id) — 80M narrow
        // rows, and the two sides are the SAME exchange (ReuseExchange
        // dedupes the shuffle write); the signatures rejoin on the
        // ~10⁵-row candidate set (broadcast, probing the signature
        // parquet — zero extra shuffle) where the hamming filter
        // evaluates
        val blk = sig.select(col("doc_id"),
          explode(sequence(lit(0), lit(3))).as("k"), col("lo"), col("hi"))
          .select(col("doc_id"), expr(
            "shiftleft(CAST(k AS BIGINT), 32) | (CASE WHEN k < 2 THEN (lo >> (k * 32)) " +
              "ELSE (hi >> ((k - 2) * 32)) END & 4294967295)").as("bkey"))
        val cand = blk.select(col("doc_id").as("a"), col("bkey"))
          .join(blk.select(col("doc_id").as("b"), col("bkey")), Seq("bkey"))
          .filter(col("a") < col("b"))
          .select("a", "b").distinct()
          .persist() // referenced twice below — never recompute the 80M-row join
        val pairs = sig.select(col("doc_id").as("a"), col("lo").as("la"), col("hi").as("ha"))
          .join(broadcast(cand), Seq("a"))
          .join(broadcast(sig.select(col("doc_id").as("b"), col("lo").as("lb"), col("hi").as("hb"))
            .join(broadcast(cand.select("b").distinct()), Seq("b"))), Seq("b"))
          .filter(expr("bit_count(la ^ lb) + bit_count(ha ^ hb)") <= 3)
          .select("a", "b")
          .persist()
        val cls = pairs.select(
          expr("CASE WHEN a % 97 = 96 THEN a - 1 ELSE a END").as("ua"),
          expr("CASE WHEN b % 97 = 96 THEN b - 1 ELSE b END").as("ub"))
          .select(col("ua"), col("ub"),
            expr("CASE WHEN ua % 101 <= 1 THEN ua - ua % 101 ELSE ua END").as("sa"),
            expr("CASE WHEN ub % 101 <= 1 THEN ub - ub % 101 ELSE ub END").as("sb"))
          .agg(
            sum(when(col("ua") === col("ub"), 1L).otherwise(0L)).as("ex"),
            sum(when(col("ua") =!= col("ub") && col("sa") === col("sb"), 1L).otherwise(0L)).as("nr"),
            sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("sp"))
          .head()
        val (nExactFound, nNearFound, nSpurious) =
          (cls.getLong(0), cls.getLong(1), cls.getLong(2))
        val nPairs = nExactFound + nNearFound + nSpurious
        val nClusters = graft.operators.ConnectedComponents.run(s, pairs)
          .select("component").distinct().count()
        cand.unpersist(); pairs.unpersist()
        val nExactPlanted = (n - 97) / 97 + 1 // ids ≡ 96 (mod 97)

        import s.implicits._
        Seq((n, bb, nExact,
          nExactFound == nExactPlanted, // identical sigs share every block
          nSpurious == 0L,              // precision 1.0: nothing unplanted
          nClusters >= nExactPlanted && nClusters <= nPairs))
          .toDF("n_docs", "block_bits", "n_exact_dup_docs",
            "exact_recall_ok", "no_false_positives", "clusters_ok")
        } finally graft.core.Fs.deleteRecursively(sigDir)
      },
      Some("""SELECT CAST(10000000 AS BIGINT) AS n_docs,
             |  CAST(32 AS INTEGER) AS block_bits,
             |  (SELECT count(*) FROM (SELECT unnest(range(10000000)) AS id)
             |   WHERE id % 97 = 96) AS n_exact_dup_docs,
             |  TRUE AS exact_recall_ok, TRUE AS no_false_positives,
             |  TRUE AS clusters_ok""".stripMargin),
    ),

    // dd2_scale_banded — the MinHash banding KNOB proven at 200k docs:
    // bandsFor(200k) widens the signature to r=4 rows × 6 bands (24
    // affine slots over one md5 base digest) so unrelated docs yield a
    // bounded false-candidate set (n·s0^r), while the planted near-dup
    // pairs (19 of 20 words shared ⇒ shingle Jaccard 0.8) still
    // band-collide with ≥95% design recall. The oracled dd2 is this
    // rule's r=2,b=4 output at fixture scale. Output pins the planted
    // recovery AND the band-bucket occupancy bound, so a regression to
    // degenerate banding fails the row, not just a timer. The fixture
    // words come from the portable Lehmer mix ([[Fixtures.portableMixSql]]),
    // so DuckDB regenerates the corpus and replays the ENTIRE banding
    // pipeline — shingles, md5 minhash, band buckets, Jaccard gate —
    // making every output column (found counts AND occupancy) a full
    // cross-engine recomputation, not a pinned constant.
    QueryDef(
      "dd2_scale_banded",
      (s, _) => {
        val n = 200000L
        val (r, b) = bandsFor(n) // = (4, 6) at 200k
        val docs = s.range(n).select(col("id").as("doc_id"),
          expr("CASE WHEN id % 101 <= 1 THEN id - id % 101 ELSE id END").as("seed"))
        val text = concat_ws(" ",
          (1 to 19).map(j =>
            concat(lit("w"), expr(Fixtures.portableMixSql(s"(seed * 32 + $j)", 50000L)))) :+
            concat(lit("u"), col("doc_id")): _*)
        val st = minhashStage(shingles(docs.select(col("doc_id"), text.as("text"))), r, b)
        val occ = st.bands.groupBy("band", "sig").agg(count(lit(1)).as("bn"))
          .agg(max("bn").as("max_band_bucket"))
        val pairs = minhashTail(st.sh, st.mh, st.bands, jaccardMin = 0.5)
        val planted = pairs
          .filter(col("doc_a") % 101 === 0 && col("doc_b") === col("doc_a") + 1)
          .agg(count(lit(1)).as("n_planted_found"))
        // materialize the 1-row contract eagerly so the 200k-doc
        // shingle/minhash caches are released instead of living for
        // the rest of the bench session
        val res = planted.crossJoin(occ)
          .select(lit(n).as("n_docs"), lit(r).as("rows_per_band"), lit(b).as("n_bands"),
            lit(n / 101 + 1).as("n_planted_pairs"), col("n_planted_found"),
            (col("n_planted_found") >= (n / 101) * 9 / 10).as("recall_ok"),
            col("max_band_bucket"),
            (col("max_band_bucket") <= BandSkewThreshold).as("occupancy_ok"))
          .localCheckpoint()
        st.sh.unpersist(); st.mh.unpersist()
        res
      },
      Some(dd2ScaleBandedOracle),
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

    // dd11 — MULTI-SIGNAL dedup clusters: one cluster assignment over
    // the UNION of all near-dup evidence — exact content hash, MinHash
    // Jaccard ≥ 0.5 (dd2's pairs), and SimHash hamming ≤ 3 (dd4's
    // pairs). Production dedup merges signals exactly like this:
    // each signal catches duplicates the others miss, and connected
    // components stitches them into one keep/drop decision per doc.
    // Oracle: all three pair derivations + recursive min-label
    // reachability in one DuckDB query.
    QueryDef(
      "dd11_multisignal_clusters",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val edges = minhashPairs(s, d).select("doc_a", "doc_b")
          .union(simhashPairs(s, d).select("doc_a", "doc_b"))
          .union(exactPairs(docs))
        ConnectedComponents
          .assign(s, edges, docs.select("doc_id"))
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $ShinglesSql,
              |shb AS (SELECT doc_id, $mhBaseDuck AS hb FROM sh),
              |mh AS (
              |  SELECT doc_id,
              |    ${(0 until 8).map(j => s"min(${mhSlot(j, "hb")}) AS mh$j").mkString(", ")},
              |    count(*) AS n
              |  FROM shb GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, b.band,
              |    CAST(CASE b.band WHEN 0 THEN least(mh0,mh1) WHEN 1 THEN least(mh2,mh3)
              |         WHEN 2 THEN least(mh4,mh5) ELSE least(mh6,mh7) END AS VARCHAR)
              |    || '#' ||
              |    CAST(CASE b.band WHEN 0 THEN greatest(mh0,mh1) WHEN 1 THEN greatest(mh2,mh3)
              |         WHEN 2 THEN greatest(mh4,mh5) ELSE greatest(mh6,mh7) END AS VARCHAR) AS sig
              |  FROM mh CROSS JOIN (SELECT unnest(range(0,4)) AS band) b),
              |mcand AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
              |minter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS inter
              |  FROM mcand c
              |  JOIN sh sa ON sa.doc_id = c.doc_a
              |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
              |  GROUP BY c.doc_a, c.doc_b),
              |mpairs AS (
              |  SELECT i.doc_a, i.doc_b
              |  FROM minter i
              |  JOIN mh ca ON ca.doc_id = i.doc_a
              |  JOIN mh cb ON cb.doc_id = i.doc_b
              |  WHERE CAST(i.inter AS DOUBLE) / CAST(ca.n + cb.n - i.inter AS DOUBLE) >= 0.5),
              |$SimhashSql,
              |scand AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    a.simhash AS sig_a, b.simhash AS sig_b
              |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
              |    substring(a.simhash,1,8)  = substring(b.simhash,1,8)  OR
              |    substring(a.simhash,9,8)  = substring(b.simhash,9,8)  OR
              |    substring(a.simhash,17,8) = substring(b.simhash,17,8) OR
              |    substring(a.simhash,25,8) = substring(b.simhash,25,8))),
              |spairs AS (SELECT doc_a, doc_b FROM scand WHERE $hamming32 <= 3),
              |hx AS (SELECT doc_id, md5(text) AS h FROM documents),
              |epairs AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM hx a JOIN hx b ON a.h = b.h AND a.doc_id < b.doc_id),
              |alledges AS (
              |  SELECT doc_a, doc_b FROM mpairs
              |  UNION SELECT doc_a, doc_b FROM spairs
              |  UNION SELECT doc_a, doc_b FROM epairs),
              |edges AS (SELECT doc_a AS s, doc_b AS t FROM alledges
              |          UNION SELECT doc_b, doc_a FROM alledges),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.t, r.r FROM reach r JOIN edges e ON e.s = r.id)
              |SELECT id AS doc_id, min(r) AS component
              |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin),
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

    // ------------------------------------------------------------------
    // src_jsonl_ingest — JSONL ingestion round trip with corrupt-record
    // quarantine: the documents table is written as JSON Lines by the
    // DISTRIBUTED writer (to_json per row, text sink), two malformed
    // lines are planted, and the directory is read back with an
    // EXPLICIT schema in PERMISSIVE mode — no inference pass (at
    // 100 TB, schema inference is a full extra scan) and bad input
    // lands in a quarantine column instead of aborting the job. The
    // oracle recomputes every aggregate from the parquet ground truth
    // (+ the planted corrupt count), so agreement proves the
    // writer/reader pair end to end — the mm3/mm4 pattern for text.
    QueryDef(
      "src_jsonl_ingest",
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("jsonl_ingest").toString
        Tables.documents(s, d)
          .select(to_json(struct(
            col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))))
          .write.mode("overwrite").text(dir)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, "planted_corrupt.txt"),
          "this line is not json\n{\"doc_id\": 1,,}\n")
        val schema = "doc_id LONG, text STRING, lang STRING, source STRING, " +
          "n_chars LONG, _corrupt STRING"
        s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(dir)
          .agg(
            sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("n_good"),
            sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
            sum(when(col("_corrupt").isNull, col("doc_id"))).as("sum_ids"),
            sum(when(col("_corrupt").isNull, col("n_chars"))).as("sum_chars"),
            countDistinct(when(col("_corrupt").isNull, col("lang"))).as("n_langs"))
      },
      Some("""SELECT count(*) AS n_good, CAST(2 AS BIGINT) AS n_corrupt,
             |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
             |FROM documents""".stripMargin),
    ),

    // src_csv_ingest — the same round trip through the CSV
    // writer/reader (quoting handled by the writer, explicit schema,
    // PERMISSIVE quarantine): one planted line with a wrong column
    // count and one with an unparseable doc_id both land in the
    // corrupt column, never abort the scan. PERMISSIVE keeps the
    // fields of a malformed row that DID parse (only the broken ones
    // null out), so every aggregate below is gated on the quarantine
    // flag. Same oracle cross-check against the parquet ground truth.
    QueryDef(
      "src_csv_ingest",
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("csv_ingest").toString
        Tables.documents(s, d)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").option("header", "false").csv(dir)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, "planted_corrupt.txt"),
          "a,b,c,d,e,f,g,h\nnotanumber,hello,en,src0,12\n")
        val schema = "doc_id LONG, text STRING, lang STRING, source STRING, " +
          "n_chars LONG, _corrupt STRING"
        s.read.schema(schema)
          .option("header", "false")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(dir)
          .agg(
            sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("n_good"),
            sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
            sum(when(col("_corrupt").isNull, col("doc_id"))).as("sum_ids"),
            sum(when(col("_corrupt").isNull, col("n_chars"))).as("sum_chars"),
            countDistinct(when(col("_corrupt").isNull, col("lang"))).as("n_langs"))
      },
      Some("""SELECT count(*) AS n_good, CAST(2 AS BIGINT) AS n_corrupt,
             |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
             |FROM documents""".stripMargin),
    ),

    // src_orc_ingest — the third columnar round trip (parquet is the
    // native store, CSV/JSONL the quarantined text paths; ORC is the
    // other columnar format a lake actually holds). The read-back
    // proves the same scan-level contract as S1: the lang filter and
    // 3-column projection reach the ORC reader (searchArguments +
    // pruned schema — asserted in SourcesSpec), and the aggregate is
    // cross-checked against the parquet ground truth.
    QueryDef(
      "src_orc_ingest",
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("orc_ingest").toString
        try {
        Tables.documents(s, d)
          .select("doc_id", "lang", "source", "n_chars")
          .write.mode("overwrite").orc(dir)
        val back = s.read.orc(dir)
          .filter(col("lang") =!= "en")
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum("n_chars").as("total_chars"),
            sum("doc_id").as("id_checksum"))
          .orderBy("lang")
        val rows = back.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), back.schema)
        // a failed collect must not strand the ORC copy of documents
        } finally graft.core.Fs.deleteRecursively(new java.io.File(dir))
      },
      Some("""SELECT lang, count(*) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
             |FROM documents WHERE lang <> 'en'
             |GROUP BY lang ORDER BY lang""".stripMargin),
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
  private def contentHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))

  /** exact-duplicate pairs (doc_a < doc_b) by content hash. */
  private def exactPairs(docs: DataFrame): DataFrame = {
    val hx = contentHashes(docs)
    hx.select(col("doc_id").as("doc_a"), col("h"))
      .join(hx.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
  }

  /** MinHash banding sized to the corpus — the documents-side analog
    * of `Similarity.planesFor`. Rows-per-band `r` grows with log n so
    * unrelated docs (background Jaccard ≤ s0) yield a BOUNDED number
    * of false candidates per doc (n·s0^r ≤ cap), and the band count
    * `b` grows with r to keep ≥`recall` probability of catching a
    * true near-dup at Jaccard ≥ tHi (1−(1−tHi^r)^b ≥ recall). At
    * fixture scale this returns exactly the oracled dd2 config
    * (r = 2, b = 4), making the fixed 8-hash/4-band query the
    * documented special case of the scale rule. */
  /** pigeonhole block width for hamming≤3 SimHash banding, sized by
    * the corpus — the SimHash analog of [[bandsFor]]. Four blocks is
    * the MINIMUM for h = 3 (h+1 blocks guarantee a clean one), so the
    * knob widens the BLOCK — and with it the signature, 4×blockBits —
    * until expected bucket occupancy n/2^bits stays ≤ `occupancy` and
    * the candidate equi-join stays linear in n. 16-bit blocks (the
    * dd4 / dd_scale_1m 64-bit signature) hold to ~1M docs; past that
    * the blocks double to 32 bits (a 128-bit signature in two longs:
    * at 10M docs occupancy is ~0.002 vs ~150 under 16-bit blocks,
    * where the join would be ~3B candidate pairs). */
  def blockBitsFor(n: Long, occupancy: Long = 16L): Int =
    if (n <= (occupancy << 16)) 16 else 32

  def bandsFor(n: Long, cap: Long = 2000L, s0: Double = 0.3,
               tHi: Double = 0.8, recall: Double = 0.95): (Int, Int) = {
    val r = math.max(2,
      math.ceil(math.log(math.max(1.0, n.toDouble / cap)) / math.log(1.0 / s0)).toInt)
    val b = math.max(4,
      math.ceil(math.log(1.0 - recall) / math.log(1.0 - math.pow(tHi, r))).toInt)
    (r, b)
  }

  /** affine-permutation constants for slot j: the 8 fixed primes the
    * oracled queries inline, extended past 8 by a Lehmer power chain
    * (deterministic, < 2^31) for the scale-sized signatures. */
  private def mhConstA(j: Int): Long =
    if (j < MhA.length) MhA(j) else lehmerPow(48271L, j + 1)
  private def mhConstB(j: Int): Long =
    if (j < MhB.length) MhB(j) else lehmerPow(40503L, j + 1)
  private def lehmerPow(g: Long, e: Int): Long = {
    var x = 1L
    for (_ <- 0 until e) x = x * g % MhM
    math.max(1L, x)
  }

  /** MinHash-LSH near-dup pairs with exact Jaccard ≥ `jaccardMin`
    * verification (doc_a < doc_b) over a shingle frame — the shared
    * stage behind dd2/dd11 (fixed r=2,b=4) and the banded scale entry
    * (bandsFor-sized). Candidates only from band-bucket equi-joins
    * (skew-salted past a cardinality threshold), Jaccard only on
    * candidates. `sort_array` canonicalizes each band's slots, so the
    * r=2 path produces byte-identical signatures to the original
    * least/greatest construction the dd2 oracle inlines. */
  private final case class MinhashStage(sh: DataFrame, mh: DataFrame, bands: DataFrame)

  private def minhashPairsBanded(shingleFrame: DataFrame, rows: Int, bands: Int,
                                 jaccardMin: Double): DataFrame = {
    val st = minhashStage(shingleFrame, rows, bands)
    // localCheckpoint is EAGER: the pair tail materializes here, so the
    // multi-million-row shingle/minhash caches can be released at once
    // instead of pinning executor storage for the session (callers get
    // a live distributed frame of just the surviving pairs)
    val out = minhashTail(st.sh, st.mh, st.bands, jaccardMin).localCheckpoint()
    st.sh.unpersist(); st.mh.unpersist()
    out
  }

  private def minhashStage(shingleFrame: DataFrame, rows: Int, bands: Int): MinhashStage = {
    val nSlots = rows * bands
    // the shingle set feeds three plan branches (minhash and both
    // sides of the candidate-pair intersection) — persist it once
    // so the document scan + shingle explode run once, not 5×
    val sh = shingleFrame.persist()
    // one-pass MinHash + set size: all signature slots AND the
    // distinct-shingle count as aggregate columns of a single
    // groupBy over the (already-distinct) shingle set — 60-bit
    // LONG slots keep the whole thing in HashAggregate with
    // map-side partial min/count: one row per doc crosses the
    // shuffle, no sort anywhere
    val mhAggs = (0 until nSlots).map(j => min(expr(mhSlot(j, "hb"))).as(s"mh$j")) :+
      count(lit(1)).as("n")
    val mh = sh
      .withColumn("hb", expr(mhBaseSpark)) // md5 once per shingle
      .groupBy("doc_id")
      .agg(mhAggs.head, mhAggs.tail: _*)
      // one tiny row per doc, read by the band explode and both
      // count sides of the Jaccard — keep the aggregate hot too
      .persist()
    val bandsDf = mh.select(
      col("doc_id"),
      explode(array((0 until bands).map { k =>
        struct(lit(k).as("band"),
          concat_ws("#",
            sort_array(array((0 until rows).map(i => col(s"mh${rows * k + i}")): _*))
              .cast("array<string>")).as("sig"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.sig").as("sig"))
    MinhashStage(sh, mh, bandsDf)
  }

  /** fixed-config entry point behind dd2/dd11. */
  private def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashPairsBanded(shingles(Tables.documents(s, d)), rows = 2, bands = 4, jaccardMin = 0.5)

  private def minhashTail(sh: DataFrame, mh: DataFrame, bands: DataFrame,
                          jaccardMin: Double): DataFrame = {
    // Skew guard (100 TB hazard: boilerplate-heavy docs share a
    // band signature → one bucket key dominates the self-join).
    // Probe the max bucket once (cheap agg over the tiny band
    // frame); past the threshold, salt the left side so the hot
    // bucket spreads over BandSalts tasks — row-identical output
    // (SkewToolsSpec), AQE can't split a self-join bucket itself.
    val bandsA = bands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
    val bandsB = bands.select(col("doc_id").as("doc_b"), col("band"), col("sig"))
    val joined =
      if (graft.operators.SkewTools.maxKeyCardinality(bands, Seq("band", "sig")) > BandSkewThreshold)
        graft.operators.SkewTools.saltedJoin(bandsA, bandsB, Seq("band", "sig"), BandSalts, col("doc_a"))
      else bandsA.join(bandsB, Seq("band", "sig"))
    val cand = joined
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val counts = mh.select(col("doc_id"), col("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .filter(col("sh") === col("sh_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= jaccardMin)
  }

  /** Full DuckDB replay of dd2_scale_banded: regenerate the portable
    * Lehmer-mix corpus at 200k docs, shingle it, md5-minhash all r·b
    * slots, band-bucket, self-join, Jaccard-verify — then emit the
    * same summary row. Every column (planted recovery, max bucket
    * occupancy) is an independent cross-engine recomputation. */
  private lazy val dd2ScaleBandedOracle: String = {
    val n = 200000L
    val (r, b) = bandsFor(n)
    val nSlots = r * b
    val words = (1 to 19).map(j => s"'w' || ${Fixtures.portableMixSql(s"(seed * 32 + $j)", 50000L)}")
    val textSql = (words :+ "'u' || doc_id").mkString(" || ' ' || ")
    val slotMins = (0 until nSlots).map(j => s"min(${mhSlot(j, "hb")}) AS mh$j").mkString(", ")
    val bandSig = (0 until b).map { k =>
      val cols = (0 until r).map(i => s"mh${r * k + i}").mkString(", ")
      s"WHEN $k THEN array_to_string(list_sort([$cols]), '#')"
    }.mkString(" ")
    s"""WITH ids AS (SELECT unnest(range($n)) AS doc_id),
       |docs AS (SELECT doc_id,
       |  CASE WHEN doc_id % 101 <= 1 THEN doc_id - doc_id % 101 ELSE doc_id END AS seed FROM ids),
       |corpus AS (SELECT doc_id, $textSql AS text FROM docs),
       |arrs AS (SELECT doc_id, string_split(text,' ') AS arr FROM corpus),
       |shpos AS (SELECT doc_id, arr, unnest(range(1, greatest(len(arr)-2,0)+1)) AS i FROM arrs),
       |sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS sh FROM shpos),
       |shb AS (SELECT doc_id, sh, ${MhDuckParse("md5(sh)")} AS hb FROM sh),
       |mh AS (SELECT doc_id, $slotMins, count(*) AS n FROM shb GROUP BY doc_id),
       |bands AS (SELECT doc_id, bd.band, CASE bd.band $bandSig END AS sig
       |  FROM mh CROSS JOIN (SELECT unnest(range(0, $b)) AS band) bd),
       |occ AS (SELECT max(bn) AS max_band_bucket FROM (
       |  SELECT band, sig, count(*) AS bn FROM bands GROUP BY band, sig)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
       |  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
       |  GROUP BY c.doc_a, c.doc_b),
       |pairs AS (SELECT i.doc_a, i.doc_b FROM inter i
       |  JOIN mh ca ON ca.doc_id = i.doc_a
       |  JOIN mh cb ON cb.doc_id = i.doc_b
       |  WHERE CAST(i.inter AS DOUBLE) / CAST(ca.n + cb.n - i.inter AS DOUBLE) >= 0.5),
       |planted AS (SELECT count(*) AS n_planted_found FROM pairs
       |  WHERE doc_a % 101 = 0 AND doc_b = doc_a + 1)
       |SELECT CAST($n AS BIGINT) AS n_docs, $r AS rows_per_band, $b AS n_bands,
       |  CAST(${n / 101 + 1} AS BIGINT) AS n_planted_pairs,
       |  n_planted_found,
       |  (n_planted_found >= ${(n / 101) * 9 / 10}) AS recall_ok,
       |  max_band_bucket,
       |  (max_band_bucket <= $BandSkewThreshold) AS occupancy_ok
       |FROM planted CROSS JOIN occ""".stripMargin
  }

  /** SimHash hamming≤3 near-dup pairs (doc_a < doc_b) — the shared
    * candidate-pair stage behind dd4 (pair listing) and dd8/dd9
    * (transitive clustering). Blocking: the 4 8-bit signature blocks —
    * by pigeonhole, any pair within hamming distance 3 agrees on at
    * least one block, so the union of 4 equi-joins has perfect recall
    * with no O(n²) scan.
    */
  private def simhashPairs(s: SparkSession, d: String): DataFrame = {
    // signatures are tiny (one row per doc) — persist so the 4-block
    // candidate join reads them once, not once per branch
    val sig = simhashDf(Tables.documents(s, d))
      // integer form of the signature: hamming becomes one
      // bit_count(xor) instead of 32 substring compares
      .withColumn("sig_int", graft.core.Hamming.sigIntCol(col("simhash")))
      // tiny (one row per doc) and feeds both join sides above the
      // aggregation, which ReuseExchange alone would recompute
      .persist()
    val blk = sig
      .select(col("doc_id"), col("simhash"), col("sig_int"),
        explode(sequence(lit(0), lit(graft.core.Hamming.Blocks - 1))).as("k"))
      .withColumn("blk", expr(graft.core.Hamming.blkSql("simhash", "k")))
    val cand = blk.select(col("doc_id").as("doc_a"), col("sig_int").as("ia"), col("k"), col("blk"))
      .join(blk.select(col("doc_id").as("doc_b"), col("sig_int").as("ib"), col("k"), col("blk")),
        Seq("k", "blk"))
      .filter(col("doc_a") < col("doc_b"))
    // hamming filter runs BEFORE the dedup shuffle so only near-dup
    // survivors get shuffled. The surviving pair set is tiny relative
    // to the candidate join that produces it — persist it so dd4/dd8/
    // dd9 (which all start from these pairs) compute the join once per
    // session (CacheManager matches the canonicalized plan).
    cand.withColumn("hamming", expr("bit_count(ia ^ ib)"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming").distinct()
      .persist()
  }
}
