package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.ConnectedComponents
import graft.pipeline.Fixtures
import org.apache.spark.sql.expressions.Window
import graft.queries.Documents._

/** Deduplication registry, split out of [[Documents]]: exact
  * (hash-groupBy), MinHash-LSH, SimHash, substring-gram and
  * edit-distance near-dup, dedup clustering / canonicalization /
  * cluster-aware splits, incremental dedup, and the 1M/10M-doc scale
  * proofs. Shares the text kernels (tokenizer, shingles, SimHash
  * signature, MinHash base digest parser) with [[Documents]]; the
  * MinHash affine-permutation kernel and the banding/blocking knobs
  * ([[bandsFor]], [[blockBitsFor]]) live here because only the dedup
  * candidate generation uses them.
  *
  * Scale notes (100 TB): candidate pairs come from equi-joins on band
  * signatures / bit-blocks, never from an O(n^2) cross join — see the
  * [[Documents]] header for the full blocking argument.
  */
object Dedup {

  /** LSH band-join skew guard: buckets above this row count get a
    * salted self-join (a 10k-doc bucket would otherwise pin 10k² pair
    * work on one task); below it, plain equi-join — no salt overhead
    * at healthy cardinalities. */
  private val BandSkewThreshold = 2000L
  private val BandSalts = 16


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

  val all: Seq[QueryDef] = Seq(
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

    // dd_scale_1m / dd_scale_10m — the dedup family's SCALE LADDER,
    // one code path at two decades ([[ddScaleQuery]]): executor-born
    // corpora with the same planted structure (every 97th doc an
    // exact copy, every 101st/next a one-word-changed near copy), the
    // fused simhash128 kernel for signatures + exact-content
    // fingerprints, and the pigeonhole band join with [[blockBitsFor]]
    // sizing the blocks — 16-bit blocks / 64-bit signature at 1M,
    // 32-bit blocks / 128-bit signature at 10M (where 16-bit buckets
    // would be ~3B candidate pairs). Holding the code constant across
    // the decade is what makes the per-doc wall-time comparison in
    // BASELINE.md meaningful; it also retires the unrolled 300-term
    // SQL signature whose JIT compilation was a measured per-run
    // lottery (10 ↔ 48 s for identical code — see BASELINE round 8).
    // The flat-SQL SWAR formulation itself stays pinned, column-for-
    // column, by SimHash128Spec's twin.
    ddScaleQuery("dd_scale_1m", 1000000L),
    ddScaleQuery("dd_scale_10m", 10000000L),

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
  )

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

  /** the dedup scale ladder, parameterized by volume — ONE derivation
    * for dd_scale_1m and dd_scale_10m. Corpus: doc `id` with the
    * planted copy structure (uid = id−1 every 97th id ⇒ exact copy;
    * seed collapses every 101st/next ⇒ one-word-changed near copy);
    * signatures + 128-bit exact-content fingerprints come from the
    * fused [[graft.expressions.SimHash128Expr]] kernel in one cached
    * pass (4 longs per doc). Exact dedup is a hash-groupBy on the
    * fingerprint; near-dup candidates come from the pigeonhole band
    * self-join — 4 blocks of [[blockBitsFor]] bits (hamming ≤ 3 over
    * a 4·blockBits signature guarantees a shared block), signatures
    * carried INLINE through the one shuffle so candidates never
    * rejoin the corpus; found pairs are decomposed against the
    * planted arithmetic (exact / near / spurious) and clustered.
    * Contracts: exact recall total (identical signatures share every
    * block), precision 1.0 (nothing unplanted at hamming ≤ 3), and
    * cluster count bounded by planted groups and found pairs. */
  private def ddScaleQuery(name: String, n: Long): QueryDef = {
    val bb = blockBitsFor(n) // 16 ⇒ 64-bit sig (lo half); 32 ⇒ 128-bit (lo+hi)
    val oracle =
      s"""SELECT CAST($n AS BIGINT) AS n_docs,
         |  CAST($bb AS INTEGER) AS block_bits,
         |  (SELECT count(*) FROM (SELECT unnest(range($n)) AS id)
         |   WHERE id % 97 = 96) AS n_exact_dup_docs,
         |  TRUE AS exact_recall_ok, TRUE AS no_false_positives,
         |  TRUE AS clusters_ok""".stripMargin
    QueryDef(
      name,
      (s, _) => {
        val docs = s.range(n).select(
          col("id").as("doc_id"),
          expr("CASE WHEN id % 97 = 96 THEN id - 1 ELSE id END").as("uid"))
          .select(col("doc_id"),
            expr("CASE WHEN uid % 101 <= 1 THEN uid - (uid % 101) ELSE uid END").as("seed"),
            col("uid"))
        val sig = docs
          .select(col("doc_id"), expr("simhash128(seed, uid)").as("x"))
          .select(col("doc_id"), expr("x[0]").as("f1"), expr("x[1]").as("f2"),
            expr("x[2]").as("lo"), expr("x[3]").as("hi"))
          .persist()
        try {
        val nExact = sig.groupBy("f1", "f2").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(sum(col("c") - 1)).head().getLong(0)

        // 4 blocks of bb bits; at bb=16 they tile the lo half (the
        // 64-bit signature), at bb=32 the k<2 blocks come from lo and
        // the rest from hi (the 128-bit signature)
        val bkeyExpr = if (bb == 16)
          "shiftleft(CAST(k AS BIGINT), 32) | ((lo >> (k * 16)) & 65535)"
        else
          "shiftleft(CAST(k AS BIGINT), 32) | (CASE WHEN k < 2 THEN (lo >> (k * 32)) " +
            "ELSE (hi >> ((k - 2) * 32)) END & 4294967295)"
        val hammingExpr = if (bb == 16) "bit_count(la ^ lb)"
          else "bit_count(la ^ lb) + bit_count(ha ^ hb)"
        val blk = sig.select(col("doc_id"),
          explode(sequence(lit(0), lit(3))).as("k"), col("lo"), col("hi"))
          .select(col("doc_id"), col("lo"), col("hi"), expr(bkeyExpr).as("bkey"))
        val pairs = blk.select(col("doc_id").as("a"), col("lo").as("la"), col("hi").as("ha"), col("bkey"))
          .join(blk.select(col("doc_id").as("b"), col("lo").as("lb"), col("hi").as("hb"), col("bkey")),
            Seq("bkey"))
          .filter(col("a") < col("b"))
          .filter(expr(hammingExpr) <= 3)
          .select("a", "b").distinct()
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
        // blocking: Dataset.unpersist() is async by default, and the
        // deferred block removal of a 1M/10M-row cache bled measurable
        // wall into whatever queries ran NEXT in a suite (the dq/f
        // cluster sorted right after the dd_scale rows jumped 0.35 →
        // 4.5 s) — cleanup cost belongs inside the owning query
        pairs.unpersist(blocking = true)
        val nExactPlanted = (n - 97) / 97 + 1 // ids ≡ 96 (mod 97)

        import s.implicits._
        Seq((n, bb, nExact,
          nExactFound == nExactPlanted, // identical sigs share every block
          nSpurious == 0L,              // precision 1.0: nothing unplanted
          nClusters >= nExactPlanted && nClusters <= nPairs))
          .toDF("n_docs", "block_bits", "n_exact_dup_docs",
            "exact_recall_ok", "no_false_positives", "clusters_ok")
        } finally sig.unpersist(blocking = true)
      },
      Some(oracle),
    )
  }

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
