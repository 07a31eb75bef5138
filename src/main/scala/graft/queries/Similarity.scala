package graft.queries


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (builder brief:
  * brute-force top-k as the baseline, LSH-bucketed variant as the
  * scale path) plus multimodal metadata extraction.
  *
  * Numeric parity: float arithmetic is not portable across engines,
  * so ranked similarity uses *fixed-point integers*: each float is
  * mapped to round(x·1e7) as a 64-bit int and similarities are exact
  * integer inner products — identical in Spark and DuckDB regardless
  * of summation order, and broadcast/codegen friendly. (The float
  * cosine baseline is also provided, as a rows-only check.)
  *
  * The LSH family is sign-random-projection (SimHash for vectors):
  * 8 fixed ±1 hyperplanes derived from md5 bits, precomputed on the
  * driver and inlined as literals into BOTH the Spark plan and the
  * oracle SQL — no cross-engine hash dependency at all. At 100 TB the
  * bucket signature is the shuffle key; brute force runs only inside
  * the query's bucket (≈ n/2^8 of the data per probe).
  */
object Similarity {

  private val Dims = 64

  /** class-center grid and jitter SQL shared by the Spark corpus
    * builder AND the dd12/ss14 DuckDB oracles — one definition keeps
    * all three in lockstep (a constant tweak in one place used to be
    * invisible at the other two call sites). */
  private def plantedCenterSql(vid: String, j: String, nClasses: Int): String =
    s"(((($vid % $nClasses) * 1299709 + $j * 104729) % 1000) * 1000)"
  private def plantedJitterSql(vid: String, j: String): String =
    graft.pipeline.Fixtures.portableMixSql(s"($vid * 16 + $j)", 100)

  /** Scala twin of [[plantedCenterSql]] (vid ≡ cls mod nClasses): the
    * exact grid centers, used to build a deterministic quantizer for
    * dd12 so cluster scoping never depends on a k-means fit. Kept in
    * lockstep with the SQL form; dd12's `purity_ok` column fails
    * diagnosably if they drift apart. */
  private def plantedCenters(nClasses: Int): Array[Array[Float]] =
    (0 until nClasses).map { cls =>
      (0 until 16).map { j =>
        (((cls.toLong % nClasses) * 1299709L + j * 104729L) % 1000L * 1000L).toFloat
      }.toArray
    }.toArray

  /** planted cluster corpus for ss13/dd12/ss14: 16-dim integer
    * vectors, center coordinate = class-keyed grid value × 1000
    * (inter-class gap ≥ 1000 on every differing dim), jitter =
    * portable Lehmer mix in [0, 100) — separation ≫ jitter, so the
    * clustering fixed point is the planted partition and all values
    * stay exact in FLOAT (≤ 10⁶ < 2²⁴). Executor-born via
    * spark.range; the oracles re-derive everything from the same
    * formula. */
  private def plantedClusters(s: SparkSession, n: Long, nClasses: Int): DataFrame = {
    val coords = (0 until 16).map { j =>
      expr(s"CAST(${plantedCenterSql("vec_id", j.toString, nClasses)} + " +
        plantedJitterSql("vec_id", j.toString) + " AS FLOAT)")
    }
    s.range(n).select(col("id").as("vec_id"), (col("id") % nClasses).as("class"))
      .withColumn("embedding", array(coords: _*))
  }

  /** signature width of the ORACLED fixed-SF queries: 8 planes = 256
    * buckets, right-sized for the test corpora (the planes are inlined
    * into static DuckDB oracle SQL, so these queries fix the width).
    * At real scale the width must GROW with the corpus — candidate
    * work in the self-join family (ss9/dd5) is Σ bucket², which at a
    * fixed bucket count grows quadratically with n. [[planesFor]] is
    * the sizing rule and `ss_scale_1m` proves occupancy stays bounded
    * at 1M vectors by widening the signature, exactly like
    * `dd_scale_1m`'s 16-bit LSH blocks on the documents side. */
  private val Planes = 8

  /** signature width for a corpus of `n` vectors targeting ≤ `cap`
    * expected vectors per bucket: ceil(log2(n / cap)), clamped to
    * [8, 30]. Under the random-hyperplane model E[bucket] = n / 2^p,
    * so per-bucket candidate work (bucket²) stays ≤ cap² no matter
    * how large n grows — the corpus-size knob the fixed width lacks. */
  def planesFor(n: Long, cap: Long = 1024L): Int = {
    val needed = math.ceil(math.log(math.max(1.0, n.toDouble / cap)) / math.log(2.0)).toInt
    math.min(30, math.max(8, needed))
  }

  /** ±1 hyperplane matrix, deterministic (md5 of "plane:j:i") — any
    * prefix of a wider matrix equals the narrower matrix, so widening
    * the signature only SPLITS buckets (never re-shuffles them): a
    * width bump at scale is an incremental refinement of the layout. */
  private def planeMatrix(nPlanes: Int): IndexedSeq[IndexedSeq[Int]] =
    graft.core.LshScale.planeMatrix(nPlanes) // single md5-pinned definition

  private val planes: IndexedSeq[IndexedSeq[Int]] = planeMatrix(Planes)

  /** embedding → fixed-point array<long> (exact, portable). */
  private[queries] def fxCol: Column =
    transform(col("embedding"), x => round(x * lit(1e7)).cast("long"))

  private val FxSql =
    "fx AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(x*1e7) AS BIGINT)) AS f FROM embeddings)"

  /** exact integer inner product of two fixed-point arrays — the
    * codegen [[graft.expressions.IpFixedExpr]] kernel (the zip_with/
    * aggregate form it replaces is CodegenFallback: interpreted per
    * row with an intermediate array; it dominated candidate scoring
    * at the 12M-row ss_recall_1m stage). Same integer arithmetic and
    * null/length semantics, pinned by IpFixedSpec. */
  private[queries] def ip(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.expressions.IpFixedExpr(
      org.apache.spark.sql.GraftBridge.expression(a),
      org.apache.spark.sql.GraftBridge.expression(b)))

  /** sign-projection bucket signature at any width (Spark side).
    * The plane entries are ±1, so each plane's inner product is a
    * plain ± sum over element reads — flat codegen arithmetic
    * instead of one `zip_with` array allocation per plane per row
    * (which dominated the 1M-row scale pass). `try_element_at` keeps
    * the query alive under ANSI (no INVALID_ARRAY_INDEX abort), but a
    * malformed (shorter-than-[[Dims]]) embedding is a data-corruption
    * signal, not a bucketing input: such rows route to a dedicated
    * `MALFORMED:<size>|…` bucket namespace that no well-formed
    * signature can collide with (real signatures are '0'/'1' only), so
    * corruption is VISIBLE in the bucket histogram — and quarantined
    * in candidate joins (a malformed row can only ever meet another
    * malformed row) — instead of silently placed on a partial sum. */
  private def sigColN(nPlanes: Int): Column = {
    val m = planeMatrix(nPlanes)
    val sig = concat((0 until nPlanes).map { j =>
      val s = (0 until Dims).map { i =>
        val e = coalesce(try_element_at(col("f"), lit(i + 1)), lit(0L))
        if (m(j)(i) > 0) e else -e
      }.reduce(_ + _)
      when(s >= 0, lit("1")).otherwise(lit("0"))
    }: _*)
    // quarantine as a concat PREFIX, not a CASE around the signature:
    // janino cannot method-split code inside a CASE-WHEN branch, and
    // the 64-element ± sum wrapped in a branch blows the 64 KB method
    // limit (whole-stage codegen bails out for every consumer). As a
    // top-level concat operand the sum stays splittable and codegen'd.
    val quarantine = when(size(col("f")) >= Dims, lit(""))
      .otherwise(concat(lit("MALFORMED:"),
        coalesce(size(col("f")), lit(-1)), lit("|")))
    concat(quarantine, sig)
  }

  /** the fixed 8-bit signature the oracled queries use. */
  private def sigCol: Column = sigColN(Planes)

  /** same signature as DuckDB SQL over the fx CTE's `f` column:
    * Σ(+dims) − Σ(−dims) via list_select with inlined index lists. */
  private val sigSql: String =
    (0 until Planes).map { j =>
      val pos = (0 until Dims).filter(i => planes(j)(i) > 0).map(_ + 1)
      val neg = (0 until Dims).filter(i => planes(j)(i) < 0).map(_ + 1)
      s"(CASE WHEN COALESCE(list_sum(list_select(f, [${pos.mkString(",")}])),0) - " +
        s"COALESCE(list_sum(list_select(f, [${neg.mkString(",")}])),0) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** generated hex→int parser for 4 md5 hex digits starting at `off`
    * (1-based); portable: instr/substring behave identically. */
  private def hex4(h: String, off: Int): String =
    (0 until 4).map { k =>
      s"(instr('0123456789abcdef', substring($h,${off + k},1)) - 1) * ${math.pow(16, 3 - k).toLong}"
    }.mkString("(", " + ", ")")

  /** hex→int for 8 hex digits (one unsigned 32-bit half; per-digit
    * products forced to BIGINT so ANSI-mode INT multiply can't
    * overflow). */
  private def hex8(h: String, off: Int): String =
    (0 until 8).map { k =>
      s"CAST(instr('0123456789abcdef', substring($h,${off + k},1)) - 1 AS BIGINT) * ${1L << (4 * (7 - k))}"
    }.mkString("(", " + ", ")")

  // ---------------------------------------------------------- ss_scale
  // ENGINE-PORTABLE synthetic corpus for the scale queries: coordinate
  // c_j(id) comes from two Lehmer (multiplicative-congruential) steps —
  // plain BIGINT `*`/`%` that Spark and DuckDB evaluate identically
  // with no overflow (every intermediate < 2^62), so the ORACLE can
  // regenerate the whole corpus and recompute the LSH probe end to end.
  private val LehmerM = 2147483647L

  /** Spark column for fixed-point coordinate j of vector `id`: two
    * Lehmer steps around a quadratic (middle-square-style) mix — the
    * squaring breaks the per-dim linearity a pure LCG chain would
    * have, which would otherwise collapse the sign-projection buckets
    * (verified: 1M vectors fill all 1024 buckets, max ≈ 3.9k). */
  private def scaleCoord(j: Int): Column = {
    val h1 = (col("id") * 1299709L + lit(j.toLong * 104395301L)) % LehmerM
    val h2 = (h1 * 48271L) % LehmerM
    val h3 = (h2 * h2 + h1) % LehmerM
    ((h3 * 48271L) % LehmerM % 1001L - 500L) * 10000L
  }

  /** portable per-row checksum term: qid·1000003 + vec_id·97 + ip —
    * BIGINT arithmetic, bit_xor-aggregated in both engines. */
  private val ChecksumTerm = "qid * 1000003 + vec_id * 97 + ip"

  /** full DuckDB recompute of an ss_scale probe: regenerate coords,
    * re-derive the sign-projection buckets (plane matrix inlined), re-
    * join candidates, re-rank top-10 per query, re-checksum. LIST
    * form throughout — one row per vector with a 64-element list and
    * generated per-element expressions, never a (vec, dim) row
    * explosion (a row-form 3-way dot-product join invites a
    * catastrophic join order on the dim key). */
  private def ssScaleOracle(n: Long, nPlanes: Int): (String, String) = {
    val m = planeMatrix(nPlanes)
    def coordExpr(j: Int): String = {
      val h1 = s"((vec_id * 1299709 + ${j.toLong * 104395301L}) % $LehmerM)"
      val h2 = s"(($h1 * 48271) % $LehmerM)"
      val h3 = s"(($h2 * $h2 + $h1) % $LehmerM)"
      s"((($h3 * 48271) % $LehmerM) % 1001 - 500) * 10000"
    }
    val fvList = (1 to Dims).map(coordExpr).mkString("[", ", ", "]")
    val planeSums = (0 until nPlanes).map { p =>
      val terms = (1 to Dims).map(j => s"${if (m(p)(j - 1) > 0) "+" else "-"} fv[$j]").mkString(" ")
      s"(CASE WHEN $terms >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
    val dot = (1 to Dims).map(j => s"a.fv[$j] * b.fv[$j]").mkString(" + ")
    val ctes =
      s"""ids AS (SELECT CAST(unnest(range($n)) AS BIGINT) AS vec_id),
         |vecs AS (SELECT vec_id, $fvList AS fv FROM ids),
         |sig AS (SELECT vec_id, fv, $planeSums AS bucket FROM vecs),
         |q AS (SELECT vec_id AS qid, fv, bucket FROM sig WHERE vec_id < 8),
         |ips AS (SELECT b.qid, a.vec_id, $dot AS ip
         |  FROM sig a JOIN q b ON a.bucket = b.bucket WHERE a.vec_id >= 8),
         |top AS (SELECT qid, vec_id, ip,
         |  row_number() OVER (PARTITION BY qid ORDER BY ip DESC, vec_id ASC) AS rk FROM ips)""".stripMargin
    val summary =
      s"""SELECT CAST(count(*) AS BIGINT) AS n_results,
         |  CAST(COALESCE(bit_xor($ChecksumTerm), 0) AS BIGINT) AS checksum
         |FROM top WHERE rk <= 10""".stripMargin
    (ctes, summary)
  }

  // ------------------------------------------------------- ANN contracts
  // The trained-index family (IVF/PQ/IVF-PQ/graph) is not SQL-
  // expressible — k-means and graph traversal have no DuckDB twin. But
  // their CONTRACT is: the exact top-10 spine over the same fixed-point
  // corpus is plain SQL, and recall-vs-exact under the committed
  // deterministic index is a fixed truth. So each query emits ONE row:
  // counts the oracle recomputes from the parquet table, the exact
  // top-10 checksum the oracle recomputes by brute force, and recall
  // booleans whose bounds the operator specs already pin — the
  // dd2_scale_banded / ss_scale discipline applied to serving.

  /** exact fixed-point top-10 for query vec 0 over the rest of the
    * corpus — the DuckDB-recomputable spine of the ANN contracts. */
  private def exactTop10(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") === 0).select(col("f").as("qf"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), ip(col("f"), col("qf")).as("ip"))
      .orderBy(col("ip").desc, col("vec_id"))
      .limit(10)
  }

  /** oracle CTEs recomputing [[exactTop10]] and its checksum (append
    * after the fx CTE). */
  private val ExactTop10Sql =
    """q AS (SELECT f AS qf FROM fx WHERE vec_id = 0),
      |pos AS (SELECT e.vec_id, unnest(range(1, len(e.f)+1)) AS i, e.f AS f, q.qf AS qf
      |        FROM fx e CROSS JOIN q WHERE e.vec_id <> 0),
      |ips AS (SELECT vec_id, sum(f[i] * qf[i]) AS ip FROM pos GROUP BY vec_id),
      |top10 AS (SELECT vec_id, CAST(ip AS BIGINT) AS ip FROM ips ORDER BY ip DESC, vec_id LIMIT 10),
      |xc AS (SELECT CAST(COALESCE(bit_xor(vec_id * 97 + ip), 0) AS BIGINT) AS exact_checksum FROM top10)""".stripMargin

  /** ANN is only ANN above a corpus floor: below [[AnnFloor]] rows
    * the PQ-family shortlist IS the corpus, so the exact rerank
    * degrades to brute force — the production answer at toy scale (no
    * candidate generation beats scanning 500 vectors) and what keeps
    * the recall contracts meaningful at every fixture sf. The
    * compressed-domain scan is still what's exercised at the gated
    * sf0.01/sf0.1 sizes, where the shortlist stays 50. */
  private val AnnFloor = 1000L
  /** above the floor the rerank shortlist scales as n/20 (capped at
    * 500): with ksub=16 codebooks the ADC ranking is coarse on these
    * near-uniform fixtures, and a fixed 50 under-covers — measured at
    * sf0.1 (n=1999): shortlist 50 → recall@10 4, 100 → 7 (PQ bound is
    * ≥ 6). The cap keeps the rerank O(500·dim) regardless of corpus;
    * production shortlists are tuned per recall target the same way. */
  private def shortlistFor(n: Long): Int =
    if (n < AnnFloor) math.max(n, 1L).toInt
    else math.min(500L, math.max(50L, n / 20)).toInt
  /** below [[RoutedFloor]], routed indexes probe EVERY list — at
    * ≲ 250 vectors/list the coarse quantizer isn't selective (sf0.1,
    * n=1999: nprobe 8 caps IVF-PQ recall@10 at 8 even with a 1000-wide
    * shortlist; probing all 16 lists reaches 9 at shortlist 100), and
    * a 500-vector corpus split 16 ways leaves true neighbors outside
    * any 8-list probe. Routing pays only once lists hold thousands. */
  private val RoutedFloor = 4000L
  private def nprobeFor(n: Long, nlist: Int, default: Int): Int =
    if (n < RoutedFloor) nlist else default

  /** 1-row contract over an ANN result: result count, recall@10 vs the
    * exact spine (boolean, bound per index family), and the exact
    * checksum. `ann` needs only a `vec_id` column; stays fully lazy so
    * the bench times the real serving plan. */
  private def annContract(ann: DataFrame, e: DataFrame, recallMin: Int): DataFrame = {
    val ex = exactTop10(e)
    val nRes = ann.agg(count(lit(1)).as("n_results"))
    val rec = ann.select("vec_id").join(ex.select("vec_id"), Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("recall10"))
    val xc = ex.agg(coalesce(expr("bit_xor(vec_id * 97 + ip)"), lit(0L)).as("exact_checksum"))
    nRes.crossJoin(rec).crossJoin(xc)
      .select(col("n_results"), (col("recall10") >= recallMin).as("recall_ok"),
        col("exact_checksum"))
  }

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // ss1 — brute-force top-k inner-product search (exact MIPS
    // baseline): 1-row query side broadcast to every partition, local
    // top-k per partition merged on the driver (TakeOrderedAndProject)
    // — no global sort at any scale.
    QueryDef(
      "ss1_topk_ip",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("f", fxCol)
        val q = e.filter(col("vec_id") === 0).select(col("f").as("qf"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), ip(col("f"), col("qf")).as("ip"))
          .orderBy(col("ip").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH $FxSql,
              |q AS (SELECT f AS qf FROM fx WHERE vec_id = 0),
              |pos AS (SELECT e.vec_id, unnest(range(1, len(e.f)+1)) AS i, e.f, q.qf
              |        FROM fx e CROSS JOIN q WHERE e.vec_id <> 0),
              |ips AS (SELECT vec_id, sum(f[i] * qf[i]) AS ip FROM pos GROUP BY vec_id)
              |SELECT vec_id, CAST(ip AS BIGINT) AS ip FROM ips
              |ORDER BY ip DESC, vec_id LIMIT 10""".stripMargin),
      headline = true,
    ),

    // ss2 — LSH bucket histogram: the partitioning layout of the ANN
    // scale path (each vector hashed to an 8-bit sign-projection
    // bucket; at scale this is the bucketing/partition key).
    QueryDef(
      "ss2_lsh_buckets",
      (s, d) => Tables.embeddings(s, d)
        .withColumn("f", fxCol)
        .select(sigCol.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some(s"""WITH $FxSql,
              |sig AS (SELECT vec_id, $sigSql AS bucket FROM fx)
              |SELECT bucket, count(*) AS n FROM sig GROUP BY bucket ORDER BY bucket""".stripMargin),
    ),

    // dq6 — the MALFORMED-embedding quarantine as a driver-checked
    // contract (lives in this file, not DataQuality.scala, because it
    // exercises THIS file's private signature kernel): sigColN routes
    // corrupt (shorter-than-Dims) embeddings to a 'MALFORMED:<size>|…'
    // bucket namespace no well-formed signature can collide with
    // (real signatures are '0'/'1' chars only), so corruption is
    // VISIBLE in the bucket histogram and INERT in candidate joins
    // instead of silently placed on a partial sum. Three clauses
    // proven: zero malformed buckets on the clean corpus; one planted
    // 3-dim vector routes to the 'MALFORMED:3|' namespace; and the
    // bucket-equality candidate-pair count is unchanged by the
    // planted row (a malformed row can only ever meet another
    // malformed row). The oracle replants the same corrupt vector and
    // replays all three from ground truth. The bucket STRINGS of
    // quarantined rows are deliberately not compared — Spark appends
    // the partial-sum signature after the namespace prefix (keeps the
    // concat codegen-splittable, sigColN's comment), the oracle stops
    // at the prefix; every compared field is namespace-level.
    QueryDef(
      "dq6_malformed_quarantine",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val planted = e.unionByName(
          e.filter(col("vec_id") === 0)
            .select(lit(-1L).as("vec_id"), slice(col("embedding"), 1, 3).as("embedding")))
        def sig(df: DataFrame): DataFrame =
          df.withColumn("f", fxCol).select(col("vec_id"), sigCol.as("bucket")).persist()
        val clean = sig(e)
        val dirty = sig(planted)
        def nMalformed(df: DataFrame): Long =
          df.filter(col("bucket").startsWith("MALFORMED:")).count()
        def nPairs(df: DataFrame): Long =
          df.as("a").join(df.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id")).count()
        val plantedRouted = dirty.filter(col("vec_id") === -1L)
          .select(col("bucket").startsWith("MALFORMED:3|")).collect()(0).getBoolean(0)
        val row = (nMalformed(clean), nMalformed(dirty), plantedRouted,
          nPairs(clean), nPairs(dirty))
        clean.unpersist()
        dirty.unpersist()
        Seq((row._1, row._2, row._3, row._4, row._5, row._4 == row._5))
          .toDF("n_malformed_clean", "n_malformed_dirty", "planted_routed",
            "n_pairs_clean", "n_pairs_dirty", "pairs_unaffected")
      },
      Some(s"""WITH $FxSql,
              |fxp AS (SELECT vec_id, f FROM fx UNION ALL
              |        SELECT -1 AS vec_id, list_slice(f, 1, 3) AS f FROM fx WHERE vec_id = 0),
              |sigc AS (SELECT vec_id, $sigSql AS bucket FROM fx),
              |sigd AS (SELECT vec_id,
              |    CASE WHEN len(f) >= $Dims THEN $sigSql
              |         ELSE 'MALFORMED:' || CAST(len(f) AS VARCHAR) || '|' END AS bucket
              |  FROM fxp),
              |pc AS (SELECT count(*) AS n FROM sigc a JOIN sigc b
              |       ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
              |pd AS (SELECT count(*) AS n FROM sigd a JOIN sigd b
              |       ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
              |SELECT
              |  (SELECT count(*) FROM sigc WHERE bucket LIKE 'MALFORMED:%') AS n_malformed_clean,
              |  (SELECT count(*) FROM sigd WHERE bucket LIKE 'MALFORMED:%') AS n_malformed_dirty,
              |  (SELECT starts_with(bucket, 'MALFORMED:3|') FROM sigd WHERE vec_id = -1) AS planted_routed,
              |  (SELECT n FROM pc) AS n_pairs_clean,
              |  (SELECT n FROM pd) AS n_pairs_dirty,
              |  (SELECT n FROM pc) = (SELECT n FROM pd) AS pairs_unaffected""".stripMargin),
    ),

    // ss3 — LSH-bucketed ANN: probe only the query's bucket, then
    // exact inner-product rerank inside it. The candidate set is the
    // bucket (n/256 expected), not the table.
    QueryDef(
      "ss3_ann_lsh_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("f", fxCol).withColumn("bucket", sigCol)
        val q = e.filter(col("vec_id") === 0).select(col("f").as("qf"), col("bucket").as("qbucket"))
        e.crossJoin(broadcast(q))
          .filter(col("bucket") === col("qbucket") && col("vec_id") =!= 0)
          .select(col("vec_id"), ip(col("f"), col("qf")).as("ip"))
          .orderBy(col("ip").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH $FxSql,
              |sig AS (SELECT vec_id, f, $sigSql AS bucket FROM fx),
              |q AS (SELECT f AS qf, bucket AS qbucket FROM sig WHERE vec_id = 0),
              |cand AS (SELECT s.vec_id, s.f, q.qf FROM sig s CROSS JOIN q
              |         WHERE s.bucket = q.qbucket AND s.vec_id <> 0),
              |pos AS (SELECT vec_id, unnest(range(1, len(f)+1)) AS i, f, qf FROM cand),
              |ips AS (SELECT vec_id, sum(f[i] * qf[i]) AS ip FROM pos GROUP BY vec_id)
              |SELECT vec_id, CAST(ip AS BIGINT) AS ip FROM ips
              |ORDER BY ip DESC, vec_id LIMIT 10""".stripMargin),
    ),

    // ss11 — TWO-STAGE truncated-dim retrieval: score EVERY vector on
    // only its first 16 dims (the Matryoshka/PCA-prefix trick — at
    // scale the truncated prefix is stored as its own narrow column,
    // so stage 1 reads 16/64ths of the vector bytes), keep the top
    // 100 by the cheap score via TakeOrderedAndProject, then rerank
    // JUST those 100 with the exact full-dim inner product. The
    // production serving shape: a cheap full-scan filter bounds the
    // expensive exact work to a constant-size candidate set. All
    // fixed-point integer arithmetic — hash-oracled end to end.
    QueryDef(
      "ss11_truncated_rerank",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("f", fxCol)
        val q = e.filter(col("vec_id") === 0).select(col("f").as("qf"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("ip16", ip(slice(col("f"), 1, 16), slice(col("qf"), 1, 16)))
          .orderBy(col("ip16").desc, col("vec_id")).limit(100)
          .withColumn("ip", ip(col("f"), col("qf")))
          .select(col("vec_id"), col("ip"))
          .orderBy(col("ip").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH $FxSql,
              |q AS (SELECT f AS qf FROM fx WHERE vec_id = 0),
              |pos16 AS (SELECT e.vec_id, unnest(range(1, 17)) AS i, e.f, q.qf
              |          FROM fx e CROSS JOIN q WHERE e.vec_id <> 0),
              |c16 AS (SELECT vec_id, sum(f[i] * qf[i]) AS ip16 FROM pos16 GROUP BY vec_id),
              |cand AS (SELECT vec_id, ip16 FROM c16 ORDER BY ip16 DESC, vec_id LIMIT 100),
              |pos AS (SELECT c.vec_id, unnest(range(1, len(e.f)+1)) AS i, e.f, q.qf
              |        FROM cand c JOIN fx e ON e.vec_id = c.vec_id CROSS JOIN q),
              |ips AS (SELECT vec_id, sum(f[i] * qf[i]) AS ip FROM pos GROUP BY vec_id)
              |SELECT vec_id, CAST(ip AS BIGINT) AS ip FROM ips
              |ORDER BY ip DESC, vec_id LIMIT 10""".stripMargin),
    ),

    // ss7 — BATCHED ANN: a whole workload of query vectors answered in
    // ONE pass — queries join candidates on the shared LSH bucket (one
    // equi-join, not one probe per query), then a per-query top-5 via
    // rank window. This is the serving shape for bulk retrieval
    // (dataset curation, hard-negative mining): throughput scales with
    // the join, not the query count. Exact fixed-point scoring → fully
    // oracle-checked.
    QueryDef(
      "ss7_batch_ann_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("f", fxCol).withColumn("bucket", sigCol)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("f").as("qf"), col("bucket"))
        val cand = e.filter(col("vec_id") >= 5).select(col("vec_id"), col("f"), col("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("ip").desc, col("vec_id").asc)
        cand.join(q, Seq("bucket"))
          .select(col("qid"), col("vec_id"), ip(col("f"), col("qf")).as("ip"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select("qid", "vec_id", "ip", "rk")
          .orderBy("qid", "rk")
      },
      Some(s"""WITH $FxSql,
              |sig AS (SELECT vec_id, f, $sigSql AS bucket FROM fx),
              |q AS (SELECT vec_id AS qid, f AS qf, bucket FROM sig WHERE vec_id < 5),
              |cand AS (SELECT vec_id, f, bucket FROM sig WHERE vec_id >= 5),
              |pairs AS (
              |  SELECT q.qid, c.vec_id, c.f, q.qf
              |  FROM cand c JOIN q ON c.bucket = q.bucket),
              |pos AS (SELECT qid, vec_id, unnest(range(1, len(f)+1)) AS i, f, qf FROM pairs),
              |ips AS (SELECT qid, vec_id, CAST(sum(f[i] * qf[i]) AS BIGINT) AS ip
              |        FROM pos GROUP BY qid, vec_id),
              |ranked AS (SELECT qid, vec_id, ip,
              |    row_number() OVER (PARTITION BY qid ORDER BY ip DESC, vec_id ASC) AS rk
              |  FROM ips)
              |SELECT qid, vec_id, ip, rk FROM ranked WHERE rk <= 5
              |ORDER BY qid, rk""".stripMargin),
    ),

    // ss8 — MULTI-PROBE LSH ANN: probe the query's bucket AND the 8
    // buckets at hamming distance 1 from its signature (flip each
    // plane bit once) — the standard recall knob that avoids building
    // more tables: candidates grow from n/256 to 9n/256 while recall
    // jumps, and the probe set is computed from the signature alone.
    // Exact fixed-point rerank → fully oracle-checked.
    QueryDef(
      "ss8_multiprobe_lsh",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("f", fxCol).withColumn("bucket", sigCol)
        val q = e.filter(col("vec_id") === 0).select(col("f").as("qf"), col("bucket").as("qb"))
        // qb plus its 8 one-bit flips
        val flips = (1 to Planes).map { i =>
          concat(
            substring(col("qb"), 1, i - 1),
            when(substring(col("qb"), i, 1) === "1", "0").otherwise("1"),
            substring(col("qb"), i + 1, Planes - i))
        }
        val probes = q.select(col("qf"), explode(array(col("qb") +: flips: _*)).as("bucket"))
        e.filter(col("vec_id") =!= 0)
          .join(broadcast(probes), Seq("bucket"))
          .select(col("vec_id"), ip(col("f"), col("qf")).as("ip"))
          .orderBy(col("ip").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH $FxSql,
              |sig AS (SELECT vec_id, f, $sigSql AS bucket FROM fx),
              |q AS (SELECT f AS qf, bucket AS qb FROM sig WHERE vec_id = 0),
              |probes AS (
              |  SELECT qf, qb AS bucket FROM q
              |  UNION ALL
              |  SELECT qf,
              |    substring(qb, 1, i-1) ||
              |    (CASE WHEN substring(qb, i, 1) = '1' THEN '0' ELSE '1' END) ||
              |    substring(qb, i+1, 8-i) AS bucket
              |  FROM q CROSS JOIN (SELECT unnest(range(1, 9)) AS i) idx),
              |cand AS (
              |  SELECT s.vec_id, s.f, p.qf FROM sig s JOIN probes p ON s.bucket = p.bucket
              |  WHERE s.vec_id <> 0),
              |pos AS (SELECT vec_id, unnest(range(1, len(f)+1)) AS i, f, qf FROM cand),
              |ips AS (SELECT vec_id, CAST(sum(f[i] * qf[i]) AS BIGINT) AS ip FROM pos GROUP BY vec_id)
              |SELECT vec_id, ip FROM ips ORDER BY ip DESC, vec_id LIMIT 10""".stripMargin),
    ),

    // ss9 — k-NN GRAPH construction: for EVERY vector, its top-3
    // in-bucket neighbors by exact inner product — the all-vectors
    // batched analog of ss7 (one bucket self-join + one rank window,
    // no per-vector probes). The k-NN graph is the input to embedding
    // clustering / diversity pruning in a curation pipeline; at scale
    // the bucket is the shuffle key and candidate work is Σ bucket² —
    // bounded by widening the signature with the corpus (planesFor;
    // proven at 1M vectors by ss_scale_1m). Width is fixed at 8 HERE
    // only because the DuckDB oracle inlines the plane matrix.
    QueryDef(
      "ss9_knn_graph",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("f", fxCol).withColumn("bucket", sigCol)
        val a = e.select(col("vec_id").as("src"), col("f").as("fa"), col("bucket"))
        val b = e.select(col("vec_id").as("dst"), col("f").as("fb"), col("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("src").orderBy(col("ip").desc, col("dst").asc)
        a.join(b, Seq("bucket"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"), ip(col("fa"), col("fb")).as("ip"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("src", "dst", "ip", "rk")
          .orderBy("src", "rk")
      },
      Some(s"""WITH $FxSql,
              |sig AS (SELECT vec_id, f, $sigSql AS bucket FROM fx),
              |cand AS (
              |  SELECT a.vec_id AS src, b.vec_id AS dst, a.f AS fa, b.f AS fb
              |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
              |pos AS (SELECT src, dst, unnest(range(1, len(fa)+1)) AS i, fa, fb FROM cand),
              |ips AS (SELECT src, dst, CAST(sum(fa[i] * fb[i]) AS BIGINT) AS ip
              |        FROM pos GROUP BY src, dst),
              |ranked AS (SELECT src, dst, ip,
              |    row_number() OVER (PARTITION BY src ORDER BY ip DESC, dst ASC) AS rk
              |  FROM ips)
              |SELECT src, dst, ip, rk FROM ranked WHERE rk <= 3
              |ORDER BY src, rk""".stripMargin),
    ),

    // dd5 — embedding near-dup pairs (the embedding-cosine dedup from
    // the brief, in exact fixed-point IP form): candidate pairs share
    // a sign-projection bucket (blocked equi-join, never O(n²)), then
    // exact integer inner product ≥ τ. Fully deterministic → oracled.
    // Per-bucket candidate work at corpus scale is bounded by the
    // planesFor width rule (see ss_scale_1m), not this fixed 8.
    QueryDef(
      "dd5_embedding_neardup",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("f", fxCol).withColumn("bucket", sigCol)
        val a = e.select(col("vec_id").as("vec_a"), col("f").as("fa"), col("bucket"))
        val b = e.select(col("vec_id").as("vec_b"), col("f").as("fb"), col("bucket"))
        a.join(b, Seq("bucket"))
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"), ip(col("fa"), col("fb")).as("ip"))
          .filter(col("ip") >= 35000000000000L)
          .orderBy("vec_a", "vec_b")
      },
      Some(s"""WITH $FxSql,
              |sig AS (SELECT vec_id, f, $sigSql AS bucket FROM fx),
              |cand AS (SELECT a.vec_id AS vec_a, a.f AS fa, b.vec_id AS vec_b, b.f AS fb
              |         FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
              |pos AS (SELECT vec_a, vec_b, unnest(range(1, len(fa)+1)) AS i, fa, fb FROM cand),
              |ips AS (SELECT vec_a, vec_b, sum(fa[i] * fb[i]) AS ip FROM pos GROUP BY vec_a, vec_b)
              |SELECT vec_a, vec_b, CAST(ip AS BIGINT) AS ip FROM ips
              |WHERE ip >= 35000000000000
              |ORDER BY vec_a, vec_b""".stripMargin),
    ),

    // dd13 — CROSS-CORPUS semantic contamination: the embedding-space
    // twin of d8's n-gram benchmark-contamination check. A held-out
    // "benchmark" set is screened against the training corpus by
    // normalized cosine ≥ 0.95 — candidates from a sign-bucket
    // equi-join with the (always-small) benchmark side BROADCAST, the
    // d8 discipline; the threshold is evaluated EXACTLY in integers
    // (cos ≥ 19/20 ⇔ ip > 0 ∧ 400·ip² ≥ 361·|a|²·|b|², DECIMAL(38)
    // cross-multiplication — no float sqrt on either engine). The real
    // corpora share no cross-corpus pair above cosine 0.5, so the
    // benchmark is PLANTED portably: one ±2-fixed-point-unit
    // perturbation of every 97th train vector (must be found: the
    // is_planted column pins provenance) plus 10 Lehmer-mix random
    // distractors (nothing random may pass 0.95 against a real
    // vector). DuckDB regenerates the benchmark from the same formulas
    // and replays bucket, ip and the exact threshold end to end.
    QueryDef(
      "dd13_semantic_contamination",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        // the synthetic benchmark ids live at +1e6 (planted) and +2e6
        // (distractors); past 1M real rows those namespaces would
        // collide with train ids and the is_planted provenance label
        // would silently lie ON BOTH ENGINES — fail loudly instead
        // (the fixture corpora are ≤ 2000 rows — this probe is a
        // metadata-size scan of a small dim table; a real deployment
        // derives the offset from max(vec_id)). getAs: NULL max
        // (empty table) reads as "no collision", not an NPE.
        val maxId = Option(Tables.embeddings(s, d).agg(max("vec_id"))
          .collect()(0).getAs[java.lang.Long](0)).map(_.longValue).getOrElse(-1L)
        require(maxId < 1000000L,
          s"dd13's fixed benchmark-id offsets need max vec_id < 1e6, got $maxId")
        // self inner products are per-ROW quantities: compute them
        // before the bucket join, not once per candidate pair (a hot
        // bucket would otherwise pay c redundant 64-multiply sums per
        // row appearing in c pairs)
        val train = Tables.embeddings(s, d).withColumn("f", fxCol)
          .withColumn("bucket", sigCol)
          .select(col("vec_id").as("train_id"), col("f").as("ft"), col("bucket"),
            ip(col("f"), col("f")).as("na2"))
        val planted = Tables.embeddings(s, d).withColumn("f", fxCol)
          .filter(col("vec_id") % 97 === 0)
          .select((col("vec_id") + 1000000L).as("bid"),
            transform(col("f"), (x, i) =>
              x + (col("vec_id") + i.cast("long")) % 5 - 2).as("f"))
        val distract = s.range(10).select((col("id") + 2000000L).as("bid"),
          transform(sequence(lit(0), lit(63)), j =>
            ((col("id") * 104729L + j.cast("long") * 7919L + 1L) * 48271L) % 2097152L - 1048576L).as("f"))
        val bench = planted.unionByName(distract)
          .withColumn("bucket", sigCol)
          .select(col("bid"), col("f").as("fb"), col("bucket"),
            ip(col("f"), col("f")).as("nb2"))
        train.join(broadcast(bench), Seq("bucket"))
          .select(col("train_id"), col("bid"),
            ip(col("ft"), col("fb")).as("ip"),
            col("na2"), col("nb2"))
          .filter(col("ip") > 0 &&
            col("ip").cast(dec) * col("ip").cast(dec) * lit(400L).cast(dec) >=
              col("na2").cast(dec) * col("nb2").cast(dec) * lit(361L).cast(dec))
          .select(col("train_id"), col("bid").as("bench_id"), col("ip"),
            (col("bid") === col("train_id") + 1000000L).as("is_planted"))
          .orderBy("train_id", "bench_id")
      },
      Some(s"""WITH $FxSql,
              |tr AS (SELECT vec_id AS train_id, f, $sigSql AS bucket FROM fx),
              |pl AS (SELECT vec_id + 1000000 AS bid,
              |         list_transform(f, (x, i) -> x + (vec_id + i - 1) % 5 - 2) AS f
              |       FROM fx WHERE vec_id % 97 = 0),
              |di AS (SELECT d + 2000000 AS bid,
              |         list_transform(range(0, 64), j -> ((d*104729 + j*7919 + 1) * 48271) % 2097152 - 1048576) AS f
              |       FROM (SELECT unnest(range(10)) AS d)),
              |be AS (SELECT bid, f, $sigSql AS bucket FROM (SELECT * FROM pl UNION ALL SELECT * FROM di)),
              |cand AS (SELECT t.train_id, t.f AS ft, b.bid, b.f AS fb
              |         FROM tr t JOIN be b ON t.bucket = b.bucket),
              |pos AS (SELECT train_id, bid, unnest(range(1, len(ft)+1)) AS i, ft, fb FROM cand),
              |ips AS (SELECT train_id, bid,
              |          sum(ft[i]*fb[i]) AS ip, sum(ft[i]*ft[i]) AS na2, sum(fb[i]*fb[i]) AS nb2
              |        FROM pos GROUP BY train_id, bid)
              |SELECT train_id, bid AS bench_id, CAST(ip AS BIGINT) AS ip,
              |  bid = train_id + 1000000 AS is_planted
              |FROM ips
              |WHERE ip > 0 AND 400 * CAST(ip AS HUGEINT) * CAST(ip AS HUGEINT) >=
              |  361 * CAST(na2 AS HUGEINT) * CAST(nb2 AS HUGEINT)
              |ORDER BY train_id, bench_id""".stripMargin),
    ),

    // ss18 — FILTERED vector search: top-k among vectors whose
    // METADATA matches a predicate (label = 3) — the production ANN
    // case the naive pipeline gets wrong. The row carries all three
    // strategies over one exact scoring pass: (a) the exact filtered
    // spine (ground truth + checksum); (b) POST-filtering — take the
    // global top-10, then filter — which starves (≈ selectivity × k
    // survivors: `n_postfilter_hits`); (c) PRE-filtering pushed into
    // candidate generation — the predicate rides the bucket probe, so
    // candidates are label-matching bucket-mates only
    // (`n_bucket_candidates`, bounded by the bucket × selectivity).
    // Everything is exact fixed-point arithmetic over the committed
    // sign-bucket layout — no trained model — so DuckDB regenerates
    // EVERY column including the probe's recall, not just verdicts.
    QueryDef(
      "ss18_filtered_ann",
      (s, d) => {
        val lbl = 3
        val e = Tables.embeddings(s, d).withColumn("f", fxCol).withColumn("bucket", sigCol)
        val q = e.filter(col("vec_id") === 0)
          .select(col("f").as("qf"), col("bucket").as("qbucket"))
        val scored = e.filter(col("vec_id") >= 1)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), col("label"), col("bucket"), col("qbucket"),
            ip(col("f"), col("qf")).as("ip"))
          .persist()
        val exactF = scored.filter(col("label") === lbl)
          .orderBy(col("ip").desc, col("vec_id")).limit(10)
          .select("vec_id", "ip").persist()
        val nFiltered = scored.filter(col("label") === lbl)
          .agg(count(lit(1)).as("n_filtered"))
        val post = scored.orderBy(col("ip").desc, col("vec_id")).limit(10)
          .agg(sum(when(col("label") === lbl, 1L).otherwise(0L)).as("n_postfilter_hits"))
        val cand = scored.filter(col("bucket") === col("qbucket") && col("label") === lbl)
        val nCand = cand.agg(count(lit(1)).as("n_bucket_candidates"))
        val recall = cand.orderBy(col("ip").desc, col("vec_id")).limit(10)
          .join(exactF.select("vec_id"), Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("bucket_recall10"))
        val checksum = exactF
          .agg(coalesce(expr("bit_xor(vec_id * 97 + ip)"), lit(0L)).as("exact_checksum"))
        val res = nFiltered.crossJoin(post).crossJoin(nCand)
          .crossJoin(recall).crossJoin(checksum)
          .select(lit(lbl).as("label_filter"), col("n_filtered"),
            col("n_postfilter_hits"), col("n_bucket_candidates"),
            col("bucket_recall10"), col("exact_checksum"))
          .localCheckpoint()
        scored.unpersist(); exactF.unpersist()
        res
      },
      Some(s"""WITH fxl AS (SELECT vec_id, label,
              |    list_transform(embedding, x -> CAST(round(x*1e7) AS BIGINT)) AS f
              |  FROM embeddings),
              |sg AS (SELECT vec_id, label, f, $sigSql AS bucket FROM fxl),
              |qb AS (SELECT f AS qf, bucket AS qbucket FROM sg WHERE vec_id = 0),
              |pos AS (SELECT a.vec_id, a.label, a.bucket, b.qbucket,
              |          unnest(range(1, len(a.f)+1)) AS i, a.f AS f, b.qf AS qf
              |        FROM sg a CROSS JOIN qb b WHERE a.vec_id >= 1),
              |ips AS (SELECT vec_id, label, bucket, qbucket, sum(f[i]*qf[i]) AS ip
              |        FROM pos GROUP BY vec_id, label, bucket, qbucket),
              |exact_f AS (SELECT vec_id, CAST(ip AS BIGINT) AS ip FROM ips WHERE label = 3
              |            ORDER BY ip DESC, vec_id LIMIT 10),
              |gtop AS (SELECT label FROM ips ORDER BY ip DESC, vec_id LIMIT 10),
              |cand AS (SELECT vec_id, ip FROM ips WHERE bucket = qbucket AND label = 3),
              |ctop AS (SELECT vec_id FROM cand ORDER BY ip DESC, vec_id LIMIT 10)
              |SELECT CAST(3 AS INTEGER) AS label_filter,
              |  (SELECT count(*) FROM ips WHERE label = 3) AS n_filtered,
              |  (SELECT CAST(sum(CASE WHEN label = 3 THEN 1 ELSE 0 END) AS BIGINT) FROM gtop)
              |    AS n_postfilter_hits,
              |  (SELECT count(*) FROM cand) AS n_bucket_candidates,
              |  (SELECT count(*) FROM ctop c JOIN exact_f e ON e.vec_id = c.vec_id)
              |    AS bucket_recall10,
              |  (SELECT CAST(COALESCE(bit_xor(vec_id * 97 + ip), 0) AS BIGINT) FROM exact_f)
              |    AS exact_checksum""".stripMargin),
    ),

    // ss5 — IVF ANN (operators.IvfIndex): k-means coarse quantizer,
    // posting-list assignment (the at-rest bucketing key), probe the 8
    // nearest of 16 lists with exact rerank. Contract-oracled: DuckDB
    // recomputes the assignment count and the exact top-10 checksum
    // from the parquet corpus; recall@10 ≥ 5 is IvfIndexSpec's bound,
    // deterministic under the committed seed-42 quantizer.
    QueryDef(
      "ss5_ann_ivf",
      (s, d) => {
        import graft.operators.{IvfIndex, QuantizerCache}
        val emb = Tables.embeddings(s, d)
        val model = QuantizerCache.ivf(s, d, emb, nlist = 16)
        val q = emb.filter(col("vec_id") === 0)
          .select("embedding").collect()(0).getSeq[Float](0).toArray
        val assigned = IvfIndex.assign(emb, model).filter(col("vec_id") =!= 0)
        val ann = IvfIndex.probe(assigned, model, q, nprobe = 8, k = 10)
        val nAss = assigned.agg(count(lit(1)).as("n_assigned"))
        annContract(ann, emb.withColumn("f", fxCol), recallMin = 5)
          .crossJoin(nAss)
          .select(col("n_results"), col("n_assigned"), col("recall_ok"), col("exact_checksum"))
      },
      Some(s"""WITH $FxSql,
              |$ExactTop10Sql
              |SELECT CAST(10 AS BIGINT) AS n_results,
              |  (SELECT count(*) FROM fx WHERE vec_id <> 0) AS n_assigned,
              |  TRUE AS recall_ok,
              |  (SELECT exact_checksum FROM xc) AS exact_checksum""".stripMargin),
    ),

    // ss4 — cosine top-k. Free-order float summation is not portable,
    // but cosine OVER THE FIXED-POINT INTEGERS is: ip/na²/nq² are
    // exact BIGINTs in both engines, and the final
    // double(ip)/(sqrt(double(na²))·sqrt(double(nq²))) is a fixed
    // 4-op IEEE-754 expression (correctly-rounded convert, sqrt,
    // multiply, divide) — bit-identical in Spark and DuckDB. So the
    // conventional metric gets a full hash-checked oracle after all.
    QueryDef(
      "ss4_cosine_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d).withColumn("f", fxCol)
        val q = e.filter(col("vec_id") === 0).select(col("f").as("qf"))
        val cosine = ip(col("f"), col("qf")).cast("double") /
          (sqrt(ip(col("f"), col("f")).cast("double")) * sqrt(ip(col("qf"), col("qf")).cast("double")))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), cosine.as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH $FxSql,
              |q AS (SELECT f AS qf FROM fx WHERE vec_id = 0),
              |pos AS (SELECT e.vec_id, unnest(range(1, len(e.f)+1)) AS i, e.f AS f, q.qf AS qf
              |        FROM fx e CROSS JOIN q WHERE e.vec_id <> 0),
              |ips AS (SELECT vec_id,
              |          sum(f[i] * qf[i]) AS ip,
              |          sum(f[i] * f[i]) AS na2,
              |          sum(qf[i] * qf[i]) AS nq2
              |        FROM pos GROUP BY vec_id)
              |SELECT vec_id,
              |  CAST(ip AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nq2 AS DOUBLE))) AS cosine
              |FROM ips ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin),
    ),

    // ss6 — product-quantization ANN (operators.PqIndex): 32×-
    // compressed codes, ADC lookup-table scan for the shortlist, exact
    // fixed-point rerank on the shortlist only. Contract-oracled:
    // encode count + code well-formedness + exact top-10 checksum
    // recomputed by DuckDB; recall@10 ≥ 6 is PqIndexSpec's bound.
    QueryDef(
      "ss6_ann_pq",
      (s, d) => {
        import graft.operators.{PqIndex, QuantizerCache}
        val emb = Tables.embeddings(s, d)
        // the rerank shortlist is sized from the TRAIN-TIME corpus
        // stats persisted with the codebooks — no corpus count() on
        // the serve path (at 100 TB that is a full scan per query for
        // a property of the committed index)
        val (model, nIdx) = QuantizerCache.pqStats(s, d, emb, m = 8, ksub = 16)
        val q = emb.filter(col("vec_id") === 0)
          .select("embedding").collect()(0).getSeq[Float](0).toArray
        val enc = PqIndex.encode(emb.filter(col("vec_id") =!= 0), model)
        val ann = PqIndex.search(enc, model, q, shortlist = shortlistFor(nIdx), k = 10)
        val encStats = enc.agg(
          count(lit(1)).as("n_encoded"),
          min(size(col("code")) === 8 &&
            forall(col("code"), c => c >= 0 && c < 16)).as("codes_ok"))
        annContract(ann, emb.withColumn("f", fxCol), recallMin = 6)
          .crossJoin(encStats)
          .select(col("n_results"), col("n_encoded"), col("codes_ok"),
            col("recall_ok"), col("exact_checksum"))
      },
      Some(s"""WITH $FxSql,
              |$ExactTop10Sql
              |SELECT CAST(10 AS BIGINT) AS n_results,
              |  (SELECT count(*) FROM fx WHERE vec_id <> 0) AS n_encoded,
              |  TRUE AS codes_ok, TRUE AS recall_ok,
              |  (SELECT exact_checksum FROM xc) AS exact_checksum""".stripMargin),
    ),

    // ss10 — IVF-PQ composed ANN (operators.IvfPq): coarse routing +
    // PQ over residuals, per-list ⟨q,c⟩ bias + residual ADC lookups,
    // exact rerank of the shortlist only. Contract-oracled like ss5/
    // ss6; recall@10 ≥ 8 is IvfPqSpec's bound (the composed index is
    // the accurate one).
    QueryDef(
      "ss10_ann_ivfpq",
      (s, d) => {
        import graft.operators.{IvfPq, QuantizerCache}
        val emb = Tables.embeddings(s, d)
        // probe width + shortlist sized from the committed index's
        // train-time stats — no corpus count() on the serve path
        val (model, nIdx) = QuantizerCache.ivfPqStats(s, d, emb, nlist = 16, m = 8, ksub = 16)
        val q = emb.filter(col("vec_id") === 0)
          .select("embedding").collect()(0).getSeq[Float](0).toArray
        val enc = IvfPq.encode(emb.filter(col("vec_id") =!= 0), model)
        val ann = IvfPq.search(enc, model, q, nprobe = nprobeFor(nIdx, 16, 8),
          shortlist = shortlistFor(nIdx), k = 10)
        val encStats = enc.agg(
          count(lit(1)).as("n_encoded"),
          min(col("list_id") >= 0 && col("list_id") < 16 &&
            size(col("code")) === 8 &&
            forall(col("code"), c => c >= 0 && c < 16)).as("codes_ok"))
        annContract(ann, emb.withColumn("f", fxCol), recallMin = 8)
          .crossJoin(encStats)
          .select(col("n_results"), col("n_encoded"), col("codes_ok"),
            col("recall_ok"), col("exact_checksum"))
      },
      Some(s"""WITH $FxSql,
              |$ExactTop10Sql
              |SELECT CAST(10 AS BIGINT) AS n_results,
              |  (SELECT count(*) FROM fx WHERE vec_id <> 0) AS n_encoded,
              |  TRUE AS codes_ok, TRUE AS recall_ok,
              |  (SELECT exact_checksum FROM xc) AS exact_checksum""".stripMargin),
    ),

    // ss12 — GRAPH ANN (operators.GraphAnn): batched best-first search
    // over a symmetrized kNN graph (the HNSW/NSG family, single
    // layer), served from the COMMITTED id-bucketed stores — every hop
    // is one partition-pruned point read of the frontier's adjacency
    // buckets + one of the new candidates' vector buckets, shared by
    // all 4 queries in the batch; the driver never holds the graph.
    // Contract-oracled: DuckDB recomputes the 4-query exact top-10
    // checksum from the parquet corpus; recall ≥ 8/10 per query
    // (measured min 9/10 at every sf dir) and the structural
    // candidate-budget bound are deterministic under the committed
    // graph.
    QueryDef(
      "ss12_graph_ann",
      (s, d) => {
        import graft.operators.GraphAnn
        val e = Tables.embeddings(s, d).withColumn("f", fxCol).select("vec_id", "f")
        val qs = e.filter(col("vec_id") < 4).collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toSeq.sortBy(_._1)
        val base = e.filter(col("vec_id") >= 4)
        // The committed index: graph + coarse entry layer + the
        // id-bucketed serving stores (write-once, keyed by sf dir;
        // deterministic build).
        // degree 16 (HNSW's typical M): on near-random fixed-point
        // vectors degree 8 leaves the graph too sparse to navigate —
        // measured min recall@10 across the 4 queries: 2/10 at deg 8
        // vs 9/10 at deg 16 on the 2000-vector corpus
        val store = graphStoreFor(s, d, base)
        val entry = s.read.parquet(s"$store/entry").collect().map(_.getLong(0)).toSeq
        val (ann, budgets) = GraphAnn.searchStoredWithBudget(
          s, GraphAnn.StoredIndex(store, 64), qs, k = 10, ef = 48, maxExpand = 80,
          batch = 8, entryIds = entry)
        // exact 4-query spine for the contract (one batched pass)
        val qdf = e.filter(col("vec_id") < 4).select(col("vec_id").as("qid"), col("f").as("qf"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("ip").desc, col("vec_id").asc)
        val ex = base.crossJoin(broadcast(qdf))
          .select(col("qid"), col("vec_id"), ip(col("f"), col("qf")).as("ip"))
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        val exIds = ex.select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
        val annRows = ann.select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val allRecallOk = annRows.groupBy(_._1).forall { case (q, xs) =>
          xs.map(_._2).toSet.intersect(exIds.getOrElse(q, Set.empty)).size >= 8
        }
        // the budget bound is STRUCTURAL — entries + maxExpand·2·degree
        // scored vectors per query, independent of corpus size. That
        // absolute constant is the scale property (at 1M vectors it is
        // 0.3% of the table; a per-corpus fraction would be the wrong
        // claim at fixture size, where high recall on random data
        // necessarily touches a large share of 500 vectors).
        val budgetOk = budgets.values.forall(_ <= entry.size + 80L * 2 * 16)
        ex.agg(coalesce(expr("bit_xor(qid * 1000003 + vec_id * 97 + ip)"), lit(0L))
            .as("exact_checksum"))
          .select(lit(annRows.length.toLong).as("n_results"),
            lit(allRecallOk).as("all_recall_ok"), lit(budgetOk).as("budget_ok"),
            col("exact_checksum"))
      },
      Some(s"""WITH $FxSql,
              |q AS (SELECT vec_id AS qid, f AS qf FROM fx WHERE vec_id < 4),
              |pos AS (SELECT b.qid, a.vec_id, unnest(range(1, len(a.f)+1)) AS i,
              |               a.f AS f, b.qf AS qf
              |        FROM fx a CROSS JOIN q b WHERE a.vec_id >= 4),
              |ips AS (SELECT qid, vec_id, sum(f[i] * qf[i]) AS ip FROM pos GROUP BY qid, vec_id),
              |top AS (SELECT qid, vec_id, CAST(ip AS BIGINT) AS ip,
              |        row_number() OVER (PARTITION BY qid ORDER BY ip DESC, vec_id) AS rk FROM ips)
              |SELECT CAST(40 AS BIGINT) AS n_results, TRUE AS all_recall_ok, TRUE AS budget_ok,
              |  (SELECT CAST(COALESCE(bit_xor(qid * 1000003 + vec_id * 97 + ip), 0) AS BIGINT)
              |   FROM top WHERE rk <= 10) AS exact_checksum""".stripMargin),
    ),

    // ss_scale — similarity search at 200k vectors, executor-born: the
    // LSH bucket layout + probe path under real volume. Synthetic
    // 64-dim fixed-point vectors come from the PORTABLE Lehmer formula
    // (deterministic, no driver data — and re-derivable by the
    // oracle); the probe answers 8 query vectors in one pass (batched
    // shape) against sign-projection buckets — candidates per query ≈
    // n/256, never the table. FULLY oracled: DuckDB regenerates the
    // corpus, re-buckets it with the same inlined plane matrix,
    // re-ranks the probe and must land on the same count + checksum.
    QueryDef(
      "ss_scale_200k",
      (s, _) => {
        val n = 200000L
        val nPlanes = planesFor(n) // = 8 at 200k: n/2^8 ≈ 780 per bucket
        // 64 coords in [-500, 500], fixed-point integers (f directly)
        val vecs = s.range(n).select(col("id").as("vec_id"),
          array((1 to Dims).map(scaleCoord): _*).as("f"))
        // no persist: sig is pure codegen over executor-born rows — the
        // tiny query side recomputes it for 8 rows instead of pinning
        // the whole signed corpus in the long-lived bench JVM's cache
        val sig = vecs.withColumn("bucket", sigColN(nPlanes))
        val q = sig.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("f").as("qf"), col("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("ip").desc, col("vec_id").asc)
        val top = sig.filter(col("vec_id") >= 8)
          .join(broadcast(q), Seq("bucket"))
          .select(col("qid"), col("vec_id"), ip(col("f"), col("qf")).as("ip"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
        top.agg(
          count(lit(1)).as("n_results"),
          coalesce(expr(s"bit_xor($ChecksumTerm)"), lit(0L)).as("checksum"))
      },
      Some {
        val (ctes, summary) = ssScaleOracle(200000L, planesFor(200000L))
        s"WITH $ctes\n$summary"
      },
    ),

    // ss_scale_1m — the signature-width knob proven at 1M vectors:
    // planesFor(1M) widens the signature to 10 bits (1024 buckets), so
    // expected occupancy stays ≈ n/2^p ≤ 1024 instead of growing
    // linearly (and Σ bucket² candidate work quadratically) at a fixed
    // width. The output is correctness-carrying: result count + id
    // checksum PLUS the occupancy bound itself — `occupancy_ok` pins
    // max bucket ≤ 4× the target cap, so a regression to fixed-width
    // behavior (977k-row buckets) fails the row hash, not just a
    // timer. Widening is refinement: the plane matrix of width p is a
    // prefix of width p' > p, so buckets only ever split.
    QueryDef(
      "ss_scale_1m",
      (s, _) => {
        val n = 1000000L
        val cap = 1024L
        val nPlanes = planesFor(n, cap) // = 10 at 1M
        val vecs = s.range(n).select(col("id").as("vec_id"),
          array((1 to Dims).map(scaleCoord): _*).as("f"))
        // the coord+signature lineage is the expensive pass at 1M rows;
        // persist it ONCE and fan the occupancy / query / candidate
        // branches off the cache instead of re-deriving it per branch
        val sig = vecs.withColumn("bucket", sigColN(nPlanes)).persist()
        val occupancy = sig.groupBy("bucket").agg(count(lit(1)).as("bn"))
          .agg(max("bn").as("max_bucket"), count(lit(1)).as("n_buckets"))
        val q = sig.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("f").as("qf"), col("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("ip").desc, col("vec_id").asc)
        val top = sig.filter(col("vec_id") >= 8)
          .join(broadcast(q), Seq("bucket"))
          .select(col("qid"), col("vec_id"), ip(col("f"), col("qf")).as("ip"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
        val res = top.agg(
          count(lit(1)).as("n_results"),
          coalesce(expr(s"bit_xor($ChecksumTerm)"), lit(0L)).as("checksum"))
          .crossJoin(occupancy)
          .select(col("n_results"), col("checksum"), lit(nPlanes).as("planes"),
            col("n_buckets"), col("max_bucket"),
            (col("max_bucket") <= cap * 4).as("occupancy_ok"))
          .localCheckpoint()
        sig.unpersist(blocking = true) // 1M-row cache: cleanup stays in this query, not the next
        res
      },
      Some {
        val nPlanes = planesFor(1000000L, 1024L)
        val (ctes, summary) = ssScaleOracle(1000000L, nPlanes)
        s"""WITH $ctes,
           |occ AS (SELECT count(*) AS n_buckets, CAST(max(bn) AS BIGINT) AS max_bucket FROM (
           |  SELECT bucket, count(*) AS bn FROM sig GROUP BY bucket) b),
           |summ AS ($summary)
           |SELECT s.n_results, s.checksum, CAST($nPlanes AS INTEGER) AS planes,
           |  o.n_buckets, o.max_bucket, o.max_bucket <= 4096 AS occupancy_ok
           |FROM summ s, occ o""".stripMargin
      },
    ),

    // ss_recall_1m — MEASURED ground-truth recall at the 1M rung (the
    // scale rows' planted contracts prove plumbing; this row measures
    // what the served index actually recovers on the un-planted
    // corpus). 200 held-out queries; EXACT integer-IP top-10 per query
    // from ONE batched scan (broadcast query side + WindowGroupLimit:
    // each map task keeps its local per-query top-10, so the shuffle
    // carries 64k survivor rows, never the 200M scored pairs); the
    // SERVED side is the multiprobe LSH route at TWO operating
    // points — hamming-radius-1 (11 of 1024 buckets ≈ 1.1% of the
    // corpus per query) and radius-2 (56 buckets ≈ 5.5%) — so the row
    // records the measured recall/budget CURVE, not one cherry-picked
    // point. Everything is deterministic (fixed corpus formula, fixed
    // planes, total tie orders), so the measured hit counts are exact
    // constants the oracle pins outright: 719/2000 = 0.36 recall@10
    // at a 1.1% scan, 1282/2000 = 0.64 at 5.5% — the random-direction
    // corpus is sign-LSH's hard case, and THIS row documents that
    // truth where the planted rungs document the plumbing.
    QueryDef(
      "ss_recall_1m",
      (s, _) => {
        val n = 1000000L
        val nq = 200L
        val k = 10
        val nPlanes = planesFor(n) // 10 ⇒ 1024 buckets
        val vecs = s.range(n).select(col("id").as("vec_id"),
          array((1 to Dims).map(scaleCoord): _*).as("f"))
        val sig = vecs.withColumn("bucket", sigColN(nPlanes))
        val corpus = sig.filter(col("vec_id") >= nq)
        val q = sig.filter(col("vec_id") < nq)
          .select(col("vec_id").as("qid"), col("f").as("qf"), col("bucket"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("ip").desc, col("vec_id").asc)
        // EXACT ground truth, one batched scan: the 200 query vectors
        // broadcast as primitive arrays; each partition keeps a
        // bounded per-query top-10 in a tight long-array loop (the
        // declarative crossJoin form scored the same 200M pairs
        // through per-pair array allocations — measured 425 s; this
        // kernel does identical integer arithmetic at memory speed
        // and ships 32 partitions × 200 × 10 survivor rows), then one
        // global rank merges partition-local winners. Same total tie
        // order (ip desc, vec_id asc) ⇒ bit-identical result at any
        // partition count.
        import s.implicits._
        val qArrs = q.select(col("qid"), col("qf")).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
          .sortBy(_._1)
        val bcQ = s.sparkContext.broadcast(qArrs)
        val localTop = corpus.select(col("vec_id"), col("f")).as[(Long, Seq[Long])]
          .mapPartitions { it =>
            val qs = bcQ.value
            val m = qs.length
            val topIp = Array.fill(m)(new Array[Long](k))
            val topId = Array.fill(m)(new Array[Long](k))
            val topN = new Array[Int](m)
            it.foreach { case (vid, fSeq) =>
              val f = fSeq.toArray
              var qi = 0
              while (qi < m) {
                val qf = qs(qi)._2
                var ipAcc = 0L; var d = 0
                while (d < f.length) { ipAcc += f(d) * qf(d); d += 1 }
                val tn = topN(qi)
                val ti = topIp(qi); val td = topId(qi)
                if (tn < k || ipAcc > ti(tn - 1) || (ipAcc == ti(tn - 1) && vid < td(tn - 1))) {
                  var j = if (tn < k) tn else k - 1
                  while (j > 0 && (ti(j - 1) < ipAcc || (ti(j - 1) == ipAcc && td(j - 1) > vid))) {
                    ti(j) = ti(j - 1); td(j) = td(j - 1); j -= 1
                  }
                  ti(j) = ipAcc; td(j) = vid
                  if (tn < k) topN(qi) += 1
                }
                qi += 1
              }
            }
            (0 until m).iterator.flatMap(qi =>
              (0 until topN(qi)).map(j => (qs(qi)._1, topId(qi)(j), topIp(qi)(j))))
          }.toDF("qid", "vec_id", "ip")
        val exact = localTop
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
          .select("qid", "vec_id").persist()
        // probe buckets with their hamming distance from the home
        // bucket (tiny query side — 200 rows × ≤56 probes; the
        // corpus-side equi-join below is the scale path)
        val probeGen = udf((b: String) => {
          def fl(x: String, i: Int) = x.updated(i, if (x(i) == '1') '0' else '1')
          val r1 = (0 until b.length).map(i => (fl(b, i), 1))
          val r2 = for { i <- 0 until b.length; j <- (i + 1) until b.length }
            yield (fl(fl(b, i), j), 2)
          ((b, 0) +: (r1 ++ r2)).distinct
        })
        val probes = q.select(col("qid"), col("qf"),
            explode(probeGen(col("bucket"))).as("p"))
          .select(col("qid"), col("qf"), col("p._1").as("bucket"), col("p._2").as("dist"))
        val candidates = corpus.join(broadcast(probes), Seq("bucket"))
          .select(col("qid"), col("vec_id"), col("dist"),
            ip(col("f"), col("qf")).as("ip"))
          .persist()
        val nCand1 = candidates.filter(col("dist") <= 1).count()
        val nCand2 = candidates.count()
        def hitsAt(maxDist: Int): Long = candidates.filter(col("dist") <= maxDist)
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
          .select("qid", "vec_id")
          .join(exact, Seq("qid", "vec_id")).count()
        val hits1 = hitsAt(1)
        val hits2 = hitsAt(2)
        candidates.unpersist()
        exact.unpersist()
        System.err.println(s"[ss_recall_1m] r1=$hits1/$nCand1 r2=$hits2/$nCand2")
        s.range(1).select(lit(nq).as("n_queries"),
          lit(nCand1).as("n_candidates_r1"), lit(hits1).as("n_hits_r1"),
          lit(nCand2).as("n_candidates_r2"), lit(hits2).as("n_hits_r2"),
          (lit(hits1) >= lit(700L) && lit(hits2) >= lit(1250L)).as("recall_ok"),
          (lit(nCand2) <= lit(n / 100L * 6L * nq)).as("budget_ok")) // ≤6% of corpus per query
      },
      Some("""SELECT CAST(200 AS BIGINT) AS n_queries,
             |  CAST(2553038 AS BIGINT) AS n_candidates_r1,
             |  CAST(719 AS BIGINT) AS n_hits_r1,
             |  CAST(11983810 AS BIGINT) AS n_candidates_r2,
             |  CAST(1282 AS BIGINT) AS n_hits_r2,
             |  TRUE AS recall_ok, TRUE AS budget_ok
             |FROM (SELECT 1)""".stripMargin),
      headline = true,
    ),

    // ss_scale_5m — the similarity family's NEXT DECADE: 5M vectors
    // through the sign-projection bucket + probe path, with BOTH scale
    // lessons applied at once. (1) planesFor sizes itself: 13 planes ⇒
    // 8192 buckets, expected occupancy ≈ 610 — a fixed 8-bit width
    // would put ~20k rows in every bucket and make the probe
    // quadratic. (2) The signature is the fused `lsh_scale_vec` native
    // expression ([[graft.core.LshScale]]): unrolled to SQL, 13 planes
    // × 64 ± reads over 64 Lehmer coordinate chains is an ~850-term
    // projection — the same JIT-width cliff dd_scale_10m measured —
    // so the kernel emits (bucket, c1..c64) as one compact call and
    // the corpus is never materialized: the probe is ONE streamed
    // pass (corpus ⋈ broadcast 8-query side), occupancy a second.
    //
    // PLANTED-CONTRACT oracle (the dd_scale_10m discipline — no 5M
    // corpus regeneration in DuckDB): ids 8+10q+r are exact integer
    // scalings of query q by (1000−r)/1000, so they provably share
    // q's bucket, their inner products are |q|²·(1000−r)/1000 in
    // strictly decreasing r-order, and nothing random approaches
    // 0.991·|q|². DuckDB regenerates ONLY those 80 planted rows from
    // the formula, recomputes their exact ips, and the checksum
    // matches iff the measured top-10 per query is exactly the
    // planted set with exactly those ips.
    QueryDef(
      "ss_scale_5m",
      (s, _) => {
        val n = 5000000L
        val cap = 1024L
        val nPlanes = planesFor(n, cap) // = 13 at 5M
        def vecs = s.range(n)
          .select(col("id").as("vec_id"), expr(s"lsh_scale_vec(id, $nPlanes)").as("x"))
          .select(col("vec_id"), expr("x[0]").as("bucket"),
            expr("slice(x, 2, 64)").as("f"))
        val q = s.range(8)
          .select(col("id").as("qid"), expr(s"lsh_scale_vec(id, $nPlanes)").as("x"))
          .select(col("qid"), expr("x[0]").as("bucket"), expr("slice(x, 2, 64)").as("qf"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("ip").desc, col("vec_id").asc)
        val top = vecs.filter(col("vec_id") >= 8)
          .join(broadcast(q), Seq("bucket"))
          .select(col("qid"), col("vec_id"), ip(col("f"), col("qf")).as("ip"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
        // occupancy CONTRACT, sized to the quadratic-Lehmer mix's
        // measured tail (max 5902 = 5.8×cap, 7 of 8192 buckets above
        // 4×cap): the BULK bound is the knob's claim — at most 1% of
        // buckets exceed 4×cap — and the MAX gets a tail cushion of
        // 8×cap (a regression to fixed-width behavior is ~19.5k-row
        // buckets, 5× past the cushion; both booleans are exact
        // aggregates, no approx sketch in a contract)
        val occupancy = vecs.groupBy("bucket").agg(count(lit(1)).as("bn"))
          .agg(max("bn").as("max_bucket"), count(lit(1)).as("n_buckets"),
            sum(when(col("bn") > cap * 4, 1L).otherwise(0L)).as("heavy"))
        top.agg(
          count(lit(1)).as("n_results"),
          coalesce(expr(s"bit_xor($ChecksumTerm)"), lit(0L)).as("checksum"))
          .crossJoin(occupancy)
          .select(col("n_results"), col("checksum"), lit(nPlanes).as("planes"),
            (col("max_bucket") <= cap * 8).as("occupancy_ok"),
            (col("heavy") * 100L <= col("n_buckets")).as("heavy_ok"),
            (col("n_buckets") <= (1L << nPlanes)).as("buckets_ok"))
      },
      Some {
        val nPlanes = planesFor(5000000L, 1024L)
        s"""WITH q AS (SELECT CAST(unnest(range(8)) AS BIGINT) AS qid),
           |r AS (SELECT CAST(unnest(range(10)) AS BIGINT) AS r),
           |dims AS (SELECT CAST(unnest(range(1, 65)) AS BIGINT) AS j),
           |c0 AS (SELECT qid, j, (qid*1299709 + j*104395301) % 2147483647 AS h1 FROM q, dims),
           |c1 AS (SELECT qid, j, h1, (h1*48271) % 2147483647 AS h2 FROM c0),
           |c2 AS (SELECT qid, j, ((h2*h2 + h1) % 2147483647) AS h3 FROM c1),
           |coords AS (SELECT qid, j, ((h3*48271) % 2147483647 % 1001 - 500) * 10000 AS c FROM c2),
           |ips AS (SELECT co.qid, 8 + co.qid*10 + r.r AS vec_id,
           |          SUM(co.c * (co.c // 1000 * (1000 - r.r))) AS ip
           |        FROM coords co, r GROUP BY co.qid, r.r)
           |SELECT CAST(80 AS BIGINT) AS n_results,
           |  CAST(COALESCE(bit_xor(qid * 1000003 + vec_id * 97 + ip), 0) AS BIGINT) AS checksum,
           |  CAST($nPlanes AS INTEGER) AS planes,
           |  TRUE AS occupancy_ok, TRUE AS heavy_ok, TRUE AS buckets_ok
           |FROM ips""".stripMargin
      },
    ),

    // ss_serve_scale — EXECUTOR-SIDE batched graph-ANN serving at the
    // offline-inference shape: 100k queries against a committed
    // 1M-vector graph store. The driver-loop path
    // (searchStoredWithBudget) is the right tool for interactive
    // trickle traffic; an offline batch pays shards × hops × 2 jobs
    // with candidate vectors staged through the driver. Here the
    // committed store is snapshot ONCE into a broadcast CSR
    // (~0.5 GB at this size, under the documented cap) and every
    // query's greedy descent runs inside mapPartitions
    // (GraphAnn.searchStoredDistributed) — zero Spark jobs per hop,
    // queries never leave the executors, per-query wall flat in the
    // batch size. Beyond the cap the corpus shards into per-shard
    // stores with a top-k merge (documented in GraphAnn).
    //
    // Contract: (1) sample_equals_driver — a deterministic 256-query
    // sample re-served through the driver path must be BIT-EQUAL
    // (GraphAnnSpec pins the same equality at both metrics on a
    // real store); (2) self_ok — queries ARE corpus vectors, so under
    // the L2 metric the greedy descent must navigate home (score 0)
    // for ≥90% of 100k queries; (3) every query returns exactly k
    // rows. The navigability ladder, measured on this corpus:
    // 3 LSH tables/no refine/32 entries/budget 96 → 24.4%; 8 tables +
    // 128 entries → 49.8%; +1 NN-descent round (refined graphs LOSE
    // the LSH long links, so at budget 96 refinement alone DROPPED to
    // 45.4%) with budget 192 → 79.4%; + the 1024-entry coarse layer →
    // 92.9% (pinned ≥90%). All deterministic: corpus, build, entries
    // and traversal share fixed seeds and total tie rules, so the
    // pinned floor is an exact constant, not a statistical bound.
    QueryDef(
      "ss_serve_scale",
      (s, _) => {
        import graft.operators.GraphAnn
        val n = 1000000L
        val nq = 100000L
        val nB = 64
        // 16-dim integer coordinates in [-2^20, 2^20] from the Lehmer
        // chain every other scale corpus uses — a PROPER per-(vid, j)
        // mixer. (First attempt was (A·vid + B·j) mod 2^21 — linear in
        // j, so the corpus sat on a 1-D lattice, the sign-projection
        // build buckets skewed by orders of magnitude, and the
        // bucket-local all-pairs pass blew up: a graph build assumes
        // angular spread, and the corpus must supply it.) d² and ip
        // both stay far inside Long; the Scala twin feeds the
        // driver-path sample bit-equality check.
        def coordExpr(idCol: String, j: Int) = {
          val x = s"($idCol * 16 + $j)"
          expr(s"CAST((((((($x * 1299709 + 104729) % 2147483647) * 48271 % 2147483647) * " +
            s"((($x * 1299709 + 104729) % 2147483647) * 48271 % 2147483647) + " +
            s"(($x * 1299709 + 104729) % 2147483647)) % 2147483647) * 48271 % 2147483647) " +
            "% 2097153 - 1048576 AS BIGINT)")
        }
        def coordOf(vid: Long, j: Int): Long = {
          val x = vid * 16 + j
          val h1 = (x * 1299709L + 104729L) % 2147483647L
          val h2 = h1 * 48271L % 2147483647L
          val h3 = (h2 * h2 + h1) % 2147483647L
          h3 * 48271L % 2147483647L % 2097153L - 1048576L
        }
        val vecs = s.range(n).select(col("id").as("vec_id"),
          array((0 until 16).map(j => coordExpr("id", j)): _*).as("f"))
        val canon = s"gserve|${GraphAnn.BuildVersion}|n=$n|dims=16" +
          "|mix=lehmer-q16-2097153|deg=16|nB=64|entry=connected-p10|refine=1|tables=8"
        val store = new java.io.File(s"target/gstore/serve_${storeTag(canon)}").getAbsolutePath
        publishStore(store) { tmp =>
          val cached = vecs.persist()
          // The navigability ladder, measured on this corpus at the
          // ss15-class search budget below: 3 LSH tables, no
          // refinement → 24% of self-queries navigate home; 8 tables
          // + the wider entry layer → 50%; + one NN-descent round
          // (broadcast-snapshot scoring — candidate IDs shuffle,
          // vector payloads never do) → the pinned contract. Greedy
          // descent on an unrefined LSH graph simply lacks the
          // proximity gradient; refinement is load-bearing, and the
          // broadcast form is what makes it affordable at 1M.
          val g = GraphAnn.buildGraph(cached, degree = 16, dims = 16,
            tables = 8, refine = 1).persist()
          GraphAnn.writeStores(cached, g, tmp, nB)
          // nPlanes = 10 ⇒ up to 1024 coarse entries: at 1M vectors
          // a 32-entry layer starts the descent too far from most
          // queries; entries are one shared broadcast scored once per
          // query (1024 × 16-dim ips ≈ a sixth of the expansion
          // budget), so width is the cheapest navigability knob
          GraphAnn.buildEntryLayerConnected(cached, g, nPlanes = 10, dims = 16)
            .localCheckpoint(eager = true)
            .write.mode("overwrite").parquet(s"$tmp/entry")
          g.unpersist(); cached.unpersist(): Unit
        }
        val st = GraphAnn.StoredIndex(store, nB)
        val entry = s.read.parquet(s"$store/entry").collect().map(_.getLong(0)).toSeq
        val queries = s.range(nq).select(col("id").as("qid"),
          array((0 until 16).map(j => coordExpr("id", j)): _*).as("q"))
        val res = GraphAnn.searchStoredDistributed(s, st, queries, k = 10,
          ef = 64, maxExpand = 192, batch = 8, entryIds = entry, metric = "l2").persist()
        val nRes = res.count()
        val selfFound = res.filter(col("vec_id") === col("qid") && col("score") === 0L).count()
        System.err.println(s"[ss_serve_scale] self_found=$selfFound/$nq nRes=$nRes")
        val sampleIds = (0L until 256L).map(_ * (nq / 256L))
        val sampleQs = sampleIds.map(q => q -> Array.tabulate(16)(j => coordOf(q, j)))
        val driver = GraphAnn.searchStoredWithBudget(s, st, sampleQs, k = 10,
            ef = 64, maxExpand = 192, batch = 8, entryIds = entry, metric = "l2")._1
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val distSample = res.filter(col("qid").isin(sampleIds: _*))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        res.unpersist()
        s.range(1).select(
          lit(nq).as("n_queries"),
          lit(nRes).as("n_results"),
          lit(selfFound * 100L >= nq * 90L).as("self_ok"),
          lit(driver == distSample).as("sample_equals_driver"))
      },
      Some("""SELECT CAST(100000 AS BIGINT) AS n_queries,
             |  CAST(1000000 AS BIGINT) AS n_results,
             |  TRUE AS self_ok, TRUE AS sample_equals_driver
             |FROM (SELECT 1)""".stripMargin),
      headline = true,
    ),

    // ss11 — DIVERSITY sampling: k-means-cluster the embedding space
    // (bounded-sample fit, same cap discipline as ss5) and take the
    // top-3 vectors per cluster by norm — cluster-stratified selection,
    // the third member of the sampling family (d6 balanced-by-class,
    // d11 weighted-by-quality, ss11 diverse-by-embedding): guarantees
    // every region of the space is represented instead of letting a
    // dense mode dominate.
    // Contract-oracled via an invariant that holds under ANY
    // clustering: each global top-i-by-norm vector (i ≤ 3) has at most
    // i−1 higher-norm vectors in its own cluster, so the global top-3
    // are ALWAYS selected — DuckDB recomputes their identity + norm
    // checksum from the parquet corpus, and the checksum is taken over
    // the SELECTED rows, so a selection that misses one fails the hash.
    QueryDef(
      "ss11_diverse_sample",
      (s, d) => {
        import graft.operators.{IvfIndex, QuantizerCache}
        val emb = Tables.embeddings(s, d)
        val model = QuantizerCache.ivf(s, d, emb, nlist = 16)
        val assigned = IvfIndex.assign(emb, model).withColumn("f", fxCol)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("list_id").orderBy(col("norm2").desc, col("vec_id").asc)
        val sel = assigned
          .withColumn("norm2", ip(col("f"), col("f")))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("list_id", "rk", "vec_id", "norm2")
        val top3 = emb.withColumn("f", fxCol)
          .select(col("vec_id"), ip(col("f"), col("f")).as("norm2"))
          .orderBy(col("norm2").desc, col("vec_id").asc).limit(3)
        val nVec = emb.agg(count(lit(1)).as("n_vectors"))
        val selStats = sel.agg(count(lit(1)).as("n_selected"))
        val perList = sel.groupBy("list_id").agg(count(lit(1)).as("c"))
          .agg(max("c").as("max_per_list"))
        val hit = sel.join(top3.select("vec_id"), Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_top3_found"),
            coalesce(expr("bit_xor(vec_id * 97 + norm2)"), lit(0L)).as("top3_checksum"))
        nVec.crossJoin(selStats).crossJoin(perList).crossJoin(hit)
          .select(col("n_vectors"),
            (col("n_selected") >= 3 && col("n_selected") <= 48).as("n_selected_ok"),
            (col("max_per_list") <= 3).as("per_list_ok"),
            (col("n_top3_found") === 3).as("top3_ok"),
            col("top3_checksum"))
      },
      Some(s"""WITH $FxSql,
              |pos AS (SELECT vec_id, unnest(range(1, len(f)+1)) AS i, f FROM fx),
              |n2 AS (SELECT vec_id, sum(f[i] * f[i]) AS norm2 FROM pos GROUP BY vec_id),
              |top3 AS (SELECT vec_id, CAST(norm2 AS BIGINT) AS norm2 FROM n2
              |         ORDER BY norm2 DESC, vec_id LIMIT 3)
              |SELECT (SELECT count(*) FROM fx) AS n_vectors,
              |  TRUE AS n_selected_ok, TRUE AS per_list_ok, TRUE AS top3_ok,
              |  (SELECT CAST(COALESCE(bit_xor(vec_id * 97 + norm2), 0) AS BIGINT) FROM top3)
              |    AS top3_checksum""".stripMargin),
    ),

    // mm2 — the typed-Dataset twin of mm1: binary payloads through a
    // mapPartitions decoder (ImageIO pixels for decodable payloads,
    // deterministic synthetic metadata otherwise — the shape a JNI/FFI
    // media decoder). The keccak-derived metadata itself is not
    // SQL-expressible (goldens live in MultimodalSpec), but the
    // PLUMBING is oracled: per-row byte counts recomputed by DuckDB
    // (octet_length of the same UTF-8 payload — proves every document
    // flowed through the decoder exactly once with the right bytes),
    // plus domain contracts on the synthetic fallback's ranges.
    QueryDef(
      "mm2_decode_partitions",
      (s, d) => graft.multimodal.Multimodal
        .extractMeta(graft.multimodal.Multimodal.fromDocuments(s, d))
        .toDF()
        .select(
          col("doc_id"), col("n_bytes"),
          (col("width").between(64, 1087) && col("height").between(64, 1087)).as("dims_ok"),
          col("format").isin("jpeg", "png", "webp").as("format_ok"),
          (length(col("phash")) === 16).as("phash_ok"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             |  TRUE AS dims_ok, TRUE AS format_ok, TRUE AS phash_ok
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // mm3 — REAL container-header extraction: forged-but-valid
    // PNG/JPEG/GIF/WAV payloads parsed byte-level (MediaParsers — no
    // codec libs needed for structural metadata). Per-format summary;
    // deterministic. Golden-tested in MultimodalSpec.
    QueryDef(
      "mm3_container_meta",
      (s, _) => graft.multimodal.Multimodal
        .extractContainerMeta(graft.multimodal.Multimodal.mediaFixture(s, 400))
        .toDF()
        .groupBy("format")
        .agg(count(lit(1)).as("n"), sum(when(col("parsed"), 1L).otherwise(0L)).as("n_parsed"),
          max("width").as("max_w"), max("height").as("max_h"),
          max("sample_rate").as("max_rate"))
        .orderBy("format"),
      // cross-check like mm4: Spark forges real container bytes and
      // parses them back; the oracle recomputes the expected metadata
      // from the fixture arithmetic — agreement proves the
      // writer/parser pair per format (PNG/JPEG/GIF headers, WAV).
      Some("""WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 400)),
             |m AS (SELECT i,
             |  CASE i % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif' ELSE 'wav' END AS format,
             |  CASE i % 4 WHEN 0 THEN 16 + i % 64 WHEN 1 THEN 32 + i % 128
             |       WHEN 2 THEN 8 + i % 32 ELSE -1 END AS w,
             |  CASE i % 4 WHEN 0 THEN 16 + (i * 7) % 64 WHEN 1 THEN 32 + (i * 3) % 128
             |       WHEN 2 THEN 8 + (i * 5) % 32 ELSE -1 END AS h,
             |  CASE i % 4 WHEN 3 THEN 8000 + (i % 3) * 4000 ELSE -1 END AS rate
             |  FROM ids)
             |SELECT format, count(*) AS n, count(*) AS n_parsed,
             |  CAST(max(w) AS INTEGER) AS max_w, CAST(max(h) AS INTEGER) AS max_h,
             |  CAST(max(rate) AS INTEGER) AS max_rate
             |FROM m GROUP BY format ORDER BY format""".stripMargin),
    ),

    // mm4 — audio windowing driven by REAL WAV headers: window
    // offsets derive from the parsed sample rate; decode-in-window
    // stays synthetic (text stand-ins). One row per (doc, window). Oracled as a
    // genuine cross-check: the Spark path forges real WAV bytes
    // (MediaParsers.makeWav) and PARSES them back; the oracle
    // recomputes the expected windows from the fixture arithmetic
    // directly — agreement proves the byte-level writer/parser pair
    // and the windowing math together.
    QueryDef(
      "mm4_audio_windows",
      (s, _) => graft.multimodal.Multimodal
        .audioWindows(graft.multimodal.Multimodal.mediaFixture(s, 400), windowSeconds = 0.25)
        .toDF()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"), sum("n_samples").as("total_samples"))
        .orderBy("doc_id"),
      Some("""WITH ids AS (
             |  SELECT CAST(range AS BIGINT) AS doc_id FROM range(0, 400) WHERE range % 4 = 3),
             |w AS (SELECT doc_id,
             |  (8000 + (doc_id % 3) * 4000) // 4 AS per_window,
             |  8000 + (doc_id % 5) * 4000 AS n_samples FROM ids)
             |SELECT doc_id,
             |  CAST((n_samples + per_window - 1) // per_window AS BIGINT) AS n_windows,
             |  CAST(n_samples AS BIGINT) AS total_samples
             |FROM w ORDER BY doc_id""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // mm1 — multimodal metadata extraction over an opaque payload:
    // the decode step is deterministic synthesis (md5-derived fake
    // dimensions — the real image/audio libs are not in this
    // container), but the Spark-side shape is the real thing: binary
    // payload column in, typed (width, height, format, n_frames)
    // columns out, fully codegen'd, no UDF.
    QueryDef(
      "mm1_multimodal_meta",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), length(col("text")).as("n_bytes"), md5(col("text").cast("binary")).as("h"))
        .select(
          col("doc_id"),
          col("n_bytes").cast("long").as("n_bytes"),
          expr(s"CAST(64 + ${hex4("h", 1)} % 1024 AS BIGINT)").as("width"),
          expr(s"CAST(64 + ${hex4("h", 5)} % 1024 AS BIGINT)").as("height"),
          expr(s"CASE ${hex4("h", 9)} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END").as("format"),
          expr(s"CAST(1 + ${hex4("h", 13)} % 240 AS BIGINT)").as("n_frames"))
        .orderBy("doc_id"),
      Some(s"""WITH h AS (SELECT doc_id, length(text) AS n_bytes, md5(text) AS h FROM documents)
              |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
              |  CAST(64 + ${hex4("h", 1)} % 1024 AS BIGINT) AS width,
              |  CAST(64 + ${hex4("h", 5)} % 1024 AS BIGINT) AS height,
              |  CASE ${hex4("h", 9)} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
              |  CAST(1 + ${hex4("h", 13)} % 240 AS BIGINT) AS n_frames
              |FROM h ORDER BY doc_id""".stripMargin),
    ),

    // mm6 — every-Nth frame sampling over a fixed-stride payload (raw
    // video shape): the Multimodal.sampleFrames operator's offset math
    // (frame grid over the byte payload, stride sampling) is pure
    // arithmetic, so the whole operator is oracle-checked; only the
    // per-frame pixel decode (real for image payloads — see mm7). 64-byte
    // frames, every 4th sampled.
    QueryDef(
      "mm6_frame_sample",
      (s, d) => graft.multimodal.Multimodal
        .sampleFrames(graft.multimodal.Multimodal.fromDocuments(s, d), frameBytes = 64, everyNth = 4)
        .toDF()
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("byte_offset"), col("byte_len").cast("long").as("byte_len"))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH sized AS (
             |  SELECT doc_id, octet_length(encode(text)) // 64 AS n_frames FROM documents),
             |frames AS (
             |  SELECT doc_id, unnest(range(0, n_frames, 4)) AS frame_idx
             |  FROM sized WHERE n_frames > 0)
             |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
             |  CAST(frame_idx * 64 AS BIGINT) AS byte_offset, CAST(64 AS BIGINT) AS byte_len
             |FROM frames ORDER BY doc_id, frame_idx""".stripMargin),
    ),

    // mm5 — perceptual-hash near-dup over the image stand-ins: the
    // image dedup path (aHash/pHash → hamming) run entirely in SQL
    // expressions. The 64-bit hash is carried as two 32-bit halves
    // (portable BIGINT arithmetic), candidates come from the
    // pigeonhole 4×16-bit block equi-join (any pair within hamming 3
    // agrees on ≥1 block — perfect recall, never O(n²)), and the
    // exact hamming filter runs only on candidates. "Re-encoded"
    // variants are planted in-query: docs with id%50∈{1,2} take their
    // leader's hash with 1 or 3 deterministically-flipped bits — the
    // fixture models slightly-perturbed copies of the same image, and
    // being md5-derived it is reproduced bit-for-bit by the oracle.
    QueryDef(
      "mm5_phash_neardup",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
        val sig0 = base.select(col("doc_id"),
          expr(s"CAST(${hex8("h", 1)} AS BIGINT)").as("hi0"),
          expr(s"CAST(${hex8("h", 9)} AS BIGINT)").as("lo0"),
          expr("CAST(CASE WHEN doc_id % 50 IN (1,2) THEN doc_id - doc_id % 50 ELSE doc_id END AS BIGINT)").as("leader"))
        val leaders = sig0.select(col("doc_id").as("lid"), col("hi0").as("lhi"), col("lo0").as("llo"))
        val sig = sig0.join(leaders, col("leader") === col("lid"))
          .select(col("doc_id"),
            expr("""CASE WHEN doc_id % 50 = 2 THEN lhi ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))
                         WHEN doc_id % 50 = 1 THEN lhi ELSE hi0 END""").as("hi"),
            expr("""CASE WHEN doc_id % 50 = 1 THEN llo ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 29 AS INT))
                         WHEN doc_id % 50 = 2 THEN llo ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 7 AS INT))
                                                    ^ shiftleft(CAST(1 AS BIGINT), CAST(7 + doc_id % 11 AS INT))
                         ELSE lo0 END""").as("lo"))
        val blk = sig.select(col("doc_id"), col("hi"), col("lo"),
          explode(sequence(lit(0), lit(3))).as("k"))
          .withColumn("blk", expr(
            "CASE k WHEN 0 THEN hi div 65536 WHEN 1 THEN hi % 65536 WHEN 2 THEN lo div 65536 ELSE lo % 65536 END"))
        blk.select(col("doc_id").as("doc_a"), col("hi").as("ha"), col("lo").as("la"), col("k"), col("blk"))
          .join(blk.select(col("doc_id").as("doc_b"), col("hi").as("hb"), col("lo").as("lb"), col("k"), col("blk")),
            Seq("k", "blk"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            expr("CAST(bit_count(ha ^ hb) + bit_count(la ^ lb) AS BIGINT)").as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH base AS (SELECT doc_id, md5(text) AS h FROM documents),
              |sig0 AS (SELECT doc_id,
              |  CAST(${hex8("h", 1)} AS BIGINT) AS hi0,
              |  CAST(${hex8("h", 9)} AS BIGINT) AS lo0,
              |  CAST(CASE WHEN doc_id % 50 IN (1,2) THEN doc_id - doc_id % 50 ELSE doc_id END AS BIGINT) AS leader
              |  FROM base),
              |sig AS (SELECT s.doc_id,
              |  CASE WHEN s.doc_id % 50 = 2 THEN xor(l.hi0, CAST(1 AS BIGINT) << CAST(s.doc_id % 13 AS INT))
              |       WHEN s.doc_id % 50 = 1 THEN l.hi0 ELSE s.hi0 END AS hi,
              |  CASE WHEN s.doc_id % 50 = 1 THEN xor(l.lo0, CAST(1 AS BIGINT) << CAST(s.doc_id % 29 AS INT))
              |       WHEN s.doc_id % 50 = 2 THEN xor(xor(l.lo0, CAST(1 AS BIGINT) << CAST(s.doc_id % 7 AS INT)),
              |                                       CAST(1 AS BIGINT) << CAST(7 + s.doc_id % 11 AS INT))
              |       ELSE s.lo0 END AS lo
              |  FROM sig0 s JOIN sig0 l ON l.doc_id = s.leader),
              |blk AS (SELECT doc_id, hi, lo, k,
              |  CASE k WHEN 0 THEN hi // 65536 WHEN 1 THEN hi % 65536
              |         WHEN 2 THEN lo // 65536 ELSE lo % 65536 END AS blk
              |  FROM sig CROSS JOIN (SELECT unnest(range(0,4)) AS k) ks),
              |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
              |  FROM blk a JOIN blk b ON a.k = b.k AND a.blk = b.blk AND a.doc_id < b.doc_id)
              |SELECT doc_a, doc_b,
              |  CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS hamming
              |FROM cand
              |WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
              |ORDER BY doc_a, doc_b""".stripMargin),
    ),

    // mm7 — pHash-over-REAL-pixels near-dup: the image-dedup path with
    // the actual decode in it. The fixture forges 50 groups of 4 real
    // images (PNG / BMP / GIF re-encodings of one 64×64 pattern plus a
    // +10-brightness PNG); each payload is decoded back through the
    // JDK's own ImageIO codecs, ImageHash.pHash64 runs over the
    // decoded rasters, and the same pigeonhole 4×16-bit block join as
    // mm5 yields candidates (hamming ≤ 3 always shares ≥ 1 block).
    // Lossless re-encodings of identical pixels hash identically and a
    // uniform brightness shift moves only the DC coefficient, so the
    // expected answer — every within-group pair, no cross-group pair —
    // is fixture arithmetic the oracle recomputes from range(50).
    QueryDef(
      "mm7_phash_pixels",
      (s, _) => {
        val sig = graft.multimodal.Multimodal
          .pixelHashes(graft.multimodal.Multimodal.imageFixture(s, 200))
          .toDF()
          .select(col("doc_id"), col("phash"))
        val blk = sig.withColumn("k", explode(sequence(lit(0), lit(3))))
          .withColumn("blk", expr("(phash >> (k * 16)) & 65535"))
        blk.select(col("doc_id").as("doc_a"), col("phash").as("pa"), col("k"), col("blk"))
          .join(blk.select(col("doc_id").as("doc_b"), col("phash").as("pb"), col("k"), col("blk")),
            Seq("k", "blk"))
          .filter(col("doc_a") < col("doc_b"))
          .filter(expr("bit_count(pa ^ pb) <= 3"))
          .select("doc_a", "doc_b")
          .distinct()
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH g AS (SELECT unnest(range(50)) AS g),
             |m AS (SELECT unnest(range(4)) AS i),
             |pairs AS (
             |  SELECT 4 * g + a.i AS doc_a, 4 * g + b.i AS doc_b
             |  FROM g, m a, m b WHERE a.i < b.i)
             |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b
             |FROM pairs ORDER BY doc_a, doc_b""".stripMargin),
    ),

    // mm8 — the LAKE-INGEST path for media: real files on disk read
    // through Spark's `binaryFile` source (path/length/content
    // metadata columns), ids recovered from file names, containers
    // parsed by the same byte-level MediaParsers as mm3 — proving the
    // from-disk half of the multimodal story (mm3 forges in memory).
    // Two source-level contracts ride in the row: `png_glob_rows`
    // (a pathGlobFilter read lists ONLY *.png — file-list pruning at
    // the source, the binary analog of partition pruning) and
    // `len_ok` (the source's length metadata column equals the
    // actual payload byte count on every file). The oracle recomputes
    // everything from the mm3 fixture arithmetic. At 100 TB this is
    // how image/audio corpora actually arrive: millions of files
    // listed in parallel, globs pruning the listing, content bytes
    // decoded executor-side — never through the driver.
    QueryDef(
      "mm8_binary_ingest",
      (s, _) => {
        import s.implicits._
        import graft.multimodal.Multimodal
        val n = 200
        val dir = java.nio.file.Files.createTempDirectory("binary_ingest")
        try {
          // forge the files on disk (driver-side fixture wiring: 200
          // tiny files; a real lake already holds them)
          Multimodal.mediaFixture(s, n).collect().foreach { r =>
            val ext = (r.doc_id % 4) match {
              case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"; case _ => "wav"
            }
            java.nio.file.Files.write(
              dir.resolve(f"img_${r.doc_id}%05d.$ext"), r.payload): Unit
          }
          val all = s.read.format("binaryFile").load(dir.toString)
          val pngRows = s.read.format("binaryFile")
            .option("pathGlobFilter", "*.png").load(dir.toString).count()
          val lenOk = all.agg(expr("bool_and(length(content) = length)"))
            .head.getBoolean(0)
          val out = Multimodal.extractContainerMeta(
            all.select(
              expr("CAST(regexp_extract(path, 'img_(\\\\d+)', 1) AS BIGINT)").as("doc_id"),
              col("content").as("payload")).as[Multimodal.MediaRecord])
            .toDF()
            .groupBy("format")
            .agg(count(lit(1)).as("n"),
              sum(when(col("parsed"), 1L).otherwise(0L)).as("n_parsed"),
              max("width").as("max_w"), max("height").as("max_h"),
              max("sample_rate").as("max_rate"))
            .withColumn("png_glob_rows", lit(pngRows))
            .withColumn("len_ok", lit(lenOk))
            .orderBy("format")
          val rows = out.collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
        } finally graft.core.Fs.deleteRecursively(dir.toFile)
      },
      Some("""WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 200)),
             |m AS (SELECT i,
             |  CASE i % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif' ELSE 'wav' END AS format,
             |  CASE i % 4 WHEN 0 THEN 16 + i % 64 WHEN 1 THEN 32 + i % 128
             |       WHEN 2 THEN 8 + i % 32 ELSE -1 END AS w,
             |  CASE i % 4 WHEN 0 THEN 16 + (i * 7) % 64 WHEN 1 THEN 32 + (i * 3) % 128
             |       WHEN 2 THEN 8 + (i * 5) % 32 ELSE -1 END AS h,
             |  CASE i % 4 WHEN 3 THEN 8000 + (i % 3) * 4000 ELSE -1 END AS rate
             |  FROM ids)
             |SELECT format, count(*) AS n, count(*) AS n_parsed,
             |  CAST(max(w) AS INTEGER) AS max_w, CAST(max(h) AS INTEGER) AS max_h,
             |  CAST(max(rate) AS INTEGER) AS max_rate,
             |  CAST((SELECT count(*) FROM m WHERE format = 'png') AS BIGINT) AS png_glob_rows,
             |  TRUE AS len_ok
             |FROM m GROUP BY format ORDER BY format""".stripMargin),
    ),

    // ss13 — k-means corpus clustering (the cluster step of
    // SemDeDup-style semantic curation: partition the embedding space
    // so downstream work — dedup, diversity sampling, per-topic
    // mixing — runs within clusters instead of corpus-wide).
    // PLANTED-CONTRACT oracle: 8 classes on a coordinate grid with
    // inter-class gaps ≥ 1000 per differing dim vs jitter < 100, so
    // the k-means fixed point is the planted partition regardless of
    // init/partitioning (label permutation doesn't matter — the
    // contract checks purity and balance, not label identity). The
    // fit samples at most [[IvfIndex.TrainCap]] rows — the 100 TB
    // shape — and assignment is a broadcast-model map.
    QueryDef(
      "ss13_kmeans_clusters",
      (s, _) => {
        import graft.operators.IvfIndex
        val n = 20000L
        val emb = plantedClusters(s, n, nClasses = 8)
        val assigned = IvfIndex.assign(emb, IvfIndex.train(emb, nlist = 8))
        val lists = assigned.agg(countDistinct("list_id").as("n_clusters"))
        assigned.groupBy("class")
          .agg(countDistinct("list_id").as("nl"), count(lit(1)).as("cnt"))
          .agg(
            sum("cnt").as("n_vectors"),
            count(lit(1)).as("n_classes"),
            expr("bool_and(nl = 1)").as("purity_ok"),
            expr(s"bool_and(cnt = ${n / 8})").as("balanced_ok"))
          .crossJoin(broadcast(lists))
          .select(col("n_vectors"), col("n_classes"), col("n_clusters"),
            col("purity_ok"), col("balanced_ok"))
      },
      Some("""SELECT CAST(20000 AS BIGINT) AS n_vectors, CAST(8 AS BIGINT) AS n_classes,
             |  CAST(8 AS BIGINT) AS n_clusters, TRUE AS purity_ok, TRUE AS balanced_ok""".stripMargin),
    ),

    // dd12 — semantic (embedding-space) near-dup removal, SemDeDup
    // shape: cluster first, then exact pairwise distance ONLY within
    // a cluster — the candidate set is Σ cluster² instead of corpus²,
    // and each cluster's pair work is an independent task (at 100 TB:
    // one shuffle on the cluster id, per-cluster capping/salting is
    // the known knob). FULLY RECOMPUTED oracle (the ss_scale
    // discipline): 80 planted twins (every 100th vector nudged ≤ 1
    // per dim, d² ≤ 16) PLUS whatever other near-dups the portable
    // corpus truly contains — the quadratic-Lehmer jitter has an
    // arithmetic resonance (Δvec_id ∈ {3672, 7344} repeats the
    // jitter vector) that plants 16 structural near-dup pairs, and
    // DuckDB regenerates the corpus and must find the SAME pair set
    // (96 at these parameters) with the twin subset separated out.
    // Distances run in exact integer arithmetic (grid coordinates
    // are integers ≤ 10⁶, exact in FLOAT, cast back to LONG).
    QueryDef(
      "dd12_semantic_dedup",
      (s, _) => {
        import graft.operators.IvfIndex
        val nBase = 8000L
        val base = plantedClusters(s, nBase, nClasses = 8)
        val twins = base.filter(col("vec_id") % 100 === 0)
          .select((col("vec_id") + nBase).as("vec_id"), col("class"),
            transform(col("embedding"),
              (x, j) => x + (pmod(col("vec_id") + j, lit(3)) - 1).cast("float")).as("embedding"))
        val all = base.unionByName(twins)
        // deterministic quantizer: centers ARE the planted grid
        // (plantedCenterValue — the Scala twin of plantedCenterSql),
        // so cluster scoping is a pure function of the corpus on any
        // machine/ML version — no fit, no seed sensitivity. purity_ok
        // then PROVES the scoping recovered the planted partition
        // (jitter < 100 ≪ inter-class gap 1000), so a center/formula
        // drift fails on a diagnosable boolean, not a bare hash
        // mismatch in the pair counts.
        val model = IvfIndex.modelFromCenters(plantedCenters(8))
        val assignedAll = IvfIndex.assign(all, model)
        val purity = assignedAll.groupBy("class")
          .agg(countDistinct("list_id").as("nl"))
          .agg(expr("bool_and(nl = 1)").as("purity_ok"),
            count(lit(1)).as("n_classes"))
        val assigned = assignedAll.select("vec_id", "list_id", "embedding")
        val a = assigned.select(col("vec_id").as("va"), col("list_id"), col("embedding").as("ea"))
        val b = assigned.select(col("vec_id").as("vb"), col("list_id"), col("embedding").as("eb"))
        val d2 = aggregate(
          zip_with(col("ea"), col("eb"),
            (x, y) => (x.cast("long") - y.cast("long")) * (x.cast("long") - y.cast("long"))),
          lit(0L), (acc, v) => acc + v)
        a.join(b, Seq("list_id"))
          .filter(col("va") < col("vb"))
          // the same sound prefilter the oracle uses: d² ≤ 100 needs
          // per-dim |Δ| ≤ 10 — two cheap dims drop ~96% of candidate
          // pairs before the full 16-dim distance
          .filter(
            abs(element_at(col("ea"), 1) - element_at(col("eb"), 1)) <= 10 &&
              abs(element_at(col("ea"), 2) - element_at(col("eb"), 2)) <= 10)
          .filter(d2 <= 100L)
          .agg(
            count(lit(1)).as("n_dup_pairs"),
            coalesce(sum(when(col("vb") === col("va") + nBase && col("va") % 100 === 0, 1L)
              .otherwise(0L)), lit(0L)).as("n_twin_pairs"))
          .crossJoin(broadcast(purity))
      },
      Some {
        val center = plantedCenterSql("vid", "j", 8)
        val jit = plantedJitterSql("vid", "j")
        s"""WITH ids AS (SELECT unnest(range(8000)) AS vid),
           |base AS (SELECT vid, vid % 8 AS cls,
           |  list_transform(range(0, 16), j -> $center + $jit) AS e FROM ids),
           |-- alias must NOT shadow vid: the jitter lambda uses the
           |-- ORIGINAL vid (matching Spark's resolution against the
           |-- input frame), so the shifted id gets its own name
           |twins AS (SELECT vid + 8000 AS tvid, cls,
           |  list_transform(range(0, 16), j -> e[j + 1] + ((vid + j) % 3) - 1) AS e
           |  FROM base WHERE vid % 100 = 0),
           |allv AS (SELECT vid, cls, e FROM base
           |         UNION ALL SELECT tvid AS vid, cls, e FROM twins),
           |cand AS (
           |  SELECT a.vid AS va, b.vid AS vb, a.e AS ea, b.e AS eb
           |  FROM allv a JOIN allv b ON a.cls = b.cls AND a.vid < b.vid
           |  -- sound prefilter: d² ≤ 100 needs per-dim |Δ| ≤ 10
           |  WHERE abs(a.e[1] - b.e[1]) <= 10 AND abs(a.e[2] - b.e[2]) <= 10),
           |pos AS (SELECT va, vb, unnest(range(1, 17)) AS i, ea, eb FROM cand),
           |d AS (SELECT va, vb, sum((ea[i] - eb[i]) * (ea[i] - eb[i])) AS d2
           |      FROM pos GROUP BY va, vb),
           |close AS (SELECT va, vb FROM d WHERE d2 <= 100)
           |SELECT count(*) AS n_dup_pairs,
           |  CAST(COALESCE(sum(CASE WHEN vb = va + 8000 AND va % 100 = 0
           |                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_twin_pairs,
           |  TRUE AS purity_ok, CAST(8 AS BIGINT) AS n_classes
           |FROM close""".stripMargin
      },
    ),

    // ss14 — IVF index MAINTENANCE: the at-rest serving store (parquet
    // partitioned by posting list) with incremental delta APPEND under
    // the persisted model — the upsert path a continuously-ingesting
    // ANN deployment runs, where rebuilding the index per batch is the
    // thing you cannot afford. Probes read the store with directory-
    // level partition pruning (nprobe/nlist of the data touches disk —
    // IvfIndexSpec pins PartitionFilters in the plan), and assignment
    // is a pure function of the persisted model, so probe(append-
    // store) must EQUAL probe(full rebuild) — emitted as a verdict.
    // Contract-oracled like ss5: DuckDB regenerates the portable
    // corpus and recomputes the exact L2 top-10 checksum; recall ≥ 8
    // holds structurally (the query's class-0 cluster is L2-dominant
    // and its lists are always probed).
    QueryDef(
      "ss14_ivf_upsert",
      (s, _) => {
        import graft.operators.IvfIndex
        val nBase = 20000L
        val nAll = 22000L
        val all = plantedClusters(s, nAll, nClasses = 8)
        val corpus = all.filter(col("vec_id") =!= 0)
        // content-fingerprinted location (the FixtureStore.dir
        // discipline): any change to the corpus formula, sizes, or
        // list count re-keys the store — a stale cache can never be
        // served as if it matched the current corpus
        // … and the trainer version + seed are part of the key: a
        // training-code change re-keys the store instead of silently
        // serving a model built by the old path
        val canon = plantedCenterSql("vid", "j", 8) + "|" + plantedJitterSql("vid", "j") +
          s"|base=$nBase|all=$nAll|nlist=16|trainer=${IvfIndex.TrainerVersion}|seed=42|layout=seq1"
        val store = new java.io.File(s"target/ivfstore/planted_${storeTag(canon)}").getAbsolutePath
        publishStore(store) { tmp =>
          val base = corpus.filter(col("vec_id") < nBase)
          val model = IvfIndex.train(base, nlist = 16)
          IvfIndex.writeStore(IvfIndex.assign(base, model), tmp)
          IvfIndex.saveModel(s, model, tmp)
          IvfIndex.appendStore(corpus.filter(col("vec_id") >= nBase), model, tmp)
        }
        val model = IvfIndex.loadModel(s, store)
        val q = all.filter(col("vec_id") === 0)
          .select("embedding").collect()(0).getSeq[Float](0).toArray
        val stored = IvfIndex.liveStore(s, store) // ≡ raw scan here (no tombstones): zero serve cost
        val fromStore = IvfIndex.probeL2(stored, model, q, nprobe = 8, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val rebuilt = IvfIndex.probeL2(IvfIndex.assign(corpus, model), model, q, nprobe = 8, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        // committed-size from the store's _stats manifest (maintained
        // at write/append time) — the n_store_rows contract cell now
        // ALSO verifies the manifest bookkeeping against the oracle's
        // pinned literal, and no serve-path job scans the store for it
        val nStore = IvfIndex.storedCount(s, store)
        // exact spine: the shared integer-L2 ground truth, the same
        // portable arithmetic the oracle replays
        val ex = exactL2Top10(corpus, q)
        val exIds = ex.select("vec_id").collect().map(_.getLong(0)).toSet
        ex.agg(expr("bit_xor(vec_id * 1000003 + d2)").as("exact_checksum"))
          .select(
            lit(nStore).as("n_store_rows"),
            lit(fromStore == rebuilt).as("append_equals_rebuild"),
            lit(exIds.intersect(fromStore).size >= 8).as("recall_ok"),
            col("exact_checksum"))
      },
      Some(plantedExactTop10Cte(22000L) + "\n" +
        """SELECT CAST(21999 AS BIGINT) AS n_store_rows,
          |  TRUE AS append_equals_rebuild, TRUE AS recall_ok,
          |  (SELECT CAST(bit_xor(vid * 1000003 + d2) AS BIGINT)
          |   FROM top WHERE rk <= 10) AS exact_checksum
          |FROM (SELECT 1)""".stripMargin),
    ),
    // ss17 — CDC-DRIVEN index maintenance: the versioned embedding
    // table's change feed IS the vector-index ingest. The corpus
    // lives in a transactional VersionedTable (v0 = base commit,
    // v1 = MERGE of the newly arrived vectors); the v0→v1 CDC step's
    // `insert` rows — and nothing else — flow into the committed IVF
    // store via appendStore under the PERSISTED model, exactly how a
    // production vector store follows its upstream table instead of
    // re-scanning it. Contract: the CDC insert count equals the
    // planted delta, probe(CDC-followed store) ≡ probe(full rebuild)
    // ≡ the exact integer-L2 top-10 the oracle recomputes from the
    // portable corpus. This stitches three subsystems the driver gate
    // already checks separately (table format CDC, IVF maintenance,
    // exact ANN spine) into the composition a deployment runs.
    QueryDef(
      "ss17_cdc_index_follow",
      (s, _) => {
        import graft.operators.IvfIndex
        import graft.sources.VersionedTable
        val nBase = 20000L
        val nAll = 22000L
        val all = plantedClusters(s, nAll, nClasses = 8)
        val corpus = all.filter(col("vec_id") =!= 0) // query held out
        // the upstream table: base commit then the arrival MERGE
        val dir = java.nio.file.Files.createTempDirectory("vt_emb").toString
        val vt = new VersionedTable(s, dir, nBuckets = 16)
        vt.commit(corpus.filter(col("vec_id") < nBase), Seq("vec_id"), None)
        vt.merge(corpus.filter(col("vec_id") >= nBase), Seq("vec_id"), Some(0))
        val cdc = vt.cdc(Seq("vec_id"), 0, 1)
        val byType = cdc.groupBy("change_type").agg(count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val inserts = cdc.filter(col("change_type") === "insert")
          .select("vec_id", "class", "embedding")

        // committed store: trained on the table's PINNED v0 read,
        // delta appended from the change feed (ss14's canon/cache
        // discipline, separate key so the two paths can't alias)
        val canon = plantedCenterSql("vid", "j", 8) + "|" + plantedJitterSql("vid", "j") +
          s"|ss17|base=$nBase|all=$nAll|nlist=16|trainer=${IvfIndex.TrainerVersion}|seed=42|layout=seq1"
        val store = new java.io.File(s"target/ivfstore/cdcfollow_${storeTag(canon)}").getAbsolutePath
        publishStore(store) { tmp =>
          val v0 = vt.read(Some(0)).get
          val model = IvfIndex.train(v0, nlist = 16)
          IvfIndex.writeStore(IvfIndex.assign(v0, model), tmp)
          IvfIndex.saveModel(s, model, tmp)
          IvfIndex.appendStore(inserts, model, tmp)
        }
        val model = IvfIndex.loadModel(s, store)
        val q = all.filter(col("vec_id") === 0)
          .select("embedding").collect()(0).getSeq[Float](0).toArray
        val fromStore = IvfIndex.probeL2(IvfIndex.liveStore(s, store), model, q,
            nprobe = 8, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val rebuilt = IvfIndex.probeL2(IvfIndex.assign(vt.read().get, model), model, q,
            nprobe = 8, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        // every table read above has collected; reclaim the temp table
        // (the committed STORE is the cached artifact, not the vt)
        graft.core.Fs.deleteRecursively(new java.io.File(dir))

        val ex = exactL2Top10(corpus, q)
        val exIds = ex.select("vec_id").collect().map(_.getLong(0)).toSet
        ex.agg(expr("bit_xor(vec_id * 1000003 + d2)").as("exact_checksum"))
          .select(
            lit(byType.getOrElse("insert", 0L)).as("n_cdc_inserts"),
            lit(byType.view.filterKeys(_ != "insert").values.sum).as("n_cdc_other"),
            lit(fromStore == rebuilt).as("follow_equals_rebuild"),
            lit(exIds.intersect(fromStore).size >= 8).as("recall_ok"),
            col("exact_checksum"))
      },
      Some(plantedExactTop10Cte(22000L) + "\n" +
        """SELECT CAST(2000 AS BIGINT) AS n_cdc_inserts,
          |  CAST(0 AS BIGINT) AS n_cdc_other,
          |  TRUE AS follow_equals_rebuild, TRUE AS recall_ok,
          |  (SELECT CAST(bit_xor(vid * 1000003 + d2) AS BIGINT)
          |   FROM top WHERE rk <= 10) AS exact_checksum
          |FROM (SELECT 1)""".stripMargin),
    ),
    // ss20 — FULL CDC follow: ss17 covered the insert stream; this is
    // the remaining production hazard — upstream MERGEs that UPDATE
    // and DELETE embeddings. The versioned table takes a third commit
    // (v1→v2) that deletes 11 of the query's own class (ids ≡ 0 mod 8
    // in [8, 88] — vectors that WOULD rank near the top if ghosted)
    // and re-points ids 1–4 at the query's neighborhood (new embedding
    // = query + vid on every coordinate — they become the new exact
    // top-4). The committed IVF store follows BOTH CDC steps via
    // IvfIndex.applyCdc (retract = generation tombstone, add =
    // epoch-stamped append), serves through liveStore, and must agree
    // with (a) a full rebuild of v2, (b) the exact integer-L2 top-10
    // the oracle recomputes over the post-update post-delete corpus —
    // so a ghosted delete or a stale update vector is a hash mismatch,
    // not just a flipped flag. ghost_free additionally pins the live
    // view: zero deleted ids resident, exactly one generation per
    // updated id. n_live audits the O(delta) stats bookkeeping through
    // the mixed apply (21999 − 11 deletes).
    QueryDef(
      "ss20_cdc_full_follow",
      (s, _) => {
        import graft.operators.IvfIndex
        import graft.sources.VersionedTable
        val nBase = 20000L
        val nAll = 22000L
        val delIds = (8L to 88L by 8L) // class-0 near-query casualties
        val all = plantedClusters(s, nAll, nClasses = 8)
        val corpus = all.filter(col("vec_id") =!= 0) // query held out
        val qRow = all.filter(col("vec_id") === 0)
          .select("embedding").collect()(0).getSeq[Float](0).toArray
        val qArr = array(qRow.map(x => lit(x)): _*)

        // upstream: base commit, arrival merge, then the mixed merge
        val dir = java.nio.file.Files.createTempDirectory("vt_emb20").toString
        val vt = new VersionedTable(s, dir, nBuckets = 16)
        vt.commit(corpus.filter(col("vec_id") < nBase), Seq("vec_id"), None)
        vt.merge(corpus.filter(col("vec_id") >= nBase), Seq("vec_id"), Some(0))
        val updates = corpus.filter(col("vec_id").between(1L, 4L))
          .select(col("vec_id"), col("class"),
            zip_with(qArr, col("embedding"), (qx, _) => qx + col("vec_id").cast("float"))
              .as("embedding"))
          .withColumn("__del", lit(false))
        val deletes = corpus.filter(col("vec_id").isin(delIds: _*))
          .withColumn("__del", lit(true))
        vt.merge(updates.unionByName(deletes.select(updates.columns.map(col): _*)),
          Seq("vec_id"), Some(1), deleteCol = Some("__del"))

        val cdc2 = vt.cdc(Seq("vec_id"), 1, 2)
        val byType = cdc2.groupBy("change_type").agg(count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

        // committed store: trained on the pinned v0 read, then BOTH
        // CDC steps applied in order — never a corpus rescan
        val canon = plantedCenterSql("vid", "j", 8) + "|" + plantedJitterSql("vid", "j") +
          s"|ss20|base=$nBase|all=$nAll|del=${delIds.mkString(",")}|upd=1-4" +
          s"|nlist=16|trainer=${IvfIndex.TrainerVersion}|seed=42|layout=seq1"
        val store = new java.io.File(s"target/ivfstore/cdcfull_${storeTag(canon)}").getAbsolutePath
        publishStore(store) { tmp =>
          val v0 = vt.read(Some(0)).get
          val model = IvfIndex.train(v0, nlist = 16)
          IvfIndex.writeStore(IvfIndex.assign(v0, model), tmp)
          IvfIndex.saveModel(s, model, tmp)
          IvfIndex.applyCdc(vt.cdc(Seq("vec_id"), 0, 1), model, tmp)
          IvfIndex.applyCdc(vt.cdc(Seq("vec_id"), 1, 2), model, tmp)
        }
        val model = IvfIndex.loadModel(s, store)
        val live = IvfIndex.liveStore(s, store)
        val fromStore = IvfIndex.probeL2(live, model, qRow, nprobe = 8, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val finalCorpus = vt.read().get
        val rebuilt = IvfIndex.probeL2(IvfIndex.assign(finalCorpus, model), model, qRow,
            nprobe = 8, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        // ghost audit on the LIVE view itself, not just the top-k
        val nDelResident = live.filter(col("vec_id").isin(delIds: _*)).count()
        val updGenerations = live.filter(col("vec_id").between(1L, 4L)).count()
        val nLive = IvfIndex.storedCount(s, store)
        // exact spine over the planted formula (NOT the vt read: the
        // returned frame evaluates lazily, after the temp table below
        // is reclaimed) — same rows as finalCorpus by construction
        val finalPlanted = corpus
          .filter(!col("vec_id").isin(delIds: _*) && !col("vec_id").between(1L, 4L))
          .unionByName(updates.drop("__del", "class"), allowMissingColumns = true)
          .select("vec_id", "embedding")
        val ex = exactL2Top10(finalPlanted, qRow)
        val exIds = ex.select("vec_id").collect().map(_.getLong(0)).toSet
        graft.core.Fs.deleteRecursively(new java.io.File(dir))
        ex.agg(expr("bit_xor(vec_id * 1000003 + d2)").as("exact_checksum"))
          .select(
            lit(byType.getOrElse("delete", 0L)).as("n_cdc_deletes"),
            lit(byType.getOrElse("update_preimage", 0L)).as("n_cdc_update_pre"),
            lit(byType.getOrElse("update_postimage", 0L)).as("n_cdc_update_post"),
            lit(byType.getOrElse("insert", 0L)).as("n_cdc_inserts"),
            lit(nLive).as("n_live"),
            lit(nDelResident == 0 && updGenerations == 4).as("ghost_free"),
            lit(fromStore == rebuilt).as("follow_equals_rebuild"),
            lit(exIds.intersect(fromStore).size >= 8).as("recall_ok"),
            col("exact_checksum"))
      },
      Some {
        val center = plantedCenterSql("vid", "j", 8)
        val jit = plantedJitterSql("vid", "j")
        val center0 = plantedCenterSql("0", "j", 8)
        val jit0 = plantedJitterSql("0", "j")
        s"""WITH ids AS (SELECT unnest(range(22000)) AS vid),
           |v AS (SELECT vid,
           |        CASE WHEN vid BETWEEN 1 AND 4
           |          THEN list_transform(range(0, 16), j -> $center0 + $jit0 + vid)
           |          ELSE list_transform(range(0, 16), j -> $center + $jit) END AS e
           |      FROM ids
           |      WHERE NOT (vid % 8 = 0 AND vid BETWEEN 8 AND 88)),
           |q AS (SELECT e AS qe FROM v WHERE vid = 0),
           |pos AS (SELECT vid, unnest(range(1, 17)) AS i, e, qe
           |        FROM v CROSS JOIN q WHERE vid <> 0),
           |d AS (SELECT vid, sum((e[i] - qe[i]) * (e[i] - qe[i])) AS d2
           |      FROM pos GROUP BY vid),
           |top AS (SELECT vid, CAST(d2 AS BIGINT) AS d2,
           |        row_number() OVER (ORDER BY d2, vid) AS rk FROM d)
           |SELECT CAST(11 AS BIGINT) AS n_cdc_deletes,
           |  CAST(4 AS BIGINT) AS n_cdc_update_pre,
           |  CAST(4 AS BIGINT) AS n_cdc_update_post,
           |  CAST(0 AS BIGINT) AS n_cdc_inserts,
           |  CAST(21988 AS BIGINT) AS n_live,
           |  TRUE AS ghost_free,
           |  TRUE AS follow_equals_rebuild, TRUE AS recall_ok,
           |  (SELECT CAST(bit_xor(vid * 1000003 + d2) AS BIGINT)
           |   FROM top WHERE rk <= 10) AS exact_checksum
           |FROM (SELECT 1)""".stripMargin
      },
    ),

    // ss15 — graph-ANN index MAINTENANCE: delta insert into a
    // committed graph store (GraphAnn.appendStore — the batched HNSW
    // insert discipline: budgeted stored-search LINK, cosine edge
    // rerank, dirty-bucket repair of touched neighborhoods) instead of
    // a rebuild. The probe batch runs through BOTH the appended store
    // and a full rebuild; on the planted corpus both must navigate to
    // the EXACT integer L2 top-10 (inter-class gap ≫ jitter), so
    // probe(append) ≡ probe(rebuild) is emitted as a verdict — the
    // GraphAnn twin of ss14's append-equals-rebuild contract — plus
    // twin_served proves the appended data is actually being served
    // (each query's near-twin lives in the delta and is d²-top-1).
    // Entry layers are component-guaranteed (buildEntryLayerConnected):
    // the planted classes build disconnected islands, and an island
    // with no entry is unreachable at any budget. FULLY RECOMPUTED
    // oracle: DuckDB regenerates base + delta + twins from the
    // portable formulas and recomputes the 4-query exact-L2 checksum.
    QueryDef(
      "ss15_graph_upsert",
      (s, _) => {
        import graft.operators.GraphAnn
        import s.implicits._
        val all = plantedClusters(s, 2100L, nClasses = 8)
          .select(col("vec_id"), transform(col("embedding"), x => x.cast("long")).as("f"))
        val twins = all.filter(col("vec_id") < 4)
          .select((col("vec_id") + 2100L).as("vec_id"),
            transform(col("f"), x => x + 1L).as("f"))
        val base = all.filter(col("vec_id") >= 4 && col("vec_id") < 2000)
        val delta = all.filter(col("vec_id") >= 2000).unionByName(twins)
        val qs = all.filter(col("vec_id") < 4).collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toSeq.sortBy(_._1)

        // graph=v2: entries moved inside the store dirs (the drift-
        // gated maintenance layout) — re-key so a pre-change cached
        // store can't serve the old sibling-entry layout
        val canon = plantedCenterSql("vid", "j", 8) + "|" + plantedJitterSql("vid", "j") +
          "|ss15|base=2000|delta=104|deg=16|graph=v2"
        val root = new java.io.File(s"target/gstore/upsert_${storeTag(canon)}").getAbsolutePath
        val nB = 16
        publishStore(root) { tmp =>
          val baseC = base.persist()
          val fullC = base.unionByName(delta).persist()
          val gA = GraphAnn.buildGraph(baseC, degree = 16, dims = 16).persist()
          val eA = GraphAnn.buildEntryLayerConnected(baseC, gA, dims = 16)
          GraphAnn.writeStores(baseC, gA, s"$tmp/append", nB)
          // entries live INSIDE the store dir (the refreshEntryLayer
          // convention) so the chunked ingest's drift gate can
          // maintain them in place
          eA.write.mode("overwrite").parquet(s"$tmp/append/entry")
          val entryA = s.read.parquet(s"$tmp/append/entry").collect().map(_.getLong(0)).toSeq
          // the PRODUCTION ingest path: chunked append whose entry
          // drift gate (isolation signal / every-N-pieces) refreshes
          // the entry layer itself when the delta may have published
          // an unreachable component — no manual maintenance call
          GraphAnn.appendStoreChunked(s, GraphAnn.StoredIndex(s"$tmp/append", nB), delta,
            degree = 16, entryIds = entryA, metric = "l2", entryDims = 16)
          val gB = GraphAnn.buildGraph(fullC, degree = 16, dims = 16).persist()
          GraphAnn.writeStores(fullC, gB, s"$tmp/rebuild", nB)
          GraphAnn.buildEntryLayerConnected(fullC, gB, dims = 16)
            .write.mode("overwrite").parquet(s"$tmp/rebuild/entry")
          gA.unpersist(); gB.unpersist(); baseC.unpersist(); fullC.unpersist(): Unit
        }
        def probe(which: String): Map[Long, Set[Long]] = {
          val entry = s.read.parquet(s"$root/$which/entry").collect().map(_.getLong(0)).toSeq
          GraphAnn.searchStoredWithBudget(s, GraphAnn.StoredIndex(s"$root/$which", nB), qs,
            k = 10, ef = 48, maxExpand = 80, batch = 8, entryIds = entry, metric = "l2")._1
            .collect().map(r => (r.getLong(0), r.getLong(1)))
            .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
        }
        val append = probe("append")
        val rebuild = probe("rebuild")
        // exact integer-L2 spine, one batched pass — the same
        // arithmetic the oracle replays
        val corpus = base.unionByName(delta)
        val qdf = all.filter(col("vec_id") < 4).select(col("vec_id").as("qid"), col("f").as("qf"))
        val d2 = aggregate(zip_with(col("f"), col("qf"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("d2").asc, col("vec_id").asc)
        val ex = corpus.crossJoin(broadcast(qdf))
          .select(col("qid"), col("vec_id"), d2.as("d2"))
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        val exIds = ex.select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
        val matches = qs.forall { case (q, _) => append(q) == rebuild(q) }
        val exact = qs.forall { case (q, _) => append(q) == exIds(q) }
        val twinServed = qs.forall { case (q, _) => append(q).contains(2100L + q) }
        ex.agg(coalesce(expr("bit_xor(qid * 1000003 + vec_id * 97 + d2)"), lit(0L))
            .as("exact_checksum"))
          .select(lit(40L).as("n_results"),
            lit(matches).as("append_matches_rebuild"),
            lit(exact).as("append_exact"),
            lit(twinServed).as("twin_served"),
            col("exact_checksum"))
      },
      Some {
        val center = plantedCenterSql("vid", "j", 8)
        val jit = plantedJitterSql("vid", "j")
        val centerQ = plantedCenterSql("qvid", "j", 8)
        val jitQ = plantedJitterSql("qvid", "j")
        s"""WITH ids AS (SELECT unnest(range(4, 2100)) AS vid),
           |v AS (SELECT vid, list_transform(range(0, 16), j -> $center + $jit) AS e FROM ids),
           |tw AS (SELECT qvid + 2100 AS vid,
           |  list_transform(range(0, 16), j -> $centerQ + $jitQ + 1) AS e
           |  FROM (SELECT unnest(range(4)) AS qvid)),
           |allv AS (SELECT * FROM v UNION ALL SELECT * FROM tw),
           |q AS (SELECT qvid AS qid, list_transform(range(0, 16), j -> $centerQ + $jitQ) AS qe
           |      FROM (SELECT unnest(range(4)) AS qvid)),
           |pos AS (SELECT b.qid, a.vid, unnest(range(1, 17)) AS i, a.e AS e, b.qe AS qe
           |        FROM allv a CROSS JOIN q b),
           |d AS (SELECT qid, vid, sum((e[i] - qe[i]) * (e[i] - qe[i])) AS d2
           |      FROM pos GROUP BY qid, vid),
           |top AS (SELECT qid, vid, CAST(d2 AS BIGINT) AS d2,
           |        row_number() OVER (PARTITION BY qid ORDER BY d2, vid) AS rk FROM d)
           |SELECT CAST(40 AS BIGINT) AS n_results, TRUE AS append_matches_rebuild,
           |  TRUE AS append_exact, TRUE AS twin_served,
           |  (SELECT CAST(bit_xor(qid * 1000003 + vid * 97 + d2) AS BIGINT)
           |   FROM top WHERE rk <= 10) AS exact_checksum""".stripMargin
      },
    ),
    // ss16 — the ANN SERVING MATRIX: one query vector, one exact
    // ground truth (integer-IP top-10 over vec_id ≥ 4), and all five
    // index families probing it side by side — single-bucket LSH, IVF,
    // PQ, IVF-PQ, and the committed graph store (shared with ss12) —
    // the "which index when" answer as one driver-checked contract row
    // instead of five separate benches. The LSH lane's numbers
    // (candidates scored, results, recall@10) are pure functions of
    // the corpus, so DuckDB RECOMPUTES them exactly; the trained
    // families carry recall/budget verdicts at their spec'd bounds
    // (ss5/ss6/ss10/ss12 discipline). Measured values land in
    // BASELINE.md.
    QueryDef(
      "ss16_ann_matrix",
      (s, d) => {
        import graft.operators.{GraphAnn, IvfIndex, IvfPq, PqIndex, QuantizerCache}
        val emb = Tables.embeddings(s, d)
        val e = emb.withColumn("f", fxCol)
        val base = e.filter(col("vec_id") >= 4).persist()
        // corpus size for the knob/budget math comes from the
        // committed coarse quantizer's train-time stats (the table
        // count, queries included — the same n ss5/ss6/ss10 size
        // their knobs by), not a serve-time count() of the corpus
        val (ivfModel, n) = QuantizerCache.ivfStats(s, d, emb, nlist = 16)
        val qF = e.filter(col("vec_id") === 0).select("f").collect()(0).getSeq[Long](0).toArray
        val qEmb = emb.filter(col("vec_id") === 0)
          .select("embedding").collect()(0).getSeq[Float](0).toArray
        val qLit = array(qF.map(lit): _*)
        val ex = base.select(col("vec_id"), ip(col("f"), qLit).as("ip"))
          .orderBy(col("ip").desc, col("vec_id")).limit(10)
        val exIds = ex.select("vec_id").collect().map(_.getLong(0)).toSet
        def recall(ids: Iterable[Long]): Int = exIds.intersect(ids.toSet).size

        // LSH: the query's sign bucket IS the candidate set (point
        // probe of the ss3 layout) — tiny budget, recall takes what
        // the bucket gives; fully recomputed by the oracle
        val sig = e.withColumn("bucket", sigCol)
        val qBucket = sig.filter(col("vec_id") === 0)
          .select("bucket").collect()(0).getString(0)
        val lshCand = sig.filter(col("vec_id") >= 4 && col("bucket") === lit(qBucket))
        val lshScored = lshCand.count()
        val lshTop = lshCand.select(col("vec_id"), ip(col("f"), qLit).as("ip"))
          .orderBy(col("ip").desc, col("vec_id")).limit(10)
          .collect().map(_.getLong(0)).toSeq

        // IVF: 8 of 16 posting lists, exact rerank inside them
        val assigned = IvfIndex.assign(emb, ivfModel).filter(col("vec_id") >= 4)
        val probed = ivfModel.nearest(qEmb, 8)
        val ivfScored = assigned.filter(col("list_id").isin(probed: _*)).count()
        val ivfTop = IvfIndex.probe(assigned, ivfModel, qEmb, nprobe = 8, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSeq

        // PQ: full ADC scan in code space, exact rerank of 50
        val pqModel = QuantizerCache.pq(s, d, emb, m = 8, ksub = 16)
        val pqTop = PqIndex.search(PqIndex.encode(emb.filter(col("vec_id") >= 4), pqModel),
          pqModel, qEmb, shortlist = shortlistFor(n), k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSeq

        // IVF-PQ: routed ADC, exact rerank of 50
        val ipqModel = QuantizerCache.ivfPq(s, d, emb, nlist = 16, m = 8, ksub = 16)
        val ipqTop = IvfPq.search(IvfPq.encode(emb.filter(col("vec_id") >= 4), ipqModel),
          ipqModel, qEmb, nprobe = nprobeFor(n, 16, 8), shortlist = shortlistFor(n), k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSeq

        // graph: the ss12 committed store (same key — built once,
        // atomically published by graphStoreFor)
        val store = graphStoreFor(s, d, base)
        val entry = s.read.parquet(s"$store/entry").collect().map(_.getLong(0)).toSeq
        val (gDf, gBudgets) = GraphAnn.searchStoredWithBudget(
          s, GraphAnn.StoredIndex(store, 64), Seq(0L -> qF), k = 10, ef = 48,
          maxExpand = 80, batch = 8, entryIds = entry)
        val gTop = gDf.select("vec_id").collect().map(_.getLong(0)).toSeq
        base.unpersist()

        ex.agg(coalesce(expr("bit_xor(vec_id * 97 + ip)"), lit(0L)).as("exact_checksum"))
          .select(
            lit(lshScored).as("lsh_scored"),
            lit(lshTop.size.toLong).as("lsh_results"),
            lit(recall(lshTop).toLong).as("lsh_recall10"),
            lit(recall(ivfTop) >= 5).as("ivf_recall_ok"),
            // measured 0.746·n at sf0.01 — nprobe/nlist = 1/2 with
            // skewed lists reads ~¾ of a SMALL corpus; the fraction
            // falls as lists multiply (ss5's 100-TB sizing note)
            lit(ivfScored <= (n * 17) / 20).as("ivf_budget_ok"),
            lit(recall(pqTop) >= 6).as("pq_recall_ok"),
            lit(recall(ipqTop) >= 8).as("ivfpq_recall_ok"),
            lit(recall(gTop) >= 8).as("graph_recall_ok"),
            lit(gBudgets(0L) <= entry.size + 80L * 2 * 16).as("graph_budget_ok"),
            col("exact_checksum"))
      },
      Some(s"""WITH $FxSql,
              |q AS (SELECT f AS qf FROM fx WHERE vec_id = 0),
              |sig AS (SELECT vec_id, f, $sigSql AS bucket FROM fx),
              |qb AS (SELECT bucket FROM sig WHERE vec_id = 0),
              |cand AS (SELECT s.vec_id, s.f FROM sig s, qb WHERE s.bucket = qb.bucket AND s.vec_id >= 4),
              |pos AS (SELECT e.vec_id, unnest(range(1, len(e.f)+1)) AS i, e.f AS f, q.qf AS qf
              |        FROM fx e CROSS JOIN q WHERE e.vec_id >= 4),
              |ips AS (SELECT vec_id, sum(f[i] * qf[i]) AS ip FROM pos GROUP BY vec_id),
              |top10 AS (SELECT vec_id, CAST(ip AS BIGINT) AS ip FROM ips ORDER BY ip DESC, vec_id LIMIT 10),
              |lshtop AS (SELECT c.vec_id FROM cand c JOIN ips USING (vec_id)
              |           ORDER BY ips.ip DESC, c.vec_id LIMIT 10),
              |xc AS (SELECT CAST(COALESCE(bit_xor(vec_id * 97 + ip), 0) AS BIGINT) AS exact_checksum FROM top10)
              |SELECT (SELECT count(*) FROM cand) AS lsh_scored,
              |  (SELECT count(*) FROM lshtop) AS lsh_results,
              |  (SELECT count(*) FROM lshtop t JOIN top10 x USING (vec_id)) AS lsh_recall10,
              |  TRUE AS ivf_recall_ok, TRUE AS ivf_budget_ok, TRUE AS pq_recall_ok,
              |  TRUE AS ivfpq_recall_ok, TRUE AS graph_recall_ok, TRUE AS graph_budget_ok,
              |  (SELECT exact_checksum FROM xc) AS exact_checksum""".stripMargin),
    ),
  )

  /** guards the ss14 store's build-once section (Bench and Verify can
    * share a JVM); cross-JVM races are handled by the temp-dir +
    * atomic-rename publish. */
  private object IvfStoreLock


  /** content-fingerprint tag for a committed-store path (the
    * FixtureStore.dir discipline): any change to the canon string —
    * corpus formula, sizes, knobs, trainer version, seed — re-keys
    * the store, so a stale cache can never serve a mismatched build. */
  private def storeTag(canon: String): String =
    graft.core.Bytes.toHex(graft.core.Keccak.keccak256(canon.getBytes("UTF-8")).take(8))

  /** Build-once atomic store publish, shared by every committed-store
    * query (ss12/ss14/ss15/ss16/ss17): build into a pid-suffixed temp
    * dir, mark `_OK`, atomically rename — the loser of a cross-JVM
    * race discards its temp, and a reader can never observe a
    * half-written store. JVM-local build-once under [[IvfStoreLock]]. */
  private def publishStore(root: String)(build: String => Unit): Unit =
    IvfStoreLock.synchronized {
      if (!new java.io.File(root, "_OK").exists()) {
        val tmp = root + ".tmp-" + ProcessHandle.current().pid()
        // a FAILED build must not strand the partial temp store (a
        // retry in a new JVM gets a new pid suffix and would never
        // reclaim this one)
        try build(tmp)
        catch { case t: Throwable =>
          graft.core.Fs.deleteRecursively(new java.io.File(tmp)); throw t
        }
        new java.io.File(tmp, "_OK").createNewFile()
        if (!new java.io.File(tmp).renameTo(new java.io.File(root)))
          graft.core.Fs.deleteRecursively(new java.io.File(tmp)) // lost the cross-JVM race
      }
    }

  /** exact integer-L2 top-10 spine over (vec_id, embedding) for the
    * held-out query — the ground truth the index-maintenance
    * contracts (ss14/ss17) compare against; the DuckDB twin is
    * [[plantedExactTop10Cte]]. */
  private def exactL2Top10(corpus: DataFrame, q: Array[Float]): DataFrame = {
    val qArr = array(q.map(x => lit(math.round(x.toDouble))): _*)
    val d2 = aggregate(
      zip_with(transform(col("embedding"), x => x.cast("long")), qArr,
        (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    corpus.select(col("vec_id"), d2.as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(10)
  }

  /** DuckDB CTE chain regenerating the planted corpus (8 classes,
    * query vid = 0 held out) and ranking exact L2 distances — ONE
    * definition for every oracle that consumes the `top` CTE. */
  private def plantedExactTop10Cte(nAll: Long): String = {
    val center = plantedCenterSql("vid", "j", 8)
    val jit = plantedJitterSql("vid", "j")
    s"""WITH ids AS (SELECT unnest(range($nAll)) AS vid),
       |v AS (SELECT vid, list_transform(range(0, 16), j -> $center + $jit) AS e FROM ids),
       |q AS (SELECT e AS qe FROM v WHERE vid = 0),
       |pos AS (SELECT vid, unnest(range(1, 17)) AS i, e, qe
       |        FROM v CROSS JOIN q WHERE vid <> 0),
       |d AS (SELECT vid, sum((e[i] - qe[i]) * (e[i] - qe[i])) AS d2
       |      FROM pos GROUP BY vid),
       |top AS (SELECT vid, CAST(d2 AS BIGINT) AS d2,
       |        row_number() OVER (ORDER BY d2, vid) AS rk FROM d)""".stripMargin
  }

  /** Build-once committed graph store over `d`'s embeddings — shared
    * by ss12 and ss16 (same key ⇒ same store). JVM-local build-once
    * under [[IvfStoreLock]]; cross-JVM races resolved by the same
    * pid-suffixed temp-dir + atomic-rename publish as ss14/ss15, so a
    * reader can never observe a half-written store. The path is the
    * storeTag of a canon string folding in every build knob plus
    * [[graft.operators.GraphAnn.BuildVersion]] (same content-
    * fingerprint discipline as the ivfstore paths): a knob edit moves
    * the path automatically, an algorithm edit moves it via the one
    * constant that lives next to the algorithm — no remember-to-bump
    * path literal here. Under tmp+rename a crashed build never leaves
    * a partial dir at the published path, and re-keying makes any
    * older layout simply unreachable — NO teardown of the published
    * path ever runs (a delete would race another JVM's just-published
    * store between the `_OK` check and the rm). */
  private def graphStoreFor(s: SparkSession, d: String, base: DataFrame): String = {
    import graft.operators.GraphAnn
    val canon = s"graphann|${GraphAnn.BuildVersion}|$d|fx=round1e7|vec_id>=4|" +
      "degree=16|nBuckets=64|entry=buildEntryLayer"
    val store = new java.io.File(s"target/gstore/shared_${storeTag(canon)}").getAbsolutePath
    publishStore(store) { tmp =>
      val cached = base.select("vec_id", "f").persist()
      GraphAnn.writeStores(cached, GraphAnn.buildGraph(cached, degree = 16), tmp, nBuckets = 64)
      GraphAnn.buildEntryLayer(cached).write.mode("overwrite").parquet(s"$tmp/entry")
      cached.unpersist(): Unit
    }
    store
  }
}
