package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}
import graft.queries.Relational._

/** Data-quality registry, split out of [[Relational]]: single-scan
  * column profiling (exact + approx twins), histograms, approximate
  * quantiles with error contracts, declarative constraint checks, and
  * the batch/streaming drift monitors.
  */
object DataQuality {

  /** the profiled lineitem measure columns (dq2/dq2b). */
  private val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** shared unpivot-exact profiling core: ONE scan of the measure
    * columns → the (col_name, value, cnt) distinct-value universe,
    * from which both profilers derive everything. */
  private def profileUniverse(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .selectExpr("stack(4, " +
        ProfileCols.map(c => s"'$c', CAST($c AS DECIMAL(18,2))").mkString(", ") +
        ") AS (col_name, value)")
      .groupBy("col_name", "value").agg(count(lit(1)).as("cnt"))

  /** the exact per-column aggregates over [[profileUniverse]]; mean =
    * exact decimal sum then ONE double division (decimal division
    * scale rules differ across engines, double division does not). */
  private def profileExactAggs: Seq[Column] = Seq(
    sum("cnt").as("n_rows"),
    sum(when(col("value").isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
    count(col("value")).as("n_distinct"),
    min(col("value")).cast("double").as("min_v"),
    max(col("value")).cast("double").as("max_v"),
    (sum(col("value") * col("cnt")).cast("double") /
      sum("cnt").cast("double")).as("mean_v"))

  /** the matching DuckDB oracle (one UNION ALL branch per column);
    * `extraCols` appends verdict columns for the sketch twin. */
  private def profileOracleSql(extraCols: String): String =
    ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
         |  CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_v$extraCols
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")


  val all: Seq[QueryDef] = Seq(
    // Data profiling: per-column summary statistics (nulls, distinct
    // cardinality, min/max, exact-decimal mean) — the "what is in
    // this table" report a pipeline runs before trusting a new
    // source. UNPIVOT-EXACT shape ([[profileUniverse]]): multiple
    // countDistincts in one agg would compile to an Expand that
    // replays the scan per column (the original formulation here — a
    // 4× scan at 100 TB); instead unpivot to (col_name, value),
    // collapse to the distinct-value universe with one map-side-
    // combined agg, and derive every statistic exactly from it,
    // reweighted by group multiplicity. ONE scan, no Expand (PlanSpec
    // pins it), bit-identical output. Mean goes through an exact
    // DECIMAL sum then one double division, so it is bit-stable
    // across engines and partitionings.
    QueryDef(
      "dq2_profile",
      (s, d) => profileUniverse(s, d)
        .groupBy("col_name")
        .agg(profileExactAggs.head, profileExactAggs.tail: _*)
        .orderBy("col_name"),
      Some(profileOracleSql(extraCols = "")),
      headline = true,
    ),

    // The sketch-profiling twin of dq2: the SAME shared unpivot core,
    // plus the HLL cardinality sketch (rsd 2%, the a8_approx_distinct
    // error contract) riding the deduped frame — at 100 TB the exact
    // distinct-value universe of a high-cardinality column is itself
    // a heavy shuffle, and the sketch path is what a profiler
    // actually ships; its within-5%-of-exact verdict goes through the
    // driver hash. No Expand, no second scan — PlanSpec pins both.
    QueryDef(
      "dq2b_profile_approx",
      (s, d) => profileUniverse(s, d)
        .groupBy("col_name")
        .agg(profileExactAggs.head,
          (profileExactAggs.tail :+ approx_count_distinct(col("value"), 0.02).as("approx_nd")): _*)
        .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
          col("min_v"), col("max_v"), col("mean_v"),
          when(col("n_distinct") === 0, lit(true))
            .otherwise(abs(col("approx_nd") - col("n_distinct")).cast("double") /
              col("n_distinct").cast("double") <= 0.05).as("within_5pct"))
        .orderBy("col_name"),
      Some(profileOracleSql(extraCols = ",\n  TRUE AS within_5pct")),
      headline = true,
    ),

    // Histogram profiling: fixed-width value-distribution buckets over
    // o_totalprice (plain floor arithmetic — portable across engines,
    // unlike width_bucket which DuckDB lacks). One groupBy with
    // map-side combine; bucket count is the knob, independent of rows.
    QueryDef(
      "dq3_histogram",
      (s, d) => Tables.orders(s, d)
        .select((floor(col("o_totalprice") / 25000).cast("long")).as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
        .orderBy("bucket"),
      Some("""SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
             |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
    ),

    // Approximate-quantile error contract: percentile_approx (the
    // Greenwald-Khanna sketch — what a 100 TB profiler ships, since
    // exact per-group percentiles need a sort) carries a RANK
    // guarantee: the returned value's rank is within ε·n of q·n. That
    // guarantee is verified IN-PLAN: the sketch runs at accuracy 10⁴
    // (ε = 10⁻⁴), the 1-row result broadcasts back over the column,
    // and count(v ≤ approx_q) must land within n/100 of q·n — a 100×
    // slack over the sketch's own bound, robust to duplicate values.
    // The quantile VALUES stay engine-local (sketch internals differ);
    // the rank verdicts + exact row count go through the driver hash
    // (the a8/dq2b error-contract pattern applied to quantiles).
    QueryDef(
      "dq4_approx_quantile",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_extendedprice").cast("double").as("v"))
        val sk = li.agg(
          count(lit(1)).as("n_rows"),
          percentile_approx(col("v"), array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
        li.crossJoin(broadcast(sk))
          .agg(
            first("n_rows").as("n_rows"),
            sum(when(col("v") <= element_at(col("qs"), 1), 1L).otherwise(0L)).as("r50"),
            sum(when(col("v") <= element_at(col("qs"), 2), 1L).otherwise(0L)).as("r90"),
            sum(when(col("v") <= element_at(col("qs"), 3), 1L).otherwise(0L)).as("r99"))
          .select(col("n_rows"),
            (abs(col("r50") - col("n_rows") * 0.5) <= col("n_rows") / lit(100.0)).as("rank_ok_50"),
            (abs(col("r90") - col("n_rows") * 0.9) <= col("n_rows") / lit(100.0)).as("rank_ok_90"),
            (abs(col("r99") - col("n_rows") * 0.99) <= col("n_rows") / lit(100.0)).as("rank_ok_99"))
      },
      Some("""SELECT count(*) AS n_rows, TRUE AS rank_ok_50,
             |  TRUE AS rank_ok_90, TRUE AS rank_ok_99
             |FROM lineitem""".stripMargin),
    ),

    // dq5 — corpus DRIFT monitor between two ingest windows:
    // yesterday's snapshot (first half of documents by doc_id) vs
    // today's (second half, with a planted language-mix shift — every
    // 7th doc relabeled 'zh'), compared per feature as binned
    // frequency profiles. The divergence is a chi-square-shaped score
    // in EXACT integer arithmetic — per-bin rates scaled to ppm by
    // floor division, contribution (pa−pb)² DIV (pa+pb+1), summed —
    // so the SCORE itself hash-matches the oracle, not just a
    // verdict; no float, no log. Expected split at every sf: lang
    // drifts (planted, score ≥ 36k), source and the char histogram do
    // not (≤ 8k) — threshold 20000 sits between with margin. Shape
    // at 100 TB: one map-side stack + one shuffle on (feature, bin)
    // with map-side partial counts, bin cardinality bounded (langs,
    // sources, char-width buckets), per-feature totals broadcast
    // back — profile each window once, compare profiles O(bins).
    QueryDef(
      "dq5_drift",
      (s, d) => driftScoresDf(driftLong(driftLab(s, d))),
      Some(driftOracleSql("")),
    ),

    // st9 — the drift monitor as a STREAM (streaming/StreamingDrift):
    // the reference profile is computed once in batch; the CURRENT
    // window arrives in 3 micro-batches and its profile is maintained
    // as additive per-(feature, bin) counters — one distributed
    // aggregation per micro-batch, then a bins-sized driver merge; no
    // rescan of earlier batches, ever, because profile(b₁ ∪ b₂) =
    // profile(b₁) + profile(b₂). The emitted rows are the BATCH
    // twin's (the oracle recomputes every column) plus a
    // stream_matches_batch verdict pinning that the incrementally
    // maintained scores equal the batch scores exactly — the
    // backfill→live shape for monitoring, like st7 for the pipeline
    // and st8 for dedup. Driver state is the profile itself (bins,
    // not stream length; StreamingDrift.MaxBins fails loudly on an
    // unbounded feature).
    QueryDef(
      "st9_stream_drift",
      (s, d) => {
        import s.implicits._
        val lab = driftLab(s, d).persist()
        try {
        val long = driftLong(lab)
        val batchRows = driftScoresDf(long).collect()
        val refProfile = long.filter(col("is_ref"))
          .groupBy("feature", "bin").agg(count(lit(1)).as("c")).collect()
          .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("∅")) -> r.getLong(2))
          .toMap
        // the current window replayed in 3 id-ordered micro-batches
        // (driver-side collect is fixture wiring — a real deployment
        // reads the ingest log; batch boundaries are irrelevant by
        // additivity)
        val cur = long.filter(!col("is_ref")).select("doc_id", "feature", "bin")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
        val mv = new graft.streaming.StreamingDrift
        implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
        val es = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String, String)]
        val q = es.toDS().toDF("doc_id", "feature", "bin")
          .writeStream.outputMode("append")
          .foreachBatch((b: DataFrame, _: Long) => mv.processBatch(b))
          .start()
        try {
          cur.grouped(math.max(1, cur.length / 3 + 1)).foreach { chunk =>
            es.addData(chunk.toSeq); q.processAllAvailable()
          }
        } finally q.stop()
        val streamed = mv.scores(refProfile)
        val matches = streamed.size == batchRows.length && batchRows.forall { r =>
          streamed.get(r.getString(0)).contains(
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        }
        batchRows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getBoolean(5), matches))
          .toDF("feature", "n_bins", "ref_total", "cur_total", "score",
            "drifted", "stream_matches_batch")
          .orderBy("feature")
        } finally lab.unpersist()
      },
      Some(driftOracleSql(",\n  TRUE AS stream_matches_batch")),
      streamingDriver = true,
    ),

    // Data-quality constraint report (operators.Constraints — the
    // reference's integrity checks generalized): null checks, key
    // uniqueness, value ranges, referential integrity, dense
    // per-group sequencing, in one union of aggregates.
    QueryDef(
      "dq_constraints",
      (s, d) => {
        import graft.operators.Constraints._
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        notNull(li, Seq("l_orderkey", "l_quantity"))
          .unionByName(unique(li, Seq("l_orderkey", "l_linenumber")))
          .unionByName(inRange(li, "l_discount", 0.0, 0.5))
          .unionByName(refIntegrity(li, "l_orderkey", o, "o_orderkey"))
          .unionByName(denseSequence(li, "l_orderkey", "l_linenumber"))
          // the reference's fixed-depth circuit bound (state DB depth
          // ≤ 5 ⇒ ≤ 2^5 leaves per group) as a generic constraint
          .unionByName(maxGroupSize(li, Seq("l_orderkey"), 32))
          .orderBy("check_name")
      },
      Some("""SELECT 'not_null(l_orderkey,l_quantity)' AS check_name,
             |  CAST(sum(CASE WHEN l_orderkey IS NULL OR l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
             |FROM lineitem
             |UNION ALL
             |SELECT 'unique(l_orderkey,l_linenumber)',
             |  CAST(coalesce(sum(CASE WHEN n > 1 THEN n - 1 END), 0) AS BIGINT)
             |FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber) t
             |UNION ALL
             |SELECT 'in_range(l_discount,0.0,0.5)',
             |  CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             |FROM lineitem
             |UNION ALL
             |SELECT 'ref_integrity(l_orderkey->o_orderkey)', count(*)
             |FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
             |UNION ALL
             |SELECT 'dense_sequence(l_orderkey,l_linenumber)',
             |  CAST(sum(CASE WHEN lo <> 1 OR hi <> n THEN 1 ELSE 0 END) AS BIGINT)
             |FROM (SELECT count(*) AS n, min(l_linenumber) AS lo, max(l_linenumber) AS hi
             |      FROM lineitem GROUP BY l_orderkey) t
             |UNION ALL
             |SELECT 'max_group_size(l_orderkey,32)',
             |  CAST(coalesce(sum(CASE WHEN n > 32 THEN 1 ELSE 0 END), 0) AS BIGINT)
             |FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey) t
             |ORDER BY check_name""".stripMargin),
    ),

    // dq7 — the text-ingest quarantine (dq6's reject-don't-corrupt
    // posture applied to the DOCUMENT path, mirroring the reference's
    // St4 late/garbage rejection): empty / oversized / control-byte
    // docs route to a visible QUARANTINE:<reason> namespace instead of
    // flowing into tokenization with garbage values. Three planted
    // rejects (empty + whitespace-only fold to EMPTY, a >100k-char
    // blob to OVERSIZED, a NUL-bearing doc to BADCHAR) must each land
    // in their namespace; the clean corpus must be quarantine-free at
    // every SF (the oracle recomputes that from the table, not a
    // pinned literal); and the SURVIVOR set must be checksum-identical
    // to the clean corpus — the planted garbage is rejected, never
    // partially ingested, and no good doc is collateral.
    QueryDef(
      "dq7_malformed_doc_quarantine",
      (s, d) => {
        val cap = 100000
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        def klass(t: Column): Column =
          when(t.isNull || trim(t) === "", lit("QUARANTINE:EMPTY"))
            .when(length(t) > cap, lit("QUARANTINE:OVERSIZED"))
            .when(t.contains(lit("\u0000")) || t.contains(lit("\ufffd")),
              lit("QUARANTINE:BADCHAR"))
            .otherwise(lit("OK"))
        val planted = docs
          .unionByName(s.range(1).select(lit(-1L).as("doc_id"), lit("").as("text")))
          .unionByName(s.range(1).select(lit(-2L).as("doc_id"), lit("   ").as("text")))
          .unionByName(s.range(1).select(lit(-3L).as("doc_id"),
            expr("repeat('x', 100001)").as("text")))
          .unionByName(s.range(1).select(lit(-4L).as("doc_id"),
            lit("bad\u0000doc").as("text")))
        val cls = planted.select(col("doc_id"), length(col("text")).as("ln"),
          klass(col("text")).as("k"))
        val cleanCls = docs.select(col("doc_id"), length(col("text")).as("ln"),
          klass(col("text")).as("k"))
        val cleanAgg = cleanCls.agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("k") =!= "OK", 1L).otherwise(0L)).as("n_quarantined_clean"),
          expr("bit_xor(CASE WHEN k = 'OK' THEN doc_id * 1000003 + ln END)").as("clean_checksum"))
        val plantedAgg = cls.agg(
          sum(when(col("k") === "QUARANTINE:EMPTY", 1L).otherwise(0L)).as("n_empty"),
          sum(when(col("k") === "QUARANTINE:OVERSIZED", 1L).otherwise(0L)).as("n_oversized"),
          sum(when(col("k") === "QUARANTINE:BADCHAR", 1L).otherwise(0L)).as("n_badchar"),
          expr("bit_xor(CASE WHEN k = 'OK' THEN doc_id * 1000003 + ln END)").as("survivors_checksum"))
        cleanAgg.crossJoin(plantedAgg)
          .select(col("n_docs"), col("n_quarantined_clean"),
            col("n_empty"), col("n_oversized"), col("n_badchar"),
            (col("survivors_checksum") === col("clean_checksum")).as("survivors_equal"),
            col("survivors_checksum"))
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT -1, ''
             |  UNION ALL SELECT -2, '   '
             |  UNION ALL SELECT -3, repeat('x', 100001)
             |  UNION ALL SELECT -4, 'bad' || chr(0) || 'doc'),
             |cls AS (SELECT doc_id, len(text) AS ln,
             |    CASE WHEN text IS NULL OR trim(text) = '' THEN 'QUARANTINE:EMPTY'
             |         WHEN len(text) > 100000 THEN 'QUARANTINE:OVERSIZED'
             |         WHEN contains(text, chr(0)) OR contains(text, chr(65533)) THEN 'QUARANTINE:BADCHAR'
             |         ELSE 'OK' END AS k
             |  FROM planted),
             |clean_cls AS (SELECT doc_id, len(text) AS ln,
             |    CASE WHEN text IS NULL OR trim(text) = '' THEN 'QUARANTINE:EMPTY'
             |         WHEN len(text) > 100000 THEN 'QUARANTINE:OVERSIZED'
             |         WHEN contains(text, chr(0)) OR contains(text, chr(65533)) THEN 'QUARANTINE:BADCHAR'
             |         ELSE 'OK' END AS k
             |  FROM documents)
             |SELECT
             |  (SELECT count(*) FROM clean_cls) AS n_docs,
             |  (SELECT CAST(count(*) AS BIGINT) FROM clean_cls WHERE k <> 'OK') AS n_quarantined_clean,
             |  (SELECT CAST(count(*) AS BIGINT) FROM cls WHERE k = 'QUARANTINE:EMPTY') AS n_empty,
             |  (SELECT CAST(count(*) AS BIGINT) FROM cls WHERE k = 'QUARANTINE:OVERSIZED') AS n_oversized,
             |  (SELECT CAST(count(*) AS BIGINT) FROM cls WHERE k = 'QUARANTINE:BADCHAR') AS n_badchar,
             |  (SELECT CAST(bit_xor(doc_id * 1000003 + ln) AS BIGINT) FROM cls WHERE k = 'OK') =
             |    (SELECT CAST(bit_xor(doc_id * 1000003 + ln) AS BIGINT) FROM clean_cls WHERE k = 'OK')
             |    AS survivors_equal,
             |  (SELECT CAST(bit_xor(doc_id * 1000003 + ln) AS BIGINT) FROM cls WHERE k = 'OK')
             |    AS survivors_checksum""".stripMargin),
    ),
  )

  /** dq5/st9 shared window labeling: reference = first half of
    * documents by doc_id, current = second half with the planted
    * language-mix shift (every 7th doc relabeled 'zh'). */
  private def driftLab(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val half = docs.agg(expr("(max(doc_id)+1) DIV 2").as("half"))
    docs.crossJoin(broadcast(half))
      .select(col("doc_id"),
        (col("doc_id") < col("half")).as("is_ref"),
        when(col("doc_id") >= col("half") && col("doc_id") % 7 === 0, "zh")
          .otherwise(col("lang")).as("lang2"),
        col("source"), col("n_chars"))
  }

  /** the long-format (feature, bin) projection both monitors profile.
    * NULL feature values coalesce to the '∅' bin HERE, identically in
    * the oracle SQL, so batch, stream, and DuckDB group a null the
    * same way (and the streaming side's driver map never sees a null
    * key). */
  private def driftLong(lab: DataFrame): DataFrame =
    lab.selectExpr("doc_id", "is_ref",
      "stack(3, 'lang', coalesce(lang2, '∅'), 'source', coalesce(source, '∅'), " +
        "'chars_bin', coalesce(CAST(n_chars DIV 200 AS STRING), '∅')) AS (feature, bin)")

  /** the batch drift plan over the long frame — one bounded-
    * cardinality shuffle on (feature, bin), per-feature totals
    * broadcast back, chi-square-shaped score in EXACT integer
    * arithmetic (ppm rates by floor division) so the score itself
    * hash-matches the oracle. greatest(·,1): an EMPTY window means
    * every bin count on that side is 0, so the guarded rates are all
    * 0 and the score is 0 ("no data" ⇒ "no drift evidence") —
    * identically on both engines, instead of an ANSI divide-by-zero
    * here and NULLs in DuckDB. */
  private def driftScoresDf(long: DataFrame): DataFrame = {
    val counts = long.groupBy("feature", "bin").agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("a"),
      sum(when(!col("is_ref"), 1L).otherwise(0L)).as("b"))
    val tot = counts.groupBy("feature").agg(sum("a").as("ta"), sum("b").as("tb"))
    counts.join(broadcast(tot), Seq("feature"))
      .selectExpr("feature", "ta", "tb",
        "a*1000000 DIV greatest(ta, 1) AS pa",
        "b*1000000 DIV greatest(tb, 1) AS pb")
      .groupBy("feature")
      .agg(count(lit(1)).as("n_bins"),
        min("ta").as("ref_total"), min("tb").as("cur_total"),
        sum(expr("(pa-pb)*(pa-pb) DIV (pa+pb+1)")).as("score"))
      .withColumn("drifted", col("score") > 20000L)
      .orderBy("feature")
  }

  /** the drift oracle, shared by dq5 and st9 (st9 appends its
    * stream≡batch verdict column via `extraCols`). */
  private def driftOracleSql(extraCols: String): String =
    s"""WITH mx AS (SELECT (max(doc_id)+1)//2 AS half FROM documents),
       |lab AS (
       |  SELECT doc_id, doc_id < half AS is_ref,
       |    CASE WHEN doc_id >= half AND doc_id % 7 = 0 THEN 'zh' ELSE lang END AS lang2,
       |    source, n_chars
       |  FROM documents, mx),
       |lng AS (
       |  SELECT is_ref, 'lang' AS feature, coalesce(lang2, '∅') AS bin FROM lab
       |  UNION ALL SELECT is_ref, 'source', coalesce(source, '∅') FROM lab
       |  UNION ALL SELECT is_ref, 'chars_bin', coalesce(CAST(n_chars // 200 AS VARCHAR), '∅') FROM lab),
       |counts AS (
       |  SELECT feature, bin,
       |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS a,
       |    SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS b
       |  FROM lng GROUP BY feature, bin),
       |tot AS (SELECT feature, SUM(a) AS ta, SUM(b) AS tb FROM counts GROUP BY feature),
       |rates AS (
       |  SELECT c.feature, ta, tb,
       |    a*1000000 // greatest(ta, 1) AS pa, b*1000000 // greatest(tb, 1) AS pb
       |  FROM counts c JOIN tot t ON t.feature = c.feature)
       |SELECT feature, count(*) AS n_bins,
       |  CAST(min(ta) AS BIGINT) AS ref_total, CAST(min(tb) AS BIGINT) AS cur_total,
       |  CAST(SUM((pa-pb)*(pa-pb) // (pa+pb+1)) AS BIGINT) AS score,
       |  CAST(SUM((pa-pb)*(pa-pb) // (pa+pb+1)) AS BIGINT) > 20000 AS drifted$extraCols
       |FROM rates GROUP BY feature ORDER BY feature""".stripMargin

}
