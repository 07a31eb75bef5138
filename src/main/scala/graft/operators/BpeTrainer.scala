package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the actual
  * tokenizer-training loop (Sennrich et al. 2016), not a regex
  * approximation: start from characters, repeatedly count adjacent
  * symbol pairs across the vocabulary (weighted by word frequency),
  * merge the most frequent pair everywhere, emit the merge table.
  *
  * Scale shape: BPE training runs over the word-FREQUENCY table, not
  * the corpus — the corpus reduce (tokenize + count) happens once and
  * shrinks 100 TB of text to a vocabulary in the millions. Each merge
  * round is then one explode + one partial/final count over the vocab
  * plus a 1-row argmax to the driver; the per-round state (the re-
  * segmented vocab) is persisted and the previous round unpersisted,
  * so lineage stays O(1) deep. Ties break on (count desc, left,
  * right) — a total order, so training is deterministic.
  */
object BpeTrainer {

  final case class Rule(step: Int, left: String, right: String, count: Long)

  /** Below this many vocabulary entries the merge loop runs on the
    * driver over the collected word-frequency table — which is how
    * production tokenizer trainers work, because the vocab (not the
    * corpus) is the loop's working set and it usually fits. The
    * distributed loop below exists for the unbounded-vocab case.
    * Both paths share [[mergeOnce]] and the tie-break, and the spec
    * pins them equal. */
  val DriverVocabCap = 200000L

  /** `words`: (word: string, freq: long). Returns the merge table in
    * application order. */
  def train(words: DataFrame, merges: Int, driverCap: Long = DriverVocabCap): Seq[Rule] = {
    if (words.count() <= driverCap) {
      val freqs = words.select(col("word"), col("freq").cast("long"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      return trainLocal(freqs, merges)
    }
    trainDistributed(words, merges)
  }

  /** code-point split (NOT UTF-16 units — the distributed path's SQL
    * `substring` is code-point based, and a lone surrogate is not a
    * token). */
  private[operators] def charSyms(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** sequential merge loop over a collected vocabulary. */
  def trainLocal(freqs: Seq[(String, Long)], merges: Int): Seq[Rule] = {
    var words: Map[Vector[String], Long] = freqs
      .map { case (w, f) => charSyms(w) -> f }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += Rule(step, l, r, c)
        words = words.map { case (syms, f) => mergeOnce(syms, l, r).toVector -> f }
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        step += 1
      }
    }
    out.toSeq
  }

  private def trainDistributed(words: DataFrame, merges: Int): Seq[Rule] = {
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var syms = words.select(
      col("freq"),
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("syms"))
      .persist()
    syms.count() // materialize before the loop mutates the lineage

    var step = 1
    var done = false
    while (step <= merges && !done) {
      val top = syms
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms)-1)," +
            " i -> struct(element_at(syms, i) AS l, element_at(syms, CAST(i+1 AS INT)) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()

      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += Rule(step, l, r, cnt)
        val mergeUdf = udf((s: Seq[String]) => mergeOnce(s, l, r))
        val next = syms.select(col("freq"), mergeUdf(col("syms")).as("syms")).persist()
        next.count()
        syms.unpersist()
        syms = next
        step += 1
      }
    }
    syms.unpersist()
    rules.toSeq
  }

  /** tokenize a word with a learned merge table: start from chars,
    * apply each merge rule in training order (the standard BPE encode
    * semantics — rule order, not greedy-by-frequency-at-encode-time). */
  def applyMerges(word: String, rules: Seq[Rule]): Seq[String] =
    rules.foldLeft(charSyms(word): Seq[String]) { (syms, r) =>
      mergeOnce(syms, r.left, r.right)
    }

  /** left-to-right, non-overlapping single-pair merge — the exact
    * greedy semantics the reference trainer and the spec's pure-Scala
    * twin both use. */
  def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }
}
