package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental near-dup dedup — the continuous-ingest twin
  * of the batch `dd10`: documents arrive as a stream and each is
  * verdicted `exact_dup` / `near_dup` / `keep` against everything that
  * arrived before it, without ever rescanning the corpus.
  *
  * Shape: a doc fans out to its 4 SimHash block buckets (the same
  * pigeonhole blocking as the batch path — hamming ≤ 3 ⇒ at least one
  * shared 8-bit block); per-bucket state (keyed
  * `flatMapGroupsWithState`) holds the signatures previously filed in
  * that bucket and emits one candidate row per arriving probe; a
  * downstream per-doc aggregation merges the 4 bucket verdicts with
  * exact > near > keep priority.
  *
  * Scale notes: state shards by bucket key exactly like the batch
  * join's shuffle; per-bucket state is the bucket's signature list —
  * the same memory the batch candidate join materializes, but
  * resident; the emitted candidate stream is O(arrivals), and the
  * final merge is a keyed agg over 4 rows per doc. Within a batch,
  * arrival order is normalized to doc_id order so replays are
  * deterministic.
  *
  * Retention: unbounded history is right for the bounded spec/bench
  * corpora, but a continuous-ingest deployment must cap state —
  * `maxPerBucket` keeps only the newest N signatures per bucket
  * (dedup semantics become "against the last N filed here", the
  * sliding-window contract every production dedup stream settles on;
  * probes stay O(N) instead of O(history)).
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, text: String)
  final case class Probe(bucket: String, doc_id: Long, sig: Int, exact: String)
  final case class BucketState(docs: List[(Long, Int, String)])
  final case class Candidate(doc_id: Long, rank: Int, match_id: Long)

  /** 32-bit SimHash over distinct words — the same construction as the
    * batch `simhashDf` (bit p = sign of Σ ±1 from the parity of hex
    * digit p of md5(word)), as a pure kernel. */
  def simhash32(text: String): Int = {
    val md = MessageDigest.getInstance("MD5")
    val sums = new Array[Int](32)
    text.split(" ").filter(_.nonEmpty).distinct.foreach { w =>
      val hex = md.digest(w.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      var p = 0
      while (p < 32) {
        sums(p) += (if ((Character.digit(hex.charAt(p), 16) & 1) == 1) 1 else -1)
        p += 1
      }
    }
    var sig = 0
    var p = 0
    while (p < 32) { if (sums(p) >= 0) sig |= (1 << (31 - p)); p += 1 }
    sig
  }

  def md5Hex(text: String): String =
    MessageDigest.getInstance("MD5").digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def probes(d: Doc): Seq[Probe] = {
    val sig = simhash32(d.text)
    val ex = md5Hex(d.text)
    (0 until 4).map { k =>
      val block = (sig >>> (24 - k * 8)) & 0xff
      Probe(s"$k:$block", d.doc_id, sig, ex)
    }
  }

  /** streaming verdicts: one row per doc (Update output mode),
    * columns (doc_id, verdict, match_id). `maxPerBucket` bounds
    * per-bucket state (newest-first) for continuous ingest. */
  def verdicts(docs: Dataset[Doc], maxPerBucket: Int = Int.MaxValue): DataFrame = {
    import docs.sparkSession.implicits._
    val cands = docs
      .flatMap(probes _)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Probe], state: GroupState[BucketState]) =>
          var stored = state.getOption.map(_.docs).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[Candidate]
          // normalize intra-batch order so replays are deterministic
          it.toSeq.sortBy(_.doc_id).foreach { p =>
            val exactM = stored.collect { case (id, _, ex) if ex == p.exact => id }
            val nearM = stored.collect {
              case (id, s, _) if Integer.bitCount(s ^ p.sig) <= 3 => id
            }
            out += (
              if (exactM.nonEmpty) Candidate(p.doc_id, 0, exactM.min)
              else if (nearM.nonEmpty) Candidate(p.doc_id, 1, nearM.min)
              else Candidate(p.doc_id, 2, -1L))
            stored = ((p.doc_id, p.sig, p.exact) :: stored).take(maxPerBucket)
          }
          state.update(BucketState(stored))
          out.iterator
      }
    // merge the 4 bucket verdicts: best (lowest-rank) kind wins, and
    // within it the lowest matching doc id
    cands
      .groupBy("doc_id")
      .agg(min(struct(col("rank"), col("match_id"))).as("best"))
      .select(
        col("doc_id"),
        when(col("best.rank") === 0, "exact_dup")
          .when(col("best.rank") === 1, "near_dup")
          .otherwise("keep").as("verdict"),
        col("best.match_id").as("match_id"))
  }
}
