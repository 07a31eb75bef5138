package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Load-don't-retrain serving path for the vector indexes: a trained
  * quantizer is fetched from the in-JVM memo, else loaded from its
  * committed [[QuantizerStore]] table, else trained ONCE, committed,
  * and memoized. Queries that share a parameterization (e.g. the
  * IVF-16 coarse quantizer used by probing, diversity sampling and
  * IVF-PQ routing) pay for exactly one k-means fit per process — and
  * zero once a store commit exists on disk.
  *
  * Training is deterministic (fixed seed, bounded sample), so a
  * concurrent writer losing the store's commit race can keep its
  * identical in-memory model; the conflict is swallowed.
  */
object QuantizerCache {

  private val memo = new ConcurrentHashMap[String, AnyRef]()

  /** NOT computeIfAbsent: the composed lookup resolves its coarse half
    * through this same memo (reentrancy computeIfAbsent forbids). Two
    * racing threads may both build — training is deterministic, so
    * either result is correct and putIfAbsent keeps exactly one. */
  private def cached[T <: AnyRef](key: String)(make: => T): T = {
    val hit = memo.get(key)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val v = make
      val prev = memo.putIfAbsent(key, v)
      (if (prev != null) prev else v).asInstanceOf[T]
    }
  }

  private def storeDir(sfDir: String, key: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    new java.io.File(s"target/qstore/$tag/$key").getAbsolutePath
  }

  /** a failed store commit (lost race with a concurrent writer) keeps
    * the just-trained in-memory model — identical content, fixed seed. */
  private def swallowConflict(f: => Unit): Unit =
    try f catch { case _: RuntimeException => () }

  def ivf(spark: SparkSession, sfDir: String, emb: => DataFrame,
          nlist: Int, seed: Long = 42L): IvfIndex.Model =
    cached(s"$sfDir#ivf-$nlist-$seed") {
      val dir = storeDir(sfDir, s"ivf-$nlist-$seed")
      QuantizerStore.loadIvf(spark, dir).getOrElse {
        val m = IvfIndex.train(emb, nlist, seed)
        swallowConflict(QuantizerStore.save(spark, dir, Some(m), None))
        m
      }
    }

  def pq(spark: SparkSession, sfDir: String, emb: => DataFrame,
         m: Int, ksub: Int, seed: Long = 42L): PqIndex.Model =
    cached(s"$sfDir#pq-$m-$ksub-$seed") {
      val dir = storeDir(sfDir, s"pq-$m-$ksub-$seed")
      QuantizerStore.loadPq(spark, dir).getOrElse {
        val model = PqIndex.train(emb, m, ksub, seed)
        swallowConflict(QuantizerStore.save(spark, dir, None, Some(model)))
        model
      }
    }

  /** the composed model reuses the cached coarse quantizer — only the
    * residual PQ fit is new work when the IVF half is already known. */
  def ivfPq(spark: SparkSession, sfDir: String, emb: => DataFrame,
            nlist: Int, m: Int, ksub: Int, seed: Long = 42L): IvfPq.Model =
    cached(s"$sfDir#ivfpq-$nlist-$m-$ksub-$seed") {
      val dir = storeDir(sfDir, s"ivfpq-$nlist-$m-$ksub-$seed")
      QuantizerStore.loadIvfPq(spark, dir).getOrElse {
        val coarse = ivf(spark, sfDir, emb, nlist, seed)
        val model = IvfPq.train(emb, coarse, m, ksub, seed)
        swallowConflict(QuantizerStore.save(spark, dir, Some(model.ivf), Some(model.pq)))
        model
      }
    }
}
