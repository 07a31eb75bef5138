package graft.streaming

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/** Atomic persistence for the tiny driver-resident MV states
  * ([[StreamingPipeline.PackingMv]]'s packing manifest,
  * [[StreamingDrift]]'s profile counters): a streaming pipeline's
  * exactly-once story is checkpoint + idempotent sink, and a
  * driver-held accumulator participates only if it (a) survives a
  * killed JVM and (b) can tell a REPLAYED micro-batch (crash after
  * the fold, before the checkpoint commit) from a new one. The
  * format here is write-temp + atomic rename — a reader sees either
  * the previous complete state or the next, never a torn file — and
  * every state carries the last folded batch id so a redelivered
  * batch is skipped instead of double-counted (the standard
  * foreachBatch exactly-once recipe, applied to driver state).
  *
  * Deliberately java.io, not a Spark write: the state is a few dozen
  * longs — a per-batch Spark job to persist it would cost more than
  * the batch. A multi-driver deployment would put the same bytes in
  * its coordination store; single-writer is the foreachBatch
  * contract either way. */
private[streaming] object DriverState {

  def writeAtomic(path: Path)(w: DataOutputStream => Unit): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    val out = new DataOutputStream(new BufferedOutputStream(
      Files.newOutputStream(tmp, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)))
    try { w(out); out.flush() } finally out.close()
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read[T](path: Path)(r: DataInputStream => T): Option[T] =
    if (!Files.exists(path)) None
    else {
      val in = new DataInputStream(Files.newInputStream(path))
      try Some(r(in)) finally in.close()
    }
}
