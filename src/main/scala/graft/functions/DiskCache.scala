package graft.functions

import java.io.{File, FileOutputStream, ObjectOutputStream}
import java.nio.file.Files

/** Per-worker on-disk UDF cache — reference `pw.udfs.DiskCache`
  * (internals/udfs/caches.py:35) plus the cache-DIRECTORY hygiene contract
  * decoded from tests/test_udf.py:1924-2092:
  *
  *   - one cache FILE per (run pid, worker, op): `run-<pid>-worker-<w>-op-<op>`
  *     — workers never share a file, so no cross-worker locking
  *     (test_udf_cache_directory_multiple_workers);
  *   - on open, files left by DEAD runs (their pid is not alive) are removed
  *     and never read, and a leftover file bearing THIS run's own name is
  *     wiped instead of being trusted (it is garbage from a crashed
  *     same-pid predecessor) — test_udf_cache_directory_ignores_stale_files;
  *   - on close, the worker removes its own file: the disk cache is a
  *     rebuildable working set, never the source of truth (that is the
  *     persistence memo, [[graft.streaming.Persistence.memoize]]);
  *   - `sizeLimit` is a byte budget: entries are evicted oldest-first to
  *     stay under it, and an entry LARGER than the whole budget is never
  *     retained — so serve-after-store fails loudly with the reference's
  *     KeyError shape (test_udf_cache_too_small_size_limit raises KeyError,
  *     not silent recompute).
  *
  * Executor-side object: construct one per worker (partition/thread) in a
  * mapPartitions or wrap a UDF closure; nothing here touches the driver.
  */
final class DiskCache(dir: String, op: String = "0", worker: Int = 0,
    sizeLimit: Long = 1L << 30) {

  private val pid = ProcessHandle.current().pid()
  private val base = new File(dir)
  base.mkdirs()
  private val ownFile = new File(base, s"run-$pid-worker-$worker-op-$op.bin")

  // insertion-ordered for oldest-first eviction
  private val entries = new java.util.LinkedHashMap[String, Array[Byte]]()
  private var totalBytes = 0L
  private var flushedBytes = 0L    // totalBytes at the last flush

  // declared before the constructor-time sweep below (vals initialize in order)
  private val FileName = """run-(\d+)-worker-\d+-op-.*""".r

  sweepStale()
  if (ownFile.exists()) {
    // same-name leftover from a crashed predecessor with our pid: wipe, never read
    Files.write(ownFile.toPath, Array.emptyByteArray)
  }

  private def pidAlive(p: Long): Boolean =
    ProcessHandle.of(p).map[Boolean](h => Boolean.box(h.isAlive)).orElse(false)

  private def sweepStale(): Unit =
    Option(base.listFiles()).getOrElse(Array.empty[File]).foreach { f =>
      f.getName match {
        case FileName(p) if p.toLong != pid && !pidAlive(p.toLong) => f.delete(): Unit
        case _ => ()
      }
    }

  private def serialize(v: Any): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val oo = new ObjectOutputStream(bo)
    oo.writeObject(v.asInstanceOf[AnyRef]); oo.close()
    bo.toByteArray
  }

  private def deserialize(b: Array[Byte]): Any = {
    val oi = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try oi.readObject() finally oi.close()
  }

  def put(key: String, value: Any): Unit = synchronized {
    val bytes = serialize(value)
    val sz = bytes.length.toLong + key.length
    entries.remove(key) match {
      case null => ()
      case old => totalBytes -= (old.length.toLong + key.length)
    }
    entries.put(key, bytes)
    totalBytes += sz
    // oldest-first eviction down to the budget — an entry larger than the
    // whole budget evicts ITSELF (the reference's diskcache behavior that
    // turns a too-small size_limit into a KeyError on the read-back)
    val it = entries.entrySet().iterator()
    while (totalBytes > sizeLimit && it.hasNext) {
      val e = it.next()
      totalBytes -= (e.getValue.length.toLong + e.getKey.length)
      it.remove()
    }
    // amortized durability: rewriting the whole file per put is O(n²) I/O
    // on the UDF hot path (r18 review) — the file marks run/worker
    // ownership for the directory-hygiene contract, it is never the read
    // path (get serves memory; a restart rebuilds), so flush only when the
    // working set EXCEEDS 2x the last flushed size (and on close). The gate
    // compares totalBytes, not a growth counter, so evictions — which
    // shrink the set — defer the next flush instead of hastening it.
    if (flushedBytes == 0L || totalBytes > 2L * flushedBytes) flush()
  }

  def get(key: String): Option[Any] = synchronized {
    Option(entries.get(key)).map(deserialize)
  }

  /** Memoize `f` through the cache. Store-then-serve: the returned value is
    * read BACK from the cache, so an unretainable entry (size over the
    * budget) raises `NoSuchElementException("KeyError: ...")` — the
    * reference's loud failure — instead of silently skipping the cache. */
  def wrap[I, O](f: I => O): I => O = (i: I) => {
    val key = String.valueOf(i)
    get(key) match {
      case Some(v) => v.asInstanceOf[O]
      case None =>
        put(key, f(i))
        get(key).getOrElse(throw new NoSuchElementException(
          s"KeyError: $key (cache size_limit=$sizeLimit cannot hold the entry)"))
          .asInstanceOf[O]
    }
  }

  /** Durable-working-set flush: whole-file rewrite through a temp +
    * atomic rename (entry count is worker-local and bounded by sizeLimit). */
  private def flush(): Unit = {
    val tmp = new File(base, ownFile.getName + ".tmp")
    val oo = new ObjectOutputStream(new FileOutputStream(tmp))
    try {
      oo.writeInt(entries.size())
      entries.forEach { (k, v) =>
        oo.writeUTF(k); oo.writeInt(v.length); oo.write(v)
      }
    } finally oo.close()
    Files.move(tmp.toPath, ownFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    flushedBytes = totalBytes
  }

  /** Shutdown: each worker removes its own file (the directory ends empty
    * when every worker closed — test_udf_cache_directory_multiple_workers'
    * final `glob == []`). */
  def close(): Unit = synchronized {
    entries.clear(); totalBytes = 0
    ownFile.delete(): Unit
  }
}
