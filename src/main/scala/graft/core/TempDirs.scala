package graft.core

/** Scratch directories deleted recursively at JVM exit — every round-trip
  * entry, streaming sink, and spill path shares this so repeated
  * bench/verify/test runs don't accumulate data under /tmp. (Eager
  * post-read deletion is impossible for most callers: returned frames are
  * lazy and read their files when the consumer finally acts on them.)
  */
object TempDirs {

  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { d =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(d)
            .sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala
            .foreach(p => try java.nio.file.Files.delete(p)
                          catch { case _: Exception => () })
        } catch { case _: Exception => () }
      }))

  /** Create a tracked scratch directory (deleted recursively at JVM exit). */
  def create(prefix: String): String = {
    hook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Delete a tracked scratch directory NOW (and stop tracking it) — for
    * release hooks reclaiming space in a long-lived JVM instead of waiting
    * for exit. Unknown/already-deleted paths are a no-op.
    */
  def drop(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    dirs.remove(p)
    try {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala
          .foreach(q => try java.nio.file.Files.delete(q)
                        catch { case _: Exception => () })
    } catch { case _: Exception => () }
  }

  /** Like [[create]] but on tmpfs (`/dev/shm`) when available: for scratch
    * whose durability is irrelevant (streaming-replay checkpoints, transient
    * sinks) every fsync a checkpoint log issues (~5-10 ms each on this
    * host's disk, a dozen per micro-batch) becomes a memory write. Falls
    * back to the regular temp dir when tmpfs is absent. A 24/7 deployment
    * points its checkpoints at durable storage instead — this path is for
    * replays whose checkpoint dies with the JVM anyway.
    */
  def createFast(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
      hook
      val p = java.nio.file.Files.createTempDirectory(shm, prefix)
      dirs.add(p)
      p.toString
    } else create(prefix)
  }
}
