package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Scratch directories for self-materializing queries (ETL / source
  * round-trips). Each call returns a fresh temp dir; all of them are
  * recursively deleted in one JVM shutdown hook — Bench runs every query
  * twice and Verify once more, so leaving them behind leaks a full copy of
  * the staged tables per run (round-2 verdict hygiene item). Deletion is
  * deferred to exit (not eager) because the returned DataFrames read from
  * these paths lazily.
  */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.forEach { root =>
      try
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => try Files.delete(p) catch { case _: Exception => () })
      catch { case _: Exception => () }
    }))

  /** Fresh temp directory, cleaned up on JVM exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
