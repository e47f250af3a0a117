package graft

/** All graft-created temp directories live under ONE graft-owned
  * subdirectory of java.io.tmpdir (`graft-tmp/`), so Bench's
  * stale-dir sweep can be scoped to directories this engine created
  * instead of pattern-matching the shared tmpdir (where any JVM's
  * `Files.createTempDirectory` output would match and a concurrent
  * foreign process's data could be destroyed). Every fixture,
  * checkpoint and warehouse call site routes through [[dir]].
  */
object GraftTmp {
  /** The graft-owned temp root — created on first use. */
  lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"), "graft-tmp")
    java.nio.file.Files.createDirectories(r)
    r
  }

  /** Drop-in replacement for `Files.createTempDirectory(prefix)` that
    * lands under [[root]]. */
  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)
}
