package graft.ops

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Idempotent materialization of derived parquet/ORC estates under
  * [[Fixtures.Root]], keyed by a CONTENT STAMP of the source fixture
  * directory (relative name + length + mtime of every data file).
  *
  * The previous guard — a bare `_SUCCESS` existence check — kept serving
  * stale snapshots after the driver regenerated `/root/testdata`: the
  * Spark side read the old staging while the DuckDB oracle recomputed
  * from the current fixtures, a confusing gate divergence (ADVICE r8).
  * Here the stamp is written only AFTER a successful build, so a stamp
  * mismatch (regenerated fixtures) or a missing stamp (interrupted
  * build) both force a restage.
  */
object StagedEstate {

  /** Fingerprint of a fixture directory's current content. mtime+size is
    * enough: the driver regenerates fixtures by rewriting files, never by
    * in-place same-size-same-mtime edits. */
  def stampOf(srcDir: String): String = {
    val root = Paths.get(srcDir)
    val md = MessageDigest.getInstance("MD5")
    if (Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      val stream = Files.walk(root)
      try {
        stream.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(p => s"${root.relativize(p)}|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}")
          .toSeq.sorted
          .foreach(line => md.update((line + "\n").getBytes("UTF-8")))
      } finally stream.close()
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Run `build` (which writes the estate at `path`) unless `path`
    * already holds a staging of `srcDir`'s CURRENT content. The stamp
    * file lives next to the estate (`<path>.stamp`) and is written only
    * after `build` returns, so partial builds restage. Serialized: two
    * queries in one JVM ensuring the same estate must not race the
    * overwrite. Returns `path`. */
  def ensure(path: String, srcDir: String)(build: => Unit): String = synchronized {
    val stamp = stampOf(srcDir)
    val stampFile = Paths.get(path + ".stamp")
    val current = Files.exists(stampFile) && Files.readString(stampFile).trim == stamp
    if (!current) {
      Files.deleteIfExists(stampFile)
      build
      Files.createDirectories(stampFile.getParent)
      Files.writeString(stampFile, stamp)
    }
    path
  }
}
