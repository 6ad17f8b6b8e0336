package graft

import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared temp-parquet-dir fixture: tests create dirs through
  * [[tempDir]], and the suite deletes them once in afterAll — repeated
  * sweep runs must not leak disk. Mix in AFTER any suite that stops a
  * SparkSession in its own afterAll (stackable trait: super.afterAll()
  * runs first, then the cleanup). */
trait TempDirCleanup extends BeforeAndAfterAll { this: Suite =>

  private val tmpDirs =
    scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  protected def tempDir(prefix: String): String = tempPath(prefix).toString

  protected def tempPath(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs.synchronized { tmpDirs += p }
    p
  }

  override def afterAll(): Unit = {
    super.afterAll()
    tmpDirs.foreach { p =>
      if (java.nio.file.Files.exists(p)) {
        // Files.walk holds directory handles until closed — close the
        // stream before deleting (a try/finally around the traversal)
        val walk = java.nio.file.Files.walk(p)
        val all =
          try {
            import scala.jdk.CollectionConverters._
            walk.iterator().asScala.toSeq
          } finally walk.close()
        all.reverse.foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
  }
}
