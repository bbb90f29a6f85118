package graft

import org.scalatest.{BeforeAndAfterAll, Suite}

/** Temp directories that are removed when the suite finishes. */
trait TmpDirSupport extends BeforeAndAfterAll { this: Suite =>
  private val tmpDirs = scala.collection.mutable.ArrayBuffer[String]()

  protected def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    tmpDirs += d; d
  }

  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    tmpDirs.foreach { d =>
      val p = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
    super.afterAll()
  }
}
