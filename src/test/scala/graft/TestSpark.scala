package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (sessions are
  * expensive; suites must not stop() it). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.build("4")

  /** Absolute path of a test resource directory/file on disk. */
  def resource(path: String): String =
    new java.io.File(getClass.getClassLoader.getResource(path).toURI).getAbsolutePath
}
