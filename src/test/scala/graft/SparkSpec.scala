package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (sbt forks one test JVM;
  * suites run sequentially and reuse the session — JVM exit cleans up).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Rewrite a generational table dir into the LEGACY pre-`b<id>` flat
    * append layout — the fixture for the flat-store migration specs
    * (one shared implementation: [[graft.sources.Commits
    * .rewindToFlatLayout]], also used by the bench's migration build).
    */
  protected def flattenBatchDirs(table: String): Unit =
    graft.sources.Commits.rewindToFlatLayout(spark, table)

  /** The table dir's top-level data files (the legacy flat residue the
    * migration must reclaim).
    */
  protected def flatFiles(table: String): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(table)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath.getName)
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
