package graft

import org.apache.spark.sql.SparkSession

/** One session-scoped reliable-checkpoint directory, shared by every
  * iterative operator (BFS frontier, crawl rounds, connected
  * components). Created lazily on first use, removed at JVM exit —
  * previously each call created its own `graft-ckpt` temp dir and never
  * deleted it, so checkpoint files accumulated across an 85-query
  * Verify/Bench session. On a cluster, set `spark.checkpoint.dir` (or
  * call `sc.setCheckpointDir`) to durable storage BEFORE first use and
  * this helper leaves it untouched.
  */
object Checkpoints {

  def ensure(spark: SparkSession): Unit = synchronized {
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
      sc.setCheckpointDir(dir.toString)
      Runtime.getRuntime.addShutdownHook(new Thread(() => delete(dir)))
    }
  }

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete(): Unit
  }
}
