package graft

import graft.operators.Dedup

class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def baseDir: java.io.File = {
    Checkpoints.ensure(spark)
    new java.io.File(
      new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath match {
        case p if p.nonEmpty => p
        case _ => spark.sparkContext.getCheckpointDir.get
      })
  }

  private def rotatedRoundDirs: Seq[java.io.File] = {
    val kids = baseDir.listFiles()
    if (kids == null) Seq.empty
    else kids.toSeq.filter(_.getName.startsWith("rot-"))
      .flatMap(r => Option(r.listFiles()).map(_.toSeq).getOrElse(Seq.empty))
  }

  test("Rotating holds at most two round directories across >=5 rounds") {
    val before = rotatedRoundDirs.map(_.getPath).toSet
    val rot = new Checkpoints.Rotating(spark)
    var df = Seq(1L, 2L, 3L).toDF("v")
    df = rot.checkpoint(df)
    val liveCounts = (1 to 6).map { i =>
      rot.advance()
      df = rot.checkpoint(df.select((col("v") + i).as("v")))
      rotatedRoundDirs.count(d => !before.contains(d.getPath))
    }
    // Round i keeps only rounds i-1 and i on disk.
    assert(liveCounts.forall(_ <= 2), s"live round dirs per round: $liveCounts")
    // The rotated state is still readable after older rounds were deleted.
    assert(df.as[Long].collect().sorted.toSeq == Seq(22L, 23L, 24L))
    rot.close()
    assert(rotatedRoundDirs.count(d => !before.contains(d.getPath)) <= 1)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("connectedComponents leaves no growing checkpoint trail") {
    val before = rotatedRoundDirs.map(_.getPath).toSet
    // 40-node chain: pointer jumping needs ~6 rounds, enough to rotate.
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val comps = Dedup.connectedComponents(pairs)
    assert(comps.select("component").distinct().count() == 1)
    // After the run at most the final round's directory survives.
    assert(rotatedRoundDirs.count(d => !before.contains(d.getPath)) <= 1)
  }
}
