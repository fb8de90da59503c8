package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints, per query, the scale-relevant plan
  * facts — exchange (shuffle) count, broadcast joins, pushed filters,
  * top-k via TakeOrderedAndProject, and whole-stage-codegen spans.
  * Run with an optional query-name filter:
  *   sbt "runMain graft.PlanAudit [substring]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = args.headOption
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE wraps the plan in AdaptiveSparkPlan and defers codegen
      // collapse to runtime; turn it off so the STATIC audit shows the
      // *(n) whole-stage-codegen spans (execution keeps AQE on).
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(q._1.contains))
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
          def n(marker: String): Int =
            marker.r.findAllMatchIn(plan).length
          println(f"$name%-36s shuffles=${n("Exchange hashpartitioning") +
            n("Exchange rangepartitioning")}%-3d " +
            f"bcast=${n("BroadcastHashJoin")}%-2d smj=${n("SortMergeJoin")}%-2d " +
            f"codegen=${plan.linesIterator.count(_.contains("*("))}%-3d " +
            f"topk=${n("TakeOrderedAndProject") > 0}%-5s " +
            f"pushed=${n("PushedFilters: \\[[^\\]]") > 0}%-5s")
        } catch { case e: Throwable =>
          println(f"$name%-36s PLAN ERROR: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
