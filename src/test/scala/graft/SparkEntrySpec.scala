package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract: the query registry stays coherent
  * (unique names, oracle keys bound to real queries) and the flagship
  * entry returns rows.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("query names are unique across all groups") {
    val names = Seq(
      graft.queries.RelationalQueries.defs, graft.queries.ScalarQueries.defs,
      graft.queries.LlmQueries.defs, graft.queries.PipelineQueries.defs,
      graft.queries.StreamQueries.defs, graft.queries.SourceQueries.defs,
      graft.queries.CrawlQueries.defs, graft.queries.MediaQueries.defs)
      .flatten.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    assert(names.toSet == SparkEntry.queries.keySet)
  }

  test("every oracle belongs to a registered query and is non-empty") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracle for unknown query $name")
      assert(sql.trim.toUpperCase.startsWith("WITH") ||
        sql.trim.toUpperCase.startsWith("SELECT"), s"odd oracle SQL for $name")
    }
  }

  test("every bench build/probe split belongs to a registered query") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.benchPhases.keys.foreach(name =>
      assert(qs.contains(name), s"bench split for unknown query $name"))
  }

  test("entry returns rows on sf0.001") {
    val spark = SparkSpec.session
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
