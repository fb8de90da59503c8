package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage timings for the blocked-jaccard pipeline. */
object JacProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[jac] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs0 = Tables.documents(spark, sfDir)
    val corpus = docs0.select(col("doc_id"), col("text")).unionByName(
      docs0.select((col("doc_id") + 1000000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "zzz").as("text")))
    val hsArr = operators.Dedup.hashedShingleArrays(corpus, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hsArr.write.format("noop").mode("overwrite").save()
    val exploded = hsArr.select(col("doc_id"), explode(col("hs")).as("bh"))

    // Old path stages.
    val blocked = operators.Dedup.shingleBlockedPairs(exploded, 20)
    time("old:blockedPairs+distinct")(
      blocked.write.format("noop").mode("overwrite").save())
    time("old:full")(operators.Dedup.jaccard(blocked, hsArr)
      .filter(col("jaccard") >= 0.5)
      .write.format("noop").mode("overwrite").save())

    // New path stages.
    val pairsW = operators.Dedup.shingleBlockedPairsWitnessed(exploded, 20)
    time("new:pairsWitnessed")(
      pairsW.write.format("noop").mode("overwrite").save())

    // Granular: rebuild blockedJaccard's internals for stage timing.
    def groups() = exploded
      .groupBy(col("bh"))
      .agg(functions.CappedSortedList(col("doc_id"), 20).as("ids"))
      .filter(size(col("ids")).between(2, 20))
    val rareArrs = groups()
      .select(explode(col("ids")).as("doc_id"), col("bh"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("bh"))).as("hs_rare"))
    val docsT = hsArr
      .join(rareArrs, Seq("doc_id"), "left")
      .withColumn("hs_rare",
        coalesce(col("hs_rare"), typedLit(Array.empty[Long])))
      .select(col("doc_id"), size(col("hs")).as("n_sh"), col("hs_rare"),
        array_except(col("hs"), col("hs_rare")).as("hs_hot"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("new:docsSplit")(docsT.write.format("noop").mode("overwrite").save())
    def side(tag: String) = broadcast(
      docsT.select(col("doc_id").as(tag), col("hs_rare").as(s"r$tag"),
        col("hs_hot").as(s"h$tag"), col("n_sh").as(s"n_$tag")))
    val joined2 = pairsW.join(side("a"), Seq("a")).join(side("b"), Seq("b"))
    time("new:join-noIntersect")(joined2.select(col("a"), col("b"),
      size(col("ra")).as("x"), size(col("rb")).as("y"))
      .write.format("noop").mode("overwrite").save())
    val withIr = joined2.withColumn("ir", array_intersect(col("ra"), col("rb")))
    time("new:join+witness")(withIr.filter(col("bh") === array_min(col("ir")))
      .select(col("a"), col("b"), size(col("ir")).as("ni"))
      .write.format("noop").mode("overwrite").save())
    time("new:full")(operators.Dedup.blockedJaccard(hsArr, 20)
      .filter(col("jaccard") >= 0.5)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
