package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: OLD distinct-path dd_jaccard under the Scratch protocol
  * (fresh build per run, clearCache between runs) for apples-to-apples
  * comparison with the witness path.
  */
object JacProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val docs0 = Tables.documents(spark, sfDir)
      val corpus = docs0.select(col("doc_id"), col("text")).unionByName(
        docs0.select((col("doc_id") + 1000000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+", "zzz").as("text")))
      val hsArr = operators.Dedup
        .hashedShingleArrays(corpus, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exploded = hsArr.select(col("doc_id"), explode(col("hs")).as("bh"))
      operators.Dedup.jaccard(
        operators.Dedup.shingleBlockedPairs(exploded, 20), hsArr)
        .filter(col("jaccard") >= 0.5)
        .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("a"), col("b"))
        .write.format("noop").mode("overwrite").save()
      println(f"[old] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
