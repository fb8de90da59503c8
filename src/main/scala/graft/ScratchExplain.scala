package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan probe (not part of the driver contract). */
object ScratchExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "zzz").as("text")))
    val hs = operators.Dedup.hashedShingleArrays(corpus, "doc_id", "text", 3)
      .persist()
    val exploded = hs.select(col("doc_id"), explode(col("hs")).as("bh"))
    val blocked = operators.Dedup.shingleBlockedPairs(exploded, 20)
    blocked.explain("formatted")
    spark.stop()
  }
}
