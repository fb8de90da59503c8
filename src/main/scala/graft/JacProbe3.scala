package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: witness-path prefixes, fresh build + clearCache per run. */
object JacProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fresh(): (DataFrame, DataFrame) = {
      val docs0 = Tables.documents(spark, sfDir)
      val corpus = docs0.select(col("doc_id"), col("text")).unionByName(
        docs0.select((col("doc_id") + 1000000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+", "zzz").as("text")))
      val hsArr = operators.Dedup
        .hashedShingleArrays(corpus, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exploded = hsArr.select(col("doc_id"), explode(col("hs")).as("bh"))
      (hsArr, exploded)
    }
    def run(label: String)(mk: (DataFrame, DataFrame) => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val (hsArr, exploded) = fresh()
        mk(hsArr, exploded).write.format("noop").mode("overwrite").save()
        println(f"[p3] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }

    def groups(exploded: DataFrame) = exploded
      .groupBy(col("bh"))
      .agg(functions.CappedSortedList(col("doc_id"), 20).as("ids"))
      .filter(size(col("ids")).between(2, 20))
    def mkPairs(exploded: DataFrame) = {
      val pairsExpr = flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          b => struct(a.as("a"), b.as("b")))))
      groups(exploded).select(col("bh"), explode(pairsExpr).as("p"))
        .filter(col("p.a") < col("p.b"))
        .select(col("p.a").as("a"), col("p.b").as("b"), col("bh"))
    }
    def mkDocs(hsArr: DataFrame, exploded: DataFrame) = {
      val rareArrs = groups(exploded)
        .select(explode(col("ids")).as("doc_id"), col("bh"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("bh"))).as("hs_rare"))
      hsArr.join(rareArrs, Seq("doc_id"), "left")
        .withColumn("hs_rare",
          coalesce(col("hs_rare"), typedLit(Array.empty[Long])))
        .select(col("doc_id"), size(col("hs")).as("n_sh"), col("hs_rare"),
          sort_array(array_except(col("hs"), col("hs_rare"))).as("hs_hot"))
    }
    run("pairsOnly")((_, e) => mkPairs(e))
    run("docsOnly")((h, e) => mkDocs(h, e))
    run("joinA") { (h, e) =>
      mkPairs(e).join(broadcast(mkDocs(h, e)
        .select(col("doc_id").as("a"), col("hs_rare").as("ra"))), Seq("a"))
        .select(col("a"), col("b"), size(col("ra")).as("x"))
    }
    import graft.functions.NativeHashExprs.{sortedInterCount, sortedInterMin}
    def mkJoined(h: DataFrame, e: DataFrame) = {
      val d = mkDocs(h, e)
      def side(tag: String) = broadcast(
        d.select(col("doc_id").as(tag), col("hs_rare").as(s"r$tag"),
          col("hs_hot").as(s"h$tag"), col("n_sh").as(s"n_$tag")))
      mkPairs(e).join(side("a"), Seq("a")).join(side("b"), Seq("b"))
    }
    run("joinAB") { (h, e) =>
      mkJoined(h, e).select(col("a"), col("b"), size(col("ra")).as("x"),
        size(col("rb")).as("y"))
    }
    run("joinAB+witness") { (h, e) =>
      mkJoined(h, e).filter(col("bh") === sortedInterMin(col("ra"), col("rb")))
        .select(col("a"), col("b"))
    }
    run("joinAB+witness+counts") { (h, e) =>
      mkJoined(h, e).filter(col("bh") === sortedInterMin(col("ra"), col("rb")))
        .select(col("a"), col("b"),
          (sortedInterCount(col("ra"), col("rb")) +
            sortedInterCount(col("ha"), col("hb"))).as("n_inter"),
          col("n_a"), col("n_b"))
    }
    def manualTail(h: DataFrame, e: DataFrame) =
      mkJoined(h, e).filter(col("bh") === sortedInterMin(col("ra"), col("rb")))
        .select(col("a"), col("b"),
          (sortedInterCount(col("ra"), col("rb")) +
            sortedInterCount(col("ha"), col("hb"))).as("n_inter"),
          col("n_a"), col("n_b"))
        .withColumn("jaccard",
          col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
    run("manual+jac")((h, e) => manualTail(h, e))
    run("manual+jacFilter")((h, e) => manualTail(h, e)
      .filter(col("jaccard") >= 0.5))
    run("manual+sort")((h, e) => manualTail(h, e)
      .filter(col("jaccard") >= 0.5)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("a"), col("b")))
    run("manual+rep1sort")((h, e) => manualTail(h, e)
      .filter(col("jaccard") >= 0.5)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
      .repartition(1).sortWithinPartitions(col("a"), col("b")))
    run("full")((h, _) => operators.Dedup.blockedJaccard(h, 20)
      .filter(col("jaccard") >= 0.5)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("a"), col("b")))
    spark.stop()
  }
}
