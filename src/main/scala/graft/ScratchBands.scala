package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway perf probe for the LSH banding shapes (not part of the
  * driver contract): measures alternative exploded-band plans over the
  * same signatures and checks they are row-identical.
  */
object ScratchBands {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "zzz").as("text")))
    val hs = operators.Dedup.hashedShingleArrays(corpus, "doc_id", "text", 3)
    val sigs = operators.Dedup.minhashSignatures(hs, 128)

    val (numHashes, bands) = (128, 16)
    val rows = numHashes / bands
    def key(b: Int): Column = {
      val cols = (0 until rows).map(r => col(s"mh${b * rows + r}"))
      conv(substring(md5(concat_ws("_", cols: _*)), 1, 15), 16, 10)
        .cast("long")
    }

    // A: the shipped lshBands (explode(transform(band_keys,…)) over the
    // one-projection key array — see Dedup.lshBandsFromKeys).
    def vA: DataFrame = operators.Dedup.lshBands(sigs, numHashes, bands)

    // C: no carry — lower bound for the explode itself.
    def vC: DataFrame = {
      val structs = (0 until bands).map(b =>
        struct(lit(b).as("band"), key(b).as("band_key")))
      sigs.select(col("doc_id"), explode(array(structs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"),
          col("bk.band_key").as("band_key"))
    }

    // G: everything inside the generator — each struct carries the full
    // key array, so nothing expensive rides requiredChildOutput.
    def vG: DataFrame = {
      val keysArr = array((0 until bands).map(key): _*)
      val structs = (0 until bands).map(b =>
        struct(lit(b).as("band"), key(b).as("band_key"),
          keysArr.as("band_keys")))
      sigs.select(col("doc_id"), explode(array(structs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band_keys").as("band_keys"),
          col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    }

    // H: single struct generator column evaluated once: struct(keys,
    // structs) projected first, then explode its field.
    def vH: DataFrame = {
      val keysArr = array((0 until bands).map(key): _*)
      sigs.select(col("doc_id"), keysArr.as("band_keys"))
        .select(col("doc_id"), col("band_keys"),
          posexplode(
            transform(col("band_keys"), (k, i) =>
              struct(i.as("band"), k.as("band_key")))).as(Seq("pos", "bk")))
        .select(col("doc_id"), col("band_keys"),
          col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    }

    def time(label: String)(f: => DataFrame): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[bands] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("A_fused")(vA)
    time("C_nocarry")(vC)
    time("G_ingen")(vG)
    time("H_twosel")(vH)

    def cand(b: => DataFrame): DataFrame =
      operators.Dedup.lshCandidatePairs(b)
    time("candA")(cand(vA))
    time("candG")(cand(vG))
    time("candH")(cand(vH))

    // sanity: identical rows
    val nA = vA.selectExpr("doc_id", "band", "band_key").distinct().count()
    val nG = vG.selectExpr("doc_id", "band", "band_key").distinct().count()
    val nX = vA.selectExpr("doc_id", "band", "band_key")
      .exceptAll(vG.selectExpr("doc_id", "band", "band_key")).count()
    println(s"[bands] rowsA=$nA rowsG=$nG exceptAll=$nX")
    spark.stop()
  }
}
