package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order values and physical clustering. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderValue interleaves bits: a even positions, b odd") {
    val df = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L))
      .toDF("a", "b")
      .select(Layout.zorderValue(col("a"), col("b"), 3).as("z"))
    // a=101,b=011 -> z bits: a0<<0 + b0<<1 + a1<<2 + b1<<3 + a2<<4 + b2<<5
    //              = 1 + 2 + 0 + 8 + 16 + 0 = 27
    assert(df.as[Long].collect().toSeq == Seq(27L, 0L, 21L, 42L))
  }

  test("zorderValueSql computes the identical value in SQL") {
    val sql = Layout.zorderValueSql("a", "b", 3)
    val got = spark.sql(s"SELECT $sql AS z FROM (SELECT 5L AS a, 3L AS b)")
      .as[Long].collect().head
    assert(got == 27L)
  }

  test("zorderWrite: files hold disjoint contiguous z-ranges") {
    val path = java.nio.file.Files.createTempDirectory("graft-zorder")
      .toString + "/t"
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("a"), ((col("id") / 64) % 64).as("b"))
    Layout.zorderWrite(df, "a", "b", bits = 6, parts = 8, path)
    val ranges = spark.read.parquet(path)
      .withColumn("z", Layout.zorderValue(col("a"), col("b"), 6))
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .select(col("lo"), col("hi")).as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
