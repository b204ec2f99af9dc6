package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Scale

/** Z-order layout: every output file must cover a compact RECTANGLE of
  * the two clustered dimensions (that is the data-skipping property —
  * parquet min/max stats then skip files for a predicate on either
  * column), where a linear single-column sort leaves the second
  * dimension spanning its full range in every file.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 interleaves bits") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("a", "b")
      .select(Scale.morton2(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // z(5,3) = interleave(101, 011) = b1b0a0... = 0b011111 = 10011 ->
    // bits: a=101 at even positions (1,0,1 -> 4·? ) computed by hand:
    // a bits {0:1,1:0,2:1} -> 1<<0 + 1<<4 = 17; b bits {0:1,1:1} ->
    // 1<<1 + 1<<3 = 10; total 27
    assert(got == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("z-ordered files cover rectangles; linear sort does not") {
    // uniform 128x128 grid, 16 output files of 1024 points each: the
    // z-curve tiles the grid into 32x32 squares, a linear sort into
    // 8x128 slabs
    val grid = spark.range(128L * 128L).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    val base = Files.createTempDirectory("graft_zorder").toString

    Scale.writeZOrdered(grid, "x", "y", s"$base/z", files = 16)
    val zStats = spark.read.parquet(s"$base/z")
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
      .agg(avg("rx").as("arx"), avg("ry").as("ary"), count(lit(1)).as("nf"))
      .collect()(0)
    assert(zStats.getAs[Long]("nf") == 16)
    // perfect tiling gives 31; allow tile-boundary straddling but stay
    // far below the 127 a full-range slab would show
    assert(zStats.getAs[Double]("arx") <= 63.0, s"x not clustered: $zStats")
    assert(zStats.getAs[Double]("ary") <= 63.0, s"y not clustered: $zStats")

    Scale.writeRangeSorted(grid, Seq("x"), s"$base/linear", files = 16)
    val linStats = spark.read.parquet(s"$base/linear")
      .groupBy(input_file_name().as("f"))
      .agg((max("y") - min("y")).as("ry"))
      .agg(avg("ry").as("ary")).collect()(0)
    // x-sorted slabs span the entire y range — no skipping on y
    assert(linStats.getAs[Double]("ary") >= 120.0)

    // layout is semantics-invariant
    assert(spark.read.parquet(s"$base/z").count() == 128L * 128L)
  }
}
