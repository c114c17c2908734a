package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout (`Layout`): Morton-value correctness against a bitwise
  * reference, the SQL twin's lockstep, and the actual write-path claim —
  * files produced by `clusterByZ` have bounded extents in BOTH
  * dimensions, unlike a single-column sort.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Bit-interleave reference implementation. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zValue matches the bitwise reference on random inputs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 16).alias("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === mortonRef(x, y, 16), s"x=$x y=$y")
    }
  }

  test("zValue locality: quadrant order and small known values") {
    // interleave of (x=1, y=0) -> 1; (0,1) -> 2; (1,1) -> 3; (2,2) -> 12
    val got = Seq((1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 16).alias("z"))
      .as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 3L, 12L, (1L << 32) - 1))
  }

  test("zValueSql evaluates identically to zValue through the SQL engine") {
    val rnd = new scala.util.Random(13)
    Seq.fill(100)((rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong))
      .toDF("x", "y").createOrReplaceTempView("zin")
    val viaSql = spark.sql(
      s"SELECT x, y, ${Layout.zValueSql("x", "y", 12)} AS z FROM zin")
      .as[(Long, Long, Long)].collect()
    viaSql.foreach { case (x, y, z) => assert(z === mortonRef(x, y, 12)) }
  }

  test("zOrderStats buckets bound BOTH dimensions' extents") {
    // uniform 256x256 grid; 16 z-buckets (bucketBits=4, even) fix the
    // top TWO bits of each dimension: every bucket is a 64x64 tile —
    // vs a single-dim bucketing where the other dim spans all 256
    val grid = for (x <- 0 until 256; y <- 0 until 256) yield (x.toLong, y.toLong)
    val stats = Layout.zOrderStats(grid.toDF("x", "y"), "x", "y",
        bits = 8, bucketBits = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.length === 16)
    stats.foreach { case (b, n, minX, maxX, minY, maxY) =>
      assert(n === 256L * 256 / 16, s"bucket $b")
      assert(maxX - minX === 63L, s"bucket $b x-extent")
      assert(maxY - minY === 63L, s"bucket $b y-extent")
    }
  }

  test("clusterByZ writes files with bounded per-file extents in both dims") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile
    dir.deleteOnExit()
    val grid = (for (x <- 0 until 128; y <- 0 until 128) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    Layout.clusterByZ(grid, "x", "y", bits = 7, numFiles = 16)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)

    val perFile = spark.read.parquet(dir.getAbsolutePath)
      .groupBy(input_file_name().alias("f"))
      .agg(
        min("x").alias("xmn"), max("x").alias("xmx"),
        min("y").alias("ymn"), max("y").alias("ymx"),
        count(lit(1)).alias("n"))
      .select("xmn", "xmx", "ymn", "ymx", "n")
      .as[(Long, Long, Long, Long, Long)].collect()

    assert(perFile.length >= 8, s"expected >=8 files, got ${perFile.length}")
    // Skipping semantics, not per-file hard bounds (a file straddling a
    // high power-of-two z boundary can legitimately span one dim): for a
    // narrow predicate on EITHER dimension, most files' min/max must
    // exclude it. A single-column x-sort would pass the x side and hit
    // 100% of files on the y side.
    def hits(lo: Long, hi: Long, extents: Array[(Long, Long)]): Int =
      extents.count { case (mn, mx) => mx >= lo && mn <= hi }
    val xExt = perFile.map { case (xmn, xmx, _, _, _) => (xmn, xmx) }
    val yExt = perFile.map { case (_, _, ymn, ymx, _) => (ymn, ymx) }
    assert(hits(0, 15, xExt) <= perFile.length / 2,
      s"x-predicate hit ${hits(0, 15, xExt)} of ${perFile.length} files")
    assert(hits(0, 15, yExt) <= perFile.length / 2,
      s"y-predicate hit ${hits(0, 15, yExt)} of ${perFile.length} files")
    // and the layout is balanced: repartitionByRange splits by z-quantile
    val sizes = perFile.map(_._5)
    assert(sizes.max <= 4L * sizes.min,
      s"file sizes unbalanced: ${sizes.mkString(",")}")
  }
}
