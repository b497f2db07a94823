package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins both halves of the z-order claim: the Morton code itself against
  * a bit-twiddling reference, and the LOCALITY property the layout
  * exists for — per-file footer min/max ranges bound BOTH dimensions, so
  * a slice predicate on the second dimension intersects few files where
  * a single-column-sorted layout intersects all of them.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue equals a scalar Morton reference on a full 16x16 lane grid") {
    def mortonRef(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    // domain 0..65535 on both axes -> lanes are the raw values
    val pts = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong * 4369L, y.toLong * 4369L) // spread over the lane
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zvalue(col("x"), col("y"), 0L, 65535L, 0L, 65535L).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      val lx = x * 65535L / 65535L; val ly = y * 65535L / 65535L
      assert(z == mortonRef(lx, ly), s"($x,$y)")
    }
  }

  test("z-layout bounds both dims per file; x-sorted layout cannot") {
    // uniform 2-D grid, 256x64 points; a narrow Y slice (1/8 of the
    // domain) must intersect FEW z-ordered files, but EVERY x-sorted
    // file (each spans the full y domain)
    val grid = (for (x <- 0 until 256; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val dir = graft.util.Scratch.fresh("zorder_spec")
    ZOrder.writeZOrdered(grid, "x", "y", nFiles = 16, s"$dir/z")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$dir/linear")
    def filesIntersectingYSlice(path: String, lo: Long, hi: Long): Int = {
      val files = spark.read.parquet(path).inputFiles
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("y")).cast("long"), max(col("y")).cast("long")).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo // [min,max] ∩ [lo,hi] ≠ ∅
      }
    }
    val zHit = filesIntersectingYSlice(s"$dir/z", 24, 31)
    val linHit = filesIntersectingYSlice(s"$dir/linear", 24, 31)
    assert(linHit == 16, s"x-sorted files all span the y domain: $linHit")
    // 1/8 y-slice over a 16-file z-layout: the curve visits the slice in
    // a bounded number of segments; half the files is a loose ceiling
    assert(zHit <= 8, s"z-layout must bound y per file: $zHit of 16")
    assert(zHit < linHit)
  }

  test("fileCount: rows drive the count, nFiles is only a floor") {
    // r16 sizing audit (third-decade exponent 1.132 on the fixed-16
    // form): per-task sort work must stay ~constant as rows grow, so
    // the count is ceil(rows / target) once that exceeds the floor
    assert(ZOrder.fileCount(0L, 16, 2000000L) === 16)
    assert(ZOrder.fileCount(31999999L, 16, 2000000L) === 16)
    assert(ZOrder.fileCount(32000000L, 16, 2000000L) === 16)
    assert(ZOrder.fileCount(32000001L, 16, 2000000L) === 17)
    // sf100 events shape: ~600M rows -> 300 writers, not 16
    assert(ZOrder.fileCount(600000000L, 16, 2000000L) === 300)
    assert(ZOrder.fileCount(5L, 4, 1L) === 5)
    intercept[IllegalArgumentException](ZOrder.fileCount(5L, 0, 1L))
    intercept[IllegalArgumentException](ZOrder.fileCount(5L, 1, 0L))
    // ADVICE r17: a derived count above Int.MaxValue clamps instead of
    // wrapping negative under toInt
    assert(ZOrder.fileCount(Long.MaxValue, 16, 1L) === Int.MaxValue)
    // ADVICE r18: with target > 1 the old `rows + target - 1` ceiling
    // itself overflowed Long (negative sum -> clamp bypassed, returned
    // nFiles); the divide-first form clamps for every near-MaxValue rows
    assert(ZOrder.fileCount(Long.MaxValue, 16, 2L) === Int.MaxValue)
    assert(ZOrder.fileCount(Long.MaxValue - 1, 16, 2000000L) === Int.MaxValue)
    // and stays exact where it matters: remainder-free vs carry
    assert(ZOrder.fileCount(4000000L, 1, 2000000L) === 2)
    assert(ZOrder.fileCount(4000001L, 1, 2000000L) === 3)
  }

  test("writeZOrdered honors the derived count end-to-end") {
    val grid = (for (x <- 0 until 64; y <- 0 until 16)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val dir = graft.util.Scratch.fresh("zorder_sizing_spec")
    // 1024 rows, 100-row target -> 11 files, above the nFiles=4 floor
    ZOrder.writeZOrdered(grid, "x", "y", nFiles = 4, s"$dir/sized",
      targetRowsPerFile = 100L)
    val sized = spark.read.parquet(s"$dir/sized")
    assert(sized.inputFiles.length === ZOrder.fileCount(1024L, 4, 100L))
    assert(sized.count() === 1024L)
    // under the target the floor holds: exactly nFiles writers
    ZOrder.writeZOrdered(grid, "x", "y", nFiles = 4, s"$dir/floor")
    assert(spark.read.parquet(s"$dir/floor").inputFiles.length === 4)
  }
}
