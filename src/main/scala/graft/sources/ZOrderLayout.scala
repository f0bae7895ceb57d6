package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout for multi-dimensional data
  * skipping.
  *
  * A 100-TB table filtered on TWO dimensions (user AND time, tenant AND
  * date…) prunes poorly under any single-column sort: sorting by user
  * makes every file span the full time range and vice versa. Writing in
  * Z-VALUE order keeps both dimensions locally clustered, so each
  * parquet row group covers a small rectangle of the (x, y) space and
  * its column min/max statistics exclude it from most box queries — the
  * reader skips whole row groups without touching their pages.
  * (The same layout trick Delta/Iceberg expose as `OPTIMIZE ZORDER BY`;
  * here it is just a repartition-by-range + sort before write — the
  * engine needs no format support, plain parquet stats do the work.)
  *
  * The z-value is pure column arithmetic (magic-bits interleave, ~12
  * codegen'd long ops — no UDF), so the layout pass is one range
  * shuffle at write time; readers pay nothing and need not know the
  * layout exists.
  */
object ZOrderLayout {

  /** Spread the low 32 bits of a non-negative long across the even bit
    * positions of a 64-bit word (the standard mask-shift cascade). */
  private def spreadBits(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 2-D Morton code of two NON-NEGATIVE integer columns (≤ 32
    * significant bits each; x on even bits, y on odd). Callers with raw
    * domains (timestamps, arbitrary ints) bucketize or offset first —
    * rank/bucket resolution beyond ~2^20 per dimension buys no extra
    * skipping because row groups are coarser than that anyway. */
  def zValue(x: Column, y: Column): Column =
    spreadBits(x.cast("long"))
      .bitwiseOR(shiftleft(spreadBits(y.cast("long")), 1))

  /** Reference implementation for specs: driver-side interleave. */
  def zValueRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Write `df` to parquet in z-order over `(xCol, yCol)`:
    * range-partition on the z-value (so files tile the curve) and sort
    * within partitions (so row groups *within* a file tile it too). */
  def writeZOrdered(df: DataFrame, path: String, xCol: Column, yCol: Column,
                    numFiles: Int): Unit = {
    require(numFiles > 0)
    df.withColumn("_z", zValue(xCol, yCol))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Data-skipping audit: for every parquet row group under `path`,
    * read the footer min/max statistics of `xCol`/`yCol` (both
    * long-typed) and report how many row groups a box query
    * `[xLo,xHi] × [yLo,yHi]` must actually read. This is exactly the
    * pruning decision the parquet reader makes per row group — measured
    * offline so a spec can compare layouts. Driver-side by design:
    * footers are KBs per file. */
  def rowGroupsOverlapping(spark: org.apache.spark.sql.SparkSession,
                           path: String, xName: String, yName: String,
                           xLo: Long, xHi: Long, yLo: Long,
                           yHi: Long): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    var total = 0
    var overlapping = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.forEach { block =>
          total += 1
          def range(name: String): (Long, Long) = {
            val cc = block.getColumns.asInstanceOf[java.util.List[
              org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]]
            val it = cc.iterator()
            while (it.hasNext) {
              val c = it.next()
              if (c.getPath.toDotString == name) {
                val s = c.getStatistics
                return (s.genericGetMin.asInstanceOf[Number].longValue(),
                  s.genericGetMax.asInstanceOf[Number].longValue())
              }
            }
            sys.error(s"column $name not found in $f")
          }
          val (xMin, xMax) = range(xName)
          val (yMin, yMax) = range(yName)
          if (xMax >= xLo && xMin <= xHi && yMax >= yLo && yMin <= yHi)
            overlapping += 1
        }
      } finally reader.close()
    }
    (overlapping, total)
  }
}
