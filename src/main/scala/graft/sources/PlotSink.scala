package graft.sources

import java.awt.image.BufferedImage
import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** PNG chart sink (SURVEY §2.1 S15): the reference renders aggregated
  * results to chart images (visualizations.py:85-99, matplotlib);
  * re-expressed with ONLY the JDK's headless AWT raster — no native or
  * third-party imaging dependency.
  *
  * Plots are intrinsically small-data: the input contract is an ALREADY
  * AGGREGATED frame (months, categories, top-N …), so the `collect()`
  * here is the sink's definition, not a distributed anti-pattern — the
  * heavy lifting happened in the aggregation that produced the input.
  * Rendering draws only filled rectangles and axis lines (no text), so
  * output bytes are deterministic across runs and platforms.
  *
  * All three sinks share ONE scaffold ([[collectGuarded]] +
  * [[renderPng]]): the limit-guarded collect, the row-cap/NaN refusals,
  * the canvas + axis setup, and the file write — a contract change
  * lands in every chart at once.
  */
object PlotSink {

  private val MaxRows = 10000
  private val Margin = 40
  /** The classic matplotlib C0 blue — the mark color of every sink. */
  private val C0 = new java.awt.Color(31, 119, 180)

  /** Limit-guarded collect of a two-column (string, double) frame with
    * the shared refusals: empty input, raw (unaggregated) volume, NaN
    * values. The limit runs BEFORE collect so the guard never
    * materializes raw input on the driver. */
  private def collectGuarded(df: DataFrame, labelCol: String,
                             valueCol: String): Array[(String, Double)] = {
    val rows = df.select(col(labelCol).cast("string"),
        col(valueCol).cast("double")).limit(MaxRows + 1).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
    require(rows.nonEmpty, "plot input is empty — aggregate before plotting")
    require(rows.length <= MaxRows,
      s"plot input exceeds $MaxRows rows — a chart sink takes aggregated results, not raw data")
    require(rows.forall(!_._2.isNaN),
      s"plot input contains NaN in $valueCol — clean the aggregate before plotting")
    rows
  }

  /** White canvas + black axes, body drawn in C0, PNG written to
    * `path`. `draw` receives (graphics, plotW, plotH) with the axes
    * already placed at [[Margin]]. */
  private def renderPng(path: String, width: Int, height: Int)
                       (draw: (java.awt.Graphics2D, Int, Int) => Unit): File = {
    System.setProperty("java.awt.headless", "true")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, width, height)
      g.setColor(java.awt.Color.BLACK)
      g.drawLine(Margin, height - Margin, width - Margin, height - Margin) // x axis
      g.drawLine(Margin, Margin, Margin, height - Margin)                  // y axis
      draw(g, width - 2 * Margin, height - 2 * Margin)
    } finally g.dispose()
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    javax.imageio.ImageIO.write(img, "png", f)
    f
  }

  /** Render (label, value) rows as a bar chart PNG. Bars appear in the
    * frame's row order; heights are scaled to the max value (all-zero
    * input draws an axis-only chart). Returns the written file. */
  def barChart(df: DataFrame, labelCol: String, valueCol: String,
               path: String, width: Int = 640, height: Int = 400): File = {
    val rows = collectGuarded(df, labelCol, valueCol)
    renderPng(path, width, height) { (g, plotW, plotH) =>
      val maxV = math.max(rows.map(_._2).max, 0.0)
      if (maxV > 0.0) {
        val n = rows.length
        val slot = plotW.toDouble / n
        val barW = math.max(1, (slot * 0.8).toInt)
        g.setColor(C0)
        rows.zipWithIndex.foreach { case ((_, v), i) =>
          val h = math.max(0, (plotH * (v / maxV)).toInt)
          val x = Margin + (i * slot + slot * 0.1).toInt
          g.fillRect(x, height - Margin - h, barW, h)
        }
      }
    }
  }

  /** Render (label, value) rows as a LINE chart PNG — the reference's
    * monthly-sales-trend panel (visualizations.py:89-100, plt.plot of
    * the per-month aggregate). Points appear in the frame's ROW ORDER
    * (the caller's ORDER BY is the x axis — exactly how the reference
    * feeds its month-sorted frame to matplotlib); consecutive points
    * are joined with straight segments and each vertex carries a small
    * square marker. Values are scaled to [min, max] like [[scatter]]'s
    * y axis so a narrow-band trend isn't flattened onto the axis; an
    * ALL-CONSTANT series (vMax == vMin) is drawn mid-plot — under the
    * raw [min,max] rule every point would satisfy v-vMin = 0 and the
    * flat trend would render pinned to the bottom axis, reading as
    * zero (r11 ADVICE). */
  def lineChart(df: DataFrame, labelCol: String, valueCol: String,
                path: String, width: Int = 640, height: Int = 400): File = {
    val rows = collectGuarded(df, labelCol, valueCol)
    renderPng(path, width, height) { (g, plotW, plotH) =>
      val vs = rows.map(_._2)
      val (vMin0, vMax0) = (vs.min, vs.max)
      // constant series: pad the span symmetrically (±1 around the value,
      // ±|v| scaled for large magnitudes) so the line lands mid-plot
      val pad = if (vMax0 > vMin0) 0.0 else math.max(1.0, math.abs(vMin0))
      val (vMin, vMax) = (vMin0 - pad, vMax0 + pad)
      val vSpan = math.max(vMax - vMin, 1e-12)
      val n = rows.length
      // vertices sit at slot centers, so a single point is mid-plot and
      // n points tile the x range like barChart's n slots
      def px(i: Int): Int = Margin + ((i + 0.5) / n * plotW).toInt
      def py(v: Double): Int =
        height - Margin - ((v - vMin) / vSpan * plotH).toInt
      g.setColor(C0)
      (0 until n - 1).foreach { i =>
        g.drawLine(px(i), py(vs(i)), px(i + 1), py(vs(i + 1)))
      }
      (0 until n).foreach { i =>
        g.fillRect(px(i) - 2, py(vs(i)) - 2, 5, 5)
      }
    }
  }

  /** Render (x, y) rows as a scatter PNG — the Q-Q / residual-plot
    * surface (visualizations.py's scatter panels; statsmodels qqplot).
    * Same contract as [[barChart]]: input is an already-aggregated
    * frame (quantile grids, binned residuals), limit-guarded before
    * collect, deterministic bytes. `refLine` draws the y=x diagonal
    * (the Q-Q "perfect normality" reference). */
  def scatter(df: DataFrame, xCol: String, yCol: String, path: String,
              width: Int = 640, height: Int = 400,
              refLine: Boolean = false): File = {
    val rows = df.select(col(xCol).cast("double"), col(yCol).cast("double"))
      .limit(MaxRows + 1).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    require(rows.nonEmpty, "plot input is empty — aggregate before plotting")
    require(rows.length <= MaxRows,
      s"plot input exceeds $MaxRows rows — a chart sink takes aggregated results, not raw data")
    require(rows.forall(p => !p._1.isNaN && !p._2.isNaN),
      "plot input contains NaN — clean the aggregate before plotting")
    renderPng(path, width, height) { (g, plotW, plotH) =>
      val (xMin, xMax) = (rows.map(_._1).min, rows.map(_._1).max)
      val (yMin, yMax) = (rows.map(_._2).min, rows.map(_._2).max)
      val xSpan = math.max(xMax - xMin, 1e-12)
      val ySpan = math.max(yMax - yMin, 1e-12)
      def px(x: Double): Int = Margin + ((x - xMin) / xSpan * plotW).toInt
      def py(y: Double): Int = height - Margin - ((y - yMin) / ySpan * plotH).toInt
      if (refLine) {
        g.setColor(java.awt.Color.GRAY)
        val lo = math.max(xMin, yMin); val hi = math.min(xMax, yMax)
        if (hi > lo) g.drawLine(px(lo), py(lo), px(hi), py(hi))
      }
      g.setColor(C0)
      rows.foreach { case (x, y) => g.fillRect(px(x) - 1, py(y) - 1, 3, 3) }
    }
  }
}
