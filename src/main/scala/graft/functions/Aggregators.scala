package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` implementations (SURVEY §2.7's
  * optional custom-aggregator surface — the extension point for
  * statistics Spark's built-ins don't ship as mergeable state).
  * Buffers are tiny case classes; merge is associative+commutative, so
  * these run as normal partial+final aggregation at any parallelism.
  */
object Aggregators {

  /** Welford/Chan parallel mean+variance: numerically stable streaming
    * moments with an exact distributed merge — the mergeable form of the
    * notebooks' mean/var statistics (usable per group via
    * `ds.groupByKey(...).agg(welford.toColumn)`). */
  case class Moments(n: Long, mean: Double, m2: Double)
  case class MeanVar(n: Long, mean: Double, variance: Double)

  val welford: Aggregator[Double, Moments, MeanVar] =
    new Aggregator[Double, Moments, MeanVar] {
      def zero: Moments = Moments(0L, 0.0, 0.0)
      def reduce(b: Moments, x: Double): Moments = {
        val n = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n
        Moments(n, mean, b.m2 + d * (x - mean))
      }
      def merge(a: Moments, b: Moments): Moments =
        if (a.n == 0) b else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          Moments(n,
            a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n * b.n / n)
        }
      def finish(m: Moments): MeanVar =
        MeanVar(m.n, m.mean, if (m.n > 1) m.m2 / (m.n - 1) else Double.NaN)
      def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      def outputEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
    }

  def welfordCol: TypedColumn[Double, MeanVar] = welford.toColumn

  /** Deterministic bounded sample per group: keeps the k inputs with the
    * smallest md5-derived priority — an order-independent "reservoir"
    * whose result is a pure function of the group's membership (same
    * philosophy as Sampling.hashBucket: reproducible on any cluster
    * layout). */
  case class PrioItem(priority: Long, value: String)
  case class TopKBuf(items: Seq[PrioItem])

  def deterministicSample(k: Int): Aggregator[String, TopKBuf, Seq[String]] =
    new Aggregator[String, TopKBuf, Seq[String]] {
      // stateless xxhash64 (no per-row MessageDigest allocation); buffer
      // trims lazily — only once it doubles past k — so the per-row cost
      // is an append, not a sort
      private def prio(v: String): Long =
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(v),
          org.apache.spark.sql.types.StringType, 42L)
      private def trim(s: Seq[PrioItem]): Seq[PrioItem] =
        if (s.size <= 2 * k) s
        else s.sortBy(p => (p.priority, p.value)).take(k)
      def zero: TopKBuf = TopKBuf(Nil)
      def reduce(b: TopKBuf, v: String): TopKBuf =
        TopKBuf(trim(b.items :+ PrioItem(prio(v), v)))
      def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
        TopKBuf(trim(a.items ++ b.items))
      def finish(b: TopKBuf): Seq[String] =
        b.items.sortBy(p => (p.priority, p.value)).take(k).map(_.value)
      def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
      def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }
}
