package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions.tokens
import graft.operators.Dedup

/** Streaming near-duplicate detection — the streaming twin of the batch
  * MinHash+LSH pass (q27, [[graft.operators.Dedup.minhashLshPairs]]),
  * completing the batch/streaming duality the exact-dedup and
  * sessionize twins started.
  *
  * Shape: the per-row signature ([[Dedup.minhashSigCol]] — a row-local
  * array aggregate, shuffle-free by construction) and the band-key
  * explosion are STATELESS projections; the only stateful operator is a
  * `flatMapGroupsWithState` keyed on (band, band-key) whose state is the
  * set of (doc_id, signature) pairs seen in that bucket. A new arrival
  * emits one candidate pair per stored bucket-mate, scored exactly like
  * the batch rescore (fraction of agreeing minhashes), then joins the
  * state. This is the same candidate set the batch banded self-join
  * produces, discovered incrementally.
  *
  * Scale/state story (the part a 100-TB stream cares about):
  *   - state rows = live (band, key) buckets inside the watermark
  *     horizon; each holds only ids + k-long signatures, never text.
  *   - event-time timeout evicts a bucket once the watermark passes its
  *     newest member + the horizon — state is bounded by bucket churn,
  *     not by total documents streamed.
  *   - a bucket collecting more than `maxBucket` docs stops ACCUMULATING
  *     (keeps emitting pairs against the retained prefix) — the
  *     streaming analogue of the batch pass's hot-shingle frequency cap:
  *     a degenerate bucket (boilerplate corpus) would otherwise grow
  *     state and per-arrival cost quadratically. Retained-prefix pairs
  *     stay exact; pairs among the overflow are sacrificed, recorded
  *     here, exactly like the batch cap's documented recall trade.
  *
  * Same-batch arrivals: rows reaching the state function in one
  * micro-batch are processed in arrival order within the iterator, so
  * pairs among them are still emitted exactly once (a<b normalized).
  * A candidate pair sharing several bands is emitted once PER band —
  * downstream consumers (and the duality spec) take the distinct set,
  * mirroring the batch `.distinct()` before rescore.
  */
object NearDup {

  case class CandPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** One bucket member: id + its full k-minhash signature (needed to
    * score pairs against later arrivals). */
  case class Member(id: Long, sig: Seq[Long])

  /** Input must carry `doc_id`, `text`, and an `ingest_ts` event-time
    * column (watermarked here). Emits candidate pairs in append mode. */
  def streamingMinhashPairs(docs: DataFrame, k: Int = 12, bands: Int = 4,
                            watermark: String = "1 hour",
                            maxBucket: Int = 1024): Dataset[CandPair] = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // eviction horizon = the watermark delay, parsed from the same
    // "<n> <unit>" form withWatermark takes (kept deliberately simple —
    // an unrecognized unit fails loudly rather than defaulting)
    val horizonMs = watermark.trim.toLowerCase.split("\\s+") match {
      case Array(n, u) =>
        val v = n.toLong
        u.stripSuffix("s") match {
          case "millisecond"        => v
          case "second"             => v * 1000L
          case "minute"             => v * 60000L
          case "hour"               => v * 3600000L
          case "day"                => v * 86400000L
          case other => throw new IllegalArgumentException(
            s"unsupported watermark unit: $other")
        }
      case _ => throw new IllegalArgumentException(
        s"watermark must be '<n> <unit>', got: $watermark")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val sigd = docs
      .withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("ingest_ts"),
        Dedup.minhashSigCol(col("t"), k).as("sig"))
    // band keys: same (band, concat of r minhashes) the batch pass joins on
    val banded = sigd.select(col("doc_id"), col("ingest_ts"), col("sig"),
        explode(array((0 until bands).map { bd =>
          struct(lit(bd).as("band"),
            concat_ws("_", (0 until r).map(j =>
              element_at(col("sig"), bd * r + j + 1)): _*).as("key"))
        }: _*)).as("b"))
      .select(col("b.band").as("band"), col("b.key").as("key"),
        col("doc_id"), col("sig"), col("ingest_ts"))
      .as[(Int, String, Long, Seq[Long], java.sql.Timestamp)]
    banded
      .groupByKey(x => (x._1, x._2))
      .flatMapGroupsWithState[List[Member], CandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[List[Member]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var members = state.getOption.getOrElse(Nil)
            var maxTs = Long.MinValue
            val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
            rows.foreach { case (_, _, id, sig, ts) =>
              maxTs = math.max(maxTs, ts.getTime)
              if (!members.exists(_.id == id)) {
                members.foreach { m =>
                  val eq = sig.iterator.zip(m.sig.iterator)
                    .count { case (x, y) => x == y }
                  val (a, b) = if (m.id < id) (m.id, id) else (id, m.id)
                  out += CandPair(a, b, eq.toDouble / k)
                }
                if (members.size < maxBucket) members = Member(id, sig) :: members
              }
            }
            state.update(members)
            // evict once the watermark passes the newest member + horizon
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.iterator
          }
      }
  }
}
