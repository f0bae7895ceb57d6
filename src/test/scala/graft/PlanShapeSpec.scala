package graft

import org.scalatest.funsuite.AnyFunSuite

/** GOLDEN PLAN-SHAPE pins for the board's five most expensive queries
  * (round-8 clean bench: q62 3.8 s, q51 2.2 s, q69 1.4 s, q26 1.3 s,
  * q68 1.1 s). A lost broadcast, a resurrected sort, or a new exchange
  * in one of these shows up in the bench as a wall-clock delta with no
  * name; these pins make the same regression fail BY QUERY AND BY FACT.
  *
  * Pin policy: CEILINGS at today's measured values (graft.tools
  * .PlanFacts on the same sf/conf this suite runs) — a future
  * optimization that removes an exchange or converts SMJ→broadcast
  * keeps passing; only regressions fail. Extraction is shared with the
  * PlanFacts tool so the measurement and the pin can't drift.
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def factsOf(name: String): Map[String, Int] = {
    val f = tools.PlanFacts.facts(
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString)
    operators.Caches.release()
    spark.catalog.clearCache()
    f
  }

  private def pin(name: String, ceilings: (String, Int)*): Unit = {
    val f = factsOf(name)
    ceilings.foreach { case (k, max) =>
      assert(f(k) <= max,
        s"$name: $k regressed to ${f(k)} (golden ceiling $max) — " +
          s"full facts: ${f.toSeq.sortBy(_._1).mkString(", ")}")
    }
  }

  test("q62 composed pipeline: all joins broadcast, bounded exchanges") {
    // one documents scan feeds quality→exact-dedup→near-dup→cluster→pack;
    // the keeper window and candidate joins own the hash exchanges, the
    // pack stage's ordering the range exchanges. An SMJ here means a
    // broadcast (hot-gram set, drop set) fell through.
    pin("q62_composed_pipeline",
      "sort_merge_join" -> 0, "exchange_hash" -> 10,
      "exchange_range" -> 3, "sort" -> 4, "cartesian" -> 0)
  }

  test("q51 dedup clusters: local-solved CC tail stays tiny") {
    // the limit-probe solves the small subgraph driver-side during
    // construction, so the FINAL plan is just labels⋈sizes⋈corpus: two
    // broadcast joins, one label groupBy exchange, the oracle sort.
    pin("q51_dedup_clusters",
      "sort_merge_join" -> 0, "exchange_hash" -> 2,
      "exchange_range" -> 1, "sort" -> 1, "cartesian" -> 0)
  }

  test("q69 prefix join: rarity-order window + candidate join stay broadcast-shaped") {
    // the df groupBy feeds the prefix window through ONE reused
    // exchange; candidate self-join, hash pre-prune and string rescore
    // all broadcast at this scale. More exchanges = the exchange reuse
    // or a broadcast was lost.
    pin("q69_prefix_join",
      "sort_merge_join" -> 0, "exchange_hash" -> 13,
      "exchange_range" -> 1, "sort" -> 3, "cartesian" -> 0)
  }

  test("q26 capped n-gram pairs: candidate/rescore joins all broadcast") {
    pin("q26_ngram_jaccard",
      "sort_merge_join" -> 0, "exchange_hash" -> 19,
      "exchange_range" -> 1, "sort" -> 1, "cartesian" -> 0)
  }

  test("q68 three-tier incremental dedup: tier joins bounded, no extra sorts") {
    // the three batch→corpus tier joins plan as SMJ over the shared
    // cached projection at this scale (AQE broadcasts the batch side at
    // runtime); a fourth SMJ or new exchange means a tier started
    // re-projecting or re-shuffling the corpus.
    pin("q68_incremental_dedup3",
      "sort_merge_join" -> 3, "exchange_hash" -> 17,
      "exchange_range" -> 1, "sort" -> 5, "cartesian" -> 0)
  }

  test("q80 chunking: narrow end to end — one spread, the oracle sort, nothing else") {
    // the chunker is a per-row explode: any join or extra exchange here
    // means the operator stopped being embarrassingly parallel.
    pin("q80_doc_chunking",
      "sort_merge_join" -> 0, "broadcast_hash_join" -> 0,
      "exchange_hash" -> 1, "exchange_range" -> 1, "sort" -> 1,
      "cartesian" -> 0)
  }

  test("q81 chunk packing: no mid-pipeline chunk sort sneaks back in") {
    // chunks enter the packer UNSORTED (docChunksRaw); the only sorts
    // are the packer's range partitioning and the oracle order. A third
    // sort/fourth range exchange = q80's oracle sort leaked into q81.
    pin("q81_chunk_packing",
      "sort_merge_join" -> 0, "broadcast_hash_join" -> 0,
      "exchange_hash" -> 4, "exchange_range" -> 3, "sort" -> 2,
      "cartesian" -> 0)
  }

  test("q82 vocab/OOV: the eval token stream joins the vocab by broadcast only") {
    // an SMJ here means the top-512 vocab stopped broadcasting and the
    // 100-TB eval token stream would shuffle for the join.
    pin("q82_vocab_oov",
      "sort_merge_join" -> 0, "broadcast_hash_join" -> 1,
      "exchange_hash" -> 2, "exchange_range" -> 1, "sort" -> 1,
      "cartesian" -> 0)
  }

  test("q99 cross-doc scrub: global-first agg + hash joins, never a positioned-stream SMJ") {
    // the global-first table and the repeat join ride the 60-bit gram
    // hash; an SMJ or extra exchange means the positioned gram stream
    // started shuffling for something other than its one partial agg.
    pin("q99_crossdoc_scrub",
      "sort_merge_join" -> 0, "exchange_hash" -> 8,
      "exchange_range" -> 1, "sort" -> 7, "cartesian" -> 0)
  }

  test("q100 quality quota: two-stage top-k, bounded exchanges") {
    pin("q100_quality_quota",
      "sort_merge_join" -> 0, "broadcast_hash_join" -> 1,
      "exchange_hash" -> 3, "exchange_range" -> 1, "sort" -> 5,
      "cartesian" -> 0)
  }

  test("q100 quality quota: the stage-1 window is SALTED (no whole-source sort)") {
    // the scale claim itself, asserted structurally: among the plan's
    // Window nodes there must be one partitioned by (source, salt) —
    // the md5-bucket `% 16` — and one by source alone over the pruned
    // survivors. If the salted window disappears (a refactor collapsing
    // to the naive one-window plan), a head domain at 100 TB sorts in
    // ONE task and no count-ceiling pin would notice.
    val plan = SparkEntry.queries("q100_quality_quota")(spark, sf)
      .queryExecution.executedPlan.toString
    operators.Caches.release()
    spark.catalog.clearCache()
    // the salt expression is pre-projected, so the salted window's
    // partition spec renders as [source#N, _w0#M] — two columns — while
    // stage 2 partitions by [source#N] alone; the md5-bucket salt
    // itself ("% 16") must exist in the projection below
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.exists(w => w.contains("[source#") && w.contains(", _w0#")),
      s"no salted (source, bucket) window in plan:\n${windows.mkString("\n")}")
    assert(windows.exists(w => w.contains("], [source#") && !w.contains(", _w0#")),
      s"no per-source stage-2 window in plan:\n${windows.mkString("\n")}")
    assert(plan.contains("% 16"),
      "the md5-bucket salt (% 16) disappeared from the plan")
  }

  test("q101 bigram LM: unigram joins broadcast, bigram join hash-partitioned") {
    // the unigram (vocab-sized) tables must broadcast — an SMJ there
    // would shuffle the scoring stream twice more; the bigram join and
    // the distinct-(doc, transition) agg own the hash exchanges. The
    // exchange ceiling counts RENDERED text, and the cached unigram
    // table's InMemoryRelation re-prints its one-time fill exchange at
    // each of its consumers (the q27-family cache-rendering artifact) —
    // so 11 rendered ≠ 11 executed; the executed inventory is the
    // uncached 7 with the fill exchange running once.
    pin("q101_bigram_lm",
      "sort_merge_join" -> 0, "broadcast_hash_join" -> 3,
      "exchange_hash" -> 11, "exchange_range" -> 1, "sort" -> 1,
      "cartesian" -> 0)
  }
}
