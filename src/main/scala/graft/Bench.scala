package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Per-query timing record: every rep's wall time, in run order.
    * A failed rep is recorded as -1.0 (never a plausible elapsed time) so a
    * regression can't masquerade as a speedup.
    * `gcMs` pairs each rep with the JVM GC time (millis, summed over all
    * collector beans) that elapsed DURING that rep: a slow rep with
    * proportionally large gcMs is a GC pause, one with near-zero gcMs is
    * external load — the two causes the suspect list alone can't
    * distinguish (round-6: q43's lone 12 s rep under zero box load).
    */
  final case class QueryTimes(name: String, reps: Vector[Double],
                              gcMs: Vector[Long] = Vector.empty,
                              retried: Int = 0) {
    val failed: Boolean = reps.contains(-1.0)
    val median: Double = if (failed) -1.0 else Bench.medianOf(reps)
    val min: Double = if (failed) -1.0 else reps.min
    val max: Double = if (failed) -1.0 else reps.max
    /** Rep spread = max/min. On a quiet box warm reps of the same query in
      * the same JVM agree within tens of percent; a spread ≥2× means some
      * rep was starved by external load (the r5 driver run reported q42 at
      * 11.4 s when its warm cost is 0.7 s — a 16× rep spread would have
      * flagged it). Guarded by an absolute floor so sub-second queries whose
      * natural jitter is a few hundred ms can't false-positive.
      */
    val suspect: Boolean =
      !failed && reps.size >= 2 && min > 0.0 &&
        (max / min) >= SuspectRatio && (max - min) >= SuspectAbsGapSec
  }

  /** A rep ≥2× slower than its sibling reps, and slower by ≥0.5 s, is load
    * contention, not the engine: nothing in a cache-cleared re-run of the
    * same plan in the same JVM doubles its own cost.
    */
  val SuspectRatio = 2.0
  val SuspectAbsGapSec = 0.5

  /** Averaged median: the mean of the two middle elements on even-length
    * vectors. The previous lower-middle convention let ONE fast adaptive
    * extra rep flip a retried query's reported median to the
    * minimum-side value — a one-sided re-rep policy plus a lower-middle
    * median is a systematic downward bias on exactly the queries the
    * retry machinery touches. The averaged form is unbiased under
    * either-direction extras and identical on odd counts. */
  def medianOf(xs: Vector[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** The external-load signature that triggers an ADAPTIVE RE-REP: the
    * median is >3× the fastest rep AND some rep above that 3× line
    * carries near-zero GC for its excess (<10% of the extra wall time) —
    * a genuine GC pause would bill most of the excess to the collector,
    * and a genuine engine cost would reproduce across reps (so the min
    * would rise with the median). Round 8's committed artifact carried
    * q28 at 13.5 s (reps 21.6/13.5/0.88 with GC 0/241/0 ms) on a
    * contended box whose clean cost is 0.59 s — up to
    * [[MaxExtraReps]] extra reps pull the median back to the engine's
    * number when the contention was transient, and leave it (honestly)
    * high when the box stays busy. */
  def loadContended(walls: Vector[Double], gcMs: Vector[Long]): Boolean = {
    val ok = walls.zipAll(gcMs, -1.0, 0L).filter(_._1 >= 0.0)
    if (ok.size < 2) return false
    val ws = ok.map(_._1)
    val mn = ws.min
    // deliberately the LOWER-middle (not the averaged medianOf): the
    // trigger stays conservative — with only two surviving reps the
    // lower-middle IS the min, so failed-rep patterns can never fire a
    // re-rep on the strength of a single slow survivor
    val median = ws.sorted.apply((ws.size - 1) / 2)
    mn > 0.0 && median > 3.0 * mn &&
      ok.exists { case (w, gc) => w > 3.0 * mn && gc < 100.0 * (w - mn) }
  }
  val MaxExtraReps = 2

  /** The adaptive re-rep step, pure so the wiring is spec-testable with
    * a scripted rep runner: when the initial pattern shows
    * [[loadContended]]'s external-load signature, append ALL
    * [[MaxExtraReps]] extra reps (keeping the rep count odd — see the
    * bias note inside). Returns (all reps in run order, extras
    * executed). Transient contention: extras come in fast and pull the
    * median back to the engine's number. Sustained contention: extras
    * stay slow, the median stays (honestly) high, and the suspect flag
    * still fires on the rep spread. */
  def adaptiveReps(initial: Vector[(Double, Long)],
                   runRep: () => (Double, Long)): (Vector[(Double, Long)], Int) = {
    var timed = initial
    var extras = 0
    // Once the signature fires, run BOTH extras unconditionally (r10
    // change): a stop-when-repaired loop added extras only on the slow
    // side, so with an even rep count a single fast extra could flip the
    // reported median to the minimum-side value — a systematic downward
    // bias on exactly the retried queries. 3 initial + 2 extras = an odd
    // count, where the median is one real rep, unambiguous either way.
    if (loadContended(timed.map(_._1), timed.map(_._2))) {
      while (extras < MaxExtraReps) {
        timed :+= runRep()
        extras += 1
      }
    }
    (timed, extras)
  }

  /** First three fields of /proc/loadavg ("1min 5min 15min"), or "" where
    * unavailable. Captured before and after the run: a 1-min load far above
    * the core count at either edge means the box was dirty and the numbers
    * in this artifact should be discarded, not graded.
    */
  def loadavg(): String =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split("\\s+").take(3).mkString(" ")
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** Clean-box thresholds for the COMMITTED artifact (SCALE.md §bench
    * hygiene): every clean 62–72 s board was captured at 1-min < 0.5 and
    * 5-min < 1.5; a 5-min ≥ 2 inflated q62/q79 by 20–40% even when the
    * 1-min read 0. Runs above these bounds still print both stdout lines
    * (the driver's BENCH_r{N}.json is unaffected) — they just can't
    * OVERWRITE the committed clean board. */
  val DirtyLoad1Min = 0.5
  val DirtyLoad5Min = 1.5
  /** A run that starts clean but gets load-spiked mid-flight identifies
    * itself through its own rep spreads: the r11 driver run (load gate
    * not yet in place) carried 11 suspects on a 91-query board whose
    * clean captures carry 0–1. Four suspects is far above clean-run
    * jitter and far below any real contamination event. */
  val DirtySuspectN = 4

  /** Why the committed compact artifact must not be overwritten by this
    * run, or None if the run is clean enough to commit. Pure, spec-pinned:
    * the r11 full-board run under external load overwrote the committed
    * 71.8 s board with a 111.7 s / 11-suspect one — the subset-run guard
    * (r11) never saw it coming because the run WAS a full board. An
    * unparseable/empty loadavg (no /proc) fails open on the load check;
    * the suspect-count check still applies. */
  def dirtyRunReason(loadBefore: String, suspectN: Int): Option[String] = {
    val fields = loadBefore.trim.split("\\s+").toSeq
      .flatMap(_.toDoubleOption)
    val loadDirty = fields match {
      case Seq(m1, m5, _*) => m1 >= DirtyLoad1Min || m5 >= DirtyLoad5Min
      case _ => false
    }
    if (loadDirty)
      Some(s"load_before '$loadBefore' exceeds clean thresholds " +
        s"(1-min < $DirtyLoad1Min, 5-min < $DirtyLoad5Min)")
    else if (suspectN >= DirtySuspectN)
      Some(s"$suspectN suspect queries (>= $DirtySuspectN): " +
        "box was load-spiked mid-run")
    else None
  }

  /** Third guard on the committed artifact (r12): [[dirtyRunReason]]
    * reads load BEFORE the run, but a box can degrade MID-run and
    * produce a board uniformly 20–30% slower with a green load gate and
    * one or two suspects (observed same-session: an 84.9 s capture over
    * the committed 67.9 s clean board — load_before 0.00, load_after
    * 10.2, every shared query inflated ~1.2–1.3×). A UNIFORM slowdown
    * is a box signature, not an engine one: a real code regression
    * localizes to the queries whose plans changed, moving the MEDIAN
    * per-query ratio barely at all. So: if the median ratio over the
    * shared set (committed median ≥ 0.1 s, so the noise floor can't
    * vote) reaches [[UniformSlowdownRatio]], divert. A genuine broad
    * regression still lands in bench_full.json, both stdout lines and
    * the .dirty sibling — it just can't silently replace the clean
    * number of record; fails open when there is no committed board or
    * too few shared queries to call a distribution. */
  val UniformSlowdownRatio = 1.15
  val UniformSlowdownMinShared = 10

  /** RE-BASELINE procedure: the guard family (load gate, suspect count,
    * sf match, uniform-slowdown ratio) protects the committed clean
    * board from box noise, which also means a GENUINE uniform engine
    * regression (e.g. a Spark version bump) can never replace it by
    * itself. To deliberately re-baseline, run the full board with
    * `BENCH_FORCE_COMMIT=1` in the environment: every commit guard is
    * bypassed with a loud stderr note recording the reason that would
    * have diverted. Use only on a verified-quiet box — the override
    * exists for re-baselining, not for rescuing a contended run. */
  val ForceCommitEnv = "BENCH_FORCE_COMMIT"

  /** Fourth guard (round-13 ADVICE): the ratio comparison is only
    * meaningful between runs at the SAME scale factor — a larger-sf run
    * would divert forever as a "uniform slowdown" while a smaller-sf
    * run would read uniformly faster and silently replace the sf0.1
    * board of record. A full run at a different sf never touches the
    * committed artifact (fails open when the committed board predates
    * the sf field or is missing). */
  def sfMismatchReason(committedSf: Option[String], runSf: String): Option[String] =
    committedSf.filter(_ != runSf).map(c =>
      s"run sf '$runSf' differs from the committed board's sf '$c' — " +
        "a different-scale run must not replace or be ratio-compared to " +
        "the board of record")

  /** The committed compact board's "sf" field, or None when the file is
    * missing, unparseable, or predates the field. */
  def committedBoardSf(path: String): Option[String] =
    try {
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8))
      j \ "sf" match {
        case JString(s) => Some(s)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def uniformSlowdownReason(committed: Map[String, Double],
                            fresh: Map[String, Double]): Option[String] = {
    val ratios = committed.toSeq.collect {
      case (k, old) if old >= 0.1 && fresh.contains(k) => fresh(k) / old
    }
    if (ratios.size < UniformSlowdownMinShared) None
    else {
      val m = medianOf(ratios.toVector)
      if (m >= UniformSlowdownRatio)
        Some(f"median per-query ratio $m%.2fx vs the committed board " +
          s"over ${ratios.size} shared queries — uniform mid-run box slowdown")
      else None
    }
  }

  /** Fifth guard (r14 VERDICT — the manual cal gate, promoted into
    * code): the r14 capture log shows a cal-10.21 run (committed board's
    * cal: 5.12) PASSING the median uniform-slowdown guard at 1.07× and
    * being reverted by hand — a heavy-tail box degradation (per-job
    * dispatch latency) inflates SMALL queries ~3× while leaving the big
    * ones flat, so the median over a board dominated by big queries
    * barely moves. The calibration workload measures the BOX directly,
    * so compare it against the committed board's own cal: a run on a
    * box ≥ [[CalRegressionRatio]]× slower than the one that captured
    * the board of record must not replace it. Fails open with no
    * committed cal (first capture, or a board predating the field) and
    * on non-positive fresh cal (subset runs mark -1.0 and never reach
    * the gate anyway). */
  val CalRegressionRatio = 1.2

  def calRegressionReason(committedCal: Option[Double],
                          cal: Double): Option[String] =
    committedCal.filter(c => c > 0.0 && cal > 0.0 &&
        cal >= CalRegressionRatio * c)
      .map(c => f"calibration $cal%.2f s vs the committed board's $c%.2f s " +
        f"(>= ${CalRegressionRatio}%.1fx) — box slower than the capture of record")

  /** Sixth guard (r14 VERDICT, same incident): the TAIL of the
    * per-query ratio distribution, alongside the median. The heavy-tail
    * signature — a minority of queries 3× slower, the rest flat — slips
    * a median guard by construction; p90 of the ratios catches it (with
    * ≥ [[UniformSlowdownMinShared]] shared queries, ≥10% of the board
    * must be ≥ [[TailSlowdownRatio]]× slower to fire, far above clean
    * jitter where the p90 ratio sits ~1.0–1.1). Same noise floor and
    * fail-open rules as [[uniformSlowdownReason]]. */
  val TailSlowdownRatio = 1.5

  def tailSlowdownReason(committed: Map[String, Double],
                         fresh: Map[String, Double]): Option[String] = {
    val ratios = committed.toSeq.collect {
      case (k, old) if old >= 0.1 && fresh.contains(k) => fresh(k) / old
    }
    if (ratios.size < UniformSlowdownMinShared) None
    else {
      val sorted = ratios.sorted.toVector
      val p90 = sorted(math.ceil(0.9 * sorted.size).toInt - 1)
      if (p90 >= TailSlowdownRatio)
        Some(f"p90 per-query ratio $p90%.2fx vs the committed board " +
          s"over ${ratios.size} shared queries — heavy-tail box slowdown " +
          "(small queries inflated, median unmoved)")
      else None
    }
  }

  /** The committed compact board's calibration seconds, or None when
    * the file is missing, unparseable, or predates the field. */
  def committedBoardCal(path: String): Option[Double] =
    try {
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8))
      j \ "cal" match {
        case JDouble(d) => Some(d)
        case JDecimal(d) => Some(d.toDouble)
        case JInt(i) => Some(i.toDouble)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The committed compact board's per-query medians, or empty when the
    * file is missing or unparseable (the guard fails open — a first
    * capture must be able to write the artifact). */
  def committedBoardQueries(path: String): Map[String, Double] =
    try {
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8))
      j \ "queries" match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JDecimal(v)) => k -> v.toDouble
          case (k, JInt(v)) => k -> v.toDouble
        }.toMap
        case _ => Map.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Bounded PRE-RUN wait for an idle box (round 12's driver artifact
    * was diverted twice running because the shared box was contended at
    * launch time): poll the load average until [[dirtyRunReason]]'s
    * load gate would pass, give up after [[IdleWaitMaxSec]] and let the
    * run proceed (the guard family still diverts a dirty board — this
    * loop only raises the odds that a SCHEDULED full run lands on a
    * clean window). Reader and sleeper are injected so the wiring is
    * spec-testable without real minutes; returns (final load string,
    * seconds waited). An empty/unparseable load string exits
    * immediately (same fail-open as the gate itself). Note the loop
    * usually engages briefly even on a quiet box: sbt's own startup
    * adds ~1.0 to the 1-min load, which takes ~40 idle seconds to decay
    * below the 0.5 threshold — that settling time is exactly what the
    * committed clean boards were captured under. */
  val IdleWaitMaxSec = 480
  val IdleWaitPollSec = 15

  def waitForIdle(readLoad: () => String, sleepSec: Int => Unit,
                  maxSec: Int = IdleWaitMaxSec,
                  pollSec: Int = IdleWaitPollSec): (String, Int) = {
    var waited = 0
    var load = readLoad()
    while (waited < maxSec && dirtyRunReason(load, 0).isDefined) {
      sleepSec(pollSec)
      waited += pollSec
      load = readLoad()
    }
    (load, waited)
  }

  /** Fixed CPU-bound CALIBRATION workload (r13): 2×10⁹ `xxhash64`
    * values folded per-partition across 32 fixed slices — no IO, no
    * shuffle, fully codegen'd, deterministic. Its wall time measures
    * the BOX's parallel compute throughput, independent of the engine
    * under test, and rides in both artifact lines as `"cal"`. Purpose:
    * the r13 box-state incident (SCALE.md §bench hygiene) — every
    * full-board run read a uniform ~1.3× against the committed board
    * because the HOST was slower, provable only by re-benching an old
    * commit. With `cal` in every artifact, cross-round comparisons can
    * normalize (compare value/cal), and a dirty-run diagnosis is one
    * field read instead of a worktree experiment. */
  val CalRows = 2000000000L

  def calibrationRun(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    import spark.implicits._
    val t0 = System.nanoTime()
    spark.range(0L, CalRows, 1L, 32)
      .select(xxhash64(col("id")).as("_h")).as[Long]
      .mapPartitions { rows =>
        var acc = 0L
        rows.foreach(h => acc = acc * 1000003L + h)
        Iterator.single(acc)
      }
      .reduce(_ ^ _)
    (System.nanoTime() - t0) / 1e9
  }

  /** Cumulative GC time (millis) across all collector beans since JVM
    * start; per-rep deltas of this are the gcMs attribution. A bean that
    * doesn't report (-1) contributes 0. */
  def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Render the one-line JSON artifact. Pure so the shape is spec-pinned:
    * the driver contract is "queries" maps query -> ONE number (the median);
    * everything else ("queries_min", per-rep arrays, load snapshots, the
    * suspect list) exists so a contention-dirtied run is self-identifying
    * instead of silently mis-grading the engine.
    */
  def renderJson(
      results: Seq[QueryTimes],
      reps: Int,
      sfDir: String,
      loadBefore: String,
      loadAfter: String,
      cal: Double = -1.0): String = {
    def num(d: Double): String = d.toString
    val qs = results.map(q => s"\"${q.name}\":${num(q.median)}")
      .mkString("{", ",", "}")
    val qsMin = results.map(q => s"\"${q.name}\":${num(q.min)}")
      .mkString("{", ",", "}")
    val qsReps = results
      .map(q => s"\"${q.name}\":" + q.reps.map(num).mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    val qsGc = results
      .map(q => s"\"${q.name}\":" + q.gcMs.map(_.toString).mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    val suspects = results.filter(_.suspect).map(q => s"\"${q.name}\"")
      .mkString("[", ",", "]")
    val retried = results.filter(_.retried > 0).map(q => s"\"${q.name}\"")
      .mkString("[", ",", "]")
    val total = results.collect { case q if q.median >= 0 => q.median }.sum
    s"""{"metric":"total","value":$total,"unit":"sec","stat":"median"""" +
      s""","reps":$reps,"cal":${num(cal)}""" +
      s""","load_before":"$loadBefore","load_after":"$loadAfter"""" +
      s""","suspect":$suspects,"retried":$retried,"queries":$qs""" +
      s""","queries_min":$qsMin""" +
      s""","queries_reps":$qsReps,"queries_gc_ms":$qsGc,"sf":"$sfDir"}"""
  }

  /** Compact variant of the artifact: medians only, SHORT query keys
    * (the unique `qNN` prefix of each name), headline `value` LAST.
    *
    * Why this shape (three rounds of `"parsed": null` taught it): the
    * driver keeps only a ~2000-char stdout TAIL and parses the artifact
    * out of that. The full line (~15 KB) never fit; round 8's
    * full-name compact line ran ~2100 chars, so the tail sliced off its
    * LEADING `{"metric":…,"value":…` — the queries dict survived but
    * the headline total didn't, and the line stopped being JSON at all.
    * Fixes, belt and braces: (a) short keys put the whole line well
    * under 1 KB for 70+ queries in realistic runs (spec-pinned < 1950
    * even with every query suspect+retried at 3-digit medians, and the
    * padded-tail parse is itself spec-checked end-to-end);
    * (b) field order puts `queries` first and the headline
    * `value` last, so even a future front-truncation keeps the total;
    * (c) [[main]] pads ~2 KB of newlines BEFORE this line so the tail
    * window contains only whitespace + this line — whole-tail
    * `json.loads` succeeds (leading whitespace is valid JSON trivia).
    * Full names ride in the full line and bench_full.json.
    */
  def renderCompactJson(results: Seq[QueryTimes], reps: Int,
                        sfDir: String, cal: Double = -1.0): String = {
    // 3dp (millisecond) medians: raw Double.toString can run 18 chars
    // (0.5133333333333333) and 70 of those alone overflow the tail the
    // compact line exists to fit. toPlainString avoids scientific
    // notation, which json parsers accept but humans grepping a tail
    // mis-read; stripTrailingZeros keeps "6.05" over "6.050".
    def ms3(d: Double): String = {
      val bd = java.math.BigDecimal.valueOf(d)
        .setScale(3, java.math.RoundingMode.HALF_UP).stripTrailingZeros()
      // keep one decimal so an integral median ("6", "-1") still parses as
      // a float downstream (json4s reads bare ints as JInt)
      (if (bd.scale < 1) bd.setScale(1) else bd).toPlainString
    }
    def short(n: String): String = n.takeWhile(_ != '_')
    require(results.map(q => short(q.name)).distinct.size == results.size,
      "short query keys (qNN prefixes) must be unique")
    val qs = results.map(q => s"\"${short(q.name)}\":${ms3(q.median)}")
      .mkString("{", ",", "}")
    // flag lists are CAPPED at 15 names (r10: at 78 queries the
    // all-flagged worst case pushed the line past the 2000-char tail) —
    // the accompanying *_n count always carries the true total, and the
    // FULL lists ride in the full line + bench_full.json. Real runs
    // flag a handful; a run with >15 suspects is dirty enough that the
    // count alone tells the story.
    val CapN = 15
    def capped(names: Seq[String]): (Int, String) =
      (names.size,
        names.take(CapN).map(n => s"\"$n\"").mkString("[", ",", "]"))
    val (nSus, suspects) = capped(results.filter(_.suspect).map(q => short(q.name)))
    val (nRet, retried) = capped(results.filter(_.retried > 0).map(q => short(q.name)))
    val total = results.collect { case q if q.median >= 0 => q.median }.sum
    // no stat/reps here — the driver contract needs metric/value/unit/
    // queries/sf and every byte pushes the worst case toward the
    // 2000-char tail window; the full line carries the rest
    s"""{"metric":"total","unit":"sec","queries":$qs""" +
      s""","suspect_n":$nSus,"suspect":$suspects""" +
      s""","retried_n":$nRet,"retried":$retried""" +
      s""","cal":${ms3(cal)},"sf":"$sfDir","value":${ms3(total)}}"""
  }

  /** Newline padding printed between the full line and the compact line:
    * wider than any plausible driver tail window, so the window's content
    * is exactly (whitespace + compact line) — parseable as a whole, as a
    * last line, or as a grep. Requires the raw pass-through
    * `outputStrategy` in build.sbt: sbt's default logged strategy swallows
    * blank lines, which silently deleted this pad in every driver round
    * until r14. */
  val TailPad: String = "\n" * 2100

  /** The FINAL artifact line of a run. A DIVERTED run emits the FRESH
    * run's own numbers (r14 ADVICE, reversing the r13 shape): the
    * per-run artifact must attribute to this run only measurements this
    * run produced — the r13 form put the previously COMMITTED board's
    * numbers under the normal `queries`/`value`/`cal` keys, so a genuine
    * uniform regression would have been reported with the old good
    * numbers, distinguishable only by the reason string. The divert
    * reason rides as `diverted_reason`, and the board of record rides
    * along NESTED under `committed_board` (headline `value` + `cal`
    * only — the full committed dict would push the line past the
    * driver's ~2000-char tail window), where no consumer can parse its
    * stale numbers as this run's result. Pure; spec-pinned in
    * BenchJsonSpec. */
  def divertedFinalLine(committedLine: Option[String], fresh: String,
                        reason: String): String = {
    val esc = reason.take(120).map {
      case '"' => '\''
      case '\\' => '/'
      case c if c.isControl => ' '
      case c => c
    }.mkString
    val committed = committedLine.map(_.trim).flatMap { l =>
      try {
        import org.json4s._
        val j = org.json4s.jackson.JsonMethods.parse(l)
        def num(f: String): Option[Double] = j \ f match {
          case JDouble(d) => Some(d)
          case JDecimal(d) => Some(d.toDouble)
          case JInt(i) => Some(i.toDouble)
          case _ => None
        }
        val fields = Seq("value" -> num("value"), "cal" -> num("cal"))
          .collect { case (k, Some(v)) => s""""$k":$v""" }
        if (fields.isEmpty) None
        else Some(s""","committed_board":{${fields.mkString(",")}}""")
      } catch { case scala.util.control.NonFatal(_) => None }
    }.getOrElse("")
    fresh.dropRight(1) + s""","diverted_reason":"$esc"$committed}"""
  }

  /** Re-emit the final artifact line from a DETACHED child process,
    * shortly AFTER the sbt wrapper dies, preceded by a fresh [[TailPad]].
    *
    * Why: under `sbt runMain` the forked JVM's last println is NOT the
    * last line of the caller's capture — sbt appends its own
    * "[success] Total time: …" trailer after the JVM exits, so a consumer
    * that parses the last line (or the whole tail) of its stdout capture
    * always read sbt's trailer instead of the artifact (13 rounds of
    * `"parsed": null`).
    *
    * Why this SHAPE (each clause bought by an r14 probe experiment):
    *  - The forked tree's fd 1 is sbt's internal pipe even under the
    *    pass-through outputStrategy — bytes written there after sbt
    *    exits VANISH, so the child cannot use its inherited stdout for
    *    the late write. Instead it pre-opens the wrapper's REAL stdout
    *    target via `/proc/<wrapper>/fd/1` (O_APPEND — appends correctly
    *    to a `> file` capture; extra-writer semantics on a pipe/tty)
    *    and holds that fd across the wrapper's death.
    *  - sbt's run task WAITS for EOF on the forked-output pipe, so the
    *    child must CLOSE its inherited stdout/stderr before waiting for
    *    the wrapper to die, or bench → child → sbt deadlocks (probe 3
    *    hung sbt indefinitely exactly this way).
    *  - The wrapper's death is POLLED (`kill -0`): fixed sleeps mis-time
    *    it — spark.stop + sbt teardown took 5–10 s in the dry runs and
    *    the trailer landed after a fixed 6 s echo.
    *  - When /proc/<wrapper>/fd/1 is unavailable (no wrapper, non-proc
    *    OS), the child falls back to the inherited fd and a FIXED delay,
    *    never the wrapper wait (holding that fd while waiting would be
    *    the deadlock above); the fallback can only add bytes mid-stream,
    *    which is the pre-r14 behavior.
    * A pipe-based capturer reads until EOF and sees the echo as its
    * final window (whitespace + line — the child's held write-end keeps
    * the pipe open until it finishes); a `> file` capturer gets the
    * append even after everything exits. Failure to spawn is non-fatal
    * by design.
    *
    * r14-ADVICE hardening (the plumbing is aggressive by necessity —
    * the driver tail-parses past sbt's trailer and this ended four
    * rounds of `"parsed": null` — but each named harm is closed):
    *  - the artifact line is written ONCE, not twice (the second write
    *    triplicated the line in file captures and garbled an
    *    interactive prompt twice over);
    *  - the wrapper-death poll compares the wrapper's /proc stat
    *    STARTTIME against the value recorded at spawn, so a recycled
    *    PID can never hold the child in the poll loop for its full
    *    600 s bound — reuse reads as a starttime mismatch and the
    *    write proceeds immediately (the held fd 4 still points at the
    *    ORIGINAL wrapper's stdout target; PID reuse can't redirect it);
    *  - `GRAFT_BENCH_NO_LATE_ECHO=1` disables the echo entirely for
    *    interactive/manual runs. It stays ON by default because the
    *    driver's capture — the artifact this mechanism exists for —
    *    runs without the variable; an opt-IN default would regress
    *    BENCH_r{N}.json to `"parsed": null`. */
  val NoLateEchoEnv = "GRAFT_BENCH_NO_LATE_ECHO"

  /** starttime (field 22) of /proc/<pid>/stat, "" where unavailable.
    * Parsed from after the last ')' — the comm field may contain spaces
    * — making starttime field 20 of the remainder. */
  def procStartTime(pid: String): String =
    try {
      val stat = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/proc/$pid/stat")),
        java.nio.charset.StandardCharsets.UTF_8)
      val rest = stat.substring(stat.lastIndexOf(')') + 1).trim.split("\\s+")
      if (rest.length >= 20) rest(19) else ""
    } catch { case scala.util.control.NonFatal(_) => "" }

  def scheduleLateEcho(line: String): Unit =
    try {
      if (sys.env.get(NoLateEchoEnv).contains("1")) {
        System.err.println(s"[bench] late echo disabled ($NoLateEchoEnv=1)")
        return
      }
      val wrapper = ProcessHandle.current().parent()
        .map[String](p => p.pid().toString).orElse("0")
      val script =
        "if [ -e \"/proc/$GRAFT_BENCH_WRAP/fd/1\" ] && " +
          "exec 4>>\"/proc/$GRAFT_BENCH_WRAP/fd/1\" 2>/dev/null; then M=proc; " +
          "else exec 4>&1; M=inherit; fi; " +
          "exec >/dev/null 2>/dev/null; " + // release sbt's pipe: it waits for EOF
          // alive = same PID *and* same starttime (PID-reuse guard); with
          // no recorded starttime, fall back to bare kill -0
          "st() { s=$(cat \"/proc/$1/stat\" 2>/dev/null) || return 1; " +
          "s=${s##*) }; set -- $s; echo \"${20}\"; }; " +
          "alive() { if [ -n \"$GRAFT_BENCH_WRAP_START\" ]; then " +
          "[ \"$(st \"$GRAFT_BENCH_WRAP\")\" = \"$GRAFT_BENCH_WRAP_START\" ]; " +
          "else kill -0 \"$GRAFT_BENCH_WRAP\" 2>/dev/null; fi; }; " +
          "if [ \"$M\" = proc ]; then " +
          "n=0; while [ $n -lt 1200 ] && alive; " +
          "do sleep 0.5; n=$((n+1)); done; sleep 1; " +
          "else sleep 8; fi; " +
          "printf '%s' \"$GRAFT_BENCH_LINE\" >&4"
      val pb = new ProcessBuilder("/bin/sh", "-c", script)
      pb.environment().put("GRAFT_BENCH_LINE", TailPad + line + "\n")
      pb.environment().put("GRAFT_BENCH_WRAP", wrapper)
      pb.environment().put("GRAFT_BENCH_WRAP_START", procStartTime(wrapper))
      pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      pb.start()
      ()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] late-echo spawn failed: ${e.getMessage}")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // full-board runs wait (bounded) for the box to go idle before the
    // load snapshot — see [[waitForIdle]]; subset profiling runs start
    // immediately (they never touch the committed artifact anyway)
    val (loadBefore, idleWaited) =
      if (args.isEmpty) waitForIdle(() => loadavg(), s => Thread.sleep(s * 1000L))
      else (loadavg(), 0)
    if (idleWaited > 0)
      System.err.println(s"[bench] waited ${idleWaited}s for an idle box " +
        s"(load now '$loadBefore')")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.limit.initialNumPartitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-reader paths so the first timed query
    // isn't charged for session bootstrap
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // box-throughput calibration rides in both artifact lines — one
    // untimed warmup rep (codegen), then median of 3. FULL runs only
    // (r13 ADVICE): a subset profiling run never touches the committed
    // artifact and its cal is purely informational, so it skips the
    // ~tens-of-seconds workload and carries the existing "not
    // calibrated" marker instead.
    val cal = if (args.nonEmpty) -1.0 else {
      calibrationRun(spark)
      val c = medianOf(Vector.fill(3)(calibrationRun(spark)))
      System.err.println(f"[bench] calibration: $c%.3f s (2e9-row xxhash64 fold)")
      c
    }
    // caches are cleared between queries so one query's persist can't skew
    // the next. Each query runs `reps` times in THIS one JVM; the headline
    // number per query is the MEDIAN (machine-load noise swings single
    // timings ±40%, and a best-of hides stable regressions behind one lucky
    // rep), with the min carried alongside for the warm-path floor.
    // Cross-round comparisons should use the medians only — after checking
    // the "suspect" list and load fields say the run was clean.
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(3))
    // Force FULL evaluation of every output column: a bare .count() lets
    // Catalyst prune unused columns and drop final sorts, timing pure-
    // projection queries as scan+count. xxhash64 over all columns makes
    // every column's bytes flow through the plan; the per-partition
    // mapPartitions fold is ORDER-SENSITIVE (Catalyst can't see through
    // it, so EliminateSorts keeps the query's final sort, unlike under
    // count()/bit_xor) and CONSTANT-MEMORY per task — a collect_list
    // checksum would buffer every row hash in one aggregation buffer,
    // the single-task anti-pattern this bench exists to expose.
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.functions.{col, xxhash64}
      import spark.implicits._
      // .rdd.fold, not Dataset.reduce: a query whose result is EMPTY at
      // this sf can plan to zero partitions (AQE), where reduce throws
      // "empty collection" and the harness would mis-report the QUERY
      // as failed (q88 at sf0.001, r14). XOR's identity makes fold
      // correct on any partition count.
      df.select(xxhash64(df.columns.map(col): _*).as("_h")).as[Long]
        .mapPartitions { rows =>
          var acc = 0L
          rows.foreach(h => acc = acc * 1000003L + h)
          Iterator.single(acc)
        }
        .rdd.fold(0L)(_ ^ _)
      ()
    }
    // Optional args = query-name filter for profiling a subset under the
    // exact bench protocol (the driver passes none → full run unchanged).
    // Unknown names fail loudly: a typo must not print a plausible
    // zero-query result with exit code 0.
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — " +
        s"valid names: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // One UNTIMED warmup rep per query: rep 1 otherwise pays Janino
      // codegen for the query's expressions (q59's broadcast-join tree
      // costs ~2.5s to compile), contaminating the median with compile
      // time that a long-lived cluster pays once. Caches are torn down
      // after the warmup, so the timed reps still measure cold-data cost.
      // NonFatal only: a warmup OOM/VM error must kill the run, not let
      // timed reps proceed in a corrupted JVM; non-fatal failures are
      // logged (the timed rep will report the -1.0)
      val (_, warm) = graft.operators.Caches.scope {
        try force(fn(spark, sfDir)) catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name warmup FAILED: ${e.getMessage}")
        }
      }
      warm.release()
      spark.catalog.clearCache()
      def runRep(): (Double, Long) = {
        val gc0 = gcMillis()
        val t0 = System.nanoTime()
        // per-query scope: releases exactly this rep's operator caches
        val (ok, qscope) = graft.operators.Caches.scope {
          try { force(fn(spark, sfDir)); true } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        }
        val elapsed = (System.nanoTime() - t0) / 1e9 // before cache teardown
        val gcDelta = gcMillis() - gc0 // same window as the wall time
        qscope.release()
        spark.catalog.clearCache()
        (if (ok) elapsed else -1.0, gcDelta)
      }
      // adaptive re-rep (load robustness) — see [[adaptiveReps]]
      val (timed, extras) = adaptiveReps(
        (1 to reps).toVector.map(_ => runRep()),
        () => {
          val r = runRep()
          System.err.println(
            s"[bench] $name: load-contended rep pattern, extra rep -> ${r._1} s")
          r
        })
      QueryTimes(name, timed.map(_._1), timed.map(_._2), retried = extras)
    }
    val full = renderJson(results, reps, sfDir, loadBefore, loadavg(), cal)
    // Full artifact to a file the driver (or judge) can read whole, then
    // the full line, then — LAST, so it lands in any stdout tail — the
    // compact medians-only line. File-write failure must not kill a
    // completed run: stdout still carries both lines.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    println(full)
    // the compact line ALSO lands in a committed file — a channel that
    // can't be truncated at all, for judge-side reading independent of
    // whatever the driver's stdout tail does. FULL runs only: a subset
    // profiling run must never clobber the committed full-board
    // artifact (round 11 swept several 2-4-query boards into commits
    // via `git add -A` before this guard; bench_full.json still
    // captures subsets for profiling).
    val compact = renderCompactJson(results, reps, sfDir, cal)
    val compactPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_COMPACT_OUT",
      "bench_compact.json")
    // Two guards on the COMMITTED artifact: subset runs never touch it
    // (r11), and a full run on a dirty box diverts to a .dirty.json
    // sibling (r12 — the r11 driver run under external load overwrote
    // the committed clean board; see [[dirtyRunReason]]). Both stdout
    // lines still print unconditionally: the driver's own per-round
    // artifact comes from the stdout tail and must reflect the run that
    // actually happened, dirty or not.
    def writeCompact(path: String): Unit =
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(path),
        (compact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] could not write $path: ${e.getMessage}")
      }
    val finalLine: String = if (args.isEmpty) {
      // guards compose: pre-run load, suspect count, the sf match, then
      // the post-run board comparisons — uniform (median) slowdown,
      // heavy-tail (p90) slowdown, and the cal-vs-committed-cal box
      // check (see [[uniformSlowdownReason]], [[tailSlowdownReason]],
      // [[calRegressionReason]]); the sf-mismatch guard runs FIRST
      // among the board comparisons so a different-scale run is never
      // ratio-compared at all.
      // BENCH_FORCE_COMMIT=1 bypasses all of them for deliberate
      // re-baselining (see [[ForceCommitEnv]]).
      val fresh = results.map(q => q.name.takeWhile(_ != '_') -> q.median).toMap
      val gate = dirtyRunReason(loadBefore, results.count(_.suspect))
        .orElse(sfMismatchReason(committedBoardSf(compactPath), sfDir))
        .orElse(uniformSlowdownReason(
          committedBoardQueries(compactPath), fresh))
        .orElse(tailSlowdownReason(
          committedBoardQueries(compactPath), fresh))
        .orElse(calRegressionReason(committedBoardCal(compactPath), cal))
      val force = sys.env.get(ForceCommitEnv).contains("1")
      gate match {
        case None => writeCompact(compactPath); compact
        case Some(reason) if force =>
          System.err.println(s"[bench] $ForceCommitEnv=1 — bypassing commit " +
            s"guards (would have diverted: $reason); RE-BASELINING $compactPath")
          writeCompact(compactPath); compact
        case Some(reason) =>
          val dirtyPath = compactPath.stripSuffix(".json") + ".dirty.json"
          System.err.println(s"[bench] DIRTY RUN — $reason; writing " +
            s"$dirtyPath and leaving $compactPath (committed clean board) untouched")
          writeCompact(dirtyPath)
          // the final stdout line carries the board of RECORD (with the
          // divert reason attached), never the dirty board — see
          // [[divertedFinalLine]]
          divertedFinalLine(
            try Some(new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(compactPath)),
              java.nio.charset.StandardCharsets.UTF_8))
            catch { case scala.util.control.NonFatal(_) => None },
            compact, reason)
      }
    } else {
      System.err.println(s"[bench] subset run (${args.length} queries) — " +
        s"$compactPath left untouched (full-board artifact)")
      compact
    }
    // padding before the final line: the driver's ~2000-char stdout
    // tail then holds ONLY whitespace + the final line — a complete,
    // parseable object however the tail is consumed (whole-tail parse,
    // last line, grep). See renderCompactJson's docstring.
    print(TailPad)
    println(finalLine)
    // …and again AFTER sbt's own "[success]" trailer, from a detached
    // child — the trailer otherwise ends the capture (see
    // [[scheduleLateEcho]]). Full runs only: profiling subsets don't
    // need to linger.
    if (args.isEmpty) scheduleLateEcho(finalLine)
    spark.stop()
  }
}
