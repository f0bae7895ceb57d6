package graft.ml

import org.apache.spark.ml.classification.DecisionTreeClassificationModel
import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M7 — TRUE minimal cost-complexity ("weakest link") pruning, the
  * algorithm behind sklearn's `ccp_alpha` / `cost_complexity_pruning_path`
  * (reference: `BasicsDecisionTree.ipynb:~813-~846 (cells 8-10)`).
  * Replaces the earlier CV-over-(depth×minInfoGain) emulation
  * ([[Approx.cvPrunedTree]], kept for the grid-CV surface).
  *
  * Distributed shape, because MLlib exposes no per-node sample counts:
  *   1. the fitted tree's STRUCTURE is walked on the driver (a tree is
  *      O(2^depth) nodes — driver-sized by construction);
  *   2. per-node training-class histograms come from ONE distributed
  *      aggregation: a codegen'd nested-CASE column routes every row to
  *      its leaf id, `groupBy(leaf, label).count()` returns ≤
  *      leaves×classes rows, and internal-node histograms are the sums
  *      of their leaves' (computed driver-side, bottom-up);
  *   3. the α-path itself is pure driver arithmetic over those
  *      histograms — no further scans;
  *   4. a pruned tree SCORES as a nested `when`/`otherwise` column
  *      expression (whole-stage-codegen'd, no UDF), so selection via CV
  *      and final scoring stay fully distributed.
  * At 100 TB: one scan to histogram, one scan per CV fold to score —
  * never a per-row driver loop.
  */
object CcpPruning {

  /** An impurity criterion over a class histogram. */
  type Impurity = Array[Long] => Double

  /** Driver-side pruning tree. `counts(k)` = training rows of class k
    * routed through this node; `prediction` is the majority class (ties →
    * lowest class index, sklearn's convention). */
  sealed trait PTree {
    def counts: Array[Long]
    def n: Long = counts.sum
    def prediction: Double = counts.indexOf(counts.max).toDouble
    def leaves: Int
    /** Σ over this subtree's leaves of (n_leaf/N)·imp(leaf). */
    def subtreeRisk(total: Double, imp: Impurity = gini): Double
    /** This node AS a leaf: (n/N)·imp(counts). */
    def nodeRisk(total: Double, imp: Impurity = gini): Double =
      n / total * imp(counts)
  }
  final case class PLeaf(counts: Array[Long]) extends PTree {
    val leaves = 1
    def subtreeRisk(total: Double, imp: Impurity): Double =
      nodeRisk(total, imp)
  }
  final case class PSplit(featureIndex: Int, threshold: Double,
                          leftCategories: Option[Array[Double]],
                          left: PTree, right: PTree,
                          counts: Array[Long]) extends PTree {
    val leaves: Int = left.leaves + right.leaves
    def subtreeRisk(total: Double, imp: Impurity): Double =
      left.subtreeRisk(total, imp) + right.subtreeRisk(total, imp)
  }

  /** Gini impurity of a class histogram. */
  def gini(counts: Array[Long]): Double = {
    val n = counts.sum.toDouble
    if (n == 0) 0.0 else 1.0 - counts.map(c => (c / n) * (c / n)).sum
  }

  /** Shannon entropy (log₂) of a class histogram — MLlib's and sklearn's
    * "entropy" criterion; empty classes contribute 0. */
  def entropy(counts: Array[Long]): Double = {
    val n = counts.sum.toDouble
    if (n == 0) 0.0
    else -counts.collect { case c if c > 0 =>
      val p = c / n
      p * math.log(p) / math.log(2.0)
    }.sum
  }

  /** The criterion a fitted MLlib model was GROWN with — the pruning
    * path is computed with the SAME criterion (sklearn semantics:
    * `cost_complexity_pruning_path` scores R(t) with the tree's own
    * impurity; the earlier unconditional-gini form was the recorded M7
    * delta, now closed). */
  def impurityOf(model: DecisionTreeClassificationModel): Impurity =
    model.getImpurity.toLowerCase match {
      case "entropy" => entropy
      case _         => gini
    }

  /** The full-tree → root sequence of (α, pruned tree): entry 0 is the
    * unpruned tree at α=0; each later entry prunes every internal node
    * whose weakest-link g(t) = (R(t) − R(T_t)) / (|T_t| − 1) attains the
    * current minimum. Mirrors `cost_complexity_pruning_path`:
    * `alphas` strictly increases, `trees` strictly shrink to a stump. */
  final case class CcpPath(alphas: Array[Double], trees: Array[PTree]) {
    /** The subtree a given ccp_alpha selects: the last path entry whose
      * α ≤ ccp_alpha (prune while the weakest link is ≤ α). */
    def pruneAt(alpha: Double): PTree = {
      require(alpha >= 0, s"ccp_alpha must be ≥ 0, got $alpha")
      val i = alphas.lastIndexWhere(_ <= alpha)
      trees(if (i < 0) 0 else i)
    }
  }

  /** Extract the MLlib tree + distributed per-node histograms into a
    * [[PTree]]. `featureCols` must list the raw columns in the SAME
    * order they were assembled into the model's feature vector. */
  def extract(model: DecisionTreeClassificationModel, df: DataFrame,
              labelCol: String, featureCols: Seq[String]): PTree = {
    val numClasses = model.numClasses
    // preorder leaf ids, then ONE distributed pass: route rows to leaves
    // with a nested-CASE column, histogram with groupBy(leaf, label)
    val leafId = leafIdColumn(model.rootNode, featureCols)
    val hist = df.groupBy(leafId.as("_leaf"),
        col(labelCol).cast("int").as("_cls"))
      .agg(count(lit(1)).as("_n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def build(node: Node, id: Int): (PTree, Int) = node match {
      case _: LeafNode =>
        val counts = Array.tabulate(numClasses)(k =>
          hist.getOrElse((id, k), 0L))
        (PLeaf(counts), id + 1)
      case in: InternalNode =>
        val (l, afterL) = build(in.leftChild, id)
        val (r, afterR) = build(in.rightChild, afterL)
        val merged = Array.tabulate(numClasses)(k => l.counts(k) + r.counts(k))
        val (fi, thr, cats) = in.split match {
          case c: ContinuousSplit => (c.featureIndex, c.threshold, None)
          case c: CategoricalSplit =>
            (c.featureIndex, Double.NaN, Some(c.leftCategories))
        }
        (PSplit(fi, thr, cats, l, r, merged), afterR)
    }
    build(model.rootNode, 0)._1
  }

  /** Weakest-link path over an extracted tree, under the given
    * impurity criterion. */
  def path(root: PTree, imp: Impurity = gini): CcpPath = {
    val total = root.n.toDouble
    val alphas = scala.collection.mutable.ArrayBuffer(0.0)
    val trees = scala.collection.mutable.ArrayBuffer(root)
    var cur = root
    while (cur.leaves > 1) {
      // g(t) over every internal node of the CURRENT tree
      def minG(t: PTree): Double = t match {
        case _: PLeaf => Double.PositiveInfinity
        case s: PSplit =>
          val g = (s.nodeRisk(total, imp) - s.subtreeRisk(total, imp)) /
            (s.leaves - 1)
          math.min(g, math.min(minG(s.left), minG(s.right)))
      }
      val g = minG(cur)
      // collapse every node attaining g (ties prune together, one α entry)
      def collapse(t: PTree): PTree = t match {
        case l: PLeaf => l
        case s: PSplit =>
          val own = (s.nodeRisk(total, imp) - s.subtreeRisk(total, imp)) /
            (s.leaves - 1)
          if (own <= g + 1e-15) PLeaf(s.counts)
          else {
            val c = s.copy(left = collapse(s.left), right = collapse(s.right))
            // collapsing children changes leaves/risk; rebuild risk lazily
            // via the case-class fields — PSplit recomputes on access
            c
          }
      }
      cur = collapse(cur)
      val a = math.max(g, alphas.last) // numeric guard: path is monotone
      if (a == alphas.last) {
        // two pruning rounds tied numerically: one α entry, keep the
        // more-pruned tree (duplicate alphas would make pruneAt's
        // lastIndexWhere ambiguous and break strict monotonicity)
        trees(trees.length - 1) = cur
      } else {
        alphas += a
        trees += cur
      }
    }
    CcpPath(alphas.toArray, trees.toArray)
  }

  /** `cost_complexity_pruning_path` in one call: fit-side histograms +
    * driver path, computed with the criterion the tree was grown with
    * ([[impurityOf]]). */
  def pruningPath(model: DecisionTreeClassificationModel, df: DataFrame,
                  labelCol: String, featureCols: Seq[String]): CcpPath =
    path(extract(model, df, labelCol, featureCols), impurityOf(model))

  /** A pruned tree as a PREDICTION column — nested when/otherwise over
    * the raw feature columns. Codegen'd end to end: CV scoring and final
    * inference never leave Tungsten. */
  def predictColumn(tree: PTree, featureCols: Seq[String]): Column = tree match {
    case l: PLeaf => lit(l.prediction)
    case s: PSplit =>
      when(goLeft(s, featureCols),
        predictColumn(s.left, featureCols))
        .otherwise(predictColumn(s.right, featureCols))
  }

  /** Preorder leaf-id routing column for the ORIGINAL MLlib tree. */
  private def leafIdColumn(root: Node, featureCols: Seq[String]): Column = {
    def walk(node: Node, id: Int): (Column, Int) = node match {
      case _: LeafNode => (lit(id), id + 1)
      case in: InternalNode =>
        val (l, afterL) = walk(in.leftChild, id)
        val (r, afterR) = walk(in.rightChild, afterL)
        val cond = in.split match {
          case c: ContinuousSplit =>
            col(featureCols(c.featureIndex)).cast("double") <= c.threshold
          case c: CategoricalSplit =>
            col(featureCols(c.featureIndex)).cast("double")
              .isin(c.leftCategories.toIndexedSeq: _*)
        }
        (when(cond, l).otherwise(r), afterR)
    }
    walk(root, 0)._1.cast("int")
  }

  private def goLeft(s: PSplit, featureCols: Seq[String]): Column =
    s.leftCategories match {
      case None =>
        col(featureCols(s.featureIndex)).cast("double") <= s.threshold
      case Some(cats) =>
        col(featureCols(s.featureIndex)).cast("double")
          .isin(cats.toIndexedSeq: _*)
    }

  /** CV selection over the path's α grid (sklearn's loop over
    * `ccp_alphas` with `cross_val_score`): deterministic hash-mod folds,
    * one tree fit per fold, each fold's OWN path pruned at the candidate
    * α (the path is data-dependent), accuracy scored distributedly.
    * Returns (best α, full-data tree pruned at it, the full-data path).
    */
  def cvSelect(df: DataFrame, labelCol: String, featureCols: Seq[String],
               maxDepth: Int = 8, folds: Int = 3):
      (Double, PTree, CcpPath) = {
    require(folds >= 2, s"folds must be ≥ 2, got $folds")
    val assembled = Features.assemble(df, featureCols, "features")
    val full = Models.decisionTree(labelCol, maxDepth).fit(assembled)
    val fullPath = pruningPath(full, df, labelCol, featureCols)
    // midpoints between consecutive path αs (sklearn's recommended grid —
    // each midpoint selects exactly one subtree, avoiding boundary ties)
    val grid = fullPath.alphas.sliding(2).collect {
      case Array(a, b) if b > a => (a + b) / 2
    }.toArray
    if (grid.isEmpty) return (0.0, fullPath.trees.head, fullPath)
    val fold = pmod(xxhash64(featureCols.map(col) :+ col(labelCol): _*),
      lit(folds))
    val scores = Array.fill(grid.length)(0.0)
    var foldsUsed = 0
    for (f <- 0 until folds) {
      val train = df.filter(fold =!= f)
      val valid = df.filter(fold === f)
      val m = Models.decisionTree(labelCol, maxDepth)
        .fit(Features.assemble(train, featureCols, "features"))
      val p = pruningPath(m, train, labelCol, featureCols)
      // ALL grid alphas score in ONE pass over the fold: |grid| nested-
      // CASE accuracy columns in a single agg (one job per fold, not
      // one per (fold, alpha))
      val accAggs = grid.indices.map { i =>
        val pred = predictColumn(p.pruneAt(grid(i)), featureCols)
        avg((pred === col(labelCol).cast("double")).cast("double"))
          .as(s"_acc_$i")
      }
      val r = valid.agg(accAggs.head, accAggs.tail: _*).head
      if (!r.isNullAt(0)) { // null ⟺ the fold received no rows
        foldsUsed += 1
        grid.indices.foreach(i => scores(i) += r.getDouble(i))
      }
    }
    require(foldsUsed > 0, "every CV fold was empty")
    grid.indices.foreach(i => scores(i) /= foldsUsed)
    // ties → larger α (smaller tree), sklearn-style parsimony
    val best = grid.indices.maxBy(i => (scores(i), grid(i)))
    (grid(best), fullPath.pruneAt(grid(best)), fullPath)
  }
}
