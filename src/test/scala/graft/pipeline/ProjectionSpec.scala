package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Projection tier: JL random projection, one-pass covariance + PCA,
  * nearest-class-mean classification. Oracle parity is covered by the
  * Verify gate (q_embed_rp / q_embed_cov / q_embed_centroid); these specs
  * pin the numeric semantics and the plan shapes.
  */
class ProjectionSpec extends SparkSpec {

  /** Deterministic pseudo-noise in [-amp, amp] (LCG; no Random). */
  private def noise(seed: Long, amp: Double): Double = {
    val x = (seed * 6364136223846793005L + 1442695040888963407L) >>> 11
    ((x % 100000L) / 100000.0 - 0.5) * 2.0 * amp
  }

  /** nPer points around each of three orthogonal-ish centers in R^dim. */
  private def clusteredVecs(dim: Int, nPer: Int): DataFrame = {
    import spark.implicits._
    val centers = Seq(
      Array.tabulate(dim)(i => if (i % 3 == 0) 1.0 else 0.0),
      Array.tabulate(dim)(i => if (i % 3 == 1) 1.0 else 0.0),
      Array.tabulate(dim)(i => if (i % 3 == 2) 1.0 else 0.0))
    (0 until 3 * nPer).map { id =>
      val c = centers(id % 3)
      (id.toLong, id % 3,
        Array.tabulate(dim)(i => (c(i) + noise(id * 97L + i, 0.1)).toFloat))
    }.toDF("vec_id", "label", "embedding")
  }

  // --- sign matrix statistics -------------------------------------------

  test("rpSigns: derived matrix is balanced and incoherent (random-like)") {
    val s = Projection.rpSigns(dim = 64, outDim = 16, seed = "rp")
    assert(s.forall(_.forall(x => x == 1.0 || x == -1.0)))
    // per-row balance: a random ±1 row of length 64 has |mean| std 0.125
    assert(s.forall(r => math.abs(r.sum / 64.0) < 0.5))
    // pairwise coherence: raw fp parity gives 1.0 here (affine fold —
    // see mixSign scaladoc); the avalanche must bring it to noise level
    val dots = for (p <- 0 until 16; q <- p + 1 until 16)
      yield math.abs(s(p).zip(s(q)).map { case (a, b) => a * b }.sum / 64.0)
    assert(dots.max < 0.6, s"max row coherence ${dots.max}")
    assert(dots.sum / dots.size < 0.2, s"mean row coherence ${dots.sum / dots.size}")
  }

  test("rpSigns: deterministic across calls and seeds differ") {
    assert(Projection.rpSigns(32, 8, "rp") == Projection.rpSigns(32, 8, "rp"))
    assert(Projection.rpSigns(32, 8, "rp") != Projection.rpSigns(32, 8, "rp2"))
  }

  // --- random projection ------------------------------------------------

  test("randomProject: preserves pairwise distance structure (JL) and shuffles nothing") {
    val e = clusteredVecs(dim = 64, nPer = 10)
    val p = Projection.randomProject(e, dim = 64, outDim = 16)
    // plan: a narrow map-side select — no Exchange anywhere
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")

    val orig = e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val proj = p.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted
    val pairs = for (a <- ids; b <- ids if a < b)
      yield (d2(orig(a), orig(b)), d2(proj(a), proj(b)))
    // same-cluster pairs must stay closer than cross-cluster pairs:
    // compare the medians of the two pair populations after projection
    val (near, far) = pairs.partition(_._1 < 1.0) // intra ≈ 0.1-0.3, inter ≈ 2
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    assert(near.nonEmpty && far.nonEmpty)
    assert(median(near.map(_._2)) < median(far.map(_._2)),
      "projection collapsed the cluster structure")
    // and distances correlate strongly overall
    val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
    val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val r = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    assert(r > 0.8, s"distance correlation $r")
  }

  test("randomProject feeds the ANN tier: brute-force knn on projected vectors recalls the exact neighbors") {
    val e = clusteredVecs(dim = 64, nPer = 10)
    val asEmb = (df: DataFrame) => df.select(col("vec_id"), col("proj").as("embedding"))
    val p = asEmb(Projection.randomProject(e, dim = 64, outDim = 16))
    val exact = Similarity.knnBruteForce(e, e.filter(col("vec_id") < 5), k = 9)
    val approx = Similarity.knnBruteForce(p, p.filter(col("vec_id") < 5), k = 9)
    val rec = Similarity.recallAtK(approx, exact, k = 9)
      .agg(avg("recall")).head.getDouble(0)
    // k=9 ≈ the same-cluster cohort; 64→16 must keep most of it
    assert(rec > 0.6, s"mean recall@9 after projection: $rec")
  }

  // --- covariance + PCA -------------------------------------------------

  test("covarianceMatrix equals the textbook formula (small fixture, exact)") {
    import spark.implicits._
    val rows = Seq(
      Array(1.0f, 2.0f, 3.0f), Array(2.0f, 1.0f, 5.0f),
      Array(3.0f, 7.0f, 1.0f), Array(4.0f, 3.0f, 2.0f))
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = Projection.covarianceMatrix(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val n = rows.size
    val d = 3
    for (i <- 0 until d; j <- 0 until d) {
      val xi = rows.map(_(i).toDouble); val xj = rows.map(_(j).toDouble)
      val exp = (xi.zip(xj).map { case (a, b) => a * b }.sum -
        xi.sum * xj.sum / n) / (n - 1)
      assert(math.abs(got((i, j)) - exp) < 1e-6, s"cov($i,$j)")
    }
    // symmetry comes free of the formula; assert it held through the plan
    for (i <- 0 until d; j <- 0 until d)
      assert(got((i, j)) == got((j, i)))
  }

  test("covarianceMatrix plan: cells combine map-side, dimension marginals broadcast") {
    val plan = Projection.covarianceMatrix(clusteredVecs(16, 5))
      .queryExecution.executedPlan.toString
    // partial + final aggregate pair on the exploded cells
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"no map-side combine:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "marginals should broadcast")
    assert(!plan.contains("SortMergeJoin"), "d-row joins must not sort-merge")
  }

  test("Eigen.symmetric: known 2x2 and orthonormal basis on a real scatter") {
    val (vals, vecs) = Eigen.symmetric(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-9 && math.abs(vals(1) - 1.0) < 1e-9)
    val inv = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(inv, inv)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(vecs(1).zip(Array(inv, -inv)).forall { case (a, b) => math.abs(a - b) < 1e-9 })

    // a 5x5 scatter: eigenvectors orthonormal, eigenvalues descending,
    // and A·v = λ·v for every pair
    val a = Array.tabulate(5, 5)((i, j) => 1.0 / (1 + i + j)) // Hilbert: symmetric PD
    val (ev, evec) = Eigen.symmetric(a)
    assert(ev.zip(ev.tail).forall { case (x, y) => x >= y - 1e-12 })
    for (p <- 0 until 5; q <- 0 until 5) {
      val dot = evec(p).zip(evec(q)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (p == q) 1.0 else 0.0)) < 1e-9, s"orthonormality $p,$q")
    }
    for (p <- 0 until 5; i <- 0 until 5) {
      val av = (0 until 5).map(j => a(i)(j) * evec(p)(j)).sum
      assert(math.abs(av - ev(p) * evec(p)(i)) < 1e-8, s"A·v=λv row $i vec $p")
    }
  }

  test("pcaProject: top component separates the clusters; projected variance is ordered") {
    val e = clusteredVecs(dim = 32, nPer = 15)
    val p = Projection.pcaProject(e, k = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // per-component variance across rows must be (weakly) descending —
    // components come out in descending-eigenvalue order
    val comps = (0 until 4).map(c => p.values.map(_(c)).toSeq)
    val vars = comps.map { xs =>
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    assert(vars.zip(vars.tail).forall { case (a, b) => a >= b - 1e-6 },
      s"variances not ordered: $vars")
    // the leading 2 components must already separate the three clusters:
    // mean intra-cluster distance << mean inter-cluster distance
    def lead(id: Long) = p(id).take(2)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = p.keys.toSeq.sorted
    val (intra, inter) = (for (a <- ids; b <- ids if a < b)
      yield (a % 3 == b % 3, d2(lead(a), lead(b)))).partition(_._1)
    val mi = intra.map(_._2).sum / intra.size
    val mx = inter.map(_._2).sum / inter.size
    assert(mi * 5 < mx, s"intra $mi vs inter $mx in the leading plane")
  }

  // --- distributed power-iteration PCA twin -----------------------------

  /** Anisotropic deterministic corpus with a geometric spectrum: component
    * i carries scale 0.7^i of LCG noise, so sample eigenvalues are
    * well-separated (ratio ≈ 0.49) and near-axis-aligned — both PCA paths
    * must resolve the same ordered basis. */
  private def spectrumVecs(dim: Int, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { id =>
      (id.toLong, Array.tabulate(dim)(i =>
        (math.pow(0.7, i) * noise(id * 131L + i * 7L + 1L, 1.0)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("pcaProjectPower == pcaProject on a separated spectrum (scale twin parity)") {
    val e = spectrumVecs(dim = 24, n = 300)
    val jac = Projection.pcaProject(e, k = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val pow = Projection.pcaProjectPower(e, k = 4, iters = 30).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(jac.keySet == pow.keySet)
    // same components, same order, same canonical signs — agreement to
    // rounding + convergence tolerance (signs pinned identically by both
    // paths, so no ± matching needed)
    val worst = jac.keys.flatMap(id =>
      jac(id).zip(pow(id)).map { case (a, b) => math.abs(a - b) }).max
    assert(worst < 5e-4, s"max |jacobi - power| projection gap: $worst")
  }

  test("pcaProjectPower: deterministic across runs; final projection plan is map-only") {
    val e = spectrumVecs(dim = 12, n = 80)
    val a = Projection.pcaProjectPower(e, k = 3, iters = 20)
    val b = Projection.pcaProjectPower(e, k = 3, iters = 20)
    // the returned frame is a narrow projection through a broadcast-literal
    // basis — no Exchange (the iteration's shuffles happened during build,
    // each carrying only d×k partial sums)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val ra = a.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rb = b.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(ra == rb, "power PCA not bit-deterministic across runs")
  }

  test("pcaProjectPower: rank-deficient k throws instead of emitting junk") {
    import spark.implicits._
    // all vectors inside a 2-D subspace of R^6 → rank 2, k=4 must throw
    val e = (0 until 40).map { id =>
      val a = noise(id * 11L, 1.0); val b = noise(id * 13L + 5L, 1.0)
      (id.toLong, Array.tabulate(6)(i =>
        (a * (i + 1) + b * math.pow(-1.0, i)).toFloat))
    }.toDF("vec_id", "embedding")
    val ex = intercept[Exception](Projection.pcaProjectPower(e, k = 4, iters = 8))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("rank")),
      s"wrong failure: ${ex.getMessage}")
  }

  // --- trained logistic quality filter ----------------------------------

  /** Linearly separable corpus: label 1 iff the (noisy) sum of the first
    * three components clears 0 — a margin the trainer must recover. */
  private def separableVecs(dim: Int, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { id =>
      val v = Array.tabulate(dim)(i => noise(id * 331L + i * 17L + 3L, 1.0))
      val y = if (v(0) + v(1) + v(2) > 0.15) 1 else 0
      (id.toLong, y, v.map(_.toFloat))
    }.toDF("vec_id", "label", "embedding")
  }

  test("trainLogistic recovers a separable margin; logisticScore is map-only") {
    val e = separableVecs(dim = 10, n = 400)
    val w = Projection.trainLogistic(e, iters = 80, step = 2.0)
    assert(w.length == 11)
    // the three informative dimensions dominate the learned direction
    val informative = w.take(3).map(math.abs).min
    val nuisance = w.slice(3, 10).map(math.abs).max
    assert(informative > nuisance,
      s"weights did not align with the margin: ${w.mkString(",")}")
    val scored = Projection.logisticScore(e, w.toIndexedSeq)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    val acc = scored.join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(avg(when((col("score") >= 0.5) === (col("label") === 1), 1.0)
        .otherwise(0.0)))
      .head.getDouble(0)
    assert(acc > 0.95, s"train accuracy $acc")
  }

  test("trainLogistic: ragged/null/out-of-range rows refuse loudly, not silently bias") {
    import spark.implicits._
    val ragged = Seq(
      (0L, 0, Array(1.0f, 2.0f, 3.0f)),
      (1L, 1, Array(1.0f, 2.0f))).toDF("vec_id", "label", "embedding")
    val e1 = intercept[IllegalArgumentException](
      Projection.trainLogistic(ragged, iters = 2))
    assert(e1.getMessage.contains("ragged"))
    val badLabel = Seq(
      (0L, 0, Array(1.0f, 2.0f)),
      (1L, 7, Array(1.0f, 2.0f))).toDF("vec_id", "label", "embedding")
    val e2 = intercept[IllegalArgumentException](
      Projection.trainLogistic(badLabel, iters = 2))
    assert(e2.getMessage.contains("outside"))
    intercept[IllegalArgumentException](
      Projection.trainLogistic(badLabel.limit(0), iters = 2))
    intercept[IllegalArgumentException](
      Projection.trainLogistic(badLabel, iters = 0))
    intercept[IllegalArgumentException](
      Projection.pcaProjectPower(spectrumVecs(8, 20), k = 2, iters = 0))
  }

  test("trainLogistic warm-start: split fit == single longer fit (deterministic GD)") {
    val e = separableVecs(dim = 8, n = 150)
    val cold = Projection.trainLogistic(e, iters = 12, step = 2.0)
    val a = Projection.trainLogistic(e, iters = 5, step = 2.0)
    val warm = Projection.trainLogistic(e, iters = 7, step = 2.0,
      init = Some(a))
    val gap = cold.zip(warm).map { case (x, y) => math.abs(x - y) }.max
    assert(gap < 1e-9, s"warm-started trajectory diverged: $gap")
    val badInit = intercept[IllegalArgumentException](
      Projection.trainLogistic(e, iters = 1, init = Some(Array(1.0, 2.0))))
    assert(badInit.getMessage.contains("weights"))
  }

  test("gramSchmidt threshold is scale-relative: tiny-magnitude full-rank data fits fine") {
    import spark.implicits._
    // values ~1e-8: the scatter iterate's norms are ~1e-15 — an absolute
    // 1e-12 cutoff would spuriously call this rank-deficient
    val e = (0 until 60).map { id =>
      (id.toLong, Array.tabulate(6)(i =>
        (noise(id * 97L + i * 31L, 1.0) * 1e-8).toFloat))
    }.toDF("vec_id", "embedding")
    val p = Projection.pcaProjectPower(e, k = 3, iters = 10).collect()
    assert(p.length == 60)
  }

  test("trainLogistic: L2 shrinks weights; gradient scan combines map-side") {
    val e = separableVecs(dim = 8, n = 200)
    val free = Projection.trainLogistic(e, iters = 40, step = 2.0, l2 = 0.0)
    val reg = Projection.trainLogistic(e, iters = 40, step = 2.0, l2 = 0.5)
    def norm(w: Array[Double]) = math.sqrt(w.dropRight(1).map(x => x * x).sum)
    assert(norm(reg) < norm(free) * 0.8,
      s"l2 did not shrink: ${norm(reg)} vs ${norm(free)}")
    // one-iteration gradient plan: partial aggregation before the shuffle
    val data = e.select(
      concat(col("embedding").cast("array<double>"), array(lit(1.0))).as("xa"),
      col("label").cast("double").as("y"))
    val grad = data
      .select(posexplode(col("xa")).as(Seq("i", "xi")), col("y"))
      .groupBy(col("i")).agg(sum(col("xi") * col("y")))
    val plan = grad.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"no map-side combine in the gradient aggregate:\n$plan")
  }

  // --- nearest-class-mean classifier ------------------------------------

  test("centroidClassify: geometric classes recover perfectly; split respected") {
    val e = clusteredVecs(dim = 32, nPer = 20) // labels = true clusters
    val out = Projection.centroidClassify(e, testMod = 5)
    val rows = out.collect()
    // only the held-out split is scored
    assert(rows.forall(_.getLong(0) % 5 == 0))
    assert(rows.length == e.filter(col("vec_id") % 5 === 0).count())
    // well-separated clusters → the class mean wins every time
    assert(rows.forall(r => r.getInt(1) == r.getInt(2)),
      "misclassification on separated clusters")
  }

  test("centroidClassify plan: centroids broadcast to the scoring side") {
    val plan = Projection.centroidClassify(clusteredVecs(16, 10), testMod = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"centroid table should broadcast:\n$plan")
  }

  test("meanPool: dimension-wise group means, groups independent") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), "a"), (2L, Seq(3.0f, 4.0f, 7.0f), "a"),
      (3L, Seq(10.0f, 0.0f, -2.0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val out = Projection.meanPool(d, groupCol = "label").collect()
      .map(r => r.getString(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    assert(out("a")._1 == Seq(2.0, 3.0, 5.0) && out("a")._2 == 3L)
    assert(out("b")._1 == Seq(10.0, 0.0, -2.0))
  }

  // --- AUC eval -----------------------------------------------------------

  test("aucEval: hand value with ties; separable=1; degenerate class=null") {
    import spark.implicits._
    // scores: pos {0.9, 0.7, 0.5}, neg {0.7, 0.3}; the 0.7 tie spans
    // classes. Ranks asc: 0.3→1, 0.5→2, 0.7→avg(3,4)=3.5, 0.9→5.
    // U = (5 + 3.5 + 2) − 3·4/2 = 4.5 → AUC = 4.5/(3·2) = 0.75
    val df = Seq((0.9, 1), (0.7, 1), (0.5, 1), (0.7, 0), (0.3, 0))
      .toDF("score", "label")
    val r = Projection.aucEval(df).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.75)
    // perfectly separable → 1.0
    val sep = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("score", "label")
    assert(Projection.aucEval(sep).collect().head.getDouble(2) == 1.0)
    // one class only → auc null, not a fake 0/1
    val one = Seq((0.9, 1), (0.8, 1)).toDF("score", "label")
    val r1 = Projection.aucEval(one).collect().head
    assert(r1.isNullAt(2) && r1.getLong(1) == 0L)
  }

  test("prAtThresholds: hand confusion counts; empty cut stays null") {
    import spark.implicits._
    val df = Seq((0.9, 1), (0.7, 1), (0.5, 1), (0.7, 0), (0.3, 0))
      .toDF("score", "label")
    val out = Projection.prAtThresholds(df, Seq(0.4, 0.6, 1.0))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)), Option(r.get(6)))).toMap
    // t=0.4 keeps {.9p,.7p,.7n,.5p}: tp=3 fp=1 fn=0
    assert(out(0.4) == ((3L, 1L, 0L,
      Some(0.75), Some(1.0), Some(0.857143))))
    // t=0.6 keeps {.9p,.7p,.7n}: tp=2 fp=1 fn=1
    assert(out(0.6) == ((2L, 1L, 1L,
      Some(0.666667), Some(0.666667), Some(0.666667))))
    // t=1.0 keeps nothing: precision and f1 undefined, recall exact 0
    assert(out(1.0) == ((0L, 0L, 3L, None, Some(0.0), None)))
  }

  test("calibrationBins: hand bins, top edge clamps into the last bin") {
    import spark.implicits._
    val df = Seq((0.9, 1), (0.7, 1), (0.5, 1), (0.7, 0), (0.3, 0), (1.0, 1))
      .toDF("score", "label")
    val out = Projection.calibrationBins(df, bins = 4)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1) == ((1L, 0.3, 0.0)))
    assert(out(2) == ((3L, 0.633333, 0.666667)))
    // 0.9 → bin 3; score 1.0 would floor to bin 4 — clamped to 3
    assert(out(3) == ((2L, 0.95, 1.0)))
    assert(out.keySet == Set(1, 2, 3))
  }

  test("averagePrecision: hand value with a cross-class tie step; order-invariance") {
    import spark.implicits._
    val df = Seq((0.9, 1), (0.7, 1), (0.5, 1), (0.7, 0), (0.3, 0))
      .toDF("score", "label")
    // descending cuts: 0.9 → P=1/1 ΔR=1/3; 0.7 (tie = ONE step) →
    // P=2/3 ΔR=1/3; 0.5 → P=3/4 ΔR=1/3; 0.3 adds no positives.
    // AP = 1/3 + 2/9 + 1/4 = 0.805556
    val r = Projection.averagePrecision(df).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.805556)
    // AP reads only the ORDER of scores: any strictly monotone remap
    // (here the registered rational squash) leaves it unchanged
    val squashed = df.select(
      (lit(0.5) + col("score") / (lit(2.0) * (lit(1.0) + abs(col("score")))))
        .as("score"), col("label"))
    assert(Projection.averagePrecision(squashed)
      .collect().head.getDouble(2) == 0.805556)
    // perfect ranking → 1.0; no positives → null
    val sep = Seq((0.9, 1), (0.8, 1), (0.2, 0)).toDF("score", "label")
    assert(Projection.averagePrecision(sep).collect().head.getDouble(2) == 1.0)
    val neg = Seq((0.9, 0), (0.8, 0)).toDF("score", "label")
    assert(Projection.averagePrecision(neg).collect().head.isNullAt(2))
  }

  test("eval tier refuses null scores and non-binary labels loudly") {
    import spark.implicits._
    val nullScore = Seq((Some(0.9), 1), (None, 0))
      .toDF("score", "label")
    val e1 = intercept[Exception] {
      Projection.aucEval(nullScore).collect()
    }
    assert(e1.getMessage.contains("null score"))
    val badLabel = Seq((0.9, 1), (0.5, 2)).toDF("score", "label")
    val e2 = intercept[Exception] {
      Projection.prAtThresholds(badLabel, Seq(0.5)).collect()
    }
    assert(e2.getMessage.contains("not 0/1"))
    val e3 = intercept[Exception] {
      Projection.calibrationBins(
        Seq((0.9, 1), (0.5, -1)).toDF("score", "label")).collect()
    }
    assert(e3.getMessage.contains("not 0/1"))
  }

  test("aucEval matches the single-partition rank() window spelling") {
    import spark.implicits._
    // pseudo-random scores with deliberate ties (quantized to 1/32)
    val df = (0 until 400).map { i =>
      val s = math.floor(((noise(i * 131L, 0.5) + 0.5) * 32)) / 32.0
      (s, if (noise(i * 17L + 7L, 1.0) > (s - 0.5)) 0 else 1)
    }.toDF("score", "label")
    df.createOrReplaceTempView("auc_in")
    val ref = spark.sql(
      """WITH r AS (
        |  SELECT label, rank() OVER (ORDER BY score)
        |    + (count(*) OVER (PARTITION BY score) - 1) / 2.0 AS ar
        |  FROM auc_in)
        |SELECT CAST(round((sum(CASE WHEN label = 1 THEN ar ELSE 0.0 END)
        |  - sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
        |    * (sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1) / 2.0)
        |  / (sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
        |     * sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)), 6) AS DOUBLE) AS auc
        |FROM r""".stripMargin).collect().head.getDouble(0)
    assert(Projection.aucEval(df).collect().head.getDouble(2) == ref)
  }
}
