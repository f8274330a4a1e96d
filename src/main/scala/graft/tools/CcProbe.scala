package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-by-round timing probe for the connected-components loops at an
  * sf dir: prints per-round wall, edge counts, and total for the
  * star-contraction and label-propagation forms — the measurement
  * behind any CC-loop optimization claim.
  *
  * Mirrors the PRODUCTION loops in [[graft.pipeline.Curation]]
  * (observe-fused fixpoint metrics riding the per-round checkpoint; the
  * xor content hash gating the exact except). Env knobs:
  *   CC_SHARED=1      per-phase repartition shared-exchange form (the
  *                    production shape) — off = the pre-r19 shape
  *   CC_PLAN=1        print round-0 executed plans + exchange counts
  *   CC_NOBROADCAST=1 set autoBroadcastJoinThreshold=-1, forcing the
  *                    label side of every labelprop round join OFF the
  *                    broadcast path — the at-scale shape where the
  *                    pre-partitioned persisted edge set must prove it
  *                    avoids a per-round edge shuffle
  *   CC_LEGACY_ACTIONS=1  per-round count()/isEmpty driver actions
  *                    instead of observed metrics (the pre-r20 form,
  *                    kept for A/B)
  *   CC_LARGE_PERSIST=1  lazy persist() of the twice-consumed
  *                    large-star intermediate instead of the eager
  *                    localCheckpoint(true): same single-computation
  *                    guarantee (both consumers scan one
  *                    InMemoryRelation) but the materialization rides
  *                    the small-star job — one job per round, not two
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Graft.tune(spark)
    if (sys.env.contains("CC_NOBROADCAST"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = graft.core.Tables.documents(spark, sfDir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [$label] ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val legacy = sys.env.contains("CC_LEGACY_ACTIONS")
    val planDump = sys.env.contains("CC_PLAN")
    def exchanges(p: String): Int =
      "Exchange hashpartitioning".r.findAllIn(p).size

    def observeEdges(df: DataFrame, name: String): DataFrame =
      df.observe(name, count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(hi, lo))"), lit(0L)).as("x"))
    def observed(df: DataFrame, name: String): (Long, Long) = {
      val r = df.queryExecution.observedMetrics(name)
      (r.getLong(0), r.getLong(1))
    }

    // warm: JIT + parquet footers
    graft.pipeline.TextPipeline.minhashBucketStarEdges(docs).count()

    val pairs = time("edges") {
      val p = graft.pipeline.TextPipeline.minhashBucketStarEdges(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"  edge rows=${p.count()}")
      p
    }

    // star contraction, instrumented round by round (mirrors
    // Curation.connectedComponentsStar)
    time("star-total") {
      val e0 = observeEdges(pairs
        .select(greatest(col("doc_a"), col("doc_b")).as("hi"),
          least(col("doc_a"), col("doc_b")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct(), "init")
      var edges = e0.localCheckpoint(true)
      var (nEdges, xorEdges) =
        if (legacy) (edges.count(), 0L) else observed(e0, "init")
      println(s"  init edges=$nEdges")
      var i = 0
      var converged = nEdges == 0L
      def adj(e: DataFrame): DataFrame =
        e.select(col("hi").as("u"), col("lo").as("v"))
          .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val shared = sys.env.contains("CC_SHARED")
      while (!converged && i < 20) {
        val t0 = System.nanoTime()
        val a1 = if (shared) adj(edges).repartition(col("u")) else adj(edges)
        val mins = a1.groupBy("u").agg(min("v").as("mn"))
        val largeRaw = a1.join(mins, Seq("u"))
          .filter(col("v") > col("u"))
          .select(col("v").as("hi"), least(col("u"), col("mn")).as("lo"))
          .filter(col("hi") =!= col("lo")).distinct()
        val large =
          if (sys.env.contains("CC_LARGE_PERSIST"))
            largeRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else largeRaw.localCheckpoint(true)
        val largeIn = if (shared) large.repartition(col("hi")) else large
        val minsSmall = largeIn.groupBy(col("hi").as("u")).agg(min("lo").as("mn"))
        val smallRaw = observeEdges(largeIn
          .join(minsSmall, largeIn("hi") === minsSmall("u"))
          .select(col("lo").as("hi"), col("mn").as("lo"))
          .union(minsSmall.select(col("u").as("hi"), col("mn").as("lo")))
          .filter(col("hi") =!= col("lo")).distinct(), s"r$i")
        if (i == 0 && planDump) {
          smallRaw.count()
          val p = smallRaw.queryExecution.executedPlan.toString
          println(p)
          println("  exchanges=" + exchanges(p))
        }
        val small = smallRaw.localCheckpoint(true)
        val (n2, xor2) =
          if (legacy) (small.count(), 0L) else observed(smallRaw, s"r$i")
        val tCompute = (System.nanoTime() - t0) / 1e9
        val tc0 = System.nanoTime()
        converged =
          if (legacy) n2 == nEdges && small.except(edges).isEmpty
          else n2 == nEdges && xor2 == xorEdges && small.except(edges).isEmpty
        val tCheck = (System.nanoTime() - tc0) / 1e9
        println(f"  round $i: edges $nEdges -> $n2 compute=$tCompute%.3f " +
          f"check=$tCheck%.3f (ran_except=${n2 == nEdges &&
            (legacy || xor2 == xorEdges)})")
        large.unpersist()
        edges = small; nEdges = n2; xorEdges = xor2; i += 1
      }
    }

    // label propagation, instrumented (mirrors connectedComponents)
    time("labelprop-total") {
      val parts = spark.sessionState.conf.numShufflePartitions
      val edges = pairs
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .repartition(parts, col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("component")).localCheckpoint(true)
      var i = 0
      var converged = false
      while (!converged && i < 25) {
        val t0 = System.nanoTime()
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("component").as("dst_comp")),
            Seq("dst"))
          .groupBy(col("src")).agg(min("dst_comp").as("nbr_comp"))
        val nextObs = labels
          .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
          .select(col("id"),
            least(col("component"), coalesce(col("nbr_comp"), col("component")))
              .as("component"),
            (coalesce(col("nbr_comp"), col("component")) < col("component"))
              .as("_changed"))
          .observe(s"lp$i",
            coalesce(sum(col("_changed").cast("long")), lit(0L)).as("changed"))
        val next = nextObs.localCheckpoint(true)
        val changed =
          if (legacy) { if (next.filter(col("_changed")).limit(1).isEmpty) 0L else 1L }
          else nextObs.queryExecution.observedMetrics(s"lp$i").getLong(0)
        converged = changed == 0L
        val tCompute = (System.nanoTime() - t0) / 1e9
        if (planDump && i <= 1) {
          val p = nextObs.queryExecution.executedPlan.toString
          println(p)
          println(s"  round $i exchanges=" + exchanges(p))
        }
        println(f"  round $i: compute=$tCompute%.3f changed=$changed")
        labels = next.drop("_changed")
        i += 1
      }
      edges.unpersist()
    }
    spark.stop()
  }
}
