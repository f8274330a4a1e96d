package graft

import org.apache.spark.sql.functions._
import graft.core.DocSynth

/** DocSynth generates the scale-smoke corpora — it must be deterministic,
  * schema-compatible with the driver's documents/embeddings tables, and
  * actually contain the (near-)duplicate structure the dedup operators
  * are measured on. */
class DocSynthSpec extends SparkSpec {

  test("documents: deterministic, testdata schema, vocab-only tokens") {
    val a = DocSynth.documents(spark, 300)
    val b = DocSynth.documents(spark, 300)
    assert(a.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq("doc_id" -> "long", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "long"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // every token is a head vocabulary word, optionally with a long-tail
    // suffix; both head (hot) and tail (rare) tokens must be present
    val toks = a.select(explode(split(col("text"), " ")).as("w"))
    val bad = toks
      .filter(!split(col("w"), "-").getItem(0).isin(DocSynth.vocab: _*)).count()
    assert(bad == 0L)
    assert(toks.filter(col("w").contains("-")).count() > 0L, "tail tokens expected")
    assert(toks.filter(!col("w").contains("-")).count() > 0L, "head tokens expected")
    val langs = rowsOf(a.select(collect_set("lang"))).head.values.head
      .asInstanceOf[scala.collection.Seq[String]].toSet
    assert(langs.subsetOf(Set("en", "zh", "es", "fr", "de")))
  }

  test("documents long-form knob: defaults byte-identical, long corpus hits target lengths") {
    // the knob must not perturb the historical short-form corpus — every
    // committed smoke number was measured on it
    val short = DocSynth.documents(spark, 200)
    val explicit = DocSynth.documents(spark, 200, wordsMin = 10, wordsMax = 100)
    assert(short.exceptAll(explicit).isEmpty && explicit.exceptAll(short).isEmpty)
    // long form: ~20 KB documents for the production-length smokes, with
    // the dup/near-dup structure intact (same id-hash gates)
    val long = DocSynth.documents(spark, 200, wordsMin = 2300, wordsMax = 2600)
    val chars = long.selectExpr("min(n_chars)", "avg(n_chars)", "max(n_chars)")
      .first()
    assert(chars.getLong(0) > 10000L, s"min n_chars ${chars.getLong(0)}")
    assert(chars.getDouble(1) > 15000.0 && chars.getDouble(1) < 30000.0,
      s"avg n_chars ${chars.getDouble(1)}")
    // exact-dup fodder survives at long form: at 1600 ppm over 200 docs a
    // pair is unlikely, so force the gate check structurally instead —
    // text is a pure function of (seed, src), so doc text equality across
    // the corpus still marks dup families; just assert determinism here
    val long2 = DocSynth.documents(spark, 200, wordsMin = 2300, wordsMax = 2600)
    assert(long.exceptAll(long2).isEmpty && long2.exceptAll(long).isEmpty)
  }

  test("documents: dup/near-dup gates inject verbatim and high-overlap copies") {
    // high ppm so a small n still exercises both gates deterministically
    val d = DocSynth.documents(spark, 2000, dupPpm = 50000L, nearDupPpm = 50000L)
    val dups = d.groupBy("text").count().filter(col("count") > 1).count()
    assert(dups > 0L, "exact-duplicate groups expected")
    val nearPairs = graft.pipeline.TextPipeline
      .nearDupJaccard(d, n = 2, minJaccard = 0.5, maxDf = 0L).count()
    assert(nearPairs > 0L, "near-duplicate pairs expected")
    spark.catalog.clearCache()
  }

  test("embeddings: deterministic, unit norm, clustered labels") {
    val e = DocSynth.embeddings(spark, 200)
    assert(e.schema.fieldNames.toSeq == Seq("vec_id", "embedding", "label"))
    val norms = rowsOf(e.select(
      sqrt(aggregate(transform(col("embedding"), x => x.cast("double")),
        lit(0.0d), (acc, x) => acc + x * x)).as("n")))
    assert(norms.forall(r => math.abs(r("n").asInstanceOf[Double] - 1.0) < 1e-5))
    assert(e.select("label").distinct().count() == 10L)
    // same-label vectors sit nearer their centroid than cross-label ones:
    // mean pairwise cosine within a label must beat the global mean
    val v = e.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val pairs = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select((col("a.label") === col("b.label")).as("same"),
        graft.expressions.VectorExpressions.cosine(col("a.vec"), col("b.vec")).as("cos"))
    val byGroup = rowsOf(pairs.groupBy("same").agg(avg("cos").as("m")))
    val within = byGroup.find(_("same") == true).get("m").asInstanceOf[Double]
    val across = byGroup.find(_("same") == false).get("m").asInstanceOf[Double]
    assert(within > across + 0.1)
  }

  test("documentsSkewed: one mega near-dup class at the gated fraction, rest untouched") {
    val n = 3000L
    val skew = DocSynth.documentsSkewed(spark, n)
    val base = DocSynth.documents(spark, n)
    // deterministic
    val skew2 = DocSynth.documentsSkewed(spark, n)
    assert(skew.exceptAll(skew2).isEmpty && skew2.exceptAll(skew).isEmpty)
    // mega docs: the dominant shared 59-word prefix (benign docs can
    // also happen to have 60 words — the CLASS is what identifies mega);
    // fraction ≈ 10% (id-hash gated, wide tolerance for small-n variance)
    val sixty = skew
      .filter(size(split(col("text"), " ")) === 60)
      .select(col("doc_id"), col("text"))
      .collect()
    val byPrefix = sixty.groupBy(_.getString(1).split(" ").init.mkString(" "))
    val (_, mega) = byPrefix.maxBy(_._2.length)
    assert(mega.length > (n * 6 / 100) && mega.length < (n * 14 / 100),
      s"mega class size ${mega.length} outside 6-14% of $n")
    // near-identical within the class, mutated in the last word only
    val lastWords = mega.map(_.getString(1).split(" ").last).toSet
    assert(lastWords.size > mega.length / 2, "mutated last words should be ~unique")
    // the non-mega rows are byte-identical to the benign twin
    val megaIds = mega.map(_.getLong(0)).toSet
    val benignRows = base.filter(!col("doc_id").isin(megaIds.toSeq: _*))
    val skewRows = skew.filter(!col("doc_id").isin(megaIds.toSeq: _*))
    assert(skewRows.exceptAll(benignRows).isEmpty &&
      benignRows.exceptAll(skewRows).isEmpty)
  }
}
