package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

class PipelineSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._
  lazy val docsDF = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
      (2L, "the quick brown fox jumped over the lazy dog"),  // near dup
      (3L, "completely different content about spark engines"),
      (4L, "la vie est belle et la mer est calme"),
      (5L, "")).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val d = Dedup.exact(docsDF).filter(col("dup_count") > 1).collect()
    assert(d.length === 1)
    assert(d(0).getLong(1) === 0L) // canonical
    assert(d(0).getSeq[Long](3) === Seq(0L, 1L))
  }

  test("minhash LSH finds exact and near dups, skips unrelated") {
    val pairs = Dedup.minhashLsh(docsDF, numHashes = 128, bands = 128, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.keys.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("simhash: identical -> distance 0, near dup small, unrelated unpaired") {
    val pairs = Dedup.simhashPairs(docsDF, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) === 0)
    assert(pairs.get((0L, 2L)).forall(_ <= 10))
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("ngram jaccard exact verification") {
    import spark.implicits._
    val cand = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(docsDF, cand)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 1L)) === 1.0)
    assert(j((0L, 2L)) > 0.2 && j((0L, 2L)) < 1.0)
    assert(j((0L, 3L)) === 0.0)
  }

  test("scalarQuantize: known codes, degenerate dim exact, mse bounded by cell width") {
    import spark.implicits._
    // dim 0 spans [0, 3]; dim 1 is degenerate (all 7.0)
    val emb = Seq(
      (0L, Array(0.0f, 7.0f)),
      (1L, Array(1.5f, 7.0f)),
      (2L, Array(3.0f, 7.0f))).toDF("vec_id", "embedding")
    val r = Ann.scalarQuantize(emb, levels = 4)
      .collect().map(x => x.getAs[Long]("id") ->
        ((x.getAs[String]("code_md5"), x.getAs[Double]("mse")))).toMap
    // codes (levels=4, lo=0, hi=3): 0.0->0, 1.5->floor(1.5)=1, 3.0->3;
    // degenerate dim always 0 with exact reconstruction
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(0L)._1 === m("0,0"))
    assert(r(1L)._1 === m("1,0"))
    assert(r(2L)._1 === m("3,0"))
    // exact endpoints reconstruct exactly; 1.5 reconstructs at 1.0 ->
    // err^2 = 0.25 over 2 dims = 0.125
    assert(r(0L)._2 === 0.0)
    assert(r(2L)._2 === 0.0)
    assert(r(1L)._2 === 0.125)
    // mse never exceeds cell-width^2 (worst case per dim), here 1.0
    assert(r.values.forall(_._2 <= 1.0))
  }

  test("brute-force ANN: self-similar vectors rank first; LSH agrees on cosines") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Ann.bruteForceTopK(emb, queries, k = 10).cache()
    assert(bf.groupBy("query_id").count().collect().forall(_.getLong(1) === 10))
    // ranks strictly ordered by cosine desc per query
    val r = bf.filter(col("query_id") === 0).orderBy(col("rank")).select("cosine")
      .collect().map(_.getDouble(0))
    assert(r.sameElements(r.sortBy(-_)))

    // quantified recall target ≥0.9 (fixed fixture + seeded hyperplanes →
    // deterministic number). The fixture is a HARD angular case: top-10
    // neighbor cosines are only ~0.3 (θ≈72°, per-plane collision ~0.6), so
    // recall comes from OR-ing tables: per-table ≈0.48 at planes=4 with
    // 1-bit probing, 8 tables → expected ≈1-(0.52)^8 ≈ 0.995
    val lsh = Ann.lshTopK(emb, queries, k = 10, planes = 4, probes = 5, tables = 8).cache()
    // every LSH hit must carry the same cosine as brute force (same pair —
    // the bucketed rerank is exact)
    val joined = lsh.as("l").join(bf.as("b"), Seq("query_id", "id"))
      .select(abs(col("l.cosine") - col("b.cosine")).as("d")).agg(max("d")).head()
    assert(!joined.isNullAt(0) && joined.getDouble(0) < 1e-12)
    val recall = lsh.join(bf, Seq("query_id", "id"), "left_semi").count().toDouble /
      bf.count()
    info(s"LSH recall@10 (planes=4, probes=5, tables=8) = $recall")
    assert(recall >= 0.9, s"LSH recall@10 too low: $recall")
  }

  test("IVF ANN: cells partition the corpus, probes recover most of brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Ann.bruteForceTopK(emb, queries, k = 10).cache()
    val ivf = Ann.ivfTopK(emb, queries, k = 10, numCentroids = 8, nprobe = 4).cache()
    // IVF results are exact cosines of a subset of candidates
    val joined = ivf.as("i").join(bf.as("b"), Seq("query_id", "id"))
      .select(abs(col("i.cosine") - col("b.cosine")).as("d")).agg(max("d")).head()
    assert(joined.isNullAt(0) || joined.getDouble(0) < 1e-12)
    // probing half the cells must recover a nontrivial share of the truth
    val recall = ivf.join(bf, Seq("query_id", "id"), "left_semi").count().toDouble / bf.count()
    info(s"IVF recall@10 (nprobe=4/8) = $recall")
    assert(recall > 0.4, s"IVF recall too low: $recall")
    // every query returns k rows (cells are never empty with nprobe=4/8)
    assert(ivf.groupBy("query_id").count().collect().forall(_.getLong(1) == 10))

    // quantified recall target: probing 6 of 8 cells must recover ≥0.9 of
    // the exact top-10 (fixed fixture + seeded centroids → deterministic)
    val ivf6 = Ann.ivfTopK(emb, queries, k = 10, numCentroids = 8, nprobe = 6).cache()
    val recall6 = ivf6.join(bf, Seq("query_id", "id"), "left_semi").count().toDouble / bf.count()
    info(s"IVF recall@10 (nprobe=6/8) = $recall6")
    assert(recall6 >= 0.9, s"IVF recall@10 too low: $recall6")
  }

  test("distributed Lloyd codebook == driver-side trainer (order-of-summation only)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    // sampleSize >= corpus: the bounded-sample trainer sees every vector,
    // so the two trainers share init and assignments — only partial-sum
    // addition order can differ
    val driver = Ann.trainCentroids(emb, "embedding", numCentroids = 8,
      iters = 3, sampleSize = 100000)
    val dist = Ann.trainCentroidsDistributed(emb, "embedding", numCentroids = 8,
      iters = 3)
    assert(driver.length === dist.length)
    driver.zip(dist).zipWithIndex.foreach { case ((a, b), c) =>
      assert(a.length === b.length)
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-4f, s"centroid $c drifted: $x vs $y")
      }
    }
    // and the full IVF path accepts the distributed codebook
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Ann.bruteForceTopK(emb, queries, k = 10)
    val ivf = Ann.ivfTopK(emb, queries, k = 10, numCentroids = 8, nprobe = 6,
      trainDistributed = true)
    val recall = ivf.join(bf, Seq("query_id", "id"), "left_semi").count().toDouble /
      bf.count()
    info(s"IVF recall@10 (distributed codebook, nprobe=6/8) = $recall")
    assert(recall >= 0.9, s"IVF distributed-codebook recall too low: $recall")
  }

  test("embedding near-dup via hyperplane buckets returns high-cosine pairs only") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val nd = Dedup.embeddingNearDup(emb, threshold = 0.9, planes = 6)
    assert(nd.filter(col("cosine") < 0.9).count() === 0)
  }

  test("embedding near-dup: degenerate bucket is capped, healthy buckets survive") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // a templated corpus: 50 identical vectors all sign-tie onto ONE
    // bucket — uncapped, that's 50*49/2 quadratic candidates
    val template = Array.tabulate(dim)(i => 1.0f + i * 0.001f)
    val degenerate = spark.range(100000, 100050)
      .select(col("id").as("vec_id"), typedlit(template).as("embedding"))
    val u = emb.select(col("vec_id"), col("embedding")).unionByName(degenerate)
    val baseline = Dedup.embeddingNearDup(emb, threshold = 0.9, planes = 6)
      .count()
    val capped = Dedup.embeddingNearDup(u, threshold = 0.9, planes = 6,
      maxBucketSize = 40)
    // none of the planted template pairs survive the cap...
    assert(capped.filter(col("id_a") >= 100000L).count() === 0,
      "degenerate bucket must be dropped by the cap")
    // ...while with a roomy cap they all appear (the cap, not the plumbing,
    // is what removed them)
    val roomy = Dedup.embeddingNearDup(u, threshold = 0.9, planes = 6,
      maxBucketSize = 10000)
    assert(roomy.filter(col("id_a") >= 100000L).count() === 50L * 49 / 2)
    // healthy buckets are unaffected by a cap sized above their population
    val cappedNatural = capped.filter(col("id_b") < 100000L).count()
    assert(cappedNatural <= baseline)
  }

  test("SemDeDup: planted scaled copies removed, originals kept, none else") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val u = emb.unionByName(planted)
    val out = Dedup.semanticDedup(u, numCells = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // exactly the 10 planted copies are removed (cosine assignment is
    // scale-invariant -> copy shares its original's cell; corpus carries
    // no natural pair above 0.9), each kept by its original, cosine 1
    assert(out.length === 10)
    out.foreach { case (removed, kept, cos) =>
      assert(removed >= 5000L && kept === removed - 5000L)
      assert(math.abs(cos - 1.0) < 1e-12)
    }
    // spherical Lloyd refinement (iters > 0) moves centroids but cannot
    // split an exact-duplicate pair across cells
    assert(Dedup.semanticDedup(u, numCells = 8, threshold = 0.9, iters = 2)
      .count() === 10)
  }

  test("tfidf ranks the distinctive term first; lm perplexity flags rare bigrams") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "cat sat on mat"),
      (1L, "cat sat on mat"),
      (2L, "cat sat on mat"),
      (3L, "zyx qwv abc def"),
      (4L, "dog sat on mat")).toDF("doc_id", "text")
    val kw = TextAnalysis.tfidfTerms(corpus, topK = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // the df-1 terms win their docs; in the template doc the df-3 'cat'
    // beats the df-4 glue (all tf 1 — idf decides)
    assert(kw((4L, 1)) === "dog")
    assert(kw((3L, 1)) === "abc") // all df-1 -> score tie, term asc
    assert(kw((0L, 1)) === "cat")

    val ppl = TextAnalysis.lmPerplexity(corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 3's bigrams occur once in the corpus; the template's occur 3-4
    // times — rare-bigram docs score strictly higher, the gating signal
    assert(ppl(3L) > ppl(4L) && ppl(4L) > ppl(0L))
    assert(ppl.size === 5 && ppl.values.forall(_ > 0.0))
  }

  test("pageRank: hand-computed path graph, mass conservation, parallel edges add") {
    import spark.implicits._
    // path a–b–c, symmetrized, unit weights
    val edges = Seq(("a", "b", 1.0), ("b", "a", 1.0),
      ("b", "c", 1.0), ("c", "b", 1.0)).toDF("src", "dst", "weight")
    val r1 = graft.pipeline.Graph.pageRank(edges, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // r1(a) = 0.05 + 0.85·(1/3·0.5); r1(b) = 0.05 + 0.85·(2/3)
    assert(math.abs(r1("a") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r1("b") - (0.05 + 0.85 * 2 / 3)) < 1e-12)
    assert(r1("c") === r1("a")) // path symmetry
    val r5 = graft.pipeline.Graph.pageRank(edges, iters = 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r5.values.sum - 1.0) < 1e-9) // no dangling loss
    assert(r5("b") > r5("a") && r5("a") === r5("c"))
    // parallel edges accumulate weight: (a,b,1)+(a,b,2) == (a,b,3)
    val par = Seq(("a", "b", 1.0), ("a", "b", 2.0), ("b", "a", 3.0),
      ("b", "c", 1.0), ("c", "b", 1.0)).toDF("src", "dst", "weight")
    val merged = Seq(("a", "b", 3.0), ("b", "a", 3.0),
      ("b", "c", 1.0), ("c", "b", 1.0)).toDF("src", "dst", "weight")
    val a = graft.pipeline.Graph.pageRank(par, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = graft.pipeline.Graph.pageRank(merged, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a.keys == b.keys && a.forall { case (k, v) => math.abs(v - b(k)) < 1e-12 })
  }

  test("personalizedPageRank: seed-pinned teleport, mass conservation, locality") {
    import spark.implicits._
    // path a–b–c–d, symmetrized, unit weights; seed = {a}
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("c", "d"), ("d", "c")).map { case (s, d) => (s, d, 1.0) }
      .toDF("src", "dst", "weight")
    val r = graft.pipeline.Graph.personalizedPageRank(edges, Seq("a"), iters = 8)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // teleport mass conserved
    // relevance decays with distance WITHIN a bipartite class (a path
    // graph oscillates between parity classes at finite iterations, so
    // cross-parity hops are not monotone — compare like with like)
    assert(r("a") > r("c") && r("b") > r("d"))
    assert(r.values.max === r("a") && r.values.min === r("d"))
    // one iteration, hand-checked: r0 = [1,0,0,0];
    // r1(a) = 0.15 + 0.85·(r0(b)·½) = 0.15; r1(b) = 0.85·1 = 0.85
    val r1 = graft.pipeline.Graph.personalizedPageRank(edges, Seq("a"), iters = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r1("a") - 0.15) < 1e-12)
    assert(math.abs(r1("b") - 0.85) < 1e-12)
    assert(r1("c") === 0.0 && r1("d") === 0.0)
    // a seed that is not a vertex raises instead of leaking mass
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Graph.personalizedPageRank(edges, Seq("a", "zz"), iters = 1)
    }
    assert(e.getMessage.contains("not graph vertices"))
  }

  test("bm25: candidates need a query term; tf saturates; length normalizes; score exact") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "cat sat"),
      (1L, "cat cat cat sat"),
      (2L, "dog ran far away home"),
      (3L, "bird bird"),
      (4L, "dog x x x x x x x")).toDF("doc_id", "text")
    val queries = Seq((1L, "cat"), (2L, "cat dog zzz")).toDF("query_id", "query_text")
    val out = TextAnalysis.bm25Search(corpus, queries, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    // only docs containing at least one query term are candidates
    assert(out.keySet === Set((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L), (2L, 2L), (2L, 4L)))
    // exact score of (q1, doc0): idf(cat) = ln(1 + (5−2+0.5)/2.5), tf 1,
    // dl 2, avgdl = 21/5
    val avgdl = 21.0 / 5
    val expected = math.log(1.0 + 3.5 / 2.5) * 1.0 * 2.2 /
      (1.0 + 1.2 * (0.25 + 0.75 * 2 / avgdl))
    assert(math.abs(out((1L, 0L))._2 - expected) < 1e-6)
    // tf saturation still rewards tf 3 over tf 1 here: doc1 outranks doc0
    assert(out((1L, 1L))._1 === 1L && out((1L, 0L))._1 === 2L)
    // length normalization: same tf(dog)=1, shorter doc 2 beats doc 4
    assert(out((2L, 2L))._2 > out((2L, 4L))._2)
    // unknown query term 'zzz' is ignored, not an error (inner df join)
  }

  test("IVF-PQ: cell-routed candidates carry the same ADC as the flat scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val queries = emb.filter(col("vec_id") < 5)
    val flat = Ann.pqTopK(emb, queries, k = 200, m = 4, numCentroids = 16)
    val routed = Ann.ivfPqTopK(emb, queries, k = 10, numCentroids = 8,
      nprobe = 4, m = 4, pqCentroids = 16).cache()
    assert(routed.groupBy("query_id").count().collect().forall(_.getLong(1) === 10))
    // same (pq-seed) codebooks => identical ADC for every common pair:
    // routing restricts the candidate set, never changes a distance
    val d = routed.as("r").join(flat.as("f"), Seq("query_id", "id"))
      .select(abs(col("r.adc") - col("f.adc")).as("d")).agg(max("d")).head()
    assert(!d.isNullAt(0) && d.getDouble(0) === 0.0)
    // routed ranks are monotone in adc
    val a = routed.filter(col("query_id") === 1).orderBy(col("rank"))
      .select(col("adc")).collect().map(_.getDouble(0))
    assert(a.sameElements(a.sorted))
  }

  test("routed k-NN graph: IVF-PQ cell join recovers >= 0.9 of the exact edges") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    // fixture vectors are unit-norm (checked below), so the routed ADC-L2
    // ranking and the exact cosine ranking target the same neighbors
    val nrm = emb.select(abs(aggregate(transform(col("embedding"),
      x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x) - 1.0).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(nrm < 1e-5, s"fixture no longer unit-norm (|v|^2 off by $nrm)")
    val exact = Ann.knnGraph(emb, k = 10).cache()
    // iters = 0 codebooks (the oracle-replayable pick) on this
    // near-isotropic fixture are a worst case: the IVF routing ceiling at
    // nprobe=6/8 is ~0.88, so hitting 0.9 needs 7/8 probes + the exact
    // refine stage over the ADC shortlist
    val routed = Ann.knnGraphRouted(emb, k = 10, numCentroids = 8, nprobe = 7,
      m = 16, pqCentroids = 64, iters = 0, pqIters = 0, refine = 8).cache()
    // every vector is a query: n rows of k edges each
    assert(routed.groupBy("src").count().collect().forall(_.getLong(1) === 10))
    val recall = routed.join(exact, Seq("src", "dst"), "left_semi").count().toDouble /
      exact.count()
    info(s"routed knn-graph edge recall@10 (nprobe=7/8, m=16, refine=8) = $recall")
    assert(recall >= 0.9, s"routed knn-graph recall too low: $recall")
  }

  test("hierarchical routing: assignment covered, recall within 0.05 of exact routing") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val exact = Ann.knnGraph(emb, k = 10).cache()
    // same parameters as the exact-routing recall test above, Lloyd'd
    // cells (iters=3) so the coarse router has real structure to split
    val flat = Ann.knnGraphRouted(emb, k = 10, numCentroids = 8, nprobe = 7,
      m = 16, pqCentroids = 64, iters = 3, pqIters = 0, refine = 8,
      trainDistributed = true).cache()
    val hier = Ann.knnGraphRouted(emb, k = 10, numCentroids = 8, nprobe = 7,
      m = 16, pqCentroids = 64, iters = 3, pqIters = 0, refine = 8,
      trainDistributed = true, hierarchicalRouting = true).cache()
    assert(hier.groupBy("src").count().collect().forall(_.getLong(1) === 10))
    val rFlat = flat.join(exact, Seq("src", "dst"), "left_semi").count().toDouble /
      exact.count()
    val rHier = hier.join(exact, Seq("src", "dst"), "left_semi").count().toDouble /
      exact.count()
    info(s"knn-graph recall: exact routing $rFlat, hierarchical $rHier")
    // the coarse router may lose boundary cells — bounded loss, not free
    assert(rHier >= rFlat - 0.05,
      s"hierarchical routing lost too much recall: $rHier vs $rFlat")
    // the routers agree on the vast majority of single-cell assignments
    val cents = Ann.trainCentroidsDistributed(emb, "embedding", 8, iters = 3)
    val exactAssign = Ann.nearestCell(col("embedding"), cents)
    val hierAssign = element_at(Ann.hierProbes(col("embedding"), cents, 1), 1)
    val agree = emb.select((exactAssign === hierAssign).cast("long").as("ok"))
      .agg(avg(col("ok"))).head().getDouble(0)
    info(s"hierarchical assignment agreement = $agree")
    assert(agree >= 0.8, s"hierarchical assignment diverged: $agree")
  }

  test("2-level IMI router: recall parity with the 1-level router, codegen == interpreted") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val exact = Ann.knnGraph(emb, k = 10).cache()
    // larger cell count than the 1-level test so the grand layer has
    // real structure (c=64 → 8 parents → 3 grandparents on this fixture)
    def routed(levels: Int) = Ann.knnGraphRouted(emb, k = 10,
      numCentroids = 64, nprobe = 24, m = 16, pqCentroids = 64, iters = 3,
      pqIters = 0, refine = 8, trainDistributed = true,
      hierarchicalRouting = true, routerLevels = levels).cache()
    val one = routed(1)
    val two = routed(2)
    assert(two.groupBy("src").count().collect().forall(_.getLong(1) === 10))
    val r1 = one.join(exact, Seq("src", "dst"), "left_semi").count().toDouble /
      exact.count()
    val r2 = two.join(exact, Seq("src", "dst"), "left_semi").count().toDouble /
      exact.count()
    info(s"knn-graph recall: 1-level router $r1, 2-level router $r2")
    assert(r2 >= r1 - 0.05,
      s"2-level router lost too much recall: $r2 vs $r1")

    // codegen (DataFrame path) == interpreted (nullSafeEval) on the
    // same TreeProbes instance — both paths ship to executors on a
    // real cluster, so they must agree cell-for-cell
    val cents = Ann.trainCentroidsDistributed(emb, "embedding", 64, iters = 3)
    val assignCol = element_at(
      Ann.hierProbes(col("embedding"), cents, 1, levels = 2), 1)
    val fromDf = emb.orderBy("vec_id")
      .select(col("vec_id"), assignCol.as("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (parents, parentOf) = Ann.buildRouter(cents)
    val (grands, grandOf) = Ann.buildRouter(parents)
    val expr = graft.functions.TreeProbes(
      org.apache.spark.sql.GraftColumnBridge.expression(col("embedding")),
      cents, parents, parentOf, grands, grandOf,
      nprobe = 1, parentProbes = 2, grandProbes = 2)
    emb.orderBy("vec_id").select(col("vec_id"), col("embedding")).collect()
      .foreach { r =>
        val v = org.apache.spark.sql.catalyst.util.ArrayData
          .toArrayData(r.getSeq[Float](1).toArray)
        val got = expr.nullSafeEval(v)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        // interpreted floors may differ from hierProbes' auto-expanded
        // ones; assert only when the parameters match what hierProbes
        // picked — here they do for this shape (pp=2, gp=2)
        assert(got.numElements() >= 1)
        assert(got.getInt(0) === fromDf(r.getLong(0)),
          s"vec ${r.getLong(0)}: interpreted ${got.getInt(0)} != codegen ${fromDf(r.getLong(0))}")
      }
  }

  test("AnnIO round-trips the router depth; 2-level index serves identically after load") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val built = Ann.buildIvfPq(emb, numCentroids = 64, m = 4,
      pqCentroids = 16, iters = 3, trainDistributed = true,
      hierarchicalRouting = true, routerLevels = 2)
    assert(built.routerLevels === 2)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_tree").toString
    graft.sources.AnnIO.save(built, dir)
    val loaded = graft.sources.AnnIO.load(spark, dir)
    assert(loaded.hierarchical && loaded.routerLevels === 2,
      "router depth lost in persistence")
    val a = Ann.queryIvfPq(built, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Ann.queryIvfPq(loaded, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === b, "loaded 2-level index must serve the same ranked results")
  }

  test("knnGraph refuses corpus-sized inputs and points at the routed form") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Ann.knnGraph(emb, k = 3, maxBruteForceRows = 100)
    }
    assert(e.getMessage.contains("knnGraphRouted"))
  }

  test("PQ ANN: k rows per query, ADC monotone with rank, useful L2 recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val queries = emb.filter(col("vec_id") < 5)
    // exact L2 top-10 as ground truth (ADC approximates L2, not cosine)
    val c = emb.select(col("vec_id").cast("long").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = queries.select(col("vec_id").cast("long").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("qv"))
    val d2 = aggregate(zip_with(col("v"), col("qv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2").asc, col("id"))
    val bf = c.crossJoin(broadcast(q)).filter(col("id") =!= col("query_id"))
      .withColumn("d2", d2).withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10).cache()

    val pq = Ann.pqTopK(emb, queries, k = 10, m = 8, numCentroids = 64,
      iters = 3).cache()
    assert(pq.groupBy("query_id").count().collect().forall(_.getLong(1) === 10))
    val adcs = pq.filter(col("query_id") === 0).orderBy(col("rank"))
      .select(col("adc")).collect().map(_.getDouble(0))
    assert(adcs.sameElements(adcs.sorted))
    // ADC must approximate the true L2: median relative error of adc vs
    // exact d2 over the returned pairs
    val errs = pq.join(
        c.select(col("id"), col("v")), Seq("id"))
      .join(q, Seq("query_id"))
      .withColumn("d2", d2)
      .select((abs(col("adc") - col("d2")) / col("d2")).as("rel"))
      .collect().map(_.getDouble(0)).sorted
    val medianErr = errs(errs.length / 2)
    info(s"PQ median relative ADC error (m=8, 64 centroids) = $medianErr")
    // ~0.28 measured on this fixture: 8-dim subspaces x 64 centroids on
    // near-uniform random data quantize coarsely; the bound pins against
    // regression, not against the fixture's intrinsic error
    assert(medianErr <= 0.35, s"ADC error too high: $medianErr")
    // pure-ADC recall on this near-random fixture is bounded by the
    // distance concentration (neighbor gaps ~ quantization error), so the
    // floor is 'far better than random' (random = 10/499 ~= 0.02)
    val recall = pq.join(bf, Seq("query_id", "id"), "left_semi").count().toDouble /
      bf.count()
    info(s"PQ recall@10 vs exact L2 (m=8, 64 centroids, iters=3) = $recall")
    assert(recall >= 0.15, s"PQ recall@10 too low: $recall")
    // the deployment shape: ADC shortlist (5k) -> exact rerank -> top-10
    val short = Ann.pqTopK(emb, queries, k = 50, m = 8, numCentroids = 64,
      iters = 3)
    val rr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2").asc, col("id"))
    val reranked = short.select(col("query_id"), col("id"))
      .join(c, Seq("id")).join(q, Seq("query_id"))
      .withColumn("d2", d2).withColumn("rank", row_number().over(rr))
      .filter(col("rank") <= 10)
    val recallRr = reranked.join(bf, Seq("query_id", "id"), "left_semi").count()
      .toDouble / bf.count()
    info(s"PQ shortlist(50)+exact-rerank recall@10 = $recallRr")
    assert(recallRr >= 0.5, s"reranked PQ recall@10 too low: $recallRr")
  }

  test("vocabStats: HLL sketch within 2% of the exact distinct count") {
    val docsDF = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TextAnalysis.vocabStats(docsDF, exact = true).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = TextAnalysis.vocabStats(docsDF).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && exact.keySet === approx.keySet)
    exact.foreach { case (src, (d, t)) =>
      assert(d > 0 && d <= t, s"$src: $d distinct of $t total")
      val a = approx(src)
      assert(math.abs(a - d).toDouble / d <= 0.02, s"$src: sketch $a vs exact $d")
    }
  }

  test("language id picks the stopword-matching language") {
    val out = TextAnalysis.languageId(docsDF).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("lang_pred"))).toMap
    assert(out(0L) === "en")
    assert(out(4L) === "fr")
    assert(out(5L) === "und")
  }

  test("quality, token counts, fingerprints") {
    val q = TextAnalysis.qualityScore(docsDF).filter(col("doc_id") === 0).head()
    assert(q.getDouble(q.fieldIndex("quality")) > 0.5)
    val empty = TextAnalysis.qualityScore(docsDF).filter(col("doc_id") === 5).head()
    assert(empty.getDouble(empty.fieldIndex("quality")) < 0.7)

    val t = TextAnalysis.tokenCounts(docsDF).filter(col("doc_id") === 0).head()
    assert(t.getInt(t.fieldIndex("ws_tokens")) === 9)
    assert(t.getInt(t.fieldIndex("bpeish_tokens")) === 9)

    val f = TextAnalysis.fingerprint(docsDF)
    val fps = f.select("doc_id", "fingerprint").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(0L) === fps(1L))
    assert(fps(0L) !== fps(2L))
  }

  test("multimodal plumbing: deterministic stub features and frame sampling") {
    val media = Multimodal.fromStrings(docsDF, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media, batchSize = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(0L) === feats(1L))           // identical payloads
    assert(math.abs(feats(0L).sum - 1.0f) < 1e-5)
    assert(feats(5L).sum === 0.0f)            // empty payload

    // real frame sampling: an 8-frame concatenated-P6 clip sampled at
    // n=4 keeps exactly frames {0, 2, 4, 6} with their true dimensions
    val ppm = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("P6\n2 1\n255\n".getBytes("US-ASCII"))
      out.write(Array[Byte](10, 20, 30, 40, 50, 60))
      out.toByteArray
    }
    val clip = Array.fill(8)(ppm).reduce(_ ++ _)
    val vids = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(7L, clip, "video")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType))))
    val frames = Multimodal.sampleFrames(vids, n = 4).collect()
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 2, 4, 6))
    assert(frames.forall(r => r.getInt(2) == 8 && r.getInt(3) == 2
      && r.getInt(4) == 1))
    // text payloads aren't P6 — zero frames, zero rows, no crash
    assert(Multimodal.sampleFrames(
      media.withColumn("kind", lit("video")), n = 4).count() === 0)
  }

  test("multimodal -> ANN composition: stub features feed the similarity path") {
    // the end-to-end media story: decode (stubbed) -> feature vector ->
    // nearest-neighbor search, all on the engine's own operators
    val media = Multimodal.fromStrings(docsDF.filter(length(trim(col("text"))) > 0),
      "doc_id", "text")
    val feats = Multimodal.extractFeatures(media)
    val queries = feats.filter(col("media_id") < 3)
    val nn = Ann.bruteForceTopK(feats, queries, k = 3,
      idCol = "media_id", vecCol = "features")
    val rows = nn.collect()
    assert(rows.nonEmpty)
    assert(nn.groupBy("query_id").count().collect().forall(_.getLong(1) === 3))
    // identical payloads (docs 0 and 1 share text in the fixture) must be
    // each other's top hit at cosine ~1
    val top = rows.filter(r => r.getLong(0) == 0L && r.getInt(1) == 1).head
    assert(top.getLong(2) === 1L && top.getDouble(3) > 0.999999)
  }

  test("corpusStats: approx (scale path) agrees with exact on the fixture") {
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      (i.toLong, ("tok " * (5 + i % 37)).trim, s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val counted = TextAnalysis.tokenCounts(docs)
    val exact = TextAnalysis.corpusStats(counted, exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = TextAnalysis.corpusStats(counted, exact = false)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === Set("src0", "src1", "src2"))
    exact.foreach { case (srcKey, e) =>
      val a = approx(srcKey)
      assert(a.getLong(1) === e.getLong(1))            // n_docs
      assert(a.getLong(2) === e.getLong(2))            // total_tokens
      assert(a.getDouble(3) === e.getDouble(3))        // mean
      // approx_percentile returns an actual data value; exact interpolates.
      // On integer token counts they must land within one data step.
      assert(math.abs(a.getDouble(4) - e.getDouble(4)) <= 3.0, s"p50 $srcKey")
      assert(math.abs(a.getDouble(5) - e.getDouble(5)) <= 3.0, s"p90 $srcKey")
    }
  }

  test("duplicateClusters: min-label propagation resolves chains and separates components") {
    import spark.implicits._
    // chain 1-2-3-4 (min label must travel 3 hops), separate pair 10-11,
    // and a triangle 20-21-22 entered via multiple paths
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("hardNegatives: near-dup above ceiling excluded, k fills from below") {
    import spark.implicits._
    // vec 1 is a scaled copy of query 0 (cosine 1.0 — an unlabeled
    // positive); 2 and 3 are informative negatives; 4 is orthogonal
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f, 0.0f)),
      (2L, Array(0.8f, 0.6f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Ann.hardNegatives(vecs, vecs.filter(col("vec_id") === 0L),
        k = 2, maxCosine = 0.95)
      .orderBy(col("rank")).collect().map(_.getLong(2))
    assert(got === Array(2L, 3L), "the scaled copy must not appear")
  }

  test("truncateRecall: full-width recall is 1, rows are per-dim exact fractions") {
    import spark.implicits._
    val vecs = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(j => math.cos(i * 1.3 + j * 0.7).toFloat))
    }.toDF("vec_id", "embedding")
    val got = Ann.truncateRecall(vecs, Seq(2, 8), numQueries = 3, k = 4)
      .orderBy(col("dim_kept")).collect()
    assert(got.length === 2)
    val full = got.find(_.getLong(0) === 8L).get
    assert(full.getLong(1) === 3L && full.getLong(2) === 12L)
    assert(full.getDouble(3) === 1.0, "keeping every dim must recall 1.0")
    val trunc = got.find(_.getLong(0) === 2L).get
    assert(trunc.getDouble(3) <= 1.0 && trunc.getDouble(3) >= 0.0)
  }

  test("keepBest elects the longest cluster member, ties to smallest id") {
    import spark.implicits._
    // cluster {1,2,3}: 2 is longest; cluster {10,11}: equal lengths ->
    // min id 10; doc 99 is unclustered and must not appear
    val d = Seq(
      (1L, "short"), (2L, "the longest text here"), (3L, "medium txt"),
      (10L, "same len"), (11L, "same len"), (99L, "alone")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.keepBest(d, pairs, length(col("text"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got === Seq((1L, 1L, 2L, false), (2L, 1L, 2L, true),
      (3L, 1L, 2L, false), (10L, 10L, 10L, true), (11L, 10L, 10L, false)))
  }

  test("adamicAdar: hand-computed wedge scores, adjacent pairs excluded") {
    import spark.implicits._
    // path 1-2-3 plus 3-4: non-adjacent pairs (1,3) via z=2 (deg 2),
    // (2,4) via z=3 (deg 2), (1,4) share nothing; all adjacent pairs
    // excluded. Expected score 1/ln(2) for both wedge pairs.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.adamicAdar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val w = BigDecimal(1.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map((1L, 3L) -> w, (2L, 4L) -> w))
    // triangle 5-6-7 + tail 7-8: (5,8) via z=7 whose deg is 3 -> 1/ln 3
    val tri = Seq((5L, 6L), (6L, 7L), (5L, 7L), (7L, 8L)).toDF("src", "dst")
    val got2 = Graph.adamicAdar(tri).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val w3 = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got2((5L, 8L)) === w3)
    assert(got2((6L, 8L)) === w3)
    assert(!got2.contains((5L, 6L)), "adjacent pair must be excluded")
    // frequent-neighbor pruning: a star hub 100-{101..105} has deg 5 —
    // with maxDegree 4 no wedge may pass through it
    val star = (101L to 105L).map(l => (100L, l)).toDF("src", "dst")
    assert(Graph.adamicAdar(star).count() === 10L) // C(5,2) leaf pairs
    assert(Graph.adamicAdar(star, maxDegree = 4).count() === 0L)
  }

  test("jaccardSimilarity: hand-computed scores, adjacent pairs excluded, hub pruned") {
    import spark.implicits._
    // path 1-2-3 plus 3-4: (1,3) share z=2 -> 1/(deg1 + deg3 - 1) =
    // 1/(1+2-1) = 0.5; (2,4) share z=3 -> 1/(2+1-1) = 0.5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.jaccardSimilarity(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === Map((1L, 3L) -> ((1L, 0.5)), (2L, 4L) -> ((1L, 0.5))))
    // triangle 5-6-7 + tail 7-8: (5,8) via z=7 -> common 1, degs 2 and 1
    // -> 1/2; adjacent (5,6) excluded even though they share z=7
    val tri = Seq((5L, 6L), (6L, 7L), (5L, 7L), (7L, 8L)).toDF("src", "dst")
    val got2 = Graph.jaccardSimilarity(tri).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got2((5L, 8L)) === 0.5)
    assert(got2((6L, 8L)) === 0.5)
    assert(!got2.contains((5L, 6L)), "adjacent pair must be excluded")
    // frequent-neighbor pruning: hub 100-{101..105} (deg 5) blocks all
    // wedges under maxDegree 4; denominators stay exact degrees
    val star = (101L to 105L).map(l => (100L, l)).toDF("src", "dst")
    assert(Graph.jaccardSimilarity(star).count() === 10L)
    assert(Graph.jaccardSimilarity(star, maxDegree = 4).count() === 0L)
  }

  test("ndcgReport: perfect order -> 1.0, miss at the top costs more than at the tail") {
    import spark.implicits._
    def disc(r: Int): BigDecimal =
      BigDecimal(math.log(2.0) / math.log(r + 1.0))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val exact = Seq((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
      .toDF("query_id", "rank", "id")
    // perfect: same ids any order ranked 1..3 -> dcg == idcg
    val perfect = Ann.ndcgReport(exact, exact).collect().head
    assert(perfect.getDouble(2) === 1.0)
    // id 99 (irrelevant) at rank 1 pushes both hits down
    val worse = Seq((0L, 1, 99L), (0L, 2, 10L), (0L, 3, 11L))
      .toDF("query_id", "rank", "id")
    val idcg = disc(1) + disc(2) + disc(3)
    val dcgW = disc(2) + disc(3)
    val rowW = Ann.ndcgReport(exact, worse).collect().head
    def r6(x: BigDecimal): Double =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rowW.getDouble(1) === r6(dcgW))
    assert(rowW.getDouble(2) === r6(dcgW / idcg))
    // no hits at all -> 0.0 via the left join
    val none = Seq((0L, 1, 98L)).toDF("query_id", "rank", "id")
    val rowN = Ann.ndcgReport(exact, none).collect().head
    assert(rowN.getDouble(1) === 0.0 && rowN.getDouble(2) === 0.0)
  }

  test("addToIvfPq: frozen-centroid encode, grown index serves old + new uniformly") {
    import spark.implicits._
    // old corpus: two tight axis clusters; new batch: one near-dup per
    // cluster. With iters = 0 the centroids/codebooks depend only on
    // the OLD rows, so the add is a pure encode.
    val old = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (1L, Array(0.95f, 0.05f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)), (3L, Array(0.0f, 0.0f, 0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val fresh = Seq(
      (10L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
      (12L, Array(0.0f, 0.0f, 0.99f, 0.01f))).toDF("vec_id", "embedding")
    val idx = Ann.buildIvfPq(old, numCentroids = 2, m = 2, pqCentroids = 4,
      iters = 0, pqIters = 0, sampleSize = 100)
    val grown = Ann.addToIvfPq(idx, fresh)
    assert(grown.codes.count() === 6L)
    // the new near-dup of vector 0 lands in 0's cell and wins its top-1
    val top = Ann.queryIvfPq(grown, old.filter(col("vec_id") === 0L),
      k = 1, nprobe = 1).collect().head
    assert(top.getLong(2) === 10L, s"expected the added near-dup, got $top")
    // centroids and codebooks are untouched by the add
    assert(grown.cells.map(_.toSeq) === idx.cells.map(_.toSeq))
  }

  test("ivfPqRerank: full probe + full overfetch recovers brute-force order") {
    import spark.implicits._
    val vecs = (0L until 12L).map { i =>
      val a = (i % 4).toInt; val v = new Array[Float](4)
      v(a) = 1.0f; v((a + 1) % 4) = 0.1f * (i / 4 + 1)
      (i, v)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 2)
    val rerank = Ann.ivfPqRerank(vecs, q, k = 5, overfetch = 50,
        numCentroids = 2, nprobe = 2, m = 2, pqCentroids = 4,
        iters = 0, pqIters = 0, sampleSize = 100)
      .orderBy(col("query_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val brute = Ann.bruteForceTopK(vecs, q, k = 5)
      .orderBy(col("query_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rerank === brute,
      "probing every cell with overfetch >= corpus must equal brute force")
  }

  test("sq8: codes in range, search ranks match float brute force on a spread fixture") {
    import spark.implicits._
    // well-separated directions so quantization cannot flip ranks
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.5f)),
      (4L, Array(0.1f, 0.0f, 0.9f, 0.4f))).toDF("vec_id", "embedding")
    val codes = Ann.sq8Encode(vecs)
    val all = codes.select(explode(col("codes")).as("c")).collect().map(_.getInt(0))
    assert(all.forall(c => c >= 0 && c <= 255))
    val top = Ann.sq8TopK(codes, codes.filter(col("id") === 0L), k = 2)
      .orderBy(col("rank")).collect().map(_.getLong(2))
    assert(top.head === 1L, "nearest direction wins under int dot product")
    val brute = Ann.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L), 2)
      .orderBy(col("rank")).collect().map(_.getLong(2))
    assert(top.head === brute.head)
  }

  test("zipfSlope: exact planted power law recovers slope -1") {
    import spark.implicits._
    // freq(rank) = 840 / rank exactly for ranks 1..8 -> ln-ln slope -1
    val freqs = (1 to 8).map(r => (f"w$r%02d", 840 / r))
    val text = freqs.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val df = Seq((0L, "zipf", text)).toDF("doc_id", "source", "text")
    val row = TextAnalysis.zipfSlope(df, topN = 8).collect().head
    assert(row.getLong(1) === 8L)
    assert(math.abs(row.getDouble(2) + 1.0) < 1e-9, s"slope ${row.getDouble(2)}")
    val c = BigDecimal(math.log(840.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(3) - c) < 1e-6, s"intercept ${row.getDouble(3)}")
  }

  test("shardManifest: counts exact, digest = md5 of shard_pos-ordered doc md5s") {
    import spark.implicits._
    val d = (0L until 20L).map(i => (i, s"doc $i body with five tokens"))
      .toDF("doc_id", "text")
    val m = Sampling.shardManifest(d, "doc_id", "text", nShards = 4, salt = "s")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(m.values.map(_._1).sum === 20L)
    assert(m.values.map(_._2).sum === 20L * 6)
    // replay one shard's digest from the assignment
    val sh = Sampling.shardShuffle(d, "doc_id", 4, "s")
      .withColumn("dmd5", md5(col("text")))
      .filter(col("shard") === 0).orderBy(col("shard_pos"))
      .collect().map(_.getAs[String]("dmd5"))
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(sh.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(m(0)._3 === expect)
  }

  test("boilerplateScrub excises listed n-gram spans, unions overlaps") {
    import spark.implicits._
    val docs = Seq(
      (0L, "keep subscribe to our newsletter keep2"),   // one listed 3-gram mid-doc
      (1L, "subscribe to our newsletter today"),        // overlapping spans union
      (2L, "nothing listed here at all"),
      (3L, "")).toDF("doc_id", "text")
    // removal list: two overlapping 3-grams
    val bl = Seq("subscribe to our", "to our newsletter").toDF("g")
    val r = graft.pipeline.Dedup.boilerplateScrub(docs, bl, n = 3)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2)))).toMap
    // doc 0: positions 1-3 ("subscribe to our") and 2-4 ("to our newsletter")
    //        both listed -> tokens 1..4 removed
    assert(r(0L) === (("keep keep2", 4L)))
    // doc 1: positions 0-2 and 1-3 removed -> only "today" survives
    assert(r(1L) === (("today", 4L)))
    assert(r(2L) === (("nothing listed here at all", 0L)))
    assert(r(3L) === (("", 0L)))
  }

  test("winnowing: density guarantee, rightmost tie-break, short-doc windows") {
    import spark.implicits._
    // two docs sharing a 6-token run (>= w+k-1 = 6): the guarantee says
    // they must share at least one selected fingerprint VALUE
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta unique tail here"),
      (1L, "other prefix words alpha beta gamma delta epsilon zeta"),
      (2L, "tiny doc"),           // < k tokens: no k-grams, no output
      (3L, "one two three four")  // 2 grams < w: single truncated window
    ).toDF("doc_id", "text")
    val r = graft.pipeline.TextAnalysis.winnowing(docs, k = 3, w = 4)
      .collect().map(x => (x.getAs[Long]("id"), x.getAs[Long]("pos"),
        x.getAs[Long]("fp")))
    val byDoc = r.groupBy(_._1)
    assert((byDoc(0L).map(_._3).toSet intersect byDoc(1L).map(_._3).toSet).nonEmpty,
      "shared >= w+k-1 token run must share a fingerprint")
    assert(!byDoc.contains(2L))
    // doc 3: 2 grams, one truncated window -> exactly one selection
    assert(byDoc(3L).length === 1)
    // same-content docs fingerprint identically (position-stable)
    val dup = Seq((7L, "alpha beta gamma delta epsilon zeta unique tail here"))
      .toDF("doc_id", "text")
    val r7 = graft.pipeline.TextAnalysis.winnowing(dup, k = 3, w = 4)
      .collect().map(x => (x.getAs[Long]("pos"), x.getAs[Long]("fp"))).toSet
    assert(r7 === byDoc(0L).map(x => (x._2, x._3)).toSet)
    // every selected fp is the min of SOME window containing its pos:
    // selections per doc are strictly fewer than gram count (w > 1)
    assert(byDoc(0L).length < 7)
  }

  test("incrementalExact: corpus-dup vs batch-dup vs new, index never rescanned") {
    import spark.implicits._
    val corpus = Seq((0L, "known content"), (1L, "other known"),
      (5L, "known  CONTENT")).toDF("doc_id", "text") // 5 dups 0 after norm
    val index = Dedup.exact(corpus).select("fingerprint", "canonical_id")
    val batch = Seq(
      (10L, "Known Content"),   // normalizes to corpus hash -> dup_of_corpus(0)
      (11L, "fresh stuff"),     // new
      (12L, "fresh  stuff"),    // dup_in_batch of 11 (normalized)
      (13L, "fresh stuff"),     // dup_in_batch of 11
      (14L, "also unseen")).toDF("doc_id", "text")
    val r = Dedup.incrementalExact(index, batch)
      .collect().map(x => x.getAs[Long]("id") ->
        ((x.getAs[String]("status"), x.getAs[Long]("dup_of")))).toMap
    assert(r(10L) === (("dup_of_corpus", 0L)))
    assert(r(11L) === (("new", -1L)))
    assert(r(12L) === (("dup_in_batch", 11L)))
    assert(r(13L) === (("dup_in_batch", 11L)))
    assert(r(14L) === (("new", -1L)))
  }

  test("incrementalMinhash: corpus near-dup vs batch near-dup vs new against the signature index") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq((0L, base), (1L, "completely unrelated corpus words here"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashIndex(corpus, shingleSize = 3, numHashes = 8,
      bands = 4)
    val fresh = "one two three four five six seven eight nine ten"
    val batch = Seq(
      (10L, base + " lambda"),   // near-dup of corpus 0 (high shingle overlap)
      (11L, fresh),              // new content
      (12L, fresh + " eleven"),  // near-dup of 11 -> dup_in_batch
      (13L, "short")             // shingle-less -> new (nothing to match on)
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalMinhash(index, batch, shingleSize = 3,
        numHashes = 8, bands = 4, threshold = 0.25)
      .collect().map(x => x.getAs[Long]("id") ->
        ((x.getAs[String]("status"), x.getAs[Long]("dup_of"),
          x.getAs[Double]("est_jaccard")))).toMap
    assert(r.keySet === Set(10L, 11L, 12L, 13L))
    assert(r(10L)._1 === "dup_of_corpus" && r(10L)._2 === 0L && r(10L)._3 >= 0.25)
    assert(r(11L)._1 === "new" && r(11L)._2 === -1L && r(11L)._3 === -1.0)
    assert(r(12L)._1 === "dup_in_batch" && r(12L)._2 === 11L && r(12L)._3 >= 0.25)
    assert(r(13L)._1 === "new" && r(13L)._2 === -1L)
    // an exact clone of a corpus doc estimates Jaccard 1 against it
    val clone = Seq((20L, base)).toDF("doc_id", "text")
    val rc = Dedup.incrementalMinhash(index, clone, shingleSize = 3,
      numHashes = 8, bands = 4, threshold = 0.25).collect().head
    assert(rc.getAs[String]("status") === "dup_of_corpus" &&
      rc.getAs[Double]("est_jaccard") === 1.0)
  }

  test("incrementalEmbedding: corpus twin vs batch twin vs new against the signature index") {
    import spark.implicits._
    // orthogonal-ish fixed directions: e1, e2, e3 in R^3
    val corpus = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.05f))).toDF("vec_id", "embedding")
    val index = Dedup.embeddingIndex(corpus, planes = 8, seed = 7)
    val batch = Seq(
      (10L, Array(2.0f, 0.1f, 0.0f)),   // x2 of corpus 0 -> dup_of_corpus
      (11L, Array(0.05f, 0.0f, 1.0f)),  // fresh direction -> new
      (12L, Array(0.2f, 0.0f, 4.0f)),   // x4 of 11 -> dup_in_batch
      (13L, Array(-1.0f, 0.9f, 0.1f))   // another fresh -> new
    ).toDF("vec_id", "embedding")
    val r = Dedup.incrementalEmbedding(index, batch, threshold = 0.95,
        planes = 8, seed = 7)
      .collect().map(x => x.getAs[Long]("vec_id") ->
        ((x.getAs[String]("status"), x.getAs[Long]("dup_of"),
          x.getAs[Double]("cosine")))).toMap
    assert(r.keySet === Set(10L, 11L, 12L, 13L))
    assert(r(10L)._1 === "dup_of_corpus" && r(10L)._2 === 0L
      && r(10L)._3 === 1.0)
    assert(r(11L)._1 === "new" && r(11L)._2 === -1L && r(11L)._3 === -1.0)
    assert(r(12L)._1 === "dup_in_batch" && r(12L)._2 === 11L
      && r(12L)._3 === 1.0)
    assert(r(13L)._1 === "new" && r(13L)._2 === -1L)
  }

  test("winnowingPairs: finds a copied paragraph inside a long doc; df cap prunes") {
    import spark.implicits._
    val para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fillerA = (0 until 80).map(i => s"wa$i").mkString(" ")
    val fillerB = (0 until 80).map(i => s"wb$i").mkString(" ")
    val docs = Seq(
      (0L, s"$fillerA $para"),      // long doc with the paragraph at the end
      (1L, s"$para $fillerB"),      // different long doc, same paragraph
      (2L, "completely different content with no shared runs at all")
    ).toDF("doc_id", "text")
    val pairs = graft.pipeline.Dedup.winnowingPairs(docs, k = 3, w = 4,
      minShared = 2, maxDocFreq = 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // the 10-token shared run >= w+k-1 guarantees shared fingerprints;
    // minShared=2 needs a run of some length, which 10 tokens provides
    assert(pairs === Set((0L, 1L)))
    // a df cap of 1 drops every shared fingerprint -> no pairs
    val none = graft.pipeline.Dedup.winnowingPairs(docs, k = 3, w = 4,
      minShared = 1, maxDocFreq = 1).count()
    assert(none === 0L)
  }

  test("lineDedup keeps globally-first occurrence, dedups within-doc, keeps blanks") {
    import spark.implicits._
    val docs = Seq(
      (0L, "Shared Header\nunique alpha line\nrepeat me\nrepeat me"),
      (1L, "shared  header\nunique beta line\n\nrepeat ME"),
      (2L, "totally unique text here")).toDF("doc_id", "text")
    val r = graft.pipeline.Dedup.lineDedup(docs)
      .collect().map(x => x.getAs[Long]("id") ->
        ((x.getAs[String]("scrubbed"), x.getAs[Long]("n_removed")))).toMap
    // doc 0 is first everywhere: keeps all lines except the within-doc
    // second "repeat me"
    assert(r(0L) === (("Shared Header\nunique alpha line\nrepeat me", 1L)))
    // doc 1: header dups doc 0's (case/whitespace-normalized), blank line
    // kept, "repeat ME" dups doc 0's "repeat me"
    assert(r(1L) === (("unique beta line\n", 2L)))
    assert(r(2L) === (("totally unique text here", 0L)))
  }

  test("lineDedup is partitioning-invariant") {
    import spark.implicits._
    val docs = (0L until 40L).map(i =>
      (i, s"header line\nbody ${i % 7} text\ntail ${i % 3}")).toDF("doc_id", "text")
    val a = graft.pipeline.Dedup.lineDedup(docs)
      .orderBy("id").collect().toSeq
    val b = graft.pipeline.Dedup.lineDedup(docs.repartition(11))
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("duplicateClusters: pointer jumping converges a 1000-node chain in O(log n) rounds") {
    import spark.implicits._
    // a single 1000-node path — the worst case for plain neighbor
    // propagation (999 rounds); pointer jumping must do it within the
    // default 30-round budget (≈ log2 budget for 2^30 nodes)
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 1000)
    assert(got.forall(_._2 === 0L), "every chain node must label to the component min")
  }

  test("duplicateClusters: raises instead of silently truncating at maxRounds") {
    import spark.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.duplicateClusters(chain, maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("triangles: degree-oriented count on a known graph, input canonicalization") {
    import spark.implicits._
    // square 1-2-4-3 with diagonal 2-3: triangles {1,2,3} and {2,3,4};
    // fed with duplicates and reversed directions to test canonicalization
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L),
      (3L, 4L), (2L, 4L), (4L, 2L), (2L, 3L)
    ).toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // triangle-free graph: empty result
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangles(path).count() === 0L)
  }

  test("domainStats: host extraction, www/port/path strip, per-doc distinct") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x https://www.Foo.COM/a/b y http://foo.com:8080/c z"),
      (1L, "see https://foo.com?q=1 and https://bar.org/p"),
      (2L, "no links here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.domainStats(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // foo.com: 3 mentions (www+port+query forms) across 2 docs
    assert(out("foo.com") === ((2L, 3L)))
    assert(out("bar.org") === ((1L, 1L)))
    assert(out.size === 2)
  }

  test("chunkDocuments: overlap, trailing-chunk rule, blank docs, coverage") {
    import spark.implicits._
    // 10 tokens a0..a9; chunk 6 / stride 4 -> starts 0, 4, 8
    val docs = Seq(
      (0L, (0 until 10).map(i => s"a$i").mkString(" ")),
      (1L, "one two three"), // single short chunk: kept (chunk 0)
      (2L, "")               // blank: no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, chunkTokens = 6,
      strideTokens = 4, minTokens = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap

    assert(out((0L, 0L)) === (("a0 a1 a2 a3 a4 a5", 6L)))
    assert(out((0L, 1L)) === (("a4 a5 a6 a7 a8 a9", 6L))) // 2-token overlap
    assert(!out.contains((0L, 2L)), "2-token tail < minTokens must drop")
    assert(out((1L, 0L)) === (("one two three", 3L)))
    assert(!out.keys.exists(_._1 == 2L))
    // every token of doc 0 appears in some chunk
    val covered = out.collect { case ((0L, _), (t, _)) => t.split(" ") }.flatten.toSet
    assert(covered === (0 until 10).map(i => s"a$i").toSet)
  }

  test("bfsDistances: min hop counts, maxHops cutoff, unreachable absent, multi-seed min") {
    import spark.implicits._
    // path 0-1-2-3-4-5 plus an isolated pair 10-11; directed input must
    // be traversed symmetrically
    val edges = Seq((1L, 0L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(0L, 4L).toDF("vertex")
    val d = graft.pipeline.Graph.bfsDistances(edges, seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // min over both seeds: 2 is 2 hops from 0 but 2 from 4 too; 3 is 1
    // hop from 4; 5 is 1 hop from 4
    assert(d === Map(0L -> 0, 4L -> 0, 1L -> 1, 3L -> 1, 5L -> 1, 2L -> 2))
    // maxHops cutoff: nothing beyond 2 hops; isolated pair never appears
    val d4 = graft.pipeline.Graph.bfsDistances(edges, Seq(0L).toDF("vertex"), 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d4 === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
    // early exit on an exhausted frontier (hop budget larger than graph)
    val d9 = graft.pipeline.Graph.bfsDistances(
      Seq((0L, 1L)).toDF("src", "dst"), Seq(0L).toDF("vertex"), 9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d9 === Map(0L -> 0, 1L -> 1))
  }

  test("connectedComponents: string vertices, chain resolves to min, components separate") {
    import spark.implicits._
    val edges = Seq(("b", "a"), ("b", "c"), ("d", "e"), ("f", "f"))
      .toDF("src", "dst")
    val out = Graph.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d", "f" -> "f"))
  }

  test("AnnIO: saved+loaded IVF-PQ index serves bit-identical results, raw vectors untouched") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val built = Ann.buildIvfPq(emb, numCentroids = 8, m = 4, pqCentroids = 16)
    val dir = java.nio.file.Files.createTempDirectory("ann_idx").toString
    graft.sources.AnnIO.save(built, dir)
    val loaded = graft.sources.AnnIO.load(spark, dir)
    assert(loaded.cells.map(_.toSeq).toSeq === built.cells.map(_.toSeq).toSeq)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      built.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val a = Ann.queryIvfPq(built, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Ann.queryIvfPq(loaded, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === b, "loaded index must serve the same ranked results")
    // the one-call form still equals the split build/query form
    val c = Ann.ivfPqTopK(emb, queries, k = 10, numCentroids = 8, m = 4,
      pqCentroids = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(c === a)
    // routing mode survives persistence: a hierarchical index must not
    // silently serve with exact probe routing after load
    assert(!loaded.hierarchical)
    val hBuilt = Ann.buildIvfPq(emb, numCentroids = 8, m = 4,
      pqCentroids = 16, iters = 3, trainDistributed = true,
      hierarchicalRouting = true)
    val hDir = java.nio.file.Files.createTempDirectory("ann_idx_h").toString
    graft.sources.AnnIO.save(hBuilt, hDir)
    val hLoaded = graft.sources.AnnIO.load(spark, hDir)
    assert(hLoaded.hierarchical, "hierarchical flag lost in persistence")
    val ha = Ann.queryIvfPq(hBuilt, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val hb = Ann.queryIvfPq(hLoaded, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ha === hb, "loaded hierarchical index must serve identically")
  }

  test("AnnIO SQ8: saved+loaded codes+codebook serve bit-identical ranks, new queries encode on the same grid") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (lo, hi) = Ann.sq8Stats(emb)
    val codes = Ann.sq8EncodeWith(emb, lo, hi)
    val dir = java.nio.file.Files.createTempDirectory("sq8_idx").toString
    graft.sources.AnnIO.saveSq8(codes, lo, hi, dir)
    val (lCodes, lLo, lHi) = graft.sources.AnnIO.loadSq8(spark, dir)
    assert(lLo === lo && lHi === hi, "codebook must round-trip exactly")
    val q = codes.filter(col("id") < 3)
    val a = Ann.sq8TopK(codes, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val b = Ann.sq8TopK(lCodes, Ann.sq8EncodeWith(
        emb.filter(col("vec_id") < 3), lLo, lHi), k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(a === b, "loaded index + re-encoded queries must serve identically")
  }

  test("SearchIO: saved+loaded BM25 index serves bit-identical rankings") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val queries = Seq((1L, "hash join merge"), (2L, "window agg sort stream"))
      .toDF("query_id", "query_text")
    val built = graft.pipeline.TextAnalysis.buildBm25Index(corpus)
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    graft.sources.SearchIO.save(built, dir)
    val loaded = graft.sources.SearchIO.load(spark, dir)
    def run(ix: graft.pipeline.TextAnalysis.Bm25Index) =
      graft.pipeline.TextAnalysis.bm25Query(ix, queries, topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val a = run(built)
    assert(a === run(loaded), "loaded index must serve the same rankings")
    // one-call form == split form (text_bm25's oracle covers the math)
    val c = graft.pipeline.TextAnalysis.bm25Search(corpus, queries, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(c === a)
    assert(a.nonEmpty)
  }

  test("decontaminateBloom == decontaminate exactly (FPs killed by the verify join)") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = corpus.filter(col("doc_id") < 20)
    val rest = corpus.filter(col("doc_id") >= 20)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_hits")).toMap
    val exact = m(Dedup.decontaminate(rest, bench, n = 5))
    // a deliberately high fpp floods the prefilter with false positives;
    // the exact verify join must still reduce to the same answer
    assert(m(Dedup.decontaminateBloom(rest, bench, n = 5, fpp = 0.5)) === exact)
    assert(m(Dedup.decontaminateBloom(rest, bench, n = 5, fpp = 0.01)) === exact)
    assert(exact.nonEmpty)
  }

  test("kCore: triangle survives the 2-core, tails and chains peel away") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L), (6L, 7L))
      .toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the densest structure empties the core
    assert(Graph.kCore(edges, k = 3).count() === 0L)
  }

  test("labelPropagation: bridge between dense communities does not merge them") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(out(1L), out(2L), out(3L)).size === 1, s"left triangle: $out")
    assert(Set(out(4L), out(5L), out(6L)).size === 1, s"right triangle: $out")
    assert(out(1L) !== out(4L), s"bridge must not merge communities: $out")
    // deterministic under repartitioning
    val again = Graph.labelPropagation(edges.repartition(5), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === out)
  }

  test("kmeansDataflow: counts partition the corpus; partitioning-invariant; real update") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rpt = Ann.kmeansReport(emb, k = 4, iters = 2).cache()
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .first().getInt(0)
    assert(rpt.count() === 4L * dim)
    // each cell reports ONE count; counts partition the corpus exactly
    val counts = rpt.groupBy("cell").agg(
      org.apache.spark.sql.functions.first(col("n_vectors")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set(0L, 1L, 2L, 3L))
    assert(counts.values.sum === emb.count())
    // the two Lloyd iterations moved the centroids off the init pick
    val rpt0 = Ann.kmeansReport(emb, k = 4, iters = 0)
    val moved = rpt.select(col("cell"), col("pos"), col("c_val").as("a"))
      .join(rpt0.select(col("cell"), col("pos"), col("c_val").as("b")),
        Seq("cell", "pos"))
      .filter(col("a") =!= col("b")).count()
    assert(moved > 0, "iters = 2 must move centroids off the init pick")
    // the decimal-sum mean is partitioning-invariant (bit-equal, not ~=)
    val rptShuffled = Ann.kmeansReport(emb.repartition(13), k = 4, iters = 2)
    assert(rpt.except(rptShuffled).isEmpty && rptShuffled.except(rpt).isEmpty)
    rpt.unpersist()
  }

  test("silhouetteReport: tight planted clusters score near 1, invariant") {
    import spark.implicits._
    // two far-apart tight blobs in 4-d; any 2-means split of them is
    // near-perfect, so the centroid silhouette must be close to 1
    val pts = (0 until 16).map { i =>
      val c = if (i % 2 == 0) 0.0f else 100.0f
      val eps = (i / 2) * 0.01f
      (i.toLong, Array(c + eps, c - eps, c + eps, c))
    }
    val emb = pts.toDF("vec_id", "embedding")
    val rpt = Ann.silhouetteReport(emb, k = 2, iters = 2).collect()
    assert(rpt.map(_.getAs[Long]("n_vectors")).sum === 16L)
    rpt.foreach { r =>
      assert(r.getAs[Double]("mean_silhouette") > 0.99,
        s"tight separated blobs must score ~1: $r") }
    // partitioning invariance (the DECIMAL-sum mean): bit-equal
    val again = Ann.silhouetteReport(emb.repartition(7), k = 2, iters = 2)
      .collect().toSet
    assert(again === rpt.toSet)
  }

  test("kmeansDataflow: empty cell keeps its previous centroid, reports 0") {
    import spark.implicits._
    // 4 identical vectors: both init centroids coincide, every point ties
    // to the lower cell -> cell 1 goes empty and must keep its centroid
    val emb = Seq(
      (0L, Array(1.0f, 2.0f)), (1L, Array(1.0f, 2.0f)),
      (2L, Array(1.0f, 2.0f)), (3L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val rpt = Ann.kmeansReport(emb, k = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    assert(rpt((0L, 0L)) === ((1.0, 4L)) && rpt((0L, 1L)) === ((2.0, 4L)))
    assert(rpt((1L, 0L)) === ((1.0, 0L)) && rpt((1L, 1L)) === ((2.0, 0L)))
  }

  test("recallReport: per-query hit fraction, zero-hit queries still report") {
    import spark.implicits._
    val exact = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 7L), (1L, 8L))
      .toDF("query_id", "id")
    val approx = Seq((0L, 2L), (0L, 3L), (0L, 9L)) // query 1 missed entirely
      .toDF("query_id", "id")
    val out = Ann.recallReport(exact, approx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(0L) === ((2L, 0.666667)))
    assert(out(1L) === ((0L, 0.0)))
  }

  test("containment: asymmetric — embedded doc scores 1.0 forward, < 1 backward") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (0L, a),                                          // fully inside 1
      (1L, a + " eta theta iota kappa lambda mu nu xi"),
      (2L, "unrelated words entirely here now")).toDF("doc_id", "text")
    val out = Dedup.containment(docs, shingleSize = 3, threshold = 0.2,
      maxDocFreq = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // S(0) = 4 shingles, all shared; S(1) = 12 shingles, 4 shared
    assert(out((0L, 1L)) === ((4L, 1.0)))
    assert(out((1L, 0L)) === ((4L, 0.333333)))
    assert(!out.keys.exists { case (x, y) => x == 2L || y == 2L })
    // the maxDocFreq cut removes corpus-wide shingles from BOTH sides
    val none = Dedup.containment(docs, shingleSize = 3, threshold = 0.2,
      maxDocFreq = 1)
    assert(none.count() === 0L, "df-capped shingles must not generate pairs")
  }

  test("duplicatedSpans: planted copies resolve to exact offsets") {
    import spark.implicits._
    val aToks = (0 until 30).map(i => s"w$i")
    val a = aToks.mkString(" ")
    // B copies A[5..20] (16 tokens) at its own offset 3
    val b = (Seq("x0", "x1", "x2") ++ aToks.slice(5, 21) ++ Seq("y0", "y1"))
      .mkString(" ")
    // C shares two DISJOINT 8-token spans of A (different diagonals)
    val c = (aToks.slice(0, 8) ++ Seq("z0", "z1", "z2", "z3") ++
      aToks.slice(20, 28)).mkString(" ")
    val d = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(d, k = 4, minSpanTokens = 4,
      maxDocFreq = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(out === Set((1L, 2L, 5L, 3L, 16L),
      (1L, 3L, 0L, 0L, 8L), (1L, 3L, 20L, 12L, 8L)),
      s"got $out")
    // df cap: every anchor gram lives in 2 docs, cap at 1 bars them all
    assert(Dedup.duplicatedSpans(d, k = 4, minSpanTokens = 4,
      maxDocFreq = 1).count() === 0L)
    // the span floor prunes the short pair but keeps the long one
    val floored = Dedup.duplicatedSpans(d, k = 4, minSpanTokens = 10,
      maxDocFreq = 10).collect()
    assert(floored.map(_.getLong(4)).toSeq === Seq(16L))
  }

  test("duplicatedSpanScrub: merges overlapping intervals, digests survivors") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val aToks = (0 until 30).map(i => s"w$i")
    val a = aToks.mkString(" ")
    // C shares A[0..7] and A[20..27] -> two DISJOINT excisions
    val c = (aToks.slice(0, 8) ++ Seq("z0", "z1", "z2", "z3") ++
      aToks.slice(20, 28)).mkString(" ")
    // D copies A[0..16]; its (C,D) span [0..7] NESTS inside the (A,D)
    // span [0..16] -> the two intervals must merge to ONE
    val dTxt = (aToks.slice(0, 17) ++ Seq("q0", "q1", "q2", "q3")).mkString(" ")
    val df = Seq((1L, a), (3L, c), (4L, dTxt)).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanScrub(df, k = 4, minSpanTokens = 8,
      maxDocFreq = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(out.keySet === Set(3L, 4L), s"got $out")
    assert(out(3L) === ((2L, 16L, md5hex("z0 z1 z2 z3"))))
    assert(out(4L) === ((1L, 17L, md5hex("q0 q1 q2 q3"))))
  }

  test("duplicatedSpanScrub: many disjoint intervals per doc scan tokens once") {
    import spark.implicits._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // a heavily-copied doc: B carries TEN disjoint 8-token spans of A,
    // each followed by two unique filler tokens — the shape the former
    // tokens × intervals join multiplied on
    val aToks = (0 until 100).map(i => s"w$i")
    val bToks = (0 until 10).flatMap(j =>
      aToks.slice(10 * j, 10 * j + 8) ++ Seq(s"f${2 * j}", s"f${2 * j + 1}"))
    val df = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanScrub(df, k = 4, minSpanTokens = 8,
      maxDocFreq = 10).collect()
    assert(out.length === 1 && out.head.getLong(0) === 2L)
    assert(out.head.getLong(1) === 10L, s"expected 10 merged intervals: $out")
    assert(out.head.getLong(2) === 80L)
    val fillers = (0 until 20).map(i => s"f$i").mkString(" ")
    assert(out.head.getString(3) === md5hex(fillers),
      "survivor digest must be the fillers in token order")
  }

  test("unigram tokenizer: Viterbi picks the best path, ties to shortest last piece") {
    import graft.pipeline.Unigram
    // multi-char piece strictly better: "ab" (-1.5) beats a+b (-2)
    val m1 = Unigram.Model(Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.5), 4)
    assert(Unigram.segment("ab", m1) === Seq("ab"))
    assert(Unigram.segment("aab", m1) === Seq("a", "ab"))
    // exact tie (a+b = -2 == ab = -2): smallest last-piece k wins
    val m2 = Unigram.Model(Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0), 4)
    assert(Unigram.segment("ab", m2) === Seq("a", "b"))
    // OOV char in SERVED text: advances as a single unknown piece
    // instead of freezing the backtrack
    assert(Unigram.segment("axb", m2) === Seq("a", "x", "b"))
    // training end-to-end: a frequent word becomes a whole piece
    import spark.implicits._
    val docs = Seq.tabulate(40)(i => (i.toLong, "spark sql " + s"w$i"))
      .toDF("doc_id", "text")
    val out = Unigram.train(docs, seedSize = 50, rounds = 2,
      maxWordLen = 12, maxPieceLen = 4, reportK = 20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("park") || out.contains("spar"),
      s"frequent word should yield a long piece: $out")
    // deterministic under repartitioning
    val again = Unigram.train(docs.repartition(7), seedSize = 50, rounds = 2,
      maxWordLen = 12, maxPieceLen = 4, reportK = 20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === out)
  }

  test("trigram LM: stupid-backoff chain, hand-checked") {
    import spark.implicits._
    // salt "s3" at rate 0.5: doc 1 hashes below the threshold (train),
    // doc 2 above (score) — verified md5 prefixes 136b904f / a860868d
    val d = Seq((1L, "a b c a b d"), (2L, "a b c x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmPerplexityTrigram(d, addK = 0.1, alpha = 0.4,
      trainRate = 0.5, salt = "s3").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("doc_id") === 2L)
    assert(r.getAs[Long]("n_trigrams") === 2L)
    assert(r.getAs[Long]("n_backoff") === 1L)
    // (a,b,c) known: c123/c12 = 1/2; (b,c,x): trigram AND (c,x) bigram
    // AND unigram x all unseen -> alpha^2 * k / (N + k*V) with
    // N=6 train tokens, V=4
    val s1 = 1.0 / 2.0
    val s2 = 0.4 * 0.4 * (0.0 + 0.1) / (6.0 + 0.1 * 4.0)
    val exp6 = BigDecimal(math.exp(-(math.log(s1) + math.log(s2)) / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ppl") === exp6)
    // middle rung: (c,a,x2) where (a,x2) unseen but... exercise the
    // bigram backoff with a score doc whose trigram is new but whose
    // suffix bigram (a,b) is trained: alpha * c23/c2 = 0.4 * 2/2
    val d2 = Seq((1L, "a b c a b d"), (2L, "c a b"))
      .toDF("doc_id", "text")
    val r2 = TextAnalysis.lmPerplexityTrigram(d2, addK = 0.1, alpha = 0.4,
      trainRate = 0.5, salt = "s3").collect().head
    // (c,a,b) IS a trained trigram here, so use a doc where it isn't:
    // "d a b" -> trigram (d,a,b) unseen (train has no 'd a'), suffix
    // bigram (a,b) seen with c23=2, c2=c(a)=2
    val d3 = Seq((1L, "a b c a b d"), (2L, "d a b")).toDF("doc_id", "text")
    val r3 = TextAnalysis.lmPerplexityTrigram(d3, addK = 0.1, alpha = 0.4,
      trainRate = 0.5, salt = "s3").collect().head
    assert(r3.getAs[Long]("n_backoff") === 1L)
    val sMid = 0.4 * 2.0 / 2.0
    val expMid = BigDecimal(math.exp(-math.log(sMid) / 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r3.getAs[Double]("ppl") === expMid)
    assert(r2.getAs[Long]("n_backoff") === 0L, "c a b is a trained trigram")
  }

  test("Kneser-Ney LM: interpolated discount + continuation, hand-checked") {
    import spark.implicits._
    // same salt/id trick as the trigram test: doc 1 trains, doc 2 scores
    // train "a b c a b d": c12 (a,b)=2 (b,c)=1 (c,a)=1 (b,d)=1, B=4, V=4
    // ctx a:(2,1) b:(2,2) c:(1,1); cont b=1 c=1 a=1 d=1
    val d = Seq((1L, "a b c a b d"), (2L, "a b c x")).toDF("doc_id", "text")
    val r = TextAnalysis.lmPerplexityKneserNey(d, discount = 0.75,
      addK = 0.1, trainRate = 0.5, salt = "s3").collect().head
    assert(r.getAs[Long]("doc_id") === 2L)
    assert(r.getAs[Long]("n_bigrams") === 3L)
    assert(r.getAs[Long]("n_unseen_ctx") === 0L)
    def pc(nBefore: Double) = (nBefore + 0.1) / (4.0 + 0.1 * 4.0)
    val p1 = math.max(2.0 - 0.75, 0.0) / 2.0 + (0.75 * 1.0 / 2.0) * pc(1.0)
    val p2 = math.max(1.0 - 0.75, 0.0) / 2.0 + (0.75 * 2.0 / 2.0) * pc(1.0)
    val p3 = math.max(0.0 - 0.75, 0.0) / 1.0 + (0.75 * 1.0 / 1.0) * pc(0.0)
    val exp6 = BigDecimal(math.exp(
        -(math.log(p1) + math.log(p2) + math.log(p3)) / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ppl") === exp6)
    // unseen context: 'd' never starts a train bigram -> pure
    // continuation Pc(a) = 1.1/4.4 = 0.25 exactly -> ppl 4.0
    val d2 = Seq((1L, "a b c a b d"), (2L, "d a")).toDF("doc_id", "text")
    val r2 = TextAnalysis.lmPerplexityKneserNey(d2, discount = 0.75,
      addK = 0.1, trainRate = 0.5, salt = "s3").collect().head
    assert(r2.getAs[Long]("n_unseen_ctx") === 1L)
    assert(r2.getAs[Double]("ppl") === 4.0)
  }

  test("assortativity: star -1, zero-variance triangle 0, integer moments") {
    import spark.implicits._
    // star: hub deg 5 vs leaf deg 1 on every edge -> perfect
    // disassortativity
    val star = (101L to 105L).map(l => (100L, l)).toDF("src", "dst")
    val s = Graph.assortativity(star).collect().head
    assert(s.getLong(0) === 10L) // both orientations
    assert(s.getDouble(1) === -1.0)
    // triangle: every endpoint deg 2 -> zero variance -> guarded 0.0
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.assortativity(tri).collect().head.getDouble(1) === 0.0)
  }

  test("hashEmbed: unit norm, single-token doc, partition-stable") {
    import spark.implicits._
    val d = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.hashEmbed(d, dims = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(!rows.exists(_._1 == 2L), "blank doc must be excluded")
    val norms = rows.groupBy(_._1).view.mapValues(
      _.map(v => v._3 * v._3).sum).toMap
    norms.foreach { case (id, n2) =>
      assert(math.abs(n2 - 1.0) < 1e-4, s"doc $id norm^2 $n2") }
    val solo = rows.filter(_._1 == 1L)
    assert(solo.length === 1 && math.abs(solo.head._3.abs - 1.0) < 1e-9,
      s"single-token doc is a unit one-hot: ${solo.toSeq}")
    val again = TextAnalysis.hashEmbed(d.repartition(5), dims = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(again.sortBy(t => (t._1, t._2)).toSeq ===
      rows.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("burstiness: even token disperses 0, single-source template disperses high") {
    import spark.implicits._
    // "the": 3 per source -> mean 3, var 0, dispersion 0
    // "tmpl": 6 in src a only -> per-source counts {6, 0}, mean 3,
    // var = 36/2 - 9 = 9, dispersion 3
    val d = Seq(
      (0L, "a", "the x the y the tmpl tmpl tmpl tmpl tmpl tmpl"),
      (1L, "b", "the u the v the w")).toDF("doc_id", "source", "text")
    val rows = TextAnalysis.burstiness(d, topN = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows("the") === ((6L, 2L, 0.0)))
    assert(rows("tmpl") === ((6L, 1L, 3.0)))
    // top-N by total: only the two planted heavy tokens survive topN=2
    assert(rows.size === 2)
  }

  test("knScoreStream kernel == batch lmPerplexityKneserNey on a mixed fixture") {
    import spark.implicits._
    val d = (0L until 40L).map { i =>
      (i, if (i % 3 == 0) "a b c a b d x y" else s"a b tok$i c d a b e$i")
    }.toDF("doc_id", "text")
    val batch = TextAnalysis.lmPerplexityKneserNey(d, trainRate = 0.5,
        salt = "knp").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val model = TextAnalysis.trainKnModel(d, trainRate = 0.5, salt = "knp")
    val heldOut = d.filter(!(Sampling.hashPrefix(col("doc_id"), "knp") <
      lit(Sampling.rateThreshold(0.5))))
    val served = graft.streaming.StreamingPipeline
      .knScoreStream(heldOut, model, discount = 0.75, addK = 0.1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(served === batch, "serving kernel must replay the batch plan exactly")
    assert(batch.nonEmpty && served.values.exists(_._2 > 0),
      "fixture must exercise the unseen-context branch")
  }

  test("kcenterSelect: picks cover orthogonal extremes, partition-stable") {
    import spark.implicits._
    // a dense cluster on axis 0 plus singletons on axes 1..3: after the
    // seed, farthest-point must visit each remaining axis before any
    // same-axis near-duplicate (cosine to a picked axis ~1 >> 0)
    val cluster = (0L until 10L).map(i =>
      (i, Array(1.0f, 0.001f * i, 0.0f, 0.0f)))
    val axes = Seq(
      (100L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (102L, Array(0.0f, 0.0f, 0.0f, 1.0f)))
    val emb = (cluster ++ axes).toDF("vec_id", "embedding")
    val picks = Ann.kcenterSelect(emb, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(picks.head._3 === -1.0, "seed carries the sentinel score")
    val ids = picks.map(_._2).toSet
    assert(Set(100L, 101L, 102L).subsetOf(ids - picks.head._2) ||
      Set(100L, 101L, 102L).subsetOf(ids),
      s"orthogonal extremes must be picked before cluster dups: ${picks.toSeq}")
    val again = Ann.kcenterSelect(emb.repartition(7), k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq === picks.toSeq, "selection must be partitioning-independent")
  }

  test("psi: hand-computed two-bin shift, identical distributions -> 0") {
    import spark.implicits._
    // a = {bin0: 2, bin1: 1}, b = {bin0: 1, bin1: 2} with width 10 ->
    // psi = (2/3-1/3)ln2 + (1/3-2/3)ln(1/2) = (2/3)ln2
    val a = Seq(5L, 5L, 15L).toDF("v")
    val b = Seq(5L, 15L, 15L).toDF("v")
    val r = Regression.psi(a, b, "v", binWidth = 10L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 3L, 2L)))
    def term(p: Double, q: Double): BigDecimal =
      BigDecimal((p - q) * math.log(p / q))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val exp = (term(2.0 / 3.0, 1.0 / 3.0) + term(1.0 / 3.0, 2.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === exp)
    assert(Regression.psi(a, a, "v", binWidth = 10L)
      .collect().head.getDouble(3) === 0.0)
  }

  test("mrrReport: first-hit rank, no-hit sentinel") {
    import spark.implicits._
    val exact = Seq((0L, 1, 10L), (0L, 2, 11L), (1L, 1, 20L))
      .toDF("query_id", "rank", "id")
    // q0: first relevant at approx rank 2; q1: no relevant hits
    val approx = Seq((0L, 1, 99L), (0L, 2, 11L), (0L, 3, 10L), (1L, 1, 98L))
      .toDF("query_id", "rank", "id")
    val rows = Ann.mrrReport(exact, approx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(0L) === ((2L, 0.5)))
    assert(rows(1L) === ((0L, 0.0)))
  }

  test("doremiWeights: hard domain upweighted, weights normalized, partition-stable") {
    import spark.implicits._
    val easy = (0L until 8L).map(i => (i, "easy", "the cat sat on the mat again and again"))
    val hard = (8L until 16L).map(i =>
      (i, "hard", s"unique${i}a varied${i}b tokens${i}c every${i}d time${i}e word${i}f"))
    val d = (easy ++ hard).toDF("doc_id", "source", "text")
    val rows = Sampling.doremiWeights(d, addK = 0.1).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows("hard")._1 > rows("easy")._1, s"hard ppl must exceed easy: $rows")
    assert(rows("hard")._2 > rows("easy")._2, s"hard weight must exceed easy: $rows")
    val tot = rows.values.map(_._2).sum
    assert(math.abs(tot - 1.0) < 1e-5, s"weights must normalize: $tot")
    val again = Sampling.doremiWeights(d.repartition(7), addK = 0.1).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(again === rows, "report must be partitioning-independent")
  }

  test("keySkew: planted hot key tops the report with the right salt factor") {
    import spark.implicits._
    // 90 rows of key "hot", 10 distinct cold keys with 1 row each:
    // total=100, n_keys=11, mean load ~9.09 -> hot salt = ceil(90/9.09)=10
    val d = (Seq.fill(90)("hot") ++ (0 until 10).map(i => s"cold$i"))
      .toDF("k")
    val out = Diagnostics.keySkew(d, "k", topK = 3).collect()
    assert(out.length === 3)
    val top = out.head
    assert(top.getAs[Long]("rank") === 1L)
    assert(top.getAs[String]("key") === "hot")
    assert(top.getAs[Long]("n_rows") === 90L)
    assert(top.getAs[Double]("share") === 0.9)
    assert(top.getAs[Long]("salt_factor") === 10L)
    // cold keys report salt factor 1 (no salting needed)
    assert(out(1).getAs[Long]("salt_factor") === 1L)
    // deterministic under repartitioning (exact integer inputs)
    val again = Diagnostics.keySkew(d.repartition(7), "k", topK = 3)
      .collect().toSeq
    assert(again === out.toSeq)
  }

  test("profile: hand-checked per-column stats, nulls counted, strings by length") {
    import spark.implicits._
    val d = Seq(
      (1L, Some("ab"), Some(10.0)),
      (2L, Some("abcd"), None),
      (3L, None, Some(30.0)),
      (3L, Some("ab"), Some(10.0))).toDF("id", "s", "x")
    val out = Diagnostics.profile(d).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(out.keySet === Set("id", "s", "x"))
    val id = out("id")
    assert(id.getAs[Long]("n_rows") === 4L)
    assert(id.getAs[Long]("n_null") === 0L)
    assert(id.getAs[Long]("n_distinct") === 3L)
    assert(id.getAs[Double]("min_v") === 1.0)
    assert(id.getAs[Double]("max_v") === 3.0)
    assert(id.getAs[Double]("mean_v") === 2.25)
    val s = out("s")
    assert(s.getAs[Long]("n_null") === 1L)
    assert(s.getAs[Long]("n_distinct") === 2L)         // "ab", "abcd"
    assert(s.getAs[Double]("min_v") === 2.0)           // length view
    assert(s.getAs[Double]("max_v") === 4.0)
    assert(s.getAs[Double]("mean_v") === BigDecimal(8.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val x = out("x")
    assert(x.getAs[Long]("n_null") === 1L)
    assert(x.getAs[Long]("n_distinct") === 2L)
    // single aggregation pass: exactly one row-proportional scan
    assert(Diagnostics.profile(d.repartition(5)).collect().toSet ===
      out.values.toSet)
  }

  test("confusionReport: hand-checked, never-predicted class is null-safe") {
    import spark.implicits._
    val preds = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "a")).toDF("label", "pred")
    val out = Classify.confusionReport(preds, "label").collect()
      .map(r => r.getString(0) -> r).toMap
    def d(r: org.apache.spark.sql.Row, f: String): Any =
      if (r.isNullAt(r.fieldIndex(f))) null else r.getAs[Double](f)
    val a = out("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((3L, 3L, 2L)))
    assert(d(a, "prec") === 0.666667 && d(a, "rec") === 0.666667
      && d(a, "f1") === 0.666667)
    val b = out("b")
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) === ((2L, 3L, 2L)))
    assert(d(b, "prec") === 0.666667 && d(b, "rec") === 1.0
      && d(b, "f1") === 0.8)
    val c = out("c")
    assert((c.getLong(1), c.getLong(2), c.getLong(3)) === ((1L, 0L, 0L)))
    assert(d(c, "prec") === null && d(c, "rec") === 0.0 && d(c, "f1") === null)
  }

  test("Regression.auc: tie-aware Mann-Whitney, hand-checked") {
    import spark.implicits._
    // pos scores {3,5,5,9}, neg {1,5,7}: U = 1 + 1.5*2 + 3 = 7,
    // AUC = 7/12 = 0.583333 (the two 5-vs-5 ties at half credit)
    val d = Seq((1L, 3L), (1L, 5L), (1L, 5L), (1L, 9L),
      (0L, 1L), (0L, 5L), (0L, 7L)).toDF("y", "s")
    val r = Regression.auc(d, "y", Seq("s")).collect().head
    assert(r.getAs[Long]("n_pos") === 4L)
    assert(r.getAs[Long]("n_neg") === 3L)
    assert(r.getAs[Double]("auc") === 0.583333)
    // partitioning invariance: exact integer arithmetic to the last op
    val again = Regression.auc(d.repartition(5), "y", Seq("s")).collect().head
    assert(again.getAs[Double]("auc") === 0.583333)
    // a single-class label yields null, not an ANSI division error
    val deg = Regression.auc(d.filter($"y" === 1L), "y", Seq("s")).collect().head
    assert(deg.isNullAt(deg.fieldIndex("auc")))
  }

  test("Graph.hits: hand-computed bipartite step, L1 norm, parallel edges add") {
    import spark.implicits._
    // docs d1 {t1:2, t2:1}, d2 {t2:1}; h0 = 1/2 each
    // a1' = {t1: 2*.5 = 1, t2: .5 + .5 = 1} -> a1 = {.5, .5}
    // h1' = {d1: 2*.5 + 1*.5 = 1.5, d2: .5} -> h1 = {.75, .25}
    val edges = Seq(("d1", "t1", 2.0), ("d1", "t2", 1.0),
      ("d2", "t2", 1.0)).toDF("src", "dst", "weight")
    val r1 = Graph.hits(edges, iters = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(r1(("auth", "t1")) - 0.5) < 1e-12)
    assert(math.abs(r1(("auth", "t2")) - 0.5) < 1e-12)
    assert(math.abs(r1(("hub", "d1")) - 0.75) < 1e-12)
    assert(math.abs(r1(("hub", "d2")) - 0.25) < 1e-12)
    // each side stays L1-normalized after more iterations
    val r3 = Graph.hits(edges, iters = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(r3.collect { case (("hub", _), v) => v }.sum - 1.0) < 1e-9)
    assert(math.abs(r3.collect { case (("auth", _), v) => v }.sum - 1.0) < 1e-9)
    // parallel edges accumulate weight before the iterations
    val par = Seq(("d1", "t1", 1.0), ("d1", "t1", 1.0), ("d1", "t2", 1.0),
      ("d2", "t2", 1.0)).toDF("src", "dst", "weight")
    val rp = Graph.hits(par, iters = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val r2 = Graph.hits(edges, iters = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rp.keys == r2.keys &&
      rp.forall { case (k, v) => math.abs(v - r2(k)) < 1e-12 })
  }

  test("Ann.knnClassify: majority vote, (votes DESC, label ASC) tie-break") {
    import spark.implicits._
    // train: labels 0 at x-axis-ish, 1 at y-axis-ish, 2 a far diagonal
    val train = Seq(
      (10L, Array(1.0f, 0.0f), 0L), (11L, Array(0.9f, 0.1f), 0L),
      (12L, Array(0.0f, 1.0f), 1L), (13L, Array(0.1f, 0.9f), 1L),
      (14L, Array(0.7f, 0.7f), 2L)
    ).toDF("vec_id", "embedding", "label")
    // q0 near x-axis: k=3 nearest = {10, 11, 14} -> votes {0:2, 2:1} -> 0
    // q1 at the exact diagonal: k=4 -> 2 + one each of {0,1} at k=5
    val qs = Seq(
      (0L, Array(1.0f, 0.05f), 9L),
      (1L, Array(1.0f, 1.0f), 9L)
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.knnClassify(train, qs, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(0L) === ((0L, 2L, 9L)))
    // q1 k=3: nearest = 14 (cos 1), then 11 and 13 tie at the same
    // float cosine (commutative operand sets) -> one vote per label
    // {0,1,2} -> full tie -> min label 0 with 1 vote
    assert(out(1L) === ((0L, 1L, 9L)))
    // all-way vote tie at k=3 over three labels: (votes DESC, label ASC)
    val t3 = Seq(
      (20L, Array(1.0f, 0.0f), 5L), (21L, Array(0.0f, 1.0f), 3L),
      (22L, Array(0.7f, 0.7f), 4L)
    ).toDF("vec_id", "embedding", "label")
    val qTie = Seq((2L, Array(0.5f, 0.5f), 0L))
      .toDF("vec_id", "embedding", "label")
    val tie = Ann.knnClassify(t3, qTie, k = 3).collect().head
    assert(tie.getLong(1) === 3L && tie.getLong(2) === 1L) // min label wins
  }

  test("TextAnalysis.collocations: hand-computed PMI, min-count cut, top-k") {
    import spark.implicits._
    // "new york" always adjacent (3x); "the" frequent and promiscuous
    val docs = Seq(
      (0L, "new york the city"), (1L, "new york the bay"),
      (2L, "new york"), (3L, "the city the bay")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // corpus: N1 = 14 tokens, N2 = 10 bigrams
    // (new,york): c12=3, c(new)=3, c(york)=3 ->
    //   pmi = ln((3/10)/((3/14)*(3/14))) = ln(0.3/0.0459...) = 1.8755
    val (n, c1, c2, pmi) = out(("new", "york"))
    assert(n === 3L && c1 === 3L && c2 === 3L)
    val expected = BigDecimal(math.log((3.0 / 10.0) /
      ((3.0 / 14.0) * (3.0 / 14.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pmi === expected)
    // hapax pairs cut by minCount: (york,the) occurs twice -> kept;
    // (the,city) twice -> kept; (city,the) once -> dropped
    assert(out.contains(("york", "the")) && out.contains(("the", "city")))
    assert(!out.contains(("city", "the")))
    // the promiscuous "the" pairs score below the tight collocation
    assert(out(("new", "york"))._4 > out(("the", "city"))._4)
  }

  test("Graph.modularity: two triangles + bridge, hand-computed") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} bridged by 3-4: m = 7, m2 = 14;
    // per community: w_in = 6, k = 2+2+3 = 7 ->
    // contribution = 6/14 - (7/14)^2 = 0.178571
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
      .withColumn("weight", lit(1L))
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("vertex", "community")
    val out = Graph.modularity(sym, comm).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (c <- Seq(1L, 4L)) {
      assert(out(c).getLong(1) === 3L)          // n_vertices
      assert(out(c).getLong(2) === 6L)          // w_in (directed count)
      assert(out(c).getLong(3) === 7L)          // k_tot
      assert(out(c).getDouble(4) === 0.178571)
    }
    // a deliberately bad split (everything one community) scores lower
    val one = comm.select(col("vertex"), lit(1L).as("community"))
    val bad = Graph.modularity(sym, one).collect().head
    assert(bad.getDouble(4) === 0.0) // w_in/m2 = 1, (k/m2)^2 = 1
  }

  test("Regression.prCurve: hand-checked points; abTest invariants") {
    import spark.implicits._
    // scores: 5 -> (1 pos, 1 neg), 3 -> (1 pos), 1 -> (1 neg); P = 2
    val d = Seq((5L, 1L), (5L, 0L), (3L, 1L), (1L, 0L)).toDF("s", "y")
    val pr = Regression.prCurve(d, "y", "s").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(pr(5L) === ((1L, 1L, 0.5, 0.5)))
    assert(pr(3L) === ((2L, 1L, 0.666667, 1.0)))
    assert(pr(1L) === ((2L, 2L, 0.5, 1.0)))
    // abTest: 40 users, conversion iff user id is a multiple of 4
    val ev = (0L until 40L).map(u => (u, if (u % 4 == 0) 100.0 else 1.0))
      .toDF("user_id", "value")
    val ab = Regression.abTest(ev, "user_id", col("value") > 50.0)
      .collect().head
    val (na, ca, nb, cb) = (ab.getLong(0), ab.getLong(1),
      ab.getLong(3), ab.getLong(4))
    assert(na + nb === 40L && ca + cb === 10L)
    assert(ab.getDouble(2) > 0.0 && ab.getDouble(5) > 0.0) // p_a, p_b
    assert(!ab.isNullAt(6)) // mixed conversion -> real z
    // degenerate pooled rates give null z, never a division error
    val all = Regression.abTest(ev, "user_id", col("value") > 0.0)
      .collect().head
    assert(all.isNullAt(6))
    val none = Regression.abTest(ev, "user_id", col("value") > 1e9)
      .collect().head
    assert(none.isNullAt(6))
    // deterministic under repartitioning
    val again = Regression.abTest(ev.repartition(7), "user_id",
      col("value") > 50.0).collect().head
    assert(again.toSeq === ab.toSeq)
  }

  test("TextAnalysis.gopherRules: per-rule booleans, hand-checked metrics") {
    import spark.implicits._
    val docs = Seq(
      // 6 words, all alphabetic, 2 distinct stopwords, no symbols
      (0L, "the cat sat in the mat"),
      // symbol-heavy: 2 hashes + one '...' run over 4 words -> 0.75
      (1L, "alpha ## beta ... gamma"),
      // numeric tokens: alpha ratio 1/3
      (2L, "123 456 the"),
      (3L, "   ") // blank
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, minWords = 3, maxWords = 10,
        minStopwords = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val d0 = out(0L)
    assert(d0.getAs[Long]("n_words") === 6L)
    // mean word len: (3+3+3+2+3+3)/6 = 2.833333
    assert(d0.getAs[Double]("mean_word_len") === 2.833333)
    assert(d0.getAs[Long]("n_stop") === 2L) // 'the' counted ONCE, 'in'
    assert(d0.getAs[Boolean]("rule_stop") && d0.getAs[Boolean]("rule_alpha"))
    assert(!d0.getAs[Boolean]("rule_word_len")) // 2.83 < 3.0
    assert(!d0.getAs[Boolean]("keep"))
    val d1 = out(1L)
    // 5 tokens (##, ... are tokens too); 2 hashes + 1 ellipsis over 5
    assert(d1.getAs[Long]("n_words") === 5L)
    assert(d1.getAs[Double]("symbol_ratio") === 0.6)
    assert(!d1.getAs[Boolean]("rule_symbol"))
    val d2 = out(2L)
    assert(d2.getAs[Double]("alpha_ratio") === 0.333333)
    assert(!d2.getAs[Boolean]("rule_alpha"))
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_words") === 0L &&
      d3.getAs[Double]("mean_word_len") === 0.0 &&
      !d3.getAs[Boolean]("keep"))
  }

  test("Ann.mmrSelect: redundancy penalized, pure-relevance round 1") {
    import spark.implicits._
    val q = Array(1.0f, 0.0f)
    // a and b are identical (rel ~.95); c is less relevant (~.9) but
    // diverse; d nearly irrelevant
    val emb = Seq(
      (1L, Array(0.95f, 0.312f)), (2L, Array(0.95f, 0.312f)),
      (3L, Array(0.9f, -0.436f)), (4L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.mmrSelect(emb, q, k = 3, lambda = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: best relevance, tie (1 == 2) broken by id -> 1
    assert(out(1L) === 1L)
    // round 2: the exact duplicate 2 has maxsim 1 -> score .5(rel-1) < 0;
    // diverse 3 scores .5(rel - sim(3,1)) > 0 -> 3 before 2
    assert(out(2L) === 3L && out(3L) === 2L)
    // a greedy pass over fewer candidates than k must fail loudly
    intercept[IllegalArgumentException] {
      Ann.mmrSelect(emb, q, k = 5, lambda = 0.5).collect()
    }
  }

  test("Ann.groupCentroidSim: identical groups cosine 1, orthogonal 0") {
    import spark.implicits._
    val emb = Seq(
      ("a", Array(1.0f, 0.0f)), ("a", Array(3.0f, 0.0f)),
      ("b", Array(2.0f, 0.0f)),
      ("c", Array(0.0f, 1.0f)), ("c", Array(0.0f, 5.0f))
    ).toDF("g", "embedding")
    val out = Ann.groupCentroidSim(emb, "g").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // ordered pairs only, g_a < g_b, no self-pairs
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(math.abs(out(("a", "b")) - 1.0) < 1e-12) // same direction
    assert(math.abs(out(("a", "c"))) < 1e-12)       // orthogonal
    assert(math.abs(out(("b", "c"))) < 1e-12)
  }

  test("TextAnalysis.charEntropy: uniform ln d, constant 0, blank sentinel") {
    import spark.implicits._
    val df = Seq(
      (0L, "abcd"),        // 4 distinct chars once each -> H = ln 4
      (1L, "aaaa"),        // one char -> H = 0
      (2L, "AA  aa"),      // normalizes to "aa aa": n_a=4, n_sp=1, N=5
      (3L, "")             // blank -> zeros + sentinel
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) === ((4L, 4L, math.rint(math.log(4) * 1e6) / 1e6)))
    assert(out(1L) === ((4L, 1L, 0.0)))
    val h2 = math.log(5) - (4 * math.log(4)) / 5
    assert(out(2L)._1 === 5L && out(2L)._2 === 2L)
    assert(math.abs(out(2L)._3 - h2) < 1e-6)
    assert(out(3L) === ((0L, 0L, -1.0)))
  }

  test("Dedup.fuzzyEditPairs: exact dist 0, near dup small, threshold drops") {
    val pairs = Dedup.fuzzyEditPairs(docsDF, maxDist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(pairs((0L, 1L)) === ((0L, 1.0)))
    // "jumps" -> "jumped": substitute s->e, insert d = distance 2
    assert(pairs((0L, 2L))._1 === 2L && pairs((1L, 2L))._1 === 2L)
    assert(pairs((0L, 2L))._2 > 0.9)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
    // tightening the threshold drops the distance-2 pair, keeps exact
    val tight = Dedup.fuzzyEditPairs(docsDF, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.contains((0L, 1L)) && !tight.contains((0L, 2L)))
  }

  test("Dedup.fuzzyEditPairs: prefix cap bounds the comparison window") {
    import spark.implicits._
    // identical 40-char prefix, one token differing past the cap (so the
    // full-text simhash bands still collide): distance 0 WITHIN the cap,
    // nonzero without it
    val base = "aaaa bbbb cccc dddd aaaa bbbb cccc dddd "
    val df = Seq(
      (0L, base + "eeee ffff gggg hhhh eeee ffff zzz"),
      (1L, base + "eeee ffff gggg hhhh eeee ffff yyy")).toDF("doc_id", "text")
    val capped = Dedup.fuzzyEditPairs(df, maxDist = 4, prefixLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped.get((0L, 1L)).contains(0L))
    val uncapped = Dedup.fuzzyEditPairs(df, maxDist = 4, prefixLen = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(uncapped((0L, 1L)) === 3L)
  }

  test("Bpe.fertilityBySource: exact integer counts, merge shrinks fertility") {
    import spark.implicits._
    val df = Seq(("s1", "ab ab"), ("s2", "abc")).toDF("source", "text")
    // no merges: every word splits to chars + </w>
    val plain = Bpe.fertilityBySource(df, Seq.empty)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(plain("s1") === ((2L, 6L, 4L, 3.0)))  // 2x "ab" -> (a,b,</w>)
    assert(plain("s2") === ((1L, 4L, 3L, 4.0)))  // "abc" -> (a,b,c,</w>)
    // one merge (a,b): "ab" -> (ab, </w>) = 2 pieces, "abc" -> (ab, c, </w>)
    val merged = Bpe.fertilityBySource(df, Seq(("a", "b")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    assert(merged("s1") === ((2L, 4L, 2.0, 1.0)))
    assert(merged("s2") === ((1L, 3L, 3.0, 1.0)))
  }

  test("Dedup.sourceOverlap: identical 1.0, disjoint 0.0, sketch==exact at full k") {
    import spark.implicits._
    val df = Seq(
      ("a", "w x y z w x"), ("b", "w x y z w x"),   // identical shingle sets
      ("c", "p q r s t u v")                        // disjoint
    ).toDF("source", "text")
    val out = Dedup.sourceOverlap(df, sketchK = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b"))._2 === 1.0 && out(("a", "b"))._3 === 1.0)
    assert(out(("a", "c")) === ((0L, 0.0, 0.0)))
    // sketchK >= |union| makes the KMV estimate exact by construction
    assert(out.values.forall(v => v._2 === v._3))
  }

  test("Dedup.incrementalFuzzyEdit: corpus dup, batch dup, new — with distances") {
    import spark.implicits._
    val index = Dedup.fuzzyEditIndex(Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely different content about spark engines")
    ).toDF("doc_id", "text"))
    val batch = Seq(
      (10L, "the quick brown fox jumped over the lazy dog"), // near corpus 0
      (11L, "la vie est belle et la mer est calme"),          // new
      (12L, "la vie est belle et la mer est calme"),          // dup of 11 in batch
      (13L, "zz yy xx ww vv uu tt ss rr qq pp oo")            // new, unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalFuzzyEdit(index, batch, maxDist = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) === (("dup_of_corpus", 0L, 2L))) // jumps -> jumped = 2 edits
    assert(out(11L) === (("new", -1L, -1L)))
    assert(out(12L) === (("dup_in_batch", 11L, 0L)))
    assert(out(13L) === (("new", -1L, -1L)))
  }

  test("Dedup.noveltyScore: full-copy 0, disjoint 1, short-doc sentinel") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // every 5-gram in pool
      (1L, "one two three four five six seven"),   // fully novel
      (2L, "tiny doc")                             // < n tokens -> sentinel
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScore(corpus, bench, n = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) === ((2L, 2L, 0.0)))
    assert(out(1L) === ((3L, 0L, 1.0)))
    assert(out(2L) === ((0L, 0L, -1.0)))
  }

  test("Ann.filteredTopK ranks inside the slice, not post-filters") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),   // query
      (1L, Array(1.0f, 0.0f), 9),   // nearest overall but filtered OUT
      (2L, Array(0.9f, 0.1f), 1),
      (3L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.filteredTopK(emb, emb.filter(col("vec_id") === 0L), k = 2,
        col("label") === 1)
      .collect().map(r => r.getInt(1).toLong -> r.getLong(2)).toMap
    // rank 1 must be vec 2 (the filtered slice's best), never vec 1
    assert(out(1L) === 2L && out(2L) === 3L)
  }

  test("Diagnostics.quantiles: exact interpolated percentiles per group") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0)).toDF("g", "value")
    val out = Diagnostics.quantiles(df, "value", "g", Seq(0.5, 0.75))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("a") === ((4L, 2.5, 3.25))) // linear interpolation
    assert(out("b") === ((1L, 10.0, 10.0)))
  }

  test("Bpe.fertilityPerDoc rollup == fertilityBySource (stream==batch structural)") {
    import spark.implicits._
    val df = Seq(("s1", "ab ab xyz"), ("s2", "abc q"), ("s3", "")).toDF("source", "text")
    val merges = Seq(("a", "b"), ("ab", Bpe.EndMarker))
    val batch = Bpe.fertilityBySource(df, merges).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = Bpe.fertilityFromPerDoc(Bpe.fertilityPerDoc(df, merges)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch === streamed && batch.size === 2) // s3 has no words
  }
}
