package graft.pipeline

import graft.spark.Tokenize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-operator correctness: probabilistic (LSH) variants are held to
  * their exact counterparts on the fixture corpus — precision must be 1.0
  * (every emitted pair is verified exact), recall asserted against the
  * known near-duplicates.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"
  private lazy val docs = Tokenize.documents(spark, sf)._1.toDF().cache()
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // unblocked exact ground truth: all pairs with true 3-gram jaccard >= 0.7
  private lazy val truth: Set[(Long, Long)] = pairs(
    Dedup.ngramJaccardPairs(docs.withColumn("all", lit("x")), n = 3, minInter = 1,
      blockKey = "all")
      .filter(col("inter_cnt") >= col("union_cnt") * 0.7))

  test("minhash LSH: precision 1.0 and full recall on the fixture's 25 planted pairs") {
    assert(truth.size == 25 && truth.contains((107L, 387L)),
      s"unexpected ground truth: $truth")
    val lsh = pairs(Dedup.minhashLshPairs(docs, tau = 0.7))
    assert(lsh.subsetOf(truth), s"LSH emitted non-duplicates: ${lsh -- truth}")
    assert(lsh == truth, s"LSH missed: ${truth -- lsh}")
  }

  test("simhash finds the strongest near-dups with precision against exact jaccard") {
    val sh = Dedup.simhashPairs(docs, maxHamming = 3)
    val found = pairs(sh)
    assert(found.contains((107L, 387L)), s"simhash missed near-dup: $found")
    // unigram simhash within hamming 3 should overwhelmingly be true dups
    val falsePos = found -- truth
    assert(falsePos.size <= found.size / 2, s"simhash noisy: $falsePos")
  }

  test("connected components: multi-hop chains collapse to min-label clusters") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3: needs >1 propagation round), pair 10-11,
    // triangle 20-21-22, and an isolated pair 30-31
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got == want, s"components wrong: $got")
    // and on the real corpus: every pair's two docs land in one cluster
    val ndocs = docs.withColumn("doc_id", col("doc_id").cast("bigint"))
    val cc = Dedup.connectedComponents(Dedup.minhashLshPairs(ndocs, tau = 0.7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.foreach { case (a, b) =>
      assert(cc(a) == cc(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("connected components equal a union-find oracle on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nV = 30 + rnd.nextInt(40)
      val edges = (0 until rnd.nextInt(60) + 5).map { _ =>
        val a = rnd.nextInt(nV); val b = (a + 1 + rnd.nextInt(nV - 1)) % nV
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.distinct
      // union-find oracle; attaching the larger root under the smaller
      // makes every final root the component minimum
      val parent = Array.tabulate(nV)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial: $got != $want")
    }
  }

  test("benchmark decontamination broadcasts the probe set and excludes benchmark docs") {
    val bench = docs.filter(col("doc_id") % 29 === 0)
    val train = docs.filter(col("doc_id") % 29 =!= 0)
    val hits = Dedup.benchmarkOverlap(train, bench, n = 5, minShared = 1)
    val plan = hits.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"probe set must broadcast, plan:\n$plan")
    val ids = hits.select(col("doc_id").cast("long")).collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(_ % 29 != 0))
    // a doc sharing a 5-gram with a benchmark doc must be flagged: every
    // near-dup pair with one side in the benchmark set implies the other
    // side shares plenty of grams
    truth.foreach { case (a, b) =>
      if (a % 29 == 0 && b % 29 != 0) assert(ids.contains(b), s"missed contaminated $b")
      if (b % 29 == 0 && a % 29 != 0) assert(ids.contains(a), s"missed contaminated $a")
    }
  }

  test("stratified sampling: deterministic, rate-monotone subsets, codegen'd filter") {
    val ndocs = docs.withColumn("doc_id", col("doc_id").cast("bigint"))
    val hi = Sampling.stratified(ndocs, Map("src0" -> 80), defaultPct = 30)
    val lo = Sampling.stratified(ndocs, Map("src0" -> 30), defaultPct = 10)
    def ids(df: DataFrame) = df.select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
    val hiIds = ids(hi)
    assert(ids(hi) == hiIds, "sample must be deterministic across runs")
    assert(ids(lo).subsetOf(hiIds), "lower rates must yield a subset (bucket < p is monotone)")
    // the decision matches the Scala-side hash exactly (codegen path == eval path)
    val kept = docs.select(col("doc_id").cast("long"), col("source"))
      .collect().filter { r =>
        val b = java.lang.Long.remainderUnsigned(Hashing.mix64(r.getLong(0)), 100L)
        b < (if (r.getString(1) == "src0") 80 else 30)
      }.map(_.getLong(0)).toSet
    assert(hiIds == kept, "sample_bucket disagrees with reference hash")
  }

  test("ANN LSH and IVF recall vs brute force") {
    val bf = Similarity.bruteForceTopK(emb, 0L, 10).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(emb, 0L, 10).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val lshRecall = bf.intersect(lsh).size.toDouble / bf.size
    assert(lshRecall >= 0.3, s"LSH recall too low: $lshRecall (bf=$bf lsh=$lsh)")
    val ivf = Similarity.ivfTopK(emb, 0L, 10, nlist = 16, nprobe = 8).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val ivfRecall = bf.intersect(ivf).size.toDouble / bf.size
    assert(ivfRecall >= 0.4, s"IVF recall too low: $ivfRecall (bf=$bf ivf=$ivf)")
    // the shipped (SQL-reproducible) sign-quantizer variant: same structure,
    // comparable recall on this isotropic fixture
    val ivfSign = Similarity.ivfSignTopK(emb, 0L, 10, nlist = 16, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val signRecall = bf.intersect(ivfSign).size.toDouble / bf.size
    assert(signRecall >= 0.4, s"sign-IVF recall too low: $signRecall (bf=$bf got=$ivfSign)")
  }

  test("IVF on-disk index: partition pruning reads only probe cells; results equal in-memory IVF") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    Similarity.ivfSignIndexWrite(emb, dir, nlist = 16, seed = 13L)
    val qEmb = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val fromIndex = Similarity.ivfSignIndexQuery(spark, dir, qEmb, k = 10,
      nlist = 16, nprobe = 4, seed = 13L, excludeVecId = 0L)
    // physical plan must prune at the partition level — a post-scan filter
    // on __cell would read every cell directory at 100 TB
    val plan = fromIndex.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("__cell"), s"expected __cell partition filters, plan:\n$plan")
    val inMem = Similarity.ivfSignTopK(emb, queryId = 0L, k = 10,
      nlist = 16, nprobe = 4, seed = 13L)
    val a = fromIndex.select("vec_id").collect().map(_.getLong(0)).toSeq
    val b = inMem.select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(a == b, s"index query differs from in-memory IVF: $a vs $b")
  }

  test("IVF-SQ8 index: partition pruning + quantized ranking equals the in-memory quantized scan over probe cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_sq8").toString
    Quantize.ivfSq8IndexWrite(emb, dir, nlist = 16, seed = 13L)
    val qEmb = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val fromIndex = Quantize.ivfSq8Query(spark, dir, qEmb, k = 10,
      nlist = 16, nprobe = 4, seed = 13L, excludeVecId = 0L)
    val plan = fromIndex.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("__cell"), s"expected __cell partition filters, plan:\n$plan")
    // the payload schema is the quantized form, not floats
    val idx = spark.read.parquet(dir)
    assert(idx.schema("q").dataType.typeName == "binary" &&
      !idx.columns.contains("embedding"))
    // oracle: restrict the full quantized brute-force ranking to the probe
    // cells' members (computed independently via signDots on the floats)
    val probe = Similarity.signProbeCells(qEmb, nlist = 16, nprobe = 4, seed = 13L)
    val assigned = emb.withColumn("__dots",
        PipelineFunctions.signDots(col("embedding"), 16, 13L))
      .withColumn("__cell",
        (array_position(col("__dots"), array_max(col("__dots"))) - 1).cast("int"))
      .filter(col("__cell").isin(probe.map(Integer.valueOf): _*))
      .select("vec_id", "embedding")
    val expect = Quantize.bruteForceTopKQuantized(assigned, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = fromIndex.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect, s"SQ8 index ranking differs: $got vs $expect")
  }

  test("embedding near-dups: LSH blocking has precision 1.0 vs exact all-pairs") {
    def vpairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("vec_a"), col("vec_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = vpairs(Dedup.embeddingNearDupsExact(emb, tau = 0.5))
    val blocked = vpairs(Dedup.embeddingNearDups(emb, tau = 0.5))
    assert(blocked.subsetOf(exact), s"blocked emitted non-dups: ${blocked -- exact}")
    // measured on this fixture: the sf0.01 pair (169,466) at cos 0.513 is
    // recalled by the default (nBits=8, nTables=12, seed=3) blocking
    assert(blocked == exact, s"recall miss at sf0.01: ${exact -- blocked}")
  }

  test("ngram jaccard inverted-index equals all-pairs array_intersect formulation") {
    val inv = pairs(Dedup.ngramJaccardPairs(docs, n = 3, minInter = 3))
    // independent all-pairs recomputation via array intersection
    val g = docs.filter(col("n_tok") >= 3)
      .select(col("doc_id"), col("source"),
        PipelineFunctions.shingleHashes(col("tokens"), 3).as("grams"))
    val ap = g.alias("a").join(g.alias("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.grams"), col("b.grams"))).as("inter_cnt"))
      .filter(col("inter_cnt") >= 3)
    assert(inv == pairs(ap), "inverted-index result differs from all-pairs")
  }

  test("winnow fingerprints: identical docs share all, near-dups share most") {
    val fp = TextAnalysis.fingerprintPairs(docs, minShared = 2)
    val found = pairs(fp)
    assert(found.contains((107L, 387L)), s"fingerprinting missed near-dup: $found")
    // hot-key cap: capped results are a subset (only ubiquitous-fingerprint
    // evidence is dropped) and the planted near-dup pair survives
    val capped = pairs(TextAnalysis.fingerprintPairs(docs, minShared = 2,
      maxPostings = Some(50)))
    assert(capped.subsetOf(found), "cap must only remove pairs")
    assert(capped.contains((107L, 387L)), "cap dropped a true near-dup")
  }

  test("repetition scores count duplicate n-grams exactly") {
    import spark.implicits._
    val d = Seq(
      ("1", Array.fill(30)(7), 30, "s"),  // one gram repeated 28×
      ("2", (1 to 30).toArray, 30, "s"),  // all grams distinct
      ("3", Array(1, 2), 2, "s")          // shorter than n: filtered out
    ).toDF("doc_id", "tokens", "n_tok", "source")
    val got = TextAnalysis.repetitionScores(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got("1") == ((28L, 1L, true)), s"repeated doc: ${got("1")}")
    assert(got("2") == ((28L, 28L, false)), s"distinct doc: ${got("2")}")
    assert(!got.contains("3"))
  }

  test("langId returns a language for every doc and handles empty text") {
    import spark.implicits._
    val preds = Seq("the cat and the hat", "el que la de y", "", "zz yy xx")
      .toDF("text").select(TextAnalysis.langId(col("text")).as("p"))
      .collect().map(_.getString(0))
    assert(preds(0) == "en", preds.mkString(","))
    assert(preds(1) == "es", preds.mkString(","))
    assert(preds(2) == "und" && preds(3) == "und", preds.mkString(","))
  }

  test("multimodal: batch feature extraction is deterministic and schema-stable") {
    val media = Multimodal.fromDocuments(spark, sf)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.media_id == b.media_id && a.width == b.width && a.feature.sameElements(b.feature)
    })
    val sampled = Multimodal.frameSample(Multimodal.extractFeatures(media), 2, 5)
    assert(sampled.count() == 500)
    val resized = Multimodal.resizePlan(Multimodal.extractFeatures(media), 64)
    assert(resized.filter(col("out_w") > 64 || col("out_h") > 64).count() == 0)
  }

  test("sequence packing: two-level prefix sum equals a sequential scan on skewed random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // skewed: one source carries ~70% of the docs, sparse non-dense ids
    val rows = (0 until 400).map { i =>
      val src = if (rnd.nextInt(10) < 7) "big" else s"s${rnd.nextInt(3)}"
      (src, i.toLong * (1 + rnd.nextInt(3)), 1L + rnd.nextInt(50))
    }.groupBy(_._2).map(_._2.head).toSeq // unique doc_ids
    val df = rows.toDF("source", "doc_id", "n_tok")
    val seqLen = 64
    val got = Packing.pack(df, seqLen, bucketWidth = 16)
      .select("source", "doc_id", "offset", "seq_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // sequential oracle per source in doc_id order
    rows.groupBy(_._1).foreach { case (src, ds) =>
      var off = 0L
      ds.sortBy(_._2).foreach { case (_, id, n) =>
        assert(got((src, id)) == (off, off / seqLen),
          s"doc ($src,$id): got ${got((src, id))}, want ($off, ${off / seqLen})")
        off += n
      }
    }
    // manifest invariant: per-source toks_in sums to the source's token total
    val sums = Packing.packSummary(df, seqLen, bucketWidth = 16)
      .groupBy("source").agg(sum("toks_in").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(sums == want)
  }

  test("vocab top-k: exact counts, deterministic tiebreak, bounded size") {
    val k = 10
    val got = TextAnalysis.vocabTopK(docs, k)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // oracle: full count in Scala from the same token arrays
    val counts = docs.select(explode(col("tokens")).as("t")).groupBy("t").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val want = counts.sortBy { case (t, n) => (-n, t) }.take(k)
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq}, want ${want.toSeq}")
  }

  test("length percentiles: inverse CDF matches a sort-based oracle per source") {
    val got = TextAnalysis.lengthPercentiles(docs, Seq(50, 90, 99))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val lens = docs.select(col("source"), col("n_tok")).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def pct(v: IndexedSeq[Long], k: Int): Long = v(((v.length * k + 99) / 100 - 1).max(0))
    lens.foreach { case (src, v) =>
      val want = (pct(v.toIndexedSeq, 50), pct(v.toIndexedSeq, 90), pct(v.toIndexedSeq, 99))
      assert(got(src) == want, s"$src: got ${got(src)}, want $want")
    }
  }

  test("span dedup: duplicate k-token blocks flagged, first occurrence kept") {
    import spark.implicits._
    val k = 4
    val blkA = Array(1, 2, 3, 4)
    val blkB = Array(5, 6, 7, 8)
    val blkC = Array(9, 9, 9, 9)
    val corpus = Seq(
      // doc 1: blocks A,B — the first occurrences
      ("1", blkA ++ blkB, 8, "s"),
      // doc 2: block A again (flagged blk 0) + fresh C + trailing partial (ignored)
      ("2", blkA ++ blkC ++ Array(42), 9, "s"),
      // doc 3: exact copy of doc 1 — both blocks flagged
      ("3", blkA ++ blkB, 8, "s"),
      // doc 4: shorter than k — contributes nothing
      ("4", Array(1, 2, 3), 3, "s"),
      // doc 5: internal duplicate — second occurrence inside ONE doc flagged
      ("5", blkC ++ blkC, 8, "s")
    ).toDF("doc_id", "tokens", "n_tok", "source")
      .withColumn("doc_id", col("doc_id").cast("bigint"))
    val got = Dedup.spanDuplicates(corpus, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 2 blk 1 (C) is C's FIRST occurrence (doc 2 < doc 5), so doc 5
    // blk 0 and blk 1 are both duplicates of it
    assert(got == Set((2L, 0L), (3L, 0L), (3L, 1L), (5L, 0L), (5L, 1L)), s"got $got")
    // misaligned content is NOT flagged: block identity is positional
    val shifted = Seq(("1", blkA ++ blkB, 8, "s"), ("2", Array(0) ++ blkA ++ Array(0, 0, 0), 8, "s"))
      .toDF("doc_id", "tokens", "n_tok", "source")
      .withColumn("doc_id", col("doc_id").cast("bigint"))
    assert(Dedup.spanDuplicates(shifted, k).count() == 0)
  }

  test("int8 quantization: codes bounded, reconstruction within scale/2, zero vector safe") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(200)(Array.fill(64)((rnd.nextGaussian() * (rnd.nextInt(5) + 1)).toFloat)) :+
      Array.fill(64)(0.0f) :+ Array.fill(7)(1e-30f) :+ Array(3.5f)
    vecs.foreach { v =>
      val s = QuantizeKernel.scaleOf(v)
      val q = QuantizeKernel.quantize(v, s)
      assert(q.length == v.length)
      q.foreach(b => assert(b >= -127 && b <= 127, s"code $b out of range"))
      v.indices.foreach { i =>
        val err = math.abs(v(i).toDouble - q(i) * s)
        assert(err <= s * 0.5 + 1e-12, s"recon err $err > ${s * 0.5} at $i")
      }
      // a vector's own max hits ±127 exactly (full use of the code range)
      if (s > 0) assert(q.map(b => math.abs(b.toInt)).max == 127)
    }
  }

  test("quantized cosine tracks float cosine; quantized ANN top-10 matches float top-10 here") {
    val stats = Quantize.quantizeStats(emb)
    assert(stats.count() == 500)
    assert(stats.filter(!col("recon_ok")).count() == 0)
    // cosine in the code domain vs the float domain, across 500 query-0 pairs
    val both = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qe")).crossJoin(emb.filter(col("vec_id") =!= 0L))
      .select(
        PipelineFunctions.cosineSim(col("embedding"), col("qe")).as("cf"),
        Quantize.cosineSimI8(Quantize.quantizeI8(col("embedding")),
          Quantize.quantizeI8(col("qe"))).as("cq"))
      .select(max(abs(col("cf") - col("cq"))).as("md")).head().getDouble(0)
    assert(both < 0.02, s"quantized cosine drifted: max |Δ| = $both")
    val qTop = Quantize.bruteForceTopKQuantized(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val fTop = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(qTop == fTop, s"quantized top-10 $qTop != float top-10 $fTop")
  }

  test("asymmetric (ADC) scoring: float query against dequantized codes equals symmetric ranking") {
    val qt = Quantize.quantizeTable(emb)
    assert(qt.columns.toSeq == Seq("vec_id", "q", "scale"))
    // storage accounting: 64 code bytes vs 256 float bytes per vector
    val row = qt.select(length(col("q")).as("nb")).agg(max("nb"), min("nb")).head()
    assert(row.getInt(0) == 64 && row.getInt(1) == 64)
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val adc = qt.filter(col("vec_id") =!= 0L).crossJoin(broadcast(qv))
      .select(col("vec_id"),
        PipelineFunctions.cosineSim(
          Quantize.dequantizeI8(col("q"), col("scale")), col("qe")).as("cos"))
      .orderBy(desc("cos"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val sym = Quantize.bruteForceTopKQuantized(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(adc == sym, s"ADC top-10 $adc != symmetric top-10 $sym")
  }

  test("quantization SQL functions equal the column API") {
    graft.query.Graft.install(spark)
    emb.createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT vec_id, dot_i8(quantize_i8(embedding), quantize_i8(embedding)) AS n,
        |       i8_recon_ok(embedding) AS ok,
        |       i8_codes(quantize_i8(embedding)) AS q,
        |       dequantize_i8(quantize_i8(embedding), i8_scale(embedding)) AS d
        |FROM emb_sql""".stripMargin)
    val viaCol = emb.select(col("vec_id"),
      Quantize.dotI8(Quantize.quantizeI8(col("embedding")),
        Quantize.quantizeI8(col("embedding"))).as("n"),
      Quantize.i8ReconOk(col("embedding")).as("ok"),
      Quantize.i8Codes(Quantize.quantizeI8(col("embedding"))).as("q"),
      Quantize.dequantizeI8(Quantize.quantizeI8(col("embedding")),
        Quantize.i8Scale(col("embedding"))).as("d"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }
}
