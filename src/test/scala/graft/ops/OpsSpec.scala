package graft.ops

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  // Synthetic corpus with planted near-duplicates: doc i and i+1000 share
  // most tokens when i % 5 == 0.
  private lazy val docs = {
    val base = (0 until 200).map { i =>
      val words = (0 until 30).map(j => s"w${(i * 31 + j * 7) % 500}")
      (i.toLong, words.mkString(" "))
    }
    val dups = base.collect { case (i, t) if i % 5 == 0 =>
      (i + 1000L, t.split(" ").dropRight(2).mkString(" ") + " extra tail")
    }
    (base ++ dups).toDF("doc_id", "text").cache()
  }

  test("exact dedup: all-null-id groups are dropped, never an all-null row") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (null, "b"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(df, "doc_id", "text").collect()
    assert(kept.length == 1 && kept(0).getLong(0) == 1L &&
      kept(0).getString(1) == "a")
  }

  test("exact dedup: groups and drop keep deterministic representative") {
    val withDup = docs.union(docs.filter($"doc_id" < 3))
    val groups = Dedup.exactGroups(withDup, "doc_id", "text").collect()
    assert(groups.length == 3 && groups.forall(_.getAs[Long]("n") == 2))
    val kept = Dedup.dropExactDuplicates(withDup, "doc_id", "text")
    assert(kept.count() == docs.count())
  }

  test("minhash LSH finds planted near-dups with high recall, verified jaccard") {
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must plant near-dups")
    val found = Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleN = 3, k = 48, bands = 16, threshold = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truth), "no false positives after verify")
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("doc-frequency-capped postings: capped ⊆ exact, planted dups survive") {
    val exact = Dedup.jaccardPairsByPostings(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must plant near-dups")
    // cap just under the max doc frequency (this fixture's shingle df is
    // ~12 median / 19 max): drops only the corpus's hottest shingles
    // (the 100 TB stop-shingle guard)
    val capped = Dedup.jaccardPairsByPostings(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.6, maxDocFreq = Some(18L)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(exact),
      "capping can only UNDERCOUNT intersections — never invent a pair")
    // The PLANTED near-dups (i, i+1000) share ~87% of their shingles, so a
    // ~10%-of-postings cap keeps them comfortably above the threshold.
    // (Marginal pairs sitting right at the threshold may legitimately drop
    // — that is the documented trade of the cap, not a defect.)
    val planted = exact.filter { case (a, b) => b == a + 1000L }
    assert(planted.nonEmpty)
    val recall = planted.count(capped.contains).toDouble / planted.size
    assert(recall >= 0.9, s"planted-dup recall under cap $recall")
    // sanity: an aggressive cap actually drops something somewhere
    val capped1 = Dedup.jaccardPairsByPostings(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.01, maxDocFreq = Some(1L)).count()
    val exact1 = Dedup.jaccardPairsByPostings(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.01).count()
    assert(capped1 < exact1, "cap=1 at threshold~0 must prune pairs")
  }

  test("connected components: exact clusters from a pair list; dropByClusters keeps min id") {
    // components: {1,2,3,8,9} (9-1 bridges the chain), {5,6}; 7 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L), s"got $got")
    // a longer chain exercises multi-round propagation
    val chain = (10L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chainGot = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainGot.values.toSet == Set(10L) && chainGot.size == 21)
    // cluster-level dedup keeps exactly the component representatives
    val df = (1L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val kept = Dedup.dropByClusters(df, pairs, "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 7L), s"kept $kept")
  }

  test("LSH plane count scales with corpus size; more planes shrink max bucket") {
    // planesForCount: log-growth, floored and capped
    assert(Similarity.planesForCount(100) == 4)
    assert(Similarity.planesForCount(1000000, targetBucket = 256) == 12)
    assert(Similarity.planesForCount(1L << 62) == 30)
    assert(Similarity.planesForCount(1000000) >
      Similarity.planesForCount(10000), "planes grow with n")
    // empirical bucket bound: max bucket fraction shrinks as planes grow
    val vecs = (0 until 400).map { i =>
      (i.toLong, (0 until 16).map(d => math.sin(i * 0.37 + d * 1.13).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    def maxBucketFrac(planes: Int): Double = {
      val m = vecs.select(Similarity.lshBucket($"embedding", planes).as("b"))
        .groupBy($"b").count().agg(max($"count")).collect()(0).getLong(0)
      m.toDouble / 400.0
    }
    val f4 = maxBucketFrac(4); val f8 = maxBucketFrac(8)
    assert(f8 < f4, s"max bucket fraction must shrink with planes ($f4 -> $f8)")
  }

  test("simhash banding: exact (no false negatives) for hamming <= 3, sound for any k") {
    val sigs = docs.select($"doc_id",
      GraftFunctions.simhash64(TextOps.tokens($"text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.values.toSeq.distinct.length > 100, "signatures vary")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // ground truth from driver-side signatures
    def truthAt(k: Int) = (for {
      a <- sigs.keys; b <- sigs.keys if a < b && ham(sigs(a), sigs(b)) <= k
    } yield (a, b)).toSet
    // pigeonhole guarantee: 4 bands of 16 bits ⇒ hamming <= 3 pairs MUST
    // share a band → banded result is EXACTLY the truth at k = 3
    val found3 = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found3 == truthAt(3))
    // soundness at any k: found pairs really have hamming <= k
    val found10 = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found10.subsetOf(truthAt(10)))
  }

  test("rolling-hash fingerprint is order-sensitive; set fingerprint is not") {
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text")
    val f = TextAnalysis.fingerprints(df)
      .select($"doc_id", $"fingerprint", $"seq_fingerprint")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(f(1L)._1 == f(2L)._1, "bag-of-words fingerprint ignores order")
    assert(f(1L)._2 != f(2L)._2, "rolling hash is order-sensitive")
    assert(f(1L)._2 == f(3L)._2)
  }

  test("TopKRows ranking equals a driver-side sort oracle (ranks included)") {
    val vecs = (0 until 120).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.91 + d * 0.53).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, df.filter($"vec_id" < 3), 7)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na * nb == 0) 0.0 else dot / (na * nb)
    }
    val byId = vecs.toMap
    (0L until 3L).foreach { q =>
      val want = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cos(byId(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(7).map(_._1)
      want.zipWithIndex.foreach { case (id, i) =>
        assert(got((q, i + 1)) == id, s"query $q rank ${i + 1}")
      }
    }
  }

  test("brute-force cosine topk is exact; LSH topk has decent recall") {
    val vecs = (0 until 300).map { i =>
      val v = (0 until 16).map(d =>
        math.sin(i * 0.37 + d * 1.13).toFloat + (if (i % 50 == 0) 0f else 0f))
      (i.toLong, v.toArray)
    }.toDF("vec_id", "embedding").cache()
    val queries = vecs.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(vecs, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 50)
    val approx = Similarity.lshTopK(vecs, queries, 10, planes = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"lsh recall $recall")
    // exact near-dup pairs: bucketed result ⊆ exhaustive result
    val lshPairs = Similarity.cosineNearDups(vecs, 0.95, planes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = Similarity.cosineNearDupsExact(vecs, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshPairs.subsetOf(exactPairs))
  }

  test("LSH topk with one plane + multi-probe is EXACT (the q76 oracle bridge)") {
    // planes=1 → the probe list {bucket, bucket^1} covers both possible
    // buckets, so the bucketed scan is exhaustive and must reproduce
    // brute-force top-k including rank order and tie-breaks.
    val vecs = (0 until 300).map { i =>
      (i.toLong, (0 until 16).map(d => math.sin(i * 0.37 + d * 1.13).toFloat).toArray)
    }.toDF("vec_id", "embedding").cache()
    val queries = vecs.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(vecs, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val oneplane = Similarity.lshTopK(vecs, queries, 10, planes = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(oneplane == exact, "1-plane multi-probe LSH must equal brute force")
  }

  test("IVF topk: deterministic index, decent recall, subset soundness") {
    val vecs = (0 until 300).map { i =>
      (i.toLong, (0 until 16).map(d => math.sin(i * 0.37 + d * 1.13).toFloat).toArray)
    }.toDF("vec_id", "embedding").cache()
    val queries = vecs.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(vecs, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf1 = Similarity.ivfTopK(vecs, queries, 10, nlist = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf2 = Similarity.ivfTopK(vecs, queries, 10, nlist = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf1 == ivf2, "IVF must be deterministic across runs")
    val recall = exact.intersect(ivf1).size.toDouble / exact.size
    assert(recall >= 0.5, s"ivf recall $recall")
    // full probe (nprobe = nlist) degenerates to exact brute force
    val full = Similarity.ivfTopK(vecs, queries, 10, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "probing every list must equal brute force")
  }

  test("IVF at the shipped q42 config (nlist=16, dim=64) plans and runs in bounded time") {
    // Round-2 postmortem: an argmin whose expression tree grew exponentially
    // in nlist passed the nlist=8 test above but OOM'd planning at nlist=16.
    // This case pins the SHIPPED shape and puts a hard ceiling on
    // plan-construction + analysis time so a blowup fails fast and red here
    // instead of killing the driver's Verify/Bench runs.
    val vecs = (0 until 500).map { i =>
      (i.toLong, (0 until 64).map(d => math.sin(i * 0.37 + d * 1.13).toFloat).toArray)
    }.toDF("vec_id", "embedding").cache()
    val queries = vecs.filter($"vec_id" < 3)
    val t0 = System.nanoTime()
    // ivfTopK itself runs the bounded index-build jobs (where the round-2
    // blowup lived), so the ceiling covers construction AND final planning.
    val df = Similarity.ivfTopK(vecs, queries, 5, nlist = 16, nprobe = 4)
    df.queryExecution.executedPlan // force analysis + physical planning
    val planSec = (System.nanoTime() - t0) / 1e9
    assert(planSec < 60.0, f"q42-shape build+planning took $planSec%.1f s — expression blowup?")
    val rows = df.collect()
    assert(rows.length == 3 * 5, s"expected 15 ranked rows, got ${rows.length}")
  }

  test("IVF centroids are broadcast data, not plan literals: nlist=1000 plans and runs") {
    // VERDICT r4 #2: the literal-centroid argmin was O(nlist·dim) expression
    // nodes — fine at 16, unanalyzable at the nlist ≈ corpus/clusterSize
    // (10⁵-10⁶) that 100 TB SemDeDup needs. With centroids as a broadcast
    // DataFrame the plan is O(1) in nlist; this pins 1000 inside the same
    // ceiling the nlist=16 case uses.
    val vecs = (0 until 2000).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.37 + d * 1.13).toFloat).toArray)
    }.toDF("vec_id", "embedding").cache()
    val t0 = System.nanoTime()
    val (assigned, centroids) = Similarity.ivfAssign(vecs, nlist = 1000, iters = 1)
    assigned.queryExecution.executedPlan // force analysis + physical planning
    val planSec = (System.nanoTime() - t0) / 1e9
    assert(planSec < 60.0, f"nlist=1000 build+planning took $planSec%.1f s")
    assert(centroids.count() == 1000L)
    val a = assigned.collect()
    assert(a.length == 2000)
    val clusters = a.map(_.getInt(2))
    assert(clusters.forall(c => c >= 0 && c < 1000))
    assert(clusters.distinct.length > 500, "assignment collapsed — argmin broken")
  }

  test("cosineNearDups maxBucket guard: capped ⊆ uncapped ⊆ exact; pileup still pairs") {
    // 60 IDENTICAL embeddings (an exact-duplicate pileup LSH can never
    // split — every one lands in the same bucket) + 40 spread vectors.
    val pile = (0 until 60).map(i =>
      (i.toLong, (0 until 8).map(d => (d + 1).toFloat / 8f).toArray))
    val rest = (60 until 100).map(i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.91 + d * 1.7).toFloat).toArray))
    val vecs = (pile ++ rest).toDF("vec_id", "embedding").cache()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineNearDupsExact(vecs, 0.99))
    val uncapped = pairs(Similarity.cosineNearDups(vecs, 0.99, planes = 4))
    val capped = pairs(Similarity.cosineNearDups(vecs, 0.99, planes = 4,
      maxBucket = 8))
    assert(capped.subsetOf(uncapped), "capping must only remove pairs")
    assert(uncapped.subsetOf(exact), "bucketing must only remove pairs")
    // sub-chunking (not dropping) keeps within-chunk pileup pairs alive:
    // 60 identical vectors over ⌈60/8⌉ chunks still collide inside chunks
    val pileIds = (0 until 60).map(_.toLong).toSet
    assert(capped.exists(p => pileIds(p._1) && pileIds(p._2)),
      "identical-embedding pileup lost ALL pairs under the cap")
    // work bound: no chunk exceeds ~maxBucket members, so the capped pair
    // count among pile ids is far below the uncapped 60·59/2
    val cappedPile = capped.count(p => pileIds(p._1) && pileIds(p._2))
    assert(cappedPile < 600, s"cap did not bound pileup pair work ($cappedPile)")
    // a cap larger than any bucket is a no-op
    val wide = pairs(Similarity.cosineNearDups(vecs, 0.99, planes = 4,
      maxBucket = 100000L))
    assert(wide == uncapped)
    // planes=0 → ONE bucket, size < maxBucket → provably exact (the q79
    // oracle bridge): the bucketed machinery must reproduce all-pairs
    val oneBucket = pairs(Similarity.cosineNearDups(vecs, 0.99, planes = 0,
      maxBucket = 100000L))
    assert(oneBucket == exact, "planes=0 cosineNearDups must equal exact")
  }

  test("dropSeenNearDup on the planted corpus keeps exactly the odd groups (q80 bridge)") {
    // texts a pure function of group: even batch groups duplicate the
    // reference (jaccard 1 → dropped), odd carry token-disjoint text
    // (jaccard 0 → kept); survivors are deterministic.
    def planted(prefix: String, id: Long) =
      (0 until 12).map(j => s"$prefix${id % 13}w$j").mkString(" ")
    val ref = (0L until 60L).map(i => (i, planted("g", i))).toDF("doc_id", "text")
    val batch = (0L until 60L).map { i =>
      (i + 1000L, if (i % 13 % 2 == 0) planted("g", i) else planted("h", i))
    }.toDF("doc_id", "text")
    val kept = Dedup.dropSeenNearDup(batch, ref, "doc_id", "text", threshold = 0.6)
      .select($"doc_id").as[Long].collect().toSet
    val expected = (0L until 60L).filter(i => i % 13 % 2 == 1).map(_ + 1000L).toSet
    assert(kept == expected, s"got ${kept.size} vs ${expected.size}")
  }

  test("hash sampling is deterministic, partition-invariant, and splits cleanly") {
    val df = (0L until 5000L).map(i => (i, s"payload $i")).toDF("id", "text")
    val s1 = Sampling.hashSample(df, "id", 20).select($"id").as[Long].collect().toSet
    // repartitioning must not change membership (rand()-based sample would)
    val s2 = Sampling.hashSample(df.repartition(13), "id", 20)
      .select($"id").as[Long].collect().toSet
    assert(s1 == s2, "sample must be a pure function of the data")
    // rate ≈ 1/20 (md5 is uniform; 3σ bound for n=5000, p=0.05)
    assert(s1.size > 160 && s1.size < 340, s"sample size ${s1.size}")
    // split: disjoint, exhaustive, stable as the corpus grows
    val (train, eval) = Sampling.hashSplit(df, "id", evalPermille = 100)
    val tr = train.select($"id").as[Long].collect().toSet
    val ev = eval.select($"id").as[Long].collect().toSet
    assert(tr.intersect(ev).isEmpty && tr.size + ev.size == 5000)
    val (_, evalGrown) = Sampling.hashSplit(
      (0L until 10000L).map(i => (i, s"payload $i")).toDF("id", "text"),
      "id", evalPermille = 100)
    val evG = evalGrown.select($"id").as[Long].collect().toSet
    assert(ev.subsetOf(evG), "membership stable under corpus growth")
  }

  test("multimodal resize updates dims, keeps corrupt rows, deterministic payload") {
    val media = Multimodal.syntheticMedia(spark, 100)
    val r = Multimodal.resize(media, 128, 128)
    assert(r.schema.fieldNames.toSet == media.schema.fieldNames.toSet)
    val rows = r.select($"media_id", $"width", $"height", $"payload").collect()
    assert(rows.length == 100)
    assert(rows.forall(x => x.getInt(1) == 128 && x.getInt(2) == 128))
    // corrupt rows (media_id % 17 == 0 → null payload) pass through as null
    rows.foreach { x =>
      val corrupt = x.getLong(0) % 17 == 0
      assert((x.get(3) == null) == corrupt, s"row ${x.getLong(0)}")
    }
    // deterministic: same input → byte-identical output
    val again = Multimodal.resize(media, 128, 128)
      .select($"media_id", $"payload").collect()
      .map(x => x.getLong(0) -> Option(x.getAs[Array[Byte]](1)).map(_.toSeq)).toMap
    val first = rows.map(x => x.getLong(0) -> Option(x.getAs[Array[Byte]](3)).map(_.toSeq)).toMap
    assert(again == first)
  }

  test("TextProfile single-pass counts ≡ the regex formulation, char by char") {
    // the OLD expression pile (what TextProfile replaced) rebuilt verbatim
    def hits(c: org.apache.spark.sql.Column, pat: String) =
      regexp_count(lower(c), lit(pat))
    val t = col("text")
    val regexSide = Seq(
      size(regexp_extract_all(t, lit("""\S+"""), lit(0))).as("n_tokens"),
      size(regexp_extract_all(lower(t), lit("""[a-z]+"""), lit(0))).as("n_words"),
      size(regexp_extract_all(t, lit("""[^\w\s]"""), lit(0))).as("n_punct"),
      length(regexp_replace(lower(t), lit("""[^a-z]"""), lit(""))).as("n_alpha")) ++
      TextAnalysis.stopwordPatterns.map { case (l, p) =>
        hits(t, p).as(s"sw_$l")
      } :+ size(regexp_extract_all(t,
        lit("""[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"""), lit(0))).as("bpeish_tokens")
    // adversarial fixtures: boundary-adjacent digits/underscores (\b does
    // NOT fire inside a word-char run), stopword prefixes/suffixes, words
    // shared across languages, unicode (non-ASCII is \b-boundary AND
    // [^\w\s]), every ASCII whitespace, empty/blank, mixed case
    val planted = Seq(
      "", " ", "\t\n\f\r", "the", "the the the", "the9 9the _the the_",
      "les lest le-la de,la;un:une", "the-and.is!of?to", "thé café 漢字",
      "The AND iS oF", "a_b c9d __ 99", "de de de", "pour pours spour",
      "von!ist?und.der", "el la los las es de un una que por",
      "w1 w2 w3 ... !!! ???", "x" * 300, ("the " * 50).trim,
      "tab\tsep\nnewlinevtab\fformfeed\rcarriage")
    val rng = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "0123456789_ \t\n\f\r.,;:!?-@#é漢 "
    val fuzz = (0 until 300).map(_ =>
      (0 until rng.nextInt(80)).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = (planted ++ fuzz).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val tp = GraftFunctions.text_profile(t).as("p")
    val fields = (Seq("n_tokens", "n_words", "n_punct", "n_alpha") ++
      TextAnalysis.stopwordPatterns.map("sw_" + _._1)) :+ "bpeish_tokens"
    val slow = df.select(col("doc_id") +: regexSide: _*)
    val fast2 = df.withColumn("p", tp)
      .select(col("doc_id") +: fields.map(f => col("p")(f).as(f)): _*)
    assert(fast2.except(slow).isEmpty && slow.except(fast2).isEmpty,
      "TextProfile diverged from the regex formulation")
    // null text → null counts on both sides
    val nulled = Seq((1L, null: String)).toDF("doc_id", "text")
    val fr = nulled.withColumn("p", tp).select(col("p")("n_tokens")).collect()(0)
    val sr = nulled.select(regexSide.head).collect()(0)
    assert(fr.isNullAt(0) == sr.isNullAt(0))
  }

  test("language id picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog is in the house"),
      (2L, "le chat et le chien est pour la maison"),
      (3L, "der hund und die katze ist von der stadt"),
      (4L, "zzz qqq xxx")).toDF("doc_id", "text")
    val got = TextAnalysis.withLangId(df).select($"doc_id", $"lang_guess")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "und"))
  }

  test("quality + token counts behave on edge cases") {
    val df = Seq((1L, ""), (2L, "word"), (3L, "Hello, world! 123"))
      .toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    assert(q(1L) == 0.0 && q(2L) >= 0.0 && q(3L) > 0.0)
    val t = TextAnalysis.tokenCounts(df).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("ws_tokens"), r.getAs[Int]("bpeish_tokens")))
    assert(t.find(_._1 == 3L).get._2 == 3) // "Hello," "world!" "123"
    assert(t.find(_._1 == 3L).get._3 == 7) // Hello , world ! 1 2 3
  }

  test("pii redact: counts match planted density, redaction removes every match") {
    val pii = graft.alco.Gen.piiDocs(spark, 2000L).cache()
    val r = TextAnalysis.piiRedact(pii).cache()
    // planted residues: every ~3rd doc carries an email, ~4th a phone, ~5th
    // an IP (residues of h, not id, so allow a generous band around 1/k)
    val n = r.count().toDouble
    val emails = r.filter($"n_emails" > 0).count() / n
    val phones = r.filter($"n_phones" > 0).count() / n
    val ips = r.filter($"n_ips" > 0).count() / n
    assert(emails > 0.2 && emails < 0.5, s"email density $emails")
    assert(phones > 0.15 && phones < 0.4, s"phone density $phones")
    assert(ips > 0.1 && ips < 0.35, s"ip density $ips")
    // redacted text has zero residual matches and the right placeholders
    val residual = r.filter(
      col("redacted").rlike(TextAnalysis.EmailPat) ||
        col("redacted").rlike(TextAnalysis.PhonePat) ||
        col("redacted").rlike(TextAnalysis.Ipv4Pat)).count()
    assert(residual == 0, "redaction left a PII match behind")
    val placeholderRows = r.filter($"n_emails" > 0 &&
      !col("redacted").contains("<EMAIL>")).count()
    assert(placeholderRows == 0)
    r.unpersist(); pii.unpersist()
  }

  test("repetition stats: hand-computed dup 3-gram fraction, edge cases") {
    val df = Seq(
      (1L, "a b c a b c a b c"), // 7 grams: abc bca cab abc bca cab abc -> 3 distinct
      (2L, "one two three four"), // 2 grams, both distinct
      (3L, "x y"), // too short -> 0 grams
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df)
      .select($"doc_id", $"n_grams", $"n_distinct_grams", $"dup_gram_frac")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((7, 3, math.rint((1.0 - 3.0 / 7.0) * 1e6) / 1e6)))
    assert(got(2L) == ((2, 2, 0.0)))
    assert(got(3L) == ((0, 0, 0.0)))
    assert(got(4L)._1 == 0 && got(4L)._3 == 0.0)
  }

  test("url domains: counts planted domains only, no duplicates row blowup") {
    val pii = graft.alco.Gen.piiDocs(spark, 2000L)
    val d = TextAnalysis.urlDomainCounts(pii).cache()
    val domains = d.collect().map(_.getString(0))
    assert(domains.nonEmpty && domains.forall(_.matches("""site\d+\.example\.org""")))
    assert(domains.distinct.length == domains.length)
    // every 2nd doc (by hash residue) plants exactly one URL
    val total = d.agg(sum($"n_mentions")).first().getLong(0)
    assert(total > 700 && total < 1300, s"planted-url total $total")
    d.unpersist()
  }

  test("decontamination: planted overlap flagged, clean docs survive") {
    // corpus doc 0 and benchmark share text verbatim; doc 1 shares a 3-gram
    // window; doc 2 shares nothing
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "zz yy alpha beta gamma qq"),
      (2L, "one two three four five")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("bid", "text")
    val flagged = Contamination.flagContaminated(
        corpus, "doc_id", "text", bench, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(0L, 1L))
    assert(flagged(0L) == 3L) // all 3 of its 3-grams
    assert(flagged(1L) == 1L) // the one shared window
    val clean = Contamination.dropContaminated(
      corpus, "doc_id", "text", bench, "text").collect().map(_.getLong(0))
    assert(clean.toSeq == Seq(2L))
    // minHits raises the bar
    assert(Contamination.flagContaminated(corpus, "doc_id", "text",
      bench, "text", minHits = 2).collect().map(_.getLong(0)).toSet == Set(0L))
  }

  test("line dedup: boilerplate removed everywhere, order kept, trim-normalized") {
    val df = Seq(
      (1L, "FOOTER\nunique one\n FOOTER "), // within-doc repeat, padded
      (2L, "FOOTER\nunique two"),
      (3L, "FOOTER \nunique three"),        // trailing space still matches
      (4L, "FOOTER"),                       // fully boilerplate
      (5L, "solo\nlines\nhere")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(df, "doc_id", "text", minDocFreq = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // FOOTER's trim-key appears in docs 1,2,3,4 (freq 4 >= 3) -> boilerplate
    assert(out(1L) == ((3L, 2L, "unique one")))
    assert(out(2L) == ((2L, 1L, "unique two")))
    assert(out(3L) == ((2L, 1L, "unique three")))
    assert(out(4L) == ((1L, 1L, "")))       // doc survives as a row, empty text
    assert(out(5L) == ((3L, 0L, "solo\nlines\nhere"))) // order preserved
    // below-threshold lines all survive
    val none = Dedup.dropBoilerplateLines(df, "doc_id", "text", minDocFreq = 5)
      .filter(col("n_removed") > 0).count()
    assert(none == 0L)
  }

  test("stratified sample: per-stratum rates, determinism, subset of uniform rule") {
    val df = (0 until 4000).map(i =>
      (i.toLong, Seq("a", "b", "c")(i % 3))).toDF("id", "stratum")
    val kept = Sampling.stratifiedSample(df, "id", "stratum",
      Map("a" -> 500, "b" -> 100), defaultPermille = 0).cache()
    val byStratum = kept.groupBy($"stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perStratum = 4000 / 3.0
    assert(math.abs(byStratum("a") / perStratum - 0.5) < 0.08)
    assert(math.abs(byStratum.getOrElse("b", 0L) / perStratum - 0.1) < 0.05)
    assert(!byStratum.contains("c")) // default quota 0 drops the stratum
    // repartitioning must not change membership (pure row function)
    val again = Sampling.stratifiedSample(df.repartition(17), "id", "stratum",
      Map("a" -> 500, "b" -> 100), defaultPermille = 0)
      .collect().map(_.getLong(0)).toSet
    assert(again == kept.collect().map(_.getLong(0)).toSet)
    kept.unpersist()
  }

  test("temperature resample: alpha=0 flattens, alpha=1 natural, saturation, determinism") {
    // skewed corpus: a=3000, b=600, c=60 rows
    val df = (0 until 3660).map { i =>
      (i.toLong, if (i < 3000) "a" else if (i < 3600) "b" else "c")
    }.toDF("id", "domain")
    // alpha=0: equal mass per domain → ~300 each from a and b; c's rate
    // saturates at 1.0 so all 60 rows survive
    val flat = Sampling.temperatureResample(df, "id", "domain",
      alpha = 0.0, targetTotal = 900L).cache()
    val byDom = flat.groupBy($"domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("c") == 60L, s"saturated domain must keep every row: $byDom")
    assert(math.abs(byDom("a") - 300L) < 60, s"a=${byDom("a")}")
    assert(math.abs(byDom("b") - 300L) < 60, s"b=${byDom("b")}")
    // alpha=1: every domain gets the SAME rate T/N — natural proportions
    val nat = Sampling.temperatureResample(df, "id", "domain",
      alpha = 1.0, targetTotal = 366L)
      .groupBy($"domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(nat("a") / 3000.0 - 0.1) < 0.02, s"a rate ${nat("a")}")
    assert(math.abs(nat.getOrElse("b", 0L) / 600.0 - 0.1) < 0.05)
    // membership is a pure row function given the rates: partition-invariant
    val again = Sampling.temperatureResample(df.repartition(17), "id",
      "domain", alpha = 0.0, targetTotal = 900L)
      .select($"id").as[Long].collect().toSet
    assert(again == flat.select($"id").as[Long].collect().toSet)
    flat.unpersist()
    // NULL domain carries no weight: dropped by the equi-join
    val withNull = df.union(Seq((99999L, null.asInstanceOf[String]))
      .toDF("id", "domain"))
    val kept = Sampling.temperatureResample(withNull, "id", "domain",
      alpha = 0.5, targetTotal = 900L)
    assert(kept.filter($"domain".isNull).count() == 0L)
  }

  test("mixture resample: whole epochs exact, fractional mass, drop, determinism") {
    val df = (0 until 3000).map(i =>
      (i.toLong, Seq("a", "b", "c")(i % 3))).toDF("id", "domain")
    val out = Sampling.mixtureResample(df, "id", "domain",
      Map("a" -> 2.0, "b" -> 1.4), defaultEpochs = 0.0).cache()
    val byDom = out.groupBy($"domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // whole weights are EXACT, not statistical: 2 copies of every a row
    assert(byDom("a") == 2000L, s"a=${byDom("a")}")
    assert(out.filter($"domain" === "a").groupBy($"id").count()
      .filter($"count" =!= 2).count() == 0L)
    // fractional weight: every b row >= 1 copy, total ~ 1.4 * 1000
    assert(out.filter($"domain" === "b").select($"id").distinct()
      .count() == 1000L)
    assert(math.abs(byDom("b") - 1400L) < 80, s"b=${byDom("b")}")
    assert(!byDom.contains("c")) // default weight 0 drops the domain
    // copy index is dense 0..copies-1 per row (packing salt contract)
    assert(out.filter($"domain" === "a" && !$"copy".isin(0, 1)).count() == 0L)
    // pure row function: repartitioning preserves the (id, copy) multiset
    val again = Sampling.mixtureResample(df.repartition(17), "id", "domain",
      Map("a" -> 2.0, "b" -> 1.4), defaultEpochs = 0.0)
      .select($"id", $"copy").collect().map(r => (r.getLong(0), r.getInt(1)))
      .toSet
    assert(again == out.select($"id", $"copy").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet)
    out.unpersist()
  }

  test("chunking: coverage, overlap, clamped tail, short and empty docs") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 words
      (2L, "a b"), // shorter than maxTokens -> one chunk
      (3L, "   ")) // whitespace-only -> dropped
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkByTokens(df, "doc_id", "text",
      maxTokens = 4, overlap = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // starts 1,3,5,7 (last start ≤ 10-2): windows of 4, tail clamped
    assert(d1.map(_._3).toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(d1.map(_._4).forall(_ == 4))
    // every token covered, consecutive chunks share exactly `overlap`
    d1.sliding(2).foreach { case Array(a, b) =>
      val sa = a._3.split(" ").toSet; val sb = b._3.split(" ").toSet
      assert(sa.intersect(sb).size == 2)
    }
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2)))
    assert(!chunks.exists(_._1 == 3L))
  }

  test("chunking reconstruction invariant across (maxTokens, overlap) combos") {
    // dropping each chunk's leading `overlap` tokens (except chunk 0) and
    // concatenating must reproduce the doc's exact word sequence — i.e. full
    // coverage, correct order, no token duplicated beyond the overlap
    val rnd = new scala.util.Random(7)
    val docs = (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, (0 until n).map(j => s"w${rnd.nextInt(9)}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    for ((maxT, ov) <- Seq((8, 0), (8, 3), (5, 4), (1, 0), (64, 10))) {
      val chunks = TextOps.chunkByTokens(docs, "doc_id", "text", maxT, ov)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .groupBy(_._1)
      docs.collect().foreach { r =>
        val (id, words) = (r.getLong(0), r.getString(1).split(" ").toSeq)
        val cs = chunks(id).sortBy(_._2).map(_._3.split(" ").toSeq)
        val rebuilt = cs.head ++ cs.tail.flatMap(_.drop(ov))
        assert(rebuilt == words, s"doc $id maxT=$maxT ov=$ov")
        assert(cs.forall(_.size <= maxT))
      }
    }
  }

  test("unigram surprisal: hand-computed tiny corpus, ranking direction") {
    // corpus: "a a b" + "a c" -> counts a=3, b=1, c=1, total=5
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(df, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def lp(c: Int) = -math.log(c / 5.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L) == r6((lp(3) + lp(3) + lp(1)) / 3.0))
    assert(got(2L) == r6((lp(3) + lp(1)) / 2.0))
    // rare-token docs score higher than common-token docs
    assert(got(2L) > got(1L) * 0.9)
  }

  test("semdedup: nlist=1 equals exact pairs; clustered ⊆ exact; deterministic keeper") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until 16).map(d => math.sin(i * 0.37 + d * 1.13).toFloat).toArray)
    }.toDF("vec_id", "embedding").cache()
    val tau = 0.95
    val exactPairs = Similarity.cosineNearDupsExact(vecs, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "fixture must contain semantic near-dups")
    // one cluster = every pair compared: identical to the exact cross join
    val oneCluster = Similarity.semDedupPairs(vecs, tau, nlist = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oneCluster == exactPairs)
    // k-means bucketing can only MISS cross-cluster pairs, never invent
    val clustered = Similarity.semDedupPairs(vecs, tau, nlist = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clustered.subsetOf(exactPairs))
    val recall = clustered.size.toDouble / exactPairs.size
    assert(recall >= 0.5, s"semdedup recall $recall")
    // projection: deterministic, partition-invariant, min-id keepers survive
    val kept1 = Similarity.semDedup(vecs, tau, nlist = 6)
      .select($"vec_id").as[Long].collect().toSet
    val kept2 = Similarity.semDedup(vecs.repartition(13), tau, nlist = 6)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept1 == kept2)
    // some row was dropped; no surviving pair is still near-duplicate
    // (keeper = component MINIMUM, so a pair's min member may itself be
    // dropped when a smaller id lives elsewhere in the same component);
    // rows in no pair are untouched
    assert(kept1.size < 200 && kept1.nonEmpty)
    clustered.foreach { case (a, b) =>
      assert(!(kept1.contains(a) && kept1.contains(b)), s"kept both of ($a,$b)") }
    val inPairs = clustered.flatMap(p => Seq(p._1, p._2))
    assert((0L until 200L).toSet.diff(inPairs).subsetOf(kept1))
    vecs.unpersist()
  }

  test("curate chain: stage-by-stage equality with standalone ops; funnel counts") {
    // 30 docs: ids 0-9 junk (no stopwords, heavy punctuation), 10-19 English,
    // 20-29 French; each English doc duplicated once under id+100
    val junk = (0 until 10).map(i => (i.toLong, s"!!! ??? ### $i%%% &&&"))
    val en = (10 until 20).map(i =>
      (i.toLong, s"the quick fox $i and it is of interest to the reader for sure"))
    val fr = (20 until 30).map(i =>
      (i.toLong, s"le chat $i est un animal et la maison que pour une personne"))
    val dupEn = en.map { case (i, t) => (i + 100L, t) }
    val df = (junk ++ en ++ fr ++ dupEn).toDF("doc_id", "text")
    val cfg = Curate.Config(minQuality = 0.5, langs = Seq("en"),
      samplePermille = 600)
    val out = Curate.curate(df, cfg = cfg).cache()
    // junk filtered by quality, French by language, dup ids by dedup keeper
    val ids = out.select($"doc_id").as[Long].collect().toSet
    assert(ids.forall(i => i >= 10 && i < 20), s"survivors: $ids")
    // survivors = exactly the en docs passing the 600-permille hash rule
    val manual = en.toDF("doc_id", "text")
      .filter(Sampling.hashBucket($"doc_id", 1000) < 600)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == manual)
    // output carries lang_guess + quality_score alongside original columns
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang_guess", "quality_score"))
    assert(out.select($"lang_guess").distinct().as[String].collect().toSeq == Seq("en"))
    // funnel: monotone counts matching each stage
    val f = Curate.funnel(df, cfg = cfg).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("0_input") == 40L)
    assert(f("1_quality") == 30L) // junk dropped (score < 0.5)
    assert(f("2_lang") == 20L)    // french dropped
    assert(f("3_dedup") == 10L)   // en dups collapsed
    assert(f("4_sample") == ids.size.toLong)
    out.unpersist()
  }

  test("incremental dedup: seen content dropped, new kept, near-dup variant catches edits") {
    def baseText(i: Int) =
      (0 until 30).map(j => s"w${(i * 31 + j * 7) % 500}").mkString(" ")
    val batch = Seq(
      (5000L, baseText(0)), (5001L, baseText(1)), (5002L, baseText(2)), // re-arrivals
      (6000L, baseText(5).split(" ").dropRight(2).mkString(" ") + " zq"),  // edits
      (6001L, baseText(10).split(" ").dropRight(2).mkString(" ") + " zq"),
      (7000L, (0 until 30).map(j => s"nv$j").mkString(" ")),              // novel
      (7001L, (0 until 30).map(j => s"nw$j").mkString(" "))
    ).toDF("doc_id", "text")
    // exact: only byte-identical content is "seen"; edits and novels pass
    val kept = Dedup.dropSeenExact(batch, docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(6000L, 6001L, 7000L, 7001L))
    // near-dup: re-arrivals (jaccard 1) AND light edits (shared shingles)
    // are seen; novel docs (zero shared shingles) always survive
    val keptNear = Dedup.dropSeenNearDup(batch, docs, "doc_id", "text",
      threshold = 0.5).select($"doc_id").as[Long].collect().toSet
    assert(keptNear == Set(7000L, 7001L), s"near-dup kept: $keptNear")
    // pure content functions: partition-invariant
    val again = Dedup.dropSeenExact(batch.repartition(7), docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("sequence packing: exact local replay, partition invariance, dense packs") {
    val docs = (0 until 100).map(i => (i.toLong, ("w " * (i % 13 + 1)).trim))
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.packSequences(df, "doc_id", "text",
      tokensPerPack = 16, nShards = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pack"), r.getAs[Long]("n_tokens"))).toSet
    // single-threaded reference: md5-prefix shard, per-shard id-ordered
    // cumulative offsets, pack = floor(start / budget)
    def shardOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 4
    }
    val want = docs.map { case (id, text) =>
      (id, shardOf(id), text.split("\\s+").count(_.nonEmpty).toLong)
    }.groupBy(_._2).flatMap { case (shard, rows) =>
      var off = 0L
      rows.sortBy(_._1).map { case (id, _, n) =>
        val pack = off / 16; off += n; (id, shard, pack, n)
      }
    }.toSet
    assert(got == want)
    // shard/order are pure id functions: repartitioning changes nothing
    val again = TextOps.packSequences(df.repartition(17), "doc_id", "text",
      tokensPerPack = 16, nShards = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pack"), r.getAs[Long]("n_tokens"))).toSet
    assert(again == got)
    // packs are dense: within a shard every pack index up to max appears
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val packs = rows.map(_._3)
      assert((0L to packs.max).toSet == packs,
        s"shard $shard has gaps: $packs")
    }
  }

  test("corpus profile and token histogram match a hand-computed corpus") {
    val df = Seq(
      ("a", "one two three"), ("a", ""),
      ("b", Seq.fill(250)("x").mkString(" "))).toDF("source", "text")
    val prof = Stats.corpusProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof("a").getAs[Long]("n_docs") == 2L)
    assert(prof("a").getAs[Long]("total_tokens") == 3L)
    assert(prof("a").getAs[Double]("mean_tokens") == 1.5)
    assert(prof("a").getAs[Long]("max_tokens") == 3L)
    assert(prof("a").getAs[Long]("total_chars") == 13L)
    assert(prof("b").getAs[Long]("total_tokens") == 250L)
    // histogram: 0-token and 3-token docs in bin 0; 250 tokens clamps into
    // the overflow bin 19 (bin_lo 190)
    val hist = Stats.tokenLengthHistogram(df, binWidth = 10, maxBins = 20)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("bin_lo"), r.getAs[Long]("n_docs"))).toMap
    assert(hist == Map(0L -> (0L, 2L), 19L -> (190L, 1L)))
  }

  test("multimodal plumbing: stub decode, corrupt rows quarantined, sampling") {
    val media = Multimodal.syntheticMedia(spark, 100)
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    val feats = Multimodal.extractFeatures(media, dim = 8).cache()
    val bad = feats.filter(!$"ok").count()
    assert(bad == math.ceil(100 / 17.0).toLong - 0, s"corrupt rows: $bad")
    assert(feats.filter($"ok").head().features.length == 8)
    val sampled = Multimodal.sampleFeatures(feats.filter($"ok").toDF(), 2)
      .select(size($"sampled")).as[Int].head()
    assert(sampled == 4)
  }
}
