package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  *  - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query set
  *    against the corpus, distributed TakeOrdered per query. The baseline
  *    and the recall oracle.
  *  - `lshTopK`: sign-LSH (random-hyperplane) bucketed ANN — the scale path:
  *    corpus hashed once to `planes`-bit buckets; a query only scans its own
  *    bucket (and hamming-1 neighbors), turning O(|Q|·|C|) into
  *    O(|Q|·|C|/2^planes · (1+planes)).
  *
  * All vector math is zip_with/aggregate higher-order functions in double
  * precision — codegen'd, no UDF.
  */
object Similarity {

  /** dot(a, b) in double precision, sequential accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — ONE codegen'd pass over both arrays (r6,
    * guide §4): the previous `when(norm(a)*norm(b) === 0, 0.0)
    * .otherwise(dot(a,b)/...)` formulation ran three interpreted
    * zip_with+aggregate folds per scored PAIR (HigherOrderFunctions are
    * CodegenFallback). Bit-identical IEEE math — equivalence contract and
    * proof sketch at graft.functions.CosineSim; pinned by the q77/q79
    * exact-pair oracles and the q24/q42/q76 brute-force bridges.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosine_sim(a, b)

  /** Rank the scored (query_id, neighbor_id, cos) rows into per-query top-k
    * via the bounded TopKRows hash aggregate — never a Window: a
    * `row_number().over(partitionBy(query_id))` would shuffle EVERY scored
    * corpus row into #queries partitions and sort them; the aggregate ships
    * k rows per (task, query) and sorts nothing bigger than 2k.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKRows.top_k_rows(
        struct(col("neighbor_id"), col("cos")),
        struct(negate(col("cos")).as("neg_cos"), col("neighbor_id")),
        k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("query_id"), col("r.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"), col("r.cos").as("cos"))

  /** Exact top-k neighbors for each query row. Queries are broadcast (must
    * be small — the ad-hoc search shape); corpus side streams, so this
    * scales to arbitrary corpus size with zero shuffle of the corpus — the
    * only shuffled rows are the per-task k-row partial top-k buffers.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  // Hyperplane components are deterministic pseudo-random values in [-1, 1)
  // derived from xxhash64(plane, dim) — no RNG state, identical on every
  // executor/run; computed inside SignLshBucket since r6 (the Column
  // formulation `(pmod(xxhash64(lit(p), d), 20001) - 10000) / 10000.0`
  // is kept verbatim as the ExprSpec oracle).

  /** Sign-LSH bucket id: one bit per hyperplane = sign of dot(v, plane).
    * `planes = 0` is the documented degeneracy: ONE bucket, so bucketed
    * near-dup ops become exact all-pairs — the q79 oracle-bridge config,
    * never the scale shape.
    */
  def lshBucket(vec: Column, planes: Int): Column =
    if (planes == 0) lit(0L)
    // ONE codegen'd pass computes every plane's projection (r6, guide §4):
    // the per-plane aggregate(zip_with(..., planeComponent)) folds were
    // CodegenFallback, paid per CORPUS ROW per plane — the scan cost of
    // every LSH op. Bit-exact equivalence contract (same xxhash64-derived
    // components, same fold order, same null/empty semantics) at
    // graft.functions.SignLshBucket; ExprSpec fuzzes it against this very
    // formulation and the q76/q79 bridges pin the downstream row sets.
    else graft.functions.SignLshBucket.sign_lsh_bucket(vec, planes)

  /** ANN top-k: exact cosine ranking *within* the query's LSH bucket
    * (probing the bucket plus all hamming-1 neighbor buckets for recall).
    * The corpus is bucketed once (can be precomputed/persisted); the join is
    * an equi-join on bucket id — shuffle ∝ corpus size, pairwise work ∝
    * bucket sizes only.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket0", lshBucket(col("qv"), planes))
    // multi-probe: own bucket + flip each single bit.
    val probes = array((lit(0L) +: (0 until planes).map(p => lit(1L << p))): _*)
    val q = qb.select(col("query_id"), col("qv"),
      explode(transform(probes, m => col("bucket0").bitwiseXOR(m))).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** Squared L2 distance between two array<double> columns. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  /** Deterministic IVF (inverted-file) index: k-means cluster ids per corpus
    * row, trained with a fixed number of Lloyd iterations entirely as
    * DataFrame operations — no RNG state (seeds are the hash-min rows), no
    * MLlib, and no driver-side centroid state at all: centroids live in a
    * small (cluster, cv) DataFrame that is BROADCAST-joined against the
    * corpus for assignment (argmin via one min_by_row hash aggregate per
    * row). Earlier revisions inlined every centroid as plan literals —
    * O(nlist·dim) expression nodes, which stops analyzing long before the
    * nlist ≈ corpus/clusterSize (10⁵–10⁶) that 100 TB SemDeDup needs
    * (VERDICT r4 #2); as broadcast DATA the plan is O(1) and nlist is
    * bounded only by broadcast size (10⁶ × 64-dim doubles ≈ 0.5 GB —
    * shard the centroid table and union assignments past that, the
    * standard sharded-IVF shape).
    *
    * Per Lloyd iteration: one corpus×centroid broadcast join collapsed
    * map-side by the argmin aggregate (shuffle = corpus rows, never
    * corpus×nlist), one elementwise-mean aggregation bounded by
    * nlist×dim, and a localCheckpoint truncating the iteration lineage.
    * At 100 TB the index build is a one-off amortized scan, exactly like
    * production IVF.
    *
    * @return (assigned corpus (id, v, cluster), centroids (cluster, cv))
    */
  def ivfAssign(corpus: DataFrame, nlist: Int, iters: Int = 3,
                idCol: String = "vec_id", vecCol: String = "embedding"):
      (DataFrame, DataFrame) = {
    val v = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // deterministic seeds: the nlist rows with the smallest id hash;
    // cluster id = rank in that order (the row_number window sees only the
    // nlist seed rows, never the corpus)
    var centroids = v.orderBy(xxhash64(col("id")), col("id")).limit(nlist)
      .select((org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(xxhash64(col("id")), col("id"))) - 1).as("cluster"),
        col("v").as("cv"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val means = assignClusters(v, centroids)
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          p => p.getField("m")).as("cv"))
      // empty clusters keep their previous centroid
      centroids = centroids.as("o").join(means.as("n"), Seq("cluster"), "left")
        .select(col("cluster"), coalesce(col("n.cv"), col("o.cv")).as("cv"))
        .localCheckpoint()
    }
    (assignClusters(v, centroids), centroids)
  }

  /** Argmin cluster per corpus row: corpus ⋈ broadcast(centroids) (a
    * broadcast nested-loop by construction — every row scores every
    * centroid, the k-means assignment step itself, NOT an accidental
    * cartesian) followed by one min_by_row hash aggregate on the row id.
    * The aggregate's map-side partial collapses the ×nlist expansion back
    * to one row per id before the exchange, so the only shuffle is
    * corpus-sized. Ties break to the smallest cluster id (deterministic).
    */
  private def assignClusters(v: DataFrame, centroids: DataFrame): DataFrame =
    v.crossJoin(broadcast(centroids))
      .select(col("id"), col("v"), col("cluster"),
        sqDist(col("v"), col("cv")).as("__d"))
      .groupBy(col("id"))
      .agg(graft.functions.MaxByRow.min_by_row(
        struct(col("v"), col("cluster")),
        struct(col("__d"), col("cluster"))).as("__r"))
      .select(col("id"), col("__r.v").as("v"), col("__r.cluster").as("cluster"))

  /** ANN top-k over the IVF index: each query probes its `nprobe` nearest
    * centroid lists and ranks exact cosine inside them (TopKRows — no
    * Window). Scan cost per query ≈ nprobe/nlist of the corpus; the
    * assignment can be precomputed/persisted like any IVF deployment.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
              nprobe: Int = 4, iters: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (assigned, centroids) = ivfAssign(corpus, nlist, iters, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    // per-query probe list: nprobe nearest centroids via the same
    // broadcast-centroid shape as assignment (queries are small)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("cluster"),
        sqDist(col("qv"), col("cv")).as("__d"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKRows.top_k_rows(
        struct(col("cluster")), struct(col("__d"), col("cluster")),
        nprobe).as("top"))
      .select(col("query_id"), explode(col("top")).as("r"))
      .select(col("query_id"), col("r.cluster").as("cluster"))
    val qProbed = q.join(probes, Seq("query_id"))
    val scored = assigned.select(col("id").as("neighbor_id"), col("v").as("cv"),
        col("cluster"))
      .join(broadcast(qProbed), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** Plane count sized to the corpus: expected bucket ≈ n/2^planes, so
    * planes grows with log2(n / targetBucket) and within-bucket pairwise
    * work stays ~n·targetBucket instead of n²/2^const — a FIXED plane count
    * under-buckets any corpus 2^planes× larger than it was tuned for.
    * Bounds: ≥ minPlanes keeps recall behavior testable at toy sizes;
    * ≤ 30 keeps the bucket id dense enough that multi-probe stays cheap.
    */
  def planesForCount(n: Long, targetBucket: Long = 256L,
                     minPlanes: Int = 4): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(30, math.max(minPlanes, needed))
  }

  /** cosineNearDups with the plane count derived from the corpus size (one
    * cheap count job; at scale, pass a known row count to cosineNearDups
    * with planesForCount directly).
    */
  def cosineNearDupsAuto(df: DataFrame, threshold: Double,
                         targetBucket: Long = 256L,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame =
    cosineNearDups(df, threshold, planesForCount(df.count(), targetBucket),
      idCol, vecCol)

  /** Embedding-cosine near-duplicate pairs (cos >= threshold), LSH-bucketed
    * so only same-bucket pairs are compared. `planes` must scale with the
    * corpus (see planesForCount) — within-bucket work is quadratic in
    * bucket size.
    *
    * `maxBucket` is the pileup guard growing planes cannot provide
    * (VERDICT r4 #3): a pile of IDENTICAL embeddings lands in ONE bucket
    * no matter how many hyperplanes cut the space (LSH cannot split exact
    * duplicates), and that bucket's self-join is O(d²). Buckets larger
    * than `maxBucket` are SUB-CHUNKED by id hash — pairs are only compared
    * within a chunk, so per-bucket work drops from |bucket|² to
    * ~|bucket|·maxBucket while every row still gets compared against
    * ~maxBucket of its bucket-mates (an identical-embedding pileup still
    * yields within-chunk dup pairs; cross-chunk pairs are the documented
    * recall trade, mirroring Dedup's `maxDocFreq` stop-shingle cap).
    * Capped output ⊆ uncapped output ⊆ exact pairs (OpsSpec property).
    * The guard costs one bucket-size aggregate joined back on the bucket
    * key — same key as the pair join, no new shuffle class.
    */
  def cosineNearDups(df: DataFrame, threshold: Double, planes: Int = 6,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     maxBucket: Long = 4096L): DataFrame = {
    require(maxBucket >= 2, "maxBucket < 2 would compare nothing")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val sizes = v.groupBy(col("bucket")).agg(count(lit(1)).as("__n"))
    val chunked = v.join(sizes, Seq("bucket"))
      .withColumn("__chunks",
        greatest(lit(1L), ceil(col("__n").cast("double") / maxBucket).cast("long")))
      .withColumn("__chunk", pmod(xxhash64(col("id")), col("__chunks")))
      .drop("__n", "__chunks")
    val a = chunked.select(col("bucket"), col("__chunk"),
      col("id").as("id_a"), col("v").as("v_a"))
    val b = chunked.select(col("bucket"), col("__chunk"),
      col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket", "__chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("id_a", "id_b").agg(max("cos").as("cos"))
  }

  /** Exact near-dup pairs (the oracle for cosineNearDups recall tests). */
  def cosineNearDupsExact(df: DataFrame, threshold: Double,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SemDeDup-style semantic duplicate pairs (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * cluster the embeddings with the deterministic k-means index
    * (`ivfAssign`) and compare cosine only WITHIN each cluster — the
    * published recipe for making embedding-level dedup tractable at
    * web scale, complementary to the sign-LSH buckets of `cosineNearDups`
    * (k-means buckets adapt to the data's density; LSH buckets are
    * data-independent).
    *
    * Scale shape: index build is the amortized one-off corpus scan ivfAssign
    * documents; the pair stage is ONE equi-join on cluster id, so pairwise
    * work is Σ_c |c|²/2 ≈ n·(n/nlist)/2 — `nlist` must grow with the corpus
    * (n/nlist ≈ target cluster size) exactly like `planesForCount` grows
    * LSH planes. Cross-cluster near-dup pairs are missed by construction;
    * that is SemDeDup's documented recall trade-off, bounded in OpsSpec by
    * recall-vs-exact at toy scale.
    */
  def semDedupPairs(df: DataFrame, tau: Double, nlist: Int, iters: Int = 3,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (assigned, _) = ivfAssign(df, nlist, iters, idCol, vecCol)
    val a = assigned.select(col("cluster"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** SemDeDup projection: drop all but one deterministic representative per
    * semantic-duplicate cluster. Pairs above `tau` become connected
    * components (Dedup.connectedComponents — distributed min-label
    * propagation, no driver state) and the min-id member of each component
    * survives — the same keeper rule as every other dedup op here, chosen
    * for determinism over the paper's low-centroid-similarity keeper (which
    * ties to a specific index state and is retry-unstable under
    * re-clustering).
    */
  def semDedup(df: DataFrame, tau: Double, nlist: Int, iters: Int = 3,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Dedup.dropByClusters(df, semDedupPairs(df, tau, nlist, iters, idCol, vecCol),
      idCol)
}
