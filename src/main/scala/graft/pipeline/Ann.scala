package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (PipelineQueries.annCosineTop5) —
  * exact, O(Q*N), the correctness oracle.
  *
  * Scale path: IVF (inverted-file) index —
  *  1. pick K centroids deterministically (first K vec_ids; a k-means
  *     refinement is a drop-in),
  *  2. assign every vector to its nearest centroid (ONE broadcast join,
  *     map-side argmin, no shuffle of the big side beyond the final
  *     bucket write),
  *  3. at query time probe only the nProbe nearest buckets: the scan
  *     touches nProbe/K of the corpus instead of all of it.
  * At 100 TB the bucketed table is written partitioned by bucket id so
  * probing prunes at file level, same pruning story as the token table.
  */
object Ann {

  /** Fused codegen'd cosine ([[graft.functions.CosineSim]]); rounded for
    * deterministic tiebreaks and oracle parity.
    */
  def cosineCol(a: Column, b: Column): Column =
    round(graft.functions.CosineSim.cosine_sim(a, b), 4)

  /** Deterministic random hyperplanes for sign-bit LSH (fixed-seed
    * java.util.Random — algorithm is specified, so weights are
    * bit-stable across runs/JVMs; SURVEY §7 determinism rule).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature: bit p = [dot(embedding, plane_p) >= 0].
    * Cosine-similar vectors agree on most bits, so equal signatures are
    * near-dup candidates — the embedding-space analogue of the text
    * SimHash, and the bucketed (shuffle-on-signature, never all-pairs)
    * scale path for embedding near-dup detection. nPlanes trades recall
    * for bucket selectivity exactly like LSH bands.
    */
  def hyperplaneSig(emb: Column, planes: Array[Array[Double]]): Column = {
    val dim = planes.head.length
    val sig = planes.zipWithIndex.map { case (w, i) =>
      val dot = aggregate(
        zip_with(emb, typedlit(w.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    // fail FAST on a dim mismatch: zip_with pads the shorter side with
    // nulls, the dot goes null, every bit reads 0 and every vector
    // lands in one mega-bucket — a silent quadratic blowup downstream.
    when(size(emb) === dim, sig).otherwise(raise_error(concat(
      lit(s"embedding dim != hyperplane dim $dim: got "), size(emb).cast("string"))))
  }

  /** Banded sign-bit LSH signatures (round-2 VERDICT item 5: the fixed
    * single 8-bit signature gives 256 buckets TOTAL, so bucket size —
    * and the quadratic verification join — grows linearly with corpus
    * size). Parameterized bands × bitsPerBand, each band an independent
    * fixed-seed plane set: vectors are near-dup candidates when ANY
    * band's full signature matches. `bitsPerBand` scales bucket count
    * (2^bits) with corpus size (e.g. 2×16-bit at 100 TB ⇒ 65k buckets
    * per band); `bands` buys recall back — exactly the MinHash banding
    * trade. Returns array<struct<band:int, sig:long>> ready for
    * explode + (band, sig) equi-join, the same never-all-pairs shuffle
    * shape as [[graft.PipelineQueries.lshPairs]].
    */
  def bandedHyperplaneSigs(emb: Column, dim: Int, bands: Int, bitsPerBand: Int): Column = {
    require(bitsPerBand <= 31, "bitsPerBand must fit an int signature")
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        hyperplaneSig(emb, hyperplanes(bitsPerBand, dim, seed = 42 + b)).cast("long").as("sig"))
    }: _*)
  }

  /** Assign each vector to its nearest of K deterministic centroids —
    * in ONE projection (round-1 VERDICT item 8: the previous
    * crossJoin(K centroids) + window was a K× row blowup plus a shuffle
    * per vector). The K centroids are a dimension table (K ≤ dozens):
    * collect them once and fold an argmax directly into the expression
    * tree — K fused cosines per row, no join, no window, no shuffle;
    * the big side stays narrow and is scanned exactly once.
    *
    * Tie-break parity with the old window (csim DESC, cid ASC): the
    * argmax is `array_max` over `(sim, -cid)` structs — struct ordering
    * compares sim first, then -cid, so equal-sim ties keep the LOWEST
    * cid. A when/otherwise fold would be wrong here even though it looks
    * natural: each fold step mentions the accumulator twice, so the
    * expression tree (and the generated Java) doubles per centroid —
    * 2^K blowup that OOMs codegen at K=16. The array form mentions each
    * cosine exactly once: linear code size in K.
    */
  def ivfAssign(emb: DataFrame, k: Int): DataFrame =
    ivfAssign(emb, seedCentroids(emb, k))

  /** Deterministic seed centroids: the K LOWEST vec_ids (orderBy+limit
    * = TakeOrderedAndProject, no assumption that ids are dense or
    * zero-based — `vec_id < k` returned short/empty seed sets for
    * offset or hashed id spaces; round-4 review). Identical to the old
    * filter on dense 0-based tables, so the DuckDB oracle is unchanged.
    */
  def seedCentroids(emb: DataFrame, k: Int): Array[(Long, Seq[Double])] = {
    val seeds = emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
      .sortBy(_._1)
    require(seeds.length == k,
      s"need $k seed centroids, table has only ${seeds.length} vectors")
    seeds
  }

  def ivfAssign(emb: DataFrame, centroids: Array[(Long, Seq[Double])]): DataFrame = {
    // centroids are doubles (k-means emits means); widen the float
    // embedding exactly — CosineSim requires matching element types
    val ed = col("embedding").cast("array<double>")
    val cands = array(centroids.map { case (cid, cv) =>
      struct(cosineCol(ed, typedlit(cv)).as("sim"),
        lit(-cid).as("ncid"))
    }: _*)
    val best = array_max(cands)
    emb.select(col("vec_id"), col("label"), col("embedding"),
      (-best("ncid")).as("bucket"))
  }

  /** Lloyd (k-means) refinement of the seed centroids — the quality
    * drop-in the IVF scaladoc promises. Each iteration is ONE scan
    * (the same argmax-assignment projection) plus one K-row aggregate
    * of per-dimension means: only K x dim doubles cross the shuffle,
    * never vectors. Deterministic: fixed seeds, fixed iteration count,
    * lowest-cid tie-break; per-dimension `avg` is order-insensitive at
    * the 4-decimal cosine rounding used everywhere downstream. An empty
    * bucket keeps its previous centroid.
    */
  def kmeansCentroids(emb: DataFrame, k: Int, nIter: Int): Array[(Long, Seq[Double])] = {
    var cents = seedCentroids(emb, k)
    val dim = cents.head._2.length // no extra job: the collected seeds carry it
    (1 to nIter).foreach { _ =>
      val means = ivfAssign(emb, cents)
        .groupBy(col("bucket"))
        .agg(array((0 until dim).map(i =>
          avg(col("embedding").getItem(i).cast("double"))): _*).as("mean"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      cents = cents.map { case (cid, cv) => (cid, means.getOrElse(cid, cv)) }
    }
    cents
  }

  /** IVF query: for each query vector, probe its nProbe nearest buckets,
    * brute-force within them, return top-k. Also reports recall@k vs the
    * exact brute-force answer — the quality/throughput tradeoff metric.
    *
    * `refineIters` > 0 switches the index to Lloyd-refined centroids
    * ([[kmeansCentroids]]); 0 keeps the deterministic seed index that
    * e_ivf_ann_recall's DuckDB oracle mirrors.
    */
  def ivfSearchWithRecall(emb: DataFrame, nQueries: Int, k: Int = 16,
                          nProbe: Int = 4, topK: Int = 5,
                          refineIters: Int = 0): DataFrame = {
    val cents =
      if (refineIters > 0) kmeansCentroids(emb, k, refineIters)
      else seedCentroids(emb, k)
    val assigned = ivfAssign(emb, cents).cache()
    // lowest-nQueries ids, density-agnostic like seedCentroids
    val queries = emb.orderBy(col("vec_id")).limit(nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    // probe set: nProbe nearest centroids per query — like ivfAssign,
    // a single projection over the broadcast centroid literals (sort
    // the (sim, -cid) structs, take nProbe): no crossJoin row blowup,
    // no per-query window shuffle. reverse(array_sort) orders sim DESC
    // then -cid DESC = cid ASC, the same tie-break as the old window.
    val cands = array(cents.map { case (cid, cv) =>
      struct(cosineCol(col("qv").cast("array<double>"), typedlit(cv)).as("sim"),
        lit(-cid).as("ncid"))
    }: _*)
    val probes = queries
      .select(col("qid"), col("qv"),
        explode(slice(reverse(array_sort(cands)), 1, nProbe)).as("p"))
      .select(col("qid"), col("qv"), (-col("p.ncid")).as("bucket"))

    // candidate scan: only probed buckets (bucket-pruned at scale)
    val wc = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    val approx = probes.join(assigned, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosineCol(col("qv"), col("embedding")).as("sim"))
      .withColumn("rk", row_number().over(wc)).filter(col("rk") <= topK)
      .select(col("qid"), col("vec_id"))

    // exact answer for recall
    val we = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    val exact = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosineCol(col("qv"), col("embedding")).as("sim"))
      .withColumn("rk", row_number().over(we)).filter(col("rk") <= topK)
      .select(col("qid"), col("vec_id"))

    // recall averages over ALL queries: a query whose probed buckets
    // miss every true neighbor contributes 0.0, it is not dropped
    // (the inner-grouped form inflated recall and under-counted
    // n_queries whenever a query had zero hits; round-4 review)
    val hits = approx.join(exact, Seq("qid", "vec_id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    val perQuery = queries.select(col("qid"))
      .join(hits, Seq("qid"), "left")
      .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    val out = perQuery.agg(
      count(lit(1)).as("n_queries"),
      round(avg(col("n_hits").cast("double") / topK), 6).as("recall_at_k"))
      .withColumn("k_buckets", lit(k))
      .withColumn("n_probe", lit(nProbe))
    // 1-row result: materialize it so the bucketed-corpus cache can be
    // released HERE instead of pinning executor storage across repeated
    // sweep calls (round-4 review)
    val matd = out.localCheckpoint(true)
    assigned.unpersist()
    matd
  }
}
