package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list, by alternating
  * large-star / small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14 — the algorithm behind GraphFrames'
  * default CC). Converges in O(log n) rounds regardless of component
  * DIAMETER — the property naive min-label propagation lacks (a chain
  * of near-dup docs propagates one hop per round there), and the reason
  * this is the shape that survives a 100-TB dedup graph.
  *
  * Per round: two groupBy-min shuffles keyed on node id (no collect_set
  * — a high-degree hub contributes one MIN per partition via partial
  * aggregation, so boilerplate mega-clusters don't skew a reducer), and
  * one `localCheckpoint` to truncate the iterative lineage (swap for
  * reliable `checkpoint` + a checkpoint dir on a real cluster). The
  * driver-side loop carries only a (count, checksum) pair per round.
  *
  * Result: one row per node that appears in any edge — (node,
  * component) with component = MIN node id of the connected component
  * (deterministic, engine-independent: the DuckDB oracle recomputes it
  * via a recursive-CTE transitive closure).
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges; self-loops
    *              and duplicates are tolerated. Column ORDER (not name)
    *              selects (u, v).
    * @param maxRounds convergence guard: the round bound is log2(n)ish,
    *                  so 25 covers any graph that fits on hardware;
    *                  hitting it RAISES (never a silently-partial
    *                  clustering).
    */
  def components(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    val Seq(uc, vc) = edges.columns.take(2).toSeq
    // r6: materialize the input edge list ONCE — it feeds both the node
    // universe below and the symmetrized round-0 set, and in every
    // production caller `edges` is the full LSH candidate chain, which
    // would otherwise re-run end to end for the second consumer. The
    // edge list is id pairs (tiny next to the corpus), the same
    // localCheckpoint pattern the round loop already uses.
    val raw = edges.select(col(uc).as("u"), col(vc).as("v")).localCheckpoint(true)
    // full node universe BEFORE dropping self-loops: a node whose only
    // edge is (x, x) is a singleton component, not absent (the doc
    // contract is one row per node appearing in ANY edge; round-4
    // review). One distinct over the edge endpoints — same magnitude
    // as the output itself.
    val allNodes = raw.select(col("u").as("node"))
      .unionByName(raw.select(col("v").as("node"))).distinct()
    // r6: the set fingerprint rides the SAME action that materializes
    // the round's edge set — observe() metrics are computed by
    // accumulator during the localCheckpoint job, so each round is ONE
    // Spark job instead of two (checkpoint + separate checksum scan).
    // At test scale the rounds are pure scheduling overhead, and on a
    // cluster this halves the number of sequential driver round-trips.
    def checkpointWithChecksum(df: DataFrame): (DataFrame, (Long, Long)) = {
      val obs = org.apache.spark.sql.Observation() // fresh unique name
      val out = df.observe(obs, count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("x"))
        .localCheckpoint(true)
      val r = obs.get
      (out, (r("n").asInstanceOf[Long], r("x").asInstanceOf[Long]))
    }
    var (e, cur) = checkpointWithChecksum(symmetrize(raw.filter(col("u") =!= col("v"))))
    var prev = (-1L, -1L)
    var round = 0
    while (cur != prev && round < maxRounds) {
      val (e2, c2) = checkpointWithChecksum(smallStar(largeStar(e)))
      e = e2
      prev = cur
      cur = c2
      round += 1
    }
    require(cur == prev,
      s"connected components did not converge in $maxRounds rounds — " +
        "raise maxRounds (bound is ~log2(n) rounds)")
    // converged ⇒ star forest: every non-root's sole smaller neighbor is
    // its component min; roots (no smaller neighbor) map to themselves
    val nonRoots = e.filter(col("v") < col("u"))
      .select(col("u").as("node"), col("v").as("component"))
    val labeled = nonRoots.unionByName(
      nonRoots.select(col("component")).distinct()
        .select(col("component").as("node"), col("component")))
    // self-loop-only nodes never enter the star loop: map them to
    // themselves so the output covers the whole node universe
    allNodes.join(labeled, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  private def symmetrize(e: DataFrame): DataFrame =
    e.unionByName(e.select(col("v").as("u"), col("u").as("v"))).distinct()

  /** min(N(u) ∪ {u}) per center node, joined back onto the edges. */
  private def withMin(e: DataFrame): DataFrame =
    e.join(
      e.groupBy("u").agg(min(col("v")).as("_mn"))
        .select(col("u"), least(col("_mn"), col("u")).as("m")), "u")

  /** Large-star: every neighbor v > u is connected to u's min m.
    *
    * r6: emitted ORIENTED (u > v always, since m <= center < v) instead
    * of symmetrized — the only consumer is [[smallStar]], whose first
    * step re-filters the symmetric set back to exactly this orientation
    * (symmetrize(X).filter(v < u) == X.distinct for big→small X), so
    * the union and the doubled rows through the dedup exchange were
    * pure waste. The round's OUTPUT (smallStar) stays symmetrized, so
    * loop fixpoint detection and the final star-forest read-out are
    * unchanged.
    */
  private def largeStar(e: DataFrame): DataFrame =
    withMin(e).filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Small-star: over edges oriented big→small, every smaller neighbor
    * (and u itself) is connected to the min m. (The (u, m) branch's
    * per-branch dedup is subsumed by symmetrize's distinct — r6.)
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val d = e.filter(col("v") < col("u"))
    val dm = withMin(d)
    symmetrize(
      dm.filter(col("v") =!= col("m")).select(col("v").as("u"), col("m").as("v"))
        .unionByName(dm.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")))
  }

}
