package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge relations (the family
  * [[Dedup.connectedComponents]] opened; this file holds the ranking
  * side).
  *
  * PageRank (Page/Brin/Motwani/Winograd 1998) here is INTEGER
  * fixed-point: ranks live in micro-units (`scale` = 10⁶ per unit of
  * mass) and every step is integer arithmetic — `div` for the per-edge
  * contribution split, `(damping · Σ) div 1000` for the damped update.
  * Floating-point PageRank cannot be hash-compared across engines (the
  * contribution sum's addition order differs run to run and engine to
  * engine); integer sums are exactly associative and commutative, so the
  * fixed-point variant is bit-reproducible ANYWHERE — the same
  * integerization move the repo's Kneser–Ney and fingerprint families
  * use. The cost is bounded truncation error (< 1 micro-unit per edge
  * per round), irrelevant for ordering-quality uses like sampling
  * weights.
  */
object Graph {

  /** Deterministic integer PageRank over a DIRECTED edge relation
    * `(src, dst)` (union both orientations for an undirected graph —
    * [[coOccurrenceEdges]] does). Nodes are the edge endpoints; every
    * rank starts at `scale` and updates for exactly `iters` rounds as
    *
    * {{{ r'(v) = base + (damping · Σ_{(u,v)∈E} (r(u) div outdeg(u))) div 1000 }}}
    *
    * with `base = (scale · (1000 − dampingPermille)) div 1000`. Output:
    * `(id, rank_fp)` — BIGINT micro-unit ranks, one row per node.
    *
    * Scale shape: each round is one equi-join (edges ⋈ ranks on src, a
    * shuffle on the edge key) + one map-side-combining groupBy(dst) +
    * one left join back to the node set — the Pregel contraction without
    * any driver-side state. The edge/node/outdeg relations checkpoint
    * ONCE up front (they are reused every round; without materialization
    * the possibly-expensive edge-generation plan would recompute per
    * round), but ranks checkpoint only every 8th round: unlike
    * [[Dedup.connectedComponents]] — an unbounded loop whose edge set
    * changes shape per round — PageRank runs a FIXED handful of rounds
    * over node-sized state, and measured at sf0.1 the per-round eager
    * checkpoint was 2.6× pure overhead (7.9 s → 3.1 s for 5 rounds).
    * Dangling nodes (no
    * out-edges) keep their mass out of circulation rather than
    * redistributing it — the common simplification; callers who need
    * mass conservation should add self-loops. Long-overflow bound: the
    * damped product tops out near `dampingPermille · n · scale`, safe
    * below ~10¹⁰ nodes at the default scale — beyond that, lower
    * `scale` (the same bound DuckDB's BIGINT oracle carries, so an
    * overflow would be loud in both engines, never silent drift).
    */
  def pageRankInt(edges: DataFrame, iters: Int = 5,
                  dampingPermille: Int = 850,
                  scale: Long = 1000000L): DataFrame =
    // the unit-weight case: (r · 1) div Σ1 = r div outdeg, value-identical
    pageRankIntWeighted(
      edges.select(col("src"), col("dst")).distinct()
        .withColumn("w", lit(1L)),
      iters, dampingPermille, scale)

  /** [[pageRankInt]] with INTEGER edge weights `(src, dst, w)` — the
    * co-occurrence-count graph's natural form (a pair sharing 40 baskets
    * should pull harder than one sharing 1): each round distributes
    * `(r(u) · w(u,v)) div Σ_v' w(u,v')`. Same integer-determinism
    * contract; parallel (src, dst) rows merge by summing w. Overflow
    * bound tightens to `max(r) · max(w) < 2⁶³` — at the default scale
    * that is weights up to ~10⁹ on a 10⁹-node graph, and the oracle's
    * BIGINT fails just as loudly past it.
    */
  def pageRankIntWeighted(edges: DataFrame, iters: Int = 5,
                          dampingPermille: Int = 850,
                          scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters >= 1, got $iters")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille in [0, 1000], got $dampingPermille")
    def ckpt(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint()
      else df.localCheckpoint()
    // null endpoints carry no rank and would seed a phantom null node —
    // drop them here rather than leaving the contract to every caller
    val e = ckpt(edges.select(col("src"), col("dst"), col("w").cast("long"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w")))
    val nodes = ckpt(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val outw = ckpt(e.groupBy(col("src")).agg(sum(col("w")).as("ow")))
    val base = scale * (1000 - dampingPermille) / 1000
    var rank = nodes.select(col("id"), lit(scale).as("r"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(rank.select(col("id").as("src"), col("r")), Seq("src"))
        .join(outw, Seq("src"))
        .select(col("dst").as("id"), expr("(r * w) div ow").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      rank = nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"($dampingPermille * coalesce(s, 0L)) div 1000")).as("r"))
      // lineage guard only — a fixed small loop never hits this
      if (i % 8 == 0 && i < iters) rank = ckpt(rank)
    }
    rank.select(col("id"), col("r").as("rank_fp"))
  }

  /** Multi-source BFS hop distances from a SEED set — the
    * quality-propagation shape crawl curation uses (hops from trusted
    * seed domains as a retention signal; Common Crawl seed-distance
    * filtering): every node reachable within `maxHops` of any seed gets
    * its exact minimum hop count, unreachable nodes report NULL via the
    * caller's join. Directed edges; pass both orientations for an
    * undirected graph.
    *
    * Each round relaxes the CURRENT FRONTIER only (classic distributed
    * BFS): frontier ⋈ edges proposes dist+1, an anti-join against the
    * settled set keeps first visits (BFS settles a node at its true
    * minimum — no re-relaxation), and the new frontier checkpoints
    * (unbounded-loop rule; the frontier relation changes shape per
    * round). Work per round is frontier-sized, not graph-sized.
    * Distances are exact integers — deterministic in any engine.
    *
    * Output: `(id, dist)` for every node within `maxHops` of a seed
    * (seeds themselves at 0).
    */
  def seedDistances(edges: DataFrame, seeds: DataFrame,
                    maxHops: Int = 4): DataFrame = {
    require(maxHops >= 0, s"maxHops >= 0, got $maxHops")
    def ckpt(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint()
      else df.localCheckpoint()
    val e = ckpt(edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull).distinct())
    var settled = ckpt(seeds.select(col("id")).where(col("id").isNotNull)
      .distinct().withColumn("dist", lit(0)))
    var frontier = settled
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = ckpt(frontier
        .join(e, frontier("id") === e("src"))
        .select(col("dst").as("id")).distinct()
        .join(settled.select(col("id")), Seq("id"), "left_anti")
        .withColumn("dist", lit(hop)))
      settled = ckpt(settled.unionByName(next))
      frontier = next
    }
    settled
  }

  /** Per-node triangle counts over an UNDIRECTED edge relation (pass
    * either orientation or both; normalized internally), with the
    * degree-ordered orientation trick (Schank/Wagner 2005; the standard
    * distributed formulation): orient every edge from the
    * lower-(degree, id) endpoint to the higher, so each node's
    * out-neighborhood is O(√m) — wedge enumeration (the self-join on the
    * oriented source) is then O(m^1.5) total instead of Σ deg² on hubs,
    * which is the difference between a bounded shuffle and a hub-node
    * explosion at graph scale. A triangle {a,b,c} is counted once as an
    * oriented wedge (a→b, a→c) closed by the oriented edge b→c; the
    * closing equi-join keys on the full edge, never a product.
    *
    * Output: `(id, n_triangles)` for every node that touches an edge
    * (nodes in zero triangles report 0).
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    def ckpt(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint()
      else df.localCheckpoint()
    val und = edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) → high-(deg, id); the (deg, id) pair is a
    // total order, so orientation is deterministic and acyclic
    val withDeg = ckpt(und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t")))
    // wedges from each oriented source, closed by an oriented edge
    val tri = withDeg.as("e1")
      .join(withDeg.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
      .join(withDeg.select(
        least(col("s"), col("t")).as("b"), greatest(col("s"), col("t")).as("c")),
        Seq("b", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.select(col("id")).join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** ROUNDS-BOUNDED k-core peeling over an undirected edge relation —
    * the dense-subgraph miner (boilerplate hubs, citation cores,
    * bot-ring detection): repeatedly drop every node whose degree in the
    * SURVIVING graph is under `k`, `rounds` times. The bounded-rounds
    * contract is deliberate: full k-core decomposition iterates to a
    * data-dependent fixpoint, which no static oracle can replay — with
    * a fixed round count both engines run the identical recurrence and
    * the result is exact and hash-comparable (the unigram hard-EM rule:
    * bounded iteration IS the portable contract; callers wanting the
    * fixpoint raise `rounds` until the output stops changing — each
    * round is one linear degree count + two semi-joins, edge-sized work,
    * no wedges).
    *
    * Output: `(id, deg)` — the survivors after `rounds` peels with their
    * degrees in the surviving subgraph.
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int = 4): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    require(rounds >= 1, s"rounds >= 1, got $rounds")
    def ckpt(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint()
      else df.localCheckpoint()
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("id")).union(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
    var e = ckpt(edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct())
    for (_ <- 1 to rounds) {
      val keep = degrees(e).where(col("deg") >= k).select(col("id"))
      e = ckpt(e
        .join(keep.select(col("id").as("u")), Seq("u"))
        .join(keep.select(col("id").as("v")), Seq("v"))
        .select(col("u"), col("v")))
    }
    degrees(e)
  }

  /** Undirected co-occurrence edges from a `(group, item)` relation:
    * items sharing a group get both directed orientations, deduplicated.
    * The co-click/co-order/co-citation graph constructor — per-group
    * fanout is quadratic in the GROUP size (bounded by the domain: order
    * baskets, sessions), never in the table, so the edge build is an
    * equi-join on the group key, linear shuffles end to end.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String,
                        itemCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("grp"), col(itemCol).as("item"))
      .where(col("item").isNotNull).distinct()
    g.as("a").join(g.as("b"),
        col("a.grp") === col("b.grp") && col("a.item") =!= col("b.item"))
      .select(col("a.item").as("src"), col("b.item").as("dst"))
      .distinct()
  }

  /** [[coOccurrenceEdges]] keeping the co-occurrence COUNT as the edge
    * weight `(src, dst, w)` — w = number of distinct groups sharing the
    * pair, the natural strength signal for [[pageRankIntWeighted]]. */
  def coOccurrenceEdgesWeighted(df: DataFrame, groupCol: String,
                                itemCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("grp"), col(itemCol).as("item"))
      .where(col("item").isNotNull).distinct()
    g.as("a").join(g.as("b"),
        col("a.grp") === col("b.grp") && col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("src"), col("b.item").as("dst"))
      .agg(count(lit(1)).as("w"))
  }
}
