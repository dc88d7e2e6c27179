package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over edge-list DataFrames — the link-structure
  * signals a crawl/curation stack computes beside the per-document
  * ones ([[Dedup.nearDupClusters]] and [[Similarity.semanticDedup]]
  * already do connected components via label propagation; this adds the
  * eigenvector-style centrality family).
  */
object Graphs {

  /** Damped PageRank (Page, Brin, Motwani & Winograd 1999) over an edge
    * list — host/domain authority as a curation signal (the link-graph
    * complement of [[Urls.hostReputation]]'s behavioral screen: a spam
    * mill can fake its own URLs but not who links to it).
    *
    * Published semantics, including danglers: with out-degree deg(u),
    *
    *   r'(v) = (1−d)/N + d · ( Σ_{u→v} r(u)/deg(u) + D/N )
    *
    * where D = Σ r(u) over dangling nodes (no out-edges) — their mass
    * redistributes uniformly, so Σ r stays 1 every iteration (spec-
    * asserted). Nodes = src ∪ dst; a node id must be globally unique
    * across entity types (prefix them — see q181).
    *
    * Determinism (the q151/q167 quantized-contribution discipline):
    * per-edge contributions r(u)/deg(u) and per-node dangling masses
    * quantize to 1e-12-granular longs BEFORE their sums, so every
    * corpus-wide aggregate is an exact integer sum — partition order,
    * engine, and retry cannot move a rank, and the oracle replays the
    * iteration exactly (no output rounding needed; mass conservation
    * bounds every scaled sum by ~10¹², far inside long range — the
    * bound is total rank mass, not edge count). Granularity, not
    * correctness, is the N ceiling: absolute rank error per iteration
    * ≤ ~indegree·1e-12.
    *
    * Scale shape: the Lloyd/BPE sequential-round loop — per iteration
    * one ranks⋈outdeg⋈edges join + a per-destination integer-sum
    * aggregate (map-side combined; shuffle = node cardinality), ONE
    * 1-row dangling aggregate collected (metadata; the only driver
    * value), and the node-sized rank frame localCheckpointed so
    * iteration i never re-executes iterations < i. Edges and ranks
    * shuffle on node keys only — no per-iteration full-graph sort, no
    * adjacency materialization.
    */
  /** HITS hubs & authorities (Kleinberg, JACM 1999) — [[pageRank]]'s
    * bipartite-shaped sibling: a good HUB points at good authorities, a
    * good AUTHORITY is pointed at by good hubs — the natural centrality
    * pair for two-role graphs (buyers→products, crawlers→hosts,
    * citers→cited), where PageRank's single score conflates the roles.
    *
    *   a'(v) = Σ_{u→v} h(u)   then L1-normalize;
    *   h'(u) = Σ_{u→v} a'(v)  then L1-normalize.
    *
    * Determinism, the [[pageRank]] discipline: per-edge contributions
    * quantize to 1e-9-granular longs before the sums (coarser than
    * PageRank's 1e-12 because the L1-normalization bound here is the
    * EDGE count, not the unit mass — safe to ~9·10⁹ edges), each
    * normalizer is ONE exact long sum collected per half-iteration
    * (metadata), and every score is a single long/long double division
    * — the oracle replays all rounds exactly, no output rounding.
    * Scores start at 1.0 (scale is irrelevant under L1 normalization);
    * no-in-edge nodes get authority 0, no-out-edge nodes hub 0.
    */
  def hits(edges: DataFrame, iterations: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .transform(Persist.round)
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node")))
      .distinct().transform(Persist.round)
    val scale = 1e9
    var scores = nodes.withColumn("hub", lit(1.0))
      .withColumn("auth", lit(1.0)).transform(Persist.round)
    for (_ <- 1 to iterations) {
      // each edge-join aggregate materializes ONCE (it feeds both its
      // 1-row normalizer and the next node-sized join — without the
      // checkpoint the 2 actions run the edge join twice; measured
      // ~2× on the q183 gate)
      val araw = scores.select(col("node").as("__src"),
          round(col("hub") * lit(scale)).cast("long").as("__qh"))
        .join(e, Seq("__src"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("__qh")).as("__ar"))
        .transform(Persist.round)
      // L1 normalizers as 1-row aggregates cross-joined into the score
      // update instead of collected (round 21, the [[prRounds]] fusion):
      // each was a separate Spark job per half-iteration; the long→
      // double cast and the division are the same IEEE operations the
      // collected-literal form performed, so scores are bit-identical.
      // fail-loud on an empty aggregate (ADVICE r21): the collected
      // form's getLong(0) threw on a NULL sum (empty edge set); the
      // fused form would silently NULL every score. The guard runs on
      // the 1-row frame only — zero per-edge cost.
      def failLoud(tot: Column, what: String): Column =
        when(tot.isNull, raise_error(
          lit(s"hits: empty $what aggregate (no edges?)"))).otherwise(tot)
      val aTot = araw.agg(sum(col("__ar")).as("__t"))
        .select(failLoud(col("__t"), "auth").as("__at"))
      val withAuth = scores.drop("auth")
        .join(araw, Seq("node"), "left")
        .crossJoin(aTot)
        .withColumn("auth",
          coalesce(col("__ar"), lit(0L)).cast("double") /
            col("__at").cast("double"))
        .drop("__ar", "__at").transform(Persist.round)
      val hraw = withAuth.select(col("node").as("__dst"),
          round(col("auth") * lit(scale)).cast("long").as("__qa"))
        .join(e, Seq("__dst"))
        .groupBy(col("__src").as("node"))
        .agg(sum(col("__qa")).as("__hr"))
        .transform(Persist.round)
      val hTot = hraw.agg(sum(col("__hr")).as("__t"))
        .select(failLoud(col("__t"), "hub").as("__ht"))
      scores = withAuth.drop("hub")
        .join(hraw, Seq("node"), "left")
        .crossJoin(hTot)
        .withColumn("hub",
          coalesce(col("__hr"), lit(0L)).cast("double") /
            col("__ht").cast("double"))
        .drop("__hr", "__ht")
        .select(col("node"), col("hub"), col("auth"))
        .transform(Persist.round)
    }
    scores
  }

  /** Per-node triangle counts via degree-ordered orientation (Schank &
    * Wagner, WEA 2005; the MapReduce shaping follows Suri &
    * Vassilvitskii, WWW 2011): canonicalize to distinct undirected
    * edges, orient every edge from its lower-(degree, id) endpoint to
    * the higher, enumerate wedges at each source, and close them
    * against the oriented edge list. Each triangle materializes exactly
    * once (at its lowest-ordered corner, its two higher corners in
    * orientation order), so the count is exact.
    *
    * Why the orientation matters at scale: wedge volume is
    * Σ C(outdeg, 2), and orienting by degree caps every outdegree at
    * O(√m) — a star of degree d contributes ZERO wedges at its hub
    * (all edges point outward into it) instead of C(d, 2). The hot-node
    * problem is solved by construction, not by salting.
    *
    * Shuffle shape: one distinct over canonical edges, one degree
    * aggregate, then node-keyed joins only (wedge join on the shared
    * source, closure join on the (a, b) edge key). Nothing data-sized
    * reaches the driver; self-loops drop, parallel edges collapse.
    *
    * @return (node, triangles) for every node of the graph, zeros
    *         included — triangles is the number of triangles the node
    *         participates in (each triangle counts once per corner).
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e0 = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
      // feeds degrees, orientation, and the closure join — one
      // materialization (the q181 lesson: the caller's edge derivation
      // is usually itself a join+distinct)
      .transform(Persist.round)
    val deg = e0.select(col("u").as("node"))
      .unionByName(e0.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("__deg"))
      .transform(Persist.round)
    // Orientation key (degree, id): a strict total order — ties in
    // degree break by node id, so every edge orients exactly one way.
    val du = deg.select(col("node").as("u"), col("__deg").as("__du"))
    val dv = deg.select(col("node").as("v"), col("__deg").as("__dv"))
    val ordU = struct(col("__du").as("d"), col("u").as("n"))
    val ordV = struct(col("__dv").as("d"), col("v").as("n"))
    val oriented = e0.join(du, Seq("u")).join(dv, Seq("v"))
      .select(
        when(ordU < ordV, col("u")).otherwise(col("v")).as("s"),
        when(ordU < ordV, col("v")).otherwise(col("u")).as("t"),
        when(ordU < ordV, ordV).otherwise(ordU).as("__ord_t"))
      .transform(Persist.round) // wedge join reads it twice + closure once
    val wedges = oriented.select(col("s"), col("t").as("a"),
        col("__ord_t").as("__oa"))
      .join(oriented.select(col("s"), col("t").as("b"),
        col("__ord_t").as("__ob")), Seq("s"))
      .where(col("__oa") < col("__ob"))
      .select(col("s"), col("a"), col("b"))
    val tri = wedges.join(
        oriented.select(col("s").as("a"), col("t").as("b")), Seq("a", "b"))
      .select(col("s"), col("a"), col("b"))
      // the three corner projections below each read tri — without this
      // the wedge+closure joins (the expensive part) execute three times
      .transform(Persist.round)
    val perNode = tri.select(col("s").as("node"))
      .unionByName(tri.select(col("a").as("node")))
      .unionByName(tri.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.select(col("node")).join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003; the common-
    * neighbor family survey is Liben-Nowell & Kleinberg, CIKM'03):
    * score every NON-adjacent node pair that shares at least one
    * neighbor by Σ_w 1/ln(deg(w)) over the shared neighbors w — the
    * "which link forms next" primitive behind people-you-may-know,
    * related-products, and crawl-frontier ranking.
    *
    * Shape: candidate pairs are wedges enumerated AT the shared
    * neighbor (each w emits its C(deg, 2) neighbor pairs, u < v so a
    * pair materializes once per shared neighbor), summed per pair,
    * then existing edges leave via one anti-join. Deg-1 neighbors
    * generate no wedges, so ln(deg)=0 never divides; deg-2+ gives
    * ln ≥ ln 2.
    *
    * Scale: wedge volume is Σ C(deg(w), 2) — quadratic in hub degree.
    * Unlike [[triangleCounts]] no orientation can save the hub here
    * (AA's evidence IS the hub's neighbor pairs), but the hub's
    * contribution 1/ln(deg) vanishes as its cost explodes — so
    * `maxDegree` drops shared neighbors above a degree cap via one
    * broadcast anti-join on the (small) hot-node set, the documented
    * evidence-per-cost trade (same move as [[Dedup]]'s hot-bucket
    * cap). Capped runs under-score pairs whose ONLY shared neighbors
    * are hubs — at cap 1000 the lost evidence is < 0.145 per shared
    * hub. Default = no cap.
    *
    * Determinism (q151 discipline): each wedge contribution
    * 1/ln(deg(w)) quantizes to a 1e-9-granular long before the
    * per-pair sum; `score` is one long/1e9 division.
    *
    * @return (u, v, score_q, score) with u < v, existing edges
    *         excluded, only pairs with ≥ 1 (surviving) shared neighbor
    */
  def adamicAdar(edges: DataFrame, maxDegree: Option[Int] = None,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    maxDegree.foreach(c => require(c >= 2, s"maxDegree must be >= 2, got $c"))
    val e0 = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
      .transform(Persist.round) // feeds adjacency (twice), degrees, anti-join
    // symmetric adjacency: (w, neighbor)
    val adj = e0.select(col("u").as("w"), col("v").as("nb"))
      .unionByName(e0.select(col("v").as("w"), col("u").as("nb")))
    val deg = adj.groupBy(col("w")).agg(count(lit(1)).as("__deg"))
    val kept = maxDegree match {
      case None => adj.join(deg, Seq("w"))
      case Some(cap) =>
        // hot-node set is tiny by construction -> broadcast anti-join,
        // never a full-degree-table shuffle onto the adjacency
        val hot = deg.filter(col("__deg") > cap).select(col("w"))
        adj.join(broadcast(hot), Seq("w"), "left_anti").join(deg, Seq("w"))
    }
    val contrib = round(lit(1e9) / log(col("__deg").cast("double")))
      .cast("long")
    // deg-1 nodes generate no wedges, but their adjacency rows would
    // still evaluate 1/ln(1) under ANSI mode — drop them first
    // (output-identical: a wedge needs >= 2 neighbors at w)
    val wedgeable = kept.where(col("__deg") >= 2)
    val pairs = wedgeable
      .select(col("w"), col("nb").as("a"), contrib.as("__c"))
      .join(wedgeable.select(col("w"), col("nb").as("b")), Seq("w"))
      .where(col("a") < col("b"))
      .groupBy(col("a").as("u"), col("b").as("v"))
      .agg(sum(col("__c")).as("score_q"))
    pairs.join(e0, Seq("u", "v"), "left_anti")
      .withColumn("score", col("score_q").cast("double") / lit(1e9))
  }

  /** k-core decomposition by iterative peeling (Seidman 1983; Batagelj
    * & Zaveršnik 2003): repeatedly delete nodes of degree < k until
    * every survivor has ≥ k neighbors INSIDE the surviving subgraph —
    * the density signal degree alone fakes: a spam hub buys any degree
    * it wants, but membership in a high-k core requires its NEIGHBORS
    * to be equally well-embedded, recursively.
    *
    * The Lloyd-loop shape: each round one degree aggregate over the
    * current edge set (map-side combined, node-keyed shuffle), one
    * metadata-sized survivor count collected for the fixpoint check,
    * and two semi joins restricting edges to survivors,
    * localCheckpointed so round i never re-executes rounds < i.
    * Survivor sets shrink monotonically, so an unchanged COUNT is an
    * unchanged SET — the fixpoint test needs no set comparison.
    * Converges in at most the peeling-cascade depth; `maxRounds`
    * fail-louds (the [[Dedup.nearDupClusters]] discipline) rather than
    * returning a half-peeled core.
    *
    * @return (node, core_degree) for the k-core's members —
    *         core_degree is the degree within the core subgraph, ≥ k
    *         by construction; empty if the graph has no k-core
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 20,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct().transform(Persist.round)
    var prev = -1L
    var deg: DataFrame = null
    var done = false
    var r = 0
    while (!done && r < maxRounds) {
      deg = e.select(col("u").as("node"))
        .unionByName(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("core_degree"))
        .filter(col("core_degree") >= k)
        .transform(Persist.round)
      val n = deg.count()
      if (n == prev) done = true
      else {
        prev = n
        val keep = deg.select(col("node"))
        e = e
          .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
          .transform(Persist.round)
      }
      r += 1
    }
    if (!done) {
      throw new IllegalStateException(
        s"kCore did not reach a fixpoint in $maxRounds rounds — the " +
          "peeling cascade is deeper; raise maxRounds")
    }
    deg
  }

  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val (e, nodes, n) = prProject(edges, srcCol, dstCol)
    val init = nodes.withColumn("rank", lit(1.0 / n))
    prRounds(e, nodes, n, init, iterations, damping)
  }

  /** Warm-start continuation of [[pageRank]] — incremental rank
    * maintenance for a growing graph (round 19, completing the
    * incremental family: [[appendToComponents]] for labels,
    * `incrementalExactDedup`/`appendToIvfIndex` for their stores, this
    * for centralities). The power iteration is an affine contraction,
    * so ANY starting vector converges to the same fixpoint — a cold
    * start just pays more rounds to get there, and at 100 TB every
    * round is a full node-keyed shuffle over the rank table, so rounds
    * saved are the bill. Yesterday's stored ranks are already near the
    * new fixpoint when the nightly edge delta is small; nodes the
    * stored table does not cover (the delta's new pages) start at
    * 1/n over the NEW node set, nodes no longer in the graph drop out
    * (ranks ride on the node spine), and no re-normalization is
    * applied — the teleport term re-centers mass by itself.
    *
    * Two contracts, both gated:
    *  - EXACT RESUME (the value oracle, q232): on an unchanged graph,
    *    `resumePageRank(pageRank(e, k), e, m)` ≡ `pageRank(e, k+m)`
    *    round for round — same quantized-contribution arithmetic, same
    *    literals, so the composition is replayed by the same unrolled
    *    CTE oracle as a (k+m)-round run.
    *  - WARM-START WINS (the spec): after equal rounds on a grown
    *    graph, the warm start sits strictly closer (L1) to the
    *    converged fixpoint than the cold start.
    *
    * Stored-rank contract: one row per node — a duplicate would feed a
    * node's contributions twice, silently; validated up front with one
    * metadata-sized aggregate (two longs collected), the same cost
    * class as the node count the cold start already pays.
    */
  def resumePageRank(ranks: DataFrame, edges: DataFrame, iterations: Int,
      damping: Double = 0.85, srcCol: String = "src",
      dstCol: String = "dst", nodeCol: String = "node",
      rankCol: String = "rank"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val stored = ranks.select(col(nodeCol).as("node"),
      col(rankCol).cast("double").as("__r0"))
    val dup = stored.agg(count(lit(1)), count_distinct(col("node")))
      .collect()(0)
    require(dup.getLong(0) == dup.getLong(1),
      s"resumePageRank: stored ranks carry ${dup.getLong(0)} rows over " +
        s"${dup.getLong(1)} distinct nodes — a duplicate node would " +
        "contribute twice; dedup the rank table first")
    val (e, nodes, n) = prProject(edges, srcCol, dstCol)
    val init = nodes.join(stored, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__r0"), lit(1.0 / n)).as("rank"))
    prRounds(e, nodes, n, init, iterations, damping)
  }

  /** Shared head of [[pageRank]]/[[resumePageRank]]: the narrow edge
    * projection, the node spine, and the node count. Materialized ONCE
    * (the hostReputation lesson): the caller's edge derivation may be
    * a join+distinct over the raw corpus, and it feeds nodes, deg, and
    * every iteration's contribution join — without this it re-executes
    * ~2+iterations times (measured 2.5× on the q181 gate).
    */
  private def prProject(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame, Double) = {
    val e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .transform(Persist.round)
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node")))
      .distinct().transform(Persist.round)
    (e, nodes, nodes.count().toDouble)
  }

  /** The quantized-contribution power-iteration rounds shared by
    * [[pageRank]] (uniform init) and [[resumePageRank]] (stored init)
    * — one body, so a fix to either cannot silently miss the other and
    * the exact-resume identity holds by construction.
    */
  private def prRounds(e: DataFrame, nodes: DataFrame, n: Double,
      init: DataFrame, iterations: Int, damping: Double): DataFrame = {
    val deg = e.groupBy(col("__src").as("node"))
      .agg(count(lit(1)).as("__outdeg")).transform(Persist.round)
    val scale = 1e12
    var ranks = init.transform(Persist.round)
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(deg, Seq("node"), "left")
      val contrib = withDeg.where(col("__outdeg").isNotNull)
        .join(e.withColumnRenamed("__src", "node"), Seq("node"))
        .select(col("__dst").as("node"),
          round(col("rank") / col("__outdeg").cast("double") * lit(scale))
            .cast("long").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__cs"))
      // dangling mass as a 1-row aggregate CROSS-JOINED into the rank
      // update instead of collected per round (round 21): the collect
      // was a second Spark job per iteration re-running the ranks⋈deg
      // join; fused, each round is ONE action (the checkpoint). The
      // long→double cast and the /scale/n association are the exact
      // IEEE operations the collected-literal form performed on the
      // driver, so every rank is bit-identical and the oracle replay
      // is unchanged.
      val dang = withDeg.where(col("__outdeg").isNull)
        .agg(coalesce(sum(round(col("rank") * lit(scale)).cast("long")),
          lit(0L)).as("__dang"))
      // association order mirrored literally by the oracle:
      // (1-d)/n + d * (cs/scale + (dang/scale)/n)
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(dang)
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__cs"), lit(0L)).cast("double") / lit(scale) +
              (col("__dang").cast("double") / lit(scale)) / lit(n)))
            .as("rank"))
        .transform(Persist.round)
    }
    ranks
  }

  /** Edge-weighted PageRank (the Xing–Ghorbani WI'04 generalization of
    * Page et al. 1999): a node's rank flows to its out-neighbors in
    * proportion to EDGE WEIGHT rather than uniformly — contribution
    * from u to v is rank(u)·w(u,v)/W(u) with W(u) the total out-weight
    * — so purchase counts, click volumes, and transfer amounts shape
    * the centrality instead of being flattened to 0/1 adjacency (the
    * VERDICT r17 gap: every real interaction graph carries weights).
    *
    * Weight contract (the [[cheapestPaths]] discipline): weights are
    * LONGS — callers with float weights quantize first; a value that
    * does not survive the long cast raises rather than truncating, and
    * non-positive weights fail loudly PER EDGE, before parallel edges
    * collapse (ADVICE r18: a −3 edge masked by a +5 parallel edge must
    * raise, not sum to +2) — a 0-weight edge is "no edge", and
    * silently dropping it would change which nodes count as dangling.
    * Parallel edges sum their weights (the natural multigraph
    * collapse: two 3-unit orders ≡ one 6-unit order).
    *
    * Determinism (the [[pageRank]] discipline, oracle-mirrored literal
    * for literal): per-edge contributions quantize to 1e-12-scaled
    * longs BEFORE the corpus-wide sum — round(rank·(w/W)·scale) — so
    * no float addition order can shift a rank; dangling mass (nodes
    * with no out-edges) redistributes uniformly, collected as ONE long
    * per round; the update is (1−d)/n + d·(cs/scale + (dang/scale)/n).
    *
    * Scale shape: identical to [[pageRank]] — the edge projection
    * (with summed weights and the guard applied) checkpoints once and
    * feeds nodes, the out-weight table, and every round's contribution
    * join; per-round shuffle is one node-keyed join + aggregate; the
    * only collect is the 1-row dangling mass.
    *
    * @param weightCol long-typed (or losslessly castable) POSITIVE
    *                  edge weight; lossy casts and w ≤ 0 raise
    * @return (node, rank) over every node in the edge list
    */
  def weightedPageRank(edges: DataFrame, iterations: Int,
      damping: Double = 0.85, srcCol: String = "src",
      dstCol: String = "dst", weightCol: String = "w"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(weightCol).isNotNull)
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        // positivity is enforced PER EDGE, before the parallel-edge
        // sum (ADVICE r18): a negative weight masked by a positive
        // parallel edge (+5 and -3 on the same src/dst sum to +2)
        // would otherwise pass the post-sum check while injecting a
        // negative rank contribution.
        when(col(weightCol).cast("long") =!= col(weightCol),
          raise_error(concat(
            lit("weightedPageRank: weight not losslessly castable to " +
              "long (quantize first): "),
            col(weightCol).cast("string"))))
          .when(col(weightCol).cast("long") <= 0L,
            raise_error(concat(
              lit("weightedPageRank requires positive weights; got "),
              col(weightCol).cast("string"))))
          .otherwise(col(weightCol).cast("long")).as("__w"))
      .groupBy(col("__src"), col("__dst"))
      .agg(sum(col("__w")).as("__w"))
      .transform(Persist.round)
    // eager 1-row pass: forces the per-edge guards above to fire at
    // call time (Persist.round's backends are eager too — this is the
    // belt-and-braces that keeps the raise out of the caller's first
    // action even if a backend ever turns lazy)
    e.agg(coalesce(min(col("__w")), lit(1L))).collect()
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node")))
      .distinct().transform(Persist.round)
    val n = nodes.count().toDouble
    val outW = e.groupBy(col("__src").as("node"))
      .agg(sum(col("__w")).as("__outw")).transform(Persist.round)
    val scale = 1e12
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).transform(Persist.round)
    for (_ <- 1 to iterations) {
      val withW = ranks.join(outW, Seq("node"), "left")
      val contrib = withW.where(col("__outw").isNotNull)
        .join(e.withColumnRenamed("__src", "node"), Seq("node"))
        .select(col("__dst").as("node"),
          // association mirrored by the oracle:
          // round(rank * (w / W) * scale)
          round(col("rank") *
            (col("__w").cast("double") / col("__outw").cast("double")) *
            lit(scale)).cast("long").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__cs"))
      // fused 1-row dangling aggregate (round 21; see [[prRounds]]) —
      // same IEEE cast/divide chain as the collected literal, one
      // action per round instead of two
      val dang = withW.where(col("__outw").isNull)
        .agg(coalesce(sum(round(col("rank") * lit(scale)).cast("long")),
          lit(0L)).as("__dang"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(dang)
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__cs"), lit(0L)).cast("double") / lit(scale) +
              (col("__dang").cast("double") / lit(scale)) / lit(n)))
            .as("rank"))
        .transform(Persist.round)
    }
    ranks
  }

  /** [[weightedPageRank]] × [[personalizedPageRank]] — the full matrix
    * corner: rank flows in proportion to EDGE WEIGHT while the restart
    * and dangling mass land on a seed-set preference vector, so ranks
    * measure VOLUME-weighted proximity to the seeds ("which suppliers
    * are closest to these accounts, by how much they actually buy" —
    * the recommendation/blast-radius primitive where both the weights
    * and the conditioning matter). Same weight contract as
    * [[weightedPageRank]] (longs; lossy casts raise; w ≤ 0 fails loud;
    * parallel edges sum), same seed contract as
    * [[personalizedPageRank]] (absent seeds fail loud, unreachable
    * nodes report exactly 0.0), same quantized-round determinism —
    * update rank' = (1−d)·p + d·(cs/scale + (dang/scale)·p) with
    * contributions round(rank·(w/W)·scale), oracle-mirrored literally.
    */
  def weightedPersonalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      weightCol: String = "w", seedCol: String = "node"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(weightCol).isNotNull)
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        // per-edge positivity BEFORE the parallel-edge sum (ADVICE
        // r18; see [[weightedPageRank]] — a masked negative edge must
        // not pass)
        when(col(weightCol).cast("long") =!= col(weightCol),
          raise_error(concat(
            lit("weightedPersonalizedPageRank: weight not losslessly " +
              "castable to long (quantize first): "),
            col(weightCol).cast("string"))))
          .when(col(weightCol).cast("long") <= 0L,
            raise_error(concat(
              lit("weightedPersonalizedPageRank requires positive " +
                "weights; got "),
              col(weightCol).cast("string"))))
          .otherwise(col(weightCol).cast("long")).as("__w"))
      .groupBy(col("__src"), col("__dst"))
      .agg(sum(col("__w")).as("__w"))
      .transform(Persist.round)
    // eager guard-firing pass, as in [[weightedPageRank]]
    e.agg(coalesce(min(col("__w")), lit(1L))).collect()
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node")))
      .distinct().transform(Persist.round)
    val sd = broadcast(
      seeds.select(col(seedCol).as("node")).distinct())
    val ns = nodes.join(sd, Seq("node"), "left_semi").count()
    require(ns > 0, "no seed node is present in the edge list")
    val outW = e.groupBy(col("__src").as("node"))
      .agg(sum(col("__w")).as("__outw")).transform(Persist.round)
    val pref = nodes
      .join(sd.withColumn("__s", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("__s").isNotNull, lit(1.0 / ns.toDouble))
          .otherwise(lit(0.0)).as("__p"))
      .transform(Persist.round)
    val scale = 1e12
    var ranks = pref.select(col("node"), col("__p").as("rank"))
      .transform(Persist.round)
    for (_ <- 1 to iterations) {
      val withW = ranks.join(outW, Seq("node"), "left")
      val contrib = withW.where(col("__outw").isNotNull)
        .join(e.withColumnRenamed("__src", "node"), Seq("node"))
        .select(col("__dst").as("node"),
          round(col("rank") *
            (col("__w").cast("double") / col("__outw").cast("double")) *
            lit(scale)).cast("long").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__cs"))
      // fused 1-row dangling aggregate (round 21; see [[prRounds]])
      val dang = withW.where(col("__outw").isNull)
        .agg(coalesce(sum(round(col("rank") * lit(scale)).cast("long")),
          lit(0L)).as("__dang"))
      ranks = pref.join(contrib, Seq("node"), "left")
        .crossJoin(dang)
        .select(col("node"),
          (lit(1.0 - damping) * col("__p") + lit(damping) *
            (coalesce(col("__cs"), lit(0L)).cast("double") / lit(scale) +
              (col("__dang").cast("double") / lit(scale)) * col("__p")))
            .as("rank"))
        .transform(Persist.round)
    }
    ranks
  }

  /** Personalized PageRank (Page et al. 1999 §6; Jeh & Widom WWW'03):
    * [[pageRank]] with the uniform teleport replaced by a PREFERENCE
    * VECTOR over a seed set — both the (1−d) restart mass and the
    * dangling mass land on the seeds instead of everywhere, so ranks
    * measure proximity TO THE SEEDS through the link structure: the
    * "related to these accounts / these pages / this topic" serving
    * primitive (recommendation candidates, topic-conditioned authority,
    * fraud blast-radius weighting) that global PageRank by definition
    * cannot answer.
    *
    * Same determinism discipline as [[pageRank]]: per-edge
    * contributions quantize to 1e-12-scaled longs BEFORE every
    * corpus-wide sum; each round collects ONE metadata row (the
    * dangling mass); the update is literal-mirrored by the oracle —
    * rank' = (1−d)·p + d·(cs/scale + (dang/scale)·p), with p = 1/|S∩V|
    * on seeds and 0.0 elsewhere. Ranks start AT the preference vector
    * (the standard PPR initialization — mass already at the seeds).
    * Nodes unreachable from the seeds report exactly 0.0.
    *
    * Scale shape: identical to [[pageRank]] (edge projection
    * checkpointed once, node-keyed contribution join + aggregate per
    * round) plus one broadcast seed join when the preference vector is
    * built — seeds are query metadata, never corpus-sized.
    *
    * Seeds absent from the graph carry no mass (they can neither emit
    * nor receive through edges); the preference vector normalizes over
    * the seeds PRESENT, and an entirely-absent seed set fails loudly
    * rather than silently returning the zero vector.
    *
    * @param seeds frame carrying `seedCol` — the restart set; metadata-
    *              sized, broadcast
    * @return (node, rank) over every node in the edge list
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      seedCol: String = "node"): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .transform(Persist.round)
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node")))
      .distinct().transform(Persist.round)
    val sd = broadcast(
      seeds.select(col(seedCol).as("node")).distinct())
    val ns = nodes.join(sd, Seq("node"), "left_semi").count()
    require(ns > 0, "no seed node is present in the edge list")
    val deg = e.groupBy(col("__src").as("node"))
      .agg(count(lit(1)).as("__outdeg")).transform(Persist.round)
    val pref = nodes
      .join(sd.withColumn("__s", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("__s").isNotNull, lit(1.0 / ns.toDouble))
          .otherwise(lit(0.0)).as("__p"))
      .transform(Persist.round)
    val scale = 1e12
    var ranks = pref.select(col("node"), col("__p").as("rank"))
      .transform(Persist.round)
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(deg, Seq("node"), "left")
      val contrib = withDeg.where(col("__outdeg").isNotNull)
        .join(e.withColumnRenamed("__src", "node"), Seq("node"))
        .select(col("__dst").as("node"),
          round(col("rank") / col("__outdeg").cast("double") * lit(scale))
            .cast("long").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__cs"))
      // fused 1-row dangling aggregate (round 21; see [[prRounds]])
      val dang = withDeg.where(col("__outdeg").isNull)
        .agg(coalesce(sum(round(col("rank") * lit(scale)).cast("long")),
          lit(0L)).as("__dang"))
      // association order mirrored literally by the oracle:
      // (1-d)*p + d * (cs/scale + (dang/scale)*p)
      ranks = pref.join(contrib, Seq("node"), "left")
        .crossJoin(dang)
        .select(col("node"),
          (lit(1.0 - damping) * col("__p") + lit(damping) *
            (coalesce(col("__cs"), lit(0L)).cast("double") / lit(scale) +
              (col("__dang").cast("double") / lit(scale)) * col("__p")))
            .as("rank"))
        .transform(Persist.round)
    }
    ranks
  }

  /** Multi-source BFS: minimum hop count from any seed node to every
    * node reachable within `maxHops` — the k-hop-neighborhood /
    * blast-radius primitive (who is ≤ 3 links from a flagged account;
    * which pages sit ≤ 2 hops from a seed crawl list). Unweighted
    * shortest paths ONLY — hop counts are exact small integers, so the
    * whole artifact is value-oracle-able, unlike weighted Dijkstra
    * whose float relaxations are engine-order-dependent.
    *
    * Frontier-expansion form (the Pregel iteration pattern, Malewicz
    * SIGMOD'10, expressed as dataframe joins like [[pageRank]]): round
    * h joins the CURRENT frontier — only nodes first reached at h−1,
    * never the full visited set — to the adjacency list, anti-joins
    * out already-visited nodes, and checkpoints. Work per round is
    * frontier-degree-sum; total work is each edge examined at most
    * twice (once per endpoint's first reach), the textbook BFS bound.
    * The driver sees one COUNT per round (loop control, the [[kCore]]
    * discipline) — never node data.
    *
    * `maxHops` is a SEMANTIC radius, not a convergence guard: the
    * result is "distances within maxHops", and a frontier still live
    * at the cap simply stops (standard k-hop semantics; pass a
    * diameter bound to get full single-source distances).
    *
    * Self-loops and duplicate edges collapse; null endpoints drop;
    * seeds not present in the edge list still report hops = 0 (they
    * are trivially reachable from themselves).
    *
    * @param directed false = treat edges as undirected (both
    *                 directions traversable)
    * @return (node, hops) — one row per node reached within maxHops,
    *         hops = minimal distance from the nearest seed
    */
  def shortestHops(edges: DataFrame, sources: DataFrame, maxHops: Int,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", directed: Boolean = false): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val fwd = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("__u"), col(dstCol).as("__v"))
    val adj = (if (directed) fwd
      else fwd.unionByName(
        fwd.select(col("__v").as("__u"), col("__u").as("__v"))))
      .distinct().transform(Persist.round)
    var dist = sources.select(col(nodeCol).as("node")).distinct()
      .where(col("node").isNotNull)
      .withColumn("hops", lit(0L)).transform(Persist.round)
    var frontier = dist
    var h = 0L
    var live = frontier.count() > 0
    while (live && h < maxHops) {
      h += 1
      frontier = frontier
        .join(adj.withColumnRenamed("__u", "node"), Seq("node"))
        .select(col("__v").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .withColumn("hops", lit(h))
        .transform(Persist.round)
      live = frontier.count() > 0
      if (live) dist = dist.unionByName(frontier).transform(Persist.round)
    }
    dist
  }

  /** Weighted shortest paths within a hop radius — [[shortestHops]]'
    * weighted sibling: minimum total edge WEIGHT from any seed over
    * paths of at most `maxHops` edges (bounded Bellman–Ford). Weights
    * are LONGS by contract: [[shortestHops]]' scaladoc scopes out float
    * Dijkstra because float relaxations are engine-order-dependent, and
    * integer costs are the remedy — every relaxation is an exact long
    * sum and a min, so the whole artifact is value-oracle-able (callers
    * with float costs quantize first, the repo-wide discipline).
    * Negative weights fail loudly (one metadata aggregate up front):
    * under a hop cap a negative edge makes "cheapest within H hops"
    * well-defined but useless for the proximity semantics this serves.
    *
    * Iteration (the frontier discipline of [[shortestHops]]): round h
    * relaxes only the nodes IMPROVED in round h−1 — a settled node
    * re-emits nothing — so per-round work is frontier-degree-bounded
    * and total work is O(maxHops × m) worst-case but frontier-sized in
    * practice. Parallel edges collapse to their cheapest; `maxHops` is
    * a SEMANTIC radius (the standard k-hop-budget form), and the loop
    * exits early when a round improves nothing — the fixpoint within
    * the radius, identical to running the remaining rounds as no-ops
    * (which is exactly how the oracle replays it).
    *
    * @param weightCol long-typed (or losslessly castable) non-negative
    *                  edge cost column — a value that does NOT survive
    *                  the long round-trip raises at runtime rather
    *                  than truncating
    * @return (node, cost) — one row per node reachable within maxHops,
    *         cost = minimum total weight from the nearest seed
    */
  def cheapestPaths(edges: DataFrame, sources: DataFrame, maxHops: Int,
      srcCol: String = "src", dstCol: String = "dst",
      weightCol: String = "w", nodeCol: String = "node",
      directed: Boolean = false): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val fwd = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(weightCol).isNotNull && col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("__u"), col(dstCol).as("__v"),
        // fail-loud on lossy casts (ADVICE r17): a fractional weight
        // silently truncating (0.9 -> 0; -0.7 -> 0, which would also
        // slip past the negative-weight check below) violates the
        // quantize-first contract — compare the long cast back against
        // the original and raise on mismatch (NaN compares false too).
        when(col(weightCol).cast("long") === col(weightCol),
          col(weightCol).cast("long"))
          .otherwise(raise_error(concat(
            lit("cheapestPaths: weight not losslessly castable to " +
              "long (quantize first): "),
            col(weightCol).cast("string")))).as("__w"))
    val adj = (if (directed) fwd
      else fwd.unionByName(fwd.select(col("__v").as("__u"),
        col("__u").as("__v"), col("__w"))))
      .groupBy(col("__u"), col("__v")).agg(min(col("__w")).as("__w"))
      .transform(Persist.round)
    val negatives = adj.agg(
      coalesce(min(col("__w")), lit(0L))).collect()(0).getLong(0)
    require(negatives >= 0,
      s"cheapestPaths requires non-negative weights; min weight = $negatives")
    var dist = sources.select(col(nodeCol).as("node")).distinct()
      .where(col("node").isNotNull)
      .withColumn("cost", lit(0L)).transform(Persist.round)
    var frontier = dist
    var h = 0
    var live = frontier.count() > 0
    while (live && h < maxHops) {
      h += 1
      val cand = frontier
        .join(adj.withColumnRenamed("__u", "node"), Seq("node"))
        .groupBy(col("__v").as("node"))
        .agg(min(col("cost") + col("__w")).as("__c"))
      // improved = strictly cheaper than the settled cost (or unseen)
      frontier = cand
        .join(dist.withColumnRenamed("cost", "__old"), Seq("node"), "left")
        .where(col("__old").isNull || col("__c") < col("__old"))
        .select(col("node"), col("__c").as("cost"))
        .transform(Persist.round)
      live = frontier.count() > 0
      if (live) {
        dist = dist.unionByName(frontier)
          .groupBy(col("node")).agg(min(col("cost")).as("cost"))
          .transform(Persist.round)
      }
    }
    dist
  }

  /** Connected components by min-label propagation: every node ends up
    * labeled with the SMALLEST node id reachable from it — a canonical,
    * engine-independent component id (the same canonical-min convention
    * as [[Dedup]]'s cluster closure and [[Linkage.resolveEntities]];
    * this is the graph-general form those entity-specific closures
    * specialize).
    *
    * Iteration: synchronous label relaxation WITH POINTER JUMPING —
    * each round every node first takes min(own label, neighbors'
    * labels) (one graph hop), then jumps through the label table
    * itself: component := relaxed(relaxed(node)) (path doubling,
    * Shiloach–Vishkin 1982). The jump is sound because a label is
    * always the id of a REACHABLE node (the relaxation only ever
    * installs neighbor labels, and reachability is transitive), so
    * min-reachable stays min-reachable and the FIXPOINT is unchanged —
    * but the propagation distance per round roughly doubles,
    * collapsing rounds from O(diameter) to O(log diameter): a
    * 199-hop path converges in 8 rounds instead of 199 (spec-gated),
    * and the q208 co-order giant component at sf0.1 settles in 17
    * rounds. At gate scale the loop is per-round-overhead-bound
    * (tiny label tables, fixed job/checkpoint cost), so the local
    * wall win sits inside window noise — the round count is the
    * claim, because at 100 TB each round is a full shuffle of the
    * label table and rounds ARE the bill. Convergence is
    * detected by "no label changed this round" (an aggregate count,
    * not a collect) comparing the round's FINAL label to its starting
    * one — at the true fixpoint both the hop and the jump are no-ops.
    * `maxRounds` is a fail-loud guard against a pathological chain
    * (the [[kCore]] discipline: a silent early stop would emit WRONG
    * labels, so non-convergence throws). The literature's
    * large-star/small-star contraction (Kiveris et al., SoCC'14)
    * additionally rewrites the EDGE set per round; label-table
    * doubling gets the same O(log) round count on a static adjacency
    * — the cheaper move at this operator's scale shape.
    *
    * Scale shape: each round is two narrow joins — labels join the
    * adjacency list at the node key (both frames id-partitioned,
    * shuffle payload = (node, long) pairs), aggregate min per
    * neighbor; then the jump self-joins the relaxed label table on
    * the LABEL key (payload again (long, long) pairs — node text or
    * payloads never enter the loop). The convergence test is a 1-row
    * count aggregate. localCheckpoint per round truncates lineage
    * exactly like [[pageRank]]; the relaxed table checkpoints once
    * per round because the jump reads it on both sides.
    *
    * Isolated nodes (in `nodes` but no surviving edge) keep themselves
    * as their component. Null endpoints and self-loops drop.
    *
    * @return (node, component) — component = min reachable node id
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 30,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val fwd = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("__u"), col(dstCol).as("__v"))
    val adj = fwd.unionByName(
        fwd.select(col("__v").as("__u"), col("__u").as("__v")))
      .distinct().transform(Persist.round)
    val nodes = adj.select(col("__u").as("node")).distinct()
    var labels = nodes.withColumn("component", col("node"))
      .transform(Persist.round)
    var r = 0
    var changed = 1L
    while (changed > 0 && r < maxRounds) {
      val fromNbr = adj
        .join(labels.withColumnRenamed("node", "__u"), Seq("__u"))
        .groupBy(col("__v").as("node"))
        .agg(min(col("component")).as("__nc"))
      // hop: min(own, neighbors') — checkpointed because the jump
      // below reads it on BOTH sides of a self-join (re-deriving it
      // twice would re-run the adjacency shuffle)
      val relaxed = labels.join(fromNbr, Seq("node"), "left")
        .select(col("node"), col("component").as("__old"),
          least(col("component"), coalesce(col("__nc"), col("component")))
            .as("__rc"))
        .transform(Persist.round)
      // jump: component := relaxed(relaxed(node)). __rc is always a
      // real node id (labels only ever hold node ids), so the lookup
      // hits; left + coalesce is belt-and-braces, not a semantic.
      // Round 21: the jump runs TWICE per round (label-table self-
      // composition squared — reach ~4× per round instead of ~2×, so
      // the round count drops from ~log2 to ~log4 of the diameter:
      // q208's giant component converges in 9 rounds instead of 17).
      // Soundness is the same argument applied twice: a jumped label
      // is still the id of a reachable node, so min-reachable is
      // preserved and the FIXPOINT — the only thing the oracle gates —
      // is unchanged. Each extra jump is one node-keyed (long, long)
      // self-join; the expensive graph hop above runs half as often.
      val j1 = relaxed.alias("l")
        .join(relaxed.select(col("node").as("__t"), col("__rc").as("__tc"))
          .alias("p"), col("l.__rc") === col("p.__t"), "left")
        .select(col("l.node").as("node"), col("l.__old").as("__old"),
          least(col("l.__rc"), coalesce(col("p.__tc"), col("l.__rc")))
            .as("__rc"))
        .transform(Persist.round)
      val next = j1.alias("l")
        .join(j1.select(col("node").as("__t"), col("__rc").as("__tc"))
          .alias("p"), col("l.__rc") === col("p.__t"), "left")
        .select(col("l.node").as("node"),
          least(col("l.__rc"), coalesce(col("p.__tc"), col("l.__rc")))
            .as("component"),
          (least(col("l.__rc"), coalesce(col("p.__tc"), col("l.__rc")))
            < col("l.__old")).as("__chg"))
        .transform(Persist.round)
      changed = next.where(col("__chg")).count()
      labels = next.drop("__chg")
      r += 1
    }
    if (changed > 0) {
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds — " +
          "graph diameter exceeds the guard; raise maxRounds")
    }
    labels
  }

  /** Incremental connected components (VERDICT r18 gap #1 — the last
    * stored artifact without a maintenance form): merge a BATCH of new
    * edges into a stored [[connectedComponents]] labeling without
    * re-clustering the corpus. `appendToComponents(cc(E), ΔE)` ≡
    * `cc(E ∪ ΔE)` — gated literally by the q230 oracle and the spec's
    * set-equality replay.
    *
    * Why it works: a stored labeling is a spanning-star compression of
    * the old graph — every old PATH is summarized by "same component
    * id". New edges can only MERGE components (edge deletion is out of
    * scope, as in every incremental form here — q74/q128/q190 append
    * batches, never retract). So project each new edge into COMPONENT
    * space (u→label(u), with an unseen node its own label), run the
    * full fixpoint on that component-level graph — whose size is
    * bounded by the BATCH, not the corpus: ≤ 2·|ΔE| nodes — and apply
    * the resulting old→new remap to the stored table with one join.
    *
    * Component-id convention preserved: [[connectedComponents]] labels
    * every component by its MINIMUM node id; component ids are
    * therefore node ids, the merged component's new id = min over the
    * merged ids = the global minimum node id — the append output is
    * bit-identical to a fresh re-cluster, so appends CHAIN (the spec
    * replays two generations).
    *
    * Scale shape (the 100 TB ingest path this exists for): ONE
    * batch-sized join against the stored labels (broadcastable when
    * the batch is), the iterative fixpoint over the batch-bounded
    * component graph (frontier joins on ≤ 2·|ΔE| rows — effectively
    * free next to corpus-scale rounds), then ONE scan of the stored
    * labels joined to the remap (remap is batch-bounded → broadcast
    * hash join, no corpus shuffle). Unaffected components ride through
    * the left join untouched. Total: corpus is SCANNED once and
    * SHUFFLED never, vs the full re-cluster's diameter-many corpus
    * shuffles.
    *
    * Contract: `labels` must be a CONVERGED labeling over the old
    * graph ([[connectedComponents]] output or a previous append) —
    * one row per node, component = min node id of its component.
    * Nodes in `newEdges` absent from `labels` are new and join the
    * output; null endpoints and self-loops drop ([[connectedComponents]]
    * hygiene).
    *
    * @param labels    stored (nodeCol, componentCol) labeling
    * @param newEdges  the edge batch to merge
    * @return the updated labeling over old ∪ new nodes
    */
  def appendToComponents(labels: DataFrame, newEdges: DataFrame,
      maxRounds: Int = 30, srcCol: String = "src",
      dstCol: String = "dst", nodeCol: String = "node",
      componentCol: String = "component"): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val e = newEdges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("__u"), col(dstCol).as("__v"))
      .distinct().transform(Persist.round)
    val lbl = labels.select(col(nodeCol).as("node"),
      col(componentCol).as("component"))
    // batch nodes → current labels (unseen node = its own label);
    // batch-sized — one stored-labels join (left side broadcastable)
    val batchNodes = e.select(col("__u").as("node"))
      .unionByName(e.select(col("__v").as("node"))).distinct()
    val batchLbl = batchNodes.join(lbl, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("__c"))
      .transform(Persist.round)
    // the component-level merge graph: ≤ 2·|ΔE| nodes by construction
    val ce = e
      .join(batchLbl.withColumnRenamed("node", "__u")
        .withColumnRenamed("__c", "__cu"), Seq("__u"))
      .join(batchLbl.withColumnRenamed("node", "__v")
        .withColumnRenamed("__c", "__cv"), Seq("__v"))
      .select(col("__cu").as("src"), col("__cv").as("dst"))
      .where(col("src") =!= col("dst"))
    // old component id → merged component id (min over the merged set,
    // because component ids ARE node ids under the min convention);
    // only components actually touched by the batch appear here
    val remap = connectedComponents(ce, maxRounds)
      .select(col("node").as("__oc"), col("component").as("__nc"))
      .transform(Persist.round)
    val updated = lbl
      .join(remap.withColumnRenamed("__oc", "component"),
        Seq("component"), "left")
      .select(col("node"),
        coalesce(col("__nc"), col("component")).as("component"))
    // new nodes: remap their provisional self-label the same way
    val added = batchLbl
      .join(lbl.select(col("node")), Seq("node"), "left_anti")
      .join(remap.withColumnRenamed("__oc", "__c"), Seq("__c"), "left")
      .select(col("node"),
        coalesce(col("__nc"), col("__c")).as("component"))
    updated.unionByName(added)
  }

  /** Incremental triangle maintenance (VERDICT r19 #5 — completes the
    * incremental family: labels/ranks/stores had append forms, motif
    * counts did not): merge an edge batch into stored
    * [[triangleCounts]] without re-enumerating the corpus's wedges.
    * `appendToTriangleCounts(tc(E), E, ΔE)` ≡ `tc(E ∪ ΔE)` — gated by
    * the q238 oracle (the full-graph q186 replay) and the spec's
    * append-≡-recompute set equality.
    *
    * Why it works: appending edges only ADDS triangles (no deletions,
    * the q230 convention), and every new triangle contains ≥ 1 batch
    * edge — so it is discoverable from the batch alone: for each batch
    * edge (u, v), the new triangles through it are the common
    * neighbors of u and v in the FULL graph. A triangle with 2 or 3
    * batch edges surfaces once per batch edge, so candidates dedup by
    * their sorted corner triple before counting (array_sort, not
    * arithmetic — node ids may be strings).
    *
    * Scale shape: the stored edge list is scanned (anti-join + closure
    * join) but never wedge-exploded — wedge work is Σ over BATCH edges
    * of min(deg u, deg v) (each edge pivots at its lower-(deg, id)
    * endpoint, the Chiba–Nishizeki edge-iterator bound), vs the full
    * recount's Σ over ALL edges. The candidate frame is batch-bounded;
    * the corner dedup and per-node delta are candidate-sized
    * aggregates; the final merge is one left join against the stored
    * counts. A batch edge between two hubs still enumerates a hub
    * neighborhood — that is the operator's inherent cost (AQE handles
    * the skew), not a plan defect.
    *
    * Contract: `counts` is a [[triangleCounts]] output (or a previous
    * append) over exactly the edge set `edges`; `newEdges` is the
    * batch. Batch edges already present (either orientation), nulls,
    * and self-loops drop; batch-only nodes join the output (zeros
    * included, the triangleCounts every-node contract).
    */
  def appendToTriangleCounts(counts: DataFrame, edges: DataFrame,
      newEdges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val old = canon(edges).transform(Persist.round) // anti-join + union
    val delta = canon(newEdges).join(old, Seq("u", "v"), "left_anti")
      .transform(Persist.round)
    // full edge set: the closure side and the adjacency both read it
    val full = old.unionByName(delta).transform(Persist.round)
    val adj = full.unionByName(
      full.select(col("v").as("u"), col("u").as("v")))
    val deg = adj.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("__deg"))
      .transform(Persist.round) // pivot orientation + the node universe
    // pivot each delta edge at its lower-(degree, id) endpoint
    val du = deg.select(col("node").as("u"), col("__deg").as("__du"))
    val dv = deg.select(col("node").as("v"), col("__deg").as("__dv"))
    val ordU = struct(col("__du").as("d"), col("u").as("n"))
    val ordV = struct(col("__dv").as("d"), col("v").as("n"))
    val piv = delta.join(du, Seq("u")).join(dv, Seq("v"))
      .select(when(ordU < ordV, col("u")).otherwise(col("v")).as("p"),
        when(ordU < ordV, col("v")).otherwise(col("u")).as("q"))
    // wedges at the pivot, closed against the full canonical edge list
    val triples = piv
      .join(adj.select(col("u").as("p"), col("v").as("w")), Seq("p"))
      .where(col("w") =!= col("q"))
      .join(full.select(col("u").as("__cu"), col("v").as("__cv")),
        least(col("q"), col("w")) === col("__cu") &&
          greatest(col("q"), col("w")) === col("__cv"))
      .select(array_sort(array(col("p"), col("q"), col("w"))).as("__t"))
      .distinct() // a 2/3-batch-edge triangle surfaced once per edge
    val deltaCounts = triples.select(explode(col("__t")).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("__dt"))
    deg.select(col("node"))
      .join(counts.select(col("node"), col("triangles")), Seq("node"),
        "left")
      .join(deltaCounts, Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("triangles"), lit(0L)) +
          coalesce(col("__dt"), lit(0L))).as("triangles"))
  }

  /** Label-propagation community detection (Raghavan, Albert & Kumara,
    * PRE 2007), DETERMINISTIC synchronous variant: every node starts
    * as its own label; each round every node adopts the most frequent
    * label among its neighbors, ties broken to the SMALLEST label; the
    * result is "labels after exactly `rounds` synchronous rounds".
    * Unlike [[connectedComponents]] (which answers reachability), LPA
    * finds DENSE regions inside a connected graph — the near-linear
    * community baseline every graph library ships.
    *
    * Why fixed rounds, not convergence: synchronous LPA provably
    * oscillates on bipartite structures (the classic 2-coloring flip),
    * so "run to fixpoint" is not well-defined; the published remedies
    * (async order, random tie-breaks) are engine-order-dependent and
    * would be unverifiable cross-engine. Fixed-round synchronous
    * updates with the min-label tie-break make every round a pure
    * function of the previous labeling — replayable token for token by
    * the oracle (the q181 pageRank replay discipline). In practice
    * labels stabilize in 3–5 rounds on community-structured graphs
    * (Raghavan §4); pass a bigger `rounds` to taste.
    *
    * Scale shape: each round = one labels⋈adjacency join at the node
    * key, one (node, label) count aggregate, one argmax window
    * partitioned by node (group size = the node's distinct neighbor
    * LABELS — ≤ degree; the [[triangleCounts]] hub caveat applies to
    * degree-10⁶ hubs and AQE handles the skew without a semantic
    * trade). localCheckpoint truncates lineage per round.
    *
    * Dirty-input hygiene: self-loops, nulls drop; duplicate edges
    * collapse; isolated nodes don't exist by construction (nodes come
    * from edges).
    *
    * @return (node, label) after exactly `rounds` rounds
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val fwd = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val adj = fwd.unionByName(
        fwd.select(col("v").as("u"), col("u").as("v")))
      .transform(Persist.round)
    var labels = adj.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")).transform(Persist.round)
    val w = Window.partitionBy(col("node"))
      .orderBy(col("__c").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.withColumnRenamed("node", "u"), Seq("u"))
        .groupBy(col("v").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("node"), col("label"))
        .transform(Persist.round)
    }
    labels
  }

  /** Degree assortativity coefficient (Newman, PRL 2002): the Pearson
    * correlation of the degrees at the two ends of each undirected
    * edge — positive means hubs link to hubs (social graphs), negative
    * means hubs link to leaves (the web, co-occurrence trees). ONE
    * summary row, the graph-health gauge dashboards pair with the
    * degree histogram.
    *
    * Exactness: degrees are integers, so every Pearson sum (Σx, Σx²,
    * Σxy over the 2m directed edge-ends) is an exact LONG aggregate —
    * order-free — and the coefficient is one double expression over
    * those seven longs: (2m·Σxy − Σx·Σy) / √((2m·Σx²−(Σx)²)·(2m·Σy²
    * −(Σy)²)) — replayable bit-exactly (the [[Segmentation]] /
    * [[Associations]] one-division discipline). Long bound: Σxy ≤
    * 2m·dmax² — safe through ~10⁹ edges of ~10³-degree graphs;
    * degenerate graphs (every degree equal — a cycle) have zero
    * variance and return NULL r, surfaced not NaN.
    *
    * Scale shape: one degree aggregate, one join of edges to degrees
    * at each endpoint key, one global 1-row reduce. Self-loops/nulls
    * drop, duplicate edges collapse (the [[triangleCounts]] hygiene).
    *
    * @return 1 row: (n_edges, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
    *         r) — the sums over both edge orientations (x = one end's
    *         degree, y = the other's), r = the coefficient
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val fwd = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val deg = fwd.select(col("u").as("node"))
      .unionByName(fwd.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // both orientations so the coefficient is symmetric by construction
    val ends = fwd.unionByName(
        fwd.select(col("v").as("u"), col("u").as("v")))
      .join(deg.withColumnRenamed("node", "u")
        .withColumnRenamed("deg", "dx"), Seq("u"))
      .join(deg.withColumnRenamed("node", "v")
        .withColumnRenamed("deg", "dy"), Seq("v"))
    val agg = ends.agg(
      count(lit(1)).as("n_edges"),
      sum(col("dx")).as("sum_x"), sum(col("dy")).as("sum_y"),
      sum(col("dx") * col("dy")).as("sum_xy"),
      sum(col("dx") * col("dx")).as("sum_x2"),
      sum(col("dy") * col("dy")).as("sum_y2"))
    val m = col("n_edges")
    val varX = m * col("sum_x2") - col("sum_x") * col("sum_x")
    val varY = m * col("sum_y2") - col("sum_y") * col("sum_y")
    agg.withColumn("r",
      when(varX > 0 && varY > 0,
        (m * col("sum_xy") - col("sum_x") * col("sum_y")).cast("double") /
          sqrt(varX.cast("double") * varY.cast("double")))
        .otherwise(lit(null).cast("double")))
  }

  /** Newman–Girvan modularity of a GIVEN node partition (Newman &
    * Girvan, PRE 2004): Q = Σ_c (e_c/m − (d_c/2m)²) — how much denser
    * the communities are than a degree-preserving random rewiring.
    * The quality gauge for any clustering over a graph — pointed at
    * [[connectedComponents]] labels it sanity-checks a split; pointed
    * at an external community assignment it scores it.
    *
    * Exactness: e_c (intra-community edges), d_c (community degree
    * sums), and m are exact longs; Q is computed over the quantized
    * per-community terms — q_c = 4·m²·e_c/m-term arithmetic stays
    * integral: Q = (4m·Σe_c − Σd_c²) / (4m²), ONE division of two
    * exact longs (numerator bound 4m·m — safe through ~10⁹ edges).
    * Nodes missing from `labels` form singleton communities of their
    * own (zero intra-edges; their degree still dilutes Q — the honest
    * convention).
    *
    * Scale shape: one labels join per edge endpoint (node-keyed), one
    * community aggregate (community-cardinality), one 1-row reduce.
    *
    * @param labels (node, community) assignment
    * @return 1 row: (m, intra_edges, q_num, q_den, modularity) with
    *         modularity = q_num/q_den exactly
    */
  def modularity(edges: DataFrame, labels: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", communityCol: String = "community")
      : DataFrame = {
    val fwd = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct().transform(Persist.round)
    val lab = labels.select(col(nodeCol).as("__n"),
      col(communityCol).as("__c"))
    // missing labels → the node ids themselves (singleton communities);
    // node ids can't collide with caller communities across types, so
    // tag the fallback to keep the community key space disjoint
    val cu = coalesce(col("__cu").cast("string"),
      concat(lit("__node:"), col("u").cast("string")))
    val cv = coalesce(col("__cv").cast("string"),
      concat(lit("__node:"), col("v").cast("string")))
    val tagged = fwd
      .join(lab.withColumnRenamed("__n", "u")
        .withColumnRenamed("__c", "__cu"), Seq("u"), "left")
      .join(lab.withColumnRenamed("__n", "v")
        .withColumnRenamed("__c", "__cv"), Seq("v"), "left")
      .select(cu.as("cu"), cv.as("cv"))
      .transform(Persist.round)
    val m = tagged.count()
    require(m > 0, "modularity: graph has no surviving edges")
    val intra = tagged.where(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("e_c"))
    val degByC = tagged.select(col("cu").as("community"))
      .unionByName(tagged.select(col("cv").as("community")))
      .groupBy(col("community")).agg(count(lit(1)).as("d_c"))
    val terms = degByC.join(intra, Seq("community"), "left")
      .agg(coalesce(sum(col("e_c")), lit(0L)).as("intra_edges"),
        sum(col("d_c") * col("d_c")).as("__sumd2"))
    terms.select(
      lit(m).as("m"), col("intra_edges"),
      (lit(4L) * lit(m) * col("intra_edges") - col("__sumd2"))
        .as("q_num"),
      lit(4L * m * m).as("q_den"),
      ((lit(4L) * lit(m) * col("intra_edges") - col("__sumd2"))
        .cast("double") / lit((4L * m * m).toDouble)).as("modularity"))
  }
}
