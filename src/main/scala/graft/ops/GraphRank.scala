package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph computation — random-walk centrality (PageRank; Page,
  * Brin, Motwani & Winograd 1999) over a graph derived from the relational
  * star: the customer↔supplier bipartite purchase graph. Training-data
  * pipelines run exactly this shape at 100 TB (domain-graph quality rank
  * over a web-crawl link graph, e.g. the CommonCrawl host ranks used to
  * weight corpus sources); the relational grounding here keeps it
  * oracle-able.
  *
  * Implementation is pregel-by-join (Malewicz et al. 2010 — the vertex-
  * program loop expressed as relational joins, the idiomatic Spark form):
  * each superstep joins the rank vector (node-grain) to the adjacency
  * list (edge-grain) on src and hash-aggregates contributions by dst —
  * one co-partitioned join plus one exchange per iteration, the same
  * loop discipline as the connected-components family (d16). The
  * adjacency (edges ⋈ out-degree) is built once, persisted, and reused
  * by every superstep; the rank frame stays node-sized throughout.
  *
  * Determinism cross-engine: rank mass is FIXED-POINT INTEGER — micro
  * units at 10⁻¹² of total mass, every operation BIGINT floor division,
  * multiplication, and exact sums. Floating point appears nowhere, so
  * there is nothing to round and no half-boundary for engines to
  * disagree on (a 12dp double formulation measurably coin-flips: damping
  * by 0.85 turns 12-decimal sums into 14-decimal values that sit exactly
  * on round-half boundaries, where Spark's exact HALF_UP and a scaled-
  * double round diverge). Floor division leaks < 1 micro-unit per node
  * per superstep — irrelevant to a rank score and identical on both
  * engines. Damping is the integer pair (85, 100); teleport 0.15 is
  * 15·SCALE/100 exactly.
  */
object GraphRank {

  /** 1.0 of rank mass, in micro-units. */
  private val Scale = 1000000000000L

  // ------------------------------------------------------------------
  // LONG-ENCODED node ids (guide §2.3 — shuffle fewer bytes): the
  // purchase-graph family historically carried ids/labels as strings
  // ("c<custkey>"/"s<suppkey>"), so every superstep shuffled and
  // compared variable-length UTF8 where 8 fixed bytes suffice. The
  // encoding below is a bijection into BIGINT that is ORDER-ISOMORPHIC
  // to the legacy strings under lexicographic comparison — min-label
  // propagation (g06/g07/g14), LPA's smallest-label tie-break
  // (g09/g13/g15) and every orderBy pick the same node at every
  // intermediate round, so even UNCONVERGED histograms are
  // bit-identical to the string form's.
  //
  // Order proof sketch: 'c' < 's' ⇒ a kind bit above everything; among
  // equal kinds the ids compare as digit strings (no leading zeros),
  // and lexicographic digit-string order == numeric order of the
  // left-aligned value n·10^(Width−len) with ties (prefix pairs like
  // "1"/"10") broken shorter-first — encoded as aligned·16 + len.
  // Width=15 keeps aligned ≤ 10^15 < 2^53 (exact in double for the
  // decode divide); encode is all-long arithmetic.
  // ------------------------------------------------------------------
  private[graft] val KindBit = 1L << 61
  private val Width = 15

  import org.apache.spark.sql.Column

  /** "c<key>"/"s<key>" → BIGINT, order-isomorphic to the string form. */
  private def encNode(isSupplier: Column, key: Column): Column = {
    val len = length(key.cast("string"))
    val aligned = key.cast("long") *
      pow(lit(10.0), (lit(Width) - len).cast("double")).cast("long")
    when(isSupplier, lit(KindBit)).otherwise(lit(0L)) +
      aligned * lit(16L) + len.cast("long")
  }

  /** Inverse of [[encNode]] — used only on result-grain frames. */
  private def decNode(enc: Column): Column = {
    val dk = enc.bitwiseAND(lit(KindBit - 1))
    val len = dk % 16
    val aligned = shiftright(dk, 4) // exact long div 16
    val n = floor(aligned.cast("double") /
      pow(lit(10.0), (lit(Width) - len).cast("double"))).cast("long")
    concat(when(enc >= KindBit, lit("s")).otherwise(lit("c")),
      n.cast("string"))
  }

  /** Bipartite purchase edges, both directions (undirected walk — every
    * node therefore has out-degree ≥ 1: no dangling-mass handling).
    * Node ids are [[encNode]]-encoded BIGINTs: the adjacency is the
    * frame every superstep of g01/g02/g06/g07/g14 (and g08's peel)
    * re-reads and whose node-grain vector every superstep re-shuffles,
    * so narrow keys here cut every downstream exchange. */
  private def purchaseEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    // e0 feeds both union branches, and the edge frame feeds both the
    // degree aggregate and the adjacency join — without the cache the
    // fact join+distinct would evaluate 4× before adj materializes
    val e0 = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(
        encNode(lit(false), col("o_custkey")).as("src"),
        encNode(lit(true), col("l_suppkey")).as("dst"))
      .distinct()
      .localCheckpoint() // GC-scoped, no per-invocation CacheManager leak
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** One damped superstep over the persisted adjacency: route `r div deg`
    * along every edge, sum exactly, damp by 85/100 in integer space, add
    * each node's teleport grant. */
  private def superstep(adj: DataFrame, ranks: DataFrame,
                        grants: DataFrame): DataFrame =
    adj
      // SHUFFLE_HASH: the node-grain rank vector is the hash build side —
      // a sort-merge join would re-SORT the 100×-larger cached adjacency
      // every superstep (the adjacency is already src-partitioned, so the
      // only per-superstep movement is the rank vector's exchange)
      .join(ranks.hint("shuffle_hash"), adj("src") === ranks("node"))
      .select(adj("dst"), expr("r div deg").as("c"))
      .groupBy("dst")
      .agg(sum(col("c")).as("s"))
      // grants is node-grain and persisted: broadcast beats exchanging
      // the contribution aggregate a second time
      .join(broadcast(grants), col("dst") === grants("gnode"))
      .select(col("dst").as("node"),
        (expr("(85 * s) div 100") + col("grant")).as("r"))

  /** Shared loop: start from `init` (node, r), run `iterations`
    * supersteps with per-node teleport `grants` (gnode, grant), emit the
    * supplier side with degrees. `adj` must already be materialized
    * (persisted or memoized) — every superstep reads it. */
  private def runLoop(adj: DataFrame, deg: DataFrame, iterations: Int)(
      mkInitAndGrants: (DataFrame) => (DataFrame, DataFrame)): DataFrame = {
    // grants is referenced by every superstep of the final lineage —
    // unmaterialized, the deg→(seeds→)nodes chain replays once per
    // iteration (eager localCheckpoint: GC-scoped, leak-free)
    val (init, grants0) = mkInitAndGrants(deg)
    val grants = grants0.localCheckpoint()
    var ranks = init
    for (_ <- 1 to iterations) ranks = superstep(adj, ranks, grants)
    // decode at the RESULT grain only (suppliers); the encoding is
    // order-isomorphic to the legacy strings, so ordering by the long
    // reproduces the string orderBy("node") exactly
    ranks
      .join(broadcast(deg), ranks("node") === deg("src"))
      .filter(col("node") >= KindBit)
      .select(col("node").as("enc"), col("deg").as("degree"),
        col("r").as("rank_micros"))
      .orderBy("enc")
      .select(decNode(col("enc")).as("node"), col("degree"),
        col("rank_micros"))
  }

  /** Ad-hoc-frame form: build + persist the adjacency locally (spec entry
    * point; the (session, dir) driver entries use the memoized build). */
  private def run(orders: DataFrame, lineitem: DataFrame, iterations: Int)(
      mkInitAndGrants: (DataFrame) => (DataFrame, DataFrame)): DataFrame = {
    val edges = purchaseEdges(orders, lineitem)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, Seq("src")).repartition(col("src")).localCheckpoint()
    runLoop(adj, deg, iterations)(mkInitAndGrants)
  }

  /** Build-once graph artifacts per (session, dir) — the same
    * compute-once/query-many memo discipline as the ANN index family
    * ([[Similarity]]): g01 and g02 walk the SAME purchase graph, so the
    * fact join + distinct + degree aggregate run once per session, not
    * once per query. At 100 TB the adjacency is the write-once
    * intermediate table both rank jobs read. */
  private def memo(spark: SparkSession, dir: String, tag: String)
                  (build: => DataFrame): DataFrame =
    graft.SessionMemo(spark, dir, s"graphrank-$tag")(build)

  private def edgesFor(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "graph-edges") {
      purchaseEdges(Tables.orders(spark, dir), Tables.lineitem(spark, dir))
    }

  private def degFor(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "graph-deg") {
      edgesFor(spark, dir).groupBy("src").agg(count(lit(1)).as("deg"))
    }

  /** The adjacency is cached HASH-PARTITIONED ON src: the deg lookup
    * broadcasts, so without the explicit repartition the cache would
    * keep the upstream (src, dst) distinct's partitioning and every
    * superstep would re-exchange the EDGE-GRAIN side of the rank join.
    * Partitioned on src, each superstep shuffles only the node-grain
    * rank vector — the pregel routing-table discipline. */
  private def adjFor(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "graph-adj") {
      edgesFor(spark, dir).join(degFor(spark, dir), Seq("src"))
        .repartition(col("src"))
    }

  /** Uniform init: every node starts with SCALE/n mass and receives the
    * uniform teleport grant 0.15·SCALE/n. */
  private def uniformInit(deg: DataFrame): (DataFrame, DataFrame) = {
    val nDf = deg.agg(count(lit(1)).as("n"))
    val nodes = deg.select(col("src").as("node")).crossJoin(broadcast(nDf))
    val init = nodes.select(col("node"), expr(s"${Scale}L div n").as("r"))
    val grants = nodes.select(col("node").as("gnode"),
      expr(s"((15 * ${Scale}L) div 100) div n").as("grant"))
    (init, grants)
  }

  /** Uniform PageRank (g01). */
  def graphRankOf(orders: DataFrame, lineitem: DataFrame,
                  iterations: Int = 3): DataFrame =
    run(orders, lineitem, iterations)(uniformInit)

  def graphRank(spark: SparkSession, dir: String): DataFrame =
    runLoop(adjFor(spark, dir), degFor(spark, dir), 3)(uniformInit)

  /** PERSONALIZED PageRank (g02) — teleport mass restricted to a SEED set
    * (customers of one nation): rank becomes proximity to the seeds, the
    * random-walk form of seed-biased source weighting (a training-data
    * pipeline uses exactly this to upweight crawl domains near a trusted
    * seed list — the quality-propagation idea behind curated-corpus
    * expansion). Same superstep loop; only initialization and teleport
    * change: both put 1/|S| on seeds and ZERO elsewhere, so mass reaches
    * non-seeds only by walking edges. */
  private def seedInit(customer: DataFrame, seedNation: Int)(
      deg: DataFrame): (DataFrame, DataFrame) = {
    val seeds = deg.join(
      customer.filter(col("c_nationkey") === seedNation)
        .select(encNode(lit(false), col("c_custkey")).as("src")),
      Seq("src"))
      .select(col("src").as("seed"))
    val nS = seeds.agg(count(lit(1)).as("ns"))
    val nodes = deg.select(col("src").as("node"))
      .join(seeds, col("node") === col("seed"), "left")
      .crossJoin(broadcast(nS))
    val init = nodes.select(col("node"),
      when(col("seed").isNotNull, expr(s"${Scale}L div ns"))
        .otherwise(lit(0L)).as("r"))
    val grants = nodes.select(col("node").as("gnode"),
      when(col("seed").isNotNull, expr(s"((15 * ${Scale}L) div 100) div ns"))
        .otherwise(lit(0L)).as("grant"))
    (init, grants)
  }

  def personalizedRankOf(
      orders: DataFrame,
      lineitem: DataFrame,
      customer: DataFrame,
      seedNation: Int = 1,
      iterations: Int = 3): DataFrame =
    run(orders, lineitem, iterations)(seedInit(customer, seedNation))

  def personalizedRank(spark: SparkSession, dir: String): DataFrame =
    runLoop(adjFor(spark, dir), degFor(spark, dir), 3)(
      seedInit(Tables.customer(spark, dir), 1))

  /** TRIANGLE COUNT (g03) — graph clustering structure over the
    * co-purchase graph (parts as nodes, an edge when two parts share ≥ 2
    * orders — q40's pair mining as graph construction). The naive
    * wedge-close join explodes on hubs: a degree-d node contributes
    * C(d,2) wedges, and real graphs have power-law hubs. The fix is the
    * DEGREE-ORDERED ORIENTATION (Suri & Vassilvitskii 2011's MR-node-
    * iterator): orient every edge from its lower-(degree, id) endpoint to
    * the higher one — a total order, so each triangle survives as
    * exactly ONE oriented wedge + closing edge — and hub wedges
    * redistribute to their lower-degree neighbors, capping wedge volume
    * at O(m^1.5) instead of Σd². Ordering keys pack (degree, id) into
    * one BIGINT — integers, no ties, engine-portable.
    *
    * Three exchanges beyond the pair mining: the degree aggregate, the
    * wedge self-join on src, and the closing-edge join on (v, w). */
  /** The support-≥2 CO-PURCHASE edge frame (p1 < p2) — the shared graph
    * artifact g03 (triangles), g04 (node similarity), and g05 (BFS) all
    * analyze. SessionMemo'd like the g01/g02 adjacency and the q42/q46
    * touch pairs: the basket self-join + support aggregate is the
    * expensive pair-mining pass, and at 100 TB it is the write-once
    * intermediate table every downstream graph job reads (a bare persist
    * here — the pre-r8 form — gave the same reuse by CacheManager
    * accident, one leaked entry per invocation). */
  /** The full (p1, p2, support) pair table — q40's co-purchase report
    * reads it directly; the graph surfaces take the support-≥2 cut. */
  def copurchaseSupport(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "copurchase-support") {
      val items = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      items.as("a")
        .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("support"))
    }

  private def copurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    copurchaseSupport(spark, dir)
      .filter(col("support") >= 2)
      .select("p1", "p2")

  /** Per-node degrees of the co-purchase graph — one row per part, read by
    * g03's orientation build and its node-count summary. Memoized: the
    * union+aggregate over the edge table is the same read-many artifact
    * shape as the edges themselves. */
  private def copurchaseDegrees(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "copurchase-degrees") {
      val edges = copurchaseEdges(spark, dir)
      edges.select(col("p1").as("pk"))
        .union(edges.select(col("p2").as("pk")))
        .groupBy("pk").agg(count(lit(1)).as("d"))
    }

  /** The degree-ORIENTED edge frame (src, dst, dstk) — feeds both wedge
    * sides and the closing join of g03. Memoized per (session, dir): the
    * pre-r9 form `localCheckpoint()`ed it per invocation, so every bench
    * pass re-paid the orientation joins (BENCH_LOCAL r7→r8 g03
    * 0.51→2.16 s once the accidental CacheManager reuse of the bare
    * persist era was retired — VERDICT r8 item 2). Like the co-purchase
    * support table above, at 100 TB this is the write-once oriented edge
    * table every triangle/clustering job reads. */
  private def orientedEdgesFor(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "copurchase-oriented") {
      val edges = copurchaseEdges(spark, dir)
      val okey = copurchaseDegrees(spark, dir)
        .select(col("pk"), (col("d") * lit(2147483648L) + col("pk")).as("k"))
      edges
        .join(okey.as("ka"), col("p1") === col("ka.pk"))
        .join(okey.as("kb"), col("p2") === col("kb.pk"))
        .select(
          when(col("ka.k") < col("kb.k"), col("p1")).otherwise(col("p2")).as("src"),
          when(col("ka.k") < col("kb.k"), col("p2")).otherwise(col("p1")).as("dst"),
          when(col("ka.k") < col("kb.k"), col("kb.k")).otherwise(col("ka.k")).as("dstk"))
    }

  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(spark, dir)
    val deg = copurchaseDegrees(spark, dir)
    val oriented = orientedEdgesFor(spark, dir)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dstk") < col("e2.dstk"))
      .select(col("e1.dst").as("v"), col("e2.dst").as("w"))
    val tri = wedges
      .join(oriented.as("o"), col("v") === col("o.src") && col("w") === col("o.dst"))
      .agg(count(lit(1)).as("triangles"))
    tri
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("nodes"))))
      .crossJoin(broadcast(edges.agg(count(lit(1)).as("edges"))))
  }

  /** COMMON-NEIGHBOR SIMILARITY (g04) — structural node similarity over
    * the co-purchase graph ("parts bought alongside the same parts", the
    * item-item collaborative-filtering primitive): for every node pair,
    * |N(v)∩N(w)| via wedge enumeration and Jaccard over neighbor sets.
    *
    * The wedge self-join (adjacency ⋈ adjacency on the CENTER, v<w on the
    * endpoints) is the same shape as g03's triangle wedges: volume is
    * Σ deg(c)² over the support-thresholded graph — the ≥2-support cut is
    * what keeps hub fan-out bounded (at 100 TB the standard extra guard
    * is a degree cap on centers: a celebrity hub's C(deg,2) wedges say
    * nothing about item similarity and get sampled or dropped; bounded
    * here by basket width, so no cap needed). Jaccard is ONE double
    * divide of exact BIGINT counts; both degree lookups broadcast. */
  /** The UNDIRECTED co-purchase edge frame (both orientations of each
    * pair) — g04's wedge self-join reads it twice (e1/e2 center join), so
    * like g03's oriented frame it is memoized per (session, dir) rather
    * than re-derived from the edge cut per plan branch (VERDICT r8
    * item 2: the persist retirement orphaned this shared frame too). */
  private def undirectedEdgesFor(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "copurchase-undirected") {
      val edges = copurchaseEdges(spark, dir)
      edges.union(edges.select(col("p2").as("p1"), col("p1").as("p2")))
    }

  def nodeSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val und = undirectedEdgesFor(spark, dir)
    // per-node undirected degree ≡ the memoized co-purchase degree table
    // (each pair contributes one row per endpoint in `und`)
    val deg = copurchaseDegrees(spark, dir)
      .select(col("pk"), col("d").as("deg"))
    val wedges = und.as("e1")
      .join(und.as("e2"),
        col("e1.p1") === col("e2.p1") && col("e1.p2") < col("e2.p2"))
      .groupBy(col("e1.p2").as("v"), col("e2.p2").as("w"))
      .agg(count(lit(1)).as("cn"))
    // top-25 via orderBy+limit (TakeOrderedAndProject — the wedge pair
    // table is corpus-scale; a global rank window would single-partition
    // sort it); rank is a window over the 25 survivors only
    val rw = Window.orderBy(col("jaccard").desc, col("cn").desc,
      col("v").asc, col("w").asc)
    wedges
      .join(broadcast(deg.select(col("pk").as("v"), col("deg").as("deg_v"))), Seq("v"))
      .join(broadcast(deg.select(col("pk").as("w"), col("deg").as("deg_w"))), Seq("w"))
      .withColumn("jaccard",
        round(col("cn") / (col("deg_v") + col("deg_w") - col("cn")), 6))
      .orderBy(col("jaccard").desc, col("cn").desc, col("v").asc, col("w").asc)
      .limit(25)
      .withColumn("rank", row_number().over(rw).cast("int"))
      .select("rank", "v", "w", "cn", "deg_v", "deg_w", "jaccard")
      .orderBy("rank")
  }

  /** LOCAL CLUSTERING COEFFICIENT (g10) — per-node triangle counts over
    * the co-purchase graph, reported as c(v) = 2·tri(v)/(d(v)·(d(v)−1)):
    * the "how clique-like is this node's neighborhood" primitive behind
    * community seeding and spam/bot detection (dense link farms sit at
    * c ≈ 1 where organic hubs sit low). Reads the SAME memoized oriented
    * frame and degree table as g03 (SURVEY §2.12): each triangle is
    * enumerated ONCE as an oriented wedge + closing edge, then exploded
    * to its three member nodes and aggregated — wedge volume stays the
    * O(m^1.5) of the degree orientation, and the per-node pass adds one
    * aggregate over 3× the triangle count.
    *
    * Top-20 via orderBy+limit (TakeOrderedAndProject, g04's discipline —
    * never a global rank window over the node table); the coefficient is
    * one IEEE divide of exact BIGINTs rounded 6dp, and the (coeff,
    * triangles, node) ordering is total because node ids are unique. */
  def localClustering(spark: SparkSession, dir: String): DataFrame = {
    val deg = copurchaseDegrees(spark, dir)
    val oriented = orientedEdgesFor(spark, dir)
    val tris = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dstk") < col("e2.dstk"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      .join(oriented.as("o"), col("v") === col("o.src") && col("w") === col("o.dst"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("triangles"))
    val rw = Window.orderBy(col("coeff").desc, col("triangles").desc, col("pk").asc)
    deg.filter(col("d") >= 2)
      .join(tris, Seq("pk"), "left")
      .na.fill(0L, Seq("triangles"))
      .withColumn("coeff",
        round((col("triangles") * lit(2L)) /
          (col("d") * (col("d") - lit(1L))).cast("double"), 6))
      .orderBy(col("coeff").desc, col("triangles").desc, col("pk").asc)
      .limit(20)
      .withColumn("rank", row_number().over(rw).cast("int"))
      .select(col("rank"), col("pk").as("node"), col("d").as("degree"),
        col("triangles"), col("coeff"))
      .orderBy("rank")
  }

  /** BFS HOP PROFILE (g05) — single-source shortest-path (unweighted)
    * over the co-purchase graph, reported as the hop histogram from the
    * minimum node id: the reachability/eccentricity probe behind "how
    * connected is this catalog" and the link-graph crawl-depth audit a
    * corpus pipeline runs on its domain graph.
    *
    * Frontier BFS as iterative joins (the scale-correct Spark shape —
    * never a driver-side queue): each round joins only the FRONTIER
    * (nodes first reached last round) to the adjacency, anti-joins the
    * visited set, and appends. Work per round is O(edges out of the
    * frontier); total O(E) over the whole run — textbook BFS cost, just
    * partitioned. The d16 loop discipline applies verbatim: frames are
    * LAZY localCheckpoints and the per-round `count()` is the ONE action
    * that both materializes the round and reads the loop signal; the
    * visited set is a union of checkpointed leaves, so no round replays
    * a predecessor. Rounds = graph eccentricity (small-world graphs:
    * ~10-20), each a co-partitioned join — the exchange count, not the
    * data volume, is the scale cost, exactly like g01's supersteps.
    * Every quantity is a BIGINT count or id; nothing to round. */
  /** Core loop over any undirected (p1, p2) edge frame — JobCountSpec
    * drives a hand-built chain through it to pin the ≤1-action-per-round
    * shape. */
  def bfsHopsOf(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val und = edges
      .union(edges.select(col("p2").as("p1"), col("p1").as("p2")))
      .localCheckpoint(eager = false)
    // the source: minimum node id in the edge set — deterministic, and a
    // 1-row driver scalar (the loop needs it as a literal frontier seed);
    // this one action also materializes the (lazy) adjacency checkpoint
    val seed = und.agg(min("p1")).first().getLong(0)
    import spark.implicits._
    var frontier = Seq(seed).toDF("pk")
      .withColumn("hop", lit(0)).localCheckpoint()
    var dist = frontier
    var hop = 0
    var grew = 1L
    while (grew > 0 && hop < 63) {
      hop += 1
      val next = frontier.join(und, frontier("pk") === und("p1"))
        .select(col("p2").as("pk")).distinct()
        .join(dist, Seq("pk"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint(eager = false)
      grew = next.count() // the ONE action: materializes + loop signal
      if (grew > 0) {
        dist = dist.union(next) // union of checkpointed leaves
        frontier = next
      }
    }
    // every dist leaf is a materialized localCheckpoint — the final
    // aggregate's lineage no longer reads the adjacency; its checkpoint
    // blocks free via ContextCleaner once `und` goes unreachable
    dist.groupBy("hop")
      .agg(count(lit(1)).as("nodes"), min("pk").as("min_pk"), max("pk").as("max_pk"))
      .select(col("hop").cast("int").as("hop"), col("nodes"),
        col("min_pk"), col("max_pk"))
      .orderBy("hop")
  }

  def bfsHops(spark: SparkSession, dir: String): DataFrame =
    bfsHopsOf(copurchaseEdges(spark, dir))

  /** BOUNDED-HORIZON HARMONIC CENTRALITY (g12) — per-source
    * Σ reached(d)/d over hops d ≤ maxHop (harmonic centrality, Boldi &
    * Vigna 2014 "Axioms for Centrality" — the centrality that behaves on
    * disconnected graphs, which is why HyperBall computes exactly this
    * at web scale): "how much of the graph can this node reach, and how
    * cheaply". The horizon bound is the SCALE DESIGN, not a shortcut —
    * exact all-pairs centrality is O(V·E); a fixed-radius frontier sweep
    * from a fixed source set is O(sources · E) worst case with
    * per-round work O(edges out of the frontier), the same bounded-
    * superstep posture as g06. At web scale the radius-bounded exact
    * form IS the production measurement (HyperBall's counters just make
    * the frontier set approximate to fit memory).
    *
    * Sources: the `nSources` smallest node ids (deterministic). The loop
    * is [[bfsHopsOf]]'s multi-source generalization — state keyed
    * (src, pk), per-round anti-join against the visited set, lazy
    * checkpoints with the per-round count() as the one materializing
    * action. The harmonic sum n1 + n2/2.0 + n3/3.0 evaluates
    * left-to-right over integer-derived doubles, so both engines produce
    * the identical double before the one 6-dp round. */
  def harmonicCentralityOf(edges: DataFrame, nSources: Int = 10,
                           maxHop: Int = 3): DataFrame = {
    val und = edges
      .union(edges.select(col("p2").as("p1"), col("p1").as("p2")))
      .localCheckpoint(eager = false)
    val seeds = und.select(col("p1").as("src")).distinct()
      .orderBy("src").limit(nSources)
    var frontier = seeds.select(col("src"), col("src").as("pk"))
      .withColumn("hop", lit(0)).localCheckpoint()
    var dist = frontier
    for (h <- 1 to maxHop) {
      val next = frontier.join(und, frontier("pk") === und("p1"))
        .select(col("src"), col("p2").as("pk")).distinct()
        .join(dist, Seq("src", "pk"), "left_anti")
        .withColumn("hop", lit(h))
        .localCheckpoint(eager = false)
      next.count() // the ONE action per round: materializes the frontier
      dist = dist.union(next)
      frontier = next
    }
    val counts = (1 to maxHop).map(h =>
      sum(when(col("hop") === h, 1L).otherwise(0L)).as(s"n$h"))
    dist.filter(col("hop") > 0)
      .groupBy("src")
      .agg(counts.head, counts.tail: _*)
      .withColumn("harmonic",
        round((1 to maxHop).map(h => col(s"n$h") / h.toDouble).reduce(_ + _), 6))
      .orderBy("src")
  }

  def harmonicCentrality(spark: SparkSession, dir: String): DataFrame =
    harmonicCentralityOf(copurchaseEdges(spark, dir))

  /** BOUNDED-ROUND CONNECTED COMPONENTS (g06) — HashMin label
    * propagation (the simple O(diameter)-round variant of Rastogi et
    * al. 2013, "Finding Connected Components in Map-Reduce in
    * Logarithmic Rounds") over the co-purchase graph, run for a FIXED
    * `rounds` budget: each superstep every node takes the minimum of its
    * own label and its neighbors', so after k rounds a node's label is
    * the smallest node id within k hops, and once k reaches a
    * component's diameter its labels are exact. The fixed budget (not a
    * convergence probe) keeps the whole computation ONE declarative DAG
    * — no per-round driver action, unlike d16's fixpoint loop — and the
    * DuckDB oracle unrolls exactly the same k steps, so the surface
    * verifies bit-for-bit regardless of convergence state.
    *
    * Scale shape: per superstep one shuffle-hash join of the node-grain
    * label vector against the src-partitioned cached adjacency plus one
    * dst-keyed min aggregate — the same exchange budget as a PageRank
    * superstep (g01); the closing size histogram is two label-keyed
    * aggregates whose output is histogram-small. */
  /** Library form over any undirected (src, dst) edge frame (both
    * directions present, like [[purchaseEdges]]).
    *
    * The min-with-own-label step folds into the edge set as SELF-LOOPS:
    * min over (neighbors ∪ {v}) ≡ least(own, min neighbors), so each
    * round is ONE join + ONE aggregate referencing the previous labels
    * exactly once. Referencing them twice (a neighbor-message join plus
    * an own-label join) doubles the unmaterialized lineage every round —
    * 2^rounds subtree replay, measured as a 90 s sf0.1 run where the
    * linear form takes ~2 s. */
  def componentSizesOf(und: DataFrame, rounds: Int): DataFrame =
    componentSizesOverSelf(withSelfLoops(und), rounds)

  private def withSelfLoops(und: DataFrame): DataFrame =
    und.select("src", "dst").union(
      und.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst")))

  /** The superstep loop over a PREPARED self-loop edge frame. The caller
    * should hand in a frame materialized HASH-PARTITIONED ON src (the
    * driver entry memoizes exactly that): a union recomputed per round
    * has unknown partitioning, so every superstep would re-exchange the
    * EDGE-grain side — the partitioned cache limits each round's
    * movement to the node-grain label vector, the g01 adjacency
    * discipline. */
  private def componentSizesOverSelf(withSelf: DataFrame, rounds: Int): DataFrame = {
    var labels = withSelf.select(col("src")).distinct()
      .select(col("src").as("node"), col("src").as("l"))
    for (r <- 1 to rounds) {
      labels = withSelf
        .join(labels.hint("shuffle_hash"), withSelf("src") === labels("node"))
        .select(withSelf("dst").as("node"), col("l"))
        .groupBy("node").agg(min("l").as("l"))
      // LAZY lineage truncation every 3 rounds (g05's BFS discipline):
      // in a long-lived session the optimizer re-canonicalizes the whole
      // superstep tree against every cached plan, so an uncut 6-round
      // tree pays seconds of PLANNING per invocation (measured: 7.3 s
      // in-suite vs 3.9 s in a fresh session). The checkpoint
      // materializes inside the one final action — no extra driver jobs
      // (JobCountSpec-style contract), values untouched.
      if (r % 3 == 0 && r < rounds) labels = labels.localCheckpoint(eager = false)
    }
    labels.groupBy("l").agg(count(lit(1)).as("size"))
      .groupBy("size")
      .agg(count(lit(1)).as("components"), sum("size").as("nodes"))
      .orderBy("size")
  }

  /** g06's round budget — shared with the oracle's unroll
    * (OpsOracles.componentSizesOracleSql) so engine and oracle can never
    * silently desync (ADVICE r7). */
  val ComponentRounds = 6

  def componentSizes(spark: SparkSession, dir: String, rounds: Int = ComponentRounds): DataFrame =
    componentSizesOverSelf(selfLoopEdges(spark, dir), rounds)

  private def selfLoopEdges(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "graph-und-self") {
      withSelfLoops(adjFor(spark, dir).select("src", "dst"))
        .repartition(col("src"))
    }

  /** CONVERGED CONNECTED COMPONENTS (g07) — [[componentSizes]]'s HashMin
    * propagation run to the FIXPOINT instead of a fixed round budget:
    * the loop stops when no label drops, so the histogram is the TRUE
    * component-size histogram regardless of graph diameter (g06's
    * bounded budget is exact only once rounds ≥ diameter).
    *
    * Driver-action discipline (d16/g05): the per-node `chg` flag (did
    * this label drop?) rides INSIDE the round's frame, the frame is
    * marked for LAZY local checkpoint, and the single convergence
    * aggregate both materializes the round and reads the loop signal —
    * exactly ONE driver action per round (JobCountSpec pins it). Because
    * the chg computation references the previous labels a second time
    * (join-back to compare), every round checkpoints — the previous
    * frame is always materialized, so the double reference reads blocks,
    * never replays lineage (the 2^rounds trap g06's docstring measures).
    *
    * Scale shape per round: the same one shuffle-hash join against the
    * src-partitioned memoized self-loop adjacency + one node-grain min
    * aggregate as g06, plus a node-grain join-back — O(E + V) per round,
    * O(diameter) rounds, ≥1 driver round-trips each (the price of
    * convergence detection; g06 is the fixed-budget zero-probe form). */
  def componentSizesConverged(spark: SparkSession, dir: String): DataFrame =
    convergedOverSelf(selfLoopEdges(spark, dir))

  /** Library form over any undirected (src, dst) edge frame (both
    * directions present, [[componentSizesOf]]'s contract) — materializes
    * its own self-loop adjacency (JobCountSpec drives a hand-built chain
    * through this to pin the ≤1-action-per-round shape). */
  def componentSizesConvergedOf(und: DataFrame): DataFrame =
    convergedOverSelf(
      withSelfLoops(und).repartition(col("src")).localCheckpoint())

  private def convergedOverSelf(withSelf: DataFrame): DataFrame =
    sizeHistogramOf(convergedLabelsOver(withSelf))

  /** The fixpoint loop itself, returning (node, l) — g07 histograms it,
    * g14 runs it twice (base graph + the delta-bounded label graph). */
  private[graft] def convergedLabelsOver(withSelf: DataFrame): DataFrame = {
    var labels = withSelf.select(col("src")).distinct()
      .select(col("src").as("node"), col("src").as("l"))
      .localCheckpoint(eager = false)
    var changed = 1L
    while (changed > 0) {
      val prop = withSelf
        .join(labels.hint("shuffle_hash"), withSelf("src") === labels("node"))
        .select(withSelf("dst").as("node"), col("l").as("cand"))
        .groupBy("node").agg(min("cand").as("cand"))
      // self-loops guarantee every node appears in prop (cand ≤ own
      // label), so the join-back is inner and total
      val next = labels.join(prop, Seq("node"))
        .select(col("node"), col("cand").as("l"),
          (col("cand") < col("l")).cast("long").as("chg"))
        .localCheckpoint(eager = false)
      // the ONE action (coalesce: an empty graph converges immediately)
      changed = next.agg(coalesce(sum("chg"), lit(0L))).first().getLong(0)
      labels = next.select("node", "l")
    }
    labels
  }

  private def sizeHistogramOf(labels: DataFrame): DataFrame =
    labels.groupBy("l").agg(count(lit(1)).as("size"))
      .groupBy("size")
      .agg(count(lit(1)).as("components"), sum("size").as("nodes"))
      .orderBy("size")

  /** INCREMENTAL connected components (g14) — the d19/d22 incremental
    * discipline applied to the graph family: tonight's edge DELTA folds
    * into yesterday's converged labels WITHOUT re-propagating the full
    * graph. The algebra that makes it exact: every base component's
    * label is its minimum node, so merging components through delta
    * edges reduces to connected components of the LABEL GRAPH — delta
    * edges mapped to (label(u), label(v)) pairs, a graph with at most
    * 2·|delta| nodes. The fixpoint loop runs ONCE on the base graph
    * (the pay-once nightly artifact) and once on that delta-bounded
    * contraction; the final remap is one label-grain join. Incremental
    * ≡ batch by construction (min over merged label groups = min over
    * the union component), so the oracle IS g07's full-graph oracle —
    * the gate row proves the incremental path computes the batch
    * answer, d22's exact stance.
    *
    * The delta is a deterministic md5 split on the CANONICALIZED edge
    * (least|greatest, so both directions land on the same side) —
    * ~1/16 of edges, the t36 held-out-shard shape. */
  /** The merge core over explicit undirected (both-directions) base and
    * delta frames, returning the final (node, l) labels — the spec
    * drives planted merges through this; the driver entry histograms
    * the md5-split corpus. */
  private[graft] def incrementalLabelsOf(base: DataFrame,
                                         delta0: DataFrame): DataFrame =
    incrementalMergeOf(
      convergedLabelsOver(
        withSelfLoops(base).repartition(col("src")).localCheckpoint())
        .localCheckpoint(eager = false),
      delta0)

  /** The delta fold over PRECOMPUTED base labels — the production shape:
    * yesterday's labels are the stored nightly artifact (the driver
    * entry memoizes them), tonight pays only the label-graph merge. */
  private[graft] def incrementalMergeOf(baseLabels: DataFrame,
                                        delta0: DataFrame): DataFrame = {
    val delta = delta0.localCheckpoint(eager = false)
    val lblEdges = delta
      .join(baseLabels.select(col("node").as("src"), col("l").as("la")),
        Seq("src"), "left")
      .join(baseLabels.select(col("node").as("dst"), col("l").as("lb")),
        Seq("dst"), "left")
      .select(coalesce(col("la"), col("src")).as("src"),
        coalesce(col("lb"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val merge = convergedLabelsOver(
        withSelfLoops(
          lblEdges.union(lblEdges.select(col("dst").as("src"), col("src").as("dst"))))
          .repartition(col("src")).localCheckpoint())
      .select(col("node").as("l"), col("l").as("nl"))
    val deltaOnly = delta.select(col("src").as("node")).distinct()
      .join(baseLabels.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("l"))
    baseLabels.unionByName(deltaOnly)
      .join(merge, Seq("l"), "left")
      .select(col("node"), coalesce(col("nl"), col("l")).as("l"))
  }

  def incrementalComponents(spark: SparkSession, dir: String): DataFrame = {
    val und = adjFor(spark, dir).select("src", "dst")
    // the md5 split hashes the DECODED canonical pair so the delta is the
    // exact edge subset the string-id form selected (least/greatest over
    // the order-isomorphic longs, decoded before hashing); the final
    // histogram is split-invariant anyway (incremental ≡ batch), this
    // just keeps the base/delta artifacts byte-stable across rounds
    val deltaPred = substring(md5(concat_ws("|",
      decNode(least(col("src"), col("dst"))),
      decNode(greatest(col("src"), col("dst"))))),
      1, 1) === "f"
    // yesterday's labels are the pay-once artifact (the g12 cold-side
    // stance): without the memo every "incremental" run re-propagated
    // the base fixpoint — measured 65 s steady at the sf1 replica vs
    // g07's 7 s batch, the opposite of incremental
    val baseLabels = memo(spark, dir, "graph-cc-base") {
      convergedLabelsOver(
        withSelfLoops(und.filter(!deltaPred))
          .repartition(col("src")).localCheckpoint())
    }
    sizeHistogramOf(incrementalMergeOf(baseLabels, und.filter(deltaPred)))
  }

  /** g08's peel budget and threshold — shared with the oracle's unroll so
    * engine and oracle can never silently desync (the g06/ADVICE-r7
    * constant discipline). */
  val KCoreK = 3
  val KCoreRounds = 4

  /** K-CORE PEELING (g08) — the classical graph-curation operator
    * (Seidman 1983; used in pipeline practice to strip weakly-connected
    * spam/bot fringes before graph features are trusted): repeatedly
    * delete nodes of degree < k; what survives `rounds` peels is
    * (approaching) the k-core. A FIXED round budget keeps the whole
    * computation one declarative DAG with zero driver probes (g06's
    * stance), and the oracle unrolls the same `rounds` peels, so the
    * surface verifies bit-for-bit regardless of convergence. The output
    * is the surviving degree histogram per node kind ('c'ustomer /
    * 's'upplier) — it pins the peeling trajectory (a single wrong
    * deletion shifts some surviving node's degree), not just the core
    * size.
    *
    * Scale shape — the INCREMENTAL peel on the NODE GRAIN ONLY (r9; the
    * shape real k-core implementations use, where total peel work is
    * O(E) once plus the touched fringe, not O(E·rounds)): degrees
    * aggregate ONCE up front, and from then on THE EDGE FRAME IS NEVER
    * REWRITTEN. Each round (1) takes the node-grain DEAD set (deg < k)
    * — it shrinks round over round and broadcasts; (2) computes the
    * degree DECREMENTS with one broadcast semi-join of the ORIGINAL
    * memoized edge frame against the dead set (sound because a node
    * dies exactly once: an edge contributes a decrement in precisely
    * the round its far endpoint dies, and edges between two
    * previously-dead nodes can never resurface — their deg rows are
    * already gone); (3) maintains the node-grain degree table by
    * anti-join + decrement. The maintained table IS the peeled graph's
    * degree function, so the final histogram reads it directly
    * (filtering deg ≥ 1: a survivor whose whole neighborhood died has
    * no edges and no histogram row, exactly as an edge recount would
    * report).
    *
    * History, measured on the 10× scale-step replica: the r8 form
    * re-aggregated full degrees and semi-joined survivors every round —
    * 3 O(E) exchanges × rounds, ~25 s. An intermediate r9 form peeled
    * the edge frame with broadcast anti-joins but still
    * localCheckpoint'ed a fresh ~12M-row edge copy per round — ~30 s,
    * the materialization was the cost, not the exchanges. This form
    * touches the edge frame with narrow cached-block scans only: one
    * up-front aggregate + one semi-join scan per round. Only the
    * node-grain degree table (two references per round) rides lazy
    * localCheckpoints — tiny blocks, no 2^rounds replay (the g06
    * trap). At a scale where a first-round dead set outgrows
    * broadcast, the fallback is the survivor semi-join form. */
  def kcoreOf(und: DataFrame, k: Int, rounds: Int): DataFrame = {
    val edges = und.select("src", "dst")
    var deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to rounds) {
      val dead = deg.filter(col("deg") < k).select(col("src").as("dead_n"))
      val lost = edges
        .join(broadcast(dead.select(col("dead_n").as("dead_m"))),
          edges("dst") === col("dead_m"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("lost"))
      deg = deg
        .join(broadcast(dead), deg("src") === col("dead_n"), "left_anti")
        .join(lost, Seq("src"), "left")
        .select(col("src"),
          (col("deg") - coalesce(col("lost"), lit(0L))).as("deg"))
        .localCheckpoint(eager = false)
    }
    // node "kind" = first char of the legacy string id; long-encoded
    // driver frames carry it in the kind bit, spec-built string frames
    // (arbitrary letter ids) keep the substring form
    val kind = und.schema("src").dataType match {
      case org.apache.spark.sql.types.LongType =>
        when(col("src") >= KindBit, lit("s")).otherwise(lit("c"))
      case _ => substring(col("src"), 1, 1)
    }
    deg.filter(col("deg") >= 1)
      .select(kind.as("kind"), col("deg"))
      .groupBy("kind", "deg")
      .agg(count(lit(1)).as("nodes"))
      .orderBy("kind", "deg")
  }

  def kcore(spark: SparkSession, dir: String): DataFrame =
    kcoreOf(edgesFor(spark, dir), KCoreK, KCoreRounds)

  /** g09's round budget — shared with the oracle's unroll so engine and
    * oracle can never silently desync (the g06 constant discipline). */
  val LpaRounds = 4

  /** g09's edge-support floor: a (customer, supplier) pair becomes an
    * edge only with ≥ this many lineitems. LPA on the RAW purchase graph
    * degenerates — the graph is dense enough that every node collapses
    * into one giant community by round 4 (measured: a single
    * 1600-node label at sf0.01) — so the community surface runs on the
    * repeat-purchase backbone, where the algorithm has real structure to
    * find (68 communities at sf0.01). The same move real pipelines make
    * (strength-threshold before community detection); d15's hot-shingle
    * cap is the same documented-constant discipline. */
  val LpaMinSupport = 3

  /** Support-thresholded undirected purchase graph with self-loops,
    * memoized src-partitioned (the selfLoopEdges discipline; separate
    * memo tag because the edge set differs from the raw graph). */
  private def lpaSelfEdges(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "graph-lpa-self") {
      val e0 = Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
        .groupBy(
          encNode(lit(false), col("o_custkey")).as("src"),
          encNode(lit(true), col("l_suppkey")).as("dst"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= LpaMinSupport)
        .select("src", "dst")
      withSelfLoops(e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))))
        .repartition(col("src"))
    }

  /** LABEL PROPAGATION COMMUNITIES (g09) — synchronous LPA (Raghavan,
    * Albert & Kumara 2007) made DETERMINISTIC: each round every node
    * adopts the most frequent label among its neighbors-plus-self (the
    * self-loop vote doubles as the anchor for weakly-connected nodes),
    * ties broken by the LEXICALLY SMALLEST label. Classic async LPA is
    * run-order-dependent — useless for a verifiable pipeline; the
    * synchronous fixed-budget form verifies bit-for-bit against the
    * unrolled oracle, the same stance as g06's bounded HashMin.
    *
    * The argmax-with-tiebreak is ONE struct-ordered aggregate —
    * min over (−count, label) — chained after the (node, label) count,
    * never a per-node window sort.
    *
    * Scale shape per round: one shuffle-hash join against the
    * src-partitioned memoized self-loop adjacency (only the node-grain
    * label vector moves — the g01 routing-table discipline), one
    * (node, label)-grain count with map-side combine, one node-grain
    * struct-min. Labels are referenced once per round (linear lineage,
    * g06's lazy checkpoint every 3 rounds) — O(E + V) per round, no
    * 2^rounds replay, no single-partition stage. */
  def lpaCommunitiesOf(withSelf: DataFrame, rounds: Int): DataFrame =
    lpaLabelsOf(withSelf, rounds)
      .groupBy("lbl").agg(count(lit(1)).as("size"))
      .groupBy("size")
      .agg(count(lit(1)).as("communities"), sum("size").as("nodes"))
      .orderBy("size")

  /** The LPA round loop itself, returning the final (node, lbl) vector —
    * g09 histograms it, g13 scores it. */
  private[graft] def lpaLabelsOf(withSelf: DataFrame, rounds: Int): DataFrame = {
    var labels = withSelf.select(col("src")).distinct()
      .select(col("src").as("node"), col("src").as("lbl"))
    for (r <- 1 to rounds) {
      labels = withSelf
        .join(labels.hint("shuffle_hash"), withSelf("src") === labels("node"))
        .select(withSelf("dst").as("node"), col("lbl"))
        .groupBy("node", "lbl").agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("top"))
        .select(col("node"), col("top.l").as("lbl"))
      if (r % 3 == 0 && r < rounds) labels = labels.localCheckpoint(eager = false)
    }
    labels
  }

  def lpaCommunities(spark: SparkSession, dir: String): DataFrame =
    lpaCommunitiesOf(lpaSelfEdges(spark, dir), LpaRounds)

  /** MODULARITY SCORING of the LPA partition (g13) — Newman & Girvan
    * 2004: Q = Σ_c [e_c/m − (deg_c/2m)²] over the same
    * support-thresholded purchase graph g09 labels. The quality number
    * every community detection run reports next to its size histogram
    * (a partition whose Q ≈ 0 found nothing better than random edge
    * placement) — here per community, so a drifting partition shows
    * WHICH families collapsed, plus the global Q as the column sum.
    *
    * Cross-engine determinism: e_c, deg_c, m are exact integers; each
    * dq is two correctly-rounded IEEE divisions, one multiply, one
    * subtract — the identical operation sequence in the oracle, so the
    * doubles are bit-identical with no rounding step (the d32 stance).
    *
    * Scale shape: labels come from the g09 loop (O(E) per round); the
    * scoring adds two label joins on the edge frame, one node-grain
    * degree aggregate, and label-grain sums — all O(E) with uniform
    * keys; m rides in as a broadcast 1-row cross join. The label
    * vector has three consumers, so it lazily checkpoints (the t42
    * discipline). */
  def lpaModularityOf(withSelf: DataFrame, rounds: Int): DataFrame = {
    val labels = lpaLabelsOf(withSelf, rounds).localCheckpoint(eager = false)
    val und = withSelf.filter(col("src") =!= col("dst"))
    // bipartite 'c…'→'s…' ids: src < dst picks each undirected edge once
    val e0 = und.filter(col("src") < col("dst"))
    val mdf = e0.agg(count(lit(1)).as("m"))
    val la = labels.select(col("node").as("src"), col("lbl"))
    val lb = labels.select(col("node").as("dst"), col("lbl").as("lblb"))
    val ec = e0.join(la, Seq("src")).join(lb, Seq("dst"))
      .filter(col("lbl") === col("lblb"))
      .groupBy("lbl").agg(count(lit(1)).as("iec"))
    val degc = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .join(labels.select(col("node").as("src"), col("lbl")), Seq("src"))
      .groupBy("lbl")
      .agg(count(lit(1)).as("size"), sum("deg").as("degree_sum"))
    degc.join(ec, Seq("lbl"), "left")
      .crossJoin(broadcast(mdf))
      .select(col("lbl").as("community"), col("size"),
        coalesce(col("iec"), lit(0L)).as("internal_edges"),
        col("degree_sum"), col("m"))
      .withColumn("dq",
        col("internal_edges").cast("double") / col("m")
          - (col("degree_sum").cast("double") / (col("m") * lit(2.0)))
          * (col("degree_sum").cast("double") / (col("m") * lit(2.0))))
      .drop("m")
      .orderBy("community")
  }

  def lpaModularity(spark: SparkSession, dir: String): DataFrame =
    // community labels ride as longs through the loop and the scoring
    // joins; decode at the report grain (orderBy inside lpaModularityOf
    // sorted the encs, whose order equals the decoded strings')
    lpaModularityOf(lpaSelfEdges(spark, dir), LpaRounds)
      .withColumn("community", decNode(col("community")))

  /** COMMUNITY CONDUCTANCE (g15) — the OTHER community-quality axis:
    * g13's modularity says how much better-than-random a partition is
    * GLOBALLY; conductance φ(C) = cut(C) / min(vol(C), 2m − vol(C))
    * says how leaky each community is LOCALLY — the bottleneck measure
    * sweep-cut algorithms optimize and the standard acceptance test for
    * "is this community real or an artifact of the rounds budget".
    * Low-φ + low-dq communities are padding; high-φ ones bleed into
    * their neighborhood and merge under one more LPA round. Every
    * quantity is an exact integer off the same label vector g09/g13
    * score (cut counts each boundary edge once PER SIDE; vol = degree
    * sum, so vol = 2·internal + cut — the identity OpsSpec pins against
    * g13 row by row); φ is one IEEE divide of exact BIGINTs, round(,6).
    *
    * Scale shape: two label lookups on the once-per-edge frame + one
    * explode-both-sides aggregate — all O(E) on uniform keys, the g13
    * plan with the filter flipped; the report is #communities-sized. */
  def lpaConductanceOf(withSelf: DataFrame, rounds: Int): DataFrame = {
    val labels = lpaLabelsOf(withSelf, rounds).localCheckpoint(eager = false)
    val und = withSelf.filter(col("src") =!= col("dst"))
    val e0 = und.filter(col("src") < col("dst"))
    val mdf = e0.agg(count(lit(1)).as("m"))
    val la = labels.select(col("node").as("src"), col("lbl"))
    val lb = labels.select(col("node").as("dst"), col("lbl").as("lblb"))
    val cut = e0.join(la, Seq("src")).join(lb, Seq("dst"))
      .filter(col("lbl") =!= col("lblb"))
      .select(explode(array(col("lbl"), col("lblb"))).as("lbl"))
      .groupBy("lbl").agg(count(lit(1)).as("cut_edges"))
    val degc = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .join(labels.select(col("node").as("src"), col("lbl")), Seq("src"))
      .groupBy("lbl")
      .agg(count(lit(1)).as("size"), sum("deg").as("volume"))
    degc.join(cut, Seq("lbl"), "left")
      .crossJoin(broadcast(mdf))
      .select(col("lbl").as("community"), col("size"), col("volume"),
        coalesce(col("cut_edges"), lit(0L)).as("cut_edges"),
        (col("m") * 2 - col("volume")).as("rest"))
      .withColumn("conductance",
        when(least(col("volume"), col("rest")) <= 0, lit(0.0))
          .otherwise(round(col("cut_edges").cast("double")
            / least(col("volume"), col("rest")), 6)))
      .drop("rest")
      .orderBy("community")
  }

  def lpaConductance(spark: SparkSession, dir: String): DataFrame =
    lpaConductanceOf(lpaSelfEdges(spark, dir), LpaRounds)
      .withColumn("community", decNode(col("community")))

  /** DETERMINISTIC RANDOM WALKS (g11) — the DeepWalk/node2vec corpus
    * step (Perozzi et al. 2014): sample fixed-length walks from every
    * node and hand the sequences to a skip-gram trainer; the walk corpus
    * IS training data, which makes this the graph→LLM-pipeline bridge.
    * "Random" here is the repo's reproducibility discipline (t46/t09):
    * the step choice is argmin over neighbors of
    * md5("rw|start|walk|step|here|neighbor") — a pure function of the
    * walk position, so reprocessing at any scale replays the EXACT
    * corpus, engines agree byte-for-byte, and no RNG state is
    * coordinated across executors (the property that makes distributed
    * "sampling" reproducible at all).
    *
    * Per step: ONE shuffle-hash join of the walk frontier (V×W rows)
    * against the memoized undirected edge frame + one (start, walk)
    * min_by — O(E·W/V-ish) work per step, L steps. Each frontier has
    * TWO consumers (the next step's join and the final trail union), so
    * every frontier lazily localCheckpoints before joining the trail —
    * without that the union replays frontier t's join chain once per
    * later step (O(L²) step-joins; the g06/k-core lineage discipline).
    * Walks can't die: the graph is
    * undirected, so the arriving edge is always available to leave by.
    * The gate row is a per-start MANIFEST (t46's trick — step count,
    * distinct nodes visited, an order-sensitive Σ position·residue
    * fingerprint), so the oracle verifies every step of every walk
    * without shipping the raw corpus. */
  /** One UN-CHECKPOINTED walk step: frontier ⋈ undirected edges →
    * md5-argmin next hop. Extracted so PlanSpec can pin the in-loop
    * join strategy directly (ADVICE r10): the production loop wraps
    * each step in a lazy localCheckpoint, which hides these joins
    * behind Scan ExistingRDD in the FINAL plan — a strategy regression
    * inside the loop would otherwise pass the plan test. */
  private[graft] def walkStep(frontier: DataFrame, und: DataFrame,
                              t: Int): DataFrame = {
    val key = md5(concat_ws("|",
      lit("rw"), col("start"), col("w"), lit(t), col("u"), col("p2")))
    frontier
      .join(und.hint("shuffle_hash"), col("u") === col("p1"))
      .groupBy("start", "w")
      .agg(min_by(col("p2"), key).as("u"))
      .withColumn("t", lit(t))
      .select("start", "w", "t", "u")
  }

  /** The first walk step as a bare frame (no checkpoint) — PlanSpec's
    * window into the loop's join strategy. */
  private[graft] def walkStepFrame(spark: SparkSession, dir: String,
                                   walks: Int = 2): DataFrame = {
    val frontier = copurchaseDegrees(spark, dir)
      .select(col("pk").as("start"))
      .withColumn("w", explode(array((0 until walks).map(lit): _*)))
      .withColumn("t", lit(0))
      .withColumn("u", col("start"))
    walkStep(frontier, undirectedEdgesFor(spark, dir), 1)
  }

  def randomWalks(spark: SparkSession, dir: String,
                  walks: Int = 2, length: Int = 4): DataFrame = {
    val und = undirectedEdgesFor(spark, dir) // (p1=here, p2=neighbor)
    var frontier = copurchaseDegrees(spark, dir)
      .select(col("pk").as("start"))
      .withColumn("w", explode(array((0 until walks).map(lit): _*)))
      .withColumn("t", lit(0))
      .withColumn("u", col("start"))
      .localCheckpoint(eager = false)
    val trail = scala.collection.mutable.Buffer(frontier)
    for (t <- 1 to length) {
      frontier = walkStep(frontier, und, t)
        .localCheckpoint(eager = false)
      trail += frontier
    }
    trail.reduce(_ unionByName _)
      .groupBy("start")
      .agg(
        count(lit(1)).as("n_steps"),
        countDistinct(col("u")).as("distinct_visited"),
        sum((col("w") * (length + 1) + col("t") + 1).cast("long")
          * (col("u") % 1000003L)).as("walk_fp"))
      .orderBy("start")
  }
}
