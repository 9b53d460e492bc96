package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Determinism cross-engine: per-edge contributions are 12dp-rounded
  * doubles cast to DECIMAL(30,15) before the sum — exact, order-
  * independent addition (the engine-portability discipline of the exact-
  * sum paths) — and each new rank re-rounds to 12dp, so both engines walk
  * identical fixed-point trajectories. Damping stays the 0.15/0.85
  * literal pair (never computed as 1−d: 1.0−0.85 is not the double 0.15).
  */
object GraphRank {

  /** Bipartite purchase edges, both directions (undirected walk — every
    * node therefore has out-degree ≥ 1: no dangling-mass handling). */
  private def purchaseEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val e0 = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(
        concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  def graphRankOf(
      orders: DataFrame,
      lineitem: DataFrame,
      iterations: Int = 3,
      damping: Double = 0.85,
      teleport: Double = 0.15): DataFrame = {
    val edges = purchaseEdges(orders, lineitem)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, Seq("src")).persist()
    adj.count()
    val nDf = deg.agg(count(lit(1)).as("n"))

    var ranks = deg.select(col("src").as("node"))
      .crossJoin(broadcast(nDf))
      .select(col("node"), round(lit(1.0) / col("n"), 12).as("r"))
    for (_ <- 1 to iterations) {
      ranks = adj
        .join(ranks, adj("src") === ranks("node"))
        .select(adj("dst"),
          round(col("r") / col("deg"), 12).cast("decimal(30,15)").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("s"))
        .crossJoin(broadcast(nDf))
        .select(
          col("dst").as("node"),
          round(lit(teleport) / col("n") +
            lit(damping) * col("s").cast("double"), 12).as("r"))
    }

    ranks
      .join(deg, ranks("node") === deg("src"))
      .filter(col("node").startsWith("s"))
      .select(col("node"), col("deg").as("degree"), col("r").as("rank_score"))
      .orderBy("node")
  }

  def graphRank(spark: SparkSession, dir: String): DataFrame =
    graphRankOf(Tables.orders(spark, dir), Tables.lineitem(spark, dir))
}
