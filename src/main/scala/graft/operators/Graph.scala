package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps
import graft.sources.Tables

/** Graph analytics over the near-duplicate candidate graph (nodes =
  * documents, undirected edges = minhash-LSH candidate pairs) — the
  * "which cluster representatives matter" ranking a curation pipeline
  * runs after dedup clustering.
  *
  * Design points:
  *   - **Fixed iteration count ⇒ one Catalyst plan.** Unlike the
  *     connected-components loop (data-dependent convergence, driver
  *     paced), k PageRank iterations unroll into a single declarative
  *     plan of k join+aggregate rounds — Catalyst sees the whole thing,
  *     AQE sizes every exchange, and no action runs until the sink.
  *   - **Integer fixed-point (10^12 micro-units) everywhere.** Ranks are
  *     BIGINTs; per-edge contributions use integer floor-division and
  *     per-node sums are exact integer math — no float summation order
  *     anywhere, so any engine (and the DuckDB oracle, which unrolls the
  *     same three iterations) reproduces identical values bit-for-bit.
  *   - Scale shape per iteration: one shuffle of (dst, contrib) long
  *     pairs + one hash aggregate — edges only, never text. Isolated
  *     documents keep the teleport mass `base`; dangling-mass
  *     redistribution is deliberately omitted (every edge is
  *     undirected, so every non-isolated node has out-degree ≥ 1).
  */
object Graph {

  private val Scale = 1000000000000L // 10^12 micro-units of rank mass

  /** 3-iteration PageRank (damping 0.85) over the minhash candidate
    * graph. Returns (doc_id, degree, pagerank_f BIGINT micro-units,
    * pagerank DOUBLE rounded from the integer — display only).
    */
  def pagerank(spark: SparkSession, sfDir: String, iters: Int = 3): DataFrame = {
    val pairs = Dedup.minhashPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).truncateLineage()
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = Tables.documents(spark, sfDir).select(col("doc_id"))
    // corpus size rides the plan as a broadcast 1-row aggregate (BNLJ)
    val n = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))

    val init = nodes.crossJoin(n)
      .select(col("doc_id"), col("n_nodes"),
        expr(s"${Scale}L div n_nodes").as("rank_f"))

    val last = (1 to iters).foldLeft(init) { (rank, _) =>
      val contrib = edges
        .join(rank.select(col("doc_id").as("src"), col("rank_f")), "src")
        .join(deg, "src")
        .groupBy(col("dst"))
        .agg(sum(expr("(rank_f * 85L) div (deg * 100L)")).as("in_mass"))
      rank.select(col("doc_id"), col("n_nodes"))
        .join(contrib, rank("doc_id") === contrib("dst"), "left")
        .select(col("doc_id"), col("n_nodes"),
          (expr(s"(15L * ${Scale}L) div (100L * n_nodes)")
            + coalesce(col("in_mass"), lit(0L))).as("rank_f"))
    }

    last.join(deg, last("doc_id") === deg("src"), "left")
      .select(col("doc_id"),
        coalesce(col("deg"), lit(0L)).as("degree"),
        col("rank_f").as("pagerank_f"),
        round(col("rank_f").cast("double") / lit(Scale.toDouble), 9)
          .as("pagerank"))
  }
}
