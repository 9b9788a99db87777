package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster
  * step a dedup pipeline runs AFTER pair detection: near-dup pairs
  * (q41/q43) chain transitively (A≈B, B≈C), and curation keeps one
  * representative per component, not per pair.
  *
  * Algorithm: iterative min-label propagation with path halving.
  * Every node starts labeled with its own id; each round it adopts
  * `min(own, min over neighbors)` and then hops its label one step
  * (`comp := comp(comp)` — valid because labels only decrease, so the
  * label graph is a pointer forest toward each component's minimum).
  * Neighbor propagation alone needs O(diameter) rounds; the hop halves
  * pointer chains each round, so convergence is O(log n) rounds even
  * on path-shaped components — the same round bound the
  * large-star/small-star MapReduce formulation gives, with two
  * equi-joins + one agg per round, each a plain key shuffle.
  *
  * Driver involvement per round is ONE scalar (`changed` count) plus
  * an eager `localCheckpoint` that truncates the growing lineage —
  * no per-row driver work, so the loop distributes at any scale.
  */
object ConnectedComponents {

  /** Free the storage blocks behind a `localCheckpoint`ed frame.
    * `Dataset.unpersist` only clears cache-manager entries (`.persist`);
    * checkpoint blocks live under the internal RDD inside the plan's
    * [[org.apache.spark.sql.execution.LogicalRDD]] leaf.
    */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Labels `(id, comp)` for every node appearing in `edges`
    * (`src`/`dst` columns); `comp` is the minimum node id reachable —
    * a canonical, deterministic component representative. Nodes with
    * no edges don't appear (callers union singletons back if needed).
    */
  def apply(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 50): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val sym = edges.select(col(src).as("id"), col(dst).as("nbr"))
      .union(edges.select(col(dst).as("id"), col(src).as("nbr")))
      .localCheckpoint()
    var labels = sym.select($"id").distinct()
      .withColumn("comp", $"id").localCheckpoint()
    // the frame whose checkpoint blocks may be dropped once the round
    // that superseded it has materialized (labels at round r reads the
    // round-(r-1) checkpoint, so only current + previous may be live —
    // without this, 50 rounds pin 50 checkpoint generations in executor
    // storage)
    var retired: DataFrame = null
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select($"id".as("nbr"), $"comp".as("nbr_comp")), "nbr")
        .groupBy($"id").agg(min($"nbr_comp").as("nbr_comp"))
      val viaNbr = labels.select($"id", $"comp".as("old"))
        .join(nbrMin, Seq("id"), "left")
        .select($"id", $"old",
          least($"old", coalesce($"nbr_comp", $"old")).as("comp"))
      // path halving: follow the label pointer one hop (comp(comp) ≤
      // comp because labels only decrease); the previous label rides
      // along so the convergence check below is a filter over the
      // checkpointed frame, not another join against `labels`
      val next = viaNbr.as("a")
        .join(viaNbr.select($"id".as("c0"), $"comp".as("c2")).as("b"),
          $"a.comp" === $"b.c0")
        .select($"a.id".as("id"), $"a.old".as("old"), $"b.c2".as("comp"))
        .localCheckpoint()
      changed = next.filter($"comp" =!= $"old").count()
      // `next` is materialized (the count above); the generation before
      // last can no longer be referenced — release its blocks
      if (retired ne null) dropCheckpoint(retired)
      retired = labels
      labels = next.select($"id", $"comp")
      iter += 1
    }
    require(changed == 0,
      s"connected components did not converge in $maxIter rounds")
    // the final labels are their own checkpoint — the symmetric edge
    // frame is no longer reachable through them
    dropCheckpoint(sym)
    if (retired ne null) dropCheckpoint(retired)
    labels
  }
}
