package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the missing
  * last stage of the near-dup pipeline: `dd2`/`dd4`/`dd5` emit
  * *pairs*, but a production dedup run needs transitive *clusters*
  * (a≈b, b≈c ⇒ {a,b,c} is one group with one kept canonical doc).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC '14) — the
  * standard shuffle-based CC used at web scale:
  *
  *   large-star: for every node u, connect every strictly-larger
  *     neighbor v to m = min(N(u) ∪ {u});
  *   small-star: canonicalize edges to (hi → lo) and connect every
  *     smaller-or-equal neighbor (and hi itself) to the minimum.
  *
  * Both steps are a groupBy-min plus a join — two shuffles per round,
  * no driver-side state beyond a 2-value convergence signature — and
  * the edge set contracts toward a forest of stars rooted at each
  * component's minimum id. Convergence is O(log² n) rounds worst case
  * and a handful in practice (near-dup clusters are shallow).
  *
  * 100 TB notes: per-round state is only the (shrinking) edge list;
  * every round ends in `localCheckpoint` so lineage stays O(1) deep
  * instead of O(rounds); the convergence test aggregates to a single
  * (count, hash-sum) row rather than collecting edges. Skewed hubs
  * (one doc near-dup to millions) appear as a hot groupBy key; the
  * min() aggregate is algebraic, so map-side partial aggregation
  * absorbs the skew.
  */
object ConnectedComponents {

  /** Below this many (distinct) edges the graph is solved on the
    * driver with union-find instead of shuffle rounds — each star
    * contraction round costs 4 shuffles + a checkpoint, so a graph
    * that fits driver memory is solved orders of magnitude faster
    * sequentially (5M edges ≈ 80 MB collected, < 1 s of union-find).
    * Near-dup graphs are tiny relative to their corpus (edges ≈ dup
    * pairs), so in practice the distributed path is for the 100 TB
    * runs it exists for. Both paths are spec'd identical.
    */
  val DriverGraphCap = 5000000L

  /** Core fixpoint: edges (two numeric columns, undirected) →
    * (id, component) for every node that appears in an edge, where
    * component = the minimum node id of the connected component.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50,
          driverCap: Long = DriverGraphCap): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"edges must have exactly 2 columns, got ${cols.mkString(",")}")

    var e = edges
      .select(col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    if (e.count() <= driverCap) return runLocal(spark, e)

    var prevSig: (Long, Long) = (-1L, -1L)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: center u sees symmetric neighborhood; every
      // neighbor v > u re-attaches to min(N(u) ∪ {u})
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mn  = sym.groupBy("u").agg(min("v").as("mn"))
      val ls = sym
        .join(mn, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("u"), col("mn")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()

      // small-star: canonicalize to (hi → lo); hi and all its lo
      // neighbors attach to the minimum lo
      val can = ls.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val mn2 = can.groupBy("u").agg(min("v").as("m"))
      val ss = can
        .join(mn2, "u")
        .select(col("v").as("id"), col("m").as("comp"))
        .union(mn2.select(col("u").as("id"), col("m").as("comp")))
        .filter(col("id") =!= col("comp"))
        .distinct()

      e = ss.select(col("id").as("u"), col("comp").as("v")).localCheckpoint()

      // converged ⇔ the canonical edge set is unchanged: compare an
      // order-insensitive (count, xor-of-hashes) signature — one tiny
      // row to the driver, never the edges themselves (XOR is sound
      // here because the edge set is distinct; it also cannot overflow
      // under ANSI mode the way a hash *sum* would)
      val sigRow = e.agg(
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).head()
      val sig = (sigRow.getLong(0), sigRow.getLong(1))
      converged = sig == prevSig
      prevSig = sig
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")

    // converged edge set is a star forest (node → component root);
    // roots appear only on the right — add their self-assignment
    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")).distinct())
      .distinct()
  }

  /** driver-side union-find (path-halving, iterative — no recursion
    * depth limit) for graphs under [[DriverGraphCap]]. */
  private def runLocal(spark: SparkSession, e: DataFrame): DataFrame = {
    val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // path halving
        x = parent(x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet.toSeq
    import spark.implicits._
    ids.map(id => (id, find(id))).toDF("id", "component")
  }

  /** `run` plus singleton completion: every id in `nodes` absent from
    * the edge set becomes its own component. This is the form a dedup
    * pipeline wants — every document gets a cluster id.
    */
  def assign(spark: SparkSession, edges: DataFrame, nodes: DataFrame, maxIter: Int = 50,
             driverCap: Long = DriverGraphCap): DataFrame = {
    val idCol  = nodes.columns.head
    val allIds = nodes.select(col(idCol).cast("long").as("id")).distinct()
    val linked = run(spark, edges, maxIter, driverCap)
    val singletons = allIds
      .join(linked.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    linked.union(singletons)
  }
}
