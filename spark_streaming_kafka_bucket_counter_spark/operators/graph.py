"""Connected components over near-duplicate pair graphs — the step that
turns pairwise dedup output into actionable clusters (one keeper per
component; everything else is a duplicate of it).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, a node's label becomes the min of its own label
and its neighbors' labels; fixpoint after <= diameter rounds. Dedup
graphs are forests of small dense clusters (diameter is tiny), so the
loop converges in a handful of rounds.

Scale design: each round is ONE hash join (labels x undirected edges)
plus one groupBy-min — both shuffle on node id, and AQE handles the
skewed super-cluster case. Convergence is detected with a scalar
aggregate: min-propagation is monotone (labels only decrease), so
``sum(label)`` strictly decreases every non-converged round — one
8-byte action per round, no row-level diff join. Lineage is cut per
round with ``localCheckpoint`` so the plan doesn't grow with the
iteration count (the classic iterative-DataFrame trap).

The DuckDB oracle replays the same semantics declaratively with a
recursive transitive-closure CTE — exponential-ish on big graphs but
exact on oracle-scale data, which is the point: the *iterative* Spark
path and the *recursive* SQL path must agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable via undirected edges."""
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    # lazy localCheckpoint: the convergence aggregate right below is the
    # action that materializes it, so each round costs ONE Spark job
    # (eager=True would double that — checkpoint job + sum job)
    labels = (
        und.select("u").distinct().withColumn("label", F.col("u"))
        .localCheckpoint(eager=False)
    )
    # decimal(38,0) sum: an int64 sum could wrap (non-ANSI) with
    # hash-scale node ids and fake a fixpoint via collision
    _sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = labels.agg(_sum).collect()[0][0]
    converged = False
    for _ in range(max_iter):
        neighbor = (
            und.join(labels.withColumnRenamed("u", "v"), "v")
            .select("u", "label")
        )
        labels = (
            labels.unionByName(neighbor)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(_sum).collect()[0][0]
        if cur_sum == prev_sum:  # monotone -> equal sum == fixpoint
            converged = True
            break
        prev_sum = cur_sum
    und.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (component diameter exceeds the bound) — raise max_iter; "
            "returning partial labels would silently split real clusters"
        )
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def component_summary(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """One row per duplicate cluster: canonical keeper (min id), size."""
    cc = connected_components(edges, src, dst)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").alias("max_member"),
    )


def drop_near_duplicate_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """The end-to-end near-dup DEDUP transform: keep every document
    except non-canonical cluster members (component keeper = min id).

    One anti-join of the corpus against the (tiny) non-keeper set — the
    corpus itself is never shuffled beyond the join, and the non-keeper
    side is candidates-scale, not corpus-scale."""
    cc = connected_components(pairs, src, dst)
    non_keepers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(non_keepers, id_col, "left_anti")


def transitive_closure_sql(pairs_cte: str, src: str = "doc_a", dst: str = "doc_b") -> str:
    """DuckDB oracle: min reachable id per node via recursive closure.

    ``pairs_cte`` must be the name of an in-scope CTE with ``src``/``dst``
    columns. Returns SQL fragments for a WITH-chain continuation:
    und / reach CTE bodies and the final per-node component select.
    """
    return f"""
    und AS (SELECT {src} AS u, {dst} AS v FROM {pairs_cte}
            UNION SELECT {dst}, {src} FROM {pairs_cte}),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT u FROM und UNION SELECT v FROM und)
      UNION
      SELECT r.u, und.v FROM reach r JOIN und ON r.v = und.u
    ),
    cc AS (SELECT u AS node, MIN(v) AS component FROM reach GROUP BY u)
    """
