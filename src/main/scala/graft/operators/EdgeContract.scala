package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Loud enforcement of the once-per-edge canonical (u < v) input
  * contract the undirected-graph operators share (LabelPropagation,
  * RandomWalk — the `CoOccurrence` / `coEdgesFor` output shape).
  *
  * A bidirectional or self-loop row silently double-counts neighbor
  * votes / biases walk argmins — the class of corruption nobody
  * notices until the communities look wrong. Checking with a separate
  * validation pass would rescan the edge relation; this wraps the `u`
  * column in a codegen'd `raise_error` conditional instead (the
  * [[graft.functions.Similarity]] block-guard pattern): zero extra
  * pass, zero cost on valid rows, a named failure on the first
  * violating one.
  *
  * NOTE exact duplicate canonical rows are NOT detectable map-side;
  * they remain the caller's contract (deduping here would impose a
  * shuffle on every caller that already guarantees uniqueness, as the
  * in-repo producers do via their groupBy construction). */
private[graft] object EdgeContract {

  /** Edges as (u, v) longs with the canonical form enforced in-plan. */
  def canonical(edges: DataFrame, uCol: String, vCol: String,
                op: String): DataFrame =
    edges.select(col(uCol).cast("long").as("u"),
                 col(vCol).cast("long").as("v"))
      .withColumn("u",
        when(col("u") >= col("v"),
          expr(s"raise_error(concat('$op: edge (', u, ', ', v, ') violates " +
            "the canonical u < v once-per-edge contract — symmetrize/" +
            "canonicalize upstream (CoOccurrence emits this shape)'))"))
          .otherwise(col("u")))
}
