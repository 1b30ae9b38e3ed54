package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: a Spark implementation plus (when the op is
  * SQL-expressible over the shared parquet tables) a DuckDB oracle that must
  * hash-match it exactly.
  *
  * Parity rules used throughout the inventory:
  *  - every query ends in a total ORDER BY (hashing may be order-sensitive);
  *  - double-typed aggregates are computed as exact decimal sums (see
  *    graft.functions.ExactAgg) or fixed-order folds, never free-order
  *    double sums, so Spark and a single-threaded oracle agree bit-for-bit;
  *  - output column names are aliased identically on both sides.
  *
  * `prewarm` (optional): re-materializes session-shared assets the query
  * PROBES but should not be billed for BUILDING — the persisted IVF
  * assignment frame, the semantic-dedup labeling. The bench harness runs it
  * after its cache sweep and BEFORE starting the gate's timer, so a timed
  * run measures the operator (the search / the mining), not the
  * reconstruction of an index that production builds once at ingest. The
  * correctness path (Verify) ignores it — gate functions remain
  * self-sufficient and rebuild shared assets on demand.
  */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String] = None,
             prewarm: Option[(SparkSession, String) => Unit] = None)
