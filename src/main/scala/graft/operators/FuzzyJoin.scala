package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact edit-distance joins between two LARGE string-keyed frames.
  *
  * The engine already covers the small-dim case (probe list × broadcast
  * dimension, q_j_fuzzy_levenshtein): that shape is O(|corpus|·|probes|) and
  * correct only while one side broadcasts. A training-data pipeline also
  * needs the big-big case — matching near-identical titles, product keys, or
  * citation strings ACROSS two corpus-scale frames — where a cross join is
  * never an option and candidate generation must be an equi-join.
  *
  * Blocking scheme: the LENGTH BAND. Edit distance >= abs(len(a) - len(b)),
  * so dist(a,b) <= t implies the lengths differ by at most t — replicating
  * one side to its 2t+1 admissible lengths and equi-joining on length is
  * SOUND (never loses a true pair; the gate proves it by matching an
  * unblocked all-pairs oracle) and turns the pair space into per-length-band
  * blocks. Each surviving candidate is confirmed with `levenshtein`
  * (codegen'd, integer-exact on every engine). Replication factor is the
  * constant 2t+1 — thresholds in entity-resolution practice are 1-3.
  *
  * At 100 TB: the length key is coarse (natural-language keys concentrate
  * around a few lengths), so band sizes are skewed — the join is an
  * AQE-splittable shuffle join on an integer key, and the standard levers
  * apply (salt the heavy bands with SaltedJoin, or cap via a key-frequency
  * cut like the LSH family's maxTokenDf). The exactness-preserving upgrade
  * path when bands are still too dense is segment blocking (pigeonhole the
  * key into t+1 segments; a true match shares at least one segment verbatim
  * — the PassJoin family), which subdivides every band by content; the
  * length band stays the right first cut because it is free and its
  * soundness is unconditional.
  */
object FuzzyJoin {

  /** All pairs (left × right) with levenshtein(key) <= maxDist, as an
    * equi-join on the length band — no cross product. Output:
    * (id_l, id_r, key_l, key_r, dist). */
  def join(left: DataFrame, right: DataFrame, idCol: String, keyCol: String,
           maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val l = left.select(col(idCol).as("id_l"), col(keyCol).as("key_l"),
      length(col(keyCol)).as("len_l"))
    val r = right.select(col(idCol).as("id_r"), col(keyCol).as("key_r"))
      .withColumn("len_band",
        explode(sequence(length(col("key_r")) - maxDist,
          length(col("key_r")) + maxDist)))
    l.join(r, col("len_l") === col("len_band"))
      .withColumn("dist", levenshtein(col("key_l"), col("key_r")))
      .filter(col("dist") <= maxDist)
      .select(col("id_l"), col("id_r"), col("key_l"), col("key_r"),
        col("dist").cast("bigint").as("dist"))
  }

  /** Self-join variant: unordered pairs once (id_a < id_b), the fuzzy-dup
    * candidate surface for a key column. */
  def selfJoin(df: DataFrame, idCol: String, keyCol: String,
               maxDist: Int): DataFrame =
    join(df, df, idCol, keyCol, maxDist)
      .filter(col("id_l") < col("id_r"))
      .select(col("id_l").as("id_a"), col("id_r").as("id_b"),
        col("key_l").as("key_a"), col("key_r").as("key_b"), col("dist"))
}
