package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget bins (the batching step before writing pre-training
  * sequences — packing short documents together instead of padding each one
  * is a 2-5x token-efficiency win).
  *
  * Exact capacity-constrained bin packing is inherently sequential, so the
  * distributed formulation packs CONTIGUOUSLY in a deterministic order inside
  * hash shards:
  *  - shard = md5-bucket of the id (pure function of the row — reproducible
  *    across engines, runs, and cluster sizes, like [[Sampling]]);
  *  - within a shard, documents are laid out in id order and a bin closes
  *    when the running token total passes the budget: bin = floor(exclusive
  *    prefix sum / budget). A document straddling the boundary lands in the
  *    bin where it starts, so a bin can overflow by at most one document —
  *    the standard streaming approximation.
  *
  * Scale shape: ONE shuffle (the shard window); each shard's window is
  * |corpus|/shards rows, so parallelism is chosen by the caller, not bounded
  * by a single global sort. No driver-side state.
  */
object Packing {

  /** Null/uncastable token counts count as 0 tokens — every variant treats
    * dirty rows identically (they ride along in whatever bin is open) instead
    * of the stateful scans NPE-ing where the window variant tolerates. */
  private def zeroIfNull(tokenCount: Column): Column =
    coalesce(tokenCount.cast("long"), lit(0L))

  /** Shared preamble of every packing variant: normalized token counts plus
    * the md5 shard bucket (a pure function of the id — reproducible across
    * engines, runs, and cluster sizes). */
  private def sharded(docs: DataFrame, idCol: String, tokenCount: Column,
                      shards: Int, salt: String): DataFrame =
    docs
      .withColumn("__tokens", zeroIfNull(tokenCount))
      .withColumn("shard", Sampling.hashBucket(col(idCol), shards, salt))

  /** Shared scaffold of the stateful packing scans ([[packBinsCapped]],
    * [[packBinsFirstFit]]): shard, repartition on the shard hash, sort
    * within partitions (externally, spill-safe) in the caller's layout
    * order, then stream each partition once assigning a bin per row.
    * `freshShard` returns a new tokens=>bin assignment closure at every
    * shard boundary, so per-shard packing state can't leak between shards
    * and the variants can't drift in their preamble. ONE shuffle,
    * shard-bounded sequential work, no driver state. */
  private def scanShards(docs: DataFrame, idCol: String, tokenCount: Column,
                         shards: Int, salt: String, order: Seq[Column])
                        (freshShard: () => Long => Long): DataFrame = {
    val spark = docs.sparkSession
    val laid = sharded(docs, idCol, tokenCount, shards, salt)
      .repartition(math.min(shards, spark.sessionState.conf.numShufflePartitions),
        col("shard"))
      .sortWithinPartitions(col("shard") +: order :+ col(idCol): _*)
    val schema = laid.schema.add("bin", "long")
    val shardIdx = laid.schema.fieldIndex("shard")
    val tokIdx = laid.schema.fieldIndex("__tokens")
    val out = laid.mapPartitions { rows =>
      // a partition holds whole shards (hash-partitioned on shard) in layout
      // order; a fresh assignment closure resets state at shard boundaries
      var shard = Long.MinValue
      var assign: Long => Long = null
      rows.map { r =>
        val s = r.getLong(shardIdx)
        if (s != shard) { shard = s; assign = freshShard() }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ assign(r.getLong(tokIdx)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    out.drop("__tokens")
  }

  /** Bin assignment. Output: every input row plus (shard, bin, tokens_before)
    * where `bin` is shard-local and `tokens_before` is the exclusive prefix
    * sum inside the bin's shard — enough for a writer to lay out sequences
    * deterministically.
    *
    * `order` picks the shard-local layout. Empty (default) = id order.
    * Passing e.g. `Seq(desc("n_tokens"))` gives decreasing-length layout —
    * the next-fit-decreasing packing heuristic, which raises fill ratio
    * (long docs open bins, short docs top them up) at identical cost: the
    * id is always appended as the final tie-break, so any `order` is total
    * and the layout stays bit-deterministic across engines and runs. */
  def packBins(docs: DataFrame, idCol: String, tokenCount: Column,
               budgetTokens: Long, shards: Int = 1024,
               salt: String = "", order: Seq[Column] = Nil): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy("shard").orderBy(order :+ col(idCol): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded(docs, idCol, tokenCount, shards, salt)
      .withColumn("tokens_before", coalesce(sum(col("__tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("tokens_before") / budgetTokens))
      .drop("__tokens")
  }

  /** Training manifest for a [[packBins]] layout: each document's token
    * OFFSET inside its bin — what a packed-sequence loader needs to reset
    * position ids and attention-mask boundaries at document starts. In the
    * floor-division layout a document starts where the shard's running
    * total left off, so offset = tokens_before mod budget (a document
    * straddling the budget boundary runs past the bin edge — packBins never
    * splits documents; use the capped/first-fit variants when bins must not
    * overflow). Pure column arithmetic on the packed frame: no extra
    * shuffle, no extra pass. */
  def packManifest(packed: DataFrame, budgetTokens: Long): DataFrame =
    packed.withColumn("offset", pmod(col("tokens_before"), lit(budgetTokens)))

  /** Capacity-constrained bin assignment: bins NEVER overflow — a document
    * that does not fit in the current bin's remaining budget closes it and
    * opens the next (a document alone larger than the budget still gets its
    * own bin; documents are never split). This is next-fit packing; combined
    * with `order = Seq(desc(tokenCountCol))` it is next-fit-decreasing, the
    * classic fill-ratio upgrade (long documents open bins, the short tail
    * tops them up — see the OperatorsSpec fixture for the measured gap).
    *
    * Unlike [[packBins]] (a pure window expression), the no-overflow
    * recurrence is inherently sequential — bin boundaries depend on the
    * accumulated waste of every earlier bin — so each shard is streamed
    * once through a per-partition scan: repartition on the shard hash,
    * sort within partitions (externally, spill-safe), then a single
    * stateful pass. Same scale shape as the window variant: ONE shuffle,
    * shard-bounded sequential work, no driver state.
    *
    * Output: input columns + (shard, bin). Deterministic: shard is a pure
    * hash of the id, layout order is total (id appended as tie-break). */
  def packBinsCapped(docs: DataFrame, idCol: String, tokenCount: Column,
                     budgetTokens: Long, shards: Int = 1024,
                     salt: String = "", order: Seq[Column] = Nil): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    scanShards(docs, idCol, tokenCount, shards, salt, order) { () =>
      // running (bin, fill) state; the first doc always lands in bin 0 even
      // when it alone exceeds the budget (docs are never split)
      var bin = 0L
      var fill = 0L
      var first = true
      t => {
        if (first) { first = false; fill = t }
        else if (fill + t <= budgetTokens) { fill += t }
        else { bin += 1L; fill = t }
        bin
      }
    }
  }

  /** TRUE first-fit bin assignment: each document goes into the FIRST open
    * bin with room (bins never overflow, like [[packBinsCapped]]); only when
    * no open bin fits does it open a new one. With
    * `order = Seq(desc(tokenCount))` this is first-fit-decreasing — strictly
    * tighter than next-fit-decreasing because earlier bins are REOPENED for
    * the short tail instead of closing forever (FFD uses ≤ 11/9·OPT + 1 bins;
    * next-fit has no constant-factor guarantee better than 2·OPT).
    *
    * Same distributed shape as [[packBinsCapped]]: one shard shuffle, then a
    * per-partition scan. The scan state is the open-bin fill vector — one
    * Long per bin opened so far in the shard, i.e. O(shard token mass /
    * budget) heap: 8 MB per million bins, bounded by the caller's `shards`
    * choice, never by the corpus. A max-residual shortcut skips the linear
    * first-fit probe whenever the document cannot fit in ANY open bin (the
    * common case once bins are tight), keeping the expected per-doc cost far
    * below O(bins); a pathological input degrades to O(bins)/doc CPU inside
    * one shard, not to more memory or shuffles.
    *
    * Output: input columns + (shard, bin). Deterministic: shard is a pure
    * hash of the id, layout order is total (id appended as tie-break). */
  def packBinsFirstFit(docs: DataFrame, idCol: String, tokenCount: Column,
                       budgetTokens: Long, shards: Int = 1024,
                       salt: String = "", order: Seq[Column] = Nil): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    scanShards(docs, idCol, tokenCount, shards, salt, order) { () =>
      // fills(i) = current token total of the shard's bin i. maxResidual is
      // an UPPER BOUND on the largest remaining capacity across open bins:
      // filling a bin only shrinks residuals (bound stays valid untightened);
      // a probe that comes up empty retightens it from the scan just paid
      // for. The bound lets the common can't-fit case append without probing.
      val fills = new scala.collection.mutable.ArrayBuffer[Long]()
      var maxResidual = 0L
      t => {
        var bin = -1
        if (t <= maxResidual) {
          var i = 0
          while (i < fills.length && fills(i) + t > budgetTokens) i += 1
          if (i < fills.length) { fills(i) += t; bin = i }
          else {
            var m = 0L; var j = 0
            while (j < fills.length) {
              if (budgetTokens - fills(j) > m) m = budgetTokens - fills(j); j += 1
            }
            maxResidual = m
          }
        }
        if (bin < 0) {
          fills += t
          bin = fills.length - 1
          maxResidual = math.max(maxResidual, budgetTokens - t)
        }
        bin.toLong
      }
    }
  }

  /** Materialize packed sequences: one row per (shard, bin) with the member
    * documents concatenated in id order. Safe to assemble distributed — a
    * bin's content is bounded by the token budget (+ one straddling doc), so
    * the collect_list is budget-bounded, never corpus-bounded. */
  def materialize(packed: DataFrame, idCol: String, textCol: String,
                  sep: String = "\n\n"): DataFrame =
    packed
      .groupBy("shard", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol).as("i"), col(textCol).as("t")))),
            s => s.getField("t")),
          sep).as("sequence"))

  /** Per-bin LOADER contract — the artifact a packed-sequence dataloader
    * consumes next to [[materialize]]'s concatenated text: for every
    * (shard, bin), the member documents' start offsets and token lengths
    * inside the ASSEMBLED sequence, sorted in layout order. `doc_starts`
    * are exactly the position-id reset points, and consecutive
    * (start, start + n_tokens) pairs are the attention-mask boundaries —
    * doc_starts(0) = 0, doc_starts(i+1) = doc_starts(i) + doc_tokens(i),
    * and the last boundary closes at `fill`, so the spans partition
    * [0, fill) for every layout (property-tested in OperatorsSpec).
    *
    * Offsets here are WITHIN-BIN prefix sums (position inside the
    * materialized sequence), not [[packManifest]]'s global-stream
    * `tokens_before mod budget`: the two coincide on [[packBins]] bins
    * that start on a budget boundary but differ after an overflowing doc,
    * and only the within-bin form describes what [[materialize]] actually
    * assembles — which is what the loader indexes into.
    *
    * Scale shape: the offset window and the collect_list are both
    * (shard, bin)-partitioned — budget-bounded, never corpus-bounded (the
    * same argument as [[materialize]]); one shuffle on the grouping key. */
  def loaderBoundaries(packed: DataFrame, idCol: String, tokenCount: Column,
                       order: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy("shard", "bin").orderBy(order :+ col(idCol): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    packed
      .withColumn("__t", tokenCount.cast("long"))
      .withColumn("__off", coalesce(sum(col("__t")).over(w), lit(0L)))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("fill"),
        array_sort(collect_list(struct(col("__off").as("o"),
          col(idCol).as("i"), col("__t").as("t")))).as("__b"))
      .select(col("shard"), col("bin"), col("n_docs"), col("fill"),
        transform(col("__b"), b => b.getField("o")).as("doc_starts"),
        transform(col("__b"), b => b.getField("t")).as("doc_tokens"))
  }

  /** Per-bin layout summary (what a sequence writer consumes): document
    * count, token fill, and fill ratio vs budget. */
  def binStats(packed: DataFrame, tokenCount: Column,
               budgetTokens: Long): DataFrame =
    packed
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("n_tokens"))
      .withColumn("fill_ratio", col("n_tokens").cast("double") / budgetTokens)
}
