package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splits.
  *
  * Training-data pipelines need REPRODUCIBLE subsets: the same document must
  * land in the same split on every run, engine, and cluster size — which
  * seeded Bernoulli sampling (`df.sample`) cannot promise across engines or
  * partitionings. Hash-bucketing the stable key delivers it: bucket =
  * md5(key ++ salt) mod 100, so membership is a pure function of the row,
  * evaluated in the scan stage with no shuffle and no state. Different
  * `salt`s give independent samples of the same corpus.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column: the first 15 md5
    * nibbles read big-endian (exact in a long), mod `buckets`. */
  def hashBucket(key: Column, buckets: Int = 100, salt: String = ""): Column =
    pmod(
      conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 15), 16, 10)
        .cast("long"),
      lit(buckets.toLong))

  /** Deterministic train/valid/test assignment by hash bucket. */
  def split(key: Column, trainPct: Int = 80, validPct: Int = 10,
            salt: String = ""): Column = {
    val b = hashBucket(key, 100, salt)
    when(b < trainPct, "train")
      .when(b < trainPct + validPct, "valid")
      .otherwise("test")
  }

  /** Keep a deterministic `pct`% of rows (0-100). */
  def sampleByHash(df: DataFrame, key: Column, pct: Int,
                   salt: String = ""): DataFrame =
    df.filter(hashBucket(key, 100, salt) < pct)

  /** Deterministic keep with a PER-ROW rate: keep the row when its hash
    * bucket falls below `ratePct` (a Column in [0,100]) — the numeric
    * generalization of [[stratifiedSampleByHash]] from a categorical rate
    * map to any score expression (e.g. `qualityScore * 100` for
    * quality-weighted downsampling, the standard curation move of keeping
    * high-quality documents at a higher rate). Still a pure scan-stage
    * filter: membership is a function of (key, salt, rate expression). */
  def sampleByRateCol(df: DataFrame, key: Column, ratePct: Column,
                      salt: String = ""): DataFrame =
    df.filter(hashBucket(key, 100, salt) < ratePct)

  /** Leakage-free train/valid/test assignment: the bucket is hashed from a
    * GROUP key (a dedup cluster label, a content hash, a source domain)
    * instead of the row id, so every member of a group lands in the same
    * split — near-duplicates of a training document can never leak into the
    * eval split, the standard post-dedup splitting discipline. Membership
    * stays a pure scan-stage function of the group column (any shuffle cost
    * belongs to the upstream join that attached the group key). */
  def splitByGroup(df: DataFrame, group: Column, trainPct: Int = 80,
                   validPct: Int = 10, salt: String = ""): DataFrame =
    df.withColumn("split", split(group, trainPct, validPct, salt))

  /** Leakage-free splits when the group structure is a near-duplicate GRAPH
    * rather than a precomputed key: label the corpus by connected component
    * of `pairs` (an (id_a, id_b) near-dup pair frame from any of the Dedup
    * candidate generators), then hash-split on the component label via
    * [[splitByGroup]]. Documents untouched by any pair are their own
    * singleton component (comp = id), so the whole corpus is assigned. The
    * guarantee composes transitively: if A~B and B~C, all three share a
    * component and therefore a split, even though A and C were never paired
    * — exactly the closure a pairwise `splitByGroup(md5(text))` cannot give.
    *
    * Scale shape: the component labeling is the star-contraction loop
    * (edge-bounded shuffles, see [[Dedup.connectedComponents]]); attaching
    * labels to the corpus is ONE left join against the (clustered docs)-
    * sized label frame — the corpus itself is never re-shuffled for the
    * split, which stays a scan-stage hash of the attached label. */
  def splitByComponents(df: DataFrame, idCol: String, pairs: DataFrame,
                        trainPct: Int = 80, validPct: Int = 10,
                        salt: String = ""): DataFrame = {
    val labels = Dedup.connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("comp").as("__cc_comp"))
    val labeled = df.join(labels, df(idCol) === col("__cc_id"), "left")
      .withColumn("comp", coalesce(col("__cc_comp"), df(idCol)))
      .drop("__cc_id", "__cc_comp")
    splitByGroup(labeled, col("comp"), trainPct, validPct, salt)
  }

  /** Deterministic corpus shuffle for training order: a total order by the
    * salted 60-bit hash of the stable key (ties — md5 collisions — broken
    * by the key itself, so the order is total and engine-independent).
    * Gradient-descent training wants documents in hash order, not crawl or
    * ingest order (adjacent same-site pages correlate batches); a salted
    * hash order is reproducible across runs AND resalts to a fresh
    * independent order per epoch.
    *
    * Scale shape: `orderBy` is Spark's range-partitioned distributed sort —
    * split points come from sampling the hash column, every partition sorts
    * locally, no single-task sort. At 100 TB this is the one operator here
    * that SHOULD be a full-corpus shuffle: that is what reordering means.
    * The hash column is dropped after the sort. */
  def shuffleByHash(df: DataFrame, key: Column, salt: String = ""): DataFrame =
    df.withColumn("__ord",
        conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 15), 16, 10)
          .cast("long"))
      .orderBy(col("__ord"), key)
      .drop("__ord")

  /** Per-group sampling rates — the deterministic analog of `sampleBy` for
    * domain-mixture curation (e.g. keep 50% of web text, 100% of books).
    * Groups absent from `rates` keep `defaultPct`. */
  def stratifiedSampleByHash(df: DataFrame, key: Column, group: Column,
                             rates: Map[String, Int], defaultPct: Int = 0,
                             salt: String = ""): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultPct)) {
      case (acc, (g, p)) => when(group === g, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(key, 100, salt) < rateCol)
  }

  /** Temperature-rebalanced per-source keep rates — the multi-source /
    * multilingual resampling rule (mBERT/XLM-R style: target share of
    * source s ∝ (n_s)^(1/T)): with alpha = 1/T, the maximal downsampling-
    * only realization of the rebalanced distribution keeps source s at
    * rate_pct = 100 * n_s^(alpha-1) / max_u(n_u^(alpha-1)) — the smallest
    * source keeps 100 % and heavier sources are cut toward the flattened
    * share. T = 1 keeps everything (proportional is a no-op), T > 1
    * flattens toward uniform, T < 1 sharpens the head (then the LARGEST
    * source keeps 100 %).
    *
    * Scale shape: one count aggregation over the corpus; the max reduces
    * the per-source frame (|sources|, tiny) via a 1-row broadcast scalar —
    * never a corpus-scaled window. Output: (source, n_docs, rate_pct). */
  def temperatureRates(df: DataFrame, sourceCol: String,
                       temperature: Double): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val a = 1.0 / temperature
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val weight = pow(col("n_docs").cast("double"), lit(a - 1.0))
    val m = counts.agg(max(weight).as("__max_w"))
    counts.crossJoin(broadcast(m))
      .withColumn("rate_pct", weight / col("__max_w") * 100.0)
      .drop("__max_w")
  }

  /** Apply [[temperatureRates]] as a deterministic hash sample: each row's
    * keep decision is a pure function of (key, salt, its source's rate), so
    * the mixture is reproducible across runs and cluster sizes. The rate
    * frame is per-source (tiny) and broadcast back onto the corpus. */
  def temperatureSample(df: DataFrame, key: Column, sourceCol: String,
                        temperature: Double, salt: String = ""): DataFrame = {
    val rates = temperatureRates(df, sourceCol, temperature)
      .select(col(sourceCol), col("rate_pct"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(hashBucket(key, 100, salt) < col("rate_pct"))
      .drop("rate_pct")
  }

  /** Epoch-capped data-mixture plan (the Llama-style training recipe step):
    * given target mixture `weights` (source, weight — any positive scale,
    * normalized internally) and a total token `budgetTokens`, compute per
    * source how many epochs (repeats, fractional) of its data the run
    * consumes — `epochs = min(maxEpochs, target_share * budget / n_tokens)`
    * — and the realized mixture after the cap binds (an over-weighted small
    * source saturates at `maxEpochs` and the realized share falls short;
    * the report makes that visible instead of silently over-repeating).
    * Output: (sourceCol, n_docs, n_tokens, target_w, epochs, tokens_planned,
    * realized_w), one row per source with data.
    *
    * Scale shape: ONE partial-agg count/sum pass over the corpus; weights
    * and both normalization totals are bounded per-source frames (broadcast
    * scalar cross joins, the [[temperatureRates]] pattern). Cross-engine
    * determinism: both totals sum 9-decimal-rounded DECIMAL(28,9) terms —
    * order-independent exact addition — and every double division has one
    * fixed parenthesization. */
  def mixturePlan(df: DataFrame, sourceCol: String, tokens: Column,
                  weights: DataFrame, budgetTokens: Long,
                  maxEpochs: Double): DataFrame = {
    require(budgetTokens > 0 && maxEpochs > 0, "budget and maxEpochs must be positive")
    val counts = df.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(greatest(coalesce(tokens.cast("long"), lit(0L)), lit(0L))).as("n_tokens"))
    val w9 = round(col("weight"), 9).cast("decimal(28,9)")
    val wTot = weights.agg(sum(w9).as("w_tot"))
    val wn = weights.crossJoin(broadcast(wTot))
      .select(col(sourceCol),
        (w9.cast("double") / col("w_tot").cast("double")).as("target_w"))
    val planned = counts.join(broadcast(wn), Seq(sourceCol))
      .withColumn("epochs", when(col("n_tokens") > 0,
        least(lit(maxEpochs),
          (col("target_w") * lit(budgetTokens.toDouble)) / col("n_tokens").cast("double")))
        .otherwise(lit(0.0)))
      .withColumn("planned9",
        round(col("epochs") * col("n_tokens").cast("double"), 9).cast("decimal(28,9)"))
    val tot = planned.agg(sum(col("planned9")).as("total_p"))
    planned.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"), col("target_w"),
        col("epochs"), col("planned9").cast("double").as("tokens_planned"),
        (col("planned9").cast("double") / col("total_p").cast("double"))
          .as("realized_w"))
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023): spread a total
    * token budget as UNIFORMLY as possible across sources while capping
    * every source at `maxEpochs` passes over its data — the
    * fairness-motivated alternative to [[mixturePlan]]'s explicit weights
    * and [[temperatureRates]]' power law (temperature sampling still
    * over-repeats tail sources; UniMax gives every source the same token
    * count until its epoch cap binds, then re-spreads the surplus among
    * the uncapped — water-filling).
    *
    * Closed form, no driver loop: in cap-ascending order (ties by source),
    * source i is capped iff `cap_i * rem_i <= budget - cumBefore_i` where
    * rem_i counts sources from i on — valid at every position, before AND
    * after the water line, because caps are sorted (the uniform share
    * never drops below an already-capped source's cap, and never reaches
    * an uncapped one's). Uncapped sources split the remaining budget
    * evenly. Caps accumulate as round-6 DECIMAL(28,6) — exact, order
    * independent — and each alloc is one IEEE division, so the output
    * hash-matches any engine mirroring the window.
    *
    * Output: (sourceCol, n_docs, n_tokens, cap_tokens, is_capped,
    * alloc_tokens, epochs, realized_w). Σ alloc = min(budget, Σ caps) — a
    * corpus too small for the budget shows the shortfall in the allocs
    * rather than silently over-repeating.
    *
    * Scale shape: ONE partial-agg pass over the corpus; everything after
    * is windows over the sources-bounded aggregate (single-partition
    * windows, deliberate — source counts are metadata-sized). */
  def unimaxPlan(df: DataFrame, sourceCol: String, tokens: Column,
                 budgetTokens: Long, maxEpochs: Double): DataFrame = {
    require(budgetTokens > 0 && maxEpochs > 0, "budget and maxEpochs must be positive")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(greatest(coalesce(tokens.cast("long"), lit(0L)), lit(0L))).as("n_tokens"))
    val capD = round(col("n_tokens").cast("double") * lit(maxEpochs), 6)
      .cast("decimal(28,6)")
    val wOrd = Window.orderBy(col("__cap"), col(sourceCol))
    val wAll = Window.partitionBy(lit(1))
    val budD = lit(budgetTokens).cast("decimal(28,6)")
    val staged = counts
      .withColumn("__cap", capD)
      .withColumn("__cum_before",
        coalesce(sum(col("__cap")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast("decimal(28,6)")))
      .withColumn("__rem", count(lit(1)).over(wAll) -
        row_number().over(wOrd) + 1)
      .withColumn("is_capped",
        col("__cap") * col("__rem") <= budD - col("__cum_before"))
    val leveled = staged
      .withColumn("__capped_sum", coalesce(
        sum(when(col("is_capped"), col("__cap"))).over(wAll),
        lit(0).cast("decimal(28,6)")))
      .withColumn("__n_uncapped",
        sum(when(col("is_capped"), lit(0L)).otherwise(lit(1L))).over(wAll))
      .withColumn("alloc_tokens",
        when(col("is_capped"), col("__cap").cast("double"))
          .otherwise((budD - col("__capped_sum")).cast("double") /
            col("__n_uncapped").cast("double")))
    leveled.select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("__cap").cast("double").as("cap_tokens"), col("is_capped"),
        col("alloc_tokens"),
        when(col("n_tokens") > 0,
            col("alloc_tokens") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("epochs"),
        (col("alloc_tokens") / lit(budgetTokens.toDouble)).as("realized_w"))
  }

  /** Deterministic per-key uniform sample WITHOUT replacement: keep the
    * `k` rows with the SMALLEST salted 60-bit hashes within each group —
    * the bottom-k sketch, which is exactly a uniform k-subset when the
    * hash is uniform, and REPRODUCIBLE (same rows on every run, engine,
    * and partitioning) where `df.sample`/reservoir methods are not. The
    * per-key twin of [[sampleByHash]]: rate-based sampling cannot promise
    * "exactly 1000 docs per domain"; bottom-k can. Resalting draws an
    * independent sample; k >= group size returns the whole group. Output:
    * the input rows plus `sample_rank` (1-based position in the group's
    * hash order — a stable sub-sample handle: rank <= j IS the bottom-j
    * sample of the same salt).
    *
    * Scale shape: the same two-phase trick as `capPerKey` — phase 1 ranks
    * within (key, hash-shard) so no partition exceeds shard size, phase 2
    * ranks the <= k x shards survivors per key. Correct because bottom-k
    * is subset-monotone: a row in the global bottom-k is in its shard's
    * bottom-k, so phase 1 can only over-keep. The heavy-key hazard of a
    * single per-key window (one task owning a whole domain's corpus
    * slice) never materializes. `idCol` must be unique per row (it salts
    * the hash and breaks md5-collision ties, making the order total). */
  def bottomKPerKey(df: DataFrame, key: Column, idCol: Column, k: Int,
                    salt: String = "", shards: Int = 64): DataFrame = {
    require(k > 0 && shards > 0, "k and shards must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 15),
      16, 10).cast("long")
    val shard = hashBucket(idCol.cast("string"), shards, salt + ":shard")
    val w1 = Window.partitionBy(key, col("__shard")).orderBy(col("__h"), idCol)
    val w2 = Window.partitionBy(key).orderBy(col("__h"), idCol)
    df.withColumn("__h", h).withColumn("__shard", shard)
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .withColumn("sample_rank", row_number().over(w2))
      .filter(col("sample_rank") <= k)
      .drop("__h", "__shard", "__r1")
  }

  /** Deterministic per-key WEIGHTED sample without replacement
    * (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    * reservoir"): each row draws the exponential key `-ln(u) / w` from its
    * salted hash uniform `u = (h + 1) / 2^60` and every group keeps its `k`
    * SMALLEST keys — exactly a weighted k-subset without replacement
    * (inclusion intuition: E[-ln(u)/w] = 1/w, so a doubled weight halves the
    * expected key), and REPRODUCIBLE like [[bottomKPerKey]] (same rows on
    * every run, engine, and partitioning; resalting draws an independent
    * sample). The quality-weighted twin of bottom-k: "keep 1000 docs per
    * domain, preferring high quality" is this with w = quality.
    *
    * The key is rounded to 9 decimals before ranking (the repo's
    * cross-engine ln contract — see LanguageModel) with (hash, id) as the
    * total tie-break. Rows whose weight is null or <= 0 get key +Infinity:
    * they rank after every positively-weighted row and are only kept when a
    * group has fewer than `k` such rows (the "k >= group size returns the
    * whole group" contract, preserved).
    *
    * Scale shape: identical to [[bottomKPerKey]] — bottom-k by ANY total
    * order is subset-monotone, so phase 1 ranks within (key, hash-shard)
    * (no partition exceeds shard size; a heavy domain never lands on one
    * task) and phase 2 ranks the <= k x shards survivors per key. Output:
    * the input rows plus `sample_rank` (1-based in the group's key order —
    * rank <= j IS the weighted bottom-j sample of the same salt). */
  def weightedBottomKPerKey(df: DataFrame, key: Column, idCol: Column,
                            weight: Column, k: Int, salt: String = "",
                            shards: Int = 64): DataFrame = {
    require(k > 0 && shards > 0, "k and shards must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 15),
      16, 10).cast("long")
    val u = (col("__h").cast("double") + lit(1.0)) / lit(1152921504606846976.0) // 2^60
    val w = weight.cast("double")
    val esKey = when(w.isNotNull && w > 0.0, round(-log(u) / w, 9))
      .otherwise(lit(Double.PositiveInfinity))
    val shard = hashBucket(idCol.cast("string"), shards, salt + ":shard")
    val w1 = Window.partitionBy(key, col("__shard"))
      .orderBy(col("__esk"), col("__h"), idCol)
    val w2 = Window.partitionBy(key).orderBy(col("__esk"), col("__h"), idCol)
    df.withColumn("__h", h).withColumn("__esk", esKey)
      .withColumn("__shard", shard)
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .withColumn("sample_rank", row_number().over(w2))
      .filter(col("sample_rank") <= k)
      .drop("__h", "__esk", "__shard", "__r1")
  }

  /** Curriculum ordering with interleave: bucket the corpus into `nBuckets`
    * difficulty bands by exact score percentiles, then emit a global
    * round-robin order across bands (1st-easiest, 1st-medium, …, 2nd-easiest,
    * …) — the curriculum/anti-curriculum data-ordering step, where strict
    * easy→hard sorting destroys batch diversity and pure shuffle destroys
    * the curriculum; interleaving bands keeps both. WITHIN a band the order
    * is a deterministic hash shuffle (diversity inside each difficulty
    * band), keyed like [[shuffleByHash]].
    *
    * Output: input columns plus (bucket, pos) where `pos` is the 0-based
    * rank within the bucket by (hash(id ++ salt), id); the curriculum order
    * is ORDER BY (pos, bucket).
    *
    * Scale shape: thresholds are `nBuckets-1` exact percentiles — one
    * aggregate, broadcast back, bucket assignment in the scan stage. The
    * global within-bucket rank is EXACT yet never windows a corpus-scale
    * partition: the shard is the hash's TOP bits (`h >> (60-log2 shards)`),
    * so shard ranges are contiguous in h and ordering by (shard, h, id)
    * IS ordering by (h, id) — rank within (bucket, shard) plus the
    * BROADCAST per-(bucket, shard) count offsets reproduces the global
    * rank bit-for-bit (the two-phase sharded-rank shape; a modulo shard
    * would interleave hash ranges and break the equivalence). */
  def curriculumInterleave(df: DataFrame, idCol: Column, score: Column,
                           nBuckets: Int, shards: Int = 8,
                           salt: String = ""): DataFrame = {
    require(nBuckets > 1, "nBuckets must be > 1")
    require(shards > 0 && (shards & (shards - 1)) == 0 && shards <= (1 << 20),
      "shards must be a power of two (shard = top bits of the 60-bit hash)")
    import org.apache.spark.sql.expressions.Window
    val ths = df.agg(percentile(score, lit(1.0 / nBuckets)).as("__t1"),
      (2 until nBuckets).map(i =>
        percentile(score, lit(i.toDouble / nBuckets)).as(s"__t$i")): _*)
    val bucket = (1 until nBuckets)
      .map(i => when(score > col(s"__t$i"), 1).otherwise(0))
      .reduce(_ + _)
    val shardShift = 60 - (31 - Integer.numberOfLeadingZeros(shards))
    val scored = df.crossJoin(broadcast(ths))
      .withColumn("bucket", bucket)
      .drop((1 until nBuckets).map(i => s"__t$i"): _*)
      .withColumn("__h", Dedup.tokenFp60(concat(idCol.cast("string"), lit(salt))))
      .withColumn("__shard", shiftright(col("__h"), shardShift))
    val wS = Window.partitionBy(col("bucket"), col("__shard"))
      .orderBy(col("__h"), idCol)
    val ranked = scored.withColumn("__r", row_number().over(wS) - 1)
    val wOff = Window.partitionBy(col("bucket")).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranked.groupBy("bucket", "__shard")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .drop("__n")
    ranked.join(broadcast(offsets), Seq("bucket", "__shard"))
      .withColumn("pos", col("__off") + col("__r"))
      .drop("__h", "__shard", "__r", "__off")
  }

  /** Materialize a [[mixturePlan]] into data — the step that turns the
    * (source, epochs) report into the actual training corpus. Each source's
    * rows are replicated `floor(epochs)` times (the full passes), and the
    * fractional remainder becomes ONE more deterministic hash-sampled pass:
    * a row joins the partial epoch iff its 10000-bucket hash (key + salt)
    * falls below `frac * 10000` — so the partial pass is a reproducible
    * subset, not a seeded random one, and resalting gives an independent
    * subset. Output: the input columns plus `epoch` (0-based pass index;
    * epochs `0 .. floor-1` are complete, epoch `floor` is the partial one).
    *
    * Scale shape: the plan is per-source (tiny — always broadcast); the
    * replication is a scan-stage `explode(sequence(...))` whose output size
    * is exactly the planned token budget — there is no shuffle here at all,
    * and downstream packing/shuffling sees epoch-tagged rows it can treat
    * like any others. Epoch counts are bounded by the plan's `maxEpochs`,
    * so the explode fan-out is a small constant, never data-dependent
    * skew. Determinism: `epochs` arrives from the plan as the same double
    * both engines computed; the fractional threshold `(epochs -
    * floor(epochs)) * 10000.0` has one parenthesization. */
  def realizeMixture(df: DataFrame, sourceCol: String, key: Column,
                     plan: DataFrame, salt: String = ""): DataFrame = {
    val p = plan.select(col(sourceCol), col("epochs"))
    val full = floor(col("epochs")).cast("long")
    val fracBp = (col("epochs") - floor(col("epochs"))) * lit(10000.0)
    val copies = full +
      when(hashBucket(key, 10000, salt).cast("double") < fracBp, 1L).otherwise(0L)
    df.join(broadcast(p), Seq(sourceCol))
      .withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies", "epochs")
  }
}
