package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, exact and near.
  *
  * Design for 100 TB: every method is "signature → shuffle on signature →
  * verify within bucket". No method ever compares all N² pairs; candidate
  * generation is a hash-partitioned groupBy/join on a short key, and
  * verification runs only inside buckets. Signatures are built from
  * codegen'd built-ins (xxhash64 + higher-order array functions), no UDFs.
  *
  * Caller contract: the near-dup operators `persist()` their signature
  * relation (it is consumed by both the candidate and the verify stage).
  * The cache lives until the session drops it — long-lived sessions
  * issuing many dedup calls should `spark.catalog.clearCache()` (or
  * unpersist) between calls, as graft.Verify/Bench do.
  */
object Dedup {

  /** Default chunk-bucket cap for the 64-bit Hamming family (SimHash /
    * perceptual hash): large enough that drops only ever fire on
    * degenerate corpora (templated content whose correlated bits make one
    * chunk value collide corpus-wide — at this cap a single retained
    * bucket already streams ~5e9 bit_count comparisons), finite so the
    * in-bucket self-join can never go quadratic unobserved. Dropped
    * buckets are accumulator-counted (`Diagnostics.lastDrops
    * ("hamming_chunk")`) and WARN-logged; pass `Int.MaxValue` to restore
    * the strict exact-recall contract. */
  val DefaultHammingBucketCap: Int = 100000

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the row with the smallest `idCol` per distinct
    * `textCol` content (hashed). One shuffle on the 256-bit content hash —
    * the grouping key is 32 bytes regardless of document size, so the
    * shuffle moves ids + hashes, not documents. */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    Keyed.firstPerKey(
      docs.withColumn("__content_hash", sha2(col(textCol), 256)),
      Seq("__content_hash"), idCol)
      .drop("__content_hash")

  /** Exact-dup groups report: content hash → count + representative id. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  // -------------------------------------------------------------- shingles

  /** Word n-gram shingles as a distinct array. */
  def wordShingles(text: Column, n: Int): Column = {
    // set semantics over TextAnalysis.ngramList — ONE shingling core for
    // the dedup and text-quality stacks (short docs fall back to a single
    // whole-doc shingle; ngramList returns none below n tokens)
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(TextAnalysis.ngramList(text, n)))
  }

  // ------------------------------------------------------- candidate pairs

  /** Ordered candidate id pairs within blocking groups, in ONE shuffle:
    * group by the blocking key(s), expand ordered pairs in-array. Compared
    * with the window-guard + self-join formulation this saves a window
    * sort and two join shuffles; `maxGroupSize` is the skew guard (drops
    * degenerate groups — empty/boilerplate content).
    * Returns distinct (id_a < id_b) pairs. */
  /** Profiling alias for [[pairsWithinGroups]] (dev tool access). */
  private[graft] def pairsWithinGroupsForProf(df: DataFrame, groupCols: Seq[String],
                                              idCol: String, maxGroupSize: Int): DataFrame =
    pairsWithinGroups(df, groupCols, idCol, maxGroupSize)

  private[ops] def pairsWithinGroups(df: DataFrame, groupCols: Seq[String],
                                     idCol: String,
                                     maxGroupSize: Int): DataFrame = {
    // groups over maxGroupSize are dropped (bounds the O(n²) in-group
    // expansion) — the cap filter is an accumulator-backed probe, so the
    // recall loss is counted and WARN-logged, never silent
    val grouped = Diagnostics.sizeCapFilter(
      df.groupBy(groupCols.map(col): _*)
        .agg(collect_list(col(idCol)).as("ids")),
      size(col("ids")).cast("long"), 2, maxGroupSize,
      groupCols.mkString("_"))
    val sorted = array_sort(col("ids"))
    grouped
      .select(explode(flatten(transform(sorted, (x, i) =>
        transform(slice(sorted, i + lit(2), size(sorted)),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  // --------------------------------------------------------------- MinHash

  /** k-permutation MinHash signature from a column of shingle-hash longs.
    * Each shingle is string-hashed ONCE (xxhash64); the k permutations are
    * derived by re-hashing that long with the permutation index — O(|sh|)
    * string hashes + O(k·|sh|) long hashes per doc, instead of the naive
    * O(k·|sh|) string hashes over k rebuilt shingle arrays. */
  def minhashSignatureFromHashes(shingleHashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleHashes, h => xxhash64(h, i))))

  /** Convenience one-shot signature (prefer the staged form in
    * [[minhashNearDupPairs]] which materializes shingles once). */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    minhashSignatureFromHashes(
      transform(wordShingles(text, shingleSize), s => xxhash64(s)), numHashes)

  /** MinHash + LSH banding near-dup candidate pairs.
    *
    * signature (map-only) → explode into `bands` rows of (band_idx,
    * band_hash) → shuffle-group on the band key → pairs within buckets →
    * exact Jaccard verify on the shingle sets of candidate pairs only.
    *
    * With b bands of r rows, P(candidate) = 1-(1-j^r)^b — standard LSH
    * S-curve; defaults (16 bands × 8) target j ≈ 0.8.
    *
    * Scale: the only shuffles are (a) the band-key groupBy, whose skew is
    * bounded by `maxBucketSize` (drops degenerate buckets — e.g. empty
    * docs — the same guard industrial dedup pipelines use), and (b) the
    * id→shingles re-join for verification, which touches candidate rows
    * only.
    */
  def minhashNearDupPairs(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id",
                          numHashes: Int = 128, bands: Int = 16,
                          shingleSize: Int = 3, jaccardThreshold: Double = 0.8,
                          maxBucketSize: Int = 1000): DataFrame = {
    // Stage 1 (map-only, computed once and persisted — at cluster scale
    // checkpoint via writeMinhashSignatureTable instead): doc →
    // hashed shingle set + minhash signature. Shingle STRINGS are never
    // materialized: graft_shingle_hashes combines per-token hashes in one
    // loop, and Jaccard verification is identical on the hash sets (64-bit
    // collisions are negligible), at a fraction of the string-building and
    // shuffle cost.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sigd = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
        call_function("graft_shingle_hashes",
          TextAnalysis.tokens(col(textCol)), lit(shingleSize)).as("shingles"))
      .withColumn("sig",
        call_function("graft_minhash_hashes", col("shingles"), lit(numHashes)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairsFromSignatures(sigd, numHashes, bands, jaccardThreshold, maxBucketSize)
  }

  /** Stages 2–4 of the MinHash pipeline over a (doc_id, shingles, sig)
    * relation — shared by the in-memory path and the checkpointed-table
    * path ([[writeMinhashSignatureTable]]). */
  private[ops] def pairsFromSignatures(sigd: DataFrame, numHashes: Int, bands: Int,
                                  jaccardThreshold: Double,
                                  maxBucketSize: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // Stage 2: id-only banded relation — the shuffle key set never
    // carries shingle payloads.
    val banded = sigd.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * lit(r) + 1, lit(r)))))
        .as(Seq("band_idx", "band_hash")))

    // Stage 3: candidate id pairs within band buckets — one shuffle, with
    // the bucket-size cap as the skew guard (degenerate buckets — empty /
    // boilerplate docs — are dropped, the same guard industrial dedup
    // pipelines use).
    val candidates = pairsWithinGroups(banded,
        Seq("band_idx", "band_hash"), "doc_id", maxBucketSize)
      .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"))

    // Stage 4: exact Jaccard verification — fetch shingle-hash sets for
    // candidate rows only.
    candidates
      .join(sigd.select(col("doc_id").as("doc_id_a"),
        col("shingles").as("shingles_a")), Seq("doc_id_a"))
      .join(sigd.select(col("doc_id").as("doc_id_b"),
        col("shingles").as("shingles_b")), Seq("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        (size(array_intersect(col("shingles_a"), col("shingles_b"))).cast("double") /
          size(array_union(col("shingles_a"), col("shingles_b"))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** Checkpoint the signature relation to parquet — the cluster-scale
    * shape the near-dup docstring promises: signatures are computed ONCE
    * per corpus version (the expensive stage), and candidate generation /
    * verification reruns (tuning bands, thresholds) read the table
    * instead of re-hashing 100 TB of text. numHashes/shingleSize land in
    * a sidecar so later probes can't run with mismatched parameters. */
  def writeMinhashSignatureTable(docs: DataFrame, path: String,
                                 textCol: String = "text",
                                 idCol: String = "doc_id",
                                 numHashes: Int = 128,
                                 shingleSize: Int = 3): Unit = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
        call_function("graft_shingle_hashes",
          TextAnalysis.tokens(col(textCol)), lit(shingleSize)).as("shingles"))
      .withColumn("sig",
        call_function("graft_minhash_hashes", col("shingles"), lit(numHashes)))
      .write.mode("overwrite").parquet(path)
    Sidecar.write(docs.sparkSession, path, "_minhashspec.csv",
      s"$numHashes,$shingleSize")
  }

  /** Near-dup pairs from a checkpointed signature table: stages 2–4 only
    * — no text is re-read, no signatures recomputed. `bands` stays a
    * query-time knob (the S-curve operating point), numHashes comes from
    * the table's sidecar. */
  def minhashNearDupPairsFromTable(spark: org.apache.spark.sql.SparkSession,
                                   path: String, bands: Int = 16,
                                   jaccardThreshold: Double = 0.8,
                                   maxBucketSize: Int = 1000): DataFrame = {
    val numHashes =
      Sidecar.read(spark, path, "_minhashspec.csv").split(",")(0).toInt
    pairsFromSignatures(spark.read.parquet(path), numHashes, bands,
      jaccardThreshold, maxBucketSize)
  }

  /** Dedup a corpus with MinHash-LSH: connected near-dup pairs collapse to
    * the smallest id (single-link, one union step — sufficient when dup
    * clusters are star-shaped; [[minhashDedupTransitive]] does the full
    * closure). */
  def minhashDedup(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id",
                   jaccardThreshold: Double = 0.8): DataFrame = {
    val pairs = minhashNearDupPairs(docs, textCol, idCol,
      jaccardThreshold = jaccardThreshold)
    val losers = pairs.groupBy(col("doc_id_b").as(idCol))
      .agg(min("doc_id_a").as("__kept"))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Transitive-closure dedup: near-dup pairs → connected components →
    * keep only each cluster's smallest id. Correct for CHAIN-shaped
    * clusters too (A~B~C where A and C are not direct near-dups — the
    * shape templated/versioned corpora produce), where pairwise collapse
    * has no cluster notion. */
  def minhashDedupTransitive(docs: DataFrame, textCol: String = "text",
                             idCol: String = "doc_id",
                             jaccardThreshold: Double = 0.8): DataFrame = {
    val pairs = minhashNearDupPairs(docs, textCol, idCol,
      jaccardThreshold = jaccardThreshold)
    val comps = Components.connectedComponents(pairs, "doc_id_a", "doc_id_b")
    val losers = comps.filter(col("comp") =!= col("id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash signature over tokens: per-bit weighted vote of token
    * hashes, folded with higher-order aggregates (stays in codegen). */
  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val votes = aggregate(toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          j => when(call_function("shiftright", xxhash64(t), j).bitwiseAND(lit(1L)) === 1L, 1)
            .otherwise(-1)),
        (a, v) => a + v))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: block on `maxHammingDistance + 1` disjoint
    * bit-chunks of the 64-bit signature — by pigeonhole, two signatures
    * differing in ≤ d bits must agree on at least one of d+1 chunks, so
    * recall within the Hamming budget is exact for any d ≤ 31 (chunks
    * stay ≥ 2 bits). Verify with bit_count(xor). Same shuffle shape as
    * MinHash banding. */
  def simhashNearDupPairs(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id",
                          maxHammingDistance: Int = 3,
                          maxBucketSize: Int = DefaultHammingBucketCap): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sigd = Partitioning.spread(docs).select(col(idCol).as("doc_id"),
      call_function("graft_simhash", TextAnalysis.tokens(col(textCol))).as("sig"))
    hammingPairs(sigd, "doc_id", "sig", maxHammingDistance, maxBucketSize)
  }

  /** Pairs of ids whose 64-bit signatures lie within `maxHammingDistance`
    * — the pigeonhole-banded core shared by every 64-bit locality hash
    * (text SimHash above, image perceptual hash in
    * [[graft.multimodal.Multimodal.nearDupMediaPairs]]): split the
    * signature into d+1 chunks, any pair within distance d must agree on
    * at least one chunk (exact recall within budget), so candidates come
    * from chunk-value buckets, never an all-pairs join. Output columns:
    * `<idCol>_a`, `<idCol>_b`, `hamming`. */
  def hammingPairs(sigs: DataFrame, idCol: String = "doc_id",
                   sigCol: String = "sig", maxHammingDistance: Int = 3,
                   maxBucketSize: Int = DefaultHammingBucketCap): DataFrame = {
    require(maxHammingDistance >= 0 && maxHammingDistance <= 31,
      "maxHammingDistance must be in [0, 31]")
    val numChunks = maxHammingDistance + 1
    // chunk i covers [offsets(i), offsets(i) + widths(i)); widths differ
    // by at most 1 so the 64 bits are spread evenly
    val widths = Array.tabulate(numChunks)(i =>
      64 / numChunks + (if (i < 64 % numChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    // persist the (id, sig) relation — tiny (16 bytes/row), consumed by
    // the bucket-count guard and BOTH sides of the self-join, so without
    // it the caller's signature lineage (tokenize+simhash, or a media
    // DECODE pass) re-runs up to three times (same contract as the
    // MinHash path: callers clearCache between calls)
    val sigd = sigs.select(col(idCol).as("__id"), col(sigCol).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunkExprs = (0 until numChunks).map { i =>
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
      shiftright(col("sig"), offsets(i)).bitwiseAND(lit(mask))
    }
    val blocked = sigd.select(col("__id"), col("sig"),
      posexplode(array(chunkExprs: _*)).as(Seq("q_idx", "q_val")))
    // Skew guard: drop oversized buckets — correlated bits in templated
    // corpora make one chunk value collide corpus-wide and the in-bucket
    // self-join goes quadratic. The cap is finite BY DEFAULT and every
    // dropped bucket is accumulator-counted + WARN-logged
    // (Diagnostics.lastDrops("hamming_chunk")), so the recall loss is
    // observable, never silent; pass Int.MaxValue to restore the strict
    // exact-recall-within-budget contract on trusted corpora.
    val guarded =
      if (maxBucketSize == Int.MaxValue) blocked
      else blocked.join(
        broadcast(Diagnostics.oversizeFilter(
          blocked.groupBy("q_idx", "q_val").count(),
          col("count"), maxBucketSize, "hamming_chunk")
          .select("q_idx", "q_val")),
        Seq("q_idx", "q_val"), "left_anti")
    // Self-join carrying only (id, 8-byte sig); the Hamming test runs
    // BEFORE pair-dedup so the dropDuplicates shuffle sees true pairs
    // only, not the full candidate blowup. In-bucket pair streaming via
    // join beats in-array expansion here: a 1700-doc bucket is 1.4M pairs
    // — streamed through a codegen'd bit_count filter vs materialized as
    // one giant array row.
    val a = guarded.select(col("q_idx"), col("q_val"),
      col("__id").as(s"${idCol}_a"), col("sig").as("sig_a"))
    val b = guarded.select(col("q_idx"), col("q_val"),
      col("__id").as(s"${idCol}_b"), col("sig").as("sig_b"))
    a.join(b, Seq("q_idx", "q_val"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHammingDistance)
      .dropDuplicates(s"${idCol}_a", s"${idCol}_b")
  }

  // ----------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard similarity for pairs sharing a cheap blocking
    * key (fingerprint of the rarest shingle): a portable, oracle-checkable
    * near-dup path (no engine-specific hash in the result). */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", n: Int = 3,
                        threshold: Double = 0.5,
                        maxGroupSize: Int = 1000): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val withSh = Partitioning.spread(docs).select(col(idCol).as("doc_id"),
      call_function("graft_word_shingles",
        TextAnalysis.tokens(col(textCol)), lit(n)).as("shingles"))
      .withColumn("block", array_min(col("shingles")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Candidates from id-only block groups (one shuffle of (block, id));
    // shingle arrays are fetched back for candidate rows only, instead of
    // shuffling them on both sides of a self-join. `maxGroupSize` is the
    // skew guard: a degenerate blocking key (a min-shingle shared corpus-
    // wide) would otherwise materialize O(n²) pairs in one array row.
    Dedup.pairsWithinGroups(withSh.select("block", "doc_id"), Seq("block"),
        "doc_id", maxGroupSize)
      .join(withSh.select(col("doc_id").as("id_a"),
        col("shingles").as("shingles_a")), Seq("id_a"))
      .join(withSh.select(col("doc_id").as("id_b"),
        col("shingles").as("shingles_b")), Seq("id_b"))
      .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"),
        (size(array_intersect(col("shingles_a"), col("shingles_b"))).cast("double") /
          size(array_union(col("shingles_a"), col("shingles_b"))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Fuzzy dedup by EDIT DISTANCE — the near-dup flavor for short texts
    * (titles, URLs, product names) where token-set similarity is too
    * coarse: candidate pairs from the same min-shingle blocking as
    * [[ngramJaccardPairs]] (id-only block shuffle, `maxGroupSize` skew
    * guard, texts fetched back for candidate rows only), verified with
    * Spark's BANDED `levenshtein(l, r, threshold)` — the built-in
    * early-aborts once the running minimum exceeds the band, so a
    * candidate pair costs O(k·min(|a|,|b|)) instead of O(|a|·|b|)
    * (compose built-ins before writing a custom Expression). Emits
    * (doc_id_a, doc_id_b, edit_distance ≤ maxDistance). Recall is
    * block-scoped, like every blocked near-dup operator here: pairs
    * sharing no block are not compared — the DuckDB oracle mirrors the
    * blocking so the contract is two-sided. */
  def editDistancePairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", maxDistance: Int = 3,
                        n: Int = 3,
                        maxGroupSize: Int = 1000): DataFrame = {
    require(maxDistance >= 0, "maxDistance must be >= 0")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val withSh = Partitioning.spread(docs).select(col(idCol).as("doc_id"),
      col(textCol).as("__text"),
      call_function("graft_word_shingles",
        TextAnalysis.tokens(col(textCol)), lit(n)).as("shingles"))
      .withColumn("block", array_min(col("shingles")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.pairsWithinGroups(withSh.select("block", "doc_id"), Seq("block"),
        "doc_id", maxGroupSize)
      .join(withSh.select(col("doc_id").as("id_a"),
        col("__text").as("__text_a")), Seq("id_a"))
      .join(withSh.select(col("doc_id").as("id_b"),
        col("__text").as("__text_b")), Seq("id_b"))
      // threshold = max+1 tolerates either boundary convention of the
      // banded built-in; the explicit range filter states the contract
      .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"),
        levenshtein(col("__text_a"), col("__text_b"), maxDistance + 1)
          .as("edit_distance"))
      .filter(col("edit_distance").between(0, maxDistance))
  }

  // ------------------------------------------------- paragraph-level dedup

  /** C4/RefinedWeb-style exact PARAGRAPH dedup: split every document on
    * `sep`, keep only the globally FIRST occurrence of each distinct
    * paragraph (ordered by (doc id, position) — deterministic), and
    * reassemble documents from their surviving paragraphs in original
    * order. Documents that lose every paragraph drop out entirely — the
    * boilerplate-heavy page whose content all appeared earlier.
    *
    * Scale shape: one shuffle keyed on the paragraph text for the
    * winner-per-paragraph window (planned as WindowGroupLimit — rank 1
    * only, no full sort materialization), one shuffle back on the doc id
    * to reassemble. Paragraph text crosses the wire once per occurrence,
    * the same movement an exact-dedup groupBy performs; no all-pairs
    * anything. This is the boilerplate-removal pass LLM curation runs
    * between document-level exact dedup ([[exactDedup]]) and near-dedup
    * (MinHash/SimHash) — duplicated boilerplate hides INSIDE otherwise
    * unique pages, invisible at document granularity. */
  def paragraphDedup(docs: DataFrame, sep: String = "\n\n",
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paras = docs.select(col(idCol),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("pos", "para")))
    val w = Window.partitionBy("para").orderBy(col(idCol), col("pos"))
    paras.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(idCol)
      .agg(concat_ws(sep, transform(
        array_sort(collect_list(struct(col("pos"), col("para")))),
        x => x.getField("para"))).as(textCol))
  }

  // ------------------------------------------------- exact substring spans

  /** Exact-substring duplicate-SPAN detection — the ExactSubstr dedup of
    * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better"), re-expressed Spark-first: where their suffix array needs
    * the whole corpus materialized and sorted on one machine (or a
    * bespoke distributed sort), winnowed fingerprints
    * ([[graft.functions.HashKernels.winnow]], Schleimer et al. 2003)
    * reduce the problem to the family's standard
    * signature → bucket shuffle → in-bucket verify shape.
    *
    * Returns cross-document duplicated spans of ≥ `minLen` codepoints:
    * `(doc_a, doc_b, start_a, start_b, span_len)`, 0-based codepoint
    * starts, `doc_a < doc_b`. Every reported span is EXACT (verified by
    * substring equality end-to-end, including every chain gap — hash
    * collisions cannot reach the output); recall is anchor-precise:
    * a true duplicated span of length L ≥ minLen is reported with
    * span_len ≥ L - 2·(w-1) where w = minLen - k + 1 (winnowing
    * guarantees a shared fingerprint every w grams inside the span, but
    * the first/last anchors may sit up to w-1 grams inside the ends).
    * Callers wanting full-span reporting at the boundaries re-extend in
    * a local pass over the reported pairs.
    *
    * Scale shape: fingerprints are O(chars/w) per doc (exploded id+pos
    * only — text never rides the fingerprint shuffle); candidate pairs
    * come from one groupBy on the 32-bit hash with the family's
    * accumulator-counted bucket cap (a corpus-wide boilerplate string
    * caps out instead of going quadratic); texts are re-joined ONLY for
    * candidate rows; chaining is one window per (pair, alignment). */
  def duplicateSpans(docs: DataFrame, minLen: Int, k: Int = 16,
                     textCol: String = "text", idCol: String = "doc_id",
                     maxBucketSize: Int = 1000): DataFrame = {
    require(k >= 2 && minLen > k,
      s"need minLen > k >= 2 (got minLen=$minLen k=$k)")
    val w = minLen - k + 1
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // stage 1 (map-only): winnowed fingerprints, id + position only
    val fps = base.select(col("doc_id"),
        explode(call_function("graft_winnow", col("text"),
          lit(k), lit(w))).as("packed"))
      .select(col("doc_id"), shiftright(col("packed"), 32).as("h"),
        (col("packed").bitwiseAND(lit(0xFFFFFFFFL))).cast("int").as("pos"))
    // stage 2: candidate (id, pos) pairs within hash buckets — one
    // shuffle on the 32-bit fingerprint, capped like the whole family
    val grouped = Diagnostics.sizeCapFilter(
      fps.groupBy("h")
        .agg(collect_list(struct(col("doc_id"), col("pos"))).as("rows")),
      size(col("rows")).cast("long"), 2, maxBucketSize, "winnow")
    val pairs = grouped
      .select(explode(flatten(transform(col("rows"), (x, i) =>
        transform(slice(col("rows"), i + lit(2), size(col("rows"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a.doc_id").as("ida"), col("p.a.pos").as("posa"),
        col("p.b.doc_id").as("idb"), col("p.b.pos").as("posb"))
      .filter(col("ida") =!= col("idb"))
      .select(
        when(col("ida") < col("idb"), col("ida")).otherwise(col("idb")).as("doc_a"),
        when(col("ida") < col("idb"), col("posa")).otherwise(col("posb")).as("pos_a"),
        when(col("ida") < col("idb"), col("idb")).otherwise(col("ida")).as("doc_b"),
        when(col("ida") < col("idb"), col("posb")).otherwise(col("posa")).as("pos_b"))
      .dropDuplicates("doc_a", "doc_b", "pos_a", "pos_b")
    // stage 3: collapse candidates to ONE row per (pair, alignment)
    // carrying only the anchor position list — tiny rows — and join
    // each text ONCE per such row (texts never ride the per-anchor
    // shuffle; a span of length L has ~2L/w anchors, so shipping the
    // documents per anchor would multiply text bytes by that factor)
    val perAlignment = pairs
      .withColumn("d", col("pos_a") - col("pos_b"))
      .groupBy("doc_a", "doc_b", "d")
      .agg(collect_list(col("pos_a")).as("anchors"))
      .join(base.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
    // stage 4: one codegen'd loop per row verifies every anchor k-gram
    // codepoint-for-codepoint (32-bit collisions die here), chains
    // consecutive anchors within w grams iff the WHOLE gap content
    // matches, and drops chains under minLen — reported spans are exact
    // end-to-end by construction
    perAlignment
      .select(col("doc_a"), col("doc_b"), col("d"),
        explode(call_function("graft_chain_spans",
          struct(col("ta"), col("tb"), col("d").cast("int"),
            col("anchors")),
          lit(k), lit(w), lit(minLen))).as("packed"))
      .select(col("doc_a"), col("doc_b"),
        shiftright(col("packed"), 32).cast("int").as("start_a"),
        (shiftright(col("packed"), 32).cast("int") - col("d")).as("start_b"),
        (col("packed").bitwiseAND(lit(0xFFFFFFFFL))).cast("int").as("span_len"))
  }

  /** The removal half of exact-substring span dedup (Lee et al. 2021
    * cut duplicated spans from all but the first occurrence): excise
    * every [[duplicateSpans]] span from its doc_b side — doc_a < doc_b,
    * so the LOWEST-id occurrence of any duplicated span survives
    * verbatim and every later document loses it. Overlapping cuts from
    * multiple pairs merge inside the codegen'd `graft_excise` kernel
    * (codepoint coordinates, matching duplicateSpans positions).
    *
    * Scale: one groupBy of the span list per cut document (spans are
    * tiny — ids + offsets), one left join against the corpus, map-only
    * excision. Documents with no spans pass through untouched. */
  def cutSpans(docs: DataFrame, spans: DataFrame,
               textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val perDoc = spans
      .select(col("doc_b").as(idCol),
        struct(col("start_b").cast("int").as("start"),
          col("span_len").cast("int").as("len")).as("cut"))
      .groupBy(idCol)
      .agg(collect_list(col("cut")).as("__cuts"))
    docs.join(perDoc, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__cuts").isNull, col(textCol))
          .otherwise(call_function("graft_excise", col(textCol),
            col("__cuts"))))
      .drop("__cuts")
  }
}
