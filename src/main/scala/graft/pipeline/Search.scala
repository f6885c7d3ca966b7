package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Inverted-index corpus search: the audit tool every big-corpus pipeline
 * grows ("which documents contain these terms?") without a full-text scan
 * per question. The index is DISTINCT (token, id) POSTING ROWS — never
 * per-token arrays: a `collect_list` posting for a stopword would put one
 * token's billions of ids into a single row/task, the classic inverted-
 * index skew trap. Rows partition and compress like any table, and a
 * conjunctive query is hash-joins on the token key.
 *
 * Lifecycle follows the persisted-index convention (MinHash q103, IVF
 * q104, chunk ledger q125): build once from the corpus, write as parquet
 * (bucket by `token` via the q99 machinery when queries are frequent),
 * answer every later question from the stored rows with no corpus rescan.
 */
object Search {

  /** Distinct (token, id) posting rows. One explode + one distinct whose
   *  partial aggregation collapses repeats map-side. Like Dedup's id-keyed
   *  operators, refuses non-integral ids up front: the long cast would turn
   *  a UUID-string id into null and silently collapse every posting onto
   *  id=null. */
  def buildInvertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Dedup.requireIntegralId(df, idCol, "buildInvertedIndex")
    df.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("token"))
      .distinct()
  }

  /** Per-token document frequencies of a posting table — the statistics
   *  side of the index (stopword caps, rarest-first query planning). */
  def documentFrequencies(index: DataFrame): DataFrame =
    index.groupBy("token").agg(count(lit(1)).as("df_count"))

  /**
   * Incremental index update — the daily-ingest shape of the persisted
   * inverted index (the q103 minhash-index convention): only the NEW
   * batch pays tokenization; its posting rows union with the stored
   * table. The trailing `distinct` makes re-ingesting a replayed batch
   * idempotent (same (token, id) rows collapse) and its partial
   * aggregation runs map-side, so the cost is one shuffle of the
   * combined posting rows — no corpus re-scan, no index rebuild. Write
   * the result back as the new index generation.
   */
  def updateInvertedIndex(
      stored: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    stored.unionByName(buildInvertedIndex(newDocs, idCol, textCol)).distinct()

  /** Weighted posting rows (token, id, tf) — term frequency per document,
   *  the ranked-retrieval side of the index. Same skew-safe row shape. */
  def buildWeightedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Dedup.requireIntegralId(df, idCol, "buildWeightedIndex")
    df.select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("id"))
      .agg(count(lit(1)).as("tf"))
  }

  /** The ranking statistics a weighted index already knows at BUILD time,
   *  as two sidecar tables: per-document token lengths `(id, dl)` and the
   *  1-row corpus totals `(__N, __T)` (document count, token count).
   *  Persist them next to the postings (the q104/q113 stored-model
   *  convention): every later [[searchBm25]]/[[searchRanked]] call then
   *  touches |terms| posting partitions plus these small tables, instead
   *  of re-aggregating the WHOLE index per query — at 100 TB the index is
   *  TB-scale and a per-query full-index `groupBy(id)` is exactly the
   *  rescan "build once, serve many" exists to avoid. */
  def buildIndexStats(weighted: DataFrame): (DataFrame, DataFrame) = {
    val docLens = weighted.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val stats = docLens.agg(count(lit(1)).as("__N"), sum(col("dl")).as("__T"))
    (docLens, stats)
  }

  /**
   * TF-IDF ranked retrieval: top-`k` documents by `Σ_t tf(t,d)·idf(t)`
   * over the query terms, with idf = ln(N/df) rounded ONCE per distinct
   * term to integer micro-nats before any aggregation (the bigram-LM seam
   * rule, q107) — so per-document sums are exact integer arithmetic and
   * the ranking replays identically on any engine. Ties break by id
   * ascending, making the top-k set deterministic.
   *
   * Scale shape: the posting filter keeps only the query terms' rows; the
   * idf table is |terms| rows (broadcast); one id-keyed aggregate and a
   * bounded top-k (`TakeOrdered`) — no corpus rescan, no full sort.
   */
  def searchRanked(weighted: DataFrame, terms: Seq[String], k: Int): DataFrame =
    searchRanked(weighted, buildIndexStats(weighted)._2, terms, k)

  /** [[searchRanked]] serving corpus statistics from a STORED sidecar
   *  (the `(__N, __T)` row of [[buildIndexStats]]) instead of
   *  re-aggregating the whole index per query: the plan touches only the
   *  query terms' posting rows plus one broadcast stats row. */
  def searchRanked(
      weighted: DataFrame,
      stats: DataFrame,
      terms: Seq[String],
      k: Int): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "at least one search term required")
    require(k >= 1, s"k must be >= 1, got $k")
    val nRow = stats.select(col("__N"))
    val idf = weighted.filter(col("token").isin(ts: _*))
      .groupBy(col("token")).agg(countDistinct(col("id")).as("__df"))
      .crossJoin(broadcast(nRow))
      .select(col("token"),
        expr("CAST(round(ln(CAST(__N AS DOUBLE) / __df) * 1000000) AS BIGINT)")
          .as("__idfm"))
    weighted.filter(col("token").isin(ts: _*))
      .join(broadcast(idf), Seq("token"))
      .groupBy(col("id"))
      .agg(sum(col("tf") * col("__idfm")).as("score_micro"))
      .orderBy(desc("score_micro"), asc("id"))
      .limit(k)
  }

  /**
   * The exact arithmetic of one BM25 (term, doc) contribution in
   * integer micro-units, over integer posting statistics — shared
   * VERBATIM between the Spark plan and the DuckDB oracle so both
   * engines run the identical double expression and round once at the
   * same seam. Columns expected in scope: `tf` (term freq in doc),
   * `__df` (term document frequency), `dl` (doc token length), `__N`
   * (corpus doc count), `__T` (corpus token count). Uses the Lucene
   * idf variant `ln((N - df + 0.5)/(df + 0.5) + 1)` (always positive)
   * and k1/b passed as micro-integers so no engine-specific decimal
   * literal ever enters the expression.
   */
  def bm25ContributionSql(k1Micro: Long, bMicro: Long): String =
    s"""CAST(round(
       |  ln((CAST(__N AS DOUBLE) - __df + 0.5) / (__df + 0.5) + 1.0) *
       |  (CAST(tf AS DOUBLE) * (CAST(${k1Micro} AS DOUBLE) / 1e6 + 1.0)) /
       |  (CAST(tf AS DOUBLE) + (CAST(${k1Micro} AS DOUBLE) / 1e6) *
       |    (1.0 - CAST(${bMicro} AS DOUBLE) / 1e6 + (CAST(${bMicro} AS DOUBLE) / 1e6) *
       |      (CAST(dl AS DOUBLE) * __N / __T)))
       |  * 1e6, 0) AS BIGINT)""".stripMargin

  /**
   * BM25 ranked retrieval over the weighted posting index: top-`k`
   * documents by `Σ_t bm25(t, d)`, the standard probabilistic ranking
   * (Robertson–Spärck Jones; Lucene's default). Everything derives from
   * the INDEX ALONE — document lengths are `Σ tf` per id and the
   * average length is the exact corpus ratio `T/N` carried as two
   * integers into the double expression — so the query serves from
   * stored posting rows with no corpus access. Each (term, doc)
   * contribution evaluates once in doubles built from integer stats and
   * rounds to micro-units ([[bm25ContributionSql]], shared with the
   * oracle); per-document sums are exact integers; ties break by id
   * ascending.
   *
   * Scale shape: the posting filter keeps the query terms' rows; df and
   * the (N, T) stats are broadcast 1-row/`|terms|`-row frames; doc
   * lengths join on the id key; one id aggregate and a bounded top-k.
   */
  def searchBm25(
      weighted: DataFrame,
      terms: Seq[String],
      k: Int,
      k1Micro: Long = 1200000L,
      bMicro: Long = 750000L): DataFrame = {
    val (docLens, stats) = buildIndexStats(weighted)
    searchBm25(weighted, docLens, stats, terms, k, k1Micro, bMicro)
  }

  /** [[searchBm25]] serving document lengths and corpus totals from the
   *  STORED [[buildIndexStats]] sidecars: a query's plan is the terms'
   *  posting filter, an id-keyed join against the `(id, dl)` table, and
   *  two broadcast stat frames — no full-index aggregation per query.
   *  Per-term df still comes from the FILTERED postings (that scan is
   *  the query's own cost), so no df sidecar is required. */
  def searchBm25(
      weighted: DataFrame,
      docLens: DataFrame,
      stats: DataFrame,
      terms: Seq[String],
      k: Int,
      k1Micro: Long,
      bMicro: Long): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "at least one search term required")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1Micro >= 0 && bMicro >= 0 && bMicro <= 1000000L,
      s"k1Micro must be >= 0 and bMicro in [0, 1e6], got $k1Micro / $bMicro")
    val statsB = broadcast(stats.select(col("__N"), col("__T")))
    val dfCounts = broadcast(weighted.filter(col("token").isin(ts: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("__df")))
    weighted.filter(col("token").isin(ts: _*))
      .join(dfCounts, Seq("token"))
      .join(docLens.select(col("id"), col("dl")), Seq("id"))
      .crossJoin(statsB)
      .withColumn("__c", expr(bm25ContributionSql(k1Micro, bMicro)))
      .groupBy(col("id"))
      .agg(sum(col("__c")).as("score_micro"))
      .orderBy(desc("score_micro"), asc("id"))
      .limit(k)
  }

  /**
   * "More like this": for each QUERY DOCUMENT, the top-`k` most
   * lexically similar corpus documents, served from the stored weighted
   * index — the retrieval side of dedup triage ("what does this doc
   * near-copy?") and of example-based curation, without embeddings and
   * without a corpus cross join.
   *
   * score(q, d) = Σ over shared terms of tf_q·tf_d·idf(t)², with
   * idf = ln(N/df) rounded ONCE per distinct term to integer
   * MILLI-nats (the q107/q131 seam, at the coarser granularity the
   * squared term needs: idf² ≤ ~4.3e8 even at N = 10⁹, so the int64
   * sum cannot overflow where micro² would) and df counted over the
   * MATCHED postings' corpus rows — sums are exact integer arithmetic
   * and the ranking replays identically on any engine. The query doc
   * itself is excluded; ties break by id ascending.
   *
   * Scale shape: query docs tokenize on their own (a small batch — the
   * per-doc tf frame is |query terms| rows, broadcast); the index joins
   * on the token key so only the query terms' posting rows move; N
   * comes from the stored stats sidecar ([[buildIndexStats]]); the
   * per-query top-k window partitions on the query id over candidate
   * rows only. No corpus rescan, no all-pairs.
   */
  def moreLikeThis(
      weighted: DataFrame,
      stats: DataFrame,
      queryDocs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qtf = buildWeightedIndex(queryDocs, idCol, textCol)
      .select(col("token"), col("id").as("qid"), col("tf").as("qtf"))
    val matched = weighted.join(broadcast(qtf.select(col("token")).distinct()),
      Seq("token"))
    val idf = matched.groupBy(col("token"))
      .agg(countDistinct(col("id")).as("__df"))
      .crossJoin(broadcast(stats.select(col("__N"))))
      .select(col("token"),
        expr("CAST(round(ln(CAST(__N AS DOUBLE) / __df) * 1000) AS BIGINT)")
          .as("__idfk"))
    matched
      .join(broadcast(qtf), Seq("token"))
      .where(col("id") =!= col("qid"))
      .join(broadcast(idf), Seq("token"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("qtf") * col("tf") * col("__idfk") * col("__idfk"))
        .as("score_milli2"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(desc("score_milli2"), asc("id"))).cast("int"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
        col("score_milli2"))
  }

  /**
   * Deletes documents from a stored posting index (weighted, plain, or
   * positional — anything keyed by `id`): the GDPR/takedown side of the
   * index lifecycle. One compact anti-join against the distinct
   * deletion id set — no re-tokenization, no index rebuild; write the
   * result back as the next index generation (typically composed with
   * [[updateInvertedIndex]] for the delete+ingest compaction cycle).
   * Refuses non-integral deletion ids for the same silent-null-collapse
   * reason as the builders.
   */
  def deleteFromIndex(index: DataFrame, deleteIds: DataFrame, idCol: String): DataFrame = {
    Dedup.requireIntegralId(deleteIds, idCol, "deleteFromIndex")
    index.join(
      deleteIds.select(col(idCol).cast("long").as("id")).distinct(),
      Seq("id"), "left_anti")
  }

  /** Positional posting rows (token, id, pos) — 0-based token position,
   *  one row per occurrence; the phrase-query side of the index. */
  def buildPositionalIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Dedup.requireIntegralId(df, idCol, "buildPositionalIndex")
    df.select(col(idCol).cast("long").as("id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
      .select(col("token"), col("id"), col("pos").cast("long").as("pos"))
  }

  /**
   * Exact phrase query: ids whose documents contain the terms CONSECUTIVELY
   * in order. Each term's postings filter down first (volume = the matched
   * posting lists); term i joins term i−1 on (id, pos = prev_pos + 1) — an
   * equi-join on compact keys, chained once per phrase word, never a scan
   * of the corpus text. Single-term phrases degrade to a distinct lookup.
   */
  def searchPhrase(positional: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val first = positional.filter(col("token") === phrase.head)
      .select(col("id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (term, i)) =>
      val next = positional.filter(col("token") === term)
        .select(col("id").as("__id"), col("pos").as("__pos"))
      acc.join(next, acc("id") === col("__id") && col("__pos") === acc("pos") + i)
        .select(acc("id"), acc("pos"))
    }
    matched.select(col("id")).distinct()
  }

  /**
   * Keyword-in-context snippets: for every occurrence of `term`, the
   * ±`window`-token context from the containing document — the search
   * result presentation layer over the positional index. Occurrences
   * come from the term's posting rows (volume = one posting list, never
   * a corpus text scan); only the MATCHED documents' text joins back on
   * the id key and tokenizes once per doc (projected before the slice,
   * the q147 rule); each hit slices the token array around its stored
   * position. Returns (id, pos, snippet), snippet tokens joined by one
   * space.
   */
  def snippets(
      positional: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      term: String,
      window: Int): DataFrame = {
    require(term.nonEmpty, "term must be non-empty")
    require(window >= 0, s"window must be >= 0, got $window")
    val hits = positional.filter(col("token") === term)
      .select(col("id"), col("pos"))
    val docs = corpus
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
    hits.join(docs, "id")
      .select(col("id"), col("pos"),
        concat_ws(" ", slice(col("__toks"),
          greatest(col("pos") + 1 - window, lit(1)),
          (col("pos") + 1 + window -
            greatest(col("pos") + 1 - window, lit(1)) + 1).cast("int")))
          .as("snippet"))
  }

  /** The term plus every single-character-deletion variant — the SymSpell
   *  neighborhood key set. */
  private def deletionVariants(t: org.apache.spark.sql.Column) =
    array_union(array(t),
      transform(sequence(lit(1), length(t)),
        i => concat(t.substr(lit(1), i - lit(1)), t.substr(i + lit(1), length(t)))))

  /**
   * The SymSpell deletion-variant index: one row per (variant, token,
   * df_count) where `variant` ranges over the term and its
   * single-character deletions. SymSpell's whole win is precomputing
   * this neighborhood ONCE — build it from the vocabulary, persist as
   * parquet (the q130 lifecycle), and answer every later lookup from
   * the stored rows via [[fuzzyLookupIndexed]]; a per-query rebuild
   * would be an O(|vocab|·len) scan each call, exactly what the
   * algorithm exists to avoid. Row count = Σ (len+1) over vocabulary
   * terms — posting-row shape, no per-variant arrays, no skew traps.
   */
  def buildDeletionIndex(vocab: DataFrame): DataFrame =
    vocab.select(col("token"), col("df_count"),
      explode(deletionVariants(col("token"))).as("variant"))

  /**
   * Probe a stored deletion-variant index for terms within edit
   * distance 1 of `query`: the query expands to its own deletion
   * variants DRIVER-SIDE (|q|+1 literal keys), candidates come from the
   * variant equi-filter — volume = the matched posting lists — and a
   * final codegen'd `levenshtein` pass kills the false candidates two
   * different deletions can collide into. Returns matched
   * (token, df_count), distinct.
   */
  def fuzzyLookupIndexed(index: DataFrame, query: String): DataFrame = {
    require(query.nonEmpty, "query term must be non-empty")
    val qVariants = (query +:
      query.indices.map(i => query.take(i) + query.drop(i + 1))).distinct
    index.filter(col("variant").isin(qVariants: _*))
      .filter(levenshtein(col("token"), lit(query)) <= 1)
      .select(col("token"), col("df_count"))
      .distinct()
  }

  /**
   * Fuzzy (edit-distance ≤ 1) term lookup, SymSpell-style: vocabulary
   * terms and the query each expand to their single-deletion variants;
   * two strings within one edit ALWAYS share a variant (equal, or a
   * substitution's common deletion, or one being the other's deletion),
   * so candidates come from an equi-join on compact variant keys — O(|q|)
   * probe keys against |vocab|·(len+1) index rows — instead of a
   * levenshtein scan of the whole vocabulary. One-shot convenience
   * composing [[buildDeletionIndex]] + [[fuzzyLookupIndexed]]; a caller
   * issuing repeated lookups should persist the built index and probe
   * it directly.
   */
  def fuzzyTermLookup(vocab: DataFrame, query: String): DataFrame =
    fuzzyLookupIndexed(buildDeletionIndex(vocab), query)

  /**
   * Distinct (trigram, id) posting rows over raw CHARACTERS — the
   * substring-search side of the index (tokens can't answer "grep for
   * `ion w`"). Trigram extraction is pure column arithmetic
   * (`transform` over a position sequence + `substring`), no UDF; the
   * per-doc `array_distinct` keeps the explode at one row per DISTINCT
   * trigram before the global distinct's map-side partial aggregation.
   * Docs shorter than 3 chars contribute no postings (they can only
   * match sub-trigram queries, which the search path refuses anyway).
   */
  def buildTrigramIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Dedup.requireIntegralId(df, idCol, "buildTrigramIndex")
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) >= 3)
      .select(col("id"),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("__t")) - 2),
          i => col("__t").substr(i, lit(3)))))
          .as("trigram"))
      .distinct()
  }

  /**
   * Substring ("grep") query: ids whose documents contain `needle` as a
   * raw substring. Candidates are docs holding ALL of the needle's
   * distinct trigrams — a conjunctive posting lookup, volume = the
   * matched posting lists — and a final `contains` pass over ONLY the
   * candidates' text kills false positives (trigram presence does not
   * imply adjacency). The corpus is scanned for candidate verification
   * via an id equi-join, never fully: the classic pg_trgm shape.
   * Needles shorter than 3 characters are refused (no trigram can
   * narrow them; a caller that wants them pays for the full scan
   * explicitly).
   */
  def searchSubstring(
      trigramIndex: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      needle: String): DataFrame = {
    require(needle.length >= 3,
      s"needle must be at least 3 chars, got '${needle}'")
    val grams = needle.sliding(3).toSeq.distinct
    val candidates = trigramIndex.filter(col("trigram").isin(grams: _*))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === grams.length)
      .select(col("id"))
    corpus.select(col(idCol).cast("long").as("id"), col(textCol).as("__t"))
      .join(candidates, "id")
      .where(col("__t").contains(needle))
      .select(col("id"))
  }

  /**
   * Disjunctive (OR) query: ids whose documents contain ANY of the
   * terms, with the matched-term count — the recall-oriented companion
   * to [[searchConjunctive]] (rank by `n_matched` DESC for the classic
   * weak-AND shape). Same posting-filter cost model: data volume is the
   * matched posting lists, never the corpus.
   */
  def searchDisjunctive(index: DataFrame, terms: Seq[String]): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "at least one search term required")
    index.filter(col("token").isin(ts: _*))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matched"))
  }

  /**
   * Proximity query over the positional index: ids where `termA` and
   * `termB` occur within `slop` token positions of each other, IN ANY
   * ORDER, with the closest observed distance — the "these words appear
   * together" query between exact-phrase (slop inclusive of order) and
   * bag-of-words AND. Each term's postings filter down first; the match
   * is an id equi-join between the two lists with the |Δpos| bound as a
   * residual — pair volume is per-document occurrence products of two
   * SPECIFIC terms, not a corpus scan.
   */
  def searchProximity(
      positional: DataFrame,
      termA: String,
      termB: String,
      slop: Int): DataFrame = {
    require(termA.nonEmpty && termB.nonEmpty, "terms must be non-empty")
    require(termA != termB, "proximity of a term with itself is ill-defined")
    require(slop >= 1, s"slop must be >= 1, got $slop")
    val a = positional.filter(col("token") === termA)
      .select(col("id"), col("pos").as("__pa"))
    val b = positional.filter(col("token") === termB)
      .select(col("id").as("__id"), col("pos").as("__pb"))
    a.join(b, col("id") === col("__id") &&
        abs(col("__pa") - col("__pb")) <= slop)
      .groupBy(col("id"))
      .agg(min(abs(col("__pa") - col("__pb"))).as("min_distance"))
  }

  /**
   * Conjunctive (AND) query: ids whose documents contain EVERY term.
   * The filter keeps only the query terms' posting rows — data volume is
   * the sum of the matched posting lists, not the corpus — then one
   * aggregate per id demands all terms present. Terms are deduplicated;
   * an empty term list is refused rather than returning the corpus.
   */
  def searchConjunctive(index: DataFrame, terms: Seq[String]): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "at least one search term required")
    index.filter(col("token").isin(ts: _*))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === ts.length)
      .select(col("id"))
  }
}
