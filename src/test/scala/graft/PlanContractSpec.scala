package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts: the load-bearing plan shapes behind the
  * 100 TB design claims, asserted so a refactor that silently
  * de-optimizes a query (drops a broadcast, loses pushdown, widens a
  * shuffle) fails CI instead of shipping. Companion to PLAN_NOTES.md.
  */
class PlanContractSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(q: GQuery): String =
    q.run(spark, sfDir).queryExecution.executedPlan.toString

  test("q02: every predicate reaches the parquet scan (PushedFilters)") {
    val p = plan(operators.Relational.q02)
    assert(p.contains("PushedFilters: [IsNotNull("), p)
    assert(!p.replaceAll("ReadSchema: [^\n]*", "").contains("l_tax"),
      "projection pruning lost: untouched column read\n" + p)
  }

  test("q04: dimensions broadcast, facts never build side") {
    val p = plan(operators.Relational.q04)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "star-join dimensions must broadcast, not sort-merge\n" + p)
  }

  test("q11: global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan(operators.Relational.q11)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q38: serving top-k prunes map-side via WindowGroupLimit") {
    val p = plan(ml.Recommender.q38)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"),
      "map-side (Partial) WindowGroupLimit missing: shuffle carries all pairs\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "item factors must broadcast\n" + p)
  }

  test("q45: LSH candidate generation is an equi-join, never a cross product") {
    val p = plan(operators.Dedup.q45)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "band join degenerated to a cross product\n" + p)
  }

  test("q82: bitmap distinct is two aggregate levels, both partial-aggregated") {
    val p = plan(operators.Analytics.q82)
    assert(p.contains("bitmap_construct_agg"), p)
    assert(p.contains("partial_bitmap_construct_agg") || p.contains("Partial"),
      "level-1 bitmap aggregate lost its partial phase\n" + p)
    assert(p.contains("partial_sum"),
      "level-2 sum-of-bitcounts lost its partial phase\n" + p)
  }

  test("q48: inverted-index candidate generation is an equi-join on postings") {
    val p = plan(operators.Dedup.q48)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "set-similarity join degenerated to a cross product\n" + p)
    assert(p.contains("partial_count") || p.contains("Partial"),
      "co-occurrence count lost its partial (map-side) phase\n" + p)
  }

  test("q72: sampling filter sits directly on the scan") {
    val p = plan(operators.Analytics.q72)
    // guard before substring: a missing Filter must fail with the plan,
    // not a StringIndexOutOfBoundsException masking the regression
    assert(p.contains("+- Filter"), s"no Filter node in plan:\n$p")
    val below = p.substring(p.indexOf("+- Filter"))
    assert(below.contains("FileScan") && !below.contains("Exchange"), p)
  }

  test("q99: eval shingles are the broadcast build side of the contamination join") {
    val p = plan(operators.Pipeline.q99)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "eval shingle set must broadcast — a shuffle join scans-side the corpus\n" + p)
  }

  test("q103: might_contain filters the fact scan BEFORE any exchange") {
    val p = plan(operators.Pipeline.q103)
    assert(p.contains("might_contain"), p)
    val idx = p.indexOf("might_contain")
    val below = p.substring(idx)
    assert(below.contains("FileScan parquet") &&
      !below.substring(0, below.indexOf("FileScan parquet")).contains("Exchange"),
      "bloom test must sit scan-side, pre-shuffle\n" + p)
  }

  test("q114: the 3-term query and corpus stats broadcast; tf/df stay partial-aggregated") {
    val p = plan(operators.TextOps.q114)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_count"),
      "tf/df aggregation lost its map-side partial phase\n" + p)
  }

  test("q64: vocabulary join unhinted, corpus read from the tokenized memo, n_docs in-plan") {
    val df = operators.TextOps.q64.run(spark, sfDir)
    // the ONLY broadcast hint is the 1-row n_docs relation — a hint on
    // the vocabulary (df) side forces a multi-GB broadcast at corpus
    // scale (VERDICT r6 #2); stats/AQE must stay free to pick shuffle
    val hints = "strategy=broadcast".r
      .findAllIn(df.queryExecution.optimizedPlan.toString).size
    assert(hints <= 1, "vocabulary side must stay unhinted\n" +
      df.queryExecution.optimizedPlan.toString)
    // both tf and df read the TOKENIZED ARTIFACT (Memo.artifact parquet
    // — tokenize 100 TB once, persist, scan per statistic), never the
    // raw corpus: a scan of documents.parquet here would mean the plan
    // re-tokenizes (re-reads `text`) once per statistic
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      "q64 must feed off the tokenized artifact, not re-scan the raw corpus\n" + p)
    assert(!p.contains("text#"),
      "q64 must never carry the raw text column — tokenization happens once, at artifact build\n" + p)
    val artifactTag = new java.io.File(graft.Memo.artifactRoot).getName
    assert(p.contains("FileScan parquet") && p.contains(artifactTag),
      s"q64 lost its tokenized-artifact scan (expected a path under $artifactTag)\n" + p)
    // the artifact being a plain parquet table buys the scan goodies a
    // block-manager memo never had: column pruning must reach it
    assert(p.contains("ReadSchema: struct<doc_id:bigint,toks:array<string>>"),
      "artifact scan must prune to (doc_id, toks)\n" + p)
  }

  test("q117: the time-range frame costs exactly one data shuffle (user partitioning)") {
    val p = plan(operators.Temporal.q117)
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(dataExchanges === 1,
      s"expected 1 hash exchange for the window, found $dataExchanges\n$p")
    assert(p.contains("RangeFrame"), p)
  }

  test("q142: chunking is scan-side — zero hash exchanges, generator above the scan") {
    val p = plan(operators.TextOps.q142)
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      "chunk generation must not shuffle; only the presentation sort may exchange\n" + p)
  }

  test("q135: local (bucketed) skyline sweep runs below the single-partition global sweep") {
    val p = plan(operators.Analytics.q135)
    val single = p.indexOf("Exchange SinglePartition")
    val bucketed = p.indexOf("windowspecdefinition(bkt#")
    assert(single >= 0, s"global sweep's single-partition stage missing\n$p")
    assert(bucketed >= 0, s"bucketed local sweep missing\n$p")
    // executedPlan prints top-down, so the LOCAL sweep (deeper) must
    // appear after the single-partition exchange it feeds: the one-task
    // stage only ever sees local survivors, never the table
    assert(single < bucketed,
      "single-partition sweep must consume the bucketed pre-filter\n" + p)
    assert(p.indexOf("FileScan") > bucketed,
      "table scan must feed the local sweep, not the global one\n" + p)
  }

  test("q143: global ordinal plans with no Window and no single-partition exchange") {
    val p = plan(operators.Pipeline.q143)
    assert(!p.contains("Window"),
      "ordinal regressed to a window (single-partition row_number)\n" + p)
    assert(!p.contains("Exchange SinglePartition"),
      "no stage may collapse to one task\n" + p)
    assert(p.contains("Scan ExistingRDD"),
      "distributed zipWithIndex ordinal (plans.Ordinal) missing\n" + p)
  }

  test("q144: lang-only window consumes the bucketed local top-k, both rank-limited") {
    val p = plan(operators.Pipeline.q144)
    val global = p.indexOf("], [lang#")       // window partitioned on lang alone
    val bucketed = p.indexOf(", bucket#")     // window partitioned on (lang, bucket)
    assert(global >= 0 && bucketed >= 0, s"two-level top-k shape missing\n$p")
    assert(global < bucketed,
      "the lang-only window must sit ABOVE the bucketed local top-k\n" + p)
    assert(p.contains("WindowGroupLimit") &&
      p.substring(p.indexOf("WindowGroupLimit")).contains("Partial"),
      "rank-limit pushdown (map-side partial top-k) lost\n" + p)
  }

  test("q98: running offset is the two-level scan — no lang-only window over the corpus") {
    val p = plan(operators.Pipeline.q98)
    // the r5 scale-killer shape: SUM OVER (PARTITION BY lang ORDER BY
    // doc_id) prints its spec as (lang#N, doc_id#M ASC ...) — one task
    // per language sorting its whole corpus share. Must be gone.
    assert(!"windowspecdefinition\\(lang#\\d+, doc_id#".r.findFirstIn(p).isDefined,
      "prefix sum regressed to a lang-only window over the full table\n" + p)
    // the local window partitions on (lang, __bkt); the offset window
    // runs over the bucket-subtotal aggregate
    assert(p.contains("__bkt"), "PrefixSum bucketing missing\n" + p)
    assert("windowspecdefinition\\(lang#\\d+, __bkt#\\d+, doc_id#".r.findFirstIn(p).isDefined,
      "per-(lang, bucket) local prefix window missing\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "bounds/offsets must broadcast back, never shuffle the corpus\n" + p)
  }

  test("q102: quantile cut ranks the length histogram, not the corpus") {
    val p = plan(operators.Pipeline.q102)
    assert(!p.contains("row_number"),
      "cutoffs regressed to per-lang row_number over every doc\n" + p)
    // cumulative window must consume the per-(lang, n_chars) histogram
    // aggregate (with a map-side partial phase), so the only full-table
    // operations are partial-aggregating scans
    assert("HashAggregate\\(keys=\\[lang#\\d+, n_chars#".r.findFirstIn(p).isDefined,
      "length histogram aggregate missing\n" + p)
    assert(p.contains("partial_count"),
      "histogram lost its map-side partial phase\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "the |langs|-row cutoff table must broadcast back\n" + p)
  }

  test("q145: grouped OLS is one aggregation pass with a map-side partial phase") {
    val p = plan(operators.Analytics.q145)
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(dataExchanges === 1,
      s"expected exactly 1 hash exchange (the lang rollup), found $dataExchanges\n$p")
    assert(p.contains("partial_sum"),
      "moment sums lost their map-side partial phase\n" + p)
    assert(!p.contains("Join"), "closed-form OLS must not join\n" + p)
  }

  test("q153: the interval join is an equi-join on the bucket, never a nested loop") {
    val p = plan(operators.Temporal.q153)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range predicate degenerated to a nested-loop/cross join\n" + p)
    // the bucket ids must be a join KEY (hashpartitioning or broadcast on
    // bucket), with the range predicate as a post-join condition
    assert(p.contains("bucket"), p)
  }

  test("q167: the widest join graph is all-broadcast under one fact aggregate") {
    val p = plan(operators.Relational.q167)
    assert(!p.contains("SortMergeJoin"),
      "a dimension hop fell back to sort-merge — fact table moved\n" + p)
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 6, s"expected >= 6 broadcast hops, found $bhj\n$p")
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(dataExchanges <= 1,
      s"fact side should shuffle at most once (year rollup), found $dataExchanges\n$p")
  }

  test("q202: correlated scalar subqueries decorrelate to aggregate+join") {
    val p = plan(operators.Relational.q202)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "a correlated subquery survived as a per-row nested-loop re-scan\n" + p)
    // the two per-part scalar subqueries must share/land as standalone
    // aggregates over lineitem joined back on l_partkey
    assert("HashAggregate".r.findAllIn(p).length >= 3,
      "decorrelated per-part aggregate missing\n" + p)
  }

  test("q206: COUNT/MIN/MAX answered from parquet footers (PushedAggregation)") {
    val p = plan(operators.Ingest.q206)
    assert(p.contains("PushedAggregation: [COUNT(*), MIN(l_orderkey), MAX(l_orderkey)]"),
      "aggregate not pushed into the scan — rows would be decoded\n" + p)
  }

  test("q214: the runtime month dim prunes fact partitions (dynamicpruning)") {
    val p = plan(operators.Ingest.q214)
    assert(p.contains("dynamicpruning"),
      "DynamicPruningExpression missing from the fact scan's partition " +
        "filters — every ship_mon directory would be read\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "month dim must broadcast (DPP reuses that broadcast for free)\n" + p)
  }

  test("q207: runtime bloom filter prunes the fact side before its shuffle") {
    val p = plan(operators.Relational.q207)
    assert(p.contains("bloom_filter_agg") || p.contains("might_contain"),
      "InjectRuntimeFilter did not fire — full fact shuffle\n" + p)
    assert(p.contains("SortMergeJoin"),
      "join must be the shuffle shape the runtime filter exists for\n" + p)
  }

  test("q208: the self-referenced aggregate shuffles once (ReusedExchange)") {
    val p = plan(operators.Relational.q208)
    assert(p.contains("ReusedExchange"),
      "the per-order aggregate's shuffle planned twice\n" + p)
    // the ReusedExchange node's own line repeats the reused exchange's
    // description — count real Exchange NODES (lines), not substrings
    val realExchanges = p.split("\n").count(l =>
      l.contains("Exchange hashpartitioning(l_orderkey") && !l.contains("ReusedExchange"))
    assert(realExchanges == 1,
      s"expected exactly one planned l_orderkey shuffle, found $realExchanges\n" + p)
  }

  test("q155: Apriori prune keeps the basket self-join behind a semi-join") {
    val p = plan(operators.Analytics.q155)
    assert(p.contains("LeftSemi"),
      "frequent-1 downward-closure prune (left_semi) missing from the plan\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair generation degenerated to a cross product\n" + p)
  }

  test("q107: the salted join runs the shuffle-hash path it exists for") {
    // broadcasting the replicated side would make the salt pure
    // overhead (no partition skew to split, saltBuckets× the broadcast
    // bytes) — the hint in Skew.saltedJoin pins the fallback's real plan
    val p = plan(operators.Pipeline.q107)
    assert(p.contains("ShuffledHashJoin"),
      "salted join lost its shuffle-hash pin\n" + p)
    assert(!p.contains("BroadcastHashJoin"),
      "replicated right side got broadcast — salting is a no-op here\n" + p)
  }

  test("q177: the sketch is one partial-aggregated pass; probes broadcast") {
    val p = plan(operators.TextOps.q177)
    assert(p.contains("count_min_agg"), "native sketch aggregate missing\n" + p)
    assert(p.contains("ObjectHashAggregate"),
      "TypedImperativeAggregate must run object-hash, with a map-side partial\n" + p)
    assert(p.contains("TakeOrderedAndProject"),
      "exact top-20 must plan as top-k, not a full sort\n" + p)
    assert(!p.contains("CartesianProduct"),
      "1-row sketch × 20-row probes must broadcast, never cartesian\n" + p)
  }

  test("q178: the sweep prefix sum is the two-level scan, never a global sort") {
    val p = plan(operators.Temporal.q178)
    assert(p.contains("__bkt"), "PrefixSum bucketing missing\n" + p)
    // the fatal shape: running sum ordered by tu over the WHOLE delta
    // stream in one task (windowspecdefinition with tu leading = no
    // partition columns before the order key)
    assert(!"windowspecdefinition\\(tu#\\d+L? ASC".r.findFirstIn(p).isDefined,
      "sweep regressed to an unpartitioned window over all deltas\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast back\n" + p)
  }

  test("q180: wedge generation and the adjacency anti-join stay equi-joins") {
    val p = plan(operators.Graph.q180)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "link-prediction candidates degenerated to a cross product\n" + p)
    assert(p.contains("LeftAnti"), "non-adjacency filter must be an anti-join\n" + p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 must plan as top-k\n" + p)
  }

  test("q181: histogram rank is the two-level scan, never a global row_number") {
    val p = plan(operators.Analytics.q181)
    assert(p.contains("__bkt"), "PrefixSum bucketing missing\n" + p)
    // bad shape: row_number ordered by price over the whole table
    // (windowspecdefinition led by the price order key, no partition)
    assert(!"windowspecdefinition\\(p#\\d+ ASC".r.findFirstIn(p).isDefined,
      "rank regressed to an unpartitioned window over every row\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "bounds/offsets/n must broadcast, never shuffle the fact table\n" + p)
  }

  test("q58: exact quantiles select from buckets — no sort of the input relation") {
    val p = plan(operators.Temporal.q58)
    assert(p.contains("__eq_b"), "histogram-selection bucketing missing\n" + p)
    // the data-bearing relation must never be globally sorted: the only
    // Sort nodes belong to bucket-table windows and the tiny final
    // orderBy — a Sort directly over the customer scan is the regression
    assert(!p.contains("RangePartitioning(cents"),
      "input relation range-sorted — full ranking crept back\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "bounds/targets must broadcast against the scan\n" + p)
  }

  test("q249: MaxSim is one straight-line projection — no token Generate, no token shuffle") {
    val p = plan(operators.Similarity.q249)
    assert(!p.contains("Generate"),
      "token explode crept into the MaxSim projection\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the bounded query side must broadcast; the catalog streams\n" + p)
  }

  test("q266: the salt reaches the join exchange keys; the join is sort-merge") {
    val p = plan(operators.Relational.q266)
    assert(p.contains("SortMergeJoin"),
      "merge hint lost — a broadcast join makes the salting demo vacuous\n" + p)
    // the whole point: the shuffle spreads the hot key over (k, salt),
    // not k alone
    assert("hashpartitioning\\(k#\\d+L?, __salt#\\d+".r.findFirstIn(p).isDefined,
      "salt column missing from the join exchange keys\n" + p)
  }

  test("q267: phrase search token filters sit on the postings, join is equi on (doc, pos)") {
    val p = plan(operators.TextOps.q267)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "positional merge degenerated to a cross product\n" + p)
    assert(p.contains("tok#") && p.contains("= table"),
      "token filter missing above the postings explode\n" + p)
  }

  test("q274: the bucketed join subtree is exchange-free (the layout IS the shuffle)") {
    val p = plan(operators.Relational.q274)
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    val joinSection = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning"),
      "bucketed join re-shuffled — the write-time layout was wasted\n" +
        joinSection)
    assert(joinSection.contains("SelectedBucketsCount") ||
      joinSection.contains("Bucketed: true"),
      "join sides are not reading the bucketed layout\n" + joinSection)
  }

  test("q248: point-in-time join is ONE carry-forward window, no interval fan-out join") {
    val p = plan(operators.Temporal.q248)
    // exactly one Window (the carry-forward); a per-fact interval range
    // join would appear as a second join after the union
    assert("\\bWindow\\b".r.findAllIn(p).length == 1,
      "expected exactly the carry-forward window\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "interval fan-out join crept in\n" + p)
  }

  test("q70: PassJoin candidates are codegen'd explode chains + equi-join, never all-pairs") {
    val p = plan(operators.Analytics.q70)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "edit-distance candidates degenerated to all-pairs\n" + p)
    // the probe side must be Generate (explode) nodes — the HOF draft
    // (transform/flatten) fell out of codegen and cost 22 s interpreted
    assert("\\bGenerate\\b".r.findAllIn(p).length >= 3,
      "expected the explode-chain probe construction\n" + p)
  }

  test("q247: two-level symspell joins are equi-joins over distinct keys, never all-pairs") {
    val p = plan(operators.Dedup.q247)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "variant join degenerated to a cross product\n" + p)
  }

  test("q315: multi-probe candidates join bucket-to-bucket, never all-pairs") {
    val p = plan(operators.Similarity.q315)
    assert(!p.contains("CartesianProduct"),
      "probe join degenerated to a cross product\n" + p)
  }

  test("q197: prefix-filtered candidates + codegen'd exact verify, no unfiltered dot join") {
    val p = plan(operators.TextOps.q197)
    // the verify path exists ONLY in the prefix-filtered plan: the
    // unfiltered formulation computes the dot as join+groupBy and has
    // no sorted-merge expression anywhere (r13's 86M-row intermediate)
    assert(p.contains("sorted_dot_long"),
      "exact verify missing: the unfiltered posting self-join is back\n" + p)
    // the L2 prefix bounds are windowed suffix sums over each doc
    assert("\\bWindow\\b".r.findAllIn(p).nonEmpty,
      "prefix tail-bound window missing\n" + p)
    assert(!p.contains("CartesianProduct"),
      "candidate join degenerated to a cross product\n" + p)
  }

  test("q322: both similarity-join legs are prefix-filtered equi-joins with exact verifies") {
    val p = plan(operators.TextOps.q322)
    assert(p.contains("sorted_dot_long") && p.contains("sorted_intersect_count"),
      "a leg lost its exact verify (prefix filter gone?)\n" + p)
    assert(!p.contains("CartesianProduct"),
      "a candidate join degenerated to a cross product\n" + p)
  }

  test("q321: full-corpus cosine near-dup joins bucket-to-bucket, never all-pairs") {
    val p = plan(operators.Similarity.q321)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "bucket join degenerated to a cross product\n" + p)
  }

  test("q324: corpus collapses to the histogram first; no unhinted cross product") {
    val p = plan(operators.Analytics.q324)
    // the lang-pair grid is a bounded BNLJ by design; what must NOT
    // appear is an unhinted CartesianProduct or a corpus-sized window
    assert(!p.contains("CartesianProduct"), p)
    // the histogram's own partial phase sits above the memo checkpoint;
    // what this plan must show is map-side partials on every aggregate
    // it DOES contain (totals, max, argmax)
    assert(p.contains("partial_"),
      "pair aggregates lost their map-side partial phase\n" + p)
  }

  test("q326: the capping window partitions on (user, type), never type alone") {
    val p = plan(operators.Pipeline.q326)
    assert(p.contains("windowspecdefinition(user_id"),
      "row cap must window on the high-cardinality (user_id, event_type) " +
        "key — a type-only window is one task per type at scale\n" + p)
  }

  test("q327/q325: no cross product; rankings window on the panel query id") {
    // the panel×corpus join itself sits above the scored-relation
    // checkpoint (lineage-truncated here); the visible contract is that
    // every ranking window partitions on query_id — the bounded panel —
    // and nothing downstream degenerates to a cross product
    for (q <- Seq(operators.Similarity.q327, operators.Similarity.q325)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        "a downstream join degenerated to an unhinted cross product\n" + p)
      assert(p.contains("windowspecdefinition(query_id"),
        "rankings must window per panel query\n" + p)
    }
  }

  test("q335: outlier neighbor search joins bucket-to-bucket, never all-pairs") {
    val p = plan(operators.Similarity.q335)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "bucket join degenerated to a cross product\n" + p)
    assert(p.contains("TakeOrderedAndProject"),
      "bounded top-100 must plan as TakeOrdered, not a full sort\n" + p)
  }

  test("q333: winnowing pair join is df-capped postings, never all-pairs") {
    val p = plan(operators.Dedup.q333)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "fingerprint join degenerated to a cross product\n" + p)
  }

  test("q354: semdedup pairs are a bucket equi-join; centroid sums partial-aggregate") {
    val p = plan(operators.Similarity.q354)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "semantic-dup candidate join degenerated to a cross product\n" + p)
    // the exploded per-dim quantized sums must combine map-side, or the
    // shuffle carries 64 rows per document instead of 64 per bucket
    assert(p.contains("partial_sum"),
      "centroid aggregation lost its map-side partial phase\n" + p)
  }

  test("q355/q356: margin mining tops out as TakeOrdered; neighborhoods aggregate, never window-sort") {
    val p5 = plan(operators.Similarity.q355)
    assert(p5.contains("TakeOrderedAndProject"),
      "panel top-100 must plan as TakeOrdered, not a global sort\n" + p5)
    assert(p5.contains("partial_top_k_agg") && !p5.contains("windowspecdefinition"),
      "top-4 neighborhoods must be the bounded TopKAgg (≤4 pairs per " +
        "group per partial), not a window sort of the squared relation\n" + p5)
    val p6 = plan(operators.Similarity.q356)
    assert(p6.contains("TakeOrderedAndProject"),
      "bucketed top-100 must plan as TakeOrdered, not a global sort\n" + p6)
    assert(p6.contains("partial_top_k_agg") && !p6.contains("windowspecdefinition"),
      "bucketed neighborhoods must be the bounded TopKAgg, not a window\n" + p6)
    assert(!p6.contains("CartesianProduct") && !p6.contains("BroadcastNestedLoopJoin"),
      "bucket-confined candidates degenerated to a cross product\n" + p6)
  }

  test("q328: first-occurrence resolution is equi-joins + partial aggs, no window") {
    val p = plan(operators.TextOps.q328)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "novelty join degenerated to a cross product\n" + p)
    assert(!p.contains("windowspecdefinition"),
      "novelty must come from the first-occurrence groupBy+join, " +
        "not a cumulative-distinct window\n" + p)
  }
}
