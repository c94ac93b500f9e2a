package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GQuery
import graft.GQuery.oracled
import graft.functions.GraftFunctions.dec2
import graft.sources.Tables

/** Training-data pipeline operators beyond detection/dedup (north-star
  * set, round 4): PII redaction, repetition scoring, sequence packing,
  * benchmark decontamination, RAG-style chunking, domain-mixture
  * reweighting, quantile length filtering, and a bloom-prefiltered
  * semi-join (the runtime-filter shape made explicit).
  *
  * Scale notes per operator are on each query; the common theme is that
  * every per-document metric here is SCAN-LOCAL (array/regexp expressions
  * over the text column, no explode→shuffle unless an actual join is
  * required), and every join carries a bounded side (eval shingles,
  * per-lang weights, per-lang cutoffs, the bloom bitmap) that broadcasts.
  */
object Pipeline {

  private def toks: Column = split(trim(col("text")), " ")

  // ------------------------------------------------------------ PII redaction

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** q96 — PII redaction accounting: scrub email/phone patterns from the
    * corpus and account for what was removed. The fixture text carries no
    * PII, so a deterministic injection (pure function of doc_id, same
    * arithmetic in the oracle — the q92 dirty-fixture trick) plants one
    * email + one phone in every 13th doc; the query then counts matches
    * and reports the redacted length per affected doc. Everything is
    * scan-local regexp work — the 100 TB shape is a single pass, no
    * shuffle before the final order.
    */
  val q96 = oracled(
    "q96_pii_redaction",
    "deterministic PII injection + regexp redaction accounting",
    s"""WITH inj AS (
         SELECT doc_id,
           CASE WHEN doc_id % 13 = 2 THEN
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com or 555-' ||
             lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE text END AS t
         FROM documents),
       red AS (
         SELECT doc_id,
           len(regexp_extract_all(t, '$EmailRe')) AS n_emails,
           len(regexp_extract_all(t, '$PhoneRe')) AS n_phones,
           regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
                          '$PhoneRe', '<PHONE>', 'g') AS redacted
         FROM inj)
       SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
         CAST(n_phones AS BIGINT) AS n_phones,
         CAST(length(redacted) AS BIGINT) AS n_chars_redacted
       FROM red WHERE n_emails + n_phones > 0 ORDER BY doc_id""") { (s, dir) =>
    val inj = when(col("doc_id") % 13 === 2,
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), inj.as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        length(regexp_replace(regexp_replace(col("t"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).cast("long").as("n_chars_redacted"))
      .filter(col("n_emails") + col("n_phones") > 0)
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------- repetition scoring

  /** q97 — repetition scoring: per-doc distinct-bigram ratio, the
    * standard "is this document degenerate boilerplate" quality signal
    * (a high share of repeated bigrams marks templated/spammy text).
    * Bigrams are built with zip_with over two array slices and deduped
    * with array_distinct — all inside the row, zero shuffle: at 100 TB
    * this is a pure map pass whose cost is the scan itself.
    */
  val q97 = oracled(
    "q97_repetition_ratio",
    "per-doc repeated-bigram ratio (degenerate-text quality signal)",
    """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
       b AS (SELECT doc_id,
          list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg
         FROM t)
       SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
         CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams,
         1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)/len(bg) AS rep_ratio
       FROM b ORDER BY doc_id""") { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b)).as("bg"))
      .select(col("doc_id"),
        size(col("bg")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bg"))).cast("long").as("n_distinct_bigrams"))
      .withColumn("rep_ratio",
        lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------- sequence packing

  private val PackBudget = 512

  /** q98 — sequence-packing plan: concatenate each language's token
    * stream in doc_id order and cut it into fixed [[PackBudget]]-token
    * training sequences — the standard LLM pretraining packing step.
    * Each doc's chunk span falls out of a running token offset, computed
    * with [[graft.plans.PrefixSum]]'s two-level distributed scan rather
    * than a window partitioned on the ~5-value `lang` key (which would
    * sort each language's entire share of a 100 TB corpus in ONE task —
    * the q144 scale-killer shape from VERDICT r5). The per-lang summary
    * reports chunk counts, boundary-straddling docs, and fill ratio.
    */
  val q98 = oracled(
    "q98_sequence_packing",
    s"per-lang $PackBudget-token sequence packing plan (offset, chunk spans, fill)",
    s"""WITH t AS (SELECT doc_id, lang, len(string_split(trim(text),' ')) AS n_toks FROM documents),
       o AS (SELECT doc_id, lang, n_toks,
          SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id) - n_toks AS off FROM t),
       p AS (SELECT lang, n_toks, off // $PackBudget AS first_chunk,
          (off + n_toks - 1) // $PackBudget AS last_chunk FROM o)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         CAST((SUM(n_toks) + ${PackBudget - 1}) // $PackBudget AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN first_chunk <> last_chunk THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
         CAST(SUM(n_toks) AS DOUBLE) / (((SUM(n_toks) + ${PackBudget - 1}) // $PackBudget) * $PackBudget) AS fill_ratio
       FROM p GROUP BY lang ORDER BY lang""") { (s, dir) =>
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_toks"))
    graft.plans.PrefixSum
      .withRunningTotal(base, "run", Seq("lang"), "doc_id", "n_toks")
      .withColumn("off", col("run") - col("n_toks"))
      .select(col("lang"), col("n_toks"),
        expr(s"off div $PackBudget").as("first_chunk"),
        expr(s"(off + n_toks - 1) div $PackBudget").as("last_chunk"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        expr(s"(sum(n_toks) + ${PackBudget - 1}) div $PackBudget").as("n_chunks"),
        count_if(col("first_chunk") =!= col("last_chunk")).as("n_split_docs"),
        (sum(col("n_toks")).cast("double") /
          (expr(s"(sum(n_toks) + ${PackBudget - 1}) div $PackBudget") * PackBudget)).as("fill_ratio"))
      .orderBy(col("lang"))
  }

  // ----------------------------------------------------------- decontamination

  /** q99 — benchmark decontamination: flag training docs sharing any
    * 5-gram shingle with the held-out eval set (here the deterministic
    * doc_id % 7 = 0 slice standing in for a benchmark). Shingles are
    * built scan-local (transform over slices, deduped per doc); the eval
    * side's DISTINCT shingle set is the bounded artifact — benchmarks
    * are tiny next to a training corpus — so the contamination check is
    * one broadcast hash join against the full corpus scan, the same
    * shape at 100 TB.
    */
  val q99 = oracled(
    "q99_decontamination",
    "training docs sharing 5-gram shingles with the eval slice (broadcast join)",
    """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
       sh AS (SELECT doc_id,
          unnest(list_distinct(list_transform(range(1, len(toks)-3),
            i -> array_to_string(toks[i:i+4], ' ')))) AS s
         FROM t),
       ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 7 = 0),
       tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 7 <> 0)
       SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       FROM tr JOIN ev ON tr.s = ev.s
       GROUP BY tr.doc_id ORDER BY tr.doc_id""") { (s, dir) =>
    val shingle5 = when(size(col("toks")) >= 5,
      array_distinct(transform(sequence(lit(1), size(col("toks")) - 4),
        i => array_join(slice(col("toks"), i, lit(5)), " "))))
      .otherwise(array().cast("array<string>"))
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(shingle5).as("s"))
    val ev = sh.filter(col("doc_id") % 7 === 0).select(col("s")).distinct()
    sh.filter(col("doc_id") % 7 =!= 0)
      .join(broadcast(ev), "s")
      // shingles are distinct per doc and the eval side is distinct, so
      // plain COUNT is already the distinct shared-shingle count
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------- chunk + overlap

  private val ChunkTokens = 32
  private val ChunkStride = 24

  /** q100 — overlapping chunking (RAG/embedding prep): split each doc
    * into [[ChunkTokens]]-token windows every [[ChunkStride]] tokens.
    * Chunk starts come from `sequence()` + `explode` — rows multiply by
    * ~n_toks/stride, the unavoidable output growth of chunking — and the
    * chunk text itself is a scan-local array slice; there is no join and
    * no shuffle before the final order. At 100 TB this is a map-side
    * row-expansion whose output feeds the embedding stage directly.
    */
  val q100 = oracled(
    "q100_chunk_overlap",
    s"overlapping $ChunkTokens-token chunks every $ChunkStride tokens (RAG prep)",
    s"""WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
       c AS (SELECT doc_id, toks, unnest(range(0, len(toks), $ChunkStride)) AS s FROM t)
       SELECT doc_id, CAST(s // $ChunkStride AS BIGINT) AS chunk_idx,
         CAST(least($ChunkTokens, len(toks) - s) AS BIGINT) AS chunk_tokens,
         CAST(length(array_to_string(toks[s+1:s+$ChunkTokens], ' ')) AS BIGINT) AS chunk_chars
       FROM c ORDER BY doc_id, chunk_idx""") { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(ChunkStride))).as("s"))
      .select(col("doc_id"),
        expr(s"s div $ChunkStride").as("chunk_idx"),
        least(lit(ChunkTokens), size(col("toks")) - col("s")).cast("long").as("chunk_tokens"),
        length(array_join(slice(col("toks"), col("s") + 1, lit(ChunkTokens)), " "))
          .cast("long").as("chunk_chars"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  // ------------------------------------------------------- domain reweighting

  /** q101 — domain-mixture reweighting: compute per-lang keep-weights
    * that flatten the corpus toward a uniform language mixture (the
    * over-represented language is down-sampled, the rest kept whole),
    * then count the docs a deterministic arithmetic hash would keep.
    * The weight table is |langs| rows — broadcast — and the keep rule is
    * scan-local arithmetic on doc_id (bounded before multiplication so
    * ANSI overflow can't fire at any corpus size), so the 100 TB plan is
    * scan → broadcast join → partial agg.
    */
  val q101 = oracled(
    "q101_domain_mixture",
    "uniform-mixture down-sampling weights per lang + deterministic keep counts",
    """WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
       tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t, COUNT(*) AS nl FROM cnt),
       w AS (SELECT lang, n, least(1.0, t/(nl*n)) AS weight FROM cnt, tot)
       SELECT w.lang, CAST(w.n AS BIGINT) AS n_docs, w.weight,
         CAST(SUM(CASE WHEN CAST((d.doc_id % 100003) * 2654435761 % 1000000 AS DOUBLE)/1000000.0 < w.weight
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       FROM documents d JOIN w ON d.lang = w.lang
       GROUP BY w.lang, w.n, w.weight ORDER BY w.lang""") { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val cnt = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum(col("n")).cast("double").as("t"), count(lit(1)).as("nl"))
    val w = cnt.crossJoin(broadcast(tot)) // 1-row totals frame
      .select(col("lang"), col("n"),
        least(lit(1.0), col("t") / (col("nl") * col("n"))).as("weight"))
    docs.join(broadcast(w), "lang")
      .groupBy(col("lang"), col("n"), col("weight"))
      .agg(count_if(
        ((col("doc_id") % 100003) * 2654435761L % 1000000).cast("double") / 1000000.0
          < col("weight")).as("n_kept"))
      .select(col("lang"), col("n").as("n_docs"), col("weight"), col("n_kept"))
      .orderBy(col("lang"))
  }

  // -------------------------------------------------- quantile length filter

  /** q102 — per-lang length-quantile filtering: drop the shortest 5% and
    * longest 5% of docs per language, the routine outlier trim before
    * training. Cutoffs are DISCRETE percentiles (the value at rank
    * ⌈q·n⌉ — integer arithmetic, so both engines agree bit-exactly where
    * interpolated percentiles could drift). The rank-⌈q·n⌉ value equals
    * the smallest n_chars whose running histogram count reaches ⌈q·n⌉,
    * so the Spark plan aggregates a per-(lang, n_chars) histogram first
    * and runs the cumulative window over THAT relation — bounded by
    * distinct lengths, not corpus rows. The old shape (row_number
    * partitioned on the ~5-value lang key over every doc) sorted each
    * language's entire 100 TB share in one task; the histogram keeps
    * the exact-percentile semantics and the hash-exact oracle while the
    * only full-table operation left is a partial-aggregating groupBy.
    */
  val q102 = oracled(
    "q102_length_quantile_filter",
    "per-lang p05/p95 discrete length cutoffs + kept-doc accounting",
    """WITH r AS (SELECT lang, n_chars, doc_id,
          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY lang) AS cnt FROM documents),
       cut AS (SELECT lang,
          MAX(CASE WHEN rn = CAST(ceil(0.05*cnt) AS BIGINT) THEN n_chars END) AS lo_cut,
          MAX(CASE WHEN rn = CAST(ceil(0.95*cnt) AS BIGINT) THEN n_chars END) AS hi_cut
         FROM r GROUP BY lang)
       SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs, c.lo_cut, c.hi_cut,
         CAST(SUM(CASE WHEN d.n_chars BETWEEN c.lo_cut AND c.hi_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       FROM documents d JOIN cut c ON d.lang = c.lang
       GROUP BY d.lang, c.lo_cut, c.hi_cut ORDER BY d.lang""") { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val hist = docs.groupBy(col("lang"), col("n_chars")).agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars"))))
      .withColumn("cnt", sum(col("c")).over(Window.partitionBy(col("lang"))))
    val cut = cum.groupBy(col("lang")).agg(
      min(when(col("cum") >= ceil(lit(0.05) * col("cnt")).cast("long"), col("n_chars"))).as("lo_cut"),
      min(when(col("cum") >= ceil(lit(0.95) * col("cnt")).cast("long"), col("n_chars"))).as("hi_cut"))
    docs.join(broadcast(cut), "lang")
      .groupBy(col("lang"), col("lo_cut"), col("hi_cut"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("n_chars").between(col("lo_cut"), col("hi_cut"))).as("n_kept"))
      .select(col("lang"), col("n_docs"), col("lo_cut"), col("hi_cut"), col("n_kept"))
      .orderBy(col("lang"))
  }

  // --------------------------------------------------- bloom-prefiltered join

  /** q103 — bloom-prefiltered semi-join: Spark's runtime row-group
    * filtering, made explicit. The bounded side (urgent orders) folds
    * into ONE bloom bitmap via the engine's native BloomFilterAggregate
    * (the scalar the planner's InjectRuntimeFilter rule builds); the
    * bitmap — kilobytes, like a broadcast var — prefilters the fact scan
    * with the codegen'd might_contain BEFORE the shuffle, and the exact
    * semi-join then removes bloom false positives, so the result is
    * bit-identical to the plain semi-join the oracle runs. At 100 TB
    * the win is shuffling ~sel·|fact| rows instead of |fact|.
    */
  val q103 = oracled(
    "q103_bloom_prefilter_join",
    "bloom-prefiltered exact semi-join (native BloomFilterAggregate + might_contain)",
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
       GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // fold the bounded side into one bloom bitmap (a scalar artifact,
    // like a broadcast variable — the driver holds bytes, never rows)
    val bloomAgg = GraftSqlBridge.toColumn(
      new BloomFilterAggregate(
        GraftSqlBridge.toExpression(xxhash64(col("o_orderkey"))),
        Literal(100000L)).toAggregateExpression())
    val bloomBytes = urgent.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = GraftSqlBridge.toColumn(
      BloomFilterMightContain(Literal(bloomBytes),
        GraftSqlBridge.toExpression(xxhash64(col("l_orderkey")))))
    Tables.lineitem(s, dir)
      .filter(mightContain) // scan-side prefilter: drops non-matching rows pre-shuffle
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi") // exactness
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  // ------------------------------------------------------ salted aggregation

  /** q104 — salted skew aggregation through the correctness gate: the
    * two-stage (key, salt) → key aggregation [[Skew.saltedCountSum]]
    * provides for hot keys, run on a 3-value key (every key is a zipf
    * head) and proven equal to the plain GROUP BY the oracle runs. AQE
    * re-splits skewed JOIN partitions but not a skewed groupBy — this
    * two-stage shape is what caps per-reducer load at 1/saltBuckets of
    * the hottest key at any scale.
    */
  val q104 = oracled(
    "q104_salted_agg",
    "two-stage salted aggregation over a hot 3-value key == plain GROUP BY",
    """SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
       FROM (SELECT l_returnflag AS k, l_quantity FROM lineitem)
       GROUP BY k ORDER BY k""") { (s, dir) =>
    Skew.saltedCountSum(
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), dec2(col("l_quantity")).as("q"), col("l_orderkey")),
      key = col("l_returnflag"),
      value = col("q"),
      saltSource = col("l_orderkey"))
      .select(col("k"), col("n"), col("total").cast("double").as("total_qty"))
      .orderBy(col("k"))
  }

  /** q107 — salted skew JOIN through the correctness gate: the
    * replicate-join fallback [[Skew.saltedJoin]] provides for hot join
    * keys AQE can't re-split (pre-partitioned inputs, or an aggregation
    * fused on the join output), proven equal to the plain equi-join +
    * aggregate the oracle runs. The salt comes from stable row content
    * (l_partkey), so results are deterministic under retries.
    */
  val q107 = oracled(
    "q107_salted_join",
    "replicate-salted equi-join == plain join (skew fallback through the gate)",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
    val left = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), dec2(col("l_quantity")).as("q"),
        col("l_partkey"))
    val right = Tables.orders(s, dir)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    // 8 buckets: enough to split a hot key 8 ways while keeping the
    // replicated right side bounded (replication factor IS the knob)
    Skew.saltedJoin(left, right, "okey", saltSource = col("l_partkey"), saltBuckets = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("q")).cast("double").as("total_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** q112 — Unicode canonicalization accounting: a deterministic slice
    * of the corpus gets a decomposed-form suffix (e + combining acute —
    * how a second crawl delivers the "same" text), and the query
    * accounts per lang for docs whose NFC normalization changed them.
    * Normalization runs in the native codegen'd
    * [[graft.functions.NormalizeText]] (Spark has no builtin; a UDF
    * would break codegen on the full-corpus pass); the oracle is
    * DuckDB's nfc_normalize. Without this stage, byte-level
    * fingerprints treat composed/decomposed twins as distinct docs and
    * every dedup stage silently under-merges.
    */
  val q112 = oracled(
    "q112_unicode_canonicalization",
    "NFC normalization accounting (native expression vs nfc_normalize oracle)",
    """WITH inj AS (
         SELECT lang,
           CASE WHEN doc_id % 5 = 1 THEN text || ' e' || chr(769) || 'cole'
                ELSE text END AS t
         FROM documents),
       n AS (SELECT lang, length(t) AS raw_len,
               length(nfc_normalize(t)) AS norm_len FROM inj)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN raw_len <> norm_len THEN 1 ELSE 0 END) AS BIGINT) AS n_denormalized,
         CAST(SUM(raw_len) AS BIGINT) AS sum_raw_chars,
         CAST(SUM(norm_len) AS BIGINT) AS sum_norm_chars
       FROM n GROUP BY lang ORDER BY lang""") { (s, dir) =>
    import graft.functions.NormalizeText.nfc
    val inj = when(col("doc_id") % 5 === 1,
      // NB deliberately DECOMPOSED: 'e' + U+0301 combining acute, spelled
    // as an escape so no tool can silently NFC-normalize the source
    concat(col("text"), lit(" e\u0301cole"))).otherwise(col("text"))
    Tables.documents(s, dir)
      .select(col("lang"), length(inj).as("raw_len"), length(nfc(inj)).as("norm_len"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("raw_len") =!= col("norm_len")).as("n_denormalized"),
        sum(col("raw_len")).as("sum_raw_chars"),
        sum(col("norm_len")).as("sum_norm_chars"))
      .orderBy(col("lang"))
  }

  /** q113 — the corpus-prep pipeline COMPOSED end-to-end in one plan:
    * NFC-canonicalize → quality-gate (q41's exact rule, threshold 0.4)
    * → exact-dedup the survivors on normalized text → per-lang
    * accounting of docs in, docs gated, distinct docs kept, and tokens
    * surviving to training. Every stage reuses the operator the
    * individual queries prove (NormalizeText, TextOps.qualityScore,
    * distinct-text dedup), so this is the integration contract: the
    * stages compose without re-materialization — one scan, one
    * aggregate per level, and the dedup's distinct runs on the gated
    * subset only.
    */
  val q113 = oracled(
    "q113_corpus_prep_pipeline",
    "composed prep: canonicalize -> quality gate -> dedup -> per-lang accounting",
    s"""WITH n AS (
         SELECT doc_id, lang, nfc_normalize(text) AS t FROM documents),
       q AS (
         SELECT doc_id, lang, t, ${TextOps.qualityDuckSql("t")} AS quality FROM n),
       counts AS (
         SELECT lang, COUNT(*) AS n_docs,
           SUM(CASE WHEN quality >= 0.4 THEN 1 ELSE 0 END) AS n_pass
         FROM q GROUP BY lang),
       kept AS (
         SELECT lang, COUNT(*) AS n_kept, SUM(n_toks) AS kept_tokens FROM (
           SELECT lang, t, len(string_split(t, ' ')) AS n_toks
           FROM q WHERE quality >= 0.4 GROUP BY lang, t) GROUP BY lang)
       SELECT counts.lang, CAST(n_docs AS BIGINT) AS n_docs,
         CAST(n_pass AS BIGINT) AS n_pass,
         CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
         CAST(COALESCE(kept_tokens, 0) AS BIGINT) AS kept_tokens
       FROM counts LEFT JOIN kept ON counts.lang = kept.lang
       ORDER BY counts.lang""") { (s, dir) =>
    import graft.functions.NormalizeText.nfc
    val canon = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), nfc(col("text")).as("t"))
      .withColumn("quality", TextOps.qualityScore(col("t")))
    val counts = canon.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("quality") >= 0.4).as("n_pass"))
    val kept = canon.filter(col("quality") >= 0.4)
      .select(col("lang"), col("t")).distinct()
      .select(col("lang"), size(split(col("t"), " ")).cast("long").as("n_toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_toks")).as("kept_tokens"))
    counts.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("n_pass"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy(col("lang"))
  }

  /** q116 — hybrid retrieval with reciprocal-rank fusion (RRF, k=60):
    * the lexical ranking (q114's BM25) and a semantic ranking (exact
    * cosine against the vec_id-0 query embedding, ids shared with
    * documents) fuse as Σ 1/(k + rank) — the standard RAG hybrid-search
    * combiner. Each 1/(k+rank) term is the exact integer floor
    * `10⁹ div (k + rank)` (ROUNDDIV burndown, VERDICT r10 #7 — ranks
    * are small positive integers, so the scaled floor loses < 1e-9 of
    * resolution per term and both engines' non-negative integer
    * division agrees bit-for-bit; no float, no ROUND policy); a doc
    * missing from one ranking contributes 0 from that side (full outer
    * fusion, NULL rank → NULL div → COALESCE 0 — computed from the
    * RAW side columns, not the 0-defaulted output aliases). Both
    * rankings are rank windows over hash-aggregate/broadcast plans —
    * nothing new is shuffled by the fusion itself beyond the final
    * outer join on id.
    */
  val q116 = oracled(
    "q116_hybrid_rrf",
    "hybrid BM25 + embedding-cosine retrieval fused by reciprocal rank (k=60)",
    s"""WITH ${TextOps.bm25DuckCtes},
       lex AS (
         SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
         FROM bm25s),
       sem AS (
         SELECT y.vec_id AS doc_id,
           ROW_NUMBER() OVER (ORDER BY ${Similarity.duckCos("x", "y")} DESC, y.vec_id) AS sem_rank
         FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id
         WHERE x.vec_id = 0),
       fused AS (
         SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
           COALESCE(lex.lex_rank, 0) AS lex_rank,
           COALESCE(sem.sem_rank, 0) AS sem_rank,
           COALESCE(1000000000 // (60 + lex.lex_rank), 0)
             + COALESCE(1000000000 // (60 + sem.sem_rank), 0) AS rrf_x9
         FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
       SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
         CAST(sem_rank AS BIGINT) AS sem_rank, CAST(rrf_x9 AS BIGINT) AS rrf_x9
       FROM fused ORDER BY rrf_x9 DESC, doc_id LIMIT 10""") { (s, dir) =>
    import graft.functions.VecOps.{dotF, l2Norm}
    val lex = TextOps.bm25Scores(s, dir)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") === 0)
    val sem = broadcast(q.alias("x")).join(e.alias("y"), col("y.vec_id") =!= col("x.vec_id"))
      .select(col("y.vec_id").as("doc_id"),
        (dotF(col("x.embedding"), col("y.embedding")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
      .withColumn("sem_rank", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id"))))
      .select(col("doc_id"), col("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).cast("long").as("lex_rank"),
        coalesce(col("sem_rank"), lit(0)).cast("long").as("sem_rank"),
        (coalesce(expr("1000000000L div (60 + lex_rank)"), lit(0L))
          + coalesce(expr("1000000000L div (60 + sem_rank)"), lit(0L)))
          .cast("long").as("rrf_x9"))
      .orderBy(col("rrf_x9").desc, col("doc_id"))
      .limit(10)
  }

  /** q120 — verbatim-substring duplication with CONTENT-DEFINED anchors
    * (winnowing-style): every 20-token window is a candidate, but only
    * windows whose rolling hash ≡ 0 (mod 8) become anchors — the same
    * window text selects identically in every document, so a shared run
    * is detected regardless of its OFFSET in each doc (a fixed-stride
    * anchor grid would miss runs whose offsets differ off-grid; this is
    * the substring-dedup analog of content-defined chunking, and
    * TrainingPrepSpec proves the offset-robustness on a synthetic
    * shifted duplicate). Per affected doc: anchor count, duplicated
    * anchors, duplication ratio. Anchors join on raw strings so the
    * oracle stays trivial; at 100 TB the join key is the already-
    * computed 8-byte hash.
    */
  val q120 = oracled(
    "q120_substring_dup",
    "verbatim 20-token-window duplication via content-defined (hash-selected) anchors",
    s"""WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
       cand AS (
         SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks)-19, 1)+1),
           p -> array_to_string(toks[p:p+19], ' '))) AS win
         FROM t),
       w AS (SELECT doc_id, win FROM cand
         WHERE ${graft.functions.RollingHash.duckSql("win")} % 8 = 0),
       dw AS (SELECT win, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY win),
       j AS (SELECT w.doc_id, dw.nd FROM w JOIN dw ON w.win = dw.win)
       SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS dup_ratio
       FROM j GROUP BY doc_id
       HAVING SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) > 0 ORDER BY doc_id""") { (s, dir) =>
    anchorStats(Tables.documents(s, dir))
      .filter(col("n_dup_windows") > 0)
      .orderBy(col("doc_id"))
  }

  /** The q120 pipeline over an arbitrary documents frame (un-memoized),
    * shared with the offset-robustness spec.
    */
  private[graft] def anchorStats(docs: DataFrame): DataFrame = {
    import graft.functions.RollingHash.rollingHash
    val w = docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(col("toks")) - 19, lit(1))),
        p => array_join(slice(col("toks"), p, lit(20)), " "))).as("win"))
      .filter(rollingHash(col("win")) % 8 === 0) // content-defined anchor selection
      // lazy pin (r17, guide §1.2): the plan consumed the anchor table
      // twice (the broadcast dw build and the probe side are separate
      // subtrees), re-running tokenize + explode + rolling-hash over the
      // corpus per consumer. The anchor table is the 1/8-sampled window
      // set — a bounded fraction of corpus bytes — so pinning it beats
      // the second full scan pass at any scale.
      .localCheckpoint(false)
    val dw = w.groupBy(col("win")).agg(countDistinct(col("doc_id")).as("nd"))
    w.join(dw, "win")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        count_if(col("nd") > 1).as("n_dup_windows"),
        (count_if(col("nd") > 1).cast("double") / count(lit(1))).as("dup_ratio"))
  }

  private val GopherStop = Seq("the", "a", "of", "and", "to", "in")

  /** q121 — Gopher-style quality-rule battery (Rae et al. 2021 §A1.1,
    * adapted thresholds): per lang, how many docs pass each rule —
    * word-count bounds, mean word length in [3,10], symbol-to-char
    * ratio ≤ 0.1, ≥ 2 stopwords — and the conjunction. All scan-local
    * arithmetic; the per-rule breakdown is what a pipeline operator
    * dashboard actually shows (which rule is killing yield).
    */
  val q121 = oracled(
    "q121_gopher_rules",
    "per-lang pass counts for the Gopher quality-rule battery + conjunction",
    """WITH m AS (
         SELECT lang,
           len(string_split(trim(text),' ')) AS n_words,
           CAST(length(replace(text,' ','')) AS DOUBLE)/len(string_split(trim(text),' ')) AS mean_wlen,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)/length(text) AS sym_ratio,
           len(list_filter(string_split(trim(text),' '),
             w -> list_contains(['the','a','of','and','to','in'], w))) AS n_stop
         FROM documents)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END) AS BIGINT) AS pass_words,
         CAST(SUM(CASE WHEN mean_wlen BETWEEN 3 AND 10 THEN 1 ELSE 0 END) AS BIGINT) AS pass_wlen,
         CAST(SUM(CASE WHEN sym_ratio <= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS pass_sym,
         CAST(SUM(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_stop,
         CAST(SUM(CASE WHEN n_words BETWEEN 50 AND 100000 AND mean_wlen BETWEEN 3 AND 10
              AND sym_ratio <= 0.1 AND n_stop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
       FROM m GROUP BY lang ORDER BY lang""") { (s, dir) =>
    val nWords = size(toks)
    val meanWlen = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val symRatio = length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", ""))
      .cast("double") / length(col("text"))
    val nStop = size(filter(toks, w => array_contains(typedLit(GopherStop), w)))
    val pw = nWords.between(50, 100000)
    val pl = meanWlen.between(3, 10)
    val ps = symRatio <= 0.1
    val pt = nStop >= 2
    Tables.documents(s, dir)
      .select(col("lang"), pw.as("pw"), pl.as("pl"), ps.as("ps"), pt.as("pt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("pw")).as("pass_words"),
        count_if(col("pl")).as("pass_wlen"),
        count_if(col("ps")).as("pass_sym"),
        count_if(col("pt")).as("pass_stop"),
        count_if(col("pw") && col("pl") && col("ps") && col("pt")).as("pass_all"))
      .orderBy(col("lang"))
  }

  /** q122 — compression-ratio quality screen: per-lang deflate-ratio
    * stats plus the count of suspiciously compressible docs (ratio
    * below 0.45 — far under natural-prose deflate ratios). Rows-only:
    * deflate output size is a zlib-build detail, not a cross-engine
    * contract (the DuckDB oracle has no deflate anyway) — bounded
    * instead by TrainingPrepSpec's monotonicity and determinism checks.
    */
  val q122 = GQuery.rowsOnly(
    "q122_compress_ratio_screen",
    "per-lang deflate compression-ratio stats (degenerate-text screen)") { (s, dir) =>
    import graft.functions.CompressRatio.compressRatio
    Tables.documents(s, dir)
      .select(col("lang"), compressRatio(col("text")).as("cr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("cr")), 4).as("avg_ratio"),
        round(min(col("cr")), 4).as("min_ratio"),
        count_if(col("cr") < 0.45).as("n_suspicious"))
      .orderBy(col("lang"))
  }

  /** q129 — deterministic train/val/test split (80/10/10): assignment
    * is scan-side arithmetic on doc_id (the q101 multiplicative hash,
    * bounded before multiply so ANSI overflow can't fire), so the split
    * is reproducible across runs, engines, partitionings, and
    * re-shards — the property that makes a 100 TB split auditable. The
    * summary proves the partition: per-split counts plus a checksum,
    * with completeness/disjointness implied by the exhaustive
    * non-overlapping CASE (and re-checked against the corpus total).
    */
  val q129 = oracled(
    "q129_train_val_test_split",
    "deterministic 80/10/10 split assignment + partition accounting",
    """WITH a AS (
         SELECT doc_id,
           CASE WHEN (doc_id % 100003) * 2654435761 % 1000000 < 800000 THEN 'train'
                WHEN (doc_id % 100003) * 2654435761 % 1000000 < 900000 THEN 'val'
                ELSE 'test' END AS split
         FROM documents)
       SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(doc_id) AS BIGINT) AS min_doc,
         CAST(SUM(doc_id) AS BIGINT) AS sum_doc
       FROM a GROUP BY split ORDER BY split""") { (s, dir) =>
    val h = (col("doc_id") % 100003) * 2654435761L % 1000000
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(h < 800000, "train").when(h < 900000, "val").otherwise("test").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_doc"),
        sum(col("doc_id")).as("sum_doc"))
      .orderBy(col("split"))
  }

  /** q137 — data-quality constraint report (the Deequ pattern): column
    * completeness, key uniqueness, domain membership, a cross-column
    * consistency rule (n_chars == length(text)), and min/max bounds over
    * `documents`, computed in ONE aggregate pass and emitted long-form as
    * (constraint_name, value) so downstream gating is data, not code.
    * The whole battery is a single scan + single-row aggregate (the
    * distinct-count is the only expression that widens the shuffle) —
    * adding a constraint at 100 TB costs zero extra passes, which is the
    * entire point of batching audits into one aggregate. stack() then
    * pivots the 1×8 metrics row long-form, driver-side-free.
    */
  val q137 = oracled(
    "q137_quality_constraints",
    "one-pass column-constraint audit: completeness/uniqueness/domain/consistency",
    """WITH m AS (SELECT
         COUNT(*) AS total,
         COUNT(text) AS text_ok,
         COUNT(lang) AS lang_ok,
         COUNT(DISTINCT doc_id) AS id_distinct,
         SUM(CASE WHEN lang IN ('en','de','fr','es') THEN 1 ELSE 0 END) AS lang_dom,
         SUM(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS len_ok,
         CAST(MIN(n_chars) AS DOUBLE) AS min_chars,
         CAST(MAX(n_chars) AS DOUBLE) AS max_chars
       FROM documents)
       SELECT c AS constraint_name, ROUND(v, 6) AS value FROM (
         SELECT 'completeness_text' AS c, CAST(text_ok AS DOUBLE) / total AS v FROM m
         UNION ALL SELECT 'completeness_lang', CAST(lang_ok AS DOUBLE) / total FROM m
         UNION ALL SELECT 'uniqueness_doc_id', CAST(id_distinct AS DOUBLE) / total FROM m
         UNION ALL SELECT 'domain_lang', CAST(lang_dom AS DOUBLE) / total FROM m
         UNION ALL SELECT 'consistency_n_chars', CAST(len_ok AS DOUBLE) / total FROM m
         UNION ALL SELECT 'min_n_chars', min_chars FROM m
         UNION ALL SELECT 'max_n_chars', max_chars FROM m
         UNION ALL SELECT 'row_count', CAST(total AS DOUBLE) FROM m)
       ORDER BY constraint_name""") { (s, dir) =>
    Tables.documents(s, dir)
      .agg(
        count(lit(1)).as("total"),
        count(col("text")).as("text_ok"),
        count(col("lang")).as("lang_ok"),
        countDistinct(col("doc_id")).as("id_distinct"),
        count_if(col("lang").isin("en", "de", "fr", "es")).as("lang_dom"),
        count_if(col("n_chars") === length(col("text"))).as("len_ok"),
        min(col("n_chars")).cast("double").as("min_chars"),
        max(col("n_chars")).cast("double").as("max_chars"))
      .select(expr(
        """stack(8,
             'completeness_text',   CAST(text_ok AS DOUBLE) / total,
             'completeness_lang',   CAST(lang_ok AS DOUBLE) / total,
             'uniqueness_doc_id',   CAST(id_distinct AS DOUBLE) / total,
             'domain_lang',         CAST(lang_dom AS DOUBLE) / total,
             'consistency_n_chars', CAST(len_ok AS DOUBLE) / total,
             'min_n_chars',         min_chars,
             'max_n_chars',         max_chars,
             'row_count',           CAST(total AS DOUBLE)
           ) AS (constraint_name, v)"""))
      .select(col("constraint_name"), round(col("v"), 6).as("value"))
      .orderBy(col("constraint_name"))
  }

  /** q143 — length-aware batch planning: quantify padding waste when
    * docs are batched 8-at-a-time in arrival (doc_id) order vs sorted by
    * length — every sequence in a batch pads to the batch max, so waste
    * = Σ_batches (count·max − Σ n_chars). Length-sorted batching is the
    * standard trick that cuts padded-token waste severalfold; this
    * operator emits the evidence (total real vs padded chars per
    * strategy) rather than asserting it. Shape: batch ids need a GLOBAL
    * ordinal, which must NOT be an unpartitioned `row_number` window
    * (single-task sort of the whole table) — [[graft.plans.Ordinal]]
    * assigns it via parallel range sort + zipWithIndex, so each
    * strategy costs one range exchange plus a per-partition-count
    * action, every stage parallel.
    */
  val q143 = oracled(
    "q143_length_batch_planning",
    "padding waste: arrival-order vs length-sorted fixed-size batches",
    """WITH ranked AS (
         SELECT n_chars,
           (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 8 AS batch_arrival,
           (ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1) // 8 AS batch_sorted
         FROM documents),
       a AS (SELECT 'arrival' AS strategy, batch_arrival AS batch, n_chars FROM ranked
             UNION ALL
             SELECT 'sorted', batch_sorted, n_chars FROM ranked),
       b AS (SELECT strategy, batch, COUNT(*) AS cnt, MAX(n_chars) AS mx,
               SUM(n_chars) AS real_chars
             FROM a GROUP BY strategy, batch)
       SELECT strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
         CAST(SUM(real_chars) AS BIGINT) AS real_chars,
         CAST(SUM(cnt * mx) AS BIGINT) AS padded_chars,
         CAST(SUM(cnt * mx - real_chars) AS BIGINT) AS padding_waste
       FROM b GROUP BY strategy ORDER BY strategy""") { (s, dir) =>
    val docs = Tables.documents(s, dir)
    def batched(strategy: String, order: Seq[Column]) =
      graft.plans.Ordinal
        .withGlobalOrdinal(docs.select(col("doc_id"), col("n_chars")), "rn", order: _*)
        .select(lit(strategy).as("strategy"),
          expr("(rn - 1) div 8").as("batch"), col("n_chars"))
    batched("arrival", Seq(col("doc_id")))
      .unionByName(batched("sorted", Seq(col("n_chars"), col("doc_id"))))
      .groupBy(col("strategy"), col("batch"))
      .agg(count(lit(1)).as("cnt"), max(col("n_chars")).as("mx"),
        sum(col("n_chars")).as("real_chars"))
      .groupBy(col("strategy"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("real_chars")).as("real_chars"),
        sum(col("cnt") * col("mx")).as("padded_chars"),
        sum(col("cnt") * col("mx") - col("real_chars")).as("padding_waste"))
      .orderBy(col("strategy"))
  }

  /** q144 — deterministic weighted sampling (priority sampling / the
    * k-min-hash shape of weighted reservoir sampling): every doc gets a
    * reproducible pseudo-uniform draw u = ((doc_id mod 100003)·2654435761 mod p)
    * (bounded-before-multiply, the q129 rule), a priority u·10^5 div
    * n_chars — ALL integer arithmetic, so the sample is bit-identical
    * across engines, partitionings, and reruns — and the 10 smallest
    * priorities per lang win: longer docs (bigger weight) get
    * proportionally smaller priorities, i.e. weight-biased selection
    * with none of rand()'s irreproducibility. At 100 TB this is one
    * scan + a TWO-LEVEL per-group top-k: `lang` has a handful of
    * values, so a window partitioned on it alone would sort each
    * language's entire corpus share in ONE task (the round-5 verdict's
    * scale-killer). Instead a local top-10 per (lang, doc_id-derived
    * bucket) — parallelism = langs × shuffle-partitions — feeds a
    * global top-10 per lang over at most buckets×10 survivors (the
    * same local-then-global sweep as q135's skyline). The superset
    * property makes the rewrite exact: every global top-10 row is by
    * definition in its own bucket's top-10. Swapping the integer
    * priority for -ln(u)/w gives exact exponential-clock WRS at the
    * cost of cross-engine float determinism — same plan shape.
    */
  val q144 = oracled(
    "q144_weighted_sample",
    "deterministic weight-biased priority sampling, min-10 per lang",
    """WITH p AS (
         SELECT lang, doc_id, n_chars,
           (doc_id % 100003 * 2654435761 % 1000000007) * 100000 // n_chars AS priority
         FROM documents WHERE n_chars > 0),
       r AS (
         SELECT lang, doc_id, n_chars, priority,
           ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY priority, doc_id) AS rk
         FROM p)
       SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_chars,
         CAST(priority AS BIGINT) AS priority
       FROM r WHERE rk <= 10 ORDER BY lang, rk""") { (s, dir) =>
    // bucket count scales with the session's shuffle parallelism; the
    // result is bucket-count-invariant (superset property), which the
    // determinism tool exercises at cpus=7 vs 32
    val buckets = s.sessionState.conf.numShufflePartitions.max(1)
    val wLocal = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("priority"), col("doc_id"))
    val wGlobal = Window.partitionBy(col("lang"))
      .orderBy(col("priority"), col("doc_id"))
    Tables.documents(s, dir)
      .filter(col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        expr("doc_id % 100003 * 2654435761 % 1000000007 * 100000 div n_chars").as("priority"),
        pmod(col("doc_id"), lit(buckets)).as("bucket"))
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= 10)
      .withColumn("rk", row_number().over(wGlobal).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"), col("priority"))
      .orderBy(col("lang"), col("rk"))
  }

  /** q212 — PRIORITY SAMPLING with the Duffield–Lund–Thorup estimator
    * (the principled weighted-sample-without-replacement upgrade of
    * q144, VERDICT r8 #7b): per item, priority q_i = w_i/u_i with
    * u_i ∈ (0,1] a deterministic per-item uniform; keep the k largest
    * priorities per language; τ = the (k+1)-th priority; every kept
    * item gets the UNBIASED weight estimate ŵ_i = max(w_i, τ)
    * (E[Σ_S ŵ] = Σ w over the whole population — the estimator that
    * makes a 10-row sample answer subset-sum queries over the corpus).
    *
    * EXACT cross-engine order with no floats anywhere: u_i = h_i/2^20
    * (h from the q144 LCG class, 1 ≤ h ≤ 1048573; doc_id is reduced
    * mod 100003 BEFORE the Knuth multiply — the q72/q184 overflow
    * discipline — so the product stays < 2.66e14 and the draw is
    * ANSI-safe for every BIGINT doc_id, not just ids below ~3.46e9),
    * and the sort key is
    * `(w·2^40) div h` — for rationals w1/h1 ≠ w2/h2 the difference is
    * ≥ 1/(h1·h2) ≥ 2^-40, so the 2^40-scaled floors still differ:
    * floor order IS the exact rational priority order (ties = equal
    * rationals, broken by doc_id on both engines). τ and ŵ stay in the
    * same integer units (ŵ·2^20 = max(w·2^20, τ_scaled), documented
    * scale — the no-decimal-output rule). A-ES exponential-jitter keys
    * (u^(1/w)) would need a transcendental on BOTH engines — the exact
    * rational form is the version-proof formulation of the same
    * without-replacement semantics.
    *
    * Scale shape: the selection is q210's bounded native [[graft.functions.TopKAgg]]
    * (k+1 pairs of state per partial, NO window sort of the corpus);
    * the k·langs survivors broadcast back for weight recovery. One
    * corpus scan total.
    */
  val q212 = oracled(
    "q212_priority_sample_estimator",
    "per-lang priority sampling (exact integer w/u keys) + Duffield–Lund–Thorup unbiased weight estimates",
    """WITH p AS (
         SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
           (doc_id % 100003) * 2654435761 % 1048573 + 1 AS h
         FROM documents WHERE n_chars > 0),
       q AS (SELECT lang, doc_id, w, w * 1099511627776 // h AS priority
         FROM p),
       r AS (SELECT lang, doc_id, w, priority,
           ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY priority DESC, doc_id) AS rk
         FROM q),
       t AS (SELECT lang, MAX(CASE WHEN rk = 11 THEN priority END) AS tau
         FROM r GROUP BY lang)
       SELECT r.lang, CAST(r.rk AS BIGINT) AS rk, r.doc_id, r.w, r.priority,
         CAST(COALESCE(t.tau, 0) AS BIGINT) AS tau_scaled,
         CAST(GREATEST(r.w * 1048576, COALESCE(t.tau, 0)) AS BIGINT)
           AS w_hat_x2_20
       FROM r JOIN t ON r.lang = t.lang
       WHERE r.rk <= 10
       ORDER BY r.lang, r.rk""") { (s, dir) =>
    import graft.functions.TopKAgg.topKAgg
    val docs = Tables.documents(s, dir).filter(col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), col("n_chars").cast("long").as("w"))
      .withColumn("h", expr("(doc_id % 100003) * 2654435761 % 1048573 + 1"))
      .withColumn("priority", expr("w * 1099511627776 div h"))
    val top = docs.groupBy(col("lang"))
      .agg(topKAgg(col("priority"), col("doc_id"), 11).as("tk"))
      .filter(size(col("tk")) > 0) // q210's empty-sketch guard
      .select(col("lang"),
        expr("explode(sequence(0L, CAST(size(tk) AS BIGINT) div 2 - 1))").as("i"),
        col("tk"))
      .select(col("lang"), (col("i") + 1).as("rk"),
        element_at(col("tk"), (col("i") * 2 + 1).cast("int")).as("priority"),
        element_at(col("tk"), (col("i") * 2 + 2).cast("int")).as("doc_id"))
    val tau = top.filter(col("rk") === 11)
      .select(col("lang"), col("priority").as("tau_scaled"))
    // weight recovery: k·langs survivor rows broadcast against the
    // corpus — the corpus is scanned once above and once here; no
    // corpus-sized shuffle anywhere
    docs.select(col("doc_id"), col("w"))
      .join(broadcast(top.filter(col("rk") <= 10)), Seq("doc_id"))
      .join(broadcast(tau), Seq("lang"), "left")
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"),
        col("w"), col("priority"),
        coalesce(col("tau_scaled"), lit(0L)).as("tau_scaled"),
        greatest(col("w") * lit(1048576L),
          coalesce(col("tau_scaled"), lit(0L))).as("w_hat_x2_20"))
      .orderBy(col("lang"), col("rk"))
  }

  /** q245 — A-ES weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis) with an EXACT-INTEGER exponential jitter —
    * the true A-ES upgrade of q212's priority sampling (VERDICT r9 #7a;
    * q212's scaladoc dismissed A-ES as needing a transcendental on both
    * engines — this query removes that blocker). A-ES: item i gets an
    * exponential race time T_i = E_i/w_i with E_i ~ Exp(1); the k
    * SMALLEST T form an exact without-replacement weighted sample. The
    * version-proof trick is a LOG2-LINEARIZED jitter in pure integer
    * arithmetic: u = h/2³² from the q144/q212 hash class, and
    *   E ≈ −log2(u),  E_x20 = 32·2²⁰ − L2_x20(h)
    * (doc_id reduced mod 100003 before the Knuth multiply, the q212
    * overflow discipline — BIGINT-safe for every doc_id)
    * with L2_x20 the shared [[graft.functions.IntLog2]] integer
    * piecewise-linear log2 (binary-digit-count octave + in-octave
    * interpolation; both engines evaluate the identical formula — see
    * IntLog2's scaladoc for the 0.0861 chord bound, PipelineSpec-
    * pinned; E is measured in log2 units — a constant ln2 factor of
    * the exponential rate, irrelevant to the ORDER that defines the
    * sample). Selection order T = E/w is an exact rational; the sort
    * key is `E_x20·2²² div w` — the q212 floor-scale lemma (distinct
    * rationals differ by ≥ 1/(w₁w₂) ≥ 2⁻²² for w ≤ 2¹¹ = 2048 ≥
    * max(n_chars), so floors never flip the order; PipelineSpec pins
    * the lemma for this key family too).
    *
    * Scale shape (q212's): the per-lang selection is the bounded
    * native [[graft.functions.TopKAgg]] (k pairs of state per partial,
    * no corpus window sort); survivors broadcast back for weight
    * recovery. One corpus scan + one broadcast probe.
    */
  val q245 = oracled(
    "q245_aes_weighted_sample",
    "A-ES weighted sampling w/o replacement: exact-integer log2-linearized exponential jitter, per-lang top-10",
    s"""WITH p AS (
         SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
           (doc_id % 100003) * 2654435761 % 4294967295 + 1 AS h
         FROM documents WHERE n_chars > 0),
       e AS (SELECT lang, doc_id, w,
           33554432 - ${graft.functions.IntLog2.duckSql("h")} AS e_x20
         FROM p),
       k AS (SELECT lang, doc_id, w, e_x20,
           e_x20 * 4194304 // w AS key_x22
         FROM e),
       r AS (SELECT lang, doc_id, w, e_x20, key_x22,
           ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY key_x22, doc_id) AS rk
         FROM k)
       SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, w,
         CAST(e_x20 AS BIGINT) AS e_x20, CAST(key_x22 AS BIGINT) AS key_x22
       FROM r WHERE rk <= 10 ORDER BY lang, rk""") { (s, dir) =>
    import graft.functions.TopKAgg.topKAgg
    val docs = Tables.documents(s, dir).filter(col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), col("n_chars").cast("long").as("w"))
      .withColumn("h", expr("(doc_id % 100003L) * 2654435761L % 4294967295L + 1L"))
      .withColumn("e_x20",
        expr(s"33554432L - ${graft.functions.IntLog2.sparkSql("h")}"))
      .withColumn("key_x22", expr("e_x20 * 4194304 div w"))
    // TopKAgg keeps the LARGEST priorities: negate the ascending race
    // key so the k smallest T survive; ties break by doc_id like q212
    val top = docs.groupBy(col("lang"))
      .agg(topKAgg(-col("key_x22"), col("doc_id"), 10).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("lang"),
        expr("explode(sequence(0L, CAST(size(tk) AS BIGINT) div 2 - 1))").as("i"),
        col("tk"))
      .select(col("lang"), (col("i") + 1).as("rk"),
        (-element_at(col("tk"), (col("i") * 2 + 1).cast("int"))).as("key_x22"),
        element_at(col("tk"), (col("i") * 2 + 2).cast("int")).as("doc_id"))
    docs.select(col("doc_id"), col("w"), col("e_x20"))
      .join(broadcast(top), Seq("doc_id"))
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"),
        col("w"), col("e_x20"), col("key_x22"))
      .orderBy(col("lang"), col("rk"))
  }

  // ------------------------------------------- mixture apportionment resample

  /** q174 — exact-budget mixture resampling (Hamilton largest-remainder
    * apportionment): split a doc budget (half the corpus) across
    * languages proportionally, in EXACT integer arithmetic — floor
    * quotas first, then the leftover seats go to the largest remainders
    * (ties to the smaller lang) so the quotas sum to the budget EXACTLY;
    * then take each language's first `quota` docs by doc_id (consistent
    * selection — re-runs and incremental refreshes pick the same docs).
    * This is the sampling step a multilingual training mix actually
    * ships: float shares × budget under- or over-shoot by rounding,
    * while apportionment is the standard exact-total fix, and all-BIGINT
    * math means no engine ever disagrees by an ulp (the q74 lesson,
    * applied in design rather than repair).
    *
    * Scale: stats + apportionment live on the |langs|-row dimension
    * (global windows over THAT relation only — bounded by the language
    * inventory, never corpus rows); the corpus-side selection rank is
    * the two-level [[graft.plans.PrefixSum]] ordinal, and the quota
    * gate is a broadcast join. The `sel_id_sum` checksum pins the exact
    * selected SET, not just its size.
    */
  val q174 = oracled(
    "q174_mixture_apportionment",
    "largest-remainder per-lang doc quotas (exact integer budget) + consistent first-n selection",
    """WITH stats AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
       tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM stats),
       base AS (SELECT lang, n, (nn // 2) AS budget,
                 ((nn // 2) * n) // nn AS q0, ((nn // 2) * n) % nn AS rem
               FROM stats, tot),
       alloc AS (SELECT lang, n, budget, q0, rem,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk,
                 SUM(q0) OVER () AS q0_sum FROM base),
       fin AS (SELECT lang, n,
                 q0 + CASE WHEN rk <= budget - q0_sum THEN 1 ELSE 0 END AS quota
               FROM alloc),
       rn AS (SELECT lang, doc_id, length(text) AS chars,
              ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
              FROM documents)
       SELECT f.lang, CAST(f.n AS BIGINT) AS n_docs,
         CAST(f.quota AS BIGINT) AS quota,
         CAST(COUNT(r.doc_id) AS BIGINT) AS n_selected,
         CAST(COALESCE(SUM(r.doc_id), 0) AS BIGINT) AS sel_id_sum,
         CAST(COALESCE(SUM(r.chars), 0) AS BIGINT) AS sel_chars
       FROM fin f LEFT JOIN rn r ON r.lang = f.lang AND r.rn <= f.quota
       GROUP BY f.lang, f.n, f.quota ORDER BY f.lang""") { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), length(col("text")).as("chars"))
    val stats = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val base = stats.crossJoin(broadcast(stats.agg(sum(col("n")).as("nn"))))
      .select(col("lang"), col("n"), expr("nn div 2").as("budget"),
        expr("(nn div 2 * n) div nn").as("q0"),
        expr("(nn div 2 * n) % nn").as("rem"))
    // unpartitioned windows, but over the |langs|-row dimension relation
    // (the corpus never enters a global window here)
    val alloc = base
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("lang"))).cast("long"))
      .withColumn("q0_sum", sum(col("q0")).over(
        Window.orderBy(lit(1)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    val fin = alloc.select(col("lang"), col("n"),
      (col("q0") + when(col("rk") <= col("budget") - col("q0_sum"), 1L)
        .otherwise(0L)).as("quota"))
    val sel = graft.plans.PrefixSum
      .withRowNumber(docs, "rn", Seq("lang"), "doc_id")
      .join(broadcast(fin.select(col("lang"), col("quota"))), Seq("lang"))
      .filter(col("rn") <= col("quota"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_selected"), sum(col("doc_id")).as("sel_id_sum"),
        sum(col("chars")).as("sel_chars"))
    fin.join(sel, Seq("lang"), "left")
      .select(col("lang"), col("n").as("n_docs"), col("quota"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("sel_id_sum"), lit(0L)).as("sel_id_sum"),
        coalesce(col("sel_chars"), lit(0L)).as("sel_chars"))
      .orderBy(col("lang"))
  }

  /** q184 — deterministic negative sampling: for every user, the 3
    * un-interacted items a ranking-model trainer pairs against the
    * positives — selected by a reproducible hash order, not `rand()`
    * (resumable jobs and A/B-identical reruns need the SAME negatives
    * every time; the q72/q144 reproducibility discipline). Candidates
    * are the user × catalog grid minus the interaction set (one
    * LEFT ANTI join); ranking is a per-user window over at most
    * |catalog| rows — the catalog is the bounded dimension (10²-10⁶),
    * the user axis is the distributed one, so the window partitions by
    * the high-cardinality key and never exceeds catalog-sized state
    * per group. The hash is the q72 Knuth multiplicative scheme on
    * `user·100 + item`, computed in DECIMAL(38,0) so the multiply
    * stays total over the full BIGINT range (the ANSI-overflow trap),
    * while the oracle keeps the plain integer spelling.
    *
    * At 100 TB: the full user×catalog grid materialized here is sound
    * ONLY because the catalog is fixture-bounded (100 items); with an
    * unbounded catalog (10⁸ items) the grid is the scale-killer. The
    * scale-safe alternative — the same upgrade posture q51/q63 state
    * for their LSH/IVF paths — is HASHED CANDIDATE SAMPLING: per user,
    * probe k·c candidate items by a deterministic hash sequence
    * h(user, attempt) mod |catalog| (attempt = 0..k·c−1), anti-join
    * ONLY those candidates against the interaction set, and keep the
    * first k survivors in attempt order — O(users·k·c) rows instead of
    * O(users·|catalog|), same reproducibility (the hash is the random
    * order), with c chosen so P(k survivors) ≈ 1 given the user's
    * interaction density (c = 2 suffices below 50% density).
    */
  val q184 = oracled(
    "q184_negative_sampling",
    "3 deterministic hash-ranked negatives per user (grid anti-join, catalog-bounded window)",
    """WITH r AS (SELECT DISTINCT user_id, event_id % 100 AS item_id FROM events),
       items AS (SELECT DISTINCT item_id FROM r),
       grid AS (SELECT u.user_id, i.item_id
                FROM (SELECT DISTINCT user_id FROM r) u CROSS JOIN items i),
       neg AS (SELECT g.user_id, g.item_id FROM grid g
               WHERE NOT EXISTS (SELECT 1 FROM r
                 WHERE r.user_id = g.user_id AND r.item_id = g.item_id)),
       rk AS (SELECT user_id, item_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
             ((user_id * 100 + item_id) * 2654435761) % 4294967296,
             item_id) AS neg_rank
         FROM neg)
       SELECT user_id, item_id, CAST(neg_rank AS BIGINT) AS neg_rank
       FROM rk WHERE neg_rank <= 3 ORDER BY user_id, neg_rank""") { (s, dir) =>
    val r = Tables.events(s, dir)
      .select(col("user_id"), (col("event_id") % 100).as("item_id"))
      .distinct()
    val users = r.select(col("user_id")).distinct()
    val items = r.select(col("item_id")).distinct()
    val neg = users.crossJoin(broadcast(items))
      .join(r, Seq("user_id", "item_id"), "left_anti")
    val h = ((col("user_id") * 100 + col("item_id")).cast("decimal(38,0)")
      * lit(2654435761L)) % lit(4294967296L)
    val w = Window.partitionBy(col("user_id")).orderBy(h, col("item_id"))
    neg.withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= 3)
      .select(col("user_id"), col("item_id"), col("neg_rank"))
      .orderBy(col("user_id"), col("neg_rank"))
  }

  /** Temporal split point for the leakage-safe binning (q193): edges
    * fit strictly BEFORE it, applied strictly AT/AFTER it.
    */
  private val BinCutoff = "1997-01-01"

  /** q193 — leakage-safe feature binning (fit on train, apply on
    * held-out): quartile cutpoints of `o_totalprice` are fitted ONLY on
    * orders before [[BinCutoff]], then applied to the orders at/after
    * it — the fit/transform discipline that keeps a temporal holdout
    * honest (edges fitted on the full table leak future distribution
    * shift into the features; PipelineSpec proves the edges differ).
    * r10: the fit goes through the shared
    * [[graft.plans.ExactQuantile]] integer order-statistic template —
    * quartile edges in exact QUARTER-CENTS (×4), binning three exact
    * integer comparisons `4·cents < edge_x4` (the last engine-quantile
    * + double-comparison pair is gone; interpolation policy was the
    * rounds-6..8 red class). The fitted edges ride the plan as a 1-row
    * broadcast (the q101/q183 pattern — a transform artifact of
    * CONSTANT size regardless of corpus scale), and the per-bin mass
    * crosses the gate as an exact BIGINT cents sum (r9: the
    * DECIMAL(18,2) render was green through r8 but the probe bisection
    * made the no-decimal-output rule absolute — survivorship is not
    * license). One ordinal pass to fit, one partial-aggregated pass to
    * apply.
    */
  val q193 = oracled(
    "q193_leakage_safe_binning",
    "train-only quartile cutpoints applied to the temporal holdout, exact bin masses",
    s"""WITH qsrc AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
          FROM orders
          WHERE CAST(o_orderdate AS DATE) < DATE '$BinCutoff'),
        """ +
      graft.plans.ExactQuantile.oracleCtes("e", "qsrc", Seq.empty,
        Seq(graft.plans.ExactQuantile.Q("p25_x4", 1, 4),
          graft.plans.ExactQuantile.Q("p50_x4", 2, 4),
          graft.plans.ExactQuantile.Q("p75_x4", 3, 4))) +
      s""",
        te AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents FROM orders
          WHERE CAST(o_orderdate AS DATE) >= DATE '$BinCutoff')
        SELECT CAST(CASE WHEN 4 * cents < p25_x4 THEN 0
                         WHEN 4 * cents < p50_x4 THEN 1
                         WHEN 4 * cents < p75_x4 THEN 2 ELSE 3 END AS BIGINT) AS bin,
          CAST(COUNT(*) AS BIGINT) AS n_test,
          CAST(SUM(cents) AS BIGINT) AS test_mass_cents
        FROM te CROSS JOIN eq
        GROUP BY 1 ORDER BY bin""") { (s, dir) =>
    import graft.plans.ExactQuantile
    val o = Tables.orders(s, dir)
      .select(col("o_orderdate").cast("date").as("dt"),
        (dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    val edges = ExactQuantile.grouped(
        o.filter(col("dt") < lit(BinCutoff).cast("date"))
          .select(col("cents")),
        Seq.empty, "cents",
        Seq(ExactQuantile.Q("p25_x4", 1, 4), ExactQuantile.Q("p50_x4", 2, 4),
          ExactQuantile.Q("p75_x4", 3, 4)))
      .select(col("p25_x4"), col("p50_x4"), col("p75_x4"))
    val x4 = lit(4L) * col("cents")
    o.filter(col("dt") >= lit(BinCutoff).cast("date"))
      .crossJoin(broadcast(edges))
      .select(
        when(x4 < col("p25_x4"), 0L).when(x4 < col("p50_x4"), 1L)
          .when(x4 < col("p75_x4"), 2L).otherwise(3L).as("bin"),
        col("cents"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_test"),
        sum(col("cents")).as("test_mass_cents"))
      .orderBy(col("bin"))
  }

  /** q232 — per-source distribution drift in EXACT integer ppm: the
    * total-variation distance between each source's unigram
    * distribution and the corpus-wide one — the mixture-monitoring
    * number a data-mixing stage alarms on (KL needs logs and doubles;
    * TV = ½·Σ|p_s − p_g| is RATIONAL, so with the common denominator
    * N_s·N_g it is floor(10⁶·Σ_t |c_s(t)·N_g − c_g(t)·N_s| /
    * (2·N_s·N_g)) — every term an exact BIGINT product). Tokens a
    * source has never seen still contribute |0·N_g − c_g·N_s| mass,
    * which the LEFT join from the global vocabulary supplies as
    * COALESCE(c_s, 0). Shapes: one (source, token) count aggregate,
    * re-aggregated per token for the global side (q176's rollup
    * pattern), one join keyed on token, one per-source aggregate.
    * Magnitudes: c·N ≤ 3·10⁵·3·10⁶ ≈ 10¹² per term, far under BIGINT.
    */
  val q232 = oracled(
    "q232_source_distribution_drift",
    "per-source total-variation distance vs the corpus unigram distribution, exact ppm",
    """WITH t AS (SELECT source,
           unnest(string_split(trim(text), ' ')) AS tok
         FROM documents),
       st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
         FROM t GROUP BY 1, 2),
       g AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cg FROM st GROUP BY 1),
       ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM st
         GROUP BY 1),
       ng AS (SELECT CAST(SUM(cg) AS BIGINT) AS ntot FROM g),
       terms AS (SELECT s.source, ABS(COALESCE(x.c, 0) * ng.ntot
             - g.cg * s.n) AS d
         FROM ns s CROSS JOIN ng
         JOIN g ON TRUE
         LEFT JOIN st x ON x.source = s.source AND x.tok = g.tok)
       SELECT t.source, s.n AS n_tokens,
         CAST(SUM(t.d) * 1000000 // (2 * s.n * ng.ntot) AS BIGINT)
           AS tv_ppm
       FROM terms t JOIN ns s ON s.source = t.source CROSS JOIN ng
       GROUP BY t.source, s.n, ng.ntot
       ORDER BY t.source""") { (s, dir) =>
    val st = Tables.documents(s, dir)
      .select(col("source"),
        explode(split(trim(col("text")), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = st.groupBy(col("tok")).agg(sum(col("c")).as("cg"))
    val ns = st.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val ng = g.agg(sum(col("cg")).as("ntot"))
    // every (source, token-in-vocab) pair, unseen tokens at c = 0
    ns.crossJoin(broadcast(ng))
      .crossJoin(g) // the full (source × vocab) grid — 20 × |vocab| rows
      .join(st.withColumnRenamed("c", "cs"), Seq("source", "tok"), "left")
      .groupBy(col("source"), col("n"), col("ntot"))
      .agg(sum(abs(coalesce(col("cs"), lit(0L)) * col("ntot")
        - col("cg") * col("n"))).as("dsum"))
      .select(col("source"), col("n").as("n_tokens"),
        expr("dsum * 1000000 div (2 * n * ntot)").as("tv_ppm"))
      .orderBy(col("source"))
  }

  /** q244 — rank (quantile) normalization: each document's length
    * score mapped to its global percentile rank in integer basis
    * points — the monotone feature transform that makes heterogeneous
    * per-source score scales comparable before mixing. Ranks come from
    * the DISTRIBUTED ordinal (q12's [[graft.plans.Ordinal]] scale
    * path — per-partition index stitching, no single-task global
    * window); bps = (rank−1)·10⁴ div (N−1) is exact; the per-source
    * roll-up reports mean/min/max bps — a near-uniform mean per source
    * is the observable the transform exists to produce. Tie order
    * (score, doc_id) is total, so both engines rank identically.
    */
  val q244 = oracled(
    "q244_rank_normalization",
    "global percentile-rank bps via the distributed ordinal; per-source uniformity roll-up",
    """WITH r AS (SELECT source,
           row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
           COUNT(*) OVER () AS n
         FROM documents),
       b AS (SELECT source, (rk - 1) * 10000 // (n - 1) AS bps FROM r)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(bps) // COUNT(*) AS BIGINT) AS mean_bps,
         CAST(MIN(bps) AS BIGINT) AS min_bps,
         CAST(MAX(bps) AS BIGINT) AS max_bps
       FROM b GROUP BY source ORDER BY source""") { (s, dir) =>
    rankNormalization(Tables.documents(s, dir)
      .select(col("source"), col("n_chars"), col("doc_id")))
  }

  /** q244 core, factored for the hand-built-fixture spec: `docs` has
    * (source, n_chars, doc_id); global rank by (n_chars, doc_id) via
    * the distributed ordinal, bps = (rk−1)·10⁴ div (N−1), per-source
    * mean/min/max roll-up.
    */
  private[graft] def rankNormalization(docs: DataFrame): DataFrame = {
    val ranked = graft.plans.Ordinal.withGlobalOrdinal(
      docs, "rk", col("n_chars"), col("doc_id"))
    val n = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bps", expr("(rk - 1) * 10000 div (n - 1)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(bps) div count(1)").as("mean_bps"),
        min(col("bps")).as("min_bps"), max(col("bps")).as("max_bps"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------- DSIR data selection

  /** DSIR feature-hash dimension: 256 buckets is the bounded-broadcast
    * model size; collisions are the hashing trick's documented trade.
    * (Declared BEFORE q260 — its oracle SQL interpolates it at object
    * init, and a forward val reads as 0.)
    */
  private val DsirDim = 256L

  /** q260 — DSIR-style domain data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document by how much more likely its hashed-unigram
    * features are under a TARGET-domain bag-of-features model than
    * under the raw-corpus model — the importance weight that decides
    * which slices of a 100 TB crawl get upsampled into the training
    * mix. Target here: `lang = 'en'` (DSIR's original use was exactly
    * "select text that looks like the target language/domain").
    *
    * Model: features are [[graft.functions.RollingHash]] token hashes
    * mod [[DsirDim]] (q190's stateless hashing trick — no vocabulary,
    * no fit state, new shards stream through); each side is an add-one
    * smoothed unigram over the buckets, and the score is the exact-
    * integer log2 likelihood ratio in the shared
    * [[graft.functions.IntLog2]] x20 units (the q250 discipline):
    *   score_x20(d) = Σ_tok [L2(ct(h)+1) − L2(cr(h)+1)]
    *                + n_toks · (L2(Nr+B) − L2(Nt+B))
    * with ct/cr the target/raw bucket counts, Nt/Nr the totals, B the
    * dimension. All BIGINT — both engines evaluate the identical
    * formula, so the hash gate compares exactly (no float logprobs).
    *
    * Scale shape: ONE corpus token scan builds the bucket table
    * (conditional-sum aggregate → B rows, a bounded broadcast); totals
    * are a 1-row cross join; scoring is the token scan re-joined to the
    * broadcast bucket table and ONE per-doc partial aggregate. No
    * corpus-side shuffle beyond the per-doc groupBy; the model state is
    * O(B) regardless of corpus size — that statelessness is why the
    * hashing trick (not a vocabulary join) is the 100 TB shape.
    */
  val q260 = {
    import graft.functions.IntLog2
    import graft.functions.RollingHash.{duckSql => hashSql, rollingHash}
    oracled(
      "q260_dsir_selection",
      s"DSIR importance scores vs lang='en' target (hashed unigrams dim $DsirDim, exact-integer log2 ratio)",
      s"""WITH tok AS (
           SELECT doc_id, lang,
             (${hashSql("t.tok")}) % $DsirDim AS h
           FROM (SELECT doc_id, lang,
                   unnest(string_split(trim(text), ' ')) AS tok
                 FROM documents) t),
         bkt AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
           FROM tok GROUP BY h),
         tot AS (SELECT SUM(cr) + $DsirDim AS nr, SUM(ct) + $DsirDim AS nt
           FROM bkt),
         sc AS (SELECT tok.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_toks,
             CAST(SUM(${IntLog2.duckSql("(bkt.ct + 1)")}
                    - ${IntLog2.duckSql("(bkt.cr + 1)")}) AS BIGINT) AS sum_diff
           FROM tok JOIN bkt ON bkt.h = tok.h
           GROUP BY tok.doc_id)
         SELECT sc.doc_id, sc.n_toks,
           CAST(sc.sum_diff + sc.n_toks *
             (${IntLog2.duckSql("tot.nr")} - ${IntLog2.duckSql("tot.nt")})
             AS BIGINT) AS score_x20
         FROM sc, tot ORDER BY sc.doc_id""") { (s, dir) =>
      val tok = Dedup.tokenized(s, dir)
        .select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
        // rollingHash lands in [0, mod), so % == pmod here (q190)
        .select(col("doc_id"), col("lang"),
          (rollingHash(col("tok")) % DsirDim).as("h"))
      val bkt = tok.groupBy(col("h"))
        .agg(count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      val tot = bkt.agg((sum(col("cr")) + DsirDim).as("nr"),
        (sum(col("ct")) + DsirDim).as("nt"))
      tok.join(broadcast(bkt), Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"),
          sum(expr(s"${IntLog2.sparkSql("(ct + 1L)")}" +
            s" - ${IntLog2.sparkSql("(cr + 1L)")}")).as("sum_diff"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_toks"),
          expr(s"sum_diff + n_toks * (${IntLog2.sparkSql("nr")}" +
            s" - ${IntLog2.sparkSql("nt")})").as("score_x20"))
        .orderBy(col("doc_id"))
    }
  }

  /** q275 — RENDEZVOUS (highest-random-weight) SHARDING and the
    * minimal-reshuffle law, gated in data: every distributed store
    * that survives membership churn (cache rings, shard routers,
    * object placement) uses HRW or consistent hashing precisely
    * because removing a node moves ONLY that node's keys. Each key
    * scores every shard with the overflow-safe squared-mix family
    * w(k, n) = (((k mod 100003 + 1009n)² mod p) · 2654435761) mod p,
    * p = 1000000007 — the square breaks the affinity-in-k that made a
    * first-draft affine score argmax-constant (every key picked the
    * same shard: the n-increment was tiny vs p, so no wrap ever
    * reordered the ranking) — and lands on the argmax (ties by shard id — total order); the
    * query computes the assignment for the full 8-shard ring AND for
    * the ring with shard 3 removed, then ships the per-shard ledger:
    * keys before, keys after, keys gained, and gained_from_surviving —
    * the column the HRW law forces to be IDENTICALLY ZERO (a key's
    * ranking among surviving shards is unchanged by removing another
    * shard, so only shard 3's keys re-home). The argmax is one
    * K×8-row window (or a max(struct) aggregate at scale — no
    * all-pairs anything); both engines run the identical integer
    * scoring.
    */
  val q275 = oracled(
    "q275_rendezvous_sharding",
    "HRW shard assignment before/after node removal — gained_from_surviving gated zero",
    """WITH keys AS (SELECT DISTINCT user_id AS k FROM events),
       sc AS (SELECT k, n.i AS shard,
           ((k % 100003 + n.i * 1009) * (k % 100003 + n.i * 1009)
             % 1000000007) * 2654435761 % 1000000007 AS w
         FROM keys CROSS JOIN range(0, 8) n(i)),
       bef AS (SELECT k, shard FROM (
           SELECT k, shard, ROW_NUMBER() OVER (PARTITION BY k
             ORDER BY w DESC, shard) AS rn FROM sc) t WHERE rn = 1),
       aft AS (SELECT k, shard FROM (
           SELECT k, shard, ROW_NUMBER() OVER (PARTITION BY k
             ORDER BY w DESC, shard) AS rn FROM sc WHERE shard <> 3) t
         WHERE rn = 1),
       mv AS (SELECT b.k, b.shard AS sb, a.shard AS sa
         FROM bef b JOIN aft a ON a.k = b.k),
       ring AS (SELECT i AS shard FROM range(0, 8) t(i))
       SELECT ring.shard,
         CAST(COALESCE(SUM(CASE WHEN mv.sb = ring.shard THEN 1 END), 0)
           AS BIGINT) AS n_before,
         CAST(COALESCE(SUM(CASE WHEN mv.sa = ring.shard THEN 1 END), 0)
           AS BIGINT) AS n_after,
         CAST(COALESCE(SUM(CASE WHEN mv.sa = ring.shard
               AND mv.sb <> ring.shard THEN 1 END), 0) AS BIGINT) AS n_gained,
         CAST(COALESCE(SUM(CASE WHEN mv.sa = ring.shard
               AND mv.sb <> ring.shard AND mv.sb <> 3 THEN 1 END), 0)
           AS BIGINT) AS gained_from_surviving
       FROM ring LEFT JOIN mv ON mv.sb = ring.shard OR mv.sa = ring.shard
       GROUP BY ring.shard ORDER BY ring.shard""") { (s, dir) =>
    val keys = Tables.events(s, dir).select(col("user_id").as("k")).distinct()
    val sc = keys
      .withColumn("shard", explode(expr("sequence(0L, 7L)")))
      .withColumn("v", col("k") % 100003 + col("shard") * 1009)
      .withColumn("w",
        (col("v") * col("v") % 1000000007L) * 2654435761L % 1000000007L)
    def argmax(scored: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("w").desc, col("shard"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("k"), col("shard"))
    }
    val bef = argmax(sc).withColumnRenamed("shard", "sb")
    val aft = argmax(sc.filter(col("shard") =!= 3))
      .withColumnRenamed("shard", "sa")
    val mv = bef.join(aft, Seq("k"))
    val ring = s.range(0, 8).select(col("id").as("shard"))
    ring.join(mv,
        col("sb") === col("shard") || col("sa") === col("shard"), "left")
      .groupBy(col("shard"))
      .agg(
        coalesce(sum(when(col("sb") === col("shard"), 1L)), lit(0L))
          .as("n_before"),
        coalesce(sum(when(col("sa") === col("shard"), 1L)), lit(0L))
          .as("n_after"),
        coalesce(sum(when(col("sa") === col("shard") &&
          col("sb") =!= col("shard"), 1L)), lit(0L)).as("n_gained"),
        coalesce(sum(when(col("sa") === col("shard") &&
          col("sb") =!= col("shard") && col("sb") =!= 3, 1L)), lit(0L))
          .as("gained_from_surviving"))
      .orderBy(col("shard"))
  }

  /** q277 — K-ANONYMITY GENERALIZATION LATTICE (the release-governance
    * primitive behind every "is this table safe to publish"
    * assessment, Samarati/OLA form): three quasi-identifiers with
    * generalization ladders — balance bucket (1000-wide → 5000-wide →
    * suppressed), geography (nation → region → suppressed), segment
    * (value → suppressed) — span a 3×3×2 = 18-node lattice; for EVERY
    * node the ledger reports group count, k=5-violating groups and
    * rows, the minimum group size, and the sensitive-attribute
    * l-diversity failure count (groups whose members all share the
    * in-debt flag — k-anonymity without diversity still leaks). The
    * marked optimum is the MINIMAL generalization achieving zero
    * violations: lowest total height, ties by (bal, geo, seg) level —
    * the exact answer OLA binary-searches toward; full enumeration is
    * 18 grouping passes of one scan here (at 100 TB you prune the
    * lattice by the monotonicity the ledger itself exhibits:
    * violations are antitone in every level). All counts exact on
    * both engines; FLOOR(x / 1000.0) bucketing (not integer div —
    * DuckDB floors negative `//`, Spark `div` truncates; double FLOOR
    * agrees everywhere including negative balances). Group keys are
    * BIGINT with NULL as the suppression sentinel (both engines group
    * NULLs together) — no float→string formatting anywhere, so the
    * oracle carries zero engine-version string-format risk.
    */
  val q277 = oracled(
    "q277_k_anonymity_lattice",
    "full generalization lattice: k=5 violation ledger + l-diversity + minimal safe node",
    """WITH lat AS (SELECT a.i AS la, b.i AS lb, c.i AS lc
         FROM range(0, 3) a(i), range(0, 3) b(i), range(0, 2) c(i)),
       cust AS (SELECT c_custkey, c_acctbal, c_nationkey, c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS in_debt,
           n_regionkey
         FROM customer JOIN nation ON n_nationkey = c_nationkey),
       gen AS (SELECT l.la, l.lb, l.lc, c.c_custkey, c.in_debt,
           CASE l.la WHEN 0 THEN CAST(FLOOR(c.c_acctbal / 1000.0) AS BIGINT)
             WHEN 1 THEN CAST(FLOOR(c.c_acctbal / 5000.0) AS BIGINT)
             ELSE NULL END AS ga,
           CASE l.lb WHEN 0 THEN CAST(c.c_nationkey AS BIGINT)
             WHEN 1 THEN CAST(c.n_regionkey AS BIGINT)
             ELSE NULL END AS gb,
           CASE l.lc WHEN 0 THEN c.c_mktsegment ELSE NULL END AS gc
         FROM lat l CROSS JOIN cust c),
       grp AS (SELECT la, lb, lc, ga, gb, gc,
           COUNT(*) AS n, COUNT(DISTINCT in_debt) AS n_sens
         FROM gen GROUP BY 1, 2, 3, 4, 5, 6),
       node AS (SELECT la, lb, lc,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS viol_groups,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS viol_rows,
           CAST(MIN(n) AS BIGINT) AS min_gsize,
           CAST(SUM(CASE WHEN n_sens < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS ldiv_fail_groups
         FROM grp GROUP BY 1, 2, 3),
       opt AS (SELECT la, lb, lc FROM node WHERE viol_rows = 0
         ORDER BY la + lb + lc, la, lb, lc LIMIT 1)
       SELECT node.la, node.lb, node.lc, n_groups, viol_groups, viol_rows,
         min_gsize, ldiv_fail_groups,
         CAST(CASE WHEN opt.la IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS is_optimal
       FROM node LEFT JOIN opt
         ON opt.la = node.la AND opt.lb = node.lb AND opt.lc = node.lc
       ORDER BY node.la, node.lb, node.lc""") { (s, dir) =>
    val cust = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"),
        col("c_mktsegment"), col("n_regionkey"),
        when(col("c_acctbal") < 0, 1L).otherwise(0L).as("in_debt"))
    val lat = s.range(0, 3).select(col("id").as("la"))
      .crossJoin(s.range(0, 3).select(col("id").as("lb")))
      .crossJoin(s.range(0, 2).select(col("id").as("lc")))
    val gen = broadcast(lat).crossJoin(cust)
      .select(col("la"), col("lb"), col("lc"), col("in_debt"),
        when(col("la") === 0,
            floor(col("c_acctbal") / 1000.0).cast("long"))
          .when(col("la") === 1,
            floor(col("c_acctbal") / 5000.0).cast("long"))
          .otherwise(lit(null).cast("long")).as("ga"),
        when(col("lb") === 0, col("c_nationkey").cast("long"))
          .when(col("lb") === 1, col("n_regionkey").cast("long"))
          .otherwise(lit(null).cast("long")).as("gb"),
        when(col("lc") === 0, col("c_mktsegment"))
          .otherwise(lit(null).cast("string")).as("gc"))
    val node = gen
      .groupBy(col("la"), col("lb"), col("lc"), col("ga"), col("gb"),
        col("gc"))
      .agg(count(lit(1)).as("n"), countDistinct(col("in_debt")).as("n_sens"))
      .groupBy(col("la"), col("lb"), col("lc"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < 5, 1L).otherwise(0L)).as("viol_groups"),
        sum(when(col("n") < 5, col("n")).otherwise(0L)).as("viol_rows"),
        min(col("n")).as("min_gsize"),
        sum(when(col("n_sens") < 2, 1L).otherwise(0L))
          .as("ldiv_fail_groups"))
    val opt = node.filter(col("viol_rows") === 0)
      .orderBy(col("la") + col("lb") + col("lc"), col("la"), col("lb"),
        col("lc"))
      .limit(1).select(col("la"), col("lb"), col("lc"),
        lit(1L).as("is_optimal"))
    node.join(broadcast(opt), Seq("la", "lb", "lc"), "left")
      .withColumn("is_optimal", coalesce(col("is_optimal"), lit(0L)))
      .orderBy(col("la"), col("lb"), col("lc"))
  }

  // ------------------------------------------------ robots.txt gating

  /** Longest-prefix-match crawl verdict (Google robots.txt semantics):
    * per URL, among the host-group's rules whose `prefix` prefixes the
    * path, the winner is the LONGEST prefix; an allow/disallow tie at
    * equal length resolves to ALLOW; rule_id breaks any remaining tie
    * so the verdict is a pure function. One `min(struct(...))` partial
    * aggregate per URL — no window, no sort; candidate fan-out is
    * bounded by the per-host ruleset size. Factored so the spec can
    * drive hand rulesets through the exact production path.
    */
  private[graft] def robotsVerdict(docs: DataFrame, rules: DataFrame)
      : DataFrame =
    docs.join(broadcast(rules), col("grp") === col("rgrp")
        && col("path").startsWith(col("prefix")))
      .groupBy(col("doc_id"))
      .agg(min(struct((-length(col("prefix"))).as("nl"),
        (-col("allow")).as("na"), col("rule_id").as("rid"),
        col("prefix").as("p"), col("allow").as("a"))).as("w"))
      .select(col("doc_id"), col("w.rid").as("rule_id"),
        col("w.p").as("prefix"), col("w.a").as("allow"))

  /** q279 — robots.txt LONGEST-PREFIX-MATCH crawl filtering (the
    * web-corpus admission gate every crawl pipeline runs before a byte
    * of text is kept; RFC 9309 / Google semantics): synthetic URLs —
    * host = source, path = two segments derived from doc_id — are
    * matched against per-host-group rulesets; the most specific
    * (longest) matching prefix decides, an equal-length allow/disallow
    * tie resolves to allow (rules 5/6 engineer exactly that tie), and
    * host groups carry DIFFERENT rulesets (grp 1 disallows /data, grp
    * 0 doesn't) so the group join is load-bearing. Ledger: per winning
    * rule, verdict and matched-doc count.
    *
    * Scale shape: the ruleset side is a bounded broadcast (real corpora
    * have ~1 ruleset per host — a host-keyed equi-join whose fan-out is
    * the per-host rule count, never corpus×rules); the per-URL winner
    * is ONE `min(struct(-len, -allow, rid))` partial-aggregable
    * shuffle keyed by doc — the lexicographic struct min IS the
    * tie-broken argmax (the q263 discipline), so map-side combine
    * absorbs the rule fan-out before the exchange. The oracle spells
    * the same total order as a ROW_NUMBER window — two mechanisms, one
    * contract.
    */
  val q279 = oracled(
    "q279_robots_prefix_match",
    "robots.txt longest-prefix-match verdicts: per-rule matched-doc ledger",
    """WITH rules(rule_id, rgrp, prefix, allow) AS (VALUES
         (1, 0, '/', 1), (2, 0, '/private', 0),
         (3, 0, '/private/index', 1), (4, 0, '/api', 0),
         (5, 0, '/images', 0), (6, 0, '/images', 1),
         (11, 1, '/', 1), (12, 1, '/private', 0),
         (13, 1, '/api', 0), (14, 1, '/api/item', 1),
         (15, 1, '/data', 0)),
       docs AS (SELECT doc_id,
           CAST(substr(source, 4) AS BIGINT) % 2 AS grp,
           '/' || CASE doc_id % 5 WHEN 0 THEN 'public'
               WHEN 1 THEN 'private' WHEN 2 THEN 'api'
               WHEN 3 THEN 'images' ELSE 'data' END
             || '/' || CASE (doc_id // 5) % 4 WHEN 0 THEN 'page'
               WHEN 1 THEN 'item' WHEN 2 THEN 'asset'
               ELSE 'index' END AS path
         FROM documents),
       m AS (SELECT d.doc_id, r.rule_id, r.prefix, r.allow,
           ROW_NUMBER() OVER (PARTITION BY d.doc_id
             ORDER BY length(r.prefix) DESC, r.allow DESC, r.rule_id)
             AS rk
         FROM docs d JOIN rules r ON r.rgrp = d.grp
           AND d.path LIKE r.prefix || '%')
       SELECT CAST(rule_id AS BIGINT) AS rule_id, prefix,
         CAST(allow AS BIGINT) AS allow,
         CAST(COUNT(*) AS BIGINT) AS n_docs
       FROM m WHERE rk = 1 GROUP BY 1, 2, 3 ORDER BY rule_id""") {
    (s, dir) =>
    import s.implicits._
    val rules = Seq(
        (1L, 0L, "/", 1L), (2L, 0L, "/private", 0L),
        (3L, 0L, "/private/index", 1L), (4L, 0L, "/api", 0L),
        (5L, 0L, "/images", 0L), (6L, 0L, "/images", 1L),
        (11L, 1L, "/", 1L), (12L, 1L, "/private", 0L),
        (13L, 1L, "/api", 0L), (14L, 1L, "/api/item", 1L),
        (15L, 1L, "/data", 0L))
      .toDF("rule_id", "rgrp", "prefix", "allow")
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      (substring(col("source"), 4, 10).cast("long") % 2).as("grp"),
      concat(lit("/"),
        when(col("doc_id") % 5 === 0, "public")
          .when(col("doc_id") % 5 === 1, "private")
          .when(col("doc_id") % 5 === 2, "api")
          .when(col("doc_id") % 5 === 3, "images")
          .otherwise("data"),
        lit("/"),
        when(expr("doc_id div 5") % 4 === 0, "page")
          .when(expr("doc_id div 5") % 4 === 1, "item")
          .when(expr("doc_id div 5") % 4 === 2, "asset")
          .otherwise("index")).as("path"))
    robotsVerdict(docs, rules)
      .groupBy(col("rule_id"), col("prefix"), col("allow"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("rule_id"))
  }

  // ------------------------------------------------------ t-closeness

  /** q284 — T-CLOSENESS audit via exact-integer Earth Mover's Distance
    * (Li/Li/Venkatasubramanian, ICDE '07 — the release-governance
    * check one level past q277: k-anonymity bounds group SIZE,
    * l-diversity bounds sensitive-value VARIETY, t-closeness bounds
    * how far each group's sensitive DISTRIBUTION strays from the
    * global one, killing skew attacks the other two miss). Sensitive
    * attribute: the ordered balance tier LEAST(GREATEST(FLOOR(
    * acctbal/2000), −1), 4) — m = 6 ordered values. For an ordered
    * attribute the paper's distance is the normalized L1 of CDF
    * differences, EMD = (1/(m−1))·Σ_i |Σ_{j≤i}(p_j − q_j)|; with
    * class counts c_j (size n) and global counts g_j (size N) this is
    * kept as the ×(m−1)·n·N integer
    *   emd_num = Σ_i |Σ_{j≤i} (N·c_j − n·g_j)| ,
    * den = (m−1)·n·N — so the t = 0.2 gate is the pure integer test
    * emd_num ≤ n·N. Equivalence classes: (nation, segment). Every
    * intermediate is BIGINT (nN ≤ 2.25e10 at sf1; overflow at
    * N ≈ 1.4e9 customers — scaladoc-owned, flip to DECIMAL(38,0)
    * past it).
    *
    * Scale shape: TWO corpus groupBys (per-class-per-tier and global
    * per-tier, both partial-aggregated); the CDF walk runs on the
    * class×6-tier grid — QI-domain-bounded, never corpus rows — as a
    * 6-row window per class against broadcast tier/global dimensions.
    */
  val q284 = oracled(
    "q284_t_closeness",
    "t-closeness EMD ledger per (nation, segment) class: exact-integer CDF distance + t=0.2 gate",
    """WITH cust AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
           LEAST(GREATEST(CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT), -1),
             4) AS tier
         FROM customer),
       nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM cust),
       gt AS (SELECT tier, CAST(COUNT(*) AS BIGINT) AS g
         FROM cust GROUP BY tier),
       cls AS (SELECT nat, seg, CAST(COUNT(*) AS BIGINT) AS n
         FROM cust GROUP BY 1, 2),
       cellc AS (SELECT nat, seg, tier, CAST(COUNT(*) AS BIGINT) AS c
         FROM cust GROUP BY 1, 2, 3),
       tiers AS (SELECT CAST(i AS BIGINT) - 1 AS tier
         FROM range(0, 6) t(i)),
       grid AS (SELECT cl.nat, cl.seg, cl.n, t.tier,
           COALESCE(cc.c, 0) AS c, COALESCE(g.g, 0) AS g, nn.n_total
         FROM cls cl CROSS JOIN tiers t CROSS JOIN nn
         LEFT JOIN cellc cc ON cc.nat = cl.nat AND cc.seg = cl.seg
           AND cc.tier = t.tier
         LEFT JOIN gt g ON g.tier = t.tier),
       cum AS (SELECT nat, seg, n, n_total, tier,
           SUM(n_total * c - n * g) OVER (PARTITION BY nat, seg
             ORDER BY tier ROWS UNBOUNDED PRECEDING) AS cd
         FROM grid),
       emd AS (SELECT nat, seg, n, n_total,
           CAST(SUM(ABS(cd)) AS BIGINT) AS emd_num
         FROM cum GROUP BY 1, 2, 3, 4)
       SELECT CAST(nat AS BIGINT) AS nat, seg, n, emd_num,
         CAST(5 * n * n_total AS BIGINT) AS den,
         CAST(CASE WHEN emd_num <= n * n_total THEN 1 ELSE 0 END
           AS BIGINT) AS meets_t
       FROM emd ORDER BY nat, seg""") { (s, dir) =>
    val cust = Tables.customer(s, dir).select(
      col("c_nationkey").cast("long").as("nat"),
      col("c_mktsegment").as("seg"),
      least(greatest(floor(col("c_acctbal") / 2000.0).cast("long"),
        lit(-1L)), lit(4L)).as("tier"))
    val nn = cust.agg(count(lit(1)).as("n_total"))
    val gt = cust.groupBy(col("tier")).agg(count(lit(1)).as("g"))
    val cls = cust.groupBy(col("nat"), col("seg"))
      .agg(count(lit(1)).as("n"))
    val cellc = cust.groupBy(col("nat"), col("seg"), col("tier"))
      .agg(count(lit(1)).as("c"))
    val tiers = s.range(0, 6).select((col("id") - 1).as("tier"))
    val grid = cls.crossJoin(broadcast(tiers)).crossJoin(broadcast(nn))
      .join(cellc, Seq("nat", "seg", "tier"), "left")
      .join(broadcast(gt), Seq("tier"), "left")
      .select(col("nat"), col("seg"), col("n"), col("tier"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("g"), lit(0L)).as("g"), col("n_total"))
    val wCdf = Window.partitionBy(col("nat"), col("seg"))
      .orderBy(col("tier"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cd",
        sum(col("n_total") * col("c") - col("n") * col("g")).over(wCdf))
      .groupBy(col("nat"), col("seg"), col("n"), col("n_total"))
      .agg(sum(abs(col("cd"))).as("emd_num"))
      .select(col("nat"), col("seg"), col("n"), col("emd_num"),
        (lit(5L) * col("n") * col("n_total")).as("den"),
        when(col("emd_num") <= col("n") * col("n_total"), 1L)
          .otherwise(0L).as("meets_t"))
      .orderBy(col("nat"), col("seg"))
  }

  // ------------------------------------------ differential-privacy release

  /** q290 — DIFFERENTIALLY-PRIVATE count release via the GEOMETRIC
    * mechanism (Ghosh/Roughgarden/Sundararajan '09 — the discrete
    * Laplace, the integer-native DP primitive; the release step after
    * this file's q277/q284 anonymity audits): per-nation customer
    * counts are published as n + (G₁ − G₂) where G₁, G₂ are iid
    * Geometric(1/2) draws — the difference is EXACTLY two-sided
    * geometric with α = 1/2, i.e. ε = ln 2 per released cell
    * (sensitivity 1 for a count). The draws come from BIT RUNS of the
    * per-key hash: a Geometric(1/2) variable IS the trailing-ones
    * count of a uniform word (P(k) = 2^−(k+1)), read off with the
    * lowest-set-bit identity tz(v) = length(bin(v & −v)) − 1 applied
    * to h+1 — pure integer ops, NO IntLog2 chord error, the exact
    * distribution. G₁ uses the low half of the hash, G₂ the high half
    * (independent bits of one draw). Deterministic-seed caveat owned
    * here: a production release uses fresh physical randomness; the
    * fixture derives the draw from the key hash so both engines
    * release the IDENTICAL noisy ledger and the hash gate can certify
    * the MECHANISM's arithmetic — the q92/q96 dirty-fixture
    * discipline applied to noise. The noise is left unclamped and
    * G₁/G₂ are shown: the ledger is auditable, the distribution law
    * is the documented contract.
    *
    * Scale shape: one partial-aggregable groupBy(nation) for the true
    * counts; the noise is scan-local integer arithmetic on the
    * 25-row result. At 100 TB the released-cell count (and hence the
    * ε budget Σ ln 2) is the ledger's row count — visible by
    * construction.
    */
  val q290 = oracled(
    "q290_dp_geometric_release",
    "DP count release: exact two-sided-geometric noise from hash bit runs, per-nation ledger",
    """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nat,
           CAST(COUNT(*) AS BIGINT) AS true_n
         FROM customer GROUP BY 1),
       h AS (SELECT nat, true_n,
           (nat * 2654435761 + 12345) % 4294967296 AS hv
         FROM c),
       g AS (SELECT nat, true_n,
           length(bin((hv % 65536 + 1) & -(hv % 65536 + 1))) - 1 AS g1,
           length(bin((hv // 65536 + 1) & -(hv // 65536 + 1))) - 1 AS g2
         FROM h)
       SELECT nat, true_n, CAST(g1 AS BIGINT) AS g1,
         CAST(g2 AS BIGINT) AS g2,
         CAST(g1 - g2 AS BIGINT) AS noise,
         CAST(true_n + g1 - g2 AS BIGINT) AS noisy_n
       FROM g ORDER BY nat""") { (s, dir) =>
    val c = Tables.customer(s, dir)
      .groupBy(col("c_nationkey").cast("long").as("nat"))
      .agg(count(lit(1)).as("true_n"))
    val g = c
      .withColumn("hv",
        expr("(nat * 2654435761L + 12345L) % 4294967296L"))
      .withColumn("g1", expr(
        "length(bin((hv % 65536 + 1) & -(hv % 65536 + 1))) - 1"))
      .withColumn("g2", expr(
        "length(bin((hv div 65536 + 1) & -(hv div 65536 + 1))) - 1"))
    g.select(col("nat"), col("true_n"), col("g1").cast("long").as("g1"),
        col("g2").cast("long").as("g2"),
        (col("g1") - col("g2")).cast("long").as("noise"),
        (col("true_n") + col("g1") - col("g2")).cast("long")
          .as("noisy_n"))
      .orderBy(col("nat"))
  }

  // ------------------------------------------------ greedy set cover

  /** Rounds of the q299 greedy — fixed and unrolled in BOTH engines
    * (the LPA/HITS chain discipline: no convergence claim, the state
    * after exactly [[CoverRounds]] synchronous picks IS the answer).
    */
  private val CoverRounds = 8

  /** q299 — GREEDY SET COVER for coverage-driven data acquisition
    * (which sources should a corpus buy/crawl next to cover the most
    * uncovered content? — the classic (1−1/e) greedy, the selection
    * rule behind facility-location submodular data selection): each
    * source's content coverage is a 248-bucket SHINGLE-HASH BITMAP
    * over a 1-in-17 SAMPLED shingle space (hash % 4216 kept below
    * 248 — without the sampling every source saturates the bitmap and
    * the greedy is blind; with it each source covers a partial,
    * overlapping subset and the diminishing-returns curve is real)
    * (3-token windows hashed into 4×62-bit BIGINT words — the q265
    * bloom-word trick, so "new coverage" is bit_count(w & ~covered)
    * in pure integer ops and coverage in SKETCH space is what real
    * acquisition pipelines use); each of the 8 unrolled rounds picks
    * the source with the largest uncovered-bucket gain (ties to the
    * smallest source id), ORs it into the covered mask, and logs
    * (round, source, gain, covered-after) — the acquisition schedule
    * WITH its diminishing-returns curve, which is the submodularity
    * made visible.
    *
    * Scale shape: the corpus is touched ONCE (shingle explode → one
    * bit_or partial aggregate per source — source-count-sized
    * output); every greedy round is an argmax over the SOURCE table
    * against a broadcast 1-row mask — bounded work per round, ≤
    * [[CoverRounds]] rounds, the q263 loop discipline. The oracle
    * unrolls the identical picks as a plain CTE chain carrying the
    * chosen list.
    */
  val q299 = oracled(
    "q299_greedy_set_cover",
    "coverage-driven source acquisition: 8 greedy rounds over 248-bit shingle bitmaps",
    {
      def step(k: Int): String =
        s"""pick$k AS (SELECT s.source, s.w0, s.w1, s.w2, s.w3,
             CAST(bit_count(s.w0 & ~p.c0) AS BIGINT)
               + CAST(bit_count(s.w1 & ~p.c1) AS BIGINT)
               + CAST(bit_count(s.w2 & ~p.c2) AS BIGINT)
               + CAST(bit_count(s.w3 & ~p.c3) AS BIGINT) AS gain,
             p.c0 AS pc0, p.c1 AS pc1, p.c2 AS pc2, p.c3 AS pc3,
             p.chosen
           FROM src s, st${k - 1} p
           WHERE NOT list_contains(p.chosen, s.source)
           ORDER BY gain DESC, s.source LIMIT 1),
         st$k AS (SELECT pc0 | w0 AS c0, pc1 | w1 AS c1,
             pc2 | w2 AS c2, pc3 | w3 AS c3,
             list_append(chosen, source) AS chosen, source, gain,
             CAST(bit_count(pc0 | w0) AS BIGINT)
               + CAST(bit_count(pc1 | w1) AS BIGINT)
               + CAST(bit_count(pc2 | w2) AS BIGINT)
               + CAST(bit_count(pc3 | w3) AS BIGINT) AS covered
           FROM pick$k)"""
      s"""WITH t AS (SELECT source,
           string_split(trim(text), ' ') AS toks FROM documents),
         sh AS (SELECT DISTINCT source, b FROM (
             SELECT source,
               ${graft.functions.RollingHash.duckSql(
                 "array_to_string(toks[p:p+2], ' ')")} % 4216 AS b
             FROM (SELECT source, toks,
               unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS p
               FROM t)) WHERE b < 248),
         src AS (SELECT source,
             bit_or(CASE WHEN b // 62 = 0
               THEN CAST(1 AS BIGINT) << CAST(b % 62 AS INT)
               ELSE 0 END) AS w0,
             bit_or(CASE WHEN b // 62 = 1
               THEN CAST(1 AS BIGINT) << CAST(b % 62 AS INT)
               ELSE 0 END) AS w1,
             bit_or(CASE WHEN b // 62 = 2
               THEN CAST(1 AS BIGINT) << CAST(b % 62 AS INT)
               ELSE 0 END) AS w2,
             bit_or(CASE WHEN b // 62 = 3
               THEN CAST(1 AS BIGINT) << CAST(b % 62 AS INT)
               ELSE 0 END) AS w3
           FROM sh GROUP BY source),
         st0 AS (SELECT CAST(0 AS BIGINT) AS c0, CAST(0 AS BIGINT) AS c1,
           CAST(0 AS BIGINT) AS c2, CAST(0 AS BIGINT) AS c3,
           [''] AS chosen),
         ${(1 to CoverRounds).map(step).mkString(",\n")}
         ${(1 to CoverRounds).map(k =>
             s"""SELECT CAST($k AS BIGINT) AS rnd, source,
                CAST(gain AS BIGINT) AS gain_bits,
                CAST(covered AS BIGINT) AS covered_bits FROM st$k""")
           .mkString("\n UNION ALL\n")}
         ORDER BY rnd"""
    }) { (s, dir) =>
    import graft.functions.RollingHash.rollingHash
    val sh = Tables.documents(s, dir)
      .select(col("source"), split(trim(col("text")), " ").as("toks"))
      .select(col("source"), col("toks"),
        explode(sequence(lit(1),
          greatest(size(col("toks")) - 2, lit(1)))).as("p"))
      .select(col("source"),
        (rollingHash(array_join(slice(col("toks"), col("p"), lit(3)),
          " ")) % 4216).as("b"))
      .filter(col("b") < 248)
      .distinct()
    def word(j: Int) = bit_or(
      when(expr(s"b div 62") === j,
        expr("shiftleft(1L, cast(b % 62 as int))"))
        .otherwise(0L)).as(s"w$j")
    val src = sh.groupBy(col("source"))
      .agg(word(0), word(1), word(2), word(3))
      .localCheckpoint(false)
    var st = s.range(1).select(
      lit(0L).as("c0"), lit(0L).as("c1"), lit(0L).as("c2"),
      lit(0L).as("c3"), array(lit("")).as("chosen"))
    var out: DataFrame = null
    for (k <- 1 to CoverRounds) {
      val cand = src.crossJoin(broadcast(st))
        .filter(!array_contains(col("chosen"), col("source")))
        .withColumn("gain", expr(
          """bit_count(w0 & ~c0) + bit_count(w1 & ~c1)
             + bit_count(w2 & ~c2) + bit_count(w3 & ~c3)""")
          .cast("long"))
        .orderBy(col("gain").desc, col("source")).limit(1)
        .localCheckpoint(false)
      val emit = cand.select(lit(k.toLong).as("rnd"), col("source"),
        col("gain").as("gain_bits"),
        expr("""bit_count(c0 | w0) + bit_count(c1 | w1)
              + bit_count(c2 | w2) + bit_count(c3 | w3)""")
          .cast("long").as("covered_bits"))
      out = if (out == null) emit else out.union(emit)
      st = cand.select(expr("c0 | w0").as("c0"), expr("c1 | w1").as("c1"),
        expr("c2 | w2").as("c2"), expr("c3 | w3").as("c3"),
        array_union(col("chosen"), array(col("source"))).as("chosen"))
    }
    out.orderBy(col("rnd"))
  }

  /** q319 — DOMAIN-MIXING rebalance ledger (the data-mixture step
    * between curation and training: given a TARGET distribution over
    * domains, what per-domain sampling rate rebalances the corpus and
    * what token budget survives). Target here is uniform over (lang ×
    * source) domains — the declared policy, not an estimate; rates are
    * EXACT integer ppm: rate_ppm = (10⁶ · total_tokens) div (n_domains
    * · domain_tokens), capped at 10⁶ (downsample-only in one pass —
    * upsampling is the epoch scheduler's job, so the cap is reported
    * rather than silently exceeded: `capped` = 1 marks domains the
    * uniform target would have to upsample). kept_tokens = domain
    * tokens · min(rate, 10⁶) div 10⁶ — every column a BIGINT, the q212
    * floor-key discipline. Scale shape: one partial-agg groupBy(lang,
    * source) over the corpus, then arithmetic on the bounded domain
    * table against a 1-row broadcast total.
    */
  val q319 = oracled(
    "q319_domain_mixing",
    "uniform-target domain rebalance: exact ppm sampling rates + surviving token budget per (lang, source)",
    """WITH d AS (SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
         FROM documents GROUP BY 1, 2),
       t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS n_domains FROM d)
       SELECT d.lang, d.source, d.n_docs, d.n_tokens,
         (1000000 * d.n_tokens) // t.total AS share_ppm,
         CASE WHEN (1000000 * t.total) // (t.n_domains * d.n_tokens) > 1000000
           THEN 1000000
           ELSE (1000000 * t.total) // (t.n_domains * d.n_tokens) END AS rate_ppm,
         CASE WHEN (1000000 * t.total) // (t.n_domains * d.n_tokens) > 1000000
           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS capped,
         d.n_tokens * (CASE WHEN (1000000 * t.total) // (t.n_domains * d.n_tokens) > 1000000
           THEN 1000000
           ELSE (1000000 * t.total) // (t.n_domains * d.n_tokens) END) // 1000000
           AS kept_tokens
       FROM d CROSS JOIN t
       ORDER BY d.lang, d.source""") { (s, dir) =>
    val d = Tables.documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), " "))).as("n_tokens"))
    val t = d.agg(sum(col("n_tokens")).as("total"),
      count(lit(1)).as("n_domains"))
    val rawRate = expr("(1000000 * total) div (n_domains * n_tokens)")
    val rate = when(rawRate > 1000000L, lit(1000000L)).otherwise(rawRate)
    d.crossJoin(broadcast(t))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        expr("(1000000 * n_tokens) div total").as("share_ppm"),
        rate.as("rate_ppm"),
        when(rawRate > 1000000L, lit(1L)).otherwise(lit(0L)).as("capped"),
        expr(s"n_tokens * (CASE WHEN (1000000 * total) div (n_domains * n_tokens) > 1000000 THEN 1000000 ELSE (1000000 * total) div (n_domains * n_tokens) END) div 1000000")
          .as("kept_tokens"))
      .orderBy(col("lang"), col("source"))
  }

  /** q326 — PER-USER CONTRIBUTION CAPPING ledger (the DP-prep step q290's
    * geometric release assumes has already happened: a user's influence
    * on any released aggregate must be BOUNDED before noise calibration
    * means anything). Two bounds at once, per event_type: a RECORD cap
    * (each user's first 3 events of that type by (ts, event_id) — the
    * "contribution bounding" of DP-SQL systems) and a VALUE clip on the
    * kept records (cents clamped at 100.00). The ledger carries raw vs
    * kept counts and exact cent sums plus how many users were truncated
    * — the numbers a privacy review reads to pick the cap.
    *
    * Exactness: values go through the dec2×100 cents convention
    * (BIGINT everywhere); (ts, event_id) is a total order so "first 3"
    * is deterministic in both engines.
    *
    * Scale shape: ONE window pass partitioned by (user_id, event_type)
    * — the highest-cardinality key in the table, so tasks stay balanced
    * at any scale (no low-cardinality partition; the round-6 rule is
    * satisfied by construction) — then one partial-agg groupBy over
    * event_type. No join anywhere.
    */
  val q326 = oracled(
    "q326_contribution_capping",
    "DP-prep per-user record cap (first 3 by ts) + value clip: exact cents ledger per event type",
    """WITH e AS (SELECT event_type, user_id,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS rn
         FROM events)
       SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_raw,
         CAST(SUM(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(COUNT(DISTINCT CASE WHEN rn > 3 THEN user_id END)
           AS BIGINT) AS n_users_truncated,
         CAST(SUM(cents) AS BIGINT) AS sum_cents_raw,
         CAST(SUM(CASE WHEN rn <= 3 THEN cents ELSE 0 END) AS BIGINT)
           AS sum_cents_kept,
         CAST(SUM(CASE WHEN rn <= 3 THEN LEAST(cents, 10000) ELSE 0 END)
           AS BIGINT) AS sum_cents_clipped
       FROM e GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        (dec2(col("value")) * 100).cast("long").as("cents"),
        row_number().over(w).as("rn"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("rn") <= 3, 1L).otherwise(0L)).as("n_kept"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("rn") > 3, col("user_id")))
          .as("n_users_truncated"),
        sum(col("cents")).as("sum_cents_raw"),
        sum(when(col("rn") <= 3, col("cents")).otherwise(0L))
          .as("sum_cents_kept"),
        sum(when(col("rn") <= 3, least(col("cents"), lit(10000L)))
          .otherwise(0L)).as("sum_cents_clipped"))
      .orderBy(col("event_type"))
  }

  /** q329 — TEMPERATURE-SAMPLED domain mixture (α = 0.5): the mixing
    * policy multilingual/multi-source LM training actually uses — q319
    * rebalances to a UNIFORM target, but a uniform target starves head
    * domains and over-repeats tail ones, so practice samples
    * proportionally to n^α with α ∈ (0,1) (Lample & Conneau 2019's
    * exponent-smoothed rates). Ledger per (lang, source): token count,
    * w = ⌊√n_tokens⌋ (α = 0.5 as an EXACT integer — IEEE sqrt is
    * correctly rounded and n < 2⁵³ is exact in double, so both engines
    * floor the identical value), weight_ppm, tokens drawn at a budget
    * of half the corpus, and epochs_x1000 = how many passes over the
    * domain that draw implies (>1000 ⟹ the tail domain repeats — the
    * number an epoch scheduler reads).
    *
    * Scale shape: one partial-agg groupBy over the corpus; everything
    * after is arithmetic on the bounded domain table against a 1-row
    * broadcast total (the q319 shape).
    */
  val q329 = oracled(
    "q329_temperature_mixture",
    "alpha=0.5 temperature-sampled domain mixture: exact isqrt weights, ppm rates, implied epochs",
    """WITH d AS (SELECT lang, source,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
             AS n_tokens
         FROM documents GROUP BY 1, 2),
       w AS (SELECT lang, source, n_tokens,
           CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w
         FROM d),
       t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
           CAST(SUM(w) AS BIGINT) AS wsum FROM w)
       SELECT w.lang, w.source, w.n_tokens, w.w,
         (1000000 * w.w) // t.wsum AS weight_ppm,
         ((t.total // 2) * w.w) // t.wsum AS drawn_tokens,
         (1000 * (((t.total // 2) * w.w) // t.wsum)) // w.n_tokens
           AS epochs_x1000
       FROM w CROSS JOIN t
       ORDER BY w.lang, w.source""") { (s, dir) =>
    val d = Tables.documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(sum(size(split(trim(col("text")), " "))).as("n_tokens"))
    val w = d.withColumn("w",
      expr("CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)"))
    val t = w.agg(sum(col("n_tokens")).as("total"), sum(col("w")).as("wsum"))
    w.crossJoin(broadcast(t))
      .select(col("lang"), col("source"), col("n_tokens"), col("w"),
        expr("(1000000 * w) div wsum").as("weight_ppm"),
        expr("((total div 2) * w) div wsum").as("drawn_tokens"),
        expr("(1000 * (((total div 2) * w) div wsum)) div n_tokens")
          .as("epochs_x1000"))
      .orderBy(col("lang"), col("source"))
  }

  /** q332 — LEAVE-ONE-SOURCE-OUT impact ledger: for every source,
    * what dropping it would do to the corpus mixture — the question a
    * curation review asks before cutting a crawl ("which source moves
    * the corpus most?"). Two exact movement measures per source:
    * lang_shift_ppm = Σ_lang |ppm-share of lang without s − with s|
    * (L1 distance between the lang mixtures, each share floored to ppm
    * FIRST so every term is a small exact integer — no count×count
    * cross-products, which would overflow BIGINT at 10¹²-doc scale),
    * and len_shift_pm = |per-mille mean doc length without s − with s|
    * under the same floor-first discipline.
    *
    * Scale shape: one partial-agg groupBy(source, lang) builds the
    * bounded grid; per-lang and global totals broadcast; everything
    * after is arithmetic on |sources|×|langs| rows.
    *
    * Declared boundary: when a source is the corpus's ONLY source the
    * without-s mixture doesn't exist (nt − ns = 0), and both shift
    * columns are explicitly NULL — guarded identically on both sides
    * rather than left to engine-specific ÷0 behavior (Spark's non-ANSI
    * div yields NULL where DuckDB raises). PipelineSpec pins the
    * single-source case.
    */
  private[graft] def looImpact(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val g = docs
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .localCheckpoint(false)
    val l = g.groupBy(col("lang")).agg(sum(col("n")).as("nl"))
    val srcs = g.groupBy(col("source"))
      .agg(sum(col("n")).as("ns"), sum(col("chars")).as("cs"))
    val t = g.agg(sum(col("n")).as("nt"), sum(col("chars")).as("ct"))
    val sh = srcs.crossJoin(broadcast(l))
      .join(g, Seq("source", "lang"), "left")
      .crossJoin(broadcast(t))
      .select(col("source"),
        when(col("nt") === col("ns"), lit(null).cast("long"))
          .otherwise(
            abs(expr("(1000000 * (nl - COALESCE(n, 0))) div (nt - ns)")
              - expr("(1000000 * nl) div nt"))).as("d"))
      .groupBy(col("source")).agg(sum(col("d")).as("lang_shift_ppm"))
    srcs.join(sh, Seq("source")).crossJoin(broadcast(t))
      .select(col("source"), col("ns").as("n_docs"),
        col("cs").as("n_chars"), col("lang_shift_ppm"),
        when(col("nt") === col("ns"), lit(null).cast("long"))
          .otherwise(
            abs(expr("(1000 * (ct - cs)) div (nt - ns)")
              - expr("(1000 * ct) div nt"))).as("len_shift_pm"))
      .orderBy(col("source"))
  }

  val q332 = oracled(
    "q332_loo_source_impact",
    "leave-one-source-out mixture movement: exact floor-first ppm lang-shift + per-mille length-shift per source",
    """WITH g AS (SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars
         FROM documents GROUP BY 1, 2),
       l AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nl FROM g GROUP BY 1),
       s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns,
           CAST(SUM(chars) AS BIGINT) AS cs
         FROM g GROUP BY 1),
       t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
           CAST(SUM(chars) AS BIGINT) AS ct FROM g),
       sh AS (SELECT s.source, l.lang,
           CASE WHEN t.nt = s.ns THEN NULL ELSE
             ABS((1000000 * (l.nl - COALESCE(g.n, 0)))
                 // (t.nt - s.ns)
               - (1000000 * l.nl) // t.nt) END AS d
         FROM s CROSS JOIN l
         LEFT JOIN g ON g.source = s.source AND g.lang = l.lang
         CROSS JOIN t),
       ls AS (SELECT source, CAST(SUM(d) AS BIGINT) AS lang_shift_ppm
         FROM sh GROUP BY 1)
       SELECT s.source, s.ns AS n_docs, s.cs AS n_chars,
         ls.lang_shift_ppm,
         CASE WHEN t.nt = s.ns THEN NULL ELSE
           ABS((1000 * (t.ct - s.cs)) // (t.nt - s.ns)
             - (1000 * t.ct) // t.nt) END AS len_shift_pm
       FROM s JOIN ls ON ls.source = s.source CROSS JOIN t
       ORDER BY s.source""") { (sp, dir) =>
    looImpact(Tables.documents(sp, dir))
  }

  // ------------------------------------------- UniMax mixture allocation

  /** Epoch cap for [[q340]]: no (lang, source) bucket may be drawn more
    * than this many times over (the UniMax repeat budget).
    */
  private val UniMaxEpochs = 4L

  /** q340 — UNIMAX TOKEN-BUDGET ALLOCATION (Chung et al., "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining", ICLR 2023): distribute a training
    * budget T (here 2× the corpus) across (lang, source) buckets as
    * UNIFORMLY as possible subject to a per-bucket repeat cap of
    * [[UniMaxEpochs]] epochs — small buckets get their full cap, large
    * buckets split the remainder evenly. The integer WATERFILL solves
    * this exactly without iteration: sort buckets by capacity
    * c = cap·n_tokens ascending; bucket at rank i is CAPPED iff its
    * cap fits even when every later bucket takes the same amount —
    * c_i·(n−i+1) ≤ T − cumcap_{i−1} — a predicate that is monotone in
    * i, so the capped set is a prefix of length k* and every uncapped
    * bucket receives the identical floor share (T − S_{k*}) div
    * (n − k*). The ≤ n−k*−1 remainder tokens of the floor are
    * deliberately UNDISTRIBUTED (declared; a real sampler rounds at
    * the batch level anyway).
    *
    * Exactness envelope: c_i·(n−i+1) ≤ UniMaxEpochs·T_total·n_buckets
    * — Int64-safe to ~10¹⁴ corpus tokens at 10⁴ buckets.
    *
    * Scale shape: the corpus collapses to the (lang, source) grid in
    * one partial-agg groupBy; everything after — the sort, the
    * cumulative window, the k* reduction — runs on the bucket grid
    * (domain-bounded, corpus-size-independent), with the 1-row budget
    * and k* frames broadcast back.
    */
  val q340 = oracled(
    "q340_unimax_allocation",
    "UniMax epoch-capped token-budget waterfill over (lang, source) buckets: exact integer closed form",
    s"""WITH g AS (SELECT lang, source,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
             AS n_tokens
         FROM documents GROUP BY 1, 2),
       t AS (SELECT CAST(2 * SUM(n_tokens) AS BIGINT) AS budget,
           CAST(COUNT(*) AS BIGINT) AS n FROM g),
       r AS (SELECT lang, source, n_tokens,
           $UniMaxEpochs * n_tokens AS cap,
           CAST(ROW_NUMBER() OVER (ORDER BY $UniMaxEpochs * n_tokens,
             lang, source) AS BIGINT) AS i,
           CAST(SUM($UniMaxEpochs * n_tokens) OVER (ORDER BY
             $UniMaxEpochs * n_tokens, lang, source
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumcap
         FROM g),
       k AS (SELECT CAST(COALESCE(SUM(CASE WHEN
             r.cap * (t.n - r.i + 1) <= t.budget - (r.cumcap - r.cap)
             THEN 1 ELSE 0 END), 0) AS BIGINT) AS kstar
         FROM r CROSS JOIN t),
       s AS (SELECT CAST(COALESCE(MAX(CASE WHEN r.i = k.kstar
             THEN r.cumcap END), 0) AS BIGINT) AS capped_sum
         FROM r CROSS JOIN k),
       a AS (SELECT r.lang, r.source, r.n_tokens, r.cap,
           CASE WHEN r.i <= k.kstar THEN r.cap
             WHEN t.n = k.kstar THEN r.cap
             ELSE (t.budget - s.capped_sum) // (t.n - k.kstar) END
             AS alloc,
           CASE WHEN r.i <= k.kstar THEN 1 ELSE 0 END AS capped
         FROM r CROSS JOIN t CROSS JOIN k CROSS JOIN s)
       SELECT lang, source, n_tokens, cap AS cap_tokens,
         CAST(alloc AS BIGINT) AS alloc_tokens,
         (1000 * CAST(alloc AS BIGINT)) // n_tokens AS epochs_x1000,
         CAST(capped AS BIGINT) AS is_capped
       FROM a ORDER BY lang, source""") { (s, dir) =>
    val g = Tables.documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(sum(size(split(trim(col("text")), " "))).cast("long").as("n_tokens"))
    val t = g.agg((lit(2L) * sum(col("n_tokens"))).as("budget"),
      count(lit(1)).as("n"))
    // the waterfill runs on the bounded bucket grid: a single-partition
    // window over |lang × source| rows is the DECLARED domain-bounded
    // carve-out (the q329/q324 grid discipline), never corpus-sized
    val ord = Window.orderBy(col("cap"), col("lang"), col("source"))
    val r = g.withColumn("cap", lit(UniMaxEpochs) * col("n_tokens"))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("cumcap", sum(col("cap")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(false) // feeds k*, S, and the final ledger
    val k = r.crossJoin(broadcast(t))
      .agg(coalesce(sum(when(
          col("cap") * (col("n") - col("i") + 1)
            <= col("budget") - (col("cumcap") - col("cap")), 1L)
          .otherwise(0L)), lit(0L)).as("kstar"))
    val cs = r.crossJoin(broadcast(k))
      .agg(coalesce(max(when(col("i") === col("kstar"), col("cumcap"))),
        lit(0L)).as("capped_sum"))
    r.crossJoin(broadcast(t)).crossJoin(broadcast(k))
      .crossJoin(broadcast(cs))
      .withColumn("alloc",
        when(col("i") <= col("kstar"), col("cap"))
          .when(col("n") === col("kstar"), col("cap"))
          .otherwise(expr("(budget - capped_sum) div (n - kstar)")))
      .select(col("lang"), col("source"), col("n_tokens"),
        col("cap").as("cap_tokens"), col("alloc").as("alloc_tokens"),
        expr("(1000 * alloc) div n_tokens").as("epochs_x1000"),
        when(col("i") <= col("kstar"), 1L).otherwise(0L).as("is_capped"))
      .orderBy(col("lang"), col("source"))
  }

  // ------------------------------------------ containment decontamination

  /** q344 — CONTAINMENT-RANKED DECONTAMINATION: for every eval doc
    * (q99's deterministic doc_id % 7 = 0 slice), the single training
    * doc that CONTAINS most of it — containment C(e,t) = |S_e ∩ S_t|
    * / |S_e| over distinct 5-gram shingles, the DIRECTED overlap that
    * catches a benchmark quoted inside a larger page, which symmetric
    * Jaccard dilutes away (the q99 flag says "shares ≥1 shingle"; this
    * ranks HOW MUCH is leaked and names the leaking doc). Argmax is
    * deterministic: max shared count, ties to the smallest train
    * doc_id. Eval docs with no shared shingle have no row (q99 lists
    * the clean slice implicitly).
    *
    * Scale shape: q99's exact join geometry — the eval shingle set is
    * the bounded broadcast side, the corpus is scanned once — then one
    * partial-agg groupBy (eval, train) and a per-eval max(struct)
    * reduction (no window, no pair blow-up beyond the true overlap
    * rows the join already emits).
    */
  val q344 = oracled(
    "q344_containment_decontam",
    "per-eval-doc max-containment training doc: directed shingle overlap, deterministic argmax",
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
           FROM documents),
       sh AS (SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(toks) - 3),
             i -> array_to_string(toks[i:i+4], ' ')))) AS s
         FROM t),
       ev AS (SELECT doc_id, s FROM sh WHERE doc_id % 7 = 0),
       en AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
         FROM ev GROUP BY 1),
       tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 7 <> 0),
       ov AS (SELECT ev.doc_id AS eval_doc, tr.doc_id AS train_doc,
           CAST(COUNT(*) AS BIGINT) AS shared
         FROM ev JOIN tr ON tr.s = ev.s GROUP BY 1, 2),
       best AS (SELECT eval_doc, train_doc, shared,
           ROW_NUMBER() OVER (PARTITION BY eval_doc
             ORDER BY shared DESC, train_doc) AS rn
         FROM ov)
       SELECT b.eval_doc, en.n_shingles, b.train_doc AS best_train_doc,
         b.shared, (1000000 * b.shared) // en.n_shingles
           AS containment_ppm
       FROM best b JOIN en ON en.doc_id = b.eval_doc
       WHERE b.rn = 1 ORDER BY b.eval_doc""") { (s, dir) =>
    val shingle5 = when(size(col("toks")) >= 5,
      array_distinct(transform(sequence(lit(1), size(col("toks")) - 4),
        i => array_join(slice(col("toks"), i, lit(5)), " "))))
      .otherwise(array().cast("array<string>"))
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
      .select(col("doc_id"), explode(shingle5).as("s"))
      .localCheckpoint(false) // feeds the eval side twice and the train side
    val ev = sh.filter(col("doc_id") % 7 === 0)
      .withColumnRenamed("doc_id", "eval_doc")
    val en = ev.groupBy(col("eval_doc")).agg(count(lit(1)).as("n_shingles"))
    val ov = sh.filter(col("doc_id") % 7 =!= 0)
      .withColumnRenamed("doc_id", "train_doc")
      .join(broadcast(ev), Seq("s"))
      .groupBy(col("eval_doc"), col("train_doc"))
      .agg(count(lit(1)).as("shared"))
    // deterministic argmax without a window: max over (shared, -id)
    // orders ties to the SMALLEST train doc_id in one partial-agg pass
    ov.groupBy(col("eval_doc"))
      .agg(max(struct(col("shared"), (-col("train_doc")).as("neg_id")))
        .as("m"))
      .select(col("eval_doc"), (-col("m.neg_id")).as("best_train_doc"),
        col("m.shared").as("shared"))
      .join(broadcast(en), Seq("eval_doc"))
      .select(col("eval_doc"), col("n_shingles"), col("best_train_doc"),
        col("shared"),
        expr("(1000000 * shared) div n_shingles").as("containment_ppm"))
      .orderBy(col("eval_doc"))
  }

  // ------------------------------------------ source content overlap

  /** q348 — EXACT SOURCE-OVERLAP MATRIX: pairwise Jaccard between the
    * DISTINCT 5-gram shingle sets of every source pair, in ppm — the
    * content-level "how much of source A is also in source B", which
    * complements q320's near-dup PAIR counts (q320 counts whole-doc
    * near-copies; this measures shared text mass even where no doc
    * pair crosses the near-dup threshold — partial syndication,
    * shared boilerplate, quote farms). Pairs with zero shared
    * shingles have no row (declared).
    *
    * Scale shape: one distinct over (source, gram-hash) — postings
    * collapse to ≤ |sources| rows per gram — then a gram-keyed
    * self-join whose fan-out is bounded by |sources|² per gram
    * (sources are a bounded domain; the join is linear in postings
    * times a constant), and set sizes broadcast back. Grams travel as
    * the shared rolling hash on both sides (q328/q333/q343
    * discipline); the ppm scaling is DECIMAL(38,0)/HUGEINT-widened
    * (10⁶·|A∩B| wraps Int64 at ~9×10¹² shared shingles).
    */
  val q348 = oracled(
    "q348_source_overlap_matrix",
    "pairwise exact shingle-set Jaccard between sources, ppm: content overlap beyond near-dup pairs",
    s"""WITH t AS (SELECT source, string_split(trim(text), ' ') AS toks
           FROM documents),
       d AS (SELECT DISTINCT source,
           unnest(list_transform(
             list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
               i -> array_to_string(toks[i:i+4], ' ')),
             gs -> ${graft.functions.RollingHash.duckSql("gs", sfx = "g")}))
             AS g
         FROM t),
       sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
         FROM d GROUP BY 1),
       ov AS (SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM d a JOIN d b ON a.g = b.g AND a.source < b.source
         GROUP BY 1, 2)
       SELECT o.source_a, o.source_b, na.n AS n_a, nb.n AS n_b,
         o.n_shared,
         CAST((1000000 * CAST(o.n_shared AS HUGEINT))
           // (na.n + nb.n - o.n_shared) AS BIGINT) AS jaccard_ppm
       FROM ov o JOIN sz na ON na.source = o.source_a
       JOIN sz nb ON nb.source = o.source_b
       ORDER BY o.source_a, o.source_b""") { (s, dir) =>
    import graft.functions.RollingHash.rollingHash
    val d = Tables.documents(s, dir)
      .select(col("source"), split(trim(col("text")), " ").as("toks"))
      .select(col("source"),
        explode(when(size(col("toks")) >= 5,
            sequence(lit(1), size(col("toks")) - 4))
          .otherwise(array().cast("array<int>"))).as("i"),
        col("toks"))
      .select(col("source"),
        rollingHash(array_join(slice(col("toks"), col("i"), lit(5)), " "))
          .as("g"))
      .distinct()
      .localCheckpoint(false) // feeds sizes and both join sides
    val sz = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val ov = d.alias("a").join(d.alias("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    ov.join(broadcast(sz.select(col("source").as("source_a"), col("n").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(sz.select(col("source").as("source_b"), col("n").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        expr("""CAST((1000000 * CAST(n_shared AS DECIMAL(38,0)))
                div (n_a + n_b - n_shared) AS BIGINT)""").as("jaccard_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val all: Seq[GQuery] =
    Seq(q96, q97, q98, q99, q100, q101, q102, q103, q104, q107, q112, q113,
      q116, q120, q121, q122, q129, q137, q143, q144, q174, q184, q193,
      q212, q232, q244, q245, q260, q275, q277, q279, q284, q290, q299,
      q319, q326, q329, q332, q340, q344, q348)
}
