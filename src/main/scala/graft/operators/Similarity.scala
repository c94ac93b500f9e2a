package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GQuery
import graft.GQuery.{oracled, rowsOnly}
import graft.sources.Tables
import graft.functions.VecOps.{dotF, l2Norm}

/** Similarity search over the `embeddings` table (north-star set):
  * brute-force cosine as the verifiable baseline, sign-LSH bucketing as
  * the scale path.
  *
  * The DuckDB fold (`list_reduce`) and Spark's `aggregate()` HOF are
  * both sequential left folds, so cosine values match bit-for-bit and
  * threshold filters select identical row sets.
  */
object Similarity {

  /** DuckDB fragment: sequential-fold dot product of two list columns. */
  private[operators] def duckDot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, 65),
        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (u, v) -> u + v)"""

  private[operators] def duckCos(x: String, y: String): String =
    s"""(${duckDot(s"$x.embedding", s"$y.embedding")}
        / (sqrt(${duckDot(s"$x.embedding", s"$x.embedding")})
         * sqrt(${duckDot(s"$y.embedding", s"$y.embedding")})))"""

  /** Panel bound on q49's exact all-pairs track: the DETERMINISTIC
    * id-bounded subset (vec_id < 5000) the exact O(n²) recall oracle
    * runs over — one semantics at every scale, encoded identically in
    * the oracle SQL (the bounded-panel discipline of q64/q211/q316).
    * Covers every oracle fixture whole (2000 vectors at sf0.1, so the
    * driver gate sees the full corpus) and bounds the 10× bench
    * fixture's quadratic at 5000²/2 pairs. r13 ADVICE retired the old
    * data-dependent runtime gate here: one query name no longer serves
    * two relations, and no eager count() scan runs per invocation —
    * the full-corpus scale path is its own oracled query ([[q321]]).
    */
  private[graft] val CosinePanelVecs = 5000L

  /** q49 — embedding-cosine near-duplicate pairs (threshold 0.45),
    * EXACT all-pairs over the deterministic [[CosinePanelVecs]] panel:
    * q51/q315's recall oracle. The full-corpus 100 TB path is [[q321]]
    * (sign-LSH bucketed, same threshold, oracle-checked against the
    * same bucketed SQL).
    */
  val q49 = oracled(
    "q49_cosine_near_dup",
    "all-pairs cosine >= 0.45 near-duplicate detection (exact, deterministic vec_id<5000 panel)",
    s"""SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         ${duckCos("x", "y")} AS cos_sim
       FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
       WHERE x.vec_id < $CosinePanelVecs AND y.vec_id < $CosinePanelVecs
         AND ${duckCos("x", "y")} >= 0.45
       ORDER BY vec_a, vec_b""") { (s, dir) =>
    // norms are computed ONCE per vector before the join (panel rows),
    // not per pair; the pair side is a single codegen'd dot + divide.
    // Values are bit-identical to the per-pair oracle formula.
    val e = Tables.embeddings(s, dir)
      .filter(col("vec_id") < CosinePanelVecs)
      .select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"))
    val x = e.alias("x")
    val y = e.alias("y")
    x.join(y, col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        (dotF(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= 0.45)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** q321 — full-corpus embedding near-dup at the 100 TB scale shape:
    * sign-LSH bucket equi-join (q51's 8-plane bucketing) restricted to
    * same-bucket pairs, exact cosine ≥ 0.45 on the candidates. This is
    * the scale path the old q49 runtime gate used to switch to
    * silently; r13 ADVICE made it a FIRST-CLASS query with its own
    * bucketed oracle (the hyperplanes are rational literals, so DuckDB
    * reproduces the bucketing bit-for-bit — q51's proof). Candidate
    * mass is Σ_bucket |bucket|² — a plain equi-join shuffle keyed on
    * 256 buckets, no all-pairs anywhere; recall vs the exact relation
    * is measured on the q49 panel by PipelineSpec, not asserted here.
    */
  val q321 = oracled(
    "q321_cosine_lsh_neardup",
    "full-corpus sign-LSH bucketed cosine >= 0.45 near-dup pairs (the q49 scale path, oracle-checked)",
    s"""WITH b AS (
         SELECT vec_id, embedding,
           ${(0 until 8).map(duckBucketBit).mkString(" + ")} AS bucket
         FROM embeddings)
       SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         ${duckCos("x", "y")} AS cos_sim
       FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       WHERE ${duckCos("x", "y")} >= 0.45
       ORDER BY vec_a, vec_b""") { (s, dir) =>
    val b = withNorm(Tables.embeddings(s, dir))
      .withColumn("bucket", bucketCol)
    b.alias("x").join(b.alias("y"),
        col("x.bucket") === col("y.bucket")
          && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        (dotF(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= 0.45)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Embeddings with the L2 norm precomputed once per vector. */
  private[operators] def withNorm(e: org.apache.spark.sql.DataFrame) =
    e.select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))

  /** Score x-aliased queries against y-aliased candidates under an extra
    * join predicate: one codegen'd dot per pair, norms from the inputs.
    */
  private[operators] def cosineScored(
      q: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame,
      extraCond: Column): org.apache.spark.sql.DataFrame =
    q.alias("x").join(y.alias("y"),
        extraCond && col("y.vec_id") =!= col("x.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("vec_b"),
        (dotF(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))).as("cos_sim"))

  /** Per-query top-k of a (query_id, vec_b, cos_sim) relation. */
  private[operators] def topK(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_b"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy(col("query_id"), col("rn"))
  }

  /** q50 — brute-force top-k cosine neighbors for a bounded query set
    * (vec_id < 10): ranked window over the scored join. Ties broken on
    * vec_b for total determinism.
    */
  val q50 = oracled(
    "q50_cosine_topk",
    "top-5 cosine neighbors per query vector (brute force + window)",
    s"""SELECT * FROM (
         SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckCos("x", "y")} AS cos_sim,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
             ORDER BY ${duckCos("x", "y")} DESC, y.vec_id) AS rn
         FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id
         WHERE x.vec_id < 10) t
       WHERE rn <= 5
       ORDER BY query_id, rn""") { (s, dir) =>
    val e = withNorm(Tables.embeddings(s, dir))
    topK(cosineScored(e.filter(col("vec_id") < 10), e, lit(true)), 5)
  }

  /** Deterministic rational hyperplane for sign-LSH: plane j, dimension
    * d (1-based) ↦ ((j*53 + d*67) mod 19)/19 - 0.45 — pseudo-random in
    * [-0.45, 0.5), materialized as a literal array so the projection is
    * one codegen'd dot product per plane.
    */
  private def plane(j: Int): Column =
    typedLit(Seq.tabulate(64)(d => ((j * 53 + (d + 1) * 67) % 19) / 19.0 - 0.45))

  /** 8-plane sign-LSH bucket id over `embedding` — q51's candidate
    * scheme, shared by q49's gated scale path: bit j = sign of the dot
    * against deterministic [[plane]] j, 8 codegen'd dots per vector.
    */
  private def bucketCol: Column =
    (0 until 8).map { j =>
      when(dotF(col("embedding"), plane(j)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB fragment: sign bit of the dot against deterministic plane j,
    * weighted 2^j — the exact SQL twin of [[plane]] + the bucket fold in
    * q51 (same integer plane formula, same double math, same ascending
    * fold as [[duckDot]]).
    */
  private def duckBucketBit(j: Int): String =
    s"""(CASE WHEN list_reduce(list_transform(range(1, 65),
         i -> CAST(embedding[i] AS DOUBLE) * ((($j*53 + i*67) % 19)/19.0 - 0.45)),
         (u, v) -> u + v) > 0 THEN ${1L << j} ELSE 0 END)"""

  /** Queries annotated with their two lowest-|margin| planes (j1, j2)
    * — q315's flip selection (margin = raw plane dot; ties on plane
    * index), shared by q315's ledger, q51's serving policy and q269's
    * policy comparison.
    */
  private def withLowMarginFlips(q: DataFrame): DataFrame =
    q.withColumn("mj", array_sort(array((0 until 8).map(j =>
        struct(abs(dotF(col("embedding"), plane(j))).as("m"),
          lit(j).as("j"))): _*)))
      .withColumn("j1", col("mj").getItem(0).getField("j"))
      .withColumn("j2", col("mj").getItem(1).getField("j"))
      .drop("mj")

  /** Each query exploded into its 3 probe buckets: own bucket + the
    * two lowest-margin single-bit flips (Lv et al., VLDB 2007). The
    * three probe values are pairwise distinct, so a candidate (whose
    * bucket is ONE value) is seen through at most one probe — no
    * dedup step is needed downstream.
    */
  private def probesOf(q: DataFrame): DataFrame =
    withLowMarginFlips(q)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(array(col("bucket"),
          col("bucket").bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), j1)")),
          col("bucket").bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), j2)"))))
          .as("probe"))

  /** Shared oracle CTE text (requires a `b` CTE of bucketed vectors in
    * scope): the vec_id<10 query panel, its two lowest-margin planes,
    * and the 3-probe relation — q315's proven SQL, factored so q51's
    * adopted policy and q269's policy comparison run the IDENTICAL
    * probe derivation.
    */
  private def duckProbeCtes: String =
    s"""qs AS (SELECT vec_id, embedding, bucket FROM b WHERE vec_id < 10),
       md AS (
         ${(0 until 8).map(j =>
           s"SELECT vec_id, $j AS j, abs(${duckPlaneDot(j)}) AS m FROM qs")
           .mkString("\n         UNION ALL ")}),
       rk AS (SELECT vec_id, j,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY m, j) AS r
         FROM md),
       fl AS (SELECT vec_id,
           MAX(CASE WHEN r = 1 THEN j END) AS j1,
           MAX(CASE WHEN r = 2 THEN j END) AS j2
         FROM rk GROUP BY 1),
       pr AS (
         SELECT vec_id, bucket AS probe FROM qs
         UNION ALL
         SELECT q.vec_id, xor(q.bucket, CAST(1 << f.j1 AS BIGINT))
           FROM qs q JOIN fl f ON f.vec_id = q.vec_id
         UNION ALL
         SELECT q.vec_id, xor(q.bucket, CAST(1 << f.j2 AS BIGINT))
           FROM qs q JOIN fl f ON f.vec_id = q.vec_id)"""

  /** q51 — sign-LSH bucketed ANN (the 100 TB path): 8 deterministic
    * hyperplanes -> 8-bit bucket, candidates from the MULTI-PROBE
    * policy (own bucket + the 2 lowest-margin bit flips — adopted as
    * the serving policy in r14 per q315's measured ledger: recall@5
    * 2 → 6 of 50 at sf0.1 for two extra bucket lookups per query, and
    * q269 carries the per-query policy comparison permanently), top-5
    * by cosine within the probed buckets. The hyperplanes are rational
    * literals (not seeded randomness), so the WHOLE pipeline —
    * bucketing, margins, probes — is reproducible in ANSI SQL and the
    * query is fully oracle-checked; PipelineSpec additionally measures
    * recall against q50's exact top-k.
    */
  val q51 = oracled(
    "q51_ann_lsh_bucketed",
    "sign-LSH (8 hyperplanes) multi-probe (2 lowest-margin flips) approximate top-5 neighbors",
    s"""WITH b AS (
         SELECT vec_id, embedding,
           ${(0 until 8).map(duckBucketBit).mkString(" + ")} AS bucket
         FROM embeddings),
       $duckProbeCtes
       SELECT query_id, vec_b, cos_sim, rn FROM (
         SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckCos("x", "y")} AS cos_sim,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
             ORDER BY ${duckCos("x", "y")} DESC, y.vec_id) AS rn
         FROM pr p JOIN qs x ON x.vec_id = p.vec_id
         JOIN b y ON y.bucket = p.probe AND y.vec_id <> x.vec_id) t
       WHERE rn <= 5
       ORDER BY query_id, rn""") { (s, dir) =>
    val e = withNorm(Tables.embeddings(s, dir))
    val b = e.withColumn("bucket", bucketCol).localCheckpoint()
    topK(cosineScored(probesOf(b.filter(col("vec_id") < 10)), b,
      col("x.probe") === col("y.bucket")), 5)
  }

  /** q74 — per-label embedding centroids in long form (label, dim,
    * centroid): posexplode → one partial-aggregated groupBy(label, dim).
    * The long (label, dim) keyspace is what keeps this one flat shuffle
    * at 100 TB — no per-label vector state, no collect, and re-assembly
    * to ARRAY form is a downstream `collect_list` over at most rank
    * rows per label.
    *
    * Encoding: each float element is scaled to the INTEGER v·2^63 =
    * m·2^(e+63) — a float is exactly m·2^e (24-bit m), so power-of-two
    * scaling never rounds and the result is an exact integer whenever
    * e ≥ −63 (|v| ≳ 9e-13, the fixture domain; 0 maps to 0). That
    * integer can need 63 bits, and any single value > 2^53 would hit
    * the one remaining engine gap: Spark's double→decimal cast routes
    * through `Double.toString` (SHORTEST round-trip repr, ~17 digits),
    * which rounds a 19-digit integer, while DuckDB converts by value —
    * measured ±tens per group when tried. So the integer is SPLIT into
    * exact 32-bit halves, hi = ⌊v·2^31⌋ and lo = (v·2^31 − hi)·2^32,
    * each < 2^33 — every cast operand stays far below 2^53, where both
    * engines' double→integer conversions are value-exact. The
    * subtraction is exact (both operands exact, difference
    * representable) and both scalings are powers of two. No decimal
    * rounding mode, no float formatting, no >2^53 conversion anywhere.
    * History: double→DECIMAL(18,9) hit a half-even-vs-half-up tie at
    * sf0.1 (dyadic 0.1494140625); round 6's float→VARCHAR→DECIMAL was
    * DuckDB-version-fragile (assumes shortest-round-trip printing);
    * round 8's DECIMAL(38,0) sums were arithmetically exact but the r8
    * probe bisection (data-free constant-decimal probe RED, every
    * integer probe GREEN) convicted the driver's decimal OUTPUT path —
    * so the gate columns are now plain BIGINT: per-row halves < 2^33
    * sum to < 2^53 even at millions of rows per (label, dim) group, and
    * DuckDB's HUGEINT sum is cast back to BIGINT on the oracle side.
    * The output IS the mergeable mean state (Σhi, Σlo, n) — the form a
    * distributed mean actually shuffles and merges; the caller's one
    * division is `(sum_hi·2^32 + sum_lo) / n / 2^63`.
    */
  val q74 = oracled(
    "q74_embedding_centroids",
    "per-label centroid of 64-dim embeddings as the exact mergeable mean state (mantissa-scaled split sums, n)",
    """SELECT label, dim,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(d31) AS BIGINT)) AS BIGINT)
           AS centroid_sum_hi,
         CAST(SUM(CAST((d31 - FLOOR(d31)) * 4294967296 AS BIGINT)) AS BIGINT)
           AS centroid_sum_lo
       FROM (SELECT label, CAST(t.i AS INT) AS dim,
               CAST(embedding[CAST(t.i + 1 AS INT)] AS DOUBLE) * 2147483648 AS d31
             FROM embeddings CROSS JOIN range(0, 64) t(i))
       GROUP BY label, dim
       ORDER BY label, dim""") { (s, dir) =>
    val d31 = col("v").cast("double") * lit(2147483648.0) // v·2^31, exact
    val hi = floor(d31)                                   // exact integral, LONG
    val lo = ((d31 - hi.cast("double")) * lit(4294967296.0)).cast("long")
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(hi).as("centroid_sum_hi"),
        sum(lo).as("centroid_sum_lo"))
      .orderBy(col("label"), col("dim"))
  }

  /** Deterministic rational centroid c (0-based), dimension d (1-based):
    * ((c*31 + d*47) mod 23)/23 - 0.5 — pseudo-random in [-0.5, 0.46).
    * Like q51's hyperplanes these are literals, not seeded randomness,
    * so the cluster assignment is reproducible in ANSI SQL.
    */
  private def centroidVals(c: Int): Seq[Double] =
    Seq.tabulate(64)(d => ((c * 31 + (d + 1) * 47) % 23) / 23.0 - 0.5)

  /** L2 norm of centroid c, folded left-to-right in Scala doubles — the
    * SAME constant is inlined into the Spark plan and the oracle SQL
    * (via round-tripping Double.toString), so both engines divide by a
    * bit-identical operand.
    */
  private def centroidNorm(c: Int): Double =
    math.sqrt(centroidVals(c).foldLeft(0.0)((acc, v) => acc + v * v))

  /** DuckDB fragment: cosine of `embedding` against centroid c (fold dot
    * over the same rationals, divided by the inlined norm constant).
    * The row vector's own norm is a common positive factor across all 8
    * centroids, so it cannot change the argmax and both engines omit it.
    */
  private def duckCentroidSim(c: Int): String =
    s"""(list_reduce(list_transform(range(1, 65),
         i -> CAST(embedding[i] AS DOUBLE) * ((($c*31 + i*47) % 23)/23.0 - 0.5)),
         (u, v) -> u + v) / ${java.lang.Double.toString(centroidNorm(c))})"""

  /** q150 — SemDeDup-style semantic dedup (Abbas et al. 2023): assign
    * every embedding to its nearest of 8 deterministic centroids (pure
    * map-side — the centroids are broadcast literals, no shuffle), then
    * search near-duplicates ONLY within a cluster via an equi-join on
    * the cluster id. That equi-join is the whole 100 TB story: candidate
    * pairs are bounded by cluster size instead of N², and k scales with
    * the corpus so clusters stay small. Dedup rule (deterministic,
    * first-writer-wins by id, the same store semantics as q149): a
    * vector is dropped iff a strictly-lower-id near-duplicate
    * (cos >= 0.40) exists in its cluster — which leaves the kept set
    * pairwise non-near-dup within every cluster (SimilaritySemanticsSpec
    * proves both invariants). Ties in the argmax break to the first
    * (lowest) centroid index in both engines.
    */
  val q150 = oracled(
    "q150_semantic_dedup",
    "SemDeDup: nearest-centroid clusters, within-cluster near-dup drop",
    s"""WITH a AS (
         SELECT vec_id, embedding,
           CAST(list_position(s.sims, list_max(s.sims)) AS INT) - 1 AS cluster
         FROM (SELECT vec_id, embedding,
             [${(0 until 8).map(duckCentroidSim).mkString(", ")}] AS sims
           FROM embeddings) s),
       d AS (
         SELECT DISTINCT y.vec_id AS vec_id
         FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         WHERE ${duckCos("x", "y")} >= 0.40)
       SELECT a.vec_id, a.cluster,
         (d.vec_id IS NOT NULL) AS dropped
       FROM a LEFT JOIN d ON a.vec_id = d.vec_id
       ORDER BY a.vec_id""") { (s, dir) =>
    val assigned = clusteredEmbeddings(s, dir)
    val x = assigned.alias("x")
    val y = assigned.alias("y")
    val droppedIds = x.join(y,
        col("x.cluster") === col("y.cluster")
          && col("x.vec_id") < col("y.vec_id"))
      .filter((dotF(col("x.embedding"), col("y.embedding"))
        / (col("x.nrm") * col("y.nrm"))) >= 0.40)
      .select(col("y.vec_id").as("vec_id")).distinct()
      .withColumn("dropped", lit(true))
    assigned.select(col("vec_id"), col("cluster"))
      .join(droppedIds, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dropped"), lit(false)).as("dropped"))
      .orderBy(col("vec_id"))
  }

  /** Embeddings with (nrm, cluster): cosine against each of the 8
    * centroid literals (8 codegen'd dots, map-side), cluster = first
    * index of the max. Factored out so SimilaritySemanticsSpec can reuse
    * the exact assignment q150 ships.
    */
  private[graft] def clusteredEmbeddings(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val sims = array((0 until 8).map { c =>
      dotF(col("embedding"), typedLit(centroidVals(c))) / lit(centroidNorm(c))
    }: _*)
    withNorm(Tables.embeddings(s, dir))
      .withColumn("cluster",
        (array_position(sims, array_max(sims)) - 1).cast("int"))
  }

  /** splitmix64 finalizer — the standard public-domain 64-bit mixer
    * (Steele/Lea/Flood, JDK SplittableRandom). Used ONLY at
    * query-construction time to stamp the ±1 literals of q201's
    * projection matrix; neither engine executes it. A mixer of this
    * strength is necessary, not a flourish: any sign rule LINEAR in
    * (r, d) — `(a·r + b·d) mod m`, multiplicative hashes included —
    * makes every matrix row a shifted copy of one base sequence, and
    * the measured cosine distortion then stops improving as dims are
    * added (0.40 mean abs err at BOTH 16 and 32 dims on the fixture);
    * splitmix signs reproduce true-random quality (0.153 at 16, 0.085
    * at 32 — the 1/√k law JL promises).
    */
  private def splitmix(v0: Long): Long = {
    var v = v0 * 0x9E3779B97F4A7C15L
    v ^= (v >>> 30); v *= 0xBF58476D1CE4E5B9L
    v ^= (v >>> 27); v *= 0x94D049BB133111EBL
    v ^ (v >>> 31)
  }

  /** ±1 sign row r (1-based) of the JL projection matrix: bit 40 of
    * splitmix64(r·64 + d) over dimensions d = 1..64.
    */
  private[graft] def projSignRow(r: Int): Seq[Double] =
    Seq.tabulate(64) { d0 =>
      if ((splitmix(r.toLong * 64 + d0 + 1) & (1L << 40)) != 0L) 1.0 else -1.0
    }

  private val ProjDims = 16

  /** DuckDB fragment: compressed coordinate r — the same ascending fold
    * over the SAME ±1 literal row the Spark side dots against (both
    * sides stamp [[projSignRow]]'s constants; no hash evaluated by
    * either engine — the DcgWeights/q198 literal-constant discipline).
    */
  private def duckProj(r: Int): String = {
    val row = projSignRow(r).map(v => if (v > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]")
    s"""list_reduce(list_transform(range(1, 65),
        i -> CAST(embedding[i] AS DOUBLE) * ($row)[i]),
        (u, v) -> u + v)"""
  }

  /** DuckDB fragment: cosine between two [[ProjDims]]-dim compressed
    * vectors (columns `$x.cemb`, `$y.cemb`) — same fold/sqrt/divide
    * shape as [[duckCos]] so doubles stay bit-identical to Spark's.
    */
  private def duckCosC(x: String, y: String): String = {
    def d(a: String, b: String) =
      s"""list_reduce(list_transform(range(1, ${ProjDims + 1}),
          i -> $a.cemb[i] * $b.cemb[i]), (u, v) -> u + v)"""
    s"""(${d(x, y)} / (sqrt(${d(x, x)}) * sqrt(${d(y, y)})))"""
  }

  /** Project embeddings to [[ProjDims]] (or `k`) dims: one codegen'd dot
    * per output coordinate against a literal ±1 row — a pure map-side
    * pass, no shuffle, no training. Output: (vec_id, cemb, cnrm).
    */
  private[graft] def jlProject(e: DataFrame, k: Int = ProjDims): DataFrame = {
    val cemb = array((1 to k).map { r =>
      dotF(col("embedding"), typedLit(projSignRow(r)))
    }: _*)
    e.select(col("vec_id"), col("embedding"), cemb.as("cemb"))
      .withColumn("cnrm", l2Norm(col("cemb")))
  }

  /** q201 — random-projection (Johnson-Lindenstrauss) compression with
    * its distortion measured as the oracle-checked contract. The missing
    * rung of the ANN ladder: sign-LSH (q51) keeps 1 BIT per plane and
    * can only equi-join buckets; PQ (q108) needs a trained codebook; JL
    * keeps [[ProjDims]] doubles from a LITERAL ±1 matrix — one map-side
    * codegen'd pass (16 dots/row, no shuffle, no training), after which
    * every pairwise stage moves 4× less data. Because projection,
    * cosine, and the error quantization are all deterministic, the
    * QUALITY of the approximation is a hash-checkable fact (the
    * q51/q63/q108 discipline): over all pairs of a bounded query sample
    * (vec_id < 64), per-pair |cos16 − cos64| is floored to exact ppm
    * BIGINTs (floor of bit-identical doubles — no rounding-mode or
    * summation-order hazard) and aggregated into mean/max/tail-count.
    * The 1/√k law this certifies is measured in SimilaritySpec (err@32
    * < err@16); the fixture's 0.15 mean distortion at 16 dims matches
    * true-random ±1 quality.
    */
  val q201 = oracled(
    "q201_random_projection",
    "JL ±1 sign projection 64→16; exact ppm cosine-distortion contract over a bounded pair sample",
    s"""WITH p AS (
         SELECT vec_id, embedding,
           [${(1 to ProjDims).map(duckProj).mkString(",\n             ")}] AS cemb
         FROM embeddings WHERE vec_id < 64),
       pairs AS (
         SELECT x.vec_id AS a, y.vec_id AS b,
           CAST(FLOOR(ABS(${duckCosC("x", "y")} - ${duckCos("x", "y")})
             * 1000000) AS BIGINT) AS err_ppm
         FROM p x JOIN p y ON x.vec_id < y.vec_id)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(err_ppm) AS BIGINT) AS sum_err_ppm,
         CAST(MAX(err_ppm) AS BIGINT) AS max_err_ppm,
         CAST(SUM(CASE WHEN err_ppm > 250000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tail,
         CAST(SUM(err_ppm) AS DOUBLE) / CAST(1000000 * COUNT(*) AS DOUBLE)
           AS mean_abs_err
       FROM pairs""") { (s, dir) =>
    val p = jlProject(Tables.embeddings(s, dir).filter(col("vec_id") < 64))
      .withColumn("nrm", l2Norm(col("embedding")))
    val x = p.alias("x")
    val y = p.alias("y")
    x.join(y, col("x.vec_id") < col("y.vec_id"))
      .select(
        floor(abs(
          dotF(col("x.cemb"), col("y.cemb")) / (col("x.cnrm") * col("y.cnrm"))
            - dotF(col("x.embedding"), col("y.embedding"))
              / (col("x.nrm") * col("y.nrm")))
          * 1000000).cast("long").as("err_ppm"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("err_ppm")).as("sum_err_ppm"),
        max(col("err_ppm")).as("max_err_ppm"),
        sum(when(col("err_ppm") > 250000L, 1L).otherwise(0L)).as("n_tail"),
        (sum(col("err_ppm")).cast("double")
          / (lit(1000000L) * count(lit(1))).cast("double")).as("mean_abs_err"))
  }

  /** q209 — maximum-inner-product search (MIPS) via the norm-
    * augmentation reduction (Bachrach et al. 2014 / Shrivastava &
    * Li 2014): inner product is NOT a metric (no triangle inequality,
    * a vector can be its own worst neighbor), so cosine/Euclidean ANN
    * infrastructure cannot serve `argmax_x q·x` directly — the serving
    * problem every recommender hits (q38's top-k IS a MIPS). The
    * reduction appends one dimension carrying √(M²−|x|²) to each
    * catalog vector (M = max catalog norm) and 0 to queries: augmented
    * catalog vectors all have norm exactly M, so augmented COSINE
    * ordering equals raw INNER-PRODUCT ordering — and the whole
    * sign-LSH bucket machinery of q51 applies to augmented vectors
    * unchanged (the scale path; composition documented, recall bounded
    * by the same spec discipline). The gate runs BOTH paths: the
    * brute-force dot ranking and the augmented-cosine ranking, and the
    * `agrees_with_brute` contract column (oracle: literal TRUE over its
    * own brute ranking) proves the reduction exact on every row at
    * every scale — ties broken by vec_id identically on both paths.
    * The augmented norm rides as the CONSTANT M (mathematically exact
    * by construction), not a per-vector recomputed √(Σx²+(M²−Σx²)),
    * which would reintroduce per-vector ulp noise into the ordering.
    */
  val q209 = oracled(
    "q209_mips_norm_reduction",
    "MIPS top-3 via norm augmentation == brute-force inner product (exact reduction contract)",
    s"""SELECT * FROM (
         SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckDot("x.embedding", "y.embedding")} AS dot,
           TRUE AS agrees_with_brute,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
             ORDER BY ${duckDot("x.embedding", "y.embedding")} DESC, y.vec_id)
             AS rn
         FROM embeddings x JOIN embeddings y ON y.vec_id >= 5
         WHERE x.vec_id < 5) t
       WHERE rn <= 3
       ORDER BY query_id, rn""") { (s, dir) =>
    val e = withNorm(Tables.embeddings(s, dir))
    val queries = e.filter(col("vec_id") < 5)
    val catalog = e.filter(col("vec_id") >= 5)
    val m = catalog.agg(max(col("nrm")).as("m"))
    // brute path: raw inner product, tie-broken on vec_id
    val wd = Window.partitionBy(col("query_id"))
      .orderBy(col("dot_raw").desc, col("vec_b"))
    val brute = queries.alias("x").join(catalog.alias("y"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("vec_b"),
        dotF(col("x.embedding"), col("y.embedding")).as("dot_raw"))
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") <= 3)
    // reduction path: augmented vectors (catalog +√(M²−|x|²), query +0),
    // augmented catalog norm = the constant M; rank by augmented cosine
    val wc = Window.partitionBy(col("aq"))
      .orderBy(col("cos_aug").desc, col("ab"))
    val reduced = queries.alias("x").join(catalog.alias("y")).crossJoin(broadcast(m))
      .select(col("x.vec_id").as("aq"), col("y.vec_id").as("ab"),
        (dotF(
          concat(col("x.embedding"), array(lit(0.0f))),
          concat(col("y.embedding"),
            array(sqrt(col("m") * col("m") - col("y.nrm") * col("y.nrm"))
              .cast("float"))))
          / (col("x.nrm") * col("m"))).as("cos_aug"))
      .withColumn("arn", row_number().over(wc))
      .filter(col("arn") <= 3)
    brute.join(reduced,
        col("query_id") === col("aq") && col("rn") === col("arn"))
      .select(col("query_id"), col("vec_b"),
        col("dot_raw").as("dot"),
        (col("vec_b") === col("ab")).as("agrees_with_brute"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** q231 — exact Gram matrix of the embedding corpus: G[i,j] =
    * Σ_vec e_i·e_j over all vectors — the d×d sufficient statistic
    * behind PCA/whitening/linear-probe fits, where the WHOLE point at
    * 100 TB is that G is tiny (d²) while the corpus is not. Floats
    * quantize to integer thousandths (identical double-promote + round
    * on both engines), so every sum is an exact BIGINT.
    *
    * Spark side: the classic per-partition Gramian fold — a
    * `mapPartitions` carve-out (the q161/q196 rule: Catalyst can't
    * express "accumulate a d²-cell array across rows without
    * materializing d² rows per input row"; the declarative
    * explode-per-row version was measured at 194 s vs ~1 s for this
    * fold at sf0.1). Each partition folds its rows into ONE
    * d(d+1)/2-long accumulator in a tight integer loop and emits that
    * single array; the 32 partial vectors reduce with a 2080-group
    * aggregate. This is also the faithful scale-correct descendant of
    * the reference's MatrixRow accumulator (see
    * [[graft.functions.VectorSumAggregator]]) — exact, exactly-once,
    * in-plan. The DuckDB oracle is the independent exploded self-join
    * formulation.
    */
  val q231 = oracled(
    "q231_embedding_gram",
    "exact integer-quantized d×d Gram matrix via per-partition Gramian fold",
    """WITH e AS (SELECT vec_id,
           unnest(range(0, len(embedding))) AS i,
           unnest(list_transform(embedding,
             x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))) AS q
         FROM embeddings)
       SELECT a.i AS i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS gram_q
       FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
       GROUP BY 1, 2 ORDER BY a.i, b.i""") { (s, dir) =>
    import s.implicits._
    val d = 64
    val quant = Tables.embeddings(s, dir)
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1000, 0).cast("long")).as("q"))
      .as[Array[Long]]
    val partials = quant.mapPartitions { it =>
      val acc = new Array[Long](d * (d + 1) / 2)
      it.foreach { q =>
        require(q.length == d, s"embedding dim ${q.length} != $d")
        var idx = 0
        var i = 0
        while (i < d) {
          val qi = q(i)
          var j = i
          while (j < d) { acc(idx) += qi * q(j); j += 1; idx += 1 }
          i += 1
        }
      }
      Iterator.single(acc)
    }
    // (pos -> (i, j)) for the row-major upper triangle, generated once
    val map = s.range(0, d).select(col("id").cast("long").as("i"))
      .select(col("i"), explode(sequence(col("i"), lit(d - 1L))).as("j"))
      .withColumn("pos",
        expr(s"cast(i * $d - (i * (i - 1)) div 2 + j - i as int)"))
    partials.toDF("acc")
      .select(posexplode(col("acc")).as(Seq("pos", "p")))
      .groupBy(col("pos")).agg(sum(col("p")).as("gram_q"))
      .join(map, Seq("pos"))
      .select(col("i"), col("j"), col("gram_q"))
      .orderBy(col("i"), col("j"))
  }

  /** q249 — LATE-INTERACTION retrieval (ColBERT MaxSim): each vector is
    * read as 8 pseudo-token sub-vectors of 8 dims, and the
    * query→document score is Σ_i max_j ⟨q_i, d_j⟩ — every query token
    * matches its best document token, the retrieval scorer that beats
    * single-vector cosine on multi-aspect documents, over the
    * engine's existing embedding plumbing. Implementation is pure
    * straight-line codegen: the 64 token-pair dots are 64
    * [[graft.functions.VecOps.dotF]] native expressions over `slice`s
    * (512 multiplies per pair inside one projection — no explode, no
    * token-level shuffle, no UDF), maxes via `greatest`, the token sum
    * a left-associated `+` chain; the oracle spells the identical
    * ascending-index folds and left-associated sum so every double is
    * BIT-IDENTICAL across engines (the q49/q50 ordered-fold
    * discipline), and the gate column is ⌊ms·10⁶⌋ BIGINT (identical
    * doubles → identical floors; ranking happens on the double
    * internally). Brute force over the catalog is the q50-style recall
    * anchor; the 100 TB path is the library's own shortlist→rerank:
    * q51/q209 ANN candidates, then THIS scorer as the rerank stage.
    */
  val q249 = {
    def duckTokDot(i: Int, j: Int): String =
      s"""list_reduce(list_transform(range(1, 9),
          t -> CAST(x.embedding[${8 * i} + t] AS DOUBLE)
             * CAST(y.embedding[${8 * j} + t] AS DOUBLE)), (u, v) -> u + v)"""
    val duckMs = (0 until 8).map(i =>
      "GREATEST(" + (0 until 8).map(j => duckTokDot(i, j)).mkString(", ") + ")")
      .mkString("(", " + ", ")")
    oracled(
      "q249_maxsim_late_interaction",
      "ColBERT-style MaxSim top-5: 8x8 token sub-vector dots, greatest-per-query-token, ordered sum",
      s"""WITH m AS (
           SELECT x.vec_id AS query_id, y.vec_id AS vec_b, $duckMs AS ms
           FROM embeddings x JOIN embeddings y
             ON x.vec_id < 5 AND y.vec_id <> x.vec_id),
         r AS (SELECT query_id, vec_b, ms,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY ms DESC, vec_b) AS rn
           FROM m)
         SELECT query_id, vec_b,
           CAST(FLOOR(ms * 1000000) AS BIGINT) AS maxsim_x1e6,
           CAST(rn AS BIGINT) AS rn
         FROM r WHERE rn <= 5
         ORDER BY query_id, rn""") { (s, dir) =>
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val d = e.select(col("vec_id").as("vec_b"), col("embedding").as("de"))
      def tok(c: Column, i: Int) = slice(c, i * 8 + 1, 8)
      val ms = (0 until 8).map { i =>
        (0 until 8).map(j => dotF(tok(col("qe"), i), tok(col("de"), j)))
          .reduce((a, b) => greatest(a, b))
      }.reduce(_ + _)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("ms").desc, col("vec_b"))
      // the 5-row query side broadcasts; the catalog STREAMS (BNLJ with
      // the bounded side as build — the orientation that survives a
      // large catalog; a large query set goes through shortlist→rerank)
      d.join(broadcast(q), col("query_id") =!= col("vec_b"))
        .select(col("query_id"), col("vec_b"), ms.as("ms"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("vec_b"),
          floor(col("ms") * 1000000).cast("long").as("maxsim_x1e6"),
          col("rn").cast("long").as("rn"))
        .orderBy(col("query_id"), col("rn"))
    }
  }

  /** q269 — RETRIEVAL EVALUATION METRICS for the ANN family, carried
    * for BOTH probe policies: the closing loop between the bucketed
    * index and q50's exact ground truth, gated as data. Per query
    * vector and per policy (single-probe = own bucket only; multi =
    * q51's adopted own-bucket + 2 lowest-margin flips): candidate
    * count, recall@5 (|ANN ∩ exact top-5|), the ANN rank of the TRUE
    * nearest neighbor (0 = missed — the reciprocal is MRR, left to
    * the caller so no engine division happens), and DCG@5 under the
    * rational 1/(rank+1) discount scaled ×60 (discounts
    * 30,20,15,12,10 — exact integers because rank+1 ∈ 2..6 all divide
    * 60; ideal DCG is the constant 87). This is the ledger that
    * JUSTIFIES q51's r14 multi-probe adoption and keeps it justified:
    * the policy comparison is a permanent gated artifact, not a
    * one-round measurement (VERDICT r13 #5). Both rankings rebuild
    * from the SAME deterministic building blocks q50/q51/q315 gate
    * (rational hyperplanes, margin flips, tie-broken windows), so
    * every metric value is exact on both engines. At 100 TB this
    * shape is the standing index-quality job: exact top-k on a
    * BOUNDED query panel (never all-pairs), ANN from the bucketed
    * path, metrics one join + one partial-agg groupBy per policy.
    */
  val q269 = {
    def duckPolicy(name: String): String =
      s"""nc_$name AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_cand
         FROM cs_$name GROUP BY 1),
       an_$name AS (SELECT query_id, vec_b, rn FROM (
           SELECT query_id, vec_b,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cs DESC, vec_b) AS rn
           FROM cs_$name) t
         WHERE rn <= 5),
       rel_$name AS (SELECT a.query_id, a.rn,
           CASE WHEN e.vec_b IS NOT NULL THEN 1 ELSE 0 END AS rel
         FROM an_$name a LEFT JOIN ex e
           ON e.query_id = a.query_id AND e.vec_b = a.vec_b),
       agg_$name AS (SELECT query_id,
           CAST(SUM(rel) AS BIGINT) AS recall_at5,
           CAST(SUM(rel * (60 // (rn + 1))) AS BIGINT) AS dcg_x60
         FROM rel_$name GROUP BY query_id),
       t1r_$name AS (SELECT t1.query_id,
           CAST(COALESCE(MIN(a.rn), 0) AS BIGINT) AS t1_rank
         FROM t1 LEFT JOIN an_$name a
           ON a.query_id = t1.query_id AND a.vec_b = t1.top1
         GROUP BY 1)"""
    oracled(
      "q269_retrieval_metrics",
      "recall@5 / true-NN rank / exact DCG@5 of single-probe vs multi-probe LSH-ANN against exact top-5",
      s"""WITH b AS (
         SELECT vec_id, embedding,
           ${(0 until 8).map(duckBucketBit).mkString(" + ")} AS bucket
         FROM embeddings),
       $duckProbeCtes,
       ex AS (SELECT query_id, vec_b, rn FROM (
           SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
             ROW_NUMBER() OVER (PARTITION BY x.vec_id
               ORDER BY ${duckCos("x", "y")} DESC, y.vec_id) AS rn
           FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id
           WHERE x.vec_id < 10) t
         WHERE rn <= 5),
       t1 AS (SELECT query_id, vec_b AS top1 FROM ex WHERE rn = 1),
       cs_s AS (SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckCos("x", "y")} AS cs
         FROM qs x JOIN b y ON y.bucket = x.bucket AND y.vec_id <> x.vec_id),
       cs_m AS (SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckCos("x", "y")} AS cs
         FROM pr p JOIN qs x ON x.vec_id = p.vec_id
         JOIN b y ON y.bucket = p.probe AND y.vec_id <> x.vec_id),
       ${duckPolicy("s")},
       ${duckPolicy("m")}
       SELECT qs.vec_id AS query_id,
         COALESCE(nc_s.n_cand, 0) AS n_cand_single,
         COALESCE(nc_m.n_cand, 0) AS n_cand_multi,
         COALESCE(agg_s.recall_at5, 0) AS recall5_single,
         COALESCE(agg_m.recall_at5, 0) AS recall5_multi,
         COALESCE(t1r_s.t1_rank, 0) AS t1_rank_single,
         COALESCE(t1r_m.t1_rank, 0) AS t1_rank_multi,
         COALESCE(agg_s.dcg_x60, 0) AS dcg60_single,
         COALESCE(agg_m.dcg_x60, 0) AS dcg60_multi
       FROM qs
       LEFT JOIN nc_s ON nc_s.query_id = qs.vec_id
       LEFT JOIN nc_m ON nc_m.query_id = qs.vec_id
       LEFT JOIN agg_s ON agg_s.query_id = qs.vec_id
       LEFT JOIN agg_m ON agg_m.query_id = qs.vec_id
       LEFT JOIN t1r_s ON t1r_s.query_id = qs.vec_id
       LEFT JOIN t1r_m ON t1r_m.query_id = qs.vec_id
       ORDER BY query_id""") { (s, dir) =>
      val e = withNorm(Tables.embeddings(s, dir))
      val b = e.withColumn("bucket", bucketCol).localCheckpoint()
      val q10 = b.filter(col("vec_id") < 10).localCheckpoint()
      val exact = topK(cosineScored(q10, e, lit(true)), 5)
        .select(col("query_id"), col("vec_b"), col("rn"))
        .localCheckpoint() // consumed by both policies' rel and t1
      val t1 = exact.filter(col("rn") === 1)
        .select(col("query_id"), col("vec_b").as("top1"))
      def metricsOf(cs: DataFrame, sfx: String): DataFrame = {
        val csx = cs.localCheckpoint() // candidate count + ranked top-5
        val ann = topK(csx, 5).select(col("query_id"), col("vec_b"), col("rn"))
        val rel = ann
          .join(exact.select(col("query_id"), col("vec_b"), lit(1L).as("rel")),
            Seq("query_id", "vec_b"), "left")
          .withColumn("rel", coalesce(col("rel"), lit(0L)))
        val agg = rel.groupBy(col("query_id"))
          .agg(sum(col("rel")).as(s"recall5_$sfx"),
            sum(col("rel") * expr("60 div (rn + 1)")).as(s"dcg60_$sfx"))
        val nc = csx.groupBy(col("query_id"))
          .agg(count(lit(1)).as(s"n_cand_$sfx"))
        val t1r = t1
          .join(ann.select(col("query_id"), col("vec_b").as("top1"),
              col("rn").as("arn")),
            Seq("query_id", "top1"), "left")
          .groupBy(col("query_id"))
          .agg(coalesce(min(col("arn")), lit(0)).cast("long")
            .as(s"t1_rank_$sfx"))
        nc.join(agg, Seq("query_id"), "left").join(t1r, Seq("query_id"), "left")
      }
      val single = metricsOf(
        cosineScored(q10, b, col("x.bucket") === col("y.bucket")), "single")
      val multi = metricsOf(
        cosineScored(probesOf(q10), b, col("x.probe") === col("y.bucket")),
        "multi")
      q10.select(col("vec_id").as("query_id"))
        .join(single, Seq("query_id"), "left")
        .join(multi, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_cand_single"), lit(0L)).as("n_cand_single"),
          coalesce(col("n_cand_multi"), lit(0L)).as("n_cand_multi"),
          coalesce(col("recall5_single"), lit(0L)).as("recall5_single"),
          coalesce(col("recall5_multi"), lit(0L)).as("recall5_multi"),
          coalesce(col("t1_rank_single"), lit(0L)).as("t1_rank_single"),
          coalesce(col("t1_rank_multi"), lit(0L)).as("t1_rank_multi"),
          coalesce(col("dcg60_single"), lit(0L)).as("dcg60_single"),
          coalesce(col("dcg60_multi"), lit(0L)).as("dcg60_multi"))
        .orderBy(col("query_id"))
    }
  }

  /** DuckDB fragment: raw dot of `embedding` against deterministic
    * sign-LSH plane j — the pre-sign value whose |·| is the margin
    * multi-probe ranks. Exact SQL twin of `dotF(embedding, plane(j))`
    * (same integer plane formula, same double math, same ascending
    * fold), so margin ORDER matches bit-for-bit.
    */
  private def duckPlaneDot(j: Int): String =
    s"""list_reduce(list_transform(range(1, 65),
        i -> CAST(embedding[i] AS DOUBLE) * ((($j*53 + i*67) % 19)/19.0 - 0.45)),
        (u, v) -> u + v)"""

  /** q315 — MULTI-PROBE LSH (Lv et al., VLDB 2007) closing q51's
    * recall gap at the same index cost: a query probes its own bucket
    * PLUS the two buckets reached by flipping its lowest-|margin| bits
    * (margin = the raw hyperplane dot — the smaller its magnitude, the
    * likelier the true neighbor landed on the other side of that
    * plane). Probing is query-side only — the INDEX is unchanged, so
    * at 100 TB the same bucketed layout serves both policies and a
    * probe is just two more bucket lookups. The ledger gates the
    * POLICY COMPARISON per query: flipped bits, candidates seen and
    * exact-top-5 recall under single-probe vs multi-probe. Recall can
    * only rise: multi candidates ⊇ single candidates, and a true
    * top-5 member can be displaced from a top-5 only by globally
    * better vectors, of which there are at most 4 — PipelineSpec pins
    * the dominance law, the oracle pins the exact values. Margins,
    * buckets, cosines and tie-breaks are all the deterministic q50/q51
    * building blocks, so every column hash-matches.
    */
  val q315 = oracled(
    "q315_multiprobe_lsh",
    "multi-probe LSH (flip 2 lowest-margin bits): per-query candidate counts + recall@5 vs single-probe",
    s"""WITH b AS (
         SELECT vec_id, embedding,
           ${(0 until 8).map(duckBucketBit).mkString(" + ")} AS bucket
         FROM embeddings),
       qs AS (SELECT vec_id, embedding, bucket FROM b WHERE vec_id < 10),
       md AS (
         ${(0 until 8).map(j =>
           s"SELECT vec_id, $j AS j, abs(${duckPlaneDot(j)}) AS m FROM qs")
           .mkString("\n         UNION ALL ")}),
       rk AS (SELECT vec_id, j,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY m, j) AS r
         FROM md),
       fl AS (SELECT vec_id,
           MAX(CASE WHEN r = 1 THEN j END) AS j1,
           MAX(CASE WHEN r = 2 THEN j END) AS j2
         FROM rk GROUP BY 1),
       pr AS (
         SELECT vec_id, bucket AS probe FROM qs
         UNION ALL
         SELECT q.vec_id, xor(q.bucket, CAST(1 << f.j1 AS BIGINT))
           FROM qs q JOIN fl f ON f.vec_id = q.vec_id
         UNION ALL
         SELECT q.vec_id, xor(q.bucket, CAST(1 << f.j2 AS BIGINT))
           FROM qs q JOIN fl f ON f.vec_id = q.vec_id),
       cs1 AS (SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckCos("x", "y")} AS cs
         FROM qs x JOIN b y ON y.bucket = x.bucket AND y.vec_id <> x.vec_id),
       csm AS (SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckCos("x", "y")} AS cs
         FROM pr p JOIN qs x ON x.vec_id = p.vec_id
         JOIN b y ON y.bucket = p.probe AND y.vec_id <> p.vec_id),
       ex AS (SELECT query_id, vec_b FROM (
           SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
             ROW_NUMBER() OVER (PARTITION BY x.vec_id
               ORDER BY ${duckCos("x", "y")} DESC, y.vec_id) AS rn
           FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id
           WHERE x.vec_id < 10) t
         WHERE rn <= 5),
       an1 AS (SELECT query_id, vec_b FROM (
           SELECT query_id, vec_b, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cs DESC, vec_b) AS rn FROM cs1) t
         WHERE rn <= 5),
       anm AS (SELECT query_id, vec_b FROM (
           SELECT query_id, vec_b, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cs DESC, vec_b) AS rn FROM csm) t
         WHERE rn <= 5),
       n1 AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS c
         FROM cs1 GROUP BY 1),
       nm AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS c
         FROM csm GROUP BY 1),
       r1 AS (SELECT a.query_id, CAST(COUNT(e.vec_b) AS BIGINT) AS rc
         FROM an1 a LEFT JOIN ex e
           ON e.query_id = a.query_id AND e.vec_b = a.vec_b GROUP BY 1),
       rm AS (SELECT a.query_id, CAST(COUNT(e.vec_b) AS BIGINT) AS rc
         FROM anm a LEFT JOIN ex e
           ON e.query_id = a.query_id AND e.vec_b = a.vec_b GROUP BY 1)
       SELECT qs.vec_id AS query_id,
         CAST(fl.j1 AS BIGINT) AS flip1, CAST(fl.j2 AS BIGINT) AS flip2,
         COALESCE(n1.c, 0) AS n_cand_single, COALESCE(nm.c, 0) AS n_cand_multi,
         COALESCE(r1.rc, 0) AS recall_single, COALESCE(rm.rc, 0) AS recall_multi
       FROM qs JOIN fl ON fl.vec_id = qs.vec_id
       LEFT JOIN n1 ON n1.query_id = qs.vec_id
       LEFT JOIN nm ON nm.query_id = qs.vec_id
       LEFT JOIN r1 ON r1.query_id = qs.vec_id
       LEFT JOIN rm ON rm.query_id = qs.vec_id
       ORDER BY query_id""") { (s, dir) =>
    val e = withNorm(Tables.embeddings(s, dir))
    val b = e.withColumn("bucket", bucketCol).localCheckpoint()
    val q10 = b.filter(col("vec_id") < 10)
      .withColumn("mj", array_sort(array((0 until 8).map(j =>
        struct(abs(dotF(col("embedding"), plane(j))).as("m"),
          lit(j).as("j"))): _*)))
      .withColumn("j1", col("mj").getItem(0).getField("j"))
      .withColumn("j2", col("mj").getItem(1).getField("j"))
      .drop("mj")
      .localCheckpoint() // spine, both candidate joins, and the ledger
    val qp = q10.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(array(col("bucket"),
        col("bucket").bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), j1)")),
        col("bucket").bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), j2)"))))
        .as("probe"))
    val cs1 = cosineScored(q10, b, col("x.bucket") === col("y.bucket"))
      .localCheckpoint()
    val csm = cosineScored(qp, b, col("x.probe") === col("y.bucket"))
      .localCheckpoint()
    val exact = topK(cosineScored(q10, e, lit(true)), 5)
      .select(col("query_id"), col("vec_b"), lit(1L).as("hit"))
    def recallOf(cs: DataFrame): DataFrame =
      topK(cs, 5)
        .join(exact, Seq("query_id", "vec_b"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("rc"))
    def countOf(cs: DataFrame): DataFrame =
      cs.groupBy(col("query_id")).agg(count(lit(1)).as("c"))
    q10.select(col("vec_id").as("query_id"),
        col("j1").cast("long").as("flip1"), col("j2").cast("long").as("flip2"))
      .join(countOf(cs1).select(col("query_id"), col("c").as("ns")),
        Seq("query_id"), "left")
      .join(countOf(csm).select(col("query_id"), col("c").as("nm")),
        Seq("query_id"), "left")
      .join(recallOf(cs1).select(col("query_id"), col("rc").as("rs")),
        Seq("query_id"), "left")
      .join(recallOf(csm).select(col("query_id"), col("rc").as("rm")),
        Seq("query_id"), "left")
      .select(col("query_id"), col("flip1"), col("flip2"),
        coalesce(col("ns"), lit(0L)).as("n_cand_single"),
        coalesce(col("nm"), lit(0L)).as("n_cand_multi"),
        coalesce(col("rs"), lit(0L)).as("recall_single"),
        coalesce(col("rm"), lit(0L)).as("recall_multi"))
      .orderBy(col("query_id"))
  }

  /** q316 — HARD-NEGATIVE / HARD-POSITIVE MINING for contrastive
    * training (the triplet-selection pass every embedding-model
    * pipeline runs before a training epoch): for each query vector in
    * a bounded panel, the hardest positive (same label, LOWEST cosine
    * — the in-class example the model most struggles to pull in) and
    * the hardest negative (different label, HIGHEST cosine — the
    * out-of-class example it most confuses), plus the triplet margin
    * pos − neg (negative margin = an active triplet). Labels with no
    * second member yield NULL positives — kept (their absence is the
    * curriculum signal). Cosines are the q50 fold (bit-exact both
    * engines), ties break on vec_b, so the mined ids hash-match.
    * Scale shape: bounded panel × catalog, the q50/q269 BNLJ
    * orientation (panel broadcasts, catalog streams); a full-corpus
    * mining run goes through the q51/q315 bucketed shortlist instead.
    */
  val q316 = oracled(
    "q316_hard_negative_mining",
    "per-query hardest positive (same label, min cos) + hardest negative (cross label, max cos) + margin",
    s"""WITH q AS (SELECT vec_id, embedding, label FROM embeddings
         WHERE vec_id < 20),
       sc AS (SELECT x.vec_id AS query_id, x.label AS qlabel,
           y.vec_id AS vec_b, y.label AS blabel,
           ${duckCos("x", "y")} AS cs
         FROM q x JOIN embeddings y ON y.vec_id <> x.vec_id),
       hp AS (SELECT query_id, vec_b, cs FROM (
           SELECT query_id, vec_b, cs, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cs, vec_b) AS rn
           FROM sc WHERE blabel = qlabel) t WHERE rn = 1),
       hn AS (SELECT query_id, vec_b, cs FROM (
           SELECT query_id, vec_b, cs, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cs DESC, vec_b) AS rn
           FROM sc WHERE blabel <> qlabel) t WHERE rn = 1)
       SELECT q.vec_id AS query_id, CAST(q.label AS BIGINT) AS label,
         hp.vec_b AS hardest_pos, hp.cs AS pos_cos,
         hn.vec_b AS hardest_neg, hn.cs AS neg_cos,
         hp.cs - hn.cs AS margin
       FROM q LEFT JOIN hp ON hp.query_id = q.vec_id
       LEFT JOIN hn ON hn.query_id = q.vec_id
       ORDER BY query_id""") { (s, dir) =>
    val e = withNorm(Tables.embeddings(s, dir))
    val lbl = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val q = e.join(lbl, "vec_id").filter(col("vec_id") < 20)
    val cat = e.join(lbl, "vec_id")
    val sc = q.alias("x").join(cat.alias("y"),
        col("y.vec_id") =!= col("x.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("x.label").as("qlabel"),
        col("y.vec_id").as("vec_b"), col("y.label").as("blabel"),
        (dotF(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))).as("cs"))
      .localCheckpoint() // both mining windows scan it
    def pick(f: Column, w: org.apache.spark.sql.expressions.WindowSpec) =
      sc.filter(f).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("query_id"), col("vec_b"), col("cs"))
    val hp = pick(col("blabel") === col("qlabel"),
      Window.partitionBy(col("query_id")).orderBy(col("cs"), col("vec_b")))
    val hn = pick(col("blabel") =!= col("qlabel"),
      Window.partitionBy(col("query_id")).orderBy(col("cs").desc, col("vec_b")))
    q.select(col("vec_id").as("query_id"), col("label").cast("long").as("label"))
      .join(hp.select(col("query_id"), col("vec_b").as("hardest_pos"),
        col("cs").as("pos_cos")), Seq("query_id"), "left")
      .join(hn.select(col("query_id"), col("vec_b").as("hardest_neg"),
        col("cs").as("neg_cos")), Seq("query_id"), "left")
      .withColumn("margin", col("pos_cos") - col("neg_cos"))
      .orderBy(col("query_id"))
  }

  /** q317 — INT8 SYMMETRIC QUANTIZATION audit of the embedding corpus
    * (the serving-time compression every vector store applies, gated
    * as data): per vector, scale = max |x_i|, code_i = ⌊x_i·127 /
    * scale⌋ (the declared floor discipline — no round-half policy
    * crosses an engine), and the ledger reports the floor-scaled
    * scale, the max absolute reconstruction error (max is
    * order-independent, so a per-element double is gate-safe where a
    * SUM would not be), saturated codes (|code| = 127) and
    * zeroed-out nonzero elements (code 0, x ≠ 0 — true information
    * loss). All-zero vectors quantize to all-zero by declaration.
    * Scale shape: pure scan-local per-vector array math (one
    * codegen'd projection, zero shuffle) + the final sort.
    */
  val q317 = oracled(
    "q317_int8_quant_audit",
    "per-vector int8 symmetric quantization ledger: scale, max reconstruction error, saturation, zero-loss",
    """WITH m AS (SELECT vec_id,
           list_reduce(list_transform(range(1, 65),
             i -> abs(CAST(embedding[i] AS DOUBLE))),
             (u, v) -> CASE WHEN v > u THEN v ELSE u END) AS mx,
           embedding
         FROM embeddings),
       c AS (SELECT vec_id, mx,
           list_transform(range(1, 65), i -> CASE WHEN mx = 0 THEN 0
             ELSE CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 127 / mx)
               AS BIGINT) END) AS codes,
           embedding
         FROM m)
       SELECT vec_id,
         CAST(FLOOR(mx * 1000000) AS BIGINT) AS scale_x1e6,
         CAST(FLOOR(list_reduce(list_transform(range(1, 65),
             i -> abs(CAST(embedding[i] AS DOUBLE)
               - CASE WHEN mx = 0 THEN 0
                 ELSE codes[i] * mx / 127 END)),
             (u, v) -> CASE WHEN v > u THEN v ELSE u END) * 1000000)
           AS BIGINT) AS max_err_x1e6,
         CAST(len(list_filter(range(1, 65),
           i -> abs(codes[i]) = 127)) AS BIGINT) AS n_saturated,
         CAST(len(list_filter(range(1, 65),
           i -> codes[i] = 0 AND CAST(embedding[i] AS DOUBLE) <> 0))
           AS BIGINT) AS n_zeroed
       FROM c ORDER BY vec_id""") { (s, dir) =>
    val emb = transform(col("embedding"), x => x.cast("double"))
    val mx = aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
      lit(0.0), (u, v) => when(v > u, v).otherwise(u))
    val codes = transform(col("e"), x =>
      when(col("mx") === 0, lit(0L))
        .otherwise(floor(x * 127 / col("mx")).cast("long")))
    Tables.embeddings(s, dir)
      .select(col("vec_id"), emb.as("e"), mx.as("mx"))
      .withColumn("codes", codes)
      .select(col("vec_id"),
        floor(col("mx") * 1000000).cast("long").as("scale_x1e6"),
        floor(aggregate(
          zip_with(col("e"), col("codes"), (x, c) =>
            abs(x - when(col("mx") === 0, lit(0.0))
              .otherwise(c * col("mx") / 127))),
          lit(0.0), (u, v) => when(v > u, v).otherwise(u)) * 1000000)
          .cast("long").as("max_err_x1e6"),
        size(filter(col("codes"), c => abs(c) === 127)).cast("long")
          .as("n_saturated"),
        size(filter(zip_with(col("e"), col("codes"),
            (x, c) => struct(x.as("x"), c.as("c"))),
          p => p.getField("c") === 0 && p.getField("x") =!= 0.0))
          .cast("long").as("n_zeroed"))
      .orderBy(col("vec_id"))
  }

  /** q318 — SEMANTIC DEDUPLICATION ledger (SemDeDup, Abbas et al.
    * 2023, re-expressed over the deterministic sign-LSH buckets): the
    * embedding-space twin of the text near-dup family — partition the
    * corpus into buckets, and within each bucket DROP every vector
    * that has a LOWER-id τ-similar neighbor (τ = 0.45, the corpus
    * near-dup threshold), keeping one representative per duplicate
    * neighborhood. The drop rule is declared and deterministic
    * ("exists a lower-id same-bucket vector with cos ≥ τ"), so the
    * kept set is a pure function of the data — note it is the ONE-PASS
    * greedy, not the transitive-closure representative set (a chain
    * a~b~c with a≁c drops both b and c; the closure variant is q255's
    * job on the q49 pair graph). Ledger per bucket: population,
    * dropped, kept — the dedup-yield curve a data team reads before
    * committing to a threshold.
    *
    * Scale shape: within-bucket pairs only (the q51 bucket join), one
    * partial-agg distinct over dropped ids, one bounded ledger
    * aggregate. At 100 TB the bucket count grows with more planes and
    * the per-bucket work stays Σ bucket² over BOUNDED buckets — the
    * same contract every LSH family member here declares.
    */
  val q318 = oracled(
    "q318_semdedup",
    "SemDeDup yield ledger: per LSH bucket, drop vectors with a lower-id cos>=0.45 neighbor",
    s"""WITH b AS (
         SELECT vec_id, embedding,
           ${(0 until 8).map(duckBucketBit).mkString(" + ")} AS bucket
         FROM embeddings),
       dr AS (SELECT DISTINCT y.vec_id
         FROM b x JOIN b y
           ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         WHERE ${duckCos("x", "y")} >= 0.45)
       SELECT b.bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(COUNT(dr.vec_id) AS BIGINT) AS n_dropped,
         CAST(COUNT(*) - COUNT(dr.vec_id) AS BIGINT) AS n_kept
       FROM b LEFT JOIN dr ON dr.vec_id = b.vec_id
       GROUP BY b.bucket ORDER BY b.bucket""") { (s, dir) =>
    val b = withNorm(Tables.embeddings(s, dir))
      .withColumn("bucket", bucketCol)
      .localCheckpoint() // pair join (both sides) + the ledger spine
    val dropped = b.alias("x").join(b.alias("y"),
        col("x.bucket") === col("y.bucket")
          && col("x.vec_id") < col("y.vec_id"))
      .filter((dotF(col("x.embedding"), col("y.embedding"))
        / (col("x.nrm") * col("y.nrm"))) >= 0.45)
      .select(col("y.vec_id").as("vec_id"))
      .distinct()
      .withColumn("is_dropped", lit(1L))
    b.join(dropped, Seq("vec_id"), "left")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(coalesce(col("is_dropped"), lit(0L))).as("n_dropped"),
        (count(lit(1)) - sum(coalesce(col("is_dropped"), lit(0L))))
          .as("n_kept"))
      .orderBy(col("bucket"))
  }

  // --------------------------------------------------------- DBSCAN

  /** q305 — DBSCAN density clustering (Ester/Kriegel/Sander/Xu KDD
    * '96) on a planted-cluster 2-D fixture: a deterministic 10%
    * customer sample is placed by hash — 8 planted centers on a
    * 25000-spaced grid with ±400 jitter, ~11% uniform noise (the
    * q92 dirty-fixture discipline: uniform points make DBSCAN
    * degenerate — nothing or one percolation blob — so the structure
    * the algorithm exists to find is planted, and finding EXACTLY it
    * is the gate). ε = 500, minPts = 4 (neighborhood includes the
    * point): core points by ε-neighbor count, clusters = connected
    * components of the core-core ε-graph (the shared
    * [[graft.operators.Graph.cc]] — the SAME operator q73/q246 run),
    * border points attach to the MIN core-neighbor label
    * (deterministic resolution of the classic two-cluster border
    * ambiguity), the rest is noise. Ledger: per cluster label the
    * core/border counts, noise as label −1.
    *
    * Scale shape — GriDBSCAN (the r15 fix; the r14 plan materialized
    * the full ε-pair graph and paid e≈3 at the 30× stress, 398 s):
    * cells of side 353 = ⌊ε/√2⌋, so a cell with ≥ minPts points is
    * ALL-CORE and single-cluster BY CONSTRUCTION (diagonal 353·√2 ≈
    * 499.2 ≤ ε) — dense-cell points never enter a pair join for
    * coreness, never carry point-level CC edges, and the dense cell
    * contracts to ONE supernode (its min point id) before the
    * component step. The dense-dense witness join ("do two cells'
    * clusters touch?") still enumerates cross-cell candidate pairs,
    * but its output collapses to (cellA, cellB) under a partial-agg
    * distinct — map-side combine keeps the quadratic INSIDE the scan,
    * nothing pair-shaped is ever shuffled, stored, or iterated on.
    * Only points OUTSIDE dense cells (noise + fringe — the sparse
    * minority at any density worth clustering) run the classic 5×5
    * neighborhood count (⌈ε/353⌉ = 2 cells of reach). Graph.cc runs
    * on the CONTRACTED graph: supernodes + sparse cores, witness +
    * sparse edges — domain-bounded where the r14 graph was pair-bound.
    * Component labels then expand back through cell membership; the
    * supernode id being the cell's min point id makes the component
    * minimum equal the true min-core-id label, so the contraction is
    * exact, not approximate — the unchanged full-DBSCAN oracle
    * hash-gates that claim at every fixture.
    */
  val q305 = oracled(
    "q305_dbscan",
    "DBSCAN on planted 2-D clusters: grid epsilon-graph, CC over cores, border attach, noise",
    """WITH RECURSIVE pts AS (SELECT c_custkey AS id,
           xor(c_custkey * 2654435761 % 4294967296,
             (c_custkey * 2654435761 % 4294967296) // 65536)
             * 40503 % 4294967296 % 9 AS cid,
           xor(c_custkey * 1779033703 % 4294967296,
             (c_custkey * 1779033703 % 4294967296) // 65536)
             * 48271 % 4294967296 AS hb,
           xor(c_custkey * 1540483477 % 4294967296,
             (c_custkey * 1540483477 % 4294967296) // 65536)
             * 69069 % 4294967296 AS hc
         FROM customer WHERE c_custkey % 10 = 3),
       p AS (SELECT id,
           CASE WHEN cid < 8
             THEN 12500 + 25000 * (cid % 4) + hb % 801 - 400
             ELSE hb % 100000 END AS x,
           CASE WHEN cid < 8
             THEN 12500 + 25000 * (cid // 4) + hc % 801 - 400
             ELSE hc % 100000 END AS y
         FROM pts),
       nb AS (SELECT a.id AS ia, b.id AS ib
         FROM p a JOIN p b ON a.id <> b.id
           AND b.x BETWEEN a.x - 500 AND a.x + 500
           AND b.y BETWEEN a.y - 500 AND a.y + 500
         WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
           <= 250000),
       dg AS (SELECT p.id, (SELECT COUNT(*) FROM nb
           WHERE nb.ia = p.id) AS deg FROM p),
       core AS (SELECT id FROM dg WHERE deg + 1 >= 4),
       ce AS (SELECT ia, ib FROM nb
         WHERE ia IN (SELECT id FROM core)
           AND ib IN (SELECT id FROM core)),
       reach(node, lbl) AS (
         SELECT id, id FROM core
         UNION
         SELECT e.ib, r.lbl FROM reach r JOIN ce e ON e.ia = r.node),
       lab AS (SELECT node AS id, MIN(lbl) AS lbl FROM reach
         GROUP BY node),
       border AS (SELECT nb.ia AS id, MIN(lab.lbl) AS lbl
         FROM nb JOIN lab ON lab.id = nb.ib
         WHERE nb.ia NOT IN (SELECT id FROM core)
         GROUP BY nb.ia),
       marked AS (
         SELECT lbl, 1 AS is_core FROM lab
         UNION ALL SELECT lbl, 0 FROM border
         UNION ALL SELECT -1, 0 FROM p
           WHERE p.id NOT IN (SELECT id FROM lab)
             AND p.id NOT IN (SELECT id FROM border))
       SELECT CAST(lbl AS BIGINT) AS label,
         CAST(SUM(is_core) AS BIGINT) AS n_core,
         CAST(SUM(1 - is_core) AS BIGINT) AS n_border
       FROM marked GROUP BY lbl ORDER BY label""") { (s, dir) =>
    def h(mult: Long, post: Long): Column = expr(
      s"""(c_custkey * $mult % 4294967296L
          ^ (c_custkey * $mult % 4294967296L) div 65536)
          * $post % 4294967296L""")
    val pts = Tables.customer(s, dir)
      .filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey").as("id"),
        (h(2654435761L, 40503L) % 9).as("cid"),
        h(1779033703L, 48271L).as("hb"),
        h(1540483477L, 69069L).as("hc"))
      .select(col("id"),
        when(col("cid") < 8, lit(12500L) + lit(25000L) * (col("cid") % 4)
          + col("hb") % 801 - 400)
          .otherwise(col("hb") % 100000).as("x"),
        when(col("cid") < 8,
          lit(12500L) + lit(25000L) * expr("cid div 4")
            + col("hc") % 801 - 400)
          .otherwise(col("hc") % 100000).as("y"))
      // GriDBSCAN cell side ⌊ε/√2⌋ = 353: same-cell ⟹ within ε.
      // PRECONDITION: x, y ≥ 0 (true by construction above — both
      // branches are nonnegative-mod arithmetic on nonnegative hashes,
      // min x = 12500 − 400). Spark's `div` truncates toward zero, not
      // floor: with a negative coordinate, cell 0 would span
      // [−352, 352] (width 704 > ε = 500) and the same-cell invariant
      // would silently merge non-neighbors into an all-core cell. A
      // signed fixture must switch to a true floor division, e.g.
      // `(x - ((x % 353) + 353) % 353) div 353` (r15 ADVICE).
      .withColumn("cx", expr("x div 353"))
      .withColumn("cy", expr("y div 353"))
      .localCheckpoint(false)
    // dense cell (≥ minPts points): all-core, one cluster, contracted
    // to its min point id as the supernode
    val denseCells = pts.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("occ"), min(col("id")).as("rep"))
      .filter(col("occ") >= 4)
      .select(col("cx"), col("cy"), col("rep"))
    val ptsD = pts.join(denseCells, Seq("cx", "cy"), "left")
      .localCheckpoint(false) // rep IS NULL marks the sparse minority
    // ε = 500 spans ⌈500/353⌉ = 2 cells: 5×5 neighborhood replication
    val offsets = Seq(-2L, -1L, 0L, 1L, 2L).flatMap(dx =>
      Seq(-2L, -1L, 0L, 1L, 2L).map(dy => struct(lit(dx), lit(dy))))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    val probe = ptsD.select(col("id").as("ib"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("jx"), col("cy").as("jy"),
      col("rep").as("repB"))
    // sparse points (outside dense cells) run the classic neighborhood
    // count — the only point-level ε-join left in the plan
    val nbS = ptsD.filter(col("rep").isNull)
      .select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya"),
        explode(array(offsets: _*)).as("o"), col("cx"), col("cy"))
      .select(col("ia"), col("xa"), col("ya"),
        (col("cx") + col("o.col1")).as("jx"),
        (col("cy") + col("o.col2")).as("jy"))
      .join(probe, Seq("jx", "jy"))
      .filter(col("ia") =!= col("ib") && d2 <= 250000L)
      .select(col("ia"), col("ib"), col("repB"))
      .localCheckpoint(false) // feeds coreness, edges, and border attach
    val sparseCore = nbS.groupBy(col("ia")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") + 1 >= 4)
      .select(col("ia").as("id"))
      .localCheckpoint(false)
    // dense-dense witness: any cross-cell ε-pair merges the two
    // supernodes — the join output collapses to (cellA, cellB) under
    // the distinct's map-side partial agg; no pair row survives the scan
    val denseP = ptsD.filter(col("rep").isNotNull)
    val witness = denseP
      .select(col("rep").as("a"), col("x").as("xa"), col("y").as("ya"),
        explode(array(offsets: _*)).as("o"), col("cx"), col("cy"))
      .select(col("a"), col("xa"), col("ya"),
        (col("cx") + col("o.col1")).as("jx"),
        (col("cy") + col("o.col2")).as("jy"))
      .join(denseP.select(col("rep").as("b"), col("x").as("xb"),
        col("y").as("yb"), col("cx").as("jx"), col("cy").as("jy")),
        Seq("jx", "jy"))
      .filter(col("a") =!= col("b") && d2 <= 250000L)
      .select(col("a"), col("b")).distinct()
    // sparse-core edges: to a dense supernode or to another sparse core
    val eToDense = nbS.filter(col("repB").isNotNull)
      .select(col("ia"), col("repB").as("b"))
    val eToSparse = nbS.filter(col("repB").isNull)
      .join(sparseCore.select(col("id").as("ib")), Seq("ib"), "left_semi")
      .select(col("ia"), col("ib").as("b"))
    val eSparse = eToDense.unionByName(eToSparse)
      .join(sparseCore.select(col("id").as("ia")), Seq("ia"), "left_semi")
      .select(col("ia").as("a"), col("b"))
    // CC on the CONTRACTED graph: supernodes + sparse cores only
    val nodes = denseCells.select(col("rep").as("id"))
      .unionByName(sparseCore)
    val comp = Graph.cc(nodes, witness.unionByName(eSparse))
      .select(col("node"), col("component"))
      .localCheckpoint(false)
    // expand supernode labels back to member points; the supernode id
    // is the cell's min point id, so component minima ARE the true
    // min-core-id labels
    val lab = denseP.select(col("id"), col("rep").as("node"))
      .unionByName(sparseCore.select(col("id"), col("id").as("node")))
      .join(comp, Seq("node"))
      .select(col("id"), col("component").as("lbl"))
      .localCheckpoint(false)
    val border = nbS
      .join(sparseCore.select(col("id").as("ia")), Seq("ia"), "left_anti")
      .join(lab.select(col("id").as("ib"), col("lbl")), Seq("ib"))
      .groupBy(col("ia").as("id")).agg(min(col("lbl")).as("lbl"))
    val noise = pts.select(col("id"))
      .join(lab.select(col("id")), Seq("id"), "left_anti")
      .join(border.select(col("id")), Seq("id"), "left_anti")
      .select(lit(-1L).as("lbl"), lit(0L).as("is_core"))
    lab.select(col("lbl"), lit(1L).as("is_core"))
      .union(border.select(col("lbl"), lit(0L).as("is_core")))
      .union(noise)
      .groupBy(col("lbl").as("label"))
      .agg(sum(col("is_core")).as("n_core"),
        sum(lit(1L) - col("is_core")).as("n_border"))
      .orderBy(col("label"))
  }

  // ------------------------------------ Matryoshka truncation audit

  /** DuckDB fragment: sequential-fold dot over the FIRST [[d]] list
    * elements — the truncated-prefix twin of [[duckDot]], same
    * ascending left fold so values stay bit-identical to [[dotF]] over
    * `slice(embedding, 1, d)`.
    */
  private def duckDotPfx(a: String, b: String, d: Int): String =
    s"""list_reduce(list_transform(range(1, ${d + 1}),
        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (u, v) -> u + v)"""

  private def duckCosPfx(x: String, y: String, d: Int): String =
    s"""(${duckDotPfx(s"$x.embedding", s"$y.embedding", d)}
        / (sqrt(${duckDotPfx(s"$x.embedding", s"$x.embedding", d)})
         * sqrt(${duckDotPfx(s"$y.embedding", s"$y.embedding", d)})))"""

  /** q325 — MATRYOSHKA TRUNCATION recall audit: can serving keep only
    * the first 16 of 64 embedding dimensions (4× memory/bandwidth cut —
    * the Matryoshka-representation deployment question, Kusupati et al.
    * 2022) without losing the neighborhood structure? For the q50 panel
    * (vec_id < 10) the ledger compares exact top-5 under FULL 64-dim
    * cosine vs top-5 under the 16-dim PREFIX cosine and reports
    * per-query overlap (recall@5 hits, 0..5) and whether the top-1
    * survived — exact integers, the floats stay inside the rank
    * comparison where both engines compute the identical ascending
    * fold ([[duckDotPfx]] vs `dotF` over `slice`).
    *
    * Scale shape: ONE panel×corpus join computes both similarities per
    * candidate row (the truncated dot is not a second scan — `slice` on
    * the already-read vector), two windows rank the bounded panel's
    * candidate lists, and the overlap join touches 2×5 rows per query.
    * At 100 TB the panel side is broadcast and the corpus side streams
    * through one whole-stage-codegen'd stage.
    */
  val q325 = oracled(
    "q325_matryoshka_recall",
    "16-of-64-dim prefix-cosine top-5 recall vs full-dim exact (per-query overlap + top-1 survival)",
    s"""WITH sc AS (
         SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckCos("x", "y")} AS cf,
           ${duckCosPfx("x", "y", 16)} AS ct
         FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id
         WHERE x.vec_id < 10),
       fu AS (SELECT query_id, vec_b,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cf DESC, vec_b) AS rn
         FROM sc),
       tr AS (SELECT query_id, vec_b,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY ct DESC, vec_b) AS rn
         FROM sc),
       f5 AS (SELECT * FROM fu WHERE rn <= 5),
       t5 AS (SELECT * FROM tr WHERE rn <= 5)
       SELECT f5.query_id,
         CAST(COUNT(t5.vec_b) AS BIGINT) AS recall5_hits,
         CAST(MAX(CASE WHEN f5.rn = 1 AND t5.rn = 1
           THEN 1 ELSE 0 END) AS BIGINT) AS top1_match
       FROM f5 LEFT JOIN t5
         ON t5.query_id = f5.query_id AND t5.vec_b = f5.vec_b
       GROUP BY f5.query_id
       ORDER BY f5.query_id""") { (s, dir) =>
    val e = withNorm(Tables.embeddings(s, dir))
      .withColumn("emb16", slice(col("embedding"), 1, 16))
      .withColumn("nrm16", sqrt(dotF(col("emb16"), col("emb16"))))
    val q = e.filter(col("vec_id") < 10)
    // one pair join, both similarities from the same candidate row
    val sc = q.alias("x").join(e.alias("y"),
        col("y.vec_id") =!= col("x.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("vec_b"),
        (dotF(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))).as("cf"),
        (dotF(col("x.emb16"), col("y.emb16"))
          / (col("x.nrm16") * col("y.nrm16"))).as("ct"))
      .localCheckpoint(false)
    def top5(byCol: String) = sc.withColumn("rn",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col(byCol).desc, col("vec_b"))))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_b"), col("rn"))
    val f5 = top5("cf").alias("f")
    val t5 = top5("ct").alias("t")
    f5.join(t5, col("t.query_id") === col("f.query_id")
          && col("t.vec_b") === col("f.vec_b"), "left")
      .groupBy(col("f.query_id").as("query_id"))
      .agg(count(col("t.vec_b")).as("recall5_hits"),
        max(when(col("f.rn") === 1 && col("t.rn") === 1, 1L)
          .otherwise(0L)).as("top1_match"))
      .orderBy(col("query_id"))
  }

  // --------------------------------- two-stage retrieval (int8 -> exact)

  /** q327 — TWO-STAGE RETRIEVAL audit: the standard serving
    * architecture (coarse scan over compressed codes, exact rerank of
    * the survivors) measured against ground truth. Stage 1 ranks ALL
    * candidates by the INTEGER dot of q317's int8 codes (floor(x·127/
    * max|x|) per dimension — scale-free MIPS proxy, pure BIGINT so both
    * engines rank identically by construction); stage 2 reranks the
    * coarse top-20 by exact full-precision cosine and keeps 5. Ledger
    * per panel query (vec_id < 10): recall@5 of the reranked list vs
    * the exact top-5, and the coarse rank of the true top-1 — the
    * number that says how deep stage 1 must reach before stage 2 can
    * recover the answer.
    *
    * Scale shape: ONE panel×corpus join computes the integer code dot
    * and the exact cosine per candidate row (codes are derived scan-
    * local from the vector already in hand — at serving time they'd be
    * the stored column and the float vector the late fetch); the three
    * rankings are windows over the bounded panel's candidate lists.
    */
  val q327 = oracled(
    "q327_two_stage_retrieval",
    "int8-coarse top-20 -> exact-rerank top-5 vs exact top-5: recall + coarse rank of true top-1",
    s"""WITH c AS (SELECT vec_id, embedding,
           list_transform(range(1, 65), i -> CASE WHEN mx = 0 THEN 0
             ELSE CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 127 / mx)
               AS BIGINT) END) AS codes
         FROM (SELECT vec_id, embedding,
             list_reduce(list_transform(range(1, 65),
               i -> abs(CAST(embedding[i] AS DOUBLE))),
               (u, v) -> CASE WHEN v > u THEN v ELSE u END) AS mx
           FROM embeddings)),
       sc AS (
         SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckCos("x", "y")} AS cf,
           list_reduce(list_transform(range(1, 65),
             i -> x.codes[i] * y.codes[i]), (u, v) -> u + v) AS ci
         FROM c x JOIN c y ON y.vec_id <> x.vec_id
         WHERE x.vec_id < 10),
       rk AS (SELECT query_id, vec_b, cf,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY ci DESC, vec_b) AS rn_c,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cf DESC, vec_b) AS rn_f
         FROM sc),
       rr AS (SELECT query_id, vec_b,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cf DESC, vec_b) AS rn_r
         FROM rk WHERE rn_c <= 20),
       f5 AS (SELECT query_id, vec_b FROM rk WHERE rn_f <= 5),
       r5 AS (SELECT query_id, vec_b FROM rr WHERE rn_r <= 5),
       ov AS (SELECT f5.query_id,
           CAST(COUNT(r5.vec_b) AS BIGINT) AS recall5_hits
         FROM f5 LEFT JOIN r5
           ON r5.query_id = f5.query_id AND r5.vec_b = f5.vec_b
         GROUP BY f5.query_id)
       SELECT ov.query_id, ov.recall5_hits,
         CAST(t1.rn_c AS BIGINT) AS top1_coarse_rank
       FROM ov JOIN (SELECT query_id, rn_c FROM rk WHERE rn_f = 1) t1
         ON t1.query_id = ov.query_id
       ORDER BY ov.query_id""") { (s, dir) =>
    val mx = aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
      lit(0.0), (u, v) => when(v > u, v).otherwise(u))
    val codes = transform(col("embedding"), x =>
      when(col("mx") === 0, lit(0L))
        .otherwise(floor(x.cast("double") * 127 / col("mx")).cast("long")))
    val e = Tables.embeddings(s, dir)
      .withColumn("mx", mx)
      .select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"), codes.as("codes"))
    val q = e.filter(col("vec_id") < 10)
    val sc = q.alias("x").join(e.alias("y"),
        col("y.vec_id") =!= col("x.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("vec_b"),
        (dotF(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))).as("cf"),
        aggregate(zip_with(col("x.codes"), col("y.codes"), _ * _),
          lit(0L), _ + _).as("ci"))
    val rk = sc
      .withColumn("rn_c", row_number().over(Window
        .partitionBy(col("query_id")).orderBy(col("ci").desc, col("vec_b"))))
      .withColumn("rn_f", row_number().over(Window
        .partitionBy(col("query_id")).orderBy(col("cf").desc, col("vec_b"))))
      .localCheckpoint(false)
    val r5 = rk.filter(col("rn_c") <= 20)
      .withColumn("rn_r", row_number().over(Window
        .partitionBy(col("query_id")).orderBy(col("cf").desc, col("vec_b"))))
      .filter(col("rn_r") <= 5)
      .select(col("query_id").as("rq"), col("vec_b").as("rb"))
    val ov = rk.filter(col("rn_f") <= 5)
      .join(r5, col("rq") === col("query_id") && col("rb") === col("vec_b"),
        "left")
      .groupBy(col("query_id"))
      .agg(count(col("rb")).as("recall5_hits"))
    ov.join(rk.filter(col("rn_f") === 1)
          .select(col("query_id").as("tq"), col("rn_c")),
        col("tq") === col("query_id"))
      .select(col("query_id"), col("recall5_hits"),
        col("rn_c").cast("long").as("top1_coarse_rank"))
      .orderBy(col("query_id"))
  }

  // -------------------------------------------- MMR diversification

  /** q330 — MAXIMAL MARGINAL RELEVANCE diversification (Carbonell &
    * Goldstein 1998): re-rank each panel query's exact top-10 into a
    * 5-item list that trades relevance against redundancy — greedy
    * argmax of λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), λ = 0.7 — the
    * standard answer to "the top-5 are five near-copies" in retrieval
    * serving (and in dedup-aware eval-set construction). Scores stay
    * floats INSIDE the greedy comparison (both engines compute the
    * identical doubles: rel and pairwise sims are the q50 ascending
    * fold, the MMR combination is the same two multiplies and a
    * subtract); the emitted ledger is (query, round, picked id,
    * ⌊10⁶·score⌋) with ties broken on vec_id.
    *
    * Scale shape: relevance is the one panel×corpus scored join (q50's
    * shape); everything after — the 10-candidate lists, the ≤90
    * ordered candidate pairs per query, five greedy rounds — runs on
    * BOUNDED relations (panel × 10 and panel × 90 rows), so the greedy
    * loop's 5 steps are driver-composed plans over broadcast-sized
    * frames, never corpus-sized work (the q299 greedy discipline).
    */
  val q330 = oracled(
    "q330_mmr_diversification",
    "MMR re-ranking (lambda=0.7): greedy 5-of-top-10 per panel query, exact greedy twin in SQL",
    {
      def round(k: Int) = s"""
       mx$k AS (SELECT p.query_id, p.da, MAX(p.pcos) AS pen
         FROM pp p JOIN sel${k - 1} s
           ON s.query_id = p.query_id AND s.vec_b = p.db
         GROUP BY 1, 2),
       sc$k AS (SELECT c.query_id, c.vec_b,
           0.7 * c.rel - 0.3 * m.pen AS score,
           ROW_NUMBER() OVER (PARTITION BY c.query_id
             ORDER BY 0.7 * c.rel - 0.3 * m.pen DESC, c.vec_b) AS pk
         FROM cand c
         JOIN mx$k m ON m.query_id = c.query_id AND m.da = c.vec_b
         WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} s
           WHERE s.query_id = c.query_id AND s.vec_b = c.vec_b)),
       sel$k AS (SELECT * FROM sel${k - 1} UNION ALL
         SELECT query_id, vec_b, CAST($k AS BIGINT) AS rnd, score
         FROM sc$k WHERE pk = 1)"""
      s"""WITH sc AS (
         SELECT x.vec_id AS query_id, y.vec_id AS vec_b,
           ${duckCos("x", "y")} AS rel,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
             ORDER BY ${duckCos("x", "y")} DESC, y.vec_id) AS rn
         FROM embeddings x JOIN embeddings y ON y.vec_id <> x.vec_id
         WHERE x.vec_id < 10),
       cand AS (SELECT query_id, vec_b, rel FROM sc WHERE rn <= 10),
       ce AS (SELECT c.query_id, c.vec_b, c.rel, e.embedding
         FROM cand c JOIN embeddings e ON e.vec_id = c.vec_b),
       pp AS (SELECT a.query_id, a.vec_b AS da, b.vec_b AS db,
           ${duckCos("a", "b")} AS pcos
         FROM ce a JOIN ce b
           ON b.query_id = a.query_id AND b.vec_b <> a.vec_b),
       sel1 AS (SELECT query_id, vec_b, CAST(1 AS BIGINT) AS rnd, score
         FROM (SELECT query_id, vec_b, 0.7 * rel AS score,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY 0.7 * rel DESC, vec_b) AS pk
           FROM cand) t WHERE pk = 1),
       ${(2 to 5).map(round).mkString(",\n")}
       SELECT query_id, rnd, vec_b AS vec_id,
         CAST(FLOOR(1000000 * score) AS BIGINT) AS score_x1e6
       FROM sel5 ORDER BY query_id, rnd"""
    }) { (s, dir) =>
    val e = withNorm(Tables.embeddings(s, dir))
    val cand = topK(cosineScored(e.filter(col("vec_id") < 10), e,
        lit(true)), 10)
      .select(col("query_id"), col("vec_b"), col("cos_sim").as("rel"))
      .localCheckpoint(false)
    val ce = cand.join(
      e.select(col("vec_id").as("vec_b"), col("embedding"), col("nrm")),
      Seq("vec_b"))
    val pp = ce.select(col("query_id"), col("vec_b").as("da"),
        col("embedding").as("ea"), col("nrm").as("na"))
      .join(ce.select(col("query_id").as("qb"), col("vec_b").as("db"),
          col("embedding").as("eb"), col("nrm").as("nb")),
        col("qb") === col("query_id") && col("db") =!= col("da"))
      .select(col("query_id"), col("da"), col("db"),
        (dotF(col("ea"), col("eb")) / (col("na") * col("nb"))).as("pcos"))
      .localCheckpoint(false)
    def pick(scored: DataFrame, k: Int): DataFrame =
      scored.withColumn("pk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("vec_b"))))
        .filter(col("pk") === 1)
        .select(col("query_id"), col("vec_b"), lit(k.toLong).as("rnd"),
          col("score"))
    var sel = pick(cand.select(col("query_id"), col("vec_b"),
      (lit(0.7) * col("rel")).as("score")), 1).localCheckpoint(false)
    for (k <- 2 to 5) {
      val mx = pp.join(broadcast(sel.select(col("query_id").as("qs"),
          col("vec_b").as("ds"))),
          col("qs") === col("query_id") && col("ds") === col("db"))
        .groupBy(col("query_id"), col("da"))
        .agg(max(col("pcos")).as("pen"))
      val scored = cand
        .join(sel.select(col("query_id").as("qe"), col("vec_b").as("de")),
          col("qe") === col("query_id") && col("de") === col("vec_b"),
          "left_anti")
        .join(mx.select(col("query_id").as("qm"), col("da"), col("pen")),
          col("qm") === col("query_id") && col("da") === col("vec_b"))
        .select(col("query_id"), col("vec_b"),
          (lit(0.7) * col("rel") - lit(0.3) * col("pen")).as("score"))
      sel = sel.unionByName(pick(scored, k)).localCheckpoint(false)
    }
    sel.select(col("query_id"), col("rnd"), col("vec_b").as("vec_id"),
        floor(lit(1000000) * col("score")).cast("long").as("score_x1e6"))
      .orderBy(col("query_id"), col("rnd"))
  }

  // --------------------------------------------- kNN-distance outliers

  /** q335 — kNN-DISTANCE OUTLIER scan (the k-distance core of LOF,
    * Breunig et al. 2000, bucketed): a vector whose 5th-nearest
    * neighbor is far — or which has fewer than 5 neighbors in its own
    * sign-LSH bucket at all — is the OOD/garbage-embedding candidate a
    * curation pass quarantines before training. Neighbors are searched
    * within the q51 bucket (the declared approximation: hash-space
    * isolation IS evidence of outlierness, so bucket-local k-distance
    * ranks the right tail first); the ledger lists the 100 most
    * outlier-ish vectors by ascending 5th-neighbor cosine, with
    * bucket-starved vectors (< 5 same-bucket neighbors) pinned to the
    * front via a −2·10⁶ sentinel (any real ⌊10⁶·cos⌋ ≥ −10⁶).
    *
    * Scale shape: the candidate join is the q321 bucket equi-join
    * (Σ bucket² candidate mass, the LSH family's declared contract);
    * the per-vector ranking windows on vec_id — the highest-cardinality
    * key — and the output is a bounded top-100.
    */
  val q335 = oracled(
    "q335_knn_outlier_score",
    "bucketed 5th-NN cosine outlier ledger: 100 most isolated vectors, bucket-starved pinned first",
    s"""WITH b AS (
         SELECT vec_id, embedding,
           ${(0 until 8).map(duckBucketBit).mkString(" + ")} AS bucket
         FROM embeddings),
       nb AS (SELECT x.vec_id, ${duckCos("x", "y")} AS c,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
             ORDER BY ${duckCos("x", "y")} DESC, y.vec_id) AS rn
         FROM b x JOIN b y
           ON y.bucket = x.bucket AND y.vec_id <> x.vec_id),
       st AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_nb,
           MAX(CASE WHEN rn = 5 THEN c END) AS c5
         FROM nb GROUP BY vec_id),
       led AS (
         SELECT v.vec_id,
           CAST(COALESCE(st.n_nb, 0) AS BIGINT) AS n_bucket_neighbors,
           CAST(CASE WHEN st.c5 IS NULL THEN -2000000
             ELSE FLOOR(1000000 * st.c5) END AS BIGINT) AS knn5_x1e6
         FROM b v LEFT JOIN st ON st.vec_id = v.vec_id)
       SELECT vec_id, n_bucket_neighbors, knn5_x1e6
       FROM led ORDER BY knn5_x1e6, vec_id LIMIT 100""") { (s, dir) =>
    val b = withNorm(Tables.embeddings(s, dir))
      .withColumn("bucket", bucketCol)
      .localCheckpoint(false)
    val nb = b.alias("x").join(b.alias("y"),
        col("y.bucket") === col("x.bucket")
          && col("y.vec_id") =!= col("x.vec_id"))
      .select(col("x.vec_id").as("vec_id"),
        (dotF(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))).as("c"),
        col("y.vec_id").as("nid"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("c").desc, col("nid"))))
    val st = nb.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_nb"),
        max(when(col("rn") === 5, col("c"))).as("c5"))
    b.select(col("vec_id"))
      .join(st, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_nb"), lit(0L)).as("n_bucket_neighbors"),
        when(col("c5").isNull, lit(-2000000L))
          .otherwise(floor(lit(1000000) * col("c5")).cast("long"))
          .as("knn5_x1e6"))
      .orderBy(col("knn5_x1e6"), col("vec_id"))
      .limit(100)
  }

  /** q354 — SemDeDup ledger (Abbas et al., arXiv:2303.09540): semantic
    * deduplication keeps, within each embedding cluster, the documents
    * LEAST similar to the cluster centroid (the "most atypical"
    * representative survives; templated boilerplate nearest the
    * centroid goes). The paper clusters with k-means; a k-means fit is
    * not cross-engine-reproducible (MLlib iteration order), so the
    * cluster here is the house sign-LSH bucket (q51/q321's 8 rational
    * hyperplanes — bit-identical in both engines), playing the same
    * candidate-confinement role. Deterministic semantics:
    *
    *   - centroid: per-bucket per-dimension sums of
    *     floor(embedding·1e6) — EXACT BIGINTs, so the aggregation is
    *     order-free (a double mean would vary with Spark's partition
    *     fold order); keepability k(d) = cos(d, centroid) is then a
    *     per-ROW ascending fold over the integer sums, bit-identical
    *     to the oracle.
    *   - removal: d is removed iff some same-bucket partner p with
    *     cos(d,p) ≥ 0.45 is strictly more keepable (k(p) < k(d), ties
    *     to the lower vec_id) — a greedy pairwise form of the paper's
    *     keep-one-per-duplicate-neighborhood rule with no iteration.
    *
    * Scale shape: the bucket is the parallel unit; the centroid is two
    * partial aggregations over exploded dimensions (map-side
    * combinable, 64·|buckets| rows); the pair join is q321's accepted
    * Σ|bucket|² candidate carve-out; removal is two keyed joins on the
    * pair relation. At 100 TB the same ledger runs over the ivf_cells
    * ARTIFACT's k-means cells (build once, scan ever after) — the
    * LSH-bucket form is the clustering that both engines can prove.
    */
  val q354 = oracled(
    "q354_semdedup",
    "SemDeDup per-cluster dedup ledger: keep the doc least similar to the exact-integer centroid",
    s"""WITH b AS (
         SELECT vec_id, embedding,
           ${(0 until 8).map(duckBucketBit).mkString(" + ")} AS bucket
         FROM embeddings),
       qn AS (SELECT b.bucket, g.i AS pos,
           CAST(floor(CAST(b.embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) AS q
         FROM b, generate_series(1, 64) AS g(i)),
       sm AS (SELECT bucket, pos, SUM(q) AS s FROM qn GROUP BY 1, 2),
       mu AS (SELECT bucket, list(CAST(s AS DOUBLE) ORDER BY pos) AS mud
         FROM sm GROUP BY 1),
       kp AS (SELECT x.vec_id, x.bucket,
           list_reduce(list_transform(range(1, 65),
             i -> CAST(x.embedding[i] AS DOUBLE) * m.mud[i]), (u, v) -> u + v)
           / (sqrt(${duckDot("x.embedding", "x.embedding")})
            * sqrt(list_reduce(list_transform(range(1, 65),
                i -> m.mud[i] * m.mud[i]), (u, v) -> u + v))) AS keep
         FROM b x JOIN mu m ON m.bucket = x.bucket),
       pr AS (SELECT x.vec_id AS a, y.vec_id AS b2, x.bucket
         FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         WHERE ${duckCos("x", "y")} >= 0.45),
       dup AS (SELECT a AS vec_id, b2 AS partner FROM pr
               UNION ALL SELECT b2, a FROM pr),
       rem AS (SELECT DISTINCT d.vec_id, kd.bucket
         FROM dup d JOIN kp kd ON kd.vec_id = d.vec_id
         JOIN kp kx ON kx.vec_id = d.partner
         WHERE kx.keep < kd.keep
            OR (kx.keep = kd.keep AND d.partner < d.vec_id)),
       db AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs FROM b GROUP BY 1),
       pb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pr GROUP BY 1),
       rb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_removed FROM rem GROUP BY 1)
       SELECT CAST(d.bucket AS BIGINT) AS bucket, d.n_docs,
         COALESCE(p.n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
         COALESCE(r.n_removed, CAST(0 AS BIGINT)) AS n_removed,
         CAST(((d.n_docs - COALESCE(r.n_removed, CAST(0 AS BIGINT))) * 1000000)
           // d.n_docs AS BIGINT) AS kept_ppm
       FROM db d LEFT JOIN pb p ON p.bucket = d.bucket
       LEFT JOIN rb r ON r.bucket = d.bucket
       ORDER BY bucket""") { (s, dir) =>
    val e = withNorm(Tables.embeddings(s, dir)).withColumn("bucket", bucketCol)
    // exact-integer quantization -> the per-bucket centroid sums are
    // order-free BIGINTs (partial-agg-safe), never a double mean
    val mu = e.select(col("bucket"),
        posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("bucket"), (col("pos0") + 1).as("pos"),
        floor(col("v").cast("double") * lit(1000000)).cast("long").as("q"))
      .groupBy(col("bucket"), col("pos")).agg(sum(col("q")).as("s"))
      .groupBy(col("bucket"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s").cast("double")).as("mud"))
      .select(col("bucket"), col("mud"), l2Norm(col("mud")).as("munrm"))
    val kp = e.join(mu, Seq("bucket"))
      .select(col("vec_id"), col("bucket"),
        (dotF(col("embedding"), col("mud")) / (col("nrm") * col("munrm")))
          .as("keep"))
    val pr = e.alias("x").join(e.alias("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b2"),
        col("x.bucket").as("bucket"),
        (dotF(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))).as("cs"))
      .filter(col("cs") >= 0.45)
    val dup = pr.select(col("a").as("vec_id"), col("b2").as("partner"))
      .unionAll(pr.select(col("b2").as("vec_id"), col("a").as("partner")))
    val rem = dup
      .join(kp.select(col("vec_id"), col("bucket").as("bucket_d"),
        col("keep").as("keep_d")), Seq("vec_id"))
      .join(kp.select(col("vec_id").as("partner"), col("keep").as("keep_p")),
        Seq("partner"))
      .filter(col("keep_p") < col("keep_d")
        || (col("keep_p") === col("keep_d") && col("partner") < col("vec_id")))
      .select(col("vec_id"), col("bucket_d").as("bucket")).distinct()
    e.groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
      .join(pr.groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs")),
        Seq("bucket"), "left")
      .join(rem.groupBy(col("bucket")).agg(count(lit(1)).as("n_removed")),
        Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
      .withColumn("kept_ppm",
        expr("((n_docs - n_removed) * 1000000) div n_docs"))
      .orderBy(col("bucket"))
  }

  /** Panel pairs scored with the EXACT-INTEGER cosine c9 =
    * floor(cos·1e9): floor of bit-identical doubles, so every
    * downstream decision (kNN ranking, margin arithmetic) is integer
    * math both engines reproduce exactly. Ties in c9 break on the
    * neighbor id. Shared by q355 (panel) and q356 (bucket-confined).
    */
  private def c9(x: String, y: String): Column =
    floor((dotF(col(s"$x.embedding"), col(s"$y.embedding"))
      / (col(s"$x.nrm") * col(s"$y.nrm"))) * lit(1.0e9)).cast("long")

  private def duckC9(x: String, y: String): String =
    s"CAST(floor(${duckCos(x, y)} * 1000000000.0) AS BIGINT)"

  /** q355 — margin-based mining candidates (Artetxe & Schwenk, ACL
    * 2019; the CCMatrix scoring): a pair is interesting not when its
    * raw cosine is high but when it is high RELATIVE to each side's
    * neighborhood — margin(x,y) = cos(x,y) / (Σ_{z∈NN4(x)} cos(x,z) +
    * Σ_{z∈NN4(y)} cos(y,z)) / (2·4)). Exact integer form: margin_ppm
    * = (1e6 · 2·4 · c9(x,y)) div (s9(x) + s9(y)) where s9 is the
    * exact BIGINT sum of the side's top-4 c9 scores — order-free, no
    * double averaging. Runs on the deterministic [[CosinePanelVecs]]
    * panel (q49's exact track); top-100 by (margin desc, ids), the
    * mining shortlist a bitext/near-pair curation pass hands to
    * review. Scale shape: panel-bounded quadratic (the exactness
    * carve-out); [[q356]] is the full-corpus bucketed path. The
    * neighborhood stage is [[graft.functions.TopKAgg]] — the same
    * (c9 desc, id asc) top-4 selection the oracle's window expresses,
    * but as a fixed-state partial aggregate (≤4 pairs per group per
    * partial; a window would sort the whole panel-squared relation) —
    * and each cosine is computed once on the canonical a<b half, the
    * mirror direction derived by swapping columns, not re-scoring.
    */
  val q355 = oracled(
    "q355_margin_mining",
    "margin-scored pair mining (CCMatrix): top-100 panel pairs by cos relative to both sides' top-4 neighborhoods",
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id < $CosinePanelVecs),
       sc AS (SELECT x.vec_id AS a, y.vec_id AS b2, ${duckC9("x", "y")} AS c9
         FROM e x JOIN e y ON x.vec_id <> y.vec_id),
       nn AS (SELECT a, SUM(c9) AS s9 FROM (
           SELECT a, c9, ROW_NUMBER() OVER (PARTITION BY a
             ORDER BY c9 DESC, b2) AS rn FROM sc) t
         WHERE rn <= 4 GROUP BY a),
       mg AS (SELECT s.a, s.b2,
           CAST((1000000 * 8 * s.c9) // (nx.s9 + ny.s9) AS BIGINT) AS margin_ppm
         FROM sc s JOIN nn nx ON nx.a = s.a JOIN nn ny ON ny.a = s.b2
         WHERE s.a < s.b2 AND nx.s9 + ny.s9 > 0)
       SELECT a AS vec_a, b2 AS vec_b, margin_ppm FROM (
         SELECT a, b2, margin_ppm,
           ROW_NUMBER() OVER (ORDER BY margin_ppm DESC, a, b2) AS rn FROM mg) t
       WHERE rn <= 100
       ORDER BY margin_ppm DESC, vec_a, vec_b""") { (s, dir) =>
    val e = withNorm(Tables.embeddings(s, dir))
      .filter(col("vec_id") < CosinePanelVecs)
    // score each unordered pair ONCE (a<b); mirror by column swap
    val half = e.alias("x").join(e.alias("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b2"),
        c9("x", "y").as("c9"))
    val sym = half.unionAll(
      half.select(col("b2").as("a"), col("a").as("b2"), col("c9")))
    // top-4 neighborhood per side as a bounded aggregate, not a window
    // (panel ≥ 5 members at every fixture scale, so tk has 4 entries)
    val nn = sym.groupBy(col("a"))
      .agg(graft.functions.TopKAgg.topKAgg(col("c9"), col("b2"), 4).as("tk"))
      .select(col("a"), expr("tk[0] + tk[2] + tk[4] + tk[6]").as("s9"))
    half
      .join(nn.select(col("a"), col("s9").as("s9x")), Seq("a"))
      .join(nn.select(col("a").as("b2"), col("s9").as("s9y")), Seq("b2"))
      .filter(col("s9x") + col("s9y") > 0)
      .select(col("a").as("vec_a"), col("b2").as("vec_b"),
        expr("(1000000 * 8 * c9) div (s9x + s9y)").as("margin_ppm"))
      .orderBy(col("margin_ppm").desc, col("vec_a"), col("vec_b"))
      .limit(100)
  }

  /** q356 — the full-corpus scale path of [[q355]]: candidates and
    * neighborhoods CONFINED to the sign-LSH bucket (q321's Σ|bucket|²
    * carve-out — no panel bound, no all-pairs anywhere). Buckets can
    * hold fewer than 4 neighbors, so the margin generalizes to the
    * unequal-k rational: margin = cos · 2·k_x·k_y / (s_x·k_y +
    * s_y·k_x), all BIGINT (max |term| ≈ 3.2e16 ≪ 2^63). The
    * denominator-positive guard and the a<b canonical orientation are
    * shared with q355, as is the bounded-aggregate neighborhood stage
    * (TopKAgg over the mirrored half — k_a = size(tk)/2 recovers the
    * per-side neighbor count the unequal-k rational needs); top-100
    * by (margin desc, ids).
    */
  val q356 = oracled(
    "q356_margin_lsh",
    "full-corpus margin mining inside sign-LSH buckets: top-100 pairs by neighborhood-relative cosine",
    s"""WITH b AS (
         SELECT vec_id, embedding,
           ${(0 until 8).map(duckBucketBit).mkString(" + ")} AS bucket
         FROM embeddings),
       sc AS (SELECT x.vec_id AS a, y.vec_id AS b2, ${duckC9("x", "y")} AS c9
         FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       nn AS (SELECT a, SUM(c9) AS s9, CAST(COUNT(*) AS BIGINT) AS k FROM (
           SELECT a, c9, ROW_NUMBER() OVER (PARTITION BY a
             ORDER BY c9 DESC, b2) AS rn FROM sc) t
         WHERE rn <= 4 GROUP BY a),
       mg AS (SELECT s.a, s.b2,
           CAST((1000000 * 2 * nx.k * ny.k * s.c9)
             // (nx.s9 * ny.k + ny.s9 * nx.k) AS BIGINT) AS margin_ppm
         FROM sc s JOIN nn nx ON nx.a = s.a JOIN nn ny ON ny.a = s.b2
         WHERE s.a < s.b2 AND nx.s9 * ny.k + ny.s9 * nx.k > 0)
       SELECT a AS vec_a, b2 AS vec_b, margin_ppm FROM (
         SELECT a, b2, margin_ppm,
           ROW_NUMBER() OVER (ORDER BY margin_ppm DESC, a, b2) AS rn FROM mg) t
       WHERE rn <= 100
       ORDER BY margin_ppm DESC, vec_a, vec_b""") { (s, dir) =>
    val b = withNorm(Tables.embeddings(s, dir)).withColumn("bucket", bucketCol)
    val half = b.alias("x").join(b.alias("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b2"),
        c9("x", "y").as("c9"))
    val sym = half.unionAll(
      half.select(col("b2").as("a"), col("a").as("b2"), col("c9")))
    val nn = sym.groupBy(col("a"))
      .agg(graft.functions.TopKAgg.topKAgg(col("c9"), col("b2"), 4).as("tk"))
      .select(col("a"),
        // sum of the ≤4 kept scores (even slots) + their count: a
        // bucket-starved side keeps fewer than 4 neighbors
        expr("""aggregate(sequence(0, CAST(size(tk) div 2 - 1 AS INT)),
                 0L, (acc, i) -> acc + tk[i * 2])""").as("s9"),
        expr("CAST(size(tk) div 2 AS BIGINT)").as("k"))
    half
      .join(nn.select(col("a"), col("s9").as("s9x"), col("k").as("kx")), Seq("a"))
      .join(nn.select(col("a").as("b2"), col("s9").as("s9y"), col("k").as("ky")),
        Seq("b2"))
      .filter(col("s9x") * col("ky") + col("s9y") * col("kx") > 0)
      .select(col("a").as("vec_a"), col("b2").as("vec_b"),
        expr("(1000000 * 2 * kx * ky * c9) div (s9x * ky + s9y * kx)")
          .as("margin_ppm"))
      .orderBy(col("margin_ppm").desc, col("vec_a"), col("vec_b"))
      .limit(100)
  }

  val all: Seq[GQuery] = Seq(q49, q50, q51, q74, q150, q201, q209, q231,
    q249, q269, q305, q315, q316, q317, q318, q321, q325, q327, q330,
    q335, q354, q355, q356)
}
