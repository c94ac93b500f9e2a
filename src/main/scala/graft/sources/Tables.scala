package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated fixtures (TESTDATA.md).
  *
  * Parquet is self-describing, so no schema is forced on read — Catalyst
  * gets full pushdown + pruning on the scan (`PushedFilters`/`ReadSchema`
  * in explain). At 100 TB these would be partitioned tables behind a
  * catalog; the single-file layout here is the fixture shape only, and
  * nothing below assumes a row count or a single partition.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** events.ts normalization. The fixture generator has shipped two
    * encodings across rounds: TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — read as raw nanos under
    * `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to micros,
    * matching DuckDB's own nanos→micros truncation) and, since round 7,
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ).
    * Downstream code and every oracle assume a session-zone TIMESTAMP
    * under the repo's pinned UTC session, so both encodings normalize to
    * TimestampType here — dispatch on the self-described file type, no
    * conf sniffing. The NTZ→LTZ cast reinterprets the wall-clock in the
    * session zone (UTC), i.e. the identical micros instant.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // Defensive: a ns-encoded file fails Spark's parquet schema inference
    // ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))") before the
    // LongType dispatch below can run unless the session reads nanos as
    // raw longs. The repo's mains set this at build time; this keeps the
    // "no conf needed by the caller" contract true for any session.
    // DOCUMENTED MUTATION (ADVICE r8): for a caller-supplied session that
    // did NOT set the conf, this writes it session-wide — a later
    // nanos-parquet read on that session then sees raw longs instead of
    // an error. Guarded so a caller's explicit setting (either value) is
    // never overridden; the alternative (a cloned session per read) would
    // hand back DataFrames bound to a different session than the caller's
    // own tables, which breaks view registration and conf-sensitive plans.
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Headerless TSV ratings reader matching the reference's input shape
    * (SVDMovieLensSparkJava.java:191,195-197 — tab-split, positional int
    * columns; the 4th MovieLens column is a timestamp the reference drops,
    * we keep it). Used by the recommender pipeline when fed real
    * MovieLens-format files.
    */
  def ratingsTsv(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", IntegerType, nullable = false),
      StructField("item_id", IntegerType, nullable = false),
      StructField("rating", IntegerType, nullable = false),
      StructField("ts", LongType, nullable = true)))
    s.read.schema(schema).option("sep", "\t").csv(path)
  }
}
