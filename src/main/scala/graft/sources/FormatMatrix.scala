package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format matrix beyond parquet — the one SURVEY §2.2 absent
  * category ("scans/sources beyond Kafka": the reference reads ONLY its
  * Kafka consumer, `main.go:1-655` opens no file) previously exercised
  * only at spec level (FormatsSpec/SourcesSpec). This wires it into the
  * oracle-bearing query surface: `documents` is mirrored ONCE per
  * (session, sf dir) into ORC, JSON-lines and CSV under a session temp
  * dir, each mirror is read back through its own Spark source with an
  * EXPLICIT schema, and the wired query emits a per-format census that
  * must agree format-for-format — count, Σ n_chars, distinct langs,
  * id range, and order-independent content digests (Σ of 60-bit md5 row
  * hashes in exact decimal(38,0) arithmetic — the decimal-sum discipline
  * of `docs_source_digest`, identical in any summation order; md5 rather
  * than xxhash64 because the digest must also be DuckDB-replayable and
  * xxhash64 is not a DuckDB built-in — see the census note below). The census is
  * format-INVARIANT by construction, so DuckDB oracles it from the
  * parquet table alone: any reader that drops a row, re-types a column,
  * or mangles a string on the way through a format shows up as a value
  * mismatch on that format's row.
  *
  * 100 TB notes, the reason each reader is configured the way it is:
  *  - EXPLICIT schemas everywhere. Inference reads the data twice and
  *    can type-drift between samples (a column that is all-integer in
  *    the sampled split and decimal elsewhere) — at 100 TB the second
  *    read alone is disqualifying.
  *  - CSV is written quoteAll + escaped and read single-line. Records
  *    with embedded newlines would need multiLine=true, which makes the
  *    file UNSPLITTABLE (one task per file, however big). The honest
  *    rule at scale: CSV only for export/interop of newline-free
  *    columns; real record framing (parquet/ORC, or JSON-lines where
  *    each record is one physical line) for anything an engine must
  *    split. The corpus' text is newline-free (verified at every SF —
  *    the census digest would catch a violation as a row-count change).
  *  - JSON-lines (the default Spark JSON source, NOT multiLine) keeps
  *    one record per line — splittable, schema'd, self-describing; the
  *    mode=FAILFAST option makes a malformed record a loud task error
  *    instead of a silent null row.
  *  - ORC round-trips types losslessly and carries predicate pushdown /
  *    column pruning like parquet (OrcSourceSpec pins both on the
  *    mirror). It is the "other columnar warehouse format" a user
  *    switching from the reference ecosystem most likely has on disk.
  *  - JDBC (round 14 — previously "config, not code" on a no-DB-server
  *    rationale that embedded Derby voids: /opt/spark/jars ships
  *    derby/derbyshared/derbytools, and `jdbc:derby:memory:` needs no
  *    server). The census leg writes `documents` through Spark's JDBC
  *    writer into an in-memory Derby database and reads it back with
  *    the THREE options a 100 TB JDBC scan cannot omit:
  *    `partitionColumn`/`lowerBound`/`upperBound` + `numPartitions` —
  *    without them the read is ONE task holding one connection that
  *    pulls the entire table through a single cursor, however many
  *    executors idle (bounds come from a one-row min/max aggregate
  *    memoized at mirror-build time; rows outside the bounds still
  *    arrive — the first/last stride is unbounded — so a stale-bounds
  *    read is slow, never wrong). `pushDownPredicate` stays at its
  *    default (true) so later filters reach the database as WHERE
  *    clauses; types are pinned by selecting/casting to [[docsSchema]]
  *    on the way out rather than trusting dialect inference (Derby
  *    returns CLOB for the strings Spark wrote — the cast is the
  *    explicit-schema rule in JDBC clothing). The digest makes any
  *    driver-level string/number mangling a loud census mismatch.
  *  - AVRO — the Kafka-ecosystem serialization a reference user most
  *    likely has on disk — is wired through the FULLY-QUALIFIED source
  *    name. The short name `format("avro")` fails in this environment:
  *    Spark's source lookup special-cases "avro" as an external module
  *    when no service-registered provider is found, and the separately
  *    packaged `spark-avro` module jar is absent from /opt/spark/jars.
  *    But Spark 4.1 BUNDLES the complete implementation
  *    (`org.apache.spark.sql.avro.AvroFileFormat` + (de)serializers)
  *    inside spark-sql itself — only the META-INF service registration
  *    is missing — so `format("org.apache.spark.sql.avro.
  *    AvroFileFormat")` reads and writes Avro end-to-end (verified by
  *    the census leg: the whole-row digest matches parquet exactly at
  *    every SF). A deployment with the module jar uses the short name;
  *    both resolve to the same class. Scale notes: row-oriented
  *    container with a block-splittable read like ORC, explicit-schema
  *    rule applies identically, and logical types (decimal/
  *    timestamp-micros) must be declared in the writer schema or they
  *    round-trip as raw longs/bytes — the census catches that as a
  *    digest mismatch rather than silent drift.
  *
  * The mirror itself is the build-once artifact pattern (the
  * clusterMemo/classifierMemo discipline): written under
  * java.io.tmpdir keyed by (session identity, sf dir), so bench's
  * 3-run timing measures the READ path, not repeated conversion.
  */
object FormatMatrix {

  /** Explicit read schema for every mirror — never inferred. */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val cols = docsSchema.fieldNames.map(col).toSeq

  val formats: Seq[String] = Seq("parquet", "orc", "avro", "json", "csv", "jdbc")

  /** The bundled Avro source, addressed by class because the short name
    * "avro" is service-registration-gated (scaladoc above).
    */
  val AvroSource = "org.apache.spark.sql.avro.AvroFileFormat"

  /** One mirror: the filesystem root plus the JDBC leg's coordinates —
    * the in-memory Derby URL and the partitioned-read bounds captured at
    * write time (a one-row min/max aggregate, artifact grain).
    */
  private final case class Mirror(root: String, jdbcUrl: String,
                                  idLo: Long, idHi: Long)

  private val mirrorMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Mirror]

  /** Write the ORC/Avro/JSON/CSV mirrors once per (session, sf dir);
    * returns the mirror root. Idempotent and race-benign (TrieMap memo;
    * a lost race overwrites with identical data).
    */
  def mirrorRoot(spark: SparkSession, dir: String): String =
    mirror(spark, dir).root

  private def mirror(spark: SparkSession, dir: String): Mirror =
    mirrorMemo.getOrElseUpdate((System.identityHashCode(spark), dir), {
      val docs = graft.Tables.read(spark, dir, "documents").select(cols: _*)
      // loud mirror precondition (round-12 advice): single-line CSV
      // cannot round-trip embedded newlines, and Spark's CSV reader
      // deserializes an empty field as NULL — an empty string would
      // flip the csv leg's digest and read as "reader broken" instead
      // of naming the violated precondition. NULLs themselves are FINE
      // (null → empty field → null, and concat_ws skips them
      // identically in both engines) — only empties and newlines are
      // the ambiguity. One bounded probe per (session, sf dir).
      val strCols = Seq("text", "lang", "source")
      val violated = docs.where(
          strCols.map(c => col(c) === "" ||
            col(c).contains("\n") || col(c).contains("\r")).reduce(_ || _))
        .limit(1).count()
      require(violated == 0L, "FormatMatrix: corpus violates the CSV " +
        "mirror precondition (empty string or embedded newline in " +
        "text/lang/source) — such values cannot round-trip identically " +
        "through a single-line CSV source; exclude them or mirror " +
        "without the csv leg (scaladoc)")
      val root = java.nio.file.Files
        .createTempDirectory("graft-format-matrix").toFile.getAbsolutePath
      // session-temp artifact, recursively removed at JVM exit — the
      // memo makes reads cheap in-session, the hook keeps repeated
      // harness runs from accreting mirrors in the temp dir
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(root))
      }
      docs.write.mode("overwrite").orc(s"$root/orc")
      docs.write.mode("overwrite").format(AvroSource).save(s"$root/avro")
      docs.write.mode("overwrite").json(s"$root/json")
      docs.write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true").option("escape", "\"")
        .csv(s"$root/csv")
      // JDBC leg: embedded in-memory Derby, one database per mirror
      // (name = the unique temp-dir leaf, so concurrent sessions never
      // collide); Derby's engine log is pointed into the mirror root
      // instead of polluting the process cwd.
      // LOCAL-MODE-ONLY precondition (round-14 ADVICE): jdbc:derby:memory:
      // is JVM-local, and Spark's JDBC writer/partitioned reader run on
      // EXECUTORS — on a real cluster each executor JVM would ;create=true
      // its own empty database and the read would return partial data or
      // fail confusingly. A cluster deployment points this leg at a real
      // DB server URL; the in-memory form exists to exercise Spark's JDBC
      // source machinery (striping, pushdown, type pinning) offline.
      require(spark.sparkContext.master.startsWith("local"),
        "FormatMatrix jdbc leg requires local master: jdbc:derby:memory: " +
        "databases are JVM-local and executors on a cluster would each " +
        "see (or create) a different empty database — use a server-backed " +
        "JDBC URL for cluster runs")
      System.setProperty("derby.stream.error.file", s"$root/derby.log")
      val dbName = new java.io.File(root).getName
      val url = s"jdbc:derby:memory:$dbName;create=true"
      docs.write.mode("overwrite").format("jdbc")
        .option("url", url).option("dbtable", "documents").save()
      val b = docs.agg(min(col("doc_id")), max(col("doc_id"))).collect().head
      Mirror(root, url, b.getLong(0), b.getLong(1))
    })

  /** Read `documents` back through `fmt`'s source with the explicit
    * schema ("parquet" reads the original table — the reference leg the
    * other four must match).
    */
  def readBack(spark: SparkSession, dir: String, fmt: String): DataFrame = fmt match {
    case "parquet" => graft.Tables.read(spark, dir, "documents").select(cols: _*)
    case "orc" => spark.read.schema(docsSchema).orc(s"${mirrorRoot(spark, dir)}/orc")
    case "avro" => spark.read.schema(docsSchema)
      .format(AvroSource).load(s"${mirrorRoot(spark, dir)}/avro")
    case "json" => spark.read.schema(docsSchema)
      .option("mode", "FAILFAST").json(s"${mirrorRoot(spark, dir)}/json")
    case "csv" => spark.read.schema(docsSchema)
      .option("header", "true").option("escape", "\"").option("mode", "FAILFAST")
      .csv(s"${mirrorRoot(spark, dir)}/csv")
    case "jdbc" =>
      val m = mirror(spark, dir)
      spark.read.format("jdbc")
        .option("url", m.jdbcUrl)
        .option("dbtable", "documents")
        // the 100 TB parallel-read contract (scaladoc): stride doc_id
        // across 8 concurrent cursors; pushDownPredicate stays default-on
        .option("partitionColumn", "doc_id")
        .option("lowerBound", m.idLo.toString)
        .option("upperBound", m.idHi.toString)
        .option("numPartitions", "8")
        .load()
        // pin names/types to docsSchema (Derby hands back CLOBs for the
        // strings Spark wrote — the explicit-schema rule, JDBC form)
        .select(docsSchema.fields.map(f =>
          col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    case other => throw new IllegalArgumentException(
      s"formatCensus: unknown format '$other' (expected one of $formats)")
  }

  /** The format-invariant census of one re-read frame. The content
    * digest is the `docs_source_digest` 60-bit md5 row hash summed in
    * exact decimal(38,0) — identical in any row order, natively
    * replayable in DuckDB (xxhash64 is NOT, for strings past the
    * 32-byte closed-form bound — md5 is the cross-engine digest the
    * repo standardized on for whole-row integrity), covering EVERY
    * mirrored column so a reader that mangles any value on any row
    * moves that format's digest. Rendered as a string so both engines
    * hash identical decimal digits.
    */
  private def census(df: DataFrame, fmt: String): DataFrame =
    df.select(col("n_chars"), col("lang"), col("doc_id"),
        conv(substring(md5(concat_ws("\u0001",
          docsSchema.fieldNames.map(c => col(c).cast("string")).toSeq: _*)), 1, 15),
          16, 10).cast("decimal(38,0)").as("__h"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        count_distinct(col("lang")).as("n_langs"),
        min(col("doc_id")).as("id_min"),
        max(col("doc_id")).as("id_max"),
        sum(col("__h")).cast("string").as("digest"))
      .select(lit(fmt).as("format"), col("*"))

  /** One row per format; every non-`format` column must be identical
    * across the rows (and equal to the parquet leg the oracle
    * recomputes). Scale shape: |formats| independent scans, each a full
    * map-side-combining single aggregate — no joins, no windows; the
    * file mirrors are read with the same splittable parallelism as the
    * original (ORC/CSV/JSON-lines all split by file offset) and the
    * JDBC leg fans out across its partitionColumn strides.
    */
  def formatCensus(spark: SparkSession, dir: String): DataFrame =
    formats.map(f => census(readBack(spark, dir, f), f))
      .reduce(_ unionByName _)
}
