package graft

import graft.sources.{Jdbc, RemoteFile}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.DriverManager

/** End-to-end JDBC surface against embedded Derby (on the Spark
  * classpath for the Hive metastore) — turns the "Spark JDBC connector"
  * production story from option-building scaffolding into tested
  * round-trips: partitioned parallel reads, write-back, BLOB columns
  * (the LOB analog) with the `fetchsize` streaming knob, plus the
  * chunked RemoteFile LOB stream.
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private lazy val conn = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute(
      "CREATE TABLE emp (id INT NOT NULL, name VARCHAR(64), sal DOUBLE)")
    (0 until 100).foreach { i =>
      st.execute(s"INSERT INTO emp VALUES ($i, 'name_$i', ${i * 1.5})")
    }
    st.execute("CREATE TABLE lobs (id INT NOT NULL, payload BLOB(10M))")
    val ps = c.prepareStatement("INSERT INTO lobs VALUES (?, ?)")
    (0 until 4).foreach { i =>
      val payload = Array.tabulate[Byte](256 * 1024 + i)(j =>
        ((i * 31 + j) & 0xFF).toByte)
      ps.setInt(1, i); ps.setBytes(2, payload); ps.execute()
    }
    c
  }

  private def baseOpts(extra: Map[String, String]): Map[String, String] =
    extra + ("driver" -> driver)

  test("partitioned parallel read splits on bounds and round-trips rows") {
    conn // force setup
    val opts = Jdbc.readOptions(url, "emp", parallel = 4,
      partitionColumn = Some("id"), lowerBound = Some(0L),
      upperBound = Some(100L))
    val df = Jdbc.read(spark, baseOpts(opts))
    // PARALLEL=4 → 4 JDBC range partitions, the DP worker-pool analog
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    val r = df.filter("id = 42").collect().head
    assert(r.getAs[String]("NAME") == "name_42")
    assert(r.getAs[Double]("SAL") == 63.0)
  }

  test("Spark write-back → JDBC → Spark read round-trip") {
    conn
    import spark.implicits._
    val out = (0 until 50).map(i => (i, s"w_$i")).toDF("id", "val")
    out.write.format("jdbc")
      .options(baseOpts(Map("url" -> url, "dbtable" -> "writeback")))
      .save()
    val back = Jdbc.read(spark,
      baseOpts(Jdbc.readOptions(url, "writeback")))
    assert(back.count() == 50)
    assert(back.selectExpr("sum(id)").collect().head.getLong(0) == 1225L)
  }

  test("BLOB columns arrive as BinaryType via fetchsize-streamed reads") {
    conn
    val df = Jdbc.read(spark,
      baseOpts(Jdbc.readOptions(url, "lobs", fetchSize = 2)))
    assert(df.schema("PAYLOAD").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val sizes = df.selectExpr("ID", "cast(length(PAYLOAD) as bigint) AS n")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes == (0 until 4).map(i => i -> (256L * 1024 + i)).toMap)
    // content integrity on one payload
    val p2 = df.filter("ID = 2").select("PAYLOAD")
      .collect().head.getAs[Array[Byte]](0)
    assert(p2(0) == ((2 * 31) & 0xFF).toByte && p2.length == 256 * 1024 + 2)
  }

  test("dbtable subquery pushes a row subset through the JDBC scan") {
    conn
    // Oracle deployments inject `AS OF SCN` the same way (dbtableFor);
    // Derby has no flashback syntax, so the e2e exercises the subquery
    // wrapping itself.
    val opts = baseOpts(Jdbc.readOptions(url,
      "(SELECT id, sal FROM emp WHERE id < 10) sub"))
    val df = Jdbc.read(spark, opts)
    assert(df.count() == 10)
    assert(df.columns.toSeq.map(_.toLowerCase) == Seq("id", "sal"))
  }

  test("flashback clause generation: AS OF SCN and AS OF TIMESTAMP subquery text") {
    // database.py:177-181 / sql.py parity: the snapshot clause is a
    // string-level dbtable subquery. Pin the generated text for both
    // forms so an Oracle deployment gets exactly the flashback syntax.
    assert(Jdbc.dbtableFor("HR.EMP", asOfScn = Some(8675309L)) ==
      "(SELECT * FROM HR.EMP AS OF SCN 8675309)")
    // ISO timestamp: T → space, trailing zone offset / Z stripped,
    // Oracle TO_TIMESTAMP with fractional-second format
    assert(Jdbc.dbtableFor("HR.EMP",
        asOfTimestampIso = Some("2026-08-14T12:34:56.789+02:00")) ==
      "(SELECT * FROM HR.EMP AS OF TIMESTAMP " +
        "TO_TIMESTAMP('2026-08-14 12:34:56.789', 'YYYY-MM-DD HH24:MI:SS.FF'))")
    assert(Jdbc.dbtableFor("HR.EMP",
        asOfTimestampIso = Some("2026-08-14T12:34:56Z")) ==
      "(SELECT * FROM HR.EMP AS OF TIMESTAMP " +
        "TO_TIMESTAMP('2026-08-14 12:34:56', 'YYYY-MM-DD HH24:MI:SS.FF'))")
    // SCN wins when both are supplied (FLASHBACK_SCN precedence, as
    // the directive compiler resolves the pair); neither → bare table
    assert(Jdbc.dbtableFor("T", Some(5L), Some("2026-01-01T00:00:00Z")) ==
      "(SELECT * FROM T AS OF SCN 5)")
    assert(Jdbc.dbtableFor("T") == "T")
    // and the clause lands verbatim in the read options' dbtable
    val opts = Jdbc.readOptions("jdbc:derby:memory:x", "T",
      asOfScn = Some(42L))
    assert(opts("dbtable") == "(SELECT * FROM T AS OF SCN 42)")
  }

  test("get_db_timezone parses region names and offsets from a live connection") {
    conn
    // Derby stands in for Oracle's `SELECT DBTIMEZONE FROM DUAL`; the
    // VALUES form returns the same single-cell shape
    val off = Jdbc.dbTimezone(conn, "VALUES '+05:30'")
    assert(off == java.time.ZoneOffset.ofHoursMinutes(5, 30))
    val neg = Jdbc.dbTimezone(conn, "VALUES '-08:00'")
    assert(neg == java.time.ZoneOffset.ofHours(-8))
    val utc = Jdbc.dbTimezone(conn, "VALUES 'UTC'")
    assert(utc == java.time.ZoneOffset.UTC)
    // region names collapse to their current offset (reference parity)
    val regional = Jdbc.dbTimezone(conn, "VALUES 'America/New_York'")
    assert(regional.getTotalSeconds == java.time.ZoneId
      .of("America/New_York").getRules
      .getOffset(java.time.Instant.now()).getTotalSeconds)
    // to_db_timezone renders an instant in the DB zone
    val at = java.time.Instant.parse("2026-01-15T12:00:00Z")
    val dt = Jdbc.toDbTimezone(at, conn, "VALUES '+05:30'")
    assert(dt.toString == "2026-01-15T17:30+05:30")
  }

  test("live object-type validation reads the vendor's metadata, not the static lattice") {
    import graft.directives.ObjectTypeValidator
    import graft.model.JobMode
    conn // force setup
    val meta = conn.getMetaData
    // Derby exposes tables, views, synonyms, schemas, and stored
    // procedures through DatabaseMetaData — those kinds validate live
    assert(ObjectTypeValidator.validateLive(meta, JobMode.Table, "table") == "TABLE")
    assert(ObjectTypeValidator.validateLive(meta, JobMode.Schema, "VIEW") == "VIEW")
    assert(ObjectTypeValidator.validateLive(meta, JobMode.Full, "SYNONYM") == "SYNONYM")
    assert(ObjectTypeValidator.validateLive(meta, JobMode.Schema, "PROCEDURE") == "PROCEDURE")
    assert(ObjectTypeValidator.validateLive(meta, JobMode.Full, "USER") == "USER")
    // TABLESPACE passes the static Full-mode lattice but is a physical
    // kind no vendor-neutral JDBC connection can observe — the live
    // tier must reject it (Derby genuinely has none) with the live list
    assert(ObjectTypeValidator.validate(JobMode.Full, "TABLESPACE") == "TABLESPACE")
    val e = intercept[graft.model.Exceptions.InvalidObjectType] {
      ObjectTypeValidator.validateLive(meta, JobMode.Full, "TABLESPACE")
    }
    assert(e.getMessage.contains("Valid types:")
      && e.getMessage.contains("jdbc:derby:memory:graftdb"))
    // mode lattice still applies under the live tier: USER is not a
    // Table-mode kind even though the vendor can observe users
    intercept[graft.model.Exceptions.InvalidObjectType] {
      ObjectTypeValidator.validateLive(meta, JobMode.Table, "USER")
    }
    // cached per (url, mode) — second call hits the memo (no new
    // metadata round-trip; observable only as object identity here)
    assert(ObjectTypeValidator.validTypesLive(meta, JobMode.Full) eq
      ObjectTypeValidator.validTypesLive(meta, JobMode.Full))
  }

  test("chunked LOB stream round-trips a multi-MB payload in bounded chunks") {
    val dir = graft.TempDirs.create("lobstream")
    val payload = Array.tabulate[Byte](3 * 1024 * 1024 + 123)(i =>
      (i * 131 & 0xFF).toByte)
    // write side: source arrives as bounded chunks, never materialized
    val written = RemoteFile.writeChunks(spark, s"$dir/lob.bin",
      payload.grouped(RemoteFile.DefaultChunkSize).map(identity))
    assert(written == payload.length.toLong)
    // read side: LobStreamer semantics — position advances, chunks are
    // bounded, completion flips on the short final chunk
    val st = RemoteFile.openChunked(spark, s"$dir/lob.bin")
    try {
      var total = 0L; var maxChunk = 0; var n = 0
      st.chunks().foreach { c =>
        assert(c.length <= RemoteFile.DefaultChunkSize)
        maxChunk = math.max(maxChunk, c.length); total += c.length; n += 1
      }
      assert(st.complete && st.position == payload.length.toLong)
      assert(total == payload.length.toLong)
      assert(n == (payload.length + RemoteFile.DefaultChunkSize - 1) /
        RemoteFile.DefaultChunkSize)
    } finally st.close()
    // chunked copy preserves content exactly
    RemoteFile.copyChunked(spark, s"$dir/lob.bin", s"$dir/lob2.bin")
    val back = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/lob2.bin"))
    assert(java.util.Arrays.equals(back, payload))
  }
}
