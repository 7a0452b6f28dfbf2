package graft

import graft.directives._
import graft.model.Stage
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

class DirectiveSpec extends AnyFunSuite {

  test("TABLE_EXISTS_ACTION maps 4-way onto SaveMode") {
    assert(TableExistsAction.modes("TRUNCATE") == ((SaveMode.Overwrite, true)))
    assert(TableExistsAction.modes("REPLACE") == ((SaveMode.Overwrite, false)))
    assert(TableExistsAction.modes("APPEND") == ((SaveMode.Append, false)))
    assert(TableExistsAction.modes("SKIP") == ((SaveMode.Ignore, false)))
    intercept[IllegalArgumentException](TableExistsAction("MERGE"))
  }

  test("registry instantiates directives by JSON name (request.py:163-169 parity)") {
    assert(DirectiveCompiler.fromJson("INCLUDE_SCHEMA", Some("HR"), None) ==
      IncludeSchema("HR"))
    assert(DirectiveCompiler.fromJson("PARALLEL", Some("4"), None) == Parallel(4))
    assert(DirectiveCompiler.fromJson("REMAP_SCHEMA", Some("HR2"), Some("HR")) ==
      RemapSchema("HR", "HR2"))
    assert(DirectiveCompiler.fromJson("OID", Some("false"), None) ==
      TransformDirective("OID", "false"))
    assert(DirectiveCompiler.fromJson("DELETE_FILES", Some("1"), None) ==
      DeleteFiles())
    intercept[IllegalArgumentException](
      DirectiveCompiler.fromJson("NO_SUCH", Some("x"), None))
    intercept[IllegalArgumentException](
      DirectiveCompiler.fromJson("REMAP_SCHEMA", Some("B"), None)) // no old
  }

  test("validation rejects out-of-domain values eagerly (pydantic parity)") {
    intercept[IllegalArgumentException](Compression("MAYBE"))
    intercept[IllegalArgumentException](CompressionAlgorithm("TURBO"))
    intercept[IllegalArgumentException](Parallel(0))
    intercept[IllegalArgumentException](FlashbackTime("not-iso"))
    intercept[IllegalArgumentException](Logtime("SOMETIMES"))
  }

  test("TARGET_FILE_SIZE parses FILESIZE-style units and compiles to a byte bound") {
    assert(TargetFileSize.parse("512") == TargetFileSize(512L))
    assert(TargetFileSize.parse("64kb") == TargetFileSize(64L << 10))
    assert(TargetFileSize.parse("128MB") == TargetFileSize(128L << 20))
    assert(TargetFileSize.parse("1GB") == TargetFileSize(1L << 30))
    assert(TargetFileSize.parse("2TB") == TargetFileSize(2L << 40))
    assert(DirectiveCompiler.fromJson("TARGET_FILE_SIZE", Some("128MB"), None) ==
      TargetFileSize(128L << 20))
    assert(DirectiveCompiler.compile(TargetFileSize(7L)) ==
      Seq(Effect.TargetFileBytes(7L)))
    intercept[graft.model.Exceptions.BadRequest](TargetFileSize.parse("fast"))
    intercept[IllegalArgumentException](TargetFileSize(0L))
    // overflow is a rejected request, never a silently wrapped Long
    intercept[graft.model.Exceptions.BadRequest](
      TargetFileSize.parse("16777217TB")) // (2^24+1)<<40 wraps to 1TB
    intercept[graft.model.Exceptions.BadRequest](
      TargetFileSize.parse("99999999999999999999")) // > Long digits
  }

  test("compile: filters restrict object selection") {
    val effects = DirectiveCompiler.compile(IncludeTable(Seq("lineitem", "orders")))
    val sel = effects.collectFirst { case Effect.ObjectSelection(f) => f }.get
    assert(sel(Seq("lineitem", "orders", "customer")) == Seq("lineitem", "orders"))
  }

  test("compile: compression maps to writer codec options") {
    assert(DirectiveCompiler.compile(Compression("NONE"))
      .contains(Effect.WriterOption("compression", "none")))
    assert(DirectiveCompiler.compile(CompressionAlgorithm("HIGH"))
      .contains(Effect.WriterOption("compression", "zstd")))
  }

  test("compile: physical switches are accepted-and-ignored, never fail") {
    PhysicalSwitch.names.foreach { n =>
      val eff = DirectiveCompiler.compile(PhysicalSwitch(n, "whatever"))
      assert(eff.exists { case Effect.Ignored(_) => true; case _ => false })
    }
  }

  test("DELETE_FILES is a POST-stage directive") {
    assert(DeleteFiles().stage == Stage.Post)
    assert(IncludeSchema("HR").stage == Stage.DataPump)
  }

  test("compile: parallel/flashback/estimate effects") {
    assert(DirectiveCompiler.compile(Parallel(8)).contains(Effect.SetParallel(8)))
    assert(DirectiveCompiler.compile(FlashbackScn(12345L))
      .contains(Effect.SnapshotPin("12345")))
    assert(DirectiveCompiler.compile(EstimateOnly(true))
      .contains(Effect.EstimateOnly))
  }
}
