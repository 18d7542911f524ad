package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** B6 fixture — identifier validation pins (main.py:48,60). */
class ModelSpec extends AnyFunSuite {
  test("table identifier regex accepts C identifiers only") {
    assert(Validation.isValidIdentifier("_ok"))
    assert(Validation.isValidIdentifier("ok_2"))
    assert(!Validation.isValidIdentifier("2bad"))
    assert(!Validation.isValidIdentifier("bad-name"))
    assert(!Validation.isValidIdentifier("bad.name"))
    assert(!Validation.isValidIdentifier(""))
  }

  test("host regex ^[\\w.-]+$") {
    assert(Validation.isValidHost("localhost"))
    assert(Validation.isValidHost("my-host.example.com"))
    assert(Validation.isValidHost("10.0.0.1"))
    assert(!Validation.isValidHost("bad host!"))
    assert(!Validation.isValidHost("host:8123"))
  }

  test("filename gate: .csv/.txt case-insensitive") {
    assert(Validation.isSupportedFilename("a.csv"))
    assert(Validation.isSupportedFilename("A.TXT"))
    assert(!Validation.isSupportedFilename("a.parquet"))
  }

  test("error envelope texts match the reference") {
    assert(IngestError.UnsupportedFileType.detail == "Only CSV files are supported")
    assert(IngestError.EmptyFile.detail == "File is empty or invalid format")
    assert(IngestError.TableNotFound("t").detail == "Table 't' not found")
    assert(IngestError.ExportFailed("x").detail == "Export failed: x")
    assert(IngestError.TableNotFound("t").httpStatus == 404)
  }

  test("connection pool key parity host:port:database:username") {
    assert(ConnectionConfig("h", 9000, "db", "u").poolKey == "h:9000:db:u")
  }
}
