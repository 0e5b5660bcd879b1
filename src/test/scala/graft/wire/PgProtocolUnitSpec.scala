package graft.wire

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function corners of the pg v3 frontend: the `$n` rewriter,
  * the statement splitter, parameter decoding, and text rendering. */
class PgProtocolUnitSpec extends AnyFunSuite {

  test("$n rewriting: markers, quotes, identifiers containing $") {
    assert(PgWireServer.rewriteParams("SELECT $1 + $2") ==
      ("SELECT :gp_1 + :gp_2", Set(1, 2)))
    // repeated + out-of-order ordinals survive
    assert(PgWireServer.rewriteParams("SELECT $2, $1, $2")._2 == Set(1, 2))
    // inside string literals and quoted identifiers: untouched
    assert(PgWireServer.rewriteParams("SELECT '$1' AS a, \"$2\" FROM t WHERE x = $3") ==
      ("SELECT '$1' AS a, \"$2\" FROM t WHERE x = :gp_3", Set(3)))
    // '' escape inside a literal does not end it
    assert(PgWireServer.rewriteParams("SELECT 'it''s $1' , $2")._2 == Set(2))
    // pg identifiers may contain $ — "a$1" is a name, not a marker
    assert(PgWireServer.rewriteParams("SELECT a$1 FROM t WHERE b = $1") ==
      ("SELECT a$1 FROM t WHERE b = :gp_1", Set(1)))
    assert(PgWireServer.rewriteParams("SELECT x FROM t$2")._2 == Set.empty)
  }

  test("simple-query splitting: top-level ';' only, empties dropped") {
    assert(PgWireServer.splitStatements("SELECT 1; SELECT 2") == Seq("SELECT 1", "SELECT 2"))
    assert(PgWireServer.splitStatements("SELECT 'a;b'; SELECT \";\"") ==
      Seq("SELECT 'a;b'", "SELECT \";\""))
    assert(PgWireServer.splitStatements(" ;; SELECT 1 ; ") == Seq("SELECT 1"))
    assert(PgWireServer.splitStatements("  ") == Seq.empty)
    // ';' inside comments must not split (pg block comments nest)
    assert(PgWireServer.splitStatements("SELECT 1 -- tail; not a split\n; SELECT 2") ==
      Seq("SELECT 1 -- tail; not a split", "SELECT 2"))
    assert(PgWireServer.splitStatements("SELECT /* a;b /* c; */ d; */ 1; SELECT 2") ==
      Seq("SELECT /* a;b /* c; */ d; */ 1", "SELECT 2"))
    // dollar-quoted bodies are opaque: no split, no marker rewrite
    assert(PgWireServer.splitStatements("SELECT $$a;b$$; SELECT $t$x;y$t$") ==
      Seq("SELECT $$a;b$$", "SELECT $t$x;y$t$"))
    assert(PgWireServer.rewriteParams("SELECT $$not $1$$, $2") ==
      ("SELECT $$not $1$$, :gp_2", Set(2)))
    assert(PgWireServer.rewriteParams("SELECT $tag$ $5 $tag$ , $1")._2 == Set(1))
  }

  test("text parameter decoding follows the declared OID") {
    assert(PgWireServer.decodeTextParam(16, "t") == true)
    assert(PgWireServer.decodeTextParam(16, "f") == false)
    assert(PgWireServer.decodeTextParam(23, "42") == 42)
    assert(PgWireServer.decodeTextParam(20, "9999999999") == 9999999999L)
    assert(PgWireServer.decodeTextParam(701, "1.5") == 1.5d)
    assert(PgWireServer.decodeTextParam(1700, "1.50") == new java.math.BigDecimal("1.50"))
    assert(PgWireServer.decodeTextParam(1082, "2024-03-01") == java.sql.Date.valueOf("2024-03-01"))
    assert(PgWireServer.decodeTextParam(0, "anything") == "anything")
  }

  test("binary parameter decoding: fixed-width network order; others refused") {
    def be(n: Int) = java.nio.ByteBuffer.allocate(4).putInt(n).array()
    def be8(n: Long) = java.nio.ByteBuffer.allocate(8).putLong(n).array()
    assert(PgWireServer.decodeBinaryParam(23, be(42)) == 42)
    assert(PgWireServer.decodeBinaryParam(20, be8(-7L)) == -7L)
    assert(PgWireServer.decodeBinaryParam(16, Array[Byte](1)) == true)
    assert(PgWireServer.decodeBinaryParam(25, "hi".getBytes("UTF-8")) == "hi")
    intercept[IllegalArgumentException](PgWireServer.decodeBinaryParam(1700, be(1)))
  }

  test("pg text conventions for rendered values") {
    assert(PgWireServer.renderText(true) == "t")
    assert(PgWireServer.renderText(Array[Byte](0x0a, 0x7f)) == "\\x0a7f")
    assert(PgWireServer.renderText(new java.math.BigDecimal("1.50")) == "1.50")
    assert(PgWireServer.renderText(Seq(1, 2, 3)) == "{1,2,3}")
    assert(PgWireServer.renderText(Seq("a b", null)) == "{\"a b\",NULL}")
    assert(PgWireServer.renderText(java.sql.Date.valueOf("2024-03-01")) == "2024-03-01")
    // UTC container: instants print with the +00 suffix, zero-fraction trimmed
    assert(PgWireServer.renderText(java.time.Instant.parse("2024-03-01T12:30:00Z")) ==
      "2024-03-01 12:30:00+00")
    assert(PgWireServer.renderText(java.time.Instant.parse("2024-03-01T12:30:00.250Z")) ==
      "2024-03-01 12:30:00.25+00")
  }

  test("the reference OID map (PgTypes.scala:27-45)") {
    import org.apache.spark.sql.types._
    assert(PgWireServer.pgOid(BooleanType) == 16)
    assert(PgWireServer.pgOid(BinaryType) == 17)
    assert(PgWireServer.pgOid(LongType) == 20)
    assert(PgWireServer.pgOid(ShortType) == 21)
    assert(PgWireServer.pgOid(IntegerType) == 23)
    assert(PgWireServer.pgOid(StringType) == 25)
    assert(PgWireServer.pgOid(FloatType) == 700)
    assert(PgWireServer.pgOid(DoubleType) == 701)
    assert(PgWireServer.pgOid(DateType) == 1082)
    assert(PgWireServer.pgOid(TimestampNTZType) == 1114)
    assert(PgWireServer.pgOid(TimestampType) == 1184)
    assert(PgWireServer.pgOid(DecimalType(5, 2)) == 1700)
    assert(PgWireServer.pgOid(ArrayType(IntegerType)) == 25)
  }
}
