package graft

import org.apache.spark.sql.functions._

/**
 * Reference parameterized-query surface (yupana-core
 * sql/Parameter.scala + PreparedStatement.scala: `?` placeholders
 * bound by 1-based index through QueryEngineRouter.bind) mapped onto
 * Spark's native parameterized SQL — `spark.sql(text, args)` with
 * positional `?` (Array) or named `:name` (Map) parameters. graft
 * deliberately adds NO parser surface of its own here: the binding
 * happens in Spark's analyzer against the delegate-parsed plan, so it
 * composes with graft's injected parser (unmatched statements
 * delegate), registered functions, and temp views. The reference's
 * batch-bound UPSERT (many parameter sets against one statement) maps
 * to the programmatic ingestion path (`graft.sources.Upsert.
 * appendVersion` over a DataFrame — the idiomatic Spark shape for a
 * bound batch), while literal UPSERT statements stay on the graft
 * UPSERT command.
 */
class ParameterizedSqlSpec extends SparkSpecBase {
  private lazy val sp = spark
  import sp.implicits._

  test("positional ? binding — the reference's Map[Int, Parameter] form") {
    Seq((1L, "alpha", 3.5), (2L, "beta", 1.0), (3L, "gamma", 9.25))
      .toDF("id", "name", "score").createOrReplaceTempView("pq_items")
    val out = spark.sql(
      "SELECT id, score FROM pq_items WHERE id > ? AND name <> ? ORDER BY id",
      Array(1, "gamma"))
    assert(out.as[(Long, Double)].collect().toSeq == Seq((2L, 1.0)))
    // numeric, string, and timestamp-typed parameters all bind
    val ts = spark.sql(
      "SELECT CAST(? AS TIMESTAMP) < TIMESTAMP '2024-06-01 00:00:00' AS early",
      Array("2024-01-01 00:00:00"))
    assert(ts.head().getBoolean(0))
  }

  test("named :param binding — the JDBC-free prepared form") {
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("id", "name").createOrReplaceTempView("pq_named")
    val out = spark.sql(
      "SELECT count(*) AS n FROM pq_named WHERE id <= :maxId AND name LIKE :pat",
      Map("maxId" -> 3, "pat" -> "%a%"))
    assert(out.head().getLong(0) == 3L)
    // re-execution with different bindings — the PreparedStatement
    // reuse pattern: same text, new args
    val text = "SELECT count(*) AS n FROM pq_named WHERE id <= :maxId AND name LIKE :pat"
    assert(spark.sql(text, Map("maxId" -> 1, "pat" -> "%")).head().getLong(0) == 1L)
  }

  test("parameters bind into graft function calls") {
    graft.sql.GraftFunctions.register(spark)
    // binding happens in the analyzer, after parsing — so it composes
    // with graft's registered functions (and with the injected parser,
    // which delegates all non-admin statements: AdminSqlSpec covers
    // that session shape)
    val fixed = spark.sql("SELECT graft_fix_item(?) AS f", Array("семечки ╣1"))
    assert(fixed.head().getString(0) == "семечки №1")
    val tok = spark.sql(
      "SELECT graft_tokens(:txt) AS tk", Map("txt" -> "Red Apple!"))
    assert(tok.head().getAs[scala.collection.Seq[String]]("tk").toSeq == Seq("red", "apple"))
  }

  test("parameters bind through the INJECTED parser (extensions session)") {
    // Spark 4 enters the parser through parsePlanWithParameters for
    // sql(text, args); the ParserInterface DEFAULT drops the
    // ParameterContext, so an injected parser that forwards only
    // parsePlan breaks every parameterized query on the session with
    // UNBOUND_SQL_PARAMETER (r16 regression find — GraftSqlParser now
    // overrides and forwards both entry points). Pin it on a real
    // extensions-built session and its newSession() fork (the pg-wire
    // per-connection shape).
    import org.apache.spark.sql.SparkSession
    spark // shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.sql.GraftExtensions().apply(_))
      .getOrCreate()
    try {
      assert(ext.sql("SELECT :a + :b AS s", Map("a" -> 40, "b" -> 2)).head().getInt(0) == 42)
      assert(ext.sql("SELECT ? * ? AS p", Array(6, 7)).head().getInt(0) == 42)
      val fork = ext.newSession()
      assert(fork.sql("SELECT :a + :b AS s", Map("a" -> 1, "b" -> 2)).head().getInt(0) == 3)
      // and the injected statement surface still parses on the same session
      assert(ext.sql("SHOW VERSION").collect().exists(_.getString(0) == "graft"))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
