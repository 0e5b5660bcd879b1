package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.schema.{GExternalLink, GSchema}

import scala.jdk.CollectionConverters._

/**
 * Declarative external-link catalogs: a JSON config string declares a
 * SQL-sourced dimension catalog — link name, fact dimension, field
 * list, JDBC connection — and it becomes a registered [[GExternalLink]]
 * with no Scala written, inheriting the QueryBuilder IN-set pushdown
 * and broadcast enrichment join.
 *
 * Re-expresses the reference's universal JSON catalogs
 * (yupana-external-links/universal/JsonCatalogs.scala:22-36 and
 * SQLSourcedExternalLinkService.scala): same shape (`externalLinks:
 * [{description: {linkName, dimensionName, fieldsNames, tables,
 * fieldsMapping?, relation?}, connection: {url, username?,
 * password?}}]`), same defaulting rules (relation defaults to
 * camelToSnake(linkName); a field maps to fieldsMapping(field) else
 * camelToSnake(field)). The execution is Spark-native instead of the
 * reference's hand-run JDBC queries + per-dimension cache: the catalog
 * is one `spark.read.jdbc` relation, enrichment is a broadcast hash
 * join, and link-field predicates collapse to an `IN` on the fact
 * dimension pushed into the parquet scan (QueryBuilder.whereLink) —
 * the fact side never shuffles, exactly the property the reference's
 * condition transformation exists to provide.
 *
 * At 100 TB the catalog is still bounded metadata (a dimension table),
 * so a single-partition JDBC read that immediately broadcasts is the
 * right shape; `connection.options` passes through partitioning
 * options (partitionColumn/lowerBound/upperBound/numPartitions) for
 * catalogs big enough to want a parallel read.
 */
object JsonCatalogs {

  final case class LinkConnection(
      url: String,
      username: Option[String],
      password: Option[String],
      driver: Option[String],
      options: Map[String, String]
  )

  final case class LinkDescription(
      linkName: String,
      dimensionName: String,
      fieldsNames: Seq[String],
      tables: Seq[String],
      fieldsMapping: Map[String, String],
      relation: Option[String]
  )

  final case class LinkConfig(description: LinkDescription, connection: LinkConnection) {
    def relation: String =
      description.relation.getOrElse(camelToSnake(description.linkName))
    /** Source column for a link-level name (reference
      * SQLSourcedExternalLinkService.catalogFieldToSqlField:117); a
      * mapping value may be table-qualified — the relation read drops
      * the qualifier. */
    def sqlField(f: String): String = {
      val m = description.fieldsMapping.getOrElse(f, camelToSnake(f))
      m.substring(m.lastIndexOf('.') + 1)
    }
    def toLink: GExternalLink = GExternalLink(
      linkName = description.linkName,
      dimensionName = description.dimensionName,
      catalogTable = description.linkName,
      catalogKey = description.dimensionName,
      fields = description.fieldsNames
    )
  }

  /** Reference camelToSnake (SQLSourcedExternalLinkService.scala:204). */
  def camelToSnake(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  private def strs(n: JsonNode, field: String): Seq[String] =
    if (n == null || n.isNull) Seq.empty
    else if (!n.isArray)
      throw new IllegalArgumentException(s"external link config: '$field' must be an array")
    else n.elements().asScala.map(_.asText()).toSeq

  private def optStr(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText())

  private def reqStr(n: JsonNode, field: String, ctx: String): String =
    optStr(n, field).getOrElse(
      throw new IllegalArgumentException(s"external link config: missing '$field' in $ctx"))

  /** Parse the JSON config. Fails with a named field on any missing
    * required key — a config typo must not become a silent no-link. */
  def parse(json: String): Seq[LinkConfig] = {
    val root = new ObjectMapper().readTree(json)
    val links = Option(root.get("externalLinks")).getOrElse(
      throw new IllegalArgumentException("external link config: missing 'externalLinks' array"))
    // an object where the array belongs (a common hand-edit typo) would
    // iterate zero elements and silently declare nothing
    if (!links.isArray)
      throw new IllegalArgumentException(
        "external link config: 'externalLinks' must be an array, got " + links.getNodeType)
    links.elements().asScala.map { e =>
      val d = Option(e.get("description")).getOrElse(
        throw new IllegalArgumentException("external link config: missing 'description'"))
      val c = Option(e.get("connection")).getOrElse(
        throw new IllegalArgumentException("external link config: missing 'connection'"))
      val mapping = Option(d.get("fieldsMapping")) match {
        case Some(m) if !m.isNull =>
          m.properties().asScala.map(en => en.getKey -> en.getValue.asText()).toMap
        case _ => Map.empty[String, String]
      }
      LinkConfig(
        LinkDescription(
          linkName = reqStr(d, "linkName", "description"),
          dimensionName = reqStr(d, "dimensionName", "description"),
          fieldsNames = strs(d.get("fieldsNames"), "fieldsNames"),
          tables = strs(d.get("tables"), "tables"),
          fieldsMapping = mapping,
          relation = optStr(d, "relation")
        ),
        LinkConnection(
          url = reqStr(c, "url", "connection"),
          username = optStr(c, "username"),
          password = optStr(c, "password"),
          driver = optStr(c, "driver"),
          options = Option(c.get("options")) match {
            case Some(o) if !o.isNull =>
              o.properties().asScala.map(en => en.getKey -> en.getValue.asText()).toMap
            case _ => Map.empty
          }
        )
      )
    }.toSeq
  }

  /**
   * The declared catalog as a DataFrame: one JDBC relation read,
   * projected to link-level names (key column aliased to the dimension
   * name, source columns aliased to field names) so the QueryBuilder
   * join/pushdown machinery sees exactly the columns the link declares.
   */
  def load(spark: SparkSession, cfg: LinkConfig): DataFrame = {
    val d = cfg.description
    var r = spark.read.format("jdbc")
      .option("url", cfg.connection.url)
      .option("dbtable", cfg.relation)
      .options(cfg.connection.options)
    cfg.connection.username.foreach(u => r = r.option("user", u))
    cfg.connection.password.foreach(p => r = r.option("password", p))
    cfg.connection.driver.foreach(dr => r = r.option("driver", dr))
    val projected = (d.dimensionName +: d.fieldsNames).map { f =>
      col(cfg.sqlField(f)).as(f)
    }
    r.load().select(projected: _*)
  }

  /**
   * Attach declared links to a schema, reference
   * attachLinkToSchema semantics (JsonCatalogs.scala:61-72): a link
   * only attaches when one of its declared tables carries the declared
   * dimension; a config naming an unknown table/dimension is an ERROR
   * here (the reference silently skips — a typo'd declarative config
   * that silently does nothing is the failure mode config files exist
   * to avoid).
   */
  def attachLinksToSchema(schema: GSchema, cfgs: Seq[LinkConfig]): GSchema = {
    cfgs.foreach { cfg =>
      val d = cfg.description
      val carrying = d.tables.map(schema.table).filter(_.dimensionNames.contains(d.dimensionName))
      require(
        carrying.nonEmpty,
        s"external link '${d.linkName}': none of tables ${d.tables.mkString(", ")} " +
          s"carries dimension '${d.dimensionName}'")
    }
    // name collisions (against existing links or within the config)
    // would make links.find(_.linkName == ...) resolve arbitrarily
    val names = schema.links.map(_.linkName) ++ cfgs.map(_.description.linkName)
    val dup = names.diff(names.distinct)
    require(dup.isEmpty, s"external link name(s) declared twice: ${dup.distinct.mkString(", ")}")
    schema.copy(links = schema.links ++ cfgs.map(_.toLink))
  }

  /**
   * Compose a table loader that resolves declared catalog names to
   * their JDBC reads and everything else to `base` — pass the result
   * as QueryBuilder's `loadTable`. DELIBERATE side effect: each link
   * registers into the process-wide [[DeclaredLinks]] registry for
   * admin visibility (`SHOW EXTERNAL LINKS`) — latest declaration per
   * name wins, mirroring temp-view semantics; `DeclaredLinks
   * .unregister` retires one.
   */
  def loader(spark: SparkSession, cfgs: Seq[LinkConfig], base: String => DataFrame): String => DataFrame = {
    cfgs.foreach(DeclaredLinks.register)
    val byName = cfgs.map(c => c.description.linkName -> c).toMap
    (name: String) => byName.get(name).map(load(spark, _)).getOrElse(base(name))
  }
}

/** Registry of config-declared links, the `SHOW EXTERNAL LINKS` admin
  * surface (bounded metadata: one row per declared link). */
object DeclaredLinks {
  private val entries = new java.util.concurrent.ConcurrentHashMap[String, JsonCatalogs.LinkConfig]()
  def register(cfg: JsonCatalogs.LinkConfig): Unit =
    entries.put(cfg.description.linkName, cfg)
  def unregister(name: String): Unit = entries.remove(name)
  def all: Seq[JsonCatalogs.LinkConfig] =
    entries.values().asScala.toSeq.sortBy(_.description.linkName)
  def clear(): Unit = entries.clear()
}
