package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{DelegatingCatalogExtension, Identifier, Table}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL time travel for catalog `graft-tx` tables.
  *
  * Spark 4 resolves `SELECT ... FROM t FOR VERSION AS OF 3` / `FOR
  * TIMESTAMP AS OF ts` through `TableCatalog.loadTable(ident,
  * version|timestamp)` — a call the stock session catalog answers
  * with "table does not support time travel" for provider-based
  * tables, so SQL-only users (the majority on a shared warehouse)
  * could never time-travel a `CREATE TABLE ... USING graft-tx` table
  * even though the reader options (`versionAsOf`/`timestampAsOf`)
  * have served the Scala face since round 7. This extension closes
  * that gap the way lakehouse formats do: registered as
  * `spark.sql.catalog.spark_catalog`, it DELEGATES everything to the
  * built-in session catalog and intercepts only the two time-travel
  * loads, answering them for graft-tx tables with a catalog Table
  * pinned to the requested snapshot — same V1Scan execution bridge,
  * same CBO statistics face, and the pinned version's OWN column
  * mapping (a rename after the pinned version serves under the names
  * that version declared, exactly like the option-based read).
  *
  * Anything that is not a graft-tx table falls through to the
  * delegate's own time-travel handling (= the standard unsupported
  * error), so installing this catalog changes no other behavior.
  * `GraftFunctions.register` installs it when the conf is unset;
  * cluster deployments set the conf explicitly.
  *
  * Reference analog: the warehouse's partition-rename loads kept old
  * partitions addressable by path (src/contrib/hive-streaming/
  * build.xml:1); here every committed snapshot stays addressable
  * from SQL. */
class GraftCatalog extends DelegatingCatalogExtension {

  override def loadTable(ident: Identifier, version: String): Table =
    graftRootOf(ident) match {
      case Some(root) => pinned(ident, root, "versionAsOf", version)
      case None => super.loadTable(ident, version)
    }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    graftRootOf(ident) match {
      case Some(root) =>
        // Spark hands MICROseconds since epoch; the commit-mtime
        // resolution (`versionAt`) speaks millis
        pinned(ident, root, "timestampAsOf", (timestamp / 1000L).toString)
      case None => super.loadTable(ident, timestamp)
    }

  /** The table's graft-tx root, when `ident` IS a graft-tx catalog
    * table: provider + path read off the delegate's own table
    * properties (`option.path` is the CREATE TABLE option, `location`
    * the catalog's resolved URI fallback). None for everything else. */
  private def graftRootOf(ident: Identifier): Option[String] = {
    val props = super.loadTable(ident).properties()
    val provider = props.get("provider")
    if (provider == null || !provider.equalsIgnoreCase("graft-tx")) None
    else Option(props.get("option.path")).orElse(Option(props.get("location")))
  }

  private def pinned(ident: Identifier, root: String, key: String,
    value: String): Table = {
    val spark = SparkSession.active
    val params = Map("path" -> root, key -> value)
    // the PINNED snapshot's schema — colmap renames resolve under the
    // names that version itself declared
    val schema = TxRelation(spark, root, params).schema
    val opts = new java.util.HashMap[String, String]()
    params.foreach { case (k, v) => opts.put(k, v) }
    opts.put("provider", "graft-tx")
    new GraftTxCatalogTable(schema, root, new CaseInsensitiveStringMap(opts))
  }
}
