package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A V2 CATALOG PLUGIN backed by manifest-committed tables
  * ([[GraftManifestSink]]) — the surface that turns path-addressed tables
  * into SQL-addressed ones:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/graft")
  *   spark.sql("CREATE TABLE graft.corpus.docs (doc_id BIGINT, text STRING)")
  *   spark.sql("INSERT INTO graft.corpus.docs SELECT ...")   // manifest commit
  *   spark.sql("SELECT * FROM graft.corpus.docs")            // manifest-scoped
  * }}}
  *
  * Layout: `<root>/<namespace>/<table>/` with the sink's `_manifest` +
  * versioned snapshots; CREATE writes an empty manifest (schema only), so a
  * created-then-unwritten table reads as zero rows, and every INSERT goes
  * through the sink's atomic commit protocol. DROP removes the directory.
  * This is metadata-only driver code — listing is O(#tables), never a data
  * scan.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Paths.get(Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option spark.sql.catalog.$name.root")))
    Files.createDirectories(root)
  }
  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(root)(_.resolve(_))
  private def tableDir(ident: Identifier): Path =
    nsDir(ident.namespace()).resolve(ident.name())

  // ----- tables -----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => Files.exists(p.resolve("_manifest")))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!Files.exists(dir.resolve("_manifest"))) throw new NoSuchTableException(ident)
    new ManifestTable(dir, Manifest.read(dir).get.schema)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val dir = tableDir(ident)
    if (Files.exists(dir.resolve("_manifest")))
      throw new TableAlreadyExistsException(ident)
    Files.createDirectories(dir)
    Manifest.write(dir, Manifest(schema, Seq.empty)) // schema-only, zero rows
    new ManifestTable(dir, schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!Files.exists(dir.resolve("_manifest"))) false
    else {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!Files.exists(tableDir(oldIdent).resolve("_manifest")))
      throw new NoSuchTableException(oldIdent)
    if (Files.exists(tableDir(newIdent)))
      throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(tableDir(newIdent).getParent)
    Files.move(tableDir(oldIdent), tableDir(newIdent))
  }

  // ----- namespaces -----

  override def defaultNamespace(): Array[String] = Array("default")

  override def listNamespaces(): Array[Array[String]] = {
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(Files.isDirectory(_))
      .map(p => Array(p.getFileName.toString))
      .toArray
    finally s.close()
  }
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (Files.isDirectory(nsDir(namespace))) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (Files.isDirectory(nsDir(namespace))) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    val _ = Files.createDirectories(nsDir(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) false
    else {
      val empty = { val s = Files.list(d); try !s.iterator().hasNext finally s.close() }
      if (!empty && !cascade)
        throw new IllegalStateException(s"namespace ${namespace.mkString(".")} not empty")
      val s = Files.walk(d)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
      true
    }
  }
}
