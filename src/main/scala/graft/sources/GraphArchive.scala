package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.jdk.CollectionConverters._

/**
 * Single-file interchange archive for a [[GraphStore]] — the capability
 * analog of the reference's zip'd GraphFolder
 * (raphtory/src/serialise/graph_folder.rs: ZipWriter export / ZipArchive
 * import with a `.raph` root-metadata pointer). A graph saved on one
 * machine can be handed over as ONE file and opened elsewhere.
 *
 * Format (deliberately boring): a standard zip of the store directory —
 * parquet data files, batch/snapshot manifests, and the HEAD pointer —
 * under their store-relative paths, plus a `.graft` root metadata entry
 * (json: format version, head snapshot, committed batch ids) written
 * FIRST so readers can inspect an archive without extracting it. Entries
 * are written in sorted path order, so re-archiving an unchanged store is
 * byte-stable modulo zip timestamps (which we pin to epoch for
 * determinism, like the manifests' content-addressed checksums).
 *
 * Scale note: archiving is a driver-side stream over the store files —
 * the interchange path for small/medium graphs and for metadata, exactly
 * the role the reference's zip export plays. A 100 TB deployment
 * interchanges the bucketed parquet snapshot directory itself (already
 * columnar, splittable, and object-store friendly); this archive is the
 * "email me the graph" path, not the data plane, and says so here rather
 * than pretending to stream-zip a petabyte.
 */
object GraphArchive {

  val RootMetaEntry = ".graft"
  val FormatVersion = 1

  /** Archive the store at `store.root` into a single zip at `zipPath`. */
  def exportArchive(store: GraphStore, zipPath: String): Path = {
    val root = Paths.get(store.root)
    require(Files.isDirectory(root), s"store root not found: $root")
    val out = Paths.get(zipPath)
    if (out.getParent != null) Files.createDirectories(out.getParent)

    val files = walk(root).filterNot(_.getFileName.toString.endsWith(".tmp"))
    val rel = files.map(f => root.relativize(f).toString.replace('\\', '/')).sorted

    val head = store.headSnapshot.map(_.toString).getOrElse("null")
    val batches = store.committedBatches.mkString("[", ",", "]")
    val meta =
      s"""{"format":"graft-graph-archive","version":$FormatVersion,"head":$head,"batches":$batches}"""

    val zos = new ZipOutputStream(new BufferedOutputStream(Files.newOutputStream(out)))
    try {
      putEntry(zos, RootMetaEntry, meta.getBytes(StandardCharsets.UTF_8))
      rel.foreach { r =>
        putEntry(zos, r, Files.readAllBytes(root.resolve(r)))
      }
    } finally zos.close()
    out
  }

  /**
   * Extract an archive into `destRoot` (must not already contain a store)
   * and open it. Entry paths are validated against zip-slip: anything
   * resolving outside `destRoot` aborts the import.
   */
  def importArchive(zipPath: String, destRoot: String, spark: org.apache.spark.sql.SparkSession): GraphStore = {
    val dest = Paths.get(destRoot).toAbsolutePath.normalize
    require(!Files.exists(dest.resolve("HEAD")) && !Files.isDirectory(dest.resolve("log")),
      s"refusing to import over an existing store at $dest")
    Files.createDirectories(dest)

    val zis = new ZipInputStream(new BufferedInputStream(Files.newInputStream(Paths.get(zipPath))))
    try {
      var entry: ZipEntry = zis.getNextEntry
      var sawMeta = false
      while (entry != null) {
        val name = entry.getName
        if (name == RootMetaEntry) {
          val bytes = zis.readAllBytes()
          val meta = new String(bytes, StandardCharsets.UTF_8)
          require(meta.contains("\"graft-graph-archive\""), s"not a graft graph archive: $zipPath")
          sawMeta = true
        } else if (!entry.isDirectory) {
          val target = dest.resolve(name).normalize
          require(target.startsWith(dest), s"zip-slip entry rejected: $name")
          Files.createDirectories(target.getParent)
          val os = new BufferedOutputStream(Files.newOutputStream(target))
          try zis.transferTo(os)
          finally os.close()
        }
        zis.closeEntry()
        entry = zis.getNextEntry
      }
      require(sawMeta, s"archive missing $RootMetaEntry metadata entry: $zipPath")
    } finally zis.close()
    new GraphStore(dest.toString, spark)
  }

  /** Read just the `.graft` metadata line without extracting. */
  def peek(zipPath: String): String = {
    val zis = new ZipInputStream(new BufferedInputStream(Files.newInputStream(Paths.get(zipPath))))
    try {
      var entry: ZipEntry = zis.getNextEntry
      while (entry != null) {
        if (entry.getName == RootMetaEntry)
          return new String(zis.readAllBytes(), StandardCharsets.UTF_8)
        zis.closeEntry()
        entry = zis.getNextEntry
      }
      throw new IllegalArgumentException(s"archive missing $RootMetaEntry: $zipPath")
    } finally zis.close()
  }

  private def putEntry(zos: ZipOutputStream, name: String, bytes: Array[Byte]): Unit = {
    val e = new ZipEntry(name)
    e.setTime(0L) // deterministic archives: pin entry mtimes
    zos.putNextEntry(e)
    zos.write(bytes)
    zos.closeEntry()
  }

  private def walk(root: Path): List[Path] = {
    val s = Files.walk(root)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).toList
    finally s.close()
  }
}
