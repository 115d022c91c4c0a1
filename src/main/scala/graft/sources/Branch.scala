package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** NAMED BRANCHES + WRITE-AUDIT-PUBLISH over manifest tables (Iceberg's
  * branch refs / the WAP pattern, adapted to the directory-per-table
  * layout):
  *
  *  - `ALTER TABLE t CREATE BRANCH b` forks the table's CURRENT snapshot
  *    into `t@b` — a metadata-only shallow clone living under the table's
  *    own directory (`_branch_b/`), with the fork version recorded. Zero
  *    data movement; reads resolve through the clone chain.
  *  - writes address the branch as an ordinary table: `INSERT INTO t@b`,
  *    row-level DML, OPTIMIZE — all the existing machinery, isolated from
  *    main (copy-on-write divergence, exactly like clones).
  *  - the AUDIT step is any query over `t@b` — mainline readers never see
  *    branch data.
  *  - `ALTER TABLE t FAST FORWARD BRANCH b` PUBLISHES the branch: iff main
  *    has not advanced past the fork point, the branch's current state
  *    becomes main's next version in one atomic swap (branch-local data /
  *    sidecar / segment files move into the table directory first — names
  *    are globally unique, so the moves can never collide), and the branch
  *    ref is dropped. A diverged main refuses loudly — not a fast-forward.
  *  - `ALTER TABLE t DROP BRANCH b` abandons the branch: its local files
  *    die with its directory; nothing in main ever referenced them.
  *
  * Unlike cross-directory clones (which pin nothing by design), a branch
  * lives INSIDE the table directory — so VACUUM discovers every
  * outstanding branch's references and keeps them reachable: deep vacuums
  * on main are safe with branches open. */
private[graft] object Branch {
  /** Fork version prop in the branch's own manifest. */
  private[graft] val BaseProp = "branchBase"

  private val NamePat = """[A-Za-z_][A-Za-z0-9_]*""".r

  private[graft] def branchDir(dir: Path, name: String): Path =
    dir.resolve(s"_branch_$name")

  private def checkName(name: String): Unit =
    if (!NamePat.matches(name)) throw new IllegalArgumentException(
      s"branch name must be an identifier, got '$name'")

  def create(dir: Path, name: String): Unit = {
    checkName(name)
    val bdir = branchDir(dir, name)
    if (Files.exists(bdir.resolve("_manifest")))
      throw new IllegalArgumentException(s"branch $name already exists")
    val m = Manifest.read(dir).getOrElse(throw new IllegalStateException(
      s"CREATE BRANCH: no manifest at $dir"))
    Files.createDirectories(bdir)
    val base = Manifest.snapshotVersions(dir).lastOption.getOrElse(0)
    // same prop hygiene as SHALLOW CLONE: streaming epoch fences must not
    // ride into the branch (a resumed query would drop epochs as replays)
    val props = m.props.filterNot(p =>
        p._1 == Manifest.LastEpochProp ||
        p._1.startsWith(Manifest.LastEpochProp + ".") ||
        p._1 == Manifest.CdcDirProp) +
      (Manifest.CloneSourceProp -> dir.toAbsolutePath.toString) +
      (BaseProp -> base.toString)
    Manifest.write(bdir, Manifest(m.schema, m.entries, props, m.segments))
  }

  def drop(dir: Path, name: String): Unit = {
    checkName(name)
    val bdir = branchDir(dir, name)
    if (!Files.exists(bdir.resolve("_manifest")))
      throw new IllegalArgumentException(s"no branch $name at $dir")
    val walk = Files.walk(bdir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally walk.close()
  }

  /** Publish: branch state → main's next version, iff main still sits at
    * the fork point. Returns the published version number. */
  def fastForward(dir: Path, name: String): Int = {
    checkName(name)
    val bdir = branchDir(dir, name)
    val bm = Manifest.read(bdir).getOrElse(throw new IllegalArgumentException(
      s"no branch $name at $dir"))
    ManifestLock.withLock(dir) {
      val base = bm.props.get(BaseProp).map(_.toInt).getOrElse(0)
      val cur = Manifest.snapshotVersions(dir).lastOption.getOrElse(0)
      if (cur != base) throw new java.util.ConcurrentModificationException(
        s"FAST FORWARD: main advanced to v$cur since branch $name forked " +
          s"at v$base — not a fast-forward. Re-apply the branch's changes " +
          "against the current state (or recreate the branch).")
      // branch-LOCAL files move home; inherited ones already live in `dir`
      // (the chain resolved them there). Names are globally unique, so an
      // existing target means "already home" — only segments hit that case
      // (inherited refs), and data/dv/blob names never collide.
      def moveHome(n: String): Unit = {
        val src = bdir.resolve(n)
        if (Files.exists(src) && !Files.exists(dir.resolve(n)))
          Files.move(src, dir.resolve(n), StandardCopyOption.ATOMIC_MOVE)
      }
      bm.entries.foreach { e =>
        moveHome(e.name)
        e.blobsFile.foreach(moveHome)
        e.dv.foreach(d => moveHome(d._1))
      }
      bm.segments.foreach { case (n, _) => moveHome(n) }
      // the branch's last DML CDC pointer dies with the ref — a published
      // fast-forward's change semantics are the read-time NET diff
      val props = bm.props - Manifest.CloneSourceProp - BaseProp -
        Manifest.CdcDirProp
      Manifest.write(dir, Manifest(bm.schema, bm.entries, props, bm.segments))
    }
    // the published state is live; the branch ref is spent
    drop(dir, name)
    Manifest.snapshotVersions(dir).lastOption.getOrElse(0)
  }

  /** Branches of `dir`, by name. */
  def list(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("_branch_"))
        .map(_.stripPrefix("_branch_"))
        .toSeq.sorted
      finally s.close()
    }
}
