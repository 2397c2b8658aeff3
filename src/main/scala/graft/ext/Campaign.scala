package graft.ext

import graft.ops.Stage
import org.apache.spark.sql.SparkSession

/** Cross-family CAMPAIGN snapshots: one name pinning several persisted
  * indexes at ONE logical instant.
  *
  * The per-family pins ([[Search.snapshotTextIndex]],
  * [[Dedup.snapshotMinhashManifest]], [[Corpus.snapshotLm]],
  * [[Similarity.snapshotIvfIndex]]) are each internally consistent —
  * every component of one family moves together under its root lease.
  * But a production pipeline serves SEVERAL families built from the same
  * corpus (the text index it retrieves with, the dedup manifest it
  * admits against, the LM it scores with), and "reproduce this release"
  * means all of them as of one instant: a dedup verdict computed against
  * yesterday's manifest next to BM25 scores from today's index is a
  * cross-family inconsistency no single-family pin can rule out.
  * Without this operator, that consistency was manual operator
  * sequencing (quiesce everything, pin each family, hope nothing
  * landed in between).
  *
  * [[snapshot]] makes it a primitive: it takes every member family's
  * ROOT writer lease — the lease all of that family's maintenance ops,
  * exactly-once ingest batches, and single-family pins serialize on —
  * in ONE FIXED GLOBAL ORDER (sorted by root path), then pins each
  * family under the shared name, then releases. While the leases are
  * held nothing can publish into any member, so the pins capture one
  * logical instant across all families; the fixed acquisition order
  * makes two concurrent campaign snapshots deadlock-free (they collide
  * on the first shared root and the loser fails loudly with the lease's
  * contention error, like any concurrent maintenance op).
  *
  * Cost: metadata-only per member (the family pins record file lists),
  * plus blocking member ingest for the pin's duration — milliseconds,
  * not a data pass. On failure (e.g. a member still in a plain,
  * never-published layout), the name is rolled back best-effort before
  * the error propagates — components whose pin pre-existed under this
  * name get it RESTORED byte-for-byte (re-pinning an existing campaign
  * name is routine, and a failed refresh must not destroy the previous
  * campaign), fresh pins are dropped — so a campaign name never
  * resolves to a partial or mixed member set.
  *
  * Serving reads nothing new: each family's existing `*Snapshot` serve
  * path takes the campaign name (q133 serves all three from one pin).
  * [[drop]] releases every member's pin; [[vacuum]] reclaims the
  * storage immediately ([[Stage.vacuum]] per member component).
  */
object Campaign {

  /** A campaign member: one persisted index root, tagged with its
    * family so the campaign knows which components to pin. */
  sealed trait Member { def path: String }
  /** A [[Search.saveTextIndex]] root (postings, doclens, stats). */
  final case class TextIndex(path: String) extends Member
  /** A [[Dedup.saveMinhashManifest]] root (docs, bands). */
  final case class MinhashManifest(path: String) extends Member
  /** A [[Corpus.saveLm]] root (bigrams, vocab). */
  final case class Lm(path: String) extends Member
  /** A [[Similarity.saveIvfIndex]] root (lists). */
  final case class IvfIndex(path: String) extends Member
  /** A [[Similarity.savePqIndex]] root (codes). */
  final case class PqIndex(path: String) extends Member
  /** A [[Similarity.saveBinaryIndex]] root (sig). */
  final case class BinaryIndex(path: String) extends Member
  /** A [[Dedup.saveWinnowManifest]] root (fps). */
  final case class WinnowManifest(path: String) extends Member

  /** Pin every member under `name` at one logical instant — all member
    * root leases held (in sorted-path order) for the duration of all
    * pins. Fails loudly if any member cannot be pinned, rolling back
    * the pins already taken under this name. */
  def snapshot(spark: SparkSession, name: String,
               members: Seq[Member]): Unit = {
    require(members.nonEmpty, "a campaign needs at least one member")
    require(members.map(_.path).distinct.size == members.size,
      s"campaign members must have distinct roots, got " +
        members.map(_.path).mkString(", "))
    // THE fixed global order: every multi-root acquisition in the
    // library goes through this sort, which is what makes concurrent
    // campaigns deadlock-free
    val ordered = members.sortBy(_.path).toList
    def nest(rest: List[Member]): Unit = rest match {
      case Nil =>
        // capture every component's EXISTING pin bytes under this name
        // before anything overwrites them: re-pinning an existing
        // campaign name is routine (each release refreshes its pin), and
        // a failed refresh must put the PREVIOUS campaign back — the old
        // rollback dropped the name everywhere, destroying the prior
        // campaign's pins (including members this run never touched).
        // Safe under the held leases: GC only runs inside a publish,
        // which the leases exclude, so the old pinned versions survive
        // the capture→overwrite→restore window.
        val prior: Map[(String, String), Option[String]] =
          ordered.flatMap { m =>
            val (_, comps) = componentsOf(spark, m)
            comps.map(c => (m.path, c) ->
              Stage.rawSnapshotPin(spark, s"${m.path}/$c", name))
          }.toMap
        try ordered.foreach(pin(spark, name, _))
        catch {
          case scala.util.control.NonFatal(e) =>
            // never leave a partial campaign behind the name: restore
            // each component's prior pin where one existed, drop where
            // none did (best-effort), then surface the original failure
            ordered.foreach { m =>
              val (_, comps) = componentsOf(spark, m)
              comps.foreach { c =>
                try prior.getOrElse((m.path, c), None) match {
                  case Some(bytes) => Stage.restoreRawSnapshotPin(
                    spark, s"${m.path}/$c", name, bytes)
                  case None =>
                    Stage.dropSnapshot(spark, s"${m.path}/$c", name)
                } catch { case scala.util.control.NonFatal(_) => () }
              }
            }
            throw e
        }
      case m :: tail =>
        Stage.withWriterLease(spark, m.path)(nest(tail))
    }
    nest(ordered)
  }

  /** ROLL every member BACK to its pin under `name` — the cross-family
    * undo: when post-release validation says the campaign's maintenance
    * was wrong, one call returns the text index, manifest, and LM to the
    * instant [[snapshot]] captured. Same fixed sorted-path lease order
    * as the pin (deadlock-free against concurrent campaigns), and the
    * same all-or-nothing entry check: every member must carry the pin
    * before ANY is restored, so a partially-pinned name (or a member
    * list that does not match the pin's) fails loudly up front. The
    * restores themselves run inside the held leases, so no ingest batch
    * can land between two members' rollbacks — the restored state is
    * cross-family consistent by the same argument as the pin. A crash
    * mid-restore leaves earlier members rolled back; rerunning converges
    * (each member restore is idempotent). The pins survive.
    */
  def restore(spark: SparkSession, name: String,
              members: Seq[Member]): Unit = {
    require(members.nonEmpty, "a campaign needs at least one member")
    val ordered = members.sortBy(_.path).toList
    def nest(rest: List[Member]): Unit = rest match {
      case Nil =>
        val missing = ordered.filterNot(hasPin(spark, name, _))
        require(missing.isEmpty,
          s"campaign '$name' does not pin member(s) " +
            s"${missing.map(_.path).mkString(", ")} — nothing restored")
        ordered.foreach(restoreMember(spark, name, _))
      case m :: tail =>
        Stage.withWriterLease(spark, m.path)(nest(tail))
    }
    nest(ordered)
  }

  /** Does every component of `m` carry the pin `name`? */
  private def hasPin(spark: SparkSession, name: String, m: Member): Boolean = {
    val (_, comps) = componentsOf(spark, m)
    comps.forall(c =>
      Stage.resolveSnapshot(spark, s"${m.path}/$c", name).isDefined)
  }

  private def restoreMember(spark: SparkSession, name: String,
                            m: Member): Unit = m match {
    case TextIndex(p)       => Search.restoreTextIndex(spark, p, name)
    case MinhashManifest(p) => Dedup.restoreMinhashManifest(spark, p, name)
    case Lm(p)              => Corpus.restoreLm(spark, p, name)
    case IvfIndex(p)        => Similarity.restoreIvfIndex(spark, p, name)
    case PqIndex(p)         => Similarity.restorePqIndex(spark, p, name)
    case BinaryIndex(p)     => Similarity.restoreBinaryIndex(spark, p, name)
    case WinnowManifest(p)  => Dedup.restoreWinnowManifest(spark, p, name)
  }

  /** Release every member's pin under `name`. The pinned versions become
    * ordinary GC candidates at each family's next publish — or
    * immediately via [[vacuum]]. Idempotent (unknown names no-op). */
  def drop(spark: SparkSession, name: String, members: Seq[Member]): Unit =
    members.foreach(dropMember(spark, name, _))

  /** Reclaim every member's stale versions now — the storage release
    * after [[drop]], without waiting for each family's next publish. */
  def vacuum(spark: SparkSession, members: Seq[Member]): Unit =
    members.foreach {
      case TextIndex(p)       => Search.vacuumTextIndex(spark, p)
      case MinhashManifest(p) => Dedup.vacuumMinhashManifest(spark, p)
      case Lm(p)              => Corpus.vacuumLm(spark, p)
      case IvfIndex(p)        => Similarity.vacuumIvfIndex(spark, p)
      case PqIndex(p)         => Similarity.vacuumPqIndex(spark, p)
      case BinaryIndex(p)     => Similarity.vacuumBinaryIndex(spark, p)
      case WinnowManifest(p)  => Dedup.vacuumWinnowManifest(spark, p)
    }

  /** One operational dashboard for the whole campaign: every member's
    * [[Stage.healthReport]] rows (live version, file/byte counts,
    * ledger/tombstone/uncommitted-op state, pinned versions, writer
    * lock in flight) unioned under `family` and `root` columns — the
    * single query an operator reads before deciding which member needs
    * a compaction, a pending-op retry, or a dropped pin. Metadata-only,
    * like the per-family report.
    */
  def healthReport(spark: SparkSession,
                   members: Seq[Member]): org.apache.spark.sql.DataFrame = {
    require(members.nonEmpty, "a campaign needs at least one member")
    import org.apache.spark.sql.functions.{col, lit}
    members.map { m =>
      val (family, comps) = componentsOf(spark, m)
      val r = Stage.healthReport(spark, m.path, comps)
      r.select(lit(family).as("family") +: lit(m.path).as("root") +:
        r.columns.map(col): _*)
    }.reduce(_ unionByName _)
  }

  private def componentsOf(spark: SparkSession,
                           m: Member): (String, Seq[String]) = m match {
    // the text set is DYNAMIC: +positions when the phrase component
    // exists ([[Search.textComponents]] — pins and health must cover it)
    case TextIndex(p)       => ("text_index", Search.textComponents(spark, p))
    case MinhashManifest(_) => ("minhash_manifest", Seq("docs", "bands"))
    case Lm(_)              => ("lm", Seq("bigrams", "vocab"))
    case IvfIndex(_)        => ("ivf_index", Seq("lists"))
    case PqIndex(_)         => ("pq_index", Seq("codes"))
    case BinaryIndex(_)     => ("binary_index", Seq("sig"))
    case WinnowManifest(_)  => ("winnow_manifest", Seq("fps"))
  }

  /** The member's own family pin — runs under the already-held root
    * lease (the family surfaces lease the same root; reentrancy passes
    * them through), so the family-level consistency guarantees apply
    * unchanged inside the campaign's wider instant. */
  private def pin(spark: SparkSession, name: String, m: Member): Unit =
    m match {
      case TextIndex(p)       => Search.snapshotTextIndex(spark, p, name)
      case MinhashManifest(p) => Dedup.snapshotMinhashManifest(spark, p, name)
      case Lm(p)              => Corpus.snapshotLm(spark, p, name)
      case IvfIndex(p)        => Similarity.snapshotIvfIndex(spark, p, name)
      case PqIndex(p)         => Similarity.snapshotPqIndex(spark, p, name)
      case BinaryIndex(p)     => Similarity.snapshotBinaryIndex(spark, p, name)
      case WinnowManifest(p)  => Dedup.snapshotWinnowManifest(spark, p, name)
    }

  private def dropMember(spark: SparkSession, name: String,
                         m: Member): Unit = m match {
    case TextIndex(p)       => Search.dropTextIndexSnapshot(spark, p, name)
    case MinhashManifest(p) => Dedup.dropMinhashManifestSnapshot(spark, p, name)
    case Lm(p)              => Corpus.dropLmSnapshot(spark, p, name)
    case IvfIndex(p)        => Similarity.dropIvfIndexSnapshot(spark, p, name)
    case PqIndex(p)         => Similarity.dropPqIndexSnapshot(spark, p, name)
    case BinaryIndex(p)     => Similarity.dropBinaryIndexSnapshot(spark, p, name)
    case WinnowManifest(p)  => Dedup.dropWinnowManifestSnapshot(spark, p, name)
  }
}
