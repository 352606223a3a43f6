package graft.bde

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * S1/S2/P3/O1/O3 — the BDE repository scanner and watermark planner
 * (reference `GetLevel0Updates`/`GetLevel5Updates`,
 * `lib/LINZ/BdeUpload.pm:612-707`; layout `README.md:159-161`):
 *
 * {{{
 * <repo>/level_0/YYYYMMDDhhmmss/<file>.crs...
 * <repo>/level_5/YYYYMMDDhhmmss/<file>.crs...
 * }}}
 *
 * Dataset names sort lexically = chronologically (O1). Level-0 planning
 * picks the LATEST complete dataset newer than the per-table level-0
 * watermark (O3); level-5 planning returns ALL datasets after the upload
 * watermark, in order — a gap would break increment chaining. `-before`
 * upper-bounds both (P3).
 *
 * Listing runs through the Hadoop FileSystem API, so it works on any
 * Spark-visible storage; the listing itself is driver-side (dataset counts
 * are thousands, not billions — same posture as the reference).
 */
object Repo {

  final case class DatasetRef(
      level: String,          // "0" | "5"
      name: String,           // YYYYMMDDhhmmss
      path: String,
      files: Set[String])     // basenames without .crs extension

  /** Scan one level directory for snapshot datasets. */
  def scanLevel(spark: SparkSession, repoRoot: String, level: String): Seq[DatasetRef] = {
    val dirName = if (level == "0") "level_0" else "level_5"
    val root = new Path(s"$repoRoot/$dirName")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else
      fs.listStatus(root).toSeq
        .filter(_.isDirectory)
        .map { st =>
          val files = fs.listStatus(st.getPath).toSeq
            .filter(_.isFile)
            .map(_.getPath.getName)
            .filter(_.endsWith(".crs"))
            .map(_.stripSuffix(".crs"))
            .toSet
          DatasetRef(level, st.getPath.getName, st.getPath.toString, files)
        }
        .sortBy(_.name)
  }

  /** S2 — required files of the selected tables missing from a dataset.
    * The change-table file is required only in level-5 datasets (level-0
    * loads have no change set). */
  def missingFiles(ds: DatasetRef, tables: Seq[Catalog.TableDef]): Seq[String] =
    tables
      .filter(t => t.appliesToLevel(ds.level) ||
        (ds.level == "5" && t.levels == Set("C")))
      .flatMap(_.files)
      .distinct
      .filterNot(ds.files.contains)
      .sorted

  /** One planned unit of work. */
  final case class PlannedLoad(level: String, dataset: String, path: String,
      complete: Boolean, missing: Seq[String])

  /**
   * E1 planning: the latest COMPLETE level-0 dataset newer than the
   * watermark and older than `before` (GetLevel0Updates :612-651 — an
   * incomplete latest dataset is an error in the reference; surfaced here
   * as `complete = false`).
   */
  def planLevel0(
      spark: SparkSession,
      repoRoot: String,
      tables: Seq[Catalog.TableDef],
      lastLevel0: Option[String] = None,
      before: Option[String] = None): Option[PlannedLoad] =
    scanLevel(spark, repoRoot, "0")
      .filter(ds => lastLevel0.forall(ds.name > _))
      .filter(ds => before.forall(ds.name < _))
      .lastOption
      .map { ds =>
        val miss = missingFiles(ds, tables)
        PlannedLoad("0", ds.name, ds.path, miss.isEmpty, miss)
      }

  /**
   * E2 planning: ALL level-5 datasets after the upload watermark, ordered
   * (GetLevel5Updates :653-707). Incomplete datasets are flagged, not
   * dropped (the reference skips-with-warning at L5).
   */
  def planLevel5(
      spark: SparkSession,
      repoRoot: String,
      tables: Seq[Catalog.TableDef],
      lastUpload: Option[String] = None,
      before: Option[String] = None): Seq[PlannedLoad] =
    scanLevel(spark, repoRoot, "5")
      .filter(ds => lastUpload.forall(ds.name > _))
      .filter(ds => before.forall(ds.name < _))
      .map { ds =>
        val miss = missingFiles(ds, tables)
        PlannedLoad("5", ds.name, ds.path, miss.isEmpty, miss)
      }
}
