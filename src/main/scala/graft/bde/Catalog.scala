package graft.bde

/**
 * P5/O2 — the table catalog: the `tables.conf` grammar and table-selection
 * operators.
 *
 * Grammar (reference parser `lib/LINZ/BdeUpload.pm:125-200`, documented at
 * `conf/tables.conf:17-52`):
 *
 * {{{
 * TABLE name [l0_only|l5_only|l5_is_full|key=col|unique=col[,col]|row_tol=err,warn]... files f1 f2...
 * COLUMN name type [NOT NULL]     # optional, overrides file header columns
 * }}}
 *
 * `unique=` declares the secondary unique-constraint columns that drive the
 * 'X' action classification and the key-swap repair on level-5 loads — the
 * reference discovers these from the table's unique indexes in the database
 * (`_bde_FixChangedIncKeyRecords`, sql/02-bde_control_functions.sql.in:
 * 2146-2226); with no database catalog here they are declared in the
 * tables.conf instead.
 *
 *  - blank lines and `#` comments are skipped;
 *  - names and options are case-insensitive (lowercased);
 *  - ids are assigned in file order (1-based) — the load order (O2);
 *  - the special table `l5_change_table` is the change-set source (level C);
 *  - tolerances must be in [0, 1]; a table with no files is an error.
 */
object Catalog {

  final case class TableDef(
      name: String,
      id: Int,
      key: Option[String],
      rowTolError: Option[Double],
      rowTolWarning: Option[Double],
      levels: Set[String],       // "0", "5", "C"
      level5IsFull: Boolean,
      files: Seq[String],
      /** `COLUMN name type [NOT NULL]` lines: when present they REPLACE the
        * file header's column definitions at load time
        * (lib/LINZ/BdeUpload.pm:185-188; doc conf/tables.conf:49-52). */
      columnOverrides: Seq[BdeFormat.BdeColumn],
      /** `unique=col[,col]`: secondary unique columns for X-action
        * classification and key-swap repair on level-5 loads. */
      uniqueCols: Seq[String] = Nil) {
    def appliesToLevel(level: String): Boolean = levels.contains(level)
  }

  final case class CatalogError(line: Int, message: String)

  /** Parse a tables.conf; returns (tables in id order, errors). */
  def parse(lines: Iterator[String]): (Seq[TableDef], Seq[CatalogError]) = {
    val tables = scala.collection.mutable.ArrayBuffer[TableDef]()
    val errors = scala.collection.mutable.ArrayBuffer[CatalogError]()
    val seenLevels = scala.collection.mutable.Set[String]()
    var id = 0
    var lineNo = 0
    for (raw <- lines) {
      lineNo += 1
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val parts = line.split("\\s+").toList
        (parts.head.toLowerCase, parts.tail) match {
          case ("table", name0 :: rest) =>
            val name = name0.toLowerCase
            id += 1
            var levels = Set("0", "5")
            var key: Option[String] = None
            var unique = Seq.empty[String]
            var tolE: Option[Double] = None
            var tolW: Option[Double] = None
            var l5full = false
            val it = rest.iterator.map(_.toLowerCase).buffered
            var stop = false
            while (it.hasNext && !stop) {
              val v = it.next()
              if (v == "file" || v == "files") stop = true
              else v match {
                case "l0_only" => levels = Set("0")
                case "l5_only" => levels = Set("5")
                case "l5_is_full" => l5full = true
                case kv if kv.startsWith("key=") => key = Some(kv.drop(4))
                case kv if kv.startsWith("unique=") =>
                  val cols = kv.drop(7).split(",").toSeq.filter(_.nonEmpty)
                  if (cols.isEmpty)
                    errors += CatalogError(lineNo,
                      s"unique= needs at least one column for table $name")
                  else unique = cols
                case kv if kv.startsWith("row_tol=") =>
                  kv.drop(8).split(",", 2) match {
                    case Array(e, w) =>
                      (e.toDoubleOption, w.toDoubleOption) match {
                        case (Some(ev), Some(wv))
                            if ev >= 0 && ev <= 1 && wv >= 0 && wv <= 1 =>
                          tolE = Some(ev); tolW = Some(wv)
                        case _ =>
                          errors += CatalogError(lineNo,
                            s"invalid tolerance for table $name: $kv")
                      }
                    case _ =>
                      errors += CatalogError(lineNo,
                        s"invalid row_tol for table $name")
                  }
                case other =>
                  errors += CatalogError(lineNo,
                    s"unknown option $other for table $name")
              }
            }
            if (name == "l5_change_table") levels = Set("C")
            val files = it.toSeq
            if (files.isEmpty)
              errors += CatalogError(lineNo, s"no files defined for table $name")
            for (l <- levels) {
              val tag = s"$name level $l"
              if (!seenLevels.add(tag))
                errors += CatalogError(lineNo, s"definition for $tag repeated")
            }
            tables += TableDef(name, id, key, tolE, tolW, levels, l5full,
              files, Nil, unique)
          case ("column", values) if tables.nonEmpty =>
            values match {
              case name :: tpe :: rest =>
                val notNull = rest.map(_.toUpperCase).mkString(" ").contains("NOT NULL")
                val t = tables.last
                tables(tables.length - 1) = t.copy(columnOverrides =
                  t.columnOverrides :+ BdeFormat.BdeColumn(
                    name.toLowerCase, tpe.toLowerCase, nullable = !notNull))
              case _ =>
                errors += CatalogError(lineNo,
                  s"COLUMN needs at least a name and a type: ${values.mkString(" ")}")
            }
          case (cmd, _) =>
            errors += CatalogError(lineNo, s"invalid or out of sequence command $cmd")
        }
      }
    }
    (tables.toSeq, errors.toSeq)
  }

  /** P5 — include/exclude/subset selection, case-insensitive
    * (`lib/LINZ/BdeUpload.pm:225-253,384-405`), preserving id order (O2). */
  def select(
      tables: Seq[TableDef],
      include: Seq[String] = Nil,
      exclude: Seq[String] = Nil): Seq[TableDef] = {
    val inc = include.map(_.toLowerCase).toSet
    val exc = exclude.map(_.toLowerCase).toSet
    tables
      .filter(t => inc.isEmpty || inc.contains(t.name) || t.levels == Set("C"))
      .filterNot(t => exc.contains(t.name))
      .sortBy(_.id)
  }

  /** The change-table definition, if configured. */
  def changeTable(tables: Seq[TableDef]): Option[TableDef] =
    tables.find(_.levels == Set("C"))
}
