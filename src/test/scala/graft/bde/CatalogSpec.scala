package graft.bde

import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {

  private val sample =
    """# comment
      |
      |TABLE l5_change_table files xchg
      |TABLE alpha key=id unique=code,serial row_tol=0.20,0.95 files alp1 alp2
      |TABLE beta l0_only files bet
      |TABLE gamma l5_only key=audit_id files gam
      |TABLE delta l5_is_full key=id files del
      |COLUMN id integer
      |COLUMN name varchar
      |""".stripMargin

  test("grammar: options, files, ids, change table, column overrides") {
    val (tables, errors) = Catalog.parse(sample.linesIterator)
    assert(errors.isEmpty)
    assert(tables.map(_.name) == Seq("l5_change_table", "alpha", "beta", "gamma", "delta"))
    assert(tables.map(_.id) == Seq(1, 2, 3, 4, 5))
    val alpha = tables(1)
    assert(alpha.key.contains("id"))
    assert(alpha.rowTolError.contains(0.20) && alpha.rowTolWarning.contains(0.95))
    assert(alpha.uniqueCols == Seq("code", "serial"))
    assert(alpha.files == Seq("alp1", "alp2"))
    assert(tables(2).uniqueCols.isEmpty)
    assert(tables(2).levels == Set("0"))
    assert(tables(3).levels == Set("5"))
    assert(tables(4).level5IsFull)
    assert(tables(4).columnOverrides == Seq(
      BdeFormat.BdeColumn("id", "integer", nullable = true),
      BdeFormat.BdeColumn("name", "varchar", nullable = true)))
    assert(tables.head.levels == Set("C"))
    assert(Catalog.changeTable(tables).map(_.files) == Some(Seq("xchg")))
  }

  test("errors: missing files, bad tolerance, repeated definition, stray command") {
    val bad =
      """TABLE nofiles key=id
        |TABLE badtol row_tol=2.0,0.5 files f
        |TABLE badunique unique= files f
        |TABLE dup files f
        |TABLE dup files g
        |COLUMN orphan won't attach
        |BOGUS command
        |""".stripMargin
    // the orphan COLUMN *does* attach (a table exists); BOGUS is an error
    val (tables, errors) = Catalog.parse(bad.linesIterator)
    assert(tables.size == 5)
    assert(errors.exists(_.message.contains("no files")))
    assert(errors.exists(_.message.contains("invalid tolerance")))
    assert(errors.exists(_.message.contains("unique= needs at least one column")))
    assert(errors.exists(_.message.contains("repeated")))
    assert(errors.exists(_.message.contains("invalid or out of sequence")))
  }

  test("selection: include keeps change table, exclude wins, id order") {
    val (tables, _) = Catalog.parse(sample.linesIterator)
    val sel = Catalog.select(tables,
      include = Seq("DELTA", "alpha", "gamma"), exclude = Seq("Gamma"))
    assert(sel.map(_.name) == Seq("l5_change_table", "alpha", "delta"))
  }
}
