package graft.bde

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Entry-for-entry proof of the LDS character map: re-parse the reference's
 * bde_copy configuration (`/root/reference/conf/linz_bde_uploader.conf`,
 * the `replace` rules at 415-1242 plus the two utf8 policies at 407-409)
 * at test time, and assert
 *
 *  1. the literal rule set equals the compiled [[Clean.LdsReplaceMap]] +
 *     [[Clean.LdsKeepRanges]] transcription, and
 *  2. the ACTUAL Spark pipeline (`Clean.cleanString` under
 *     [[Clean.ldsConfig]]) maps every BMP code point — and a sample of
 *     supplementary ones — exactly as the parsed rules dictate.
 *
 * A single exotic-character divergence between the transcription and the
 * conf therefore fails CI instead of surfacing as silent data drift.
 */
class CleanLdsConfSpec extends SparkSuite {
  import spark.implicits._

  private val ConfPath = "/root/reference/conf/linz_bde_uploader.conf"

  /** bde_copy token syntax: `\xNN` hex byte, `\uNNNN` code point, `\s`
    * space, `\\` backslash (optionally fused with following literal
    * chars, e.g. `\\n` = backslash + 'n'), else the literal token. */
  private def decodeTok(t: String): String = t match {
    case "\\s"  => " "
    case "\\\\" => "\\"
    case x if x.startsWith("\\x") && x.length == 4 =>
      Integer.parseInt(x.drop(2), 16).toChar.toString
    case x if x.startsWith("\\u") && x.length == 6 =>
      Integer.parseInt(x.drop(2), 16).toChar.toString
    case x if x.startsWith("\\\\") => "\\" + x.drop(2)
    case x => x
  }

  private lazy val confLines =
    scala.io.Source.fromFile(ConfPath, "UTF-8").getLines().toSeq

  /** (from → to) for every `replace` rule, in file order. */
  private lazy val rules: Seq[(String, String)] = confLines.flatMap { ln0 =>
    val ln = ln0.trim
    if (!ln.startsWith("replace ")) None
    else {
      val parts = ln.split("\\s+")
      val from = decodeTok(parts(1))
      val to =
        if (parts.length < 3 || parts(2) == "delete" || parts(2) == "none") ""
        else decodeTok(parts(2))
      Some(from -> to)
    }
  }

  private lazy val unmappedRepl: String = confLines
    .map(_.trim).find(_.startsWith("utf8_replace_unmapped"))
    .map(_.split("\\s+")(1)).getOrElse(fail("no utf8_replace_unmapped"))

  test("conf policies: invalid deletes, unmapped becomes '?'") {
    assert(unmappedRepl == "?")
    val inv = confLines.map(_.trim)
      .find(_.startsWith("utf8_replace_invalid")).get.split("\\s+")(1)
    assert(inv == "delete")
    assert(Clean.ldsConfig.utf8ReplaceInvalid.contains(""))
    assert(Clean.ldsConfig.replaceUnmapped.contains("?"))
  }

  test("transcription equals the conf's literal rule set") {
    assert(rules.map(_._1).distinct.size == rules.size,
      "conf must not have duplicate keys")
    val identityKeys = rules.collect { case (f, t) if f == t => f.charAt(0).toInt }
    val nonIdentity = rules.filter { case (f, t) => f != t }.toMap
    val keepSet = Clean.LdsKeepRanges
      .flatMap { case (a, b) => a to b }.toSet
    assert(identityKeys.toSet == keepSet,
      s"keep ranges diverge: onlyConf=${(identityKeys.toSet -- keepSet).map(_.toHexString)} " +
        s"onlyCompiled=${(keepSet -- identityKeys.toSet).map(_.toHexString)}")
    assert(Clean.LdsReplaceMap.toMap == nonIdentity,
      s"map diverges: onlyConf=${(nonIdentity.toSet -- Clean.LdsReplaceMap.toSet)
          .map { case (f, t) => (f.map(_.toInt.toHexString), t) }} " +
        s"onlyCompiled=${(Clean.LdsReplaceMap.toSet -- nonIdentity.toSet)
          .map { case (f, t) => (f.map(_.toInt.toHexString), t) }}")
  }

  test("compiled pipeline matches the parsed rules over the whole BMP") {
    val ruleMap = rules.toMap
    // the reference judges each INPUT character independently: mapped →
    // its replacement; ASCII → itself; anything else → the unmapped
    // replacement. U+FFFD is exempt: in this engine it marks a byte the
    // decoder could not decode, which the reference deletes at decode
    // time (utf8_replace_invalid delete) before the map ever sees it
    def expected(cp: Int): String = {
      val s = new String(Character.toChars(cp))
      ruleMap.getOrElse(s, if (cp <= 0x7F) s else unmappedRepl)
    }
    val testPoints = ((0x01 to 0xFFFF)
      .filterNot(cp => cp >= 0xD800 && cp <= 0xDFFF) // lone surrogates
      .filterNot(_ == 0xFFFD) ++
      Seq(0x10000, 0x1D11E, 0x1F600, 0x10FFFF)).toSeq // supplementary sample
    val df = testPoints
      .map(cp => (cp, new String(Character.toChars(cp)))).toDF("cp", "s")
    val got = df.select(col("cp"),
        Clean.cleanString(col("s"), Clean.ldsConfig).as("out"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val bad = testPoints.filter(cp => got(cp) != expected(cp))
    assert(bad.isEmpty,
      s"${bad.size} diverging code points, first 20: " +
        bad.take(20).map(cp =>
          f"U+$cp%04X got=${got(cp)} want=${expected(cp)}").mkString(", "))
    // and the invalid-byte marker itself is deleted
    val fffd = Seq((0, "a�b")).toDF("cp", "s")
      .select(Clean.cleanString(col("s"), Clean.ldsConfig))
      .collect()(0).getString(0)
    assert(fffd == "ab")
  }
}
