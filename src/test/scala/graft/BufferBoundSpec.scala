package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanized buffer-bound convention (round-12 verdict task 3).
  *
  * The WindowKeySweepSpec growth measurement has a documented blind spot:
  * a per-key buffer that is corpus-INVARIANT on the synthetic generator
  * but unbounded in the wild (the old `ewmaByUser` collected a user's
  * whole history; events/user is flat at every SF by generator design)
  * passes every cross-SF growth test. Until round 12 that class was
  * closed by a scaladoc CONVENTION — "state your buffer bound in prose"
  * — which nothing enforced. This spec enforces it: every source site
  * that materializes per-key or per-partition state
  *
  *   - `collect_list(` / `collect_set(`  (aggregation buffers),
  *   - `.mapPartitions`                  (imperative per-partition scans),
  *   - `mapGroupsWithState[` / `flatMapGroupsWithState[` (streaming state)
  *
  * must carry a machine-readable `buffer-bound: <data unit>` comment on
  * the site line or within the `tagWindow` lines above it — and ABOVE
  * the previous site, so one tag can never bless two sites. An untagged
  * site fails the build with its file:line. The tag names the unit the
  * buffer scales with (document length, session gap, segSize, artifact
  * grain, O(1) state, ...) so the reviewer audits a claim, not a guess;
  * the WindowKeySweepSpec measurement still validates what measurement
  * CAN see, and this spec guarantees the prose bound exists where it
  * can't.
  *
  * The planted-defect tests run the REAL scanner on synthetic sources in
  * both directions (untagged flagged / tagged passes / tag-reuse across
  * sites flagged / comment mentions ignored), so the sweep's own blind
  * spots are pinned the same way WindowKeySweepSpec pins its classifier.
  */
class BufferBoundSpec extends AnyFunSuite {

  /** Lines above the site in which the tag must appear (inclusive of the
    * site line itself for trailing-comment tags). Small on purpose: the
    * tag documents THIS site, not the file.
    */
  private val tagWindow = 8

  private val sitePattern =
    """(collect_list\s*\(|collect_set\s*\(|\.mapPartitions\b|[mM]apGroupsWithState[\[(])""".r
  private val tagPattern = """buffer-bound:\s*\S""".r

  private def isCommentLine(l: String): Boolean = {
    val t = l.trim
    t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
  }

  /** The line with every string-literal INTERIOR blanked to spaces
    * (length-preserving, escape-aware), so `//` inside a string is not a
    * comment cut, a site keyword inside a string is not a site, and a
    * tag inside a string is not a tag. Char literals are opaque too
    * (round-13 advice): a line containing `'"'` — e.g. `case '"' =>` —
    * must not flip the in-string state and hide (or bless) a later site
    * on the same line; the `'x'`, `'\x'` and `'\uXXXX'` forms are all
    * consumed. Single-line heuristic — the repo has no multi-line string
    * carrying these keywords, and the planted tests pin both failure
    * directions including the char-literal case.
    */
  private def blankStrings(l: String): String = {
    val b = l.toCharArray
    var i = 0
    var in = false
    while (i < b.length) {
      if (in) b(i) match {
        case '\\' =>
          b(i) = ' '
          if (i + 1 < b.length) { b(i + 1) = ' '; i += 1 }
        case '"' => in = false
        case _   => b(i) = ' '
      }
      else b(i) match {
        case '"' => in = true
        case '\'' =>
          if (i + 2 < b.length && b(i + 1) != '\\' && b(i + 2) == '\'') {
            b(i + 1) = ' '; i += 2 // 'x' — incl. '"'
          } else if (i + 3 < b.length && b(i + 1) == '\\' && b(i + 3) == '\'') {
            b(i + 1) = ' '; b(i + 2) = ' '; i += 3 // '\n', '\\', '\''
          } else if (i + 7 < b.length && b(i + 1) == '\\' && b(i + 2) == 'u' &&
                     b(i + 7) == '\'') {
            for (k <- i + 1 to i + 6) b(k) = ' '; i += 7 // '\uXXXX'
          }
        case _ => ()
      }
      i += 1
    }
    new String(b)
  }

  /** The comment text of a line (empty if none): the whole line for
    * comment-only lines, else everything from the first REAL `//` —
    * string-blanked indices, so a url's `//` never starts a comment.
    */
  private def commentPart(l: String): String =
    if (isCommentLine(l)) l
    else blankStrings(l).indexOf("//") match {
      case -1 => ""
      case j  => l.substring(j)
    }

  /** Untagged buffer sites of one source text, as "name:line: snippet".
    * Shared verbatim by the repo sweep and the planted-defect tests.
    * Tags count only inside COMMENTS; sites count only inside CODE
    * (outside comments and string literals).
    */
  private[graft] def untaggedSites(name: String, text: String): Seq[String] = {
    val lines = text.split("\n", -1)
    var prevSite = -1
    val out = Seq.newBuilder[String]
    for (i <- lines.indices) {
      val line = lines(i)
      val blanked = blankStrings(line)
      val code =
        if (isCommentLine(line)) ""
        else blanked.indexOf("//") match {
          case -1 => blanked
          case j  => blanked.substring(0, j)
        }
      if (sitePattern.findFirstIn(code).nonEmpty) {
        // the window starts after the previous site: a tag is one site's
        // documentation, never a blanket bless for everything below it
        val from = math.max(math.max(0, i - tagWindow), prevSite + 1)
        val tagged = (from to i).exists(k =>
          tagPattern.findFirstIn(commentPart(lines(k))).nonEmpty)
        if (!tagged) out += s"$name:${i + 1}: ${line.trim}"
        prevSite = i
      }
    }
    out.result()
  }

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val es = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    es.filter(_.isDirectory).flatMap(scalaFiles) ++
      es.filter(f => f.isFile && f.getName.endsWith(".scala"))
  }

  test("every collect/mapPartitions/state site in src/main carries a buffer-bound tag") {
    val root = new java.io.File("src/main/scala")
    assert(root.isDirectory, s"source root not found from ${new java.io.File(".").getAbsolutePath}")
    val files = scalaFiles(root).sortBy(_.getPath)
    assert(files.nonEmpty)
    val violations = files.flatMap { f =>
      untaggedSites(f.getPath, new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    }
    assert(violations.isEmpty,
      "buffer sites without a `buffer-bound: <data unit>` tag (state the " +
        s"unit the buffer scales with, within $tagWindow lines above the " +
        s"site):\n  ${violations.mkString("\n  ")}")
  }

  test("planted untagged collect IS flagged; tagged collect is NOT") {
    val untagged =
      """val x = df.groupBy(col("k"))
        |  .agg(collect_list(col("v")).as("vs"))""".stripMargin
    assert(untaggedSites("planted", untagged).exists(_.startsWith("planted:2")),
      "an untagged collect_list must fail the sweep")
    val tagged =
      """val x = df.groupBy(col("k"))
        |  // buffer-bound: rows of ONE document (document length)
        |  .agg(collect_list(col("v")).as("vs"))""".stripMargin
    assert(untaggedSites("planted", tagged).isEmpty,
      "a tagged collect_list must pass")
  }

  test("a tag blesses exactly one site — the next untagged site still fails") {
    val two =
      """// buffer-bound: dim+1 model weights
        |val a = m.agg(collect_list(col("w")).as("ws"))
        |val b = df.groupBy(col("k")).agg(collect_set(col("v")).as("vs"))""".stripMargin
    val hits = untaggedSites("planted", two)
    assert(hits.size == 1 && hits.head.startsWith("planted:3"),
      s"the second site must not ride the first site's tag: $hits")
  }

  test("a tag farther than the window does not count; comment mentions are not sites") {
    val far =
      ("// buffer-bound: something\n" + ("val pad = 1\n" * 9) +
        "val a = df.agg(collect_list(col(\"v\")))")
    assert(untaggedSites("planted", far).nonEmpty,
      "a tag 10 lines above the site is file-lore, not site documentation")
    val comments =
      """// collect_list here would buffer the corpus
        |/** the old form used .mapPartitions { ... } */
        |val ok = df.count() // not collect_set(anything)""".stripMargin
    assert(untaggedSites("planted", comments).isEmpty,
      "keyword mentions inside comments are not buffer sites")
  }

  test("untagged mapPartitions and stateful-stream sites are flagged too") {
    val mp = "val r = ds.mapPartitions { it => it }"
    assert(untaggedSites("planted", mp).nonEmpty)
    val st = "val s = ds.groupByKey(_.k).flatMapGroupsWithState[S, O](m, t) { f }"
    assert(untaggedSites("planted", st).nonEmpty,
      "flatMapGroupsWithState carries state and needs a bound tag")
    val stNoBrackets = "val s = ds.groupByKey(_.k).mapGroupsWithState(update _)"
    assert(untaggedSites("planted", stNoBrackets).nonEmpty,
      "mapGroupsWithState without explicit type arguments is still a site")
  }

  test("string literals neither hide sites nor bless them") {
    // a `//` inside a string must not comment out the rest of the line —
    // the site after it is real and untagged
    val hidden = """val u = "proto://host"; val a = df.agg(collect_list(col("v")))"""
    assert(untaggedSites("planted", hidden).nonEmpty,
      "a string containing // must not hide the site after it")
    // a tag INSIDE a string is data, not documentation — it must not
    // bless the site below it
    val fakeTag =
      """val s = "buffer-bound: x"
        |val a = df.agg(collect_list(col("v")))""".stripMargin
    assert(untaggedSites("planted", fakeTag).nonEmpty,
      "a tag inside a string literal must not count")
    // and a site keyword inside a string is not a site
    val fakeSite = """val msg = "use collect_list( sparingly)""""
    assert(untaggedSites("planted", fakeSite).isEmpty,
      "a site keyword inside a string literal is not a site")
    // a real trailing-comment tag still counts
    val trailing = """val a = df.agg(collect_list(col("v"))) // buffer-bound: one doc"""
    assert(untaggedSites("planted", trailing).isEmpty,
      "a trailing-comment tag on the site line must count")
  }

  test("char literals are opaque: '\"' must not flip the string state " +
       "(round-13 advice)") {
    // a double-quote CHAR LITERAL before a real site: the broken scanner
    // entered string mode at '"' and blanked the site away
    val site = """case '"' => df.agg(collect_list(col("v")))"""
    assert(untaggedSites("planted", site).nonEmpty,
      "a site after a '\"' char literal is real and untagged")
    // ...and the same shape must not blank a REAL trailing tag either
    val tagged = """case '"' => df.agg(collect_list(col("v"))) // buffer-bound: one doc"""
    assert(untaggedSites("planted", tagged).isEmpty,
      "a tag after a '\"' char literal must still count")
    // escaped and unicode char forms consume correctly too
    val esc = """val q = '\''; val a = df.agg(collect_list(col("v")))"""
    assert(untaggedSites("planted", esc).nonEmpty)
    val uni = """val u = '"'; val a = df.agg(collect_list(col("v")))"""
    assert(untaggedSites("planted", uni).nonEmpty)
    // a site keyword inside a STRING after a char literal is still not a site
    val fake = """case '"' => log("collect_list( in a string")"""
    assert(untaggedSites("planted", fake).isEmpty)
  }
}
