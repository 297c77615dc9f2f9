package graft.router

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.{ResolvedSpliter, ResolvedSplit}

/** The routing core: first-match-wins ordered multiway routing as a single
  * Catalyst `CASE WHEN` chain.
  *
  * Reference semantics replicated (reference main.go:490-655):
  *   1. predicates evaluate in declared split order; first hit wins
  *      (main.go:595-597) — `when(...).when(...)` IS first-match-wins;
  *   2. a drop split (resolved topic == None) still CLAIMS the message: its
  *      `when` branch yields NULL in position, so later splits and the
  *      unmatched route never see it (main.go:533-541);
  *   3. "unmatched" = matched by zero splits → the `otherwise` branch
  *      (main.go:599-606); when no unmatched topic is configured the
  *      otherwise is NULL and the row is filtered out;
  *   4. matching reads only `value` cast to string; `key` rides along
  *      untouched (main.go:515,521 / main.go:497);
  *   5. payloads are forwarded verbatim — no rewrite (main.go:496-499).
  *
  * Why this design scales: the whole route is ONE narrow (per-row,
  * shuffle-free) projection that Catalyst compiles into whole-stage codegen.
  * Regex patterns are foldable literals, so `RLike` compiles each pattern
  * once per task (mirroring the reference's plan-time precompile,
  * main.go:447-457). At 100 TB this is embarrassingly parallel: no shuffle,
  * no state, throughput scales linearly with input partitions.
  *
  * Regex dialect note (SURVEY §2.1 F1): the reference uses Go RE2
  * `regexp.Match` (unanchored find); Spark `rlike` is Java regex unanchored
  * find. All shipped patterns are in the RE2∩Java common subset. Patterns
  * using RE2-only or Java-only syntax would diverge; `PlanResolver` compiles
  * each pattern with java.util.regex at plan time to fail fast.
  */
object Router {

  /** Strip redundant leading/trailing `.*` from a pattern destined for
    * unanchored find: `find(".*X.*")` ≡ `find("X")`. The reference's RE2 is
    * linear-time so its plans carry the wrappers harmlessly
    * (topic.yaml:5); Java regex backtracks, making a leading `.*` O(n²) on
    * misses — measured 3× router throughput from this rewrite alone.
    * Conservative: only bare `.*` (not `\.*`, not `.*?`, no anchors) is
    * stripped, and never below an empty pattern.
    */
  private[graft] def stripRedundantWildcards(p: String): String = {
    var s = p
    // leading ".*" strips only when what follows is not another quantifier:
    // ".*?x" is lazy, ".*+x" possessive, ".*{2}x" counted, ".**x" stacked —
    // stripping any of those changes semantics or leaves an invalid regex
    def leadingBare(t: String): Boolean =
      t.startsWith(".*") &&
        (t.length == 2 || !"?*+{".contains(t.charAt(2)))
    while (leadingBare(s) && s.length > 2) s = s.substring(2)
    // trailing ".*" unless the dot is escaped ("\.*") or quantifier is lazy
    def endsWithBare(t: String): Boolean =
      t.endsWith(".*") && !t.endsWith("\\.*") && !t.endsWith(".*?")
    while (endsWithBare(s)) s = s.substring(0, s.length - 2)
    if (s.isEmpty) p else s
  }

  /** Predicate for one split: regex (F1, main.go:510-515) or substring
    * (F2, main.go:517-522), both over the string view of `value`.
    */
  def predicate(value: Column, s: ResolvedSplit): Column =
    if (s.extractor.useRegex) value.rlike(stripRedundantWildcards(s.extractor.pattern))
    else value.contains(lit(s.extractor.pattern))

  /** The ordered routing expression: value column → topic (nullable).
    * NULL means "discard" (either a drop split claimed it, or it was
    * unmatched with no unmatched topic configured).
    */
  def routeExpr(value: Column, spliter: ResolvedSpliter): Column = {
    val chain = spliter.splits.foldLeft(Option.empty[Column]) { (acc, s) =>
      val dest = s.topic.map(lit).getOrElse(lit(null).cast("string"))
      val p = predicate(value, s)
      Some(acc match {
        case None    => when(p, dest)
        case Some(c) => c.when(p, dest)
      })
    }
    val unmatched = spliter.unmatchedTopic.map(lit).getOrElse(lit(null).cast("string"))
    chain match {
      case Some(c) => c.otherwise(unmatched)
      case None    => unmatched // degenerate: no splits at all
    }
  }

  /** Route a DataFrame that has `key`/`value` columns (any type castable to
    * string for `value`): adds the `topic` column, discards claimed-drop and
    * unroutable rows, and projects to the Kafka-sink shape
    * `(key, value, topic)` — the reference's P1 projection (main.go:496-499)
    * which strips headers/offsets/timestamps.
    */
  def route(df: DataFrame, spliter: ResolvedSpliter): DataFrame =
    routeKeep(df, spliter)
      .filter(col("topic").isNotNull)
      .select(col("key"), col("value"), col("topic"))

  /** Like `route` but keeps all columns and NULL-topic rows — useful for
    * diagnostics and for the correctness harness (count drops/unmatched).
    */
  def routeKeep(df: DataFrame, spliter: ResolvedSpliter): DataFrame =
    df.withColumn("topic", routeExpr(col("value").cast("string"), spliter))

  /** The routing expression rendered as ANSI SQL (CASE WHEN ... RLIKE /
    * LIKE), for the DuckDB oracle track. Must stay semantically identical
    * to `routeExpr`.
    */
  def routeSql(valueExpr: String, spliter: ResolvedSpliter): String = {
    def sq(s: String) = "'" + s.replace("'", "''") + "'"
    def like(p: String) = {
      // substring containment via LIKE with escaped wildcards
      val esc = p.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      s"$valueExpr LIKE ${sq("%" + esc + "%")} ESCAPE '\\'"
    }
    val whens = spliter.splits.map { s =>
      val pred =
        if (s.extractor.useRegex) s"regexp_matches($valueExpr, ${sq(s.extractor.pattern)})"
        else like(s.extractor.pattern)
      val dest = s.topic.map(sq).getOrElse("CAST(NULL AS VARCHAR)")
      s"WHEN $pred THEN $dest"
    }
    val unmatched = spliter.unmatchedTopic.map(sq).getOrElse("CAST(NULL AS VARCHAR)")
    if (whens.isEmpty) unmatched
    else s"CASE ${whens.mkString(" ")} ELSE $unmatched END"
  }
}
