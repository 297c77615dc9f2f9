package graft.fixtures

import graft.config._

/** A routing plan over the `documents` table used by the correctness
  * harness. Shaped exactly like the reference's plan grammar
  * (reference topic.yaml:16-55) but with predicates that discriminate on
  * the synthetic document corpus, and with a TRUE drop split (action key
  * absent from `actions`) — the R5 case the reference's own fixtures never
  * exercise (SURVEY §7.4-2).
  *
  * Split order is load-bearing (first-match-wins):
  *   1. regex  `spark (query|stream)`      → explicit topic t-spark
  *   2. substr `window`                    → action debug → t-debug
  *   3. substr `filter`                    → action `discard` (ABSENT from
  *      actions) → DROP: claims the message, goes nowhere (R5)
  *   4. substr `join`                      → implicit matched → t-matched
  *   else                                  → unmatched → t-unmatched
  */
object DocRoutePlan {
  val spliter: Spliter = Spliter(
    inputTopic = "documents",
    actions = Map(
      "matched" -> "t-matched",
      "unmatched" -> "t-unmatched",
      "debug" -> "t-debug",
    ),
    splits = Seq(
      Split(Extractor("spark (query|stream)", useRegex = true), outputTopic = Some("t-spark")),
      Split(Extractor("window"), action = Some("debug")),
      Split(Extractor("filter"), action = Some("discard")),
      Split(Extractor("join")),
    ),
  )

  val resolved: ResolvedSpliter = PlanResolver.resolveSpliter(spliter)

  /** The same plan as YAML text (anchor included) — exercises the codec
    * path end-to-end in specs.
    */
  val yaml: String =
    """---
      |extractors:
      |  spark_q: &spark_q
      |    pattern: 'spark (query|stream)'
      |    use_regex: true
      |spliters_templates:
      |  - input_topic: 'documents'
      |    actions:
      |      matched: 't-matched'
      |      unmatched: 't-unmatched'
      |      debug: 't-debug'
      |    splits:
      |      - extractor: *spark_q
      |        output_topic: 't-spark'
      |      - extractor:
      |          pattern: 'window'
      |        action: debug
      |      - extractor:
      |          pattern: 'filter'
      |        action: discard
      |      - extractor:
      |          pattern: 'join'
      |""".stripMargin
}
