package graft.config

/** Routing-plan model, mirroring the reference's control-plane schema
  * (reference: main.go:87-107 — `Split`, `Spliter`, `Extractor`,
  * `SpliterCollection`). The data plane stays schemaless (binary key/value);
  * only the plan is structured.
  *
  * Semantics carried over exactly:
  *   - a split names EITHER an `outputTopic` OR an `action` (main.go:87-92);
  *   - actions resolve through the spliter's `actions` map (main.go:397-418);
  *   - a split with neither falls back to `actions("matched")`
  *     (main.go:389-396);
  *   - an action key absent from the map means DROP: the split still claims
  *     matching messages but writes nowhere (main.go:409-417, 533-541).
  */
final case class Extractor(pattern: String, useRegex: Boolean = false)

final case class Split(
    extractor: Extractor,
    outputTopic: Option[String] = None,
    action: Option[String] = None,
)

final case class Spliter(
    inputTopic: String,
    actions: Map[String, String] = Map.empty,
    splits: Seq[Split] = Nil,
)

final case class SpliterCollection(spliters: Seq[Spliter])

/** A split after action→topic resolution: predicate + destination.
  * `topic == None` means drop (matched-then-discarded, still claims the
  * message — reference main.go:533-541).
  */
final case class ResolvedSplit(extractor: Extractor, topic: Option[String])

/** A spliter after resolution. `unmatchedTopic == None` means messages
  * matching no split are discarded (reference main.go:460-482: the
  * unmatched writer only exists when `actions.unmatched` is configured).
  */
final case class ResolvedSpliter(
    inputTopic: String,
    splits: Seq[ResolvedSplit],
    unmatchedTopic: Option[String],
)

object PlanResolver {
  /** Pure plan-compile step replicating reference main.go:386-419:
    *  1. explicit `output_topic` wins;
    *  2. else `action` resolved via `actions` map; a MISSING key → drop;
    *  3. else implicit default: `actions("matched")`, missing → drop.
    * Regex patterns are validated eagerly (the reference compiles them at
    * produce-setup, main.go:447-457; we fail fast at plan compile instead).
    */
  def resolve(plan: SpliterCollection): Seq[ResolvedSpliter] =
    plan.spliters.map(resolveSpliter)

  def resolveSpliter(s: Spliter): ResolvedSpliter = {
    val resolved = s.splits.map { sp =>
      val topic: Option[String] = sp.outputTopic match {
        case Some(t) => Some(t)
        case None =>
          sp.action match {
            case Some(a) => s.actions.get(a) // absent key => drop (R5)
            case None    => s.actions.get("matched") // implicit default (R4)
          }
      }
      if (sp.extractor.useRegex)
        java.util.regex.Pattern.compile(sp.extractor.pattern) // fail fast
      ResolvedSplit(sp.extractor, topic)
    }
    ResolvedSpliter(s.inputTopic, resolved, s.actions.get("unmatched"))
  }
}
