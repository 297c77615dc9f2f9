package graft.ops

/** Text-analysis operators for training-data curation (SURVEY §2.3):
  * language ID, quality scoring, token counting, document fingerprinting,
  * deterministic sampling/sharding/packing, retrieval statistics,
  * distribution-relative curation, BPE vocab induction, and gram novelty.
  * Mostly pure Catalyst expressions — per-row, shuffle-free,
  * codegen-friendly; at 100 TB the expression ops run at scan speed.
  *
  * The object is the single public surface; the implementation lives in
  * seven cohesive self-typed partitions (one file each — [[TextCore]],
  * [[TextDecontaminate]], [[TextSampling]], [[TextRetrieval]],
  * [[TextCuration]], [[TextVocab]], [[TextClassifier]]) so no single file
  * carries thirty operators. Call sites are unchanged: every member is
  * `TextAnalysis.<op>`.
  *
  * Serializable because lambdas defined in the TRAIT bodies reference
  * sibling members through the self-type, so they capture the module
  * instance (methods defined directly in an object compile to static
  * MODULE$ access and capture nothing — the pre-split form never
  * exercised this). The module's state is four small config vals;
  * deserialization resolves back to the singleton via Scala's module
  * serialization proxy.
  */
object TextAnalysis
  extends Serializable
  with TextCore
  with TextDecontaminate
  with TextSampling
  with TextRetrieval
  with TextCuration
  with TextVocab
  with TextUnigram
  with TextClassifier
