package graft.router

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.config._

/** Property-style randomized routing tests (SURVEY §5.2-2): the Catalyst
  * CASE WHEN route must agree with an INDEPENDENT plain-Scala interpreter
  * of the reference semantics on randomized plans and messages, and every
  * message must land in exactly one of {some split topic, unmatched,
  * dropped}. Deterministic seeds keep failures reproducible.
  */
class RouterPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Independent reference interpreter: first-match find over splits;
    * drop claims; unmatched only when zero splits match (main.go:490-655).
    */
  private def routeScala(value: String, s: ResolvedSpliter): Option[String] =
    s.splits.find { sp =>
      if (sp.extractor.useRegex)
        java.util.regex.Pattern.compile(sp.extractor.pattern).matcher(value).find()
      else value.contains(sp.extractor.pattern)
    } match {
      case Some(sp) => sp.topic
      case None     => s.unmatchedTopic
    }

  // small alphabet => dense pattern/message collisions exercise ordering
  private def word(r: Random): String =
    (1 to (1 + r.nextInt(3))).map(_ => ('a' + r.nextInt(3)).toChar).mkString

  private def message(r: Random): String =
    (0 until r.nextInt(13)).map(_ => ('a' + r.nextInt(3)).toChar).mkString

  private def genSpliter(r: Random): ResolvedSpliter = {
    val splits = (1 to (1 + r.nextInt(6))).map { _ =>
      val pat = word(r)
      val useRegex = r.nextInt(3) == 0 // literal-safe: alphabet is a-c only
      r.nextInt(4) match {
        case 0 => Split(Extractor(pat, useRegex), outputTopic = Some(s"topic-$pat"))
        case 1 => Split(Extractor(pat, useRegex), action = Some("debug"))
        case 2 => Split(Extractor(pat, useRegex), action = Some("missing-action")) // drop
        case _ => Split(Extractor(pat, useRegex)) // implicit matched (or drop if absent)
      }
    }
    val actions = Map("debug" -> "t-debug") ++
      (if (r.nextBoolean()) Map("matched" -> "t-matched") else Map.empty) ++
      (if (r.nextBoolean()) Map("unmatched" -> "t-unmatched") else Map.empty)
    PlanResolver.resolveSpliter(Spliter("in", actions, splits))
  }

  test("Catalyst route == independent Scala interpreter on random plans") {
    (1 to 12).foreach { trial =>
      val r = new Random(42L + trial)
      val spliter = genSpliter(r)
      val messages = (1 to 80).map(_ => message(r))
      val df = messages.zipWithIndex.map { case (m, i) => (i, m) }.toDF("id", "value")
      val got = Router.routeKeep(df, spliter)
        .select($"id", $"topic").as[(Int, Option[String])].collect().toMap
      messages.zipWithIndex.foreach { case (m, i) =>
        assert(got(i) == routeScala(m, spliter),
          s"trial $trial: message '$m' diverged for plan $spliter")
      }
    }
  }

  test("totality: every message lands in exactly one disposition") {
    (1 to 8).foreach { trial =>
      val r = new Random(4242L + trial)
      val spliter = genSpliter(r)
      val messages = (1 to 60).map(_ => message(r))
      val df = messages.zipWithIndex.map { case (m, i) => (i, m) }.toDF("id", "value")
      val topics = Router.routeKeep(df, spliter)
        .select($"id", $"topic").as[(Int, Option[String])].collect()
      assert(topics.length == messages.length) // no row lost or duplicated
      val legal: Set[Option[String]] =
        spliter.splits.map(_.topic).toSet + spliter.unmatchedTopic + None
      topics.foreach { case (_, t) => assert(legal.contains(t)) }
    }
  }
}
