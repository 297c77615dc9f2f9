package graft.fixtures

import graft.config._

/** A routing plan with the reference's production shape (reference
  * topic.yaml:30-44): one regex CIDR split and a four-way substring
  * spliter with debug/implicit/drop routes. Used by the throughput bench
  * and specs; predicates match the generated corpus in `Bench`.
  */
object RefRoutePlan {
  val cidrPattern: String =
    """.*"source":"10\.220\.(6[4-9]|7[0-1])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])".*"""

  val openstack: ResolvedSpliter = PlanResolver.resolveSpliter(Spliter(
    inputTopic = "openstack-in",
    actions = Map(
      "matched" -> "os-match", "unmatched" -> "os-unmatched",
      "debug" -> "os-debug"),
    splits = Seq(
      Split(Extractor(cidrPattern, useRegex = true), outputTopic = Some("office-match")),
      Split(Extractor("source\":\"/var/log/syslog"), outputTopic = Some("forti-match")),
      Split(Extractor("source\":\"/var/log/ceph/ceph-mon"), action = Some("debug")),
      Split(Extractor("source\":\"/var/log/ceph/ceph.log")),
      Split(Extractor("source\":\"/var/log/ceph/ceph-osd"), action = Some("drop-missing")), // R5 drop
    ),
  ))
}
