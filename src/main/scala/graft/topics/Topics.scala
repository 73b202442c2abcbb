package graft.topics

/** Input topic failed the `ingest.<tenant>.<dataIntegrator>[.qualifier].in` contract
  * (reference TopicNamingException.scala:9). */
class TopicNamingException(msg: String) extends RuntimeException(msg)

/** Topic-name validation and derivation — U1 in SURVEY.md §2.6.
  *
  * Semantics from reference BaseValidationJob.scala:56-75,297-311 and
  * BaseValidationJobPropertiesTest.scala:32-111: the input topic must have ≥4
  * dot-separated parts, prefix `ingest.` and suffix `.in`; the sibling topics are
  * derived by swapping the suffix, and the tenant is part[1].
  */
object Topics {
  private val Prefix = "ingest."
  private val Suffix = ".in"

  def validate(inputTopic: String): String = {
    val parts = inputTopic.split("\\.", -1)
    if (parts.length < 4 || !inputTopic.startsWith(Prefix) || !inputTopic.endsWith(Suffix))
      throw new TopicNamingException(
        s"The Input Topic name '$inputTopic' is invalid: must match ingest.<tenant>.<dataIntegrator>[.qualifier].in")
    inputTopic
  }

  private def base(inputTopic: String): String = {
    validate(inputTopic)
    inputTopic.stripSuffix(Suffix)
  }

  def outputTopic(inputTopic: String): String       = base(inputTopic) + ".out"
  def invalidTopic(inputTopic: String): String      = base(inputTopic) + ".invalid"
  def notificationTopic(inputTopic: String): String = base(inputTopic) + ".notification"
  def tenantId(inputTopic: String): String          = { validate(inputTopic); inputTopic.split("\\.")(1) }
}
