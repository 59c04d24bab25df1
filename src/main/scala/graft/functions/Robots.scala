package graft.functions

/** robots.txt parsing + URL evaluation (RFC 9309) — the crawl-
  * politeness DECISION layer a pipeline runs before it fetches
  * anything: at crawl scale every candidate URL is screened against
  * its host's robots rules, so the evaluator must be a deterministic
  * kernel, not a per-host external call.
  *
  * Implements the standardized semantics:
  *  - groups selected by user-agent product token — the LONGEST
  *    matching token wins, `*` is the fallback group; multiple
  *    consecutive `User-agent` lines share one group;
  *  - `Allow` / `Disallow` patterns with `*` wildcards and the `$`
  *    end anchor;
  *  - rule precedence by LONGEST PATTERN (octet length), `Allow`
  *    winning length ties;
  *  - no matching rule (or an empty `Disallow:`) ⇒ allowed;
  *  - unknown directives and comments are skipped, case-insensitive
  *    field names, tolerant of missing values.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String) {
    /** RFC 9309 matching: '*' matches any octet sequence; a trailing
      * '$' anchors at end-of-path; otherwise prefix semantics.
      */
    private[Robots] val regex: java.util.regex.Pattern = {
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val sb = new StringBuilder
      body.foreach {
        case '*' => sb.append(".*")
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      if (!anchored) sb.append(".*")
      java.util.regex.Pattern.compile(sb.toString)
    }
    def matches(path: String): Boolean = regex.matcher(path).matches()
  }

  final case class Group(agents: Seq[String], rules: Seq[Rule])

  final case class RuleSet(groups: Seq[Group]) {
    /** The group whose agent token is the longest match for `agent`
      * (case-insensitive substring-token semantics: a group token
      * matches if the agent product token starts with it), falling
      * back to `*`; None when no group applies.
      */
    def groupFor(agent: String): Option[Group] = {
      val a = agent.toLowerCase
      val candidates = groups.flatMap { g =>
        g.agents.collect {
          case t if t == "*" => (0, g)
          case t if a.startsWith(t.toLowerCase) => (t.length, g)
        }
      }
      if (candidates.isEmpty) None else Some(candidates.maxBy(_._1)._2)
    }

    /** (allowed, matched pattern or "" when no rule applied). */
    def evaluate(agent: String, path: String): (Boolean, String) =
      groupFor(agent) match {
        case None => (true, "")
        case Some(g) =>
          val hits = g.rules.filter(r => r.pattern.nonEmpty && r.matches(path))
          if (hits.isEmpty) (true, "")
          else {
            // longest pattern wins; Allow wins length ties
            val best = hits.maxBy(r => (r.pattern.length, r.allow))
            (best.allow, best.pattern)
          }
      }
  }

  /** Parse robots.txt content; never throws (malformed lines skip). */
  def parse(content: String): RuleSet = {
    if (content == null) return RuleSet(Nil)
    val groups = Seq.newBuilder[Group]
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.reverse, rules.reverse)
      agents = Nil; rules = Nil
    }
    content.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val field = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) { flush(); inAgents = true }
            agents = value :: agents
          case "allow" | "disallow" =>
            inAgents = false
            if (agents.nonEmpty) rules = Rule(field == "allow", value) :: rules
          case _ => inAgents = false // sitemap, crawl-delay, unknown
        }
      }
    }
    flush()
    RuleSet(groups.result())
  }
}
