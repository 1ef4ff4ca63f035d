package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt parsing and the crawl-politeness screen — the decision a
  * crawl pipeline owes every URL before fetching it (and a re-check a
  * training pipeline owes archived crawls whose robots changed).
  *
  * Parsing follows the Robots Exclusion Protocol's group structure
  * (RFC 9309 §2.2): one or more consecutive `User-agent:` lines open a
  * group, `Allow:`/`Disallow:` lines fill it, a `User-agent:` line
  * after rules starts the next group; `#` comments strip; unknown
  * directives (Sitemap, Crawl-delay, …) are ignored without breaking
  * the group. Agent selection per RFC 9309 §2.2.1: the group matching
  * the product token is used ALONE when present, the `*` group only
  * otherwise.
  *
  * Matching contract — CONSERVATIVE prefix semantics: the decision is
  * longest-effective-prefix wins, allow wins length ties (the RFC's
  * rule). RFC 9309 wildcards are intentionally approximated in the
  * safe direction only: a Disallow containing `*`/`$` WIDENS to its
  * literal prefix before the first metacharacter (a superset of the
  * true match — never fetches what the rule meant to block), while an
  * Allow containing them is DROPPED (an allow widened the same way
  * would un-block paths the site blocked). Empty-path rules are no-ops
  * per the RFC. No rule matching a path means allowed.
  *
  * Scale shape: robots rules are a |domains|-bounded frame — the
  * screen BROADCASTS them, rates every URL with one join plus one
  * partial-aggregable max-of-struct per URL key (no window, no
  * corpus-keyed shuffle beyond the one agg exchange).
  */
object Robots {

  final case class RobotsRule(domain: String, agent: String, rule: String, path: String)

  /** Parse one domain's robots.txt into (agent, rule, path) rows —
    * every agent of a group carries the group's rules. Lenient like
    * every untrusted-input parser here: malformed lines are skipped,
    * never thrown on.
    */
  def parseRobots(domain: String, text: String): Seq[RobotsRule] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    if (text == null) return out.toSeq
    var agents = List.empty[String]
    var inRules = false
    text.split("\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val k = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
          val v = line.substring(ci + 1).trim
          k match {
            case "user-agent" =>
              if (inRules) { agents = Nil; inRules = false }
              agents ::= v.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" =>
              inRules = true
              agents.foreach(a => out += RobotsRule(domain, a, k, v))
            case _ => () // sitemap, crawl-delay, unknown — ignored
          }
        }
      }
    }
    out.toSeq
  }

  /** Batch parse: (domainCol: string, textCol: string) → one row per
    * rule — map-only over the |domains|-bounded robots table.
    */
  def rules(df: DataFrame, domainCol: String, textCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(domainCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (d, t) => parseRobots(d, t) }
      .toDF()
  }

  /** The effective literal prefix of a rule path under the
    * conservative contract, as a Column: text before the first `*`,
    * one trailing `$` stripped.
    */
  private def effectivePrefix(path: Column): Column =
    regexp_replace(regexp_extract(path, "^[^*]*", 0), "\\$$", "")

  /** Driver-side twin of the screen's group selection + conservative
    * widening, for the BOUNDED-rules regime: (domain, prefix, isAllow)
    * decision rows for `agent`. Shared semantics with
    * [[politenessScreen]] — equivalence is spec-pinned, so the
    * map-side column below can never drift from the distributed path.
    */
  def effectiveRules(parsed: Seq[RobotsRule], agent: String): Seq[(String, String, Boolean)] = {
    val me = agent.toLowerCase(java.util.Locale.ROOT)
    parsed.groupBy(_.domain).toSeq.sortBy(_._1).flatMap { case (d, rs) =>
      val mine = rs.filter(_.agent == me)
      val group = if (mine.nonEmpty) mine else rs.filter(_.agent == "*")
      group.filter(_.path.nonEmpty).flatMap { r =>
        if (r.rule == "disallow")
          Some((d, r.path.takeWhile(_ != '*').stripSuffix("$"), false))
        else if (!r.path.contains('*') && !r.path.endsWith("$"))
          Some((d, r.path, true))
        else None // wildcard/anchored allow: dropped, never widened
      }
    }
  }

  /** MAP-SIDE politeness decision against a bounded rule set riding
    * the closure as literals — the "fit once, rate anywhere"
    * inference shape (DSIR/CMS-screen discipline): no join, no
    * shuffle, streaming-safe. Longest prefix wins, allow wins ties,
    * no match → allowed — identical semantics to [[politenessScreen]].
    */
  def allowedColumn(rules: Seq[(String, String, Boolean)],
      domain: Column, path: Column): Column =
    if (rules.isEmpty) lit(true)
    else {
      val arr = array(rules.map { case (d, p, a) =>
        struct(lit(d).as("d"), lit(p).as("p"), lit(a).as("a"))
      }: _*)
      val best = array_max(transform(
        filter(arr, r => r.getField("d") === domain &&
          path.startsWith(r.getField("p"))),
        r => struct(length(r.getField("p")).as("l"), r.getField("a").as("a"))))
      coalesce(best.getField("a"), lit(true))
    }

  /** Rate every URL against parsed rules: returns `urls` plus
    * `allowed`. `urls` must carry a unique `idCol`, the registrable
    * `domainCol` and the URL `pathCol`; `rulesDf` is [[rules]]' output.
    * Group selection, widening/dropping, longest-prefix and
    * allow-wins-ties all happen here so the rules frame stays raw and
    * re-screenable under a different agent.
    */
  def politenessScreen(
      urls: DataFrame,
      rulesDf: DataFrame,
      agent: String,
      idCol: String = "doc_id",
      domainCol: String = "domain",
      pathCol: String = "path"
  ): DataFrame = {
    val me = agent.toLowerCase(java.util.Locale.ROOT)
    // RFC 9309 §2.2.1 group selection: specific group alone if present
    val withSpec = rulesDf
      .withColumn("__spec", max((col("agent") === me).cast("int"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("domain"))))
      .filter(
        (col("__spec") === 1 && col("agent") === me) ||
          (col("__spec") === 0 && col("agent") === "*"))
    val effective = withSpec
      // empty-path rules are RFC no-ops (checked on the ORIGINAL path:
      // "Disallow: *" must widen to the weakest match-all, not vanish)
      .filter(length(col("path")) > 0)
      // conservative wildcard handling: widen disallows, drop
      // wildcard/anchored allows
      .filter(col("rule") === "disallow" ||
        (!col("path").contains("*") && !col("path").endsWith("$")))
      .withColumn("__prefix",
        when(col("rule") === "disallow", effectivePrefix(col("path")))
          .otherwise(col("path")))
      .select(col("domain").as("__rd"), col("rule").as("__rule"),
        col("__prefix"))
    val passthrough = urls.columns.map(col)
    urls
      .join(broadcast(effective),
        urls(domainCol) === col("__rd") &&
          col(pathCol).startsWith(col("__prefix")),
        "left")
      // longest prefix wins; allow wins ties: max of (len, is_allow);
      // unmatched URLs contribute NULL (not a struct of nulls) so the
      // coalesce default applies
      .groupBy(passthrough: _*)
      .agg(max(when(col("__rule").isNotNull,
        struct(length(col("__prefix")).as("l"),
          (col("__rule") === "allow").as("a")))).as("__best"))
      .withColumn("allowed", coalesce(col("__best.a"), lit(true)))
      .drop("__best")
  }
}
