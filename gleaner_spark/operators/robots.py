"""Robots allow/deny filtering (S2).

The reference fetches robots.txt per source and tests every candidate
URL against the parsed group before queueing it
(``internal/summoner/acquire/utils.go:10-39``,
``resources.go:164-167,175-197``); its robots library implements the
Robots Exclusion Protocol matcher — ``Allow`` rules, ``*`` wildcards,
``$`` end anchors, longest-match precedence — not bare prefix tests.
With a pre-crawled input table the fetch disappears, but the FILTER is
still a real operator: a deployment re-harvesting a corpus must honor
current robots rules.

Spark shape: the rules relation is config-scale → aggregated to one
rule-array row per host, broadcast-joined onto the pages, winner picked
map-side as ``array_max`` of matching ``(pattern_length, allow)``
structs (longest rule wins; Allow wins length ties — Google REP
§2.2.2).  Rule patterns compile to anchored regexes with column
expressions on the dim (no UDF).  The page table is never shuffled and
never re-joined: the whole filter is broadcast-join + map-side filter.
Crawl-delay handling is a crawler politeness concern with no analogue
over a static table (documented non-goal, SURVEY.md §2 S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .stages import url_host


def robots_rules(robots: DataFrame, user_agent: str = "*") -> DataFrame:
    """Parse raw robots.txt bodies into the REP rules relation
    ``(host, path_pattern, allow)`` consumed by :func:`robots_filter`.

    ``robots``: ``(host, body)``.  REP group semantics (what the
    reference's robots library implements when parsing the fetched
    robots.txt, acquire/utils.go:10-39): a group is one or more
    consecutive ``User-agent`` lines followed by its rules; a group's
    rules apply iff one of its agent lines equals ``user_agent``
    (default ``*``, matched case-insensitively).  Comments (``#…``) and
    unknown directives are ignored; directive names are
    case-insensitive.  All column expressions over config-scale bodies
    — one window pass + one aggregation."""
    from pyspark.sql import Window

    lines = robots.select(
        "host",
        F.posexplode(F.split("body", "\n")).alias("ln", "raw"),
    ).withColumn(
        "line", F.trim(F.regexp_replace("raw", r"#.*$", ""))
    ).withColumn(
        "directive",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)),
    ).withColumn(
        "value", F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    ).filter(F.col("directive").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("ln")
    grouped = lines.withColumn(
        "prev_dir", F.lag("directive").over(w)
    ).withColumn(
        # a User-agent line STARTS a new group unless it extends a run
        # of consecutive User-agent lines (multi-agent groups)
        "new_group",
        ((F.col("directive") == "user-agent")
         & (F.coalesce(F.col("prev_dir"), F.lit(""))
            != "user-agent")).cast("int"),
    ).withColumn("group_id", F.sum("new_group").over(w))

    matching = (
        grouped.filter(
            (F.col("directive") == "user-agent")
            & (F.lower("value") == user_agent.lower())
        )
        .select("host", "group_id")
        .distinct()
    )
    return (
        grouped.filter(F.col("directive").isin("allow", "disallow"))
        .join(matching, ["host", "group_id"], "left_semi")
        .select(
            "host",
            F.col("value").alias("path_pattern"),
            (F.col("directive") == "allow").alias("allow"),
        )
    )


def robots_filter(pages: DataFrame, robots_dim: DataFrame) -> DataFrame:
    """Drop pages denied by their host's robots rules.

    ``robots_dim`` accepts either schema:

    - ``(host, disallow_prefix)`` — legacy prefix-only Disallow rows;
    - ``(host, path_pattern, allow)`` — full REP rules: ``allow`` marks
      Allow lines, ``path_pattern`` may use ``*`` (any char sequence)
      and a trailing ``$`` (end anchor).

    Matching per Google REP: a URL is denied iff the most specific
    (longest ``path_pattern``) matching rule for its host is a
    Disallow; Allow wins exact-length ties; no matching rule ⇒ allowed.
    Empty patterns (``Disallow:`` with no value = allow-all) are
    dropped up front — they must not become match-alls."""
    p = pages
    if "host" not in p.columns:
        p = p.withColumn("host", url_host(F.col("url")))
    # scheme match is case-insensitive (RFC 3986); a URL with no path
    # component means path '/' for robots purposes
    path = F.regexp_replace(
        "url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+", ""
    )
    p = p.withColumn(
        "_path", F.when(path == "", F.lit("/")).otherwise(path)
    )

    if "path_pattern" in robots_dim.columns:
        rules = robots_dim.select(
            F.col("host").alias("_rhost"),
            F.col("path_pattern").alias("_pat"),
            F.col("allow").cast("boolean").alias("_allow"),
        )
    else:
        rules = robots_dim.select(
            F.col("host").alias("_rhost"),
            F.col("disallow_prefix").alias("_pat"),
            F.lit(False).alias("_allow"),
        )
    rules = rules.filter(F.length("_pat") > 0)
    # compile the rule pattern to an anchored regex ON THE DIM (config
    # scale): strip a trailing '$' into an anchor, escape every regex
    # metacharacter except '*', then '*' → '.*'
    ends = F.col("_pat").endswith("$")
    core = F.when(
        ends, F.expr("substring(_pat, 1, length(_pat) - 1)")
    ).otherwise(F.col("_pat"))
    escaped = F.regexp_replace(
        core, r"([\\.\^\$\+\?\(\)\[\]\{\}\|])", r"\\$1"
    )
    regex = F.concat(
        F.lit("^"),
        F.regexp_replace(escaped, r"\*", ".*"),
        F.when(ends, F.lit("$")).otherwise(F.lit("")),
    )
    rules = rules.select(
        "_rhost", "_allow",
        F.length("_pat").alias("_plen"),
        regex.alias("_regex"),
    )
    # one row per host with its rule array → broadcast LEFT join, then
    # the winner is a single map-side expression: filter the host's
    # rules by regex match, take the max (plen, allow) struct — struct
    # ordering makes the longest rule win and allow beat disallow on
    # ties.  NO aggregation or anti-join over the page table: at corpus
    # scale a denied-URL list can be a large fraction of the input, and
    # joining it back would shuffle the fattest relation; this shape is
    # pure broadcast-join + filter (embarrassingly parallel).  The rule
    # arrays are config-scale, so the interpreted higher-order filter is
    # dominated by the regex evaluations it performs either way.
    per_host = rules.groupBy("_rhost").agg(
        F.collect_list(F.struct("_plen", "_allow", "_regex")).alias("_rules")
    )
    winner = F.expr(
        "array_max(transform("
        "  filter(_rules, r -> _path rlike r._regex),"
        "  r -> struct(r._plen as plen, r._allow as allow)))"
    )
    return (
        p.join(F.broadcast(per_host), F.col("host") == F.col("_rhost"), "left")
        .withColumn("_w", winner)
        .filter(F.col("_w").isNull() | F.col("_w.allow"))
        .drop("_path", "_rhost", "_rules", "_w")
    )
