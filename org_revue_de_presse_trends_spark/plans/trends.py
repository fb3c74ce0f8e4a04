"""The three trends pipeline variants (reference trends.go:274-412) as
parameterized DataFrame builders — the engine's parity core.

Reference semantics (all citations to /root/reference/trends.go):

- curated spine:  highlight ⋈ weaving_status (J1, :294-299)
- distinct spine: weaving_status ⟕ highlight (J2, :351-356; predicates
  stay in the ON clause — outer-join semantics, not optimization)
- publishers join: curated = equi + IN-list (J3, :300-305);
  distinct = disjunctive OR-condition (J4, :357-367)
- popularity: same-civil-day LEFT join (J5, :396-399) collapsed by MAX
  (A2, :286-287) — implemented here as a pre-aggregation per
  (status_id, day) BEFORE the join, which is 1:1 afterwards: same
  result as the reference's GROUP-BY-everything (A3, :323-334) with a
  strictly better plan (no wide grouping key, popularity shrinks
  before shuffling — the formulation that survives 100 TB).
- deleted-member exclusion: anti-join (F3, :313-320 curated on
  member_id; :379-386 distinct on the JSON user id)
- argmax per source (A4, :336-349): max_by(struct) replaces ten
  parallel ARRAY_AGG(... ORDER BY ...)[1] columns
- top-k (O1/O2, :395-406): orderBy + offset/limit →
  TakeOrderedAndProject

Engine defaults use *corrected* semantics where the reference is buggy
(SURVEY §7 risk register); ``bug_compat=True`` reproduces the
reference's favorites-falls-back-to-retweet-count cascade
(trends.go:344 reads $.retweet_count for favorites).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import (
    civil_day,
    is_retweet_derived,
    json_user_id,
    popularity,
    tweet_url,
)

VARIANTS = ("status", "retweet", "statusFromDistinctSources",
            "retweetFromDistinctSources")


@dataclass
class TrendsParams:
    list_public_ids: tuple[str, ...]  # target + deprecated id (trends.go:303-305)
    since_date: str                   # civil day 'YYYY-MM-DD' ($4)
    limit: int = 10
    page: int = 0
    shift_hours: int = 1              # the '- INTERVAL 1 HOUR' quirk
    tz: str | None = None             # set 'Europe/Paris' for corrected mode
    bug_compat: bool = False


@dataclass
class TrendsTables:
    highlight: DataFrame
    weaving_status: DataFrame
    publishers_list: DataFrame
    status_popularity: DataFrame
    weaving_user: DataFrame


class TrendsPipeline:
    """Composable builder for the daily-highlights computation."""

    def __init__(self, tables: TrendsTables, params: TrendsParams):
        self.t = tables
        self.p = params

    def _day(self, ts: Column) -> Column:
        return civil_day(ts, self.p.shift_hours, self.p.tz)

    # -- building blocks ----------------------------------------------------

    def popularity_by_day(self) -> DataFrame:
        """MAX popularity per (status_id, civil day) — the A2/A3 collapse
        done as a pre-aggregation (see module docstring).

        Divergence note: like the reference, retweets and favorites are
        collapsed with INDEPENDENT MAXes over the day's checks
        (trends.go:286-287) — not "both values from the single best
        check row"."""
        p = self.t.status_popularity
        return (
            p.groupBy(
                F.col("status_id").alias("p_status_id"),
                self._day(F.col("checked_at")).alias("p_day"),
            )
            .agg(
                F.max("total_retweets").alias("p_total_retweets"),
                F.max("total_favorites").alias("p_total_favorites"),
            )
        )

    def target_lists(self) -> DataFrame:
        """publishers_list filtered to the IN-list (J3, trends.go:303-305);
        tiny → broadcast."""
        pl = self.t.publishers_list
        return F.broadcast(
            pl.filter(pl.public_id.isin(*self.p.list_public_ids))
        )

    def deleted_member_ids(self) -> DataFrame:
        """Member ids excluded on the curated path (F3, trends.go:313-320):
        members whose twitter username matches the screen_name of a
        soft-deleted publishers list."""
        u, pl = self.t.weaving_user, self.t.publishers_list
        deleted = pl.filter(
            pl.deleted_at.isNotNull() & pl.screen_name.isNotNull()
        ).select("screen_name")
        return (
            u.join(
                F.broadcast(deleted),
                u.usr_twitter_username == F.col("screen_name"),
            )
            .select(F.col("usr_id").alias("excluded_id"))
            .distinct()
        )

    def deleted_member_twitter_ids(self) -> DataFrame:
        """Twitter-id variant of the exclusion set (distinct path,
        trends.go:379-386)."""
        u, pl = self.t.weaving_user, self.t.publishers_list
        deleted = pl.filter(
            pl.deleted_at.isNotNull() & pl.screen_name.isNotNull()
        ).select("screen_name")
        return (
            u.join(
                F.broadcast(deleted),
                u.usr_twitter_username == F.col("screen_name"),
            )
            .select(F.col("usr_twitter_id").cast("long").alias("excluded_id"))
            .where(F.col("excluded_id").isNotNull())
            .distinct()
        )

    # -- variant pipelines --------------------------------------------------

    def curated(self, include_retweets: bool) -> DataFrame:
        """Curated path (trends.go:274-334).

        The reference only constrains is_retweet when retweets are
        EXCLUDED (``AND h.is_retweet = false``, trends.go:274-277);
        with include_retweets the curated query has no kind filter.
        The day predicates (sinceWhen(), trends.go:536-543) are
        equalities on an INNER join → plain filters here, and the
        day(s)=day(h) consistency predicate makes the $1/$4 params
        interchangeable."""
        h, s = self.t.highlight, self.t.weaving_status
        day_lit = F.lit(self.p.since_date).cast("date")
        hf = h.filter(self._day(F.col("publication_date_time")) == day_lit)
        if not include_retweets:
            hf = hf.filter(F.col("is_retweet") == F.lit(False))
        base = (
            hf.join(
                s,
                (s.ust_id == hf.status_id)
                & (self._day(s.ust_created_at)
                   == self._day(hf.publication_date_time)),
            )
            .join(self.target_lists(), hf.aggregate_id == F.col("id"))
        )
        base = base.join(
            self.deleted_member_ids(),
            base.member_id == F.col("excluded_id"),
            "left_anti",
        )
        pop = self.popularity_by_day()
        base = base.join(
            pop,
            (F.col("p_status_id") == base.status_id)
            & (F.col("p_day") == self._day(base.publication_date_time)),
            "left",
        )
        return self._project(base, from_distinct=False)

    def distinct_sources(self, include_retweets: bool) -> DataFrame:
        """Distinct-sources path (trends.go:335-393): one row per
        publisher — its most popular tweet of the day.

        J2 ON-clause placement is semantics: the day-consistency
        predicates (sinceWhen(), trends.go:536-543) and — only when
        retweets are excluded — ``h.is_retweet = false`` live in the
        LEFT JOIN condition (trends.go:350-356), so statuses keep
        their null-extended row when the highlight fails them."""
        h, s = self.t.highlight, self.t.weaving_status
        day_lit = F.lit(self.p.since_date).cast("date")
        sf = s.filter(self._day(s.ust_created_at) == day_lit)
        # J2: LEFT OUTER; highlight predicates live in the ON clause
        on = (
            (sf.ust_id == h.status_id)
            & (self._day(sf.ust_created_at)
               == self._day(h.publication_date_time))
        )
        if not include_retweets:
            on = on & (h.is_retweet == F.lit(False))
        joined = sf.join(h, on, "left")
        pl = self.target_lists()
        # J4: disjunctive join — curated membership OR screen-name match
        joined = joined.join(
            pl,
            (h.aggregate_id == pl.id)
            | ((sf.ust_full_name == pl.screen_name) & pl.screen_name.isNotNull()),
        )
        # F2 (3-way retweet derivation, trends.go:370-378)
        joined = joined.filter(
            is_retweet_derived(h.is_retweet, sf.ust_api_document)
            == F.lit(include_retweets)
        )
        # F3 distinct variant: exclude by JSON user id (trends.go:379-386)
        joined = joined.join(
            self.deleted_member_twitter_ids(),
            json_user_id(sf.ust_api_document) == F.col("excluded_id"),
            "left_anti",
        )
        # J5: popularity keys on the HIGHLIGHT side even here
        # (trends.go:396-399) — never-highlighted statuses get no
        # popularity row.
        pop = self.popularity_by_day()
        joined = joined.join(
            pop,
            (F.col("p_status_id") == h.status_id)
            & (F.col("p_day") == self._day(h.publication_date_time)),
            "left",
        )
        projected = self._project(joined, from_distinct=True)
        # A4: argmax per publisher by popularity (trends.go:336-349,
        # 389-392).  Quirk kept: the MAX aggregates run over the WHOLE
        # publisher group — retweets necessarily equals the argmax
        # winner's value, but favorites may come from a DIFFERENT
        # status than the winning row (reference trends.go:343-344).
        picked = F.max_by(
            F.struct(*[c for c in projected.columns if c != "username"]),
            F.struct(F.col("totalRetweets"), F.col("id")),
        ).alias("top")
        out = projected.groupBy("username").agg(
            picked,
            F.max("totalRetweets").alias("max_rt"),
            F.max("totalFavorites").alias("max_fav"),
        )
        return out.select(
            "username",
            *[
                F.col("max_rt").alias(c) if c == "totalRetweets"
                else F.col("max_fav").alias(c) if c == "totalFavorites"
                else F.col(f"top.{c}").alias(c)
                for c in projected.columns
                if c != "username"
            ],
        )

    def _project(self, df: DataFrame, from_distinct: bool) -> DataFrame:
        """The 12-field output record (trends.go:279-292,336-349,716-729).

        Faithful quirks: publicationDate AND checkedAt are both
        ``s.ust_created_at`` (trends.go:284,291 — checkedAt never reads
        status_popularity.checked_at).  ``bug_compat`` reproduces the
        distinct-path favorites cascade bug (trends.go:344: the middle
        fallback reads h.total_RETWEETS); the engine default corrects
        it to h.total_favorites."""
        doc = F.col("ust_api_document")
        retweets = popularity(
            F.col("p_total_retweets"),
            F.col("total_retweets"),
            doc if from_distinct else None,
            json_field="retweet_count",
        )
        fav_mid = (
            F.col("total_retweets") if (self.p.bug_compat and from_distinct)
            else F.col("total_favorites")
        )
        favorites = popularity(
            F.col("p_total_favorites"),
            fav_mid,
            doc if from_distinct else None,
            json_field="favorite_count",
        )
        is_rt = (
            is_retweet_derived(F.col("is_retweet"), doc)
            if from_distinct
            else F.coalesce(F.col("is_retweet"), F.lit(False))
        )
        ts_col = F.col("ust_created_at")
        return df.select(
            F.col("ust_id").alias("id"),
            F.col("ust_status_id").alias("twitterId"),
            F.col("ust_full_name").alias("username"),
            F.col("ust_text").alias("text"),
            tweet_url(F.col("ust_full_name"), F.col("ust_status_id")).alias("url"),
            doc.alias("json"),
            F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss").alias("publishedAt"),
            F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss").alias("checkedAt"),
            is_rt.alias("isRetweet"),
            retweets.cast("int").alias("totalRetweets"),
            favorites.cast("int").alias("totalFavorites"),
        )

    def count_highlights(self, distinct_sources: bool = False) -> int:
        """A1 parity (reference countHighlights, trends.go:450-529):
        COUNT(*) of the day's matching spine rows.  Faithful to the
        reference's count query, which applies only the spine join +
        IN-list + day filters (none of the retweet/deleted-member
        predicates) and LEFT-joins popularity WITHOUT pre-aggregation —
        so multiple same-day checks multiply the count, exactly as the
        reference's does."""
        h, s = self.t.highlight, self.t.weaving_status
        day_lit = F.lit(self.p.since_date).cast("date")
        if distinct_sources:
            spine = s.filter(self._day(s.ust_created_at) == day_lit).join(
                h,
                (s.ust_id == h.status_id)
                & (self._day(s.ust_created_at)
                   == self._day(h.publication_date_time)),
                "left",
            )
            # reference count uses a LEFT join to publishers_list here
            # (trends.go:472-481), unlike the select's inner J4
            spine = spine.join(
                self.target_lists(),
                h.aggregate_id == F.col("id"),
                "left",
            )
        else:
            hf = h.filter(self._day(F.col("publication_date_time")) == day_lit)
            spine = hf.join(
                s,
                (s.ust_id == hf.status_id)
                & (self._day(s.ust_created_at)
                   == self._day(hf.publication_date_time)),
            ).join(self.target_lists(), hf.aggregate_id == F.col("id"))
        p = self.t.status_popularity
        spine = spine.join(
            p,
            (p.status_id == h.status_id)
            & (self._day(p.checked_at)
               == self._day(h.publication_date_time)),
            "left",
        )
        return spine.count()

    def last_week_statuses(self, now: str) -> DataFrame:
        """F6 — the reference's -since-last-week mode emits invalid SQL
        (trends.go:531-534: NOW()::now - '7 DAYS::interval') and is
        dead; this is the corrected semantics: statuses whose shifted
        creation time falls within the 7 days before ``now``
        (parameterized instead of NOW() for determinism)."""
        s = self.t.weaving_status
        now_ts = F.lit(now).cast("timestamp")
        shifted = s.ust_created_at - F.expr(
            f"INTERVAL {self.p.shift_hours} HOUR"
        )
        return s.filter(
            (shifted > now_ts - F.expr("INTERVAL 7 DAYS"))
            & (shifted <= now_ts)
        )

    # -- entry points -------------------------------------------------------

    def variant(self, name: str) -> DataFrame:
        if name == "status":
            df = self.curated(include_retweets=False)
        elif name == "retweet":
            df = self.curated(include_retweets=True)
        elif name == "statusFromDistinctSources":
            df = self.distinct_sources(include_retweets=False)
        elif name == "retweetFromDistinctSources":
            df = self.distinct_sources(include_retweets=True)
        else:
            raise ValueError(f"unknown variant {name!r}; one of {VARIANTS}")
        # O1/O2: ORDER BY retweets DESC with unique tiebreaker, then
        # offset/limit (reference trends.go:395-406; offset quirk NOT
        # replicated — see SURVEY §7 risk register)
        out = df.orderBy(F.desc("totalRetweets"), F.asc("id"))
        if self.p.page > 0:
            out = out.offset(self.p.page * self.p.limit)
        if self.p.limit > 0:
            out = out.limit(self.p.limit)
        return out

    def all_variants(self, names: tuple[str, ...] = VARIANTS) -> DataFrame:
        """The reference's three sequential runs (trends.go:151-198) as
        one unioned DataFrame with a statusType discriminator — a
        single job, single write (SURVEY §2.7)."""
        parts = [
            self.variant(n).withColumn("statusType", F.lit(n)) for n in names
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
