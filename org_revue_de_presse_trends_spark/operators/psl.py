"""Public-suffix-list registrable-domain extraction (the vendored
Mozilla PSL snapshot rendered as one engine-independent SQL ladder).

Replaces the four-suffix heuristic that ``operators/urls.py`` shipped
through r8 (its docstring documented this exact plug-in slot).  The
rule set is the full publicsuffix.org snapshot vendored at
``data/public_suffix_list.dat`` (MPL 2.0, header preserved in the
file; ~9.5k rules: 7.9k plain multi-label, 107 wildcard, 8 exception —
ICANN + private sections, the default of every mainstream PSL
library).

Algorithm (publicsuffix.org/list/ — the public spec):

1. a rule matches a host when the host's label tail equals the rule's
   labels; ``*`` consumes exactly one label;
2. the prevailing rule is the matching EXCEPTION rule if any, else the
   matching rule with the most labels, else the implicit ``*`` (every
   unlisted TLD is a public suffix);
3. the public suffix is the prevailing rule's labels (minus the
   leftmost one for exceptions); the registrable domain is the public
   suffix plus one more host label.

Rendering: one CASE ladder over staged tail columns ``_s1.._s6`` and
the label count ``_ln`` — exceptions first, then descending label
count, each level one IN-list (plain rules with k labels) OR'd with
the wildcard tails of k−1 labels.  Plain 1-label rules are DROPPED:
the implicit ``*`` default yields the same ``ps = 1``.  The text uses
only CASE/IN/AND/OR, so the SAME string renders in Spark and DuckDB —
the cross-engine one-template discipline of ``urls.py``.

Why a ladder and not a broadcast join (measured r9, local[8], 50k
hosts, best of 3 steady-state): ladder build 0.25 s / exec 0.80 s vs
five broadcast left-joins 0.18 s / 1.48 s — the joins' exchange and
struct-greatest overhead loses, and the ladder keeps the stage
template intact (Spark converts the large IN to an InSet hash probe,
so per-row cost is O(labels), not O(rules); first-session codegen of
the 130 KB expression costs ~10 s ONCE per JVM).  At 100 TB both are
map-only; the ladder also never risks an AQE mis-plan.

Semantics notes:
- hosts are expected lowercase and in the same form as the list
  (unicode labels, not punycode) — canonicalization lowercases before
  this runs; punycode normalization is a caller concern;
- a host that IS a public suffix (or a single label like
  ``localhost``) has no registrable domain; ``registrable_sql`` keeps
  the column TOTAL by falling back to the host (the r8b totality
  lesson: callers group/block on this column), while
  ``registrable_domain_py(strict=True)`` exposes the PSL-strict None
  for tests against the official semantics.
"""

from __future__ import annotations

import os
from functools import lru_cache

#: deepest public suffix the snapshot contains has 5 labels, so the
#: registrable domain can need the 6-label tail
MAX_TAIL = 6

_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)


@lru_cache(maxsize=1)
def load_rules(path: str | None = None):
    """Parse the vendored snapshot → (plain, wildtails, exceptions):
    ``plain[k]`` = frozenset of k-label plain rules (k ≥ 2; 1-label
    rules fold into the implicit default), ``wildtails[j]`` = frozenset
    of j-label tails of ``*.``-rules, ``exceptions`` = tuple of
    (labels-string, n_labels)."""
    plain: dict[int, set] = {}
    wildtails: dict[int, set] = {}
    exceptions: list[tuple[str, int]] = []
    with open(path or _DATA, encoding="utf-8") as f:
        for line in f:
            rule = line.strip().split()[0] if line.strip() else ""
            if not rule or rule.startswith("//"):
                continue
            if "'" in rule or "\\" in rule:
                # rules are interpolated into SQL string literals
                # verbatim; a snapshot refresh introducing a quote or
                # backslash must fail HERE, not generate a malformed
                # 130 KB ladder in both engines (ADVICE r9)
                raise ValueError(
                    f"PSL rule contains a SQL-unsafe character: {rule!r}"
                )
            if rule.startswith("!"):
                body = rule[1:]
                exceptions.append((body, body.count(".") + 1))
            elif rule.startswith("*."):
                tail = rule[2:]
                wildtails.setdefault(tail.count(".") + 1, set()).add(tail)
            elif "." in rule:
                plain.setdefault(rule.count(".") + 1, set()).add(rule)
    return (
        {k: frozenset(v) for k, v in plain.items()},
        {j: frozenset(v) for j, v in wildtails.items()},
        tuple(exceptions),
    )


def _inlist(items) -> str:
    return ", ".join(f"'{s}'" for s in sorted(items))


@lru_cache(maxsize=1)
def public_suffix_labels_sql() -> str:
    """The ladder: public-suffix label count as one engine-independent
    SQL expression over ``_s1.._s5`` (k-label host tails, NULL when the
    host is shorter) and ``_ln`` (label count).  A NULL tail fails its
    IN test (NULL is not true), so no explicit length guards are
    needed on the plain lists; wildcards need ``_ln >= k`` because the
    ``*`` must consume a real label."""
    plain, wildtails, exceptions = load_rules()
    branches = []
    # exceptions prevail over everything (spec step 2), so they lead
    for k in sorted({k for _, k in exceptions}, reverse=True):
        excs = [b for b, kk in exceptions if kk == k]
        branches.append(f"WHEN _s{k} IN ({_inlist(excs)}) THEN {k - 1}")
    # ladder depth covers the deepest rule of EITHER kind: a wildcard
    # with tail j matches at level j+1, which can exceed max(plain)
    # (not in the current snapshot, but a refresh must not silently
    # skip it — review-caught r9)
    top = max(max(plain, default=1), max(wildtails, default=0) + 1)
    for k in range(top, 1, -1):
        conds = []
        if plain.get(k):
            conds.append(f"_s{k} IN ({_inlist(plain[k])})")
        if wildtails.get(k - 1):
            conds.append(
                f"(_s{k - 1} IN ({_inlist(wildtails[k - 1])})"
                f" AND _ln >= {k})"
            )
        if conds:
            branches.append(f"WHEN {' OR '.join(conds)} THEN {k}")
    return "CASE " + " ".join(branches) + " ELSE 1 END"


def registrable_sql(host_expr: str = "_host") -> str:
    """Registrable domain from the staged ``_psl`` (the ladder's
    value) and tails — TOTAL: hosts that are themselves public
    suffixes fall back to ``host_expr``."""
    picks = " ".join(
        f"WHEN {k} THEN _s{k + 1}" for k in range(1, MAX_TAIL)
    )
    return f"coalesce(CASE _psl {picks} END, {host_expr})"


def registrable_domain_py(host: str, strict: bool = False) -> str | None:
    """Python reference of the exact ladder semantics, for tests.
    ``strict=True`` returns None when the host has no registrable
    domain (official PSL semantics); default mirrors the SQL's
    fall-back-to-host totality."""
    plain, wildtails, exceptions = load_rules()
    labels = host.split(".")
    n = len(labels)

    def tail(k: int) -> str:
        return ".".join(labels[-k:])

    ps = None
    # most-labels exception prevails (match the ladder's k-desc order,
    # not file order — review-caught r9; today's 8 exceptions cannot
    # overlap, but a snapshot refresh could add ones that do)
    for body, k in sorted(exceptions, key=lambda e: -e[1]):
        if n >= k and tail(k) == body:
            ps = k - 1
            break
    if ps is None:
        top = max(max(plain, default=1), max(wildtails, default=0) + 1)
        for k in range(top, 1, -1):
            if (n >= k and tail(k) in plain.get(k, ())) or (
                n >= k and tail(k - 1) in wildtails.get(k - 1, ())
            ):
                ps = k
                break
    if ps is None:
        ps = 1
    if n >= ps + 1:
        return tail(ps + 1)
    return None if strict else host
