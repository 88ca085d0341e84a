"""URL canonicalization: the dedup key every crawl pipeline needs
before fetch scheduling and after ingest — the same page arrives as
``HTTP://WWW.Example.COM:80/p/1?b=2&a=1&utm_source=x#frag`` and
``http://www.example.com/p/1?a=1&b=2``, and near-dup/exact-dedup on
page TEXT cannot catch the fetch-side waste (you already paid to
crawl both). Canonicalize → group is the cheap, exact first rung of
the dedup ladder (x4's fingerprint dedup, by key instead of hash).

``canonical_url(col)`` is a PURE COLUMN EXPRESSION (no UDF — stays
inside whole-stage codegen; the 100 TB cost is one projection in the
scan stage). The normalization contract, in order:

1. strip surrounding whitespace, drop the ``#fragment``;
2. lowercase the SCHEME and HOST (never the path or query — those
   are case-significant per RFC 3986 §6.2.2.1);
3. drop a default port (``:80`` for http, ``:443`` for https; other
   ports kept);
4. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``) and
   SORT the surviving query parameters bytewise (``a=1&b=2`` ==
   ``b=2&a=1`` — parameter order is never semantic in practice, and
   a canonical key must pick one);
5. drop one trailing ``/`` from a non-root path (``/p/1/`` ==
   ``/p/1``), keep the root ``/`` and add it when the path is empty;
6. an empty surviving query drops its ``?``;
7. percent-encoding normalization (RFC 3986 §6.2.2.2, applied
   uniformly over the whole URL): hex digits of every ``%XX``
   uppercased (``%2f`` == ``%2F``), and encodings of UNRESERVED
   characters decoded (``%7E`` == ``~``, ``%41`` == ``A``) — real
   crawl URLs differ on exactly these constantly; reserved
   characters stay encoded (``%2F`` is NOT a path separator), and a
   ``%`` not followed by two hex digits passes through literally
   (damage is preserved, never guessed at). Implemented as a JVM
   ``transform`` over the ``%``-split — per-row href-sized arrays,
   the ``_remove_dot_segments`` posture (off codegen, on JVM).

Deliberately NOT done (each would merge distinct resources):
``..`` segment resolution (that is ``resolve_url``'s job, against a
base) and IDN/punycode folding — documented so the contract is
exactly what the oracle predicts.

Reference: engine-added (SURVEY.md §2.2 dedup family, with x4/x22);
RFC 3986 §6 public normalization forms only.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover - typing only
    from pyspark.sql import Column

__all__ = [
    "canonical_url", "resolve_url", "trap_flags",
    "resolve_redirects", "registrable_domain",
    "TRACKING_PARAM_RE", "SESSION_PARAM_RE", "PUBLIC_SUFFIXES",
]

#: Query parameters that never identify a resource (analytics junk).
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid)(=.*)?$"


def _let(cols, body) -> "Column":
    """Single-evaluation LET-binding for column expressions (perf,
    opt r17): pack the given expressions into a one-element
    array-of-struct and hand ``body`` the struct's FIELDS as its
    arguments via a ``transform`` lambda. A lambda variable is a
    plain slot read, so every bound expression is evaluated exactly
    once per row no matter how many times ``body`` references it.

    Why this exists: these URL expressions sit behind higher-order
    functions (``_normalize_pct``'s transform, ``_remove_dot_
    segments``' aggregate), which keeps them off whole-stage codegen
    — and WITHOUT codegen there is no common-subexpression
    elimination, so an expression like ``canonical_url`` that
    references its (pct-normalized) input ~6 times paid the full
    normalization chain ~6x per row. Measured on x156/x159:
    0.60 → 0.39 s / 1.64 → 1.01 s at sf0.1, values bit-identical
    (the binding adds only a per-row 1-element array+struct alloc).
    """
    # named_struct (not struct+alias): .alias() on a lambda-variable-
    # derived column is dropped inside a nested transform, leaving
    # default colN field names — named_struct pins them always
    args: list = []
    for i, c in enumerate(cols):
        args += [F.lit(f"_l{i}"), c]
    s = F.named_struct(*args)
    return F.element_at(
        F.transform(
            F.array(s),
            lambda x: body(*[x[f"_l{i}"] for i in range(len(cols))]),
        ),
        1,
    )


def _normalize_pct(u: "Column") -> "Column":
    """RFC 3986 §6.2.2.2 percent-encoding normalization (see module
    contract item 7): split on ``%``; every later piece whose first
    two chars are hex is an encoding — decode it when the octet is
    an UNRESERVED character (ALPHA / DIGIT / ``-._~``), else re-emit
    with UPPERCASE hex; a piece not starting with two hex digits
    keeps its literal ``%``. The head piece passes through.

    Cost note: the fold is linear in the number of ``%`` signs; the
    caller guards with ``contains('%')`` so %-free URLs never build
    the array at all."""
    parts = F.split(u, "%", -1)
    head = F.element_at(parts, 1)
    rest = F.slice(
        parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))
    )
    norm = F.transform(
        rest,
        lambda p: F.when(
            p.rlike("^[0-9A-Fa-f]{2}"),
            F.concat(
                F.when(
                    F.char(
                        F.conv(F.substring(p, 1, 2), 16, 10).cast("int")
                    ).rlike("^[A-Za-z0-9._~-]$"),
                    F.char(
                        F.conv(F.substring(p, 1, 2), 16, 10).cast("int")
                    ),
                ).otherwise(
                    F.concat(
                        F.lit("%"), F.upper(F.substring(p, 1, 2))
                    )
                ),
                F.substring(p, 3, 2_147_483_647),
            ),
        ).otherwise(F.concat(F.lit("%"), p)),
    )
    return F.concat(head, F.array_join(norm, ""))


def canonical_url(col: "Column | str") -> "Column":
    """Canonical form of an absolute http(s) URL (see module
    contract). Input that does not look like ``scheme://host...``
    canonicalizes to NULL — containment for the garbage a real crawl
    column carries (the caller counts NULLs, the key never lies)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment first
    # §6.2.2.2 BEFORE parsing: decoding unreserved octets never
    # creates a delimiter, so component boundaries are stable. The
    # contains-guard keeps the overwhelmingly common no-%-at-all URL
    # on the pure-codegen path (the split/transform fold only runs
    # on rows that actually carry an encoding)
    u = F.when(u.contains("%"), _normalize_pct(u)).otherwise(u)

    # LET-bind the normalized URL and its parsed components (see
    # `_let`): each is evaluated once per row; the body below only
    # reads lambda slots, so the pct fold and the component regexes
    # never re-run per reference.
    def parse(u):
        return [
            F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)),
            F.lower(F.regexp_extract(u, r"^[^:/?]+://([^/?#]+)", 1)),
            F.regexp_extract(u, r"^[^:/?]+://[^/?#]+([^?#]*)", 1),
            F.regexp_extract(u, r"\?([^#]*)", 1),
        ]

    def body(scheme, hostport, rawpath, query):
        host = (
            F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
            .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
            .otherwise(hostport)
        )
        path = F.when(rawpath == "", F.lit("/")).otherwise(rawpath)
        path = F.when(
            path == "/", path
        ).otherwise(F.regexp_replace(path, r"/$", ""))
        params = F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
        qcanon = F.array_join(F.array_sort(params), "&")
        out = F.concat(
            scheme, F.lit("://"), host, path,
            F.when(qcanon == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), qcanon)
            ),
        )
        return F.when(
            (scheme == "") | (hostport == ""), F.lit(None).cast("string")
        ).otherwise(out)

    # two-level let: bind u once, then bind the four components once
    return _let([u], lambda uu: _let(parse(uu), body))


def _remove_dot_segments(path: "Column") -> "Column":
    """RFC 3986 §5.2.4 as a JVM array fold (no UDF): split the path
    on ``/``, fold segments onto a stack — ``..`` pops, ``.`` and
    empty segments vanish, anything else pushes — and rejoin under a
    leading slash. ``..`` past the root clamps (the spec's behavior).
    Side effects shared with the canonical contract: duplicate and
    trailing slashes fold. HOF lambdas stay off codegen but on the
    JVM — and this runs only on href-sized strings, never corpora."""
    segs = F.split(path, "/")
    acc = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, x: (
            F.when(
                x == "..",
                F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
            )
            .when((x == ".") | (x == ""), acc)
            .otherwise(F.concat(acc, F.array(x)))
        ),
    )
    return F.concat(F.lit("/"), F.array_join(acc, "/"))


def resolve_url(base: "Column | str", ref: "Column | str") -> "Column":
    """Resolve an ``<a href>`` reference against its page's base URL
    — the step between ``html_to_text``'s hrefs and the crawl
    frontier (RFC 3986 §5):

    - absolute refs (``scheme://...``) pass through;
    - protocol-relative refs (``//host/...``) take the base scheme;
    - root-relative refs (``/path...``) take the base origin, with
      §5.2.4 dot-segment removal;
    - path-relative refs (``a/b.html``, ``../up``, ``./x``) merge
      onto the base path's directory (§5.3) then remove dot
      segments; the ref's ``?query#fragment`` tail rides along
      (canonical_url strips the fragment downstream);
    - query-only and fragment-only refs (``?page=2``, ``#sec``) keep
      the base's FULL path (§5.3's empty-ref-path rule);
    - non-hierarchical schemes (``mailto:``, ``javascript:``,
      ``data:`` — anything ``scheme:`` without ``//``) and empty
      refs resolve to NULL: not fetchable, counted by the caller.

    Pure column expressions, same posture as ``canonical_url``;
    compose them: ``canonical_url(resolve_url(base, href))``."""
    b = F.col(base) if isinstance(base, str) else base
    r0 = F.trim(F.col(ref) if isinstance(ref, str) else ref)

    # LET-bind (see `_let`) the trimmed ref and every base-derived
    # component: each is computed once per row; the body only reads
    # lambda slots, so the base/ref regexes never re-run per branch.
    def parts(b, r):
        scheme = F.lower(
            F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
        )
        origin = F.concat(
            scheme, F.lit("://"),
            F.regexp_extract(b, r"^[^:/?]+://([^/?#]+)", 1),
        )
        base_path = F.regexp_extract(b, r"^[^:/?]+://[^/?#]+([^?#]*)", 1)
        base_path = F.when(base_path == "", F.lit("/")).otherwise(base_path)
        base_dir = F.regexp_replace(base_path, r"[^/]*$", "")
        rpath = F.regexp_extract(r, r"^([^?#]*)", 1)
        rtail = F.regexp_extract(r, r"([?#].*)$", 1)
        return [r, scheme, origin, base_path, base_dir, rpath, rtail]

    def body(r, scheme, origin, base_path, base_dir, rpath, rtail):
        return (
            F.when(r.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), r)
            .when(r.startswith("//"), F.concat(scheme, F.lit(":"), r))
            .when(
                r.startswith("/"),
                F.concat(origin, _remove_dot_segments(rpath), rtail),
            )
            .when(
                (r == "") | r.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"),
                F.lit(None).cast("string"),
            )
            .when(
                # query-only / fragment-only refs: RFC 3986 §5.3 keeps
                # the base's FULL path ('?page=2' on /a/b.html is
                # /a/b.html?page=2, not the directory)
                rpath == "",
                F.concat(origin, base_path, rtail),
            )
            .otherwise(
                F.concat(
                    origin,
                    _remove_dot_segments(F.concat(base_dir, rpath)),
                    rtail,
                )
            )
        )

    return _let([b, r0], lambda bb, rr: _let(parts(bb, rr), body))


#: Query parameters that carry a per-visitor session token — a URL
#: differing only here is the same resource, and a crawler that
#: treats them as distinct re-fetches the whole site per session id.
SESSION_PARAM_RE = r"(?i)(^|&)(phpsessid|jsessionid|sessionid|sid)="


def trap_flags(col: "Column | str") -> "Column":
    """Crawler-trap heuristics over one URL — the frontier hygiene
    filter every large crawl runs BEFORE scheduling (a calendar
    widget or a session-id mirror can mint unbounded URLs; Common
    Crawl's published crawl configs cap exactly these shapes).
    Returns a struct of per-URL signals, all pure column work:

    - ``depth`` — path segment count; ``deep`` flags depth > 12
      (real content almost never nests that far; traps do);
    - ``max_seg_run`` — the highest multiplicity of any single path
      segment; ``loop`` flags >= 3 (``/a/b/a/b/a`` — the classic
      self-embedding trap). Computed by sorting the segment array
      and folding a (prev, run, max) struct — JVM HOF on an
      href-sized array, the ``_remove_dot_segments`` posture;
    - ``calendar`` — a ``/YYYY/M(/D)`` date spine in the path
      (infinite-calendar traps);
    - ``session`` — a session-id query parameter
      (``SESSION_PARAM_RE``);
    - ``params`` — more than 8 query parameters (faceted-search
      explosion);
    - ``trap_score`` — the flag sum; schedulers drop or depth-limit
      hosts whose trap share spikes.

    The flags are HEURISTICS (documented, closed-form) — the
    operator's contract is the exact rules above, which is what the
    x161 oracle re-derives."""
    u = F.col(col) if isinstance(col, str) else col
    path = F.regexp_extract(u, r"^[^:/?]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    depth = F.size(segs)
    run_acc = F.aggregate(
        F.array_sort(segs),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("mx"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc.mx,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("mx"),
        ),
        lambda acc: acc.mx,
    )
    n_params = F.size(F.filter(F.split(query, "&"), lambda p: p != ""))
    deep = (depth > 12).cast("int")
    loop = (run_acc >= 3).cast("int")
    calendar = path.rlike(r"/(19|20)\d{2}/\d{1,2}(/\d{1,2})?(/|$)").cast(
        "int"
    )
    session = query.rlike(SESSION_PARAM_RE).cast("int")
    params = (n_params > 8).cast("int")
    return F.struct(
        depth.alias("depth"),
        run_acc.alias("max_seg_run"),
        deep.alias("deep"),
        loop.alias("loop"),
        calendar.alias("calendar"),
        session.alias("session"),
        params.alias("params"),
        (deep + loop + calendar + session + params).alias("trap_score"),
    )


def resolve_redirects(
    df: "DataFrame",
    url_col: str = "url",
    next_col: str = "next",
    *,
    max_doublings: int = 4,
):
    """Resolve HTTP redirect chains to their final targets by
    POINTER JUMPING — the log-hop idiom this engine already uses for
    connected components (functions/dedup.py): each iteration joins
    the current successor table onto itself, so a chain of length L
    resolves in ceil(log2(L)) shuffles instead of L. At 100 TB a
    30-hop chain costs 5 data-sized joins, not 30.

    Input: one row per crawled URL — ``url_col`` and ``next_col``
    (the 3xx Location target, already resolved+canonicalized by the
    caller via ``canonical_url(resolve_url(url, location))``;
    NULL for terminal pages, i.e. non-redirect responses).

    Output: ``url_col``, ``final`` (string), ``hops`` (int),
    ``status`` — ``'resolved'`` (reached a terminal page),
    ``'dangling'`` (chain leaves the crawled set: the target was
    never fetched — at crawl scale this feeds the next frontier),
    or ``'unresolved'`` (a cycle, or deeper than ``2**max_doublings``
    hops; real schedulers cap at ~20 — RFC-compliant clients give up
    long before). Unresolved/dangling rows carry ``final='none'``
    and ``hops=-1``: the partially-jumped pointer is an
    implementation detail, not a contract, so it is masked.

    Every iteration is one equi-join shuffle of the frontier-sized
    pointer table; the loop is DRIVER-SIDE control flow over a fixed
    ``max_doublings`` (no data-dependent collect). Each round ends
    in an EAGER ``localCheckpoint`` — the connected-components /
    PageRank discipline (functions/dedup.py:365, graph.py): the
    doubling consumes CUR on BOTH join sides, so without pinning the
    lineage (and the physical plan) doubles per round — 2^K copies
    of the input scan by K=4 — and at 100 TB the recomputation, not
    the join, becomes the cost."""
    from pyspark.sql import functions as _F

    cur = df.select(
        _F.col(url_col).alias("u"),
        _F.coalesce(_F.col(next_col), _F.col(url_col)).alias("tgt"),
        _F.col(next_col).isNull().alias("done"),
        _F.when(_F.col(next_col).isNull(), 0).otherwise(1).alias("hops"),
        _F.lit(False).alias("dangled"),
    )
    for _ in range(max_doublings):
        cur = cur.localCheckpoint(eager=True)
        nxt = cur.select(
            _F.col("u").alias("n_u"), _F.col("tgt").alias("n_tgt"),
            _F.col("done").alias("n_done"),
            _F.col("hops").alias("n_hops"),
            _F.col("dangled").alias("n_dangled"),
        )
        j = cur.join(nxt, cur.tgt == nxt.n_u, "left")
        active = ~_F.col("done")
        # the pointer leaves the crawled set: DANGLING (no row to
        # jump through); a jump ONTO a dangled chain dangles too
        hit_missing = active & _F.col("n_u").isNull()
        advanced = active & _F.col("n_u").isNotNull()
        cur = j.select(
            "u",
            _F.when(advanced, _F.col("n_tgt"))
            .otherwise(_F.col("tgt")).alias("tgt"),
            (
                _F.col("done") | hit_missing
                | (advanced & _F.col("n_done"))
            ).alias("done"),
            _F.when(advanced, _F.col("hops") + _F.col("n_hops"))
            .otherwise(_F.col("hops")).alias("hops"),
            (
                _F.col("dangled") | hit_missing
                | (advanced & _F.col("n_dangled"))
            ).alias("dangled"),
        )
    return cur.select(
        _F.col("u").alias(url_col),
        _F.when(
            _F.col("done") & ~_F.col("dangled"), _F.col("tgt")
        ).otherwise(_F.lit("none")).alias("final"),
        _F.when(
            _F.col("done") & ~_F.col("dangled"), _F.col("hops")
        ).otherwise(_F.lit(-1)).cast("int").alias("hops"),
        _F.when(_F.col("dangled"), _F.lit("dangling"))
        .when(_F.col("done"), _F.lit("resolved"))
        .otherwise(_F.lit("unresolved")).alias("status"),
    )


#: Registrable-domain suffix subset (public-suffix semantics, PSL
#: https://publicsuffix.org — embedded SUBSET, documented contract:
#: exactly this list, longest match wins; a real deployment swaps in
#: the full PSL snapshot as a broadcast table, same algorithm). The
#: multi-label entries are the high-traffic country registries where
#: host-level grouping is most wrong without them.
PUBLIC_SUFFIXES = (
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co",
    "ai", "dev", "app", "info", "biz", "de", "fr", "nl", "ru",
    "jp", "cn", "uk", "au", "br", "in",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in",
)


def registrable_domain(col: "Column | str") -> "Column":
    """The pay-level / registrable domain of a hostname — the unit
    crawl budgets, politeness, and per-site dedup actually apply to
    (``www.a.example.co.uk`` and ``cdn.b.example.co.uk`` are ONE
    site, ``example.co.uk``; grouping by host undercounts, grouping
    by last-two-labels calls every ``*.co.uk`` one site). Longest
    matching suffix from ``PUBLIC_SUFFIXES`` + one label; a host
    with no matching suffix falls back to its last two labels; a
    single-label host passes through; a ``:port`` suffix is stripped
    first (real frontier host columns carry them). Pure JVM column
    work: the suffix scan is a fold over a constant array, the label
    math is split/slice."""
    host = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    host = F.regexp_replace(host, r":\d+$", "")
    sufs = F.array(*[F.lit(s) for s in PUBLIC_SUFFIXES])
    best = F.aggregate(
        sufs,
        F.lit("").alias("b"),
        lambda acc, x: F.when(
            host.endswith(F.concat(F.lit("."), x))
            & (F.length(x) > F.length(acc)),
            x,
        ).otherwise(acc),
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # labels consumed by the suffix = dots in it + 1
    suf_labels = F.size(F.split(best, r"\."))
    reg_from_suffix = F.concat(
        F.element_at(labels, n - suf_labels), F.lit("."), best
    )
    last_two = F.concat(
        F.element_at(labels, n - 1), F.lit("."), F.element_at(labels, n)
    )
    return (
        F.when(n <= 1, host)
        .when((best != "") & (n > suf_labels), reg_from_suffix)
        .when(best != "", host)  # the host IS a bare suffix
        .otherwise(last_two)
    )
