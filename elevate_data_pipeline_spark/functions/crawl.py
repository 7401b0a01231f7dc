"""Robots Exclusion Protocol (robots.txt, RFC 9309) evaluation.

A pretraining crawl is gated by robots.txt before a byte is fetched;
at 100 TB the decision runs per (host, path) on executors against
broadcast or joined policy text. This is the structural subset in the
repo's codec style: grouping (consecutive ``User-agent`` lines own the
following rules), case-insensitive agent selection with the ``*``
fallback, multiple groups for the same agent merged (RFC 9309 §2.2.1),
empty ``Disallow:`` as a no-op, wildcard metacharacters in rule paths
(``*`` matches any octet sequence, a trailing ``$`` anchors the end of
the path, §2.2.3 — ``Disallow: /*?``-style rules are ubiquitous in
real policies), and most-octets-match precedence with Allow winning
length ties (§2.2.2). Unknown directives and garbage lines are
ignored — that leniency is the spec's, not ours.
"""

from __future__ import annotations


def rule_matches(pattern: str, path: str) -> bool:
    """RFC 9309 §2.2.3 rule-path matching: the pattern is a path
    prefix where ``*`` matches any sequence of octets (including
    empty) and a trailing ``$`` anchors the match at the end of the
    path (``$`` elsewhere is a literal octet, the convention of the
    reference matchers). Greedy leftmost placement of the literal
    segments between ``*`` is exact for this pattern language (no
    backtracking needed): taking each segment at its earliest
    position only ever leaves MORE path for later segments."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    segs = pattern.split("*")
    if not path.startswith(segs[0]):
        return False
    if len(segs) == 1:
        return path == pattern if anchored else True
    pos = len(segs[0])
    for seg in segs[1:-1]:
        i = path.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    last = segs[-1]
    if anchored:
        return len(path) - len(last) >= pos and path.endswith(last)
    return last == "" or path.find(last, pos) >= 0


def parse_robots(content: str) -> list:
    """Parse robots.txt into groups: ``[(agents, rules), ...]`` with
    ``agents`` a set of lowercased product tokens and ``rules`` a list
    of ``(type, path)`` with type in {"allow", "disallow"}. Rules
    before any User-agent line are ignored (RFC 9309 §2.2.1)."""
    groups: list = []
    agents: set = set()
    rules: list = []
    collecting_agents = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue  # garbage line: the spec says ignore
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not collecting_agents and agents:
                groups.append((agents, rules))
                agents, rules = set(), []
            agents.add(value.lower())
            collecting_agents = True
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if not agents:
                continue  # rule before any group: ignored per spec
            if value == "":
                continue  # empty pattern matches nothing (no-op)
            rules.append((key, value))
        else:
            collecting_agents = False  # crawl-delay/sitemap/...: ignored
    if agents:
        groups.append((agents, rules))
    return groups


def robots_allowed(content: str, agent: str, path: str) -> tuple:
    """Evaluate one (agent, path): returns ``(allowed, rule_type,
    rule_path)`` with rule_* None when no rule matches (default allow).
    Group selection per RFC 9309: the groups naming the agent exactly
    (case-insensitive) if any exist, else the ``*`` groups, rules
    merged across same-agent groups; precedence is the most-octets
    match (rule-path length, wildcards counted — the reference-matcher
    convention), Allow winning length ties."""
    agent = agent.lower()
    groups = parse_robots(content)
    rules = [r for a, rs in groups if agent in a for r in rs]
    if not any(agent in a for a, _ in groups):
        rules = [r for a, rs in groups if "*" in a for r in rs]
    matches = [(t, p) for t, p in rules if rule_matches(p, path)]
    if not matches:
        return (True, None, None)
    t, p = max(matches, key=lambda r: (len(r[1]), r[0] == "allow"))
    return (t == "allow", t, p)


def fix_mojibake(text: str, max_rounds: int = 3) -> tuple:
    """Repair UTF-8-read-as-latin-1 mojibake ("cafÃ©" -> "café"), the
    single most common crawl-text corruption: if the text's latin-1
    byte image decodes as STRICT UTF-8 and that changes the text, the
    decoding is applied, repeated to a fixpoint (double-encoded text
    needs two rounds; ``max_rounds`` bounds pathological input).
    Returns ``(repaired, n_rounds)`` — n_rounds 0 means the text was
    not mojibake (pure ASCII round-trips identically and is left
    untouched; text with code points beyond latin-1 cannot be a
    latin-1 misreading at all). Deterministic, no heuristics beyond
    strict-decode success — the same rule both engines can replay.
    Boundary (property-pinned): an original whose latin-1 image
    coincidentally forms valid UTF-8 (e.g. "Â€") is indistinguishable
    from true mojibake by ANY decoder; this rule decodes it — callers
    needing to preserve such strings must gate on provenance."""
    rounds = 0
    while rounds < max_rounds:
        try:
            raw = text.encode("latin-1")
        except UnicodeEncodeError:
            break  # beyond latin-1: cannot be a latin-1 misreading
        try:
            decoded = raw.decode("utf-8")
        except UnicodeDecodeError:
            break  # not valid UTF-8: no repair applies
        if decoded == text:
            break  # ASCII fixpoint
        text = decoded
        rounds += 1
    return text, rounds


_URL_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "0123456789-._~"
)
_HEX = frozenset("0123456789abcdefABCDEF")


def pct_normalize(s: str) -> str:
    """RFC 3986 §6.2.2.2 percent-encoding normalization: decode
    triplets whose octet is UNRESERVED (ALPHA / DIGIT / - . _ ~),
    uppercase the hex digits of every triplet that must stay encoded
    (reserved and non-ASCII octets are NOT decoded — %2F in a path is
    not a slash). A '%' not followed by two hex digits is a malformed
    URL and raises ValueError (fail loud, never pass garbage through
    as a canonical form)."""
    if "%" not in s:
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        h = s[i + 1:i + 3]
        if len(h) < 2 or h[0] not in _HEX or h[1] not in _HEX:
            raise ValueError(f"malformed percent-encoding in {s!r}")
        ch = chr(int(h, 16))
        out.append(ch if ch in _URL_UNRESERVED else "%" + h.upper())
        i += 3
    return "".join(out)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, verbatim, for the absolute
    paths absolute URLs carry: "." segments vanish, ".." pops the
    previous segment (empty segments are real, poppable segments:
    "/a//../b" -> "/a/b"), a trailing "." / ".." keeps the directory
    slash ("/a/b/.." -> "/a/"). One divergence from the RFC, by
    contract: a ".." that would pop past the root raises ValueError
    instead of being silently ignored (urljoin clamps; a crawler
    treating "/../etc/passwd" as "/etc/passwd" is hiding a malformed
    or hostile href, so the engine gates loudly)."""
    out: list = []
    inp = path
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../") or inp == "/..":
            if not out:
                raise ValueError(
                    f"dot segments escape the path root in {path!r}"
                )
            out.pop()
            inp = "/" + inp[4:] if inp.startswith("/../") else "/"
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            if i == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def canonical_url(url: str) -> dict:
    """Deterministic URL canonicalization (RFC 3986 normalization
    subset) — the precursor to URL-level crawl dedup: lowercase scheme
    and host, internationalized host labels punycoded (stdlib IDNA
    codec, ToASCII per RFC 3490; UTS46 mapping differences are a
    documented boundary), drop the scheme's default port (http:80 /
    https:443), drop the fragment, empty path -> "/",
    percent-encoding normalized per RFC 3986 §6.2.2.2
    (:func:`pct_normalize` — applied BEFORE dot segments so a %2E
    resolves like the '.' it is), dot segments resolved per §5.2.4
    (:func:`remove_dot_segments`; a path whose ".." would escape the
    root still raises loudly), query parameters sorted by
    (key, value). No policy transforms (no www-stripping, no
    trailing-slash edits). Returns ``{url, scheme, host, port, path,
    query, n_params}`` with ``url`` the canonical recomposition."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    if not parts.scheme or parts.hostname is None:
        raise ValueError(f"not an absolute URL: {url!r}")
    scheme = parts.scheme.lower()
    host = parts.hostname.lower()
    if not host.isascii():
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError as exc:
            raise ValueError(
                f"host {host!r} is not IDNA-encodable: {exc}"
            ) from exc
    port = parts.port  # urlsplit validates numeric ports
    if (scheme, port) in (("http", 80), ("https", 443)):
        port = None
    path = pct_normalize(parts.path) or "/"
    if any(seg in (".", "..") for seg in path.split("/")):
        path = remove_dot_segments(path) or "/"
    qn = pct_normalize(parts.query) if parts.query else ""
    params = [p for p in qn.split("&") if p] if qn else []
    pairs = sorted(p.partition("=") for p in params)
    query = "&".join(k + sep + v for k, sep, v in pairs)
    # urlsplit strips the brackets from IPv6 literals; re-bracket on
    # recomposition or the colons would parse as a port boundary
    host_out = f"[{host}]" if ":" in host else host
    netloc = host_out if port is None else f"{host_out}:{port}"
    canon = f"{scheme}://{netloc}{path}" + (f"?{query}" if query else "")
    return {
        "url": canon, "scheme": scheme, "host": host,
        "port": port, "path": path, "query": query or None,
        "n_params": len(pairs),
    }


def try_canonical_url(url: str) -> dict:
    """Per-record-safe :func:`canonical_url` for Arrow-batch callers
    over UNTRUSTED frontier input: the loud gates stay loud (a
    malformed percent triplet, a root-escaping "..", a non-absolute or
    non-IDNA URL is still never passed through as a canonical form),
    but the refusal is confined to the one record — the same keys come
    back all-``None`` with ``error`` carrying the gate's message —
    instead of a ValueError killing the whole Arrow batch/task (one
    hostile href in a billion-row frontier must not fail the query).
    On success: the :func:`canonical_url` dict plus ``error=None``."""
    try:
        out = canonical_url(url)
        out["error"] = None
        return out
    except ValueError as exc:
        return {
            "url": None, "scheme": None, "host": None, "port": None,
            "path": None, "query": None, "n_params": None,
            "error": str(exc),
        }


SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def robots_sitemaps(content: str) -> list:
    """Extract ``Sitemap:`` directive values from robots.txt (the
    sitemaps.org autodiscovery convention; RFC 9309 treats it as an
    other-record line). The directive is group-independent — it applies
    wherever it appears — so this is a plain line scan: case-insensitive
    key, value taken verbatim after optional whitespace (sitemap URLs
    are absolute per the protocol; validation is the caller's
    canonical_url). Order preserved, duplicates kept (they are real
    signal about misconfigured sites)."""
    out: list = []
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, sep, value = line.partition(":")
        # the value is itself a URL containing "://": partition on the
        # FIRST colon only splits the directive key correctly
        if sep and key.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def encode_sitemap(entries: list, kind: str = "urlset") -> str:
    """Write a sitemaps.org 0.9 document: ``kind`` "urlset" (page
    entries with optional lastmod/changefreq/priority) or
    "sitemapindex" (child-sitemap entries with optional lastmod).
    Each entry is a dict with ``loc`` (required) and the optional
    fields; fields are emitted in protocol order."""
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"bad sitemap kind {kind!r}")
    child = "url" if kind == "urlset" else "sitemap"
    optional = (
        ("lastmod", "changefreq", "priority") if kind == "urlset"
        else ("lastmod",)
    )
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<{kind} xmlns="{SITEMAP_NS}">',
    ]
    for e in entries:
        if not e.get("loc"):
            raise ValueError("sitemap entry missing loc")
        lines.append(f"  <{child}>")
        esc = (
            str(e["loc"]).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;")
        )
        lines.append(f"    <loc>{esc}</loc>")
        for f in optional:
            if e.get(f) is not None:
                lines.append(f"    <{f}>{e[f]}</{f}>")
        lines.append(f"  </{child}>")
    lines.append(f"</{kind}>")
    return "\n".join(lines)


def parse_sitemap(xml: str) -> dict:
    """Parse a sitemaps.org 0.9 document (stdlib ElementTree): returns
    ``{"kind": "urlset"|"sitemapindex", "entries": [{"loc", "lastmod",
    "changefreq", "priority"}, ...]}`` with absent optional fields None.
    The namespace is stripped for matching (real sitemaps carry the
    0.9 default namespace, prefixed variants, or none at all — all
    three occur in crawls). Fail-loud contract: a root element other
    than urlset/sitemapindex, an entry without a non-empty ``loc``, or
    a priority outside [0.0, 1.0] raises ValueError; unknown child
    elements inside entries are ignored (the protocol explicitly
    allows extension namespaces)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise ValueError(f"malformed sitemap XML: {exc}") from exc

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1] if "}" in tag else tag

    kind = local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document (root <{kind}>)")
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries: list = []
    for child in root:
        if local(child.tag) != child_tag:
            continue  # extension elements: protocol-sanctioned leniency
        fields = {"loc": None, "lastmod": None, "changefreq": None,
                  "priority": None}
        for el in child:
            name = local(el.tag)
            if name in fields:
                fields[name] = (el.text or "").strip() or None
        if not fields["loc"]:
            raise ValueError(f"sitemap <{child_tag}> entry missing <loc>")
        if fields["priority"] is not None:
            try:
                pri = float(fields["priority"])
            except ValueError as exc:
                raise ValueError(
                    f"bad sitemap priority {fields['priority']!r}"
                ) from exc
            if not 0.0 <= pri <= 1.0:
                raise ValueError(
                    f"sitemap priority {pri} outside [0.0, 1.0]"
                )
        entries.append(fields)
    return {"kind": kind, "entries": entries}


# charset labels a crawl actually sees -> python codec; the WHATWG
# encoding standard folds iso-8859-1/ascii labels into windows-1252
# for WEB BROWSERS, but a data pipeline wants the DECLARED codec
# exactly — a cp1252-only byte under an iso-8859-1 label should fail
# loud, not silently re-map.
HTTP_CHARSETS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "us-ascii": "ascii", "ascii": "ascii",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    # the non-Latin labels real crawls see most, all stdlib codecs:
    # CJK (WHATWG folds shift_jis labels together; gb2312 content is
    # decoded as gbk BY BROWSERS, but the declared-codec-exactly rule
    # above applies — gbk-only bytes under a gb2312 label fail loud)
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis",
    "euc-jp": "euc_jp",
    "euc-kr": "euc_kr", "ks_c_5601-1987": "euc_kr",
    "gb2312": "gb2312", "gbk": "gbk", "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs",
    # Cyrillic / Greek / Turkish / Hebrew / Arabic 8-bit families
    "koi8-r": "koi8_r", "koi8-u": "koi8_u",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "iso-8859-2": "iso8859_2", "windows-1250": "cp1250",
    "iso-8859-5": "iso8859_5",
    "iso-8859-7": "iso8859_7", "windows-1253": "cp1253",
    "iso-8859-9": "iso8859_9", "windows-1254": "cp1254",
    "iso-8859-8": "iso8859_8", "windows-1255": "cp1255",
    "windows-1256": "cp1256",
    "iso-8859-15": "iso8859_15",
    "windows-874": "cp874", "tis-620": "tis_620",
}


def content_type_charset(ctype: str) -> str:
    """Extract the ``charset`` parameter from a Content-Type value
    (RFC 7231 §3.1.1.1 media-type parameters): ``;``-separated
    ``key=value`` pairs after the media type, names case-insensitive,
    values optionally double-quoted. Returns the lowercased label or
    None when absent."""
    for param in ctype.split(";")[1:]:
        key, sep, value = param.partition("=")
        if sep and key.strip().lower() == "charset":
            v = value.strip()
            if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
                v = v[1:-1]
            return v.lower() or None
    return None


def html_meta_charset(body: bytes, limit: int = 1024) -> str:
    """Sniff an HTML ``<meta charset=...>`` or ``<meta http-equiv=
    Content-Type content="...charset=...">`` declaration from the
    document head — the standard prescan window is the first 1024
    bytes, examined as latin-1 (charset labels are ASCII, so the sniff
    is byte-safe under every supported encoding except UTF-16, whose
    BOM the caller handles first). Returns the lowercased label or
    None."""
    import re

    head = body[:limit].decode("latin-1", "replace").lower()
    m = re.search(r"""<meta\s[^>]*charset\s*=\s*["']?([a-z0-9_-]+)""", head)
    return m.group(1) if m else None


def decode_http_text(body: bytes, content_type: str) -> tuple:
    """Decode an HTTP body to text by the crawl precedence chain
    (WHATWG encoding sniff order, restated for a fail-loud pipeline):
    1. UTF-16 byte-order mark (BOM beats every declaration),
    2. ``charset`` parameter in the Content-Type header,
    3. ``<meta>`` charset prescan over the first 1024 bytes,
    4. strict UTF-8 as the undeclared default.
    Returns ``(text, charset_label, source)`` with source in
    {"bom", "header", "meta", "default"}. An unsupported label gates
    loudly (NotImplementedError); bytes invalid under the declared
    codec raise ValueError — a silently mis-decoded body poisons every
    text operator downstream."""
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return body.decode("utf-16"), "utf-16", "bom"
    label = content_type_charset(content_type) if content_type else None
    source = "header"
    if label is None:
        label = html_meta_charset(body)
        source = "meta"
    if label is None:
        label, source = "utf-8", "default"
    codec = HTTP_CHARSETS.get(label)
    if codec is None:
        raise NotImplementedError(
            f"charset {label!r} not in the supported crawl set"
        )
    try:
        return body.decode(codec), label, source
    except UnicodeDecodeError as exc:
        raise ValueError(
            f"body is not valid {label} ({source}-declared): {exc}"
        ) from exc


def crawl_delay(content: str, agent: str):
    """Evaluate the ``Crawl-delay`` extension directive (honored by
    Bing/Yandex; RFC 9309 treats it as an other-record line that
    belongs to the group it appears in): returns the delay in seconds
    (float) for ``agent``, or None when no applicable group carries
    one. Group selection mirrors :func:`robots_allowed` — the groups
    naming the agent exactly (case-insensitive) if any exist, else the
    ``*`` groups, merged across same-agent groups; conflicting delays
    merge to the MAX (the conservative politeness choice). A value
    that doesn't parse as a non-negative number is ignored like any
    other unknown line — the directive is itself an extension, so its
    malformed forms get the spec's garbage-line leniency, not the
    fail-loud gate reserved for structured formats."""
    groups: list = []
    agents: set = set()
    delays: list = []
    collecting_agents = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not collecting_agents and agents:
                groups.append((agents, delays))
                agents, delays = set(), []
            agents.add(value.lower())
            collecting_agents = True
        elif key == "crawl-delay":
            collecting_agents = False
            if not agents:
                continue
            try:
                d = float(value)
            except ValueError:
                continue
            # float() accepts 'inf'/'infinity'/'nan'; inf satisfies
            # d >= 0 and would poison politeness budgets downstream
            # (floor(86400/inf)=0 -> ceil-divide by zero)
            if d >= 0 and d == d and d != float("inf"):
                delays.append(d)
        elif key in ("allow", "disallow"):
            collecting_agents = False
        else:
            collecting_agents = False
    if agents:
        groups.append((agents, delays))
    agent = agent.lower()
    picked = [d for a, ds in groups if agent in a for d in ds]
    if not any(agent in a for a, _ in groups):
        picked = [d for a, ds in groups if "*" in a for d in ds]
    return max(picked) if picked else None


# Embedded public-suffix rule subset (publicsuffix.org algorithm; the
# full list is an external, frequently-updated resource — this subset
# is the repo's swap-in, the multimodal empirical-table convention, and
# carries one rule of every KIND the algorithm distinguishes: normal,
# multi-label, wildcard, exception). Unknown TLDs fall back to the
# list's own default rule "*" (the last label is a public suffix) —
# that is the PSL spec's behavior, not a repo invention.
PSL_RULES = (
    "com", "org", "net", "edu", "gov", "io", "co",
    "uk", "co.uk", "org.uk", "ac.uk",
    "jp", "co.jp", "ne.jp",
    "au", "com.au", "org.au",
    "de", "fr", "br", "com.br", "us", "ca",
    "*.ck", "!www.ck",
)


def public_suffix(host: str) -> str:
    """The public suffix of ``host`` under :data:`PSL_RULES`, by the
    publicsuffix.org algorithm: among matching rules the longest (most
    labels) wins; an exception rule (``!``) beats any other match and
    makes the suffix one label SHORTER; with no match the default rule
    ``*`` applies (the last label is the suffix). Hosts are expected
    lowercase (canonical_url's output); IP literals are the caller's
    concern."""
    labels = host.split(".")
    best = None  # (n_labels, is_exception, suffix_labels)
    for rule in PSL_RULES:
        exception = rule.startswith("!")
        r = rule[1:] if exception else rule
        rl = r.split(".")
        if len(rl) > len(labels):
            continue
        tail = labels[-len(rl):]
        if all(a == b or a == "*" for a, b in zip(rl, tail)):
            key = (exception, len(rl))
            if best is None or key > (best[0], best[1]):
                best = (exception, len(rl), tail)
    if best is None:
        return labels[-1]  # the PSL default rule "*"
    exception, n, tail = best
    if exception:
        return ".".join(tail[1:])  # exception: one label shorter
    return ".".join(tail)


def registrable_domain(host: str):
    """The registrable domain (eTLD+1) of ``host`` — the key real
    crawl pipelines cap and group by (a per-HOST cap undercounts
    sites that shard across subdomains). Returns None when the host
    IS a public suffix (nothing registered below it)."""
    suffix = public_suffix(host)
    ns = suffix.count(".") + 1
    labels = host.split(".")
    if len(labels) <= ns:
        return None
    return ".".join(labels[-(ns + 1):])
