"""Text-analysis column expressions for document pipelines.

All JVM-side (``pyspark.sql.functions`` / SQL expressions) — no Python
UDFs in the hot path. Each function has a DuckDB-equivalent formulation
(see ``queries.py``) built from the same deterministic integer/IEEE
arithmetic so results hash-match across engines:

- token counting: whitespace split + a BPE-ish regex tokenizer;
- language ID: stopword-marker scoring with a fixed argmax order;
- quality score: length/alpha/stopword/word-length heuristics on a
  fixed-order double formula;
- fingerprint: polynomial rolling hash (base 31, mod 1e9+7) over the
  character codes — the classic Rabin-Karp document fingerprint.

At 100 TB these are embarrassingly parallel per-row projections — no
shuffle, full whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 1_000_000_007
POLY_BASE = 31

# marker tokens per language for the n-gram/stopword language heuristic;
# fixed argmax order = tiebreak order
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of", "to"),
    "es": ("el", "la", "de", "que", "los", "y"),
    "fr": ("le", "la", "de", "et", "les", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3"),
}
LANG_ORDER = tuple(LANG_MARKERS)

STOPWORDS = ("the", "a", "of", "and", "to", "is", "in")

BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count_ws(col: str) -> Column:
    """Whitespace token count (single-space split, empties included)."""
    return F.size(F.split(F.col(col), " "))


def token_count_bpe(col: str) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation.

    Uses the Column API (not an SQL literal) — ``\\s`` inside an
    ``F.expr`` string literal would be escape-processed to ``s``.
    """
    return F.size(F.regexp_extract_all(F.col(col), F.lit(BPE_ISH_PATTERN), 0))


def polyhash(expr: str) -> Column:
    """Rabin-Karp polynomial rolling hash of a string expression.

    ``h = fold(chars, 0, (a, c) -> (a*31 + ascii(c)) mod 1e9+7)``
    """
    return F.expr(
        f"aggregate(transform(sequence(1, length({expr})), "
        f"i -> bigint(ascii(substring({expr}, i, 1)))), "
        f"bigint(0), (a, b) -> (a * {POLY_BASE} + b) % {POLY_MOD})"
    )


def fingerprint(col: str) -> Column:
    """Document fingerprint = polyhash of the raw text."""
    return polyhash(col)


def winnow_fingerprints(col: str, k: int = 5, w: int = 4) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    rolling hashes of character k-grams, then the minimum of each
    w-hash window, deduplicated.

    Guarantees a shared fingerprint for any match of length >= w+k-1,
    with density 2/(w+1) — the standard plagiarism/near-dup fingerprint
    set. Pure JVM array expressions; one array column per document.
    """
    n_grams = f"greatest(length({col}) - {k - 1}, 1)"
    gram_hashes = (
        f"transform(sequence(1, {n_grams}), i -> "
        f"aggregate(transform(sequence(i, least(i + {k - 1}, length({col}))), "
        f"j -> bigint(ascii(substring({col}, j, 1)))), "
        f"bigint(0), (a, b) -> (a * {POLY_BASE} + b) % {POLY_MOD}))"
    )
    return F.expr(
        f"array_distinct(transform(array({gram_hashes}), hs -> "
        f"transform(sequence(1, greatest(size(hs) - {w - 1}, 1)), "
        f"i -> array_min(slice(hs, i, {w}))))[0])"
    )


def winnow_fingerprints_arrow(col: str, k: int = 5, w: int = 4) -> Column:
    """Vectorized :func:`winnow_fingerprints` (identical output).

    The expression version evaluates O(len·k + len·w) interpreted array
    ops per document; this one computes the rolling hashes as one numpy
    polynomial (values < 2^43, so a single mod equals the per-step mod)
    and the window minima as w shifted ``np.minimum`` passes.
    """
    from pyspark.sql.types import ArrayType, LongType

    pows = [POLY_BASE ** (k - 1 - j) for j in range(k)]

    @F.pandas_udf(ArrayType(LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
            # non-ASCII: match ascii() semantics (codepoint of first byte
            # differs) — fall back to per-char ord for exactness
            if b.max(initial=0) > 127:
                b = np.array([ord(c) for c in t], dtype=np.int64)
            n = len(b)
            if n >= k:
                h = sum(b[j : n - k + 1 + j] * p for j, p in enumerate(pows)) % POLY_MOD
            else:
                acc = 0
                for x in b:
                    acc = (acc * POLY_BASE + int(x)) % POLY_MOD
                h = np.array([acc], dtype=np.int64)
            m = len(h)
            if m >= w:
                mins = h[: m - w + 1].copy()
                for s in range(1, w):
                    np.minimum(mins, h[s : m - w + 1 + s], out=mins)
            else:
                mins = np.array([h.min()], dtype=np.int64)
            # array_distinct keeps first-occurrence order
            _, idx = np.unique(mins, return_index=True)
            out.append(mins[np.sort(idx)].tolist())
        return pd.Series(out)

    return _winnow(col)


def dup_ngram_frac(col: str, n: int = 2) -> Column:
    """Fraction of the text's word n-grams that are repeats:
    ``1 - distinct_ngrams / total_ngrams`` (0.0 when fewer than n words).

    The Gopher-style repetition signal (Rae et al. 2021 §A1.2): high
    values flag boilerplate/spam for the quality gate. Integer counts
    with a single double division — engine-exact. Pure projection, no
    shuffle.
    """
    ws = f"split({col}, ' ')"
    grams = (
        f"transform(sequence(1, size({ws}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({ws}, i, {n})))"
    )
    return F.when(
        F.size(F.split(F.col(col), " ")) >= n,
        F.lit(1.0)
        - F.expr(f"size(array_distinct({grams}))").cast("double")
        / F.expr(f"size({ws}) - {n - 1}").cast("double"),
    ).otherwise(F.lit(0.0))


def repetition_stats_arrow(col: str) -> Column:
    """Arrow-batched (n_words, top_n, n_distinct_bigrams) per document —
    the integer inputs of the repetition signals, identical to the
    explode/groupBy + higher-order-function formulation but one
    vectorized pass instead of two shuffles and an interpreted gram
    array per row (same lesson as minhash_signature_arrow)."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_t = StructType(
        [
            StructField("n_words", LongType()),
            StructField("top_n", LongType()),
            StructField("n_dist_bg", LongType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _rep(texts: pd.Series) -> pd.DataFrame:
        n_words, top_n, n_bg = [], [], []
        for t in texts:
            ws = t.split(" ")
            counts: dict[str, int] = {}
            for w in ws:
                counts[w] = counts.get(w, 0) + 1
            n_words.append(len(ws))
            top_n.append(max(counts.values()))
            n_bg.append(len(set(zip(ws, ws[1:]))) if len(ws) >= 2 else 0)
        return pd.DataFrame({"n_words": n_words, "top_n": top_n, "n_dist_bg": n_bg})

    return _rep(col)


def _marker_hits(col: str, markers: tuple[str, ...]) -> Column:
    quoted = ", ".join(f"'{m}'" for m in markers)
    return F.expr(f"size(filter(split({col}, ' '), w -> w IN ({quoted})))")


def lang_scores(col: str) -> dict[str, Column]:
    """Marker-hit count per candidate language."""
    return {lang: _marker_hits(col, m) for lang, m in LANG_MARKERS.items()}


def lang_id(col: str) -> Column:
    """Predicted language: argmax of marker hits, ties broken by
    LANG_ORDER (first wins); 'und' when no marker fires.

    Equivalent SQL: ``g = greatest(s_en, s_es, ...); CASE WHEN g = 0 THEN
    'und' WHEN s_en = g THEN 'en' WHEN s_es = g THEN 'es' ... END``.
    """
    scores = lang_scores(col)
    g = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when(scores[lang] == g, F.lit(lang)).otherwise(expr)
    return F.when(g == 0, F.lit("und")).otherwise(expr)


def quality_score(col: str) -> Column:
    """Heuristic quality in [0,1], fixed-order double arithmetic:

    0.25 * min(n_tokens/100, 1)
    + 0.25 * alpha_ratio
    + 0.25 * max(0, 1 - abs(avg_word_len - 5)/5)
    + 0.25 * min(stop_ratio * 5, 1)
    """
    n_tokens = token_count_ws(col).cast("double")
    n_chars = F.length(F.col(col)).cast("double")
    alpha = F.length(F.regexp_replace(F.col(col), "[^A-Za-z]", "")).cast("double")
    stop_hits = _marker_hits(col, STOPWORDS).cast("double")
    avg_word_len = (n_chars - (n_tokens - F.lit(1.0))) / n_tokens
    alpha_ratio = alpha / n_chars
    stop_ratio = stop_hits / n_tokens
    return (
        F.lit(0.25) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.25)
        * F.greatest(
            F.lit(0.0), F.lit(1.0) - F.abs(avg_word_len - F.lit(5.0)) / F.lit(5.0)
        )
        + F.lit(0.25) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )


# --------------------------------------------------------------------------
# HTML -> text extraction (web-crawl ingestion). A real parser-based
# extractor (stdlib html.parser — proper tag nesting, entity references,
# script/style exclusion), run as an Arrow-batched pandas UDF. The
# pretraining ingest shape: crawled pages arrive as markup; everything
# downstream (quality, dedup, tokenization) wants visible text only.
# --------------------------------------------------------------------------

_HTML_SKIP_TAGS = ("script", "style")


def html_to_text(payload: str) -> str:
    """Visible text of an HTML document: concatenated character data
    outside <script>/<style>, with entity and charref resolution —
    stdlib ``html.parser`` (convert_charrefs=True), no dependencies.
    No whitespace is added or collapsed; the page's own text spacing
    survives verbatim so downstream token counts are reproducible."""
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.skip = 0
            self.parts: list[str] = []

        def handle_starttag(self, tag, attrs):
            if tag in _HTML_SKIP_TAGS:
                self.skip += 1

        def handle_endtag(self, tag):
            if tag in _HTML_SKIP_TAGS and self.skip:
                self.skip -= 1

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

    x = _X()
    x.feed(payload)
    x.close()
    return "".join(x.parts)


def html_extract_arrow(col: str = "html") -> Column:
    """Arrow-batched :func:`html_to_text` over a markup column."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _ex(pages: pd.Series) -> pd.Series:
        return pd.Series([html_to_text(p) for p in pages])

    return _ex(col)
