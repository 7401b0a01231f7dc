"""Tokenizer induction: byte-pair-encoding merge training as a
fixed-iteration declarative plan.

Classic BPE training (Sennrich et al. 2016) is a driver-side loop over a
mutable vocabulary; here each round is pure DataFrame algebra, the same
family as the engine's k-means and PageRank:

1. **pair count** — explode each word-state's adjacent symbol pairs,
   weighted by word frequency; one partial-agg shuffle on (l, r);
2. **argmax** — the highest-weight pair, ties broken lexicographically:
   a global ``orderBy(...).limit(1)`` over the (tiny) pair-count frame —
   Catalyst plans TakeOrderedAndProject, no single-partition sort of
   anything big;
3. **merge** — every word-state string-replaces ``l SEP r -> l r``.
   ``replace`` substitutes left-to-right non-overlapping occurrences in
   BOTH Spark and DuckDB, which is exactly BPE's simultaneous-merge
   semantics, so the oracle can replay training bit-for-bit.

Word states live as SEP-joined symbol strings (SEP = US 0x1f, absent
from the corpus alphabet). The vocabulary frame is word-level (distinct
words + counts), orders of magnitude smaller than the corpus; each round
is one small shuffle + a 1-row broadcast, so ``n_merges`` rounds cost
``n_merges`` tiny stages after the single corpus-scale word count. The
state frame is localCheckpointed per round to keep lineage flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # US control char: joins symbols inside a word state


def _initial_states(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, st): corpus word frequencies with the word exploded
    into its character symbols, SEP-joined."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.expr(
        f"array_join(transform(sequence(1, length(word)), "
        f"i -> substring(word, i, 1)), '{SEP}')"
    )
    return words.withColumn("st", chars)


def _pair_counts(states: DataFrame) -> DataFrame:
    """Adjacent-pair weights over the current states: (l, r, wgt)."""
    # NB: Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty —
    # single-symbol words must short-circuit to an empty pair array
    pairs = F.expr(
        f"CASE WHEN size(split(st, '{SEP}')) < 2 THEN array() "
        f"ELSE transform(sequence(1, size(split(st, '{SEP}')) - 1), "
        f"i -> struct(element_at(split(st, '{SEP}'), i) AS l, "
        f"            element_at(split(st, '{SEP}'), i + 1) AS r)) END"
    )
    return (
        states.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("wgt"))
    )


def bpe_merges(
    docs: DataFrame, n_merges: int = 3, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus word
    frequencies; returns (merge_idx, left, right, weight) — the merge
    table a tokenizer ships. Deterministic: weight-desc, then
    lexicographic (l, r) tie-break."""
    states = _initial_states(docs, text_col).localCheckpoint(eager=True)
    merges = []
    for i in range(1, n_merges + 1):
        top = (
            _pair_counts(states)
            .orderBy(F.desc("wgt"), "l", "r")
            .limit(1)
            .localCheckpoint(eager=True)  # 1 row; reused by output + merge step
        )
        merges.append(
            top.select(
                F.lit(i).alias("merge_idx"),
                F.col("l").alias("left"),
                F.col("r").alias("right"),
                F.col("wgt").cast("long").alias("weight"),
            )
        )
        if i < n_merges:
            states = states.crossJoin(F.broadcast(top)).select(
                "word",
                "cnt",
                F.replace(
                    F.col("st"),
                    F.concat(F.col("l"), F.lit(SEP), F.col("r")),
                    F.concat(F.col("l"), F.col("r")),
                ).alias("st"),
            ).localCheckpoint(eager=True)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def bpe_encode(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train ``n_merges`` BPE merges and APPLY them, returning per-doc
    token accounting under the learned vocabulary:
    (id, n_tokens_bpe, n_tokens_char). The whole train+apply is one
    declarative plan — the final word states join back to the exploded
    corpus words (the word vocabulary is corpus-scale-independent and
    broadcastable), so encoding is a map-side join + one groupBy(id)."""
    states = _initial_states(docs, text_col).localCheckpoint(eager=True)
    for _ in range(n_merges):
        top = (
            _pair_counts(states)
            .orderBy(F.desc("wgt"), "l", "r")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        states = states.crossJoin(F.broadcast(top)).select(
            "word",
            "cnt",
            F.replace(
                F.col("st"),
                F.concat(F.col("l"), F.lit(SEP), F.col("r")),
                F.concat(F.col("l"), F.col("r")),
            ).alias("st"),
        ).localCheckpoint(eager=True)
    tokens_per_word = states.select(
        "word",
        F.size(F.split("st", SEP)).cast("long").alias("_bpe"),
        F.length("word").cast("long").alias("_chars"),
    )
    doc_words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    return (
        doc_words.join(F.broadcast(tokens_per_word), "word")
        .groupBy(id_col)
        .agg(
            F.sum("_bpe").alias("n_tokens_bpe"),
            F.sum("_chars").alias("n_tokens_char"),
        )
    )


def _bpe_ctes(n_merges: int, rel: str, with_final_state: bool) -> list[str]:
    """Shared CTE chain for the training oracle: w0 -> (p1, m1, w1) ->
    ... ``with_final_state`` also emits w{n} (needed to APPLY the
    merges; training itself stops at m{n})."""
    parts = [
        f"""w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         array_to_string([substr(word, i, 1) for i in range(1, len(word) + 1)],
                         chr(31)) AS st
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {rel})
  GROUP BY word)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""p{i} AS (
  SELECT u.p.l AS l, u.p.r AS r, sum(cnt) AS wgt
  FROM (SELECT cnt, unnest([{{'l': s[i], 'r': s[i + 1]}}
                            for i in range(1, len(s))]) AS p
        FROM (SELECT cnt, string_split(st, chr(31)) AS s FROM w{i - 1})) u
  GROUP BY u.p.l, u.p.r)"""
        )
        parts.append(
            f"m{i} AS (SELECT l, r, wgt FROM p{i} ORDER BY wgt DESC, l, r LIMIT 1)"
        )
        if i < n_merges or with_final_state:
            parts.append(
                f"""w{i} AS (
  SELECT word, cnt,
         replace(st, (SELECT l || chr(31) || r FROM m{i}),
                     (SELECT l || r FROM m{i})) AS st
  FROM w{i - 1})"""
            )
    return parts


def bpe_oracle_sql(n_merges: int = 3, rel: str = "documents") -> str:
    """Unrolled DuckDB equivalent of :func:`bpe_merges`: the same char
    explode, pair comprehension, top-1 ORDER BY ... LIMIT 1, and
    left-to-right ``replace`` merge — training replayed exactly."""
    parts = _bpe_ctes(n_merges, rel, with_final_state=False)
    selects = " UNION ALL ".join(
        f"SELECT {i} AS merge_idx, l AS left, r AS right, "
        f"CAST(wgt AS BIGINT) AS weight FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


def bpe_encode_oracle_sql(n_merges: int = 3, rel: str = "documents") -> str:
    """Unrolled DuckDB equivalent of :func:`bpe_encode`: the training
    chain through w{n}, then per-doc token accounting by joining the
    exploded corpus words back to their final states."""
    parts = _bpe_ctes(n_merges, rel, with_final_state=True)
    parts.append(
        f"""dw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM {rel})"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT dw.doc_id AS doc_id,
           CAST(sum(len(string_split(w.st, chr(31)))) AS BIGINT) AS n_tokens_bpe,
           CAST(sum(len(w.word)) AS BIGINT) AS n_tokens_char
    FROM dw JOIN w{n_merges} w USING (word)
    GROUP BY dw.doc_id"""
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer induction (SentencePiece-style, Kudo 2018) as a
# fixed-iteration hard-EM beside BPE — the other mainstream tokenizer
# family. Exactness contract: the E-step is a Viterbi lattice DP whose
# path score is a left-to-right IEEE-double product of token
# probabilities p = cnt/T (one cast-division per token, no libm), with
# the total order (score DESC, n_tokens ASC, path ASC) — every
# comparison is on values both engines compute bit-identically, so the
# DuckDB oracle replays training exactly. (Full soft-EM forward-
# backward would need transcendental logs; the hard-EM/Viterbi variant
# is the standard exact-arithmetic counterpart and is what SentencePiece
# itself converges to for pruning decisions.)
#
# Scale shape: all EM state lives on the DISTINCT-WORD frame (corpus-
# scale-independent, like BPE above); the vocab (chars + top-V
# multi-char tokens) is a bounded broadcastable table, synced
# driver-side per iteration exactly like Lloyd's k-centroid sync; the
# per-word lattice is O(len * 3) in a vectorized Arrow batch.
# ---------------------------------------------------------------------------

UNI_MAX_TOKEN = 3   # lattice edge length cap (seed substrings 1..3)
UNI_MAX_WORD = 24   # words longer than this (URLs/hashes) skip the lattice


def _uni_words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct corpus words with frequencies, lattice-capped to
    ``UNI_MAX_WORD`` chars (both engines apply the same cap)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(
            (F.length("word") >= 1) & (F.length("word") <= UNI_MAX_WORD)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _uni_seed_counts(words: DataFrame) -> DataFrame:
    """Substring counts for token lengths 1..3, weighted by word
    frequency — the unigram seed inventory. NB: ``sequence(1, 0)`` is
    DESCENDING in Spark (see _pair_counts), hence the CASE guards."""
    parts = []
    for length in range(1, UNI_MAX_TOKEN + 1):
        guard = (
            f"CASE WHEN length(word) >= {length} THEN "
            f"transform(sequence(1, length(word) - {length - 1}), "
            f"i -> substring(word, i, {length})) ELSE array() END"
        )
        parts.append(guard)
    subs = F.explode(F.expr("concat(" + ", ".join(parts) + ")")).alias("token")
    return (
        words.select(subs, "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def _uni_prune(counts: DataFrame, chars: DataFrame, v_multi: int) -> DataFrame:
    """M-step vocab: every seed character survives (coverage guarantee,
    count 0 when unused this round) + the top ``v_multi`` multi-char
    tokens by (count DESC, token ASC). The multi-char top-V is a
    TakeOrderedAndProject over the bounded token-count frame — the same
    argmax shape as BPE's merge pick, never a corpus-scale sort."""
    ch = chars.join(counts, "token", "left").select(
        "token", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )
    multi = (
        counts.filter(F.length("token") >= 2)
        .orderBy(F.desc("cnt"), "token")
        .limit(v_multi)
        .select("token", F.col("cnt").cast("long").alias("cnt"))
    )
    return ch.unionByName(multi)


def _uni_viterbi(word: str, p: dict):
    """Exact-ordering Viterbi over the token lattice: best[j] minimizes
    (-score, n_tokens, path) — the mirror of the oracle's
    ``ORDER BY score DESC, ntok, path`` with IEEE-double products in
    identical left-to-right order."""
    n = len(word)
    best = [None] * (n + 1)
    best[0] = (1.0, 0, "")
    for j in range(1, n + 1):
        cands = []
        for length in range(1, min(UNI_MAX_TOKEN, j) + 1):
            tok = word[j - length : j]
            prob = p.get(tok)
            if prob is None:
                continue
            s0, k0, path0 = best[j - length]
            cands.append(
                (s0 * prob, k0 + 1, path0 + SEP + tok if path0 else tok)
            )
        best[j] = min(cands, key=lambda c: (-c[0], c[1], c[2]))
    return best[n]


def _uni_estep(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """E-step: Viterbi-segment every distinct word under the current
    vocab scores; emit per-token frequency-weighted counts. The vocab
    (chars + V multi-char rows) is synced driver-side and broadcast
    into the Arrow batches — the Lloyd-centroid-sync shape; the word
    frame never leaves the executors."""
    from collections.abc import Iterator

    import pandas as pd

    rows = vocab.collect()  # bounded: |alphabet| + v_multi rows
    total = sum(r.cnt for r in rows)
    p = {r.token: r.cnt / total for r in rows}

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out: dict = {}
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                _, _, path = _uni_viterbi(str(word), p)
                for tok in path.split(SEP):
                    out[tok] = out.get(tok, 0) + int(cnt)
            yield pd.DataFrame(
                {"token": list(out.keys()), "wcnt": list(out.values())}
            )

    return (
        words.mapInPandas(run, "token string, wcnt long")
        .groupBy("token")
        .agg(F.sum("wcnt").cast("long").alias("cnt"))
    )


def unigram_vocab(
    docs: DataFrame,
    n_iter: int = 2,
    v_multi: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Train a unigram-LM tokenizer vocabulary: substring seed counts ->
    ``n_iter`` rounds of (Viterbi E-step, re-count M-step, prune to
    chars + top-V). Returns (token, cnt, prob) with prob the single
    IEEE division cnt/total over the final vocab."""
    words = _uni_words(docs, text_col).localCheckpoint(eager=True)
    seed = _uni_seed_counts(words).localCheckpoint(eager=True)
    chars = seed.filter(F.length("token") == 1).select("token")
    vocab = _uni_prune(seed, chars, v_multi).localCheckpoint(eager=True)
    for _ in range(n_iter):
        counts = _uni_estep(words, vocab)
        vocab = _uni_prune(counts, chars, v_multi).localCheckpoint(eager=True)
    tot = vocab.agg(F.sum("cnt").alias("_t"))
    return vocab.crossJoin(F.broadcast(tot)).select(
        "token",
        "cnt",
        (F.col("cnt").cast("double") / F.col("_t").cast("double")).alias("prob"),
    )


def unigram_encode(
    docs: DataFrame,
    n_iter: int = 2,
    v_multi: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the unigram vocab and APPLY it: per-doc token accounting
    (id, n_tokens_uni, n_tokens_char) under the final Viterbi
    segmentation — the fertility counterpart of :func:`bpe_encode`.
    Lattice-capped words (> UNI_MAX_WORD chars) are excluded on both
    the train and apply sides."""
    words = _uni_words(docs, text_col).localCheckpoint(eager=True)
    seed = _uni_seed_counts(words).localCheckpoint(eager=True)
    chars = seed.filter(F.length("token") == 1).select("token")
    vocab = _uni_prune(seed, chars, v_multi).localCheckpoint(eager=True)
    for _ in range(n_iter):
        counts = _uni_estep(words, vocab)
        vocab = _uni_prune(counts, chars, v_multi).localCheckpoint(eager=True)

    from collections.abc import Iterator

    import pandas as pd

    rows = vocab.collect()
    total = sum(r.cnt for r in rows)
    p = {r.token: r.cnt / total for r in rows}

    def seg(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            toks = [
                _uni_viterbi(str(w), p)[1] for w in pdf["word"]
            ]
            yield pd.DataFrame(
                {"word": pdf["word"], "_uni": toks,
                 "_chars": [len(str(w)) for w in pdf["word"]]}
            )

    per_word = words.select("word").mapInPandas(
        seg, "word string, _uni long, _chars long"
    )
    doc_words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    return (
        doc_words.join(F.broadcast(per_word), "word")
        .groupBy(id_col)
        .agg(
            F.sum("_uni").alias("n_tokens_uni"),
            F.sum("_chars").alias("n_tokens_char"),
        )
    )


def _uni_dp_ctes(it: int, prev_p: str) -> list[str]:
    """Unrolled Viterbi DP CTE chain for EM iteration ``it``: d{it}_j
    holds the best lattice path to position j per word, extended by
    token lengths 1..3 from positions j-1..j-3, ordered exactly like
    the Python mirror ((score DESC, ntok, path))."""
    parts = [
        f"d{it}_0 AS MATERIALIZED (SELECT word, cnt, CAST(1.0 AS DOUBLE) AS score, "
        f"0 AS ntok, '' AS path FROM uw)"
    ]
    for j in range(1, UNI_MAX_WORD + 1):
        branches = []
        for length in range(1, min(UNI_MAX_TOKEN, j) + 1):
            branches.append(f"""
      SELECT d.word, d.cnt, d.score * v.p AS score, d.ntok + 1 AS ntok,
             CASE WHEN d.path = '' THEN v.token
                  ELSE d.path || chr(31) || v.token END AS path
      FROM d{it}_{j - length} d
      JOIN {prev_p} v ON v.token = substr(d.word, {j - length + 1}, {length})
      WHERE len(d.word) >= {j}""")
        parts.append(
            f"""d{it}_{j} AS MATERIALIZED (
  SELECT word, cnt, score, ntok, path FROM ({" UNION ALL ".join(branches)})
  QUALIFY row_number() OVER (PARTITION BY word
                             ORDER BY score DESC, ntok, path) = 1)"""
        )
    seg = " UNION ALL ".join(
        f"SELECT word, cnt, path FROM d{it}_{j} WHERE len(word) = {j}"
        for j in range(1, UNI_MAX_WORD + 1)
    )
    parts.append(f"seg{it} AS MATERIALIZED ({seg})")
    parts.append(
        f"""c{it} AS MATERIALIZED (
  SELECT token, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(path, chr(31))) AS token, cnt
        FROM seg{it})
  GROUP BY token)"""
    )
    return parts


def _uni_vocab_ctes(k: int, src: str, v_multi: int) -> list[str]:
    """vocab{k} (chars coverage + top-V multi) and p{k} (cnt/T)."""
    return [
        f"""vocab{k} AS MATERIALIZED (
  SELECT ch.token, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
  FROM chars0 ch LEFT JOIN {src} c USING (token)
  UNION ALL
  SELECT token, CAST(cnt AS BIGINT) AS cnt FROM {src}
  WHERE len(token) >= 2
  QUALIFY row_number() OVER (ORDER BY cnt DESC, token) <= {v_multi})""",
        f"t{k} AS MATERIALIZED (SELECT CAST(sum(cnt) AS BIGINT) AS T FROM vocab{k})",
        f"""p{k} AS MATERIALIZED (
  SELECT token, CAST(cnt AS DOUBLE) / CAST((SELECT T FROM t{k}) AS DOUBLE) AS p
  FROM vocab{k})""",
    ]


def unigram_oracle_sql(
    n_iter: int = 2, v_multi: int = 64, rel: str = "documents"
) -> str:
    """Unrolled DuckDB equivalent of :func:`unigram_vocab`: the same
    word-frequency cap, substring seed, per-iteration Viterbi DP
    (identical IEEE product order and (score DESC, ntok, path) total
    order), char-coverage + top-V prune, and the final cnt/T division."""
    parts = [
        f"""uw AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {rel})
  WHERE len(word) >= 1 AND len(word) <= {UNI_MAX_WORD}
  GROUP BY word)""",
        f"""c0 AS MATERIALIZED (
  SELECT token, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
    SELECT unnest([substr(word, i, 1) for i in range(1, len(word) + 1)])
           AS token, cnt FROM uw
    UNION ALL
    SELECT unnest([substr(word, i, 2) for i in range(1, len(word))]),
           cnt FROM uw WHERE len(word) >= 2
    UNION ALL
    SELECT unnest([substr(word, i, 3) for i in range(1, len(word) - 1)]),
           cnt FROM uw WHERE len(word) >= 3
  ) GROUP BY token)""",
        "chars0 AS MATERIALIZED (SELECT token FROM c0 WHERE len(token) = 1)",
    ]
    parts += _uni_vocab_ctes(0, "c0", v_multi)
    for it in range(1, n_iter + 1):
        parts += _uni_dp_ctes(it, f"p{it - 1}")
        parts += _uni_vocab_ctes(it, f"c{it}", v_multi)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT token AS token, cnt AS cnt,
           CAST(cnt AS DOUBLE) / CAST((SELECT T FROM t{n_iter}) AS DOUBLE)
             AS prob
    FROM vocab{n_iter}"""
    )


def unigram_encode_oracle_sql(
    n_iter: int = 2, v_multi: int = 64, rel: str = "documents"
) -> str:
    """Unrolled DuckDB equivalent of :func:`unigram_encode`: the full
    training chain, one MORE Viterbi DP pass segmenting every word
    under the FINAL vocab scores, then per-doc token accounting by
    joining the exploded corpus words to their segmentations (words
    beyond the UNI_MAX_WORD lattice cap drop on both sides)."""
    parts = [
        f"""uw AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {rel})
  WHERE len(word) >= 1 AND len(word) <= {UNI_MAX_WORD}
  GROUP BY word)""",
        f"""c0 AS MATERIALIZED (
  SELECT token, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
    SELECT unnest([substr(word, i, 1) for i in range(1, len(word) + 1)])
           AS token, cnt FROM uw
    UNION ALL
    SELECT unnest([substr(word, i, 2) for i in range(1, len(word))]),
           cnt FROM uw WHERE len(word) >= 2
    UNION ALL
    SELECT unnest([substr(word, i, 3) for i in range(1, len(word) - 1)]),
           cnt FROM uw WHERE len(word) >= 3
  ) GROUP BY token)""",
        "chars0 AS MATERIALIZED (SELECT token FROM c0 WHERE len(token) = 1)",
    ]
    parts += _uni_vocab_ctes(0, "c0", v_multi)
    for it in range(1, n_iter + 1):
        parts += _uni_dp_ctes(it, f"p{it - 1}")
        parts += _uni_vocab_ctes(it, f"c{it}", v_multi)
    final = n_iter + 1
    parts += _uni_dp_ctes(final, f"p{n_iter}")  # seg{final} = final vocab's DP
    parts.append(
        f"""dw AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM {rel})"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT dw.doc_id AS doc_id,
           CAST(sum(len(string_split(s.path, chr(31)))) AS BIGINT)
             AS n_tokens_uni,
           CAST(sum(len(dw.word)) AS BIGINT) AS n_tokens_char
    FROM dw JOIN seg{final} s USING (word)
    GROUP BY dw.doc_id"""
    )


# ---------------------------------------------------------------------------
# WordPiece tokenizer induction (Schuster & Nakajima 2012; the BERT
# tokenizer family) — the third mainstream family beside BPE and
# unigram-LM. Training is BPE-shaped (iterative pair merges over the
# word-frequency frame) but the merge OBJECTIVE is the likelihood gain
# score count(lr) / (count(l) * count(r)) instead of raw pair count:
# WordPiece prefers pairs whose parts are rare relative to their
# co-occurrence. ENCODING differs from BPE too: greedy longest-match-
# first (maximal munch) against the final vocabulary, not a merge
# replay. (The "##" continuation surface marking is presentation-layer
# and does not change segmentation; omitted here.)
#
# Exactness: the score is one IEEE division of exact bigint counts
# (cast each side to double first — at 100 TB the count product would
# overflow int64), argmax ordered (score DESC, l, r); the oracle
# replays training with identical expressions and the munch as an
# unrolled per-step longest-prefix CTE chain.
# ---------------------------------------------------------------------------

WP_MAX_WORD = 12  # munch words <= this; both engines apply the same cap


def _sym_counts(states: DataFrame) -> DataFrame:
    """Current symbol frequencies over the word states, weighted by
    word count: (sym, scnt). Bounded by the live vocabulary size."""
    return (
        states.select(F.explode(F.split("st", SEP)).alias("sym"), "cnt")
        .groupBy("sym")
        .agg(F.sum("cnt").alias("scnt"))
    )


def _wp_scored_pairs(states: DataFrame) -> DataFrame:
    """Adjacent pairs scored by the WordPiece objective. The symbol
    table is vocabulary-sized -> broadcast twice (left/right parts);
    the only shuffle is the pair count itself."""
    pairs = _pair_counts(states)
    syms = _sym_counts(states)
    return (
        pairs.join(
            F.broadcast(syms.select(F.col("sym").alias("l"), F.col("scnt").alias("_sl"))),
            "l",
        )
        .join(
            F.broadcast(syms.select(F.col("sym").alias("r"), F.col("scnt").alias("_sr"))),
            "r",
        )
        .withColumn(
            "score",
            F.col("wgt").cast("double")
            / (F.col("_sl").cast("double") * F.col("_sr").cast("double")),
        )
    )


def wordpiece_merges(
    docs: DataFrame, n_merges: int = 3, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``n_merges`` WordPiece merges; returns
    (merge_idx, left, right, weight, score). Deterministic: score
    desc, then lexicographic (l, r) tie-break. Same fixed-iteration
    declarative shape as :func:`bpe_merges` — one pair-count shuffle,
    two broadcast symbol-count joins, a TakeOrdered top-1, and a
    broadcast replace merge per round."""
    states = _initial_states(docs, text_col).localCheckpoint(eager=True)
    merges = []
    for i in range(1, n_merges + 1):
        top = (
            _wp_scored_pairs(states)
            .orderBy(F.desc("score"), "l", "r")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        merges.append(
            top.select(
                F.lit(i).alias("merge_idx"),
                F.col("l").alias("left"),
                F.col("r").alias("right"),
                F.col("wgt").cast("long").alias("weight"),
                F.col("score").alias("score"),
            )
        )
        if i < n_merges:
            states = states.crossJoin(F.broadcast(top.select("l", "r"))).select(
                "word",
                "cnt",
                F.replace(
                    F.col("st"),
                    F.concat(F.col("l"), F.lit(SEP), F.col("r")),
                    F.concat(F.col("l"), F.col("r")),
                ).alias("st"),
            ).localCheckpoint(eager=True)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _wp_munch(word: str, vocab: set, max_tok: int) -> int:
    """Greedy longest-match-first token count. Single characters are
    always in the vocab (alphabet coverage), so the munch always
    advances; returns the number of tokens."""
    n = len(word)
    i = 0
    toks = 0
    while i < n:
        for length in range(min(max_tok, n - i), 0, -1):
            if word[i : i + length] in vocab:
                i += length
                toks += 1
                break
        else:  # pragma: no cover — alphabet coverage makes this unreachable
            raise ValueError(f"unsegmentable word {word!r}")
    return toks


def wordpiece_encode(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train ``n_merges`` WordPiece merges and APPLY them by greedy
    longest-match-first against vocab = corpus alphabet + merge
    outputs, returning (id, n_tokens_wp, n_tokens_char). The vocab is
    bounded (|alphabet| + n_merges rows) and syncs driver-side exactly
    like the unigram-EM vocab (the Lloyd shape); the munch runs
    Arrow-batched over the DISTINCT-word frame and broadcast-joins back
    to the exploded corpus. Words longer than ``WP_MAX_WORD`` are
    excluded on both engines (the unigram UNI_MAX_WORD convention)."""
    from collections.abc import Iterator

    import pandas as pd

    states = _initial_states(docs, text_col).localCheckpoint(eager=True)
    vocab: set = set()
    for i in range(n_merges):
        top = (
            _wp_scored_pairs(states)
            .orderBy(F.desc("score"), "l", "r")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        row = top.select("l", "r").collect()[0]  # 1 row: the merge pick
        vocab.add(row.l + row.r)
        if i < n_merges - 1:
            states = states.crossJoin(F.broadcast(top.select("l", "r"))).select(
                "word",
                "cnt",
                F.replace(
                    F.col("st"),
                    F.concat(F.col("l"), F.lit(SEP), F.col("r")),
                    F.concat(F.col("l"), F.col("r")),
                ).alias("st"),
            ).localCheckpoint(eager=True)
    chars = (
        states.select(F.explode(F.split("st", SEP)).alias("s"))
        .select(F.explode(F.expr(
            "transform(sequence(1, length(s)), i -> substring(s, i, 1))"
        )).alias("c"))
        .distinct()
        .collect()
    )  # bounded: the corpus alphabet
    vocab |= {r.c for r in chars}
    max_tok = max(len(v) for v in vocab)

    def munch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "_wp": [
                        _wp_munch(str(w), vocab, max_tok) for w in pdf["word"]
                    ],
                    "_chars": [len(str(w)) for w in pdf["word"]],
                }
            )

    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") <= WP_MAX_WORD)
        .distinct()
    )
    per_word = words.mapInPandas(munch, "word string, _wp long, _chars long")
    doc_words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.length("word") <= WP_MAX_WORD)
    return (
        doc_words.join(F.broadcast(per_word), "word")
        .groupBy(id_col)
        .agg(
            F.sum("_wp").alias("n_tokens_wp"),
            F.sum("_chars").alias("n_tokens_char"),
        )
    )


def _wp_ctes(n_merges: int, rel: str, with_final_state: bool) -> list[str]:
    """Training CTE chain for the WordPiece oracle: w0 -> per round
    (p{i} pair counts, s{i} symbol counts, m{i} score-argmax pick,
    w{i} merged states). Identical expression trees to
    :func:`wordpiece_merges`."""
    parts = [
        f"""w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         array_to_string([substr(word, i, 1) for i in range(1, len(word) + 1)],
                         chr(31)) AS st
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {rel})
  GROUP BY word)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""p{i} AS (
  SELECT u.p.l AS l, u.p.r AS r, sum(cnt) AS wgt
  FROM (SELECT cnt, unnest([{{'l': s[i], 'r': s[i + 1]}}
                            for i in range(1, len(s))]) AS p
        FROM (SELECT cnt, string_split(st, chr(31)) AS s FROM w{i - 1})) u
  GROUP BY u.p.l, u.p.r)"""
        )
        parts.append(
            f"""s{i} AS (
  SELECT sym, sum(cnt) AS scnt
  FROM (SELECT unnest(string_split(st, chr(31))) AS sym, cnt FROM w{i - 1})
  GROUP BY sym)"""
        )
        parts.append(
            f"""m{i} AS (
  SELECT p.l AS l, p.r AS r, p.wgt AS wgt,
         CAST(p.wgt AS DOUBLE)
           / (CAST(sl.scnt AS DOUBLE) * CAST(sr.scnt AS DOUBLE)) AS score
  FROM p{i} p JOIN s{i} sl ON sl.sym = p.l JOIN s{i} sr ON sr.sym = p.r
  ORDER BY score DESC, l, r LIMIT 1)"""
        )
        if i < n_merges or with_final_state:
            parts.append(
                f"""w{i} AS (
  SELECT word, cnt,
         replace(st, (SELECT l || chr(31) || r FROM m{i}),
                     (SELECT l || r FROM m{i})) AS st
  FROM w{i - 1})"""
            )
    return parts


def _wp_materialize(sql: str) -> str:
    """Mark every CTE MATERIALIZED: the munch chain references each
    step's frame once per successor, but DuckDB's default inlining
    re-derives the whole training prefix per step — 28 s vs 0.09 s at
    sf0.01 (the unigram oracle's existing convention)."""
    return sql.replace(" AS (", " AS MATERIALIZED (")


def wordpiece_oracle_sql(n_merges: int = 3, rel: str = "documents") -> str:
    """Unrolled DuckDB equivalent of :func:`wordpiece_merges`."""
    parts = _wp_ctes(n_merges, rel, with_final_state=False)
    selects = " UNION ALL ".join(
        f"SELECT {i} AS merge_idx, l AS left, r AS right, "
        f"CAST(wgt AS BIGINT) AS weight, score AS score FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return _wp_materialize("WITH " + ",\n".join(parts)) + "\n" + selects


def wordpiece_encode_oracle_sql(
    n_merges: int = 3, rel: str = "documents"
) -> str:
    """Unrolled DuckDB equivalent of :func:`wordpiece_encode`: the
    training chain, vocab = corpus alphabet UNION merge outputs, then
    the greedy longest-match munch as one CTE pair per step (token
    pick, remainder advance) — ``WP_MAX_WORD`` steps cover every
    capped word since each step consumes >= 1 char."""
    parts = _wp_ctes(n_merges, rel, with_final_state=False)
    merge_toks = " UNION ".join(
        f"SELECT l || r AS token FROM m{i}" for i in range(1, n_merges + 1)
    )
    parts.append(
        f"""vocab AS (
  SELECT DISTINCT unnest([substr(word, i, 1)
                          for i in range(1, len(word) + 1)]) AS token
  FROM w0
  UNION
  {merge_toks})"""
    )
    parts.append(
        "vl AS (SELECT list(token ORDER BY len(token) DESC, token) AS v"
        " FROM vocab)"
    )
    parts.append(
        f"""e0 AS (
  SELECT word, word AS rem, CAST(0 AS BIGINT) AS ntok
  FROM (SELECT DISTINCT word
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {rel})
        WHERE len(word) <= {WP_MAX_WORD}))"""
    )
    for k in range(1, WP_MAX_WORD + 1):
        parts.append(
            f"""t{k} AS (
  SELECT word, rem, ntok,
         CASE WHEN rem = '' THEN NULL
              ELSE list_filter(v, x -> substr(rem, 1, len(x)) = x)[1] END AS tk
  FROM e{k - 1}, vl)"""
        )
        parts.append(
            f"""e{k} AS (
  SELECT word,
         CASE WHEN tk IS NULL THEN rem ELSE substr(rem, len(tk) + 1) END AS rem,
         ntok + CASE WHEN tk IS NULL THEN 0 ELSE 1 END AS ntok
  FROM t{k})"""
        )
    parts.append(
        f"""dw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM {rel})"""
    )
    return (
        _wp_materialize("WITH " + ",\n".join(parts))
        + f"""
    SELECT dw.doc_id AS doc_id,
           CAST(sum(e.ntok) AS BIGINT) AS n_tokens_wp,
           CAST(sum(len(dw.word)) AS BIGINT) AS n_tokens_char
    FROM dw JOIN e{WP_MAX_WORD} e USING (word)
    WHERE len(dw.word) <= {WP_MAX_WORD}
    GROUP BY dw.doc_id"""
    )
