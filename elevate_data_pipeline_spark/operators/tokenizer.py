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
