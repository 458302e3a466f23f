"""BPE tokenizer training on a corpus (training-data extension).

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) learns a
subword vocabulary by repeatedly merging the most frequent adjacent
symbol pair. The classic trainer iterates over a WORD-FREQUENCY
table, not the corpus — that is what makes it Spark-friendly:

- one corpus scan builds (word, count)            — corpus-sized, once
- every merge round touches only the word table   — vocabulary-sized
- the argmax pair is a 1-row collect per round    — the only driver
  traffic, O(n_merges) tiny actions total

At 100 TB the word table itself is modest (heavy-tailed Zipf: even
web-scale corpora hold < 10⁹ distinct words; hash-sample the corpus
scan if not), so a 32k-merge training run is 32k vocabulary-sized
jobs — embarrassingly wide, never corpus-sized after the first scan.

The merge application is a pure ``aggregate`` fold (greedy
single-pass left-to-right, the standard semantics) — no UDF, JVM-side
throughout. :func:`bpe_segment` applies a learned merge list to a
word column the same way; for production-sized merge lists (32k) the
encode side belongs in an Arrow-batched pandas UDF wrapping a
compiled tokenizer — the expression form here is the trainer's exact
reference implementation, practical to a few hundred merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# end-of-word marker, kept out of the corpus alphabet by the
# dedup-family tokenizer (lowercase letters only)
EOW = "</w>"


def _q(sym: str) -> str:
    """Escape a symbol for embedding in a SQL string literal."""
    return sym.replace("\\", "\\\\").replace("'", "''")


def word_table(
    toked: DataFrame, tokens_col: str = "t"
) -> DataFrame:
    """(word, cnt) corpus word frequencies with each word pre-split
    into its initial symbol sequence (characters + ``</w>``). The one
    corpus-sized scan of BPE training; additive across deltas like
    every count table in the engine."""
    words = toked.select(
        F.explode(F.col(tokens_col)).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    sym = F.expr(
        "concat(transform(sequence(1, length(word)), "
        f"i -> substring(word, i, 1)), array('{EOW}'))"
    )
    return counts.select("word", "cnt", sym.alias("sym"))


def _merge_expr(col: str, a: str, b: str) -> str:
    """Greedy single-pass left-to-right application of merge (a, b)
    to a symbol array: fold symbols into an output array, gluing the
    current symbol onto the output's tail when (tail, current) is
    exactly the pair. A merged token differs from ``a`` (it is
    ``a||b``), so merges cannot cascade within one rule — the
    standard BPE pass."""
    qa, qb = _q(a), _q(b)
    qab = _q(a + b)
    return (
        f"aggregate({col}, CAST(array() AS array<string>), "
        f"(acc, x) -> CASE WHEN size(acc) > 0 "
        f"AND element_at(acc, -1) = '{qa}' AND x = '{qb}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{qab}')) "
        f"ELSE concat(acc, array(x)) END)"
    )


def bpe_train(
    words: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a :func:`word_table` frame.
    Returns the ordered merge list. Deterministic: the winning pair
    maximizes summed count with (a, b) lexicographic tie-break, and
    every count is an exact bigint.

    Each round: adjacent-pair explode over the word table → pair-sum
    groupBy → 1-row argmax collect → fold-apply the merge to every
    word's symbols. ``localCheckpoint`` every ``checkpoint_every``
    rounds cuts the growing expression lineage (the table stays
    vocabulary-sized). Training stops early if no pair occurs twice."""
    merges: list[tuple[str, str]] = []
    cur = words.select("cnt", "sym").localCheckpoint()
    pair = F.expr(
        "CASE WHEN size(sym) < 2 THEN array() ELSE "
        "transform(sequence(1, size(sym) - 1), "
        "i -> struct(element_at(sym, i) AS a, element_at(sym, i + 1) AS b)) "
        "END"
    )
    for i in range(n_merges):
        best = (
            cur.select("cnt", F.explode(pair).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < 2:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        cur = cur.withColumn("sym", F.expr(_merge_expr("sym", a, b)))
        if (i + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "pieces",
    checkpoint_every: int = 16,
) -> DataFrame:
    """Apply a learned merge list, in order, to a word column —
    returns the input plus ``out_col`` (array of subword pieces, last
    one carrying the ``</w>`` marker). The exact trainer semantics
    (greedy single-pass per rule); practical to a few hundred merges
    as stacked fold expressions — swap in a compiled tokenizer behind
    an Arrow-batched UDF for production merge lists."""
    sym = F.expr(
        f"concat(transform(sequence(1, length({word_col})), "
        f"i -> substring({word_col}, i, 1)), array('{EOW}'))"
    )
    out = df.withColumn(out_col, sym)
    for i, (a, b) in enumerate(merges):
        out = out.withColumn(out_col, F.expr(_merge_expr(out_col, a, b)))
        if (i + 1) % checkpoint_every == 0:
            out = out.localCheckpoint()
    return out
