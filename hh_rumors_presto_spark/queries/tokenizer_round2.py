"""Unigram-LM (SentencePiece-style) Viterbi segmentation.

``text_unigram_viterbi`` — segment every corpus word into the
minimum-cost sequence of vocabulary pieces (max-probability under a
unigram LM with integer micro-nat piece costs). The tokenizer-training
counterpart to the BPE suite (text_bpe_merges / text_bpe_encode):
where BPE applies greedy merges, the unigram model scores ALL
segmentations and Viterbi picks the best — this key pins that DP
exactly cross-engine.

The DP state rolls: best(i) depends only on best(i-1..i-4) (pieces are
at most 4 chars), so the oracle expresses it as a RECURSIVE CTE
carrying four state columns, and the Spark side runs the same
recurrence in an Arrow-batched pandas UDF (a per-word sequential
recursion is the documented case where built-in operators genuinely
cannot express the semantics — same posture as ts_holt_winters).
(cost, n_pieces) are packed into one BIGINT (cost*64 + n) so the min
is a single integer comparison with a deterministic fewer-pieces
tiebreak — no float scores, no tie ambiguity.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

_VIT_MAX_LEN = 16
_VIT_MAX_PIECE = 4

# integer micro-nat piece costs: every a-z letter is a fallback piece
# (any word is segmentable), multi-char pieces are cheaper per char so
# the DP genuinely prefers them where they apply
_VIT_VOCAB: dict[str, int] = {
    **{c: 900_000 for c in "abcdefghijklmnopqrstuvwxyz"},
    # 2-char pieces
    "th": 500_000, "he": 520_000, "in": 480_000, "er": 490_000,
    "an": 510_000, "re": 530_000, "or": 540_000, "st": 470_000,
    "ha": 550_000, "sh": 560_000, "ro": 570_000, "ba": 580_000,
    "sc": 590_000, "ta": 545_000, "da": 555_000, "li": 565_000,
    "ne": 575_000, "ge": 585_000, "up": 595_000, "ry": 605_000,
    "rk": 615_000, "ll": 525_000, "ow": 535_000,
    # 3-char pieces
    "ing": 700_000, "ion": 710_000, "the": 620_000, "row": 650_000,
    "key": 660_000, "agg": 670_000, "big": 680_000, "tch": 690_000,
    "ter": 640_000, "tor": 655_000, "umn": 665_000, "eam": 675_000,
    "dow": 685_000, "par": 695_000, "que": 705_000, "gro": 715_000,
    "vec": 725_000, "col": 735_000, "cus": 745_000, "tom": 755_000,
    "fil": 765_000, "mer": 775_000, "sma": 785_000, "ble": 795_000,
    "lue": 805_000, "spa": 815_000, "win": 825_000, "str": 835_000,
    "fa": 625_000, "so": 635_000,
    # 4-char pieces (whole short stems)
    "join": 800_000, "hash": 810_000, "scan": 820_000, "sort": 830_000,
    "data": 840_000, "line": 850_000, "part": 860_000, "fast": 870_000,
    "slow": 880_000, "word": 890_000,
}


def _vocab_case_sql(k: int, expr: str) -> str:
    """CASE lookup of the length-k piece starting at `expr` (1-based)."""
    whens = " ".join(
        f"WHEN '{p}' THEN {c}"
        for p, c in sorted(_VIT_VOCAB.items())
        if len(p) == k
    )
    return f"CASE {expr} {whens} END"


def _vit_oracle() -> str:
    # candidate via piece of length k ending at position pos+1:
    # piece = substring(w, pos - k + 2, k), previous state = b{k}
    cands = []
    for k in range(1, _VIT_MAX_PIECE + 1):
        c = _vocab_case_sql(k, f"substring(w, pos - {k} + 2, {k})")
        cands.append(
            f"CASE WHEN b{k} IS NOT NULL AND ({c}) IS NOT NULL"
            f" THEN (b{k} // 64 + ({c})) * 64 + b{k} % 64 + 1 END"
        )
    step = "least(" + ", ".join(cands) + ")"
    return f"""
    WITH RECURSIVE words AS (
        SELECT DISTINCT w FROM (
            SELECT lower(unnest(string_split(text, ' '))) AS w
            FROM documents
        )
        WHERE regexp_matches(w, '^[a-z]{{1,{_VIT_MAX_LEN}}}$')
    ),
    seg AS (
        SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS b1,
               CAST(NULL AS BIGINT) AS b2, CAST(NULL AS BIGINT) AS b3,
               CAST(NULL AS BIGINT) AS b4
        FROM words
        UNION ALL
        SELECT w, pos + 1, {step}, b1, b2, b3
        FROM seg WHERE pos < len(w)
    )
    SELECT w AS word,
           CAST(b1 // 64 AS BIGINT) AS cost_micro,
           CAST(b1 % 64 AS BIGINT) AS n_pieces
    FROM seg WHERE pos = len(w)
    """


def _viterbi_enc_py(word: str) -> int:
    """The same rolling DP in plain Python (executed Arrow-batched)."""
    best: list[int | None] = [0] + [None] * len(word)
    for i in range(1, len(word) + 1):
        acc = None
        for k in range(1, min(_VIT_MAX_PIECE, i) + 1):
            prev = best[i - k]
            cost = _VIT_VOCAB.get(word[i - k : i])
            if prev is None or cost is None:
                continue
            cand = (prev // 64 + cost) * 64 + prev % 64 + 1
            if acc is None or cand < acc:
                acc = cand
        best[i] = acc
    return best[len(word)]


@query("text_unigram_viterbi", oracle=_vit_oracle())
def text_unigram_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM Viterbi segmentation of every corpus word: min total
    piece cost over all segmentations (integer micro-nats; pieces up to
    4 chars; single letters guarantee coverage), with (cost, n_pieces)
    packed into one BIGINT so min is exact and ties resolve to fewer
    pieces. Oracle = recursive CTE carrying the last four DP states;
    Spark = the identical recurrence in an Arrow-batched pandas UDF
    over the DISTINCT word set. Brute-force-tested against full
    segmentation enumeration.

    Scale: the UDF runs per DISTINCT word (corpus vocabulary, not
    corpus tokens — the standard tokenizer-training reduction), and the
    explode+distinct before it is one hash agg. At 100 TB the word set
    still fits the vocabulary regime (~millions), Arrow batches keep
    the Python loop amortized, and the result broadcasts back for
    full-corpus tokenization (cf. text_bpe_encode)."""
    vocab = dict(_VIT_VOCAB)
    max_piece = _VIT_MAX_PIECE

    @F.pandas_udf("long")
    def viterbi_enc(words: pd.Series) -> pd.Series:
        out = []
        for word in words:
            best = [0] + [None] * len(word)
            for i in range(1, len(word) + 1):
                acc = None
                for k in range(1, min(max_piece, i) + 1):
                    prev = best[i - k]
                    cost = vocab.get(word[i - k : i])
                    if prev is None or cost is None:
                        continue
                    cand = (prev // 64 + cost) * 64 + prev % 64 + 1
                    if acc is None or cand < acc:
                        acc = cand
                best[i] = acc
            out.append(best[len(word)])
        return pd.Series(out, dtype="int64")

    docs = io.load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(F.col("w").rlike(f"^[a-z]{{1,{_VIT_MAX_LEN}}}$"))
        .distinct()
    )
    return words.select(
        F.col("w").alias("word"),
        viterbi_enc(F.col("w")).alias("enc"),
    ).select(
        "word",
        F.expr("enc DIV 64").alias("cost_micro"),
        F.expr("enc % 64").alias("n_pieces"),
    )
