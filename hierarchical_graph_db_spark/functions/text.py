"""Text-analysis expressions (north-star LLM-pipeline ops, SURVEY.md §2.11).

All pure Catalyst expressions over the ``documents`` table: tokenization,
quality scoring, stopword-based language ID, token statistics. Each has an
ANSI-SQL twin in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal English stopword list used by the heuristic language scorer and the
#: quality stopword-ratio. Deliberately tiny + frozen: it is part of the
#: operator's contract (the oracle SQL embeds the same list).
EN_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank text)."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(trimmed, r"\s+"))


#: GPT-style pre-tokenizer shape: word runs, digit runs, or single
#: non-space symbols. The LLM-token estimate divides alpha runs by ~4 chars
#: per BPE piece.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(text: Column | str) -> Column:
    """Subword-ish token pieces via the pre-tokenizer regex → array<string>.

    Not a real BPE vocabulary (none ships here) — the contract is the
    *estimator* pipelines use for budget accounting: piece count correlates
    with LLM token count far better than whitespace words do.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def llm_token_estimate(text: Column | str) -> Column:
    """Estimated LLM tokens: one per digit/symbol piece, ceil(len/4) per
    alpha run (the ~4-chars-per-token rule of thumb)."""
    pieces = bpe_ish_tokens(text)
    per_piece = F.transform(
        pieces,
        lambda p: F.when(
            p.rlike("^[A-Za-z]+$"), F.ceil(F.length(p) / 4).cast("long")
        ).otherwise(F.lit(1).cast("long")),
    )
    return F.coalesce(
        F.aggregate(per_piece, F.lit(0).cast("long"), lambda acc, x: acc + x),
        F.lit(0).cast("long"),
    )


def stopword_hits(toks: Column) -> Column:
    """Count of tokens that are (lowercased) English stopwords."""
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(stoplist, F.lower(t))))


def language_id(toks: Column) -> Column:
    """Heuristic language ID: stopword-density thresholding.

    Reference analog: the declared-but-unimplemented NER/analysis agents
    (README.md:86-88) — this is the analysis-stage shape. A real deployment
    swaps the scorer for per-language stopword tables or fastText in a pandas
    UDF; the operator contract (text → lang code) is identical.
    """
    n = F.size(toks)
    density = stopword_hits(toks) / F.when(n == 0, F.lit(1)).otherwise(n)
    return F.when(n == 0, F.lit("und")) \
            .when(density >= 0.05, F.lit("en")) \
            .otherwise(F.lit("other"))


def quality_metrics(text: Column | str) -> dict[str, Column]:
    """Quality-scoring feature columns (length / punctuation / stopword ratios).

    Returns named columns; callers select the ones they need. All ratios are
    double in [0,1]; ``n_tokens`` is int.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    nonzero_chars = F.when(n_chars == 0, F.lit(1)).otherwise(n_chars)
    nonzero_tokens = F.when(n_tokens == 0, F.lit(1)).otherwise(n_tokens)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "alpha_ratio": (n_alpha / nonzero_chars).cast("double"),
        "digit_ratio": (n_digit / nonzero_chars).cast("double"),
        "punct_ratio": (n_punct / nonzero_chars).cast("double"),
        "stopword_ratio": (stopword_hits(toks) / nonzero_tokens).cast("double"),
        "mean_token_len": (F.length(F.regexp_replace(c, r"\s+", "")) / nonzero_tokens)
        .cast("double"),
    }


def quality_keep(text: Column | str) -> Column:
    """The C4-style keep rule (ONE definition — `quality_filter_decisions`
    and the materialized `curate_corpus` pipeline both import it, so a
    threshold change can never desync the registry proof from the
    pipeline): non-blank, 8..100000 tokens, alpha ratio >= 0.6, stopword
    ratio >= 0.01."""
    c = F.col(text) if isinstance(text, str) else text
    m = quality_metrics(c)
    blank = F.length(F.trim(c)) == 0
    return (~blank & (m["n_tokens"] >= 8) & (m["n_tokens"] <= 100000)
            & (m["alpha_ratio"] >= 0.6) & (m["stopword_ratio"] >= 0.01))



def nfc_normalize_docs(docs, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Unicode NFC normalization — (id, text_nfc) via one Arrow
    ``mapInPandas`` stage. Catalyst has no normalization expression, so
    this is a real Python seam (same class as the RFC822 parser):
    ``unicodedata.normalize`` implements Unicode canonical composition,
    the same standard algorithm behind DuckDB's utf8proc-backed
    ``nfc_normalize``, which is what lets the oracle compare the
    normalized strings themselves. Multilingual curation needs this
    BEFORE hashing/shingling: visually-identical composed/decomposed
    sequences otherwise fingerprint differently and defeat dedup."""
    import unicodedata

    def norm(batches):
        for pdf in batches:
            out = pdf[[id_col]].copy()
            out["text_nfc"] = [
                unicodedata.normalize("NFC", t) if t is not None else None
                for t in pdf[text_col]
            ]
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        norm, f"{id_col} bigint, text_nfc string")
