"""Text-analysis operators for training-data pipelines — pure Column
expressions (JVM-side, DuckDB-oracle-matchable semantics).

These are the "large-scale training-data pipeline" operators layered on
the dedup engine: token counting, quality scoring, language-ID heuristic,
and document fingerprinting. Every expression is chosen so an ANSI-SQL
twin produces bit-identical values (integers and exact IEEE divisions
only — no platform-dependent float paths).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker-word lists for the n-gram/stopword heuristic.
# (Public-knowledge stopword sets; the corpus generator's langs.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "de": ["der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
}

_PUNCT_CLASS = r"[.,!?;:]"
FINGERPRINT_MOD = 1_000_000_007


def _tokens(text: Column) -> Column:
    toks = F.split(text, " ")
    return F.filter(toks, lambda x: x != F.lit(""))


def token_count_col(text: Column) -> Column:
    """Whitespace token count (single-space split, empty tokens dropped —
    identical to ``len(list_filter(string_split(text,' '), x -> x<>''))``
    in DuckDB)."""
    return F.size(_tokens(text))


def punct_count_col(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, _PUNCT_CLASS, ""))


def stopword_count_col(text: Column, lang: str = "en") -> Column:
    markers = LANG_MARKERS[lang]
    toks = _tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features: lengths + punctuation/stopword ratios.

    Ratios are exact IEEE divisions of integers -> reproducible in any
    engine. ``quality_score`` is a simple monotone combination used for
    corpus filtering (docs with reasonable length and punctuation rank
    higher)."""
    # NULL text ≡ empty text (both engines): F.size(split(NULL)) is -1 in
    # Spark but NULL in DuckDB — coalesce first so the twins agree
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = token_count_col(text)
    n_chars = F.length(text)
    n_punct = punct_count_col(text)
    n_stop = stopword_count_col(text)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0))
    # EXACT mean: integer sum of token lengths / token count. The old
    # closed form (n_chars - (n_tok - 1)) / n_tok assumed exactly one
    # separator between tokens, so leading/trailing/repeated spaces
    # inflated the mean ('a  b' -> 1.5 instead of 1.0) even though the
    # tokenizer filters the empty tokens out (round-5 review). One
    # integer fold + one IEEE division — still oracle-matchable.
    tok_chars = F.aggregate(
        _tokens(text), F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_tok_len = F.when(
        n_tok > 0,
        tok_chars.cast("double") / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok_len.alias("mean_token_len"),
    )


def lang_id_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word language-ID heuristic: per-language hit ratio + argmax.

    (doc_id, en_hits, es_hits, de_hits, fr_hits, pred_lang) — ties broken
    by language-name order via a deterministic greatest-struct trick.
    """
    toks = _tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    n_tok = F.size(toks)

    # NB: the lambda must be unary — F.filter passes (element, index) to
    # two-parameter callables, so a `m=markers` default arg would silently
    # bind the array index instead of the marker list.
    def _hits(markers: list[str]):
        return F.size(F.filter(toks, lambda t: t.isin(markers)))

    cols = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    # argmax with deterministic tie-break: highest hits, then earliest in
    # the fixed language order
    order = list(LANG_MARKERS)
    pred = F.greatest(
        *[
            F.struct(
                cols[lang].alias("hits"),
                F.lit(len(order) - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(order)
        ]
    )["lang"]
    return df.select(
        F.col(id_col),
        *[cols[lang].alias(f"{lang}_hits") for lang in order],
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, pred).otherwise(F.lit("unknown")).alias("pred_lang"),
    )


def fingerprint_col(text: Column) -> Column:
    """Order-sensitive document fingerprint (rolling-hash style):

        fp = sum_i (i+1) * (ascii(first_char(tok_i)) + length(tok_i))  mod P

    Pure integer math -> identical in any SQL engine; order-sensitive so
    permuted documents get different fingerprints (unlike the shingle
    *set* signatures)."""
    toks = _tokens(text)
    contrib = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.size(toks)),
        lambda t, i: i.cast("long") * (F.ascii(F.substring(t, 1, 1)).cast("long") + F.length(t).cast("long")),
    )
    total = F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: acc + x)
    # sequence(1, 0) would run backwards — guard the empty-token case
    return F.when(
        F.size(toks) > 0, F.pmod(total, F.lit(FINGERPRINT_MOD).cast("long"))
    ).otherwise(F.lit(0).cast("long"))


def doc_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    text = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(F.col(id_col), fingerprint_col(text).alias("fingerprint"))
