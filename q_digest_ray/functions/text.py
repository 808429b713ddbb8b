"""Text-analysis functions: language ID (stopword/char heuristic), quality
scoring, token counting, and winnowing document fingerprints.

All batch-vectorized (pyarrow.compute / numpy); the language profiles are
tiny built-in stopword lists (public common-word lists), compiled once per
actor via TextAnalyzer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from q_digest_ray.functions.hashing import hash64, splitmix64

# minimal public stopword profiles (top common words per language)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "que", "pour", "sur"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "con", "por", "del"],
    "it": ["il", "la", "che", "di", "non", "una", "per", "sono", "con", "del"],
    "pt": ["o", "a", "os", "as", "um", "uma", "para", "com", "não", "por"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "met", "voor", "zijn"],
    "ru": ["и", "в", "не", "на", "что", "с", "это", "как", "по", "его"],
    "ja": ["の", "に", "は", "を", "た", "が", "で", "て", "と", "し"],
    "zh": ["的", "了", "在", "是", "我", "有", "和", "就", "不", "人"],
}


def token_count(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Whitespace token count (vectorized regex)."""
    return (
        pc.count_substring_regex(texts, r"\S+").to_numpy(zero_copy_only=False).astype(np.int64)
    )


def bpe_ish_token_count(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """BPE-ish token estimate: GPT-2-style pretokenizer word/number/punct
    pieces (a public regex pattern family), as a cheap proxy for tokenizer
    cost accounting."""
    pattern = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]|\s+"
    return (
        pc.count_substring_regex(texts, pattern).to_numpy(zero_copy_only=False).astype(np.int64)
    )


def detect_language(texts: pa.Array | pa.ChunkedArray) -> list[str]:
    """Stopword-vote language ID; 'und' (undetermined) when no profile hits."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(texts)
    scores = np.zeros((len(texts), len(LANG_PROFILES)), dtype=np.int64)
    for li, (lang, words) in enumerate(LANG_PROFILES.items()):
        for w in words:
            pat = rf"(^|\s){escape_regex(w)}(\s|$)" if lang not in ("ja", "zh") else escape_regex(w)
            scores[:, li] += (
                pc.count_substring_regex(low, pat).to_numpy(zero_copy_only=False)
            )
    langs = list(LANG_PROFILES)
    best = scores.argmax(axis=1)
    hit = scores.max(axis=1) > 0
    return [langs[b] if h else "und" for b, h in zip(best, hit)]


def escape_regex(w: str) -> str:
    import re

    return re.escape(w)


def quality_features(batch_texts: pa.Array | pa.ChunkedArray) -> pd.DataFrame:
    """Per-doc quality signals: chars, tokens, mean word length, alpha
    ratio, punct-per-kchar, stopword ratio (en), uppercase ratio."""
    if isinstance(batch_texts, pa.ChunkedArray):
        batch_texts = batch_texts.combine_chunks()
    chars = pc.utf8_length(batch_texts).to_numpy(zero_copy_only=False).astype(np.int64)
    toks = token_count(batch_texts)
    alpha = pc.count_substring_regex(batch_texts, r"[A-Za-z]").to_numpy(zero_copy_only=False)
    upper = pc.count_substring_regex(batch_texts, r"[A-Z]").to_numpy(zero_copy_only=False)
    punct = pc.count_substring_regex(batch_texts, r"[.!?]").to_numpy(zero_copy_only=False)
    stop = pc.count_substring_regex(
        pc.utf8_lower(batch_texts), r"(^|\s)(the|of|and|to|in|is)(\s|$)"
    ).to_numpy(zero_copy_only=False)
    safe_chars = np.maximum(chars, 1)
    safe_toks = np.maximum(toks, 1)
    return pd.DataFrame(
        {
            "n_chars": chars,
            "n_tokens": toks,
            "mean_word_len": (chars - (toks - 1).clip(0)) / safe_toks,
            "alpha_ratio": alpha / safe_chars,
            "upper_ratio": upper / safe_chars,
            "punct_per_kchar": 1000.0 * punct / safe_chars,
            "stopword_ratio": stop / safe_toks,
        }
    )


def quality_score(feats: pd.DataFrame) -> np.ndarray:
    """Composite [0,1] quality score from heuristics (deterministic)."""
    s = np.ones(len(feats))
    s *= np.clip(feats["n_tokens"] / 20.0, 0, 1)  # too-short penalty
    s *= np.clip(2.0 - feats["n_tokens"] / 50_000.0, 0, 1).clip(0, 1)
    s *= np.clip(feats["alpha_ratio"] * 1.25, 0, 1)
    s *= 1.0 - np.clip(feats["upper_ratio"] - 0.3, 0, 0.7)
    return np.clip(s.to_numpy(), 0.0, 1.0)


def winnow_fingerprints(
    texts: pa.Array | pa.ChunkedArray, k: int = 5, window: int = 4
) -> list[np.ndarray]:
    """Winnowing (Schleimer et al. 2003): k-gram rolling hashes, keep the
    min hash of each sliding window → a compact, position-robust
    fingerprint set per document."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out: list[np.ndarray] = []
    toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    flat_h = hash64(toks.flatten())
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    for d in range(len(texts)):
        h = flat_h[offs[d] : offs[d + 1]]
        if len(h) < k:
            out.append(np.unique(splitmix64(h)) if len(h) else np.empty(0, np.uint64))
            continue
        # k-gram rolling hashes via stride trick
        m = np.lib.stride_tricks.sliding_window_view(h, k)
        acc = np.zeros(len(m), dtype=np.uint64)
        for j in range(k):
            acc = splitmix64(acc * np.uint64(0x100000001B3) + m[:, j])
        if len(acc) <= window:
            out.append(np.unique(acc))
        else:
            w = np.lib.stride_tricks.sliding_window_view(acc, window)
            out.append(np.unique(w.min(axis=1)))
    return out
