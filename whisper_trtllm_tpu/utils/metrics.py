"""WER metric + text normalization.

Analog of the reference's WER harness (reference:
examples/whisper/cal_wer.py:279-287 — OpenAI EnglishTextNormalizer + jiwer).
Neither package is guaranteed here, so WER is implemented directly
(word-level Levenshtein) and the normalizer falls back to a basic
lowercase/punctuation-strip when openai-whisper isn't importable.
"""

from __future__ import annotations

import re
import string
from typing import List, Sequence


def word_error_rate(hypotheses: Sequence[str], references: Sequence[str]) -> float:
    """Corpus-level WER: total edit distance / total reference words."""
    total_errors = 0
    total_words = 0
    for hyp, ref in zip(hypotheses, references):
        h, r = hyp.split(), ref.split()
        total_errors += _edit_distance(h, r)
        total_words += len(r)
    return total_errors / max(total_words, 1)


def _edit_distance(a: List[str], b: List[str]) -> int:
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, wb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (wa != wb),
            )
        prev = cur
    return prev[-1]


def get_text_normalizer():
    """OpenAI EnglishTextNormalizer if available (exact leaderboard metric),
    else a basic fallback."""
    try:
        from whisper.normalizers import EnglishTextNormalizer  # type: ignore

        return EnglishTextNormalizer()
    except Exception:
        return basic_normalize


_PUNCT = re.compile(f"[{re.escape(string.punctuation)}]")


def basic_normalize(text: str) -> str:
    text = text.lower()
    text = _PUNCT.sub(" ", text)
    return " ".join(text.split())
