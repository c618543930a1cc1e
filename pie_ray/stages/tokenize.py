"""A6 — frozen sentence/word tokenizer with character offsets (TOKENIZER SPEC v1).

Offsets index into T1.text (the frozen stripper output) and must survive
round-trips: T2.begin/end slice T1.text back to the exact mention surface.

Spec v1:
- Sentence boundaries: every newline; and every run of ``[.!?]`` followed by
  whitespace, EXCEPT when the period terminates a single-uppercase-letter
  initial ("J.", "Q.") — i.e. the char before '.' is an uppercase letter
  whose preceding char is not a letter.
- Tokens within a sentence: maximal runs of ASCII letters, maximal runs of
  digits, or a single other non-space char. ("J." -> ["J", "."];
  "Smith, John" -> ["Smith", ",", "John"].)
"""

from __future__ import annotations

import re

TOKENIZER_SPEC_VERSION = 1

_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
_SENT_PUNCT_RE = re.compile(r"[.!?]+[ \t]+")


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """Character spans [begin, end) of sentences in `text` (may be empty)."""
    spans: list[tuple[int, int]] = []
    for line_begin, line in _iter_lines(text):
        start = 0
        for m in _SENT_PUNCT_RE.finditer(line):
            p = m.start()  # position of first punct char in the run
            if line[p] == "." and _is_initial(line, p):
                continue
            end = m.end()
            if line[start:end].strip():
                spans.append((line_begin + start, line_begin + end))
            start = end
        if line[start:].strip():
            spans.append((line_begin + start, line_begin + len(line)))
    return spans


def _iter_lines(text: str):
    begin = 0
    for line in text.split("\n"):
        yield begin, line
        begin += len(line) + 1


def _is_initial(line: str, dot_pos: int) -> bool:
    if dot_pos == 0 or not line[dot_pos - 1].isupper():
        return False
    if dot_pos == 1:
        return True
    return not line[dot_pos - 2].isalpha()


def tokenize_sentence(text: str, begin: int, end: int) -> list[tuple[str, int, int]]:
    """Tokens of text[begin:end] as (token, abs_begin, abs_end).

    ``finditer(text, begin, end)`` already yields absolute positions."""
    return [
        (m.group(0), m.start(), m.end())
        for m in _TOKEN_RE.finditer(text, begin, end)
    ]


def doc_tokens(text: str) -> list[list[tuple[str, int, int]]]:
    """Per-sentence token lists with absolute char offsets."""
    return [tokenize_sentence(text, b, e) for b, e in sentence_spans(text)]
