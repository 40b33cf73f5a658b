"""Classic Metaphone (Lawrence Philips, 1990) as a regex rule cascade.

The reference uses the Ruby `text` gem's Metaphone for homophone
detection in tag significance (tags.rb:298-302).  This is a fresh
implementation of the same published algorithm: lowercase the word,
apply the ordered transformation rules, uppercase the survivors.
Multi-word strings are split on non-word characters and encoded
per-word joined by single spaces, mirroring the gem's behavior on
phrases; words with no ASCII letters (e.g. Cyrillic after
normalization) encode to '' so the caller's non-empty guard skips them.
"""

from __future__ import annotations

import re

# Ordered transformation rules of the standard Metaphone algorithm.
_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"([bcdfhjklmnpqrstvwxyz])\1+"), r"\1"),  # collapse doubles (not g)
    (re.compile(r"^ae"), "E"),
    (re.compile(r"^[gkp]n"), "N"),
    (re.compile(r"^wr"), "R"),
    (re.compile(r"^x"), "S"),
    (re.compile(r"^wh"), "W"),
    (re.compile(r"mb$"), "M"),
    (re.compile(r"(?!^)sch"), "SK"),
    (re.compile(r"th"), "0"),
    (re.compile(r"t?ch|sh"), "X"),
    (re.compile(r"c(?=ia)"), "X"),
    (re.compile(r"[st](?=i[ao])"), "X"),
    (re.compile(r"s?c(?=[iey])"), "S"),
    (re.compile(r"(ck|q)"), "K"),
    (re.compile(r"dg(?=[iey])"), "J"),
    (re.compile(r"d"), "T"),
    (re.compile(r"g(?=h[^aeiou])"), ""),
    (re.compile(r"gn(ed)?"), "N"),
    (re.compile(r"([^g]|^)g(?=[iey])"), r"\1J"),
    (re.compile(r"g+"), "K"),
    (re.compile(r"ph"), "F"),
    (re.compile(r"([aeiou])h(?=\b|[^aeiou])"), r"\1"),
    (re.compile(r"[wy](?![aeiou])"), ""),
    (re.compile(r"z"), "S"),
    (re.compile(r"v"), "F"),
    (re.compile(r"(?!^)[aeiou]+"), ""),
]

_WORD_SPLIT = re.compile(r"\W+", re.ASCII)


def metaphone_word(word: str) -> str:
    s = word.lower()
    for pattern, repl in _RULES:
        s = pattern.sub(repl, s)
    return s.upper()


def metaphone(text: str) -> str:
    """Metaphone encoding; multi-word input is encoded word-by-word and
    joined with single spaces."""
    words = [w for w in _WORD_SPLIT.split(text) if w]
    return " ".join(metaphone_word(w) for w in words)
