"""Tag-map diffing and change-significance.

Re-expresses the reference's tags.rb: the five-way tag diff partition
(unchanged / created / deleted / edited / moved, with trivial variants,
tags.rb:52-108), patch application incl. the deletions-only mode and
omit-tag resurrection (tags.rb:110-147), and the fuzzy significance
kernel (tags.rb:205-318) built from case/punctuation folding,
Levenshtein + anagram, Metaphone homophones, abbreviation expansion,
whitespace elision and road-number prefix folding.

Insertion-ordered Python dicts match Ruby hash semantics, which the
algorithm depends on (first-match moved-key detection, apply order).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from .abbrev import equal_expansions
from .metaphone import metaphone

# keys with automatic values; their deletion/changes are never
# significant (tags.rb:9-11)
AUTO_KEYS = ("created_by",)

_ODBL_KEYS = {"odbl", "obdl", "oodbl"}
_ODBL_CLEAN_VALUES = {"clean", "clear", "true", "yes", "1"}


def odbl_clean(tags: dict[str, str]) -> bool:
    """Manually-marked ODbL-clean tag test, incl. common misspellings
    (tags.rb:21-41)."""
    return any(
        k.lower() in _ODBL_KEYS and v.lower() in _ODBL_CLEAN_VALUES
        for k, v in tags.items()
    )


def levenshtein(a: str, b: str) -> int:
    """Plain edit distance (insert/delete/substitute, unit costs)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_APOSTROPHES = re.compile(r"[＇'ʼʹ]")
_SHARP_S = re.compile("ß")
_PUNCT_SPACE = re.compile(r"[\W_]+", re.UNICODE)
_ALNUM_PREFIX_DIGIT = re.compile(r"\w(\d)")


def _normalize(s: str) -> str:
    s = s.lower()
    s = _APOSTROPHES.sub("", s)
    s = _SHARP_S.sub("ss", s)
    # all punctuation/whitespace runs become single spaces (tags.rb:278).
    # Ruby's [[:punct:][:space:]] ≈ anything that is not a letter/digit;
    # underscores are POSIX punctuation too, so fold them as well.
    s = _PUNCT_SPACE.sub(" ", s)
    return s


def significant_tag(old_v: str, new_v: str) -> bool:
    """Is the value change old→new copyright-significant? (tags.rb:264-318)"""
    old = _normalize(old_v)
    new = _normalize(new_v)
    if old == new:
        return False

    dist = levenshtein(old, new)
    if dist < 3 and sorted(old) == sorted(new):
        return False  # transposition typo
    if dist < min(len(old), len(new)) // 8:
        return False  # small-proportion misspelling

    mp_old = metaphone(old)
    if mp_old.replace(" ", "") and mp_old == metaphone(new):
        return False  # homophones

    if equal_expansions(old, new):
        return False

    if old.replace(" ", "") == new.replace(" ", ""):
        return False  # whitespace-only difference

    if _ALNUM_PREFIX_DIGIT.sub(r"\1", old) == _ALNUM_PREFIX_DIGIT.sub(r"\1", new):
        return False  # road-number alpha prefix ("E16" ≡ "16")

    return old != new


def significant(old: dict[str, str], new: dict[str, str]) -> bool:
    """Whole-map significance test (tags.rb:205-254)."""
    if old == new:
        return False

    new_keys = set(new)
    old_keys = set(old)

    changed = [k for k in new_keys & old_keys if old[k] != new[k]]
    if any(k not in AUTO_KEYS and significant_tag(old[k], new[k]) for k in changed):
        return True

    created = new_keys - old_keys
    deleted = old_keys - new_keys

    new_by_value = {new[k]: k for k in created}
    old_by_value = {old[k]: k for k in deleted}
    moved: dict[tuple[str, str], str] = {}
    for v in set(new_by_value) & set(old_by_value):
        nk, ok = new_by_value[v], old_by_value[v]
        moved[(nk, ok)] = v
        created.discard(nk)
        deleted.discard(ok)

    if created:
        return True  # any creation is significant
    # deletions are never significant ("deletions are OK")
    return any(significant_tag(ok, nk) for nk, ok in moved)


@dataclass
class TagDiff:
    """Five-way tag diff partition (tags.rb:49-195).

    ``edited`` maps key -> (old_val, new_val); ``moved`` maps
    (old_key, new_key) -> value.
    """

    unchanged: dict = field(default_factory=dict)
    created: dict = field(default_factory=dict)
    deleted: dict = field(default_factory=dict)
    edited: dict = field(default_factory=dict)
    moved: dict = field(default_factory=dict)
    auto_key_changes: dict = field(default_factory=dict)
    trivial_edited: dict = field(default_factory=dict)
    trivial_moved: dict = field(default_factory=dict)

    @staticmethod
    def create(a: dict[str, str], b: dict[str, str]) -> "TagDiff":
        unchanged = {k: v for k, v in a.items() if b.get(k) == v}
        created = {k: v for k, v in b.items() if k not in unchanged}
        deleted = {k: v for k, v in a.items() if k not in unchanged}

        auto_key_changes = {}
        for k in AUTO_KEYS:
            if k in created:
                auto_key_changes[k] = created.pop(k)

        # same key created+deleted => value edit (tags.rb:73-83)
        edited = {}
        for k in [k for k in created if k in deleted]:
            edited[k] = (deleted.pop(k), created.pop(k))

        # same value under a new key => key move; first matching deleted
        # key in insertion order wins (tags.rb:85-94)
        moved = {}
        deleted_snapshot = dict(deleted)
        for k, v in list(created.items()):
            dk = next((k2 for k2, v2 in deleted_snapshot.items() if v2 == v), None)
            if dk is not None:
                moved[(dk, k)] = v
        for (dk, ck), _v in moved.items():
            deleted.pop(dk, None)
            created.pop(ck, None)

        trivial_edited = {
            k: vals for k, vals in edited.items() if not significant_tag(*vals)
        }
        edited = {k: v for k, v in edited.items() if k not in trivial_edited}

        trivial_moved = {
            keys: v for keys, v in moved.items() if not significant_tag(*keys)
        }
        moved = {k: v for k, v in moved.items() if k not in trivial_moved}

        return TagDiff(
            unchanged, created, deleted, edited, moved,
            auto_key_changes, trivial_edited, trivial_moved,
        )

    def apply(
        self,
        original: dict[str, str],
        only_deleted: bool = False,
        omit_tags: Optional[list[tuple[str, str]]] = None,
    ) -> dict[str, str]:
        """Apply the patch (tags.rb:110-147). In deletions-only mode,
        omitted tags created by this patch are resurrected."""
        tags = dict(original)
        omit = omit_tags or []
        for k in self.deleted:
            tags.pop(k, None)

        if only_deleted:
            for k, v in omit:
                if self.created.get(k) == v:
                    tags[k] = v
        else:
            tags.update(self.created)
            for k, (_old, new) in self.edited.items():
                tags[k] = new
            for (old_key, new_key), v in self.moved.items():
                tags.pop(old_key, None)
                tags[new_key] = v

        for k, (old, new) in self.trivial_edited.items():
            if tags.get(k) == old:
                tags[k] = new
        for (old_key, new_key), v in self.trivial_moved.items():
            if tags.get(old_key) == v:
                tags.pop(old_key, None)
                tags[new_key] = v

        tags.update(self.auto_key_changes)
        return tags

    def reverse(self) -> "TagDiff":
        return TagDiff(
            self.unchanged,
            self.deleted,
            self.created,
            {k: (b, a) for k, (a, b) in self.edited.items()},
            {(nk, ok): v for (ok, nk), v in self.moved.items()},
            {},
            {k: (b, a) for k, (a, b) in self.trivial_edited.items()},
            {(nk, ok): v for (ok, nk), v in self.trivial_moved.items()},
        )

    def is_empty(self) -> bool:
        return not (
            self.created or self.deleted or self.edited or self.moved
            or self.trivial_edited or self.trivial_moved
        )

    def only_deletes(self) -> bool:
        return not (
            self.created or self.edited or self.moved
            or self.trivial_edited or self.trivial_moved
        )

    def is_trivial(self) -> bool:
        return not (self.created or self.deleted or self.edited or self.moved)
