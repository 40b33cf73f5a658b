"""Geometry diffs for nodes, ways, relations.

Mirrors geom.rb: position replace with ε-null-move for nodes
(geom.rb:25-54), OT-script diffs with move detection for way node lists
(geom.rb:56-92), and member-list diffs with alter+move detection plus
the unordered multipolygon fast path for relations (geom.rb:94-170).

``state`` is a caller-owned list mutated in place — it carries deferred
(non-delete) ops across versions, exactly like the reference's
options[:state] Array (geom.rb:69-82,138-147).
"""

from __future__ import annotations

from typing import Optional

from . import seqdiff
from .model import NODE, WAY, Element
from .seqdiff import Del, apply_script, build_script, compose, split_deletes

EPSILON = 0.0000002


def positions_close(a, b) -> bool:
    """ε-closeness of two lon/lat pairs (geom.rb:6-12)."""
    if a is None or b is None:
        return False
    dx = a[0] - b[0]
    dy = a[1] - b[1]
    return dx * dx + dy * dy < EPSILON * EPSILON


class NodeDiff:
    """Position replacement or ε-null-move (geom.rb:25-54)."""

    def __init__(self, prev: Element, cur: Element):
        self.null_move = positions_close(prev.geom, cur.geom)
        self.position = cur.geom

    def is_empty(self) -> bool:
        return self.null_move

    def only_deletes(self) -> bool:
        return self.null_move

    def apply(self, geom, only_deleted=False, state=None, no_order=False):
        if self.is_empty() or only_deleted:
            return geom
        return self.position


class WayDiff:
    """OT script over node-id lists with move detection (geom.rb:56-92)."""

    def __init__(self, prev: Element, cur: Element):
        self.script = build_script(prev.geom, cur.geom, detect_move=True)

    def is_empty(self) -> bool:
        return not self.script

    def only_deletes(self) -> bool:
        return all(isinstance(op, Del) for op in self.script)

    def apply(self, geom, only_deleted=False, state=None, no_order=False):
        if state is None:
            state = []
        new_state, comp = compose(state, self.script)
        state[:] = new_state
        if only_deleted:
            deletes, others = split_deletes(comp)
            state[0:0] = others
            return apply_script(deletes, geom)
        return apply_script(comp, geom)


def _tr_match(a, b) -> bool:
    # member equality ignoring role: (type, ref) only
    return a[0] == b[0] and a[1] == b[1]


class RelationDiff:
    """Member-list diff with alter/move detection, ``geom == old``
    shortcut and unordered multipolygon semantics (geom.rb:94-170)."""

    def __init__(self, prev: Element, cur: Element):
        self.old = prev.geom
        self.new = cur.geom
        self._script: Optional[list] = None

    @property
    def script(self):
        if self._script is None:
            self._script = build_script(
                self.old, self.new, detect_alter=_tr_match, detect_move=True
            )
        return self._script

    def is_empty(self) -> bool:
        return self.old == self.new

    def only_deletes(self) -> bool:
        return len(self.old) > len(self.new) and all(
            isinstance(op, Del) for op in self.script
        )

    def apply(self, geom, only_deleted=False, state=None, no_order=False):
        if state is None:
            state = []

        # shortcut: applying onto exactly the old state yields the new
        # one; deliberately does NOT update the carried state
        # (geom.rb:116-119)
        if geom == self.old and not only_deleted:
            return list(self.new)

        if no_order:
            # unordered bag semantics for all-multipolygon histories
            # (geom.rb:121-135)
            if only_deleted:
                gone = [
                    e for e in self.old
                    if not any(_tr_match(e, n) for n in self.new)
                ]
                return [g for g in geom if g not in gone]
            out = [
                g for g in geom if any(_tr_match(g, n) for n in self.new)
            ]
            out += [
                n for n in self.new
                if not any(_tr_match(n, o) for o in self.old)
            ]
            for e in self.old:
                matches = [n for n in self.new if _tr_match(e, n)]
                if matches and e in out:
                    out = [x for x in out if x != e]
                    out += matches
            return out

        new_state, comp = compose(state, self.script)
        state[:] = new_state
        if only_deleted:
            deletes, others = split_deletes(comp)
            state[0:0] = others
            return apply_script(deletes, geom)
        return apply_script(comp, geom)


def geom_diff(prev: Element, cur: Element):
    """Dispatch on element type (geom.rb:14-23)."""
    if prev.etype == NODE:
        return NodeDiff(prev, cur)
    if prev.etype == WAY:
        return WayDiff(prev, cur)
    return RelationDiff(prev, cur)
