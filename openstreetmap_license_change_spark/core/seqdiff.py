"""Operational-transform engine over ordered lists.

Re-expresses the reference's sequence-diff algebra — LCS-based edit
scripts with Insert/Delete/Alter/Move ops, pairwise swap-based
composition ("rebase"), and deletions-only splitting — in fresh Python.
Semantics follow /root/reference/util.rb:4-85 and
/root/reference/diff.rb:3-524 exactly (this is the correctness-critical
core: the 16 swap cases incl. the 8-branch move-move case).

Within one element the algebra is inherently sequential; across
elements it is embarrassingly parallel, so it runs inside an
Arrow-batched grouped pandas UDF (one element history per group).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence


class OpError(RuntimeError):
    """Raised when an op does not apply cleanly to an array."""


@dataclass(frozen=True)
class Ins:
    """Insert ``elt`` at index ``loc`` (diff.rb:4-23)."""

    loc: int
    elt: Any

    def apply(self, arr: list) -> list:
        if self.loc < 0 or self.loc > len(arr):
            raise OpError(
                f"insert index {self.loc} out of range 0..{len(arr)}"
            )
        return arr[: self.loc] + [self.elt] + arr[self.loc :]

    def shift(self, off: int) -> "Ins":
        return Ins(self.loc + off, self.elt)

    def __repr__(self) -> str:  # compact, for golden-test diffs
        return f"Ins[{self.loc},{self.elt!r}]"


@dataclass(frozen=True)
class Del:
    """Delete ``elt`` from index ``loc`` (diff.rb:25-45)."""

    loc: int
    elt: Any

    def apply(self, arr: list) -> list:
        if self.loc < 0 or self.loc >= len(arr):
            raise OpError(
                f"delete index {self.loc} out of range 0..{len(arr) - 1}"
            )
        if arr[self.loc] != self.elt:
            raise OpError(
                f"delete mismatch at {self.loc}: {arr[self.loc]!r} != {self.elt!r}"
            )
        return arr[: self.loc] + arr[self.loc + 1 :]

    def shift(self, off: int) -> "Del":
        return Del(self.loc + off, self.elt)

    def __repr__(self) -> str:
        return f"Del[{self.loc},{self.elt!r}]"


@dataclass(frozen=True)
class Alt:
    """Replace ``old`` with ``new`` at index ``loc`` (diff.rb:47-67)."""

    loc: int
    old: Any
    new: Any

    def apply(self, arr: list) -> list:
        if self.loc < 0 or self.loc >= len(arr):
            raise OpError(
                f"alter index {self.loc} out of range 0..{len(arr) - 1}"
            )
        if arr[self.loc] != self.old:
            raise OpError(
                f"alter mismatch at {self.loc}: {arr[self.loc]!r} != {self.old!r}"
            )
        out = list(arr)
        out[self.loc] = self.new
        return out

    def shift(self, off: int) -> "Alt":
        return Alt(self.loc + off, self.old, self.new)

    def __repr__(self) -> str:
        return f"Alt[{self.loc},{self.old!r}->{self.new!r}]"


@dataclass(frozen=True)
class Mov:
    """Move ``elt`` from index ``src`` to index ``dst`` (diff.rb:69-103)."""

    src: int
    dst: int
    elt: Any

    def apply(self, arr: list) -> list:
        try:
            return Ins(self.dst, self.elt).apply(Del(self.src, self.elt).apply(arr))
        except OpError as ex:
            raise OpError(f"while applying {self!r}: {ex}") from ex

    def shift(self, off: int) -> "Mov":
        return Mov(self.src + off, self.dst + off, self.elt)

    @staticmethod
    def create(src: int, dst: int, elt: Any) -> Optional["Mov"]:
        # self-moves are null operations (diff.rb:94-102)
        return None if src == dst else Mov(src, dst, elt)

    def __repr__(self) -> str:
        return f"Mov[{self.src}->{self.dst},{self.elt!r}]"


Op = Any  # Ins | Del | Alt | Mov


# ---------------------------------------------------------------------------
# LCS + tagged diff (util.rb:4-85)
# ---------------------------------------------------------------------------

def lcs(a: Sequence, b: Sequence) -> list:
    """Longest common subsequence, O(mn) DP with the reference's
    back-trace tie-breaking (util.rb:4-36) so scripts match exactly."""
    n, m = len(a), len(b)
    lengths = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n):
        row, prev = lengths[i + 1], lengths[i]
        ai = a[i]
        for j in range(m):
            if ai == b[j]:
                row[j + 1] = prev[j] + 1
            else:
                left, up = row[j], prev[j + 1]
                row[j + 1] = left if left >= up else up
    out: list = []
    x, y = n, m
    while x != 0 and y != 0:
        if lengths[x][y] == lengths[x - 1][y]:
            x -= 1
        elif lengths[x][y] == lengths[x][y - 1]:
            y -= 1
        else:
            out.append(a[x - 1])
            x -= 1
            y -= 1
    out.reverse()
    return out


def tagged_diff(a: Sequence, b: Sequence) -> list[tuple]:
    """3-way stream of ('a', x)=deleted / ('b', x)=inserted / ('c', x)=common
    (util.rb:38-59)."""
    common = lcs(a, b)
    out: list[tuple] = []
    ai = bi = 0
    for e in common:
        while a[ai] != e:
            out.append(("a", a[ai]))
            ai += 1
        while b[bi] != e:
            out.append(("b", b[bi]))
            bi += 1
        out.append(("c", e))
        ai += 1
        bi += 1
    out.extend(("a", x) for x in a[ai:])
    out.extend(("b", x) for x in b[bi:])
    return out


def diff_split(a_k: Sequence, a_v: Sequence, b_k: Sequence, b_v: Sequence) -> list:
    """Project attribute lists across a key diff (util.rb:61-85)."""
    out: list = []
    ai = bi = 0
    for tag, _elt in tagged_diff(a_k, b_k):
        if tag == "a":
            ai += 1
        elif tag == "b":
            out.append(b_v[bi])
            bi += 1
        else:
            out.append(a_v[ai])
            ai += 1
            bi += 1
    return out


# ---------------------------------------------------------------------------
# swap: transform op `a` past op `b`, returning (new_b, new_a) — either may
# be None when the pair annihilates (diff.rb:105-385)
# ---------------------------------------------------------------------------

def _swap_ins_ins(a: Ins, b: Ins):
    if a.loc < b.loc:
        return b.shift(-1), a
    return b, a.shift(1)


def _swap_ins_alt(a: Ins, b: Alt):
    if a.loc < b.loc:
        return b.shift(-1), a
    if a.loc == b.loc:
        return None, Ins(b.loc, b.new)
    return b, a


def _swap_ins_del(a: Ins, b: Del):
    if a.loc < b.loc:
        return b.shift(-1), a
    if a.loc == b.loc:
        return None, None
    return b, a.shift(-1)


def _swap_ins_mov(a: Ins, b: Mov):
    if a.loc == b.src:
        # the insert is immediately moved; keep the insert second so
        # tainted ops are held back (diff.rb:141-148)
        return None, Ins(b.dst, a.elt)
    dist = 0
    src, dst = b.src, b.dst
    if a.loc < b.src:
        src -= 1
        dist += 1
    if a.loc < b.dst or (a.loc == b.dst and b.src < b.dst):
        dst -= 1
        dist -= 1
    return Mov.create(src, dst, b.elt), a.shift(dist)


def _swap_alt_ins(a: Alt, b: Ins):
    if a.loc < b.loc:
        return b, a
    return b, a.shift(1)


def _swap_alt_alt(a: Alt, b: Alt):
    if a.loc != b.loc:
        return b, a
    return Alt(a.loc, a.old, b.new), None


def _swap_alt_del(a: Alt, b: Del):
    if a.loc < b.loc:
        return b, a
    if a.loc == b.loc:
        return Del(a.loc, a.old), None
    return b, a.shift(-1)


def _swap_alt_mov(a: Alt, b: Mov):
    if b.src == a.loc:
        return Mov.create(b.src, b.dst, a.old), a.shift(b.dst - b.src)
    dist = 0
    if a.loc > b.src:
        dist -= 1
    if a.loc > b.dst or (a.loc == b.dst and b.src > b.dst):
        dist += 1
    return b, a.shift(dist)


def _swap_del_ins(a: Del, b: Ins):
    if a.loc <= b.loc:
        return b.shift(1), a
    return b, a.shift(1)


def _swap_del_alt(a: Del, b: Alt):
    if a.loc <= b.loc:
        return b.shift(1), a
    return b, a


def _swap_del_del(a: Del, b: Del):
    if a.loc <= b.loc:
        return b.shift(1), a
    return b, a.shift(-1)


def _swap_del_mov(a: Del, b: Mov):
    dist = 0
    src, dst = b.src, b.dst
    if a.loc <= b.src:
        src += 1
        dist += 1
    if a.loc <= b.dst:
        dst += 1
        dist -= 1
    return Mov.create(src, dst, b.elt), a.shift(dist)


def _swap_mov_ins(a: Mov, b: Ins):
    dist = 0
    src, dst = a.src, a.dst
    if b.loc <= a.src:
        src += 1
    else:
        dist += 1
    if b.loc <= a.dst:
        dst += 1
    else:
        dist -= 1
    return b.shift(dist), Mov.create(src, dst, a.elt)


def _swap_mov_alt(a: Mov, b: Alt):
    if b.loc == a.dst:
        return b.shift(a.src - a.dst), Mov.create(a.src, a.dst, b.new)
    dist = 0
    if b.loc > a.src or (b.loc == a.src and a.src < a.dst):
        dist += 1
    if b.loc > a.dst:
        dist -= 1
    return b.shift(dist), a


def _swap_mov_del(a: Mov, b: Del):
    if a.dst == b.loc:
        return Del(a.src, b.elt), None
    dist = 0
    src, dst = a.src, a.dst
    if b.loc <= a.src and not (b.loc == a.src and a.src < a.dst):
        src -= 1
    else:
        dist += 1
    if b.loc < a.dst:
        dst -= 1
    else:
        dist -= 1
    return b.shift(dist), Mov.create(src, dst, a.elt)


def _swap_mov_mov(a: Mov, b: Mov):
    def adj(af: int, at: int, bf: int, bt: int):
        return (
            Mov.create(b.src + bf, b.dst + bt, b.elt),
            Mov.create(a.src + af, a.dst + at, a.elt),
        )

    if b.src == a.dst and a.elt == b.elt:
        if a.src != b.dst:
            return Mov.create(a.src, b.dst, a.elt), None  # chain
        return None, None  # revert

    # disjoint index ranges: plain swap (diff.rb:320-322)
    if max(a.src, a.dst) < min(b.src, b.dst) or min(a.src, a.dst) > max(b.src, b.dst):
        return b, a

    if a.src < a.dst and b.src < a.dst and b.dst < a.dst:
        if b.dst < a.src:
            return adj(1, 0, 1, 0)
        if b.src < a.src:
            return adj(-1, 0, 0, 1)
        return adj(0, 0, 1, 1)
    if a.src < a.dst and b.src > a.dst and b.dst <= a.dst:
        if b.dst < a.src:
            return adj(1, 1, 0, 0)
        return adj(0, 1, 0, 1)
    if a.src < a.dst and b.src < a.dst and b.dst >= a.dst:
        if b.src < a.src:
            return adj(-1, -1, 0, 0)
        return adj(0, -1, 1, 0)
    if a.src > a.dst and b.src > a.src and b.dst <= a.dst:
        return adj(1, 1, 0, 0)
    if a.src > a.dst and b.src > a.src and b.dst <= a.src:
        return adj(1, 0, 0, -1)
    if a.src > a.dst and b.src <= a.src and b.dst >= a.src:
        if b.src < a.dst:
            return adj(-1, -1, 0, 0)
        return adj(-1, 0, -1, 0)
    if a.src > a.dst and b.src <= a.src and b.dst <= a.dst:
        if b.src > b.dst:
            return adj(0, 1, -1, 0)
        return adj(0, -1, 0, -1)
    if a.src > a.dst and b.src <= a.src and b.dst > a.dst:
        if b.src > a.dst:
            return adj(0, 0, -1, -1)
        return adj(0, -1, 0, -1)
    raise OpError(f"unhandled move-move case: {a!r} <=> {b!r}")


_SWAP_TABLE: dict[tuple[type, type], Callable] = {
    (Ins, Ins): _swap_ins_ins,
    (Ins, Alt): _swap_ins_alt,
    (Ins, Del): _swap_ins_del,
    (Ins, Mov): _swap_ins_mov,
    (Alt, Ins): _swap_alt_ins,
    (Alt, Alt): _swap_alt_alt,
    (Alt, Del): _swap_alt_del,
    (Alt, Mov): _swap_alt_mov,
    (Del, Ins): _swap_del_ins,
    (Del, Alt): _swap_del_alt,
    (Del, Del): _swap_del_del,
    (Del, Mov): _swap_del_mov,
    (Mov, Ins): _swap_mov_ins,
    (Mov, Alt): _swap_mov_alt,
    (Mov, Del): _swap_mov_del,
    (Mov, Mov): _swap_mov_mov,
}


def swap(a: Op, b: Op) -> tuple[Optional[Op], Optional[Op]]:
    """Transform deferred op ``a`` past subsequent op ``b``.

    Returns ``(new_b, new_a)`` — `b` rewritten to apply before `a`, and
    `a` rewritten to apply after `b` (diff.rb:105-111).
    """
    return _SWAP_TABLE[(type(a), type(b))](a, b)


# ---------------------------------------------------------------------------
# script build (diff.rb:387-475)
# ---------------------------------------------------------------------------

def _first_contraction(ops: list, after: int) -> Optional[int]:
    """First adjacent (Ins,Del)/(Del,Ins) pair at equal location with pair
    index > ``after`` (diff.rb:387-396)."""
    for ix in range(len(ops) - 1):
        if ix <= after:
            continue
        x, y = ops[ix], ops[ix + 1]
        if (
            (isinstance(x, Ins) and isinstance(y, Del))
            or (isinstance(x, Del) and isinstance(y, Ins))
        ) and x.loc == y.loc:
            return ix
    return None


def _first_relocation(ops: list, after: int) -> tuple[Optional[int], Optional[int]]:
    """First Ins/Del past ``after`` that has an opposite-kind partner with an
    equal element anywhere in the script (diff.rb:398-407)."""
    for ix, x in enumerate(ops):
        if ix <= after or not isinstance(x, (Ins, Del)):
            continue
        pair = Del if isinstance(x, Ins) else Ins
        for iy, y in enumerate(ops):
            if isinstance(y, pair) and y.elt == x.elt:
                return ix, iy
    return None, None


def build_script(
    a: Sequence,
    b: Sequence,
    detect_alter: Optional[Callable[[Any, Any], bool]] = None,
    detect_move: bool = False,
) -> list[Op]:
    """LCS diff of ``a`` -> ``b`` as an ordered op script, optionally
    contracting Del+Ins pairs into Alter (same position, ``detect_alter``
    equality) and Del/Ins pairs of equal elements into Move
    (diff.rb:409-475)."""
    ops: list[Op] = []
    a_idx = 0
    for tag, elt in tagged_diff(a, b):
        if tag == "a":
            ops.append(Del(a_idx, elt))
        elif tag == "b":
            ops.append(Ins(a_idx, elt))
            a_idx += 1
        else:
            a_idx += 1

    if detect_alter is not None:
        fc = -1
        while True:
            fc = _first_contraction(ops, fc)
            if fc is None:
                break
            frm = ops[fc] if isinstance(ops[fc], Del) else ops[fc + 1]
            to = ops[fc + 1] if isinstance(ops[fc + 1], Ins) else ops[fc]
            if detect_alter(frm.elt, to.elt):
                ops[fc] = Alt(frm.loc, frm.elt, to.elt)
                del ops[fc + 1]

    if detect_move:
        fidx = -1
        while True:
            fidx, sidx = _first_relocation(ops, fidx)
            if fidx is None:
                break
            fidx, sidx = min(fidx, sidx), max(fidx, sidx)
            if isinstance(ops[fidx], Del):
                delidx, insidx = fidx, sidx
            else:
                delidx, insidx = sidx, fidx
            del_loc = ops[delidx].loc
            ins_loc = ops[insidx].loc
            movement = 0
            for op in ops[fidx + 1 : sidx]:
                if isinstance(op, Ins):
                    movement += 1
                elif isinstance(op, Del):
                    movement -= 1
            if del_loc > ins_loc:
                del_loc -= movement + 1
            else:
                ins_loc -= movement
            ops[fidx] = Mov.create(del_loc, ins_loc, ops[insidx].elt)
            del ops[sidx]

    return ops


# ---------------------------------------------------------------------------
# compose / split / apply (diff.rb:477-524)
# ---------------------------------------------------------------------------

def compose(a: list[Op], b: list[Op]) -> tuple[list[Op], list[Op]]:
    """Rebase script ``b`` over deferred script ``a``.

    Returns ``(new_a, new_b)`` where ``new_b`` applies first
    (diff.rb:477-495)."""
    new_a: list[Op] = []
    new_b: list[Optional[Op]] = list(b)
    for a_act in reversed(a):
        cur: Optional[Op] = a_act
        for i, b_act in enumerate(new_b):
            if cur is not None and b_act is not None:
                new_b[i], cur = swap(cur, b_act)
        if cur is not None:
            new_a.insert(0, cur)
    return new_a, [x for x in new_b if x is not None]


def split_deletes(ops: list[Op]) -> tuple[list[Op], list[Op]]:
    """Split a script into (deletes, other), rebasing each delete over the
    non-deletes seen so far ("deletions are always OK", diff.rb:497-517)."""
    deletes: list[Op] = []
    other: list[Op] = []
    for act in ops:
        if isinstance(act, Del):
            other, moved = compose(other, [act])
            deletes.extend(moved)
        else:
            other.append(act)
    return deletes, other


def apply_script(ops: Sequence[Op], arr: list) -> list:
    """Fold the ops over the array (diff.rb:519-523)."""
    out = list(arr)
    for op in ops:
        out = op.apply(out)
    return out
