"""Per-element history fold + cross-element cascade.

This is the reference's decision core re-expressed in Python:

* ``element_actions`` — the sequential fold over one element's version
  history (change_bot.rb:54-189): per-version status lattice
  (blacklisted→unclean ≻ odbl_clean ≻ acceptor_edit ≻ whitelisted ≻
  empty ≻ trivial ≻ unclean), "version zero" + "deletions are always
  OK" patch semantics with deferred diff state, tainted-tag
  bookkeeping, redaction visibility, and final Edit/Delete emission.

* ``ChangeBot`` — the cross-element cascade + deterministic changeset
  ordering (change_bot.rb:202-372): deleting a node edits referencing
  current ways/relations; a way shrinking below 2 nodes or a relation
  emptying cascades to its own delete; edits are ordered
  relation→way→node, then deletes relation→way→node.

Inside Spark, ``element_actions`` runs per group in an Arrow-batched
``applyInPandas`` UDF; the cascade runs as bounded DataFrame joins
(operators/cascade.py) with this class as the single-machine oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

from .geom import geom_diff, positions_close
from .model import (
    NODE,
    RELATION,
    TYPE_ORDER,
    WAY,
    DeleteAct,
    EditAct,
    Element,
    RedactAct,
)
from .tags import AUTO_KEYS, TagDiff, odbl_clean

# relation tag values whose ("type", value) pairs are exempt from taint
# (change_bot.rb:67)
_RELATION_OMIT_VALUES = ("multipolygon", "route", "site", "restriction", "boundary")


def odbl_clean_flags(versions: list[Element]) -> list[bool]:
    """Per-version odbl-clean flag with backward propagation: the flag
    only holds from the last version backwards (change_bot.rb:17-28)."""
    flags = [odbl_clean(v.tags) for v in versions]
    out = []
    clean = True
    for flag in reversed(flags):
        clean = flag and clean
        out.append(clean)
    out.reverse()
    return out


@dataclass
class AgreementDB:
    """Changeset-agreement + exception lookups backing the fold.

    ``changesets`` maps changeset_id -> accepted? (already resolved
    through user acceptance, adopter, and override — change_bot.rb:193-199,
    J1/J2 in Spark). White/blacklists hold (etype, element_id, version)
    triples (change_bot.rb:30-52); exclusions hold (etype, element_id)
    (db.rb:38-48).
    """

    changesets: dict[int, bool] = field(default_factory=dict)
    edit_whitelist: set = field(default_factory=set)
    edit_blacklist: set = field(default_factory=set)
    exclusions: set = field(default_factory=set)

    def accepted(self, changeset_id) -> bool:
        return bool(self.changesets.get(changeset_id, False))


def element_actions(versions: Iterable[Element], db: AgreementDB) -> list:
    """The history fold (change_bot.rb:54-189). Returns the ordered
    action list for one element."""
    versions = sorted(versions, key=lambda v: v.version)
    first = versions[0]

    clean_flags = odbl_clean_flags(versions)
    accepted_flags = [db.accepted(v.changeset_id) for v in versions]
    wl = [
        (v.etype, v.element_id, v.version) in db.edit_whitelist for v in versions
    ]
    bl = [
        (v.etype, v.element_id, v.version) in db.edit_blacklist for v in versions
    ]

    prev_obj = first.version_zero()
    base_obj = prev_obj.copy()
    actions: list = []
    diff_state: list = []

    tainted: list[tuple] = []
    omit_tags: list[tuple] = []
    no_order = False
    if base_obj.etype == RELATION:
        omit_tags = [("type", v) for v in _RELATION_OMIT_VALUES]
        no_order = all(v.tags.get("type") == "multipolygon" for v in versions)

    for obj, is_clean, accepted, is_wl, is_bl in zip(
        versions, clean_flags, accepted_flags, wl, bl
    ):
        # deletions are always clean: reset to version-zero geometry and
        # empty tags (change_bot.rb:77-83)
        if not obj.visible:
            base_obj.geom = base_obj.version_zero_geom()
            base_obj.tags = {}
            prev_obj = base_obj
            diff_state = []
            continue

        geom_patch = geom_diff(prev_obj, obj)
        tags_patch = TagDiff.create(prev_obj.tags, obj.tags)

        # status lattice (change_bot.rb:91-105)
        if is_bl:
            status = "unclean"
        elif is_clean:
            status = "odbl_clean"
        elif accepted:
            status = "acceptor_edit"
        elif is_wl:
            status = "whitelisted_version"
        elif tags_patch.is_empty() and geom_patch.is_empty():
            status = "empty"
        elif tags_patch.is_trivial() and geom_patch.is_empty():
            status = "trivial"
        else:
            status = "unclean"

        only_deleted = status == "unclean"

        if status == "odbl_clean":
            # explicit clean marker: take the version as-is and launder
            # matching taints (change_bot.rb:118-125)
            new_tags = obj.tags
            new_geom = obj.geom
            tainted = [(k, v) for k, v in tainted if new_tags.get(k) != v]
        else:
            new_tags = tags_patch.apply(
                base_obj.tags, only_deleted=only_deleted, omit_tags=omit_tags
            )
            new_geom = geom_patch.apply(
                base_obj.geom,
                only_deleted=only_deleted,
                state=diff_state,
                no_order=no_order,
            )
            if no_order and sorted(new_geom) == sorted(obj.geom):
                new_geom = obj.geom  # order-insensitive match (change_bot.rb:131)

        if status == "unclean":
            # record additions/changes for later taint checks
            # (change_bot.rb:136-151)
            tainted.extend(tags_patch.created.items())
            tainted.extend((k, vals[1]) for k, vals in tags_patch.edited.items())
            tainted.extend((keys[1], v) for keys, v in tags_patch.moved.items())
            tainted = [t for t in tainted if t not in omit_tags]

        for k, v in tainted:
            if new_tags.get(k) == v:
                del new_tags[k]

        # redact when the reconstructed state differs from the actual
        # version (ε-tolerant for node positions, change_bot.rb:156-162)
        geom_differs = new_geom != obj.geom and (
            obj.etype != NODE or not positions_close(new_geom, obj.geom)
        )
        if new_tags != obj.tags or geom_differs:
            if status == "unclean":
                visible = tags_patch.only_deletes() and geom_patch.only_deletes()
            else:
                visible = (
                    new_tags != base_obj.tags
                    or new_geom != base_obj.geom
                    or status in ("acceptor_edit", "whitelisted_version", "empty")
                )
            actions.append(
                RedactAct(
                    obj.etype,
                    obj.element_id,
                    obj.version,
                    "visible" if visible else "hidden",
                )
            )

        base_obj.geom = new_geom
        base_obj.tags = new_tags
        prev_obj = obj

    last = versions[-1]
    if base_obj.is_invalid():
        if last.visible:
            actions.insert(0, DeleteAct(base_obj.etype, base_obj.element_id))
    elif base_obj.tags != last.tags or (
        base_obj.geom != last.geom
        and (base_obj.etype != NODE or not positions_close(base_obj.geom, last.geom))
    ):
        base_obj.changeset_id = -1
        base_obj.version = last.version
        base_obj.tags = {
            k: v for k, v in base_obj.tags.items() if k not in AUTO_KEYS
        }
        actions.insert(0, EditAct(base_obj))

    return actions


class HistoryStore:
    """In-memory element store used by the cascade and the tests
    (db.rb:3-72). Spark replaces this with DataFrames; the semantics
    stay identical."""

    def __init__(
        self,
        nodes: Optional[dict] = None,
        ways: Optional[dict] = None,
        relations: Optional[dict] = None,
    ):
        self.histories = {NODE: nodes or {}, WAY: ways or {}, RELATION: relations or {}}

    def history(self, etype: str, element_id: int) -> list[Element]:
        return self.histories[etype][element_id]

    def each(self, etype: str):
        return list(self.histories[etype].keys())

    def current(self, etype: str, element_id: int) -> Element:
        return self.histories[etype][element_id][-1]

    def objects_using(self, etype: str, element_id: int) -> list[Element]:
        """Reverse-reference lookup against *current* versions
        (db.rb:50-71)."""
        refs = []
        if etype == NODE:
            for versions in self.histories[WAY].values():
                cur = versions[-1]
                if element_id in cur.geom:
                    refs.append(cur)
        for versions in self.histories[RELATION].values():
            cur = versions[-1]
            if any(m[0] == etype and m[1] == element_id for m in cur.geom):
                refs.append(cur)
        return refs


class ChangeBot:
    """Drives the fold over a store and resolves cross-element effects
    (change_bot.rb:202-372)."""

    def __init__(self, store: HistoryStore, db: AgreementDB):
        self.store = store
        self.db = db
        self.pending_deletes: list[DeleteAct] = []
        self.pending_edits: list[EditAct] = []
        self.redactions: list[RedactAct] = []

    def action_for(self, history: list[Element]) -> list:
        first = history[0]
        if (first.etype, first.element_id) in self.db.exclusions:
            # excluded: delete + redact everything (change_bot.rb:214-218)
            return [DeleteAct(first.etype, first.element_id)] + [
                RedactAct(first.etype, first.element_id, e.version, "hidden")
                for e in history
            ]
        return element_actions(history, self.db)

    def process(self, etype: str, element_id: int) -> None:
        for act in self.action_for(self.store.history(etype, element_id)):
            if isinstance(act, EditAct):
                self.pending_edits.append(act)
            elif isinstance(act, DeleteAct):
                self.pending_deletes.append(act)
            else:
                self.redactions.append(act)

    def process_all(self) -> None:
        for etype in TYPE_ORDER:
            for element_id in self.store.each(etype):
                self.process(etype, element_id)

    def as_changeset(self) -> list:
        """Cascade deletes into referencing objects, then order the
        changeset deterministically (change_bot.rb:280-319)."""
        # per-type passes over a snapshot; cascaded deletes of a later
        # type are picked up by that type's pass
        for etype in TYPE_ORDER:
            for d in [d for d in self.pending_deletes if d.etype == etype]:
                self._process_delete(d)

        changeset: list = []
        for etype in reversed(TYPE_ORDER):  # relation, way, node
            changeset.extend(
                e for e in self.pending_edits if e.obj.etype == etype
            )
        for etype in reversed(TYPE_ORDER):
            changeset.extend(d for d in self.pending_deletes if d.etype == etype)
        return changeset

    def _process_delete(self, d: DeleteAct) -> None:
        # change_bot.rb:321-372
        for ref_obj in self.store.objects_using(d.etype, d.element_id):
            key = (ref_obj.etype, ref_obj.element_id)
            if any(
                (p.etype, p.element_id) == key for p in self.pending_deletes
            ):
                continue  # already being deleted anyway

            plan = next(
                (
                    e
                    for e in self.pending_edits
                    if (e.obj.etype, e.obj.element_id) == key
                ),
                None,
            )
            if plan is not None:
                edit = plan
            else:
                obj = ref_obj.copy()
                obj.changeset_id = -1
                edit = EditAct(obj)

            if edit.obj.etype == WAY:
                edit.obj.geom = [n for n in edit.obj.geom if n != d.element_id]
                kill = len(edit.obj.geom) < 2
            elif edit.obj.etype == RELATION:
                edit.obj.geom = [
                    m
                    for m in edit.obj.geom
                    if not (m[0] == d.etype and m[1] == d.element_id)
                ]
                # empty relations can't be uploaded; kill them
                # (change_bot.rb:350-359)
                kill = len(edit.obj.geom) == 0
            else:
                raise AssertionError("node found as referencing object")

            if kill:
                self.pending_edits = [
                    e
                    for e in self.pending_edits
                    if (e.obj.etype, e.obj.element_id) != key
                ]
                self.pending_deletes.insert(0, DeleteAct(*key))
            else:
                self.pending_edits = [
                    e
                    for e in self.pending_edits
                    if (e.obj.etype, e.obj.element_id) != key
                ]
                self.pending_edits.insert(0, edit)


def process_changeset(
    store: HistoryStore, db: AgreementDB
) -> tuple[list, list[RedactAct]]:
    """Convenience: full run → (ordered changeset, redactions)."""
    bot = ChangeBot(store, db)
    bot.process_all()
    return bot.as_changeset(), bot.redactions
