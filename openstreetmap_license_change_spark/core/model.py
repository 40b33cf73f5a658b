"""Element model + action types.

Mirrors osm.rb:1-235 (Node/Way/Relation with version-zero geometry and
validity rules) and actions.rb:23-25 (Edit/Delete/Redact), using plain
Python containers: positions are [lon, lat] lists, way geometry is a
list of node ids, relation geometry a list of (type, ref, role) tuples
with type in {'node','way','relation'}.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

NODE = "node"
WAY = "way"
RELATION = "relation"

# cascade processing order: node deletions can cascade to ways and
# relations, way deletions to relations (change_bot.rb:286-296)
TYPE_ORDER = (NODE, WAY, RELATION)


def member(mtype: str, ref: int, role: str = "") -> tuple:
    return (mtype, ref, role)


@dataclass
class Element:
    etype: str  # 'node' | 'way' | 'relation'
    element_id: int
    version: int
    changeset_id: Optional[int] = None
    visible: bool = True
    timestamp: Any = None
    uid: Optional[int] = None
    tags: dict = field(default_factory=dict)
    geom: Any = None  # position | node-id list | member list

    def version_zero_geom(self):
        # nodes have no valid "version zero" position (osm.rb:61-67);
        # ways/relations start empty (osm.rb:114-118, 206-210)
        return None if self.etype == NODE else []

    def version_zero(self) -> "Element":
        return Element(
            etype=self.etype,
            element_id=self.element_id,
            version=0,
            geom=self.version_zero_geom(),
            tags={},
        )

    def is_invalid(self) -> bool:
        if self.etype == NODE:
            return self.geom == self.version_zero_geom()  # osm.rb:81-83
        if self.etype == WAY:
            return len(self.geom) < 2  # osm.rb:132-134
        return len(self.geom) < 1  # osm.rb:224-226

    def copy(self) -> "Element":
        geom = self.geom
        if isinstance(geom, list):
            geom = list(geom)
        return Element(
            etype=self.etype,
            element_id=self.element_id,
            version=self.version,
            changeset_id=self.changeset_id,
            visible=self.visible,
            timestamp=self.timestamp,
            uid=self.uid,
            tags=dict(self.tags),
            geom=geom,
        )


def node(element_id: int, version: int, lonlat, **kw) -> Element:
    return Element(NODE, element_id, version, geom=lonlat, **kw)


def way(element_id: int, version: int, nodes, **kw) -> Element:
    return Element(WAY, element_id, version, geom=list(nodes), **kw)


def relation(element_id: int, version: int, members, **kw) -> Element:
    ms = [m if isinstance(m, tuple) else member(*m) for m in members]
    return Element(RELATION, element_id, version, geom=ms, **kw)


# --- actions (actions.rb:23-25) ---------------------------------------------

@dataclass(frozen=True)
class DeleteAct:
    etype: str
    element_id: int


@dataclass(frozen=True)
class RedactAct:
    etype: str
    element_id: int
    version: int
    mode: str  # 'visible' | 'hidden'


@dataclass
class EditAct:
    obj: Element

    def __eq__(self, other):
        if not isinstance(other, EditAct):
            return NotImplemented
        a, b = self.obj, other.obj
        return (
            (a.etype, a.element_id, a.version, a.changeset_id, a.tags, a.geom)
            == (b.etype, b.element_id, b.version, b.changeset_id, b.tags, b.geom)
        )
